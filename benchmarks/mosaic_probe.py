"""Stage-A probes for the turbo VM kernel: which Mosaic primitives are fast?"""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N, W = 4096, 128

def timeit(name, fn, *args, reps=20):
    try:
        out = fn(*args); jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:140]}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:42s} {(time.perf_counter()-t0)/reps*1e6:9.1f}us", flush=True)
    return out

x32 = jnp.tile(jnp.arange(W, dtype=jnp.int32)[None], (N, 1))
k = (jnp.arange(N, dtype=jnp.int32) % 96).reshape(N, 1)

# 1. gather shift: out[i,q] = x[i, q-k[i]] via take_along_axis
def k_gather(x_ref, k_ref, o_ref):
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    idx = jnp.clip(pos - k_ref[:], 0, W - 1)
    v = jnp.take_along_axis(x_ref[:], idx, axis=1)
    o_ref[:] = jnp.where(pos >= k_ref[:], v, 0)

@jax.jit
def gather_shift(x, kk):
    return pl.pallas_call(k_gather,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)]*2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x, kk)

out = timeit("kernel take_along_axis shift (4096,128)", gather_shift, x32, k)
if out is not None:
    ref = np.zeros((N, W), np.int32)
    xs = np.asarray(x32)
    for i in range(0, N, 331):
        ref[i, int(k[i,0]):] = xs[i, :W-int(k[i,0])]
    print("  gather shift correct:", all(np.array_equal(np.asarray(out[i]), ref[i]) for i in range(0, N, 331)), flush=True)

# 2. uint8 elementwise in kernel
xu8 = jnp.ones((N, 512), jnp.uint8)
def k_u8(x_ref, o_ref):
    x = x_ref[:]
    m = (x == 1) | (x == 123)
    o_ref[:] = jnp.where(m, x + 1, x).astype(jnp.uint8)
@jax.jit
def u8op(x):
    return pl.pallas_call(k_u8,
        out_shape=jax.ShapeDtypeStruct((N, 512), jnp.uint8),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
timeit("kernel uint8 compare+select (4096,512)", u8op, xu8)

# 3. int32 same shape for comparison
xi = jnp.ones((N, 512), jnp.int32)
def k_i32(x_ref, o_ref):
    x = x_ref[:]
    m = (x == 1) | (x == 123)
    o_ref[:] = jnp.where(m, x + 1, x)
@jax.jit
def i32op(x):
    return pl.pallas_call(k_i32,
        out_shape=jax.ShapeDtypeStruct((N, 512), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
timeit("kernel int32 compare+select (4096,512)", i32op, xi)

# 4. scalar switch in kernel (SMEM scalar op selects branch)
def k_switch(s_ref, x_ref, o_ref):
    op = s_ref[0]
    def b0(x): return x + 1
    def b1(x): return x * 2
    def b2(x): return x - 3
    o_ref[:] = jax.lax.switch(op, [b0, b1, b2], x_ref[:])
@jax.jit
def scalar_switch(s, x):
    return pl.pallas_call(k_switch,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, x)
timeit("kernel scalar lax.switch", scalar_switch, jnp.array([1], jnp.int32), x32)

# 5. fori_loop of 16 steps inside kernel, each: reduction + scalar branch + elementwise
def k_steps(code_ref, x_ref, o_ref):
    def body(i, x):
        op = code_ref[i]
        pos = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
        def b0(x): return x + 1
        def b1(x):
            mx = jnp.max(x, axis=1, keepdims=True)
            return jnp.where(pos < 64, x, mx - x)
        def b2(x): return jnp.where((x & 1) == 0, x // 2, 3 * x + 1)
        return jax.lax.switch(op % 3, [b0, b1, b2], x)
    o_ref[:] = jax.lax.fori_loop(0, 16, body, x_ref[:])
@jax.jit
def steps(code, x):
    return pl.pallas_call(k_steps,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(code, x)
code = jnp.arange(16, dtype=jnp.int32)
timeit("kernel 16-step fori+switch+reduce", steps, code, x32)

# 6. dynamic_slice from a VMEM 2D table row with scalar offset (template fetch)
tab = jnp.arange(8192, dtype=jnp.int32).reshape(1, 8192)
def k_dslice(s_ref, t_ref, o_ref):
    off = s_ref[0]
    o_ref[:] = jnp.broadcast_to(t_ref[0, pl.ds(off, W)][None], (N, W))
@jax.jit
def dslice(s, t):
    return pl.pallas_call(k_dslice,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, t)
timeit("kernel scalar-offset template fetch", dslice, jnp.array([37], jnp.int32), tab)

# 7. while_loop with data-dependent trip count (interpolation loop shape)
def k_while(x_ref, o_ref):
    def cond(c):
        x, it = c
        return (it < 8) & (jnp.max(x) > 0)
    def body(c):
        x, it = c
        return x - 1, it + 1
    x, _ = jax.lax.while_loop(cond, body, (x_ref[:], jnp.int32(0)))
    o_ref[:] = x
@jax.jit
def whl(x):
    return pl.pallas_call(k_while,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
timeit("kernel data-dep while_loop (8 iters)", whl, jnp.full((N, W), 8, jnp.int32))

# 8. argmax/argmin along lanes (find first hit)
def k_argmax(x_ref, o_ref):
    hit = x_ref[:] == 77
    pos = jax.lax.broadcasted_iota(jnp.int32, (N, W), 1)
    first = jnp.min(jnp.where(hit, pos, W), axis=1, keepdims=True)
    o_ref[:] = jnp.broadcast_to(first, (N, W))
@jax.jit
def am(x):
    return pl.pallas_call(k_argmax,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
timeit("kernel find-first via min-where", am, x32)

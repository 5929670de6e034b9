import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N, W, TILE = 4096, 128, 512
ITERS = 64

def timeit(name, fn, *args, reps=20):
    try:
        out = fn(*args); jax.block_until_ready(out)
    except Exception as e:
        import traceback
        print(f"{name:46s} FAILED", flush=True)
        traceback.print_exc()
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    us = (time.perf_counter()-t0)/reps*1e6
    print(f"{name:46s} {us:9.1f}us  ({us/ITERS:6.2f}us/iter)", flush=True)
    return out

def run_loop(name, body_factory, extra_specs=(), extra_args=()):
    def kern(*refs):
        buf_ref = refs[len(extra_specs)]
        o_ref = refs[-1]
        body = body_factory(*refs[:len(extra_specs)])
        o_ref[:] = jax.lax.fori_loop(0, ITERS, body, buf_ref[:])
    @jax.jit
    def f(buf, *extra):
        return pl.pallas_call(kern,
            grid=(N // TILE,),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
            in_specs=list(extra_specs) + [pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM))(*extra, buf)
    buf = jnp.ones((N, W), jnp.int32)
    timeit(name, f, buf, *extra_args)

# 1. elementwise (passed as arg this time)
run_loop("elementwise b*3+1", lambda: lambda i, b: b * 3 + 1)

# 2. row reduce sum
run_loop("rowsum reduce", lambda: lambda i, b: b + jnp.sum(b, axis=1, keepdims=True))

# 3. scalar-ify: jnp.all full compare (uniformity check)
def f3():
    def body(i, b):
        u = jnp.all(b[:, :1] == b[0, 0])
        return jnp.where(u, b + 1, b)
    return body
run_loop("jnp.all uniform-check + where", f3)

# 4. dynamic sublane rowfetch from 64-row table
R = 64
tab2 = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)
def f4(t_ref):
    def body(i, b):
        row = t_ref[pl.ds(i % R, 1), :]
        return b + row
    return body
run_loop("dyn sublane rowfetch", f4,
         extra_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)], extra_args=(tab2,))

# 5. SMEM scalar reads (3 per iter)
T = 256
code = jnp.tile(jnp.array([[1, 2, 3, 4]], jnp.int32), (T, 1))
def f5(c_ref):
    def body(i, b):
        return b + c_ref[i % T, 0] + c_ref[i % T, 1] + c_ref[i % T, 2]
    return body
run_loop("SMEM 3 scalar reads", f5,
         extra_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)], extra_args=(code,))

# 6. per-lane gather via take_along_axis (idx computed in kernel)
def f6():
    def body(i, b):
        pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
        idx = (pos + i) % W
        return jnp.take_along_axis(b, idx, axis=1)
    return body
run_loop("gather take_along_axis", f6)

# 7. switch on SMEM scalar between 4 real-ish branches
def f7(c_ref):
    def body(i, b):
        op = c_ref[i % T, 0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
        def b0(b): return b + 1
        def b1(b): return jnp.where(pos < 64, b * 2, b)
        def b2(b): return b + jnp.sum(b, axis=1, keepdims=True)
        def b3(b): return jnp.take_along_axis(b, (pos + 1) % W, axis=1)
        return jax.lax.switch(jnp.clip(op, 0, 3), [b0, b1, b2, b3], b)
    return body
run_loop("switch 4 branches (op=1 const)", f7,
         extra_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)], extra_args=(code,))

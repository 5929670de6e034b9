import time, traceback
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N, W = 4096, 128

def timeit(name, fn, *args, reps=20, show_err=False):
    try:
        out = fn(*args); jax.block_until_ready(out)
    except Exception as e:
        msg = traceback.format_exc() if show_err else f"{type(e).__name__}: {str(e)[:300]}"
        print(f"{name:44s} FAILED: {msg}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:44s} {(time.perf_counter()-t0)/reps*1e6:9.1f}us", flush=True)
    return out

x32 = jnp.tile(jnp.arange(W, dtype=jnp.int32)[None], (N, 1))

# A. scalar switch again but branches sharing structure; also with grid tiles
def k_switch(s_ref, x_ref, o_ref):
    op = s_ref[0]
    def b0(x): return x + 1
    def b1(x): return x * 2
    def b2(x): return x - 3
    o_ref[:] = jax.lax.switch(op, [b0, b1, b2], x_ref[:])

def mk_switch(tile):
    @jax.jit
    def f(s, x):
        return pl.pallas_call(k_switch,
            grid=(N // tile,),
            out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((tile, W), lambda i: (i, 0), memory_space=pltpu.VMEM))(s, x)
    return f
s = jnp.array([1], jnp.int32)
timeit("switch grid tile=512", mk_switch(512), s, x32)
timeit("switch grid tile=4096(no grid eff.)", mk_switch(4096), s, x32)

# cond instead of switch
def k_cond(s_ref, x_ref, o_ref):
    op = s_ref[0]
    o_ref[:] = jax.lax.cond(op == 1, lambda x: x * 2, lambda x: x + 1, x_ref[:])
@jax.jit
def condf(s, x):
    return pl.pallas_call(k_cond,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, x)
timeit("kernel scalar cond", condf, s, x32)

# B. pl.when-style predicated writes
def k_when(s_ref, x_ref, o_ref):
    op = s_ref[0]
    o_ref[:] = x_ref[:]
    @pl.when(op == 1)
    def _():
        o_ref[:] = x_ref[:] * 2
@jax.jit
def whenf(s, x):
    return pl.pallas_call(k_when,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, x)
timeit("kernel pl.when", whenf, s, x32)

# C. int8 select (instead of uint8)
xi8 = jnp.ones((N, 512), jnp.int8)
def k_i8(x_ref, o_ref):
    x = x_ref[:]
    m = (x == 1)
    o_ref[:] = jnp.where(m, x + 1, x).astype(jnp.int8)
@jax.jit
def i8op(x):
    return pl.pallas_call(k_i8,
        grid=(8,),
        out_shape=jax.ShapeDtypeStruct((N, 512), jnp.int8),
        in_specs=[pl.BlockSpec((N//8, 512), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((N//8, 512), lambda i: (i, 0), memory_space=pltpu.VMEM))(x)
timeit("kernel int8 select (grid 8)", i8op, xi8, show_err=True)

# D. uint8 via int32 view: reinterpret as int32 lanes
xu = jnp.ones((N, 512), jnp.uint8)
xv = jax.lax.bitcast_convert_type(xu.reshape(N, 128, 4), jnp.int32)
def k_bc(x_ref, o_ref):
    x = x_ref[:]
    b0 = x & 0xFF
    o_ref[:] = jnp.where(b0 == 1, x + 1, x)
@jax.jit
def bcop(x):
    return pl.pallas_call(k_bc,
        out_shape=jax.ShapeDtypeStruct((N, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
timeit("kernel packed-4xbyte int32 ops", bcop, xv)

# E. 16-step fori+switch with SMALLER branches — find what failed
def k_steps(code_ref, x_ref, o_ref):
    def body(i, x):
        op = code_ref[i]
        def b0(x): return x + 1
        def b1(x): return x * 2
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
timeit("16-step fori+switch (simple branches)", steps, code, x32, show_err=True)

# F. reduction to (N,1) WITHOUT broadcast back
def k_red(x_ref, o_ref):
    o_ref[:] = jnp.max(x_ref[:], axis=1, keepdims=True)
@jax.jit
def red(x):
    return pl.pallas_call(k_red,
        out_shape=jax.ShapeDtypeStruct((N, 1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(x)
timeit("kernel row-max reduce (4096,128)->(N,1)", red, x32)

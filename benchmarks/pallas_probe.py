"""Probe: does Pallas/Mosaic work on the axon TPU backend, and how fast?

Three kernels of increasing complexity, each timed (compile + run):
  1. trivial elementwise
  2. per-row barrel shift (the splice building block)
  3. interpolate-like: fori_loop of masked reductions + shifts on a tile grid
"""
import time, sys
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N, W = 4096, 128

def timeit(name, fn, *args, reps=20):
    t0 = time.perf_counter()
    out = fn(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    run_us = (time.perf_counter() - t0) / reps * 1e6
    print(f"{name:30s} compile={compile_s:7.2f}s run={run_us:9.1f}us", flush=True)
    return out

# --- 1. trivial ---
def k_trivial(x_ref, o_ref):
    o_ref[:] = x_ref[:] * 2

@jax.jit
def trivial(x):
    return pl.pallas_call(
        k_trivial,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)

x = jnp.ones((N, W), jnp.int32)
timeit("pallas trivial", trivial, x)

# --- 2. per-row barrel shift right by k (vacated=0) ---
def k_barrel(x_ref, k_ref, o_ref):
    x = x_ref[:]
    k = k_ref[:]          # (N,1) int32
    pos = jax.lax.broadcasted_iota(jnp.int32, (x.shape[0], W), 1)
    for bit in range(7):  # W=128 → 7 bits
        amt = 1 << bit
        rolled = pltpu.roll(x, amt, 1)
        rolled = jnp.where(pos >= amt, rolled, 0)
        x = jnp.where((k & amt) != 0, rolled, x)
    o_ref[:] = x

@jax.jit
def barrel(x, k):
    return pl.pallas_call(
        k_barrel,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, k)

k = jnp.arange(N, dtype=jnp.int32).reshape(N, 1) % 96
out = timeit("pallas barrel shift", barrel, x, k)
# verify
ref = np.zeros((N, W), np.int32)
xs = np.ones((N, W), np.int32)
for i in range(0, N, 517):
    kk = int(k[i, 0]); ref[i, kk:] = xs[i, :W-kk]
ok = all(np.array_equal(np.asarray(out[i]), ref[i]) for i in range(0, N, 517))
print("barrel correct:", ok, flush=True)

# --- 3. interpolate-like: grid over tiles, fori_loop with reductions/shifts ---
TILE = 512
def k_interp_like(x_ref, o_ref):
    def body(it, buf):
        pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
        is_open = (buf == 123)
        # rfind per row
        rev_hit = jnp.where(is_open, pos, -1)
        outer = jnp.max(rev_hit, axis=1, keepdims=True)
        # hash-ish reduction
        h = jnp.sum(buf * pos, axis=1, keepdims=True)
        # barrel shift by outer&63
        kk = outer & 63
        y = buf
        for bit in range(6):
            amt = 1 << bit
            rolled = pltpu.roll(y, amt, 1)
            rolled = jnp.where(pos >= amt, rolled, 0)
            y = jnp.where((kk & amt) != 0, rolled, y)
        return jnp.where((h & 1) == 0, y, buf) + 1
    o_ref[:] = jax.lax.fori_loop(0, 6, body, x_ref[:])

@jax.jit
def interp_like(x):
    return pl.pallas_call(
        k_interp_like,
        grid=(N // TILE,),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )(x)

timeit("pallas interp-like (grid)", interp_like, x)

# --- XLA baseline: whole-state select at N=4096 (the advance() commit cost) ---
state = {
    "arena": jnp.zeros((N, 512), jnp.uint8),
    "out": jnp.zeros((N, 128), jnp.uint8),
    "slots": jnp.zeros((N, 8, 7), jnp.int32),
    "pc": jnp.zeros((N,), jnp.int32),
}
@jax.jit
def whole_select(st, m):
    return jax.tree.map(lambda a: jnp.where(m[(...,) + (None,)*(a.ndim-1)], a, a+1), st)
m = jnp.ones((N,), bool)
timeit("XLA whole-state select", whole_select, state, m)
print("done", flush=True)

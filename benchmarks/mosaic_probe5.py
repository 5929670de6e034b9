import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

N, W, TILE = 4096, 128, 512

def timeit(name, fn, *args, reps=20):
    try:
        out = fn(*args); jax.block_until_ready(out)
    except Exception as e:
        print(f"{name:46s} FAILED:", flush=True)
        print(str(e)[:1200], flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e6:9.1f}us", flush=True)
    return out

# a) branch skipping: same mega, two code tables (all-nop vs all-gather)
T = 256
K_STEPS = 16
def k_mega(code_ref, pc_ref, buf_ref, o_pc_ref, o_buf_ref):
    def step(_, carry):
        pc, buf = carry
        pc0 = jnp.max(pc[:1, :1]).astype(jnp.int32)
        op = code_ref[pc0, 0]
        pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
        def h_gather(buf):
            hit = buf == 77
            first = jnp.min(jnp.where(hit, pos, W), axis=1, keepdims=True)
            idx = jnp.clip(pos - (first & 63), 0, W - 1)
            g = jnp.take_along_axis(buf, idx, axis=1)
            return jnp.where(pos >= (first & 63), g, buf)
        def h_nop(buf):
            return buf + 0
        nbuf = jax.lax.switch(jnp.clip(op, 0, 1), [h_nop, h_gather], buf)
        return pc + 1, nbuf
    pc, buf = jax.lax.fori_loop(0, K_STEPS, step, (pc_ref[:], buf_ref[:]))
    o_pc_ref[:] = pc
    o_buf_ref[:] = buf

@jax.jit
def mega(code, pc, buf):
    return pl.pallas_call(k_mega,
        grid=(N // TILE,),
        out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((N, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)))(
        code, pc, buf)

x32 = jnp.ones((N, W), jnp.int32)
pc0 = jnp.zeros((N, 1), jnp.int32)
nop_codes = jnp.zeros((T, 4), jnp.int32)
g_codes = jnp.ones((T, 4), jnp.int32)
timeit("mega 16 steps ALL-NOP", mega, nop_codes, pc0, x32)
timeit("mega 16 steps ALL-GATHER", mega, g_codes, pc0, x32)

# c) isolated gather cost: 64 gathers in-kernel
def k_g64(buf_ref, idx_ref, o_ref):
    def body(i, b):
        return jnp.take_along_axis(b, idx_ref[:], axis=1) + 1
    o_ref[:] = jax.lax.fori_loop(0, 64, body, buf_ref[:])
@jax.jit
def g64(buf, idx):
    return pl.pallas_call(k_g64,
        grid=(N // TILE,),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM))(buf, idx)
idx = jnp.tile((jnp.arange(W, dtype=jnp.int32)[::-1])[None], (N, 1))
out = timeit("64 gathers (512,128) x8 tiles", g64, x32, idx)
if out is not None: print("  per gather per tile:", flush=True)

# c2) 64 elementwise for comparison
def k_e64(buf_ref, o_ref):
    def body(i, b):
        return b * 3 + 1
    o_ref[:] = jax.lax.fori_loop(0, 64, body, buf_ref[:])
@jax.jit
def e64(buf):
    return pl.pallas_call(k_e64,
        grid=(N // TILE,),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM))(x32)
timeit("64 elementwise (512,128) x8 tiles", e64, x32)

# b) arena gather full error
A = 512
arena = jnp.tile(jnp.arange(A, dtype=jnp.int32)[None], (N, 1))
offs = (jnp.arange(N, dtype=jnp.int32) % 384).reshape(N, 1)
def k_arena(a_ref, off_ref, o_ref):
    pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)
    idx = jnp.clip(off_ref[:] + pos, 0, A - 1)
    o_ref[:] = jnp.take_along_axis(a_ref[:], idx, axis=1)
@jax.jit
def arenaf(a, off):
    return pl.pallas_call(k_arena,
        grid=(N // TILE,),
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec((TILE, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM))(a, off)
timeit("arena gather 512-wide", arenaf, arena, offs)

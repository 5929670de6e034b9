import time
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
        s = str(e)
        for marker in ("Mosaic failed", "Not implemented", "Ran out of memory", "cannot statically"):
            i = s.find(marker)
            if i >= 0: s = s[i:i+160]; break
        else: s = s[:160]
        print(f"{name:46s} FAILED: {s}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e6:9.1f}us", flush=True)
    return out

# 1. row-aligned strtab fetch: dynamic sublane index
R = 64
tab2 = jnp.arange(R * W, dtype=jnp.int32).reshape(R, W)
def k_rowfetch(s_ref, t_ref, o_ref):
    row = t_ref[pl.ds(s_ref[0], 1), :]        # (1, W) dynamic sublane
    o_ref[:] = jnp.broadcast_to(row, (N, W))
@jax.jit
def rowfetch(s, t):
    return pl.pallas_call(k_rowfetch,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, t)
out = timeit("rowfetch t[ds(r,1),:]", rowfetch, jnp.array([5], jnp.int32), tab2)
if out is not None:
    print("  correct:", bool((np.asarray(out[0]) == np.arange(5*W, 6*W)).all()), flush=True)

# 2. arena gather: (TILE,512) gathered at per-lane offsets -> (TILE,128)
A = 512
TILE = 512
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
out = timeit("arena gather (512-wide, per-lane off)", arenaf, arena, offs)
if out is not None:
    i = 777
    print("  correct:", bool((np.asarray(out[i]) == np.arange(int(offs[i,0]), int(offs[i,0])+W)).all()), flush=True)

# 3. arena scatter-write: write 128 bytes at per-lane offset into (TILE,512)
#    via gather-merge: out[i,j] = where(off<=j<off+len, val[i, j-off], arena[i,j])
def k_awrite(a_ref, off_ref, v_ref, o_ref):
    posA = jax.lax.broadcasted_iota(jnp.int32, (TILE, A), 1)
    off = off_ref[:]
    idx = jnp.clip(posA - off, 0, W - 1)
    src = jnp.take_along_axis(v_ref[:], idx, axis=1)  # v (TILE,W) -> (TILE,A)?
    o_ref[:] = jnp.where((posA >= off) & (posA < off + W), src, a_ref[:])
@jax.jit
def awrite(a, off, v):
    return pl.pallas_call(k_awrite,
        grid=(N // TILE,),
        out_shape=jax.ShapeDtypeStruct((N, A), jnp.int32),
        in_specs=[pl.BlockSpec((TILE, A), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((TILE, A), lambda i: (i, 0), memory_space=pltpu.VMEM))(a, off, v)
v = jnp.full((N, W), 9, jnp.int32)
out = timeit("arena write at per-lane offset", awrite, arena, offs, v)
if out is not None:
    i = 123; o = int(offs[i,0])
    row = np.asarray(out[i])
    print("  correct:", bool((row[o:o+W] == 9).all() and (row[:o] == np.arange(o)).all()), flush=True)

# 4. MEGA with rowfetch (fix from probe3) + all state in VMEM
K_STEPS = 16
T = 256
S_ROWS = 64
def k_mega(code_ref, t_ref, pc_ref, buf_ref, o_pc_ref, o_buf_ref):
    def step(_, carry):
        pc, buf = carry
        pc0 = jnp.max(pc[:1, :1]).astype(jnp.int32)
        uniform = jnp.all(pc == pc0)
        op = code_ref[pc0, 0]
        a = code_ref[pc0, 1]
        pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)

        def h_add(buf):
            row = t_ref[pl.ds(a % S_ROWS, 1), :]
            return jnp.where(pos < 64, buf + row, buf)
        def h_find(buf):
            hit = buf == 77
            first = jnp.min(jnp.where(hit, pos, W), axis=1, keepdims=True)
            idx = jnp.clip(pos - (first & 63), 0, W - 1)
            g = jnp.take_along_axis(buf, idx, axis=1)
            return jnp.where(pos >= (first & 63), g, buf)
        def h_hash(buf):
            h = jnp.sum(buf * pos, axis=1, keepdims=True)
            return jnp.where((h & 3) == 0, buf + 1, buf)
        def h_nop(buf):
            return buf

        nbuf = jax.lax.switch(jnp.clip(op, 0, 3), [h_add, h_find, h_hash, h_nop], buf)
        return jnp.where(uniform, pc + 1, pc), jnp.where(uniform, nbuf, buf)

    pc, buf = jax.lax.fori_loop(0, K_STEPS, step, (pc_ref[:], buf_ref[:]))
    o_pc_ref[:] = pc
    o_buf_ref[:] = buf

@jax.jit
def mega(code, t, pc, buf):
    return pl.pallas_call(k_mega,
        grid=(N // TILE,),
        out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((N, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)))(
        code, t, pc, buf)

codes = np.zeros((T, 4), np.int32)
codes[:, 0] = np.arange(T) % 4
codes[:, 1] = (np.arange(T) * 7) % S_ROWS
x32 = jnp.ones((N, W), jnp.int32)
pc0 = jnp.zeros((N, 1), jnp.int32)
r = timeit(f"MEGA tiles={N//TILE} steps={K_STEPS}", mega, jnp.asarray(codes), tab2, pc0, x32)
if r is not None:
    t0 = time.perf_counter()
    for _ in range(30):
        r = mega(jnp.asarray(codes), tab2, pc0, x32)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 30
    print(f"  mega: {N*K_STEPS/dt/1e6:.1f}M steps/s  ({dt*1e6:.0f}us/launch, {dt/K_STEPS*1e6:.1f}us/step)", flush=True)

import time, traceback
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
        for marker in ("Mosaic failed", "Not implemented", "Ran out of memory", "NotImplementedError", "Unsupported"):
            i = s.find(marker)
            if i >= 0:
                s = s[i:i+200]; break
        else:
            s = s[:200]
        print(f"{name:46s} FAILED: {s}", flush=True)
        return None
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e6:9.1f}us", flush=True)
    return out

# --- 1. template fetch: dynamic_slice VMEM row at scalar offset ---
S = 8192
tab = jnp.arange(S, dtype=jnp.int32).reshape(1, S)
def k_fetch(s_ref, t_ref, o_ref):
    off = s_ref[0]
    row = t_ref[0, pl.ds(off, W)]            # (W,)
    o_ref[:] = jnp.broadcast_to(row[None, :], (N, W))
@jax.jit
def fetch(s, t):
    return pl.pallas_call(k_fetch,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, t)
timeit("fetch: t[0, ds(off,W)] bcast", fetch, jnp.array([37], jnp.int32), tab)

# variant: keep 2D shape
def k_fetch2(s_ref, t_ref, o_ref):
    off = s_ref[0]
    row = t_ref[:, pl.ds(off, W)]            # (1, W)
    o_ref[:] = jnp.broadcast_to(row, (N, W))
@jax.jit
def fetch2(s, t):
    return pl.pallas_call(k_fetch2,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(s, t)
out = timeit("fetch: t[:, ds(off,W)] bcast", fetch2, jnp.array([37], jnp.int32), tab)
if out is not None:
    print("  fetch correct:", bool((np.asarray(out[0]) == np.arange(37, 37+W)).all()), flush=True)

# --- 2. scalar read from SMEM code table at dynamic index ---
T = 256
code = jnp.tile(jnp.array([[3, 10, 20, 30]], jnp.int32), (T, 1))
def k_code(c_ref, x_ref, o_ref):
    def body(i, x):
        pc = (x[0, 0] + i) % T    # traced scalar... read from vector? try reduction
        pc = jnp.max(x[:1, :1]).astype(jnp.int32) % T
        op = c_ref[pc, 0]
        a = c_ref[pc, 1]
        return x + op + a
    o_ref[:] = jax.lax.fori_loop(0, 4, body, x_ref[:])
@jax.jit
def codef(c, x):
    return pl.pallas_call(k_code,
        out_shape=jax.ShapeDtypeStruct((N, W), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM))(c, x)
x32 = jnp.ones((N, W), jnp.int32)
timeit("SMEM code[pc,f] dyn scalar reads", codef, code, x32)

# --- 3. mega-kernel skeleton: tiles x steps x scalar switch ---
TILE = 512
K_STEPS = 16
def k_mega(code_ref, strtab_ref, pc_ref, buf_ref, o_pc_ref, o_buf_ref):
    # state: pc (TILE,1), buf (TILE,W)
    def step(_, carry):
        pc, buf = carry
        pc0 = jnp.max(pc[:1, :1]).astype(jnp.int32)      # scalar pc (uniform assumed)
        uniform = jnp.all(pc == pc0)
        op = code_ref[pc0, 0]
        a = code_ref[pc0, 1]

        pos = jax.lax.broadcasted_iota(jnp.int32, (TILE, W), 1)

        def h_add(buf):   # fake 'set': template fetch + merge
            row = strtab_ref[:, pl.ds(a, W)]
            return jnp.where(pos < 64, buf + row, buf)

        def h_find(buf):  # fake 'goto_map': find + reduce + shift-select
            hit = buf == 77
            first = jnp.min(jnp.where(hit, pos, W), axis=1, keepdims=True)
            idx = jnp.clip(pos - (first & 63), 0, W - 1)
            g = jnp.take_along_axis(buf, idx, axis=1)
            return jnp.where(pos >= (first & 63), g, buf)

        def h_hash(buf):  # fake 'lookup': hash reduce + compare + select
            h = jnp.sum(buf * pos, axis=1, keepdims=True)
            return jnp.where((h & 3) == 0, buf + 1, buf)

        def h_nop(buf):
            return buf

        nbuf = jax.lax.switch(jnp.clip(op, 0, 3), [h_add, h_find, h_hash, h_nop], buf)
        npc = jnp.where(uniform, pc + 1, pc)
        return npc, jnp.where(uniform, nbuf, buf)

    pc, buf = jax.lax.fori_loop(0, K_STEPS, step, (pc_ref[:], buf_ref[:]))
    o_pc_ref[:] = pc
    o_buf_ref[:] = buf

@jax.jit
def mega(code, strtab, pc, buf):
    grid = (N // TILE,)
    return pl.pallas_call(k_mega,
        grid=grid,
        out_shape=(jax.ShapeDtypeStruct((N, 1), jnp.int32),
                   jax.ShapeDtypeStruct((N, W), jnp.int32)),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                  pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                   pl.BlockSpec((TILE, W), lambda i: (i, 0), memory_space=pltpu.VMEM)))(
        code, strtab, pc, buf)

codes = np.zeros((T, 4), np.int32)
codes[:, 0] = np.arange(T) % 4
codes[:, 1] = (np.arange(T) * 7) % (S - W)
pc0 = jnp.zeros((N, 1), jnp.int32)
t0 = time.perf_counter()
r = timeit(f"MEGA {N//TILE}x tiles x {K_STEPS} steps", mega, jnp.asarray(codes), tab, pc0, x32)
if r is not None:
    total_steps = N * K_STEPS
    # measure again for throughput statement
    t0 = time.perf_counter()
    for _ in range(20):
        r = mega(jnp.asarray(codes), tab, pc0, x32)
    jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / 20
    print(f"  mega: {total_steps/dt/1e6:.1f}M steps/s ({dt*1e6:.0f}us per launch, {dt/K_STEPS*1e6:.1f}us/step)", flush=True)

"""Isolate the slow whole-array select: dtype / mask-shape / size effects."""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_ie_tpu")

N = 4096

def timeit(name, fn, *args, reps=30):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:46s} {(time.perf_counter()-t0)/reps*1e6:9.1f}us", flush=True)

for dtype, w in [(jnp.uint8, 512), (jnp.int8, 512), (jnp.int32, 512), (jnp.int32, 128), (jnp.float32, 512)]:
    a = jnp.zeros((N, w), dtype); b = jnp.ones((N, w), dtype)
    m1 = jnp.ones((N, 1), bool)
    mfull = jnp.ones((N, w), bool)
    f1 = jax.jit(lambda m, a, b: jnp.where(m, a, b))
    timeit(f"where {dtype.__name__}[{N},{w}] bcast-mask", f1, m1, a, b)
    timeit(f"where {dtype.__name__}[{N},{w}] full-mask", f1, mfull, a, b)
    g = jax.jit(lambda a, b: a + b)
    timeit(f"add   {dtype.__name__}[{N},{w}]", g, a, b)

# copy cost
a8 = jnp.zeros((N, 512), jnp.uint8)
timeit("plain copy uint8[4096,512] (x+1)", jax.jit(lambda x: x + 1), a8)
# bitcast select: treat uint8 arena as int32
a32 = jax.lax.bitcast_convert_type(a8.reshape(N, 128, 4), jnp.int32)
m1 = jnp.ones((N, 1), bool)
timeit("where bitcast-int32[4096,128]", jax.jit(lambda m, a: jnp.where(m, a, a + 1)), m1, a32)

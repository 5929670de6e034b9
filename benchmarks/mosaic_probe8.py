"""Probe: the _taa chunked-gather helper compiles on Mosaic at wide
widths (the adventure_real config: width/out 512) and is correct."""
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import sys
sys.path.insert(0, "/root/repo")
from interpolation_engine_tpu.vm.turbo import _taa  # noqa: E402

T = 256


def probe(w, wo):
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = _taa(x_ref[:], i_ref[:], T, w, wo=wo)

    @jax.jit
    def f(x, i):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((T, wo), jnp.int32))(x, i)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 120, (T, w)), jnp.int32)
    idx = jnp.asarray(rng.integers(-5, w + 5, (T, wo)), jnp.int32)
    try:
        out = np.asarray(f(x, idx))
        ref = np.asarray(x)[np.arange(T)[:, None],
                            np.clip(np.asarray(idx), 0, w - 1)]
        print(f"w={w} wo={wo}: COMPILED correct={bool((out == ref).all())}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"w={w} wo={wo}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)


if __name__ == "__main__":
    for w, wo in ((128, 128), (128, 256), (512, 512), (512, 128),
                  (128, 512), (512, 256)):
        probe(w, wo)

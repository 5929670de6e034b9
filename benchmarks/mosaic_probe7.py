"""Probe: does Mosaic's dim-1 dynamic_gather accept widths > 128 lanes?

Round-4 question (adventure_real config: width=512, elem=128). All turbo
byte-shift gathers are same-shape take_along_axis on (t, w); if Mosaic
compiles w=512 directly we can drop the 128-chunk workarounds, else every
gather must stay chunked.
"""
import functools
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T = 256


def probe(w, dtype):
    def kern(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)

    @jax.jit
    def f(x, i):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((T, w), dtype),
        )(x, i)

    x = jnp.asarray(np.arange(T * w, dtype=np.int32).reshape(T, w) % 120,
                    dtype)
    # reverse-shift indices, clipped — same shape as x
    idx = jnp.asarray((np.arange(w)[None, :] + np.arange(T)[:, None])
                      % w, jnp.int32)
    try:
        out = np.asarray(f(x, idx))
        ref = np.asarray(x)[np.arange(T)[:, None], np.asarray(idx)]
        ok = (out == ref).all()
        print(f"w={w} dtype={dtype.__name__}: COMPILED correct={bool(ok)}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e).splitlines()[0][:160]
        print(f"w={w} dtype={dtype.__name__}: FAIL {type(e).__name__}: {msg}",
              flush=True)


if __name__ == "__main__":
    for w in (128, 256, 512):
        for dt in (jnp.int32, jnp.uint8):
            probe(w, dt)

"""Probe 9c: candidate fixes for the w=512 _int_to_dec SIGABRT.

probe9b isolated it to the sign-shift `_taa(buf, pos - 1, t, w)` — a
dynamic gather used for a STATIC shift-right-by-one. Candidates:

  taa_affine   — _taa with an iota-derived (affine) index on an INPUT
                 buf: is it the affine index or the computed buf that
                 kills the compiler?
  taa_computed — _taa with an INPUT index on a computed buf
  shift_pad    — jnp.pad(buf, lane +1)[:, :w]  (static relayout)
  shift_concat — concat([zeros(t,128), buf])[:, :w] (vreg-aligned)
  dec_fixed    — full _int_to_dec with the winning shift at w=128/512
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from interpolation_engine_tpu.vm import turbo as tb  # noqa: E402

T = 128


def run(tag, kern, out_shape, *args):
    @jax.jit
    def f(*xs):
        return pl.pallas_call(kern, out_shape=out_shape)(*xs)
    try:
        out = np.asarray(f(*args))
        print(f"{tag}: COMPILED sum={int(out.astype(np.int64).sum())}",
              flush=True)
        return out
    except Exception as e:  # noqa: BLE001
        print(f"{tag}: FAIL {type(e).__name__}: "
              f"{str(e).splitlines()[0][:160]}", flush=True)
        return None


def probe_taa_affine():
    rng = np.random.default_rng(0)
    for w in (128, 512):
        x = jnp.asarray(rng.integers(0, 120, (T, w)), jnp.int32)

        def kern(x_ref, o_ref, w=w):
            pos = tb._iota(T, w)
            o_ref[:] = tb._taa(x_ref[:], pos - 1, T, w)
        run(f"taa_affine w={w}", kern,
            jax.ShapeDtypeStruct((T, w), jnp.int32), x)


def probe_taa_computed():
    rng = np.random.default_rng(0)
    for w in (128, 512):
        idx = jnp.asarray(rng.integers(-2, w + 2, (T, w)), jnp.int32)
        v = jnp.arange(T, dtype=jnp.int32).reshape(T, 1) * 7919 - 999

        def kern(v_ref, i_ref, o_ref, w=w):
            pos = tb._iota(T, w)
            nd = jnp.int32(6)
            buf = jnp.where(pos < nd, v_ref[:] % 10 + 48, 0)
            o_ref[:] = tb._taa(buf, i_ref[:], T, w)
        run(f"taa_computed w={w}", kern,
            jax.ShapeDtypeStruct((T, w), jnp.int32), v, idx)


def _shift_pad(buf, t, w):
    return jnp.pad(buf, ((0, 0), (1, 0)))[:, :w]


def _shift_concat(buf, t, w):
    z = jnp.zeros((t, 128), jnp.int32)
    return jnp.concatenate([z, buf], axis=1)[:, 128 - 1:128 - 1 + w]


def probe_shift_pad():
    for w in (128, 512):
        x = jnp.arange(w, dtype=jnp.int32).reshape(1, w) + \
            jnp.zeros((T, 1), jnp.int32)

        def kern(x_ref, o_ref, w=w):
            o_ref[:] = _shift_pad(x_ref[:], T, w)
        out = run(f"shift_pad w={w}", kern,
                  jax.ShapeDtypeStruct((T, w), jnp.int32), x)
        if out is not None:
            assert (out[:, 1:] == np.arange(w - 1)).all() and \
                (out[:, 0] == 0).all(), "shift_pad WRONG"


def probe_shift_concat():
    for w in (128, 512):
        x = jnp.arange(w, dtype=jnp.int32).reshape(1, w) + \
            jnp.zeros((T, 1), jnp.int32)

        def kern(x_ref, o_ref, w=w):
            o_ref[:] = _shift_concat(x_ref[:], T, w)
        out = run(f"shift_concat w={w}", kern,
                  jax.ShapeDtypeStruct((T, w), jnp.int32), x)
        if out is not None:
            assert (out[:, 1:] == np.arange(w - 1)).all() and \
                (out[:, 0] == 0).all(), "shift_concat WRONG"


def _dec_fixed(v, t, w, shift):
    neg = v < 0
    mag = jnp.where(neg, (~v).astype(jnp.uint32) + jnp.uint32(1),
                    v.astype(jnp.uint32))
    nd = jnp.int32(1) + sum(
        (mag >= jnp.uint32(p)).astype(jnp.int32) for p in tb._POW10[1:])
    cols = [((mag // jnp.uint32(p)) % jnp.uint32(10)).astype(jnp.int32)
            for p in tb._POW10]
    table = jnp.pad(jnp.concatenate(cols, axis=1), ((0, 0), (0, w - 10)))
    pos = tb._iota(t, w)
    e = nd - 1 - pos
    dig = tb._taa(table, e, t, w)
    buf = jnp.where(pos < nd, dig + 48, 0)
    shifted = shift(buf, t, w)
    nbuf = jnp.where(pos == 0, 45, jnp.where(pos < nd + 1, shifted, 0))
    buf = jnp.where(neg, nbuf, buf)
    return buf, nd + neg.astype(jnp.int32)


def probe_dec_fixed():
    for w in (128, 512):
        for name, shift in (("pad", _shift_pad),
                            ("concat", _shift_concat)):
            v = jnp.arange(T, dtype=jnp.int32).reshape(T, 1) * 9321 - 12345

            def kern(v_ref, o_ref, w=w, shift=shift):
                buf, nd = _dec_fixed(v_ref[:], T, w, shift)
                o_ref[:] = buf + nd
            out = run(f"dec_fixed[{name}] w={w}", kern,
                      jax.ShapeDtypeStruct((T, w), jnp.int32), v)
            if out is not None:
                # cross-check digits against str()
                vs = np.asarray(v)[:, 0]
                ok = True
                for r in range(T):
                    s = str(int(vs[r])).encode()
                    nd_r = len(s)
                    row = out[r] - nd_r - (1 if vs[r] < 0 else 0)
                    got = bytes(row[:len(s)].astype(np.uint8))
                    if got != s:
                        ok = False
                        break
                print(f"  dec_fixed[{name}] w={w} correct={ok}",
                      flush=True)


if __name__ == "__main__":
    which = sys.argv[1:] or ["taa_affine", "taa_computed", "shift_pad",
                             "shift_concat", "dec_fixed"]
    for name in which:
        globals()[f"probe_{name}"]()

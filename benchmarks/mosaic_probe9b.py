"""Probe 9b: bisect the two wide-slot Mosaic failures probe9 surfaced.

probe9 (T=128): dec w=512 SIGABRTs the tpu compiler; a (1,128) slice at
lane offset 128 broadcast to (128,128) is rejected ("Invalid input
layout" — the r04 adventure_real MLIR verbatim). _taa and the literal
loader are clean at every shape. Here:

  wr      — _wr at regw 128/256/512 with the mask as a real input (the
            (1, regw) lane-iota compare is the kernel's hottest
            slice-then-broadcast producer)
  slice_t — the offset-128 slice broadcast at T=128/256/512 (is the
            failure tile-dependent?)
  fixes   — candidate relayouts for broadcasting a non-offset-0 row:
            add-zeros, where-iota, concat-of-1
  dec_a   — _int_to_dec bisection: table pad + first _taa only
  dec_b   — digit select + ascii only (no sign shift)
  dec_c   — the sign-shift second _taa only
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")
from interpolation_engine_tpu.vm import turbo as tb  # noqa: E402


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


def probe_wr():
    for T in (128, 512):
        for regw in (128, 256, 512):
            regs = jnp.zeros((T, regw), jnp.int32)
            mask = jnp.ones((T, 1), jnp.int32)

            def kern(r_ref, m_ref, o_ref, regw=regw):
                r = tb._wr(r_ref[:], regw - 7, jnp.int32(42),
                           m_ref[:] != 0)
                o_ref[:] = r
            run(f"wr regw={regw} T={T}", kern,
                jax.ShapeDtypeStruct((T, regw), jnp.int32), regs, mask)


def probe_slice_t():
    for T in (128, 256, 512):
        x = jnp.arange(256, dtype=jnp.int32).reshape(1, 256)

        def kern(x_ref, o_ref, T=T):
            row = jax.lax.slice_in_dim(x_ref[:], 128, 256, axis=1)
            o_ref[:] = jnp.broadcast_to(row, (T, 128))
        run(f"slice_t off=128 T={T}", kern,
            jax.ShapeDtypeStruct((T, 128), jnp.int32), x)


def probe_fixes():
    T = 128
    x = jnp.arange(256, dtype=jnp.int32).reshape(1, 256)

    def k_add(x_ref, o_ref):
        row = jax.lax.slice_in_dim(x_ref[:], 128, 256, axis=1)
        o_ref[:] = jnp.zeros((T, 128), jnp.int32) + row

    def k_where(x_ref, o_ref):
        row = jax.lax.slice_in_dim(x_ref[:], 128, 256, axis=1)
        z = jax.lax.broadcasted_iota(jnp.int32, (T, 128), 1)
        o_ref[:] = jnp.where(z >= 0, row, z)

    def k_concat(x_ref, o_ref):
        row = jax.lax.slice_in_dim(x_ref[:], 128, 256, axis=1)
        o_ref[:] = jnp.concatenate([row] * T, axis=0)

    for tag, k in (("fix add", k_add), ("fix where", k_where),
                   ("fix concat", k_concat)):
        out = run(f"{tag} T={T}", k,
                  jax.ShapeDtypeStruct((T, 128), jnp.int32), x)
        if out is not None:
            assert (out == np.arange(128, 256)).all(), f"{tag} WRONG"


def _dec_parts(v_ref, o_ref, w, upto):
    T = v_ref.shape[0]
    v = v_ref[:]
    neg = v < 0
    mag = jnp.where(neg, (~v).astype(jnp.uint32) + jnp.uint32(1),
                    v.astype(jnp.uint32))
    nd = jnp.int32(1) + sum(
        (mag >= jnp.uint32(p)).astype(jnp.int32) for p in tb._POW10[1:])
    cols = [((mag // jnp.uint32(p)) % jnp.uint32(10)).astype(jnp.int32)
            for p in tb._POW10]
    table = jnp.pad(jnp.concatenate(cols, axis=1), ((0, 0), (0, w - 10)))
    pos = tb._iota(T, w)
    e = nd - 1 - pos
    dig = tb._taa(table, e, T, w)
    if upto == "a":
        o_ref[:] = dig
        return
    buf = jnp.where(pos < nd, dig + 48, 0)
    if upto == "b":
        o_ref[:] = buf
        return
    shifted = tb._taa(buf, pos - 1, T, w)
    if upto == "c":
        o_ref[:] = shifted
        return
    nbuf = jnp.where(pos == 0, 45, jnp.where(pos < nd + 1, shifted, 0))
    o_ref[:] = jnp.where(neg, nbuf, buf)


def probe_dec_parts():
    T, w = 128, 512
    v = jnp.arange(T, dtype=jnp.int32).reshape(T, 1) * 9321 - 12345
    for upto in ("a", "b", "c", "full"):
        def kern(v_ref, o_ref, upto=upto):
            _dec_parts(v_ref, o_ref, w, upto)
        run(f"dec[{upto}] w={w} T={T}", kern,
            jax.ShapeDtypeStruct((T, w), jnp.int32), v)


if __name__ == "__main__":
    which = sys.argv[1:] or ["wr", "slice_t", "fixes", "dec_parts"]
    for name in which:
        globals()[f"probe_{name}"]()

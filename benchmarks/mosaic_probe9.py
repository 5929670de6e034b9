"""Probe 9: root-cause the wide-slot Mosaic failure (VERDICT r4 next #2).

The r04 adventure_real run (BENCH_WIDTH=512 BENCH_ELEM=128 BENCH_OUT=512
BENCH_TILE=128 BENCH_LEAF=32) died in Mosaic with

    vector.broadcast (1x128, in_layout vpad<"32,{*,128},(8,128)">)
        -> (128x128) : Invalid input layout

i.e. a row-vector broadcast whose INPUT carries lane offset 128 — it was
sliced from the second 128-lane chunk of something. probe8 cleared _taa
at T=256; the failing tile is T=128, so this probe re-runs every
suspicious kernel primitive at T=128 and wide widths:

  taa        — the chunked lane gather (probe8 shape set, T=128)
  lit        — _mk_lit's chunk-broadcast-concat literal loader
  dec        — _int_to_dec decimal rendering at w=512
  wr         — _wr register write at regw 128/256/512
  rd_bc      — _rd of a high column (lane offset >= 128) broadcast wide
  slice_bc   — (1,128) slice at lane offset 128 -> broadcast (the MLIR
               pattern verbatim)
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
              f"{str(e).splitlines()[0][:200]}", flush=True)
        return None


def probe_taa():
    rng = np.random.default_rng(0)
    for w, wo in ((128, 128), (512, 512), (512, 128), (128, 512)):
        x = jnp.asarray(rng.integers(0, 120, (T, w)), jnp.int32)
        idx = jnp.asarray(rng.integers(-5, w + 5, (T, wo)), jnp.int32)

        def kern(x_ref, i_ref, o_ref, w=w, wo=wo):
            o_ref[:] = tb._taa(x_ref[:], i_ref[:], T, w, wo=wo)
        out = run(f"taa w={w} wo={wo} T={T}", kern,
                  jax.ShapeDtypeStruct((T, wo), jnp.int32), x, idx)
        if out is not None:
            ref = np.asarray(x)[np.arange(T)[:, None],
                                np.clip(np.asarray(idx), 0, w - 1)]
            assert (out == ref).all(), f"taa WRONG at w={w} wo={wo}"


def probe_lit():
    for w in (128, 256, 512):
        lt = tb._LitTable(w)
        data = [b"alpha-" + bytes([65 + i]) * (w // 2) for i in range(3)]
        for d in data:
            lt.register(d)
        lits = jnp.asarray(lt.array())

        def kern(l_ref, o_ref, lt=lt, w=w, data=data):
            lit = tb._mk_lit(l_ref, lt, T)
            buf, ln = lit(data[1])
            o_ref[:] = buf + ln
        run(f"lit w={w} T={T}", kern,
            jax.ShapeDtypeStruct((T, w), jnp.int32), lits)


def probe_dec():
    for w in (128, 512):
        v = jnp.arange(T, dtype=jnp.int32).reshape(T, 1) * 9321 - 12345

        def kern(v_ref, o_ref, w=w):
            buf, nd = tb._int_to_dec(v_ref[:], T, w)
            o_ref[:] = buf + nd
        run(f"dec w={w} T={T}", kern,
            jax.ShapeDtypeStruct((T, w), jnp.int32), v)


def probe_wr():
    for regw in (128, 256, 512):
        regs = jnp.zeros((T, regw), jnp.int32)
        mask = jnp.ones((T, 1), jnp.bool_)

        def kern(r_ref, o_ref, regw=regw):
            r = r_ref[:]
            # write a high column (c >= 128) like adventure's list metas
            r = tb._wr(r, regw - 7, jnp.int32(42), mask)
            o_ref[:] = r
        run(f"wr regw={regw} T={T}", kern,
            jax.ShapeDtypeStruct((T, regw), jnp.int32), regs)


def probe_rd_bc():
    # _rd of a high column gives (T,1) sliced at lane offset >= 128;
    # broadcasting it across a wide row is the IPrint/out_len pattern
    for regw, w in ((256, 512), (512, 512)):
        regs = jnp.ones((T, regw), jnp.int32) * 7

        def kern(r_ref, o_ref, regw=regw, w=w):
            v = jax.lax.slice_in_dim(r_ref[:], regw - 3, regw - 2, axis=1)
            pos = jax.lax.broadcasted_iota(jnp.int32, (T, w), 1)
            o_ref[:] = jnp.where(pos >= v, pos, -v)
        run(f"rd_bc regw={regw} w={w} T={T}", kern,
            jax.ShapeDtypeStruct((T, w), jnp.int32), regs)


def probe_slice_bc():
    # the MLIR failure verbatim: a (1,128) row sliced from lane offset
    # 128 of a (1,256), broadcast to (128,128)
    for off in (0, 128):
        x = jnp.arange(256, dtype=jnp.int32).reshape(1, 256)

        def kern(x_ref, o_ref, off=off):
            row = jax.lax.slice_in_dim(x_ref[:], off, off + 128, axis=1)
            o_ref[:] = jnp.broadcast_to(row, (T, 128))
        run(f"slice_bc off={off} T={T}", kern,
            jax.ShapeDtypeStruct((T, 128), jnp.int32), x)


if __name__ == "__main__":
    which = sys.argv[1:] or ["taa", "lit", "dec", "wr", "rd_bc",
                             "slice_bc"]
    for name in which:
        globals()[f"probe_{name}"]()

"""Pallas TPU kernel: fused brace scan for the interpolation hot loop.

One VMEM pass over a block of strings computes everything the innermost-
first substitution step needs per string (reference semantics documented in
ops/interp_kernel.py):

  * visible (non-escape-hidden) '{' / '}' counts,
  * outer_from — the rightmost visible '{',
  * inner_to — the next visible '}' after it.

The pure-XLA formulation materializes several masked intermediates per
quantity; on the TPU backend each shows up as a separately laid-out
buffer, which is slow to compile and wasteful of HBM bandwidth at
100k-instance batches. Here the byte block is loaded into VMEM once and all
four quantities come out of registers (pallas_guide.md: VPU elementwise +
reductions, iota via broadcasted_iota, min tile (32, 128) for int8 data —
uint8 bytes ride in as int32 lanes to keep the tiling simple).

The kernel is validated in interpreter mode against the jnp reference
implementation (tests/test_pallas_scan.py), wired into the general VM's
interpolation loop via ``brace_scan_one`` (ops/interp_kernel.py:
general_interpolate), and selected by IE_TPU_PALLAS: ``1`` → real Mosaic
kernel (TPU), ``interpret`` → Pallas interpreter (CPU differential tests),
unset → the pure-jnp formulation. The whole-VM turbo engine (vm/turbo.py)
is the flagship Pallas path; this kernel serves the general lax.switch VM.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from ..vm.bytestr import BACKSLASH, BRACE_CLOSE, BRACE_OPEN

_BLOCK = 256  # strings per grid step


def pallas_mode():
    """'tpu' (real kernel) / 'interpret' (CPU tests) / None (pure jnp).

    Read at trace time — ops/interp_kernel.py keys its jit caches on this.
    """
    v = os.environ.get("IE_TPU_PALLAS", "")
    if v in ("1", "tpu"):
        return "tpu"
    if v == "interpret":
        return "interpret"
    return None


def brace_scan_one(buf, length):
    """Per-lane brace scan → (n_open, n_close, outer_from, inner_to).

    Pallas kernel when IE_TPU_PALLAS selects it (vmap batches the call into
    the kernel grid), else the same quantities in pure jnp.
    """
    mode = pallas_mode()
    if mode is None:
        from ..vm import bytestr as bs
        hidden = bs.escape_hidden_mask(buf, length)
        n_open = bs.count(buf, length, BRACE_OPEN, hidden)
        n_close = bs.count(buf, length, BRACE_CLOSE, hidden)
        outer_from = bs.rfind(buf, length, BRACE_OPEN, hidden)
        inner_to = bs.find(buf, length, BRACE_CLOSE, outer_from + 1, hidden)
        return n_open, n_close, outer_from, inner_to
    out = _scan_call_one(buf, jnp.asarray(length, jnp.int32),
                         interpret=(mode == "interpret"))
    return out[0], out[1], out[2], out[3]


@functools.partial(jax.jit, static_argnames=("interpret",))
def _scan_call_one(buf, length, interpret: bool = False):
    from jax.experimental import pallas as pl

    MS = buf.shape[0]
    out = pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((1, 4), jnp.int32),
        interpret=interpret,
    )(buf.astype(jnp.int32)[None, :], length.reshape(1, 1))
    return out[0]


def _scan_kernel(buf_ref, len_ref, out_ref):
    """buf: [B, MS] int32 (byte values); len: [B, 1]; out: [B, 4] int32."""
    buf = buf_ref[:]                       # [B, MS]
    length = len_ref[:]                    # [B, 1]
    B, MS = buf.shape

    pos = jax.lax.broadcasted_iota(jnp.int32, (B, MS), dimension=1)
    in_range = pos < length

    prev = jnp.concatenate(
        [jnp.zeros((B, 1), buf.dtype), buf[:, :-1]], axis=1)
    hidden = ((buf == BRACE_OPEN) | (buf == BRACE_CLOSE)) & \
        (prev == BACKSLASH)

    open_vis = (buf == BRACE_OPEN) & ~hidden & in_range
    close_vis = (buf == BRACE_CLOSE) & ~hidden & in_range

    n_open = jnp.sum(open_vis.astype(jnp.int32), axis=1, keepdims=True)
    n_close = jnp.sum(close_vis.astype(jnp.int32), axis=1, keepdims=True)

    # rightmost visible '{'
    outer_from = jnp.max(jnp.where(open_vis, pos, -1), axis=1, keepdims=True)
    # first visible '}' strictly after outer_from
    after = close_vis & (pos > outer_from)
    inner_to = jnp.min(jnp.where(after, pos, MS + 1), axis=1, keepdims=True)
    inner_to = jnp.where(inner_to > MS, -1, inner_to)

    out_ref[:] = jnp.concatenate(
        [n_open, n_close, outer_from, inner_to], axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def brace_scan_pallas(bufs: jnp.ndarray, lengths: jnp.ndarray,
                      interpret: bool = False):
    """Batched brace scan. bufs: [N, MS] uint8; lengths: [N] int32.

    Returns [N, 4] int32: (n_open, n_close, outer_from, inner_to).
    """
    from jax.experimental import pallas as pl

    N, MS = bufs.shape
    pad = (-N) % _BLOCK
    if pad:
        bufs = jnp.pad(bufs, ((0, pad), (0, 0)))
        lengths = jnp.pad(lengths, (0, pad))
    total = bufs.shape[0]

    out = pl.pallas_call(
        _scan_kernel,
        out_shape=jax.ShapeDtypeStruct((total, 4), jnp.int32),
        grid=(total // _BLOCK,),
        in_specs=[
            pl.BlockSpec((_BLOCK, MS), lambda i: (i, 0)),
            pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_BLOCK, 4), lambda i: (i, 0)),
        interpret=interpret,
    )(bufs.astype(jnp.int32), lengths.astype(jnp.int32).reshape(-1, 1))
    return out[:N]


def brace_scan_reference(bufs: jnp.ndarray, lengths: jnp.ndarray):
    """Pure-jnp reference (the quantities as ops/interp_kernel computes them)."""
    from ..vm import bytestr as bs

    def one(buf, length):
        hidden = bs.escape_hidden_mask(buf, length)
        n_open = bs.count(buf, length, bs.BRACE_OPEN, hidden)
        n_close = bs.count(buf, length, bs.BRACE_CLOSE, hidden)
        outer_from = bs.rfind(buf, length, bs.BRACE_OPEN, hidden)
        inner_to = bs.find(buf, length, bs.BRACE_CLOSE, outer_from + 1, hidden)
        return jnp.stack([n_open, n_close, outer_from, inner_to])

    return jax.vmap(one)(bufs, lengths)

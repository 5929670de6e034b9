"""Turbo engine: the whole VM step loop as ONE Pallas TPU kernel.

The general engine (vm/step.py) interprets the instruction table with a
lax.switch over *opcodes*, paying hundreds of unfused XLA ops (~20 µs launch
overhead each — benchmarks/README.md) per step. The turbo engine compiles
each *program* into a single Mosaic kernel that runs K VM steps per launch:

* dispatch is ``lax.switch`` over the **program counter**; every branch is
  the instruction at that pc, specialized at trace time from the turbo plan
  (compiler/turbo.py): static insert slots, segmented templates, decomposed
  wildcard patterns, unrolled RPN math.
* state lives in VMEM for all K steps; the grid streams instance tiles
  HBM→VMEM→HBM once per launch (not once per step).
* divergence uses min-pc scheduling: each inner step executes the lowest
  live pc, masked to the lanes sitting at it — lockstep batches pay one
  branch per step (the common case for batched rollouts); divergent batches
  serialize per distinct pc, which is the SIMT-convergence optimum for a
  single-kernel VM.

Semantics contract: identical to the host oracle or PARK. Lanes hitting
anything the specialized branches can't reproduce byte-exactly (missing
keys on strict ops, value strings carrying braces/escapes, capacity
overflow, host-op instructions) park; the ring executes the *original* task
with the exact host executor and resumes — same protocol as vm/driver.py.

Layouts (N instances, S static slots, W slot-string bytes, OW output bytes;
int32 everywhere — Mosaic has no uint8 vectors, benchmarks/mosaic_probe2):

  regs : (N, REGW)  ALL per-lane scalars packed into one lane-padded block
                    (REGW = multiple of 128 computed by _Cols): pc, status,
                    steps, out_len, parallel-lane bookkeeping (cur_tid,
                    par_mode, par_join, par_epoch, per-lane tpc/tstate/
                    tparg), per-slot type/int/len, for-loop counters, and
                    per-list-slot element type/int/len cells. (Separate
                    (N,1)/(N,S) arrays each pad to 128 lanes physically —
                    packing them 8× over blew scoped VMEM.)
  sbuf : (R, N, W)  byte planes: one row per str/mix slot, then packed
                    element rows per list slot (width//elem_width elements
                    per row)
  out  : (N, OW)    output buffer bytes

Parallel blocks run as in-kernel thread lanes mirroring the general VM's
scheduler (vm/step.py h_par_begin/h_thread_end/thread_yield); an instance
that PARKS inside a parallel block is serviced lane-by-lane THROUGH THE
TURBO RING (vm/lanering.py — the exact asyncio twin shared with the
general engine) and resumes on device, so blocking IO inside a
parallel_race keeps the batch on the fast path. Values that outgrow the
static slot widths promote the instance into one wider sibling batch
(then, failing that, one shared batched general-engine run) — never
per-instance runners.
"""

from __future__ import annotations

import os
import sys
from dataclasses import dataclass
from types import SimpleNamespace
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from ..compiler.turbo import (
    Hole,
    IClear,
    IDelete,
    IForHead,
    IForHeadDyn,
    IForNext,
    IGoto,
    IGotoMap,
    IHalt,
    IListAppend,
    IListConcat,
    IListIndex,
    IListJoin,
    IListNew,
    IListRemove,
    IListSlice,
    IMath,
    INop,
    IPark,
    IParBegin,
    IPrint,
    ISet,
    IThreadEnd,
    K_LIST,
    Lit,
    NotTurbo,
    TurboPlan,
)
from .config import (DONE, PARKED, PM_DRAIN, PM_NONE, PM_RACE, PM_WAIT,
                     RUNNING, T_DONE, T_FREE, T_NEW, T_READY, T_WAIT)
from .state import T_EMPTY, T_INT, T_LIST, T_STR

BRACE_OPEN, BRACE_CLOSE, BACKSLASH = 123, 125, 92

# fixed control columns; everything after is computed by _Cols
C_PC, C_STATUS, C_STEPS, C_OUTLEN = 0, 1, 2, 3
C_CURTID, C_PARMODE, C_PARJOIN, C_PAREPOCH = 4, 5, 6, 7
# count of in-kernel `clear`s: the host-side output spill (_out_prefix)
# is tagged with the epoch it was drained at, so a later device-side
# clear correctly erases it (decode ignores a stale-epoch prefix)
C_CLREPOCH = 8
C_BASE = 9


@dataclass(frozen=True)
class TurboConfig:
    tile: int = 512     # instances per grid step (VMEM-resident)
    width: int = 128    # slot string bytes (lane dimension; keep ×128)
    out_width: int = 256
    k_steps: int = 32   # VM steps per kernel launch
    list_cap: int = 12  # elements per list slot
    elem_width: int = 32  # bytes per list element (packed width//this per row)
    # dispatch-tree leaf width: a leaf executes this many CONSECUTIVE
    # branches per carry step (superblock retirement). Larger leaves shrink
    # the cond tree and retire more straight-line instructions per carry
    # step, at the cost of fatter per-leaf scoped-VMEM temporaries.
    # Forward jumps keep retiring inside a leaf (every branch self-selects
    # on pc == p), so a lane can traverse more than LEAF of pc-space per
    # carry step. Measured on the adventure workload (131072 instances,
    # real v5e): leaf=4 → 25.6M, 8 → 45.1M, 16 → 72.1M, 32 → 109.3M,
    # 64 → 120.2M, 128 (≥ n_instr: no tree, pure straight-line) → 133.8M
    # tasks/s. The default stays moderate because compile time grows with
    # the fattest leaf (leaf=128 ≈ 42 min cold on axon vs ≈ 6 min at 32);
    # bench.py pins leaf=128 where the compile is cached.
    leaf: int = 32
    # Mosaic's scoped-VMEM budget for kernel temporaries. The default limit
    # is 16 MiB; a v5e core has 128 MiB of VMEM, and the mega-kernel's
    # resident blocks (regs/sbuf/out tiles, double-buffered) are small next
    # to the fattest dispatch branch's temporaries, so raise the scoped
    # budget and let big tiles compile instead of failing at 17.2M/16M.
    vmem_limit_bytes: int = 100 * 1024 * 1024


class _Cols:
    """Register-column layout (lane-padded to a multiple of 128):

      0-3   pc, status, steps, out_len
      4-7   cur_tid, par_mode, par_join, par_epoch
      8     clear-epoch (output-spill invalidation)
      9..   tpc[NT], tstate[NT], tparg[NT]      (parallel thread lanes)
      then  stype[S], sint[S], slen[S]          (slen of a list = count)
      then  loop counters [n_loops]
      then  per list slot: etype[E], eint[E], elen[E]

    plus the plan's slot-kind table: byte planes exist only for slots that
    can ever hold a string (kind 'str'/'mix'); 'int' and 'none' slots are
    register-only, and branch builders skip their dead paths entirely.

    List slots own (a) one META row — element scalars packed into the 128
    lanes of a single int32 plane: lanes [0,E) = etype, [E,2E) = eint,
    [2E,3E) = elen — so whole-pool scalar moves (slice/remove/concat) are
    ONE lane-gather instead of E² register selects; and (b) packed element
    byte rows: PACK = width // elem_width elements per row,
    ceil(E / PACK) rows each. Meta + element rows append after the string
    rows."""

    def __init__(self, S: int, kinds=None, n_loops: int = 0,
                 nt: int = 0, list_cap: int = 12, width: int = 128,
                 elem_width: int = 32, elem_kinds=None):
        self.ekinds = dict(elem_kinds or {})
        self.S = S
        self.n_loops = n_loops
        self.nt = nt
        self.E = list_cap
        self.ew = elem_width
        self.pack = max(width // elem_width, 1)
        self.width = width
        if 3 * self.E > 128:
            raise NotTurbo(f"list_cap {self.E} exceeds the meta row "
                           f"(3*E must fit 128 lanes)")
        self.kinds = list(kinds) if kinds else ["mix"] * S
        if len(self.kinds) < S:
            self.kinds += ["mix"] * (S - len(self.kinds))
        self._threads0 = C_BASE
        self._slots0 = self._threads0 + 3 * nt
        self._loops0 = self._slots0 + 3 * S
        self.list_ord = {}
        for s, k in enumerate(self.kinds):
            if k == "list":
                self.list_ord[s] = len(self.list_ord)
        n_cols = self._loops0 + n_loops
        self.regw = max(((n_cols + 127) // 128) * 128, 128)
        if self.regw > 512:
            raise NotTurbo(
                f"{S} slots / {nt} lanes need {n_cols} register "
                f"columns (> 512)")
        self.str_row = {}
        for s, k in enumerate(self.kinds):
            if k in ("str", "mix"):
                self.str_row[s] = len(self.str_row)
        self.elem_rows = (self.E + self.pack - 1) // self.pack
        self.meta_row = {}    # list slot -> meta row index
        self.list_row0 = {}   # list slot -> first element byte row
        nrows = len(self.str_row)
        for s in sorted(self.list_ord):
            self.meta_row[s] = nrows
            self.list_row0[s] = nrows + 1
            nrows += 1 + self.elem_rows
        self.n_rows = max(nrows, 1)

    def stype(self, s: int) -> int:
        return self._slots0 + s

    def sint(self, s: int) -> int:
        return self._slots0 + self.S + s

    def slen(self, s: int) -> int:
        return self._slots0 + 2 * self.S + s

    def loop(self, loop_id: int) -> int:
        return self._loops0 + min(loop_id, max(self.n_loops - 1, 0))

    def kind(self, s: int) -> str:
        return self.kinds[s]

    def ekind(self, s: int) -> str:
        """Element kind of list slot s ('int'/'str'/'mix') — dead-path
        elision for the repr/join loops."""
        return self.ekinds.get(s, "mix")

    # thread lanes
    def tpc(self, lane: int) -> int:
        return self._threads0 + lane

    def tstate(self, lane: int) -> int:
        return self._threads0 + self.nt + lane

    def tparg(self, lane: int) -> int:
        return self._threads0 + 2 * self.nt + lane

    def elem_pos(self, s: int, e: int) -> tuple:
        """(byte row, byte offset) of element e of list slot s."""
        return (self.list_row0[s] + e // self.pack,
                (e % self.pack) * self.ew)


class TurboBatch(NamedTuple):
    regs: jnp.ndarray    # (N, 128) int32
    sbuf: jnp.ndarray    # (S, N, W) int32 (ascii bytes)
    out: jnp.ndarray     # (N, OW) int32 (ascii bytes)


class _TS(NamedTuple):
    """Kernel-internal tile state (VMEM values carried through the loop)."""
    regs: jnp.ndarray    # (TILE, 128)
    strs: tuple          # S arrays (TILE, W)
    out: jnp.ndarray     # (TILE, OW)


# ---------------------------------------------------------------------------
# trace-time building blocks (all shapes static)
# ---------------------------------------------------------------------------

def _iota(t, w):
    return jax.lax.broadcasted_iota(jnp.int32, (t, w), 1)


_PW = 128  # Mosaic dynamic_gather operates on exactly one 128-lane vreg


def _taa(src, idx, t: int, w: int, wo: int | None = None):
    """Mosaic-safe per-lane gather over the lane dim:
    ``out[:, j] = src[:, clip(idx[:, j], 0, w-1)]`` — src (t, w), idx
    (t, wo), out (t, wo); wo defaults to w.

    Mosaic's dim-1 ``tpu.dynamic_gather`` compiles only at EXACTLY 128
    lanes / int32 (benchmarks/mosaic_probe7.py: 256- and 512-lane and
    uint8 gathers all fail to compile), so a same-shape take_along_axis
    is legal only at (t, 128). Wider rows decompose into 128-lane
    chunks: each output chunk gathers every source chunk at the local
    index and chunk-selects — ceil(w/128)*ceil(wo/128) vreg gathers."""
    wo = w if wo is None else wo
    idx = jnp.clip(idx, 0, w - 1)
    if w == _PW and wo == _PW:
        return jnp.take_along_axis(src, idx, axis=1)
    ncs = -(-w // _PW)
    if ncs * _PW != w:
        src = jnp.pad(src, ((0, 0), (0, ncs * _PW - w)))
    nco = -(-wo // _PW)
    if nco * _PW != wo:
        idx = jnp.pad(idx, ((0, 0), (0, nco * _PW - wo)))
    chunks = []
    for c in range(nco):
        ic = jax.lax.slice_in_dim(idx, c * _PW, (c + 1) * _PW, axis=1)
        loc = ic % _PW
        sel = ic // _PW
        acc = None
        for s in range(ncs):
            sc = jax.lax.slice_in_dim(src, s * _PW, (s + 1) * _PW, axis=1)
            g = jnp.take_along_axis(sc, loc, axis=1)
            acc = g if acc is None else jnp.where(sel == s, g, acc)
        chunks.append(acc)
    out = chunks[0] if nco == 1 else jnp.concatenate(chunks, axis=1)
    return out[:, :wo] if nco * _PW != wo else out


def _shift_static(src, k: int, w: int):
    """``out[:, j] = src[:, j + k]`` for STATIC k (zeros shift in; k may
    be negative = right shift). Implemented as pad+slice, NOT a _taa
    gather: Mosaic miscompiles gathers whose index folds to a pure
    affine function of the lane iota at w > 128 — SIGABRT at w=512
    (benchmarks/mosaic_probe9c.py taa_affine), and the r04 wide-kernel
    "Invalid input layout" on a vector.broadcast traces to the same
    folding (benchmarks/r04_runs/adventure_real2.err). Row-varying
    (traced-scalar) indices are unaffected and stay on _taa."""
    if k == 0:
        return src
    if k > 0:
        return jnp.pad(src, ((0, 0), (0, k)))[:, k:]
    return jnp.pad(src, ((0, 0), (-k, 0)))[:, :src.shape[1]]


def _rd(ts: _TS, c: int):
    return jax.lax.slice_in_dim(ts.regs, c, c + 1, axis=1)


def _wr(regs, c: int, val, mask):
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, regs.shape[1]), 1)
    return jnp.where(mask & (lane == c), val, regs)


class _LitTable:
    """Byte literals threaded into the kernel as ONE (L, w) input array —
    Pallas forbids captured array constants. Registered during a pre-pass
    over the plan IR; read inside the kernel via a static row index."""

    def __init__(self, w: int):
        self.w = w
        self.index: dict[bytes, int] = {}

    def register(self, data: bytes) -> int:
        if len(data) > self.w:
            raise NotTurbo(f"literal longer than slot width: {data[:32]!r}…")
        if data not in self.index:
            self.index[data] = len(self.index)
        return self.index[data]

    def array(self) -> np.ndarray:
        """Literal bytes as a kernel input. Rows wider than one 128-lane
        vreg are pre-tiled HOST-side to (L*ncs, 128): Mosaic cannot
        broadcast a (1, w) row whose chunks sit at non-zero lane offsets
        (vector.broadcast 'Invalid input layout' at w=512, real v5e), so
        _mk_lit broadcasts per offset-0 chunk row and concatenates."""
        table = np.zeros((max(len(self.index), 1), self.w), np.int32)
        for data, i in self.index.items():
            table[i, :len(data)] = list(data)
        if self.w > _PW:
            ncs = -(-self.w // _PW)
            if ncs * _PW != self.w:
                table = np.pad(table, ((0, 0), (0, ncs * _PW - self.w)))
            table = table.reshape(table.shape[0] * ncs, _PW)
        return table

    def collect(self, instrs) -> None:
        for ins in instrs:
            if isinstance(ins, IForHead):
                for _slot, elems in ins.pairs:
                    for kind, v in elems:
                        if kind == "str":
                            self.register(v)
            elif isinstance(ins, ISet):
                self._collect_item(ins.src)
            elif isinstance(ins, IListNew):
                for e in ins.elems:
                    self._collect_item(e)
            elif isinstance(ins, (IListAppend, IListRemove)):
                self._collect_item(ins.item)
            elif isinstance(ins, IListJoin):
                self._collect_tmpl(ins.before)
                self._collect_tmpl(ins.between)
                self._collect_tmpl(ins.after)
            elif isinstance(ins, IPrint):
                self._collect_tmpl(ins.tmpl)
            elif isinstance(ins, IGotoMap):
                self._collect_tmpl(ins.tmpl)
                for pat, _tpc in ins.entries:
                    for part in pat[1:]:
                        self.register(part)

    def _collect_item(self, src) -> None:
        if src[0] == "str":
            self.register(src[1])
        elif src[0] == "tmpl":
            self._collect_tmpl(src[1])

    def _collect_tmpl(self, tmpl):
        for seg in tmpl:
            if isinstance(seg, Lit):
                self.register(seg.data)


def plan_fingerprint(plan: TurboPlan, tcfg: TurboConfig) -> str:
    """Canonical shape of the kernel this plan traces (the AOT cache key
    basis — VERDICT r3 next #4).

    Everything the branch builders bake into the trace stays verbatim
    (int constants, jump targets, slot ids, slot/element kinds, park
    kinds); string-literal BYTES are abstracted to their literal-table
    (row, length) — literal contents are threaded into the kernel as an
    INPUT array (_LitTable/lits_ref, and build_step_fn passes it as a
    jit argument), so two programs whose plans differ only in same-length
    string literals trace to one module and share one executable. The one
    byte-baking exception: int-dispatch goto_maps (single int-kind hole +
    exact/any keys) parse their key bytes into scalar compares at trace
    time, so those entries keep their bytes verbatim."""
    import dataclasses as _dc
    table = _LitTable(tcfg.width)
    table.collect(plan.instrs)
    cols = _make_cols(plan, tcfg)

    def lit_key(data: bytes):
        row = table.index.get(data)
        if row is None:
            return ("lit!", data)   # never loaded via lits_ref: baked
        return ("lit", row, len(data))

    def canon(x):
        if isinstance(x, bytes):
            return lit_key(x)
        if isinstance(x, Lit):
            return ("Lit",) + lit_key(x.data)
        if isinstance(x, Hole):
            return ("Hole", x.slot)
        if isinstance(x, (list, tuple)):
            return tuple(canon(v) for v in x)
        if isinstance(x, (int, str, bool)) or x is None:
            return x
        raise TypeError(f"unexpected plan field type {type(x).__name__}")

    parts = []
    for ins in plan.instrs:
        fields = tuple(canon(getattr(ins, f.name))
                       for f in _dc.fields(ins))
        entry = (type(ins).__name__, fields)
        if isinstance(ins, IGotoMap):
            int_dispatch = (
                len(ins.tmpl) == 1 and isinstance(ins.tmpl[0], Hole)
                and cols.kind(ins.tmpl[0].slot) == "int"
                and all(p[0] in ("exact", "any")
                        for p, _t in ins.entries))
            if int_dispatch:
                entry = entry + (tuple(ins.entries),)
        parts.append(entry)
    shape = (tuple(parts), tuple(plan.slot_kinds),
             tuple(sorted(plan.elem_kinds.items())),
             plan.n_slots, plan.needs_threads, plan.compiled.n_loops,
             tuple(sorted(plan.park_kind_of.items())))
    return repr(shape)


def _mk_lit(lits_ref, table: _LitTable, t: int):
    """Kernel-side literal loader: data -> ((t, w) bytes, python-int len).

    For w > 128 the table arrives pre-tiled as (L*ncs, 128) (see
    _LitTable.array): each chunk row broadcasts from lane offset 0 —
    the only broadcast Mosaic accepts — and the chunks concatenate."""
    w = table.w
    if w <= _PW:
        def lit(data: bytes):
            row = lits_ref[table.index[data]]      # (w,) static row
            return jnp.broadcast_to(row[None, :], (t, w)), len(data)
        return lit
    ncs = -(-w // _PW)

    def lit(data: bytes):
        i = table.index[data]
        full = jnp.concatenate(
            [jnp.broadcast_to(lits_ref[i * ncs + c][None, :], (t, _PW))
             for c in range(ncs)], axis=1)
        return (full[:, :w] if ncs * _PW != w else full), len(data)
    return lit


_POW10 = [10 ** k for k in range(10)]


def _int_to_dec(v, t: int, w: int):
    """Decimal ascii of (t,1) int32 → ((t,w) bytes, (t,1) len). Matches
    Python str(int) incl. INT32_MIN (two's-complement magnitude)."""
    neg = v < 0
    mag = jnp.where(neg, (~v).astype(jnp.uint32) + jnp.uint32(1),
                    v.astype(jnp.uint32))
    nd = jnp.int32(1) + sum(
        (mag >= jnp.uint32(p)).astype(jnp.int32) for p in _POW10[1:])
    cols = [((mag // jnp.uint32(p)) % jnp.uint32(10)).astype(jnp.int32)
            for p in _POW10]
    table = jnp.pad(jnp.concatenate(cols, axis=1), ((0, 0), (0, w - 10)))
    pos = _iota(t, w)
    e = nd - 1 - pos
    dig = _taa(table, e, t, w)
    buf = jnp.where(pos < nd, dig + 48, 0)
    # sign: shift digits right one, '-' (45) at position 0 (static
    # shift — see _shift_static for why this must not be a gather)
    shifted = _shift_static(buf, -1, w)
    nbuf = jnp.where(pos == 0, 45, jnp.where(pos < nd + 1, shifted, 0))
    buf = jnp.where(neg, nbuf, buf)
    return buf, nd + neg.astype(jnp.int32)


def _parse_dec(buf, ln, t: int, w: int):
    """Parse optionally-signed decimal ascii → ((t,1) int32, ok). Values
    needing >9 digits stay unparsed (ok=False → park, host exact)."""
    pos = _iota(t, w)
    b0 = jax.lax.slice_in_dim(buf, 0, 1, axis=1)
    has_sign = (ln > 0) & ((b0 == 45) | (b0 == 43))
    neg = has_sign & (b0 == 45)
    start = has_sign.astype(jnp.int32)
    in_rng = (pos >= start) & (pos < ln)
    is_digit = (buf >= 48) & (buf <= 57)
    ndig = ln - start
    ok = (ndig > 0) & (ndig <= 9) & \
        jnp.all(~in_rng | is_digit, axis=1, keepdims=True)
    # powers-of-ten table built from traced ops (array constants cannot be
    # captured by a Pallas kernel)
    ones = (ln * 0) + 1
    cols = [ones]
    for _ in range(9):
        cols.append(cols[-1] * 10)
    ptab = jnp.pad(jnp.concatenate(cols, axis=1), ((0, 0), (0, w - 10)))
    powv = _taa(ptab, ln - 1 - pos, t, w)
    val = jnp.sum(jnp.where(in_rng, (buf - 48) * powv, 0),
                  axis=1, keepdims=True)
    return jnp.where(neg, -val, val), ok


def _has_brace_or_escape(buf, ln, t: int, w: int):
    pos = _iota(t, w)
    bad = ((buf == BRACE_OPEN) | (buf == BRACE_CLOSE) | (buf == BACKSLASH)) \
        & (pos < ln)
    return jnp.any(bad, axis=1, keepdims=True)


def _append(buf, ln, sbuf, sln, t: int, w: int):
    """Append (sbuf, sln) onto (buf, ln) at the dynamic offset ln."""
    pos = _iota(t, w)
    shifted = _taa(sbuf, pos - ln, t, w)
    return jnp.where((pos >= ln) & (pos < ln + sln), shifted, buf), ln + sln


def _elem_bytes_static(ts: _TS, cols: _Cols, s: int, e: int, t: int,
                       w: int):
    """Left-aligned byte buffer of element e (STATIC index) of list slot
    s; bytes past the element's length are zero."""
    row, off = cols.elem_pos(s, e)
    src = ts.strs[row]
    if off:
        # off is a STATIC byte offset — static shift, not a gather
        # (see _shift_static)
        src = _shift_static(src, off, w)
    el = jax.lax.slice_in_dim(ts.strs[cols.meta_row[s]],
                              2 * cols.E + e, 2 * cols.E + e + 1, axis=1)
    pos = _iota(t, w)
    return jnp.where(pos < jnp.minimum(el, cols.ew), src, 0)


def _meta_cell_static(ts: _TS, cols: _Cols, s: int, e: int):
    """(etype, eint, elen) of STATIC element e — free static slices."""
    row = ts.strs[cols.meta_row[s]]
    E = cols.E
    return (jax.lax.slice_in_dim(row, e, e + 1, axis=1),
            jax.lax.slice_in_dim(row, E + e, E + e + 1, axis=1),
            jax.lax.slice_in_dim(row, 2 * E + e, 2 * E + e + 1, axis=1))


def _meta_cell_dyn(ts: _TS, cols: _Cols, s: int, j, t: int, w: int):
    """(etype, eint, elen) of DYNAMIC element j — three mask-reduces."""
    row = ts.strs[cols.meta_row[s]]
    lane = _iota(t, w)

    def sec(base):
        return jnp.sum(jnp.where(lane == base + j, row, 0), axis=1,
                       keepdims=True)
    return sec(0), sec(cols.E), sec(2 * cols.E)


def _meta_write_cell(row, cols: _Cols, j, et, ei, el, mask, t: int,
                     w: int):
    """Write one (dynamic) element's scalars into a meta row."""
    lane = _iota(t, w)
    E = cols.E
    v = jnp.where(lane == j, et,
                  jnp.where(lane == E + j, ei,
                            jnp.where(lane == 2 * E + j, el, row)))
    return jnp.where(mask, v, row)


def _meta_shift(row, cols: _Cols, k, t: int, w: int):
    """Every section's cells shifted left by (dynamic) k elements
    (negative k shifts right). Cross-section bleed lands only in cells at
    or past each section's new count — never read."""
    lane = _iota(t, w)
    return _taa(row, lane + k, t, w)


def _lane_rel(cols: _Cols, t: int, w: int):
    """lane % E for the three meta sections (junk past lane 3E)."""
    return _iota(t, w) % cols.E


def _pool_rows(ts: _TS, cols: _Cols, s: int):
    return [ts.strs[cols.list_row0[s] + r] for r in range(cols.elem_rows)]


def _pool_shift_left_bytes(ts: _TS, cols: _Cols, s: int, off, t: int,
                           w: int):
    """Element byte rows of s shifted LEFT by dynamic byte offset off —
    ER(ER+1)/2 same-shape gathers total."""
    rows = _pool_rows(ts, cols, s)
    pos = _iota(t, w)
    out = []
    for r in range(cols.elem_rows):
        acc = rows[r] * 0
        for q in range(r, cols.elem_rows):
            rel = off + (r - q) * w
            idx = pos + rel
            g = _taa(rows[q], idx, t, w)
            acc = jnp.where((idx >= 0) & (idx < w), g, acc)
        out.append(acc)
    return out


def _pool_place_bytes(strs: list, cols: _Cols, s: int, payload, off,
                      mask, nbytes, t: int, w: int):
    """Write `nbytes` bytes of the left-aligned payload into slot s's
    byte pool at dynamic byte offset `off` (masked lanes only; the whole
    window is overwritten, clearing stale bytes)."""
    pos = _iota(t, w)
    for r in range(cols.elem_rows):
        row_i = cols.list_row0[s] + r
        idx = pos + r * w - off
        g = _taa(payload, idx, t, w)
        win = (idx >= 0) & (idx < nbytes)
        strs[row_i] = jnp.where(mask & win, g, strs[row_i])


def _elem_read(ts: _TS, cols: _Cols, s: int, j, t: int, w: int):
    """Read element at DYNAMIC 0-based index j of list slot s →
    (etype, eint, elen, ebuf) with ebuf left-aligned (t, w)."""
    et, ei, el = _meta_cell_dyn(ts, cols, s, j, t, w)
    row0 = cols.list_row0[s]
    acc = ts.strs[row0]
    for r in range(1, cols.elem_rows):
        acc = jnp.where((j // cols.pack) == r, ts.strs[row0 + r], acc)
    off = (j % cols.pack) * cols.ew
    pos = _iota(t, w)
    ebuf = _taa(acc, pos + off, t, w)
    ebuf = jnp.where(pos < jnp.minimum(el, cols.ew), ebuf, 0)
    return et, ei, el, ebuf


def _repr_list(ts: _TS, cols: _Cols, s: int, t: int, w: int):
    """Python ``str(list)`` of list slot s → (buf, ln, park): ``['a', 1]``
    — the reference stringifies interpolated values with str()
    (interpolation_engine.py:531), so lists render as their repr. Parks on
    string elements whose repr needs escaping or quote switching (bytes
    outside printable ASCII, ``'`` or ``\\``) — host exact."""
    pos = _iota(t, w)
    zero_i = _rd(ts, C_PC) * 0
    n = _rd(ts, cols.slen(s))
    park = zero_i == 1
    buf = jnp.where(pos == 0, 91, 0)            # '['
    ln = zero_i + 1
    one = zero_i + 1
    ek = cols.ekind(s)   # dead-path elision: str-only lists skip the
    #                      int→decimal loop (the fattest branch otherwise)
    for e in range(cols.E):
        live = e < n
        et, ei, el = _meta_cell_static(ts, cols, s, e)
        if ek == "str":
            # fused: separator + quotes + bytes in ONE append per element
            park = park | (live & (et != T_STR))
            ebuf = _elem_bytes_static(ts, cols, s, e, t, w)
            bad = jnp.any(((ebuf < 32) | (ebuf > 126) | (ebuf == 39) |
                           (ebuf == 92)) & (pos < el),
                          axis=1, keepdims=True)
            park = park | (live & bad)
            prefix = b"'" if e == 0 else b", '"
            plen = len(prefix)
            shifted = jnp.pad(ebuf, ((0, 0), (plen, 0)))[:, :w]
            qbuf = shifted
            for i, c in enumerate(prefix):
                qbuf = jnp.where(pos == i, c, qbuf)
            qbuf = jnp.where(pos == plen + el, 39, qbuf)   # closing '
            buf, ln = _append(buf, ln, qbuf,
                              jnp.where(live, plen + el + 1, 0), t, w)
            continue
        if e > 0:
            sep = jnp.where(pos == 0, 44, jnp.where(pos == 1, 32, 0))
            buf, ln = _append(buf, ln, sep, jnp.where(live, 2, 0), t, w)
        if ek == "int":
            park = park | (live & (et != T_INT))
            ibuf, iln = _int_to_dec(ei, t, w)
            buf, ln = _append(buf, ln, ibuf,
                              jnp.where(live, iln, 0), t, w)
            continue
        ebuf = _elem_bytes_static(ts, cols, s, e, t, w)
        bad = jnp.any(((ebuf < 32) | (ebuf > 126) | (ebuf == 39) |
                       (ebuf == 92)) & (pos < el),
                      axis=1, keepdims=True)
        is_str = et == T_STR
        park = park | (live & is_str & bad)
        quote = jnp.where(pos == 0, 39, 0)      # '\''
        q_len = jnp.where(live & is_str, one, 0)
        ibuf, iln = _int_to_dec(ei, t, w)
        body = jnp.where(is_str, ebuf, ibuf)
        blen = jnp.where(live, jnp.where(is_str, el, iln), 0)
        buf, ln = _append(buf, ln, quote, q_len, t, w)
        buf, ln = _append(buf, ln, body, blen, t, w)
        buf, ln = _append(buf, ln, quote, q_len, t, w)
    close = jnp.where(pos == 0, 93, 0)          # ']'
    buf, ln = _append(buf, ln, close, one, t, w)
    return buf, jnp.minimum(ln, w), park | (ln > w)


def _join_elems(ts: _TS, cols: _Cols, s: int, t: int, w: int,
                between=None):
    """''.join (optionally between-separated) of list slot s's elements →
    (buf, ln, park). Parks when an element isn't a string (host
    TypeError), or on overflow (ln > w, checked by the caller via ln)."""
    zero_i = _rd(ts, C_PC) * 0
    n = _rd(ts, cols.slen(s))
    buf = _iota(t, w) * 0
    ln = zero_i
    park = zero_i == 1
    for e in range(cols.E):
        live = e < n
        if between is not None and e > 0:
            bbuf, bln = between
            buf, ln = _append(buf, ln, bbuf,
                              jnp.where(live, bln, 0), t, w)
        et, _ei, el = _meta_cell_static(ts, cols, s, e)
        park = park | (live & (et != T_STR))
        ebuf = _elem_bytes_static(ts, cols, s, e, t, w)
        buf, ln = _append(buf, ln, ebuf, jnp.where(live, el, 0), t, w)
    return buf, jnp.minimum(ln, w), park | (ln > w)


def _render(ts: _TS, cols: _Cols, tmpl, t: int, w: int, lit):
    """Evaluate a segmented template → (buf, len, missing, park).

    ``missing`` = a hole's slot is empty (InterpolationException semantics;
    strict callers park, goto_map routes to NULL). ``park`` = overflow or a
    hole value carrying braces/escapes, whose re-scan semantics
    (interpolation_engine.py:516-535) only the host path reproduces.

    Segments are appended at a running offset; while the offset is still a
    trace-time constant (leading literals), appends are static shifts —
    the per-lane gather is only paid after the first variable-length hole.
    """
    zero_i = _rd(ts, C_PC) * 0              # traced zeros (no constants)
    f = zero_i == 1
    buf = _iota(t, w) * 0
    ln = zero_i
    missing, park = f, f
    pos = _iota(t, w)
    const_off = 0                           # trace-time offset while known
    for seg in tmpl:
        if isinstance(seg, Lit):
            sbuf, sln_c = lit(seg.data)
            sln = None                      # constant-length segment
        else:
            s = seg.slot
            k = cols.kind(s)
            st = _rd(ts, cols.stype(s))
            missing = missing | (st == T_EMPTY)
            if k == "none":
                # referenced but never produced: statically missing
                sbuf, sln = buf * 0, zero_i
            elif k == "list":
                # str(list) in a template is the list's repr
                # (interpolation_engine.py:531)
                jbuf, jln, jpark = _repr_list(ts, cols, s, t, w)
                is_list = st == T_LIST
                sbuf = jbuf
                sln = jnp.where(is_list, jln, 0)
                park = park | (is_list & jpark) | \
                    (is_list & _has_brace_or_escape(jbuf, jln, t, w))
            elif k == "int":
                sbuf, sln = _int_to_dec(_rd(ts, cols.sint(s)), t, w)
            elif k == "str":
                sbuf = ts.strs[cols.str_row[s]]
                vln = _rd(ts, cols.slen(s))
                sln = jnp.where(st == T_STR, vln, 0)
                park = park | ((st == T_STR) &
                               _has_brace_or_escape(sbuf, vln, t, w))
            else:  # mix: both representations possible at runtime
                is_int = st == T_INT
                is_str = st == T_STR
                ibuf, iln = _int_to_dec(_rd(ts, cols.sint(s)), t, w)
                vbuf = ts.strs[cols.str_row[s]]
                vln = _rd(ts, cols.slen(s))
                sbuf = jnp.where(is_int, ibuf, vbuf)
                sln = jnp.where(is_int, iln, jnp.where(is_str, vln, 0))
                park = park | (is_str &
                               _has_brace_or_escape(vbuf, vln, t, w))
        if const_off is not None:
            # offset still static: place with a static shift
            if const_off == 0:
                placed = sbuf
            else:
                placed = jnp.pad(sbuf, ((0, 0), (const_off, 0)))[:, :w]
            if sln is None:
                seg_len = len_c = sln_c
                mask = (pos >= const_off) & (pos < const_off + len_c)
                buf = jnp.where(mask, placed, buf)
                ln = ln + seg_len
                const_off += sln_c
            else:
                mask = (pos >= const_off) & (pos < const_off + sln)
                buf = jnp.where(mask, placed, buf)
                ln = ln + sln
                const_off = None            # offset now data-dependent
        else:
            seg_ln = (zero_i + sln_c) if sln is None else sln
            shifted = _taa(sbuf, pos - ln, t, w)
            buf = jnp.where((pos >= ln) & (pos < ln + seg_ln), shifted, buf)
            ln = ln + seg_ln
    park = park | (ln > w)
    buf = jnp.where(pos < ln, buf, 0)
    return buf, jnp.minimum(ln, w), missing, park


def _match_at(pattern, buf, ln, t: int, w: int, lit):
    """Anchored match of a decomposed pattern against buf[:ln] (strict —
    no end-anchor quirk; callers add the trailing-newline retry)."""
    pos = _iota(t, w)
    kind = pattern[0]
    if kind == "any":
        return (ln * 0) == 0
    if kind == "exact":
        cb, cl = lit(pattern[1])
        masked = jnp.where(pos < ln, buf, 0)
        return (ln == cl) & jnp.all(masked == cb, axis=1, keepdims=True)
    if kind == "prefix":
        cb, cl = lit(pattern[1])
        return (ln >= cl) & jnp.all((pos >= cl) | (buf == cb),
                                    axis=1, keepdims=True)
    if kind == "suffix":
        cb, cl = lit(pattern[1])
        tail = _taa(buf, pos + ln - cl, t, w)
        return (ln >= cl) & jnp.all((pos >= cl) | (tail == cb),
                                    axis=1, keepdims=True)
    # affix
    pre, suf = pattern[1], pattern[2]
    pb, plen = lit(pre)
    sb, slen_c = lit(suf)
    pre_ok = jnp.all((pos >= plen) | (buf == pb), axis=1, keepdims=True)
    tail = _taa(buf, pos + ln - slen_c, t, w)
    suf_ok = jnp.all((pos >= slen_c) | (tail == sb), axis=1, keepdims=True)
    return (ln >= plen + slen_c) & pre_ok & suf_ok


def _match(pattern, buf, ln, t: int, w: int, lit):
    """Pattern match incl. the reference's end-anchor quirk: ``$`` also
    matches just before one trailing newline (re.match with DOTALL —
    core/wildcard.py and ops/match_kernel.py use_trim implement the same).
    Only tail-anchored kinds need the retry: 'any'/'prefix' end in
    ``(.*)$`` which consumes the newline either way."""
    hit = _match_at(pattern, buf, ln, t, w, lit)
    if pattern[0] in ("any", "prefix"):
        return hit
    # last byte via mask-reduce (Mosaic gathers need full-shape indices)
    pos = _iota(t, w)
    last = jnp.sum(jnp.where(pos == ln - 1, buf, 0), axis=1,
                   keepdims=True)
    has_nl = (ln > 0) & (last == 10)
    trimmed = jnp.where(has_nl, jnp.maximum(ln - 1, 0), ln)
    hit_trim = _match_at(pattern, jnp.where(_iota(t, w) < trimmed, buf, 0),
                         trimmed, t, w, lit)
    return hit | (has_nl & hit_trim)


# ---------------------------------------------------------------------------
# shared evaluators (item sources, RPN) — used by set/math/list branches
# ---------------------------------------------------------------------------

def _eval_item(ts: _TS, cols: _Cols, src: tuple, t: int, w: int, lit):
    """Evaluate a scalar item source → (vt, vi, vbuf, vln, parkm).
    vbuf is None for int values (byte plane untouched). A 'copy' of a
    list-kind slot parks (callers that support whole-list copies — ISet —
    special-case it before calling)."""
    zero_i = _rd(ts, C_PC) * 0
    parkm = zero_i == 1
    vbuf = None
    if src[0] == "int":
        vt, vi, vln = zero_i + T_INT, zero_i + src[1], zero_i
    elif src[0] == "str":
        vt, vi = zero_i + T_STR, zero_i
        vbuf, ln_c = lit(src[1])
        vln = zero_i + ln_c
    elif src[0] == "copy":
        s = src[1]
        k = cols.kind(s)
        st = _rd(ts, cols.stype(s))
        parkm = parkm | (st == T_EMPTY)  # set of a missing key raises
        if k == "list":
            parkm = parkm | (zero_i == 0)  # nested list: host path
            vt, vi, vln = st, zero_i, zero_i
        else:
            vt, vi = st, _rd(ts, cols.sint(s))
            if s in cols.str_row:
                vbuf, vln = ts.strs[cols.str_row[s]], _rd(ts, cols.slen(s))
            else:
                vln = zero_i
    else:  # tmpl
        vbuf, vln, missing, p = _render(ts, cols, src[1], t, w, lit)
        parkm = parkm | missing | p
        vt, vi = zero_i + T_STR, zero_i
    return vt, vi, vbuf, vln, parkm


def _eval_rpn(ts: _TS, cols: _Cols, ops: tuple, t: int, w: int):
    """Evaluate unrolled RPN over int slots → (value, parkm)."""
    zero_i = _rd(ts, C_PC) * 0
    parkm = zero_i == 1
    stack = []
    for opn in ops:
        o = opn[0]
        if o == "const":
            stack.append(zero_i + opn[1])
        elif o == "slot":
            s = opn[1]
            st = _rd(ts, cols.stype(s))
            if s in cols.str_row:
                parsed, pok = _parse_dec(
                    ts.strs[cols.str_row[s]],
                    _rd(ts, cols.slen(s)), t, w)
                val = jnp.where(st == T_INT,
                                _rd(ts, cols.sint(s)), parsed)
                parkm = parkm | (st == T_EMPTY) | \
                    ((st == T_STR) & ~pok) | (st == T_LIST)
            else:
                # int/none/list slot: digit-string parsing is dead code
                val = _rd(ts, cols.sint(s))
                parkm = parkm | (st != T_INT)
            stack.append(val)
        elif o == "length":
            s = opn[1]
            st = _rd(ts, cols.stype(s))
            # length() asserts its argument is a list (core/math_eval.py)
            parkm = parkm | (st != T_LIST)
            stack.append(_rd(ts, cols.slen(s)))
        elif o == "neg":
            stack.append(-stack.pop())
        elif o == "sign":
            stack.append(jnp.sign(stack.pop()))
        else:
            b_ = stack.pop()
            a_ = stack.pop()
            if o == "add":
                stack.append(a_ + b_)
            elif o == "sub":
                stack.append(a_ - b_)
            elif o == "mul":
                stack.append(a_ * b_)
            elif o == "min2":
                stack.append(jnp.minimum(a_, b_))
            elif o == "max2":
                stack.append(jnp.maximum(a_, b_))
            else:
                safe = jnp.where(b_ == 0, 1, b_)
                q = jnp.floor_divide(a_, safe)
                r = jnp.remainder(a_, safe)
                if o == "div":
                    # non-exact division: host (float tolerance)
                    parkm = parkm | (b_ == 0) | (r != 0)
                    stack.append(q)
                else:  # mod (Python floor-mod; ÷0 → host error)
                    parkm = parkm | (b_ == 0)
                    stack.append(r)
    return stack.pop(), parkm


def _copy_list_rows(ts: _TS, strs: list, cols: _Cols, dst: int, src: int,
                    mask) -> None:
    """Copy slot src's meta + element byte rows onto dst (masked)."""
    pairs = [(cols.meta_row[dst], cols.meta_row[src])]
    pairs += [(cols.list_row0[dst] + r, cols.list_row0[src] + r)
              for r in range(cols.elem_rows)]
    for d, s_ in pairs:
        strs[d] = jnp.where(mask, ts.strs[s_], strs[d])


def _place_elem(strs: list, cols: _Cols, s: int, e: int, vbuf, mask,
                t: int, w: int):
    """Write left-aligned element bytes vbuf into the packed cell of
    STATIC element e of list slot s (whole cell window is overwritten
    for masked lanes)."""
    row, off = cols.elem_pos(s, e)
    pos = _iota(t, w)
    if off:
        shifted = _taa(vbuf, pos - off, t, w)
    else:
        shifted = vbuf
    window = (pos >= off) & (pos < off + cols.ew)
    strs[row] = jnp.where(mask & window, shifted, strs[row])


# ---------------------------------------------------------------------------
# branch builders
# ---------------------------------------------------------------------------

def _advance(ts: _TS, cols: _Cols, act, ok, parkm, next_pc,
             writes=(), strs=None, out=None, out_len=None) -> _TS:
    """Apply register writes + pc/status/steps bookkeeping for one branch.

    ok lanes commit and advance to next_pc; parkm lanes park in place;
    steps bump for every lane that attempted the instruction (matching the
    general engine's advance(), which counts error-parks)."""
    regs = ts.regs
    for c, val in writes:
        regs = _wr(regs, c, val, ok)
    regs = _wr(regs, C_PC, next_pc, ok)
    regs = _wr(regs, C_STATUS, PARKED, parkm)
    regs = _wr(regs, C_STEPS, _rd(ts, C_STEPS) + 1, ok | parkm)
    if out_len is not None:
        regs = _wr(regs, C_OUTLEN, out_len, ok)
    return ts._replace(
        regs=regs,
        strs=ts.strs if strs is None else strs,
        out=ts.out if out is None else jnp.where(ok, out, ts.out))


def _build_branch(instr, pc: int, cols: _Cols, tcfg: TurboConfig, lit):
    t, w, ow = tcfg.tile, tcfg.width, tcfg.out_width
    next_pc = pc + 1

    def active_of(ts):
        return (_rd(ts, C_STATUS) == RUNNING) & (_rd(ts, C_PC) == pc)

    if isinstance(instr, IHalt):
        def br(ts):
            act = active_of(ts)
            return ts._replace(regs=_wr(ts.regs, C_STATUS, DONE, act))
        return br

    if isinstance(instr, INop):
        def br(ts):
            act = active_of(ts)
            regs = _wr(ts.regs, C_PC, next_pc, act)
            regs = _wr(regs, C_STEPS, _rd(ts, C_STEPS) + 1, act)
            return ts._replace(regs=regs)
        return br

    if isinstance(instr, IPark):
        aslot = instr.await_slot
        if aslot < 0:
            def br(ts):
                act = active_of(ts)
                return ts._replace(
                    regs=_wr(ts.regs, C_STATUS, PARKED, act))
            return br

        def br(ts):
            # literal-name await_insert: present key → NO yield on the
            # host (executor.py:250-251 checks before sleeping), so the
            # lane continues synchronously in-kernel; absent key → park
            # (the host lane suspends at the sleep, where a later race
            # cancel always lands — see IPark's docstring). steps bump
            # only on the ready path; a park's bump happens at resume.
            act = active_of(ts)
            ready = _rd(ts, cols.stype(aslot)) != T_EMPTY
            regs = _wr(ts.regs, C_STATUS, PARKED, act & ~ready)
            regs = _wr(regs, C_PC, next_pc, act & ready)
            regs = _wr(regs, C_STEPS, _rd(ts, C_STEPS) + 1, act & ready)
            return ts._replace(regs=regs)
        return br

    if isinstance(instr, IGoto):
        tgt = instr.target

        def br(ts):
            act = active_of(ts)
            regs = _wr(ts.regs, C_PC, tgt, act)
            regs = _wr(regs, C_STEPS, _rd(ts, C_STEPS) + 1, act)
            return ts._replace(regs=regs)
        return br

    if isinstance(instr, IClear):
        def br(ts):
            act = active_of(ts)
            nope = act & (act != act)
            return _advance(ts, cols, act, act, nope, next_pc,
                            writes=[(C_CLREPOCH,
                                     _rd(ts, C_CLREPOCH) + 1)],
                            out=ts.out * 0,
                            out_len=_rd(ts, C_PC) * 0)
        return br

    if isinstance(instr, IDelete):
        slots = instr.slots

        def br(ts):
            act = active_of(ts)
            nope = act & (act != act)
            writes = [(cols.stype(s), T_EMPTY) for s in slots]
            return _advance(ts, cols, act, act, nope, next_pc,
                            writes=writes)
        return br

    if isinstance(instr, ISet):
        out_slot = instr.out_slot

        if instr.src[0] == "copy" and cols.kind(instr.src[1]) == "list":
            # whole-list copy between element pools
            src_slot = instr.src[1]

            def br(ts):
                act = active_of(ts)
                st = _rd(ts, cols.stype(src_slot))
                parkm = act & (st == T_EMPTY)
                ok = act & ~parkm
                writes = [(cols.stype(out_slot), st),
                          (cols.sint(out_slot), _rd(ts, cols.sint(src_slot))),
                          (cols.slen(out_slot), _rd(ts, cols.slen(src_slot)))]
                strs = None
                if out_slot != src_slot:
                    strs = list(ts.strs)
                    _copy_list_rows(ts, strs, cols, out_slot, src_slot, ok)
                    strs = tuple(strs)
                return _advance(ts, cols, act, ok, parkm, next_pc,
                                writes=writes, strs=strs)
            return br

        def br(ts):
            act = active_of(ts)
            vt, vi, vbuf, vln, parkm = _eval_item(ts, cols, instr.src,
                                                  t, w, lit)
            ok = act & ~parkm
            parkm = act & ~ok
            strs = None
            if vbuf is not None and out_slot in cols.str_row:
                row = cols.str_row[out_slot]
                strs = list(ts.strs)
                strs[row] = jnp.where(ok, vbuf, strs[row])
                strs = tuple(strs)
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=[(cols.stype(out_slot), vt),
                                    (cols.sint(out_slot), vi),
                                    (cols.slen(out_slot), vln)],
                            strs=strs)
        return br

    if isinstance(instr, IMath):
        ops = instr.ops
        out_slot = instr.out_slot

        def br(ts):
            act = active_of(ts)
            val, parkm = _eval_rpn(ts, cols, ops, t, w)
            ok = act & ~parkm
            parkm = act & ~ok
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=[(cols.stype(out_slot), T_INT),
                                    (cols.sint(out_slot), val),
                                    (cols.slen(out_slot), 0)])
        return br

    if isinstance(instr, IPrint):
        tmpl = instr.tmpl
        single_hole = len(tmpl) == 1 and isinstance(tmpl[0], Hole)

        def br(ts):
            act = active_of(ts)
            vbuf, vln, missing, parkm = _render(ts, cols, tmpl, t, w, lit)
            parkm = parkm | missing
            if single_hole:
                # print of a non-string simple key AttributeErrors in the
                # reference — host reproduces the crash
                parkm = parkm | (_rd(ts, cols.stype(tmpl[0].slot)) != T_STR)
            out_len = _rd(ts, C_OUTLEN)
            pos_o = _iota(t, ow)
            # cross-width shift payload→output at the dynamic offset
            # out_len (_taa handles Mosaic's 128-lane gather constraint);
            # bytes past vln are masked by the range select below
            shifted = _taa(vbuf, pos_o - out_len, t, w, wo=ow)
            new_out = jnp.where(
                (pos_o >= out_len) & (pos_o < out_len + vln),
                shifted, ts.out)
            new_len = out_len + vln
            parkm = parkm | (new_len > ow)
            ok = act & ~parkm
            parkm = act & ~ok
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            out=new_out, out_len=new_len)
        return br

    if isinstance(instr, IGotoMap):
        tmpl, entries, null_pc = instr.tmpl, instr.entries, instr.null_pc

        def _int_exact(pat):
            """int value v such that str(v) == pattern bytes, else None."""
            if pat[0] != "exact":
                return None
            b = pat[1]
            s_ = b.decode("ascii", "ignore")
            try:
                v = int(s_)
            except ValueError:
                return None
            return v if str(v).encode() == b else None

        int_dispatch = (
            len(tmpl) == 1 and isinstance(tmpl[0], Hole)
            and cols.kind(tmpl[0].slot) == "int"
            and all(p[0] in ("exact", "any") for p, _t in entries))
        if int_dispatch:
            # single int-kind hole + literal keys: scalar compares — no
            # decimal render, no byte match (the per-turn hot path)
            slot = tmpl[0].slot
            comp = [(_int_exact(p), p[0], tpc) for p, tpc in entries]

            def br(ts):
                act = active_of(ts)
                st = _rd(ts, cols.stype(slot))
                val = _rd(ts, cols.sint(slot))
                missing = st == T_EMPTY   # int-kind slot: EMPTY or INT
                zero_i = _rd(ts, C_PC) * 0
                decided = zero_i == 1
                tgt = zero_i
                for v, kind_, tpc_ in comp:
                    if kind_ == "any":
                        hit = ~decided
                    elif v is None:
                        continue  # non-canonical-int key never matches
                    else:
                        hit = (val == v) & ~decided
                    tgt = jnp.where(hit, tpc_, tgt)
                    decided = decided | hit
                if null_pc is not None:
                    tgt = jnp.where(missing, null_pc, tgt)
                    ok_route = missing | decided
                else:
                    ok_route = decided & ~missing
                parkm = ~ok_route
                ok = act & ~parkm
                parkm = act & ~ok
                regs = _wr(ts.regs, C_PC, tgt, ok)
                regs = _wr(regs, C_STATUS, PARKED, parkm)
                regs = _wr(regs, C_STEPS, _rd(ts, C_STEPS) + 1,
                           ok | parkm)
                return ts._replace(regs=regs)
            return br

        def br(ts):
            act = active_of(ts)
            buf, ln, missing, parkm = _render(ts, cols, tmpl, t, w, lit)
            zero_i = _rd(ts, C_PC) * 0
            decided = zero_i == 1
            tgt = zero_i
            for pat, tpc in entries:
                hit = _match(pat, buf, ln, t, w, lit) & ~decided
                tgt = jnp.where(hit, tpc, tgt)
                decided = decided | hit
            if null_pc is not None:
                tgt = jnp.where(missing, null_pc, tgt)
                ok_route = missing | decided
            else:
                ok_route = decided & ~missing
            parkm = parkm | ~ok_route
            ok = act & ~parkm
            parkm = act & ~ok
            regs = _wr(ts.regs, C_PC, tgt, ok)
            regs = _wr(regs, C_STATUS, PARKED, parkm)
            regs = _wr(regs, C_STEPS, _rd(ts, C_STEPS) + 1, ok | parkm)
            return ts._replace(regs=regs)
        return br

    if isinstance(instr, IForHead):
        pairs, n, exit_pc = instr.pairs, instr.n, instr.exit_pc
        lc = cols.loop(instr.loop_id)

        def br(ts):
            act = active_of(ts)
            counter = _rd(ts, lc)
            cur = jnp.where(counter == 0, 1, counter)   # entering → iter 1
            exiting = cur > n
            k = cur - 1                                  # 0-based element
            writes = [(lc, jnp.where(exiting, 0, cur))]
            strs = None
            strs_l = list(ts.strs)
            strs_dirty = False
            zero_i = _rd(ts, C_PC) * 0
            for slot, elems in pairs:
                vt = zero_i + T_INT
                vi = zero_i
                vln = zero_i
                vbuf = None
                for j, (kind, v) in enumerate(elems):
                    sel = k == j
                    if kind == "int":
                        vi = jnp.where(sel, v, vi)
                    else:
                        ebuf, eln = lit(v)
                        vt = jnp.where(sel, T_STR, vt)
                        vln = jnp.where(sel, eln, vln)
                        if vbuf is None:
                            vbuf = ebuf
                        else:
                            vbuf = jnp.where(sel, ebuf, vbuf)
                # keep old values on exiting lanes (loop vars persist past
                # the loop, holding the LAST iteration's values — matching
                # the host, which leaves the final set in the store)
                old_t = _rd(ts, cols.stype(slot))
                old_i = _rd(ts, cols.sint(slot))
                old_l = _rd(ts, cols.slen(slot))
                writes += [
                    (cols.stype(slot), jnp.where(exiting, old_t, vt)),
                    (cols.sint(slot), jnp.where(exiting, old_i, vi)),
                    (cols.slen(slot), jnp.where(exiting, old_l, vln)),
                ]
                if vbuf is not None and slot in cols.str_row:
                    row = cols.str_row[slot]
                    lane_ok = act & ~exiting
                    strs_l[row] = jnp.where(lane_ok, vbuf, strs_l[row])
                    strs_dirty = True
            if strs_dirty:
                strs = tuple(strs_l)
            nope = act & (act != act)
            jump = jnp.where(exiting, exit_pc, pc + 1)
            return _advance(ts, cols, act, act, nope, jump,
                            writes=writes, strs=strs)
        return br

    if isinstance(instr, IForNext):
        lc = cols.loop(instr.loop_id)
        head_pc = instr.head_pc

        def br(ts):
            act = active_of(ts)
            nope = act & (act != act)
            return _advance(ts, cols, act, act, nope, head_pc,
                            writes=[(lc, _rd(ts, lc) + 1)])
        return br

    if isinstance(instr, IListNew):
        out_slot = instr.out_slot
        elems = instr.elems
        if len(elems) > tcfg.list_cap:
            raise NotTurbo(f"literal list of {len(elems)} elements "
                           f"exceeds list_cap={tcfg.list_cap}")

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            parkm = zero_i == 1
            values, bufs = [], []
            for src in elems:
                vt, vi, vbuf, vln, p = _eval_item(ts, cols, src, t, w, lit)
                parkm = parkm | p | (vln > cols.ew)
                values.append((vt, vi, vln))
                bufs.append(vbuf)
            ok = act & ~parkm
            parkm = act & ~ok
            strs = list(ts.strs)
            for e, vbuf in enumerate(bufs):
                if vbuf is not None:
                    _place_elem(strs, cols, out_slot, e, vbuf, ok, t, w)
            lane = _iota(t, w)
            meta = strs[cols.meta_row[out_slot]]
            E = cols.E
            for e, (vt, vi, vln) in enumerate(values):
                meta = jnp.where(lane == e, vt,
                                 jnp.where(lane == E + e, vi,
                                           jnp.where(lane == 2 * E + e,
                                                     vln, meta)))
            strs[cols.meta_row[out_slot]] = jnp.where(
                ok, meta, strs[cols.meta_row[out_slot]])
            writes = [(cols.stype(out_slot), T_LIST),
                      (cols.sint(out_slot), 0),
                      (cols.slen(out_slot), len(elems))]
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=writes, strs=tuple(strs))
        return br

    if isinstance(instr, IListAppend):
        out_slot, src_slot, item = instr.out_slot, instr.src_slot, instr.item

        def br(ts):
            act = active_of(ts)
            st = _rd(ts, cols.stype(src_slot))
            n = _rd(ts, cols.slen(src_slot))
            vt, vi, vbuf, vln, parkm = _eval_item(ts, cols, item, t, w, lit)
            parkm = parkm | (st != T_LIST) | (n >= cols.E) | \
                (vln > cols.ew)
            ok = act & ~parkm
            parkm = act & ~ok
            writes = [(cols.stype(out_slot), T_LIST),
                      (cols.sint(out_slot), 0),
                      (cols.slen(out_slot), n + 1)]
            strs = list(ts.strs)
            if out_slot != src_slot:
                _copy_list_rows(ts, strs, cols, out_slot, src_slot, ok)
            meta = _meta_write_cell(strs[cols.meta_row[out_slot]], cols,
                                    n, vt, vi, vln, ok, t, w)
            strs[cols.meta_row[out_slot]] = meta
            if vbuf is None:
                vbuf = _iota(t, w) * 0
            _pool_place_bytes(strs, cols, out_slot, vbuf, n * cols.ew,
                              ok, cols.ew, t, w)
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=writes, strs=tuple(strs))
        return br

    if isinstance(instr, IListRemove):
        out_slot, src_slot, item = instr.out_slot, instr.src_slot, instr.item

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            st = _rd(ts, cols.stype(src_slot))
            n = _rd(ts, cols.slen(src_slot))
            vt, vi, vbuf, vln, parkm = _eval_item(ts, cols, item, t, w, lit)
            parkm = parkm | (st != T_LIST)
            # first matching element (int == int by value, str == str by
            # bytes; int never equals str — list.remove uses ==)
            m = zero_i + cols.E      # E = "not found"
            for e in reversed(range(cols.E)):
                et, ei, el = _meta_cell_static(ts, cols, src_slot, e)
                int_eq = (vt == T_INT) & (et == T_INT) & (ei == vi)
                if vbuf is not None:
                    ebuf = _elem_bytes_static(ts, cols, src_slot, e, t, w)
                    str_eq = (vt == T_STR) & (et == T_STR) & (el == vln) & \
                        jnp.all(ebuf == jnp.where(_iota(t, w) < vln, vbuf,
                                                  0),
                                axis=1, keepdims=True)
                else:
                    str_eq = zero_i == 1
                m = jnp.where((e < n) & (int_eq | str_eq), e, m)
            found = m < cols.E
            new_n = jnp.where(found, n - 1, n)
            ok = act & ~parkm
            parkm = act & ~ok
            writes = [(cols.stype(out_slot), T_LIST),
                      (cols.sint(out_slot), 0),
                      (cols.slen(out_slot), new_n)]
            strs = list(ts.strs)
            # meta: cells < m keep, cells >= m take cell+1 (static shift)
            meta_src = ts.strs[cols.meta_row[src_slot]]
            shifted = jnp.pad(meta_src[:, 1:], ((0, 0), (0, 1)))
            rel = _lane_rel(cols, t, w)
            meta_new = jnp.where(found & (rel >= m), shifted, meta_src)
            strs[cols.meta_row[out_slot]] = jnp.where(
                ok, meta_new, strs[cols.meta_row[out_slot]])
            # bytes: before m*EW keep, after take bytes shifted left EW
            # (static adjacent-row shifts)
            rows = _pool_rows(ts, cols, src_slot)
            pos = _iota(t, w)
            for r in range(cols.elem_rows):
                nxt = rows[r + 1] if r + 1 < cols.elem_rows \
                    else rows[r] * 0
                sh = jnp.concatenate(
                    [rows[r][:, cols.ew:], nxt[:, :cols.ew]], axis=1)
                gpos = pos + r * w
                row_new = jnp.where(found & (gpos >= m * cols.ew), sh,
                                    rows[r])
                dst = cols.list_row0[out_slot] + r
                strs[dst] = jnp.where(ok, row_new, strs[dst])
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=writes, strs=tuple(strs))
        return br

    if isinstance(instr, IListIndex):
        out_slot, src_slot, index = instr.out_slot, instr.src_slot, \
            instr.index

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            st = _rd(ts, cols.stype(src_slot))
            n = _rd(ts, cols.slen(src_slot))
            parkm = st != T_LIST
            if index[0] == "const":
                idx = zero_i + index[1]
            elif index[0] == "copy":
                s = index[1]
                ist = _rd(ts, cols.stype(s))
                if s in cols.str_row:
                    parsed, pok = _parse_dec(ts.strs[cols.str_row[s]],
                                             _rd(ts, cols.slen(s)), t, w)
                    idx = jnp.where(ist == T_INT, _rd(ts, cols.sint(s)),
                                    parsed)
                    parkm = parkm | (ist == T_EMPTY) | (ist == T_LIST) | \
                        ((ist == T_STR) & ~pok)
                else:
                    idx = _rd(ts, cols.sint(s))
                    parkm = parkm | (ist != T_INT)
            else:  # tmpl → rendered decimal (host does int(str))
                rbuf, rln, missing, p = _render(ts, cols, index[1], t, w,
                                                lit)
                idx, pok = _parse_dec(rbuf, rln, t, w)
                parkm = parkm | missing | p | ~pok
            # 1-based; 0 raises on the host; negatives from the end
            parkm = parkm | (idx == 0)
            j = jnp.where(idx > 0, idx - 1, n + idx)
            parkm = parkm | (j < 0) | (j >= n)   # host IndexError
            et, ei, el, ebuf = _elem_read(
                ts, cols, src_slot, jnp.clip(j, 0, cols.E - 1), t, w)
            ok = act & ~parkm
            parkm = act & ~ok
            strs = None
            if out_slot in cols.str_row:
                strs = list(ts.strs)
                row = cols.str_row[out_slot]
                strs[row] = jnp.where(ok, ebuf, strs[row])
                strs = tuple(strs)
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=[(cols.stype(out_slot), et),
                                    (cols.sint(out_slot), ei),
                                    (cols.slen(out_slot), el)],
                            strs=strs)
        return br

    if isinstance(instr, IListSlice):
        out_slot, src_slot = instr.out_slot, instr.src_slot

        def bound(ts, spec):
            if spec[0] == "const":
                return _rd(ts, C_PC) * 0 + spec[1], _rd(ts, C_PC) * 0 == 1
            return _eval_rpn(ts, cols, spec[1], t, w)

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            st = _rd(ts, cols.stype(src_slot))
            n = _rd(ts, cols.slen(src_slot))
            frm, p1 = bound(ts, instr.frm)
            to, p2 = bound(ts, instr.to)
            parkm = (st != T_LIST) | p1 | p2
            # 1-based right-inclusive (executor _py_slice_index, incl. the
            # right-bound-0 quirk), then Python's own slice clamping
            parkm = parkm | (frm == 0)      # host raises
            s0 = jnp.where(frm > 0, frm - 1, n + frm)
            e0 = jnp.where(to > 0, to - 1,
                           jnp.where(to < 0, n + to, zero_i)) + 1
            pys = jnp.where(s0 < 0, jnp.maximum(s0 + n, 0),
                            jnp.minimum(s0, n))
            pye = jnp.where(e0 < 0, jnp.maximum(e0 + n, 0),
                            jnp.minimum(e0, n))
            count = jnp.maximum(pye - pys, 0)
            ok = act & ~parkm
            parkm = act & ~ok
            writes = [(cols.stype(out_slot), T_LIST),
                      (cols.sint(out_slot), 0),
                      (cols.slen(out_slot), count)]
            strs = list(ts.strs)
            # whole-pool shift left by pys elements: one meta gather +
            # ER(ER+1)/2 byte gathers (cells/bytes ≥ count are stale junk,
            # never read)
            meta = _meta_shift(ts.strs[cols.meta_row[src_slot]], cols,
                               pys, t, w)
            strs[cols.meta_row[out_slot]] = jnp.where(
                ok, meta, strs[cols.meta_row[out_slot]])
            shifted = _pool_shift_left_bytes(ts, cols, src_slot,
                                             pys * cols.ew, t, w)
            for r in range(cols.elem_rows):
                dst = cols.list_row0[out_slot] + r
                strs[dst] = jnp.where(ok, shifted[r], strs[dst])
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=writes, strs=tuple(strs))
        return br

    if isinstance(instr, IListJoin):
        out_slot, src_slot = instr.out_slot, instr.src_slot

        def br(ts):
            act = active_of(ts)
            st = _rd(ts, cols.stype(src_slot))
            bbuf, bln, bmiss, bpark = _render(ts, cols, instr.before, t, w,
                                              lit)
            sbuf, sln, smiss, spark = _render(ts, cols, instr.between, t,
                                              w, lit)
            abuf, aln, amiss, apark = _render(ts, cols, instr.after, t, w,
                                              lit)
            parkm = (st != T_LIST) | bmiss | bpark | smiss | spark | \
                amiss | apark
            jbuf, jln, jpark = _join_elems(ts, cols, src_slot, t, w,
                                           between=(sbuf, sln))
            parkm = parkm | jpark
            buf, ln = _append(bbuf, bln, jbuf, jln, t, w)
            buf, ln = _append(buf, ln, abuf, aln, t, w)
            parkm = parkm | (ln > w)
            ok = act & ~parkm
            parkm = act & ~ok
            pos = _iota(t, w)
            buf = jnp.where(pos < ln, buf, 0)
            strs = None
            if out_slot in cols.str_row:
                strs = list(ts.strs)
                row = cols.str_row[out_slot]
                strs[row] = jnp.where(ok, buf, strs[row])
                strs = tuple(strs)
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=[(cols.stype(out_slot), T_STR),
                                    (cols.sint(out_slot), 0),
                                    (cols.slen(out_slot), ln)],
                            strs=strs)
        return br

    if isinstance(instr, IListConcat):
        out_slot, srcs = instr.out_slot, instr.src_slots

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            parkm = zero_i == 1
            ns = []
            for s in srcs:
                parkm = parkm | (_rd(ts, cols.stype(s)) != T_LIST)
                ns.append(_rd(ts, cols.slen(s)))
            total = sum(ns[1:], ns[0])
            parkm = parkm | (total > cols.E)
            ok = act & ~parkm
            parkm = act & ~ok
            writes = [(cols.stype(out_slot), T_LIST),
                      (cols.sint(out_slot), 0),
                      (cols.slen(out_slot), total)]
            strs = list(ts.strs)
            # accumulate each source shifted right to its running offset:
            # one meta gather + ER(ER+1)/2 byte gathers per source
            lane = _iota(t, w)
            rel = _lane_rel(cols, t, w)
            pos = _iota(t, w)
            meta_acc = ts.strs[cols.meta_row[srcs[0]]]
            pools = [list(_pool_rows(ts, cols, srcs[0]))]
            off = ns[0]
            for k in range(1, len(srcs)):
                s = srcs[k]
                m_sh = _meta_shift(ts.strs[cols.meta_row[s]], cols,
                                   -off, t, w)
                sec_ok = (rel >= off) & (rel < off + ns[k]) & \
                    (lane < 3 * cols.E)
                meta_acc = jnp.where(sec_ok, m_sh, meta_acc)
                boff = off * cols.ew
                rows_k = _pool_rows(ts, cols, s)
                acc_rows = pools[0]
                for r in range(cols.elem_rows):
                    gpos = pos + r * w
                    seg = acc_rows[r] * 0
                    for q in range(0, r + 1):
                        idx = gpos - boff - q * w
                        g = _taa(rows_k[q], idx, t, w)
                        seg = jnp.where((idx >= 0) & (idx < w), g, seg)
                    win = (gpos >= boff) & \
                        (gpos < boff + ns[k] * cols.ew)
                    acc_rows[r] = jnp.where(win, seg, acc_rows[r])
                off = off + ns[k]
            strs[cols.meta_row[out_slot]] = jnp.where(
                ok, meta_acc, strs[cols.meta_row[out_slot]])
            for r in range(cols.elem_rows):
                dst = cols.list_row0[out_slot] + r
                strs[dst] = jnp.where(ok, pools[0][r], strs[dst])
            return _advance(ts, cols, act, ok, parkm, next_pc,
                            writes=writes, strs=tuple(strs))
        return br

    if isinstance(instr, IForHeadDyn):
        pairs, exit_pc = instr.pairs, instr.exit_pc
        lc = cols.loop(instr.loop_id)

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            parkm = zero_i == 1
            n = None
            for _v, ls in pairs:
                st = _rd(ts, cols.stype(ls))
                parkm = parkm | (st != T_LIST)
                ln = _rd(ts, cols.slen(ls))
                if n is None:
                    n = ln
                else:
                    # differing lengths: host raises the exact assert
                    parkm = parkm | (ln != n)
            counter = _rd(ts, lc)
            cur = jnp.where(counter == 0, 1, counter)
            exiting = cur > n
            k = jnp.clip(cur - 1, 0, cols.E - 1)
            writes = [(lc, jnp.where(exiting, 0, cur))]
            strs = list(ts.strs)
            dirty = False
            for var_slot, ls in pairs:
                et, ei, el, ebuf = _elem_read(ts, cols, ls, k, t, w)
                old_t = _rd(ts, cols.stype(var_slot))
                old_i = _rd(ts, cols.sint(var_slot))
                old_l = _rd(ts, cols.slen(var_slot))
                writes += [
                    (cols.stype(var_slot), jnp.where(exiting, old_t, et)),
                    (cols.sint(var_slot), jnp.where(exiting, old_i, ei)),
                    (cols.slen(var_slot), jnp.where(exiting, old_l, el))]
                if var_slot in cols.str_row:
                    row = cols.str_row[var_slot]
                    lane_ok = act & ~exiting & ~parkm
                    strs[row] = jnp.where(lane_ok, ebuf, strs[row])
                    dirty = True
            ok = act & ~parkm
            parkm = act & ~ok
            jump = jnp.where(exiting, exit_pc, pc + 1)
            return _advance(ts, cols, act, ok, parkm, jump,
                            writes=writes,
                            strs=tuple(strs) if dirty else None)
        return br

    if isinstance(instr, IParBegin):
        mode, k_lanes = instr.mode, instr.k
        entries, join_pc = instr.entries, instr.join_pc
        loop_lo, loop_hi = instr.loop_lo, instr.loop_hi

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            writes = [(C_CURTID, 0), (C_PARMODE, mode),
                      (C_PARJOIN, join_pc)]
            for l in range(cols.nt):
                if l < k_lanes:
                    writes += [(cols.tpc(l), entries[l]),
                               (cols.tstate(l), T_NEW)]
                else:
                    writes += [(cols.tpc(l), 0), (cols.tstate(l), T_FREE)]
                writes.append((cols.tparg(l), 0))
            # loop counters allocated inside the block reset on entry
            # (raced lanes may have left one mid-loop; the reference
            # purges raced sub-cursors)
            for li in range(loop_lo, loop_hi):
                writes.append((cols.loop(li), zero_i))
            nope = act & (act != act)
            return _advance(ts, cols, act, act, nope, entries[0],
                            writes=writes)
        return br

    if isinstance(instr, IThreadEnd):
        k_lanes, join_pc = instr.k, instr.join_pc
        NT = cols.nt

        def br(ts):
            act = active_of(ts)
            zero_i = _rd(ts, C_PC) * 0
            cur = jnp.clip(_rd(ts, C_CURTID), 0, NT - 1)
            # mark the current lane done
            tstate = [jnp.where(cur == l, T_DONE, _rd(ts, cols.tstate(l)))
                      for l in range(NT)]
            started = [l < k_lanes for l in range(NT)]
            f = zero_i == 1
            new_left, wait_left, ready_left = f, f, f
            all_done = zero_i == 0
            for l in range(NT):
                if started[l]:
                    new_left = new_left | (tstate[l] == T_NEW)
                    wait_left = wait_left | (tstate[l] == T_WAIT)
                    ready_left = ready_left | (tstate[l] == T_READY)
                    all_done = all_done & (tstate[l] == T_DONE)
            wait_mode = _rd(ts, C_PARMODE) == PM_WAIT
            # boolean algebra, not where() — Mosaic can't lower i1 selects
            # race completes only when no lane still has a slice coming:
            # NEW lanes get their first slice, READY lanes (resumed IO)
            # their continuation slice, WAIT lanes their cancel — all
            # before asyncio's FIRST_COMPLETED waiter processes the cancel
            complete = (wait_mode & all_done) | \
                (~wait_mode & ~new_left & ~wait_left & ~ready_left)
            drain = ~wait_mode & ~complete
            # next runnable lane, cyclic from cur+1 (both modes run NEW
            # and READY lanes; WAIT lanes wait for the ring)
            any_run, nxt = f, zero_i
            start = cur + 1
            for off in range(NT):
                idx = (start + off) % NT
                st_i = zero_i
                for l in range(NT):
                    st_i = jnp.where(idx == l, tstate[l], st_i)
                runnable = (st_i == T_NEW) | (st_i == T_READY)
                # only started lanes are runnable
                started_i = idx < k_lanes
                runnable = runnable & started_i
                pick = runnable & ~any_run
                nxt = jnp.where(pick, idx, nxt)
                any_run = any_run | runnable
            tpc_nxt = zero_i
            for l in range(NT):
                tpc_nxt = jnp.where(nxt == l, _rd(ts, cols.tpc(l)),
                                    tpc_nxt)
            regs = ts.regs
            for l in range(NT):
                regs = _wr(regs, cols.tstate(l),
                           jnp.where(complete, T_FREE, tstate[l]), act)
            regs = _wr(regs, C_PARMODE,
                       jnp.where(complete, PM_NONE,
                                 jnp.where(drain, PM_DRAIN,
                                           _rd(ts, C_PARMODE))), act)
            regs = _wr(regs, C_PARJOIN,
                       jnp.where(complete, 0, _rd(ts, C_PARJOIN)), act)
            regs = _wr(regs, C_PAREPOCH,
                       _rd(ts, C_PAREPOCH) + jnp.where(complete, 1, 0),
                       act)
            regs = _wr(regs, C_CURTID,
                       jnp.where(complete, -1,
                                 jnp.where(any_run, nxt, -1)), act)
            regs = _wr(regs, C_PC,
                       jnp.where(complete, join_pc,
                                 jnp.where(any_run, tpc_nxt,
                                           _rd(ts, C_PC))), act)
            regs = _wr(regs, C_STATUS,
                       jnp.where(complete | any_run, RUNNING, PARKED), act)
            regs = _wr(regs, C_STEPS, _rd(ts, C_STEPS) + 1, act)
            return ts._replace(regs=regs)
        return br

    raise NotTurbo(f"no branch builder for {type(instr).__name__}")


# ---------------------------------------------------------------------------
# kernel assembly
# ---------------------------------------------------------------------------

def _make_cols(plan: TurboPlan, tcfg: TurboConfig) -> _Cols:
    return _Cols(max(plan.n_slots, 1), plan.slot_kinds,
                 plan.compiled.n_loops, nt=plan.needs_threads,
                 list_cap=tcfg.list_cap, width=tcfg.width,
                 elem_width=tcfg.elem_width, elem_kinds=plan.elem_kinds)


def _lane_yield(ts: _TS, cols: _Cols, t: int) -> _TS:
    """Post-switch transform: a park raised while inside a parallel block
    suspends the current LANE (T_WAIT, tpc/tparg := parked pc); the
    instance parks and the ring resolves it (vm/lanering.py — vm/step.py
    thread_yield twin). The kernel must NOT switch to another lane here,
    even mid-drain: whether the parked lane's IO completes synchronously
    (its slice continues before any later lane runs — the asyncio
    ordering the reference exposes) is host-side knowledge. Idempotent —
    safe to run every inner step."""
    if cols.nt == 0:
        return ts
    cur_tid = _rd(ts, C_CURTID)
    parked = (_rd(ts, C_STATUS) == PARKED) & \
        (_rd(ts, C_PARMODE) > 0) & (cur_tid >= 0)
    # the fixup runs every inner step but only matters right after an
    # in-block park — skip its ops on the common (no-park) step
    return jax.lax.cond(jnp.any(parked),
                        lambda ts_: _lane_yield_apply(ts_, cols, t,
                                                      parked),
                        lambda ts_: ts_, ts)


def _lane_yield_apply(ts: _TS, cols: _Cols, t: int, parked) -> _TS:
    NT = cols.nt
    cur = jnp.clip(_rd(ts, C_CURTID), 0, NT - 1)
    pc = _rd(ts, C_PC)
    regs = ts.regs
    for l in range(NT):
        sel = parked & (cur == l)
        regs = _wr(regs, cols.tstate(l), T_WAIT, sel)
        regs = _wr(regs, cols.tparg(l), pc, sel)
        regs = _wr(regs, cols.tpc(l), pc, sel)
    return ts._replace(regs=regs)


def build_step_fn(plan: TurboPlan, tcfg: TurboConfig, n: int,
                  interpret: bool):
    """Jitted (batch,) -> batch running k_steps VM steps via one
    pallas_call over instance tiles."""
    from jax.experimental import pallas as pl

    P = plan.n_instr
    cols = _make_cols(plan, tcfg)
    R = cols.n_rows
    regw = cols.regw
    t, w, ow, K = tcfg.tile, tcfg.width, tcfg.out_width, tcfg.k_steps
    assert n % t == 0

    lit_table = _LitTable(w)
    lit_table.collect(plan.instrs)
    lits_np = lit_table.array()

    def kernel(lits_ref, regs_ref, sbuf_ref, out_ref,
               o_regs, o_sbuf, o_out):
        lit = _mk_lit(lits_ref, lit_table, t)
        branches = [_build_branch(instr, pc, cols, tcfg, lit)
                    for pc, instr in enumerate(plan.instrs)]
        ts = _TS(regs=regs_ref[:],
                 strs=tuple(sbuf_ref[r] for r in range(R)),
                 out=out_ref[:])

        def cond(carry):
            it, ts = carry
            return (it < K) & jnp.any(_rd(ts, C_STATUS) == RUNNING)

        LEAF = tcfg.leaf

        def dispatch(lo, hi, ts, pc_star):
            """Balanced cond tree over branches[lo:hi] with LEAF-sized
            straight-line leaves.

            lax.switch lowers to a LINEAR cond chain in Mosaic (observed
            92-deep recursion), and every level keeps the loop carry
            live — the scoped-VMEM budget was burning ~16 carry copies
            regardless of branch size. A log-depth tree holds ~5-7.

            A leaf executes ALL of its branches in order — safe by
            construction (every branch self-selects on pc == p), and a
            lockstep lane entering at the leaf's first pc retires up to
            LEAF sequential instructions per dispatch (superblock
            effect), amortizing the carry copies."""
            if hi - lo <= LEAF:
                for p in range(lo, hi):
                    ts = branches[p](ts)
                return ts
            mid = lo + (((hi - lo) // 2 + LEAF - 1) // LEAF) * LEAF
            return jax.lax.cond(
                pc_star < mid,
                lambda ts_: dispatch(lo, mid, ts_, pc_star),
                lambda ts_: dispatch(mid, hi, ts_, pc_star),
                ts)

        def body(carry):
            it, ts = carry
            running = _rd(ts, C_STATUS) == RUNNING
            pc_star = jnp.min(jnp.where(running, _rd(ts, C_PC), P))
            pc_star = jnp.clip(pc_star, 0, P - 1)
            ts = dispatch(0, P, ts, pc_star)
            ts = _lane_yield(ts, cols, t)
            return it + 1, ts

        it0 = jnp.min(regs_ref[0, 0]) * 0
        _, ts = jax.lax.while_loop(cond, body, (it0, ts))
        o_regs[:] = ts.regs
        for r in range(R):
            o_sbuf[r] = ts.strs[r]
        o_out[:] = ts.out

    grid = (n // t,)
    state_specs = [
        pl.BlockSpec((t, regw), lambda g: (g, 0)),
        pl.BlockSpec((R, t, w), lambda g: (0, g, 0)),
        pl.BlockSpec((t, ow), lambda g: (g, 0)),
    ]
    shapes = (
        jax.ShapeDtypeStruct((n, regw), jnp.int32),
        jax.ShapeDtypeStruct((R, n, w), jnp.int32),
        jax.ShapeDtypeStruct((n, ow), jnp.int32),
    )

    compiler_params = None
    if not interpret:
        try:
            from jax.experimental.pallas import tpu as pltpu
            # instance tiles are independent → "parallel" grid; raise the
            # scoped-VMEM budget past Mosaic's 16 MiB default (see
            # TurboConfig.vmem_limit_bytes)
            compiler_params = pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=int(tcfg.vmem_limit_bytes))
        except Exception:  # pragma: no cover - non-TPU lowering targets
            compiler_params = None

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(lits_np.shape,
                               lambda g: (0, 0))] + state_specs,
        out_specs=tuple(state_specs),
        out_shape=shapes,
        input_output_aliases={1: 0, 2: 1, 3: 2},
        interpret=interpret,
        compiler_params=compiler_params,
    )

    lits = jnp.asarray(lits_np)

    # literals ride as an ARGUMENT (not a closure constant) so the traced
    # module — and therefore the AOT-cached executable — is shared across
    # programs whose plans differ only in string-literal bytes
    # (plan_fingerprint; VERDICT r3 next #4)
    def step_batch(lits_in, batch: TurboBatch) -> TurboBatch:
        return TurboBatch(*call(lits_in, *batch))

    jitted = jax.jit(step_batch, donate_argnums=(1,))

    def step(batch: TurboBatch) -> TurboBatch:
        return jitted(lits, batch)

    step.jitted = jitted
    step.lits = lits
    return step


def build_sharded_step_fn(plan: TurboPlan, tcfg: TurboConfig, n: int,
                          interpret: bool, mesh, axis: str = "dp"):
    """Sharded twin of build_step_fn: the mega-kernel runs per device over
    a pure-DP mesh via shard_map (instances are embarrassingly parallel —
    no per-step collectives; SURVEY §2.4). Each device executes the same
    pallas_call on its local n/ndev instance shard; shardings round-trip
    so repeated steps never reshuffle instances across chips."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

    ndev = mesh.devices.size
    if n % ndev:
        raise NotTurbo(f"batch {n} not divisible by {ndev} devices")
    local = build_step_fn(plan, tcfg, n // ndev, interpret)

    state_specs = (P(axis, None), P(None, axis, None), P(axis, None))

    sharded = shard_map(
        lambda regs, sbuf, out: tuple(local(TurboBatch(regs, sbuf, out))),
        mesh=mesh, in_specs=state_specs, out_specs=state_specs,
        check_vma=False)

    @jax.jit
    def step_batch(batch: TurboBatch) -> TurboBatch:
        return TurboBatch(*sharded(batch.regs, batch.sbuf, batch.out))

    return step_batch


# ---------------------------------------------------------------------------
# host codecs + engine
# ---------------------------------------------------------------------------

class TurboEncodeError(ValueError):
    """State no longer fits the static slot model (long string, new key,
    list value) — the instance promotes to a wider sibling batch (or the
    shared batched general runner)."""


_MISS = object()


def _drive_sync(fn):
    """Wrap an async backend method declared sync_io into a plain call:
    drive the coroutine one slice (send(None)); completion within the
    slice is the declared contract — a suspension violates it."""
    def call(prompt, default=""):
        coro = fn(prompt, default)
        try:
            coro.send(None)
        except StopIteration as si:
            return si.value
        coro.close()
        raise RuntimeError(
            "backend declares sync_io=True but user_input suspended")
    return call


class TurboEngine:
    """Run one turbo-planned program over a batch of instances.

    The ring is batched: one gather of all parked rows per round, host
    service in numpy, one scatter back (SURVEY.md §7.3(7)).

    Known decode-order divergence: decoded insert dicts list keys in static
    slot order, not dynamic first-write order; save-file key order and
    show_inserts row order can differ from the host engine (values are
    identical). Programs where that ordering is observable should use the
    general engine.
    """

    def __init__(self, compiled, tcfg: TurboConfig = None, io_factory=None,
                 plan: TurboPlan = None, interpret: bool = None,
                 lanering=None, instance_ids: list = None,
                 promote_factor: int = 4, mesh=None, mesh_axis: str = "dp"):
        from ..core.context import CTX
        from ..io.manager import BufferBackend, IOManager
        from .config import PARK_AWAIT_INSERT
        from ..compiler.turbo import plan_turbo
        from .lanering import LaneRing
        if CTX.inserts_dir:
            raise NotTurbo("--inserts-dir fallback needs the general engine")
        self.plan = plan or plan_turbo(compiled)
        self.compiled = compiled
        self.tcfg = tcfg or TurboConfig()
        self.cols = _make_cols(self.plan, self.tcfg)
        self.io_factory = io_factory or (lambda i: IOManager(BufferBackend()))
        if interpret is None:
            interpret = jax.devices()[0].platform not in ("tpu",)
        self.interpret = interpret
        self._step_fns: dict = {}
        self._host_results: dict = {}
        self._park_await = PARK_AWAIT_INSERT
        self._slot_keys = list(self.plan.slot_names)
        # shared parallel-block lane servicing (vm/lanering.py): lane
        # parks ride THIS engine's ring — instances stay batched. The
        # LaneRing is shared with promotion/escape siblings so in-flight
        # lane IO survives an instance's migration; instance_ids map this
        # engine's rows to the LaneRing's global instance keys.
        self._lanering = lanering if lanering is not None \
            else LaneRing(compiled)
        self.instance_ids = list(instance_ids) if instance_ids else None
        # slot-overflow promotion: a value that outgrows this config's
        # widths re-encodes the instance into ONE wider sibling batch
        # (promote_factor × width/elem_width/out_width) instead of
        # retiring to single-instance host execution (VERDICT r3 next #2).
        # 0/None disables (the wide sibling itself doesn't re-promote);
        # whatever doesn't fit the sibling either goes to ONE shared
        # batched general-engine runner — never per-instance runners.
        self.promote_factor = promote_factor
        self._promote_states: dict = {}   # i → promo record
        self._escape_states: dict = {}    # i → promo record (general eng.)
        self._escape_results: dict = {}   # i → final result dict
        self._promo_tasks: list = []      # in-flight concurrent flushes
        # pure-DP device mesh (SURVEY §2.4): the mega-kernel runs per
        # device via shard_map (build_sharded_step_fn); batches are laid
        # out with per-leaf shardings (sbuf shards its INSTANCE axis) and
        # the ring's fused gather/scatter jits operate on the sharded
        # arrays (XLA inserts the gathers over ICI)
        self.mesh = mesh
        self.mesh_axis = mesh_axis
        # output spill: instance → (drained_output, clear_epoch). When a
        # row's accumulated output outgrows the device buffer it is
        # drained here at ring-service time and the device keeps an empty
        # tail, so print-heavy programs stay native instead of retiring
        # to the host (VERDICT r2 next #7). A stale epoch (an in-kernel
        # `clear` ran since the drain) voids the prefix.
        self._out_prefix: dict = {}
        # ring telemetry (same fields as DeviceRunner.ring_stats, plus
        # fast_parks = parks serviced by the vectorized fast path)
        self.ring_stats = {"rounds": 0, "parks": 0, "escapes": 0,
                           "fast_parks": 0, "parks_by_kind": {},
                           "ring_ms": 0.0}
        # fused ring-transfer jits (built lazily) + the list-META row set:
        # byte planes travel device↔host as uint8, meta rows as int32
        self._xfer_fns = None
        self._meta_rows = sorted(self.cols.meta_row.values())
        # vectorized fast park servicing (VERDICT r3 next #3): literal-
        # prompt user_input parks on sync_io backends are serviced without
        # per-row decode/executor/encode, moving only a few u8 register
        # columns down and a deduped result table up; resume bookkeeping
        # (pc/steps/lane clears) is computed ON DEVICE (_fast_resume_fn).
        # IE_TPU_FAST_RING=0 forces every park through the exact slow path.
        import os as _os
        self._fast_enabled = _os.environ.get("IE_TPU_FAST_RING", "1") != "0"
        self._fast_tables = None
        self._fast_call: dict = {}       # i → bound sync call | None
        self._fast_call_ok = None        # (n,) i8: 1 sync, -1 no, 0 unknown
        self._cancel_ok = None           # (n,) i8: empty_choice_pure probe
        self._ios: dict = {}             # i → IOManager (io_factory cache)
        self._meta_fns: dict = {}        # "full" → meta-column slice jit
        self._fast_resume_fns: dict = {}  # (slot, U_pad) → jit

    # ---- batch lifecycle ---------------------------------------------------

    def _padded(self, n: int) -> int:
        t = self.tcfg.tile
        if self.mesh is not None:
            t *= int(self.mesh.devices.size)   # tile multiple per shard
        return max(t, ((n + t - 1) // t) * t)

    def _place(self, batch: TurboBatch) -> TurboBatch:
        """Lay a freshly-encoded batch out over the mesh (no-op without
        one): per-leaf DP shardings (parallel/mesh.py shard_turbo_batch)."""
        if self.mesh is None:
            return batch
        from ..parallel.mesh import shard_turbo_batch
        return shard_turbo_batch(batch, self.mesh, self.mesh_axis)

    def make_batch(self, n: int, args: list = ()) -> TurboBatch:
        """N fresh instances (prototype encode + broadcast)."""
        from ..core.context import ESCAPE, INSERT_START, INSERT_STOP
        inserts = dict(self.compiled.program["default_state"]["inserts"])
        for i, arg in enumerate(args, start=1):
            inserts[f"ARG{i}"] = (
                str(arg).replace(INSERT_START, ESCAPE + INSERT_START)
                        .replace(INSERT_STOP, ESCAPE + INSERT_STOP))
        row = self._encode_row(inserts, output="", pc=0, steps=0)
        n_pad = self._padded(n)
        regs = np.ascontiguousarray(
            np.broadcast_to(row["regs"][None], (n_pad, self.cols.regw)))
        sbuf = np.ascontiguousarray(np.broadcast_to(
            row["sbuf"][:, None, :],
            (row["sbuf"].shape[0], n_pad, self.tcfg.width)))
        out = np.ascontiguousarray(
            np.broadcast_to(row["out"][None], (n_pad, self.tcfg.out_width)))
        if n_pad > n:
            regs[n:, C_STATUS] = DONE
        self._n_live = n
        self._reset_run_state()
        return self._place(TurboBatch(regs=jnp.asarray(regs),
                                      sbuf=jnp.asarray(sbuf),
                                      out=jnp.asarray(out)))

    def _reset_run_state(self) -> None:
        self._out_prefix.clear()
        self._promote_states.clear()
        self._escape_states.clear()
        self._escape_results.clear()
        self._host_results.clear()

    def _encode_slot(self, regs: np.ndarray, sbuf: np.ndarray,
                     key, value) -> None:
        """Encode ONE insert value into its slot's register cells and byte
        rows, in place (regs: (REGW,), sbuf: (R, W); the caller guarantees
        the slot's cells/rows are zeroed).

        Values violating the plan's slot-kind inference (a string landing
        in an int-only slot or vice versa — only possible via host-serviced
        ops the planner misjudged) raise, so the lane retires to exact host
        execution instead of running a branch whose dead path was elided.
        """
        w = self.tcfg.width
        cols = self.cols
        s = self.plan.slot_of.get(str(key))
        if s is None:
            raise TurboEncodeError(f"key {key!r} has no slot")
        if isinstance(value, bool) or \
                not isinstance(value, (int, str, list)):
            raise TurboEncodeError(f"value of {key!r} is not "
                                   f"int/str/list")
        if isinstance(value, int):
            if not (-2**31 <= value < 2**31):
                raise TurboEncodeError(f"int {key!r} exceeds int32")
            if cols.kind(s) in ("str", "none", "list"):
                raise TurboEncodeError(
                    f"int value in non-int slot {key!r}")
            regs[cols.stype(s)] = T_INT
            regs[cols.sint(s)] = value
        elif isinstance(value, list):
            if cols.kind(s) != "list":
                raise TurboEncodeError(
                    f"list value in scalar slot {key!r}")
            if len(value) > cols.E:
                raise TurboEncodeError(
                    f"list {key!r} exceeds {cols.E} elements")
            regs[cols.stype(s)] = T_LIST
            regs[cols.slen(s)] = len(value)
            meta = sbuf[cols.meta_row[s]]
            ek = cols.ekind(s)
            for e, elem in enumerate(value):
                if isinstance(elem, bool) or \
                        not isinstance(elem, (int, str)):
                    raise TurboEncodeError(
                        f"element of {key!r} is not int/str")
                if (isinstance(elem, int) and ek == "str") or \
                        (isinstance(elem, str) and ek == "int"):
                    # violates the plan's element-kind inference
                    # (dead paths were elided) — retire to host
                    raise TurboEncodeError(
                        f"element kind of {key!r} violates the "
                        f"plan ({ek}-only list)")
                if isinstance(elem, int):
                    if not (-2**31 <= elem < 2**31):
                        raise TurboEncodeError(
                            f"element of {key!r} exceeds int32")
                    meta[e] = T_INT
                    meta[cols.E + e] = elem
                else:
                    data = elem.encode("utf-8")
                    if len(data) > cols.ew:
                        raise TurboEncodeError(
                            f"element of {key!r} exceeds "
                            f"{cols.ew}B")
                    meta[e] = T_STR
                    meta[2 * cols.E + e] = len(data)
                    row, off = cols.elem_pos(s, e)
                    sbuf[row, off:off + len(data)] = \
                        np.frombuffer(data, np.uint8)
        else:
            data = value.encode("utf-8")
            if len(data) > w:
                raise TurboEncodeError(f"string {key!r} exceeds {w}B")
            if s not in cols.str_row:
                raise TurboEncodeError(
                    f"string value in int-only slot {key!r}")
            regs[cols.stype(s)] = T_STR
            regs[cols.slen(s)] = len(data)
            sbuf[cols.str_row[s], :len(data)] = \
                np.frombuffer(data, np.uint8)

    def _zero_slot(self, regs: np.ndarray, sbuf: np.ndarray,
                   s: int) -> None:
        """Zero slot s's register cells and byte rows (the encode
        invariant: bytes past a value's length are zero)."""
        cols = self.cols
        regs[cols.stype(s)] = 0
        regs[cols.sint(s)] = 0
        regs[cols.slen(s)] = 0
        if s in cols.str_row:
            sbuf[cols.str_row[s], :] = 0
        if s in cols.meta_row:
            sbuf[cols.meta_row[s], :] = 0
            r0 = cols.list_row0[s]
            sbuf[r0:r0 + cols.elem_rows, :] = 0

    def _encode_row(self, inserts: dict, output: str, pc: int,
                    steps: int) -> dict:
        """Encode one instance's state into per-field numpy rows."""
        w, ow = self.tcfg.width, self.tcfg.out_width
        cols = self.cols
        regs = np.zeros((cols.regw,), np.int32)
        regs[C_PC] = pc
        regs[C_STATUS] = RUNNING
        regs[C_STEPS] = steps
        sbuf = np.zeros((cols.n_rows, w), np.int32)
        out = np.zeros((ow,), np.int32)
        for key, value in inserts.items():
            self._encode_slot(regs, sbuf, key, value)
        out_data = output.encode("utf-8")
        if len(out_data) > ow:
            raise TurboEncodeError("output exceeds the device buffer")
        out[:len(out_data)] = np.frombuffer(out_data, np.uint8)
        regs[C_OUTLEN] = len(out_data)
        return {"regs": regs, "sbuf": sbuf, "out": out}

    # ---- save/load (reference-format state dicts) --------------------------

    def export_state(self, batch: TurboBatch, i: int) -> dict:
        """Decode instance i into the reference's runtime-state dict shape,
        with nested cursors reconstructed from (pc, loop-counter columns) —
        same contract as DeviceRunner.export_state, so turbo checkpoints
        load on any engine (and in the reference)."""
        from .driver import emit_cursors, emit_par_cursors
        sub = {"regs": np.asarray(batch.regs[i:i + 1]),
               "sbuf": np.asarray(batch.sbuf[:, i:i + 1]),
               "out": np.asarray(batch.out[i:i + 1])}
        state = self._decode_row(sub, 0, i)
        regs = sub["regs"][0]
        pc = min(int(regs[C_PC]), self.compiled.n_instr - 1)
        lc0 = self.cols._loops0
        counters = regs[lc0:lc0 + self.cols.n_loops]
        if int(regs[C_PARMODE]) > 0:
            # saved inside a parallel block: the turbo lane columns map
            # 1:1 onto the general engine's thread fields (see _escape),
            # so per-lane cursor chains emit exactly like the host's
            # (interpolation_engine.py:1637-1652)
            cols = self.cols
            st = SimpleNamespace(
                pc=int(regs[C_PC]), status=int(regs[C_STATUS]),
                cur_tid=int(regs[C_CURTID]),
                par_join=int(regs[C_PARJOIN]),
                tpc=np.asarray([regs[cols.tpc(l)]
                                for l in range(cols.nt)]),
                tstate=np.asarray([regs[cols.tstate(l)]
                                   for l in range(cols.nt)]))
            emit_par_cursors(self.compiled, state, st, counters)
        else:
            emit_cursors(self.compiled, state, pc, counters)
        return state

    def load_state(self, state: dict, i: int = None) -> dict:
        """Encode a reference-format state dict as one turbo row (cursor
        chains resolve to a pc; for-counters land in loop columns)."""
        from .driver import pc_of_state
        counters = np.zeros((max(self.cols.n_loops, 1),), np.int32)
        pc, leftovers, par = pc_of_state(self.compiled, state, counters)
        if leftovers:
            raise ValueError(
                f"state has block cursors below a host-op task "
                f"{sorted(leftovers)}; resume requires the host engine")
        if par is not None and par["k"] > self.cols.nt:
            raise ValueError(
                f"state resumes a parallel block with {par['k']} lanes; "
                f"this plan carries {self.cols.nt}")
        output = state.get("output", "")
        if (i is not None and len(output.encode("utf-8"))
                > self.tcfg.out_width // 2):
            # resumed state arrives with more output than the device
            # buffer holds — spill it host-side (fresh rows start at
            # clear-epoch 0)
            self._out_prefix[i] = (output, 0)
            output = ""
        row = self._encode_row(dict(state.get("inserts", {})),
                               output, pc, 0)
        lc0 = self.cols._loops0
        row["regs"][lc0:lc0 + self.cols.n_loops] = \
            counters[:self.cols.n_loops]
        if par is not None:
            # re-seed the lane set exactly like IParBegin, but with the
            # saved per-lane resume pcs (host: the block re-runs; lanes
            # with cursors resume, cursor-less lanes restart —
            # interpolation_engine.py:1581-1626)
            regs, cols = row["regs"], self.cols
            regs[C_PARMODE] = par["mode"]
            regs[C_PARJOIN] = par["join_pc"]
            regs[C_CURTID] = 0
            regs[C_PC] = par["tpc"][0]
            for l in range(cols.nt):
                if l < par["k"]:
                    regs[cols.tpc(l)] = par["tpc"][l]
                    regs[cols.tstate(l)] = T_NEW
                else:
                    regs[cols.tpc(l)] = 0
                    regs[cols.tstate(l)] = T_FREE
                regs[cols.tparg(l)] = 0
        return row

    def load_batch(self, states: list) -> TurboBatch:
        """A batch resuming the given reference-format states.

        Rows are deduplicated by structural state identity before the
        upload: batched rollouts routinely resume fleets where thousands
        of instances share a handful of distinct states, and uploading
        131k near-identical rows over a remote-device tunnel costs tens
        of minutes (measured: the divergent bench's ~670MB sbuf at
        ~20MB/s), while U unique rows + an int32 index expanded with
        jnp.take on device cost seconds. Encode cost drops the same way
        (U encodes instead of N)."""
        self._reset_run_state()

        def canon(v):
            """Type-faithful structural key: json.dumps would conflate
            tuple/list and bool/int (and bool dict keys with their str
            forms), merging states the encoder accepts with ones it must
            REJECT — repr + the type name preserves every distinction
            (np.int32(3) reprs as '3' on numpy<2, which bare repr would
            conflate with int 3 — ADVICE r3)."""
            if isinstance(v, dict):
                return ("d", tuple(sorted(
                    (repr(k), canon(x)) for k, x in v.items())))
            if isinstance(v, (list, tuple)):
                return (type(v).__name__, tuple(canon(x) for x in v))
            return (type(v).__name__, repr(v))

        uniq_rows: list = []
        seen: dict = {}
        index = []
        for j, s in enumerate(states):
            key = repr(canon(s))
            u = seen.get(key)
            if u is None:
                u = seen[key] = len(uniq_rows)
                uniq_rows.append(self.load_state(s, i=j))
            elif (len(s.get("output", "").encode("utf-8"))
                    > self.tcfg.out_width // 2):
                # load_state's per-instance spill side effect, replicated
                # for deduped rows (fresh rows start at clear-epoch 0)
                self._out_prefix[j] = (s.get("output", ""), 0)
            index.append(u)
        n = len(states)
        n_pad = self._padded(n)
        U = len(uniq_rows)
        regs_u = np.zeros((U + 1, self.cols.regw), np.int32)
        sbuf_u = np.zeros((self.cols.n_rows, U + 1, self.tcfg.width),
                          np.int32)
        out_u = np.zeros((U + 1, self.tcfg.out_width), np.int32)
        for u, row in enumerate(uniq_rows):
            regs_u[u] = row["regs"]
            sbuf_u[:, u, :] = row["sbuf"]
            out_u[u] = row["out"]
        regs_u[U, C_STATUS] = DONE   # the pad-row prototype
        idx_np = np.full((n_pad,), U, np.int32)
        idx_np[:n] = index
        idx = jnp.asarray(idx_np)
        self._n_live = n
        return self._place(TurboBatch(
            regs=jnp.take(jnp.asarray(regs_u), idx, axis=0),
            sbuf=jnp.take(jnp.asarray(sbuf_u), idx, axis=1),
            out=jnp.take(jnp.asarray(out_u), idx, axis=0)))

    @staticmethod
    def _u8_views(sub: dict):
        """Batch-wide uint8 views of the byte planes, computed ONCE per sub
        dict (ring round / results pass): one vectorized cast replaces a
        per-slot-per-row astype allocation in the decode loop, the ring's
        hottest host code. Byte planes hold ASCII values 0-255 in int32, so
        the cast is lossless (element META stays int32 — element ints are
        full-range). Writers keep the views in sync via _sync_u8."""
        u8 = sub.get("sbuf_u8")
        if u8 is None:
            u8 = sub["sbuf_u8"] = sub["sbuf"].astype(np.uint8)
            sub["out_u8"] = sub["out"].astype(np.uint8)
        return u8, sub["out_u8"]

    @staticmethod
    def _sync_u8(sub: dict, j: int) -> None:
        """Refresh row j of the uint8 decode views after a write-back."""
        u8 = sub.get("sbuf_u8")
        if u8 is not None:
            u8[:, j] = sub["sbuf"][:, j]
            sub["out_u8"][j] = sub["out"][j]

    def _decode_row(self, sub: dict, j: int, i: int = None) -> dict:
        cols = self.cols
        regs = sub["regs"][j]
        sbuf_u8, out_u8 = self._u8_views(sub)
        inserts = {}
        for s, key in enumerate(self._slot_keys):
            vt = int(regs[cols.stype(s)])
            if vt == T_INT:
                inserts[key] = int(regs[cols.sint(s)])
            elif vt == T_STR:
                ln = int(regs[cols.slen(s)])
                row = cols.str_row[s]
                inserts[key] = sbuf_u8[row, j, :ln].tobytes().decode(
                    "utf-8", "replace")
            elif vt == T_LIST:
                count = int(regs[cols.slen(s)])
                meta = sub["sbuf"][cols.meta_row[s], j]
                elems = []
                for e in range(min(count, cols.E)):
                    if int(meta[e]) == T_INT:
                        elems.append(int(meta[cols.E + e]))
                    else:
                        el = int(meta[2 * cols.E + e])
                        row, off = cols.elem_pos(s, e)
                        elems.append(
                            sbuf_u8[row, j, off:off + el].tobytes()
                            .decode("utf-8", "replace"))
                inserts[key] = elems
        ln = int(regs[C_OUTLEN])
        output = out_u8[j, :ln].tobytes().decode("utf-8", "replace")
        if i is not None and i in self._out_prefix:
            text, epoch = self._out_prefix[i]
            if epoch == int(regs[C_CLREPOCH]):
                output = text + output
            else:
                # an in-kernel clear ran after the drain — prefix is dead
                del self._out_prefix[i]
        return {"inserts": inserts, "output": output}

    # ---- stepping -----------------------------------------------------------

    def step_fn(self, n: int):
        if n not in self._step_fns:
            self._step_fns[n] = self._build_or_load_step(n)
        return self._step_fns[n]

    def step_cache_key(self, n: int) -> str:
        """AOT cache key of this engine's n-row step kernel — cheap (no
        tracing). bench.py's cold-start guard checks aotcache.is_cached
        on it to avoid walking into a multi-thousand-second cold compile
        inside the driver's capture timeout."""
        from . import aotcache
        return aotcache.cache_key(
            aotcache.kernel_sources(),
            (plan_fingerprint(self.plan, self.tcfg), self.tcfg, n))

    def step_is_cached(self, n: int) -> bool:
        from . import aotcache
        return aotcache.is_cached("turbo-step", self.step_cache_key(n))

    def _build_or_load_step(self, n: int):
        """AOT kernel cache (vm/aotcache.py). The mega-kernel's dominant
        cost is CLIENT-side tracing + Pallas→Mosaic lowering (the
        adventure kernel: ~36 min of single-core work per process; the
        XLA backend compile is <1 s, and jax's persistent compilation
        cache cannot skip lowering because it keys on the already-lowered
        module). The lowered module is exported to disk and reloaded
        bit-identically in <1 s by later processes (measured:
        benchmarks/README.md).

        The key is the PLAN SHAPE (plan_fingerprint), not raw program
        content: string literals ride into the executable as an input
        array, so a never-before-seen program whose IR shape matches a
        compiled one reaches its first step in seconds (VERDICT r3 #4)."""
        if self.mesh is not None:
            # shard_map path (per-device mega-kernel); AOT export of
            # sharded executables is backend-specific — skip the cache
            return build_sharded_step_fn(self.plan, self.tcfg, n,
                                         self.interpret, self.mesh,
                                         self.mesh_axis)
        if self.interpret:
            return build_step_fn(self.plan, self.tcfg, n, self.interpret)
        from . import aotcache
        key = self.step_cache_key(n)
        lit_table = _LitTable(self.tcfg.width)
        lit_table.collect(self.plan.instrs)
        lits_np = lit_table.array()
        shapes = TurboBatch(
            regs=jax.ShapeDtypeStruct((n, self.cols.regw), jnp.int32),
            sbuf=jax.ShapeDtypeStruct(
                (self.cols.n_rows, n, self.tcfg.width), jnp.int32),
            out=jax.ShapeDtypeStruct((n, self.tcfg.out_width), jnp.int32))
        lits_sds = jax.ShapeDtypeStruct(lits_np.shape, jnp.int32)
        fn = aotcache.load_or_export(
            "turbo-step", key,
            lambda: build_step_fn(self.plan, self.tcfg, n,
                                  self.interpret).jitted,
            (lits_sds, shapes))
        lits = jnp.asarray(lits_np)

        def step(batch: TurboBatch) -> TurboBatch:
            return fn(lits, batch)
        return step

    # ---- host ring -----------------------------------------------------------

    def _gid(self, row: int) -> int:
        """Global instance id of a batch row (shared-LaneRing keying)."""
        return self.instance_ids[row] if self.instance_ids else row

    def _row_of(self, gid: int, n: int):
        """Batch row of a global id, or None when a sibling engine owns it."""
        if self.instance_ids is not None:
            if not hasattr(self, "_row_index"):
                self._row_index = {g: r for r, g
                                   in enumerate(self.instance_ids)}
            return self._row_index.get(gid)
        return gid if 0 <= gid < n else None

    def _io_for(self, i: int):
        io = self._ios.get(i)
        if io is None:
            io = self._ios[i] = self.io_factory(i)
        return io

    def _runtime_for(self, i: int, rts: dict):
        from ..core.executor import Runtime
        return rts.setdefault(i, Runtime(
            self._io_for(i),
            self.compiled.program.get("completion_args", {}),
            self.compiled.program.get("named_tasks", {})))

    # ---- vectorized fast park servicing (VERDICT r3 next #3) -----------------

    def _build_fast_tables(self):
        """Static per-pc fast-service eligibility: literal-prompt
        user_input parks with a literal output_name landing in a str-row
        slot. ``fast_drain[pc]`` additionally requires the park to be its
        lane's LAST task (next row is OP_THREAD_END), so the drain
        continuation (vm/lanering.py _run_until_yield) is trivially empty
        and completing the block on device is exact."""
        if self._fast_tables is not None:
            return self._fast_tables
        from .config import (PARK_AWAIT_INSERT, PARK_USER_CHOICE,
                             PARK_USER_INPUT)
        from . import isa as _isa
        P = self.plan.n_instr
        fast_top = np.zeros((P,), bool)
        fast_drain = np.zeros((P,), bool)
        # drain-CANCEL sites (VERDICT r4 next #4): a drained race whose
        # one waiting lane sits at a pc where the LaneRing's service
        # would deterministically cancel with ZERO state writes —
        # await_insert (never spawns a host task: lanering.py drain path
        # marks it T_DONE outright) and a statically-EMPTY user_choice
        # (the spawned task awaits forever with no pre-yield effect on
        # pure backends; AgentBackend publishes a payload first, so rows
        # need backend consent — _cancel_ok). Completing the block on
        # device is then exact: pc := join, lanes cleared, epoch bump.
        cancel_any = np.zeros((P,), bool)     # backend-independent
        cancel_pure = np.zeros((P,), bool)    # needs empty_choice_pure
        sites: dict = {}
        code = self.compiled.code
        for pc, kind in self.plan.park_kind_of.items():
            task = self.compiled.source_tasks[pc]
            if kind == PARK_AWAIT_INSERT:
                name = task.get("name") if task else None
                if not isinstance(name, str) or \
                        any(c in name for c in "{}\\"):
                    continue          # interpolated key: exact slow path
                # literal-name awaits check readiness IN-KERNEL (IPark
                # await_slot): a lane only ever parks here NOT-ready,
                # i.e. suspended at the host twin's sleep — where a race
                # cancel ALWAYS lands, key-present-now or not. So a
                # drain with its lone waiting lane here is always a
                # pure cancel.
                cancel_any[pc] = True
                continue
            if kind == PARK_USER_CHOICE and task and \
                    task.get("cmd") == "user_choice" and \
                    task.get("list") == []:
                cancel_pure[pc] = True
                continue
            if kind != PARK_USER_INPUT:
                continue
            if not task or task.get("cmd") != "user_input":
                continue
            name = task.get("output_name")
            prompt = task.get("prompt")
            if not isinstance(name, str) or \
                    any(c in name for c in "{}\\"):
                continue
            if not isinstance(prompt, str) or \
                    any(c in prompt for c in "{}\\"):
                continue
            out_slot = self.plan.slot_of.get(name)
            if out_slot is None or out_slot not in self.cols.str_row:
                continue
            sites[pc] = (prompt, out_slot)
            fast_top[pc] = True
            if pc + 1 < len(code) and \
                    int(code[pc + 1][0]) == _isa.OP_THREAD_END:
                fast_drain[pc] = True
        self._fast_tables = (fast_top, fast_drain, sites,
                             cancel_any, cancel_pure)
        return self._fast_tables

    def _meta_cols(self) -> list:
        # C_STATUS leads so one download serves BOTH the round-top
        # liveness check and park classification (status ≤ 4 fits u8)
        cols = [C_STATUS, C_PC, C_PARMODE]
        cols += [self.cols.tstate(l) for l in range(self.cols.nt)]
        cols += [self.cols.tparg(l) for l in range(self.cols.nt)]
        return cols

    def _meta_full_fn(self):
        """Slice the classification columns of the WHOLE batch as uint8
        (every value fits: pc < 192, par_mode ≤ 3, tstate ≤ 4,
        tparg < 192). Full-batch (vs a row gather) so the host never
        uploads an index vector and the jit has one shape — the download
        is n×(2+2·nt) bytes."""
        fn = self._meta_fns.get("full")
        if fn is None:
            mc = jnp.asarray(self._meta_cols(), jnp.int32)

            @jax.jit
            def fn(regs):
                return regs[:, mc].astype(jnp.uint8)
            self._meta_fns["full"] = fn
        return fn

    def _pow2_idx(self, rows, n: int):
        k = len(rows)
        k_pad = min(max(8, 1 << (k - 1).bit_length()), max(n, 8))
        idx_np = np.empty((k_pad,), np.int32)
        idx_np[:k] = rows
        idx_np[k:] = rows[0]
        return idx_np, k_pad

    def _fast_call_avail(self, parked: np.ndarray, n: int) -> np.ndarray:
        """Per-row sync-call availability as a vector (1 = has a sync
        user_input call, -1 = not sync-serviceable, 0 = not yet resolved).
        Resolution (io_factory + backend attribute probing) is per-row
        Python, but runs ONCE per row ever — the steady state is a pure
        numpy slice."""
        ok = self._fast_call_ok
        if ok is None or len(ok) != n:
            ok = self._fast_call_ok = np.zeros((n,), np.int8)
        need = parked[ok[parked] == 0]
        if len(need):
            calls = self._fast_call
            for i in need.tolist():
                call = calls.get(i, _MISS)
                if call is _MISS:
                    b = getattr(self._io_for(i), "backend", None)
                    f = getattr(b, "user_input_sync", None)
                    if f is None and getattr(b, "sync_io", False):
                        f = _drive_sync(b.user_input)
                    calls[i] = call = f
                ok[i] = 1 if call is not None else -1
        return ok

    def _cancel_avail(self, parked: np.ndarray, n: int) -> np.ndarray:
        """Per-row consent for the empty-user_choice drain cancel: the
        backend must declare ``empty_choice_pure`` (its select_index on
        an empty list awaits forever with NO pre-yield side effect —
        ScriptedBackend qualifies; AgentBackend publishes a payload file
        first, so it must stay on the exact slow path)."""
        ok = self._cancel_ok
        if ok is None or len(ok) != n:
            ok = self._cancel_ok = np.zeros((n,), np.int8)
        need = parked[ok[parked] == 0]
        for i in need.tolist():
            b = getattr(self._io_for(i), "backend", None)
            ok[i] = 1 if getattr(b, "empty_choice_pure", False) else -1
        return ok

    def _fast_cancel_fn(self):
        """Device-side drain-cancel resume: complete the parallel block
        for masked rows with ZERO slot writes — pc := join, status
        RUNNING, steps+1, lanes freed, parallel registers cleared, epoch
        bump. Equals the LaneRing drain path for a lone waiting lane at
        an await_insert / pure empty user_choice (lanering.py:282-306
        with no runnable lanes)."""
        fn = self._fast_resume_fns.get("cancel")
        if fn is not None:
            return fn
        cols = self.cols
        nt = cols.nt
        regw = cols.regw

        def fn(regs, mask):
            m = mask != 0
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, regw), 1)
            mm = m[:, None]
            new = regs

            def setc(new, c, v):
                return jnp.where((lane == c) & mm, v[:, None], new)

            zero = regs[:, C_PC] * 0
            new = setc(new, C_PC, regs[:, C_PARJOIN])
            new = setc(new, C_STATUS, zero + RUNNING)
            new = setc(new, C_STEPS, regs[:, C_STEPS] + 1)
            new = setc(new, C_CURTID, zero - 1)
            new = setc(new, C_PARMODE, zero + PM_NONE)
            new = setc(new, C_PARJOIN, zero)
            new = setc(new, C_PAREPOCH, regs[:, C_PAREPOCH] + 1)
            for l in range(nt):
                new = setc(new, cols.tstate(l), zero + T_FREE)
            return new

        fn = jax.jit(fn, donate_argnums=(0,))
        self._fast_resume_fns["cancel"] = fn
        return fn

    def _fast_cancel(self, batch: TurboBatch, rows: np.ndarray,
                     wpcs: np.ndarray) -> TurboBatch:
        """Vectorized drain-cancel service for `rows` (waiting-lane pcs
        `wpcs` for the kind tally / event parity)."""
        from ..core.events import EVENTS, TASK_START, VM_PARK
        from .config import PARK_USER_CHOICE
        n = int(batch.regs.shape[0])
        mask = np.zeros((n,), np.uint8)
        mask[rows] = 1
        regs = self._fast_cancel_fn()(batch.regs, jnp.asarray(mask))
        batch = TurboBatch(regs, batch.sbuf, batch.out)
        by = self.ring_stats["parks_by_kind"]
        n_choice = 0
        for pc, cnt in zip(*np.unique(wpcs, return_counts=True)):
            kind = self.plan.park_kind_of.get(int(pc), 0)
            by[kind] = by.get(kind, 0) + int(cnt)
            if kind == PARK_USER_CHOICE:
                n_choice += int(cnt)
        if n_choice:
            # the slow path's spawned lane task would have run
            # execute_task's prefix (TASK_START) and exec_parked's
            # VM_PARK before the cancel; await_insert lanes spawn
            # nothing (lanering.py spawn_new_lane_tasks skips them)
            EVENTS.counters[TASK_START] = \
                EVENTS.counters.get(TASK_START, 0) + n_choice
            EVENTS.counters[VM_PARK] = \
                EVENTS.counters.get(VM_PARK, 0) + n_choice
        self.ring_stats["fast_parks"] += len(rows)
        return batch

    def _classify_parked(self, batch: TurboBatch, parked: np.ndarray,
                         meta_np: np.ndarray = None):
        """Split parked rows into fast-serviceable site groups and the
        slow (exact per-row) remainder. Fast requires: a fast site pc
        (top-level park, or a drain with exactly one WAIT lane at a
        lane-final fast site), a sync_io backend, logging/events off, and
        no pending lane IO for the instance. Pure numpy over one
        full-batch u8 column download (meta_np when the round loop
        already fetched it) — no per-row Python in steady state (the
        per-row backend call itself lives in _fast_service)."""
        from ..core.context import log_enabled
        from ..core.events import EVENTS
        none = (np.zeros((0,), np.int64), np.zeros((0,), np.int64))
        if not self._fast_enabled or len(parked) == 0:
            return {}, none, parked
        (fast_top, fast_drain, sites, cancel_any,
         cancel_pure) = self._build_fast_tables()
        has_cancel = bool(cancel_any.any() or cancel_pure.any())
        if (not sites and not has_cancel) or log_enabled() \
                or EVENTS.enabled:
            return {}, none, parked
        k = len(parked)
        n = int(batch.regs.shape[0])
        if meta_np is None:
            meta_np = np.asarray(self._meta_full_fn()(batch.regs))
        meta = meta_np[parked].astype(np.int32)[:, 1:]   # drop C_STATUS
        P = self.plan.n_instr
        pcs = meta[:, 0]
        pm = meta[:, 1]
        top_mask = (pm == PM_NONE) & fast_top[np.clip(pcs, 0, P - 1)]
        site_pcs = np.where(top_mask, pcs, -1)
        nt = self.cols.nt
        cancel_mask = np.zeros((k,), bool)
        if nt:
            tst = meta[:, 2:2 + nt]
            targ = meta[:, 2 + nt:2 + 2 * nt]
            is_wait = tst == T_WAIT
            waitc = is_wait.sum(1)
            okstates = ((tst == T_WAIT) | (tst == T_DONE) |
                        (tst == T_FREE)).all(1)
            wl = is_wait.argmax(1)
            wpc = np.clip(targ[np.arange(k), wl], 0, P - 1)
            drainable = (pm == PM_DRAIN) & (waitc == 1) & okstates
            dmask = drainable & fast_drain[wpc]
            site_pcs = np.where(dmask, wpc, site_pcs)
            fast_mask = top_mask | dmask
            if has_cancel:
                # drain-cancel rows: complete the block with no writes.
                # (await_insert lanes only park NOT-ready — the in-kernel
                # IPark await_slot check — so the host twin is suspended
                # at its sleep, where the cancel always lands.)
                cancel_mask = drainable & cancel_any[wpc]
                pure = drainable & cancel_pure[wpc]
                if pure.any():
                    pure &= self._cancel_avail(parked, n)[parked] == 1
                    cancel_mask |= pure
        else:
            wpc = np.zeros((k,), np.int64)
            fast_mask = top_mask
        fast_mask &= self._fast_call_avail(parked, n)[parked] == 1
        fast_mask &= ~cancel_mask
        pend = self._lanering.pending
        if pend and (fast_mask.any() or cancel_mask.any()):
            # pending lane IO demotes a row to the exact slow path; pend
            # is small (lanes mid-await), so resolve its rows directly
            prows = [r for r in (self._row_of(g, n) for g in pend)
                     if r is not None]
            if prows:
                demote = ~np.isin(parked, prows)
                fast_mask &= demote
                cancel_mask &= demote
        fp = parked[fast_mask]
        groups: dict = {}
        if len(fp):
            sp = site_pcs[fast_mask]
            if (sp == sp[0]).all():       # lockstep batch: one site
                groups[int(sp[0])] = fp
            else:
                for pc in np.unique(sp):
                    groups[int(pc)] = fp[sp == pc]
        cancels = (parked[cancel_mask], wpc[cancel_mask])
        slow = parked[~(fast_mask | cancel_mask)]
        return groups, cancels, slow

    def _fast_resume_fn(self, out_slot: int, u_pad: int):
        """Device-side resume for one fast site: write the (deduped)
        results into the out slot and do ALL register bookkeeping on
        device — pc := (drain ? join : pc+1), steps+1, status RUNNING,
        and on drain completion the lane/parallel clears + epoch bump —
        so the host never moves full rows. Full-batch masked (uploads are
        an n-byte mask + n-byte dedup index, not row-index vectors), so
        one specialization serves every round and, under a mesh, the
        update is elementwise — no cross-device gather/scatter."""
        key = (out_slot, u_pad)
        fn = self._fast_resume_fns.get(key)
        if fn is not None:
            return fn
        cols = self.cols
        row_idx = cols.str_row[out_slot]
        stype_c = cols.stype(out_slot)
        sint_c = cols.sint(out_slot)
        slen_c = cols.slen(out_slot)
        nt = cols.nt
        regw = cols.regw

        w = self.tcfg.width

        def fn(regs, sbuf, mi, uniq):
            # mi: (n, 2) [mask, dedup index]; uniq: (u_pad, w+2) u8 with
            # the result length little-endian in the last two columns —
            # TWO host→device transfers per serviced site, total ~2n bytes
            mask = mi[:, 0] != 0
            inv = mi[:, 1].astype(jnp.int32)
            ub = uniq.astype(jnp.int32)
            uniq_u8 = ub[:, :w]
            uniq_len = ub[:, w] + ub[:, w + 1] * 256
            drain = regs[:, C_PARMODE] == PM_DRAIN
            nxt = jnp.where(drain, regs[:, C_PARJOIN], regs[:, C_PC] + 1)
            rlen = jnp.take(uniq_len, inv)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, regw), 1)
            m = mask[:, None]
            new = regs

            def setc(new, c, v):
                return jnp.where((lane == c) & m, v[:, None], new)

            zero = nxt * 0
            new = setc(new, C_PC, nxt)
            new = setc(new, C_STATUS, zero + RUNNING)
            new = setc(new, C_STEPS, regs[:, C_STEPS] + 1)
            new = setc(new, stype_c, zero + T_STR)
            new = setc(new, sint_c, zero)
            new = setc(new, slen_c, rlen)
            new = setc(new, C_CURTID,
                       jnp.where(drain, -1, regs[:, C_CURTID]))
            new = setc(new, C_PARMODE,
                       jnp.where(drain, PM_NONE, regs[:, C_PARMODE]))
            new = setc(new, C_PARJOIN,
                       jnp.where(drain, 0, regs[:, C_PARJOIN]))
            new = setc(new, C_PAREPOCH,
                       regs[:, C_PAREPOCH] + drain.astype(jnp.int32))
            for l in range(nt):
                c = cols.tstate(l)
                new = setc(new, c,
                           jnp.where(drain, T_FREE, regs[:, c]))
            res = jnp.take(uniq_u8, inv, axis=0).astype(jnp.int32)
            srow = jnp.where(m, res, sbuf[row_idx])
            return new, sbuf.at[row_idx].set(srow)

        fn = jax.jit(fn, donate_argnums=(0, 1))
        self._fast_resume_fns[key] = fn
        return fn

    def _fast_resume_all_fn(self, out_slot: int):
        """_fast_resume_fn specialized to the lockstep case: EVERY row is
        parked at the same fast site with ONE deduped response. The only
        host→device transfer is the (1, w+2) u8 response row — no (n, 2)
        mask/index upload (race-io parks all 131k rows every turn; the
        mask alone was 256 KB/round over the axon tunnel)."""
        fn = self._fast_resume_fns.get(("all", out_slot))
        if fn is not None:
            return fn
        cols = self.cols
        row_idx = cols.str_row[out_slot]
        stype_c = cols.stype(out_slot)
        sint_c = cols.sint(out_slot)
        slen_c = cols.slen(out_slot)
        nt = cols.nt
        regw = cols.regw
        w = self.tcfg.width

        def fn(regs, sbuf, uniq):
            ub = uniq.astype(jnp.int32)           # (1, w+2)
            uniq_u8 = ub[:, :w]
            rlen = ub[:, w] + ub[:, w + 1] * 256  # (1,)
            drain = regs[:, C_PARMODE] == PM_DRAIN
            nxt = jnp.where(drain, regs[:, C_PARJOIN], regs[:, C_PC] + 1)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, regw), 1)
            new = regs

            def setc(new, c, v):
                return jnp.where(lane == c, v[:, None], new)

            zero = nxt * 0
            new = setc(new, C_PC, nxt)
            new = setc(new, C_STATUS, zero + RUNNING)
            new = setc(new, C_STEPS, regs[:, C_STEPS] + 1)
            new = setc(new, stype_c, zero + T_STR)
            new = setc(new, sint_c, zero)
            new = setc(new, slen_c, zero + rlen)
            new = setc(new, C_CURTID,
                       jnp.where(drain, -1, regs[:, C_CURTID]))
            new = setc(new, C_PARMODE,
                       jnp.where(drain, PM_NONE, regs[:, C_PARMODE]))
            new = setc(new, C_PARJOIN,
                       jnp.where(drain, 0, regs[:, C_PARJOIN]))
            new = setc(new, C_PAREPOCH,
                       regs[:, C_PAREPOCH] + drain.astype(jnp.int32))
            for l in range(nt):
                c = cols.tstate(l)
                new = setc(new, c,
                           jnp.where(drain, T_FREE, regs[:, c]))
            srow = jnp.broadcast_to(uniq_u8, sbuf[row_idx].shape)
            return new, sbuf.at[row_idx].set(srow)

        fn = jax.jit(fn, donate_argnums=(0, 1))
        self._fast_resume_fns[("all", out_slot)] = fn
        return fn

    async def _fast_service(self, batch: TurboBatch, groups: dict,
                            rts: dict):
        """Service fast site groups: per-row sync backend calls (the only
        irreducibly per-instance work), dict-deduped results, one device
        resume per site. Returns (batch, n_serviced)."""
        from ..core.context import ESCAPE, INSERT_START, INSERT_STOP
        from ..core.events import EVENTS, TASK_START, VM_PARK
        from .config import PARK_USER_INPUT
        sites = self._build_fast_tables()[2]
        n_done = 0
        w = self.tcfg.width
        n = int(batch.regs.shape[0])
        for site_pc, rows in groups.items():
            prompt, out_slot = sites[site_pc]
            calls = self._fast_call
            rows_l = rows.tolist() if isinstance(rows, np.ndarray) \
                else list(rows)
            results = [calls[i](prompt) for i in rows_l]
            # dedup: one C-speed membership pass short-circuits the
            # common every-row-same-response round to a single unique
            if len(set(results)) == 1:
                uniq = {results[0]: 0}
                inv = None                       # ≡ all zeros
            else:
                uniq = {}
                inv = []
                for r in results:
                    u = uniq.get(r)
                    if u is None:
                        u = uniq[r] = len(uniq)
                    inv.append(u)
            enc: list = []
            bad_uniques = set()
            for r, u in sorted(uniq.items(), key=lambda kv: kv[1]):
                if not isinstance(r, str):
                    raise TypeError(
                        f"sync backend returned non-str user_input "
                        f"result {type(r).__name__}")
                esc = (r.replace(INSERT_START, ESCAPE + INSERT_START)
                        .replace(INSERT_STOP, ESCAPE + INSERT_STOP))
                data = esc.encode("utf-8")
                if len(data) > w:
                    bad_uniques.add(u)
                    data = b""
                enc.append(data)
            if bad_uniques:
                inv_l = inv if inv is not None else [0] * len(rows_l)
                keep_rows, keep_inv = [], []
                for k_, (i, u) in enumerate(zip(rows_l, inv_l)):
                    if u in bad_uniques:
                        batch = await self._promote_after_fast(
                            batch, i, site_pc, results[k_])
                        n_done += 1
                    else:
                        keep_rows.append(i)
                        keep_inv.append(u)
                rows_l, inv = keep_rows, keep_inv
            if not rows_l:
                continue
            if len(rows_l) == n and len(enc) == 1:
                # lockstep round (every row at this site, one deduped
                # response): skip the (n, 2) mask upload entirely
                uniq_pk = np.zeros((1, w + 2), np.uint8)
                data = enc[0]
                uniq_pk[0, :len(data)] = np.frombuffer(data, np.uint8)
                uniq_pk[0, w] = len(data) & 0xFF
                uniq_pk[0, w + 1] = len(data) >> 8
                fn = self._fast_resume_all_fn(out_slot)
                regs, sbuf = fn(batch.regs, batch.sbuf,
                                jnp.asarray(uniq_pk))
            else:
                u_pad = max(4, 1 << (len(enc) - 1).bit_length())
                uniq_pk = np.zeros((u_pad, w + 2), np.uint8)
                for u, data in enumerate(enc):
                    uniq_pk[u, :len(data)] = np.frombuffer(data, np.uint8)
                    uniq_pk[u, w] = len(data) & 0xFF
                    uniq_pk[u, w + 1] = len(data) >> 8
                rows_np = np.asarray(rows_l, np.int64)
                mi_dt = np.uint8 if u_pad <= 256 else np.int32
                mi_np = np.zeros((n, 2), mi_dt)
                mi_np[rows_np, 0] = 1
                if inv is not None:
                    mi_np[rows_np, 1] = np.fromiter(inv, mi_dt, len(inv))
                fn = self._fast_resume_fn(out_slot, u_pad)
                regs, sbuf = fn(batch.regs, batch.sbuf,
                                jnp.asarray(mi_np), jnp.asarray(uniq_pk))
            batch = TurboBatch(regs, sbuf, batch.out)
            n_done += len(rows_l)
            # events parity: the fast path only runs with logging/event
            # sinks off, so only the counters need to move
            EVENTS.counters[TASK_START] = \
                EVENTS.counters.get(TASK_START, 0) + len(rows_l)
            EVENTS.counters[VM_PARK] = \
                EVENTS.counters.get(VM_PARK, 0) + len(rows_l)
            by = self.ring_stats["parks_by_kind"]
            by[PARK_USER_INPUT] = by.get(PARK_USER_INPUT, 0) + len(rows_l)
            self.ring_stats["fast_parks"] += len(rows_l)
        return batch, n_done

    async def _promote_after_fast(self, batch: TurboBatch, i: int,
                                  site_pc: int, raw_result: str
                                  ) -> TurboBatch:
        """A fast-serviced result too wide for this config: the backend
        response is already consumed, so apply the user_input store
        host-side on the decoded row and queue the instance for promotion
        (exactly what the slow path's TurboEncodeError handler does)."""
        from ..core.context import ESCAPE, INSERT_START, INSERT_STOP
        task = self.compiled.source_tasks[site_pc]
        sub, idx, k_pad = self._gather_sub(batch, np.asarray([i]))
        state = self._decode_row(sub, 0, i)
        esc = (raw_result.replace(INSERT_START, ESCAPE + INSERT_START)
                         .replace(INSERT_STOP, ESCAPE + INSERT_STOP))
        state["inserts"][task["output_name"]] = esc
        regs = sub["regs"][0]
        cols = self.cols
        lc0 = cols._loops0
        counters = np.asarray(regs[lc0:lc0 + cols.n_loops]).copy()
        steps = int(regs[C_STEPS]) + 1
        if int(regs[C_PARMODE]) == PM_DRAIN:
            next_pc = int(regs[C_PARJOIN])
            epoch = int(regs[C_PAREPOCH]) + 1
        else:
            next_pc = site_pc + 1
            epoch = int(regs[C_PAREPOCH])
        self._queue_promotion(sub, 0, i, state, next_pc, steps,
                              counters, None, epoch)
        return self._scatter_sub(batch, sub, idx, 1, k_pad)

    # ---- slot-overflow promotion / batched escape -----------------------------

    def _escape_vmconfig(self, out_need: int = 0, str_need: int = 0):
        """A general-engine VMConfig guaranteed to hold any state the turbo
        slot model can hold, PLUS whatever oversized values triggered the
        escape (out_need: accumulated output bytes; str_need: longest
        string/element value). Rounded up so escape configs — and therefore
        the general engine's per-shape jits — stay few."""
        from .config import VMConfig
        cols, plan = self.cols, self.plan
        n_lists = max(len(cols.list_ord), 1)
        out_size = max(4096, 4 * self.tcfg.out_width)
        while out_size < 2 * out_need:
            out_size *= 2
        max_str = max(2 * self.tcfg.width, 512)
        while max_str < 2 * str_need:
            max_str *= 2
        return VMConfig(
            max_str=max_str,
            max_key=64,
            n_slots=max(plan.n_slots + 16, 48),
            arena_size=max(16384,
                           2 * (plan.n_slots + cols.E * n_lists) * max_str),
            pool_size=max(96, 4 * cols.E * n_lists),
            out_size=out_size,
            max_loops=max(self.compiled.n_loops, 8),
            max_threads=max(self.plan.needs_threads, 8),
        )

    def _queue_promotion(self, sub: dict, j: int, i: int, state: dict,
                         pc: int, steps: int, counters, par, epoch: int):
        """State outgrew this config's widths: queue the instance for the
        wider turbo sibling (or, with promotion disabled, the shared
        batched general-engine runner). Never a per-instance runner
        (VERDICT r3 next #1/#2)."""
        self._out_prefix.pop(i, None)
        rec = {"state": {"inserts": dict(state["inserts"]),
                         "output": state["output"]},
               "pc": int(pc), "steps": int(steps),
               "counters": np.asarray(counters, np.int32).copy(),
               "par": par, "epoch": int(epoch)}
        if self.promote_factor and self.promote_factor > 1:
            self._promote_states[i] = rec
        else:
            self._escape_states[i] = rec
        # retire the turbo row; results() reads the migrated result
        sub["regs"][j, C_STATUS] = DONE
        sub["regs"][j, C_PC] = self.plan.n_instr - 1

    def _row_from_record(self, rec: dict, i: int) -> dict:
        """Encode a promotion record as one row of THIS engine (the wide
        sibling calls this; raises TurboEncodeError when even this config
        cannot hold the state)."""
        cols = self.cols
        output = rec["state"]["output"]
        spill = len(output.encode("utf-8")) > self.tcfg.out_width // 2
        row = self._encode_row(dict(rec["state"]["inserts"]),
                               "" if spill else output,
                               rec["pc"], rec["steps"])
        regs = row["regs"]
        lc0 = cols._loops0
        n = min(cols.n_loops, len(rec["counters"]))
        regs[lc0:lc0 + n] = rec["counters"][:n]
        par = rec["par"]
        regs[C_PAREPOCH] = rec.get("epoch", 0)
        if par is not None:
            regs[C_CURTID] = par["cur"]
            regs[C_PARMODE] = par["mode"]
            regs[C_PARJOIN] = par["join"]
            for l in range(cols.nt):
                regs[cols.tstate(l)] = par["tstate"][l]
                regs[cols.tpc(l)] = par["tpc"][l]
                regs[cols.tparg(l)] = par["tparg"][l]
        if spill:
            self._out_prefix[i] = (output, 0)
        return row

    def _stack_rows(self, rows: list) -> TurboBatch:
        n = len(rows)
        n_pad = self._padded(n)
        regs = np.zeros((n_pad, self.cols.regw), np.int32)
        sbuf = np.zeros((self.cols.n_rows, n_pad, self.tcfg.width),
                        np.int32)
        out = np.zeros((n_pad, self.tcfg.out_width), np.int32)
        for k, row in enumerate(rows):
            regs[k] = row["regs"]
            sbuf[:, k] = row["sbuf"]
            out[k] = row["out"]
        if n_pad > n:
            regs[n:, C_STATUS] = DONE
        self._n_live = n
        return self._place(TurboBatch(regs=jnp.asarray(regs),
                                      sbuf=jnp.asarray(sbuf),
                                      out=jnp.asarray(out)))

    async def _flush_promotions(self) -> None:
        """Run every queued promotion in ONE wider sibling batch."""
        if not self._promote_states:
            return
        f = self.promote_factor
        tcfg = TurboConfig(
            tile=max(8, self.tcfg.tile // f),
            width=self.tcfg.width * f,
            out_width=self.tcfg.out_width * f,
            k_steps=self.tcfg.k_steps,
            list_cap=self.tcfg.list_cap,
            elem_width=self.tcfg.elem_width * f,
            leaf=self.tcfg.leaf,
            vmem_limit_bytes=self.tcfg.vmem_limit_bytes)
        kept: list = []
        wide = TurboEngine(
            self.compiled, tcfg,
            # reuse the parent's CACHED IOManager (not the raw factory):
            # the instance may already have consumed scripted/agent
            # responses or hold an open backend session — a fresh backend
            # would replay or drop that state after migration
            io_factory=lambda r: self._io_for(kept[r]),
            plan=self.plan, interpret=self.interpret,
            lanering=self._lanering,
            promote_factor=0)   # one promotion level; then general engine
        # successive concurrent flushes build identical-shape siblings:
        # share the compiled-fn caches so only the first pays the build
        caches = getattr(self, "_wide_caches", None)
        if caches is None:
            caches = self._wide_caches = (wide._step_fns,
                                          wide._fast_resume_fns,
                                          wide._meta_fns)
        wide._step_fns, wide._fast_resume_fns, wide._meta_fns = caches
        rows = []
        for i in sorted(self._promote_states):
            rec = self._promote_states.pop(i)
            try:
                rows.append(wide._row_from_record(rec, len(kept)))
                kept.append(i)
            except TurboEncodeError:
                self._escape_states[i] = rec
        if not rows:
            return
        wide.instance_ids = [self._gid(i) for i in kept]
        batch = wide._stack_rows(rows)
        final = await wide.run_async(batch)
        for k, res in enumerate(wide.results(final, len(kept))):
            self._escape_results[kept[k]] = {
                "inserts": res.inserts, "output": res.output,
                "status": res.status, "steps": res.steps}

    async def _flush_escapes(self) -> None:
        """Run every queued escape in ONE shared batched general-engine
        runner (exact semantics; never per-instance runners)."""
        if not self._escape_states:
            return
        from .config import PARK_HOST_OP
        from .driver import DeviceRunner
        from .state import encode_instance
        ids = sorted(self._escape_states)
        recs = [self._escape_states.pop(i) for i in ids]

        def str_need(rec):
            m = 0
            for v in rec["state"]["inserts"].values():
                if isinstance(v, str):
                    m = max(m, len(v.encode("utf-8")))
                elif isinstance(v, list):
                    for e in v:
                        if isinstance(e, str):
                            m = max(m, len(e.encode("utf-8")))
            return m

        cfg = self._escape_vmconfig(
            max(len(r["state"]["output"].encode("utf-8")) for r in recs),
            max(str_need(r) for r in recs))
        runner = DeviceRunner(
            self.compiled, cfg,
            # cached IOManager, same reason as _flush_promotions: consumed
            # responses / open sessions must survive the migration
            io_factory=lambda r: self._io_for(ids[r]),
            mode="auto", lanering=self._lanering,
            instance_ids=[self._gid(i) for i in ids])
        insts = []
        for i, rec in zip(ids, recs):
            counters = np.zeros((cfg.max_loops,), np.int32)
            n = min(cfg.max_loops, len(rec["counters"]))
            counters[:n] = rec["counters"][:n]
            st = encode_instance(dict(rec["state"]["inserts"]), cfg,
                                 output=rec["state"]["output"],
                                 pc=rec["pc"], counters=counters,
                                 rng=i, steps=rec["steps"])
            par = rec["par"]
            if par is not None:
                tpc = np.zeros((cfg.max_threads,), np.int32)
                tstate = np.zeros_like(tpc)
                tpark_kind = np.zeros_like(tpc)
                tpark_arg = np.zeros_like(tpc)
                for l in range(min(len(par["tstate"]), cfg.max_threads)):
                    tpc[l] = par["tpc"][l]
                    tstate[l] = par["tstate"][l]
                    tpark_arg[l] = par["tparg"][l]
                    if tstate[l] == T_WAIT:
                        tpark_kind[l] = self.plan.park_kind_of.get(
                            int(par["tparg"][l]), PARK_HOST_OP)
                st = st._replace(
                    tpc=jnp.asarray(tpc), tstate=jnp.asarray(tstate),
                    tpark_kind=jnp.asarray(tpark_kind),
                    tpark_arg=jnp.asarray(tpark_arg),
                    cur_tid=jnp.int32(par["cur"]),
                    par_mode=jnp.int32(par["mode"]),
                    par_join=jnp.int32(par["join"]),
                    par_epoch=jnp.int32(rec.get("epoch", 0)))
            else:
                st = st._replace(par_epoch=jnp.int32(rec.get("epoch", 0)))
            insts.append(st)
        batch = jax.tree.map(lambda *xs: jnp.stack(xs), *insts)
        final = await runner.run_async(batch)
        for k, res in enumerate(runner.results(final)):
            self._escape_results[ids[k]] = {
                "inserts": res.inserts, "output": res.output,
                "status": res.status, "steps": res.steps}

    # ---- park servicing ---------------------------------------------------------

    async def _service_lanes(self, sub: dict, j: int, i: int,
                             rts: dict) -> bool:
        """Service an instance parked inside a parallel block THROUGH THE
        TURBO RING (vm/lanering.py — the same asyncio event-loop twin the
        general engine uses): waiting lanes get persistent host IO tasks,
        completions merge last-write-wins, and the instance resumes on
        device at the next runnable lane (or the block's join). The
        instance stays batched; round-3's per-instance escape to an eager
        general runner is gone (VERDICT r3 next #1)."""
        from .config import PARK_HOST_OP
        cols = self.cols
        regs = sub["regs"][j]
        state = self._decode_row(sub, j, i)
        nt = cols.nt
        tstate = np.asarray([regs[cols.tstate(l)] for l in range(nt)],
                            np.int32)
        tpc = np.asarray([regs[cols.tpc(l)] for l in range(nt)], np.int32)
        tparg = np.asarray([regs[cols.tparg(l)] for l in range(nt)],
                           np.int32)
        tpark_kind = np.asarray(
            [self.plan.park_kind_of.get(int(tparg[l]), PARK_HOST_OP)
             if int(tstate[l]) == T_WAIT else 0 for l in range(nt)],
            np.int32)
        lc0 = cols._loops0
        counters = np.asarray(regs[lc0:lc0 + cols.n_loops]).copy()
        view = {"tstate": tstate, "tpc": tpc, "tpark_kind": tpark_kind,
                "tpark_arg": tparg, "counters": counters, "state": state,
                "cur": int(regs[C_CURTID]),
                "par_mode": int(regs[C_PARMODE]),
                "par_join": int(regs[C_PARJOIN]),
                "par_epoch": int(regs[C_PAREPOCH])}
        rt = self._runtime_for(i, rts)
        before = self._snapshot_inserts(state["inserts"])
        before_output = state["output"]
        res = await self._lanering.service(rt, self._gid(i), view,
                                           engine="turbo")
        if res == "parked":
            return False
        steps = int(regs[C_STEPS]) + 1
        if res == "complete":
            next_pc = view["par_join"]
            par = None
            epoch = view["par_epoch"] + 1
        else:
            next_pc = int(view["tpc"][view["cur"]])
            par = {"cur": view["cur"], "mode": view["par_mode"],
                   "join": view["par_join"], "epoch": view["par_epoch"],
                   "tstate": view["tstate"], "tpc": view["tpc"],
                   "tparg": view["tpark_arg"]}
            epoch = view["par_epoch"]
        try:
            self._write_row_delta(sub, j, before, before_output,
                                  view["state"], next_pc, steps, i)
        except TurboEncodeError:
            self._queue_promotion(sub, j, i, view["state"], next_pc, steps,
                                  view["counters"], par, epoch)
            return True
        # lane/parallel bookkeeping past what the delta write covers
        regs = sub["regs"][j]
        regs[lc0:lc0 + cols.n_loops] = view["counters"][:cols.n_loops]
        if res == "complete":
            regs[C_CURTID] = -1
            regs[C_PARMODE] = PM_NONE
            regs[C_PARJOIN] = 0
            regs[C_PAREPOCH] += 1
            for l in range(nt):
                regs[cols.tstate(l)] = T_FREE
        else:
            regs[C_CURTID] = view["cur"]
            for l in range(nt):
                regs[cols.tstate(l)] = view["tstate"][l]
                regs[cols.tpc(l)] = view["tpc"][l]
        return True

    async def _service(self, sub: dict, j: int, i: int, rts: dict) -> bool:
        """Service parked row j (global instance i) in-place in `sub`.
        Returns True when the row changed (resumed or migrated)."""
        from ..core.interp import (InterpolationException,
                                   get_simple_insertkey, interpolate_inserts)

        if int(sub["regs"][j, C_PARMODE]) > 0:
            return await self._service_lanes(sub, j, i, rts)

        pc = int(sub["regs"][j, C_PC])
        task = self.compiled.source_tasks[pc]
        state = self._decode_row(sub, j, i)
        kind = self.plan.park_kind_of.get(pc, 0)

        if kind == self._park_await and task is not None:
            name = task.get("name")
            try:
                resolved = name
                key = get_simple_insertkey(name)
                if key or "{" in str(name):
                    resolved = interpolate_inserts(state["inserts"], name)
            except InterpolationException:
                resolved = None
            if resolved is None or resolved not in state["inserts"]:
                return False  # still parked
            # nothing changed but pc/steps — delta writes registers only
            self._write_row_delta(sub, j, state["inserts"],
                                  state["output"], state, pc + 1,
                                  int(sub["regs"][j, C_STEPS]) + 1, i)
            return True

        rt = self._runtime_for(i, rts)
        if task is None:
            raise RuntimeError(f"instance {i}: parked at pc={pc} with no "
                               f"source task")
        before = self._snapshot_inserts(state["inserts"])
        before_output = state["output"]
        cols = self.cols
        lc0 = cols._loops0
        counters = np.asarray(
            sub["regs"][j, lc0:lc0 + cols.n_loops]).copy()
        next_pc = await self._lanering.exec_parked(
            rt, state, pc, task, i, kind, counters, engine="turbo")
        steps = int(sub["regs"][j, C_STEPS]) + 1
        try:
            self._write_row_delta(sub, j, before, before_output, state,
                                  next_pc, steps, i)
            sub["regs"][j, lc0:lc0 + cols.n_loops] = \
                counters[:cols.n_loops]
        except TurboEncodeError:
            # state outgrew the slot model: promote to the wider sibling
            # batch (or the shared general-engine runner) — never a
            # per-instance host loop (VERDICT r3 next #2)
            self._queue_promotion(sub, j, i, state, next_pc, steps,
                                  counters, None,
                                  int(sub["regs"][j, C_PAREPOCH]))
        return True

    @staticmethod
    def _snapshot_inserts(inserts: dict) -> dict:
        """A value snapshot for the delta write-back (lists copied —
        host commands may rebind or mutate them)."""
        return {k: list(v) if isinstance(v, list) else v
                for k, v in inserts.items()}

    @staticmethod
    def _same_value(a, b) -> bool:
        """Type-exact equality: True == 1 must NOT count as unchanged —
        the full encode path raises on bools, and the delta path must
        retire the same lanes it would."""
        if type(a) is not type(b):
            return False
        if isinstance(a, list):
            return len(a) == len(b) and all(
                type(x) is type(y) and x == y for x, y in zip(a, b))
        return a == b

    def _write_row_delta(self, sub: dict, j: int, before: dict,
                         before_output: str, state: dict, pc: int,
                         steps: int, i: int = None):
        """Write back only what host servicing changed. The common park
        (user_input, chat, await) touches ONE slot and maybe the output,
        so re-encoding all S slots' byte rows per park — the ring's
        dominant cost at high park rates — is almost all wasted work.
        Raises TurboEncodeError exactly like the full rewrite (the caller
        retires the lane to host execution)."""
        inserts = state["inserts"]
        if any(k not in inserts for k in before):
            # a host command deleted an insert: rare — full rewrite
            return self._write_row(sub, j, state, pc, steps, i)
        regs = sub["regs"][j]
        sbuf = sub["sbuf"][:, j]
        # atomicity: a TurboEncodeError mid-loop must not leave a half-
        # updated row behind — the caller retires the lane, but the row
        # would still be scattered to the device and is reachable via
        # export_state (the full rewrite encoded into a fresh row, so it
        # was atomic by construction)
        regs_bak = regs.copy()
        sbuf_bak = sbuf.copy()
        try:
            for k, v in inserts.items():
                if k in before and self._same_value(before[k], v):
                    continue
                s = self.plan.slot_of.get(str(k))
                if s is not None:
                    self._zero_slot(regs, sbuf, s)
                self._encode_slot(regs, sbuf, k, v)
            if state["output"] != before_output:
                # same spill protocol as _write_row: the decoded output
                # had any stored prefix folded in, so it must not survive
                if i is not None:
                    self._out_prefix.pop(i, None)
                output = state["output"]
                if (i is not None and len(output.encode("utf-8"))
                        > self.tcfg.out_width // 2):
                    epoch = int(regs[C_CLREPOCH])
                    self._out_prefix[i] = (output, epoch)
                    output = ""
                data = output.encode("utf-8")
                if len(data) > self.tcfg.out_width:
                    raise TurboEncodeError(
                        "output exceeds the device buffer")
                sub["out"][j, :] = 0
                sub["out"][j, :len(data)] = np.frombuffer(data, np.uint8)
                regs[C_OUTLEN] = len(data)
        except TurboEncodeError:
            regs[:] = regs_bak
            sbuf[:] = sbuf_bak
            raise
        # unchanged-output case: the stored prefix (if any) stays
        # registered and the device bytes stay put — decode folds them
        # back together exactly as before
        regs[C_PC] = pc
        regs[C_STEPS] = steps
        regs[C_STATUS] = RUNNING
        self._sync_u8(sub, j)

    def _write_row(self, sub: dict, j: int, state: dict, pc: int,
                   steps: int, i: int = None):
        if i is not None:
            # re-establish the spill invariant: the stored prefix was
            # already folded into state["output"] by _decode_row, so it
            # must not survive this write (it would double-count)
            self._out_prefix.pop(i, None)
            if (len(state["output"].encode("utf-8"))
                    > self.tcfg.out_width // 2):
                epoch = int(sub["regs"][j, C_CLREPOCH])
                self._out_prefix[i] = (state["output"], epoch)
                state = dict(state, output="")
        row = self._encode_row(state["inserts"], state["output"], pc, steps)
        # loop counters and parallel-lane bookkeeping live outside the
        # reference state dict — a leaf park must not reset them
        cols = self.cols
        row["regs"][C_CURTID:cols._slots0] = \
            sub["regs"][j, C_CURTID:cols._slots0]
        lc0 = cols._loops0
        lc1 = lc0 + cols.n_loops
        row["regs"][lc0:lc1] = sub["regs"][j, lc0:lc1]
        sub["regs"][j] = row["regs"]
        sub["sbuf"][:, j, :] = row["sbuf"]
        sub["out"][j] = row["out"]
        self._sync_u8(sub, j)

    # ---- ring transfers -------------------------------------------------------

    def _ring_xfer(self):
        """One fused jitted gather + scatter for the ring's parked rows.

        Why fused + compressed: each separate jnp gather/scatter op is its
        own XLA compile (~1 s each on a remote-compile backend), and byte
        planes moved device↔host as int32 — 4× the bytes over the axon
        tunnel (~24 MB/s measured), which dominated ring_ms. Byte planes
        travel as uint8; list META rows (full-range int32 element
        scalars) ride separately and are re-spliced on each side."""
        if self._xfer_fns is not None:
            return self._xfer_fns
        meta_rows = self._meta_rows
        mr = jnp.asarray(meta_rows, jnp.int32) if meta_rows else None

        @jax.jit
        def gather(regs, sbuf, out, idx):
            g = jnp.take(sbuf, idx, axis=1)
            meta = (jnp.take(g, mr, axis=0) if mr is not None
                    else jnp.zeros((0,) + g.shape[1:], jnp.int32))
            return (jnp.take(regs, idx, axis=0),
                    g.astype(jnp.uint8),
                    meta,
                    jnp.take(out, idx, axis=0).astype(jnp.uint8))

        @jax.jit
        def scatter(regs_b, sbuf_b, out_b, regs_s, sbuf_u8_s, meta_s,
                    out_u8_s, idx):
            sb = sbuf_u8_s.astype(jnp.int32)
            if mr is not None:
                sb = sb.at[mr].set(meta_s)
            return (regs_b.at[idx].set(regs_s),
                    sbuf_b.at[:, idx].set(sb),
                    out_b.at[idx].set(out_u8_s.astype(jnp.int32)))

        self._xfer_fns = (gather, scatter)
        return self._xfer_fns

    def _gather_sub(self, batch: TurboBatch, parked: np.ndarray):
        """Fetch the parked rows to host, bucket-padded to a power of two
        so the transfer jits compile O(log N) times per engine even when
        the park count drifts every round. Pad slots duplicate parked[0];
        _scatter_sub writes them back with row 0's values (duplicate
        scatter indices with identical values are deterministic).
        Returns (sub, idx, k_pad)."""
        n = batch.regs.shape[0]
        k = len(parked)
        k_pad = min(max(8, 1 << (k - 1).bit_length()), n)
        idx_np = np.empty((k_pad,), np.int32)
        idx_np[:k] = parked
        idx_np[k:] = parked[0]
        idx = jnp.asarray(idx_np)
        gather, _ = self._ring_xfer()
        regs_g, sbuf_u8_g, meta_g, out_u8_g = gather(
            batch.regs, batch.sbuf, batch.out, idx)
        sbuf_u8 = np.array(sbuf_u8_g)
        out_u8 = np.array(out_u8_g)
        sbuf_np = sbuf_u8.astype(np.int32)
        if self._meta_rows:
            sbuf_np[self._meta_rows] = np.asarray(meta_g)
        sub = {"regs": np.array(regs_g), "sbuf": sbuf_np,
               "out": out_u8.astype(np.int32),
               "sbuf_u8": sbuf_u8, "out_u8": out_u8}
        return sub, idx, k_pad

    def _scatter_sub(self, batch: TurboBatch, sub: dict, idx,
                     k: int, k_pad: int) -> TurboBatch:
        if k_pad > k:
            # pads duplicate idx[0]: mirror row 0's serviced values so
            # the duplicate writes are identical
            sub["regs"][k:] = sub["regs"][0]
            sub["sbuf"][:, k:] = sub["sbuf"][:, :1]
            sub["out"][k:] = sub["out"][0]
            sub["sbuf_u8"][:, k:] = sub["sbuf_u8"][:, :1]
            sub["out_u8"][k:] = sub["out_u8"][0]
        meta_s = sub["sbuf"][self._meta_rows] if self._meta_rows else \
            np.zeros((0,) + sub["sbuf"].shape[1:], np.int32)
        _, scatter = self._ring_xfer()
        return TurboBatch(*scatter(
            batch.regs, batch.sbuf, batch.out,
            sub["regs"], sub["sbuf_u8"], meta_s, sub["out_u8"], idx))

    # ---- main loop ------------------------------------------------------------

    async def run_async(self, batch: TurboBatch, *, max_rounds: int = 10_000
                        ) -> TurboBatch:
        import asyncio
        import time
        from ..core.context import log_enabled
        from ..core.events import EVENTS, VM_ROUND

        # device→host downloads run in a worker thread: np.asarray blocks
        # in C until the dispatched step finishes, so awaiting it in a
        # thread lets a SIBLING shard's coroutine run its (GIL-bound)
        # ring service while THIS shard computes on device — that is the
        # whole overlap mechanism behind run_pipelined (VERDICT r4 next
        # #4). Within a single-engine run it adds only ~50 µs/round.
        async def dl(x):
            return await asyncio.to_thread(np.asarray, x)

        trace = os.environ.get("IE_TPU_RING_TRACE") == "1"
        n = batch.regs.shape[0]
        step = self.step_fn(n)
        rts: dict = {}
        stalled = 0
        for round_no in range(max_rounds):
            t_top = time.perf_counter()
            batch = step(batch)
            meta_np = None
            ft = self._build_fast_tables() if self._fast_enabled else None
            if ft is not None and (ft[2] or ft[3].any() or ft[4].any()) \
                    and not log_enabled() and not EVENTS.enabled:
                # one combined u8 download serves the liveness check AND
                # park classification (col 0 is C_STATUS)
                meta_np = await dl(self._meta_full_fn()(batch.regs))
                status = meta_np[:, 0].astype(np.int32)
            else:
                status = await dl(batch.regs[:, C_STATUS])
            t_meta = time.perf_counter()
            if self._lanering.pending:
                # cancel host IO of finished parallel blocks (a race won
                # on device bumps par_epoch; the losers' pending IO must
                # be cancelled — same sweep as the general engine)
                epochs = await dl(batch.regs[:, C_PAREPOCH])
                n_rows = len(status)
                for gid in list(self._lanering.pending):
                    row = self._row_of(gid, n_rows)
                    if row is None:
                        continue  # owned by a sibling engine
                    pend = self._lanering.pending.get(gid)
                    if pend is None:
                        continue
                    if int(epochs[row]) != pend["epoch"] or \
                            status[row] not in (RUNNING, PARKED):
                        await self._lanering.cancel(gid)
            parked = np.nonzero(status == PARKED)[0]
            if len(parked) == 0:
                if not (status == RUNNING).any():
                    break
                continue
            EVENTS.emit(VM_ROUND, round=round_no, engine="turbo",
                        running=int((status == RUNNING).sum()),
                        parked=len(parked))
            t_ring = time.perf_counter()
            n_escaped = len(self._promote_states) + len(self._escape_states)
            # vectorized fast path first (literal-prompt user_input on
            # sync backends — VERDICT r3 next #3): no full-row gather,
            # device-side resume; the exact slow path takes the rest
            fast_groups, cancels, slow = self._classify_parked(
                batch, parked, meta_np)
            service = sub = idx = park_pcs = None
            k_pad = 0
            if len(slow):
                # batched gather of every slow parked row (one fused,
                # uint8-compressed device round-trip; thread-offloaded —
                # its downloads block on device completion)
                sub, idx, k_pad = await asyncio.to_thread(
                    self._gather_sub, batch, slow)
                park_pcs = sub["regs"][:, C_PC].copy()  # pre-service pcs
                service = asyncio.gather(*[
                    self._service(sub, j, int(i), rts)
                    for j, i in enumerate(slow)])
            t_cls = time.perf_counter()
            n_fast = 0
            if len(cancels[0]):
                batch = self._fast_cancel(batch, *cancels)
                n_fast += len(cancels[0])
            if fast_groups:
                batch, nf = await self._fast_service(batch,
                                                     fast_groups, rts)
                n_fast += nf
            if trace:
                print(f"# ring-trace r={round_no} parked={len(parked)} "
                      f"fast={n_fast} slow={len(slow)} "
                      f"step+meta={t_meta - t_top:.4f} "
                      f"classify={t_cls - t_meta:.4f} "
                      f"fastsvc={time.perf_counter() - t_cls:.4f}",
                      file=sys.stderr)
            # overlap: while the host services this round's slow parks,
            # the device steps the RUNNING lanes (including rows the fast
            # path just resumed). Parked lanes are frozen in-kernel (test:
            # parked rows bit-identical under extra steps), so the scatter
            # below lands on unchanged rows — semantics equal to the
            # sequential order, wall-clock = max(host, device). In a
            # fast-only round there is no host service to overlap with —
            # the loop-top step does the work, so stepping here would
            # just double the kernel cost per park cycle.
            if service is not None and ((status == RUNNING).any() or n_fast):
                batch = step(batch)
            resumed = n_fast
            changed = ()
            if service is not None:
                changed = await service
                resumed += sum(bool(c) for c in changed)
            rs = self.ring_stats
            rs["rounds"] = round_no + 1
            rs["parks"] += resumed
            rs["escapes"] += (len(self._promote_states)
                              + len(self._escape_states) - n_escaped)
            for j, c in enumerate(changed):
                if c:
                    k = self.plan.park_kind_of.get(int(park_pcs[j]), 0)
                    by = rs["parks_by_kind"]
                    by[k] = by.get(k, 0) + 1
            rs["ring_ms"] += (time.perf_counter() - t_ring) * 1e3
            if changed and sum(bool(c) for c in changed):
                for j in range(len(slow)):
                    if changed[j] and sub["regs"][j, C_STATUS] == PARKED:
                        sub["regs"][j, C_STATUS] = RUNNING
                batch = self._scatter_sub(batch, sub, idx,
                                          len(slow), k_pad)
            if self._promote_states and self.promote_factor:
                # flush promotions CONCURRENTLY with the main batch: an
                # interactive program (the flagship) never finishes, so a
                # promoted instance must resume in its wider sibling NOW,
                # not at end-of-run. _flush_promotions pops its queue
                # synchronously before its first await, so a later round's
                # flush sees only newly promoted instances. (Before the
                # fast-only shortcut: _promote_after_fast queues here too.)
                self._promo_tasks.append(
                    asyncio.ensure_future(self._flush_promotions()))
            if service is None and n_fast:
                # fast-only round: every serviced row is RUNNING by
                # construction (device-side resume), so the liveness and
                # stall checks are decided without another status
                # download — the loop-top step re-fetches next round
                stalled = 0
                continue
            status = await dl(batch.regs[:, C_STATUS])
            if not ((status == RUNNING) | (status == PARKED)).any():
                break
            if not (status == RUNNING).any() and resumed == 0:
                stalled += 1
                if stalled > 50:
                    break
                await asyncio.sleep(0.05)
            else:
                stalled = 0
        # join in-flight sibling batches, run any still-queued promotions,
        # then whatever even the sibling can't hold in ONE batched general
        # runner (the promotion flush may add to the escape queue)
        for t in self._promo_tasks:
            await t
        self._promo_tasks.clear()
        await self._flush_promotions()
        await self._flush_escapes()
        n_rows = int(batch.regs.shape[0])
        for gid in list(self._lanering.pending):
            if self._row_of(gid, n_rows) is not None:
                await self._lanering.cancel(gid)
        return batch

    def run(self, batch: TurboBatch, **kw) -> TurboBatch:
        import asyncio
        return asyncio.run(self.run_async(batch, **kw))

    # ---- results ----------------------------------------------------------------

    def results(self, batch: TurboBatch, n: int = None) -> list:
        from .driver import InstanceResult
        host = {
            "regs": np.asarray(batch.regs),
            "sbuf": np.asarray(batch.sbuf),
            "out": np.asarray(batch.out),
        }
        n = n if n is not None else getattr(
            self, "_n_live", host["regs"].shape[0])
        out = []
        for i in range(n):
            if i in self._escape_results:
                r = self._escape_results[i]
                out.append(InstanceResult(
                    output=r["output"], inserts=r["inserts"],
                    status=r["status"], steps=r["steps"]))
                continue
            if i in self._host_results:
                state = self._host_results[i]
            else:
                state = self._decode_row(host, i, i)
            out.append(InstanceResult(
                output=state["output"], inserts=state["inserts"],
                status=int(host["regs"][i, C_STATUS]),
                steps=int(host["regs"][i, C_STEPS])))
        return out


def make_shard_engines(compiled, tcfg: TurboConfig, n_shards: int,
                       io_factory=None, **kw) -> list:
    """n_shards sibling TurboEngines over one shared plan and LaneRing,
    with disjoint global instance-id ranges assigned at load time via
    assign_shard_ids(). The siblings share the compiled step-fn cache
    (identical plan/tcfg → identical kernels), so only the first shard
    pays the build; use with run_pipelined."""
    from ..compiler.turbo import plan_turbo
    from .lanering import LaneRing
    plan = plan_turbo(compiled)
    ring = LaneRing(compiled)
    engines = [TurboEngine(compiled, tcfg, io_factory=io_factory,
                           plan=plan, lanering=ring, **kw)
               for _ in range(n_shards)]
    for e in engines[1:]:
        e._step_fns = engines[0]._step_fns
        e._fast_resume_fns = engines[0]._fast_resume_fns
        e._meta_fns = engines[0]._meta_fns
    return engines


def assign_shard_ids(engines: list, shard_n: int) -> None:
    """Give each sibling a disjoint global-id range (row r of shard s is
    instance s*shard_n + r) so per-instance IO and the shared LaneRing
    key correctly across shards."""
    for s, e in enumerate(engines):
        e.instance_ids = list(range(s * shard_n, (s + 1) * shard_n))


async def run_pipelined(pairs, **kw) -> list:
    """Drive (engine, batch) pairs concurrently on one event loop.

    run_async's device→host downloads block in worker threads, so while
    shard A runs its (GIL-bound) host ring service, shard B's mega-kernel
    step proceeds on device and vice versa — host servicing overlaps
    device stepping instead of serializing with it (VERDICT r4 next #4).
    Returns the final batches in pair order."""
    import asyncio
    return list(await asyncio.gather(
        *[e.run_async(b, **kw) for e, b in pairs]))

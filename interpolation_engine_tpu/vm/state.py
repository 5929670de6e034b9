"""Per-instance VM state: insert store, arena, list pool, output buffer.

The reference's ``state['inserts']`` dict becomes a fixed-slot open table:
key bytes live in the per-instance uint8 arena; each slot holds the key hash
plus a typed value descriptor (int | str(arena span) | list(pool span)).
Values are immutable — writes bump-allocate new bytes; ``delete`` clears the
slot (arena garbage is reclaimed only by host-side rescue/compaction).

``order_index`` and nested block cursors collapse into the program counter
plus per-loop counter slots, because the instruction table is flat and static
(SURVEY.md §7.1(2)).

Host↔device codecs translate a Python state dict to tensors and back —
used at instance activation/retirement, for the host IO ring, and by the
differential tests against the host oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from .bytestr import normalize, positions
from .config import VMConfig, RUNNING

# value types
T_EMPTY = 0
T_INT = 1
T_STR = 2
T_LIST = 3

HASH_BASE = 1000003  # polynomial rolling-hash base (mod 2^32)


class VMInstance(NamedTuple):
    pc: jnp.ndarray            # int32 — index into the flat code table
    status: jnp.ndarray        # int32 — RUNNING/DONE/PARKED/ERROR/OVERFLOW
    park_kind: jnp.ndarray     # int32
    park_arg: jnp.ndarray      # int32 (instruction index that parked)
    # insert table
    occ: jnp.ndarray           # bool[K]
    key_hash: jnp.ndarray      # uint32[K]
    key_off: jnp.ndarray       # int32[K]
    key_len: jnp.ndarray       # int32[K]
    vtype: jnp.ndarray         # int32[K]
    vint: jnp.ndarray          # int32[K]
    voff: jnp.ndarray          # int32[K]
    vlen: jnp.ndarray          # int32[K]
    # list pool
    pool_type: jnp.ndarray     # int32[L]
    pool_int: jnp.ndarray      # int32[L]
    pool_off: jnp.ndarray      # int32[L]
    pool_len: jnp.ndarray      # int32[L]
    pool_top: jnp.ndarray      # int32
    # arena + output
    arena: jnp.ndarray         # uint8[A]
    arena_top: jnp.ndarray     # int32
    out: jnp.ndarray           # uint8[O]
    out_len: jnp.ndarray       # int32
    # loop counters (1-based like the reference's for cursor)
    counters: jnp.ndarray      # int32[MAX_LOOPS]
    rng: jnp.ndarray           # uint32 — per-instance PRNG counter/key
    steps: jnp.ndarray         # int32 — executed task count (metrics)
    last_err: jnp.ndarray      # int32 — kernel error code that caused a park
    # parallel_wait/race thread lanes (reference asyncio.gather/wait,
    # interpolation_engine.py:1581-1626): one pc per live subtask, with the
    # scheduler in vm/step.py switching lanes at park points exactly where
    # the reference's event loop switches at awaits
    tpc: jnp.ndarray           # int32[T] — per-thread saved/resume pc
    tstate: jnp.ndarray        # int32[T] — T_FREE/T_READY/T_WAIT/T_DONE
    tpark_kind: jnp.ndarray    # int32[T] — why a T_WAIT lane parked
    tpark_arg: jnp.ndarray     # int32[T] — parked pc of a T_WAIT lane
    cur_tid: jnp.ndarray       # int32 — executing lane, -1 outside a block
    par_mode: jnp.ndarray      # int32 — 0 none / 1 wait / 2 race
    par_join: jnp.ndarray      # int32 — pc after the parallel block
    par_epoch: jnp.ndarray     # int32 — bumped at block end (host IO cancel)


def fnv1a(buf: jnp.ndarray, length: jnp.ndarray) -> jnp.ndarray:
    """Key hash: h = Σ (b[i]+1)·B^i (mod 2^32) over the first `length` bytes.

    Fully vectorized (cumprod of powers + masked dot) — no sequential loop,
    which matters for TPU compile time since this sits inside every store
    lookup. Length is mixed in implicitly by the +1 term. Must match
    fnv1a_np (host codec / compiler label hashes).
    """
    n = buf.shape[0]
    pos = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    powers = jnp.asarray(_hash_powers(n))  # trace-time constant
    terms = jnp.where(pos < length,
                      (buf.astype(jnp.uint32) + 1) * powers, 0)
    return jnp.sum(terms, dtype=jnp.uint32)


def _hash_powers(n: int) -> np.ndarray:
    powers = np.empty((n,), np.uint32)
    p = 1
    for i in range(n):
        powers[i] = p
        p = (p * HASH_BASE) & 0xFFFFFFFF
    return powers


def fnv1a_np(data: bytes) -> np.uint32:
    h = 0
    p = 1
    for b in data:
        h = (h + (b + 1) * p) & 0xFFFFFFFF
        p = (p * HASH_BASE) & 0xFFFFFFFF
    return np.uint32(h)


def fresh_instance(cfg: VMConfig, seed: int = 0) -> VMInstance:
    K, L = cfg.n_slots, cfg.pool_size
    return VMInstance(
        pc=jnp.int32(0),
        status=jnp.int32(RUNNING),
        park_kind=jnp.int32(0),
        park_arg=jnp.int32(0),
        occ=jnp.zeros((K,), jnp.bool_),
        key_hash=jnp.zeros((K,), jnp.uint32),
        key_off=jnp.zeros((K,), jnp.int32),
        key_len=jnp.zeros((K,), jnp.int32),
        vtype=jnp.zeros((K,), jnp.int32),
        vint=jnp.zeros((K,), jnp.int32),
        voff=jnp.zeros((K,), jnp.int32),
        vlen=jnp.zeros((K,), jnp.int32),
        pool_type=jnp.zeros((L,), jnp.int32),
        pool_int=jnp.zeros((L,), jnp.int32),
        pool_off=jnp.zeros((L,), jnp.int32),
        pool_len=jnp.zeros((L,), jnp.int32),
        pool_top=jnp.int32(0),
        arena=jnp.zeros((cfg.arena_size,), jnp.uint8),
        arena_top=jnp.int32(0),
        out=jnp.zeros((cfg.out_size,), jnp.uint8),
        out_len=jnp.int32(0),
        counters=jnp.zeros((cfg.max_loops,), jnp.int32),
        rng=jnp.uint32(seed),
        steps=jnp.int32(0),
        last_err=jnp.int32(0),
        tpc=jnp.zeros((cfg.max_threads,), jnp.int32),
        tstate=jnp.zeros((cfg.max_threads,), jnp.int32),
        tpark_kind=jnp.zeros((cfg.max_threads,), jnp.int32),
        tpark_arg=jnp.zeros((cfg.max_threads,), jnp.int32),
        cur_tid=jnp.int32(-1),
        par_mode=jnp.int32(0),
        par_join=jnp.int32(0),
        par_epoch=jnp.int32(0),
    )


# ---------------------------------------------------------------------------
# device-side store operations (single instance; vmap outside)
# ---------------------------------------------------------------------------

def _masked_slot_update(arr, slot, value):
    """arr with arr[slot] = value, as a masked select (no scatter).

    Under vmap, one-element ``.at[i].set`` lowers to a scatter with batched
    indices — pathologically slow on TPU. A broadcast-compare select is a
    single fused VPU op.
    """
    pos = positions(arr.shape[0])
    return jnp.where(pos == slot, jnp.asarray(value, arr.dtype), arr)


def arena_write(st: VMInstance, buf, length, cfg: VMConfig):
    """Append bytes to the arena; returns (st', off, overflow).

    Scatter-free: the payload is logically shifted to the write offset and
    merged with a range mask (vmapped dynamic_update_slice would lower to a
    scatter).
    """
    from .bytestr import shift_right, _fit
    off = st.arena_top
    # a logical length beyond the physical payload would write nulls —
    # that must surface as overflow (host rescue), never as truncation
    overflow = (off + length > cfg.arena_size) | (length > buf.shape[0])
    safe_off = jnp.clip(off, 0, cfg.arena_size - 1)
    pos = positions(cfg.arena_size)
    shifted = shift_right(_fit(buf, cfg.arena_size), safe_off)
    write_mask = (pos >= safe_off) & (pos < safe_off + length) & ~overflow
    arena = jnp.where(write_mask, shifted, st.arena).astype(jnp.uint8)
    st = st._replace(arena=arena,
                     arena_top=jnp.where(overflow, st.arena_top, off + length))
    return st, jnp.where(overflow, -1, safe_off), overflow


def arena_read(st: VMInstance, off, length, size: int):
    off = jnp.clip(off, 0, st.arena.shape[0] - size)
    chunk = jax.lax.dynamic_slice(st.arena, (off,), (size,))
    return normalize(chunk, length), jnp.asarray(length, jnp.int32)


def find_slot(st: VMInstance, key_buf, key_len):
    """Return (found, slot, collide) for a key.

    hash+len is only a prefilter; the first candidate's stored key bytes are
    compared against the probe (arena span). If they differ and *another*
    candidate exists, the lookup is ambiguous (a crafted intra-store hash
    collision): ``collide`` is raised and callers must PARK so the host
    re-executes exactly — never silently alias two keys.
    """
    h = fnv1a(key_buf, key_len)
    cand = st.occ & (st.key_hash == h) & (st.key_len == key_len)
    n_cand = jnp.sum(cand.astype(jnp.int32))
    slot = jnp.argmax(cand).astype(jnp.int32)
    # byte-verify the first candidate: stored keys are <= max_key bytes and
    # a probe longer than that can never have candidates (len prefilter)
    K_BYTES = min(key_buf.shape[0], st.arena.shape[0])
    off = jnp.clip(st.key_off[slot], 0, st.arena.shape[0] - 1)
    padded = jnp.concatenate(
        [st.arena, jnp.zeros((K_BYTES,), jnp.uint8)])
    stored = jax.lax.dynamic_slice(padded, (off,), (K_BYTES,))
    stored = normalize(stored, st.key_len[slot])
    probe = normalize(key_buf[:K_BYTES], key_len)
    bytes_eq = jnp.all(stored == probe)
    found = (n_cand > 0) & bytes_eq
    collide = (n_cand > 1) & ~bytes_eq
    return found, slot, collide


def store_set(st: VMInstance, key_buf, key_len, vtype, vint, voff, vlen,
              cfg: VMConfig):
    """Insert or overwrite a key with a pre-materialized value descriptor.

    Returns (st', overflow). Key bytes are written to the arena only for new
    keys (existing keys reuse their stored key bytes).
    """
    found, slot, collide = find_slot(st, key_buf, key_len)
    # allocate for the miss case
    free = ~st.occ
    have_free = jnp.any(free)
    new_slot = jnp.argmax(free).astype(jnp.int32)
    st2, key_off, arena_ov = arena_write(st, key_buf, key_len, cfg)
    # an ambiguous (colliding) lookup must never write: report as overflow
    # so the caller parks and the host executes the op exactly
    overflow = jnp.where(found, collide, ~have_free | arena_ov | collide)

    use_slot = jnp.where(found, slot, new_slot)
    # only bump the arena when the key is new
    st = st._replace(
        arena=jnp.where(found, st.arena, st2.arena),
        arena_top=jnp.where(found, st.arena_top, st2.arena_top),
    )

    h = fnv1a(key_buf, key_len)
    st = st._replace(
        occ=_masked_slot_update(st.occ, use_slot, True),
        key_hash=_masked_slot_update(st.key_hash, use_slot, h),
        key_off=_masked_slot_update(
            st.key_off, use_slot,
            jnp.where(found, st.key_off[use_slot], key_off)),
        key_len=_masked_slot_update(st.key_len, use_slot, key_len),
        vtype=_masked_slot_update(st.vtype, use_slot, vtype),
        vint=_masked_slot_update(st.vint, use_slot, vint),
        voff=_masked_slot_update(st.voff, use_slot, voff),
        vlen=_masked_slot_update(st.vlen, use_slot, vlen),
    )
    return st, overflow


def store_delete(st: VMInstance, slot) -> VMInstance:
    return st._replace(occ=_masked_slot_update(st.occ, slot, False))


# ---------------------------------------------------------------------------
# host codecs
# ---------------------------------------------------------------------------

class HostCodecError(ValueError):
    pass


def encode_inserts(inserts: dict, cfg: VMConfig, seed: int = 0) -> VMInstance:
    """Build a fresh instance whose store holds `inserts` (numpy, then jnp)."""
    st = {f: np.array(v) for f, v in fresh_instance(cfg, seed)._asdict().items()}
    arena = st["arena"].copy()
    top = 0

    def put_bytes(data: bytes) -> tuple[int, int]:
        nonlocal top
        if top + len(data) > cfg.arena_size:
            raise HostCodecError("arena overflow while encoding inserts")
        arena[top:top + len(data)] = list(data)
        off = top
        top += len(data)
        return off, len(data)

    pool_top = 0
    pool = {k: st[k].copy() for k in
            ("pool_type", "pool_int", "pool_off", "pool_len")}

    slot = 0
    for key, value in inserts.items():
        if slot >= cfg.n_slots:
            raise HostCodecError("too many inserts for slot table")
        kdata = str(key).encode("utf-8")
        if len(kdata) > cfg.max_key:
            raise HostCodecError(f"key too long: {key!r}")
        koff, klen = put_bytes(kdata)
        if isinstance(value, bool):
            raise HostCodecError("bool insert values unsupported on device")
        if isinstance(value, int):
            vt, vi, vo, vl = T_INT, value, 0, 0
        elif isinstance(value, str):
            data = value.encode("utf-8")
            vo, vl = put_bytes(data)
            vt, vi = T_STR, 0
        elif isinstance(value, list):
            base = pool_top
            for elem in value:
                if pool_top >= cfg.pool_size:
                    raise HostCodecError("list pool overflow")
                if isinstance(elem, bool):
                    raise HostCodecError("bool list elements unsupported")
                if isinstance(elem, int):
                    pool["pool_type"][pool_top] = T_INT
                    pool["pool_int"][pool_top] = elem
                elif isinstance(elem, str):
                    eo, el = put_bytes(elem.encode("utf-8"))
                    pool["pool_type"][pool_top] = T_STR
                    pool["pool_off"][pool_top] = eo
                    pool["pool_len"][pool_top] = el
                else:
                    raise HostCodecError(
                        f"unsupported list element type: {type(elem)}")
                pool_top += 1
            vt, vi, vo, vl = T_LIST, 0, base, len(value)
        else:
            raise HostCodecError(f"unsupported insert type: {type(value)}")

        st["occ"][slot] = True
        st["key_hash"][slot] = fnv1a_np(kdata)
        st["key_off"][slot] = koff
        st["key_len"][slot] = klen
        st["vtype"][slot] = vt
        st["vint"][slot] = vi
        st["voff"][slot] = vo
        st["vlen"][slot] = vl
        slot += 1

    st["arena"] = arena
    st["arena_top"] = np.int32(top)
    st.update({k: v for k, v in pool.items()})
    st["pool_top"] = np.int32(pool_top)
    return VMInstance(**{k: jnp.asarray(v) for k, v in st.items()})


def encode_instance(inserts: dict, cfg: VMConfig, *, output: str = "",
                    pc: int = 0, counters=None, rng: int = 0,
                    steps: int = 0) -> VMInstance:
    """Full instance encode: inserts + output buffer + control state."""
    st = encode_inserts(inserts, cfg, seed=rng)
    out_data = output.encode("utf-8")
    if len(out_data) > cfg.out_size:
        raise HostCodecError("output buffer overflow while encoding")
    out = np.zeros((cfg.out_size,), np.uint8)
    out[:len(out_data)] = list(out_data)
    ctr = np.zeros((cfg.max_loops,), np.int32)
    if counters is not None:
        ctr[:len(counters)] = counters
    return st._replace(
        pc=jnp.int32(pc),
        out=jnp.asarray(out),
        out_len=jnp.int32(len(out_data)),
        counters=jnp.asarray(ctr),
        rng=jnp.uint32(rng),
        steps=jnp.int32(steps),
    )


def decode_inserts(st: VMInstance) -> dict:
    """Read the insert store back into a Python dict (host-side)."""
    arena = np.asarray(st.arena)
    out = {}
    occ = np.asarray(st.occ)
    for slot in range(occ.shape[0]):
        if not occ[slot]:
            continue
        ko, kl = int(st.key_off[slot]), int(st.key_len[slot])
        key = bytes(arena[ko:ko + kl]).decode("utf-8", "replace")
        vt = int(st.vtype[slot])
        if vt == T_INT:
            out[key] = int(st.vint[slot])
        elif vt == T_STR:
            vo, vl = int(st.voff[slot]), int(st.vlen[slot])
            out[key] = bytes(arena[vo:vo + vl]).decode("utf-8", "replace")
        elif vt == T_LIST:
            base, count = int(st.voff[slot]), int(st.vlen[slot])
            elems = []
            for i in range(base, base + count):
                if int(st.pool_type[i]) == T_INT:
                    elems.append(int(st.pool_int[i]))
                else:
                    eo, el = int(st.pool_off[i]), int(st.pool_len[i])
                    elems.append(bytes(arena[eo:eo + el]).decode("utf-8", "replace"))
            out[key] = elems
    return out


def decode_output(st: VMInstance) -> str:
    return bytes(np.asarray(st.out)[:int(st.out_len)]).decode("utf-8", "replace")

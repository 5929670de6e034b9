"""Device VM driver: batched step loop + host IO ring.

Runs N program instances in lockstep on the accelerator (``jit(vmap(run))``)
and services parked instances on the host (SURVEY.md §7.1(5)): an instance
hitting a blocking or device-unsupported instruction parks; the driver
decodes its state to a Python dict, executes the *original task* with the
exact host executor (so chat/user IO/filesystem/TTS and every error message
behave identically to the oracle), re-encodes — which also compacts arena
garbage — and resumes it. Instances never block the device step loop.

Programs flagged host_only (dynamic task lists, recursive run_task) run
entirely on the host engine, one asyncio task per instance. Top-level
parallel_wait/parallel_race blocks run as device thread lanes (vm/step.py
scheduler); the ring services waiting lanes concurrently with persistent
per-lane coroutines. Nested parallel blocks park wholesale to the ring.
"""

from __future__ import annotations

import asyncio
import os
from dataclasses import dataclass
from typing import Callable, Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.context import CTX, ESCAPE, INSERT_START, INSERT_STOP
from ..core.events import EVENTS, VM_ROUND, VM_STATS
from ..core.executor import Runtime
from ..compiler.lower import CompiledProgram, compile_program
from ..io.manager import BufferBackend, IOManager
from ..programs.loader import load
from .config import (PARKED, PARK_AWAIT_INSERT, PARK_THREADS, RUNNING,
                     VMConfig)
from .lanering import LaneRing
from .state import (
    VMInstance,
    decode_inserts,
    decode_output,
    encode_instance,
)
from .step import make_generic_step, pack_tables

_JITTED_CACHE: dict = {}


def _get_jitted_run(cfg: VMConfig, ops: frozenset = None):
    """One jitted batched runner per (cfg, opcode set); executables shared
    across programs with equal padded table shapes (tables are traced
    arguments). ``ops`` specializes dispatch to the opcodes a program uses,
    shrinking the compiled HLO (crucial on slow remote-compile paths)."""
    key = (cfg, ops)
    if key not in _JITTED_CACHE:
        _, _, _, grun_batch = make_generic_step(cfg, ops)
        _JITTED_CACHE[key] = jax.jit(grun_batch, static_argnums=(2,))
    return _JITTED_CACHE[key]


@dataclass
class InstanceResult:
    output: str
    inserts: dict
    status: int
    steps: int
    error: Optional[str] = None


def _stack(instances: list[VMInstance]) -> VMInstance:
    return jax.tree.map(lambda *xs: jnp.stack(xs), *instances)


def _index(batch: VMInstance, i: int) -> VMInstance:
    return jax.tree.map(lambda x: x[i], batch)


def _scatter(batch: VMInstance, i: int, st: VMInstance) -> VMInstance:
    return jax.tree.map(lambda b, v: b.at[i].set(v), batch, st)


class DeviceRunner:
    """Run one compiled program over a batch of instances."""

    def __init__(self, compiled: CompiledProgram, cfg: VMConfig = None,
                 io_factory: Callable[[int], IOManager] = None,
                 mode: str = "auto", lanering: LaneRing = None,
                 instance_ids: list = None):
        """mode: 'jit' (compile the batched step — the accelerator path),
        'eager' (per-instance concrete stepping — no whole-VM XLA compile;
        used by tests and tiny CPU batches), or 'auto'. ``lanering``: an
        existing LaneRing to share — an engine escaping instances into this
        runner passes its own so in-flight lane IO survives the migration.
        ``instance_ids``: global instance id per batch row (default: the
        row index) — keys the shared LaneRing's pending map so adopted
        in-flight IO is found under its original id."""
        self.compiled = compiled
        self.instance_ids = list(instance_ids) if instance_ids else None
        self._row_index = ({gid: row for row, gid
                            in enumerate(self.instance_ids)}
                           if self.instance_ids else None)
        self.cfg = cfg or VMConfig()
        self.io_factory = io_factory or (lambda i: IOManager(BufferBackend()))
        self.tables = pack_tables(compiled)
        if mode == "auto":
            mode = os.environ.get("IE_TPU_MODE", "")
            if mode not in ("jit", "eager"):
                on_cpu = jax.devices()[0].platform == "cpu"
                mode = "eager" if (on_cpu and not os.environ.get("IE_TPU_JIT")) \
                    else "jit"
        self.mode = mode
        from .step import used_opcodes
        self._ops = used_opcodes(compiled)
        self._jitted_run = _get_jitted_run(self.cfg, self._ops) \
            if mode == "jit" else None
        if mode == "eager":
            # eager shares the unspecialized handler set across programs
            _, _, self._gstep, _ = make_generic_step(self.cfg)
        self.total_device_steps = 0
        if compiled.needs_threads > self.cfg.max_threads:
            raise ValueError(
                f"program spawns {compiled.needs_threads} parallel threads "
                f"but cfg.max_threads={self.cfg.max_threads}")
        # host IO pending per instance while its parallel-block lanes wait
        # lives in the (possibly shared) LaneRing (vm/lanering.py)
        self._lanering = lanering if lanering is not None \
            else LaneRing(compiled)
        # capacity-cliff telemetry (VERDICT W8): how often real programs
        # blow the VMConfig limits and thrash the ring
        self.ring_stats = {"rounds": 0, "parks": 0, "capacity_parks": 0,
                           "parks_by_kind": {}, "ring_ms": 0.0}
        # AOT-exported step executables per (n, inner_steps) — see _aot_run
        self._aot_fns: dict = {}

    def _aot_run(self, batch, inner_steps: int):
        """AOT export of the generic batched step (vm/aotcache.py) on
        accelerators: the lax.switch step's tracing+lowering runs minutes
        per process on remote-compile backends; the exported module
        reloads in seconds. Keyed by (cfg, opcode set, batch/table shapes,
        inner_steps) + every vm/ops/compiler source — programs sharing
        padded table shapes share the executable, exactly like
        _get_jitted_run. Off-accelerator the plain jitted runner is used
        (CPU compiles are cheap and tests churn code)."""
        n = int(batch.status.shape[0])
        memo_key = (n, inner_steps)
        fn = self._aot_fns.get(memo_key)
        if fn is None:
            run = self._jitted_run
            if jax.devices()[0].platform in ("cpu",):
                def fn(b, t, _run=run, _k=inner_steps):
                    return _run(b, t, _k)
            else:
                from . import aotcache
                sds = jax.tree.map(
                    lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                    (batch, self.tables))
                key = aotcache.cache_key(
                    aotcache.kernel_sources(),
                    (self.cfg,
                     tuple(sorted(self._ops)) if self._ops else None,
                     inner_steps,
                     jax.tree.map(lambda s: (s.shape, str(s.dtype)),
                                  sds)))
                fn = aotcache.load_or_export(
                    "general-step", key,
                    lambda: jax.jit(
                        lambda b, t, _run=run, _k=inner_steps:
                        _run(b, t, _k)),
                    sds)
            self._aot_fns[memo_key] = fn
        return fn

    def _jitted(self, batch, inner_steps: int):
        if self.mode == "jit":
            return self._aot_run(batch, inner_steps)(batch, self.tables)
        # eager: step each instance with concrete opcodes (only the live
        # switch branch executes; small primitives are compiled+cached)
        from .config import RUNNING as _RUN
        n = int(np.asarray(batch.status).shape[0])
        for i in range(n):
            st = _index(batch, i)
            for _ in range(inner_steps):
                if int(st.status) != _RUN:
                    break
                st = self._gstep(st, self.tables)
            batch = _scatter(batch, i, st)
        return batch

    # ---- instance lifecycle ---------------------------------------------------

    def make_instances(self, n: int, args: list[str] = ()) -> VMInstance:
        """N identical fresh instances (distinct PRNG streams).

        Encodes once and broadcasts — a Python loop over 100k instances
        would dominate startup and blow host memory in jnp.stack.
        """
        program = self.compiled.program
        base_inserts = self._inserts_dir_values()
        base_inserts.update(program["default_state"]["inserts"])
        for i, arg in enumerate(args, start=1):
            base_inserts[f"ARG{i}"] = (
                arg.replace(INSERT_START, ESCAPE + INSERT_START)
                   .replace(INSERT_STOP, ESCAPE + INSERT_STOP))
        proto = encode_instance(base_inserts, self.cfg, pc=0, rng=1)
        batch = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (n,) + x.shape), proto)
        return batch._replace(
            rng=(jnp.arange(n, dtype=jnp.uint32) + 1))

    def _inserts_dir_values(self) -> dict:
        """Preload --inserts-dir files into the device store.

        The host resolves dir keys lazily with lower precedence than
        state['inserts'] (core/interp.py); preloading them before the
        program's own defaults reproduces that precedence on device. Known
        divergence: a program that deletes such a key would still see the
        dir fallback on the host — rare enough to accept (the ring decodes
        do not carry dir values, so host-serviced ops behave exactly).
        """
        import glob as glob_mod
        from ..core.interp import recursive_escape
        from .. import json5 as json5_mod
        values: dict = {}
        if not CTX.inserts_dir:
            return values
        for path in glob_mod.glob(os.path.join(CTX.inserts_dir, "*")):
            name = os.path.basename(path)
            try:
                if name.endswith(".json5"):
                    with open(path) as f:
                        values[name[:-len(".json5")]] = recursive_escape(
                            json5_mod.loads(f.read()))
                else:
                    with open(path) as f:
                        values[name] = recursive_escape(f.read().strip())
            except (OSError, ValueError):
                continue
        return values

    # ---- host ring ---------------------------------------------------------------

    def _await_insert_ready(self, task, inserts) -> bool:
        """Non-blocking await_insert check (vm/lanering.py)."""
        from .lanering import await_insert_ready
        return await_insert_ready(task, inserts)

    def _gid(self, row: int) -> int:
        """Global instance id of a batch row (shared-LaneRing keying)."""
        return self.instance_ids[row] if self.instance_ids else row

    def _row_of(self, gid: int, n: int):
        """Batch row of a global id, or None when this runner doesn't own
        it (pending entries of a sibling engine must not be swept here)."""
        if self._row_index is not None:
            return self._row_index.get(gid)
        return gid if 0 <= gid < n else None

    def _runtime_for(self, i: int, rts: dict) -> Runtime:
        return rts.setdefault(i, Runtime(self.io_factory(i),
                                         self.compiled.program.get(
                                             "completion_args", {}),
                                         self.compiled.program.get(
                                             "named_tasks", {})))

    def _for_head_park(self, pc: int):
        """(exit_pc, loop_id) for an OP_FOR_HEAD park (vm/lanering.py)."""
        return self._lanering.for_head_park(pc)

    async def _exec_parked(self, rt: Runtime, state: dict, pc: int,
                           task: dict, i: int, kind: int,
                           counters=None) -> int:
        """Execute one parked task on the host against `state`; return the
        next pc (shared with the turbo ring — vm/lanering.py)."""
        return await self._lanering.exec_parked(rt, state, pc, task, i,
                                                kind, counters)

    async def _service_instance(self, st: VMInstance, i: int,
                                rts: dict) -> VMInstance:
        """Service one parked instance (st is its gathered row, host-side)."""
        pc = int(st.park_arg)
        kind = int(st.park_kind)
        if kind == PARK_THREADS:
            return await self._service_threads(st, i, rts)
        task = self.compiled.source_tasks[pc]
        inserts = decode_inserts(st)
        state = {"inserts": inserts, "output": decode_output(st)}

        if kind == PARK_AWAIT_INSERT and task is not None:
            if self._await_insert_ready(task, inserts):
                return self._resume(st, state, pc + 1)
            return st  # still parked

        rt = self._runtime_for(i, rts)
        if task is None:
            raise RuntimeError(f"instance {i}: parked at pc={pc} with no "
                               f"source task")
        counters = np.asarray(st.counters).copy()
        next_pc = await self._exec_parked(rt, state, pc, task, i, kind,
                                          counters)
        return self._resume(st, state, next_pc, counters=counters)

    # ---- parallel-block thread servicing -----------------------------------

    async def _cancel_pending(self, i: int) -> None:
        await self._lanering.cancel(i)

    async def _service_threads(self, st: VMInstance, i: int,
                               rts: dict) -> VMInstance:
        """Service an instance parked inside a parallel block — the shared
        asyncio event-loop twin (vm/lanering.py) over this engine's row
        format."""
        view = {
            "tstate": np.asarray(st.tstate).copy(),
            "tpc": np.asarray(st.tpc).copy(),
            "tpark_kind": np.asarray(st.tpark_kind),
            "tpark_arg": np.asarray(st.tpark_arg),
            "counters": np.asarray(st.counters).copy(),
            "state": {"inserts": decode_inserts(st),
                      "output": decode_output(st)},
            "cur": int(st.cur_tid),
            "par_mode": int(st.par_mode),
            "par_join": int(st.par_join),
            "par_epoch": int(st.par_epoch),
        }
        rt = self._runtime_for(i, rts)
        res = await self._lanering.service(rt, self._gid(i), view)
        if res == "parked":
            return st
        state, counters = view["state"], view["counters"]
        if res == "complete":
            fresh = encode_instance(
                state["inserts"], self.cfg, output=state["output"],
                pc=int(st.par_join), counters=counters,
                rng=int(st.rng), steps=int(st.steps) + 1)
            return fresh._replace(
                status=jnp.int32(RUNNING),
                par_epoch=st.par_epoch + 1)
        nxt = view["cur"]
        fresh = encode_instance(state["inserts"], self.cfg,
                                output=state["output"],
                                pc=int(view["tpc"][nxt]),
                                counters=counters,
                                rng=int(st.rng), steps=int(st.steps) + 1)
        return fresh._replace(
            status=jnp.int32(RUNNING),
            tpc=jnp.asarray(view["tpc"]),
            tstate=jnp.asarray(view["tstate"]),
            tpark_kind=st.tpark_kind, tpark_arg=st.tpark_arg,
            cur_tid=jnp.int32(nxt), par_mode=st.par_mode,
            par_join=st.par_join, par_epoch=st.par_epoch)

    def _resume(self, st: VMInstance, state: dict, next_pc: int,
                counters=None) -> VMInstance:
        fresh = encode_instance(
            state["inserts"], self.cfg, output=state["output"], pc=next_pc,
            counters=(np.asarray(st.counters) if counters is None
                      else counters),
            rng=int(st.rng), steps=int(st.steps) + 1)
        # thread lanes survive re-encode (a normal park can only happen
        # outside a parallel block, but par_epoch monotonicity matters for
        # the pending-IO cancel sweep)
        return fresh._replace(status=jnp.int32(RUNNING),
                              tpc=st.tpc, tstate=st.tstate,
                              tpark_kind=st.tpark_kind,
                              tpark_arg=st.tpark_arg,
                              cur_tid=st.cur_tid, par_mode=st.par_mode,
                              par_join=st.par_join, par_epoch=st.par_epoch)

    # ---- main loop ------------------------------------------------------------------

    async def run_async(self, batch: VMInstance, *, inner_steps: int = 64,
                        max_rounds: int = 10_000) -> VMInstance:
        import time
        rts: dict = {}
        stalled_rounds = 0
        for round_no in range(max_rounds):
            batch = self._jitted(batch, inner_steps)
            status = np.asarray(batch.status)
            self.total_device_steps += inner_steps
            if self._lanering.pending:
                # cancel host IO of finished parallel blocks (a race won on
                # device bumps par_epoch; the losers' chat/user_input must be
                # cancelled — reference: pending.cancel() after FIRST_COMPLETED)
                epochs = np.asarray(batch.par_epoch)
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
                        await self._cancel_pending(gid)
            parked = np.nonzero(status == PARKED)[0]
            if len(parked) == 0:
                if not (status == RUNNING).any():
                    break
                continue
            # batched ring: ONE gather of all parked rows, host service in
            # numpy, ONE scatter back (SURVEY §7.3(7)) — never per-instance
            # device indexing
            t_ring = time.perf_counter()
            idx = jnp.asarray(parked)
            sub = jax.tree.map(lambda a: np.asarray(a[idx]), batch)
            service = asyncio.gather(*[
                self._service_instance(_index(sub, j), int(i), rts)
                for j, i in enumerate(parked)])
            # overlap: the device steps the still-RUNNING lanes while the
            # host services this round's parks — parked lanes are frozen
            # in-kernel, so the scatter below lands on unchanged rows
            if (status == RUNNING).any():
                batch = self._jitted(batch, inner_steps)
                self.total_device_steps += inner_steps
            serviced = await service
            resumed = 0
            kinds = np.asarray(sub.park_kind)
            errs = np.asarray(sub.last_err)
            from ..ops.interp_kernel import ERR_CAPACITY
            for j, st_out in enumerate(serviced):
                if int(st_out.status) == PARKED:
                    continue
                resumed += 1
                self.ring_stats["parks"] += 1
                k = int(kinds[j])
                by = self.ring_stats["parks_by_kind"]
                by[k] = by.get(k, 0) + 1
                if int(errs[j]) == ERR_CAPACITY:
                    self.ring_stats["capacity_parks"] += 1
            stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *serviced)
            batch = jax.tree.map(lambda b, s: b.at[idx].set(s),
                                 batch, stacked)
            ring_ms = (time.perf_counter() - t_ring) * 1e3
            self.ring_stats["rounds"] = round_no + 1
            self.ring_stats["ring_ms"] += ring_ms
            EVENTS.emit(VM_ROUND, round=round_no,
                        running=int((status == RUNNING).sum()),
                        parked=len(parked), resumed=resumed,
                        ring_ms=round(ring_ms, 3))
            status = np.asarray(batch.status)
            if not ((status == RUNNING) | (status == PARKED)).any():
                break
            if not (status == RUNNING).any() and resumed == 0:
                # every live instance is parked and nothing unblocked
                # (await_insert with no writer) — give external drivers a
                # breather, then retry a few times before declaring deadlock
                stalled_rounds += 1
                if stalled_rounds > 50:
                    break
                await asyncio.sleep(0.05)
            else:
                stalled_rounds = 0
        n_rows = int(np.asarray(batch.status).shape[0])
        for gid in list(self._lanering.pending):
            if self._row_of(gid, n_rows) is not None:
                await self._cancel_pending(gid)
        s = self.ring_stats
        EVENTS.emit(VM_STATS, rounds=s["rounds"], parks=s["parks"],
                    capacity_parks=s["capacity_parks"],
                    parks_by_kind={str(k): v
                                   for k, v in s["parks_by_kind"].items()},
                    ring_ms=round(s["ring_ms"], 3),
                    device_steps=self.total_device_steps)
        return batch

    def run(self, batch: VMInstance, **kw) -> VMInstance:
        return asyncio.run(self.run_async(batch, **kw))

    # ---- save/load (reference-format state dicts) -----------------------------

    def export_state(self, batch: VMInstance, i: int) -> dict:
        """Decode instance i into the reference's runtime-state dict shape,
        including nested ``order_index/<path>`` cursors (and ``.../counter``
        for ``for`` loops) reconstructed from (pc, counter slots) — the
        inverse of load_state, so mid-block device saves resume exactly on
        either engine (interpolation_engine.py:2089-2094)."""
        st = _index(batch, i)
        pc = min(int(st.pc), self.compiled.n_instr - 1)
        counters = np.asarray(st.counters)
        state = {
            "inserts": decode_inserts(st),
            "output": decode_output(st),
        }
        if int(st.par_mode) > 0:
            # saved inside a parallel block: per-lane cursor chains
            emit_par_cursors(self.compiled, state, st, counters)
        else:
            emit_cursors(self.compiled, state, pc, counters)
        return state

    def save_to_program(self, batch: VMInstance, i: int, slot: str,
                        label: str, filepath: str):
        """Splice instance i's state into the program file's save_states
        (comment-preserving, like the host menu's Save State)."""
        from ..core.persistence import save_program
        state = self.export_state(batch, i)
        state["label"] = label
        self.compiled.program.setdefault("save_states", {})[str(slot)] = state
        save_program(self.compiled.program, filepath)

    def load_state(self, state: dict, *, seed: int = 0) -> VMInstance:
        """Encode a reference-format state dict as a device instance.

        Nested block cursors (``order_index/<path>`` keys and
        ``.../counter`` for ``for`` loops, interpolation_engine.py:2089-2094)
        resume mid-block: the cursor chain is walked down the compiler's
        block_task_pcs map to the innermost subtask's pc, and for-counters
        land in the device loop-counter slots. Only cursors *below* a
        host-op leaf (e.g. inside a parallel block, whose sub-state the
        device cannot carry) are rejected — run those on the host engine.
        """
        counters = np.zeros((self.cfg.max_loops,), np.int32)
        pc, leftovers, par = pc_of_state(self.compiled, state, counters)
        if leftovers:
            raise ValueError(
                f"state has block cursors below a host-op task "
                f"{sorted(leftovers)}; resume requires the host engine")
        inserts = {k: v for k, v in state.get("inserts", {}).items()}
        inst = encode_instance(inserts, self.cfg,
                               output=state.get("output", ""),
                               pc=pc, counters=counters, rng=seed)
        if par is not None:
            # the block re-runs with per-lane resume pcs (host: gather
            # recreates every lane; serial lanes resume from their
            # cursors, completed/cursor-less lanes restart) — seed the
            # lane set directly, bypassing OP_PAR_BEGIN's fresh entries
            from .config import T_NEW
            NT = self.cfg.max_threads
            tpc = np.zeros((NT,), np.int32)
            tstate = np.zeros((NT,), np.int32)
            for l in range(min(par["k"], NT)):
                tpc[l] = par["tpc"][l]
                tstate[l] = T_NEW
            inst = inst._replace(
                pc=jnp.int32(int(tpc[0])),
                tpc=jnp.asarray(tpc), tstate=jnp.asarray(tstate),
                cur_tid=jnp.int32(0),
                par_mode=jnp.int32(par["mode"]),
                par_join=jnp.int32(par["join_pc"]))
        return inst

    def _pc_of_state(self, state: dict, counters) -> tuple:
        return pc_of_state(self.compiled, state, counters)

    def pc_of_order_index(self, order_index: int) -> int:
        """First instruction belonging to the 1-based top-level task index."""
        for pc, oi in enumerate(self.compiled.order_index_of):
            if oi >= order_index and self.compiled.scope_of[pc] == 0:
                return pc
        return len(self.compiled.order_index_of) - 1  # → HALT

    def results(self, batch: VMInstance) -> list[InstanceResult]:
        out = []
        n = int(np.asarray(batch.status).shape[0])
        for i in range(n):
            st = _index(batch, i)
            out.append(InstanceResult(
                output=decode_output(st),
                inserts=decode_inserts(st),
                status=int(st.status),
                steps=int(st.steps),
            ))
        return out


class DeviceProgramRun:
    """Interactive single-instance run on the device engine with the
    reference's Esc-menu arbitration (Save/Load/Reload/Quit —
    interpolation_engine.py:2046-2131,2362-2372; VERDICT r2 missing #2).

    Arbitration parity: Esc cancels the in-flight round (stepping or ring
    service) and opens the menu; closing it (Esc again) re-services the
    still-parked instruction — the host equivalently re-executes the
    cancelled task after the menu closes. Save exports the device state to
    the reference's cursor format (splice-preserving); Load re-encodes any
    reference-format slot back onto the device.
    """

    def __init__(self, filepath: str, args: list[str], io,
                 inner_steps: int = 16):
        self.filepath = filepath
        self.args = list(args)
        self.io = io
        self.inner_steps = inner_steps
        self.killme = False
        self.menu_open = False
        self.current_task: Optional[asyncio.Task] = None
        self.runner: Optional[DeviceRunner] = None
        self.batch = None

    def toggle_menu(self):
        if self.current_task:
            self.current_task.cancel()
        self.menu_open = not self.menu_open

    def kill(self):
        self.killme = True
        if self.current_task:
            self.current_task.cancel()

    def _make_runner(self):
        program, _state = load(self.filepath)
        compiled = compile_program(program)
        if compiled.host_only:
            raise ValueError(
                f"host-only program: {compiled.host_only_reason}")
        # mode=auto: eager on CPU (no whole-VM compile for one instance),
        # jit on accelerators (ONE cached executable beats hundreds of
        # per-handler remote compiles); IE_TPU_MODE overrides
        self.runner = DeviceRunner(compiled, io_factory=lambda i: self.io)
        self.batch = self.runner.make_instances(1, self.args)

    async def run(self) -> str:
        import signal
        CTX.program_dir = os.path.dirname(os.path.abspath(self.filepath))
        self._make_runner()
        await self.io.start()
        await asyncio.sleep(0)
        await self.io.write("")
        loop = asyncio.get_running_loop()
        try:
            loop.add_signal_handler(signal.SIGINT, self.toggle_menu)
        except (NotImplementedError, RuntimeError):
            pass
        backend = getattr(self.io, "backend", None)
        if backend is not None and hasattr(backend, "on_menu"):
            backend.on_menu = self.toggle_menu
            backend.on_kill = self.kill
        rts: dict = {}
        while not self.killme:
            if self.menu_open:
                self.current_task = loop.create_task(self._menu())
            else:
                self.current_task = loop.create_task(self._round(rts))
            try:
                await self.current_task
            except asyncio.CancelledError:
                current = asyncio.current_task()
                if current is not None and current.cancelling() > 0:
                    raise
            if not self.menu_open and not self.killme:
                status = int(np.asarray(self.batch.status)[0])
                if status not in (RUNNING, PARKED):
                    break
        result = self.runner.results(self.batch)[0]
        await self.io.stop()
        from ..io import tts as tts_mod
        tts_mod.stop_current_tts()
        # .strip() is the reference's own final print (:2403)
        print(result.output.strip())
        return result.output

    async def _round(self, rts: dict) -> None:
        self.batch = self.runner._jitted(self.batch, self.inner_steps)
        status = int(np.asarray(self.batch.status)[0])
        if status != PARKED:
            return
        steps_before = int(np.asarray(self.batch.steps)[0])
        sub = jax.tree.map(lambda a: np.asarray(a), self.batch)
        st_out = await self.runner._service_instance(_index(sub, 0), 0, rts)
        self.batch = jax.tree.map(
            lambda b, s: b.at[0].set(jnp.asarray(s)), self.batch, st_out)
        if int(np.asarray(self.batch.status)[0]) == PARKED and \
                int(np.asarray(self.batch.steps)[0]) == steps_before:
            await asyncio.sleep(0.05)   # await_insert-style idle poll

    async def _menu(self) -> None:
        import copy
        from ..core.context import log
        from ..core.persistence import save_program
        runner = self.runner
        program = runner.compiled.program
        status = ""
        while True:
            options = ["Save State", "Load State", "Reload and Restart",
                       "Quit"]
            choice = options[await self.io.select_index(
                options, description=f"\n{status}")]
            log(f"🛈 user picked '{choice}'")

            if choice == "Save State":
                saves = program.setdefault("save_states", {})
                slot_states = [
                    saves.get(str(slot), {"label": "(Empty Slot)"})
                    for slot in range(1, 10)]
                labels = [s["label"] for s in slot_states]
                choice_i = await self.io.select_index(labels,
                                                      description="")
                label = labels[choice_i]
                save_label = await self.io.user_input(
                    prompt="What do you want to call this save state?\n> ",
                    default=label if label != "(Empty Slot)" else "")
                state = runner.export_state(self.batch, 0)
                state["label"] = save_label
                saves[str(choice_i + 1)] = state
                save_program(program, self.filepath)
                status = f"\nSaved '{save_label}' to slot {choice_i + 1}.\n"
                log(f"🛈 saved slot {choice_i + 1}")

            elif choice == "Load State":
                saves = program.setdefault("save_states", {})
                slot_states = [
                    saves.get(str(slot), {"label": "(Empty Slot)"})
                    for slot in range(1, 10)]
                labels = [s.get("label", "(Unlabelled Slot)")
                          for s in slot_states]
                choice_i = await self.io.select_index(labels,
                                                      description="")
                if labels[choice_i] == "(Empty Slot)":
                    status = "\nCannot load empty slot.\n"
                    continue
                state = copy.deepcopy(slot_states[choice_i])
                label = state.pop("label", "")
                try:
                    inst = runner.load_state(state)
                except ValueError as e:
                    status = f"\n{e}\n"
                    continue
                self.batch = jax.tree.map(
                    lambda b, s: b.at[0].set(jnp.asarray(s)),
                    self.batch, inst)
                await self.io.write(state.get("output", ""))
                status = f"\nLoaded '{label}' from slot {choice_i + 1}.\n"
                log(f"🛈 Loaded slot {choice_i + 1} ({label}).")

            elif choice == "Reload and Restart":
                from ..programs.loader import invalidate_cache
                invalidate_cache()
                self._make_runner()   # keeps self.args → ARGn re-applied
                status = "\nRestarted Program after reloading.\n"
                log("🛈 Restarted Program.")

            elif choice == "Quit":
                self.kill()
                return


def run_program_on_device(filepath: str, args: list[str], io,
                          batch: int = 1) -> int:
    """CLI entry: run a program on the device engine (host fallback)."""
    import os
    CTX.program_dir = os.path.dirname(os.path.abspath(filepath))
    program, _state = load(filepath)
    compiled = compile_program(program)
    if compiled.host_only:
        # exact host engine (reason: dynamic task lists / recursive
        # run_task / label-hash collisions)
        from ..core.runtime import async_main
        asyncio.run(async_main(filepath, list(args), io))
        return 0
    results = None
    turbo_env = os.environ.get("IE_TPU_TURBO", "")
    # the whole-program Pallas kernel pays a multi-minute TPU compile —
    # worth it for big batches (or when explicitly requested), not for a
    # single interactive instance
    want_turbo = turbo_env == "1" or (turbo_env != "0" and batch >= 256)
    if batch == 1 and not want_turbo:
        # single interactive instance: full menu arbitration (Esc →
        # Save/Load/Reload/Quit), like the host CLI
        run = DeviceProgramRun(filepath, args, io)
        asyncio.run(run.run())
        return 0
    if want_turbo:
        engine = tb = None
        try:
            from ..compiler.turbo import NotTurbo
            from .turbo import TurboConfig, TurboEngine
            on_tpu = jax.devices()[0].platform == "tpu"
            # off-TPU the kernel runs in the Pallas interpreter (Python):
            # size the tile to the batch or small CLI runs crawl
            tcfg = None if on_tpu else TurboConfig(
                tile=max(8, min(64, batch)), k_steps=16)
            engine = TurboEngine(compiled, tcfg, io_factory=lambda i: io)
            tb = engine.make_batch(batch, list(args))
            # compile + first kernel launch happen HERE, before any IO —
            # stepping never performs IO (only the ring does), so falling
            # back to the general engine on failure cannot duplicate output
            tb = engine.step_fn(tb.regs.shape[0])(tb)
        except NotTurbo:
            engine = None
        except Exception as e:  # Mosaic/compile failures → general engine
            import sys as _sys
            print(f"turbo engine unavailable ({type(e).__name__}); "
                  f"using the general device VM", file=_sys.stderr)
            engine = None
        if engine is not None:
            # past this point exceptions propagate: the ring may have done
            # IO, and reference-parity errors (e.g. goto_map assertions)
            # must surface exactly, not trigger a duplicate re-run
            tb = engine.run(tb)
            results = engine.results(tb, batch)
    if results is None:
        runner = DeviceRunner(compiled, io_factory=lambda i: io)
        instances = runner.make_instances(batch, args)
        final = runner.run(instances)
        results = runner.results(final)
    # .strip() is the reference's own final print (:2403) — byte parity
    print(results[0].output.strip())
    return 0


# ---------------------------------------------------------------------------
# reference-format cursor mapping (shared by DeviceRunner and TurboEngine)
# ---------------------------------------------------------------------------

def emit_cursors(compiled, state: dict, pc: int, counters) -> None:
    """Reconstruct the reference's nested ``order_index/<path>`` cursor keys
    (and ``.../counter`` for ``for`` loops) from (pc, counter slots) —
    interpolation_engine.py:2089-2094."""
    _walk_cursors(compiled, state, pc, counters,
                  compiled.program["order"],
                  compiled.block_task_pcs.get("", []), None)


def emit_par_cursors(compiled, state: dict, st, counters) -> None:
    """Per-lane cursors for an instance saved INSIDE a parallel block
    (PARITY divergence 6; reference: each serial/for lane keeps its own
    ``order_index/<par_path>/<lane_label>`` chain in the state —
    interpolation_engine.py:1637-1652). Lanes that never ran (T_NEW) or
    completed (T_DONE, cursor deleted on completion) emit nothing, like
    the host."""
    from .config import RUNNING as _RUN, T_READY, T_WAIT
    block = compiled.par_blocks.get(int(st.par_join))
    if block is None:
        emit_cursors(compiled, state,
                     min(int(st.pc), compiled.n_instr - 1), counters)
        return
    # top-level chain down to the parallel task itself
    emit_cursors(compiled, state, block["begin_pc"], counters)
    tstate = np.asarray(st.tstate)
    tpc = np.asarray(st.tpc)
    cur = int(st.cur_tid)
    running = int(st.status) == _RUN
    for l, (label, entry_pc, sub) in enumerate(block["lanes"]):
        ts_l = int(tstate[l]) if l < len(tstate) else 0
        if running and l == cur:
            lane_pc = int(st.pc)
        elif ts_l in (T_WAIT, T_READY):
            lane_pc = int(tpc[l])
        else:
            continue
        _walk_cursors(compiled, state, lane_pc, counters, [sub],
                      [entry_pc], block["path"], emit_index=False)


def _walk_cursors(compiled, state: dict, pc: int, counters, tasks, pcs,
                  prefix, emit_index: bool = True) -> None:
    """Emit cursor keys for position ``pc`` within a task list (``tasks``
    whose subtask start pcs are ``pcs``, runtime-label prefix ``prefix``).
    ``emit_index=False`` skips the first level's own index (used to root
    the walk AT a parallel lane's subtask, which has no index of its own)."""
    from ..vm import isa as _isa
    named_tasks = compiled.program.get("named_tasks", {})
    code = compiled.code
    # a pc sitting on OP_FOR_NEXT means "iteration done": the host
    # equivalent is counter+1 with no body cursor
    at_for_next = pc < len(code) and int(code[pc][0]) == _isa.OP_FOR_NEXT
    while True:
        j = 0
        for idx, start in enumerate(pcs, start=1):
            if start <= pc:
                j = idx
        if j == 0:
            j = 1  # before the first recorded start (defensive)
        if int(code[min(pc, len(code) - 1)][0]) == _isa.OP_HALT and \
                prefix is None and emit_index:
            state["order_index"] = len(tasks) + 1
            return
        key = "order_index" if prefix is None else \
            f"order_index/{prefix}"
        if emit_index:
            state[key] = j
        emit_index = True
        if j > len(tasks):
            return
        t = tasks[j - 1]
        label = t.get("traceback_label",
                      f"{t.get('cmd')}-{t.get('line', 0)}")
        path = label if prefix is None else f"{prefix}/{label}"
        seen = set()
        while t.get("cmd") == "run_task" and \
                isinstance(t.get("task_name"), str) and \
                t["task_name"] in named_tasks and \
                t["task_name"] not in seen:
            seen.add(t["task_name"])
            t = named_tasks[t["task_name"]]
            sub_label = t.get("traceback_label",
                              f"{t.get('cmd')}-{t.get('line', 0)}")
            path = f"{path}/{sub_label}"
        cmd = t.get("cmd")
        if cmd == "serial" and path in compiled.block_task_pcs:
            body = compiled.block_task_pcs[path]
            if body and pc >= body[0]:
                tasks, pcs, prefix = t["tasks"], body, path
                continue
            return
        if cmd == "for" and path in compiled.block_task_pcs:
            loop_id = compiled.block_loop_id.get(path)
            c = int(counters[loop_id]) if loop_id is not None and \
                loop_id < len(counters) else 0
            head_pc = pcs[j - 1]
            body = compiled.block_task_pcs[path]
            if pc == head_pc:
                if c > 0:
                    state[f"order_index/{path}/counter"] = c
                return
            if at_for_next:
                state[f"order_index/{path}/counter"] = c + 1
                return
            state[f"order_index/{path}/counter"] = max(c, 1)
            if body and pc >= body[0]:
                tasks, pcs, prefix = t["tasks"], body, path
                continue
            return
        return


def pc_of_state(compiled, state: dict, counters) -> tuple:
    """Resolve (order_index + nested cursors) -> (pc, unconsumed keys,
    par); the inverse of emit_cursors. for-counters land in ``counters``.
    ``par`` is None, or — when the state was saved inside a parallel
    block and carries per-lane cursors — a dict {mode, join_pc, k, tpc}
    describing the lane set to re-seed (the host equivalent: the block
    re-runs, each lane resuming from its cursor or restarting —
    interpolation_engine.py:1581-1626 after a load)."""
    cursors = {k for k in state if k.startswith("order_index/")}
    consumed: set = set()
    pc, par = _resolve_chain(
        compiled, state, counters, consumed,
        compiled.program["order"], compiled.block_task_pcs.get("", []),
        int(state.get("order_index", 1)), None)
    return pc, cursors - consumed, par


def _resolve_chain(compiled, state: dict, counters, consumed: set,
                   tasks, pcs, k: int, prefix):
    """Walk one cursor chain to its pc (helper of pc_of_state)."""
    named_tasks = compiled.program.get("named_tasks", {})
    while True:
        if k > len(tasks) and prefix is None:
            return compiled.n_instr - 1, None  # HALT
        if not (1 <= k <= len(tasks)):
            raise ValueError(f"cursor {k} out of range for block "
                             f"{prefix!r}")
        t = tasks[k - 1]
        pc = pcs[k - 1]
        label = t.get("traceback_label",
                      f"{t.get('cmd')}-{t.get('line', 0)}")
        path = label if prefix is None else f"{prefix}/{label}"
        # run_task chains extend the path without a cursor of their own
        seen = set()
        while t.get("cmd") == "run_task" and \
                isinstance(t.get("task_name"), str) and \
                t["task_name"] in named_tasks and \
                t["task_name"] not in seen:
            seen.add(t["task_name"])
            t = named_tasks[t["task_name"]]
            sub_label = t.get("traceback_label",
                              f"{t.get('cmd')}-{t.get('line', 0)}")
            path = f"{path}/{sub_label}"
        cmd = t.get("cmd")
        if cmd == "serial":
            key = f"order_index/{path}"
            if key in state:
                consumed.add(key)
                tasks = t["tasks"]
                pcs = compiled.block_task_pcs[path]
                k = int(state[key])
                prefix = path
                continue
            return pc, None
        if cmd == "for":
            ckey = f"order_index/{path}/counter"
            bkey = f"order_index/{path}"
            if ckey in state:
                consumed.add(ckey)
                loop_id = compiled.block_loop_id.get(path)
                if loop_id is not None and loop_id < len(counters):
                    counters[loop_id] = int(state[ckey])
            if bkey in state:
                consumed.add(bkey)
                tasks = t["tasks"]
                pcs = compiled.block_task_pcs[path]
                k = int(state[bkey])
                prefix = path
                continue
            return pc, None
        if cmd in ("parallel_wait", "parallel_race"):
            hit = next(((jpc, bl)
                        for jpc, bl in compiled.par_blocks.items()
                        if bl["path"] == path), None)
            lane_keys = {c for c in state
                         if c.startswith(f"order_index/{path}/")}
            if hit is None or not lane_keys:
                # fresh entry: OP_PAR_BEGIN spawns the lanes normally
                return pc, None
            join_pc, block = hit
            tpcs = []
            for (lane_label, entry_pc, sub) in block["lanes"]:
                lane_pc, _sub_par = _resolve_chain(
                    compiled, state, counters, consumed,
                    [sub], [entry_pc], 1, path)
                tpcs.append(int(lane_pc))
            return pc, {"mode": block["mode"], "join_pc": join_pc,
                        "k": len(block["lanes"]), "tpc": tpcs}
        return pc, None

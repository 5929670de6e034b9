"""Lower a validated program to the device instruction table.

The compiler front-end is the loader+validator (programs/); this module is
the back-end: it flattens ``order`` into a static instruction stream with
pre-resolved jump targets (the reference's runtime label scan at
interpolation_engine.py:2380-2382 becomes a compile-time jump table),
per-scope label tables for dynamically-computed ``goto_map`` targets,
loop-counter slots for ``for``, inlined ``run_task`` bodies, and OP_PARK
markers (with the original task attached) wherever a task needs host
services (user IO, chat, filesystem, TTS) or shapes the device kernels
defer on.

Top-level ``parallel_wait``/``parallel_race`` blocks lower to device thread
lanes (OP_PAR_BEGIN + one OP_THREAD_END-terminated body per subtask); nested
or oversized blocks park wholesale to the host ring with true asyncio
semantics. Only dynamic (interpolated) task lists, recursive run_task, and
intra-scope label-hash collisions flag a program ``host_only`` — the driver
then runs it on the exact host engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import numpy as np

from ..vm import isa
from ..vm.config import (
    PARK_AWAIT_INSERT,
    PARK_CHAT,
    PARK_HOST_OP,
    PARK_SHOW_INSERTS,
    PARK_SPEAK,
    PARK_USER_CHOICE,
    PARK_USER_INPUT,
    PARK_WRITE,
)
from ..vm.state import fnv1a_np

# compile-time cap on thread lanes per parallel block; blocks with more
# subtasks park wholesale to the host ring (must be <= VMConfig.max_threads
# at run time — the driver validates)
MAX_THREADS = 8


class CompileError(ValueError):
    pass


@dataclass
class CompiledProgram:
    code: np.ndarray          # int32 [n_instr, 4]: opcode, a, b, c
    aux: np.ndarray           # int32 [n_aux]
    strtab: np.ndarray        # uint8 [n_bytes]
    labels: np.ndarray        # int32 [n_labels, 5]: scope, hash, pc, name_off, name_len
    source_tasks: list        # pc → (task dict | None) for host fallback
    order_index_of: list      # pc → top-level 1-based order_index (save map)
    host_only: bool
    host_only_reason: str
    n_loops: int
    program: dict             # the validated source program
    scope_of: list = field(default_factory=list)    # pc → scope id
    label_names: dict = field(default_factory=dict)  # (scope_id, name) → pc
    max_list_literal: int = 0
    # mid-block resume maps (reference cursor keys `order_index/<path>`,
    # interpolation_engine.py:2089-2094): block runtime-label path → the pc
    # of each 1-based subtask (labels map to the following instruction), and
    # `for` block path → device loop-counter slot
    block_task_pcs: dict = field(default_factory=dict)
    block_loop_id: dict = field(default_factory=dict)
    # max thread lanes any parallel_wait/race block spawns (0 = no native
    # parallel blocks); the driver checks it against VMConfig.max_threads
    needs_threads: int = 0
    # join_pc → {path, mode, begin_pc, aux, lanes: [(label, entry_pc,
    # subtask)]} — per-lane save/resume metadata (PARITY divergence 6)
    par_blocks: dict = field(default_factory=dict)

    @property
    def n_instr(self) -> int:
        return len(self.code)


class _Builder:
    def __init__(self, program: dict):
        self.program = program
        self.code: list[list[int]] = []
        self.aux: list[int] = []
        self.strbytes = bytearray()
        self.str_cache: dict[bytes, int] = {}
        self.labels: list[tuple[int, int, int]] = []
        self.source_tasks: list = []
        self.order_index_of: list = []
        self.scope_of: list = []
        self.label_names: dict = {}
        self.n_scopes = 0
        self._cur_scope = 0
        self.n_loops = 0
        self.host_only = False
        self.host_only_reason = ""
        self.max_list_literal = 0
        self._cur_order_index = 0
        self.block_task_pcs: dict = {}
        self.block_loop_id: dict = {}
        self.par_blocks: dict = {}
        self._par_depth = 0
        self.needs_threads = 0

    # ---- tables -------------------------------------------------------------

    def intern(self, s: str) -> tuple[int, int]:
        data = s.encode("utf-8")
        if data in self.str_cache:
            return self.str_cache[data], len(data)
        off = len(self.strbytes)
        self.strbytes.extend(data)
        self.str_cache[data] = off
        return off, len(data)

    def put_aux(self, values: list[int]) -> int:
        base = len(self.aux)
        self.aux.extend(int(v) for v in values)
        return base

    def emit(self, opcode: int, a: int = 0, b: int = 0, c: int = 0,
             task: Optional[dict] = None) -> int:
        pc = len(self.code)
        self.code.append([opcode, a, b, c])
        self.source_tasks.append(task)
        self.order_index_of.append(self._cur_order_index)
        self.scope_of.append(self._cur_scope)
        return pc

    def patch(self, pc: int, a: Optional[int] = None, b: Optional[int] = None,
              c: Optional[int] = None):
        if a is not None:
            self.code[pc][1] = a
        if b is not None:
            self.code[pc][2] = b
        if c is not None:
            self.code[pc][3] = c

    # ---- value specs -----------------------------------------------------------

    def vspec(self, value) -> list[int]:
        if isinstance(value, bool):
            return [isa.VK_HOST, 0, 0]
        if isinstance(value, int):
            return [isa.VK_INT, value, 0]
        if isinstance(value, str):
            off, ln = self.intern(value)
            return [isa.VK_STR, off, ln]
        if isinstance(value, list):
            elems = []
            for e in value:
                elems.extend(self.vspec(e))
            base = self.put_aux(elems)
            self.max_list_literal = max(self.max_list_literal, len(value))
            return [isa.VK_LIST, base, len(value)]
        return [isa.VK_HOST, 0, 0]

    # ---- task lowering -----------------------------------------------------------

    def lower_task_list(self, tasks: list, named_stack: tuple = (),
                        block_path: str = None,
                        child_prefix: str = None) -> None:
        """Emit a task list as one scope; resolves local labels and gotos.

        ``block_path`` (the block's runtime-label path, when this list is a
        resumable serial/for body) registers per-subtask pcs for mid-block
        resume; ``child_prefix`` prefixes the runtime labels of the lowered
        subtasks (equal to block_path for serial/for bodies)."""
        if not isinstance(tasks, list) or any(
                not isinstance(t, dict) for t in tasks):
            raise _HostOnly("dynamic task list")

        scope_id = self.n_scopes
        self.n_scopes += 1
        prev_scope, self._cur_scope = self._cur_scope, scope_id

        # map local label name → patch list / final pc
        label_pcs: dict[str, int] = {}
        pending_gotos: list[tuple[int, str]] = []           # (pc, label)

        # first emit everything, remembering label positions
        task_pcs: list[int] = []
        for task in tasks:
            cmd = task.get("cmd")
            task_pcs.append(len(self.code))
            if cmd == "label":
                label_pcs[task["name"]] = len(self.code)  # next instruction
                continue
            self.lower_task(task, scope_id, pending_gotos, named_stack,
                            child_prefix)
        if block_path is not None:
            self.block_task_pcs[block_path] = task_pcs

        # resolve local gotos (a target may legitimately sit at end-of-scope)
        for pc, name in pending_gotos:
            if name == "CONTINUE":
                continue
            if name not in label_pcs:
                # the reference raises at runtime (min() of empty sequence);
                # lower to a host-op so the host reproduces that error
                self.code[pc][0] = isa.OP_PARK
                self.code[pc][1] = PARK_HOST_OP
                continue
            self.code[pc][1] = label_pcs[name]

        # register scope labels for dynamic goto_map resolution
        self.register_labels(scope_id, label_pcs)
        # CONTINUE is an implicit label meaning "next instruction": dynamic
        # targets resolve it specially at runtime (hash match)
        self._cur_scope = prev_scope
        return None

    def register_labels(self, scope_id: int, label_pcs: dict) -> None:
        """Register a scope's labels in the device label table.

        Rows are [scope_id, name_hash, pc, name_off, name_len]; the runtime
        verifies name bytes after the hash hit (a dynamic goto_map target
        could otherwise alias a label by crafted hash collision). Two labels
        colliding *within* a scope would still be ambiguous at the prefilter,
        so that (astronomically rare, but craftable) case demotes the program
        to the exact host engine.
        """
        seen_hashes: dict[int, str] = {}
        for name, pc in label_pcs.items():
            h = int(np.int32(np.uint32(fnv1a_np(name.encode("utf-8")))))
            if seen_hashes.get(h, name) != name:
                raise _HostOnly(
                    f"label name-hash collision in one scope: "
                    f"{seen_hashes[h]!r} vs {name!r}")
            seen_hashes[h] = name
            off, ln = self.intern(name)
            self.labels.append((scope_id, h, pc, off, ln))
            self.label_names[(scope_id, name)] = pc

    def lower_task(self, task: dict, scope_id: int,
                   pending_gotos: list, named_stack: tuple,
                   path_prefix: str = None) -> None:
        cmd = task.get("cmd")
        t = task
        label = task.get(
            "traceback_label", f"{cmd}-{task.get('line', 0)}")
        full_path = label if not path_prefix else f"{path_prefix}/{label}"

        def name_pair(value: str) -> list[int]:
            off, ln = self.intern(value)
            return [off, ln]

        def name_is_literal(value) -> bool:
            return isinstance(value, str) and "{" not in value \
                and "}" not in value and "\\" not in value

        if cmd == "print":
            text = t["text"]
            if isinstance(text, str) and "{" not in text and "}" not in text:
                off, ln = self.intern(text)
                self.emit(isa.OP_PRINT_LIT, self.put_aux([off, ln]), task=t)
            else:
                spec = self.vspec(text)
                self.emit(isa.OP_PRINT, self.put_aux(spec), task=t)

        elif cmd in ("set", "unescape"):
            spec = self.vspec(t["item"])
            base = self.put_aux(name_pair(t["output_name"]) + spec)
            if cmd == "set":
                op = isa.OP_SET_LN if name_is_literal(t["output_name"]) \
                    else isa.OP_SET
            else:
                op = isa.OP_UNESCAPE
            self.emit(op, base, task=t)

        elif cmd == "clear":
            self.emit(isa.OP_CLEAR, task=t)

        elif cmd == "sleep":
            spec = self.vspec(t["seconds"])
            self.emit(isa.OP_SLEEP, self.put_aux(spec), task=t)

        elif cmd == "goto":
            pc = self.emit(isa.OP_GOTO, 0, task=t)
            if t["name"] == "CONTINUE":
                self.patch(pc, a=pc + 1)
            else:
                pending_gotos.append((pc, t["name"]))

        elif cmd == "goto_map":
            entries = []
            all_literal = True
            for d in t["target_maps"]:
                key = next(iter(d.keys()))
                val = next(iter(d.values()))
                if not (isinstance(key, str) and isinstance(val, str)):
                    all_literal = False
                    key, val = str(key), str(val)
                elif any(ch in key or ch in val for ch in "{}\\"):
                    all_literal = False
                koff, klen = self.intern(key)
                voff, vlen = self.intern(val)
                entries.extend([koff, klen, voff, vlen, isa.TARGET_DYNAMIC])
            text_off, text_len = self.intern(t["text"])
            base = self.put_aux([text_off, text_len, scope_id] + entries)
            op = isa.OP_GOTO_MAP_LIT if all_literal else isa.OP_GOTO_MAP
            pc = self.emit(op, base, len(t["target_maps"]), task=t)
            # static targets get patched by the scope pass via pending_gotos:
            # handled dynamically at runtime via the scope label table (the
            # CONTINUE case resolves to pc+1 there)

        elif cmd == "math":
            from .math_rpn import compile_math_rpn
            rpn = compile_math_rpn(t["input"], self.intern)
            if rpn is not None:
                base = self.put_aux(name_pair(t["output_name"]) + rpn)
                op = isa.OP_MATH_RPN_LN if name_is_literal(t["output_name"]) \
                    else isa.OP_MATH_RPN
                self.emit(op, base, rpn[0], task=t)
            else:
                ioff, ilen = self.intern(t["input"])
                base = self.put_aux([ioff, ilen] + name_pair(t["output_name"]))
                self.emit(isa.OP_MATH, base, task=t)

        elif cmd == "list_join":
            base = self.put_aux(
                self.vspec(t["list"]) + name_pair(t["before"])
                + name_pair(t["between"]) + name_pair(t["after"])
                + name_pair(t["output_name"]))
            self.emit(isa.OP_LIST_JOIN, base, task=t)

        elif cmd == "list_concat":
            lists = t["lists"]
            if not isinstance(lists, list):
                self.emit_park(PARK_HOST_OP, t)
                return
            specs: list[int] = []
            for sub in lists:
                specs.extend(self.vspec(sub))
            base = self.put_aux(name_pair(t["output_name"]) + specs)
            self.emit(isa.OP_LIST_CONCAT, base, len(lists), task=t)

        elif cmd in ("list_append", "list_remove"):
            base = self.put_aux(
                self.vspec(t["list"]) + self.vspec(t["item"])
                + name_pair(t["output_name"]))
            self.emit(isa.OP_LIST_APPEND if cmd == "list_append"
                      else isa.OP_LIST_REMOVE, base, task=t)

        elif cmd == "list_index":
            base = self.put_aux(
                self.vspec(t["list"]) + self.vspec(t["index"])
                + name_pair(t["output_name"]))
            self.emit(isa.OP_LIST_INDEX, base, task=t)

        elif cmd == "list_slice":
            base = self.put_aux(
                self.vspec(t["list"]) + self.vspec(t["from_index"])
                + self.vspec(t["to_index"]) + name_pair(t["output_name"]))
            self.emit(isa.OP_LIST_SLICE, base, task=t)

        elif cmd == "replace_map":
            item_spec = self.vspec(t["item"])
            entries = []
            for d in t["wildcard_maps"]:
                key = next(iter(d.keys()))
                val = next(iter(d.values()))
                koff, klen = self.intern(str(key))
                voff, vlen = self.intern(str(val))
                entries.extend([koff, klen, voff, vlen])
            repeat = 1 if t.get("repeat_until_done", False) else 0
            base = self.put_aux(
                item_spec + name_pair(t["output_name"]) + [repeat]
                + entries)
            self.emit(isa.OP_REPLACE_MAP, base, len(t["wildcard_maps"]),
                      task=t)

        elif cmd in ("delete", "delete_except"):
            wildcards = t["wildcards"]
            if not isinstance(wildcards, list) or any(
                    not isinstance(w, str) for w in wildcards):
                self.emit_park(PARK_HOST_OP, t)
                return
            entries = []
            for w in wildcards:
                off, ln = self.intern(w)
                entries.extend([off, ln])
            base = self.put_aux(entries)
            self.emit(isa.OP_DELETE if cmd == "delete"
                      else isa.OP_DELETE_EXCEPT, base, len(wildcards), task=t)

        elif cmd == "random_choice":
            base = self.put_aux(
                self.vspec(t["list"]) + name_pair(t["output_name"]))
            self.emit(isa.OP_RANDOM_CHOICE, base, task=t)

        elif cmd == "serial":
            self.lower_task_list(t["tasks"], named_stack,
                                 block_path=full_path,
                                 child_prefix=full_path)

        elif cmd == "for":
            loop_id = self.n_loops
            self.n_loops += 1
            pairs: list[int] = []
            nlm = t["name_list_map"]
            if not isinstance(nlm, dict):
                self.emit_park(PARK_HOST_OP, t)
                return
            for name, lst in nlm.items():
                off, ln = self.intern(name)
                pairs.extend([off, ln] + self.vspec(lst))
            head_base = self.put_aux([loop_id, 0] + pairs)  # [1] = exit pc
            head_pc = self.emit(isa.OP_FOR_HEAD, head_base, len(nlm), task=t)
            self.block_loop_id[full_path] = loop_id
            self.lower_task_list(t["tasks"], named_stack,
                                 block_path=full_path,
                                 child_prefix=full_path)
            self.emit(isa.OP_FOR_NEXT, head_pc, loop_id, task=t)
            exit_pc = len(self.code)
            self.aux[head_base + 1] = exit_pc

        elif cmd == "run_task":
            task_name = t["task_name"]
            if not isinstance(task_name, str) or "{" in task_name:
                self.emit_park(PARK_HOST_OP, t)
                return
            if task_name in named_stack:
                raise _HostOnly(f"recursive run_task '{task_name}'")
            sub = self.program["named_tasks"][task_name]
            # the executor extends the runtime label through run_task, so
            # blocks inside the named task resume under this call's path
            self.lower_task_list([sub], named_stack + (task_name,),
                                 child_prefix=full_path)

        elif cmd == "user_input":
            self.emit_park(PARK_USER_INPUT, t)
        elif cmd == "user_choice":
            self.emit_park(PARK_USER_CHOICE, t)
        elif cmd == "await_insert":
            name = t.get("name")
            if isinstance(name, str) and \
                    not any(ch in name for ch in "{}\\"):
                # literal key: encode (off, len) so the device can check
                # readiness IN-KERNEL (step.py h_park / turbo IPark
                # await_slot). The reference's await is
                # ``while name not in inserts: await asyncio.sleep(0.05)``
                # (interpolation_engine.py:1572-1574): a present key
                # means NO yield — the lane continues synchronously;
                # an absent key suspends at the sleep, where a race
                # cancel always lands. Interpolated names keep b=c=0
                # (unconditional park, exact host servicing).
                off, ln = self.intern(name)
                self.emit(isa.OP_PARK, PARK_AWAIT_INSERT, off, ln, task=t)
            else:
                self.emit_park(PARK_AWAIT_INSERT, t)
        elif cmd == "chat":
            self.emit_park(PARK_CHAT, t)
        elif cmd == "write":
            self.emit_park(PARK_WRITE, t)
        elif cmd == "speak":
            self.emit_park(PARK_SPEAK, t)
        elif cmd == "show_inserts":
            self.emit_park(PARK_SHOW_INSERTS, t)

        elif cmd in ("parallel_wait", "parallel_race"):
            self.lower_parallel(t, scope_id, pending_gotos, named_stack,
                                full_path)
        else:
            self.emit_park(PARK_HOST_OP, t)

    def emit_park(self, kind: int, task: dict) -> int:
        return self.emit(isa.OP_PARK, kind, task=task)

    def lower_parallel(self, t: dict, scope_id: int, pending_gotos: list,
                       named_stack: tuple, full_path: str = None) -> None:
        """Lower parallel_wait/parallel_race to device thread lanes.

        Reference semantics (interpolation_engine.py:1581-1626): gather/
        FIRST_COMPLETED over subtask coroutines sharing one state, switching
        at awaits. Device shape: OP_PAR_BEGIN spawns one pc lane per subtask;
        each body ends in OP_THREAD_END; the vm/step.py scheduler switches
        lanes at park points; the host ring services waiting lanes
        concurrently. Nested or oversized blocks park wholesale to the ring
        (true asyncio semantics), so depth > 0 stays exact.
        """
        subtasks = t.get("tasks")
        if not isinstance(subtasks, list) or \
                any(not isinstance(s, dict) for s in subtasks):
            raise _HostOnly("dynamic task list")
        if self._par_depth > 0 or not subtasks or \
                len(subtasks) > MAX_THREADS:
            self.emit_park(PARK_HOST_OP, t)
            return
        mode = 1 if t["cmd"] == "parallel_wait" else 2
        K = len(subtasks)
        # aux record: [mode, K, join_pc, loop_lo, loop_hi, entry_0..K-1]
        # (join/loop span/entries patched below, after bodies are emitted)
        base = self.put_aux([mode, K, 0, 0, 0] + [0] * K)
        begin_pc = len(self.code)
        self.emit(isa.OP_PAR_BEGIN, base, task=t)
        loop_lo = self.n_loops
        self._par_depth += 1
        lanes = []
        for ti, sub in enumerate(subtasks):
            self.aux[base + 5 + ti] = len(self.code)
            sub_label = sub.get(
                "traceback_label",
                f"{sub.get('cmd')}-{sub.get('line', 0)}")
            lanes.append((sub_label, len(self.code), sub))
            if sub.get("cmd") in ("goto", "goto_map", "label"):
                # direct children: the reference asserts at runtime ("goto is
                # not supported in parallel", :1314/:1335) — host re-raises
                self.emit_park(PARK_HOST_OP, sub)
            else:
                self.lower_task(sub, scope_id, pending_gotos, named_stack,
                                path_prefix=full_path)
            self.emit(isa.OP_THREAD_END, base, task=t)
        self._par_depth -= 1
        join_pc = len(self.code)
        self.aux[base + 2] = join_pc              # join pc
        self.aux[base + 3] = loop_lo              # loop ids inside the block:
        self.aux[base + 4] = self.n_loops         # reset on entry (race purge)
        self.needs_threads = max(self.needs_threads, K)
        # per-lane save/resume metadata (keyed by join pc — unique, and
        # available at runtime via VMInstance.par_join): lane subtask
        # labels + entry pcs + source dicts, so export can emit the
        # reference's per-lane `order_index/<path>` cursors and load can
        # re-seed lane tpc from them (PARITY divergence 6)
        self.par_blocks[join_pc] = {
            "path": full_path, "mode": mode, "begin_pc": begin_pc,
            "aux": base, "lanes": lanes,
        }


class _HostOnly(Exception):
    pass


def compile_program(program: dict) -> CompiledProgram:
    """Lower a validated program (with traceback labels attached)."""
    b = _Builder(program)
    try:
        # top-level scope mirrors lower_task_list but tracks order_index
        tasks = program["order"]
        scope_id = b.n_scopes
        b.n_scopes += 1
        label_pcs: dict[str, int] = {}
        pending: list[tuple[int, str]] = []
        top_pcs: list[int] = []
        for i, task in enumerate(tasks):
            b._cur_order_index = i + 1
            top_pcs.append(len(b.code))
            if task.get("cmd") == "label":
                label_pcs[task["name"]] = len(b.code)
                continue
            b.lower_task(task, scope_id, pending, ())
        b.block_task_pcs[""] = top_pcs
        b._cur_order_index = len(tasks) + 1
        b.emit(isa.OP_HALT)
        for pc, name in pending:
            if name == "CONTINUE":
                continue
            if name not in label_pcs:
                b.code[pc][0] = isa.OP_PARK
                b.code[pc][1] = PARK_HOST_OP
                continue
            b.code[pc][1] = label_pcs[name]
        b.register_labels(scope_id, label_pcs)
        host_only, reason = False, ""
    except _HostOnly as e:
        host_only, reason = True, str(e)

    code = np.asarray(b.code if not host_only else [[isa.OP_HALT, 0, 0, 0]],
                      np.int32)
    return CompiledProgram(
        code=code,
        aux=np.asarray(b.aux or [0], np.int32),
        strtab=np.frombuffer(bytes(b.strbytes) or b"\x00", np.uint8).copy(),
        labels=np.asarray(b.labels or np.zeros((0, 5)), np.int32).reshape(-1, 5),
        source_tasks=b.source_tasks,
        order_index_of=b.order_index_of,
        scope_of=b.scope_of,
        label_names=b.label_names,
        host_only=host_only,
        host_only_reason=reason,
        n_loops=max(b.n_loops, 1),
        program=program,
        max_list_literal=b.max_list_literal,
        block_task_pcs=b.block_task_pcs,
        block_loop_id=b.block_loop_id,
        needs_threads=b.needs_threads,
        par_blocks=b.par_blocks,
    )

"""Turbo planner: lower a compiled program to trace-time instruction IR.

The turbo engine (vm/turbo.py) is the fast device path: ONE Pallas kernel
runs K VM steps per launch, dispatching with ``lax.switch`` over the *program
counter* — each branch is the instruction at that pc, specialized at trace
time. That specialization is what this module computes:

* **static insert slots** — every key the program can ever define is
  enumerated here and assigned a fixed slot index, so runtime lookups are
  static array indices (no hashing, no search). The reference's
  ``state['inserts']`` dict (interpolation_engine.py:426-467) becomes a
  compile-time register file.
* **segmented templates** — interpolation templates are parsed once, at plan
  time, into literal byte spans and slot holes (the innermost-first scan of
  interpolation_engine.py:516-535 runs here, on static text, not on device).
* **decomposed wildcard patterns** — goto_map keys (``interpolation_engine
  .py:1689-1711``) compile to exact/prefix/suffix byte comparisons.

Anything not expressible parks: either per-instruction (``IPark`` — the host
ring executes the original task exactly and resumes) or per-program
(``NotTurbo`` — the driver falls back to the general lax.switch VM, which is
semantically total). The turbo engine therefore never approximates: device
semantics equal host semantics or the lane PARKs.

Eligibility (NotTurbo) is about *state shape*: every key that can ever
persist in ``state['inserts']`` must be statically known and hold an
int/str/flat-list value that fits the slot byte widths, because parked
lanes are decoded/encoded through the static slot table. Lists (element
pools), literal and dynamic ``for`` loops, and in-kernel parallel thread
lanes are native since round 3; dynamic output names, dict values, and
inserts-dir fallbacks stay on the general engine.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

from ..vm import isa
from ..vm.config import PARK_AWAIT_INSERT, PARK_HOST_OP
from .lower import CompiledProgram
from .math_rpn import compile_math_rpn

INSERT_START = "{"
INSERT_STOP = "}"
ESCAPE = "\\"

MAX_SLOTS = 64
MAX_INSTRS = 192
MAX_LIST_LIT = 16   # largest literal list planned natively

# characters allowed in non-star pattern text. The reference re.escape()s
# everything except '*' (interpolation_engine.py:553-567 via the '〠'
# placeholder; core/wildcard.py preserves that), so metacharacters ARE
# literal — this set is conservative anyway: anything outside it (multi-byte
# utf-8, control chars, braces) keeps the host/general path, where matching
# goes through Python re and is exact by construction.
_SAFE_PATTERN_CHARS = set(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789"
    " _-,:;!@#~'\"<>/&=%`"
)


class NotTurbo(Exception):
    """Program shape the turbo engine cannot hold; use the general VM."""


# ---------------------------------------------------------------------------
# instruction IR (consumed by vm/turbo.py at trace time)
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Lit:
    data: bytes


@dataclass(frozen=True)
class Hole:
    slot: int


Segment = Union[Lit, Hole]


@dataclass(frozen=True)
class IHalt:
    pass


@dataclass(frozen=True)
class INop:
    """pc+1 tick (sleep runs as a zero-time tick, like the general VM)."""


@dataclass(frozen=True)
class IGoto:
    target: int


@dataclass(frozen=True)
class IPark:
    """Blocking/host-serviced leaf op: lane parks, ring executes the source
    task exactly, resume continues at pc+1 (or the serviced goto target).

    await_slot >= 0 (literal-name ``await_insert`` only): the kernel checks
    the slot IN-KERNEL and only parks when it is empty. The reference's
    await is ``while name not in inserts: await asyncio.sleep(0.05)``
    (interpolation_engine.py:1572-1574) — a present key means NO yield, so
    the lane's slice continues synchronously (it can even win a race before
    the event loop ever processes a cancel); an absent key means the lane
    is suspended at the sleep, where a later race cancellation ALWAYS lands
    (CancelledError interrupts the sleep even if the key has appeared
    since). Checking at slice time on device reproduces both exactly."""
    kind: int
    await_slot: int = -1


@dataclass(frozen=True)
class IClear:
    pass


@dataclass(frozen=True)
class ISet:
    """set / specialized value producer. src is one of:
    ('int', v) | ('str', bytes) | ('copy', slot) | ('tmpl', tuple[Segment])."""
    out_slot: int
    src: tuple


@dataclass(frozen=True)
class IMath:
    """Unrolled RPN over int slots. ops: ('const', v) | ('slot', s) |
    ('add'|'sub'|'mul'|'div'|'mod'|'neg'|'sign'|'min2'|'max2',)."""
    out_slot: int
    ops: tuple


@dataclass(frozen=True)
class IPrint:
    """Append template to the output buffer. Static segments are already
    unescaped (print-time unescape of interpolation_engine.py:1669-1671);
    hole values containing an escaped brace park for host unescaping."""
    tmpl: tuple


@dataclass(frozen=True)
class IGotoMap:
    """entries: ((pattern, target_pc), ...) in program order; pattern is
    ('exact', bytes) | ('prefix', bytes) | ('suffix', bytes) |
    ('affix', pre, suf) | ('any',). null_pc handles interpolation misses."""
    tmpl: tuple
    entries: tuple
    null_pc: Optional[int]


@dataclass(frozen=True)
class IDelete:
    """delete/delete_except with static wildcards: the matching slot set is
    computed here, against the full static key universe."""
    slots: tuple


@dataclass(frozen=True)
class IForHead:
    """for head over static literal lists: entering sets counter:=1; each
    visit writes the loop-var slots with element counter-1 of each list;
    counter > n exits (counter:=0, jump exit_pc). Matches the general
    engine's OP_FOR_HEAD (vm/step.py h_for_head)."""
    loop_id: int             # compiled loop index (register col via _Cols)
    n: int                   # static trip count
    exit_pc: int
    pairs: tuple             # ((slot, elems), ...); elems of
    #                          ('int', v) | ('str', bytes)


@dataclass(frozen=True)
class IForNext:
    loop_id: int
    head_pc: int


@dataclass(frozen=True)
class IForHeadDyn:
    """for head over dynamic list slots (``name_list_map: {x: '{lst}'}``).
    The host snapshots the lists at entry (core/executor.py ``for`` case);
    natively we re-read per visit, which is equal ONLY because the planner
    rejects bodies that write any looped slot (those park the head — the
    ring runs the whole loop exactly). pairs: ((var_slot, list_slot), ...);
    lists of differing length park (host raises the exact assert)."""
    loop_id: int
    exit_pc: int
    pairs: tuple


# item sources (shared by ISet/IListAppend/IListRemove/IListNew elements):
# ('int', v) | ('str', bytes) | ('copy', slot) | ('tmpl', segments)

@dataclass(frozen=True)
class IListNew:
    """set of a literal list: elements are item sources."""
    out_slot: int
    elems: tuple


@dataclass(frozen=True)
class IListAppend:
    out_slot: int
    src_slot: int
    item: tuple


@dataclass(frozen=True)
class IListRemove:
    out_slot: int
    src_slot: int
    item: tuple


@dataclass(frozen=True)
class IListIndex:
    """1-based element read (negatives from the end). index is
    ('const', v) | ('copy', slot) | ('tmpl', segs) — string forms go
    through int() on the host, so the device accepts clean decimals only
    and parks the rest (interpolation_engine.py:1523-1535)."""
    out_slot: int
    src_slot: int
    index: tuple


@dataclass(frozen=True)
class IListSlice:
    """1-based right-inclusive slice; bounds are ('const', v) or
    ('rpn', ops) (math strings, interpolation_engine.py:1537-1556)."""
    out_slot: int
    src_slot: int
    frm: tuple
    to: tuple


@dataclass(frozen=True)
class IListJoin:
    """before + between.join(list) + after → str slot. Non-str elements
    TypeError on the host — the device parks them."""
    out_slot: int
    src_slot: int
    before: tuple     # template segments
    between: tuple
    after: tuple


@dataclass(frozen=True)
class IListConcat:
    """Flatten list slots (``lists: ['{a}', '{b}']`` of simple keys)."""
    out_slot: int
    src_slots: tuple


@dataclass(frozen=True)
class IParBegin:
    """parallel_wait/race entry: spawn K pc lanes (vm/step.py h_par_begin
    twin). Everything static from the compiler's aux record."""
    mode: int         # 1 = wait, 2 = race
    k: int
    join_pc: int
    entries: tuple
    loop_lo: int
    loop_hi: int


@dataclass(frozen=True)
class IThreadEnd:
    """Current lane's body completed (vm/step.py h_thread_end twin)."""
    k: int
    join_pc: int


Instr = Union[IHalt, INop, IGoto, IPark, IClear, ISet, IMath, IPrint,
              IGotoMap, IDelete, IForHead, IForNext, IForHeadDyn,
              IListNew, IListAppend, IListRemove, IListIndex, IListSlice,
              IListJoin, IListConcat, IParBegin, IThreadEnd]


@dataclass
class TurboPlan:
    instrs: list
    slot_names: list
    slot_of: dict
    compiled: CompiledProgram
    n_parks: int = 0
    park_kind_of: dict = field(default_factory=dict)  # pc -> ring kind
    slot_kinds: list = field(default_factory=list)    # per-slot value kind
    elem_kinds: dict = field(default_factory=dict)    # list slot -> kind
    needs_threads: int = 0                            # lanes (0 = none)

    @property
    def n_instr(self) -> int:
        return len(self.instrs)

    @property
    def n_slots(self) -> int:
        return len(self.slot_names)

    @property
    def list_slots(self) -> list:
        return [s for s, k in enumerate(self.slot_kinds) if k == K_LIST]


# slot value kinds (a tiny lattice: NONE < INT/STR/LIST < MIX; LIST joined
# with any scalar kind is POLY = not representable). Branch builders use
# them to skip dead paths at trace time: an INT slot never renders its byte
# plane, a STR slot never runs int→decimal, a NONE slot (referenced but
# never produced) is statically missing, a LIST slot owns an element pool.
K_NONE, K_INT, K_STR, K_MIX, K_LIST, K_POLY = \
    "none", "int", "str", "mix", "list", "poly"


def _kind_join(a: str, b: str) -> str:
    if a == b or b == K_NONE:
        return a
    if a == K_NONE:
        return b
    if K_POLY in (a, b) or K_LIST in (a, b):
        return K_POLY
    return K_MIX


# conservative value kind a host-serviced command stores under output_name
_PARK_WRITE_KINDS = {
    "user_input": K_STR,      # stored escaped, always a string
    "user_choice": K_STR,
    "math": K_INT,
    "list_join": K_STR,
    "list_concat": K_LIST,
    "list_append": K_LIST,
    "list_remove": K_LIST,
    "list_slice": K_LIST,
    "random_choice": K_MIX,
    "replace_map": K_MIX,     # int items pass through untouched
    "unescape": K_MIX,
    "set": K_MIX,
}


def _park_write_kind(t: dict):
    """Value kind (or ('edge', src_slot_name)) a host-serviced command
    stores under its output_name — item-aware where the command's output
    shape follows its input (set/unescape/replace_map of a literal list or
    a simple key)."""
    cmd = t.get("cmd")
    if cmd == "chat":
        return K_LIST if (t.get("n_outputs", 1) != 1
                          or "choices_list" in t) else K_STR
    if cmd in ("set", "unescape", "replace_map"):
        item = t.get("item")
        if isinstance(item, list):
            return K_LIST
        if isinstance(item, dict):
            return K_POLY
        if isinstance(item, str) and item.startswith("{") and \
                item.endswith("}") and not any(
                    c in item[1:-1] for c in "{}\\"):
            return ("edge", item[1:-1])
    if cmd == "random_choice":
        lst = t.get("list")
        if isinstance(lst, list) and all(
                isinstance(e, (int, str)) and not isinstance(e, bool)
                for e in lst):
            return K_MIX
        return K_POLY  # could pick a nested list
    return _PARK_WRITE_KINDS.get(cmd, K_MIX)


def _infer_slot_kinds(plan: "TurboPlan") -> list:
    S = plan.n_slots
    kinds = [K_NONE] * S
    copy_edges: list[tuple[int, int]] = []   # (src, dst)

    def join(s: int, k: str):
        kinds[s] = _kind_join(kinds[s], k)

    def item_kind(src: tuple, out_slot: int):
        if src[0] == "int":
            join(out_slot, K_INT)
        elif src[0] == "copy":
            copy_edges.append((src[1], out_slot))
        else:
            join(out_slot, K_STR)

    inserts = plan.compiled.program.get("default_state", {}).get(
        "inserts", {})
    for key, value in inserts.items():
        s = plan.slot_of.get(str(key))
        if s is not None:
            join(s, K_LIST if isinstance(value, list)
                 else K_INT if isinstance(value, int) else K_STR)
    for name, s in plan.slot_of.items():
        if name.startswith("ARG") and name[3:].isdigit():
            join(s, K_STR)   # CLI args are stored escaped

    for pc, ins in enumerate(plan.instrs):
        if isinstance(ins, IMath):
            join(ins.out_slot, K_INT)
        elif isinstance(ins, IForHead):
            for slot, elems in ins.pairs:
                for kind, _v in elems:
                    join(slot, K_INT if kind == "int" else K_STR)
        elif isinstance(ins, IForHeadDyn):
            for var_slot, list_slot in ins.pairs:
                join(var_slot, K_MIX)       # element types unknown
                join(list_slot, K_LIST)
        elif isinstance(ins, ISet):
            if ins.src[0] == "copy":
                copy_edges.append((ins.src[1], ins.out_slot))
            else:
                item_kind(ins.src, ins.out_slot)
        elif isinstance(ins, IListNew):
            join(ins.out_slot, K_LIST)
        elif isinstance(ins, (IListAppend, IListRemove, IListSlice)):
            join(ins.out_slot, K_LIST)
            join(ins.src_slot, K_LIST)
        elif isinstance(ins, IListConcat):
            join(ins.out_slot, K_LIST)
            for s in ins.src_slots:
                join(s, K_LIST)
        elif isinstance(ins, IListIndex):
            join(ins.out_slot, K_MIX)
            join(ins.src_slot, K_LIST)
        elif isinstance(ins, IListJoin):
            join(ins.out_slot, K_STR)
            join(ins.src_slot, K_LIST)
        elif isinstance(ins, IPark):
            task = plan.compiled.source_tasks[pc]
            if task is None:
                continue
            for t in _walk_tasks(task):
                oname = t.get("output_name")
                if isinstance(oname, str):
                    name = _literal_name(oname)
                    s = plan.slot_of.get(name) if name else None
                    if s is not None:
                        k = _park_write_kind(t)
                        if isinstance(k, tuple):   # ('edge', src_name)
                            src = plan.slot_of.get(k[1])
                            if src is not None:
                                copy_edges.append((src, s))
                            else:
                                join(s, K_MIX)
                        else:
                            join(s, k)
                for fname in (t.get("name_list_map") or {}):
                    fs = plan.slot_of.get(str(fname))
                    if fs is not None:
                        join(fs, K_MIX)

    # propagate copies to fixpoint (≤ S rounds; the edge list is tiny)
    for _ in range(S + 1):
        changed = False
        for src, dst in copy_edges:
            merged = _kind_join(kinds[dst], kinds[src])
            if merged != kinds[dst]:
                kinds[dst] = merged
                changed = True
        if not changed:
            break
    if K_POLY in kinds:
        bad = [plan.slot_names[s] for s, k in enumerate(kinds)
               if k == K_POLY]
        raise NotTurbo(f"slots hold both list and scalar values: {bad}")
    plan.elem_kinds = _infer_elem_kinds(plan, kinds)
    return kinds


def _infer_elem_kinds(plan: "TurboPlan", kinds: list) -> dict:
    """Per-list-slot ELEMENT kind (int/str/mix): branch builders skip the
    int→decimal machinery for str-only lists (and vice versa) — the list
    repr/join loops dominate the fattest kernel branches otherwise."""
    ek = {s: K_NONE for s, k in enumerate(kinds) if k == K_LIST}
    edges = []   # (src list slot, dst list slot)

    def join(s, k):
        if s in ek:
            ek[s] = _kind_join(ek[s], k)

    def item_kind(src, slot_kinds):
        if src[0] == "int":
            return K_INT
        if src[0] == "copy":
            k = slot_kinds[src[1]]
            return k if k in (K_INT, K_STR) else K_MIX
        return K_STR

    inserts = plan.compiled.program.get("default_state", {}).get(
        "inserts", {})
    for key, value in inserts.items():
        s = plan.slot_of.get(str(key))
        if s in ek and isinstance(value, list):
            for e in value:
                join(s, K_INT if isinstance(e, int) else K_STR)

    for pc, ins in enumerate(plan.instrs):
        if isinstance(ins, IListNew):
            for src in ins.elems:
                join(ins.out_slot, item_kind(src, kinds))
        elif isinstance(ins, (IListAppend, IListRemove)):
            join(ins.out_slot, item_kind(ins.item, kinds))
            edges.append((ins.src_slot, ins.out_slot))
        elif isinstance(ins, IListSlice):
            edges.append((ins.src_slot, ins.out_slot))
        elif isinstance(ins, IListConcat):
            for s in ins.src_slots:
                edges.append((s, ins.out_slot))
        elif isinstance(ins, ISet) and ins.src[0] == "copy":
            if ins.src[1] in ek and ins.out_slot in ek:
                edges.append((ins.src[1], ins.out_slot))
        elif isinstance(ins, IPark):
            task = plan.compiled.source_tasks[pc]
            if task is None:
                continue
            for t in _walk_tasks(task):
                name = _literal_name(t.get("output_name")) \
                    if isinstance(t.get("output_name"), str) else None
                s = plan.slot_of.get(name) if name else None
                if s in ek:
                    join(s, K_MIX)  # host-serviced write: any elements

    for _ in range(len(ek) + 1):
        changed = False
        for src, dst in edges:
            if src in ek and dst in ek:
                merged = _kind_join(ek[dst], ek[src])
                if merged != ek[dst]:
                    ek[dst] = merged
                    changed = True
        if not changed:
            break
    # NONE (never produced natively) stays conservative
    return {s: (K_MIX if k == K_NONE else k) for s, k in ek.items()}


# ---------------------------------------------------------------------------
# key universe
# ---------------------------------------------------------------------------

def _literal_name(value) -> Optional[str]:
    if isinstance(value, str) and not any(c in value for c in "{}\\"):
        return value
    return None


def _walk_tasks(task):
    yield task
    for key in ("tasks",):
        sub = task.get(key)
        if isinstance(sub, list):
            for t in sub:
                if isinstance(t, dict):
                    yield from _walk_tasks(t)
    item = task.get("item")
    if isinstance(item, dict) and "cmd" in item:
        yield from _walk_tasks(item)


def _collect_keys(program: dict) -> list:
    """All keys that can ever persist in state['inserts'] — or NotTurbo."""
    keys: list[str] = []

    def add(k: str):
        if k not in keys:
            keys.append(k)

    def check_scalar_or_list(v, what: str):
        if isinstance(v, bool):
            raise NotTurbo(f"bool {what}")
        if isinstance(v, (int, str)):
            return
        if isinstance(v, list):
            for e in v:
                if isinstance(e, bool) or not isinstance(e, (int, str)):
                    raise NotTurbo(f"nested/non-scalar element in {what}")
            return
        raise NotTurbo(f"unsupported {what} type {type(v).__name__}")

    inserts = program.get("default_state", {}).get("inserts", {})
    for k, v in inserts.items():
        check_scalar_or_list(v, f"default insert {k!r}")
        add(str(k))

    roots = list(program.get("order", []))
    for sub in (program.get("named_tasks") or {}).values():
        if isinstance(sub, dict):
            roots.append(sub)
    for root in roots:
        if not isinstance(root, dict):
            raise NotTurbo("dynamic task list")
        for t in _walk_tasks(root):
            cmd = t.get("cmd")
            if cmd == "for":
                # name_list_map over literal int/str lists or simple keys
                # of list slots; loop-var slots hold scalar elements
                for name, lst in (t.get("name_list_map") or {}).items():
                    if isinstance(lst, str):
                        continue  # dynamic: validated at runtime (parks)
                    if not isinstance(lst, list):
                        raise NotTurbo("for over a non-list")
                    check_scalar_or_list(lst, "for list")
            if cmd in ("set", "replace_map", "unescape") and \
                    isinstance(t.get("item"), dict):
                raise NotTurbo(f"{cmd} of a dict item")
            if "output_name" in t:
                name = _literal_name(t["output_name"])
                if name is None:
                    raise NotTurbo(
                        f"dynamic output_name {t['output_name']!r}")
                add(name)
            if cmd == "for":
                for name in (t.get("name_list_map") or {}):
                    add(str(name))
    return keys


# ---------------------------------------------------------------------------
# template parsing (static text → segments)
# ---------------------------------------------------------------------------

def _parse_template(text: str, slot_for) -> Optional[tuple]:
    """Split static text into Lit/Hole segments, or None when the template
    needs the general interpolation kernel (escapes, nesting, indirection,
    special time keys)."""
    if ESCAPE in text:
        return None
    segments: list[Segment] = []
    pos = 0
    lit_start = 0
    n = len(text)
    while pos < n:
        c = text[pos]
        if c == INSERT_STOP:
            return None  # unbalanced; host raises the exact assertion
        if c != INSERT_START:
            pos += 1
            continue
        close = text.find(INSERT_STOP, pos + 1)
        if close == -1:
            return None
        key = text[pos + 1:close]
        if not key or INSERT_START in key or INSERT_STOP in key:
            return None  # nested / {{k}/x} indirection / empty key
        if key in ("HH:MM", "HH:MM:SS"):
            return None  # special time keys stay on the host path
        # ARGn keys are ordinary slots (populated at batch creation); a
        # missing ARGn parks and the host raises its tailored error
        if pos > lit_start:
            segments.append(Lit(text[lit_start:pos].encode("utf-8")))
        slot = slot_for(key)
        if slot is None:
            return None
        segments.append(Hole(slot))
        pos = close + 1
        lit_start = pos
    if lit_start < n:
        segments.append(Lit(text[lit_start:n].encode("utf-8")))
    return tuple(segments)


def _unescape_static(segments: tuple) -> tuple:
    """Print-time unescape of literal spans (escapes were excluded above, so
    this is currently the identity — kept for when templates with static
    escapes are admitted)."""
    return tuple(
        Lit(s.data.replace(b"\\{", b"{").replace(b"\\}", b"}"))
        if isinstance(s, Lit) else s
        for s in segments)


def _compile_pattern(key: str) -> Optional[tuple]:
    if key == "*":
        return ("any",)
    if any(c not in _SAFE_PATTERN_CHARS and c != "*" for c in key):
        return None
    n_star = key.count("*")
    if n_star == 0:
        return ("exact", key.encode("utf-8"))
    if n_star == 1:
        pre, suf = key.split("*")
        if not suf:
            return ("prefix", pre.encode("utf-8"))
        if not pre:
            return ("suffix", suf.encode("utf-8"))
        return ("affix", pre.encode("utf-8"), suf.encode("utf-8"))
    return None  # multi-star patterns keep the general/host path


# ---------------------------------------------------------------------------
# planner
# ---------------------------------------------------------------------------

def plan_turbo(compiled: CompiledProgram) -> TurboPlan:
    """Lower a compiled program to turbo IR, or raise NotTurbo."""
    if compiled.host_only:
        raise NotTurbo(f"host_only: {compiled.host_only_reason}")
    if compiled.n_instr > MAX_INSTRS:
        raise NotTurbo(f"{compiled.n_instr} instructions > {MAX_INSTRS}")

    program = compiled.program
    keys = _collect_keys(program)

    slot_of: dict[str, int] = {}
    slot_names: list[str] = []

    def intern_slot(key: str) -> Optional[int]:
        if key in slot_of:
            return slot_of[key]
        if len(slot_names) >= MAX_SLOTS:
            raise NotTurbo("too many insert keys for the slot file")
        slot_of[key] = len(slot_names)
        slot_names.append(key)
        return slot_of[key]

    for k in keys:
        intern_slot(k)

    def slot_for(key: str) -> Optional[int]:
        """Slot for a key referenced in a template. ARGn keys are admitted
        on demand (they're populated at batch creation); any other key not
        in the persistent universe can never be defined, and still gets a
        slot — it just stays empty forever, which IS the reference's
        missing-key behavior."""
        return intern_slot(key)

    plan = TurboPlan(instrs=[], slot_names=slot_names, slot_of=slot_of,
                     compiled=compiled)

    def park(pc: int, kind: int = PARK_HOST_OP) -> IPark:
        plan.n_parks += 1
        plan.park_kind_of[pc] = kind
        return IPark(kind)

    code = compiled.code
    for pc in range(compiled.n_instr):
        op, a, b, c = (int(v) for v in code[pc])
        task = compiled.source_tasks[pc]
        plan.instrs.append(_plan_instr(
            plan, compiled, pc, op, a, b, task, slot_for, park))

    # post-pass: a dynamic for-loop is only equal to the host's
    # snapshot-at-entry semantics when its body can't write the looped
    # slots; otherwise the head parks and the ring runs the whole loop
    for pc, ins in enumerate(plan.instrs):
        if not isinstance(ins, IForHeadDyn):
            continue
        looped = {ls for _v, ls in ins.pairs}
        body_writes = set()
        for bpc in range(pc + 1, ins.exit_pc):
            body_writes |= _written_slots(plan, bpc)
        if looped & body_writes:
            plan.instrs[pc] = park(pc)

    plan.needs_threads = compiled.needs_threads
    plan.slot_kinds = _infer_slot_kinds(plan)

    # post-pass: list_join's before/between/after are interpolated by
    # recursive_interpolate, so a SINGLE-hole template passes the RAW
    # value through — a non-str value TypeErrors on the host
    # (int.join/str+int). Only str-kind slots are safe to render.
    for pc, ins in enumerate(plan.instrs):
        if isinstance(ins, IListJoin):
            for part in (ins.before, ins.between, ins.after):
                if len(part) == 1 and isinstance(part[0], Hole) and \
                        plan.slot_kinds[part[0].slot] != K_STR:
                    plan.instrs[pc] = park(pc)
                    break
    return plan


def _written_slots(plan: TurboPlan, pc: int) -> set:
    """Slots instruction `pc` can write (conservative, for the dyn-for
    snapshot check)."""
    ins = plan.instrs[pc]
    if isinstance(ins, (ISet, IMath, IListNew, IListAppend, IListRemove,
                        IListIndex, IListSlice, IListJoin, IListConcat)):
        return {ins.out_slot}
    if isinstance(ins, IForHead):
        return {s for s, _e in ins.pairs}
    if isinstance(ins, IForHeadDyn):
        return {v for v, _l in ins.pairs}
    if isinstance(ins, IDelete):
        return set(ins.slots)
    if isinstance(ins, IPark):
        task = plan.compiled.source_tasks[pc]
        out = set()
        if task is None:
            return set(range(plan.n_slots))  # unknown: assume everything
        for t in _walk_tasks(task):
            name = t.get("output_name")
            lit = _literal_name(name) if isinstance(name, str) else None
            if isinstance(name, str) and lit is None:
                return set(range(plan.n_slots))  # dynamic name
            if lit is not None and lit in plan.slot_of:
                out.add(plan.slot_of[lit])
            for fname in (t.get("name_list_map") or {}):
                if str(fname) in plan.slot_of:
                    out.add(plan.slot_of[str(fname)])
            if t.get("cmd") in ("delete", "delete_except"):
                return set(range(plan.n_slots))
        return out
    return set()


def _plan_item(item, slot_for) -> Optional[tuple]:
    """Lower a scalar item (set/list element) to an item source, or None
    when only the host path reproduces it (dicts, bools, escapes...)."""
    if isinstance(item, bool):
        return None
    if isinstance(item, int):
        return ("int", item)
    if not isinstance(item, str):
        return None
    tmpl = _parse_template(item, slot_for)
    if tmpl is None:
        return None
    if len(tmpl) == 0:
        return ("str", b"")
    if len(tmpl) == 1 and isinstance(tmpl[0], Hole):
        return ("copy", tmpl[0].slot)
    if len(tmpl) == 1 and isinstance(tmpl[0], Lit):
        return ("str", tmpl[0].data)
    return ("tmpl", tmpl)


def _plan_list_src(field, slot_for) -> Optional[int]:
    """The ``list`` field of a list op: a simple key naming a list slot.
    (Literal lists / nested templates keep the host path.)"""
    if not isinstance(field, str):
        return None
    tmpl = _parse_template(field, slot_for)
    if tmpl is None or len(tmpl) != 1 or not isinstance(tmpl[0], Hole):
        return None
    return tmpl[0].slot


def _plan_bound(value, slot_for) -> Optional[tuple]:
    """list_slice bound: int literal or math string (host eval_math's
    strings — interpolation_engine.py:1543-1554)."""
    if isinstance(value, bool):
        return None
    if isinstance(value, int):
        return ("const", value)
    if isinstance(value, str):
        ops = _plan_math(value, slot_for)
        if ops is None:
            return None
        return ("rpn", ops)
    return None


def _plan_instr(plan, compiled, pc, op, a, b, task, slot_for, park):
    if op == isa.OP_HALT:
        return IHalt()
    if op == isa.OP_NOP:
        return INop()
    if op == isa.OP_SLEEP:
        return INop()
    if op == isa.OP_CLEAR:
        return IClear()
    if op == isa.OP_GOTO:
        return IGoto(a)
    if op == isa.OP_PARK:
        if a == PARK_AWAIT_INSERT and task is not None:
            name = _literal_name(task.get("name"))
            slot = slot_for(name) if name is not None else None
            if slot is not None:
                park(pc, a)  # registers n_parks/park_kind_of bookkeeping
                return IPark(a, await_slot=slot)
        return park(pc, a)

    if op in (isa.OP_PRINT, isa.OP_PRINT_LIT):
        text = task.get("text")
        if not isinstance(text, str):
            return park(pc)  # int text AttributeErrors on host (quirk)
        tmpl = _parse_template(text, slot_for)
        if tmpl is None:
            return park(pc)
        if len(tmpl) == 1 and isinstance(tmpl[0], Hole):
            # print of a simple key: non-string values crash in the
            # reference; the device renders strings and parks the rest —
            # IPrint's runtime type check handles it
            pass
        return IPrint(_unescape_static(tmpl))

    if op in (isa.OP_SET, isa.OP_SET_LN):
        name = _literal_name(task.get("output_name"))
        if name is None:
            return park(pc)
        out_slot = slot_for(name)
        item = task.get("item")
        if isinstance(item, list):
            if len(item) > MAX_LIST_LIT:
                return park(pc)
            elems = tuple(_plan_item(e, slot_for) for e in item)
            if any(e is None for e in elems):
                return park(pc)
            return IListNew(out_slot, elems)
        src = _plan_item(item, slot_for)
        if src is None:
            return park(pc)
        return ISet(out_slot, src)

    if op == isa.OP_LIST_APPEND:
        name = _literal_name(task.get("output_name"))
        src_slot = _plan_list_src(task.get("list"), slot_for)
        item = _plan_item(task.get("item"), slot_for)
        if name is None or src_slot is None or item is None:
            return park(pc)
        return IListAppend(slot_for(name), src_slot, item)

    if op == isa.OP_LIST_REMOVE:
        name = _literal_name(task.get("output_name"))
        src_slot = _plan_list_src(task.get("list"), slot_for)
        item = _plan_item(task.get("item"), slot_for)
        if name is None or src_slot is None or item is None:
            return park(pc)
        return IListRemove(slot_for(name), src_slot, item)

    if op == isa.OP_LIST_INDEX:
        name = _literal_name(task.get("output_name"))
        src_slot = _plan_list_src(task.get("list"), slot_for)
        if name is None or src_slot is None:
            return park(pc)
        index = task.get("index")
        idx = _plan_item(index, slot_for)
        if idx is None or idx[0] == "str":
            # literal strings go through int() on the host; keep them there
            # unless they're clean decimals
            if idx is not None and idx[0] == "str":
                try:
                    return IListIndex(slot_for(name), src_slot,
                                      ("const", int(idx[1].decode())))
                except ValueError:
                    pass
            return park(pc)
        if idx[0] == "int":
            idx = ("const", idx[1])
        return IListIndex(slot_for(name), src_slot, idx)

    if op == isa.OP_LIST_SLICE:
        name = _literal_name(task.get("output_name"))
        src_slot = _plan_list_src(task.get("list"), slot_for)
        frm = _plan_bound(task.get("from_index"), slot_for)
        to = _plan_bound(task.get("to_index"), slot_for)
        if name is None or src_slot is None or frm is None or to is None:
            return park(pc)
        return IListSlice(slot_for(name), src_slot, frm, to)

    if op == isa.OP_LIST_JOIN:
        name = _literal_name(task.get("output_name"))
        src_slot = _plan_list_src(task.get("list"), slot_for)
        parts = []
        for fld in ("before", "between", "after"):
            v = task.get(fld)
            t = _parse_template(v, slot_for) if isinstance(v, str) else None
            parts.append(t)
        if name is None or src_slot is None or any(
                p is None for p in parts):
            return park(pc)
        return IListJoin(slot_for(name), src_slot, *parts)

    if op == isa.OP_LIST_CONCAT:
        name = _literal_name(task.get("output_name"))
        lists = task.get("lists")
        if name is None or not isinstance(lists, list) or not lists:
            return park(pc)
        srcs = tuple(_plan_list_src(v, slot_for) for v in lists)
        if any(s is None for s in srcs):
            return park(pc)
        return IListConcat(slot_for(name), srcs)

    if op in (isa.OP_MATH_RPN, isa.OP_MATH_RPN_LN, isa.OP_MATH):
        name = _literal_name(task.get("output_name"))
        if name is None:
            return park(pc)
        out_slot = slot_for(name)
        ops = _plan_math(task.get("input"), slot_for)
        if ops is None:
            return park(pc)
        return IMath(out_slot, ops)

    if op in (isa.OP_GOTO_MAP, isa.OP_GOTO_MAP_LIT):
        return _plan_goto_map(plan, compiled, pc, task, slot_for, park)

    if op in (isa.OP_DELETE, isa.OP_DELETE_EXCEPT):
        wildcards = task.get("wildcards")
        if not isinstance(wildcards, list) or any(
                not isinstance(w, str) for w in wildcards):
            return park(pc)
        pats = [_compile_pattern(w) for w in wildcards]
        if any(p is None for p in pats):
            return park(pc)
        matched = set()
        for s, key in enumerate(plan.slot_names):
            hit = any(_match_static(p, key) for p in pats)
            if op == isa.OP_DELETE and hit:
                matched.add(s)
            if op == isa.OP_DELETE_EXCEPT and not hit:
                matched.add(s)
        return IDelete(tuple(sorted(matched)))

    # replace_map, unescape, random_choice, list ops, for — exact host
    # execution per lane (leaf tasks resume at pc+1)
    if op == isa.OP_FOR_HEAD:
        # static literal loops and loops over list slots run natively;
        # anything else parks — the host then executes the WHOLE loop and
        # the ring resumes at the exit pc (vm/turbo.py service handles
        # for-head parks)
        loop_id = int(compiled.aux[a])
        exit_pc = int(compiled.aux[a + 1])
        nlm = (task or {}).get("name_list_map") or {}
        pairs = []
        dyn_pairs = []
        lengths = set()

        def plan_pair(name, lst):
            if not isinstance(name, str) or "{" in name or \
                    ESCAPE in name:
                return False
            if isinstance(lst, str):
                src = _plan_list_src(lst, slot_for)
                if src is None:
                    return False
                dyn_pairs.append((slot_for(name), src))
                return True
            if not isinstance(lst, list):
                return False
            if any(isinstance(e, bool) or not isinstance(e, (int, str))
                   for e in lst):
                return False
            elems = tuple(("int", e) if isinstance(e, int)
                          else ("str", e.encode("utf-8")) for e in lst)
            pairs.append((slot_for(name), elems))
            lengths.add(len(lst))
            return True

        supported = bool(nlm) and all(
            plan_pair(name, lst) for name, lst in nlm.items())
        if not supported:
            return park(pc)
        if dyn_pairs:
            if pairs:
                return park(pc)   # mixed literal+dynamic: host path
            # snapshot semantics: the host captures the lists at entry —
            # equal to per-visit re-reads ONLY when the body can't write
            # the looped slots (checked in the plan post-pass)
            return IForHeadDyn(loop_id=loop_id, exit_pc=exit_pc,
                               pairs=tuple(dyn_pairs))
        if len(lengths) > 1:
            # differing lengths: the reference raises at runtime — the
            # exact AssertionError comes from the host executor
            return park(pc)
        n = lengths.pop() if lengths else 0
        if n == 0:
            return IGoto(exit_pc)
        if n > 32 or n * max(len(pairs), 1) > 96:
            return park(pc)  # branch would dwarf the kernel
        return IForHead(loop_id=loop_id, n=n, exit_pc=exit_pc,
                        pairs=tuple(pairs))
    if op == isa.OP_FOR_NEXT:
        return IForNext(loop_id=b, head_pc=a)
    if op == isa.OP_PAR_BEGIN:
        aux = compiled.aux
        mode, k = int(aux[a]), int(aux[a + 1])
        return IParBegin(mode=mode, k=k, join_pc=int(aux[a + 2]),
                         entries=tuple(int(aux[a + 5 + j])
                                       for j in range(k)),
                         loop_lo=int(aux[a + 3]), loop_hi=int(aux[a + 4]))
    if op == isa.OP_THREAD_END:
        aux = compiled.aux
        return IThreadEnd(k=int(aux[a + 1]), join_pc=int(aux[a + 2]))
    return park(pc)


def _match_static(pattern: tuple, key: str) -> bool:
    """Static decomposed-pattern match, incl. the reference's end-anchor
    quirk: ``$`` also matches just before one trailing newline (re.match
    DOTALL, core/wildcard.py). Pattern bytes never contain '\\n' (the safe
    charset excludes it), so only the subject needs the trimmed retry."""
    data = key.encode("utf-8")
    if _match_static_strict(pattern, data):
        return True
    return data.endswith(b"\n") and _match_static_strict(pattern, data[:-1])


def _match_static_strict(pattern: tuple, data: bytes) -> bool:
    kind = pattern[0]
    if kind == "any":
        return True
    if kind == "exact":
        return data == pattern[1]
    if kind == "prefix":
        return data.startswith(pattern[1])
    if kind == "suffix":
        return data.endswith(pattern[1])
    pre, suf = pattern[1], pattern[2]
    return (len(data) >= len(pre) + len(suf)
            and data.startswith(pre) and data.endswith(suf))


def _plan_math(text, slot_for) -> Optional[tuple]:
    """Reuse the RPN front-end with a recording intern; holes become slots."""
    if not isinstance(text, str):
        return None
    recorded: list[str] = []

    def intern(s: str):
        recorded.append(s)
        return len(recorded) - 1, len(s)

    rpn = compile_math_rpn(text, intern)
    if rpn is None:
        return None
    n = rpn[0]
    ops: list[tuple] = []
    for i in range(n):
        kind, x, y = rpn[1 + 3 * i:4 + 3 * i]
        if kind == isa.RPN_CONST:
            ops.append(("const", x))
        elif kind == isa.RPN_HOLE:
            slot = slot_for(recorded[x])
            if slot is None:
                return None
            ops.append(("slot", slot))
        elif kind == isa.RPN_LENGTH:
            slot = slot_for(recorded[x])
            if slot is None:
                return None
            ops.append(("length", slot))
        elif kind in (isa.RPN_MINLIST, isa.RPN_MAXLIST):
            return None  # min/max over a list value: host path
        else:
            name = {isa.RPN_ADD: "add", isa.RPN_SUB: "sub",
                    isa.RPN_MUL: "mul", isa.RPN_DIV: "div",
                    isa.RPN_MOD: "mod", isa.RPN_NEG: "neg",
                    isa.RPN_SIGN: "sign", isa.RPN_MIN2: "min2",
                    isa.RPN_MAX2: "max2"}.get(kind)
            if name is None:
                return None
            ops.append((name,))
    return tuple(ops)


def _plan_goto_map(plan, compiled, pc, task, slot_for, park):
    text = task.get("text")
    if not isinstance(text, str):
        return park(pc)
    tmpl = _parse_template(text, slot_for)
    if tmpl is None:
        return park(pc)
    scope = compiled.scope_of[pc]
    entries = []
    null_pc = None
    for d in task.get("target_maps", []):
        key = next(iter(d.keys()))
        target = next(iter(d.values()))
        if not isinstance(key, str) or not isinstance(target, str):
            return park(pc)
        if any(ch in key or ch in target for ch in "{}\\"):
            return park(pc)  # interpolated keys/targets: host path
        if target == "CONTINUE":
            tgt_pc = pc + 1
        else:
            tgt_pc = compiled.label_names.get((scope, target))
            if tgt_pc is None:
                return park(pc)  # host raises the exact missing-label error
        pat = _compile_pattern(key)
        if pat is None:
            return park(pc)
        if key == "NULL" and null_pc is None:
            null_pc = tgt_pc
        entries.append((pat, tgt_pc))
    return IGotoMap(tmpl, tuple(entries), null_pc)

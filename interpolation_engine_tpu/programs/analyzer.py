"""Extended static analyzer — diagnostics beyond the hard validator.

Capability parity with the reference's native analyzer
(rust-project/src/analyzer.rs:15-830): non-fatal diagnostics collected per
task with label and line, covering

* per-command required-field presence and field *type* checks, with
  simple-interpolation resolution against the default inserts (a field
  holding ``'{k}'`` type-checks against ``default_state.inserts.k``);
* scope-aware label collection: literal ``goto`` / ``goto_map`` targets
  must resolve within their own task list (labels are per-scope);
* literal ``goto_map`` matching — a brace-free text must match some
  literal key, and the matched target must exist;
* malformed interpolation (unbalanced braces, empty ``{}`` keys) in text
  fields and map keys/values;
* static list bounds for literal ``list_index``/``list_slice`` indices
  (1-based, negative-aware — analyzer.rs:819-830);
* ``for`` literal list length equality and value shape;
* ``run_task`` unknown-task references and unknown ``cmd`` names;
* ``speak``/``chat`` ``voice_path`` existence (and not-a-directory).

Run after :func:`validate_program`; returns a list of diagnostics the CLI
prints with ``--analyze``. These never reject a program (load-parity with
the Python reference is owned by the validator; the Rust reference's
analyzer rejects, which is stricter than its own Python sibling accepts).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional

from ..core.context import CTX
from ..core.interp import get_simple_insertkey
from ..core.wildcard import is_wildcard_match


@dataclass
class Diagnostic:
    message: str
    label: str = ""
    line: Optional[int] = None

    def __str__(self):
        loc = f" [{self.label}" + (f", line {self.line}]" if self.line else "]")
        return f"analyzer: {self.message}{loc}"


# ---------------------------------------------------------------------------
# brace scanning (analyzer.rs:727-793)
# ---------------------------------------------------------------------------

def _scan_braces(s: str) -> tuple[bool, bool]:
    """(balanced, has_unescaped) — escape-aware depth scan."""
    depth = 0
    escaped = False
    has_unescaped = False
    balanced = True
    for ch in s:
        if escaped:
            escaped = False
            continue
        if ch == "\\":
            escaped = True
            continue
        if ch == "{":
            has_unescaped = True
            depth += 1
        elif ch == "}":
            has_unescaped = True
            if depth == 0:
                balanced = False
            else:
                depth -= 1
    if depth != 0:
        balanced = False
    return balanced, has_unescaped


def _is_literal_no_braces(s: str) -> bool:
    balanced, has_unescaped = _scan_braces(s)
    return balanced and not has_unescaped


def _extract_keys(s: str) -> list[str]:
    """Top-level unescaped {…} key texts (for the empty-key diagnostic)."""
    keys = []
    depth = 0
    escaped = False
    start = -1
    for i, ch in enumerate(s):
        if escaped:
            escaped = False
            continue
        if ch == "\\":
            escaped = True
            continue
        if ch == "{":
            if depth == 0:
                start = i
            depth += 1
        elif ch == "}" and depth > 0:
            depth -= 1
            if depth == 0 and start >= 0:
                keys.append(s[start + 1:i])
    return keys


# ---------------------------------------------------------------------------
# analyzer core
# ---------------------------------------------------------------------------

class _Analyzer:
    def __init__(self, program: dict):
        self.program = program
        self.inserts = program["default_state"]["inserts"]
        self.named = set(program.get("named_tasks", {}))
        self.diags: list[Diagnostic] = []

    # ---- plumbing -----------------------------------------------------------

    def add(self, task, message: str):
        label = task.get("traceback_label")
        self.diags.append(Diagnostic(
            message=message,
            label=label if isinstance(label, str) else "",
            line=task.get("line") if isinstance(task.get("line"), int)
            else None))

    def resolve_simple(self, value):
        """default-insert value behind a simple '{k}' reference, else None
        (ARG-references are runtime-only — analyzer.rs:680-690)."""
        if not isinstance(value, str):
            return None
        key = get_simple_insertkey(value)
        if not key or key.startswith("ARG") or "{" in key:
            return None
        return self.inserts.get(key)

    def is_simple_interp(self, value) -> bool:
        return isinstance(value, str) and bool(get_simple_insertkey(value))

    def static_array(self, value):
        if isinstance(value, list):
            return value
        resolved = self.resolve_simple(value)
        return resolved if isinstance(resolved, list) else None

    # ---- field requirements (analyzer.rs:512-671) --------------------------

    def require_fields(self, task, fields):
        for f in fields:
            if f not in task:
                self.add(task, f"Missing required field '{f}'")

    def _require_type(self, task, field, check, expect: str):
        if field not in task:
            return
        v = task[field]
        if check(v):
            resolved = self.resolve_simple(v)
            if resolved is not None and not check(resolved):
                self.add(task, f"Field '{field}' must be {expect}")
            return
        resolved = self.resolve_simple(v)
        if resolved is not None:
            if not check(resolved):
                self.add(task, f"Field '{field}' must be {expect}")
            return
        if self.is_simple_interp(v):
            return
        self.add(task, f"Field '{field}' must be {expect}")

    def require_string(self, task, field):
        # a direct string passes unless it is a simple reference resolving
        # to a non-string (analyzer.rs:520-540)
        if field not in task:
            return
        v = task[field]
        if isinstance(v, str):
            resolved = self.resolve_simple(v)
            if resolved is not None and not isinstance(resolved, str):
                self.add(task, f"Field '{field}' must be a string")
            return
        self.add(task, f"Field '{field}' must be a string")

    def require_array(self, task, field):
        self._require_type(task, field, lambda v: isinstance(v, list),
                           "an array")

    def require_object(self, task, field):
        self._require_type(task, field, lambda v: isinstance(v, dict),
                           "an object")

    def require_int_or_string(self, task, field):
        self._require_type(
            task, field,
            lambda v: isinstance(v, str) or
            (isinstance(v, int) and not isinstance(v, bool)),
            "an int or string")

    def require_number_or_string(self, task, field):
        self._require_type(
            task, field,
            lambda v: isinstance(v, (str, int, float)) and
            not isinstance(v, bool),
            "a number or string")

    def require_task_array(self, task, field):
        if field not in task:
            return
        v = task[field]
        arr = v if isinstance(v, list) else self.resolve_simple(v)
        if isinstance(arr, list):
            if any(not isinstance(t, dict) for t in arr):
                self.add(task, f"Field '{field}' must be an array of objects")
            return
        if self.is_simple_interp(v):
            return
        self.add(task, f"Field '{field}' must be an array of objects")

    def ensure_balanced(self, task, field: str, s):
        if not isinstance(s, str):
            return
        balanced, _ = _scan_braces(s)
        if not balanced:
            self.add(task, f"Field '{field}' has malformed interpolation "
                           f"(uneven braces)")
        if any(k == "" for k in _extract_keys(s)):
            self.add(task, f"Field '{field}' contains an empty "
                           f"interpolation key")

    # ---- traversal (analyzer.rs:63-99, labels are per task list) -----------

    def analyze_list(self, tasks: list, scope_name: str):
        labels: set = set()
        for t in tasks:
            if not isinstance(t, dict) or t.get("cmd") != "label":
                continue
            name = t.get("name")
            if not isinstance(name, str):
                self.add(t, "label.name must be a string")
                continue
            if name in labels:
                self.add(t, f"Label '{name}' is not unique in this task list")
            labels.add(name)
        for t in tasks:
            if not isinstance(t, dict):
                continue
            self.validate_task(t, scope_name, labels)
            subtasks = t.get("tasks")
            if isinstance(subtasks, list):
                subs = [s for s in subtasks if isinstance(s, dict)]
                if subs:
                    self.analyze_list(subs, scope_name)

    # ---- per-command validation (analyzer.rs:101-445) -----------------------

    def validate_task(self, task: dict, scope_name: str, labels: set):
        cmd = task.get("cmd")
        if not isinstance(cmd, str):
            self.add(task, "Task missing 'cmd' string")
            return
        add, rf = self.add, self.require_fields

        if cmd == "print":
            rf(task, ["text"])
            self.require_string(task, "text")
            self.ensure_balanced(task, "text", task.get("text"))
        elif cmd == "clear" or cmd == "show_inserts":
            pass
        elif cmd == "sleep":
            rf(task, ["seconds"])
            self.require_number_or_string(task, "seconds")
        elif cmd in ("set", "unescape"):
            rf(task, ["item", "output_name"])
            self.require_string(task, "output_name")
        elif cmd == "write":
            rf(task, ["item", "path"])
            self.require_string(task, "path")
        elif cmd == "random_choice":
            rf(task, ["list", "output_name"])
            self.require_array(task, "list")
            self.require_string(task, "output_name")
            arr = self.static_array(task.get("list"))
            if arr is not None and not arr:
                add(task, "random_choice list is empty")
        elif cmd == "list_join":
            rf(task, ["list", "before", "between", "after", "output_name"])
            self.require_array(task, "list")
            for f in ("before", "between", "after", "output_name"):
                self.require_string(task, f)
        elif cmd == "list_concat":
            rf(task, ["lists", "output_name"])
            self.require_array(task, "lists")
            self.require_string(task, "output_name")
            arr = self.static_array(task.get("lists"))
            if arr is not None:
                for item in arr:
                    if isinstance(item, list) or self.is_simple_interp(item):
                        continue
                    if isinstance(self.resolve_simple(item), list):
                        continue
                    add(task, "list_concat.lists must contain only arrays "
                              "or simple interpolations")
                    break
        elif cmd in ("list_append", "list_remove"):
            rf(task, ["list", "item", "output_name"])
            self.require_array(task, "list")
            self.require_string(task, "output_name")
        elif cmd == "list_index":
            rf(task, ["list", "index", "output_name"])
            self.require_array(task, "list")
            self.require_int_or_string(task, "index")
            self.require_string(task, "output_name")
            arr = self.static_array(task.get("list"))
            idx = task.get("index")
            if arr is not None and isinstance(idx, int) and \
                    not isinstance(idx, bool):
                if idx == 0:
                    add(task, "list_index index 0 is invalid (1-based)")
                elif self._oob(idx, len(arr)):
                    add(task, "list_index index out of bounds")
        elif cmd == "list_slice":
            rf(task, ["list", "from_index", "to_index", "output_name"])
            self.require_array(task, "list")
            self.require_int_or_string(task, "from_index")
            self.require_int_or_string(task, "to_index")
            self.require_string(task, "output_name")
            arr = self.static_array(task.get("list"))
            if arr is not None:
                fi = task.get("from_index")
                if isinstance(fi, int) and not isinstance(fi, bool):
                    if fi == 0:
                        add(task, "list_slice from_index 0 is invalid "
                                  "(1-based)")
                    elif self._oob(fi, len(arr)):
                        add(task, "list_slice from_index out of bounds")
                ti = task.get("to_index")
                if isinstance(ti, int) and not isinstance(ti, bool) and \
                        ti != 0 and self._oob(ti, len(arr)):
                    add(task, "list_slice to_index out of bounds")
        elif cmd == "user_input":
            rf(task, ["prompt", "output_name"])
            self.require_string(task, "prompt")
            self.require_string(task, "output_name")
        elif cmd == "user_choice":
            rf(task, ["list", "description", "output_name"])
            self.require_array(task, "list")
            self.require_string(task, "description")
            self.require_string(task, "output_name")
        elif cmd == "await_insert":
            rf(task, ["name"])
            self.require_string(task, "name")
        elif cmd == "label":
            rf(task, ["name"])
            self.require_string(task, "name")
        elif cmd == "goto":
            rf(task, ["name"])
            self.require_string(task, "name")
            target = task.get("name")
            if isinstance(target, str) and _is_literal_no_braces(target) \
                    and target != "CONTINUE" and target not in labels:
                add(task, f"goto target '{target}' not found in {scope_name}")
        elif cmd == "goto_map":
            self._validate_goto_map(task, scope_name, labels)
        elif cmd == "replace_map":
            rf(task, ["item", "output_name", "wildcard_maps"])
            self.require_string(task, "output_name")
            self.require_array(task, "wildcard_maps")
            maps = task.get("wildcard_maps")
            if isinstance(maps, list):
                for entry in maps:
                    if not isinstance(entry, dict):
                        add(task, "wildcard_maps entries must be objects")
                        continue
                    if len(entry) != 1:
                        add(task, "wildcard_maps entries must have 1 key")
                        continue
                    k, v = next(iter(entry.items()))
                    self.ensure_balanced(task, "wildcard_maps key", k)
                    if isinstance(v, str):
                        self.ensure_balanced(task, "wildcard_maps value", v)
                    elif not self.is_simple_interp(v):
                        add(task, "wildcard_maps values must be strings")
            if self._has_null_entry(task, "wildcard_maps"):
                self.ensure_balanced(task, "item", task.get("item"))
        elif cmd == "for":
            self._validate_for(task)
        elif cmd in ("serial", "parallel_wait", "parallel_race"):
            rf(task, ["tasks"])
            self.require_task_array(task, "tasks")
        elif cmd == "run_task":
            rf(task, ["task_name"])
            self.require_string(task, "task_name")
            name = task.get("task_name")
            if isinstance(name, str) and _is_literal_no_braces(name) and \
                    name not in self.named:
                add(task, f"run_task references unknown task '{name}'")
        elif cmd in ("delete", "delete_except"):
            rf(task, ["wildcards"])
            self.require_array(task, "wildcards")
        elif cmd == "math":
            rf(task, ["input", "output_name"])
            self.require_string(task, "input")
            self.require_string(task, "output_name")
        elif cmd == "chat":
            rf(task, ["messages", "output_name"])
            self.require_array(task, "messages")
            self.require_string(task, "output_name")
            self._validate_voice_path(task)
            msgs = self.static_array(task.get("messages"))
            if msgs is not None:
                for msg in msgs:
                    if isinstance(msg, dict) and \
                            isinstance(msg.get("content"), str):
                        self.ensure_balanced(task, "chat.messages.content",
                                             msg["content"])
        elif cmd == "speak":
            rf(task, ["text", "voice_path"])
            self.require_string(task, "text")
            self.require_string(task, "voice_path")
            self._validate_voice_path(task)
        else:
            add(task, f"Unknown cmd '{cmd}'")

        if cmd != "speak" and cmd != "chat" and \
                isinstance(task.get("voice_path"), str):
            self._validate_voice_path(task)

    # ---- command specifics --------------------------------------------------

    def _validate_goto_map(self, task, scope_name: str, labels: set):
        add = self.add
        self.require_fields(task, ["text", "target_maps"])
        self.require_string(task, "text")
        self.require_array(task, "target_maps")
        target_maps = task.get("target_maps")
        if not isinstance(target_maps, list):
            return
        if not target_maps:
            add(task, "goto_map.target_maps must not be empty")
        text = task.get("text")
        self.ensure_balanced(task, "text", text)
        literal_pairs: list[tuple[str, str]] = []
        for entry in target_maps:
            if not isinstance(entry, dict):
                add(task, "target_maps entries must be objects")
                continue
            if len(entry) != 1:
                add(task, "target_maps entries must have 1 key")
                continue
            key, val = next(iter(entry.items()))
            if key == "":
                add(task, "target_maps keys must be non-empty strings")
            self.ensure_balanced(task, "target_maps key", key)
            if not (isinstance(val, str) or self.is_simple_interp(val)):
                add(task, "target_maps values must be strings")
                continue
            if isinstance(val, str):
                self.ensure_balanced(task, "target_maps value", val)
                if _is_literal_no_braces(key) and _is_literal_no_braces(val):
                    literal_pairs.append((key, val))
        if isinstance(text, str) and _is_literal_no_braces(text) and \
                literal_pairs:
            matched = None
            for key, val in literal_pairs:
                if is_wildcard_match(key, text):
                    matched = val
                    break
            if matched is None:
                add(task, f"goto_map has no matches for literal text "
                          f"'{text}'")
            elif matched != "CONTINUE" and matched not in labels:
                add(task, f"goto_map target '{matched}' not found in "
                          f"{scope_name}")

    def _validate_for(self, task):
        add = self.add
        self.require_fields(task, ["name_list_map", "tasks"])
        self.require_object(task, "name_list_map")
        self.require_task_array(task, "tasks")
        nlm = task.get("name_list_map")
        if not isinstance(nlm, dict):
            return
        static_lists = []
        for name, value in nlm.items():
            arr = self.static_array(value)
            if arr is not None:
                static_lists.append((name, len(arr)))
                continue
            if isinstance(value, str) and not self.is_simple_interp(value):
                add(task, f"for.name_list_map value for '{name}' must be a "
                          f"list or simple interpolation")
                return
            if not isinstance(value, (list, str)):
                add(task, f"for.name_list_map value for '{name}' must be a "
                          f"list or simple interpolation")
                return
        if static_lists and len(static_lists) == len(nlm):
            expected = static_lists[0][1]
            if any(n != expected for _, n in static_lists):
                add(task, "for lists have differing lengths")

    def _has_null_entry(self, task, field: str) -> bool:
        arr = task.get(field)
        if not isinstance(arr, list):
            return False
        return any(isinstance(e, dict) and "NULL" in e for e in arr)

    def _validate_voice_path(self, task):
        path = task.get("voice_path")
        if not isinstance(path, str) or not path:
            return
        if "{" in path or "}" in path:
            return
        resolved = os.path.expanduser(path)
        if not os.path.isabs(resolved):
            resolved = os.path.join(CTX.program_dir or os.getcwd(), resolved)
        if not os.path.exists(resolved):
            self.add(task, f"voice_path does not exist: {resolved}")
        elif os.path.isdir(resolved):
            self.add(task, f"voice_path is a directory: {resolved}")

    @staticmethod
    def _oob(idx: int, n: int) -> bool:
        """1-based, negatives from the end (analyzer.rs:819-830)."""
        if idx > 0:
            return idx - 1 >= n
        if idx < 0:
            return not (0 <= n + idx < n)
        return True


def analyze_program(program: dict) -> list[Diagnostic]:
    a = _Analyzer(program)
    a.analyze_list([t for t in program["order"] if isinstance(t, dict)],
                   "order")
    for name, task in program.get("named_tasks", {}).items():
        if isinstance(task, dict):
            a.analyze_list([task], f"named_tasks.{name}")
    return a.diags

"""Extended static analyzer — diagnostics beyond the hard validator.

Capability parity with the reference's native analyzer extras
(reference: rust-project/src/analyzer.rs:199-484): non-fatal diagnostics
collected per task with label and line, covering

* static list bounds for literal ``list_index``/``list_slice`` indices;
* literal ``goto_map`` resolution (every literal text must match some key);
* ``for`` literal list length equality;
* ``speak``/chat ``voice_path`` file existence;
* simple-interpolation *type* resolution against default inserts (e.g. a
  ``list_join`` whose ``list:`` names a default insert that is an int).

Run after :func:`validate_program`; returns a list of diagnostics the CLI
prints with ``--analyze``. These never reject a program (load-parity with
the Python reference is owned by the validator).
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


def _iter_tasks(program: dict):
    stack = list(program["order"]) + list(program["named_tasks"].values())
    while stack:
        task = stack.pop()
        if not isinstance(task, dict) or "cmd" not in task:
            continue
        yield task
        subtasks = task.get("tasks")
        if isinstance(subtasks, list):
            stack.extend(t for t in subtasks if isinstance(t, dict))
        item = task.get("item")
        if isinstance(item, dict) and "cmd" in item:
            stack.append(item)


def _default_value(program: dict, ref):
    """Resolve a simple-insert reference against default_state inserts."""
    key = get_simple_insertkey(ref)
    if key and "{" not in key:
        return program["default_state"]["inserts"].get(key)
    return None


def analyze_program(program: dict) -> list[Diagnostic]:
    diags: list[Diagnostic] = []
    inserts = program["default_state"]["inserts"]

    def add(task, message):
        diags.append(Diagnostic(message=message,
                                label=task.get("traceback_label", ""),
                                line=task.get("line")))

    for task in _iter_tasks(program):
        cmd = task.get("cmd")

        # ---- static list bounds -------------------------------------------
        if cmd == "list_index":
            lst = task.get("list")
            literal = lst if isinstance(lst, list) else \
                _default_value(program, lst)
            index = task.get("index")
            if isinstance(literal, list) and isinstance(index, int) \
                    and not isinstance(index, bool):
                n = len(literal)
                if index == 0 or index > n or index < -n:
                    add(task, f"list_index {index} is out of bounds for a "
                              f"{n}-element list")

        if cmd == "list_slice":
            lst = task.get("list")
            literal = lst if isinstance(lst, list) else \
                _default_value(program, lst)
            if isinstance(literal, list):
                n = len(literal)
                for fname in ("from_index", "to_index"):
                    v = task.get(fname)
                    if isinstance(v, int) and not isinstance(v, bool):
                        if v > n or v < -n:
                            add(task, f"{fname} {v} is out of bounds for a "
                                      f"{n}-element list")

        # ---- literal goto_map resolution ------------------------------------
        if cmd == "goto_map":
            text = task.get("text", "")
            keys = [next(iter(d.keys())) for d in task.get("target_maps", [])
                    if isinstance(d, dict) and d]
            if isinstance(text, str) and "{" not in text:
                if not any(is_wildcard_match(k, text) for k in keys
                           if "{" not in k):
                    add(task, f"goto_map text '{text}' is literal but matches "
                              f"no literal target key")

        # ---- for: literal list length equality -------------------------------
        if cmd == "for":
            nlm = task.get("name_list_map")
            if isinstance(nlm, dict):
                lengths = {}
                for name, lst in nlm.items():
                    literal = lst if isinstance(lst, list) else \
                        _default_value(program, lst)
                    if isinstance(literal, list):
                        lengths[name] = len(literal)
                if len(set(lengths.values())) > 1:
                    add(task, f"for lists have differing literal lengths: "
                              f"{lengths}")

        # ---- voice path existence ---------------------------------------------
        voice = task.get("voice_path")
        if isinstance(voice, str) and voice and "{" not in voice:
            path = os.path.expanduser(voice)
            if not os.path.isabs(path):
                path = os.path.join(CTX.program_dir or os.getcwd(), path)
            if not os.path.exists(path):
                add(task, f"voice_path '{voice}' does not exist")

        # ---- simple-interpolation type resolution -----------------------------
        TYPE_EXPECTATIONS = {
            "list_join": ("list", list),
            "list_concat": ("lists", list),
            "list_append": ("list", list),
            "list_remove": ("list", list),
            "list_index": ("list", list),
            "list_slice": ("list", list),
            "random_choice": ("list", list),
            "user_choice": ("list", list),
            "print": ("text", str),
        }
        if cmd in TYPE_EXPECTATIONS:
            fname, expect = TYPE_EXPECTATIONS[cmd]
            v = task.get(fname)
            default = _default_value(program, v) if isinstance(v, str) else None
            if default is not None and not isinstance(default, expect):
                add(task, f"{cmd} field '{fname}' references default insert "
                          f"of type {type(default).__name__}, expected "
                          f"{expect.__name__}")

    return diags

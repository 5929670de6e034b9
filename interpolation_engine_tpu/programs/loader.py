"""Program loader.

Pipeline (reference contract: interpolation_engine.py:2267-2312):

1. Read the raw JSON5 text.
2. **Line-number injection pre-pass**: a regex rewrites every ``cmd:'x'``
   into ``cmd:'x', line:N`` *before* parsing so every task carries its
   source line for error messages and traceback labels.
3. Parse with our own JSON5 parser, validate, cache by content hash.
4. Deep-copy ``default_state`` into the fresh runtime state.

Like the reference's Rust parser (rust-project/src/parser.rs:17-20) — and
unlike its Python sibling — a legacy top-level ``tasks`` key is normalized to
``named_tasks`` so programs such as examples/math.json5 load everywhere.
"""

from __future__ import annotations

import copy
import hashlib
import re

from .. import json5
from ..core.context import log
from .validator import validate_program

# Matches cmd:'x' / "cmd":"x" / 'cmd':'x' followed by , or } — the places a
# task's command is declared — so we can tag the source line.
_CMD_PATTERN = re.compile(
    r"(\bcmd\b|\"cmd\"|'cmd')\s*:\s*(\"(?:\\.|[^\"])*\"|'(?:\\.|[^'])*')(\s*(?:,|\}))"
)


def add_line_numbers(json_content: str) -> str:
    """Inject ``line:N`` after each ``cmd:...`` declaration, per line."""
    out = []
    for lineno, line in enumerate(json_content.splitlines(keepends=True), start=1):
        out.append(_CMD_PATTERN.sub(
            lambda m: f"{m.group(1)}:{m.group(2)}, line:{lineno}{m.group(3)}", line))
    return "".join(out)


_cache_program = None
_cache_hash = None


def load(filepath: str) -> tuple[dict, dict]:
    """Load, validate and cache a program; return (program, fresh state)."""
    global _cache_program, _cache_hash

    with open(filepath, "r") as f:
        file_content = f.read()

    content_hash = hashlib.md5(file_content.encode()).hexdigest()
    if content_hash == _cache_hash:
        log("🛈  Load cache hit.")
        program = copy.deepcopy(_cache_program)
    else:
        log("🛈  Load cache miss.")
        if filepath.endswith(".prog"):
            from ..tools.prog_parser import load_prog_program
            program = load_prog_program(file_content)
        elif filepath.endswith(".json5"):
            program = json5.loads(add_line_numbers(file_content))
        else:
            raise ValueError(
                f"File '{filepath}' has an unknown extension. .json5 and "
                f".prog are supported.")
        if "named_tasks" not in program and isinstance(program.get("tasks"), dict):
            program["named_tasks"] = program.pop("tasks")
        validate_program(program)
        _cache_program = copy.deepcopy(program)
        _cache_hash = content_hash

    state = copy.deepcopy(program["default_state"])
    state["output"] = state.get("output", "")
    return program, state


def invalidate_cache():
    global _cache_program, _cache_hash
    _cache_program = None
    _cache_hash = None

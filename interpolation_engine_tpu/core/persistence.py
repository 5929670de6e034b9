"""Checkpoint persistence: comment-preserving save-state splicing.

The entire runtime state (inserts, output, order_index, and every nested
``order_index/<runtime_label>`` cursor) is a JSON dict that is deep-copied
into ``program['save_states'][slot]`` and spliced back into the program file
*as text*, preserving comments and formatting (reference contract:
interpolation_engine.py:953-1004, :2315-2332; rust-project/src/save.rs:4-47).
"""

from __future__ import annotations

import hashlib
import re

from .. import json5
from .context import log

_save_hash_cache = {"hash": None}


def splice_key_into_json5(content: str, key: str, new_value: dict,
                          n_indent: int = 4):
    """Replace the object value of ``key`` in JSON5 text, preserving the rest.

    Finds ``key: {``, brace-counts to the matching ``}``, serializes
    ``new_value`` with quoted keys, and re-indents it to the key's own
    indentation. Returns None if the key is absent (a logged no-op, like the
    reference).
    """
    match = re.search(f"(['\"]?{key}['\"]?)\\s*:\\s*{{", content)
    if not match:
        log(f"Key '{key}' not found or it's not an object.")
        return None

    start_pos = match.end() - 1
    brace_level = 1
    end_pos = -1
    for i in range(start_pos + 1, len(content)):
        if content[i] == "{":
            brace_level += 1
        elif content[i] == "}":
            brace_level -= 1
        if brace_level == 0:
            end_pos = i
            break
    assert end_pos != -1, "Error: Could not find matching closing brace."

    line_start = content.rfind("\n", 0, match.start()) + 1
    key_indent = content[line_start:match.start()]
    if key_indent.strip():
        # the key shares its line with other content (the reference would
        # corrupt the file here); indent with the line's whitespace only
        key_indent = key_indent[:len(key_indent) - len(key_indent.lstrip())]

    dumped = json5.dumps(new_value, indent=n_indent, ensure_ascii=True,
                         sort_keys=True)
    inner_lines = dumped.splitlines()[1:-1]
    formatted = [key_indent + line for line in inner_lines]
    replacement = "\n" + "\n".join(formatted) + f"\n{key_indent}"
    return content[:start_pos + 1] + replacement + content[end_pos:]


def save_program(program: dict, filepath: str):
    """Write ``program['save_states']`` back into the program file."""
    with open(filepath, "r") as f:
        file_content = f.read()

    new_content = splice_key_into_json5(
        file_content, "save_states", program["save_states"])
    if new_content is None:
        return

    new_hash = hashlib.md5(new_content.encode()).hexdigest()
    if new_hash == _save_hash_cache["hash"]:
        log("🛈  Save cache hit, no need to write.")
        return
    log("🛈  Save cache miss.")
    with open(filepath, "w") as f:
        f.write(new_content)
    _save_hash_cache["hash"] = new_hash

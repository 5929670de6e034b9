"""Experimental `.prog` surface-syntax tokenizer.

Capability parity with the reference's dev-branch ``.prog`` parser
(reference: interpolation_engine.py:2134-2264 — a line-oriented tokenizer
for a non-JSON5 program syntax that dead-ends before producing programs).
This implementation completes the tokenizer into a usable front-end:

Each non-empty line is one task: an identifier head followed by arguments —
bare identifiers, 'single'/"double" quoted strings (with backslash escapes),
``[ ... ]`` nested argument groups, and ``{ ... }`` JSON5 objects. Lines
starting with ``#`` are comments.

    print 'Hello {name}!'
    set name {item:'ada', output_name:'name'}

``parse_prog(text)`` returns a list of ``(line_number, tokens)`` entries;
``prog_to_tasks`` lowers simple forms into task dicts so a `.prog` file can
run through the normal pipeline. Still experimental, like the original.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from .. import json5


class ProgSyntaxError(ValueError):
    def __init__(self, message: str, line: int):
        super().__init__(f"line {line}: {message}")
        self.line = line


@dataclass
class Token:
    kind: str   # 'ident' | 'quote' | 'group' | 'object'
    value: Any


def _parse_line(text: str, lineno: int) -> list[Token]:
    tokens: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
        elif c == "#":
            break
        elif c in "'\"":
            quote = c
            i += 1
            out = []
            while i < n:
                if text[i] == "\\" and i + 1 < n:
                    out.append(text[i + 1])
                    i += 2
                elif text[i] == quote:
                    break
                else:
                    out.append(text[i])
                    i += 1
            else:
                raise ProgSyntaxError("unterminated string", lineno)
            i += 1
            tokens.append(Token("quote", "".join(out)))
        elif c == "[":
            depth, j = 1, i + 1
            while j < n and depth:
                depth += text[j] == "["
                depth -= text[j] == "]"
                j += 1
            if depth:
                raise ProgSyntaxError("unbalanced '['", lineno)
            tokens.append(Token("group", _parse_line(text[i + 1:j - 1], lineno)))
            i = j
        elif c == "{":
            depth, j = 1, i + 1
            in_str = None
            while j < n and depth:
                ch = text[j]
                if in_str:
                    if ch == "\\":
                        j += 1
                    elif ch == in_str:
                        in_str = None
                elif ch in "'\"":
                    in_str = ch
                else:
                    depth += ch == "{"
                    depth -= ch == "}"
                j += 1
            if depth:
                raise ProgSyntaxError("unbalanced '{'", lineno)
            try:
                obj = json5.loads(text[i:j])
            except Exception as e:
                raise ProgSyntaxError(f"invalid JSON5 object: {e}", lineno)
            tokens.append(Token("object", obj))
            i = j
        else:
            j = i
            while j < n and not text[j].isspace() and text[j] not in "'\"[]{}#":
                j += 1
            tokens.append(Token("ident", text[i:j]))
            i = j
    return tokens


def parse_prog(text: str) -> list[tuple[int, list[Token]]]:
    result = []
    for lineno, line in enumerate(text.splitlines(), start=1):
        tokens = _parse_line(line, lineno)
        if tokens:
            result.append((lineno, tokens))
    return result


# ---- lowering into task dicts --------------------------------------------------

_POSITIONAL = {
    "print": ["text"],
    "set": ["item", "output_name"],
    "goto": ["name"],
    "label": ["name"],
    "math": ["input", "output_name"],
    "sleep": ["seconds"],
    "user_input": ["prompt", "output_name"],
    "delete": ["wildcards"],
}


def prog_to_tasks(text: str) -> list[dict]:
    """Lower a .prog document into validator-ready task dicts."""
    tasks = []
    for lineno, tokens in parse_prog(text):
        head = tokens[0]
        if head.kind != "ident":
            raise ProgSyntaxError("line must start with a command name", lineno)
        cmd = head.value
        task: dict = {"cmd": cmd, "line": lineno}
        positional = list(_POSITIONAL.get(cmd, []))
        for tok in tokens[1:]:
            if tok.kind == "object":
                if not isinstance(tok.value, dict):
                    raise ProgSyntaxError("object argument must be a dict",
                                          lineno)
                task.update(tok.value)
            elif tok.kind in ("quote", "ident"):
                if not positional:
                    raise ProgSyntaxError(
                        f"too many positional arguments for '{cmd}'", lineno)
                task[positional.pop(0)] = tok.value
            elif tok.kind == "group":
                if not positional:
                    raise ProgSyntaxError(
                        f"too many positional arguments for '{cmd}'", lineno)
                task[positional.pop(0)] = [
                    t.value for t in tok.value
                    if t.kind in ("quote", "ident")]
        tasks.append(task)
    return tasks


def load_prog_program(text: str) -> dict:
    """Wrap .prog tasks into a standard program structure."""
    return {
        "default_state": {"order_index": 1, "inserts": {}},
        "order": prog_to_tasks(text),
        "named_tasks": {},
        "save_states": {},
    }

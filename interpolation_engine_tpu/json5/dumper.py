"""JSON5/JSON serializer.

Matches the on-disk shapes the reference produces:

* Save-state splices use 4-space indentation with quoted keys — the format
  visible in shipped programs (reference: examples/interactivity.json5:21-29,
  produced via json5.dumps(indent=4, quote_keys=True) at
  src/interpolation_engine/interpolation_engine.py:994).
* The ``write`` command serializes non-string items compactly with ASCII
  escaping (reference: interpolation_engine.py:1889).

Output is standard JSON (always-quoted keys, no trailing commas), which is
also valid JSON5 and byte-identical to the reference's observed output.
"""

from __future__ import annotations

import math

_STR_ESCAPES = {
    "\\": "\\\\",
    '"': '\\"',
    "\b": "\\b",
    "\f": "\\f",
    "\n": "\\n",
    "\r": "\\r",
    "\t": "\\t",
}


def _quote(s: str, ensure_ascii: bool) -> str:
    out = ['"']
    for ch in s:
        if ch in _STR_ESCAPES:
            out.append(_STR_ESCAPES[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        elif ensure_ascii and ord(ch) > 0x7E:
            cp = ord(ch)
            if cp > 0xFFFF:
                cp -= 0x10000
                hi = 0xD800 + (cp >> 10)
                lo = 0xDC00 + (cp & 0x3FF)
                out.append(f"\\u{hi:04x}\\u{lo:04x}")
            else:
                out.append(f"\\u{cp:04x}")
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _num(value) -> str:
    if isinstance(value, bool):
        return "true" if value else "false"
    if isinstance(value, int):
        return str(value)
    if math.isnan(value):
        return "NaN"
    if math.isinf(value):
        return "Infinity" if value > 0 else "-Infinity"
    return repr(value)


def dumps(value, indent: int | None = None, ensure_ascii: bool = True,
          sort_keys: bool = False) -> str:
    """Serialize ``value``. With ``indent``, pretty-print json.dumps-style."""

    def ser(v, depth: int) -> str:
        if v is None:
            return "null"
        if isinstance(v, bool):
            return "true" if v else "false"
        if isinstance(v, (int, float)):
            return _num(v)
        if isinstance(v, str):
            return _quote(v, ensure_ascii)
        if isinstance(v, (list, tuple)):
            if not v:
                return "[]"
            if indent is None:
                return "[" + ", ".join(ser(x, depth) for x in v) + "]"
            pad = " " * (indent * (depth + 1))
            closing = " " * (indent * depth)
            items = (",\n").join(pad + ser(x, depth + 1) for x in v)
            return "[\n" + items + "\n" + closing + "]"
        if isinstance(v, dict):
            if not v:
                return "{}"
            keys = sorted(v) if sort_keys else list(v)
            if indent is None:
                body = ", ".join(
                    _quote(str(k), ensure_ascii) + ": " + ser(v[k], depth)
                    for k in keys
                )
                return "{" + body + "}"
            pad = " " * (indent * (depth + 1))
            closing = " " * (indent * depth)
            items = (",\n").join(
                pad + _quote(str(k), ensure_ascii) + ": " + ser(v[k], depth + 1)
                for k in keys
            )
            return "{\n" + items + "\n" + closing + "}"
        raise TypeError(f"cannot serialize value of type {type(v).__name__}")

    return ser(value, 0)

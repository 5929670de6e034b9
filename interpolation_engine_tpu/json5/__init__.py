"""Self-contained JSON5 reader/writer.

The reference runtime depends on the third-party ``json5`` package for
program parsing (reference: src/interpolation_engine/interpolation_engine.py:2300)
and for serializing values (save-state splicing at :994, ``write`` at :1889).
This framework ships its own implementation so the whole stack is
dependency-free and auditable.

Supported JSON5 surface (superset of what programs use):
  * ``//`` line and ``/* */`` block comments
  * unquoted object keys (ECMAScript identifier-ish)
  * single- or double-quoted strings, with escapes incl. ``\\uXXXX``,
    ``\\xXX`` and line continuations
  * trailing commas in arrays and objects
  * hex integers, leading ``+``, ``.5`` / ``5.`` floats, Infinity, NaN
"""

from .parser import loads, Json5Error
from .dumper import dumps

__all__ = ["loads", "dumps", "Json5Error"]

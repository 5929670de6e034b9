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

from .parser import loads as _py_loads, Json5Error
from .dumper import dumps

# Prefer the native C++ parser when the toolchain can build it; it is
# differentially tested against the pure-Python implementation and raises
# the same ValueError subclassable shape (Json5Error derives from ValueError,
# the native module raises ValueError with identical line/col messages).
_native = None
try:  # pragma: no cover - environment dependent
    import os
    if not os.environ.get("IE_TPU_NO_NATIVE"):
        from ..native.build import load_json5c
        _native = load_json5c()
except Exception:
    _native = None

if _native is not None:
    import re as _re

    def loads(text):
        if isinstance(text, (bytes, bytearray)):
            text = text.decode("utf-8")
        try:
            return _native.loads(text)
        except ValueError as e:
            # normalize to Json5Error with .line/.col like the Python parser
            m = _re.search(r"line (\d+), column (\d+): (.*)", str(e))
            if m:
                raise Json5Error(m.group(3), int(m.group(1)),
                                 int(m.group(2))) from None
            raise Json5Error(str(e), 1, 1) from None
else:
    loads = _py_loads

py_loads = _py_loads

__all__ = ["loads", "dumps", "Json5Error", "py_loads"]

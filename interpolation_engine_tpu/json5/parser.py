"""Recursive-descent JSON5 parser.

Hand-written (no dependencies). Tracks line/column for error messages so the
program loader can report the same class of line-anchored diagnostics the
reference's analyzer does (reference: rust-project/src/analyzer.rs diagnostics
carry line numbers; Python loader injects ``line:N`` pre-parse).
"""

from __future__ import annotations

import math


class Json5Error(ValueError):
    def __init__(self, message: str, line: int, col: int):
        super().__init__(f"JSON5 parse error at line {line}, column {col}: {message}")
        self.line = line
        self.col = col


_WS = " \t\n\r\f\v   ﻿"
_HEX = "0123456789abcdefABCDEF"

# Escape map for single-character escapes inside strings.
_ESCAPES = {
    "b": "\b",
    "f": "\f",
    "n": "\n",
    "r": "\r",
    "t": "\t",
    "v": "\v",
    "0": "\0",
    "'": "'",
    '"': '"',
    "\\": "\\",
    "/": "/",
}

_ID_START_EXTRA = "$_"
_ID_PART_EXTRA = "$_‌‍"


class _Parser:
    __slots__ = ("text", "pos", "n")

    def __init__(self, text: str):
        self.text = text
        self.pos = 0
        self.n = len(text)

    # -- diagnostics -------------------------------------------------------

    def _linecol(self, pos: int | None = None) -> tuple[int, int]:
        if pos is None:
            pos = self.pos
        line = self.text.count("\n", 0, pos) + 1
        last_nl = self.text.rfind("\n", 0, pos)
        col = pos - last_nl
        return line, col

    def fail(self, message: str, pos: int | None = None):
        line, col = self._linecol(pos)
        raise Json5Error(message, line, col)

    # -- low-level scanning ------------------------------------------------

    def peek(self) -> str:
        return self.text[self.pos] if self.pos < self.n else ""

    def skip_ws(self):
        text, n = self.text, self.n
        while self.pos < n:
            c = text[self.pos]
            if c in _WS:
                self.pos += 1
            elif c == "/" and self.pos + 1 < n:
                nxt = text[self.pos + 1]
                if nxt == "/":
                    end = text.find("\n", self.pos + 2)
                    self.pos = n if end == -1 else end + 1
                elif nxt == "*":
                    end = text.find("*/", self.pos + 2)
                    if end == -1:
                        self.fail("unterminated block comment")
                    self.pos = end + 2
                else:
                    return
            else:
                return

    # -- values --------------------------------------------------------------

    def parse_value(self):
        self.skip_ws()
        if self.pos >= self.n:
            self.fail("unexpected end of input, expected a value")
        c = self.text[self.pos]
        if c == "{":
            return self.parse_object()
        if c == "[":
            return self.parse_array()
        if c in "\"'":
            return self.parse_string()
        if c.isdigit() or c in "+-.":
            return self.parse_number()
        if self.text.startswith("true", self.pos):
            self.pos += 4
            return True
        if self.text.startswith("false", self.pos):
            self.pos += 5
            return False
        if self.text.startswith("null", self.pos):
            self.pos += 4
            return None
        if self.text.startswith("Infinity", self.pos):
            self.pos += 8
            return math.inf
        if self.text.startswith("NaN", self.pos):
            self.pos += 3
            return math.nan
        self.fail(f"unexpected character {c!r}")

    def parse_object(self) -> dict:
        self.pos += 1  # consume '{'
        obj: dict = {}
        while True:
            self.skip_ws()
            if self.pos >= self.n:
                self.fail("unterminated object")
            c = self.text[self.pos]
            if c == "}":
                self.pos += 1
                return obj
            key = self.parse_key()
            self.skip_ws()
            if self.peek() != ":":
                self.fail(f"expected ':' after object key {key!r}")
            self.pos += 1
            obj[key] = self.parse_value()
            self.skip_ws()
            c = self.peek()
            if c == ",":
                self.pos += 1
            elif c == "}":
                self.pos += 1
                return obj
            elif c == "":
                self.fail("unterminated object")
            else:
                self.fail(f"expected ',' or '}}' in object, got {c!r}")

    def parse_key(self) -> str:
        c = self.peek()
        if c in "\"'":
            return self.parse_string()
        # Unquoted identifier key (ECMAScript IdentifierName, pragmatic subset
        # plus \u escapes).
        start = self.pos
        out = []
        while self.pos < self.n:
            c = self.text[self.pos]
            if c == "\\" and self.text.startswith("\\u", self.pos):
                hexs = self.text[self.pos + 2 : self.pos + 6]
                if len(hexs) != 4 or any(h not in _HEX for h in hexs):
                    self.fail("invalid \\u escape in identifier")
                out.append(chr(int(hexs, 16)))
                self.pos += 6
                continue
            is_first = self.pos == start and not out
            ok = (
                c.isalpha()
                or c in _ID_START_EXTRA
                or (not is_first and (c.isdigit() or c in _ID_PART_EXTRA))
            )
            if not ok:
                break
            out.append(c)
            self.pos += 1
        if not out:
            self.fail("expected object key")
        return "".join(out)

    def parse_array(self) -> list:
        self.pos += 1  # consume '['
        arr: list = []
        while True:
            self.skip_ws()
            if self.pos >= self.n:
                self.fail("unterminated array")
            if self.text[self.pos] == "]":
                self.pos += 1
                return arr
            arr.append(self.parse_value())
            self.skip_ws()
            c = self.peek()
            if c == ",":
                self.pos += 1
            elif c == "]":
                self.pos += 1
                return arr
            elif c == "":
                self.fail("unterminated array")
            else:
                self.fail(f"expected ',' or ']' in array, got {c!r}")

    def parse_string(self) -> str:
        quote = self.text[self.pos]
        self.pos += 1
        out = []
        text, n = self.text, self.n
        while True:
            if self.pos >= n:
                self.fail("unterminated string")
            c = text[self.pos]
            if c == quote:
                self.pos += 1
                return "".join(out)
            if c == "\n" or c == "\r":
                self.fail("unescaped newline in string")
            if c != "\\":
                out.append(c)
                self.pos += 1
                continue
            # escape sequence
            if self.pos + 1 >= n:
                self.fail("unterminated escape sequence")
            e = text[self.pos + 1]
            if e == "u":
                hexs = text[self.pos + 2 : self.pos + 6]
                if len(hexs) != 4 or any(h not in _HEX for h in hexs):
                    self.fail("invalid \\u escape")
                code = int(hexs, 16)
                self.pos += 6
                # surrogate pair handling
                if 0xD800 <= code <= 0xDBFF and text.startswith("\\u", self.pos):
                    hexs2 = text[self.pos + 2 : self.pos + 6]
                    if len(hexs2) == 4 and all(h in _HEX for h in hexs2):
                        low = int(hexs2, 16)
                        if 0xDC00 <= low <= 0xDFFF:
                            code = 0x10000 + ((code - 0xD800) << 10) + (low - 0xDC00)
                            self.pos += 6
                out.append(chr(code))
            elif e == "x":
                hexs = text[self.pos + 2 : self.pos + 4]
                if len(hexs) != 2 or any(h not in _HEX for h in hexs):
                    self.fail("invalid \\x escape")
                out.append(chr(int(hexs, 16)))
                self.pos += 4
            elif e in _ESCAPES:
                out.append(_ESCAPES[e])
                self.pos += 2
            elif e == "\n":
                self.pos += 2  # line continuation
            elif e == "\r":
                self.pos += 2
                if self.pos < n and text[self.pos] == "\n":
                    self.pos += 1
            elif e in "  ":
                self.pos += 2
            elif e.isdigit():
                self.fail(f"invalid numeric escape \\{e}")
            else:
                # JSON5: \X for any other X is X itself
                out.append(e)
                self.pos += 2

    def parse_number(self):
        start = self.pos
        text, n = self.text, self.n
        sign = 1
        c = text[self.pos]
        if c in "+-":
            sign = -1 if c == "-" else 1
            self.pos += 1
            if self.pos < n and text.startswith("Infinity", self.pos):
                self.pos += 8
                return sign * math.inf
            if self.pos < n and text.startswith("NaN", self.pos):
                self.pos += 3
                return math.nan
        if self.pos + 1 < n and text[self.pos] == "0" and text[self.pos + 1] in "xX":
            self.pos += 2
            h0 = self.pos
            while self.pos < n and text[self.pos] in _HEX:
                self.pos += 1
            if self.pos == h0:
                self.fail("invalid hex literal")
            return sign * int(text[h0 : self.pos], 16)
        is_float = False
        while self.pos < n:
            c = text[self.pos]
            if c.isdigit():
                self.pos += 1
            elif c == "." and not is_float:
                is_float = True
                self.pos += 1
            elif c in "eE":
                is_float = True
                self.pos += 1
                if self.pos < n and text[self.pos] in "+-":
                    self.pos += 1
            else:
                break
        literal = text[start : self.pos]
        if literal in ("+", "-", ".", "+.", "-."):
            self.fail(f"invalid number literal {literal!r}", start)
        try:
            if is_float:
                return float(literal)
            return int(literal)
        except ValueError:
            self.fail(f"invalid number literal {literal!r}", start)


def loads(text: str):
    """Parse a JSON5 document and return the corresponding Python value."""
    if isinstance(text, (bytes, bytearray)):
        text = text.decode("utf-8")
    p = _Parser(text)
    value = p.parse_value()
    p.skip_ws()
    if p.pos != p.n:
        p.fail("trailing characters after top-level value")
    return value

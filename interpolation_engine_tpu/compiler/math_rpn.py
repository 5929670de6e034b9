"""Compile-time lowering of static math expressions to RPN.

``math`` inputs are strings interpolated at runtime, so in general they must
be evaluated by the byte-level device kernel (ops/math_kernel.py). But
almost all real expressions are *static text with int-valued holes*
('length(history_list) - 2 * {min_history_turns}'), which this module
parses once at compile time into a short RPN program — evaluated on device
in a handful of loop iterations instead of a per-byte scan.

Conservative by construction: only inputs matching a grammar whose value
semantics provably equal the reference's eval_math (integer domain,
exact division, unary minus binding between '*' and '**') are lowered;
everything else returns None and keeps the byte path. Holes must resolve to
ints (or pure-digit strings) at runtime — any other value parks the
instance for exact host execution.

Grammar:
  expr   := term (('+'|'-') term)*
  term   := unary (('*'|'/'|'%') unary)*
  unary  := '-' unary | atom
  atom   := INT | HOLE | '(' expr ')' | FUNC '(' fnargs ')'
  FUNC   := length | min | max | round | sign
  length's argument is a literal key; min/max take a literal key or a
  comma-separated expr list; round/sign take an expr.
"""

from __future__ import annotations

from typing import Optional

from ..vm import isa


class _NoRpn(Exception):
    pass


class _Parser:
    def __init__(self, text: str, intern):
        self.text = text
        self.pos = 0
        self.n = len(text)
        self.intern = intern
        self.out: list[int] = []

    def peek(self):
        while self.pos < self.n and self.text[self.pos] == " ":
            self.pos += 1
        return self.text[self.pos] if self.pos < self.n else ""

    def emit(self, kind, x=0, y=0):
        self.out.extend([kind, x, y])

    # ---- grammar ------------------------------------------------------------

    def parse_expr(self):
        self.parse_term()
        while True:
            c = self.peek()
            if c == "+":
                self.pos += 1
                self.parse_term()
                self.emit(isa.RPN_ADD)
            elif c == "-":
                self.pos += 1
                self.parse_term()
                self.emit(isa.RPN_SUB)
            else:
                return

    def parse_term(self):
        self.parse_unary()
        while True:
            c = self.peek()
            if c == "*":
                if self.text[self.pos:self.pos + 2] == "**":
                    raise _NoRpn("power stays on the byte path")
                self.pos += 1
                self.parse_unary()
                self.emit(isa.RPN_MUL)
            elif c == "/":
                if self.text[self.pos:self.pos + 2] == "//":
                    raise _NoRpn("floor division stays on the byte path")
                self.pos += 1
                self.parse_unary()
                self.emit(isa.RPN_DIV)
            elif c == "%":
                self.pos += 1
                self.parse_unary()
                self.emit(isa.RPN_MOD)
            else:
                return

    def parse_unary(self):
        if self.peek() == "-":
            self.pos += 1
            self.parse_unary()
            self.emit(isa.RPN_NEG)
        else:
            self.parse_atom()

    def parse_atom(self):
        c = self.peek()
        if c == "":
            raise _NoRpn("unexpected end")
        if c.isdigit():
            j = self.pos
            while j < self.n and self.text[j].isdigit():
                j += 1
            if j < self.n and self.text[j] == ".":
                raise _NoRpn("floats stay on the byte path")
            self.emit(isa.RPN_CONST, int(self.text[self.pos:j]))
            self.pos = j
            return
        if c == "{":
            span = self._hole_span()
            key = span[1:-1]
            if "{" in key or "}" in key or "\\" in key:
                # nested or escaped holes keep the byte path (the device RPN
                # resolves holes by direct store lookup)
                raise _NoRpn("non-simple hole")
            off, ln = self.intern(key)
            self.emit(isa.RPN_HOLE, off, ln)
            return
        if c == "(":
            self.pos += 1
            self.parse_expr()
            if self.peek() != ")":
                raise _NoRpn("unbalanced parens")
            self.pos += 1
            return
        if c.isalpha():
            j = self.pos
            while j < self.n and (self.text[j].isalnum() or self.text[j] == "_"):
                j += 1
            name = self.text[self.pos:j]
            self.pos = j
            if self.peek() != "(":
                raise _NoRpn(f"bare identifier {name!r}")
            self.pos += 1
            self._parse_call(name)
            if self.peek() != ")":
                raise _NoRpn("unbalanced function parens")
            self.pos += 1
            return
        raise _NoRpn(f"unexpected char {c!r}")

    def _hole_span(self) -> str:
        """Consume one balanced {…} group (escape-unaware: a static math
        input with escaped braces stays on the byte path)."""
        depth = 0
        start = self.pos
        while self.pos < self.n:
            ch = self.text[self.pos]
            if ch == "\\":
                raise _NoRpn("escapes stay on the byte path")
            if ch == "{":
                depth += 1
            elif ch == "}":
                depth -= 1
                if depth == 0:
                    self.pos += 1
                    return self.text[start:self.pos]
            self.pos += 1
        raise _NoRpn("unbalanced hole")

    def _inner_call_text(self) -> str:
        """Raw text up to the matching ')' (for key-name arguments)."""
        depth = 1
        start = self.pos
        while self.pos < self.n:
            ch = self.text[self.pos]
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    return self.text[start:self.pos]
            self.pos += 1
        raise _NoRpn("unbalanced call")

    def _parse_call(self, name: str):
        if name == "length":
            inner = self._inner_call_text()
            if any(ch in inner for ch in "{}(),"):
                raise _NoRpn("dynamic length argument")
            off, ln = self.intern(inner)
            self.emit(isa.RPN_LENGTH, off, ln)
            self.pos -= 0  # cursor already at ')'
            return
        if name in ("min", "max"):
            save = self.pos
            inner = self._inner_call_text()
            # literal-key form (no commas, not expression charset)
            if not set(inner) <= set(" .0123456789+-*/%,{}()"):
                if any(ch in inner for ch in "{}(),"):
                    raise _NoRpn("dynamic min/max argument")
                off, ln = self.intern(inner)
                self.emit(isa.RPN_MINLIST if name == "min" else isa.RPN_MAXLIST,
                          off, ln)
                return
            # enumeration form: comma-separated exprs, folded pairwise
            self.pos = save
            self.parse_expr()
            n_args = 1
            while self.peek() == ",":
                self.pos += 1
                self.parse_expr()
                self.emit(isa.RPN_MIN2 if name == "min" else isa.RPN_MAX2)
                n_args += 1
            if n_args < 1:
                raise _NoRpn("empty min/max")
            return
        if name == "round":
            self.parse_expr()  # integer domain: round is the identity
            return
        if name == "sign":
            self.parse_expr()
            self.emit(isa.RPN_SIGN)
            return
        raise _NoRpn(f"unknown function {name!r}")


MAX_RPN = 24     # entries
MAX_STACK = 8


def compile_math_rpn(text: str, intern) -> Optional[list[int]]:
    """Lower a math input to RPN ints, or None when it must stay dynamic.

    ``intern(s) -> (off, len)`` adds template text to the string table.
    Returns a flat list [n_entries, kind, x, y, ...].
    """
    if not isinstance(text, str):
        return None
    if text.startswith("("):
        # the reference's paren-reduction reads text[-1] when a group opens
        # at position 0 and crashes unless it sees a splitting char
        # (interpolation_engine.py:920-926); such inputs keep the byte path,
        # which reproduces the quirk
        return None
    try:
        p = _Parser(text, intern)
        p.parse_expr()
        if p.peek() != "":
            raise _NoRpn("trailing input")
    except _NoRpn:
        return None
    n_entries = len(p.out) // 3
    if n_entries == 0 or n_entries > MAX_RPN:
        return None
    # verify stack depth stays bounded
    depth = 0
    UNARY = {isa.RPN_NEG, isa.RPN_SIGN}
    LEAF = {isa.RPN_CONST, isa.RPN_HOLE, isa.RPN_LENGTH, isa.RPN_MINLIST,
            isa.RPN_MAXLIST}
    for i in range(n_entries):
        kind = p.out[3 * i]
        if kind in LEAF:
            depth += 1
        elif kind in UNARY:
            pass
        else:
            depth -= 1
        if depth < 1 or depth > MAX_STACK:
            return None
    if depth != 1:
        return None
    return [n_entries] + p.out

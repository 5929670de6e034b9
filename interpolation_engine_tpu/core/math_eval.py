"""Math command evaluator.

Same surface as the reference (reference: interpolation_engine.py:849-949):
interpolate the expression, reduce parenthesized groups innermost-first
(dispatching ``length``/``min``/``max``/``round``/``sign`` function calls),
then evaluate a charset-restricted arithmetic expression and require an
integer result within 1e-4 relative tolerance.

Unlike the reference we never call ``eval`` — a Pratt parser evaluates the
restricted grammar with Python numeric semantics (true division, sign-of-
divisor modulo, right-associative power binding tighter than unary minus),
like the reference's Rust sibling does with a shunting-yard evaluator
(reference: rust-project/src/math.rs:8-272).
"""

from __future__ import annotations

from .context import log
from .interp import get_interpdata, interpolate_inserts, py_str

LEGAL_TERMINALS = set(" .0123456789+-*/%")
_OPERATOR_CHARS = set("+-*/^%")
_WORD_SPLITTING_CHARS = set(" ()+-*/^%")


class MathError(Exception):
    pass


# --- restricted arithmetic evaluator (replaces the reference's eval) --------

def _tokenize(s: str):
    tokens = []
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == " ":
            i += 1
            continue
        if c.isdigit() or c == ".":
            j = i
            while j < n and (s[j].isdigit() or s[j] == "."):
                j += 1
            literal = s[i:j]
            try:
                value = float(literal) if "." in literal else int(literal)
            except ValueError:
                raise MathError(f"invalid number literal {literal!r} in {s!r}")
            tokens.append(("num", value))
            i = j
            continue
        if c == "*" and i + 1 < n and s[i + 1] == "*":
            tokens.append(("op", "**"))
            i += 2
            continue
        if c == "/" and i + 1 < n and s[i + 1] == "/":
            tokens.append(("op", "//"))
            i += 2
            continue
        if c in "+-*/%":
            tokens.append(("op", c))
            i += 1
            continue
        raise MathError(f"illegal character {c!r} in expression {s!r}")
    return tokens


# binding powers: (left, right); '**' is right-associative and binds tighter
# than unary minus on its left (Python: -2**2 == -4).
_BINARY_BP = {"+": (1, 2), "-": (1, 2), "*": (3, 4), "/": (3, 4), "%": (3, 4),
              "//": (3, 4), "**": (7, 6)}
_UNARY_BP = 5


class _Pratt:
    def __init__(self, tokens):
        self.tokens = tokens
        self.pos = 0

    def peek(self):
        return self.tokens[self.pos] if self.pos < len(self.tokens) else (None, None)

    def next(self):
        tok = self.peek()
        self.pos += 1
        return tok

    def parse(self, min_bp: int = 0):
        kind, value = self.next()
        if kind == "num":
            lhs = value
        elif kind == "op" and value in ("+", "-"):
            operand = self.parse(_UNARY_BP)
            lhs = operand if value == "+" else -operand
        else:
            raise MathError(f"unexpected token {value!r} in expression")
        while True:
            kind, op = self.peek()
            if kind != "op" or op not in _BINARY_BP:
                break
            lbp, rbp = _BINARY_BP[op]
            if lbp < min_bp:
                break
            self.next()
            rhs = self.parse(rbp)
            if op == "+":
                lhs = lhs + rhs
            elif op == "-":
                lhs = lhs - rhs
            elif op == "*":
                lhs = lhs * rhs
            elif op == "/":
                lhs = lhs / rhs
            elif op == "//":
                lhs = lhs // rhs
            elif op == "%":
                lhs = lhs % rhs
            elif op == "**":
                lhs = lhs ** rhs
        return lhs


def safe_eval(s: str):
    """Evaluate an arithmetic string restricted to LEGAL_TERMINALS.

    The reference's ``math_safe_eval`` asserts the charset (so '^' is in fact
    rejected despite a dead '^'→'**' rewrite — a preserved quirk, reference:
    interpolation_engine.py:849-854) and evaluates with Python semantics.
    """
    assert set(s) <= LEGAL_TERMINALS, (
        f"Expression {s!r} contains characters outside the math charset.")
    parser = _Pratt(_tokenize(s))
    result = parser.parse()
    if parser.pos != len(parser.tokens):
        raise MathError(f"trailing tokens in expression {s!r}")
    return result


# --- math functions ----------------------------------------------------------

def _fn_length(inserts, inner: str):
    value = get_interpdata(inserts, inner)
    assert isinstance(value, list), (
        f"'math_length' was called on '{inner}', which is of type "
        f"{type(value)}, but 'length' expects a list.")
    return len(value)


def _fn_min(inserts, inner: str):
    if set(inner) <= (LEGAL_TERMINALS | {","}):
        return min(safe_eval(x) for x in inner.split(","))
    value = get_interpdata(inserts, inner)
    assert isinstance(value, list), (
        f"'math_min' was called on '{inner}', which is of type {type(value)}, "
        f"but 'min' expects either an enumeration of ints or a list.")
    return min(value)


def _fn_max(inserts, inner: str):
    if set(inner) <= (LEGAL_TERMINALS | {","}):
        return max(safe_eval(x) for x in inner.split(","))
    value = get_interpdata(inserts, inner)
    assert isinstance(value, list), (
        f"'math_max' was called on '{inner}', which is of type {type(value)}, "
        f"but 'max' expects either an enumeration of ints or a list.")
    return max(value)


def _fn_round(inserts, inner: str):
    return round(safe_eval(inner))


def _fn_sign(inserts, inner: str):
    value = safe_eval(inner)
    return 1 if value > 0 else (-1 if value < 0 else 0)


MATH_FUNCTIONS = {
    "length": _fn_length,
    "min": _fn_min,
    "max": _fn_max,
    "round": _fn_round,
    "sign": _fn_sign,
}


def eval_math(inserts: dict, math_input: str) -> int:
    """Interpolate, reduce parens innermost-first, evaluate; integer result.

    Follows the reference's reduction contract exactly
    (interpolation_engine.py:901-949), including the quirk that a group whose
    opening paren sits at position 0 consults the string's *last* character
    (Python negative indexing) to decide whether it is a function call.
    """
    log(f"    Math:    {math_input}")
    math_input = interpolate_inserts(inserts, math_input)
    math_input = py_str(math_input)

    assert math_input.count("(") == math_input.count(")"), (
        f"Math error: illegal parentheses in \"{math_input}\".")

    while math_input.find("(") != -1:
        outer_from = math_input.rfind("(")
        inner_to = math_input.find(")", outer_from + 1)
        if outer_from == -1 or inner_to == -1:
            break
        inner_from = outer_from + 1
        outer_to = inner_to + 1
        inner = math_input[inner_from:inner_to]
        # NOTE: for outer_from == 0 this reads math_input[-1] — the preserved
        # reference quirk described in the docstring.
        if math_input[outer_from - 1] in _WORD_SPLITTING_CHARS:
            subresult = safe_eval(inner)
            log(f"    Math: => ({inner}) = {subresult}")
        else:
            words = "".join(
                c if c not in _WORD_SPLITTING_CHARS else " "
                for c in math_input[:outer_from]).split()
            if not words:
                raise MathError(
                    f"In expression '{math_input}', a parenthesized group at the "
                    f"start of the expression was classified as a function call "
                    f"but no function name precedes it.")
            function_name = words[-1]
            outer_from -= len(function_name)
            if function_name in MATH_FUNCTIONS:
                subresult = MATH_FUNCTIONS[function_name](inserts, inner)
                log(f"    Math: => {function_name}({inner}) = {subresult}")
            else:
                raise AssertionError(
                    f"In expression '{math_input}', unprocessable function name "
                    f"'{function_name}' was encountered.")
        math_input = math_input[:outer_from] + py_str(subresult) + math_input[outer_to:]

    log(f"    Math: => {math_input}")

    illegal = set(math_input) - LEGAL_TERMINALS
    assert not illegal, (
        f"Mathematical expression '{math_input}' contains illegal characters: "
        f"{', '.join(repr(c) for c in sorted(illegal))}. "
        f"Perhaps you meant to interpolate an insert.")
    result = safe_eval(math_input)
    result_int = round(result)
    log(f"    Math: => {result} => {result_int}")
    if result != 0:
        assert abs((result_int - result) / result) < 0.0001, (
            f"Got result {result}, but currently results are restricted to be "
            f"integers.")
    return result_int

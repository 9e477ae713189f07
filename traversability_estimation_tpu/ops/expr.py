"""Safe arithmetic-expression compiler for MathExpressionFilter parity.

The reference's chain uses gridMapFilters/MathExpressionFilter, which
evaluates an EigenLab arithmetic expression over layer-name variables
(config/robot_filter_parameter.yaml:24-28 in /root/reference). This module
compiles such expressions into traced jax.numpy computations over a dict of
layer planes — a tiny recursive-descent parser, no ``eval``, no Python
builtins reachable, fully jit-compatible.

Grammar (EigenLab-compatible subset, coefficient-wise semantics):

    expr    := term (('+'|'-') term)*
    term    := unary (('*'|'/') unary)*
    unary   := ('+'|'-')* power
    power   := atom ('^' unary)?          # right-associative
    atom    := NUMBER | NAME | NAME '(' expr (',' expr)* ')' | '(' expr ')'

Functions: sqrt, abs, exp, log, sin, cos, tan, asin, acos, atan, min, max,
pow, floor, ceil, sign, cwiseMin, cwiseMax (EigenLab names). ``acos``/``asin``
use the from-scratch minimax polynomial shared with the slope filter so the
expression path lowers under Pallas/Mosaic too.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, List, Mapping, Tuple

import jax.numpy as jnp

Array = jnp.ndarray

_TOKEN_CHARS = set("+-*/^(),")


@dataclasses.dataclass(frozen=True)
class _Tok:
    kind: str  # 'num' | 'name' | 'op'
    text: str


class ExpressionError(ValueError):
    """Raised for syntax errors or unknown identifiers."""


def _tokenize(src: str) -> List[_Tok]:
    toks: List[_Tok] = []
    i, n = 0, len(src)
    while i < n:
        c = src[i]
        if c.isspace():
            i += 1
        elif c in _TOKEN_CHARS:
            toks.append(_Tok("op", c))
            i += 1
        elif c.isdigit() or (c == "." and i + 1 < n and src[i + 1].isdigit()):
            j = i
            while j < n and (src[j].isdigit() or src[j] == "."):
                j += 1
            # exponent suffix 1e-3 / 2.5E+4
            if j < n and src[j] in "eE":
                k = j + 1
                if k < n and src[k] in "+-":
                    k += 1
                if k < n and src[k].isdigit():
                    j = k
                    while j < n and src[j].isdigit():
                        j += 1
            toks.append(_Tok("num", src[i:j]))
            i = j
        elif c.isalpha() or c == "_":
            j = i
            while j < n and (src[j].isalnum() or src[j] == "_"):
                j += 1
            toks.append(_Tok("name", src[i:j]))
            i = j
        else:
            raise ExpressionError(f"unexpected character {c!r} in expression {src!r}")
    return toks


def _acos(x: Array) -> Array:
    from traversability_estimation_tpu.ops.filters import _acos as impl

    return impl(x)


_FUNCS: Dict[str, Callable[..., Array]] = {
    "sqrt": jnp.sqrt,
    "abs": jnp.abs,
    "exp": jnp.exp,
    "log": jnp.log,
    "sin": jnp.sin,
    "cos": jnp.cos,
    "tan": jnp.tan,
    "acos": lambda x: _acos(x),
    "asin": lambda x: jnp.float32(jnp.pi / 2) - _acos(x),
    "atan": jnp.arctan,
    "floor": jnp.floor,
    "ceil": jnp.ceil,
    "sign": jnp.sign,
    "min": lambda *a: _variadic(jnp.minimum, a),
    "max": lambda *a: _variadic(jnp.maximum, a),
    "cwiseMin": lambda *a: _variadic(jnp.minimum, a),
    "cwiseMax": lambda *a: _variadic(jnp.maximum, a),
    "pow": jnp.power,
}


def _variadic(op, args):
    if not args:
        raise ExpressionError("min/max need at least one argument")
    out = args[0]
    for a in args[1:]:
        out = op(out, a)
    return out


# AST: nested tuples ('num', f) | ('var', name) | ('call', name, args) |
# ('bin', op, lhs, rhs) | ('neg', x)


class _Parser:
    def __init__(self, toks: List[_Tok], src: str):
        self.toks = toks
        self.pos = 0
        self.src = src

    def peek(self) -> _Tok | None:
        return self.toks[self.pos] if self.pos < len(self.toks) else None

    def take(self) -> _Tok:
        t = self.peek()
        if t is None:
            raise ExpressionError(f"unexpected end of expression: {self.src!r}")
        self.pos += 1
        return t

    def expect(self, text: str):
        t = self.take()
        if t.text != text:
            raise ExpressionError(
                f"expected {text!r}, got {t.text!r} in {self.src!r}"
            )

    def parse(self):
        node = self.expr()
        if self.peek() is not None:
            raise ExpressionError(
                f"trailing tokens at {self.peek().text!r} in {self.src!r}"
            )
        return node

    def expr(self):
        node = self.term()
        while (t := self.peek()) and t.text in "+-":
            self.take()
            node = ("bin", t.text, node, self.term())
        return node

    def term(self):
        node = self.unary()
        while (t := self.peek()) and t.text in "*/":
            self.take()
            node = ("bin", t.text, node, self.unary())
        return node

    def unary(self):
        neg = False
        while (t := self.peek()) and t.text in "+-" and t.kind == "op":
            self.take()
            neg ^= t.text == "-"
        node = self.power()
        return ("neg", node) if neg else node

    def power(self):
        node = self.atom()
        if (t := self.peek()) and t.text == "^":
            self.take()
            node = ("bin", "^", node, self.unary())  # right-assoc
        return node

    def atom(self):
        t = self.take()
        if t.kind == "num":
            return ("num", float(t.text))
        if t.kind == "name":
            if (nxt := self.peek()) and nxt.text == "(":
                self.take()
                args = [self.expr()]
                while (c := self.peek()) and c.text == ",":
                    self.take()
                    args.append(self.expr())
                self.expect(")")
                if t.text not in _FUNCS:
                    raise ExpressionError(f"unknown function {t.text!r}")
                return ("call", t.text, tuple(args))
            return ("var", t.text)
        if t.text == "(":
            node = self.expr()
            self.expect(")")
            return node
        raise ExpressionError(f"unexpected token {t.text!r} in {self.src!r}")


def parse(src: str):
    """Parse to an AST (hashable nested tuples — safe to close over in jit)."""
    return _Parser(_tokenize(src), src).parse()


def variables(ast) -> Tuple[str, ...]:
    """All layer-name variables referenced by the AST, in first-use order."""
    out: List[str] = []

    def walk(node):
        kind = node[0]
        if kind == "var" and node[1] not in out:
            out.append(node[1])
        elif kind == "call":
            for a in node[2]:
                walk(a)
        elif kind == "bin":
            walk(node[2])
            walk(node[3])
        elif kind == "neg":
            walk(node[1])

    walk(ast)
    return tuple(out)


def evaluate(ast, layers: Mapping[str, Array]) -> Array:
    """Evaluate the AST over layer planes (traced; coefficient-wise)."""

    def ev(node) -> Array:
        kind = node[0]
        if kind == "num":
            return jnp.float32(node[1])
        if kind == "var":
            name = node[1]
            if name not in layers:
                raise ExpressionError(
                    f"expression references unknown layer {name!r}; "
                    f"available: {sorted(layers)}"
                )
            return layers[name]
        if kind == "neg":
            return -ev(node[1])
        if kind == "call":
            return _FUNCS[node[1]](*[ev(a) for a in node[2]])
        op, lhs, rhs = node[1], ev(node[2]), ev(node[3])
        if op == "+":
            return lhs + rhs
        if op == "-":
            return lhs - rhs
        if op == "*":
            return lhs * rhs
        if op == "/":
            return lhs / rhs
        if op == "^":
            return jnp.power(lhs, rhs)
        raise ExpressionError(f"unknown operator {op!r}")

    return ev(ast)


def compile_expression(src: str) -> Callable[[Mapping[str, Array]], Array]:
    """Compile an expression string into a function over a layer dict."""
    ast = parse(src)

    def fn(layers: Mapping[str, Array]) -> Array:
        return evaluate(ast, layers)

    fn.variables = variables(ast)  # type: ignore[attr-defined]
    return fn

"""Expressions module — compiled arithmetic over doc-values fields and
the relevance score, the role of ``lucene/expressions``
(``lucene/expressions/src/java/org/apache/lucene/expressions/Expression.java``,
``SimpleBindings.java``, ``js/JavascriptCompiler.java``).

Clean-room design: a tiny recursive-descent parser compiles a JS-like
arithmetic expression into an AST evaluated with vectorized NumPy over
float64 arrays (Lucene expressions are ``DoubleValuesSource``s — all
math is double). Variables bind to doc-values columns or ``_score``;
functions mirror the ``JavascriptCompiler`` built-in table subset that
is meaningful for ranking (ln/log10/sqrt/abs/min/max/pow).

Grammar::

    expr   := term (("+" | "-") term)*
    term   := unary (("*" | "/") unary)*
    unary  := "-" unary | atom
    atom   := NUMBER | IDENT | IDENT "(" expr ("," expr)* ")" | "(" expr ")"

Used by ``IndexSearcher.search_expr`` as an expression *sort* — the
``ExpressionSortField`` surface (``expressions/ExpressionSortField.java``).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

import numpy as np

_TOKEN = re.compile(
    r"\s*(?:(?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"
    r"|(?P<ident>[A-Za-z_][A-Za-z0-9_]*)"
    r"|(?P<op>[-+*/(),]))"
)

FUNCTIONS = {
    "ln": np.log,
    "log10": np.log10,
    "sqrt": np.sqrt,
    "abs": np.abs,
    "min": np.minimum,
    "max": np.maximum,
    "pow": np.power,
}
_ARITY = {"ln": 1, "log10": 1, "sqrt": 1, "abs": 1, "min": 2, "max": 2, "pow": 2}


def _tokenize(src: str) -> List[Tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(src):
        m = _TOKEN.match(src, pos)
        if m is None or m.end() == pos:
            rest = src[pos:].strip()
            if not rest:
                break
            raise ValueError(f"expression syntax error at {rest[:20]!r}")
        pos = m.end()
        for kind in ("num", "ident", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    return out


class Expression:
    """Compiled expression: ``evaluate(bindings)`` maps variable-name →
    float64 ndarray bindings to a float64 ndarray (vectorized). The
    parse is done once (``JavascriptCompiler.compile`` role); evaluation
    is per match-set."""

    def __init__(self, source: str):
        self.source = source
        toks = _tokenize(source)
        self._pos = 0
        self._toks = toks
        self.ast = self._expr()
        if self._pos != len(toks):
            raise ValueError(
                f"trailing input in expression: {toks[self._pos:][:3]}"
            )
        self.variables = sorted(self._collect_vars(self.ast))

    # -- parser ------------------------------------------------------------

    def _peek(self):
        return self._toks[self._pos] if self._pos < len(self._toks) else (None, None)

    def _take(self, want_val=None):
        kind, val = self._peek()
        if kind is None or (want_val is not None and val != want_val):
            raise ValueError(
                f"expected {want_val!r}, got {val!r} in {self.source!r}"
            )
        self._pos += 1
        return kind, val

    def _expr(self):
        node = self._term()
        while self._peek() == ("op", "+") or self._peek() == ("op", "-"):
            _, op = self._take()
            node = (op, node, self._term())
        return node

    def _term(self):
        node = self._unary()
        while self._peek() == ("op", "*") or self._peek() == ("op", "/"):
            _, op = self._take()
            node = (op, node, self._unary())
        return node

    def _unary(self):
        if self._peek() == ("op", "-"):
            self._take()
            return ("neg", self._unary())
        return self._atom()

    def _atom(self):
        kind, val = self._peek()
        if kind == "num":
            self._take()
            return ("const", float(val))
        if kind == "ident":
            self._take()
            if self._peek() == ("op", "("):
                if val not in FUNCTIONS:
                    raise ValueError(
                        f"unknown function {val!r}; available: {sorted(FUNCTIONS)}"
                    )
                self._take("(")
                args = [self._expr()]
                while self._peek() == ("op", ","):
                    self._take(",")
                    args.append(self._expr())
                self._take(")")
                if len(args) != _ARITY[val]:
                    raise ValueError(
                        f"{val}() takes {_ARITY[val]} args, got {len(args)}"
                    )
                return ("call", val, args)
            return ("var", val)
        if (kind, val) == ("op", "("):
            self._take("(")
            node = self._expr()
            self._take(")")
            return node
        raise ValueError(f"unexpected token {val!r} in {self.source!r}")

    def _collect_vars(self, node) -> set:
        tag = node[0]
        if tag == "var":
            return {node[1]}
        if tag == "const":
            return set()
        if tag == "call":
            out = set()
            for a in node[2]:
                out |= self._collect_vars(a)
            return out
        if tag == "neg":
            return self._collect_vars(node[1])
        return self._collect_vars(node[1]) | self._collect_vars(node[2])

    # -- evaluation ----------------------------------------------------------

    def evaluate(self, bindings: Dict[str, np.ndarray]) -> np.ndarray:
        missing = [v for v in self.variables if v not in bindings]
        if missing:
            raise KeyError(f"unbound expression variables: {missing}")
        return self._eval(self.ast, bindings)

    def _eval(self, node, b):
        tag = node[0]
        if tag == "const":
            return np.float64(node[1])
        if tag == "var":
            return np.asarray(b[node[1]], dtype=np.float64)
        if tag == "neg":
            return -self._eval(node[1], b)
        if tag == "call":
            args = [self._eval(a, b) for a in node[2]]
            return FUNCTIONS[node[1]](*args)
        lhs = self._eval(node[1], b)
        rhs = self._eval(node[2], b)
        if tag == "+":
            return lhs + rhs
        if tag == "-":
            return lhs - rhs
        if tag == "*":
            return lhs * rhs
        return lhs / rhs

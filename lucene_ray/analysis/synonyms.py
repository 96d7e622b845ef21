"""Index-time synonym graph analysis — the role of Lucene's
``SynonymGraphFilter`` + ``FlattenGraphFilter``
(``lucene/analysis/common/src/java/org/apache/lucene/analysis/synonym/
SynonymGraphFilter.java``, ``.../core/FlattenGraphFilter.java``).

Rules use the public Solr synonym syntax:

- ``"a, b, c"`` — equivalence class: any member also indexes every other
  member at the same position (originals kept).
- ``"a b => x"`` / ``"a, b => x, y"`` — explicit mapping: the left-hand
  inputs are REPLACED by the right-hand outputs (originals dropped),
  multi-word inputs match consecutive tokens.

Matching is greedy-longest over the post-stop token stream, exactly the
FST longest-match discipline of the reference filter. Because this
engine's postings store one flat position per token (no posLength
column), the graph is flattened at emission — the same contract Lucene
imposes at index time via FlattenGraphFilter:

- a single-token output lands on the FIRST matched input's position
  (posInc 0 relative to a kept original — two terms share a position);
- the j-th token of a multi-token output lands on ``min(p0+j, pk)``
  where ``p0..pk`` are the matched input positions — sequential inside
  the span, clamped at its end (side-path positions interleave the
  trunk, Lucene flatten semantics);
- kept originals keep their own positions.

Emission is position-sorted, so every term's per-doc position list
stays ascending and the delta-gap postings encoder is untouched.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple


def _parse_side(side: str) -> List[Tuple[str, ...]]:
    """``"a b, c"`` → [("a","b"), ("c",)] — comma-separated phrases,
    whitespace-tokenized."""
    out = []
    for phrase in side.split(","):
        toks = tuple(phrase.strip().split())
        if toks:
            out.append(toks)
    return out


class SynonymGraphFilter:
    """Stream-level filter: ``(terms, positions) → (terms, positions)``.

    Built once per analyzer (→ once per build actor); ``apply`` is pure.
    The rule table is a dict keyed on each mapping's FIRST term, holding
    ``(input_tuple, outputs, keep_orig)`` entries sorted longest-first —
    the greedy FST match without the FST.
    """

    def __init__(self, rules: Sequence[str], lowercase: bool = True):
        table: Dict[str, List[Tuple[Tuple[str, ...], List[Tuple[str, ...]], bool]]] = {}

        def norm(t: Tuple[str, ...]) -> Tuple[str, ...]:
            return tuple(x.lower() for x in t) if lowercase else t

        for rule in rules:
            if "=>" in rule:
                lhs, rhs = rule.split("=>", 1)
                inputs = [norm(t) for t in _parse_side(lhs)]
                outputs = [norm(t) for t in _parse_side(rhs)]
                for inp in inputs:
                    table.setdefault(inp[0], []).append((inp, outputs, False))
            else:
                members = [norm(t) for t in _parse_side(rule)]
                for inp in members:
                    others = [m for m in members if m != inp]
                    if others:
                        table.setdefault(inp[0], []).append((inp, others, True))
        for k in table:
            # longest input first; then rule-definition order (stable)
            table[k].sort(key=lambda e: -len(e[0]))
        self.table = table

    def apply(
        self,
        terms: Sequence[str],
        positions: Optional[Sequence[int]],
        offsets: Optional[Sequence[Tuple[int, int]]] = None,
    ):
        """→ ``(terms, positions[, offsets])`` with synonyms woven in.

        ``positions=None`` means dense 0..n-1. When ``offsets`` is given
        (the full ``analyze`` path), synonym tokens get the character
        span of their matched inputs, as the reference filter does.
        """
        table = self.table
        n = len(terms)
        pos = positions if positions is not None else range(n)
        # (position, tiebreak, term, start, end); tiebreak 0 = original,
        # 1+ = synonym emission order at the same position
        emitted: List[Tuple[int, int, str, int, int]] = []
        i = 0
        while i < n:
            t = terms[i]
            entries = table.get(t)
            match = None
            if entries:
                for inp, outputs, keep in entries:
                    if len(inp) <= n - i and tuple(terms[i : i + len(inp)]) == inp:
                        match = (inp, outputs, keep)
                        break
            if match is None:
                s, e = offsets[i] if offsets is not None else (0, 0)
                emitted.append((pos[i], 0, t, s, e))
                i += 1
                continue
            inp, outputs, keep = match
            k = len(inp) - 1
            p0, pk = pos[i], pos[i + k]
            if offsets is not None:
                span_s = offsets[i][0]
                span_e = offsets[i + k][1]
            else:
                span_s = span_e = 0
            if keep:
                for j in range(len(inp)):
                    s, e = offsets[i + j] if offsets is not None else (0, 0)
                    emitted.append((pos[i + j], 0, terms[i + j], s, e))
            for oi, out in enumerate(outputs):
                for j, w in enumerate(out):
                    emitted.append(
                        (min(p0 + j, pk), 1 + oi, w, span_s, span_e)
                    )
            i += len(inp)
        emitted.sort(key=lambda e: (e[0], e[1]))
        out_terms = [e[2] for e in emitted]
        out_pos = [e[0] for e in emitted]
        if offsets is not None:
            return out_terms, out_pos, [(e[3], e[4]) for e in emitted]
        return out_terms, out_pos


def resolve_graph_filters(specs: Sequence) -> Tuple[SynonymGraphFilter, ...]:
    """Config plumbing: each spec is a tuple/list of Solr-syntax rule
    strings (JSON-serializable in ``IndexConfig``) → one built filter."""
    return tuple(
        s if isinstance(s, SynonymGraphFilter) else SynonymGraphFilter(list(s))
        for s in specs
    )

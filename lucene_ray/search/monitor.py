"""MemoryIndex + Monitor — reverse search (percolation) for document
streams.

Two reference modules, one Ray-idiomatic feature:

- ``lucene/memory/src/java/org/apache/lucene/index/memory/MemoryIndex.java``
  — a transient in-heap index over ONE document, built to ask "does this
  doc match this query" without touching a real index. Here it
  generalizes to a BATCH of documents (the unit Ray Data hands a
  worker): one ``invert_texts`` pass builds sorted per-term postings +
  positions for the whole batch, and every query evaluates vectorized
  over all batch docs at once.
- ``lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java`` —
  register many queries once, stream documents through, emit (doc,
  matching query) pairs. The reference prunes with a *presearcher*
  (``TermFilteredPresearcher.java``: a query only runs against a doc
  that contains one of the query's extracted trigger terms); here the
  trigger check prunes at BATCH granularity (skip a query when no doc
  in the batch holds any trigger term — one bisect per trigger against
  the batch's sorted term dictionary), then the per-doc match set comes
  from the vectorized evaluation. Same safety argument: a matching doc
  must contain a trigger term, so a batch with none cannot match.

Deployment shape: a ``map_batches`` actor holds the ``Monitor`` (queries
registered once in ``__init__``), each batch builds its ``MemoryIndex``
and streams out (doc, query) pairs — the percolation stage of an
ingestion pipeline (route crawl docs to topic subscriptions). Matching
is boolean (match sets, no scores), like the reference Monitor's
default ``QueryMatch`` mode.
"""

from __future__ import annotations

import bisect
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.index.segment import invert_texts
from lucene_ray.search.intervals import (
    eval_source as _interval_eval,
    required_terms as _interval_required,
    source_terms as _interval_terms,
)
from lucene_ray.search.query import (
    FILTER,
    IntervalQuery,
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    TermQuery,
    TermRangeQuery,
    localize_query,
    parse_query,
)
from lucene_ray.search.sloppy import sloppy_phrase_freq

DEFAULT_FIELD = "text"
_EMPTY = np.empty(0, np.int64)


class MemoryIndex:
    """Inverted view of one document batch: sorted terms, per-term
    (docid, tf) pairs, term-major positions; optional keyword columns
    (exact-match fields like ``lang``) evaluated by value equality."""

    def __init__(
        self,
        texts: Sequence[Optional[str]],
        analyzer: Optional[Analyzer] = None,
        keyword_cols: Optional[Dict[str, Sequence[str]]] = None,
        with_positions: bool = True,
    ):
        self.n_docs = len(texts)
        inv = invert_texts(
            list(texts), analyzer or Analyzer(), with_positions
        )
        self.inv = inv
        self.terms: List[str] = inv.terms.to_pylist()
        # per-(term,doc) position offsets: positions are term-major,
        # doc-ascending within a term, tf positions per pair
        if inv.positions is not None:
            self._pair_pos_starts = np.zeros(
                len(inv.pair_docids) + 1, dtype=np.int64
            )
            np.cumsum(inv.pair_tfs, out=self._pair_pos_starts[1:])
        else:
            self._pair_pos_starts = None
        self.keyword_cols = {
            f: np.asarray(v, dtype=object)
            for f, v in (keyword_cols or {}).items()
        }

    # -- dictionary --------------------------------------------------------

    def term_index(self, term: str) -> Optional[int]:
        i = bisect.bisect_left(self.terms, term)
        if i < len(self.terms) and self.terms[i] == term:
            return i
        return None

    def has_any_term(self, terms) -> bool:
        return any(self.term_index(t) is not None for t in terms)

    def postings(self, term: str) -> Tuple[np.ndarray, np.ndarray, int]:
        """→ (docids int64, tfs, term_idx); empty when absent."""
        ti = self.term_index(term)
        if ti is None:
            return _EMPTY, _EMPTY, -1
        s, e = self.inv.term_starts[ti], self.inv.term_starts[ti + 1]
        return (
            self.inv.pair_docids[s:e].astype(np.int64),
            self.inv.pair_tfs[s:e],
            ti,
        )

    def positions_of(self, term_idx: int, pair_slot: int) -> np.ndarray:
        """Positions of one (term, doc) pair (pair_slot is the absolute
        index into the pair arrays)."""
        ps, pe = (
            self._pair_pos_starts[pair_slot],
            self._pair_pos_starts[pair_slot + 1],
        )
        return self.inv.positions[ps:pe].astype(np.int64)

    # -- boolean match evaluation ------------------------------------------

    def match(self, q: Query) -> np.ndarray:
        """Sorted int64 docids of batch docs matching ``q`` (match set
        only — the Monitor contract; no scores)."""
        if isinstance(q, str):
            q = parse_query(q)
        else:
            # identity-normalize (pickle-by-value ships a second copy of
            # every Query class; see query.localize_query)
            q = localize_query(q)
        return self._match(q)

    def _match(self, q: Query) -> np.ndarray:
        if isinstance(q, TermQuery):
            if q.field != DEFAULT_FIELD:
                vals = self.keyword_cols.get(q.field)
                if vals is None:
                    return _EMPTY
                return np.flatnonzero(vals == q.term).astype(np.int64)
            return self.postings(q.term)[0]
        if isinstance(q, MatchAllQuery):
            return np.arange(self.n_docs, dtype=np.int64)
        if isinstance(q, PhraseQuery):
            return self._match_phrase(q)
        if isinstance(q, PrefixQuery):
            return self._match_term_scan(
                lo=q.prefix, hi=q.prefix + "\U0010ffff", field=q.field
            )
        if isinstance(q, TermRangeQuery):
            return self._match_term_scan(
                lo=q.lower, hi=q.upper, field=q.field,
                include_lo=q.include_lower, include_hi=q.include_upper,
            )
        if isinstance(q, IntervalQuery):
            return self._match_interval(q)
        if isinstance(q, BooleanQuery):
            return self._match_bool(q)
        raise TypeError(
            f"MemoryIndex matching does not support {type(q).__name__}"
        )

    def _match_term_scan(
        self, lo, hi, field, include_lo=True, include_hi=True
    ) -> np.ndarray:
        if field != DEFAULT_FIELD:
            vals = self.keyword_cols.get(field)
            if vals is None:
                return _EMPTY
            keep = np.ones(len(vals), dtype=bool)
            if lo is not None:
                keep &= (vals > lo) | ((vals == lo) & include_lo)
            if hi is not None:
                keep &= (vals < hi) | ((vals == hi) & include_hi)
            return np.flatnonzero(keep).astype(np.int64)
        i = (
            0
            if lo is None
            else (
                bisect.bisect_left(self.terms, lo)
                if include_lo
                else bisect.bisect_right(self.terms, lo)
            )
        )
        sets = []
        while i < len(self.terms):
            t = self.terms[i]
            if hi is not None and (t > hi or (t == hi and not include_hi)):
                break
            s, e = self.inv.term_starts[i], self.inv.term_starts[i + 1]
            sets.append(self.inv.pair_docids[s:e].astype(np.int64))
            i += 1
        if not sets:
            return _EMPTY
        return np.unique(np.concatenate(sets))

    def _match_phrase(self, q: PhraseQuery) -> np.ndarray:
        if self.inv.positions is None:
            raise ValueError("phrase matching needs with_positions=True")
        per_term = []
        for t in q.terms:
            ids, tfs, ti = self.postings(t)
            if len(ids) == 0:
                return _EMPTY
            s = self.inv.term_starts[ti]
            per_term.append((ids, tfs, ti, s))
        # candidate docs: in every term's postings
        cand = per_term[0][0]
        for ids, *_ in per_term[1:]:
            cand = cand[np.isin(cand, ids, assume_unique=True)]
        out = []
        for d in cand:
            pos_lists = []
            for ids, tfs, ti, s in per_term:
                slot = s + int(np.searchsorted(ids, d))
                pos_lists.append(self.positions_of(ti, slot))
            if q.slop == 0:
                # exact: any start where every slot has pos0 + i
                starts = pos_lists[0]
                ok = False
                for st in starts:
                    if all(
                        (pl == st + i).any()
                        for i, pl in enumerate(pos_lists)
                    ):
                        ok = True
                        break
                if ok:
                    out.append(int(d))
            else:
                if sloppy_phrase_freq(q.terms, pos_lists, q.slop) > 0:
                    out.append(int(d))
        return np.array(out, dtype=np.int64)

    def _match_interval(self, q: IntervalQuery) -> np.ndarray:
        """IntervalQuery over the transient batch view: per candidate
        doc, term positions feed the minimal-interval kernels
        (search/intervals.py); match = any interval survives. Matches
        the segmented searcher's _eval_interval match set (tested)."""
        if self._pair_pos_starts is None:
            raise ValueError(
                "IntervalQuery matching needs with_positions=True"
            )
        terms = _interval_terms(q.source)
        per_term = []
        for t in terms:
            ids, _, ti = self.postings(t)
            start = int(self.inv.term_starts[ti]) if ti >= 0 else 0
            per_term.append((ids, ti, start))
        req = _interval_required(q.source)
        by_term = {t: p for t, p in zip(terms, per_term)}
        if req:
            if any(by_term[t][1] < 0 for t in req):
                return _EMPTY
            cand = by_term[req[0]][0]
            for t in req[1:]:
                cand = np.intersect1d(cand, by_term[t][0], assume_unique=True)
        else:
            doc_sets = [p[0] for p in per_term if p[1] >= 0]
            if not doc_sets:
                return _EMPTY
            cand = np.unique(np.concatenate(doc_sets))
        no_pos = np.empty(0, dtype=np.int64)
        out = []
        for d in cand:
            d = int(d)
            pls = {}
            for t, (ids, ti, start) in zip(terms, per_term):
                j = int(np.searchsorted(ids, d)) if ti >= 0 else 0
                if ti < 0 or j >= len(ids) or int(ids[j]) != d:
                    pls[t] = no_pos
                else:
                    pls[t] = self.positions_of(ti, start + j)
            iv, _ = _interval_eval(q.source, pls)
            if iv:
                out.append(d)
        return np.array(out, dtype=np.int64)

    def _match_bool(self, q: BooleanQuery) -> np.ndarray:
        req = [self._match(s) for o, s in q.clauses if o in (MUST, FILTER)]
        should = [self._match(s) for o, s in q.clauses if o == SHOULD]
        nots = [self._match(s) for o, s in q.clauses if o == MUST_NOT]
        if req:
            cand = req[0]
            for r in req[1:]:
                cand = cand[np.isin(cand, r, assume_unique=True)]
        elif should:
            cand = (
                np.unique(np.concatenate(should)) if should else _EMPTY
            )
        else:
            return _EMPTY
        need = q.minimum_should_match if req else max(
            1, q.minimum_should_match
        )
        if should and need > 0:
            count = np.zeros(len(cand), dtype=np.int32)
            for r in should:
                count += np.isin(cand, r, assume_unique=True)
            cand = cand[count >= need]
        for r in nots:
            cand = cand[~np.isin(cand, r, assume_unique=True)]
        return cand


def trigger_terms(q: Query) -> Optional[frozenset]:
    """The presearcher's extracted term set
    (``TermFilteredPresearcher.java:60-95`` via ``QueryAnalyzer``): a doc
    matching ``q`` must contain at least one of these TEXT terms. ``None``
    = cannot prune (match-all, pure-keyword, multi-term expansions)."""
    if isinstance(q, TermQuery):
        return frozenset([q.term]) if q.field == DEFAULT_FIELD else None
    if isinstance(q, PhraseQuery):
        # every phrase term is required — anchor on the first
        return frozenset([q.terms[0]])
    if isinstance(q, IntervalQuery):
        # any single REQUIRED leaf is a valid trigger (smallest set
        # prunes hardest); nothing required ('or' at the top) → every
        # match still contains all leaves of SOME branch, so the union
        # of all leaves is a valid trigger superset
        req = _interval_required(q.source)
        return (
            frozenset([req[0]])
            if req
            else frozenset(_interval_terms(q.source))
        )
    if isinstance(q, BooleanQuery):
        # ANY single MUST/FILTER clause's triggers suffice (conjunction:
        # doc must match every clause); pick the first prunable one.
        # Disjunctions need the UNION of every SHOULD clause's triggers —
        # unprunable if any clause is.
        for o, s in q.clauses:
            if o in (MUST, FILTER):
                t = trigger_terms(s)
                if t is not None:
                    return t
        if any(o in (MUST, FILTER) for o, _ in q.clauses):
            return None  # required clauses exist but none prunable
        out = set()
        for o, s in q.clauses:
            if o != SHOULD:
                continue
            t = trigger_terms(s)
            if t is None:
                return None
            out |= t
        return frozenset(out) if out else None
    return None


class Monitor:
    """Registered-query store + batch percolation
    (``monitor/Monitor.java:40-108`` ``match(Document[], ...)``)."""

    def __init__(self, analyzer: Optional[Analyzer] = None):
        self.analyzer = analyzer or Analyzer()
        self._queries: Dict = {}

    def register(self, query_id, query) -> None:
        if isinstance(query, str):
            query = parse_query(query, self.analyzer)
        else:
            query = localize_query(query)
        self._queries[query_id] = (query, trigger_terms(query))

    def match_batch(self, mem: MemoryIndex) -> List[Tuple[int, object]]:
        """→ (doc_idx, query_id) pairs for every match in the batch.
        Queries whose trigger terms are all absent from the batch's
        dictionary are skipped without evaluation."""
        out: List[Tuple[int, object]] = []
        for qid, (q, triggers) in self._queries.items():
            if triggers is not None and not mem.has_any_term(triggers):
                continue
            for d in mem.match(q):
                out.append((int(d), qid))
        return out

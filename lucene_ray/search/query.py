"""Query plans + a mini query parser.

Plan nodes mirror the reference's query types (``core/search/TermQuery.java``,
``BooleanQuery.java``, ``PhraseQuery.java:71-95``; clause occurs
``BooleanClause.java``: MUST ∧, SHOULD ∪(+score), MUST_NOT ∖, FILTER ∧
unscored). The parser covers the subset the reference query sets use
(``lucene/benchmark/conf/query-terms.txt``, ``query-phrases.txt``):
terms, ``+required``, ``-prohibited``, quoted phrases, ``term^boost``.
Query text is analyzed with the same analyzer as indexing
(``lucene/queryparser/.../classic/QueryParserBase.java:62,130``).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Tuple, Union

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.analysis.lowercase import simple_lowercase
from lucene_ray.index.config import term_key
from lucene_ray.search.intervals import source_terms

SHOULD = "SHOULD"
MUST = "MUST"
MUST_NOT = "MUST_NOT"
FILTER = "FILTER"


@dataclass(frozen=True)
class TermQuery:
    """Single-term query. ``field`` defaults to the tokenized text field;
    other fields are StringField-style keywords whose values were indexed
    verbatim (``core/search/TermQuery.java``, field-scoped per
    ``QueryParser.jj:105`` ``field:term`` syntax)."""

    term: str
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class PhraseQuery:
    terms: Tuple[str, ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class MultiPhraseQuery:
    """Phrase with ALTERNATIVE terms per position slot
    (``core/search/MultiPhraseQuery.java``): a doc matches where every
    slot has one of its terms at the right relative position — each slot
    evaluates as the union of its members' postings+positions
    (``MultiPhraseQuery.UnionPostingsEnum``, :412). Scoring = BM25 with
    idf summed over every term OCCURRENCE with df > 0 (a term listed in
    two slots contributes twice, ``MultiPhraseQuery.java:219-236``) at
    the phrase freq. ``slop`` routes through the sloppy matcher with
    each slot as one atomic pseudo-term — the same granularity the
    reference's SloppyPhraseMatcher sees (one ``PhrasePositions`` per
    UnionPostingsEnum); repeat detection keys on identical slot term
    sets, so partially-overlapping slots are treated as distinct
    (documented divergence, exotic even in the reference)."""

    positions: Tuple[Tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class MatchAllQuery:
    boost: float = 1.0


@dataclass(frozen=True)
class RangeQuery:
    """Doc-values range filter (``core/document/LongPoint.java`` /
    ``PointRangeQuery`` role): matches docs whose ``field`` DV column
    falls in [lo, hi] (None = unbounded). Constant-score: every match
    scores ``boost`` (``ConstantScoreQuery`` semantics)."""

    field: str
    lo: Optional[object] = None
    hi: Optional[object] = None
    include_lo: bool = True
    include_hi: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class GeoBoxQuery:
    """Geo-point box filter (``LatLonPoint.newBoxQuery``,
    ``core/document/LatLonPoint.java``): matches docs whose quantized
    point for ``field`` (an ``IndexConfig.geo_cols`` entry) lies inside
    the quantized degree box, inclusive edges. Constant-score.
    Evaluated against the segment's morton-block geo sidecar
    (index/geo.py) — only blocks overlapping the box are touched."""

    field: str
    min_lat: float
    max_lat: float
    min_lon: float
    max_lon: float
    boost: float = 1.0


@dataclass(frozen=True)
class GeoDistanceQuery:
    """Geo-point distance filter (``LatLonPoint.newDistanceQuery``,
    ``core/search/LatLonPointDistanceQuery.java``): haversine distance
    from (lat, lon) to the doc's DECODED quantized point <= radius_m.
    Circle-bbox block prune + exact refine. Constant-score."""

    field: str
    lat: float
    lon: float
    radius_m: float
    boost: float = 1.0


@dataclass(frozen=True)
class RangeFieldQuery:
    """Interval-field relation filter (``core/search/RangeFieldQuery.java:60-114``
    QueryType over an ``IndexConfig.range_cols`` field): the doc interval
    [lo, hi] must INTERSECTS / WITHIN / CONTAINS / CROSSES the query
    interval [a, b], inclusive bounds. Constant-score. Evaluated against
    the segment's lo-sorted interval sidecar (index/ranges.py)."""

    field: str
    relation: str  # intersects | within | contains | crosses
    a: int
    b: int
    boost: float = 1.0


@dataclass(frozen=True)
class PrefixQuery:
    """Terms starting with ``prefix`` (``core/search/PrefixQuery.java``),
    expanded against the term dictionary at evaluation and matched
    constant-score (``MultiTermQuery`` constant-score rewrite)."""

    prefix: str
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class WildcardQuery:
    """``*`` = any run, ``?`` = one char (``core/search/WildcardQuery.java``).
    The literal head before the first wildcard bounds the dictionary scan."""

    pattern: str
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class FuzzyQuery:
    """Terms within ``max_edits`` Damerau-Levenshtein edits
    (``core/search/FuzzyQuery.java``; edit distance via dictionary scan +
    banded DP instead of Levenshtein automata —
    ``IntersectTermsEnum.java`` noted as the reference mechanism).
    ``transpositions=True`` counts adjacent swaps as one edit using FULL
    Damerau (matching DuckDB ``damerau_levenshtein`` so the oracle is
    expressible; the reference uses optimal-string-alignment, which
    differs only on pathological pairs like ``ca``→``abc``). Uncapped
    expansion, constant-score (the reference's default fuzzy rewrite
    keeps the 50 closest terms and blends scores — documented
    divergence)."""

    term: str
    max_edits: int = 2
    prefix_length: int = 0
    transpositions: bool = True
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class RegexpQuery:
    """Terms matching a regular expression against the WHOLE term
    (``core/search/RegexpQuery.java``: anchored automaton match over the
    dictionary, constant-score rewrite like the other MultiTermQuery
    family members). Pattern syntax here is Python ``re`` (documented
    divergence from the reference's ``RegExp`` dialect; the shared core —
    classes, alternation, quantifiers, anchored match — is identical)."""

    regexp: str
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class TermRangeQuery:
    """Lexicographic term range over the dictionary
    (``core/search/TermRangeQuery.java:33-58``): all terms with
    ``lower <= term <= upper`` (bound inclusivity per flags, ``None`` =
    open), constant-score rewrite like the rest of the MultiTermQuery
    family. With range-partitioned term buckets the expansion touches
    only the buckets overlapping [lower, upper]."""

    lower: Optional[str]
    upper: Optional[str]
    include_lower: bool = True
    include_upper: bool = True
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class SynonymQuery:
    """Terms scored as ONE pseudo-term (``core/search/SynonymQuery.java``):
    per doc the frequencies of all variants sum, the document frequency
    is the max variant df (never more than every doc once), total term
    freq the sum — so synonyms don't out-score a plain term."""

    terms: Tuple[str, ...]
    boost: float = 1.0
    field: str = "text"


@dataclass(frozen=True)
class CombinedFieldQuery:
    """One term scored against a SYNTHETIC field that is the
    weight-blended union of several tokenized fields — BM25F
    (``core/search/CombinedFieldQuery.java:46-80``): pseudo term stats
    take ``df = max`` over fields and ``ttf = Σ weight·ttf``; pseudo
    collection stats take ``docCount/maxDoc/sumDocFreq = max`` and
    ``sumTotalTermFreq = Σ weight·sumTtf``; per doc the frequency is
    ``Σ weight·tf_field`` and the norm re-encodes
    ``round(Σ weight·decoded_norm_field)`` through SmallFloat
    (``MultiNormsLeafSimScorer.java:168-180``). Weights must be ≥ 1
    (``CombinedFieldQuery.Builder.addField``)."""

    term: str
    fields: Tuple[Tuple[str, float], ...]  # (field, weight), field-sorted
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(
            self, "fields", tuple(sorted((f, float(w)) for f, w in self.fields))
        )
        for f, w in self.fields:
            if w < 1:
                raise ValueError(f"field weight must be >= 1, got {f}={w}")


@dataclass(frozen=True)
class FeatureQuery:
    """Score docs from a FeatureField term's custom freq — the reference's
    ``FeatureField.newLinearQuery / newLogQuery / newSaturationQuery /
    newSigmoidQuery`` (``core/document/FeatureField.java:585-683``) over a
    fork ``DOCS_AND_CUSTOM_FREQS`` posting list. Matches every doc that
    has the feature; score = function(decoded value), exact float algebra
    in ``codecs/feature.feature_scores``.

    - ``function="linear"``: ``w * S``
    - ``function="log"``:    ``w * log(scale + S)``
    - ``function="satu"``:   ``w * (1 - pivot/(S + pivot))``
    - ``function="sigmoid"``: ``w * (1 - pivot^exp/(S^exp + pivot^exp))``
    """

    feature: str
    function: str = "satu"
    weight: float = 1.0
    pivot: float = 1.0
    scale: float = 1.0
    exp: float = 1.0
    field: str = "features"


@dataclass(frozen=True)
class TermInSetQuery:
    """Document matches if ``field`` holds ANY of ``terms`` — the
    set-filter form of a big keyword-term disjunction
    (``core/search/TermInSetQuery.java:48-74``: constant-score rewrite,
    never scored per-term). Evaluation unions the exact postings of the
    member terms; score = ``boost`` for every match."""

    field: str
    terms: Tuple[str, ...]
    boost: float = 1.0

    def __post_init__(self):
        object.__setattr__(self, "terms", tuple(sorted(set(self.terms))))


@dataclass(frozen=True)
class ConstantScoreQuery:
    """Wraps any query; every match scores exactly ``boost``
    (``core/search/ConstantScoreQuery.java:28-45``) — the scoring
    firewall that lets an expensive scored sub-plan act as a filter."""

    query: "Query"
    boost: float = 1.0


@dataclass(frozen=True)
class DisjunctionMaxQuery:
    """Per doc: score = max(sub-scores) + tie_breaker · Σ(other
    sub-scores), accumulated in double and narrowed to float32 at the
    end (``core/search/DisjunctionMaxQuery.java:40-70``,
    ``DisjunctionMaxScorer`` ``score(DisiWrapper)``) — the
    best-field-wins combiner for multi-field keyword search."""

    disjuncts: Tuple["Query", ...]
    tie_breaker: float = 0.0


@dataclass(frozen=True)
class SpanNearQuery:
    """Proximity: all ``terms`` occur within ``slop`` total positional
    gaps, optionally in order (``lucene/queries/.../spans/SpanNearQuery
    .java:47-76``; ordered matching per ``NearSpansOrdered.java`` —
    span width − n_terms ≤ slop with strictly increasing positions;
    unordered per ``NearSpansUnordered.java`` — minimal enclosing window
    over one occurrence of each term). Matches are CONSTANT-SCORE
    (boost) here: the reference's span scoring (sloppyFreq over the
    span stream) is intentionally not reproduced — documented
    divergence, match SET is exact."""

    terms: Tuple[str, ...]
    slop: int = 0
    in_order: bool = True
    boost: float = 1.0


@dataclass(frozen=True)
class IntervalQuery:
    """Minimal-interval proximity scoring — ``lucene/queries/intervals``
    (``IntervalQuery.java:71-84``): docs score by the saturation of
    their minimal-interval sloppy freq (``IntervalScorer.java:60-69``).
    ``source`` is a tuple spec over TERM leaves — see
    ``search/intervals.py`` for syntax, kernels, and the scoped subset.
    Text-field only (needs positions)."""

    source: tuple
    pivot: float = 1.0
    boost: float = 1.0


@dataclass(frozen=True)
class CoveringQuery:
    """Per-document minimum-should-match — ``CoveringQuery``
    (``lucene/sandbox/src/java/org/apache/lucene/search/CoveringQuery
    .java``): a doc matches when the number of matching sub-queries is
    ≥ a per-doc minimum read from a values source, and scores the SUM
    of its matching sub-queries' scores. ``min_match_expr`` is an
    expressions-module arithmetic over doc-values fields (the
    ``LongValuesSource.fromDoubleValuesSource`` shape): evaluated in
    float64, floored to long, clamped to ≥ 1 like the reference."""

    queries: Tuple["Query", ...]
    min_match_expr: str


@dataclass(frozen=True)
class BooleanQuery:
    clauses: Tuple[Tuple[str, "Query"], ...]  # (occur, sub)
    minimum_should_match: int = 0


@dataclass(frozen=True)
class JoinQuery:
    """Query-time join — ``JoinUtil.createJoinQuery`` (ScoreMode.NONE,
    ``lucene/join/src/java/org/apache/lucene/search/join/JoinUtil.java:61-107``):
    run ``from_query``, collect the distinct ``from_field`` doc values of
    its match set, and match every document whose ``to_field`` holds one
    of them. Rewritten by the searcher into a keyword-term disjunction
    (the reference's TermsQuery role), so it composes with every
    downstream evaluation path."""

    from_query: str
    from_field: str
    to_field: str
    boost: float = 1.0


Query = Union[
    TermQuery,
    PhraseQuery,
    BooleanQuery,
    MatchAllQuery,
    RangeQuery,
    PrefixQuery,
    WildcardQuery,
    FuzzyQuery,
    RegexpQuery,
    SynonymQuery,
    CombinedFieldQuery,
    JoinQuery,
    TermInSetQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    SpanNearQuery,
]


def rewrite(q: Query) -> Query:
    """Normalization pass (``Query.rewrite``): 1-clause SHOULD/MUST boolean
    → the clause itself; 1-term phrase → term."""
    if isinstance(q, BooleanQuery):
        clauses = tuple((o, rewrite(s)) for o, s in q.clauses)
        if len(clauses) == 1 and clauses[0][0] in (SHOULD, MUST) and q.minimum_should_match <= 1:
            return clauses[0][1]
        return BooleanQuery(clauses, q.minimum_should_match)
    if isinstance(q, PhraseQuery) and len(q.terms) == 1:
        return TermQuery(q.terms[0], q.boost)
    if isinstance(q, MultiPhraseQuery):
        # MultiPhraseQuery.rewrite (:182-194): 0 slots → match nothing;
        # 1 slot → SHOULD disjunction of its terms; singleton slots →
        # plain PhraseQuery (identical stats and matcher)
        if len(q.positions) == 0:
            return BooleanQuery(())
        if len(q.positions) == 1:
            return BooleanQuery(
                tuple((SHOULD, TermQuery(t, q.boost)) for t in q.positions[0])
            )
        if all(len(slot) == 1 for slot in q.positions):
            return PhraseQuery(
                tuple(slot[0] for slot in q.positions), q.slop, q.boost
            )
        return q
    if isinstance(q, DisjunctionMaxQuery):
        subs = tuple(rewrite(s) for s in q.disjuncts)
        if len(subs) == 1:
            return subs[0]  # DisjunctionMaxQuery.rewrite single-clause
        return DisjunctionMaxQuery(subs, q.tie_breaker)
    if isinstance(q, ConstantScoreQuery):
        return ConstantScoreQuery(rewrite(q.query), q.boost)
    return q


_CLAUSE_RE = re.compile(
    r"""
    (?P<occur>[+\-\#]?)
    (?:(?P<field>[A-Za-z_][A-Za-z0-9_]*):)?
    (?:
        "(?P<phrase>[^"]*)"(?:~(?P<slop>\d+))?
      | /(?P<regexp>[^/]*)/
      | \[(?P<rlo>[^\s\]]+)\ TO\ (?P<rhi>[^\s\]]+)\]
      | (?P<word>[^\s"^~()]+)(?:~(?P<fedits>\d+))?
    )
    (?:\^(?P<boost>\d+(?:\.\d+)?))?
    """,
    re.VERBOSE,
)


def _range_bound(tok: str):
    """``*`` = unbounded; numeric if it parses, else the raw string."""
    if tok == "*":
        return None
    try:
        return int(tok)
    except ValueError:
        try:
            return float(tok)
        except ValueError:
            return tok


def _atom_query(m, analyzer) -> Optional[Tuple[str, bool, "Query"]]:
    """One ``_CLAUSE_RE`` match → (occur, occur_explicit, query); None if
    the atom analyzes away (stopword-only, empty)."""
    occur = {"+": MUST, "-": MUST_NOT, "#": FILTER, "": SHOULD}[
        m.group("occur")
    ]
    explicit = bool(m.group("occur"))
    boost = float(m.group("boost") or 1.0)
    fieldname = m.group("field") or "text"
    if m.group("phrase") is not None:
        terms = [t for t, *_ in analyzer.analyze(m.group("phrase"))]
        if not terms:
            return None
        slop = int(m.group("slop") or 0)
        q: Query = PhraseQuery(tuple(terms), slop=slop, boost=boost)
    elif m.group("regexp") is not None:
        # /re/ — anchored regexp over the term dictionary (classic
        # QueryParser regexp syntax, QueryParser.jj REGEXPTERM)
        q = RegexpQuery(m.group("regexp"), boost=boost, field=fieldname)
    elif m.group("rlo") is not None:
        lo = _range_bound(m.group("rlo"))
        hi = _range_bound(m.group("rhi"))
        if isinstance(lo, str) or isinstance(hi, str):
            # non-numeric bound → lexicographic TermRangeQuery (the
            # classic parser's range IS a term range,
            # ``QueryParser.jj:105``); numeric bounds keep the
            # doc-values RangeQuery (points role)
            low = (
                simple_lowercase if fieldname == "text" else (lambda s: s)
            )
            lo_s = None if lo is None else low(str(lo))
            hi_s = None if hi is None else low(str(hi))
            q = TermRangeQuery(lo_s, hi_s, boost=boost, field=fieldname)
        else:
            q = RangeQuery(fieldname, lo=lo, hi=hi, boost=boost)
    elif m.group("fedits") is not None:
        # fuzzy: the term is lowercased, not tokenized (classic parser
        # lowercase_expanded_terms behavior), capped at 2 edits
        word = m.group("word")
        if fieldname == "text":
            word = simple_lowercase(word)
        q = FuzzyQuery(
            word,
            max_edits=min(2, int(m.group("fedits"))),
            boost=boost,
            field=fieldname,
        )
    elif "*" in m.group("word") or "?" in m.group("word"):
        word = m.group("word")
        if fieldname == "text":
            word = simple_lowercase(word)
        if word.endswith("*") and "?" not in word and "*" not in word[:-1]:
            q = PrefixQuery(word[:-1], boost=boost, field=fieldname)
        else:
            q = WildcardQuery(word, boost=boost, field=fieldname)
    elif fieldname != "text":
        # keyword field: the value indexes verbatim, so match verbatim
        q = TermQuery(m.group("word"), boost=boost, field=fieldname)
    else:
        terms = [t for t, *_ in analyzer.analyze(m.group("word"))]
        if not terms:
            return None
        if len(terms) == 1:
            q = TermQuery(terms[0], boost=boost)
        else:
            # analyzed multi-token word (e.g. "3.a") → phrase, classic
            # QueryParser behavior
            q = PhraseQuery(tuple(terms), boost=boost)
    return occur, explicit, q


def _boost_into(q: "Query", b: float) -> "Query":
    """Distribute a group boost ``(...)^b`` into scoring leaves — this
    engine's BooleanQuery scores the SUM of clause scores, so multiplying
    each scoring leaf's boost equals the reference's BoostQuery wrapper
    multiplying the sum."""
    import dataclasses

    if b == 1.0:
        return q
    if isinstance(q, BooleanQuery):
        return BooleanQuery(
            tuple(
                (o, _boost_into(s, b) if o in (SHOULD, MUST) else s)
                for o, s in q.clauses
            ),
            q.minimum_should_match,
        )
    if hasattr(q, "boost"):
        return dataclasses.replace(q, boost=q.boost * b)
    return q


_KEYWORD_RE = re.compile(
    r"(?:(AND|&&)|(OR|\|\|)|(NOT))(?=[\s(+\-#!\"]|$)|(!)"
)
_GROUP_OPEN_RE = re.compile(r"(?P<occur>[+\-#]?)\(")
_GROUP_BOOST_RE = re.compile(r"\^(\d+(?:\.\d+)?)")


def _parse_seq(text: str, pos: int, analyzer, depth: int):
    """Recursive clause-sequence parser with the classic QueryParser's
    conjunction semantics (``QueryParser.jj:105`` Query/Clause/Conjunction
    productions + ``QueryParserBase.addClause``): ``AND`` promotes BOTH
    its operands to MUST (unless explicitly signed), ``OR`` leaves
    SHOULD, ``NOT``/``!`` prohibits the next clause; parenthesized groups
    nest and accept ``^boost``. → (clauses, next_pos)."""
    clauses: List[List] = []  # [occur, query, explicit]
    conj = None  # pending AND between previous and next clause
    neg = False  # pending NOT on the next clause

    def add(occur: str, explicit: bool, q: "Query"):
        nonlocal conj, neg
        if neg and not explicit:
            occur, explicit = MUST_NOT, True
        if conj == "AND":
            if clauses and clauses[-1][0] == SHOULD and not clauses[-1][2]:
                clauses[-1][0] = MUST
            if not explicit and occur == SHOULD:
                occur = MUST
        clauses.append([occur, q, explicit])
        conj, neg = None, False

    n = len(text)
    while pos < n:
        if text[pos].isspace():
            pos += 1
            continue
        if text[pos] == ")":
            if depth == 0:  # stray close paren: ignore it (lenient)
                pos += 1
                continue
            return clauses, pos
        km = _KEYWORD_RE.match(text, pos)
        if km:
            if km.group(1):
                conj = "AND"
            elif km.group(2):
                conj = conj or None  # OR: default occur already SHOULD
            else:  # NOT keyword or ! prefix
                neg = True
            pos = km.end()
            continue
        gm = _GROUP_OPEN_RE.match(text, pos)
        if gm:
            sub, pos = _parse_seq(text, gm.end(), analyzer, depth + 1)
            if pos < n and text[pos] == ")":
                pos += 1
            gboost = 1.0
            bm = _GROUP_BOOST_RE.match(text, pos)
            if bm:
                gboost = float(bm.group(1))
                pos = bm.end()
            if not sub:
                conj, neg = None, False
                continue
            gq = _boost_into(
                rewrite(BooleanQuery(tuple((o, q) for o, q, _ in sub))),
                gboost,
            )
            occur = {"+": MUST, "-": MUST_NOT, "#": FILTER, "": SHOULD}[
                gm.group("occur")
            ]
            add(occur, bool(gm.group("occur")), gq)
            continue
        am = _CLAUSE_RE.match(text, pos)
        if am and am.end() > pos:
            pos = am.end()
            atom = _atom_query(am, analyzer)
            if atom is not None:
                add(*atom)
            else:
                conj, neg = None, False
            continue
        pos += 1  # unparseable char: skip (lenient, like finditer before)
    return clauses, pos


def parse_query(text: str, analyzer: Optional[Analyzer] = None) -> Query:
    """Parse a query string into a plan; text terms run through
    ``analyzer``. Syntax (classic QueryParser,
    ``lucene/queryparser/.../classic/QueryParser.jj:105``):

    - ``term``, ``+required``, ``-prohibited``, ``#filtered`` (FILTER —
      match without scoring, this engine's spelling of
      ``BooleanClause.Occur.FILTER``), ``term^boost``
    - ``a AND b``/``&&``, ``a OR b``/``||``, ``NOT a``/``!a`` with the
      classic promotion semantics (AND promotes both operands to MUST
      unless explicitly signed; default operator is OR)
    - ``(grouped clauses)``, nestable, with optional ``(...)^boost``
    - ``"a phrase"~slop`` (text field only)
    - ``wild*card`` / ``wi?ld`` / ``fuzzy~2`` / ``/regexp/``
    - ``field:term`` — non-default fields are keyword (StringField)
      fields; their values are NOT analyzed (match is verbatim)
    - ``field:[lo TO hi]`` — doc-values range, ``*`` = open bound;
      non-numeric bounds run a lexicographic TermRangeQuery
    """
    analyzer = analyzer or Analyzer()
    parsed, _ = _parse_seq(text, 0, analyzer, 0)
    clauses: List[Tuple[str, Query]] = [(o, q) for o, q, _ in parsed]
    if not clauses:
        return BooleanQuery(())
    if len(clauses) == 1 and clauses[0][0] == SHOULD:
        return rewrite(clauses[0][1])
    if all(o == MUST_NOT for o, _ in clauses):
        return BooleanQuery(tuple(clauses))  # matches nothing (like Lucene)
    return rewrite(BooleanQuery(tuple(clauses)))


def _strip_boost(q: Query) -> Query:
    """Key for duplicate detection: the query with boost reset to 1."""
    import dataclasses

    if isinstance(
        q,
        (TermQuery, PhraseQuery, MatchAllQuery, RangeQuery,
         PrefixQuery, WildcardQuery, FuzzyQuery, RegexpQuery, SynonymQuery,
         TermRangeQuery),
    ):
        return dataclasses.replace(q, boost=1.0)
    return q


def deduplicate_clauses(q: Query, qtw) -> Query:
    """Search-time rewrite merging repeated SHOULD/MUST clauses, the fork's
    ``BooleanQuery.deduplicateClauses`` (``core/search/BooleanQuery.java:699-748``):
    unweighted duplicates (all boosts 1.0) collapse to one clause with
    boost = ``similarity.computeQueryTermWeight(qtf)`` (linear qtf when k3
    is disabled, saturated ``((k3+1)qtf)/(k3+qtf)`` when enabled); clauses
    with explicit boosts keep the linear boost sum. SHOULD dedup only when
    ``minimumNumberShouldMatch <= 1`` (:432)."""
    import dataclasses

    if not isinstance(q, BooleanQuery):
        return q
    clauses = tuple((o, deduplicate_clauses(s, qtw)) for o, s in q.clauses)
    for occur in (SHOULD, MUST):
        if occur == SHOULD and q.minimum_should_match > 1:
            continue
        mine = [(i, s) for i, (o, s) in enumerate(clauses) if o == occur]
        if len(mine) < 2:
            continue
        boosts: dict = {}
        order: List = []
        any_boosted = set()
        for _, s in mine:
            key = _strip_boost(s)
            b = getattr(s, "boost", 1.0)
            if key not in boosts:
                boosts[key] = 0.0
                order.append(key)
            boosts[key] += float(b)
            if b != 1.0:
                any_boosted.add(key)
        if len(boosts) == len(mine):
            continue  # no duplicates of this occur kind
        merged: List[Tuple[str, Query]] = []
        for key in order:
            bsum = boosts[key]
            boost = bsum if key in any_boosted else float(qtw(int(round(bsum))))
            s = (
                dataclasses.replace(key, boost=boost)
                if isinstance(key, (TermQuery, PhraseQuery, MatchAllQuery))
                else key
            )
            merged.append((occur, s))
        others = [(o, s) for o, s in clauses if o != occur]
        clauses = tuple(merged) + tuple(others)
    return BooleanQuery(clauses, q.minimum_should_match)


def query_terms(q: Query) -> List[str]:
    """All term-dictionary KEYS of a plan (for TermStates-style stat
    gathering) — field-encoded via ``config.term_key``."""
    if isinstance(q, TermQuery):
        return [term_key(q.field, q.term)]
    if isinstance(q, PhraseQuery):
        return list(q.terms)  # phrases are text-field (bare keys)
    if isinstance(q, MultiPhraseQuery):
        return [t for slot in q.positions for t in slot]
    if isinstance(q, SynonymQuery):
        return [term_key(q.field, t) for t in q.terms]
    if isinstance(q, FeatureQuery):
        return [term_key(q.field, q.feature)]
    if isinstance(q, SpanNearQuery):
        return list(q.terms)  # spans are text-field (positions required)
    if isinstance(q, IntervalQuery):
        return source_terms(q.source)  # text-field (positions required)
    if isinstance(q, TermInSetQuery):
        return [term_key(q.field, t) for t in q.terms]
    if isinstance(q, ConstantScoreQuery):
        return query_terms(q.query)
    if isinstance(q, DisjunctionMaxQuery):
        out = []
        for sub in q.disjuncts:
            out.extend(query_terms(sub))
        return out
    if isinstance(q, CoveringQuery):
        out = []
        for sub in q.queries:
            out.extend(query_terms(sub))
        return out
    if isinstance(q, CombinedFieldQuery):
        return [term_key(f, q.term) for f, _ in q.fields]
    if isinstance(q, BooleanQuery):
        out: List[str] = []
        for _, sub in q.clauses:
            out.extend(query_terms(sub))
        return out
    return []


_QUERY_TYPES = {
    c.__name__: c
    for c in (
        TermQuery,
        PhraseQuery,
        MultiPhraseQuery,
        BooleanQuery,
        MatchAllQuery,
        RangeQuery,
        GeoBoxQuery,
        GeoDistanceQuery,
        RangeFieldQuery,
        PrefixQuery,
        WildcardQuery,
        FuzzyQuery,
        RegexpQuery,
        SynonymQuery,
        CombinedFieldQuery,
        JoinQuery,
        FeatureQuery,
        TermInSetQuery,
        TermRangeQuery,
        ConstantScoreQuery,
        DisjunctionMaxQuery,
        SpanNearQuery,
        IntervalQuery,
        CoveringQuery,
    )
}


def localize_query(q):
    """Rebuild a Query tree with THIS module's classes. Under cloudpickle
    pickle-by-value (``__ray_entry__`` registers the package by value so
    workers without the repo on sys.path still deserialize), a Query
    constructed from a runtime import and a searcher deserialized from a
    by-value copy hold two distinct class objects with the same name —
    isinstance dispatch would miss. Identity-normalizing at the search
    entry makes the engine agnostic to how the plan crossed the wire."""
    import dataclasses

    cls = _QUERY_TYPES.get(type(q).__name__)
    if cls is None or type(q) is cls:
        return q
    if cls is BooleanQuery:
        return BooleanQuery(
            tuple((o, localize_query(s)) for o, s in q.clauses),
            q.minimum_should_match,
        )
    if cls is DisjunctionMaxQuery:
        return DisjunctionMaxQuery(
            tuple(localize_query(s) for s in q.disjuncts), q.tie_breaker
        )
    if cls is ConstantScoreQuery:
        return ConstantScoreQuery(localize_query(q.query), q.boost)
    if cls is CoveringQuery:
        return CoveringQuery(
            tuple(localize_query(s) for s in q.queries), q.min_match_expr
        )
    return cls(**{f.name: getattr(q, f.name) for f in dataclasses.fields(cls)})

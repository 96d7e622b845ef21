"""Language-routed analysis over the documents table — the
multilingual ``analysis/common`` surface (``fr/de/es/cjk`` packages +
``en``) driven by the corpus's ``lang`` column.

The synthetic corpus text is English-like in every language, so each
doc gets a deterministic MULTILINGUAL probe text built from a fixed
per-language vocabulary (``doc_id`` arithmetic picks the words — the
``image_decode`` oracle pattern): the pipeline runs the real analyzer
chain for the doc's language and emits the analyzed token stream.  The
SQL oracle maps each vocab word to its hand-verified golden analysis
(stems checked against the published Savoy / Porter algorithms and the
reference's filter semantics — see ``tests/test_lang_analyzers.py``)
so the comparison is engine-vs-frozen-goldens, not engine-vs-itself.

Words are separated by a digit token ``7``: it survives every chain
unchanged and breaks CJK position adjacency, so per-word golden
concatenation equals whole-text analysis for every language (CJK
bigrams never span the separator).

Stateful-stage shape: one :class:`MultilingualAnalyze` instance per
actor builds all five analyzer chains once in ``__init__``; per batch
the rows are grouped by language and analyzed with the prebuilt chain
(`map_batches(MultilingualAnalyze, concurrency=...)` at scale).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from lucene_ray.analysis.lang import analyzer_for_lang

# Fixed probe vocabularies. The golden analyzed form of each word is in
# _GOLD below; both are frozen — changing one without the other fails
# the gate and tests/test_lang_analyzers.py.
VOCAB = {
    "en": ["running", "the", "databases", "queries", "optimization", "fastest"],
    "fr": ["l'avion", "chevaux", "les", "nationaux", "heureuse", "administration"],
    "de": ["häuser", "straße", "kindern", "der", "schönen", "verwaltung"],
    "es": ["libros", "canciones", "veces", "de", "española", "rápidos"],
    "zh": ["数据库", "系统", "中文", "信息学", "计算机", "网络"],
}

# Hand-verified analyzed output per vocab word ('' = stop-dropped):
# en: Porter stems (EnglishAnalyzer); fr: elision + UniNE light stem;
# de: normalization + UniNE light stem; es: CLEF-2001 light stem;
# zh: CJK overlapping bigrams.
_GOLD = {
    "en": ["run", "", "databas", "queri", "optim", "fastest"],
    "fr": ["avion", "cheval", "", "national", "heureu", "administ"],
    "de": ["haus", "strass", "kind", "", "schon", "verwaltung"],
    "es": ["libr", "cancion", "vez", "", "español", "rapid"],
    "zh": ["数据 据库", "系统", "中文", "信息 息学", "计算 算机", "网络"],
}

_K = 3  # words per doc


def _word_idx(doc_id: np.ndarray, j: int, n: int) -> np.ndarray:
    return (doc_id * 7 + j * 3 + 1) % n


def probe_text(doc_id: int, lang: str) -> str:
    words = VOCAB.get(lang, VOCAB["en"])
    n = len(words)
    picks = [words[int((doc_id * 7 + j * 3 + 1) % n)] for j in range(_K)]
    return " 7 ".join(picks)


class MultilingualAnalyze:
    """Actor-pool stage: all analyzer chains built once per actor."""

    def __init__(self):
        self.analyzers = {
            lang: analyzer_for_lang(lang) for lang in VOCAB
        }

    def __call__(self, b: pa.Table) -> pa.Table:
        ids = np.asarray(b.column("doc_id"), dtype=np.int64)
        langs = b.column("lang").to_pylist()
        terms_out: list[str] = []
        counts = np.empty(len(ids), dtype=np.int64)
        for i, (did, lang) in enumerate(zip(ids, langs)):
            an = self.analyzers.get(lang) or self.analyzers["en"]
            toks, _ = an.analyze_fast(probe_text(int(did), lang))
            terms_out.append(" ".join(toks))
            counts[i] = len(toks)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "lang": b.column("lang"),
                "terms": pa.array(terms_out, pa.string()),
                "n_terms": pa.array(counts, pa.int64()),
            }
        )


def multilingual_analysis(sf_dir: str):
    """→ (doc_id, lang, terms, n_terms) ordered by doc_id: the analyzed
    probe-token stream per document under its language's chain."""
    import os

    import ray.data

    ds = ray.data.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang"],
    )
    return ds.map_batches(
        MultilingualAnalyze, concurrency=2, batch_format="pyarrow"
    ).sort("doc_id")


def sql_multilingual_analysis() -> str:
    rows = []
    for lang, words in VOCAB.items():
        for i in range(len(words)):
            g = _GOLD[lang][i].replace("'", "''")
            rows.append(f"('{lang}', {i}, '{g}')")
    values = ",\n  ".join(rows)
    n_by_lang = ", ".join(
        f"('{lang}', {len(w)})" for lang, w in VOCAB.items()
    )
    joins = []
    parts = []
    for j in range(_K):
        joins.append(
            f"join gold g{j} on g{j}.lang = d.xlang and "
            f"g{j}.idx = (d.doc_id * 7 + {j * 3 + 1}) % d.n"
        )
        parts.append(f"g{j}.anal")
    arr = ", '7', ".join(parts)
    return f"""
with gold(lang, idx, anal) as (values
  {values}
),
nv(lang, n) as (values {n_by_lang}),
d as (
  select doc_id, lang,
         case when lang in ('en','fr','de','es','zh') then lang
              else 'en' end as xlang
  from documents
),
dn as (select d.*, nv.n from d join nv on nv.lang = d.xlang)
select d.doc_id, d.lang,
       array_to_string(list_filter([{arr}], x -> x <> ''), ' ') as terms,
       cast(len(list_filter(string_split(
         array_to_string(list_filter([{arr}], x -> x <> ''), ' '), ' '),
         x -> x <> '')) as bigint) as n_terms
from dn d
{chr(10).join(joins)}
order by d.doc_id
"""

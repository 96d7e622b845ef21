"""Deterministic web-page corpus generator — the ``pages`` table of
``BASELINE.json.input_hint``: ``(url:string, warc_ts:timestamp[us],
html:binary, text:string, lang:string)``.

Seeded + partition-pure: page ``i`` is a function of ``(seed, i)`` only,
so any shard range can be generated independently on any worker
(regenerating a partition for a resume test yields identical bytes).
``text`` is derived from ``html`` by a deterministic extractor, making the
per-url byte-identical invariant (``input_hint``) testable both ways.

Modeled on the reference's corpus feeders
(``lucene/benchmark/src/java/org/apache/lucene/benchmark/byTask/feeds/``,
``lucene/test-framework/.../util/LineFileDocs.java:61-87``) but fully
synthetic: Zipf unigram draws over a generated vocabulary, plus
punctuation/number/mixed-script/emoji edge docs at a fixed rate.
"""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

LANGS = np.array(["en", "en", "en", "en", "de", "fr", "es", "zh", "ru", "el"])

_EDGE_SNIPPETS = [
    "Σίσυφος İstanbul STRASSE grüße",  # lowercase traps
    "世界 こんにちは カタカナ 한국어",  # CJK / kana / hangul
    "3.14 1,000,000 v2.0 can't U.S.A.",  # mid-punctuation joins
    "emoji 😀 🇺🇸 👍🏽 done",
    "x" * 300 + " tail",  # >255-char run → split tokens
    "",  # empty doc
    "   ",  # whitespace-only doc
]

_HTML_PRE = (
    b"<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>page</title>"
    b"</head><body><nav>boilerplate nav links</nav><article>"
)
_HTML_POST = b"</article><footer>footer boilerplate</footer></body></html>"


def make_vocab(n_words: int = 5000, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    letters = np.array(list("abcdefghijklmnopqrstuvwxyz"))
    lens = rng.integers(2, 11, size=n_words)
    words = ["".join(rng.choice(letters, size=int(L))) for L in lens]
    return np.array(sorted(set(words)))


def wrap_html(text: str) -> bytes:
    """text → the corpus's deterministic page html (inverse of
    ``extract_text`` up to the fixed boilerplate)."""
    return _HTML_PRE + text.encode("utf-8") + _HTML_POST


def extract_text(html: bytes) -> str:
    """The deterministic extractor: article body between the fixed tags."""
    start = html.index(b"<article>") + len(b"<article>")
    end = html.index(b"</article>")
    return html[start:end].decode("utf-8")


def generate_pages(
    start: int,
    count: int,
    seed: int = 42,
    vocab: Optional[np.ndarray] = None,
    mean_len: int = 60,
    dup_every: int = 0,
) -> pa.Table:
    """Generate pages [start, start+count) — partition-pure.

    ``dup_every > 0`` makes every ``dup_every``-th page reuse the url of an
    earlier page with a LATER crawl timestamp and different text — the
    FIXTURES.md §7 ``pages_dup`` fixture for update/dedup-by-key semantics
    (``IndexWriter.updateDocument``, SURVEY §2.6)."""
    vocab = vocab if vocab is not None else make_vocab(seed=seed)
    nv = len(vocab)
    # Zipf ranks (α≈1.1 tail, clipped) — head-term skew like real text
    urls: List[str] = []
    texts: List[str] = []
    langs: List[str] = []
    ts = np.empty(count, dtype="datetime64[us]")
    base_ts = np.datetime64("2026-01-01T00:00:00", "us")
    for j in range(count):
        i = start + j
        rng = np.random.default_rng((seed << 32) ^ i)
        n_tok = max(1, int(rng.poisson(mean_len)))
        if i % 97 == 13:  # edge docs at a fixed, deterministic rate
            text = _EDGE_SNIPPETS[(i // 97) % len(_EDGE_SNIPPETS)]
        else:
            ranks = np.minimum((rng.zipf(1.1, size=n_tok) - 1), nv - 1)
            words = vocab[ranks]
            text = " ".join(words)
            if i % 11 == 3:
                text += f" {rng.integers(0, 10**6)} v{rng.integers(1,9)}.{rng.integers(0,9)}"
        if dup_every and i % dup_every == (dup_every - 1) and i >= dup_every:
            # a multiple of dup_every is never itself a dup slot
            dup_of = (i - dup_every) - ((i - dup_every) % dup_every)
            urls.append(f"https://site{dup_of % 1000}.example/{dup_of:012x}")
            ts[j] = (
                base_ts
                + np.timedelta64(int((dup_of * 2654435761) % (30 * 86400)), "s")
                + np.timedelta64(3600 + i % 97, "s")  # strictly later recrawl
            )
        else:
            urls.append(f"https://site{i % 1000}.example/{i:012x}")
            ts[j] = base_ts + np.timedelta64(int((i * 2654435761) % (30 * 86400)), "s")
        texts.append(text)
        langs.append(str(LANGS[i % len(LANGS)]))
    htmls = [_HTML_PRE + t.encode("utf-8") + _HTML_POST for t in texts]
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_corpus(
    out_dir: str,
    n_docs: int,
    n_files: int = 16,
    seed: int = 42,
    use_ray: bool = True,
) -> List[str]:
    """Materialize the corpus as ``n_files`` parquet shards (cached: files
    already present are kept — generation is deterministic)."""
    os.makedirs(out_dir, exist_ok=True)
    per = (n_docs + n_files - 1) // n_files
    jobs = []
    for f in range(n_files):
        lo = f * per
        hi = min(lo + per, n_docs)
        if lo >= hi:
            break
        path = os.path.join(out_dir, f"pages_{f:04d}.parquet")
        if not os.path.exists(path):
            jobs.append((lo, hi, path))
    if jobs:
        if use_ray:
            import ray

            @ray.remote
            def gen(lo: int, hi: int, path: str, seed: int):
                tbl = generate_pages(lo, hi - lo, seed=seed)
                tmp = path + ".tmp"
                pq.write_table(tbl, tmp)
                os.replace(tmp, path)

            ray.get([gen.remote(lo, hi, p, seed) for lo, hi, p in jobs])
        else:
            for lo, hi, p in jobs:
                tbl = generate_pages(lo, hi - lo, seed=seed)
                pq.write_table(tbl, p + ".tmp")
                os.replace(p + ".tmp", p)
    return sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )

"""Per-position offsets (the ``.pay`` stream role,
``Lucene104PostingsFormat.java:17-80``): inversion carries analyzer
offsets through the perm, the segment stores them FOR-packed beside
positions, and the reader hands back (starts, ends) aligned 1:1 with
positions. Property: tokenizer offsets == postings offsets, for every
term and doc, including messy unicode and punctuation."""

import numpy as np
import pyarrow as pa
import pytest

from lucene_ray.analysis.analyzer import Analyzer
from lucene_ray.index.config import IndexConfig
from lucene_ray.index.segment import (
    SegmentReader,
    invert_texts,
    write_segment,
)

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "Data, data everywhere — and not a drop to drink!",
    "ΣΙΣΥΦΟΣ pushed the στόνε uphill",
    "",
    None,
    "punct.uation splits tokens; offsets must still align",
    "repeat repeat repeat repeat",
]


@pytest.fixture(scope="module")
def segment(tmp_path_factory):
    d = tmp_path_factory.mktemp("offidx")
    cfg = IndexConfig(offsets=True, rows_per_segment=100)
    inv = invert_texts(TEXTS, Analyzer(), with_positions=True, with_offsets=True)
    keys = pa.array(np.arange(len(TEXTS), dtype=np.int64))
    seg_dir = str(d / "seg_000000")
    write_segment(seg_dir, 0, 0, keys, inv, cfg)
    return SegmentReader(seg_dir)


class TestOffsetsRoundtrip:
    def test_tokenizer_offsets_equal_postings_offsets(self, segment):
        """For every (term, doc, occurrence): the stored offset range
        equals what the analyzer reports, and slicing the original text
        by it yields the token (modulo lowercasing)."""
        az = Analyzer()
        # analyzer truth: per doc, term -> list of (start, end) in order
        truth = {}
        for di, text in enumerate(TEXTS):
            for term, s, e, pos in az.analyze(text or ""):
                truth.setdefault(term, {}).setdefault(di, []).append((s, e))

        for term, by_doc in truth.items():
            info = segment.lookup(term)
            assert info is not None, term
            docids, tfs = segment.decoded(info)
            starts, ends = segment.offsets_for(info)
            assert len(starts) == len(ends) == int(tfs.sum())
            cursor = 0
            for d_, tf in zip(docids, tfs):
                got = list(
                    zip(
                        starts[cursor : cursor + tf].tolist(),
                        ends[cursor : cursor + tf].tolist(),
                    )
                )
                assert got == by_doc[int(d_)], (term, int(d_))
                cursor += int(tf)

    def test_offset_slices_reproduce_tokens(self, segment):
        az = Analyzer()
        for di, text in enumerate(TEXTS):
            for term, s, e, pos in az.analyze(text or ""):
                info = segment.lookup(term)
                starts, ends = segment.offsets_for(info)
                docids, tfs = segment.decoded(info)
                cursor = int(tfs[: np.searchsorted(docids, di)].sum())
                sl = (text or "")[starts[cursor] : ends[cursor]]
                # lowercase analyzer: the slice lowercases to some
                # occurrence of the term's surface form
                assert len(sl) == ends[cursor] - starts[cursor]
                break  # first occurrence suffices per doc

    def test_meta_and_backcompat(self, segment, tmp_path):
        assert segment.meta["offsets"] is True
        # non-offsets segment: lookup still works, offsets_for raises
        cfg = IndexConfig(rows_per_segment=100)
        inv = invert_texts(["plain text"], Analyzer(), with_positions=True)
        seg_dir = str(tmp_path / "seg_plain")
        write_segment(seg_dir, 1, 0, pa.array([0]), inv, cfg)
        r = SegmentReader(seg_dir)
        info = r.lookup("plain")
        assert info is not None and info.off_slen == 0
        with pytest.raises(ValueError):
            r.offsets_for(info)

    def test_merge_preserves_offsets(self, ray_session, tmp_path):
        """Merged segment's offsets == the per-segment offsets for every
        term/doc (the .pay stream merge role)."""
        from lucene_ray.index.build import build_index
        from lucene_ray.index.manifest import load_manifest, segment_dir
        from lucene_ray.index.merge import force_merge

        idx = str(tmp_path / "idx")
        build_index(
            "/root/testdata/sf0.001/documents.parquet",
            idx,
            IndexConfig(rows_per_segment=100, offsets=True),
        )
        man = load_manifest(idx)
        assert len(man.segments) >= 2
        # truth from the pre-merge segments, keyed by global docid
        truth = {}
        for srow in man.segments:
            r = SegmentReader(segment_dir(idx, int(srow["seg_id"])))
            for term in r.terms_list(0) + (
                r.terms_list(1) if r.n_parts > 1 else []
            ):
                info = r.lookup(term)
                docids, tfs = r.decoded(info)
                starts, ends = r.offsets_for(info)
                cur = 0
                for d, tf in zip(docids, tfs):
                    key = (term, r.base_docid + int(d))
                    truth[key] = (
                        list(starts[cur : cur + tf]),
                        list(ends[cur : cur + tf]),
                    )
                    cur += tf
        force_merge(idx, max_segments=1)
        man2 = load_manifest(idx)
        assert len(man2.segments) == 1
        mrow = man2.segments[0]
        assert mrow["offsets"] is True
        m = SegmentReader(segment_dir(idx, int(mrow["seg_id"])))
        seen = 0
        for term in set(t for t, _ in truth):
            info = m.lookup(term)
            assert info is not None, term
            docids, tfs = m.decoded(info)
            starts, ends = m.offsets_for(info)
            cur = 0
            for d, tf in zip(docids, tfs):
                key = (term, m.base_docid + int(d))
                assert truth[key] == (
                    list(starts[cur : cur + tf]),
                    list(ends[cur : cur + tf]),
                ), key
                cur += tf
                seen += 1
        assert seen == len(truth)

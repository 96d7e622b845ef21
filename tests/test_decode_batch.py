"""decode_postings_batch == per-term PostingsView.decode_all on every
blob shape: FOR vs bitset docids, PFor exceptions, w=0 freq bases,
multi-block fallback, doc_count edge sizes."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_ray.codecs.postings import (
    PostingsView,
    decode_postings_batch,
    encode_postings_batch,
)


def _roundtrip(term_lists):
    """term_lists: list of (ids, tfs). → batch-decoded list."""
    flat_ids = np.concatenate([np.asarray(i, np.uint32) for i, _ in term_lists])
    flat_tfs = np.concatenate([np.asarray(t, np.uint32) for _, t in term_lists])
    starts = np.zeros(len(term_lists) + 1, dtype=np.int64)
    np.cumsum([len(i) for i, _ in term_lists], out=starts[1:])
    norms = np.ones(int(flat_ids.max()) + 1, dtype=np.uint8)
    blobs = encode_postings_batch(flat_ids, flat_tfs, norms, starts)
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    offs = np.zeros(len(blobs), dtype=np.int64)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    got = decode_postings_batch(buf, offs, lens)
    for ti, (ids, tfs) in enumerate(term_lists):
        ref_i, ref_t = PostingsView(bytes(blobs[ti])).decode_all()
        np.testing.assert_array_equal(ref_i, np.asarray(ids, np.uint32)), ti
        gi, gt = got[ti]
        np.testing.assert_array_equal(gi, ref_i, err_msg=f"ids term {ti}")
        np.testing.assert_array_equal(gt, ref_t, err_msg=f"tfs term {ti}")


def test_fixed_shapes():
    _roundtrip(
        [
            (np.array([0]), np.array([1])),                       # w=0 ids
            (np.array([5]), np.array([3])),                       # single
            (np.arange(0, 512, 2), np.ones(256)),                 # full FOR
            (np.arange(100, 356), np.ones(256)),                  # dense → bitset
            (np.array([1, 9, 1000000]), np.array([1, 2, 7])),     # wide gaps
            (np.array([2, 3, 4, 5]), np.array([1, 1, 1, 100000])),  # PFor exc
            (np.arange(0, 2000, 3), np.ones(667)),                # multi-block
            (np.array([7, 8]), np.array([4, 4])),                 # tiny, fw exc path
        ]
    )


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sets(st.integers(0, 30000), min_size=1, max_size=700),
            st.randoms(use_true_random=False),
        ),
        min_size=1,
        max_size=12,
    )
)
def test_fuzz_matches_per_term_decode(term_specs):
    term_lists = []
    for idset, rnd in term_specs:
        ids = np.array(sorted(idset), dtype=np.uint32)
        tfs = np.array(
            [1 + (rnd.randrange(100000) if rnd.random() < 0.05 else rnd.randrange(30)) for _ in ids],
            dtype=np.uint32,
        )
        term_lists.append((ids, tfs))
    _roundtrip(term_lists)


def test_uint_blocks_batch_matches_scalar():
    import numpy as np

    from lucene_ray.index.segment import (
        decode_uint_blocks,
        decode_uint_blocks_batch,
        encode_uint_blocks,
    )

    rng = np.random.default_rng(11)
    runs = [
        np.array([], dtype=np.uint32),                       # zero-length
        np.array([0], dtype=np.uint32),
        rng.integers(0, 5, 10).astype(np.uint32),
        rng.integers(0, 100000, 256).astype(np.uint32),      # full block
        rng.integers(0, 3, 700).astype(np.uint32),           # multi-block
        np.zeros(30, dtype=np.uint32),                       # w=0
    ]
    blobs = [encode_uint_blocks(r) if len(r) else b"" for r in runs]
    buf = np.frombuffer(b"".join(blobs), dtype=np.uint8)
    lens = np.array([len(b) for b in blobs], dtype=np.int64)
    offs = np.zeros(len(blobs), dtype=np.int64)
    np.cumsum(lens[:-1], out=offs[1:])
    got = decode_uint_blocks_batch(buf, offs, lens)
    for i, r in enumerate(runs):
        np.testing.assert_array_equal(got[i], r, err_msg=f"run {i}")
        if len(r):
            np.testing.assert_array_equal(
                decode_uint_blocks(bytes(blobs[i])), r
            )


def test_segment_decoded_many_matches_scalar(ray_session, tmp_path):
    """SegmentReader.decoded_many == per-term decoded on a real segment,
    cold cache and warm cache, across every term of the dictionary."""
    from lucene_ray.index.build import build_index
    from lucene_ray.index.config import IndexConfig
    from lucene_ray.index.manifest import segment_dir
    from lucene_ray.index.segment import SegmentReader

    d = str(tmp_path / "dm")
    build_index(
        "/root/testdata/sf0.001/documents.parquet",
        d,
        IndexConfig(rows_per_segment=300, num_buckets=3, positions=False),
    )
    seg = SegmentReader(segment_dir(d, 0))
    infos = []
    for b in range(seg.n_parts):
        terms = seg.terms_list(b)
        for i in range(len(terms)):
            infos.append(seg.term_info_at(b, i, term=terms[i]))
    assert len(infos) > 20
    got = seg.decoded_many(infos)
    fresh = SegmentReader(segment_dir(d, 0))
    for info, (gi, gt) in zip(infos, got):
        ri, rt = fresh.decoded(info)
        np.testing.assert_array_equal(gi, ri)
        np.testing.assert_array_equal(gt, rt)
    # warm path: every entry now cached, same arrays come back
    again = seg.decoded_many(infos)
    for (gi, gt), (ai, at) in zip(got, again):
        assert gi is ai and gt is at

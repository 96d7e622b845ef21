"""sessionize bucket-count derivation (VERDICT r4 #6): the default
derives from the parquet footer row count, and any two bucket counts
produce identical sessions (bucketing is a pure co-location choice)."""
import numpy as np

from lucene_ray.pipelines.events import sessionize

SF = "/root/testdata/sf0.001"


def _norm(df):
    return df.sort_values(["user_id", "start_us"]).reset_index(drop=True)


def test_two_bucket_counts_agree(ray_session):
    a = _norm(sessionize(SF, n_buckets=4).to_pandas())
    b = _norm(sessionize(SF, n_buckets=17).to_pandas())
    assert len(a) == len(b) > 0
    for c in ["user_id", "start_us", "n_events", "dur_s"]:
        assert (a[c].values == b[c].values).all(), c


def test_default_is_footer_derived(ray_session):
    # default (None) must equal an explicit count — i.e. the derived
    # bucket count changes nothing but task sizing
    a = _norm(sessionize(SF).to_pandas())
    b = _norm(sessionize(SF, n_buckets=64).to_pandas())
    assert len(a) == len(b) > 0
    assert (a["start_us"].values == b["start_us"].values).all()

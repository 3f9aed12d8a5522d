"""Dedup family regression: the round-2 distributed rewrites (in-group pair
formation, join-based verify, distributed min-label propagation) must
reproduce the round-1 outputs pinned in tests/goldens/, and a skewed
boilerplate corpus must not trigger a quadratic pair blow-up."""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLD = os.path.join(os.path.dirname(__file__), "goldens")


def _eq(df: pd.DataFrame, golden_name: str):
    g = pd.read_parquet(os.path.join(GOLD, golden_name))
    df = df.reset_index(drop=True)
    assert list(df.columns) == list(g.columns), (list(df.columns), list(g.columns))
    assert len(df) == len(g), (len(df), len(g))
    for c in df.columns:
        a, b = df[c].to_numpy(), g[c].to_numpy()
        if np.issubdtype(np.asarray(a).dtype, np.floating):
            assert np.allclose(a.astype(float), b.astype(float)), c
        else:
            assert list(a) == list(b), c


@pytest.mark.usefixtures("ray_session")
class TestDedupGoldens:
    def test_minhash_lsh_pairs_matches_golden(self):
        from geo_polygonize_ray.pipelines.text import minhash_lsh_pairs

        _eq(minhash_lsh_pairs(SF_DIR), "minhash_lsh_pairs_sf001.parquet")

    def test_minhash_dedup_groups_matches_golden(self):
        from geo_polygonize_ray.pipelines.text import minhash_dedup_groups

        _eq(minhash_dedup_groups(SF_DIR), "minhash_dedup_groups_sf001.parquet")

    def test_ngram_jaccard_matches_golden(self):
        from geo_polygonize_ray.pipelines.text import ngram_jaccard_pairs

        _eq(ngram_jaccard_pairs(SF_DIR), "ngram_jaccard_pairs_sf001.parquet")


@pytest.mark.usefixtures("ray_session")
class TestDedupSkew:
    def test_boilerplate_bucket_capped(self, tmp_path):
        """5k near-identical docs land in one LSH band bucket; the cap must
        drop the boilerplate band instead of forming ~12.5M pairs (and the
        job must finish promptly rather than OOM the driver)."""
        import time

        from geo_polygonize_ray.pipelines.text import minhash_lsh_pairs

        n = 5000
        base = "the quick brown fox jumps over the lazy dog again and again " * 4
        texts = [base + f"tail{i}" for i in range(n)]
        t = pa.table(
            {
                "doc_id": pa.array(np.arange(n, dtype=np.int64)),
                "text": pa.array(texts),
            }
        )
        sf = str(tmp_path / "skew")
        os.makedirs(sf, exist_ok=True)
        pq.write_table(t, os.path.join(sf, "documents.parquet"))

        t0 = time.perf_counter()
        out = minhash_lsh_pairs(sf, max_bucket=200)
        dt = time.perf_counter() - t0
        # the boilerplate bands are dropped; whatever pairs remain must be
        # far below the quadratic count and the run must stay fast
        assert len(out) < n * 200
        assert dt < 120, f"skewed corpus took {dt:.0f}s"

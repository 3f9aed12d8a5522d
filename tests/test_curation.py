"""Curation ops: stratified sampling determinism and packing invariants."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from geo_polygonize_ray.functions.packing import pack_bucket_lengths, pack_documents
from geo_polygonize_ray.functions.sample import stratified_sample


def test_pack_bucket_lengths_kernel():
    lens = np.array([3, 4, 2, 5, 1, 9, 2])
    pid = pack_bucket_lengths(lens, capacity=8)
    # next-fit in order: [3,4] (7), [2,5,1] (8), [9->clipped own window], [2]
    assert list(pid) == [0, 0, 1, 1, 1, 2, 3]

    # oversize item still gets exactly one window of its own
    pid2 = pack_bucket_lengths(np.array([20]), capacity=8)
    assert list(pid2) == [0]

    assert len(pack_bucket_lengths(np.zeros(0, np.int64), 8)) == 0


@pytest.mark.usefixtures("ray_session")
class TestPacking:
    def _corpus(self, n=5000, seed=3):
        rng = np.random.default_rng(seed)
        return pd.DataFrame(
            {"doc_id": np.arange(n, dtype=np.int64), "n": rng.integers(10, 900, n)}
        )

    def test_invariants(self):
        df = self._corpus()
        cap = 2048
        out = pack_documents(
            rd.from_pandas(df).repartition(8), "doc_id", "n", cap, n_buckets=16
        ).to_pandas()

        # every document packed exactly once
        packed = np.sort(np.concatenate(out["doc_ids"].to_numpy()))
        assert np.array_equal(packed, df["doc_id"].to_numpy())
        # capacity respected (no oversize docs in this corpus)
        assert (out["total_len"] <= cap).all()
        assert (out["n_docs"] >= 1).all()
        # pack ids unique, utilization consistent
        assert out["pack_id"].is_unique
        assert np.allclose(out["utilization"], out["total_len"] / cap)
        # next-fit tail waste only: mean utilization stays high
        assert out["utilization"].mean() > 0.75

    def test_deterministic_across_partitioning(self):
        df = self._corpus()
        a = (
            pack_documents(rd.from_pandas(df).repartition(2), "doc_id", "n", 2048)
            .to_pandas()
            .sort_values("pack_id")
            .reset_index(drop=True)
        )
        b = (
            pack_documents(rd.from_pandas(df).repartition(13), "doc_id", "n", 2048)
            .to_pandas()
            .sort_values("pack_id")
            .reset_index(drop=True)
        )
        assert a[["pack_id", "n_docs", "total_len"]].equals(
            b[["pack_id", "n_docs", "total_len"]]
        )
        assert all(x == y for x, y in zip(a["doc_ids"], b["doc_ids"]))


@pytest.mark.usefixtures("ray_session")
class TestStratifiedSample:
    def test_deterministic_and_partition_independent(self):
        rng = np.random.default_rng(5)
        df = pd.DataFrame(
            {
                "doc_id": np.arange(3000, dtype=np.int64),
                "grp": rng.choice(["x", "y", "z"], 3000),
            }
        )
        a = stratified_sample(rd.from_pandas(df).repartition(3), "grp", "doc_id", 7)
        b = stratified_sample(rd.from_pandas(df).repartition(17), "grp", "doc_id", 7)
        assert a.equals(b)
        assert (a.groupby("grp").size() == 7).all()

    def test_small_group_returns_all(self):
        df = pd.DataFrame({"doc_id": np.arange(4, dtype=np.int64), "grp": ["s"] * 4})
        out = stratified_sample(rd.from_pandas(df), "grp", "doc_id", 10)
        assert sorted(out["doc_id"]) == [0, 1, 2, 3]

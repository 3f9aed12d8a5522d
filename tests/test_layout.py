"""Bucketed layout + shuffle-free co-located join (functions/layout.py)."""

import json
import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from geo_polygonize_ray.functions.layout import (
    LAYOUT_MANIFEST,
    bucket_join,
    bucket_of,
    read_layout_manifest,
    write_bucketed_parquet,
)


def _mk(tmp_path, name, df, key, n_buckets):
    path = os.path.join(tmp_path, name)
    write_bucketed_parquet(rd.from_pandas(df), path, key, n_buckets)
    return path


@pytest.mark.usefixtures("ray_session")
def test_join_matches_pandas_merge(tmp_path):
    rng = np.random.default_rng(7)
    left = pd.DataFrame(
        {"k": rng.integers(0, 200, 500).astype(np.int64), "a": rng.integers(0, 9, 500)}
    )
    right = pd.DataFrame(
        {"k": rng.integers(0, 200, 300).astype(np.int64), "b": rng.integers(0, 9, 300)}
    )
    lp = _mk(str(tmp_path), "l", left, "k", 16)
    rp = _mk(str(tmp_path), "r", right, "k", 16)
    got = (
        bucket_join(lp, rp, left_on="k")
        .to_pandas()
        .sort_values(["k", "a", "b"])
        .reset_index(drop=True)
    )
    want = (
        left.merge(right, on="k").sort_values(["k", "a", "b"]).reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got[["k", "a", "b"]].astype(np.int64), want.astype(np.int64)
    )


@pytest.mark.usefixtures("ray_session")
def test_empty_buckets_and_disjoint_keys(tmp_path):
    # 3 distinct keys into 64 buckets: most buckets are empty on both
    # sides, and the key sets only partially overlap
    left = pd.DataFrame({"k": np.array([1, 2, 3], dtype=np.int64), "a": [10, 20, 30]})
    right = pd.DataFrame({"k": np.array([2, 3, 4], dtype=np.int64), "b": [200, 300, 400]})
    lp = _mk(str(tmp_path), "l", left, "k", 64)
    rp = _mk(str(tmp_path), "r", right, "k", 64)
    got = bucket_join(lp, rp, left_on="k").to_pandas().sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [2, 3]
    assert list(got["a"]) == [20, 30]
    assert list(got["b"]) == [200, 300]


@pytest.mark.usefixtures("ray_session")
def test_mismatched_layouts_fail_fast(tmp_path):
    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64), "v": np.arange(10)})
    lp = _mk(str(tmp_path), "l", df, "k", 8)
    rp = _mk(str(tmp_path), "r", df, "k", 16)
    with pytest.raises(ValueError, match="not co-located"):
        bucket_join(lp, rp, left_on="k")
    # wrong key name
    with pytest.raises(ValueError, match="bucketed by"):
        bucket_join(lp, lp, left_on="v")
    # unpublished dir
    with pytest.raises(FileNotFoundError):
        read_layout_manifest(str(tmp_path / "nope"))


@pytest.mark.usefixtures("ray_session")
def test_non_integer_key_rejected(tmp_path):
    df = pd.DataFrame({"k": ["a", "b"], "v": [1, 2]})
    with pytest.raises(TypeError, match="integer column"):
        write_bucketed_parquet(rd.from_pandas(df), str(tmp_path / "x"), "k", 4)


def test_bucket_of_deterministic_and_covering():
    keys = np.arange(-5000, 5000, dtype=np.int64)
    b1 = bucket_of(keys, 32)
    b2 = bucket_of(keys.copy(), 32)
    assert np.array_equal(b1, b2)
    assert b1.min() >= 0 and b1.max() < 32
    # every bucket populated and no gross skew on sequential keys
    counts = np.bincount(b1, minlength=32)
    assert counts.min() > 0
    assert counts.max() < 4 * counts.mean()


@pytest.mark.usefixtures("ray_session")
def test_manifest_pins_hash(tmp_path):
    df = pd.DataFrame({"k": np.arange(10, dtype=np.int64)})
    p = _mk(str(tmp_path), "m", df, "k", 4)
    m = read_layout_manifest(p)
    assert m == {"key": "k", "n_buckets": 4, "hash": "knuth64>>40"}
    # a reader must reject a manifest whose hash tag it doesn't recognise
    # (simulating a layout written by a future incompatible version)
    m["hash"] = "other"
    with open(os.path.join(p, LAYOUT_MANIFEST), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="not co-located"):
        bucket_join(p, _mk(str(tmp_path), "m2", df, "k", 4), left_on="k")


@pytest.mark.usefixtures("ray_session")
def test_bucket_aggregate_exact_per_key(tmp_path):
    from geo_polygonize_ray.functions.layout import bucket_aggregate

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {"k": rng.integers(0, 40, 400).astype(np.int64), "v": rng.random(400)}
    )
    p = _mk(str(tmp_path), "agg", df, "k", 16)
    got = (
        bucket_aggregate(
            p, lambda d: d.groupby("k", as_index=False).agg(n=("v", "size"), s=("v", "sum"))
        )
        .to_pandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    want = (
        df.groupby("k", as_index=False)
        .agg(n=("v", "size"), s=("v", "sum"))
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert np.array_equal(got["k"], want["k"])
    assert np.array_equal(got["n"], want["n"])
    assert np.allclose(got["s"], want["s"])


@pytest.mark.usefixtures("ray_session")
def test_bucket_lookup_reads_only_hit_buckets(tmp_path):
    from geo_polygonize_ray.functions.layout import bucket_lookup

    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64), "v": np.arange(1000) * 2})
    p = _mk(str(tmp_path), "lk", df, "k", 32)
    got = bucket_lookup(p, np.array([3, 500, 999])).sort_values("k").reset_index(drop=True)
    assert list(got["k"]) == [3, 500, 999]
    assert list(got["v"]) == [6, 1000, 1998]
    # bytes-proportionality evidence: the hit buckets cover a strict
    # subset of the layout's files
    hit = set(bucket_of(np.array([3, 500, 999], dtype=np.int64), 32))
    assert len(hit) < 32
    # a missing key returns empty, not an error
    assert len(bucket_lookup(p, np.array([10**9]))) == 0

"""Deterministic stratified sampling — k rows per group, reproducibly.

Training-data curation constantly needs "k examples per language/source/
bucket", and it needs the SAME k examples on every run and every cluster
size (otherwise downstream caches and eval sets churn).  Randomness comes
from a fixed integer hash of the row id (a Knuth multiplicative hash,
computable identically in SQL — so the driver's DuckDB oracle can check
the exact sample), not from an RNG.

Scale shape: a per-batch partial top-k per group runs map-side (so the
shuffle carries at most ``batches x groups x k`` candidate rows, never the
data), then one small bucketed combine keeps the global k per group.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

# Knuth multiplicative hash, 32-bit ring.  With id < ~2^31 the product
# stays under 2^63, so BIGINT SQL arithmetic matches int64 numpy exactly:
#   (id * 2654435761) % 4294967296
_KNUTH = 2654435761
_RING = 4294967296


def sample_hash(ids: np.ndarray) -> np.ndarray:
    return (ids.astype(np.int64) * _KNUTH) % _RING


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    id_col: str,
    k: int,
    keep_cols: list[str] | None = None,
) -> pd.DataFrame:
    """The k rows per ``key_col`` group with the smallest
    ``sample_hash(id)`` (ties -> smaller id).  Deterministic across runs,
    partitionings and cluster sizes."""
    keep = list(dict.fromkeys([key_col, id_col] + (keep_cols or [])))

    def partial_topk(batch: pa.Table) -> pa.Table:
        df = batch.select(keep).to_pandas()
        df["_h"] = sample_hash(df[id_col].to_numpy())
        df = df.sort_values(["_h", id_col], kind="stable")
        return pa.Table.from_pandas(df.groupby(key_col).head(k), preserve_index=False)

    from geo_polygonize_ray.functions.agg import bucketed_groupby

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col], kind="stable")
        return g.groupby(key_col).head(k)

    out = bucketed_groupby(
        ds.map_batches(partial_topk, batch_format="pyarrow"), key_col, combine
    ).to_pandas()
    return (
        out.drop(columns=["_h"])
        .sort_values([key_col, id_col])
        .reset_index(drop=True)
    )

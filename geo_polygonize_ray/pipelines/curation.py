"""Training-data curation queries over the documents table: deterministic
stratified sampling (SQL-checked — the oracle reproduces the exact sample
because the sampling hash is plain integer arithmetic) and sequence
packing into fixed-capacity context windows (rows-only; invariants pinned
in tests/test_curation.py)."""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray.data as rd

from geo_polygonize_ray.functions.packing import pack_documents
from geo_polygonize_ray.functions.sample import stratified_sample

_K = 20
PACK_CAPACITY = 4096  # chars per context window (n_chars as length proxy)


def q_stratified_sample_docs(sf_dir: str) -> pd.DataFrame:
    """k=20 documents per language, chosen by the deterministic sampling
    hash — identical output at any cluster size or partitioning."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "doc_id", "n_chars"])
    out = stratified_sample(ds, "lang", "doc_id", _K, keep_cols=["n_chars"])
    out["doc_id"] = out["doc_id"].astype(np.int64)
    out["n_chars"] = out["n_chars"].astype(np.int64)
    return out[["lang", "doc_id", "n_chars"]]


Q_STRATIFIED_SQL = f"""
SELECT lang, doc_id, n_chars FROM (
  SELECT lang, doc_id, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rn
  FROM documents
)
WHERE rn <= {_K}
ORDER BY lang, doc_id
"""


def q_pack_documents(sf_dir: str) -> pd.DataFrame:
    """Greedy next-fit packing of the corpus into {PACK_CAPACITY}-char
    windows (hash-bucketed; deterministic).  Not SQL-expressible (the pack
    assignment is a sequential recurrence): rows-only check here, exact
    invariants (coverage, capacity, determinism) pinned in tests."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    out = pack_documents(ds, "doc_id", "n_chars", PACK_CAPACITY).to_pandas()
    out = out.sort_values("pack_id").reset_index(drop=True)
    out["n_doc_ids"] = out["doc_ids"].map(len).astype(np.int64)
    out["utilization"] = np.round(out["utilization"], 6)
    return out[["bucket", "pack_id", "n_docs", "total_len", "utilization", "n_doc_ids"]]

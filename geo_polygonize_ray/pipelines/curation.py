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


def q_mixture_sample_sources(sf_dir: str) -> pd.DataFrame:
    """Weighted mixture subsampling — re-weight a multi-source corpus to
    target per-source keep rates (the "mix 25% of even sources, 75% of odd
    sources" step of training-data assembly) by a deterministic hash
    threshold on the doc id: keep iff ``sample_hash(doc_id) % 10000 <
    rate_bp(source)``.  Membership is pure integer arithmetic, so the SQL
    oracle reproduces the EXACT subsample; the returned per-source count +
    id-sum checksum pins membership without shipping the rows.  Stateless
    map-side filter + partial aggregation: zero shuffle beyond the tiny
    per-source partials."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from geo_polygonize_ray.functions.agg import bucketed_groupby
    from geo_polygonize_ray.functions.sample import _KNUTH, _RING

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["source", "doc_id"])

    def partial(batch: pa.Table) -> pd.DataFrame:
        src_idx = pc.cast(pc.utf8_slice_codeunits(batch["source"], 3, 64), pa.int64())
        rate_bp = 2500 + 5000 * (src_idx.to_numpy(zero_copy_only=False) % 2)
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = (ids * _KNUTH) % _RING % 10000 < rate_bp
        df = pd.DataFrame(
            {"source": batch["source"].to_numpy(zero_copy_only=False)[keep], "doc_id": ids[keep]}
        )
        return df.groupby("source", as_index=False).agg(
            n_kept=("doc_id", "size"), id_sum=("doc_id", "sum")
        )

    out = bucketed_groupby(
        ds.map_batches(partial, batch_format="pyarrow"),
        "source",
        lambda g: g.groupby("source", as_index=False).agg(
            n_kept=("n_kept", "sum"), id_sum=("id_sum", "sum")
        ),
    ).to_pandas()
    out["n_kept"] = out["n_kept"].astype(np.int64)
    out["id_sum"] = out["id_sum"].astype(np.int64)
    return out.sort_values("source").reset_index(drop=True)


Q_MIXTURE_SQL = """
SELECT source, COUNT(*) AS n_kept, CAST(SUM(doc_id) AS BIGINT) AS id_sum
FROM (
  SELECT source, doc_id,
         2500 + 5000 * (CAST(SUBSTR(source, 4) AS BIGINT) % 2) AS rate_bp
  FROM documents
)
WHERE (doc_id * 2654435761) % 4294967296 % 10000 < rate_bp
GROUP BY source ORDER BY source
"""


def q_pack_documents(sf_dir: str) -> pd.DataFrame:
    """Greedy next-fit packing of the corpus into {PACK_CAPACITY}-char
    windows (hash-bucketed; deterministic).  SQL-checked (round-5): the
    next-fit recurrence is a gaps-and-islands walk DuckDB states with a
    recursive CTE over per-bucket cumsums (Q_PACK_SQL); utilization =
    total/2^12 is exact in float64, so no rounding is applied and values
    hash bit-identically."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    out = pack_documents(ds, "doc_id", "n_chars", PACK_CAPACITY).to_pandas()
    out = out.sort_values("pack_id").reset_index(drop=True)
    out["n_doc_ids"] = out["doc_ids"].map(len).astype(np.int64)
    return out[["bucket", "pack_id", "n_docs", "total_len", "utilization", "n_doc_ids"]]


# SQL twin of pack_documents (capacity 4096, 64 buckets, 1<<40 pack-id
# prefix).  The sequential next-fit recurrence becomes: (1) per-bucket
# id-ordered running sums, (2) for EVERY candidate start row the last row
# whose cumsum fits in the start's window (a non-equi self-join — legal
# because clipped <= capacity guarantees every window holds >= 1 row),
# (3) a recursive CTE walking start -> end+1 exactly as the engine's
# searchsorted loop does.
Q_PACK_SQL = f"""
WITH RECURSIVE t AS (
  -- HUGEINT product: BIGINT would abort on overflow for doc_id >= 2^63/C,
  -- and (exact product) % 2^32 equals numpy's wrap-then-mod for all ids
  SELECT doc_id,
         CAST(((doc_id::HUGEINT * 2654435761::HUGEINT) % 4294967296::HUGEINT) % 64 AS BIGINT) AS bucket,
         LEAST(n_chars, {PACK_CAPACITY})::BIGINT AS clipped
  FROM documents
), o AS (
  SELECT doc_id, bucket, clipped,
         ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id) AS rn,
         SUM(clipped) OVER (PARTITION BY bucket ORDER BY doc_id) AS csum
  FROM t
), ends AS (
  SELECT s.bucket, s.rn AS s_rn, MAX(e.rn) AS e_rn
  FROM o s JOIN o e
    ON e.bucket = s.bucket AND e.rn >= s.rn
   AND e.csum <= s.csum - s.clipped + {PACK_CAPACITY}
  GROUP BY s.bucket, s.rn
), bmax AS (
  SELECT bucket, MAX(rn) AS mx FROM o GROUP BY bucket
), walk AS (
  SELECT bucket, 1 AS s_rn, 0 AS pid FROM bmax
  UNION ALL
  SELECT w.bucket, en.e_rn + 1, w.pid + 1
  FROM walk w
  JOIN ends en ON en.bucket = w.bucket AND en.s_rn = w.s_rn
  JOIN bmax b ON b.bucket = w.bucket
  WHERE en.e_rn < b.mx
)
SELECT w.bucket,
       w.bucket * 1099511627776 + w.pid AS pack_id,
       en.e_rn - w.s_rn + 1 AS n_docs,
       CAST(ce.csum - (cs.csum - cs.clipped) AS BIGINT) AS total_len,
       CAST(ce.csum - (cs.csum - cs.clipped) AS BIGINT) / {PACK_CAPACITY}.0 AS utilization,
       en.e_rn - w.s_rn + 1 AS n_doc_ids
FROM walk w
JOIN ends en ON en.bucket = w.bucket AND en.s_rn = w.s_rn
JOIN o cs ON cs.bucket = w.bucket AND cs.rn = w.s_rn
JOIN o ce ON ce.bucket = w.bucket AND ce.rn = en.e_rn
ORDER BY pack_id
"""

"""Similarity search over the ``embeddings`` table (list<float> column).

* ``q_ann_topk`` — brute-force cosine top-k: the query matrix is broadcast
  once via ``ray.put``; each batch does one numpy matmul and emits only its
  local top-k (map-side pruning), a tiny driver-side merge finishes.  This
  is the exact baseline and the pattern that scales: per-batch work is a
  dense GEMM, shuffle volume is k rows per batch.
* ``q_ann_ivf`` — IVF-style variant: k-means-ish centroids from a sample,
  vectors bucketed by nearest centroid (the partitioning key), queries probe
  the nearest ``n_probe`` buckets only.
* ``embedding_near_dup`` — embedding-cosine near-duplicate pairs via the
  same bucketing (cheap candidate generation + exact verify).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


from geo_polygonize_ray.pipelines.relational import _read, r4


def _emb_values(batch: pa.Table) -> np.ndarray:
    col = batch["embedding"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = col.offsets.to_numpy(zero_copy_only=False)
    dim = int(offs[1] - offs[0]) if len(offs) > 1 else 0
    return flat.reshape(-1, dim) if dim else flat.reshape(len(offs) - 1, 0)


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    return batch["vec_id"].to_numpy(), _emb_values(batch)


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def _query_vector(sf_dir: str, query_vec_id: int) -> np.ndarray:
    """Driver-side point lookup of one embedding (pyarrow row-group filter —
    a tiny indexed read, not a Ray job)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "==", query_vec_id)],
    )
    return np.asarray(t["embedding"][0].as_py(), dtype=np.float64)


def q_ann_topk(sf_dir: str, query_vec_id: int = 0, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k vs the embedding of ``query_vec_id``."""
    q = _query_vector(sf_dir, query_vec_id)
    q = q / np.linalg.norm(q)
    q_ref = ray.put(q)

    def local_topk(batch: pa.Table) -> pa.Table:
        qv = ray.get(q_ref)
        ids, m = _emb_matrix(batch)
        mask = ids != query_vec_id
        ids, m = ids[mask], m[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
        cos = _normalize(m) @ qv
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({"vec_id": pa.array(ids[top]), "cos": pa.array(cos[top])})

    parts = (
        _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
        .map_batches(local_topk, batch_format="pyarrow", batch_size=4096)
        .to_pandas()
    )
    parts["cos"] = r4(parts["cos"])
    parts = parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k)
    return parts.reset_index(drop=True)


Q_ANN_SQL_TEMPLATE = """
SELECT e.vec_id,
       ROUND(list_cosine_similarity(e.embedding::DOUBLE[], q.embedding::DOUBLE[]), 4) AS cos
FROM embeddings e,
     (SELECT embedding FROM embeddings WHERE vec_id = {qid}) q
WHERE e.vec_id != {qid}
ORDER BY cos DESC, e.vec_id
LIMIT {k}
"""


def _train_centroids(sample: np.ndarray, n_centroids: int, iters: int = 8, seed: int = 11) -> np.ndarray:
    rng = np.random.default_rng(seed)
    sample = _normalize(sample)
    cent = sample[rng.choice(len(sample), size=min(n_centroids, len(sample)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cent.T, axis=1)
        for c in range(len(cent)):
            pts = sample[assign == c]
            if len(pts):
                v = pts.mean(axis=0)
                cent[c] = v / max(np.linalg.norm(v), 1e-12)
    return cent


def q_ann_ivf(
    sf_dir: str, query_vec_id: int = 0, k: int = 10, n_centroids: int = 8, n_probe: int = 3
) -> pd.DataFrame:
    """IVF: sample -> centroids (broadcast) -> bucket by nearest centroid ->
    probe only the ``n_probe`` buckets nearest the query.  The scale path:
    the bucket id is the partition key; at 10^12 rows each bucket is its own
    parquet partition and probing reads ~n_probe/n_centroids of the data."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = ds.random_sample(0.2, seed=5).take_batch(2048, batch_format="pyarrow")
    _, sm = _emb_matrix(pa.table(sample))
    cent = _train_centroids(sm, n_centroids)
    cent_ref = ray.put(cent)

    q = _query_vector(sf_dir, query_vec_id)
    q = q / np.linalg.norm(q)
    probes = set(np.argsort(-(cent @ q))[:n_probe].tolist())
    probes_ref = ray.put(probes)
    q_ref = ray.put(q)

    def probe_topk(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        pr = ray.get(probes_ref)
        qv = ray.get(q_ref)
        ids, m = _emb_matrix(batch)
        mask = ids != query_vec_id
        ids, m = ids[mask], m[mask]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
        mn = _normalize(m)
        bucket = np.argmax(mn @ c.T, axis=1)
        sel = np.isin(bucket, list(pr))
        ids, mn = ids[sel], mn[sel]
        if len(ids) == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()), "cos": pa.array([], pa.float64())})
        cos = mn @ qv
        top = np.argsort(-cos, kind="stable")[:k]
        return pa.table({"vec_id": pa.array(ids[top]), "cos": pa.array(cos[top])})

    parts = ds.map_batches(probe_topk, batch_format="pyarrow", batch_size=4096).to_pandas()
    parts["cos"] = r4(parts["cos"])
    return (
        parts.sort_values(["cos", "vec_id"], ascending=[False, True]).head(k).reset_index(drop=True)
    )


def embedding_near_dup(sf_dir: str, threshold: float = 0.95, n_centroids: int = 16) -> pd.DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by nearest centroid,
    exact pairwise cosine within buckets (groupby-shuffled), threshold."""
    ds = _read(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    sample = ds.random_sample(0.3, seed=5).take_batch(2048, batch_format="pyarrow")
    _, sm = _emb_matrix(pa.table(sample))
    cent_ref = ray.put(_train_centroids(sm, n_centroids))

    def add_bucket(batch: pa.Table) -> pa.Table:
        c = ray.get(cent_ref)
        ids, m = _emb_matrix(batch)
        b = np.argmax(_normalize(m) @ c.T, axis=1)
        return batch.append_column("bucket", pa.array(b.astype(np.int64)))

    def pairs_in_bucket(group: pd.DataFrame) -> pd.DataFrame:
        if len(group) < 2:
            return pd.DataFrame({"vec_a": [], "vec_b": [], "cos": []})
        g = group.sort_values("vec_id")
        ids = g["vec_id"].to_numpy()
        m = _normalize(np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]]))
        sim = m @ m.T
        ia, ib = np.triu_indices(len(ids), 1)
        keep = sim[ia, ib] >= threshold
        return pd.DataFrame(
            {
                "vec_a": ids[ia][keep].astype(np.int64),
                "vec_b": ids[ib][keep].astype(np.int64),
                "cos": sim[ia, ib][keep],
            }
        )

    out = (
        ds.map_batches(add_bucket, batch_format="pyarrow", batch_size=4096)
        .groupby("bucket")
        .map_groups(pairs_in_bucket, batch_format="pandas")
        .to_pandas()
    )
    if len(out):
        out["cos"] = r4(out["cos"])
        out = out.sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
    return out


def q_embedding_stats(sf_dir: str) -> pd.DataFrame:
    """Per-label embedding stats — SQL-checkable list-column aggregation."""
    ds = _read(sf_dir, "embeddings", columns=["label", "embedding"])

    def partial(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy()
        m = _emb_values(batch)
        norms = np.linalg.norm(m, axis=1)
        df = pd.DataFrame({"label": labels, "norm": norms})
        g = df.groupby("label", as_index=False).agg(n=("norm", "size"), sum_norm=("norm", "sum"))
        return pa.Table.from_pandas(g, preserve_index=False)

    from ray.data.aggregate import Sum

    out = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("n", alias_name="n"), Sum("sum_norm", alias_name="sum_norm"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    out["sum_norm"] = r4(out["sum_norm"])
    return out.sort_values("label").reset_index(drop=True)


Q_EMB_STATS_SQL = """
SELECT label, COUNT(*) AS n,
       ROUND(SUM(sqrt(list_inner_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4) AS sum_norm
FROM embeddings GROUP BY label ORDER BY label
"""

"""Mergeable sketches (the approximate-aggregate family, ray_guide.md:
"emit one serialized sketch per batch and merge them in a second, tiny
stage — sketches are designed to be mergeable").

HyperLogLog (Flajolet et al. 2007, public algorithm) with 2^p registers,
fully vectorized: one numpy pass per batch produces a 2^p-byte register
array; merging is elementwise max; the estimator uses the standard alpha_m
bias constant with the small-range (linear counting) correction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit mix (public splitmix64 constants)."""
    z = x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def hll_partial(values: np.ndarray, p: int = 12) -> np.ndarray:
    """One batch of int64 keys -> 2^p uint8 register maxima."""
    m = 1 << p
    h = _splitmix64(np.asarray(values, dtype=np.int64).view(np.uint64))
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | np.uint64((1 << p) - 1)  # pad low bits with 1s
    # rho = leading zeros of `rest` + 1, vectorized via float exponent trick
    # (values are nonzero by construction thanks to the pad)
    lz = 63 - np.floor(np.log2(rest.astype(np.float64))).astype(np.int64)
    lz = np.clip(lz, 0, 64 - p)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, idx, (lz + 1).astype(np.uint8))
    return regs


def hll_merge(partials: list[np.ndarray]) -> np.ndarray:
    out = partials[0].copy()
    for q in partials[1:]:
        np.maximum(out, q, out=out)
    return out


def hll_estimate(regs: np.ndarray, p: int = 12) -> float:
    m = float(len(regs))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int(np.sum(regs == 0))
    if est <= 2.5 * m and zeros > 0:  # linear-counting small-range correction
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: rd.Dataset, column: str, p: int = 12) -> float:
    """Distributed approximate COUNT(DISTINCT column) for int64 columns:
    one 4 KiB sketch per batch, merged driver-side (mergeable => the merge
    could equally run as a tree reduction on a cluster)."""

    def partial(batch: pa.Table) -> pa.Table:
        vals = batch[column].to_numpy(zero_copy_only=False)
        regs = hll_partial(vals, p)
        return pa.table({"regs": pa.array([regs.tobytes()], pa.binary())})

    parts = ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    regs = hll_merge([np.frombuffer(b, dtype=np.uint8) for b in parts["regs"]])
    return hll_estimate(regs, p)

"""Exact distributed quantiles by streaming histogram refinement.

The scale problem: ``quantile_cont`` needs order statistics, but a global
sort is an all-to-all shuffle of EVERY byte, and ``groupby(key).map_groups``
pulls each group onto one worker — both break at 100 TB.  The classic
alternative (used by every MPP engine's exact-percentile path) is
**iterative histogram refinement**:

  1. one streaming pass computes per-group ``(count, min, max)``;
  2. each needed order statistic starts as a (group, rank) query over the
     interval ``[min, max]``; a refinement round histograms every active
     interval into ``n_bins`` equal slices in ONE streaming pass over the
     dataset, then narrows each interval to the slice containing its rank
     (counts below the slice are folded into the rank offset);
  3. intervals shrink ~``n_bins``x per round, so a 1e12-row group needs
     ~4 rounds to fall under ``collect_cap``; a final pass collects only
     the values inside the surviving slivers (bounded by ``collect_cap``)
     and reads the order statistic off a driver-side sort.

Every pass is a column-pruned ``map_batches`` scan emitting O(intervals x
n_bins) partial rows per batch; the driver folds partials with a streaming
``iter_batches`` reduce, so nothing data-sized ever concentrates.  Group
cardinality is assumed SMALL (priority classes, status codes); for
high-cardinality keys use ``bucketed_groupby`` + an in-bucket quantile
instead — this module's value is groups too BIG to co-locate, not too many.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd


def _stats_pass(ds: rd.Dataset, key_col: str, val_col: str) -> dict:
    """One streaming scan -> {group: (n, min, max)} (driver fold)."""

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        g = df.groupby(key_col, as_index=False)[val_col].agg(["count", "min", "max"])
        g.columns = [key_col, "n", "lo", "hi"]
        return pa.Table.from_pandas(g, preserve_index=False)

    stats: dict = {}
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="pandas"
    ):
        for k, n, lo, hi in zip(b[key_col], b["n"], b["lo"], b["hi"]):
            if k in stats:
                pn, plo, phi = stats[k]
                stats[k] = (pn + int(n), min(plo, float(lo)), max(phi, float(hi)))
            else:
                stats[k] = (int(n), float(lo), float(hi))
    return stats


class _Interval:
    __slots__ = ("gid", "rank", "lo", "hi", "n_below", "count", "value")

    def __init__(self, gid, rank, lo, hi, n_below, count):
        self.gid, self.rank = gid, rank
        self.lo, self.hi = lo, hi
        self.n_below, self.count = n_below, count
        self.value = None  # set when resolved


def _hist_pass(ds, key_col, val_col, active, n_bins):
    """One streaming scan: per active interval, counts per edge-slice."""
    edges = [np.linspace(iv.lo, iv.hi, n_bins + 1) for iv in active]
    by_gid: dict = {}
    for i, iv in enumerate(active):
        by_gid.setdefault(iv.gid, []).append(i)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        keys = df[key_col].to_numpy()
        vals = df[val_col].to_numpy(np.float64)
        iids, bins, cnts = [], [], []
        for gid, idxs in by_gid.items():
            kmask = keys == gid
            if not kmask.any():
                continue
            v = vals[kmask]
            for i in idxs:
                iv_lo, iv_hi, e = active[i].lo, active[i].hi, edges[i]
                w = v[(v >= iv_lo) & (v < iv_hi)]
                if not len(w):
                    continue
                j = np.clip(np.searchsorted(e, w, side="right") - 1, 0, n_bins - 1)
                c = np.bincount(j, minlength=n_bins)
                nz = np.nonzero(c)[0]
                iids.append(np.full(len(nz), i, np.int64))
                bins.append(nz.astype(np.int64))
                cnts.append(c[nz].astype(np.int64))
        if not iids:
            return pa.table(
                {
                    "iid": np.zeros(0, np.int64),
                    "bin": np.zeros(0, np.int64),
                    "cnt": np.zeros(0, np.int64),
                }
            )
        return pa.table(
            {
                "iid": np.concatenate(iids),
                "bin": np.concatenate(bins),
                "cnt": np.concatenate(cnts),
            }
        )

    acc = np.zeros((len(active), n_bins), dtype=np.int64)
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="numpy"
    ):
        if len(b["iid"]):
            np.add.at(acc, (b["iid"], b["bin"]), b["cnt"])
    return acc, edges


def _collect_pass(ds, key_col, val_col, active):
    """Final streaming scan: gather the values inside each sliver."""
    by_gid: dict = {}
    for i, iv in enumerate(active):
        by_gid.setdefault(iv.gid, []).append(i)

    def partial(batch: pa.Table) -> pa.Table:
        df = batch.select([key_col, val_col]).to_pandas()
        keys = df[key_col].to_numpy()
        vals = df[val_col].to_numpy(np.float64)
        iids, outv = [], []
        for gid, idxs in by_gid.items():
            kmask = keys == gid
            if not kmask.any():
                continue
            v = vals[kmask]
            for i in idxs:
                w = v[(v >= active[i].lo) & (v < active[i].hi)]
                if len(w):
                    iids.append(np.full(len(w), i, np.int64))
                    outv.append(w)
        if not iids:
            return pa.table({"iid": np.zeros(0, np.int64), "v": np.zeros(0, np.float64)})
        return pa.table({"iid": np.concatenate(iids), "v": np.concatenate(outv)})

    vals_per: list[list] = [[] for _ in active]
    for b in ds.map_batches(partial, batch_format="pyarrow").iter_batches(
        batch_format="numpy"
    ):
        for i in np.unique(b["iid"]):
            vals_per[int(i)].append(b["v"][b["iid"] == i])
    return [
        np.sort(np.concatenate(v)) if v else np.zeros(0, np.float64) for v in vals_per
    ]


def exact_group_quantiles(
    ds: rd.Dataset,
    key_col: str,
    val_col: str,
    qs: tuple[float, ...] = (0.5,),
    n_bins: int = 128,
    collect_cap: int = 65536,
    max_rounds: int = 16,
) -> pd.DataFrame:
    """Exact linear-interpolated quantiles (``quantile_cont`` semantics:
    position ``(n-1)*q``, interpolate between the floor/ceil order
    statistics) per group.  Returns columns ``key, q{q}...``.
    """
    stats = _stats_pass(ds, key_col, val_col)
    if not stats:
        return pd.DataFrame({"key": []})

    # order-statistic queries: per group the distinct floor/ceil ranks
    intervals: list[_Interval] = []
    need: dict = {}  # (gid, rank) -> _Interval
    for gid, (n, lo, hi) in sorted(stats.items(), key=lambda kv: str(kv[0])):
        ranks = set()
        for q in qs:
            pos = (n - 1) * float(q)
            ranks.add(int(np.floor(pos)))
            ranks.add(int(np.ceil(pos)))
        for r in sorted(ranks):
            iv = _Interval(gid, r, lo, np.nextafter(hi, np.inf), 0, n)
            intervals.append(iv)
            need[(gid, r)] = iv

    # refinement rounds: narrow every oversized interval ~n_bins x per scan
    for _ in range(max_rounds):
        active = [iv for iv in intervals if iv.value is None and iv.count > collect_cap]
        if not active:
            break
        acc, edges = _hist_pass(ds, key_col, val_col, active, n_bins)
        for i, iv in enumerate(active):
            bins, e = acc[i], edges[i]
            cum = np.concatenate([[0], np.cumsum(bins)])
            r_local = iv.rank - iv.n_below
            j = int(np.searchsorted(cum, r_local, side="right") - 1)
            j = min(max(j, 0), len(bins) - 1)
            new_lo, new_hi = float(e[j]), float(e[j + 1])
            if new_hi <= new_lo or (new_hi - new_lo) >= (iv.hi - iv.lo):
                # the interval stopped shrinking: it is at float resolution,
                # so every remaining value in it compares equal -> resolved
                iv.value = new_lo
                continue
            iv.n_below += int(cum[j])
            iv.lo, iv.hi, iv.count = new_lo, new_hi, int(bins[j])

    # bounded final collect for everything still interval-shaped
    pending = [iv for iv in intervals if iv.value is None]
    if pending:
        sorted_vals = _collect_pass(ds, key_col, val_col, pending)
        for iv, sv in zip(pending, sorted_vals):
            iv.value = float(sv[iv.rank - iv.n_below])

    rows = []
    for gid in sorted(stats, key=str):
        n = stats[gid][0]
        row = {"key": gid}
        for q in qs:
            pos = (n - 1) * float(q)
            k_lo, k_hi = int(np.floor(pos)), int(np.ceil(pos))
            frac = pos - k_lo
            v_lo = need[(gid, k_lo)].value
            v_hi = need[(gid, k_hi)].value
            row[f"q{q}"] = v_lo + (v_hi - v_lo) * frac
        rows.append(row)
    return pd.DataFrame(rows)

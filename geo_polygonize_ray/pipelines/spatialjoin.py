"""Distributed spatial join: points x polygons by grid co-partitioning.

The geospatial companion to the relational joins: given a points table
(point_id, x, y) and a polygon table in the polygonizer's output schema
(poly_id, shell_xs/ys, holes_xs/ys), emit every (point, polygon)
containment pair.  Shape at 100 TB:

* points map to their ONE grid cell (floor(x/cell), floor(y/cell));
* polygons are DUPLICATED to every cell their shell bbox intersects —
  the same buffered-duplication contract as tiled polygonization
  (reference src/tiling.rs:66-77), so a pair can only meet in the
  point's cell and the join is exactly-once with NO post-dedup;
* ONE shuffle co-groups each cell (bucketed_groupby);
* per cell: a vectorized bbox pre-filter forms candidate pairs, then the
  even-odd crossing parity over shell+hole rings (the K6 PIP kernel,
  identical float math to the rasterizer's fill rule) decides
  containment — a point inside a hole crosses shell+hole an even number
  of times and is excluded, bit-consistently with GEOS semantics.

Cell size is the operator's skew knob: cells should be sized near the
typical polygon diameter so per-cell candidate sets stay bounded (the
same sizing rule as polygonize tiles); a polygon spanning many cells
costs duplication, a cell holding many polygons costs candidate pairs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from geo_polygonize_ray.geom.kernels import pair_points_in_rings

# cell key packing: (ix + _OFF) << 32 | (iy + _OFF); valid for |ix|,|iy| < 2^31
_OFF = np.int64(1 << 31)


def _cell_key(ix: np.ndarray, iy: np.ndarray) -> np.ndarray:
    return ((ix.astype(np.int64) + _OFF) << np.int64(32)) | (iy.astype(np.int64) + _OFF)


def _shell_bboxes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    from geo_polygonize_ray.stages.linework import _list_bounds

    xs, xo = _list_bounds(batch["shell_xs"])
    ys, _ = _list_bounds(batch["shell_ys"])
    from geo_polygonize_ray.geom.kernels import bbox_many

    return bbox_many(xs, ys, xo)


def spatial_join_points_in_polygons(
    points: rd.Dataset,
    polygons: rd.Dataset,
    cell_size: float,
) -> rd.Dataset:
    """(point_id, poly_id) pairs where the point lies inside the polygon
    (even-odd rule over shell + holes).  Streams: both sides are tagged
    with cell keys map-side, one bucketed groupby co-locates each cell,
    and per-cell work is fully vectorized."""
    cs = float(cell_size)

    def tag_points(batch: pa.Table) -> pd.DataFrame:
        x = batch["x"].to_numpy(zero_copy_only=False)
        y = batch["y"].to_numpy(zero_copy_only=False)
        ix = np.floor(x / cs).astype(np.int64)
        iy = np.floor(y / cs).astype(np.int64)
        return pd.DataFrame(
            {
                "cell": _cell_key(ix, iy),
                "side": np.zeros(len(x), dtype=np.int64),
                "point_id": batch["point_id"].to_numpy(zero_copy_only=False).astype(np.int64),
                "x": x,
                "y": y,
                "poly_id": np.full(len(x), -1, dtype=np.int64),
                "shell_xs": [None] * len(x),
                "shell_ys": [None] * len(x),
                "holes_xs": [None] * len(x),
                "holes_ys": [None] * len(x),
            }
        )

    def tag_polygons(batch: pa.Table) -> pd.DataFrame:
        n = batch.num_rows
        if n == 0:
            return tag_points(pa.table({"point_id": pa.array([], pa.int64()),
                                        "x": pa.array([], pa.float64()),
                                        "y": pa.array([], pa.float64())}))
        bminx, bminy, bmaxx, bmaxy = _shell_bboxes(batch)
        # cell ranges the shell bbox touches (closed overlap, same form as
        # TileAssigner: the ceil(x-1) keeps the lower cell on exact edges)
        c0 = np.ceil(bminx / cs - 1.0).astype(np.int64)
        c1 = np.floor(bmaxx / cs).astype(np.int64)
        r0 = np.ceil(bminy / cs - 1.0).astype(np.int64)
        r1 = np.floor(bmaxy / cs).astype(np.int64)
        counts = (c1 - c0 + 1) * (r1 - r0 + 1)
        total = int(counts.sum())
        rep = np.repeat(np.arange(n), counts)
        local = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
        width = np.repeat(c1 - c0 + 1, counts)
        ix = np.repeat(c0, counts) + local % width
        iy = np.repeat(r0, counts) + local // width
        df = batch.to_pandas().iloc[rep].reset_index(drop=True)
        return pd.DataFrame(
            {
                "cell": _cell_key(ix, iy),
                "side": np.ones(total, dtype=np.int64),
                "point_id": np.full(total, -1, dtype=np.int64),
                "x": np.zeros(total),
                "y": np.zeros(total),
                "poly_id": df["poly_id"].to_numpy(np.int64),
                "shell_xs": list(df["shell_xs"]),
                "shell_ys": list(df["shell_ys"]),
                "holes_xs": list(df["holes_xs"]),
                "holes_ys": list(df["holes_ys"]),
            }
        )

    tagged = points.map_batches(tag_points, batch_format="pyarrow").union(
        polygons.select_columns(
            ["poly_id", "shell_xs", "shell_ys", "holes_xs", "holes_ys"]
        ).map_batches(tag_polygons, batch_format="pyarrow")
    )

    def join_cell(g: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"point_id": np.array([], np.int64), "poly_id": np.array([], np.int64)}
        )
        out_frames = []
        for _, grp in g.groupby("cell", sort=False):
            pts = grp[grp["side"] == 0]
            pls = grp[grp["side"] == 1]
            if not len(pts) or not len(pls):
                continue
            px = pts["x"].to_numpy()
            py = pts["y"].to_numpy()
            pid = pts["point_id"].to_numpy(np.int64)
            # flat ring storage: every polygon contributes shell + holes;
            # ring -> polygon mapping drives the parity XOR
            ring_parts_x, ring_parts_y, ring_poly = [], [], []
            gids = pls["poly_id"].to_numpy(np.int64)
            sxs = pls["shell_xs"].to_numpy()
            sys_ = pls["shell_ys"].to_numpy()
            hxs = pls["holes_xs"].to_numpy()
            hys = pls["holes_ys"].to_numpy()
            for k in range(len(pls)):
                ring_parts_x.append(np.asarray(sxs[k], dtype=np.float64))
                ring_parts_y.append(np.asarray(sys_[k], dtype=np.float64))
                ring_poly.append(k)
                for hx, hy in zip(hxs[k], hys[k]):
                    ring_parts_x.append(np.asarray(hx, dtype=np.float64))
                    ring_parts_y.append(np.asarray(hy, dtype=np.float64))
                    ring_poly.append(k)
            ring_poly = np.asarray(ring_poly, dtype=np.int64)
            offsets = np.concatenate(
                [[0], np.cumsum([len(r) for r in ring_parts_x])]
            ).astype(np.int64)
            flat_x = np.concatenate(ring_parts_x)
            flat_y = np.concatenate(ring_parts_y)
            # bbox pre-filter on shells: candidate (point, poly) pairs
            # (shell is the FIRST ring of each poly)
            first_ring = np.flatnonzero(np.concatenate([[True], np.diff(ring_poly) > 0]))
            shminx = np.array([ring_parts_x[i].min() for i in first_ring])
            shmaxx = np.array([ring_parts_x[i].max() for i in first_ring])
            shminy = np.array([ring_parts_y[i].min() for i in first_ring])
            shmaxy = np.array([ring_parts_y[i].max() for i in first_ring])
            cand = (
                (px[:, None] >= shminx[None, :])
                & (px[:, None] <= shmaxx[None, :])
                & (py[:, None] >= shminy[None, :])
                & (py[:, None] <= shmaxy[None, :])
            )
            pi, gi = np.nonzero(cand)
            if not len(pi):
                continue
            # expand candidate pairs to (point, ring) rows for the polys'
            # rings, evaluate parity per ring, XOR-reduce per pair
            rings_per_poly = np.bincount(ring_poly, minlength=len(pls))
            pair_nrings = rings_per_poly[gi]
            tot = int(pair_nrings.sum())
            pair_idx = np.repeat(np.arange(len(pi)), pair_nrings)
            ring_starts = np.concatenate([[0], np.cumsum(rings_per_poly)])
            pos = np.arange(tot) - np.repeat(np.cumsum(pair_nrings) - pair_nrings, pair_nrings)
            ring_ids = ring_starts[gi][pair_idx] + pos
            hit = pair_points_in_rings(
                px[pi][pair_idx], py[pi][pair_idx], ring_ids, flat_x, flat_y, offsets
            )
            inside = np.zeros(len(pi), dtype=bool)
            np.bitwise_xor.at(inside, pair_idx, hit)
            keep = np.flatnonzero(inside)
            if len(keep):
                out_frames.append(
                    pd.DataFrame({"point_id": pid[pi[keep]], "poly_id": gids[gi[keep]]})
                )
        if not out_frames:
            return empty
        return pd.concat(out_frames, ignore_index=True)

    from geo_polygonize_ray.functions import bucketed_groupby

    return bucketed_groupby(tagged, "cell", join_cell)


def spatial_join_broadcast(
    points: rd.Dataset,
    polygons: rd.Dataset,
    grid_cell: float | None = None,
    point_cols: list[str] | None = None,
) -> rd.Dataset:
    """Small-polygon-side variant: the polygon table (flat rings + a cell
    index) is built ONCE, put in the object store, and every point batch
    probes it map-side — ZERO shuffle, the right plan whenever the polygon
    side fits a worker's heap (dimension-table rule: broadcast small
    sides instead of exchanging the big one).

    ``grid_cell`` sizes the probe index (defaults to the median shell bbox
    diagonal): candidate polygons per point come from a bucketed cell ->
    polygon inverted index instead of a full bbox scan, so per-batch probe
    cost is O(points x local density), not O(points x polygons).

    Exactness: identical even-odd parity kernel and pair formation as
    spatial_join_points_in_polygons — the two plans are interchangeable
    (pinned by an equality test) and differ only in data movement.
    """
    import ray

    pl = polygons.select_columns(
        ["poly_id", "shell_xs", "shell_ys", "holes_xs", "holes_ys"]
    ).to_pandas()
    ring_parts_x, ring_parts_y, ring_poly = [], [], []
    sxs = pl["shell_xs"].to_numpy()
    sys_ = pl["shell_ys"].to_numpy()
    hxs = pl["holes_xs"].to_numpy()
    hys = pl["holes_ys"].to_numpy()
    for k in range(len(pl)):
        ring_parts_x.append(np.asarray(sxs[k], dtype=np.float64))
        ring_parts_y.append(np.asarray(sys_[k], dtype=np.float64))
        ring_poly.append(k)
        for hx, hy in zip(hxs[k], hys[k]):
            ring_parts_x.append(np.asarray(hx, dtype=np.float64))
            ring_parts_y.append(np.asarray(hy, dtype=np.float64))
            ring_poly.append(k)
    ring_poly = np.asarray(ring_poly, dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum([len(r) for r in ring_parts_x])]).astype(np.int64)
    flat_x = np.concatenate(ring_parts_x) if ring_parts_x else np.empty(0)
    flat_y = np.concatenate(ring_parts_y) if ring_parts_y else np.empty(0)
    first_ring = np.flatnonzero(np.concatenate([[True], np.diff(ring_poly) > 0]))
    shminx = np.array([ring_parts_x[i].min() for i in first_ring])
    shmaxx = np.array([ring_parts_x[i].max() for i in first_ring])
    shminy = np.array([ring_parts_y[i].min() for i in first_ring])
    shmaxy = np.array([ring_parts_y[i].max() for i in first_ring])
    if grid_cell is None:
        diag = np.hypot(shmaxx - shminx, shmaxy - shminy)
        grid_cell = float(max(np.median(diag), 1e-9)) if len(diag) else 1.0
    cs = float(grid_cell)
    # inverted index: cell key -> polygon ids whose bbox touches the cell
    c0 = np.ceil(shminx / cs - 1.0).astype(np.int64)
    c1 = np.floor(shmaxx / cs).astype(np.int64)
    r0 = np.ceil(shminy / cs - 1.0).astype(np.int64)
    r1 = np.floor(shmaxy / cs).astype(np.int64)
    counts = (c1 - c0 + 1) * (r1 - r0 + 1)
    total = int(counts.sum())
    rep = np.repeat(np.arange(len(pl)), counts)
    local = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    width = np.repeat(c1 - c0 + 1, counts)
    cix = np.repeat(c0, counts) + local % width
    ciy = np.repeat(r0, counts) + local // width
    keys = _cell_key(cix, ciy)
    order = np.argsort(keys, kind="stable")
    idx_keys = keys[order]
    idx_polys = rep[order]
    rings_per_poly = np.bincount(ring_poly, minlength=len(pl))
    ring_starts = np.concatenate([[0], np.cumsum(rings_per_poly)]).astype(np.int64)
    gids = pl["poly_id"].to_numpy(np.int64)

    index_ref = ray.put(
        dict(
            idx_keys=idx_keys, idx_polys=idx_polys, flat_x=flat_x, flat_y=flat_y,
            offsets=offsets, ring_starts=ring_starts, rings_per_poly=rings_per_poly,
            shminx=shminx, shmaxx=shmaxx, shminy=shminy, shmaxy=shmaxy,
            gids=gids, cs=cs,
        )
    )

    extra = list(point_cols or [])

    def probe(batch: pa.Table) -> pd.DataFrame:
        ix = ray.get(index_ref)
        px = batch["x"].to_numpy(zero_copy_only=False)
        py = batch["y"].to_numpy(zero_copy_only=False)
        pid = batch["point_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        extras = {c: batch[c].to_numpy(zero_copy_only=False) for c in extra}
        empty = pd.DataFrame(
            {"point_id": np.array([], np.int64), "poly_id": np.array([], np.int64),
             **{c: np.array([]) for c in extra}}
        )
        if not len(px) or not len(ix["gids"]):
            return empty
        key = _cell_key(
            np.floor(px / ix["cs"]).astype(np.int64),
            np.floor(py / ix["cs"]).astype(np.int64),
        )
        lo = np.searchsorted(ix["idx_keys"], key, side="left")
        hi = np.searchsorted(ix["idx_keys"], key, side="right")
        n_cand = hi - lo
        tot = int(n_cand.sum())
        if tot == 0:
            return empty
        pidx = np.repeat(np.arange(len(px)), n_cand)
        pos = np.arange(tot) - np.repeat(np.cumsum(n_cand) - n_cand, n_cand)
        gcand = ix["idx_polys"][np.repeat(lo, n_cand) + pos]
        # bbox refine
        keep = (
            (px[pidx] >= ix["shminx"][gcand]) & (px[pidx] <= ix["shmaxx"][gcand])
            & (py[pidx] >= ix["shminy"][gcand]) & (py[pidx] <= ix["shmaxy"][gcand])
        )
        pidx, gcand = pidx[keep], gcand[keep]
        if not len(pidx):
            return empty
        # expand to (pair, ring) rows, parity per ring, XOR per pair
        pair_nrings = ix["rings_per_poly"][gcand]
        tot = int(pair_nrings.sum())
        pair_idx = np.repeat(np.arange(len(pidx)), pair_nrings)
        pos = np.arange(tot) - np.repeat(np.cumsum(pair_nrings) - pair_nrings, pair_nrings)
        ring_ids = ix["ring_starts"][gcand][pair_idx] + pos
        hit = pair_points_in_rings(
            px[pidx][pair_idx], py[pidx][pair_idx], ring_ids,
            ix["flat_x"], ix["flat_y"], ix["offsets"],
        )
        inside = np.zeros(len(pidx), dtype=bool)
        np.bitwise_xor.at(inside, pair_idx, hit)
        keep = np.flatnonzero(inside)
        return pd.DataFrame(
            {
                "point_id": pid[pidx[keep]],
                "poly_id": ix["gids"][gcand[keep]],
                **{c: v[pidx[keep]] for c, v in extras.items()},
            }
        )

    return points.map_batches(probe, batch_format="pyarrow")


def zonal_stats(
    points: rd.Dataset,
    polygons: rd.Dataset,
    value_col: str,
    grid_cell: float | None = None,
) -> rd.Dataset:
    """Zonal statistics: per-polygon count/sum/mean of a point value
    column.  Composition of the broadcast containment join (value carried
    through map-side) with the map-side-partial + bucketed-groupby
    aggregation pattern — the shuffle moves per-(batch, polygon) partials,
    never points."""
    joined = spatial_join_broadcast(
        points, polygons, grid_cell=grid_cell, point_cols=[value_col]
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("poly_id", as_index=False).agg(
            n_points=(value_col, "size"), sum_value=(value_col, "sum")
        )

    from geo_polygonize_ray.functions import bucketed_groupby

    return bucketed_groupby(
        joined.map_batches(partial, batch_format="pandas"),
        "poly_id",
        lambda g: g.groupby("poly_id", as_index=False).agg(
            n_points=("n_points", "sum"), sum_value=("sum_value", "sum")
        ),
    )

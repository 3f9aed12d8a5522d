"""Cross-tile boundary resolution (SURVEY.md J6, north_star: "merges rings
crossing tile edges").

The buffered-duplication scheme (J5 + A8) inherits the reference's contract:
a polygon larger than the tile buffer can be mis-traced (src/tiling.rs
caveat, SURVEY.md §3.3).  The north-star sketches a kNN endpoint-stitching
join; we implement the provably-exact alternative: **adaptive buffer
escalation**.

Soundness argument (why a polygon can be trusted without global knowledge):
the tile's input is every linestring whose bbox intersects the buffered
rect, included IN FULL.  A line whose bbox misses the buffered rect cannot
enter it, so for any face whose closed shell lies strictly inside the
buffered rect, (a) all of its boundary linework was present, (b) all noding
split points affecting geometry inside the rect were computed (intersections
happen where both lines are), and (c) dangle pruning cannot have removed a
locally-complete cycle.  Hence:

    an owned polygon (centroid in the tile's half-open rect) whose shell
    bbox is strictly inside the buffered window is EXACT.

A tile is *unresolved* when any owned polygon touches its buffered-window
boundary, or when a pruned (dangle) vertex lies inside the owner rect —
the latter catches faces whose rings were cut by the window and therefore
never appeared in the output.  Unresolved tiles re-run with a doubled
buffer; escalation converges because the buffer eventually covers the whole
bbox (global = exact).  Each tile's polygons come from exactly one round
(its first resolved one), and ownership rects are fixed and disjoint, so
the union over rounds is exactly-once.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data as rd

from geo_polygonize_ray.config import PipelineConfig
from geo_polygonize_ray.local.noding import SnapNoder
from geo_polygonize_ray.local.polygonize import (
    assemble_flat,
    dedup_linestrings,
    explode_to_segments,
)
from geo_polygonize_ray.local.graph import PlanarGraph
from geo_polygonize_ray.stages.linework import SaltedTileAssigner
from geo_polygonize_ray.stages.trace import POLYGON_SCHEMA, flat_to_table
from geo_polygonize_ray.stages.linework import _list_bounds

RESOLVE_SCHEMA = POLYGON_SCHEMA.append(pa.field("resolved", pa.bool_()))


class EscalatingTilePolygonizer:
    """Like TilePolygonizer, but tags each tile's output with a
    ``resolved`` verdict based on the soundness rule above."""

    def __init__(self, assigner: SaltedTileAssigner, snap_grid_size: float = 1e-10,
                 max_noding_iters: int = 10):
        self.assigner = assigner
        self.snap_grid_size = snap_grid_size
        self.max_noding_iters = max_noding_iters
        self.__name__ = "EscalatingTilePolygonizer"

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return RESOLVE_SCHEMA.empty_table()
        tile_ids = group["tile_id"].to_numpy()
        xs, xo = _list_bounds(group["xs"])
        ys, _ = _list_bounds(group["ys"])
        out = []
        order = np.argsort(tile_ids, kind="stable")
        st = tile_ids[order]
        starts = np.flatnonzero(np.concatenate([[True], st[1:] != st[:-1]]))
        ends = np.concatenate([starts[1:], [len(st)]])
        for s, e in zip(starts, ends):
            rows = order[s:e]
            tid = int(st[s])
            lines = [
                np.stack([xs[xo[i] : xo[i + 1]], ys[xo[i] : xo[i + 1]]], axis=1) for i in rows
            ]
            out.append(self._tile(lines, tid))
        return pa.concat_tables(out) if out else RESOLVE_SCHEMA.empty_table()

    def _tile(self, lines: list[np.ndarray], tile_id: int) -> pa.Table:
        ax0, ay0, ax1, ay1 = self.assigner.leaf_rect(tile_id)
        buf = self.assigner.buffer
        wx0, wy0, wx1, wy1 = ax0 - buf, ay0 - buf, ax1 + buf, ay1 + buf

        lines = dedup_linestrings(lines)
        x0, y0, x1, y1 = explode_to_segments(lines)
        noder = SnapNoder(self.snap_grid_size, self.max_noding_iters)
        x0, y0, x1, y1 = noder.node(x0, y0, x1, y1)
        graph = PlanarGraph(x0, y0, x1, y1)
        graph.sort_edges()
        graph.prune_dangles()
        # pruned (dangle) vertices inside the owner rect flag possible cut
        # cycles — faces that never materialized locally
        pruned = graph.nodes_marked
        cut_risk = bool(
            np.any(
                pruned
                & (graph.nodes_x >= ax0)
                & (graph.nodes_x < ax1)
                & (graph.nodes_y >= ay0)
                & (graph.nodes_y < ay1)
            )
        )
        fx, fy, offs = graph.get_edge_rings()
        flat = assemble_flat(fx, fy, offs, owner_rect=(ax0, ay0, ax1, ay1))
        t = flat_to_table(flat, tile_id)

        # trust check: every owned polygon's shell strictly inside the window
        n = t.num_rows
        trusted = True
        if n:
            so = flat["shell_offsets"]
            svx = flat["shell_values_x"]
            svy = flat["shell_values_y"]
            mnx, mny, mxx, mxy = [], [], [], []
            for i in range(n):
                a, b = so[i], so[i + 1]
                mnx.append(svx[a:b].min())
                mxx.append(svx[a:b].max())
                mny.append(svy[a:b].min())
                mxy.append(svy[a:b].max())
            inside = (
                (np.array(mnx) > wx0)
                & (np.array(mxx) < wx1)
                & (np.array(mny) > wy0)
                & (np.array(mxy) < wy1)
            )
            trusted = bool(inside.all())
        resolved = trusted and not cut_risk
        if n == 0 and not resolved:
            # sentinel: a tile with NO output but cut-cycle risk must still
            # report itself unresolved (missing faces are invisible otherwise)
            return pa.table(
                {
                    "tile_id": pa.array([tile_id], pa.int64()),
                    "poly_id": pa.array([-1], pa.int64()),
                    "shell_xs": pa.array([[]], pa.list_(pa.float64())),
                    "shell_ys": pa.array([[]], pa.list_(pa.float64())),
                    "holes_xs": pa.array([[]], pa.list_(pa.list_(pa.float64()))),
                    "holes_ys": pa.array([[]], pa.list_(pa.list_(pa.float64()))),
                    "area": pa.array([0.0]),
                    "cx": pa.array([float("nan")]),
                    "cy": pa.array([float("nan")]),
                    "n_holes": pa.array([0], pa.int64()),
                    "resolved": pa.array([False]),
                },
                schema=RESOLVE_SCHEMA,
            )
        return t.append_column("resolved", pa.array(np.full(n, resolved)))


def polygonize_dataset_adaptive(
    ds: rd.Dataset,
    cfg: PipelineConfig,
    bbox: tuple[float, float, float, float],
    max_rounds: int = 4,
) -> rd.Dataset:
    """Tiled polygonize with adaptive buffer escalation: correct even for
    polygons (arbitrarily) larger than the initial tile buffer.

    Round r uses buffer = max(tile_buffer, tile_size/2) * 2^r, restricted to
    the tiles still unresolved; the final round (buffer covering the bbox)
    is globally exact by construction.  Returns the union of each tile's
    first-resolved output.
    """
    import ray

    n_cpus = int(ray.cluster_resources().get("CPU", 8))
    keep_cols = [c for c in ("plane_id", "line_id", "xs", "ys") if c in ds.schema().names]
    base = ds.select_columns(keep_cols)

    span = max(bbox[2] - bbox[0], bbox[3] - bbox[1])
    buffer0 = max(cfg.tile_buffer, cfg.tile_size / 2.0)
    unresolved: set[int] | None = None  # None = all tiles in round 0
    results: list[rd.Dataset] = []

    for r in range(max_rounds):
        buf = buffer0 * (2**r)
        final_round = buf >= span or r == max_rounds - 1
        assigner = SaltedTileAssigner(bbox, cfg.tile_size, buf, hot={})
        tiles_this_round = unresolved

        def assign(batch: pa.Table, _assigner=assigner, _keep=tiles_this_round) -> pa.Table:
            t = _assigner(batch)
            if _keep is not None and t.num_rows:
                mask = np.isin(t["tile_id"].to_numpy(), list(_keep))
                t = t.filter(pa.array(mask))
            return t

        work = base.map_batches(assign, batch_format="pyarrow")
        n_buckets = max(2, n_cpus * 4)

        def add_bucket(t: pa.Table, _nb=n_buckets) -> pa.Table:
            # mixed hash, not bare modulo: leaf ids are tile*64+sub (see
            # pipelines/polygonize.py add_bucket for the collapse this avoids)
            tid = t["tile_id"].to_numpy().astype(np.uint64)
            mixed = tid * np.uint64(0x9E3779B97F4A7C15)
            return t.append_column(
                "bucket",
                pa.array(((mixed >> np.uint64(33)) % np.uint64(_nb)).astype(np.int64)),
            )

        work = work.map_batches(add_bucket, batch_format="pyarrow")
        work = work.repartition(max(2, n_cpus * 2))
        tracer = EscalatingTilePolygonizer(
            assigner, cfg.snap_grid_size, cfg.max_noding_iters
        )
        out = work.groupby("bucket").map_groups(tracer, batch_format="pyarrow").materialize()

        verdicts = out.select_columns(["tile_id", "resolved"]).to_pandas()
        tile_resolved = verdicts.groupby("tile_id")["resolved"].all()

        def keep_mask(t: pa.Table, _ok=None) -> pa.Table:
            mask = t["poly_id"].to_numpy() >= 0  # drop sentinels
            if _ok is not None:
                mask &= np.isin(t["tile_id"].to_numpy(), list(_ok))
            return t.filter(pa.array(mask)).drop_columns(["resolved"])

        if final_round:
            results.append(out.map_batches(keep_mask, batch_format="pyarrow"))
            unresolved = set()
            break
        ok_tiles = set(tile_resolved[tile_resolved].index.astype(int))
        bad_tiles = set(tile_resolved[~tile_resolved].index.astype(int))
        if ok_tiles:
            import functools

            results.append(
                out.map_batches(
                    functools.partial(keep_mask, _ok=ok_tiles), batch_format="pyarrow"
                )
            )
        if not bad_tiles:
            unresolved = set()
            break
        unresolved = bad_tiles

    if not results:
        return rd.from_arrow(POLYGON_SCHEMA.empty_table())
    res = results[0]
    for more in results[1:]:
        res = res.union(more)
    return res

"""Per-tile polygonization stage — the stateful heart of the distributed
pipeline (SURVEY.md §2.3 ST3).

One call consumes ONE tile's linework group (post-shuffle) and runs the full
local polygonizer (reference §3.1 phases) with ``node_input=True`` exactly
like the reference's per-tile run (src/tiling.rs:62-63), then applies the
sliver filter and the half-open ``[min, max)`` centroid-ownership rule
(src/tiling.rs:95-106) that guarantees each polygon is emitted by exactly
one tile despite the buffered duplication.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_polygonize_ray.local.polygonize import Polygon, polygonize_lines
from geo_polygonize_ray.stages.linework import TileAssigner, _list_bounds

POLYGON_SCHEMA = pa.schema(
    [
        ("tile_id", pa.int64()),
        ("poly_id", pa.int64()),
        ("shell_xs", pa.list_(pa.float64())),
        ("shell_ys", pa.list_(pa.float64())),
        ("holes_xs", pa.list_(pa.list_(pa.float64()))),
        ("holes_ys", pa.list_(pa.list_(pa.float64()))),
        ("area", pa.float64()),
        ("cx", pa.float64()),
        ("cy", pa.float64()),
        ("n_holes", pa.int64()),
    ]
)


def polygons_to_table(polys: list[Polygon], tile_id: int = 0) -> pa.Table:
    rows = {
        "tile_id": [],
        "poly_id": [],
        "shell_xs": [],
        "shell_ys": [],
        "holes_xs": [],
        "holes_ys": [],
        "area": [],
        "cx": [],
        "cy": [],
        "n_holes": [],
    }
    for i, p in enumerate(polys):
        cx, cy = p.centroid()
        rows["tile_id"].append(tile_id)
        rows["poly_id"].append(i)
        rows["shell_xs"].append(p.shell_x.tolist())
        rows["shell_ys"].append(p.shell_y.tolist())
        rows["holes_xs"].append([h.tolist() for h in p.holes_x])
        rows["holes_ys"].append([h.tolist() for h in p.holes_y])
        rows["area"].append(p.area)
        rows["cx"].append(cx)
        rows["cy"].append(cy)
        rows["n_holes"].append(len(p.holes_x))
    return pa.table(rows, schema=POLYGON_SCHEMA)


def table_to_polygons(t: pa.Table) -> list[Polygon]:
    polys = []
    for i in range(t.num_rows):
        polys.append(
            Polygon(
                np.array(t["shell_xs"][i].as_py()),
                np.array(t["shell_ys"][i].as_py()),
                [np.array(h) for h in t["holes_xs"][i].as_py()],
                [np.array(h) for h in t["holes_ys"][i].as_py()],
            )
        )
    return polys


class TilePolygonizer:
    """map_groups payload: one buffered tile's linework -> owned polygons.

    Instantiated once per actor (the actor-pool pattern ST3); per-call state
    (graph arenas) is local numpy.
    """

    def __init__(
        self,
        assigner: TileAssigner | None,
        node_input: bool = True,
        snap_grid_size: float = 1e-10,
        max_noding_iters: int = 10,
        ownership: bool = True,
    ):
        self.assigner = assigner
        self.node_input = node_input
        self.snap_grid_size = snap_grid_size
        self.max_noding_iters = max_noding_iters
        self.ownership = ownership
        self.__name__ = "TilePolygonizer"  # ray map_groups wraps fn.__name__

    def __call__(self, group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return POLYGON_SCHEMA.empty_table()
        tile_id = int(group["tile_id"][0].as_py()) if "tile_id" in group.schema.names else 0
        xs, xo = _list_bounds(group["xs"])
        ys, _ = _list_bounds(group["ys"])
        lines = [
            np.stack([xs[xo[i] : xo[i + 1]], ys[xo[i] : xo[i + 1]]], axis=1)
            for i in range(group.num_rows)
        ]
        polys = polygonize_lines(
            lines,
            node_input=self.node_input,
            snap_grid_size=self.snap_grid_size,
            max_noding_iters=self.max_noding_iters,
        )
        if self.ownership and self.assigner is not None:
            tx0, ty0, tx1, ty1 = self.assigner.tile_rect(tile_id)
            kept = []
            for p in polys:
                if p.area < 1e-6:  # sliver filter (src/tiling.rs:95-97)
                    continue
                cx, cy = p.centroid()
                # half-open [min, max) ownership (src/tiling.rs:99-106)
                if tx0 <= cx < tx1 and ty0 <= cy < ty1:
                    kept.append(p)
            polys = kept
        return polygons_to_table(polys, tile_id)

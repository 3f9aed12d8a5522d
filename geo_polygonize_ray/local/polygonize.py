"""Single-partition polygonizer (reference src/polygonizer.rs, all 8 phases).

This is the per-cell worker payload of the Ray engine — NOT a user API.  One
call processes one partition's linework entirely in numpy, mirroring the
reference's phase sequence (src/polygonizer.rs:112-262):

  1. build graph (dedup lines -> explode -> [node] -> bulk load)
  2. angular sort            5. classify shells/holes (signed area)
  3. prune dangles           6. promote twin-less CW rings to shells
  4. trace edge rings        7. assign holes to min-area containing shell
                             8. assemble + sliver filter

The distributed pipeline (pipelines/polygonize.py) shuffles linework by
spatial cell and runs this inside ``map_groups`` actors, then applies the
centroid-ownership filter (reference src/tiling.rs:99-106).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from geo_polygonize_ray.geom.kernels import (
    points_in_ring,
    ring_centroid,
    ring_centroid_many,
    signed_area,
    signed_area_many,
    bbox_many,
)
from geo_polygonize_ray.local.graph import PlanarGraph
from geo_polygonize_ray.local.noding import SnapNoder


@dataclass
class Polygon:
    """shell is a closed (N,2)-ish pair of arrays; holes are closed rings."""

    shell_x: np.ndarray
    shell_y: np.ndarray
    holes_x: list[np.ndarray] = field(default_factory=list)
    holes_y: list[np.ndarray] = field(default_factory=list)

    @property
    def shell_area(self) -> float:
        return abs(signed_area(self.shell_x[:-1], self.shell_y[:-1]))

    @property
    def area(self) -> float:
        """Unsigned area of shell minus holes (geo::Area on Polygon with
        CW-wound interiors, as used at src/polygonizer.rs:256)."""
        a = signed_area(self.shell_x[:-1], self.shell_y[:-1])
        for hx, hy in zip(self.holes_x, self.holes_y):
            a += signed_area(hx[:-1], hy[:-1])  # holes traced CW -> negative
        return abs(a)

    def centroid(self) -> tuple[float, float]:
        return ring_centroid(self.shell_x, self.shell_y)


def dedup_linestrings(lines: list[np.ndarray]) -> list[np.ndarray]:
    """Stable sort by first coordinate, remove consecutive identical
    linestrings (src/polygonizer.rs:75-83: sort_by first coord then dedup)."""
    if not lines:
        return lines
    firsts = np.array(
        [(ls[0, 0], ls[0, 1]) if len(ls) else (0.0, 0.0) for ls in lines], dtype=np.float64
    )
    order = np.lexsort((firsts[:, 1], firsts[:, 0]))
    out: list[np.ndarray] = []
    for idx in order:
        ls = lines[idx]
        if out and out[-1].shape == ls.shape and np.array_equal(out[-1], ls):
            continue
        out.append(ls)
    return out


def explode_to_segments(
    lines: list[np.ndarray],
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """LineStrings -> consecutive-pair segments (src/polygonizer.rs:86-100)."""
    xs0, ys0, xs1, ys1 = [], [], [], []
    for ls in lines:
        if len(ls) < 2:
            continue
        xs0.append(ls[:-1, 0])
        ys0.append(ls[:-1, 1])
        xs1.append(ls[1:, 0])
        ys1.append(ls[1:, 1])
    if not xs0:
        z = np.empty(0, dtype=np.float64)
        return z, z.copy(), z.copy(), z.copy()
    return (
        np.concatenate(xs0).astype(np.float64),
        np.concatenate(ys0).astype(np.float64),
        np.concatenate(xs1).astype(np.float64),
        np.concatenate(ys1).astype(np.float64),
    )


class LocalPolygonizer:
    """Mirror of reference ``Polygonizer`` config + phases (src/polygonizer.rs:27-54)."""

    def __init__(self, node_input: bool = False, snap_grid_size: float = 1e-10,
                 max_noding_iters: int = 10):
        self.node_input = node_input
        self.snap_grid_size = snap_grid_size
        self.max_noding_iters = max_noding_iters
        self._lines: list[np.ndarray] = []

    def add_linestring(self, coords: np.ndarray) -> None:
        """coords: (N, 2) float array. Polygon rings are added as linework
        by the caller (extract_lines semantics, src/polygonizer.rs:265-288)."""
        self._lines.append(np.asarray(coords, dtype=np.float64))

    def polygonize(self) -> list[Polygon]:
        lines = self._lines
        if self.node_input:
            lines = dedup_linestrings(lines)
            x0, y0, x1, y1 = explode_to_segments(lines)
            noder = SnapNoder(self.snap_grid_size, self.max_noding_iters)
            x0, y0, x1, y1 = noder.node(x0, y0, x1, y1)
        else:
            x0, y0, x1, y1 = explode_to_segments(lines)
        return polygonize_segments(x0, y0, x1, y1)


def polygonize_lines(
    lines: list[np.ndarray],
    node_input: bool = False,
    snap_grid_size: float = 1e-10,
    max_noding_iters: int = 10,
) -> list[Polygon]:
    p = LocalPolygonizer(node_input, snap_grid_size, max_noding_iters)
    for ls in lines:
        p.add_linestring(ls)
    return p.polygonize()


def trace_rings(x0, y0, x1, y1) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Phases 2-4 over an already-noded segment soup: build graph, angular
    sort, prune dangles, trace edge rings.  Returns the flat ring layout."""
    graph = PlanarGraph(x0, y0, x1, y1)
    graph.sort_edges()
    graph.prune_dangles()
    return graph.get_edge_rings()


def polygonize_segments(x0, y0, x1, y1) -> list[Polygon]:
    """Phases 2-8 over an already-noded segment soup."""
    flat_x, flat_y, offsets = trace_rings(x0, y0, x1, y1)
    return assemble_polygons(flat_x, flat_y, offsets)


def assemble_polygons(flat_x: np.ndarray, flat_y: np.ndarray, offsets: np.ndarray) -> list[Polygon]:
    """Phases 5-8: classify, promote, assign holes, assemble.

    Exact reference semantics:
      * |area| < 1e-9 rings dropped as degenerate   (src/polygonizer.rs:138)
      * CCW -> shell, CW -> hole                     (src/polygonizer.rs:142-148)
      * CW ring promoted to (CCW-rewound) shell iff no CCW shell with
        |area diff| < 1e-6 AND bit-identical bbox    (src/polygonizer.rs:151-185)
      * every hole assigned to the minimum-area shell that PIP-contains its
        centroid and has area > hole_area + 1e-6     (src/polygonizer.rs:199-249)
      * polygons with residual area <= 1e-6 dropped  (src/polygonizer.rs:256)
    """
    n_rings = len(offsets) - 1
    if n_rings == 0:
        return []
    areas = signed_area_many(flat_x, flat_y, offsets)
    keep = np.abs(areas) >= 1e-9
    shell_ids = np.flatnonzero(keep & (areas > 0))
    hole_ids = np.flatnonzero(keep & (areas < 0))

    def ring(r: int) -> tuple[np.ndarray, np.ndarray]:
        s, e = offsets[r], offsets[r + 1]
        return flat_x[s:e], flat_y[s:e]

    minx, miny, maxx, maxy = bbox_many(flat_x, flat_y, offsets)

    # --- promotion anti-join (src/polygonizer.rs:151-185) ------------------
    # keyed scan instead of the reference's O(H*S) loop: bucket shells by
    # bit-exact bbox; within a bucket compare |area| within 1e-6.
    bbox_key: dict[tuple, list[float]] = {}
    for s in shell_ids:
        bbox_key.setdefault((minx[s], miny[s], maxx[s], maxy[s]), []).append(abs(areas[s]))
    promoted = [
        int(h)
        for h in hole_ids
        if not any(
            abs(sa - abs(areas[h])) < 1e-6
            for sa in bbox_key.get((minx[h], miny[h], maxx[h], maxy[h]), ())
        )
    ]
    shells = np.concatenate([shell_ids, np.array(promoted, dtype=np.int64)]).astype(np.int64)
    n_orig = len(shell_ids)

    shell_areas = np.abs(areas[shells])

    # --- hole assignment (src/polygonizer.rs:199-249), batched -------------
    # Equivalent restatement of "min-area shell that PIP-contains the hole
    # centroid and has area > hole_area + 1e-6": process shells in ascending
    # area order and give each still-unassigned eligible hole its first hit.
    # The per-shell PIP runs over ALL its candidate centroids at once, and a
    # sorted-areas searchsorted short-circuit skips shells with no
    # area-eligible hole in O(log H).
    cx_all, cy_all = ring_centroid_many(flat_x, flat_y, offsets)
    n_h = len(hole_ids)
    assigned = np.full(n_h, -1, dtype=np.int64)
    if n_h:
        h_area = np.abs(areas[hole_ids])
        h_cx = cx_all[hole_ids]
        h_cy = cy_all[hole_ids]
        area_order = np.argsort(h_area, kind="stable")
        sorted_h_area = h_area[area_order]
        shell_order = np.argsort(shell_areas, kind="stable")
        for si in shell_order:
            sa = shell_areas[si]
            n_elig = int(np.searchsorted(sorted_h_area, sa - 1e-6, side="left"))
            if n_elig == 0:
                continue
            cand = area_order[:n_elig]
            cand = cand[assigned[cand] == -1]
            if len(cand) == 0:
                continue
            rid = shells[si]
            inb = (
                (h_cx[cand] >= minx[rid])
                & (h_cx[cand] <= maxx[rid])
                & (h_cy[cand] >= miny[rid])
                & (h_cy[cand] <= maxy[rid])
            )
            cand = cand[inb]
            if len(cand) == 0:
                continue
            rx, ry = ring(rid)
            hit = points_in_ring(h_cx[cand], h_cy[cand], rx, ry)
            assigned[cand[hit]] = si

    # --- assemble (src/polygonizer.rs:246-261) -----------------------------
    hole_lists: dict[int, list[int]] = {}
    for hi in range(n_h):
        if assigned[hi] >= 0:
            hole_lists.setdefault(int(assigned[hi]), []).append(int(hole_ids[hi]))

    result: list[Polygon] = []
    for si in range(len(shells)):
        rid = int(shells[si])
        rx, ry = ring(rid)
        if si >= n_orig:  # promoted: rewind CCW (src/polygonizer.rs:165-168)
            rx, ry = rx[::-1].copy(), ry[::-1].copy()
        holes = hole_lists.get(si, [])
        residual = shell_areas[si]
        hx, hy = [], []
        for h in holes:
            ax, ay = ring(h)
            hx.append(ax)
            hy.append(ay)
            residual -= abs(areas[h])
        if abs(residual) > 1e-6:
            result.append(Polygon(rx, ry, hx, hy))
    return result

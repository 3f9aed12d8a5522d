"""Stateless map_batches stages over the linework table (SURVEY.md §2.2).

Batch format is zero-copy Arrow throughout; all math is vectorized over the
flat list buffers (no per-row Python in the hot path).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_polygonize_ray.geom.kernels import bbox_many


def _list_bounds(col: pa.ChunkedArray | pa.ListArray) -> tuple[np.ndarray, np.ndarray]:
    """flat values + offsets of a list<float64> column (combined chunks)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    return values, offsets


def linework_bboxes(batch: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Per-row bbox of the xs/ys list columns (K2, vectorized)."""
    xs, xo = _list_bounds(batch["xs"])
    ys, _ = _list_bounds(batch["ys"])
    return bbox_many(xs, ys, xo)


class TileAssigner:
    """flat_map each linework row to every buffered tile its bbox intersects
    (J5, reference src/tiling.rs:66-77: geometry *duplication*, not
    splitting).  Emits the row once per overlapping tile with a ``tile_id``
    column; the downstream ``groupby("tile_id")`` is THE shuffle.

    Tile grid (reference src/tiling.rs:37-58): regular ``tile_size`` grid
    over ``bbox``; ``tile_id = row * n_cols + col``.
    """

    def __init__(
        self,
        bbox: tuple[float, float, float, float],
        tile_size: float,
        buffer: float = 0.0,
    ):
        self.minx, self.miny, self.maxx, self.maxy = bbox
        self.tile_size = tile_size
        self.buffer = buffer
        self.n_cols = max(int(np.ceil((self.maxx - self.minx) / tile_size)), 1)
        self.n_rows = max(int(np.ceil((self.maxy - self.miny) / tile_size)), 1)

    def tile_rect(self, tile_id: int) -> tuple[float, float, float, float]:
        r, c = divmod(tile_id, self.n_cols)
        x0 = self.minx + c * self.tile_size
        y0 = self.miny + r * self.tile_size
        # clamp to global bbox (src/tiling.rs:50-51)
        return (
            x0,
            y0,
            min(x0 + self.tile_size, self.maxx),
            min(y0 + self.tile_size, self.maxy),
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return batch.append_column("tile_id", pa.array([], pa.int64()))
        bminx, bminy, bmaxx, bmaxy = linework_bboxes(batch)
        ts, buf = self.tile_size, self.buffer
        # tile index ranges whose BUFFERED rect intersects the row bbox
        # (closed-interval overlap, matching geo::Intersects at tiling.rs:74).
        # Tile c covers [c*ts, (c+1)*ts]; closed overlap with [lo, hi] means
        # c in [ceil(lo/ts - 1), floor(hi/ts)] — the ceil(x-1) form keeps the
        # lower tile when lo lands exactly on a tile boundary (the reference's
        # exact-boundary ownership test, src/tiling_tests.rs:52-80).
        lox = (bminx - buf - self.minx) / ts
        hix = (bmaxx + buf - self.minx) / ts
        loy = (bminy - buf - self.miny) / ts
        hiy = (bmaxy + buf - self.miny) / ts
        c0 = np.clip(np.ceil(lox - 1.0), 0, self.n_cols - 1).astype(np.int64)
        c1 = np.clip(np.floor(hix), 0, self.n_cols - 1).astype(np.int64)
        r0 = np.clip(np.ceil(loy - 1.0), 0, self.n_rows - 1).astype(np.int64)
        r1 = np.clip(np.floor(hiy), 0, self.n_rows - 1).astype(np.int64)
        counts = (c1 - c0 + 1) * (r1 - r0 + 1)
        total = int(counts.sum())
        row_idx = np.repeat(np.arange(n), counts)
        local = np.arange(total) - np.repeat(np.concatenate([[0], np.cumsum(counts)[:-1]]), counts)
        width = np.repeat(c1 - c0 + 1, counts)
        dc = local % width
        dr = local // width
        tile_id = (np.repeat(r0, counts) + dr) * self.n_cols + (np.repeat(c0, counts) + dc)
        out = batch.take(pa.array(row_idx))
        return out.append_column("tile_id", pa.array(tile_id, pa.int64()))

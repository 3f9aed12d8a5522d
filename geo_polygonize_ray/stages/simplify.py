"""map_batches stage: Douglas-Peucker simplification of the polygons
table (shell + hole rings), zero-copy over the Arrow list buffers.

Areas/centroids are NOT recomputed — simplification is a lossy
viewport/export transform; callers who need exact metrics keep the
originals (the stage preserves all non-geometry columns untouched)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from geo_polygonize_ray.geom.simplify import apply_mask_to_lists, simplify_mask


def _simplify_list_col(col: pa.ChunkedArray | pa.ListArray, eps: float) -> tuple[np.ndarray, np.ndarray]:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    offsets = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    values = col.values.to_numpy(zero_copy_only=False)
    return values, offsets


def simplify_polygons(batch: pa.Table, eps: float) -> pa.Table:
    """Simplify shell_xs/ys and holes_xs/ys in one vectorized pass each.
    The x-mask is reused for y (the keep decision is per VERTEX)."""
    sx, so = _simplify_list_col(batch["shell_xs"], eps)
    sy, _ = _simplify_list_col(batch["shell_ys"], eps)
    keep = simplify_mask(sx, sy, so, eps)
    nx, no = apply_mask_to_lists(sx, so, keep)
    ny, _ = apply_mask_to_lists(sy, so, keep)
    out = batch.set_column(
        batch.schema.get_field_index("shell_xs"),
        "shell_xs",
        pa.ListArray.from_arrays(pa.array(no, pa.int32()), pa.array(nx, pa.float64())),
    )
    out = out.set_column(
        out.schema.get_field_index("shell_ys"),
        "shell_ys",
        pa.ListArray.from_arrays(pa.array(no, pa.int32()), pa.array(ny, pa.float64())),
    )

    # holes: list<list<double>> — flatten both levels; the OUTER structure
    # (holes per polygon) is unchanged, only inner ring verts shrink
    hx_col = batch["holes_xs"]
    if isinstance(hx_col, pa.ChunkedArray):
        hx_col = hx_col.combine_chunks()
    hy_col = batch["holes_ys"]
    if isinstance(hy_col, pa.ChunkedArray):
        hy_col = hy_col.combine_chunks()
    outer_off = hx_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    inner_x = hx_col.values  # ListArray of rings
    inner_y = hy_col.values
    if len(inner_x) == 0:
        return out
    hx, ho = _simplify_list_col(inner_x, eps)
    hy, _ = _simplify_list_col(inner_y, eps)
    hkeep = simplify_mask(hx, hy, ho, eps)
    nhx, nho = apply_mask_to_lists(hx, ho, hkeep)
    nhy, _ = apply_mask_to_lists(hy, ho, hkeep)
    new_inner_x = pa.ListArray.from_arrays(pa.array(nho, pa.int32()), pa.array(nhx, pa.float64()))
    new_inner_y = pa.ListArray.from_arrays(pa.array(nho, pa.int32()), pa.array(nhy, pa.float64()))
    out = out.set_column(
        out.schema.get_field_index("holes_xs"),
        "holes_xs",
        pa.ListArray.from_arrays(pa.array(outer_off, pa.int32()), new_inner_x),
    )
    out = out.set_column(
        out.schema.get_field_index("holes_ys"),
        "holes_ys",
        pa.ListArray.from_arrays(pa.array(outer_off, pa.int32()), new_inner_y),
    )
    return out

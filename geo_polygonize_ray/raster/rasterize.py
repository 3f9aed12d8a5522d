"""Vector -> raster: fill polygons back into a label/color image.

Used by the flagship pipeline's verification stage: decode -> vectorize ->
polygonize -> rasterize must round-trip the image (PSNR >= threshold; exact
for lossless formats), the per-row invariant from BASELINE.json input_hint.

Fill rule: even-odd crossing parity at pixel centers (x+0.5, y+0.5) over
shell + holes — the same crossing test as the PIP kernel (K6), evaluated
vectorized over all pixels of the polygon's bbox.  Pixel centers never lie
on the integer-grid boundary linework, so every pixel belongs to exactly one
face and the reconstruction is exact for flat-color regions.
"""

from __future__ import annotations

import numpy as np

from geo_polygonize_ray.geom.kernels import points_in_ring
from geo_polygonize_ray.local.polygonize import Polygon


def rasterize_polygons(
    polys: list[Polygon], source: np.ndarray
) -> np.ndarray:
    """Fill each polygon with the source color sampled at a pixel inside it.

    source: (h, w, 3) uint8 original (decoded) image; returns same shape.
    """
    h, w, _ = source.shape
    out = np.zeros_like(source)
    filled = np.zeros((h, w), dtype=bool)
    for poly in polys:
        mask = _poly_mask(poly, w, h)
        if not mask.any():
            continue
        ys, xs = np.nonzero(mask)
        color = source[ys[0], xs[0]]
        out[mask] = color
        filled |= mask
    # pixels not covered by any polygon (possible when dangles pruned away
    # isolated structure) keep the source value so lossless stays lossless
    if not filled.all():
        out[~filled] = source[~filled]
    return out


def _poly_mask(poly: Polygon, w: int, h: int) -> np.ndarray:
    minx = max(int(np.floor(poly.shell_x.min())), 0)
    maxx = min(int(np.ceil(poly.shell_x.max())), w)
    miny = max(int(np.floor(poly.shell_y.min())), 0)
    maxy = min(int(np.ceil(poly.shell_y.max())), h)
    if minx >= maxx or miny >= maxy:
        return np.zeros((h, w), dtype=bool)
    gx, gy = np.meshgrid(
        np.arange(minx, maxx) + 0.5, np.arange(miny, maxy) + 0.5
    )
    px = gx.ravel()
    py = gy.ravel()
    inside = points_in_ring(px, py, poly.shell_x, poly.shell_y)
    for hx, hy in zip(poly.holes_x, poly.holes_y):
        inside ^= points_in_ring(px, py, hx, hy)
    mask = np.zeros((h, w), dtype=bool)
    mask[miny:maxy, minx:maxx] = inside.reshape(maxy - miny, maxx - minx)
    return mask

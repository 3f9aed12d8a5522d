"""Vectorized Douglas-Peucker polyline/ring simplification (K-family).

The classic tolerance-based simplifier, restated for flat Arrow ring
storage: instead of one recursive call per ring, ALL active (start, end)
chord intervals across every ring of a batch advance together each
round — perpendicular distances for every interval's interior points are
computed in one repeat/offset expansion, the per-interval argmax comes
from ``np.maximum.reduceat``, and intervals split or retire in bulk.
Rounds are O(max recursion depth), work per round is one vectorized pass
— no per-point or per-ring Python in the loop.

Guarantee (standard DP): every dropped vertex lies within ``eps`` of the
simplified polyline; chord endpoints are always kept, so rings stay
closed and valid for the engine's centroid/area kernels.
"""

from __future__ import annotations

import numpy as np


def _chord_distances(
    px: np.ndarray, py: np.ndarray, ax, ay, bx, by
) -> np.ndarray:
    """Perpendicular (segment) distance of points to chords, elementwise.
    Degenerate chords (a == b, a closed ring's full loop) fall back to
    point distance."""
    dx = bx - ax
    dy = by - ay
    L2 = dx * dx + dy * dy
    # parameter of the projection clamped to the segment
    with np.errstate(divide="ignore", invalid="ignore"):
        t = np.where(L2 > 0.0, ((px - ax) * dx + (py - ay) * dy) / L2, 0.0)
    t = np.clip(t, 0.0, 1.0)
    qx = ax + t * dx
    qy = ay + t * dy
    return np.hypot(px - qx, py - qy)


def simplify_mask(
    flat_x: np.ndarray, flat_y: np.ndarray, offsets: np.ndarray, eps: float
) -> np.ndarray:
    """Boolean keep-mask over the flat vertex storage of many rings
    (``offsets``: int64, one slice [offsets[i], offsets[i+1]) per ring,
    first == last vertex for closed rings)."""
    n = len(flat_x)
    keep = np.zeros(n, dtype=bool)
    starts = offsets[:-1].astype(np.int64)
    ends = (offsets[1:] - 1).astype(np.int64)  # index of the closing vertex
    keep[starts[starts < n]] = True
    keep[ends[ends >= 0]] = True
    # active chord intervals (a, b) with interior points
    a = starts[ends - starts > 1]
    b = ends[ends - starts > 1]
    while len(a):
        counts = b - a - 1
        tot = int(counts.sum())
        seg = np.repeat(np.arange(len(a)), counts)
        pos = np.arange(tot) - np.repeat(np.cumsum(counts) - counts, counts)
        idx = np.repeat(a + 1, counts) + pos
        d = _chord_distances(
            flat_x[idx], flat_y[idx], flat_x[a][seg], flat_y[a][seg],
            flat_x[b][seg], flat_y[b][seg],
        )
        bound = np.concatenate([[0], np.cumsum(counts)[:-1]])
        dmax = np.maximum.reduceat(d, bound)
        # first interior point attaining the per-interval max
        hit = np.flatnonzero(d == dmax[seg])
        first = np.zeros(len(a), dtype=np.int64)
        u, fi = np.unique(seg[hit], return_index=True)
        first[u] = idx[hit[fi]]
        split = dmax > eps
        sp = first[split]
        keep[sp] = True
        # each split interval becomes two; the rest retire
        a2 = np.concatenate([a[split], sp])
        b2 = np.concatenate([sp, b[split]])
        inner = b2 - a2 > 1
        a, b = a2[inner], b2[inner]
    return keep


def apply_mask_to_lists(
    flat: np.ndarray, offsets: np.ndarray, keep: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """(flat values, offsets) of the kept vertices — vectorized rebuild of
    the list column after simplification."""
    new_flat = flat[keep]
    per_ring = np.add.reduceat(keep.astype(np.int64), offsets[:-1]) if len(offsets) > 1 else np.array([], np.int64)
    # reduceat quirk: empty trailing slices repeat the prior value; rings
    # here are never empty (>= 2 kept endpoints), so this is safe
    new_offsets = np.concatenate([[0], np.cumsum(per_ring)]).astype(np.int64)
    return new_flat, new_offsets

"""Raster -> vector linework (the target-only front-end the north-star adds
on top of the reference: "rasters vectorized to line-work, then polygonized
back", BASELINE.json).

A label raster (one label per flat-color region) is converted to the
boundary linework between differing labels (plus the image border), with
collinear runs merged into maximal segments.  The output linework is exactly
noded at integer pixel-grid coordinates, so the per-image polygonizer can run
with ``node_input=False`` — no snapping pass needed, which is what makes the
per-image flagship pipeline embarrassingly parallel.

Coordinate frame: pixel (col x, row y) occupies [x, x+1] x [y, y+1]; the
linework lives on the integer grid of pixel corners.
"""

from __future__ import annotations

import numpy as np


def rgb_to_labels(img: np.ndarray) -> np.ndarray:
    """(h, w, 3) uint8 -> (h, w) int32 label per unique color (packed RGB)."""
    img = np.asarray(img, dtype=np.uint32)
    return (img[..., 0] << 16 | img[..., 1] << 8 | img[..., 2]).astype(np.int32)


def _runs_to_segments(mask: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """mask: (n_lines, n_cells) boolean; returns (line_idx, start, end) of
    maximal True runs per line — fully vectorized run-length encoding."""
    n, m = mask.shape
    padded = np.zeros((n, m + 2), dtype=bool)
    padded[:, 1:-1] = mask
    d = np.diff(padded.astype(np.int8), axis=1)
    line_idx, starts = np.nonzero(d == 1)
    _, ends = np.nonzero(d == -1)
    return line_idx, starts, ends


def labels_to_linework(
    labels: np.ndarray,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(h, w) labels -> noded boundary segments (x0, y0, x1, y1) float64.

    A horizontal grid edge at row-boundary y between columns [x, x+1) is a
    boundary iff labels[y-1, x] != labels[y, x] (out-of-image counts as a
    distinct label).  Same for vertical.  Maximal collinear runs are merged,
    but runs are split at crossing boundary junctions to keep the linework
    exactly noded (a horizontal run is broken wherever a vertical boundary
    edge touches it, and vice versa).
    """
    labels = np.asarray(labels)
    h, w = labels.shape

    # boundary masks on the (h+1) x w horizontal grid edges and h x (w+1) vertical
    hmask = np.ones((h + 1, w), dtype=bool)
    hmask[1:h, :] = labels[1:, :] != labels[:-1, :]
    vmask = np.ones((h, w + 1), dtype=bool)
    vmask[:, 1:w] = labels[:, 1:] != labels[:, :-1]

    # node mask: a grid corner (x, y) is a junction if the boundary structure
    # changes there; split runs at corners where any PERPENDICULAR boundary
    # edge is incident.
    # corner (x, y) with x in 0..w, y in 0..h touches vertical edges
    # (x, y-1)-(x, y) i.e. vmask[y-1, x] and vmask[y, x].
    vtouch = np.zeros((h + 1, w + 1), dtype=bool)
    vtouch[:h, :] |= vmask
    vtouch[1:, :] |= vmask
    htouch = np.zeros((h + 1, w + 1), dtype=bool)
    htouch[:, :w] |= hmask
    htouch[:, 1:] |= hmask

    segs: list[tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]] = []

    # horizontal runs, split at corners with vertical incidence:
    # break a run between cell x-1 and x at corner x if a vertical edge touches
    run_break = vtouch[:, 1:w]  # corners 1..w-1
    line_idx, starts, ends = _runs_to_segments(hmask)
    if len(line_idx):
        # expand runs into sub-runs at break corners: emit unit edges then
        # merge via cumulative "segment id" trick
        ys, xs0, xs1 = _split_runs(line_idx, starts, ends, run_break)
        segs.append((xs0.astype(np.float64), ys.astype(np.float64), xs1.astype(np.float64), ys.astype(np.float64)))

    # vertical runs, split at corners with horizontal incidence
    run_break_v = htouch[1:h, :].T  # for column lines: corners y 1..h-1, transposed to (w+1, h-1)
    line_idx, starts, ends = _runs_to_segments(vmask.T)
    if len(line_idx):
        xs, ys0, ys1 = _split_runs(line_idx, starts, ends, run_break_v)
        segs.append((xs.astype(np.float64), ys0.astype(np.float64), xs.astype(np.float64), ys1.astype(np.float64)))

    if not segs:
        z = np.empty(0, dtype=np.float64)
        return z, z.copy(), z.copy(), z.copy()
    x0 = np.concatenate([s[0] for s in segs])
    y0 = np.concatenate([s[1] for s in segs])
    x1 = np.concatenate([s[2] for s in segs])
    y1 = np.concatenate([s[3] for s in segs])
    return x0, y0, x1, y1


def _split_runs(
    line_idx: np.ndarray, starts: np.ndarray, ends: np.ndarray, break_mask: np.ndarray
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Split runs [start, end) on line `line_idx` at interior break corners.

    break_mask: (n_lines, n_corners-ish) — break_mask[l, c] means corner c+1
    on line l splits a run spanning it.  Returns (line, seg_start, seg_end)
    arrays of the split sub-segments in grid units.
    """
    out_line: list[np.ndarray] = []
    out_s: list[np.ndarray] = []
    out_e: list[np.ndarray] = []
    # vectorized: for each run, the interior corners are start+1..end-1;
    # collect break positions via the global mask.
    n_corners = break_mask.shape[1]
    for l, s, e in zip(line_idx, starts, ends):
        if e - s == 1:
            out_line.append(np.array([l]))
            out_s.append(np.array([s]))
            out_e.append(np.array([e]))
            continue
        interior = np.arange(s + 1, e)
        valid = interior[(interior - 1 < n_corners)]
        brk = valid[break_mask[l, valid - 1]]
        pts = np.concatenate([[s], brk, [e]])
        out_line.append(np.full(len(pts) - 1, l))
        out_s.append(pts[:-1])
        out_e.append(pts[1:])
    return (
        np.concatenate(out_line),
        np.concatenate(out_s),
        np.concatenate(out_e),
    )

"""Iterative snapping noder (reference src/noding/snap.rs).

Same semantics as the reference's ``SnapNoder``:
  1. snap all endpoints to the grid, drop degenerates     (snap.rs:35-42)
  2. up to ``max_iter`` (=10) rounds of:
       find AABB-overlapping candidate pairs              (snap.rs:117-134)
       classify intersections, collect snapped split pts  (snap.rs:140-167)
       split each segment at its points sorted by
       distance-from-start, dedup consecutive points      (snap.rs:55-79)
       canonical-direction normalize + sort + dedup       (snap.rs:88-101)

The R-tree self-join is replaced by a uniform bucket-grid candidate
generator — vectorized with numpy, and the per-cell shuffle upstream already
bounds the working set (SURVEY.md §2.3 ST1: "the groupby shuffle replaces
the global R-tree").
"""

from __future__ import annotations

import numpy as np

from geo_polygonize_ray.geom.kernels import (
    COLLINEAR_OVERLAP,
    SINGLE_POINT,
    segment_intersections,
    snap_to_grid,
)


def _candidate_pairs(x0, y0, x1, y1) -> tuple[np.ndarray, np.ndarray]:
    """All i<j pairs whose AABBs overlap (closed), via uniform grid buckets."""
    n = len(x0)
    if n < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    minx = np.minimum(x0, x1)
    maxx = np.maximum(x0, x1)
    miny = np.minimum(y0, y1)
    maxy = np.maximum(y0, y1)

    gminx, gmaxx = float(minx.min()), float(maxx.max())
    gminy, gmaxy = float(miny.min()), float(maxy.max())
    # bucket size ~ 2x median segment extent, bounded so the grid stays
    # sane.  The RESULT is h-independent (an AABB-overlapping pair always
    # shares the bucket containing an overlap point), so h is purely a
    # perf knob; 2x measured fastest on the random-soup bench (fewer
    # exploded rows/buckets beats slightly larger in-bucket pair counts).
    ext = np.median(np.maximum(maxx - minx, maxy - miny))
    span = max(gmaxx - gminx, gmaxy - gminy, 1e-300)
    h = max(2.0 * float(ext), span / 1024.0)
    if h <= 0:
        h = span

    bx0 = np.floor((minx - gminx) / h).astype(np.int32)
    bx1 = np.floor((maxx - gminx) / h).astype(np.int32)
    by0 = np.floor((miny - gminy) / h).astype(np.int32)
    by1 = np.floor((maxy - gminy) / h).astype(np.int32)
    ncols = int(bx1.max()) + 1

    # explode each segment to its covered buckets (AABB span); segment AABBs
    # are at most a few buckets wide because h tracks the median extent
    counts = (bx1 - bx0 + 1).astype(np.int64) * (by1 - by0 + 1)
    seg_ids = np.repeat(np.arange(n, dtype=np.int64), counts)
    # per-exploded-row local bucket offset
    total = int(counts.sum())
    local = np.arange(total) - np.repeat(np.cumsum(counts) - counts, counts)
    w = np.repeat((bx1 - bx0 + 1).astype(np.int64), counts)
    dxb = local % w
    dyb = local // w
    bucket = (np.repeat(by0.astype(np.int64), counts) + dyb) * ncols + (
        np.repeat(bx0.astype(np.int64), counts) + dxb
    )
    if total < (1 << 31) and (int(by1.max()) + 1) * ncols < (1 << 31):
        bucket = bucket.astype(np.int32)  # int32 quicksort is ~2x faster

    # single-key sort: ordering WITHIN a bucket is irrelevant (pairs are
    # deduped by integer key below), so the two-key lexsort is overkill
    order = np.argsort(bucket)
    bucket = bucket[order]
    seg_ids = seg_ids[order]

    # all i<j pairs within each bucket — fully vectorized triangular expansion
    starts = np.flatnonzero(np.concatenate([[True], bucket[1:] != bucket[:-1]]))
    ends = np.concatenate([starts[1:], [len(bucket)]])
    sizes = ends - starts
    pos = np.arange(len(bucket)) - np.repeat(starts, sizes)
    counts_after = np.repeat(sizes, sizes) - pos - 1
    total_pairs = int(counts_after.sum())
    if total_pairs == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    a_idx = np.repeat(np.arange(len(bucket)), counts_after)
    run_starts = np.concatenate([[0], np.cumsum(counts_after)[:-1]])
    b_off = np.arange(total_pairs) - np.repeat(run_starts, counts_after) + 1
    b_idx = a_idx + b_off
    i = seg_ids[a_idx]
    j = seg_ids[b_idx]
    # exact AABB filter BEFORE the dedup sort (closed intervals, like
    # rstar's envelope intersection) — shrinks the unique() input ~3x
    ok = (
        (minx[i] <= maxx[j])
        & (maxx[i] >= minx[j])
        & (miny[i] <= maxy[j])
        & (maxy[i] >= miny[j])
    )
    i = i[ok]
    j = j[ok]
    lo = np.minimum(i, j)
    hi = np.maximum(i, j)
    # dedup via a single int key (1-D unique on ints is ~10x faster than
    # the void-view sort of np.unique(..., axis=0))
    key = lo * np.int64(n) + hi
    uk = np.unique(key)
    return uk // n, uk % n


class SnapNoder:
    def __init__(self, grid_size: float = 1e-10, max_iter: int = 10,
                 force_generic: bool = False):
        self.grid_size = grid_size
        self.max_iter = max_iter
        self.force_generic = force_generic  # testing hook: disable the AA path

    def node(
        self, x0: np.ndarray, y0: np.ndarray, x1: np.ndarray, y1: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """Node the segment soup; returns fully-noded canonical segments."""
        x0 = snap_to_grid(np.asarray(x0, dtype=np.float64), self.grid_size)
        y0 = snap_to_grid(np.asarray(y0, dtype=np.float64), self.grid_size)
        x1 = snap_to_grid(np.asarray(x1, dtype=np.float64), self.grid_size)
        y1 = snap_to_grid(np.asarray(y1, dtype=np.float64), self.grid_size)
        keep = ~((x0 == x1) & (y0 == y1))  # exact, post-snap (snap.rs:42)
        x0, y0, x1, y1 = x0[keep], y0[keep], x1[keep], y1[keep]

        # Canonicalize + dedup identical segments up front.  DOCUMENTED
        # DIVERGENCE from the reference: snap.rs:88-101 only dedups inside a
        # split iteration, so exactly-duplicated segments with no proper
        # intersections survive (e.g. the shared edge of two touching squares)
        # and break ring tracing — the reference's own touching-squares test
        # expectation (tests/integration_tests.rs:67-70) requires the dedup.
        # GEOS's noder always dedups; we match GEOS (and the test).
        x0, y0, x1, y1 = _canonicalize_dedup(x0, y0, x1, y1)

        # Axis-aligned soups (grid benches, raster-derived linework) take a
        # fast path: intersections are exact coordinate COPIES (the crossing
        # of a vertical and a horizontal is (x_v, y_h); overlap endpoints
        # are endpoint copies), so after ONE full split round every further
        # intersection of sub-segments lies at existing endpoints — the
        # fixpoint is reached and the verification iteration is provably a
        # no-op.  The generic path keeps the reference's iterate-to-fixpoint
        # loop (float intersection coords need re-checking after snapping).
        aa = (
            bool(np.all((x0 == x1) | (y0 == y1))) if len(x0) else True
        ) and not self.force_generic

        # Incremental re-noding: a pair of segments BOTH unchanged since the
        # previous round was already checked there with the same coords and
        # produced no splits (the decision is a pure function of the two
        # segments + grid size), so rounds 2+ only need candidate pairs with
        # at least one NEW sub-segment.  Round-2 cost becomes proportional
        # to the split set, not the whole soup.
        newmask: np.ndarray | None = None  # None = all segments are new
        for _ in range(self.max_iter):
            splits = (
                self._find_splits_aa(x0, y0, x1, y1)
                if aa
                else self._find_splits(x0, y0, x1, y1, newmask)
            )
            if splits is None:
                break
            split_seg, split_x, split_y = splits
            x0, y0, x1, y1, newmask = self._apply_splits(
                x0, y0, x1, y1, split_seg, split_x, split_y
            )
            if aa:
                break
        return x0, y0, x1, y1

    # ------------------------------------------------------------------
    def _find_splits_aa(self, x0, y0, x1, y1):
        """Axis-aligned split finder: exact interval arithmetic, no robust
        predicates.  Same split set as the generic path (V x H crossings,
        collinear overlaps split at both overlap endpoints; points equal to
        a segment's endpoints are not splits)."""
        i, j = _candidate_pairs(x0, y0, x1, y1)
        if len(i) == 0:
            return None
        vert = x0 == x1

        seg_out: list[np.ndarray] = []
        px_out: list[np.ndarray] = []
        py_out: list[np.ndarray] = []

        def register(sides, px, py):
            sx = snap_to_grid(px, self.grid_size)
            sy = snap_to_grid(py, self.grid_size)
            for s in sides:
                need = ~(((sx == x0[s]) & (sy == y0[s])) | ((sx == x1[s]) & (sy == y1[s])))
                seg_out.append(s[need])
                px_out.append(sx[need])
                py_out.append(sy[need])

        vi, vj = vert[i], vert[j]

        # --- V x H crossings --------------------------------------------
        cross = vi != vj
        if cross.any():
            ci, cj = i[cross], j[cross]
            v = np.where(vert[ci], ci, cj)
            hs = np.where(vert[ci], cj, ci)
            xv = x0[v]
            yh = y0[hs]
            ok = (
                (xv >= np.minimum(x0[hs], x1[hs]))
                & (xv <= np.maximum(x0[hs], x1[hs]))
                & (yh >= np.minimum(y0[v], y1[v]))
                & (yh <= np.maximum(y0[v], y1[v]))
            )
            if ok.any():
                register((v[ok], hs[ok]), xv[ok], yh[ok])

        # --- collinear overlaps (V x V same column, H x H same row) ------
        par = vi == vj
        if par.any():
            pi, pj = i[par], j[par]
            isv = vert[pi]
            same = np.where(isv, x0[pi] == x0[pj], y0[pi] == y0[pj])
            pi, pj, isv = pi[same], pj[same], isv[same]
            if len(pi):
                fi0 = np.where(isv, np.minimum(y0[pi], y1[pi]), np.minimum(x0[pi], x1[pi]))
                fi1 = np.where(isv, np.maximum(y0[pi], y1[pi]), np.maximum(x0[pi], x1[pi]))
                fj0 = np.where(isv, np.minimum(y0[pj], y1[pj]), np.minimum(x0[pj], x1[pj]))
                fj1 = np.where(isv, np.maximum(y0[pj], y1[pj]), np.maximum(x0[pj], x1[pj]))
                lo = np.maximum(fi0, fj0)
                hi = np.minimum(fi1, fj1)
                ov = lo < hi  # positive-length overlap (endpoint touches split nothing)
                if ov.any():
                    pi, pj, isv = pi[ov], pj[ov], isv[ov]
                    lo, hi = lo[ov], hi[ov]
                    fixed = np.where(isv, x0[pi], y0[pi])  # shared column/row coord
                    for t in (lo, hi):
                        px = np.where(isv, fixed, t)
                        py = np.where(isv, t, fixed)
                        register((pi, pj), px, py)

        if not seg_out:
            return None
        seg = np.concatenate(seg_out)
        if len(seg) == 0:
            return None
        return seg, np.concatenate(px_out), np.concatenate(py_out)

    # ------------------------------------------------------------------
    def _find_splits(self, x0, y0, x1, y1, newmask=None):
        """Returns (segment_idx, x, y) arrays of split points, or None.

        A split is registered on a segment when the snapped intersection
        point differs from both of that segment's endpoints
        (snap.rs:146-151, 159-166).  ``newmask`` (rounds 2+) restricts the
        pair set to those touching a segment changed last round.
        """
        i, j = _candidate_pairs(x0, y0, x1, y1)
        if newmask is not None and len(i):
            fresh = newmask[i] | newmask[j]
            i, j = i[fresh], j[fresh]
        if len(i) == 0:
            return None
        # Cheap certainty filter: a pair sharing an exact endpoint whose
        # directions are CERTAINLY non-parallel (float cross product
        # exceeds its rounding-error bound) intersects exactly at that
        # shared endpoint — register() would reject it on both sides, so
        # classification is wasted work.  After a split round most
        # candidate pairs are pieces meeting at a split point (~85% on
        # the random-soup bench), making this the round-2 hot filter.
        # Pairs with an uncertain (possibly collinear) cross keep going:
        # collinear overlap past the shared endpoint must still split.
        share = (
            ((x0[i] == x0[j]) & (y0[i] == y0[j]))
            | ((x0[i] == x1[j]) & (y0[i] == y1[j]))
            | ((x1[i] == x0[j]) & (y1[i] == y0[j]))
            | ((x1[i] == x1[j]) & (y1[i] == y1[j]))
        )
        if share.any():
            dxi = x1[i] - x0[i]
            dyi = y1[i] - y0[i]
            dxj = x1[j] - x0[j]
            dyj = y1[j] - y0[j]
            l = dxi * dyj
            r = dyi * dxj
            cross = l - r
            # same error-bound constant as the robust orient2d tier A
            from geo_polygonize_ray.geom.robust import CCW_ERRBOUND_A

            certain = np.abs(cross) > CCW_ERRBOUND_A * (np.abs(l) + np.abs(r))
            drop = share & certain
            if drop.any():
                i, j = i[~drop], j[~drop]
                if len(i) == 0:
                    return None
        kind, axp, ayp, bxp, byp = segment_intersections(
            x0[i], y0[i], x1[i], y1[i], x0[j], y0[j], x1[j], y1[j]
        )

        seg_out: list[np.ndarray] = []
        px_out: list[np.ndarray] = []
        py_out: list[np.ndarray] = []

        def register(pairs_idx: np.ndarray, px: np.ndarray, py: np.ndarray) -> None:
            sx = snap_to_grid(px, self.grid_size)
            sy = snap_to_grid(py, self.grid_size)
            for side in (i, j):
                s = side[pairs_idx]
                need = ~(((sx == x0[s]) & (sy == y0[s])) | ((sx == x1[s]) & (sy == y1[s])))
                seg_out.append(s[need])
                px_out.append(sx[need])
                py_out.append(sy[need])

        single = np.flatnonzero(kind == SINGLE_POINT)
        if len(single):
            register(single, axp[single], ayp[single])
        coll = np.flatnonzero(kind == COLLINEAR_OVERLAP)
        if len(coll):
            register(coll, axp[coll], ayp[coll])
            register(coll, bxp[coll], byp[coll])

        if not seg_out:
            return None
        seg = np.concatenate(seg_out)
        if len(seg) == 0:
            return None
        return seg, np.concatenate(px_out), np.concatenate(py_out)

    # ------------------------------------------------------------------
    def _apply_splits(self, x0, y0, x1, y1, split_seg, split_x, split_y):
        """Split segments at their points (sorted by distance from start,
        consecutive-dup removed, snap.rs:55-79), then canonicalize + sort +
        dedup the whole segment set (snap.rs:88-101).  Fully vectorized:
        the points of ALL split segments are lexsorted by (segment, dist²)
        with a stable sort (splits before endpoints on ties, matching the
        scalar ordering) and sub-segments come from adjacent same-segment
        pairs — the final set is order-normalized by the dedup anyway."""
        n = len(x0)
        has_split = np.zeros(n, dtype=bool)
        has_split[split_seg] = True
        segs_with = np.flatnonzero(has_split)

        # all points: splits (original order) then both endpoints per segment
        ep_seg = np.repeat(segs_with, 2)
        ep_x = np.column_stack([x0[segs_with], x1[segs_with]]).ravel()
        ep_y = np.column_stack([y0[segs_with], y1[segs_with]]).ravel()
        allseg = np.concatenate([split_seg, ep_seg])
        allx = np.concatenate([split_x, ep_x])
        ally = np.concatenate([split_y, ep_y])
        d = (allx - x0[allseg]) ** 2 + (ally - y0[allseg]) ** 2
        order = np.lexsort((d, allseg))  # stable: ties keep splits-first order
        sseg = allseg[order]
        sx = allx[order]
        sy = ally[order]
        first = np.concatenate([[True], sseg[1:] != sseg[:-1]])
        keep = first | np.concatenate([[True], (sx[1:] != sx[:-1]) | (sy[1:] != sy[:-1])])
        sseg, sx, sy = sseg[keep], sx[keep], sy[keep]
        pair = sseg[1:] == sseg[:-1]  # adjacent points of the same segment

        n_old = int((~has_split).sum())
        nx0 = np.concatenate([x0[~has_split], sx[:-1][pair]])
        ny0 = np.concatenate([y0[~has_split], sy[:-1][pair]])
        nx1 = np.concatenate([x1[~has_split], sx[1:][pair]])
        ny1 = np.concatenate([y1[~has_split], sy[1:][pair]])
        new = np.zeros(len(nx0), dtype=bool)
        new[n_old:] = True  # the freshly created sub-segments

        return _canonicalize_dedup(nx0, ny0, nx1, ny1, new)


def _float_sort_key(x: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 view of float64 (-0.0 normalized to +0.0, no
    NaNs expected): negative floats get bit-complemented, positives get the
    sign bit set — total order identical to float comparison."""
    b = (x + 0.0).view(np.uint64)
    neg = (b >> np.uint64(63)).astype(bool)
    return np.where(neg, ~b, b | np.uint64(0x8000000000000000))


def _canonicalize_dedup(nx0, ny0, nx1, ny1, flag=None):
    """Canonical direction (start < end lexicographically with the
    reference's 1e-12 x-tolerance, snap.rs:88-95), then sort + dedup
    identical segments (snap.rs:96-101).  lexsort + adjacent-compare is
    ~10x faster than np.unique(axis=0)'s void-view sort.

    ``flag`` (optional per-segment bool) is carried through: a surviving
    segment's flag is the OR over its duplicate run (used by the
    incremental noder's new-segment tracking)."""
    swap = (nx0 > nx1) | ((np.abs(nx0 - nx1) < 1e-12) & (ny0 > ny1))
    tx0 = np.where(swap, nx1, nx0)
    ty0 = np.where(swap, ny1, ny0)
    tx1 = np.where(swap, nx0, nx1)
    ty1 = np.where(swap, ny0, ny1)
    n = len(tx0)
    if n == 0:
        return (tx0, ty0, tx1, ty1) if flag is None else (tx0, ty0, tx1, ty1, flag)
    # two-phase sort: QUICKSORT on the order-preserving uint64 bit view of
    # tx0 (this numpy's stable sort is ~6x quicksort), then an exact
    # lexsort refinement of equal-tx0 runs on the remaining keys.  Ties
    # across all four keys are identical segments (they dedup below), so
    # no stability is needed; the final order equals the old 4-key lexsort.
    order = np.argsort(_float_sort_key(tx0))
    k = tx0[order]
    same = k[1:] == k[:-1]
    if same.any():
        in_run = np.concatenate([[False], same]) | np.concatenate([same, [False]])
        pos = np.flatnonzero(in_run)
        sub = order[pos]
        run_id = np.cumsum(np.concatenate([[True], ~same]))[pos]
        ro = np.lexsort((ty1[sub], tx1[sub], ty0[sub], run_id))
        order[pos] = sub[ro]
    tx0, ty0, tx1, ty1 = tx0[order], ty0[order], tx1[order], ty1[order]
    keep = np.empty(n, dtype=bool)
    keep[0] = True
    keep[1:] = (
        (tx0[1:] != tx0[:-1])
        | (ty0[1:] != ty0[:-1])
        | (tx1[1:] != tx1[:-1])
        | (ty1[1:] != ty1[:-1])
    )
    if flag is None:
        return tx0[keep], ty0[keep], tx1[keep], ty1[keep]
    f = flag[order]
    run_id = np.cumsum(keep) - 1
    out_flag = np.zeros(int(run_id[-1]) + 1, dtype=bool)
    np.logical_or.at(out_flag, run_id, f)
    return tx0[keep], ty0[keep], tx1[keep], ty1[keep], out_flag

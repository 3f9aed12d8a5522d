"""Robust orientation predicate (Shewchuk-filtered, exact fallback).

The reference uses the ``robust`` crate's adaptive ``orient2d``
(reference src/utils/mod.rs:2,66-70) for angular sorting and (via
``geo::line_intersection``) segment-intersection classification.  We need the
same *sign* guarantees: a naive float determinant mis-orders near-collinear
edges and changes ring traces.

Strategy (public knowledge — Shewchuk, "Adaptive Precision Floating-Point
Arithmetic and Fast Robust Geometric Predicates", 1997):

* vectorized float determinant + error-bound filter over whole numpy arrays;
* the (rare) entries inside the uncertainty band fall back to *exact*
  arithmetic via Python ``fractions.Fraction`` (binary floats are exact
  rationals, so this is a true exact evaluation, just slow).
"""

from __future__ import annotations

from fractions import Fraction

import numpy as np

# Shewchuk's ccwerrboundA = (3 + 16*eps)*eps with eps = 2^-53 (half machine eps)
_EPS = np.finfo(np.float64).eps / 2.0  # 2^-53
CCW_ERRBOUND_A = (3.0 + 16.0 * _EPS) * _EPS


def orient2d_exact(ax: float, ay: float, bx: float, by: float, cx: float, cy: float) -> int:
    """Exact sign of the orientation determinant (a,b,c CCW -> +1).

    det = (ax-cx)*(by-cy) - (ay-cy)*(bx-cx), evaluated in exact rational
    arithmetic.  Returns -1, 0 or +1.
    """
    det = (Fraction(ax) - Fraction(cx)) * (Fraction(by) - Fraction(cy)) - (
        Fraction(ay) - Fraction(cy)
    ) * (Fraction(bx) - Fraction(cx))
    if det > 0:
        return 1
    if det < 0:
        return -1
    return 0


def orient2d_sign_arrays(
    ax: np.ndarray,
    ay: np.ndarray,
    bx: np.ndarray,
    by: np.ndarray,
    cx: np.ndarray,
    cy: np.ndarray,
) -> np.ndarray:
    """Vectorized certain sign of orient2d(a, b, c): +1 CCW, -1 CW, 0 collinear.

    Filtered float path for the bulk; exact Fraction fallback only where the
    error bound cannot certify the sign (mirrors the adaptivity of the
    reference's ``robust`` crate, reference src/utils/mod.rs:70).
    """
    ax = np.asarray(ax, dtype=np.float64)
    detleft = (ax - cx) * (by - cy)
    detright = (ay - cy) * (bx - cx)
    det = detleft - detright
    detsum = np.abs(detleft) + np.abs(detright)
    errbound = CCW_ERRBOUND_A * detsum

    sign = np.sign(det).astype(np.int8)
    uncertain = np.abs(det) <= errbound
    # det == 0 with detsum == 0 means all terms zero -> exactly collinear;
    # the exact fallback handles it identically, so just route every
    # uncertain entry through the exact path.
    if uncertain.any():
        idx = np.flatnonzero(uncertain)
        AX, AY = np.ravel(np.broadcast_to(ax, det.shape)), np.ravel(np.broadcast_to(ay, det.shape))
        BX, BY = np.ravel(np.broadcast_to(bx, det.shape)), np.ravel(np.broadcast_to(by, det.shape))
        CX, CY = np.ravel(np.broadcast_to(cx, det.shape)), np.ravel(np.broadcast_to(cy, det.shape))
        flat_sign = sign.ravel()
        for i in idx:
            flat_sign[i] = orient2d_exact(
                float(AX[i]), float(AY[i]), float(BX[i]), float(BY[i]), float(CX[i]), float(CY[i])
            )
        sign = flat_sign.reshape(det.shape)
    return sign


def cross_sign_arrays(ux: np.ndarray, uy: np.ndarray, vx: np.ndarray, vy: np.ndarray) -> np.ndarray:
    """Certain sign of the 2D cross product u x v (vectors already differenced).

    Used for angular comparison around a shared center c:
    sign(orient2d(c, a, b)) == cross_sign(a - c, b - c)
    (reference src/utils/mod.rs:66-75).

    NOTE: when u and v were computed as float differences of original
    coordinates the subtraction itself may have rounded, so prefer
    :func:`orient2d_sign_arrays` on the raw coordinates when exactness
    matters end-to-end.  This variant is exact *given* u and v.
    """
    z = np.zeros_like(np.asarray(ux, dtype=np.float64))
    return orient2d_sign_arrays(ux, uy, vx, vy, z, z)

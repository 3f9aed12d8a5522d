"""Axis-aligned noder fast path == generic iterate-to-fixpoint noder,
segment-set identical (the AA path skips the verification iteration on a
proof; this pins the proof empirically on representative inputs)."""

import numpy as np
import pytest

from geo_polygonize_ray.local.noding import SnapNoder


def segs_of(lines):
    x0 = np.array([a for a, b, c, d in lines], dtype=float)
    y0 = np.array([b for a, b, c, d in lines], dtype=float)
    x1 = np.array([c for a, b, c, d in lines], dtype=float)
    y1 = np.array([d for a, b, c, d in lines], dtype=float)
    return x0, y0, x1, y1


def as_set(res):
    return sorted(zip(*(r.tolist() for r in res)))


CASES = {
    "grid": [(0.0, float(i), 8.0, float(i)) for i in range(9)]
    + [(float(i), 0.0, float(i), 8.0) for i in range(9)],
    "overlapping_collinear_v": [(2.0, 0.0, 2.0, 5.0), (2.0, 3.0, 2.0, 9.0), (2.0, 4.0, 2.0, 4.5)],
    "overlapping_collinear_h": [(0.0, 1.0, 6.0, 1.0), (4.0, 1.0, 10.0, 1.0)],
    "t_junctions": [(0.0, 0.0, 10.0, 0.0), (3.0, 0.0, 3.0, 5.0), (7.0, -2.0, 7.0, 2.0)],
    "endpoint_touch": [(0.0, 0.0, 4.0, 0.0), (4.0, 0.0, 4.0, 4.0), (0.0, 0.0, 0.0, 4.0)],
    "duplicates": [(1.0, 1.0, 1.0, 6.0), (1.0, 6.0, 1.0, 1.0), (0.0, 3.0, 3.0, 3.0)],
    "dense_cross": [(float(i), -1.0, float(i), 11.0) for i in range(11)]
    + [(-1.0, float(j), 11.0, float(j)) for j in range(11)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_aa_equals_generic(name):
    segs = segs_of(CASES[name])
    fast = SnapNoder(1e-10, 10).node(*segs)
    slow = SnapNoder(1e-10, 10, force_generic=True).node(*segs)
    assert as_set(fast) == as_set(slow), name


def test_aa_random_rectilinear_fuzz():
    rng = np.random.default_rng(123)
    for trial in range(20):
        n = int(rng.integers(5, 40))
        lines = []
        for _ in range(n):
            if rng.random() < 0.5:
                y = float(rng.integers(0, 20))
                a, b = sorted(rng.integers(0, 20, 2).tolist())
                if a == b:
                    b += 1
                lines.append((float(a), y, float(b), y))
            else:
                x = float(rng.integers(0, 20))
                a, b = sorted(rng.integers(0, 20, 2).tolist())
                if a == b:
                    b += 1
                lines.append((x, float(a), x, float(b)))
        segs = segs_of(lines)
        fast = SnapNoder(1e-10, 10).node(*segs)
        slow = SnapNoder(1e-10, 10, force_generic=True).node(*segs)
        assert as_set(fast) == as_set(slow), f"trial {trial}"

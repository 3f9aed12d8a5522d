"""Property-based fuzzing with hypothesis: the engine's core invariants hold
for arbitrary segment soups (FIXTURES.md §6)."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from geo_polygonize_ray.geom.kernels import signed_area
from geo_polygonize_ray.local import polygonize_lines

coord = st.floats(min_value=0.0, max_value=100.0, allow_nan=False, allow_infinity=False)


def segs_to_lines(segs):
    return [np.array([[a, b], [c, d]]) for a, b, c, d in segs]


@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(st.tuples(coord, coord, coord, coord), min_size=1, max_size=25))
def test_polygonize_never_crashes_and_invariants(segs):
    """Any segment soup: no crash; every output polygon has positive area,
    a closed CCW shell, and holes with smaller total area."""
    polys = polygonize_lines(segs_to_lines(segs), node_input=True)
    for p in polys:
        assert p.area > 1e-6
        assert p.shell_x[0] == p.shell_x[-1] and p.shell_y[0] == p.shell_y[-1]
        assert signed_area(p.shell_x[:-1], p.shell_y[:-1]) != 0.0
        hole_area = sum(
            abs(signed_area(hx[:-1], hy[:-1])) for hx, hy in zip(p.holes_x, p.holes_y)
        )
        shell_area = abs(signed_area(p.shell_x[:-1], p.shell_y[:-1]))
        assert hole_area < shell_area + 1e-6


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    st.lists(st.tuples(coord, coord, coord, coord), min_size=2, max_size=16),
    st.floats(min_value=20.0, max_value=60.0),
)
def test_total_area_bounded_by_hull(segs, _tile):
    """Total polygon area can never exceed the bbox of the input."""
    lines = segs_to_lines(segs)
    polys = polygonize_lines(lines, node_input=True)
    if not polys:
        return
    allx = np.concatenate([ls[:, 0] for ls in lines])
    ally = np.concatenate([ls[:, 1] for ls in lines])
    bbox_area = (allx.max() - allx.min()) * (ally.max() - ally.min())
    total = sum(p.area for p in polys)
    assert total <= bbox_area + 1e-6


@settings(max_examples=10, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.integers(min_value=2, max_value=7), st.integers(min_value=0, max_value=2**31 - 1))
def test_closed_grid_of_random_offsets(n, seed):
    """Translated/scaled grids always yield exactly n^2 unit-ish faces."""
    rng = np.random.default_rng(seed)
    ox, oy = rng.uniform(-50, 50, 2)
    s = rng.uniform(0.5, 3.0)
    lines = []
    for i in range(n + 1):
        lines.append(np.array([[ox, oy + i * s], [ox + n * s, oy + i * s]]))
        lines.append(np.array([[ox + i * s, oy], [ox + i * s, oy + n * s]]))
    polys = polygonize_lines(lines, node_input=True)
    assert len(polys) == n * n
    assert np.allclose(sorted(p.area for p in polys), s * s, rtol=1e-9)


class TestDistributedEquivalenceFuzz:
    """Random soups + random tile configs: distributed == local, always.
    (Plain parametrized randomness rather than hypothesis: each example runs
    a Ray pipeline, so we keep the count small and the seeds fixed.)"""

    import pytest as _pytest

    @_pytest.mark.usefixtures("ray_session")
    @_pytest.mark.parametrize("seed", [3, 11, 29, 47])
    def test_random_soup_any_tiling(self, seed):
        from geo_polygonize_ray.config import PipelineConfig
        from geo_polygonize_ray.pipelines.polygonize import polygonize_lines_distributed

        rng = np.random.default_rng(seed)
        k = int(rng.integers(20, 60))
        pts = rng.uniform(0, 100, (k, 2, 2))
        lines = [pts[i] for i in range(k)]
        local = polygonize_lines(lines, node_input=True)
        tile = float(rng.uniform(15, 40))
        cfg = PipelineConfig(tile_size=tile, tile_buffer=120.0)  # buffer > domain
        dist = polygonize_lines_distributed(lines, cfg, bbox=(0, 0, 100, 100))

        def key(p):
            return (
                round(p.area, 9),
                round(float(p.shell_x.min()), 9),
                round(float(p.shell_y.max()), 9),
                len(p.holes_x),
            )

        assert sorted(map(key, dist)) == sorted(map(key, local))

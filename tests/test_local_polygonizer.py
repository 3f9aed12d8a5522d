"""Conformance corpus (FIXTURES.md §3): the reference's polygonizer unit
tests, integration tests and robustness tests against the local
(single-partition) polygonizer.

IMPORTANT semantics note (documented also in FIXTURES.md): the reference's
committed test suite is internally inconsistent and is never run by its CI
(maintenance.yml only runs benchmarks).  Careful simulation of the committed
code (src/graph/planar_graph.rs:475-561 next-CCW-successor traversal +
src/polygonizer.rs:255-257 residual-area filter) shows interior faces are
traced CW and zero-residual outer outlines are dropped — which matches the
GEOS/shapely oracle counts recorded in the repo (grid N -> N^2 polygons,
python_bench_output.txt), the tiling tests, and the robustness tests, but
CONTRADICTS two stale unit tests (crossed_square expects 5, committed code
yields 4 = exactly shapely's answer; overlapping_circles expects 8, code
yields 7) and the pre-filter golden GeoJSON files (which still contain the
zero-residual outlines).  We implement the committed-code / GEOS-oracle
semantics; the two stale expectations are corrected here to the values the
committed reference code (and shapely.ops.polygonize) actually produce."""

import numpy as np
import pytest

from geo_polygonize_ray.local import polygonize_lines


def ls(*pts):
    return np.array(pts, dtype=np.float64)


def circle(cx, cy, r, n):
    # reference tests/integration_tests.rs:115-126: coords[i] = center + r*(cos,sin)(i*2pi/(n-1))
    i = np.arange(n)
    ang = i * 2 * np.pi / (n - 1)
    return np.stack([cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1)


def areas(polys):
    return sorted(p.area for p in polys)


class TestPolygonizerUnit:
    def test_triangle_open(self):
        # src/polygonizer_tests.rs:8-18
        polys = polygonize_lines([ls((0, 0), (10, 0)), ls((10, 0), (0, 10)), ls((0, 10), (0, 0))])
        assert len(polys) >= 1
        assert any(49 < p.area < 51 for p in polys)

    def test_square_hole(self):
        # src/polygonizer_tests.rs:21-42
        polys = polygonize_lines(
            [
                ls((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
                ls((2, 2), (2, 8), (8, 8), (8, 2), (2, 2)),
            ]
        )
        assert len(polys) == 2
        donut = [p for p in polys if abs(p.area - 64) < 1.0]
        assert len(donut) == 1
        assert len(donut[0].holes_x) == 1
        island = [p for p in polys if abs(p.area - 36) < 1.0]
        assert len(island) == 1

    def test_crossed_square(self):
        # src/polygonizer_tests.rs:45-80 (node_input).  The committed test
        # expects 5 (incl. a zero-residual frame) but the committed code's
        # final filter (src/polygonizer.rs:255-257) drops the frame; shapely
        # polygonize agrees: 4 triangles.  See module docstring.
        polys = polygonize_lines(
            [
                ls((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)),
                ls((0, 0), (10, 10)),
                ls((0, 10), (10, 0)),
            ],
            node_input=True,
        )
        assert len(polys) == 4
        triangles = [p for p in polys if abs(p.area - 25) < 1e-6]
        assert len(triangles) == 4

    def test_collinear_overlap(self):
        # src/polygonizer_tests.rs:83-115 (node_input)
        polys = polygonize_lines(
            [
                ls((0, 0), (10, 0)),
                ls((5, 0), (15, 0)),
                ls((10, 0), (10, 10), (5, 10), (5, 0)),
            ],
            node_input=True,
        )
        assert any(abs(p.area - 50) < 1e-6 for p in polys)


class TestIntegration:
    def test_nested_holes(self):
        # tests/integration_tests.rs:7-42: squares 0..100, 20..80, 40..60
        def square(a, b):
            return ls((a, a), (b, a), (b, b), (a, b), (a, a))

        polys = polygonize_lines([square(0, 100), square(20, 80), square(40, 60)])
        assert len(polys) == 3
        assert areas(polys) == pytest.approx([400.0, 3200.0, 6400.0])

    def test_touching_squares(self):
        # tests/integration_tests.rs:45-71 (node_input)
        polys = polygonize_lines(
            [
                ls((0, 0), (50, 0), (50, 50), (0, 50), (0, 0)),
                ls((50, 0), (100, 0), (100, 50), (50, 50), (50, 0)),
            ],
            node_input=True,
        )
        assert len(polys) == 2  # union outline has residual 0 -> dropped
        squares = [p for p in polys if abs(p.area - 2500) < 1e-6]
        assert len(squares) == 2

    def test_dangle_tail(self):
        # tests/integration_tests.rs:74-89
        polys = polygonize_lines(
            [ls((0, 0), (10, 0), (10, 10), (0, 10), (0, 0)), ls((10, 10), (20, 20))]
        )
        assert len(polys) == 1
        assert polys[0].area == pytest.approx(100.0)

    def test_bowtie(self):
        # tests/integration_tests.rs:92-113 (node_input)
        polys = polygonize_lines(
            [ls((0, 0), (10, 10), (0, 10), (10, 0), (0, 0))], node_input=True
        )
        assert len(polys) >= 2
        triangles = [p for p in polys if abs(p.area - 25) < 1e-6]
        assert len(triangles) == 2

    def test_overlapping_circles(self):
        # tests/integration_tests.rs:129-145.  The committed (stale) test
        # expects 8 incl. the zero-residual union outline; the committed
        # code's final filter drops it -> 7 faces (= shapely's answer).
        polys = polygonize_lines(
            [
                circle(30, 30, 30, 100),
                circle(60, 30, 30, 100),
                circle(45, 55, 30, 100),
            ],
            node_input=True,
        )
        assert len(polys) == 7

    def test_curved_holes(self):
        # tests/integration_tests.rs:148-169: circle + 4 circular holes -> >=5
        polys = polygonize_lines(
            [
                circle(50, 50, 50, 200),
                circle(30, 30, 10, 100),
                circle(70, 30, 10, 100),
                circle(50, 70, 15, 100),
                circle(50, 40, 5, 100),
            ],
            node_input=True,
        )
        assert len(polys) >= 5


class TestRobustness:
    def test_bowtie_snap(self):
        # tests/robustness.rs:6-30: bowtie single LS, snap 1e-6 -> exactly 2
        polys = polygonize_lines(
            [ls((0, 0), (10, 10), (10, 0), (0, 10), (0, 0))],
            node_input=True,
            snap_grid_size=1e-6,
        )
        assert len(polys) == 2

    def test_duplicate_edges(self):
        # tests/robustness.rs:33-62: duplicated edge input -> exactly 1 triangle
        polys = polygonize_lines(
            [
                ls((0, 0), (10, 0)),
                ls((0, 0), (10, 0)),
                ls((10, 0), (5, 5)),
                ls((5, 5), (0, 0)),
            ],
            node_input=True,
            snap_grid_size=1e-6,
        )
        assert len(polys) == 1

"""Distributed pipeline tests: the reference tiling tests (FIXTURES.md §3)
plus the distributed == local equivalence invariant (FIXTURES.md §6.2)."""

import numpy as np
import pytest

from geo_polygonize_ray.config import PipelineConfig
from geo_polygonize_ray.local import polygonize_lines
from geo_polygonize_ray.pipelines.polygonize import polygonize_lines_distributed
from geo_polygonize_ray.sources.fixtures import grid_lines, random_lines


def ls(*pts):
    return np.array(pts, dtype=np.float64)


def grid_2x2_lines():
    # reference src/tiling_tests.rs:15-25: 3 horizontals + 3 verticals over 0..20
    return [
        ls((0, 0), (20, 0)),
        ls((0, 10), (20, 10)),
        ls((0, 20), (20, 20)),
        ls((0, 0), (0, 20)),
        ls((10, 0), (10, 20)),
        ls((20, 0), (20, 20)),
    ]


def poly_key(p):
    """order-insensitive identity of a polygon: area + bbox + hole count"""
    return (
        round(p.area, 9),
        round(float(p.shell_x.min()), 9),
        round(float(p.shell_y.min()), 9),
        round(float(p.shell_x.max()), 9),
        round(float(p.shell_y.max()), 9),
        len(p.holes_x),
    )


@pytest.mark.usefixtures("ray_session")
class TestTiling:
    def test_tiled_grid_buffered(self):
        # src/tiling_tests.rs:7-49: tile 15, buffer 5 -> exactly 4, area 100
        cfg = PipelineConfig(tile_size=15.0, tile_buffer=5.0)
        polys = polygonize_lines_distributed(grid_2x2_lines(), cfg, bbox=(0, 0, 20, 20))
        assert len(polys) == 4
        for p in polys:
            assert p.area == pytest.approx(100.0, abs=1e-6)

    def test_tiled_grid_exact_boundary(self):
        # src/tiling_tests.rs:52-80: tile 10, buffer 0, lines ON boundaries -> 4
        cfg = PipelineConfig(tile_size=10.0, tile_buffer=0.0)
        polys = polygonize_lines_distributed(grid_2x2_lines(), cfg, bbox=(0, 0, 20, 20))
        assert len(polys) == 4
        for p in polys:
            assert p.area == pytest.approx(100.0, abs=1e-6)

    def test_untiled_matches_local(self):
        lines = grid_lines(6)
        local = polygonize_lines(lines, node_input=True)
        dist = polygonize_lines_distributed(lines, PipelineConfig(node_input=True))
        assert sorted(map(poly_key, dist)) == sorted(map(poly_key, local))

    @pytest.mark.parametrize("tile_size,buffer", [(3.0, 2.0), (5.0, 3.0), (8.0, 8.0)])
    def test_distributed_equals_local_grid(self, tile_size, buffer):
        # FIXTURES.md §6.2: identical rows for any tile/buffer config with
        # buffer >= max polygon radius (unit cells -> any buffer >= ~1.5 works)
        lines = grid_lines(8)
        local = polygonize_lines(lines, node_input=True)
        cfg = PipelineConfig(tile_size=tile_size, tile_buffer=buffer)
        dist = polygonize_lines_distributed(lines, cfg, bbox=(0, 0, 8, 8))
        assert sorted(map(poly_key, dist)) == sorted(map(poly_key, local))

    def test_distributed_equals_local_random(self):
        # random segment soup: polygons are small relative to a generous buffer
        lines = random_lines(60, seed=42)
        local = polygonize_lines(lines, node_input=True)
        cfg = PipelineConfig(tile_size=25.0, tile_buffer=100.0)
        dist = polygonize_lines_distributed(lines, cfg, bbox=(0, 0, 100, 100))
        assert len(dist) == len(local)
        assert sorted(map(poly_key, dist)) == sorted(map(poly_key, local))

    def test_nested_holes_distributed(self):
        sq = lambda a, b: ls((a, a), (b, a), (b, b), (a, b), (a, a))
        lines = [sq(0, 100), sq(20, 80), sq(40, 60)]
        cfg = PipelineConfig(tile_size=60.0, tile_buffer=120.0)
        polys = polygonize_lines_distributed(lines, cfg, bbox=(0, 0, 100, 100))
        assert sorted(round(p.area, 6) for p in polys) == [400.0, 3200.0, 6400.0]
        assert sorted(p.n_holes if hasattr(p, "n_holes") else len(p.holes_x) for p in polys) == [0, 1, 1]

"""Graph-level micro-fixtures (FIXTURES.md §3, reference src/graph/tests.rs)."""

import numpy as np

from geo_polygonize_ray.local.graph import PlanarGraph


def seg_arrays(segs):
    a = np.array(segs, dtype=np.float64)
    return a[:, 0], a[:, 1], a[:, 2], a[:, 3]


def find_node(g: PlanarGraph, x: float, y: float) -> int:
    idx = np.flatnonzero((g.nodes_x == x) & (g.nodes_y == y))
    assert len(idx) == 1
    return int(idx[0])


class TestGraphConstruction:
    def test_counts(self):
        # reference src/graph/tests.rs:7-22
        g = PlanarGraph(*seg_arrays([(0, 0, 10, 0), (0, 0, 0, 10)]))
        assert g.n_nodes == 3
        assert g.n_edges == 2
        assert len(g.de_src) == 4
        origin = find_node(g, 0.0, 0.0)
        assert g.adj_offsets[origin + 1] - g.adj_offsets[origin] == 2
        assert g.nodes_degree[origin] == 2

    def test_edge_sorting_ccw(self):
        # reference src/graph/tests.rs:25-65: Right, Up, Left, Down
        g = PlanarGraph(
            *seg_arrays([(0, 0, 10, 0), (0, 0, 0, 10), (0, 0, -10, 0), (0, 0, 0, -10)])
        )
        g.sort_edges()
        origin = find_node(g, 0.0, 0.0)
        adj = g.adj[g.adj_offsets[origin] : g.adj_offsets[origin + 1]]
        dsts = [(g.nodes_x[g.de_dst[e]], g.nodes_y[g.de_dst[e]]) for e in adj]
        assert dsts == [(10.0, 0.0), (0.0, 10.0), (-10.0, 0.0), (0.0, -10.0)]

    def test_dangle_pruning(self):
        # reference src/graph/tests.rs:68-85
        g = PlanarGraph(
            *seg_arrays([(0, 0, 10, 0), (10, 0, 0, 10), (0, 10, 0, 0), (10, 0, 20, 0)])
        )
        g.sort_edges()
        assert g.prune_dangles() == 1
        b = find_node(g, 10.0, 0.0)
        assert g.nodes_degree[b] == 2

    def test_simple_cycle_two_rings(self):
        # reference src/graph/tests.rs:88-99
        g = PlanarGraph(*seg_arrays([(0, 0, 10, 0), (10, 0, 0, 10), (0, 10, 0, 0)]))
        g.sort_edges()
        fx, fy, offs = g.get_edge_rings()
        assert len(offs) - 1 == 2

    def test_iterative_dangle_chain(self):
        # chain of dangles peels completely into the triangle
        g = PlanarGraph(
            *seg_arrays(
                [(0, 0, 10, 0), (10, 0, 0, 10), (0, 10, 0, 0), (10, 0, 20, 0), (20, 0, 30, 0)]
            )
        )
        g.sort_edges()
        assert g.prune_dangles() == 2
        fx, fy, offs = g.get_edge_rings()
        assert len(offs) - 1 == 2

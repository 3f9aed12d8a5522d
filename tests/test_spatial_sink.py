"""Spatially-partitioned polygon sink + bbox-pruned reads (state/spatial.py)."""

import glob
import os

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from geo_polygonize_ray.state.spatial import (
    pruned_fraction,
    read_polygons_bbox,
    write_polygons_spatial,
)


def _poly_frame(n=20):
    """Synthetic polygon summary rows on a [0, n) x [0, n) plane: one
    polygon centred in each unit cell (the grid-polygonize output shape)."""
    ix, iy = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    return pd.DataFrame(
        {
            "poly_id": np.arange(n * n, dtype=np.int64),
            "cx": ix.ravel() + 0.5,
            "cy": iy.ravel() + 0.5,
            "area": np.ones(n * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
class TestSpatialSink:
    def test_bbox_read_equals_full_scan_filter(self, tmp_path):
        out = str(tmp_path / "sp")
        df = _poly_frame(20)
        write_polygons_spatial(rd.from_pandas(df), out, cell_size=5.0)

        bbox = (2.0, 3.0, 11.0, 9.0)
        got = (
            read_polygons_bbox(out, bbox)
            .to_pandas()
            .sort_values("poly_id")
            .reset_index(drop=True)
        )
        m = (
            (df["cx"] >= bbox[0])
            & (df["cx"] < bbox[2])
            & (df["cy"] >= bbox[1])
            & (df["cy"] < bbox[3])
        )
        want = df[m].sort_values("poly_id").reset_index(drop=True)
        assert list(got["poly_id"]) == list(want["poly_id"])
        assert np.allclose(got["cx"], want["cx"]) and np.allclose(got["cy"], want["cy"])

    def test_pruning_is_proportional_to_query_area(self, tmp_path):
        out = str(tmp_path / "sp")
        write_polygons_spatial(rd.from_pandas(_poly_frame(20)), out, cell_size=5.0)
        # 20x20 plane at cell 5 -> 16 cells; a 1-cell query opens 1/16
        frac_small = pruned_fraction(out, (0.0, 0.0, 4.9, 4.9))
        frac_all = pruned_fraction(out, (0.0, 0.0, 20.0, 20.0))
        assert frac_small == pytest.approx(1 / 16)
        assert frac_all == 1.0

    def test_column_projection_keeps_filter_exact(self, tmp_path):
        out = str(tmp_path / "sp")
        write_polygons_spatial(rd.from_pandas(_poly_frame(10)), out, cell_size=5.0)
        got = read_polygons_bbox(out, (0, 0, 5, 5), columns=["poly_id", "area"]).to_pandas()
        assert list(got.columns) == ["poly_id", "area"]
        assert len(got) == 25  # 5x5 centroids

    def test_resume_skips_finished_cells(self, tmp_path):
        out = str(tmp_path / "sp")
        df = _poly_frame(10)
        r1 = write_polygons_spatial(rd.from_pandas(df), out, cell_size=5.0)
        assert r1["rows"] == 100 and r1["written"] and not r1["skipped"]
        r2 = write_polygons_spatial(rd.from_pandas(df), out, cell_size=5.0)
        assert not r2["written"] and set(r2["skipped"]) == set(r1["written"])

    def test_cell_size_mismatch_rejected(self, tmp_path):
        out = str(tmp_path / "sp")
        write_polygons_spatial(rd.from_pandas(_poly_frame(10)), out, cell_size=5.0)
        with pytest.raises(ValueError, match="cell_size"):
            write_polygons_spatial(rd.from_pandas(_poly_frame(10)), out, cell_size=2.0)

    def test_negative_coordinates(self, tmp_path):
        out = str(tmp_path / "sp")
        df = _poly_frame(10)
        df["cx"] -= 5.0
        df["cy"] -= 5.0
        write_polygons_spatial(rd.from_pandas(df), out, cell_size=5.0)
        got = read_polygons_bbox(out, (-5.0, -5.0, 0.0, 0.0)).to_pandas()
        assert len(got) == 25
        assert (got["cx"] < 0).all() and (got["cy"] < 0).all()

    def test_no_intersecting_partition_raises(self, tmp_path):
        out = str(tmp_path / "sp")
        write_polygons_spatial(rd.from_pandas(_poly_frame(10)), out, cell_size=5.0)
        with pytest.raises(FileNotFoundError, match="intersect"):
            read_polygons_bbox(out, (100.0, 100.0, 110.0, 110.0))

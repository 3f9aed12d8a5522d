"""Flagship image pipeline tests (FIXTURES.md §6.3: per-row invariants)."""

import numpy as np
import pytest

from geo_polygonize_ray.pipelines.images import image_roundtrip_pipeline
from geo_polygonize_ray.sources.fixtures import cached_image_table


@pytest.mark.usefixtures("ray_session")
class TestImagePipeline:
    def test_roundtrip_invariants(self):
        path = cached_image_table(48)
        df = image_roundtrip_pipeline(path, concurrency=2, batch_size=16).to_pandas()
        assert len(df) == 48
        # per-row invariants (BASELINE.json input_hint)
        assert df["phash_ok"].all(), "recomputed phash must match stored"
        assert df["roundtrip_ok"].all(), "PSNR >= 40 dB for every row"
        assert (df["n_polys"] >= 1).all()
        # lossless formats round-trip exactly (psnr capped at 999)
        assert (df["psnr_db"] == 999.0).all()
        # captions pass through byte-identical
        assert df["caption"].str.startswith("tile ").all()
        # total polygon area covers the full 64x64 tile for grid/nested scenes
        grid_rows = df[df["caption"].str.contains("grid")]
        assert np.allclose(grid_rows["total_area"], 64 * 64)

    def test_emit_polygons(self):
        path = cached_image_table(6)
        ds = image_roundtrip_pipeline(path, concurrency=2, batch_size=4, emit_polygons=True)
        t = ds.to_pandas()
        assert {"image_id", "shell_xs", "area"} <= set(t.columns)
        assert t.groupby("image_id").size().min() >= 1

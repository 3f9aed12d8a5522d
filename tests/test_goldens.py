"""Locked goldens for the numpy-seeded random workloads (FIXTURES.md §4).

The reference seeds Rust StdRng(42), whose stream is not reproducible in
numpy; these counts/areas were derived once from numpy default_rng(42) and
are now locked — any change in noding/tracing/assembly semantics shows up
here.  (Reference scale anchors for the same K: 281 / 1066 / 4266 polygons
with Rust's stream, python_bench_output.txt:13-15.)"""

import pytest

from geo_polygonize_ray.local import polygonize_lines
from geo_polygonize_ray.sources.fixtures import grid_lines, random_lines

RANDOM_GOLDENS = {
    # k: (n_polys, total_area rounded 4dp)
    50: (153, 4263.3898),
    100: (863, 6057.7554),
    200: (3633, 7440.61),
}


@pytest.mark.parametrize("k", sorted(RANDOM_GOLDENS))
def test_random_golden(k):
    polys = polygonize_lines(random_lines(k, seed=42), node_input=True)
    n, area = RANDOM_GOLDENS[k]
    assert len(polys) == n
    assert round(sum(p.area for p in polys), 4) == pytest.approx(area, abs=1e-3)


@pytest.mark.parametrize("n", [5, 10, 20, 50])
def test_grid_golden(n):
    # RNG-free golden reused verbatim from the reference/GEOS oracle: N^2
    polys = polygonize_lines(grid_lines(n), node_input=True)
    assert len(polys) == n * n
    assert all(abs(p.area - 1.0) < 1e-9 for p in polys)


def test_random_canonical_golden_fresh():
    """The committed parquet golden that build_random_golden_sql() serves
    as the driver oracle must equal the LIVE query output — a stale pin
    would turn the oracle into a false regression alarm (or worse, a
    silently-circular pass after a semantics change)."""
    import os

    import numpy as np
    import pandas as pd

    from geo_polygonize_ray.pipelines.geometry import q_polygonize_random

    live = q_polygonize_random("unused").reset_index(drop=True)
    gold = pd.read_parquet(
        os.path.join(os.path.dirname(__file__), "goldens", "polygonize_random_canonical.parquet")
    )
    assert list(live.columns) == list(gold.columns)
    assert len(live) == len(gold)
    for c in live.columns:
        a, b = live[c].to_numpy(), gold[c].to_numpy()
        assert np.array_equal(a, b), c


import pytest as _pytest


@_pytest.mark.usefixtures("ray_session")
@_pytest.mark.parametrize(
    "name",
    [
        "mosaic_polygonize",
        "image_roundtrip",
        "image_resize",
        "audio_features",
        "audio_features_wav",
        "video_frame_stats",
        "simplify_polygons",
        "ann_ivf",
    ],
)
def test_driver_golden_fresh(name):
    """Each locked-golden driver oracle (__ray_entry__._golden_sql) must
    equal the LIVE query output — same rationale as the random-fixture
    freshness test above."""
    import os

    import numpy as np
    import pandas as pd

    import __ray_entry__ as e

    sf = "/root/testdata/sf0.01" if name == "ann_ivf" else "/root/testdata/sf0.001"
    live = e.queries()[name](sf)
    if not isinstance(live, pd.DataFrame):
        live = live.to_pandas()
    live = live.reset_index(drop=True)
    gold = pd.read_parquet(
        os.path.join(os.path.dirname(__file__), "goldens", f"driver_{name}.parquet")
    )
    assert list(live.columns) == list(gold.columns)
    assert len(live) == len(gold)
    for c in live.columns:
        a, b = live[c].to_numpy(), gold[c].to_numpy()
        assert np.array_equal(a, b), c

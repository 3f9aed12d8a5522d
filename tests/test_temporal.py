"""Temporal/window operator family: as-of join edge semantics and the
exact-quantile histogram-refinement engine (multi-round convergence)."""

import numpy as np
import pandas as pd
import pytest

import ray.data as rd

from geo_polygonize_ray.functions.quantile import exact_group_quantiles


@pytest.mark.usefixtures("ray_session")
class TestExactQuantiles:
    def test_multi_round_refinement_matches_numpy(self):
        """collect_cap far below the group size forces >= 2 histogram
        rounds before the final bounded collect; result must equal the
        direct order-statistic interpolation bit-for-bit."""
        rng = np.random.default_rng(7)
        vals = np.concatenate(
            [
                rng.lognormal(3.0, 1.0, 40_000),  # skewed group
                rng.normal(100.0, 5.0, 30_000),  # gaussian group
            ]
        )
        keys = np.array(["a"] * 40_000 + ["b"] * 30_000)
        ds = rd.from_pandas(pd.DataFrame({"k": keys, "v": vals})).repartition(8)

        qs = (0.01, 0.5, 0.9, 0.999)
        out = exact_group_quantiles(
            ds, "k", "v", qs=qs, n_bins=16, collect_cap=64
        ).set_index("key")

        for key, gv in (("a", vals[:40_000]), ("b", vals[40_000:])):
            sv = np.sort(gv)
            n = len(sv)
            for q in qs:
                pos = (n - 1) * q
                k_lo, k_hi = int(np.floor(pos)), int(np.ceil(pos))
                expect = sv[k_lo] + (sv[k_hi] - sv[k_lo]) * (pos - k_lo)
                got = out.loc[key, f"q{q}"]
                assert got == expect, (key, q, got, expect)

    def test_constant_group_resolves_at_float_resolution(self):
        """A group whose values are all identical can never shrink its
        interval by counting — the no-progress guard must resolve it."""
        df = pd.DataFrame({"k": ["c"] * 10_000, "v": np.full(10_000, 42.25)})
        ds = rd.from_pandas(df).repartition(4)
        out = exact_group_quantiles(ds, "k", "v", qs=(0.5,), n_bins=8, collect_cap=16)
        assert out.loc[0, "q0.5"] == 42.25

    def test_duplicate_heavy_group(self):
        """Half the mass on one repeated value (a zero-width rank plateau)."""
        rng = np.random.default_rng(11)
        vals = np.concatenate([np.full(20_000, 7.5), rng.uniform(0, 100, 20_000)])
        rng.shuffle(vals)
        ds = rd.from_pandas(pd.DataFrame({"k": ["d"] * 40_000, "v": vals})).repartition(8)
        out = exact_group_quantiles(ds, "k", "v", qs=(0.25, 0.5), n_bins=16, collect_cap=128)
        sv = np.sort(vals)
        n = len(sv)
        for q in (0.25, 0.5):
            pos = (n - 1) * q
            k_lo, k_hi = int(np.floor(pos)), int(np.ceil(pos))
            expect = sv[k_lo] + (sv[k_hi] - sv[k_lo]) * (pos - k_lo)
            assert out.loc[0, f"q{q}"] == expect


@pytest.mark.usefixtures("ray_session")
class TestAsofSemantics:
    def test_tiebreak_and_no_match(self, tmp_path):
        """Equal order dates break to the max orderkey; events before any
        order are dropped (inner as-of); exact-time matches are taken."""
        events = pd.DataFrame(
            {
                "event_id": [1, 2, 3],
                "ts": pd.to_datetime(["2000-01-10", "2000-01-01", "1999-12-31"]),
                "user_id": [7, 7, 7],
            }
        )
        orders = pd.DataFrame(
            {
                "o_orderkey": [100, 101, 102],
                "o_custkey": [7, 7, 7],
                "o_orderdate": pd.to_datetime(["2000-01-05", "2000-01-05", "2000-01-01"]),
                "o_totalprice": [10.0, 11.0, 12.0],
            }
        )
        events.to_parquet(tmp_path / "events.parquet")
        orders.to_parquet(tmp_path / "orders.parquet")

        from geo_polygonize_ray.pipelines.temporal import q_asof_join_last_order

        out = q_asof_join_last_order(str(tmp_path))
        # event 3 predates every order -> dropped
        assert list(out["event_id"]) == [1, 2]
        # event 1 (Jan 10): latest date Jan 5 has keys {100, 101} -> max 101
        assert list(out["last_orderkey"]) == [101, 102]
        assert list(out["last_totalprice"]) == [11.0, 12.0]

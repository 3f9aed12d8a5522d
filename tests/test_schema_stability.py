"""Empty-block schema stability (compat.py) + engine hash_join.

Round-4 regression class: Ray 2.49 fabricates schema-less empty blocks in
four places (sort/merge of empty partitions, split-repartition padding,
the all-empty map placeholder, and the map_batches/Project empty
passthroughs).  Those blocks nondeterministically broke chained acero
joins (CORRECTNESS_r04 q3_top_orders / minhash_dedup_groups) and defeated
size accounting.  compat.py shims all four; these tests pin the result:
every block of every stage carries the stage's OUTPUT schema, even when
empty, and the engine's own hash_join (which replaced Dataset.join)
matches pandas exactly.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray
import ray.data as rd


def _block_shapes(ds):
    out = []
    for ref in ds.materialize().get_internal_block_refs():
        b = ray.get(ref)
        if isinstance(b, pd.DataFrame):
            out.append(("pandas", tuple(b.columns), len(b)))
        else:
            out.append(("arrow", tuple(b.schema.names), b.num_rows))
    return out


@pytest.mark.usefixtures("ray_session")
class TestSchemaStability:
    def test_repartition_padding_is_typed(self):
        # 10 rows -> 16 blocks forces the split-repartition padding path
        ds = rd.from_pandas(
            pd.DataFrame({"k": np.arange(10) % 3, "v": np.arange(10.0)})
        ).repartition(16)
        for kind, cols, _ in _block_shapes(ds):
            assert cols == ("k", "v"), (kind, cols)

    def test_map_groups_empty_partitions_carry_output_schema(self):
        # 3 distinct keys over 16 partitions: most shuffle partitions are
        # empty; every output block must still carry the UDF's OUTPUT
        # schema (k, s) — not the input schema, not zero columns
        ds = rd.from_pandas(
            pd.DataFrame({"k": np.arange(10) % 3, "v": np.arange(10.0)})
        ).repartition(16)
        OUT = pa.schema([("k", pa.int64()), ("s", pa.float64())])

        def f(g: pa.Table) -> pa.Table:
            if g.num_rows == 0:
                return OUT.empty_table()
            return pa.Table.from_arrays(
                [g["k"].slice(0, 1), pa.array([float(g.num_rows)])], schema=OUT
            )

        out = ds.groupby("k").map_groups(f, batch_format="pyarrow")
        shapes = _block_shapes(out)
        assert all(cols == ("k", "s") for _, cols, _ in shapes), shapes
        assert sum(n for _, _, n in shapes) == 3

    def test_projected_empty_blocks_carry_projected_schema(self):
        ds = rd.from_pandas(
            pd.DataFrame({"a": np.arange(5), "b": np.arange(5.0), "c": np.arange(5)})
        ).repartition(12)
        proj = ds.select_columns(["a", "c"])
        for kind, cols, _ in _block_shapes(proj):
            assert cols == ("a", "c"), (kind, cols)

    def test_map_batches_empty_input_runs_udf(self):
        # output schema differs from input schema; empty inputs must still
        # produce OUTPUT-schema blocks (the UDF runs on the typed empty)
        ds = rd.from_pandas(pd.DataFrame({"x": np.arange(6.0)})).repartition(12)

        def double(t: pa.Table) -> pa.Table:
            return pa.table({"y": pa.array(np.asarray(t["x"]) * 2.0, pa.float64())})

        out = ds.map_batches(double, batch_format="pyarrow")
        for kind, cols, _ in _block_shapes(out):
            assert cols == ("y",), (kind, cols)


@pytest.mark.usefixtures("ray_session")
class TestHashJoin:
    def _sides(self, n_left=2000, n_right=300, seed=7):
        rng = np.random.default_rng(seed)
        left = pd.DataFrame(
            {
                "lk": rng.integers(0, 400, n_left).astype(np.int64),
                "lv": rng.random(n_left),
            }
        )
        right = pd.DataFrame(
            {
                "rk": rng.permutation(400)[:n_right].astype(np.int64),
                "rtag": [f"t{i}" for i in range(n_right)],
            }
        )
        return left, right

    def test_matches_pandas_inner_merge(self):
        from geo_polygonize_ray.functions import hash_join

        left, right = self._sides()
        got = (
            hash_join(
                rd.from_pandas(left).repartition(8),
                rd.from_pandas(right).repartition(4),
                on="lk",
                right_on="rk",
                left_cols={"lk": "int64", "lv": "float64"},
                right_cols={"rk": "int64", "rtag": "object"},
            )
            .to_pandas()
            .sort_values(["lk", "lv", "rtag"], kind="stable")
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, left_on="lk", right_on="rk")
            .sort_values(["lk", "lv", "rtag"], kind="stable")
            .reset_index(drop=True)[got.columns]
        )
        pd.testing.assert_frame_equal(got, want)

    def test_post_fuses_aggregation_into_shuffle(self):
        from geo_polygonize_ray.functions import hash_join

        left, right = self._sides()
        got = (
            hash_join(
                rd.from_pandas(left),
                rd.from_pandas(right),
                on="lk",
                right_on="rk",
                left_cols={"lk": "int64", "lv": "float64"},
                right_cols={"rk": "int64", "rtag": "object"},
                post=lambda m: m.groupby("lk", as_index=False).agg(s=("lv", "sum")),
            )
            .to_pandas()
            .sort_values("lk")
            .reset_index(drop=True)
        )
        want = (
            left.merge(right, left_on="lk", right_on="rk")
            .groupby("lk", as_index=False)
            .agg(s=("lv", "sum"))
            .sort_values("lk")
            .reset_index(drop=True)
        )
        assert np.array_equal(got["lk"], want["lk"])
        assert np.allclose(got["s"], want["s"])

    def test_empty_side_yields_empty_typed(self):
        from geo_polygonize_ray.functions import hash_join

        left, right = self._sides()
        got = hash_join(
            rd.from_pandas(left),
            rd.from_pandas(right.iloc[:0]),
            on="lk",
            right_on="rk",
            left_cols={"lk": "int64", "lv": "float64"},
            right_cols={"rk": "int64", "rtag": "object"},
        ).to_pandas()
        assert len(got) == 0

    def test_chained_joins_stable_across_runs(self):
        # the r4 flake was nondeterministic; chain two engine joins and
        # repeat — results must be identical every time
        from geo_polygonize_ray.functions import hash_join

        left, right = self._sides()
        mid = pd.DataFrame({"mk": np.arange(400, dtype=np.int64)})
        results = []
        for _ in range(3):
            j1 = hash_join(
                rd.from_pandas(left).repartition(6),
                rd.from_pandas(mid).repartition(6),
                on="lk",
                right_on="mk",
                left_cols={"lk": "int64", "lv": "float64"},
                right_cols={"mk": "int64"},
            ).select_columns(["lk", "lv"])
            j2 = hash_join(
                j1,
                rd.from_pandas(right),
                on="lk",
                right_on="rk",
                left_cols={"lk": "int64", "lv": "float64"},
                right_cols={"rk": "int64", "rtag": "object"},
                post=lambda m: m.groupby("lk", as_index=False).agg(s=("lv", "sum")),
            )
            df = j2.to_pandas().sort_values("lk").reset_index(drop=True)
            results.append(df)
        for r in results[1:]:
            pd.testing.assert_frame_equal(results[0], r)

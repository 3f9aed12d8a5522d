"""Self-check replicating the driver's correctness gate: every queries()
entry with an oracle_sql() runs at sf0.01 and must match DuckDB on
row count, column set, and (order-insensitively) values."""

import duckdb
import numpy as np
import pandas as pd
import pytest

SF_DIR = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return c


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def _dtype_kind(arr: np.ndarray) -> str:
    dt = np.asarray(arr).dtype
    for kind, check in (
        ("bool", np.bool_),
        ("int", np.integer),
        ("float", np.floating),
        ("datetime", np.datetime64),
    ):
        if np.issubdtype(dt, check):
            return kind
    return "object"


def compare(ray_df: pd.DataFrame, sql_df: pd.DataFrame, name: str):
    assert len(ray_df) == len(sql_df), f"{name}: row count {len(ray_df)} != {len(sql_df)}"
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    a, b = _canon(ray_df), _canon(sql_df)
    for col in a.columns:
        av, bv = a[col].to_numpy(), b[col].to_numpy()
        # dtype-KIND equality: the driver hashes typed values, so an int64
        # Ray column vs a float64 DuckDB column (HUGEINT SUM -> float64 in
        # pandas) is a hash miss even when every value is equal (round-1
        # events_props_extract / doc_stats_by_lang regression class).
        assert _dtype_kind(av) == _dtype_kind(bv), (
            f"{name}.{col}: dtype kind {_dtype_kind(av)} (ray) != {_dtype_kind(bv)} (sql)"
        )
        if np.issubdtype(np.asarray(av).dtype, np.floating) or np.issubdtype(
            np.asarray(bv).dtype, np.floating
        ):
            # BITWISE equality: the driver compares value hashes, so a
            # last-ulp difference between numpy and DuckDB rounding is a
            # miss.  All 20 oracle queries are engineered to be bit-stable
            # (4dp-rounded aggregates whose sums never land on ties;
            # integer 1e-4 units for per-row money).
            assert np.array_equal(
                av.astype(float), bv.astype(float), equal_nan=True
            ), f"{name}.{col}: float values not bit-identical"
        else:
            assert list(av) == list(bv), f"{name}.{col}: value mismatch"


@pytest.mark.usefixtures("ray_session")
class TestOracleParity:
    @pytest.fixture(scope="class")
    def contract(self):
        import __ray_entry__ as e

        return e.queries(), e.oracle_sql()

    def test_all_oracle_queries_match(self, con, contract):
        queries, oracles = contract
        failures = []
        for name, sql in oracles.items():
            try:
                ray_df = queries[name](SF_DIR)
                if not isinstance(ray_df, pd.DataFrame):
                    ray_df = ray_df.to_pandas()
                sql_df = con.sql(sql).df()
                compare(ray_df, sql_df, name)
            except AssertionError as ex:
                failures.append(str(ex))
            except Exception as ex:  # noqa: BLE001
                failures.append(f"{name}: raised {type(ex).__name__}: {ex}")
        assert not failures, "\n".join(failures)

    def test_rows_only_queries_run(self, contract):
        queries, oracles = contract
        for name in set(queries) - set(oracles):
            out = queries[name](SF_DIR)
            if not isinstance(out, pd.DataFrame):
                out = out.to_pandas()
            assert len(out) >= 0, name

    def test_polygonize_grid_count(self, contract):
        queries, _ = contract
        out = queries["polygonize_grid"](SF_DIR)
        assert len(out) == 900  # grid(30) -> 30^2 faces, GEOS-oracle golden

    def test_entry_smoke(self):
        import __ray_entry__ as e

        res = e.entry()
        df = res.to_pandas()
        assert len(df) >= 32
        assert df["phash_ok"].all() and df["roundtrip_ok"].all()


def test_no_oracle_set_is_exactly_the_documented_two():
    """Every queries() entry must ship an oracle_sql() twin except the
    one documented exception: embedding_near_dup, whose raw 0-row noise
    signal is complemented by the SQL-checked planted variant.  A new
    query landing without an oracle fails here by default."""
    import __ray_entry__ as e

    missing = set(e.queries()) - set(e.oracle_sql())
    assert missing == {"embedding_near_dup"}, sorted(missing)

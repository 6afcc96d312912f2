"""The correctness spine: every registered query with an oracle must
match its DuckDB twin exactly (driver-style compare) at sf0.001.
"""

from __future__ import annotations

import pytest

from covid_weather_etl_spark.queries.registry import all_queries
from tests.conftest import assert_parity

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle)


#: queries whose oracle reads the PERSISTED sf0.01 model artifact
#: (codebook parquet) — their static oracle SQL is only meaningful at
#: the driver's correctness SF, so parity runs there.
SF001 = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def duck01():
    import duckdb

    from covid_weather_etl_spark.sources.catalog import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF001}/{t}.parquet')")
    yield con
    con.close()


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, duck01, name):
    q = QUERIES[name]
    if "oracle-at-sf0.01" in q.tags:
        assert_parity(spark, duck01, q, sf_dir=SF001)
    else:
        assert_parity(spark, duck, q)


def test_all_queries_return_rows(spark):
    for name, q in QUERIES.items():
        df = q.fn(spark, "/root/testdata/sf0.001")
        assert df.count() >= 0, name


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"n_name", "n_customers", "n_orders"} <= set(df.columns)


def test_parity_harness_detects_mismatches(spark, duck):
    """Canary for the gate itself: assert_parity must FAIL loudly on a
    deliberately corrupted oracle (off-by-one values, dropped rows,
    renamed columns) — otherwise a green sweep proves nothing."""
    import dataclasses

    import pytest as _pytest

    base = QUERIES["pricing_summary_q1"]

    wrong_vals = dataclasses.replace(
        base, oracle=f"SELECT * REPLACE (sum_qty + 1 AS sum_qty) "
                     f"FROM ({base.oracle})")
    with _pytest.raises(AssertionError):
        assert_parity(spark, duck, wrong_vals)

    fewer_rows = dataclasses.replace(
        base, oracle=f"SELECT * FROM ({base.oracle}) LIMIT 1")
    with _pytest.raises(AssertionError):
        assert_parity(spark, duck, fewer_rows)

    renamed = dataclasses.replace(
        base, oracle=f"SELECT * EXCLUDE (sum_qty), sum_qty AS qty_sum "
                     f"FROM ({base.oracle})")
    with _pytest.raises(AssertionError):
        assert_parity(spark, duck, renamed)

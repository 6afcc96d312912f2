"""Tests for the REST Python data source and the CSV connector."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from covid_weather_etl_spark.sources import io as SIO
from covid_weather_etl_spark.sources import rest as R


@pytest.fixture(scope="module")
def rest_df(spark):
    R.register_rest_source(spark)
    return (spark.read.format("rest_timeseries")
            .option("countries", "MDA,DEU,ITA")
            .option("start", "2021-04-01")
            .option("end", "2021-04-10")
            .load())


def test_rest_source_rows_and_schema(rest_df):
    assert rest_df.count() == 3 * 10
    assert rest_df.columns == ["country", "date", *R.WEATHER_FIELDS]


def test_rest_source_parallelism(rest_df):
    """One input partition per country — the ingest fan-out unit."""
    assert rest_df.rdd.getNumPartitions() == 3


def test_rest_source_deterministic(rest_df):
    row = (rest_df.filter("country = 'MDA' AND date = DATE'2021-04-03'")
           .collect()[0])
    expected = R.synth_observation("MDA", __import__("datetime").date(2021, 4, 3))
    for f in R.WEATHER_FIELDS:
        assert row[f] == expected[f]


def test_rest_source_http_mode_stubbed(spark):
    R.register_rest_source(spark)
    df = (spark.read.format("rest_timeseries")
          .option("mode", "http").load())
    with pytest.raises(Exception, match="mode=fake|NotImplemented"):
        df.collect()


def test_csv_roundtrip(spark, tmp_path):
    src = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", -2.0)], "id long, s string, v double")
    path = str(tmp_path / "out_csv")
    SIO.write_csv(src, path)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
        T.StructField("v", T.DoubleType()),
    ])
    back = SIO.read_csv(spark, path, schema)
    assert sorted(back.collect()) == sorted(src.collect())


def test_ensure_warehouse_ddl(spark, tmp_path):
    from covid_weather_etl_spark.sources.catalog import ensure_warehouse

    ensure_warehouse(spark, db="wh_test", location=str(tmp_path))
    ensure_warehouse(spark, db="wh_test", location=str(tmp_path))  # idempotent
    tables = {t.name for t in spark.catalog.listTables("wh_test")}
    assert {"weather", "covid", "import_logs",
            "transform_logs", "load_logs"} <= tables
    cols = [f.name for f in spark.table("wh_test.weather").schema.fields]
    assert "tavg" in cols and "country" in cols

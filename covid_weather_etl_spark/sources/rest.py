"""REST API ingestion as a Spark 4 Python data source (SURVEY.md S1).

The reference ingests by looping country × day on the driver, one HTTP
GET per row with a 1 req/s sleep (reference `etl/extractor.py:44-126`),
writing each response to a staging file. Spark-first, ingestion is a
*data source*: `spark.read.format("rest_timeseries")` with one input
partition per (country, date-window) — requests fan out across
executors, results land directly as DataFrame rows, and the staging
zone becomes an ordinary `.write` of that frame. Rate limiting becomes
per-partition pacing instead of a global driver sleep.

The container has no network, so the transport is pluggable: the
default `mode=fake` transport synthesizes deterministic per-(country,
day) observations (md5-seeded — stable across runs/executors); a real
deployment sets `mode=http` which requires `requests` and is stubbed
here the same way the multimodal decode is.

Scale notes: partitions are the parallelism unit — at a 1000-executor
scale you partition by (country, month) so each task holds one API
session; retries/timeouts stay inside the partition reader;
`sessionize`-style backpressure is the API's rate limit × partition
count. The source declares a fixed schema so Catalyst can prune and
push filters into downstream operators as usual.
"""

from __future__ import annotations

import hashlib
from datetime import date, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

WEATHER_FIELDS = ("tavg", "tmin", "tmax", "prcp", "snow", "wdir",
                  "wspd", "wpgt", "pres", "tsun")

SCHEMA = ("country string, date date, "
          + ", ".join(f"{f} double" for f in WEATHER_FIELDS))


def synth_observation(country: str, day: date) -> dict:
    """Deterministic fake API payload for (country, day): every metric
    derived from md5(country|day|metric) — reproducible on any executor,
    no RNG state. Stands in for `response.json()["data"][0]`."""
    out = {}
    for f in WEATHER_FIELDS:
        h = hashlib.md5(f"{country}|{day.isoformat()}|{f}".encode()).hexdigest()
        out[f] = round(int(h[:8], 16) % 10_000 / 100.0, 2)
    return out


class _Partition(InputPartition):
    def __init__(self, country: str, start: str, end: str):
        self.country = country
        self.start = start
        self.end = end


class RestTimeseriesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.countries = options.get("countries", "MDA,DEU,ITA").split(",")
        self.start = date.fromisoformat(options.get("start", "2021-04-01"))
        self.end = date.fromisoformat(options.get("end", "2021-04-30"))
        self.mode = options.get("mode", "fake")

    def partitions(self):
        """One partition per country — each executor owns one API
        session/rate budget (at real scale: per country × month)."""
        return [_Partition(c, self.start.isoformat(), self.end.isoformat())
                for c in self.countries]

    def read(self, partition: _Partition):
        if self.mode != "fake":  # pragma: no cover - no network here
            raise NotImplementedError(
                "mode=http requires network + requests; this environment "
                "supports only the deterministic mode=fake transport")
        day = date.fromisoformat(partition.start)
        end = date.fromisoformat(partition.end)
        while day <= end:
            obs = synth_observation(partition.country, day)
            yield (partition.country, day,
                   *[obs[f] for f in WEATHER_FIELDS])
            day += timedelta(days=1)


class RestTimeseriesSource(DataSource):
    """`spark.read.format("rest_timeseries")` after
    `spark.dataSource.register(RestTimeseriesSource)`."""

    @classmethod
    def name(cls) -> str:
        return "rest_timeseries"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return RestTimeseriesReader(self.options)


def register_rest_source(spark) -> None:
    spark.dataSource.register(RestTimeseriesSource)

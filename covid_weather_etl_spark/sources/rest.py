"""REST API ingestion as a Spark 4 Python data source (SURVEY.md S1).

The reference ingests by looping country × day on the driver, one HTTP
GET per row with a 1 req/s sleep (reference `etl/extractor.py:44-126`),
writing each response to a staging file. Spark-first, ingestion is a
*data source*: `spark.read.format("rest_timeseries")` with one input
partition per (country, date-window) — requests fan out across
executors, results land directly as DataFrame rows, and the staging
zone becomes an ordinary `.write` of that frame. Rate limiting becomes
per-partition pacing instead of a global driver sleep.

The transport is pluggable: the default `mode=fake` transport
synthesizes deterministic per-(country, day) observations (md5-seeded —
stable across runs/executors); `mode=http` is a REAL stdlib-urllib
client (GET `{base_url}/observations?country=..&date=..`, JSON
`{"data": [...]}` envelope, bounded retries with backoff, optional
per-request pacing — the reference's 1 req/s sleep moved inside the
partition, `etl/extractor.py:79-126`). The container has no external
network, so the http mode is exercised against an in-process localhost
server in tests/test_sources.py; nothing in the code path is test-only.

Scale notes: partitions are the parallelism unit — at a 1000-executor
scale you partition by (country, month) so each task holds one API
session; retries/timeouts stay inside the partition reader;
`sessionize`-style backpressure is the API's rate limit × partition
count. The source declares a fixed schema so Catalyst can prune and
push filters into downstream operators as usual.
"""

from __future__ import annotations

import hashlib
import json
import time
import urllib.parse
import urllib.request
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
        self.base_url = options.get("base_url", "")
        self.timeout = float(options.get("timeout", "10"))
        self.retries = int(options.get("retries", "2"))
        # seconds between requests inside one partition — the
        # reference's global driver `time.sleep(1)` rate limit
        # (etl/extractor.py:123-126) becomes per-partition pacing
        self.pace = float(options.get("pace", "0"))
        if self.mode == "http" and not self.base_url:
            raise ValueError("mode=http requires the base_url option")

    def partitions(self):
        """One partition per country — each executor owns one API
        session/rate budget (at real scale: per country × month)."""
        return [_Partition(c, self.start.isoformat(), self.end.isoformat())
                for c in self.countries]

    def _fetch(self, country: str, day: date) -> dict:
        """One GET with bounded exponential-backoff retries — the
        reference's try/retry loop (etl/extractor.py:79-95) inside the
        partition reader, where a failure costs one task retry, not the
        whole ingest."""
        qs = urllib.parse.urlencode(
            {"country": country, "date": day.isoformat()})
        url = f"{self.base_url}/observations?{qs}"
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                with urllib.request.urlopen(url, timeout=self.timeout) as r:
                    payload = json.load(r)
                return payload["data"][0]
            except Exception as ex:  # noqa: BLE001 - retried, then re-raised
                last = ex
                if attempt < self.retries:
                    time.sleep(min(2 ** attempt * 0.1, 2.0))
        raise last  # type: ignore[misc]

    def read(self, partition: _Partition):
        if self.mode not in ("fake", "http"):
            raise ValueError(f"unknown rest_timeseries mode: {self.mode}")
        day = date.fromisoformat(partition.start)
        end = date.fromisoformat(partition.end)
        while day <= end:
            if self.mode == "fake":
                obs = synth_observation(partition.country, day)
            else:
                if self.pace:
                    time.sleep(self.pace)
                obs = self._fetch(partition.country, day)
            yield (partition.country, day,
                   *[None if obs.get(f) is None else float(obs[f])
                     for f in WEATHER_FIELDS])
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

"""Central query registry — the engine's public query surface.

Every operator implemented from SURVEY.md §2 is exposed as a named query:
a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus, where the
semantics are ANSI-SQL-expressible, a DuckDB oracle SQL string over the
same parquet tables. The driver compares the two at sf0.01
(row-count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- aggregate output types are pinned (BIGINT for counts / integer sums,
  DOUBLE for real math) because DuckDB widens integer SUM to HUGEINT;
- floating aggregates whose bit-pattern depends on accumulation order
  (stddev, interpolated percentiles, windowed means) are rounded to a
  fixed scale on BOTH sides; sums over 2-decimal money columns instead
  go through exact DECIMAL accumulation (see ``functions.numeric``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: Optional[str]
    survey: str = ""          # SURVEY.md §2 operator ids this query covers
    doc: str = ""
    bench: bool = False       # include in bench.py headline set
    tags: tuple[str, ...] = field(default=())


_REGISTRY: dict[str, Query] = {}
_LOADED = False


def register(name: str, oracle: Optional[str] = None, survey: str = "",
             bench: bool = False, tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` as a named query."""
    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, survey=survey,
                                doc=(fn.__doc__ or "").strip(), bench=bench, tags=tags)
        return fn
    return deco


def _load_modules() -> None:
    """Import every operator module for its registration side effects."""
    global _LOADED
    if _LOADED:
        return
    # Registration order matters: the correctness driver evaluates queries
    # in registration order with a bounded window (50 rows), so modules whose
    # queries were NOT driver-verified last round register FIRST (rotate per
    # round). Round 3: relational/windows/multimodal/minhash (verified only
    # against round-1 code, or never — media_features/media_resize) lead,
    # followed by dedup whose first four registrations are its r2-unverified
    # queries (the two r1+r2-green ones moved to the module tail). That puts
    # all 49 queries lacking a CORRECTNESS_r02 row inside the r3 window.
    # Round-2-verified modules (corpus/dashboard/similarity/temporal/text/
    # timeseries/etl/ml/streams/bucketing) trail.
    from covid_weather_etl_spark.operators import (  # noqa: F401
        relational, windows, multimodal, minhash, dedup,
    )
    from covid_weather_etl_spark.operators import (  # noqa: F401
        bucketing, corpus, dashboard, dq, eventstats, frequent, graph, pq,
        quality, relational_ext, scd, semdedup, similarity, sketch_rollup,
        temporal, text, timeseries,
    )
    from covid_weather_etl_spark.etl import queries as etl_queries  # noqa: F401
    from covid_weather_etl_spark.ml import queries as ml_queries    # noqa: F401
    from covid_weather_etl_spark.streaming import streams           # noqa: F401
    _LOADED = True


def all_queries() -> dict[str, Query]:
    _load_modules()
    return dict(_REGISTRY)

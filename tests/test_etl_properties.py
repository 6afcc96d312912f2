"""Property-based tests (hypothesis) for the ETL validation semantics:
for ARBITRARY null patterns across staged files, the pipeline must
quarantine exactly the files containing an invalid entry (null in any
non-imputable field), impute snow/tsun on the survivors, and load
everything else — the reference's whole-file-granularity contract
(`etl/transformer.py:35-60`) as an invariant, not a handful of cases.
"""

from __future__ import annotations

import pytest

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from covid_weather_etl_spark.etl import pipeline as P
from covid_weather_etl_spark import schemas as S
from tests.test_etl import weather_entry, write_envelope

REQUIRED = ["date"] + [f for f in S.WEATHER_FIELDS if f not in S.WEATHER_IMPUTED]

# one weather entry: each nullable field is either present or None
entry_strategy = st.fixed_dictionaries({
    f: st.one_of(st.none(),
                 st.floats(min_value=-50, max_value=1050,
                           allow_nan=False, width=32))
    for f in S.WEATHER_FIELDS
})

file_strategy = st.lists(entry_strategy, min_size=1, max_size=4)
batch_strategy = st.lists(file_strategy, min_size=1, max_size=4)


def entry_is_bad(e: dict) -> bool:
    return any(e.get(f) is None for f in REQUIRED if f != "date")


@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(batch=batch_strategy)
@pytest.mark.slow
def test_routing_matches_rules(spark, tmp_path_factory, batch):
    tmp = tmp_path_factory.mktemp("prop")
    d = str(tmp / "staging" / "batch_1700000000")
    lake = P.Lake(str(tmp / "lake"))
    n_bad_files = 0
    n_good_entries = 0
    for i, entries in enumerate(batch):
        full = [weather_entry(date=f"2021-04-{(j % 28) + 1:02d}", **e)
                for j, e in enumerate(entries)]
        write_envelope(d, f"MDA_WEATHER_file{i}", full)
        if any(entry_is_bad(e) for e in entries):
            n_bad_files += 1
        else:
            n_good_entries += len(entries)

    res = P.run_batch(spark, f"{d}/*", lake, "weather", 1700000000)
    assert res.n_files == len(batch)
    assert res.n_error_files == n_bad_files
    assert res.high_error_alert == (n_bad_files >= 0.5 * len(batch))

    gold = spark.read.parquet(lake.path("gold", "weather"))
    # dedup-on-load collapses natural-key duplicates within the batch;
    # loaded rows never exceed the clean-entry count and every loaded
    # row must have imputed snow/tsun
    n_loaded = gold.count()
    assert 0 < n_loaded <= n_good_entries if n_good_entries else n_loaded == 0
    if n_loaded:
        nulls = gold.filter(F.col("snow").isNull()
                            | F.col("tsun").isNull()).count()
        assert nulls == 0

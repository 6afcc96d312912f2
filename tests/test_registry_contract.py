"""Registry / driver-window contract pins: the invariants the per-round
rotation edits must never break (the driver checks exactly the first 50
entries of ``all_queries()``; a name collision or an oracle-less window
slot silently burns a correctness row)."""

from __future__ import annotations

from covid_weather_etl_spark.queries import registry as R


def test_rotation_window_contract():
    qs = R.all_queries()
    window = list(qs)[:50]
    assert window == list(R._ROTATION_R7)
    assert len(set(R._ROTATION_R7)) == 50
    # r7 closes the never-checked queue, so this window deliberately
    # spends slots on the rows-only-by-nature queries (weaker driver
    # evidence is still evidence) and the oldest rows-only refreshes —
    # but ONLY on that documented set; any other oracle-less slot is
    # a burnt correctness row
    allowed_rows_only = {
        "media_phash_dedup", "als_part_recommendations",
        "sarima_forecast_eval", "logreg_classifier_eval",
        "gbt_classifier_eval", "gbt_regressor_eval", "adf_stationarity",
        "fourier_trend_forecast_eval", "rp_lsh_near_dup",
        "approx_distinct_profile", "approx_quantile_profile",
        "media_features",
    }
    unexpected = [n for n in window
                  if not qs[n].oracle and n not in allowed_rows_only]
    assert not unexpected, unexpected


def test_registry_names_unique_and_callable():
    qs = R.all_queries()
    assert len(qs) >= 271
    for name, q in qs.items():
        assert q.name == name
        assert callable(q.fn)
        # oracle, when present, is non-trivial SQL text
        assert q.oracle is None or "SELECT" in q.oracle.upper()


def test_entry_module_exposes_registry():
    import __spark_entry__ as e
    qs = e.queries()
    oracles = e.oracle_sql()
    assert set(oracles) <= set(qs)
    reg = R.all_queries()
    assert set(qs) == set(reg)
    assert set(oracles) == {n for n, q in reg.items() if q.oracle}

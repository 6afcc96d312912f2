"""covid_weather_etl_spark — a PySpark-native analytics engine.

Re-expresses the query and data-processing capabilities of the reference
ETL/analytics system (dmitrycvs/covid-weather-etl, see SURVEY.md) as
idiomatic Spark: declarative DataFrame/SQL plans optimized by Catalyst,
window-based time-series features, anti-join dedup loads, lakehouse-style
bronze/silver/gold ETL, `applyInPandas` per-group ML, plus the
LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal plumbing) needed at 100 TB scale.
"""

__version__ = "0.1.0"

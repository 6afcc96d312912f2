from covid_weather_etl_spark.sources.catalog import TABLES, load_tables, register_views

__all__ = ["TABLES", "load_tables", "register_views"]

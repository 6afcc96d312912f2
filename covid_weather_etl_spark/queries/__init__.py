from covid_weather_etl_spark.queries.registry import Query, all_queries, register

__all__ = ["Query", "all_queries", "register"]

from covid_weather_etl_spark.functions.numeric import dsum, exact_avg, r6

__all__ = ["dsum", "exact_avg", "r6"]

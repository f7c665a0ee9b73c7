from metric_search_spark.sources import synth  # noqa: F401

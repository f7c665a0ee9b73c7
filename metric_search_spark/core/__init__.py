from metric_search_spark.core.covertree import CoverTree  # noqa: F401
from metric_search_spark.core.metrics import get_metric, METRICS  # noqa: F401

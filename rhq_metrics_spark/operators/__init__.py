from rhq_metrics_spark.operators.anomaly import rolling_zscore
from rhq_metrics_spark.operators.asof import asof_join
from rhq_metrics_spark.operators.availability import availability_stats
from rhq_metrics_spark.operators.distinct import distinct_adjacent
from rhq_metrics_spark.operators.gapfill import fill_gaps
from rhq_metrics_spark.operators.interval import interval_join
from rhq_metrics_spark.operators.percentile import P2Estimator, p2_percentiles
from rhq_metrics_spark.operators.periods import periods, predicate
from rhq_metrics_spark.operators.sessions import session_stats, sessionize
from rhq_metrics_spark.operators.rate import rate, rate_stats
from rhq_metrics_spark.operators.rollup import stats_from_rollup, time_rollup
from rhq_metrics_spark.operators.stacked import pooled_stats, stacked_stats
from rhq_metrics_spark.operators.stats import (
    minmax_ts,
    numeric_bucket_stats,
    scalar_aggs,
)
from rhq_metrics_spark.operators.tagged import tagged_stats

__all__ = [
    "asof_join",
    "rolling_zscore",
    "interval_join",
    "time_rollup",
    "stats_from_rollup",
    "availability_stats",
    "distinct_adjacent",
    "fill_gaps",
    "session_stats",
    "sessionize",
    "minmax_ts",
    "numeric_bucket_stats",
    "periods",
    "P2Estimator",
    "p2_percentiles",
    "pooled_stats",
    "predicate",
    "rate",
    "rate_stats",
    "scalar_aggs",
    "stacked_stats",
    "tagged_stats",
]

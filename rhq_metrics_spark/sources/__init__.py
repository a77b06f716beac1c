from rhq_metrics_spark.sources.store import MetricsStore

__all__ = ["MetricsStore"]

from rhq_metrics_spark.streaming.ingest import start_ingest_stream

__all__ = ["start_ingest_stream"]

from rhq_metrics_spark.streaming.anomaly import streaming_zscore
from rhq_metrics_spark.streaming.availability import streaming_state_segments
from rhq_metrics_spark.streaming.decontaminate import (
    start_decontaminate_stream,
)
from rhq_metrics_spark.streaming.dedup import streaming_exact_dedup
from rhq_metrics_spark.streaming.ingest import start_ingest_stream
from rhq_metrics_spark.streaming.bloom import streaming_bloom
from rhq_metrics_spark.streaming.hll import streaming_hll_registers
from rhq_metrics_spark.streaming.percentile import streaming_p2
from rhq_metrics_spark.streaming.rate import streaming_rate
from rhq_metrics_spark.streaming.substr import start_incremental_substr_stream

__all__ = [
    "start_ingest_stream",
    "streaming_exact_dedup",
    "start_incremental_substr_stream",
    "streaming_bloom",
    "streaming_hll_registers",
    "start_decontaminate_stream",
    "streaming_state_segments",
    "streaming_p2",
    "streaming_rate",
    "streaming_zscore",
]

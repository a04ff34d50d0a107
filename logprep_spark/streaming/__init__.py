"""Structured-Streaming layer: the reference's runner/pipeline loop
(``logprep/framework/pipeline.py``, ``logprep/runner.py``) re-expressed
as ``readStream → transforms → writeStream``.
"""

from logprep_spark.streaming.pipeline import (
    IncrementalCorpusStream,
    StreamingPipeline,
)
from logprep_spark.streaming.windows import (
    drift_psi_stream,
    psi_baseline,
    sessionize_stream,
    interval_join,
    sliding_counts,
    tumbling_counts,
)
from logprep_spark.streaming.state import (
    bloom_window_stream,
    cm_window_stream,
    cusum_window_stream,
    dedupe_near_stream,
    dedupe_stream,
    heavy_hitters_stream,
    holt_window_stream,
    hw_window_stream,
    hampel_stream,
    rate_anomaly_stream,
    running_totals,
    sq_window_stream,
    theta_window_stream,
    token_bucket_stream,
)

__all__ = [
    "bloom_window_stream",
    "cm_window_stream",
    "cusum_window_stream",
    "heavy_hitters_stream",
    "holt_window_stream",
    "hw_window_stream",
    "hampel_stream",
    "rate_anomaly_stream",
    "IncrementalCorpusStream",
    "StreamingPipeline",
    "dedupe_near_stream",
    "drift_psi_stream",
    "psi_baseline",
    "dedupe_stream",
    "running_totals",
    "sq_window_stream",
    "theta_window_stream",
    "token_bucket_stream",
    "sessionize_stream",
    "interval_join",
    "sliding_counts",
    "tumbling_counts",
]

"""bigdata_event_stream_detection_spark — a PySpark-native event-stream
detection engine.

A from-scratch reimplementation, on the Spark DataFrame / Structured
Streaming stack, of the query and data-processing capabilities of the
reference temporal-text-mining pipeline (Mei & Zhai KDD'05 style:
background model -> per-window EM themes -> HMM life-cycle decode ->
theme-strength event rows -> KL evolution graph), generalized with the
operators a large-scale training-data pipeline needs (dedup, similarity
search, text analysis, multimodal plumbing).

Everything is expressed as DataFrame -> DataFrame pure functions so the
same logic runs in batch (tests / DuckDB oracles) and under Structured
Streaming (the CEP engine). Numeric kernels are vectorized numpy inside
``applyInPandas`` — zero per-row Python in any hot path.
"""

__version__ = "0.1.0"

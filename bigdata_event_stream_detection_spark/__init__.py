"""PySpark-native event-stream-detection engine.

Public surface (see README.md / SURVEY.md for the full design):

    session.get_spark              — configured SparkSession factory
    params.Params                  — pipeline tunables (reference parity)
    plans.pipeline                 — batch composition (detect_event_stream,
                                     evolution_graph)
    streaming.engine               — Structured Streaming shell (stateful
                                     windowed EM/HMM, exactly-once sink)
    operators.*                    — individual operators (background, em,
                                     hmm, blocked_hmm, transitions, windows,
                                     dedup, similarity, text, multimodal,
                                     skew)
    sources.*                      — synthetic fixture, tokenizer, XML scan
    sinks.reports                  — dot / CSV report sinks
"""

__version__ = "0.1.0"

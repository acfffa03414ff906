"""Pipeline parameter defaults.

Mirrors the tunables of the reference engine (reference
``utils/Parameters.java:28-66``) so results are comparable, re-expressed
as a plain dataclass. Nothing here is driver-global mutable state — the
object is captured by closures / broadcast into UDFs.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Params:
    # scan / filter (reference Parameters.java:30-34)
    max_page: int = 3                  # keep pages <= this
    min_doc_tokens: int = 50           # drop short docs
    min_word_corpus_count: int = 30    # background-model dictionary floor
    min_distinct_words: int = 50       # doc enters a window only above this

    # EM (reference Parameters.java:40-43; report/themeExtraction.tex)
    num_themes: int = 5
    em_iterations: int = 25
    em_runs: int = 1
    lambda_background: float = 0.95
    theme_score_floor_factor: float = 0.9  # keep themes with avg pi > 0.9/k

    # HMM (reference Parameters.java:61-66; report/hiddenMarkovModel.tex)
    bw_max_iterations: int = 50
    bw_pi_threshold: float = 0.01
    bw_a_threshold: float = 0.01
    bw_block_size: int = 65536         # two-level scan fallback trigger
    viterbi_block_size: int = 131072

    # transitions (reference Parameters.java:48,54; KLDivergence.java)
    kl_threshold: float = 8.0
    kl_log_max: float = 27.0           # clamp for smoothLog
    kl_epsilon: float = 1e-12
    divergence: str = "kl"             # or "tv"

    # windows
    window_length: str = "7 days"
    window_slide: str | None = None    # None => tumbling
    session_gap: str = "1 hour"
    watermark_delay: str = "3 days"

    # skew handling
    salt_buckets: int = 16
    heavy_source_threshold: float = 0.5  # source holding > this row share gets salted

    extra: dict = field(default_factory=dict)


DEFAULTS = Params()

"""Deterministic synthetic `sequences` fixture (FIXTURES.md F1/F2).

Generates the input-hint table ``(doc_id string, tokens array<int32>,
n_tok int32, source string, event_time timestamp)`` by sampling from a
planted HMM, distributed via ``mapInPandas`` over ``spark.range`` so the
same generator scales from the 2k-doc pytest fixture to multi-million-doc
bench inputs. All randomness is keyed by ``hash(doc_id)`` — never by row
order or partition — so output is identical at any parallelism.

Mirrors the generative test setup of the reference
(``hmm/MainSparkHmm.java:24-35``, ``hmm/Hmm.java:1208-1261``).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from ..operators.kernels import sample_hmm_sequence, stable_seed

SEQUENCES_SCHEMA = (
    "doc_id string, tokens array<int>, n_tok int, source string, event_time timestamp"
)

BASE_EPOCH = 1_420_070_400  # 2015-01-01T00:00:00Z
DOC_STEP_SECONDS = 120      # one doc every 2 min per source stream


@dataclass(frozen=True)
class PlantedHmm:
    """A known (pi, A, B) used to generate data and to assert recovery.

    Emission rows are separable: the background row is near-uniform,
    each theme concentrates ~85% of its mass on a disjoint vocab block,
    so EM/decoding assertions can be tight (FIXTURES.md F2).
    """

    n_themes: int = 3
    vocab: int = 500
    seed: int = 42

    @property
    def n_states(self) -> int:
        return self.n_themes + 1

    def matrices(self):
        rng = np.random.default_rng(self.seed)
        n, W, k = self.n_states, self.vocab, self.n_themes
        pi = np.full(n, 1.0 / n)
        a = np.zeros((n, n))
        a[0, 0] = 0.7
        a[0, 1:] = 0.3 / k
        for i in range(1, n):
            a[i, i] = 0.85
            a[i, 0] = 0.15
        b = np.empty((n, W))
        b[0] = rng.random(W) + 0.5          # near-uniform background
        b[0] /= b[0].sum()
        block = W // (k + 1)
        for j in range(1, n):
            row = rng.random(W) * 0.15
            lo, hi = j * block, (j + 1) * block
            row[lo:hi] += rng.random(hi - lo) * 5.0 + 1.0
            b[j] = row / row.sum()
        return pi, a, b


DEFAULT_SOURCES = ("GDL", "JDG", "HEAVY")
# HEAVY takes ~70% of rows to exercise skew/salting (FIXTURES.md F1).
SOURCE_WEIGHTS = (0.2, 0.1, 0.7)


def generate_sequences(
    spark: SparkSession,
    n_docs: int,
    hmm: PlantedHmm | None = None,
    min_tokens: int = 60,
    max_tokens: int = 400,
    late_fraction: float = 0.02,
    late_delay_seconds: int = 14 * 24 * 3600,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation of the sequences table."""
    hmm = hmm or PlantedHmm()
    pi, a, b = hmm.matrices()
    sources = DEFAULT_SOURCES
    weights = np.asarray(SOURCE_WEIGHTS)
    cum_w = np.cumsum(weights) / weights.sum()

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"].to_numpy():
                seq = int(i)
                s_pick = stable_seed("src", seq, hmm.seed) / float(2**63)
                src = sources[int(np.searchsorted(cum_w, s_pick, side="right"))]
                doc_id = f"{src}-{seq:08d}"
                dseed = stable_seed("doc", doc_id, hmm.seed)
                rng = np.random.default_rng(dseed)
                # lognormal-ish length in [min, max]
                n_tok = int(np.clip(rng.lognormal(np.log(120), 0.5),
                                    min_tokens, max_tokens))
                _, obs = sample_hmm_sequence(pi, a, b, n_tok, dseed)
                ts = BASE_EPOCH + seq * DOC_STEP_SECONDS
                ts += int(rng.integers(0, DOC_STEP_SECONDS))  # bounded jitter
                if rng.random() < late_fraction:
                    ts += late_delay_seconds                   # late arrival
                rows.append((doc_id, obs.astype(np.int32), n_tok, src,
                             pd.Timestamp(ts, unit="s")))
            yield pd.DataFrame(
                rows, columns=["doc_id", "tokens", "n_tok", "source", "event_time"]
            )

    nparts = partitions or max(8, n_docs // 2000)
    base = spark.range(0, n_docs, numPartitions=nparts)
    return base.mapInPandas(gen, schema=SEQUENCES_SCHEMA)


def write_sequences(spark: SparkSession, path: str, n_docs: int, **kwargs) -> None:
    df = generate_sequences(spark, n_docs, **kwargs)
    df.write.mode("overwrite").parquet(path)

"""Shared text Column expressions.

Everything here is a pure pyspark.sql Column expression (JVM-side,
whole-stage-codegen) with an exactly-equivalent ANSI-SQL form so the
DuckDB oracles can reproduce results bit-for-bit. The md5-based 60-bit
hash is the portability trick: Spark's `hash()` and DuckDB's `hash()`
are different algorithms, but md5 is md5 everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ASCII-only split pattern shared with the oracles (documents fixture is
# ASCII; the engine's own tokenizer for general text uses \p{L}).
ASCII_TOKEN_SPLIT = "[^a-z]+"

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")
FR_STOPWORDS = ("le", "la", "et", "de", "un", "une", "dans", "est", "pour", "sur")


def ascii_words(text: Column) -> Column:
    """lower -> split on non-letters -> drop empties."""
    return F.filter(F.split(F.lower(text), ASCII_TOKEN_SPLIT), lambda w: w != "")


def hash60(s: Column) -> Column:
    """Deterministic 60-bit integer hash from md5 (portable across
    engines: DuckDB form is CAST(concat('0x', substr(md5(s),1,15)) AS
    BIGINT))."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def shingles(words: Column, k: int = 3) -> Column:
    """k-word shingles as space-joined strings (array<string>).

    transform over index range keeps this a pure Column expr.
    """
    n = F.size(words)
    # for docs shorter than k words: single shingle = whole doc
    return F.when(n < k, F.array(F.concat_ws(" ", words))).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.concat_ws(" ", F.slice(words, i + 1, k)),
        )
    )


def stopword_ratio(words: Column, stopwords: tuple[str, ...]) -> Column:
    """Fraction of words that are in the stopword list."""
    hits = F.size(F.filter(words, lambda w: w.isin(*stopwords)))
    return hits / F.greatest(F.size(words), F.lit(1))

"""As-of (point-in-time) join — an operator Spark lacks natively,
expressed as a composition of built-ins.

For each left row, attach the single most recent right row of the same
key with ``right.time <= left.time`` (backward as-of; the standard
point-in-time-correctness join for feature lookups, price marks, and
"state of the user when the event happened" queries).

Why not a range join: Spark plans ``l.ts >= r.ts`` joins as a broadcast
nested loop (or worse), and even a bucketed range join produces every
(l, r) candidate pair before a per-l argmax — O(n·m) per key. The
union + carry-forward composition here is the shape that scales:

    union(left tagged 1, right tagged 0)
      -> ONE hash shuffle on the key
      -> per-key ordered window, ``last(payload, ignorenulls)`` with an
         unbounded-preceding frame (an O(1) running value per row, NOT
         an O(frame) rescan)
      -> keep the left rows

Exactly one shuffle of |left| + |right| rows, no pair blow-up, skew
bounded by the hottest key (salt upstream via operators/skew.py if a
key dominates). Rows tie-break right-before-left at equal timestamps,
matching DuckDB's ``ASOF JOIN`` (``l.ts >= r.ts``), which is what the
driver oracle checks this against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    time_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    value_cols: tuple[str, ...] = ("value",),
    tolerance_seconds: int | None = None,
    prefix: str = "right_",
) -> DataFrame:
    """Backward as-of join (see module docstring).

    Returns every ``left`` row with ``<prefix><time_col>`` and
    ``<prefix><c>`` for each ``c`` in ``value_cols`` — NULL when the key
    has no right row at or before the left time (left-outer semantics),
    or when the match is older than ``tolerance_seconds``.

    ``right`` must be unique per (``by``, ``time_col``); pre-aggregate
    it otherwise (ties would make the carried row engine-dependent).
    """
    by = list(by)
    payload = [f"{prefix}{time_col}"] + [f"{prefix}{c}" for c in value_cols]
    l_tagged = left.select(
        *by, time_col,
        *[F.col(c) for c in left.columns if c not in by + [time_col]],
        F.lit(1).alias("_is_left"),
        F.lit(None).cast(dict(right.dtypes)[time_col])
        .alias(f"{prefix}{time_col}"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"{prefix}{c}")
          for c in value_cols],
    )
    r_tagged = right.select(
        *by, time_col,
        *[F.lit(None).cast(t).alias(c) for c, t in left.dtypes
          if c not in by + [time_col]],
        F.lit(0).alias("_is_left"),
        F.col(time_col).alias(f"{prefix}{time_col}"),
        *[F.col(c).alias(f"{prefix}{c}") for c in value_cols],
    )
    # right sorts before left at the same timestamp => a right row is
    # visible to a simultaneous left row (DuckDB ASOF `>=` semantics)
    w = (Window.partitionBy(*by)
         .orderBy(F.col(time_col).asc(), F.col("_is_left").asc())
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = l_tagged.unionByName(r_tagged).select(
        "*", *[F.last(c, ignorenulls=True).over(w).alias(f"_c_{c}")
               for c in payload])
    out = (carried.filter(F.col("_is_left") == 1)
           .select(*[c for c in left.columns],
                   *[F.col(f"_c_{c}").alias(c) for c in payload]))
    if tolerance_seconds is not None:
        # evaluate staleness ONCE into its own column — nullifying
        # right_ts first would blind the predicate for the value cols
        stale = F.coalesce(
            F.unix_timestamp(F.col(time_col))
            - F.unix_timestamp(F.col(f"{prefix}{time_col}"))
            > tolerance_seconds, F.lit(False))
        out = out.withColumn("_stale", stale)
        for c in payload:
            out = out.withColumn(
                c, F.when(F.col("_stale"), F.lit(None)).otherwise(F.col(c)))
        out = out.drop("_stale")
    return out


def interval_join(
    left: DataFrame,
    right: DataFrame,
    max_gap_seconds: float,
    time_col: str = "ts",
    by: tuple[str, ...] = ("user_id",),
    left_id: str = "event_id",
    right_id: str = "event_id",
) -> DataFrame:
    """Banded interval join: every (left, right) pair of the same key
    whose event times lie within ``max_gap_seconds`` of each other —
    "purchases within N minutes of an error by the same user".

    Why not a raw non-equi join: Spark plans ``abs(l.ts - r.ts) <= g``
    as a nested loop. Bucketing event time into gap-width bands turns
    it into an EQUI join — the left row sits in one band, the right
    row fans out to its own band and both neighbors, so every
    in-tolerance pair collides in EXACTLY one band (the left row's:
    ``|dt| <= gap`` forces ``|band_l - band_r| <= 1``, and the three
    exploded bands are distinct) and the residual ``|dt| <= gap``
    filter runs post-join. No final distinct is needed — the
    exactly-one-collision property makes the join duplicate-free.
    Cost: one hash exchange of |L| + 3|R| rows on (key, band) — the
    standard banded range-join shape — and candidate fan-in is bounded
    by per-band density, never |L|x|R|. Bands come from integer ``div``
    (never double division + cast: a float quotient can truncate to
    band-1 when the timestamp sits exactly on a band boundary).
    (The streaming twin needs no bands: Spark's stream-stream join
    takes the time-bound condition natively and sizes its state from
    it — ``streaming/joins.py:streaming_interval_join``, parity-tested
    in tests/test_streaming_cep.py.)

    Output: ``by + (left_id, right_id AS right_<right_id>, dt_sec)``
    with ``dt_sec = right.ts - left.ts`` rounded to exact microseconds
    (negative when the right event precedes the left).
    """
    gap_us = int(round(float(max_gap_seconds) * 1e6))
    if gap_us <= 0:
        raise ValueError(
            f"max_gap_seconds={max_gap_seconds} must be positive "
            "(band width would be zero)")
    t_us = F.unix_micros(F.col(time_col).cast("timestamp"))
    lt = left.select(
        *by, F.col(left_id).alias("_lid"), t_us.alias("_lus"),
    ).withColumn("_band", F.expr(f"_lus div {gap_us}"))
    rt = right.select(
        *by, F.col(right_id).alias("_rid"), t_us.alias("_rus"),
    ).withColumn("_rband", F.expr(f"_rus div {gap_us}")).select(
        *by, "_rid", "_rus",
        F.explode(F.array(
            F.col("_rband") - 1, F.col("_rband"), F.col("_rband") + 1,
        )).alias("_band"))
    joined = lt.join(rt, [*by, "_band"]).filter(
        F.abs(F.col("_rus") - F.col("_lus")) <= gap_us)
    return joined.select(
        *by,
        F.col("_lid").alias(left_id),
        F.col("_rid").alias(f"right_{right_id}"),
        F.round((F.col("_rus") - F.col("_lus")) / F.lit(1e6), 6)
        .alias("dt_sec"),
    )

"""Streaming CEP twins: the continuous forms of every pattern class in
``operators/cep.py`` — absence, timeout/SLA (static and rules-table),
Kleene-plus runs, and general MATCH_RECOGNIZE quantified sequences
(static, rules-table, and DEFINE-predicate classified) — each with a
required horizon so every pattern instance resolves exactly once at
watermark finality.

Absence semantics (identical to batch): per key, every ``first``-typed event is
an anchor; it matches if the earliest following ``then`` event (per-key
(ts, event_id) order) has no ``without`` event between them and lands
within ``within_seconds``. The horizon makes every anchor decidable in
a stream, and event-time finality makes each one resolve exactly once:

* **match** is final once the watermark passes the matched then-event's
  timestamp — any later arrival has ts >= watermark, so nothing can
  slot between the anchor and its match, or earlier than the match;
* **no-match via negation** is final once a ``without`` that precedes
  every current ``then`` is itself behind the watermark;
* **no-match via horizon** is final once the watermark passes
  ``anchor + horizon``.

State per key is a bounded buffer of (type_code, ts_us, event_id)
triples — only the three pattern-relevant event types, never payloads —
packed as binary blobs like the engine's token buffers. Anchors leave
state the moment they resolve; non-anchor events are pruned once the
watermark proves no current or future anchor can reach them (future
anchors have ts >= watermark, so a then/without older than
``watermark - horizon`` is dead). A key whose buffer empties is REMOVED
from the store — no tombstones are needed because each anchor is an
independent pattern instance identified by its event_id (unlike the
funnel's once-per-user chain), and Spark's watermark filter stops
replayed anchors from re-entering.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType, DoubleType, LongType, StringType, StructField,
    StructType, TimestampType,
)

CEP_STATE_SCHEMA = StructType([
    StructField("types", BinaryType()),     # int8 code: 0 first/1 then/2 wo
    StructField("ts_us", BinaryType()),     # int64 event-time micros
    StructField("eids", BinaryType()),      # int64 event ids (tie order)
])

OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("first_event_id", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("then_ts", TimestampType()),
    StructField("gap_sec", DoubleType()),
])


TIMEOUT_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("first_event_id", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("deadline_ts", TimestampType()),
])


def streaming_match_timeout(
    stream: DataFrame,
    first: str,
    then: str,
    within_seconds: float,
    unless: str | None = None,
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark_delay: str = "30 minutes",
    max_events_in_state: int = 10_000,
) -> DataFrame:
    """Continuous timeout/SLA alerts: emit ``(user_id, first_event_id,
    first_ts, deadline_ts)`` exactly when the watermark proves no
    ``then`` (nor ``unless``) event landed within the horizon — equal to
    the batch ``match_timeout`` rows, each exactly once.

    Every anchor resolves at a single point: ``wm > first_ts + horizon``
    (all in-horizon events are then final). A ``then``/``unless``
    already buffered inside the horizon retires the anchor early and
    silently — no alert can ever fire after that, so the state empties
    as soon as the answer is known, not at the deadline.
    """
    horizon_us = int(round(float(within_seconds) * 1e6))
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)
    watch = [t for t in (then, unless) if t is not None]

    def fn(key, pdf_iter, state: GroupState):
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            tb, ub, eb = state.get
            typ = np.frombuffer(tb, dtype=np.int8)
            us = np.frombuffer(ub, dtype=np.int64)
            eid = np.frombuffer(eb, dtype=np.int64)
        else:
            typ = np.empty(0, np.int8)
            us = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)

        if not state.hasTimedOut:
            nt, nu, ne = [], [], []
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                nt.append(pdf["_code"].to_numpy(np.int8))
                nu.append(pdf[time_col].to_numpy("datetime64[ns]")
                          .astype(np.int64) // 1_000)
                ne.append(pdf[id_col].to_numpy(np.int64))
            if nt:
                typ = np.concatenate([typ] + nt)
                us = np.concatenate([us] + nu)
                eid = np.concatenate([eid] + ne)
                if typ.size > max_events_in_state:
                    dropped_acc.add(typ.size - max_events_in_state)
                    order = np.lexsort((eid, us))
                    keep = np.sort(order[:max_events_in_state])
                    typ, us, eid = typ[keep], us[keep], eid[keep]

        rows = []
        drop = np.zeros(typ.size, dtype=bool)
        pending_deadline_us = []
        for i in np.flatnonzero(typ == 0):
            f_us, f_eid = int(us[i]), int(eid[i])
            silencer = (
                (typ > 0)
                & ((us > f_us) | ((us == f_us) & (eid > f_eid)))
                & (us - f_us <= horizon_us))
            if silencer.any():
                drop[i] = True            # answered early: never alerts
            elif wm_us > f_us + horizon_us:
                rows.append([user, f_eid,
                             pd.Timestamp(f_us, unit="us"),
                             pd.Timestamp(f_us + horizon_us, unit="us")])
                drop[i] = True            # deadline passed: alert once
            else:
                pending_deadline_us.append(f_us + horizon_us)

        keep = ~drop
        # watched events only matter inside a live or future anchor's
        # horizon; anchors are kept by their own pending deadline
        keep &= (typ == 0) | (us >= wm_us - horizon_us)
        typ, us, eid = typ[keep], us[keep], eid[keep]

        if not typ.size:
            if state.exists:
                state.remove()
        else:
            state.update((typ.tobytes(), us.tobytes(), eid.tobytes()))
            fire_us = (min(pending_deadline_us) if pending_deadline_us
                       else int(us.min()) + horizon_us)
            state.setTimeoutTimestamp(
                max(fire_us // 1000 + 1, wm_us // 1000 + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "first_event_id", "first_ts", "deadline_ts"])

    pairs = [F.lit(first), F.lit(0)]
    for w in watch:
        pairs += [F.lit(w), F.lit(1)]
    code_of = F.create_map(*pairs)
    keyed = (
        stream.withWatermark(time_col, watermark_delay)
        .filter(F.col(type_col).isin([first] + watch))
        .select(F.col(key_col).alias("user_id"), time_col,
                F.col(id_col).cast("long").alias(id_col),
                code_of[F.col(type_col)].cast("int").alias("_code"))
    )
    out = keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=TIMEOUT_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_events_acc = dropped_acc
    return out


def streaming_match_absence(
    stream: DataFrame,
    first: str,
    then: str,
    without: str,
    within_seconds: float,
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark_delay: str = "30 minutes",
    max_events_in_state: int = 10_000,
) -> DataFrame:
    """Emit ``(user_id, first_event_id, first_ts, then_ts, gap_sec)``
    rows equal to the batch ``match_absence(..., within_seconds=...)``
    output on the same input, each exactly once."""
    horizon_us = int(round(float(within_seconds) * 1e6))
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)

    def after(ts, eid, t0, e0):
        """(ts, eid) strictly after (t0, e0) — the batch sort order."""
        return (ts > t0) | ((ts == t0) & (eid > e0))

    def fn(key, pdf_iter, state: GroupState):
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            tb, ub, eb = state.get
            typ = np.frombuffer(tb, dtype=np.int8)
            us = np.frombuffer(ub, dtype=np.int64)
            eid = np.frombuffer(eb, dtype=np.int64)
        else:
            typ = np.empty(0, np.int8)
            us = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)

        if not state.hasTimedOut:
            nt, nu, ne = [], [], []
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                nt.append(pdf["_code"].to_numpy(np.int8))
                nu.append(pdf[time_col].to_numpy("datetime64[ns]")
                          .astype(np.int64) // 1_000)
                ne.append(pdf[id_col].to_numpy(np.int64))
            if nt:
                typ = np.concatenate([typ] + nt)
                us = np.concatenate([us] + nu)
                eid = np.concatenate([eid] + ne)
                if typ.size > max_events_in_state:
                    dropped_acc.add(typ.size - max_events_in_state)
                    order = np.lexsort((eid, us))
                    keep = np.sort(order[:max_events_in_state])
                    typ, us, eid = typ[keep], us[keep], eid[keep]

        rows = []
        drop = np.zeros(typ.size, dtype=bool)
        pending_decision_us = []
        for i in np.flatnonzero(typ == 0):
            f_us, f_eid = int(us[i]), int(eid[i])
            fol = after(us, eid, f_us, f_eid)
            t_mask = fol & (typ == 1)
            w_mask = fol & (typ == 2)
            t_us = t_eid = None
            if t_mask.any():
                j = np.flatnonzero(t_mask)
                jj = j[np.lexsort((eid[j], us[j]))[0]]
                t_us, t_eid = int(us[jj]), int(eid[jj])
            w_us = w_eid = None
            if w_mask.any():
                j = np.flatnonzero(w_mask)
                jj = j[np.lexsort((eid[j], us[j]))[0]]
                w_us, w_eid = int(us[jj]), int(eid[jj])
            then_first = t_us is not None and (
                w_us is None or (t_us, t_eid) < (w_us, w_eid))
            if then_first and t_us - f_us <= horizon_us:
                if t_us < wm_us:          # match final: emit + retire
                    gap = round((t_us - f_us) / 1e6, 6)
                    rows.append([user, int(f_eid),
                                 pd.Timestamp(int(f_us), unit="us"),
                                 pd.Timestamp(t_us, unit="us"), gap])
                    drop[i] = True
                else:                     # match pending finality
                    pending_decision_us.append(t_us)
            elif (w_us is not None and w_us < wm_us
                  and (t_us is None or (w_us, w_eid) < (t_us, t_eid))):
                drop[i] = True            # negation final: retire silently
            elif wm_us > f_us + horizon_us:
                drop[i] = True            # horizon final: no match
            else:
                pending_decision_us.append(f_us + horizon_us)

        keep = ~drop
        # non-anchor events older than watermark - horizon can never be
        # strictly-after any live or future anchor (live anchors have
        # f_us >= wm - horizon, and ties on ts are resolved by event_id,
        # so the boundary itself must survive): provably dead below it
        keep &= (typ == 0) | (us >= wm_us - horizon_us)
        typ, us, eid = typ[keep], us[keep], eid[keep]

        if not typ.size:
            if state.exists:
                state.remove()
        else:
            state.update((typ.tobytes(), us.tobytes(), eid.tobytes()))
            if pending_decision_us:
                fire_us = min(pending_decision_us)
            else:
                # only non-anchor events: dead once wm passes ts+horizon
                fire_us = int(us.min()) + horizon_us
            state.setTimeoutTimestamp(
                max(fire_us // 1000 + 1, wm_us // 1000 + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "first_event_id", "first_ts", "then_ts",
                "gap_sec"])

    code_of = F.create_map(
        F.lit(first), F.lit(0), F.lit(then), F.lit(1),
        F.lit(without), F.lit(2))
    keyed = (
        stream.withWatermark(time_col, watermark_delay)
        .filter(F.col(type_col).isin([first, then, without]))
        .select(F.col(key_col).alias("user_id"), time_col,
                F.col(id_col).cast("long").alias(id_col),
                code_of[F.col(type_col)].cast("int").alias("_code"))
    )
    out = keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_events_acc = dropped_acc
    return out


RUNS_STATE_SCHEMA = StructType([
    StructField("types", BinaryType()),     # int8: 1 target / 0 other
    StructField("ts_us", BinaryType()),     # int64 event-time micros
    StructField("eids", BinaryType()),      # int64 event ids (tie order)
    StructField("run_len", LongType()),     # open-run accumulator
    StructField("start_us", LongType()),
    StructField("last_us", LongType()),
])

RUNS_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("start_ts", TimestampType()),
    StructField("end_ts", TimestampType()),
    StructField("run_len", LongType()),
])


def streaming_match_runs(
    stream: DataFrame,
    run_type: str,
    min_run: int = 3,
    max_gap_seconds: float = 3600.0,
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark_delay: str = "30 minutes",
    max_events_in_state: int = 10_000,
) -> DataFrame:
    """Continuous Kleene-plus runs: emit rows equal to the batch
    ``match_runs(..., max_gap_seconds=...)`` output on the same input,
    each exactly once.

    Unlike the absence/timeout twins (which buffer every
    pattern-relevant event across the horizon), run state is a FOLD:
    events final under the watermark are consumed in (ts, event_id)
    order into a 3-long accumulator (open-run length / start / last)
    and leave state immediately — the buffer only ever holds the
    out-of-order suffix (ts >= watermark). A run resolves exactly once:

    * **broken** when a differently-typed or too-late event lands
      behind the watermark directly after it — the breaker is final, so
      nothing can ever slot back inside the run;
    * **gap-closed** when ``watermark > last + max_gap``: every future
      arrival has ts >= watermark, so no event can extend it. The
      finite gap is what makes a trailing run decidable — the batch
      operator takes the same parameter so the two stay row-identical.
    """
    gap_us = int(round(float(max_gap_seconds) * 1e6))
    if gap_us <= 0:
        raise ValueError(
            f"max_gap_seconds={max_gap_seconds} must be positive — a "
            "finite positive gap is what makes trailing runs decidable")
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)

    def fn(key, pdf_iter, state: GroupState):
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            tb, ub, eb, run_len, start_us, last_us = state.get
            typ = np.frombuffer(tb, dtype=np.int8)
            us = np.frombuffer(ub, dtype=np.int64)
            eid = np.frombuffer(eb, dtype=np.int64)
        else:
            typ = np.empty(0, np.int8)
            us = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)
            run_len, start_us, last_us = 0, 0, 0

        if not state.hasTimedOut:
            nt, nu, ne = [], [], []
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                nt.append(pdf["_code"].to_numpy(np.int8))
                nu.append(pdf[time_col].to_numpy("datetime64[ns]")
                          .astype(np.int64) // 1_000)
                ne.append(pdf[id_col].to_numpy(np.int64))
            if nt:
                typ = np.concatenate([typ] + nt)
                us = np.concatenate([us] + nu)
                eid = np.concatenate([eid] + ne)
                if typ.size > max_events_in_state:
                    dropped_acc.add(typ.size - max_events_in_state)
                    order = np.lexsort((eid, us))
                    keep = np.sort(order[:max_events_in_state])
                    typ, us, eid = typ[keep], us[keep], eid[keep]

        order = np.lexsort((eid, us))
        typ, us, eid = typ[order], us[order], eid[order]
        final = us < wm_us
        rows = []

        def close():
            nonlocal run_len
            if run_len >= min_run:
                rows.append([user, pd.Timestamp(start_us, unit="us"),
                             pd.Timestamp(last_us, unit="us"),
                             run_len])
            run_len = 0

        for i in np.flatnonzero(final):
            if typ[i] == 1:
                if run_len and int(us[i]) - last_us <= gap_us:
                    run_len += 1
                else:
                    close()
                    run_len, start_us = 1, int(us[i])
                last_us = int(us[i])
            else:
                close()
        if run_len and wm_us > last_us + gap_us:
            close()                      # nothing can ever extend it

        keep = ~final
        typ, us, eid = typ[keep], us[keep], eid[keep]
        if not typ.size and not run_len:
            if state.exists:
                state.remove()
        else:
            state.update((typ.tobytes(), us.tobytes(), eid.tobytes(),
                          int(run_len), int(start_us), int(last_us)))
            # poke at the earliest decision point: the run's gap
            # deadline and/or the moment the watermark can finalize
            # more of the buffered suffix
            cand = []
            if run_len:
                cand.append(last_us + gap_us)
            if us.size:
                cand.append(int(us.min()))
            fire_us = min(cand)
            state.setTimeoutTimestamp(
                max(fire_us // 1000 + 1, wm_us // 1000 + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "start_ts", "end_ts", "run_len"])

    keyed = (
        stream.withWatermark(time_col, watermark_delay)
        .select(F.col(key_col).alias("user_id"), time_col,
                F.col(id_col).cast("long").alias(id_col),
                (F.col(type_col) == run_type).cast("tinyint")
                .alias("_code"))
    )
    out = keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=RUNS_OUT_SCHEMA,
        stateStructType=RUNS_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_events_acc = dropped_acc
    return out


SEQ_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("first_event_id", LongType()),
    StructField("start_ts", TimestampType()),
    StructField("end_ts", TimestampType()),
    StructField("n_events", LongType()),
    StructField("step_counts", StringType()),
])


def streaming_match_seq(
    stream: DataFrame,
    steps,
    within_seconds: float,
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark_delay: str = "30 minutes",
    max_events_in_state: int = 10_000,
    classify: str = "type",
    after_match: str = "past_last_row",
) -> DataFrame:
    """Continuous MATCH_RECOGNIZE sequences: the streaming twin of
    ``operators.cep.match_seq`` — same ``steps`` grammar, REQUIRED
    horizon — emitting row-identical matches exactly once.

    Batch and streaming share ONE scan (``operators.cep._seq_scan``);
    the stream drives it with the watermark as the decidability
    frontier: an anchor resolves (match or fail, exactly once) when the
    watermark passes ``anchor + horizon``, because every event that
    could participate is then final — this is why the horizon is
    mandatory here (same reason ``streaming_match_runs`` requires a
    finite gap). The scan also returns how far the buffer can never
    matter again (events behind the first undecided anchor), clamped to
    the finality frontier so out-of-order suffix events survive; state
    per key is the bounded (type, ts, id) buffer between those two
    frontiers, and a key whose buffer empties is REMOVED.

    Note (applies to every CEP twin in this module): the type filter is
    pushed below the watermark node by Catalyst, so only
    pattern-relevant events advance the watermark — a quiet stream of
    non-pattern events does not flush pending anchors. Feed the
    pattern-relevant types, or union a heartbeat of one of them.
    """
    from ..operators.cep import (
        _seq_scan, _skip_past, _step_code_expr, _validate_steps,
    )

    labels, types, quants = _validate_steps(steps)
    skip_past = _skip_past(after_match)
    horizon_us = int(round(float(within_seconds) * 1e6))
    if horizon_us <= 0:
        raise ValueError("within_seconds must be positive — the "
                         "horizon is what makes anchors decidable")
    distinct_types = list(dict.fromkeys(types))
    tid_of = {t: i for i, t in enumerate(distinct_types)}
    step_tids = [tid_of[t] for t in types]
    anchor_tid = step_tids[0]
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)

    def fn(key, pdf_iter, state: GroupState):
        user = key[0]
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            tb, ub, eb = state.get
            tid = np.frombuffer(tb, dtype=np.int8)
            us = np.frombuffer(ub, dtype=np.int64)
            eid = np.frombuffer(eb, dtype=np.int64)
        else:
            tid = np.empty(0, np.int8)
            us = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)

        if not state.hasTimedOut:
            nt, nu, ne = [], [], []
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                nt.append(pdf["_tid"].to_numpy(np.int8))
                nu.append(pdf[time_col].to_numpy("datetime64[ns]")
                          .astype(np.int64) // 1_000)
                ne.append(pdf[id_col].to_numpy(np.int64))
            if nt:
                tid = np.concatenate([tid] + nt)
                us = np.concatenate([us] + nu)
                eid = np.concatenate([eid] + ne)
                if tid.size > max_events_in_state:
                    dropped_acc.add(tid.size - max_events_in_state)
                    order = np.lexsort((eid, us))
                    keep = np.sort(order[:max_events_in_state])
                    tid, us, eid = tid[keep], us[keep], eid[keep]

        order = np.lexsort((eid, us))
        tid, us, eid = tid[order], us[order], eid[order]
        matches, consumed = _seq_scan(tid, us, eid, step_tids, quants,
                                      horizon_us, wm_us, skip_past)
        # never drop the out-of-order suffix: a future anchor (ts >=
        # watermark) may still be followed by buffered ts >= wm events
        consumed = min(consumed,
                       int(np.searchsorted(us, wm_us, side="left")))
        rows = []
        for a, last, counts in matches:
            rows.append([
                user, int(eid[a]),
                pd.Timestamp(int(us[a]), unit="us"),
                pd.Timestamp(int(us[last]), unit="us"),
                int(sum(counts)),
                ",".join(f"{lb}={c}" for lb, c in zip(labels, counts)),
            ])
        tid, us, eid = tid[consumed:], us[consumed:], eid[consumed:]

        if not tid.size:
            if state.exists:
                state.remove()
        else:
            state.update((tid.tobytes(), us.tobytes(), eid.tobytes()))
            anchors = np.flatnonzero(tid == anchor_tid)
            if anchors.size:
                # wake when the first pending anchor becomes decidable
                fire_us = int(us[int(anchors[0])]) + horizon_us
            else:
                # only non-anchor suffix events: prune once final
                fire_us = int(us.min())
            state.setTimeoutTimestamp(
                max(fire_us // 1000 + 1, wm_us // 1000 + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "first_event_id", "start_ts", "end_ts",
                "n_events", "step_counts"])

    keyed = (
        stream.withWatermark(time_col, watermark_delay)
        .select(F.col(key_col).alias("user_id"), time_col,
                F.col(id_col).cast("long").alias(id_col),
                _step_code_expr(tid_of, classify, type_col)
                .alias("_tid"))
        .filter(F.col("_tid").isNotNull())
    )
    out = keyed.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SEQ_OUT_SCHEMA,
        stateStructType=CEP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_events_acc = dropped_acc
    return out


SEQ_RULES_STATE_SCHEMA = StructType([
    StructField("types", BinaryType()),     # int8 step-type codes
    StructField("ts_us", BinaryType()),     # int64 event-time micros
    StructField("eids", BinaryType()),      # int64 event ids (tie order)
    StructField("steps", StringType()),     # the spec the codes use
    StructField("horizon_us", LongType()),
])

SEQ_RULES_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("rule_id", StringType()),
    StructField("first_event_id", LongType()),
    StructField("start_ts", TimestampType()),
    StructField("end_ts", TimestampType()),
    StructField("n_events", LongType()),
    StructField("step_counts", StringType()),
])


def streaming_match_seq_rules(
    stream: DataFrame,
    rules: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark_delay: str = "30 minutes",
    max_events_in_state: int = 10_000,
) -> DataFrame:
    """Continuous dynamic-rules sequence CEP: the streaming twin of
    ``operators.cep.match_seq_rules`` — quantified pattern specs live
    in a TABLE (``rules(rule_id, steps, within_seconds)``, re-read as
    the static join side every micro-batch), matches emitted exactly
    once at watermark finality, row-identical to batch on drained
    input.

    Same architecture as the other rules twins: state is keyed by
    (user, rule) and carries the rule's spec + horizon next to the
    bounded event buffer, so a pure timeout wake-up decides with no
    rules lookup. If a rule's spec string CHANGES mid-stream, a group
    re-encodes its buffered events under the new spec the next time
    data for it arrives (buffered types absent from the new spec are
    dropped); already-emitted matches are never retracted.
    """
    from ..operators.cep import (
        _parse_steps_spec, _seq_scan, _validate_steps,
    )

    rrows = rules.select("rule_id", "steps", "within_seconds").collect()
    if not rrows:
        raise ValueError("rules table is empty")
    for r in rrows:
        _validate_steps(_parse_steps_spec(r["steps"]))
        if not (float(r["within_seconds"]) > 0):
            raise ValueError(
                f"rule {r['rule_id']}: within_seconds must be positive")
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)

    def fn(key, pdf_iter, state: GroupState):
        user, rule = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            tb, ub, eb, spec, horizon_us = state.get
            tid = np.frombuffer(tb, dtype=np.int8)
            us = np.frombuffer(ub, dtype=np.int64)
            eid = np.frombuffer(eb, dtype=np.int64)
        else:
            tid = np.empty(0, np.int8)
            us = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)
            spec, horizon_us = None, 0

        if not state.hasTimedOut:
            new_spec = None
            nt, nu, ne = [], [], []
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                if new_spec is None:
                    new_spec = pdf["_steps"].iloc[0]
                    horizon_us = int(pdf["_horizon_us"].iloc[0])
                    if spec is not None and new_spec != spec:
                        # re-encode the buffer under the new spec
                        old_types = [s[1] for s in
                                     _parse_steps_spec(spec)]
                        old_of = list(dict.fromkeys(old_types))
                        new_steps = _parse_steps_spec(new_spec)
                        new_of = {t: i for i, t in enumerate(
                            dict.fromkeys(s[1] for s in new_steps))}
                        remap = np.full(len(old_of), -1, np.int8)
                        for i, t in enumerate(old_of):
                            remap[i] = new_of.get(t, -1)
                        tid = remap[tid]
                        keep = tid >= 0
                        tid, us, eid = tid[keep], us[keep], eid[keep]
                    spec = new_spec
                steps = _parse_steps_spec(spec)
                t_of = {t: i for i, t in enumerate(
                    dict.fromkeys(s[1] for s in steps))}
                codes = pdf[type_col].map(t_of)
                ok = codes.notna().to_numpy()
                nt.append(codes.to_numpy(np.float64)[ok]
                          .astype(np.int8))
                nu.append(pdf[time_col].to_numpy("datetime64[ns]")
                          .astype(np.int64)[ok] // 1_000)
                ne.append(pdf[id_col].to_numpy(np.int64)[ok])
            if nt:
                tid = np.concatenate([tid] + nt)
                us = np.concatenate([us] + nu)
                eid = np.concatenate([eid] + ne)
                if tid.size > max_events_in_state:
                    dropped_acc.add(tid.size - max_events_in_state)
                    order = np.lexsort((eid, us))
                    keep = np.sort(order[:max_events_in_state])
                    tid, us, eid = tid[keep], us[keep], eid[keep]

        if spec is None:        # timed out before ever seeing data
            if state.exists:
                state.remove()
            return
        steps = _parse_steps_spec(spec)
        labels, types, quants = _validate_steps(steps)
        t_of = {t: i for i, t in enumerate(dict.fromkeys(types))}
        step_tids = [t_of[t] for t in types]
        order = np.lexsort((eid, us))
        tid, us, eid = tid[order], us[order], eid[order]
        matches, consumed = _seq_scan(tid, us, eid, step_tids, quants,
                                      horizon_us, wm_us)
        consumed = min(consumed,
                       int(np.searchsorted(us, wm_us, side="left")))
        rows = []
        for a, last, counts in matches:
            rows.append([
                user, rule, int(eid[a]),
                pd.Timestamp(int(us[a]), unit="us"),
                pd.Timestamp(int(us[last]), unit="us"),
                int(sum(counts)),
                ",".join(f"{lb}={c}" for lb, c in zip(labels, counts)),
            ])
        tid, us, eid = tid[consumed:], us[consumed:], eid[consumed:]

        if not tid.size:
            if state.exists:
                state.remove()
        else:
            state.update((tid.tobytes(), us.tobytes(), eid.tobytes(),
                          spec, int(horizon_us)))
            anchors = np.flatnonzero(tid == step_tids[0])
            if anchors.size:
                fire_us = int(us[int(anchors[0])]) + horizon_us
            else:
                fire_us = int(us.min())
            state.setTimeoutTimestamp(
                max(fire_us // 1000 + 1, wm_us // 1000 + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "rule_id", "first_event_id", "start_ts",
                "end_ts", "n_events", "step_counts"])

    r = rules.select(
        "rule_id", F.col("steps").alias("_steps"),
        F.round(F.col("within_seconds").cast("double") * 1e6)
        .cast("long").alias("_horizon_us"))
    membership = (r.select(
        "rule_id",
        F.explode(F.transform(
            F.split("_steps", ","),
            lambda p: F.trim(F.regexp_extract(p, r"^(.*):[^:]*$", 1))))
        .alias("_et"))
        .distinct())
    keyed = (
        stream.withWatermark(time_col, watermark_delay)
        .join(F.broadcast(membership), F.col(type_col) == F.col("_et"))
        .join(F.broadcast(r), "rule_id")
        .select(F.col(key_col).alias("user_id"), "rule_id", time_col,
                F.col(id_col).cast("long").alias(id_col), type_col,
                "_steps", "_horizon_us")
    )
    out = keyed.groupBy("user_id", "rule_id").applyInPandasWithState(
        fn,
        outputStructType=SEQ_RULES_OUT_SCHEMA,
        stateStructType=SEQ_RULES_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_events_acc = dropped_acc
    return out


RULES_STATE_SCHEMA = StructType([
    StructField("types", BinaryType()),     # int8: 0 anchor / 1 silencer
    StructField("ts_us", BinaryType()),     # int64 event-time micros
    StructField("eids", BinaryType()),      # int64 event ids (tie order)
    StructField("horizon_us", LongType()),  # this rule's own horizon
])

RULES_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("rule_id", StringType()),
    StructField("first_event_id", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("deadline_ts", TimestampType()),
])


def streaming_match_timeout_rules(
    stream: DataFrame,
    rules: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark_delay: str = "30 minutes",
    max_events_in_state: int = 10_000,
) -> DataFrame:
    """Continuous dynamic-rules timeout CEP: the streaming twin of
    ``operators.cep.match_timeout_rules``. Emits the same
    ``(user_id, rule_id, first_event_id, first_ts, deadline_ts)`` rows,
    each exactly once, at the moment the watermark passes the rule's
    deadline.

    ``rules`` is the STATIC side of a stream-static join, re-read every
    micro-batch: inserting a rule row starts matching it on the next
    trigger with no redeploy (the broadcast-state idiom). Deleting a
    rule stops NEW anchors immediately while already-buffered anchors
    still resolve with the horizon stored in their group's state;
    changing a horizon applies to a group the next time data for it
    arrives. State is
    keyed by (user, rule) — the key space is |users| x |matching
    rules|, strictly more parallel than the single-pattern twin — and
    each group stores the rule's own horizon alongside the usual
    bounded event buffer, so a group stays decidable on a pure timeout
    wake-up with no rules lookup.
    """
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)

    def fn(key, pdf_iter, state: GroupState):
        user, rule = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            tb, ub, eb, horizon_us = state.get
            typ = np.frombuffer(tb, dtype=np.int8)
            us = np.frombuffer(ub, dtype=np.int64)
            eid = np.frombuffer(eb, dtype=np.int64)
        else:
            typ = np.empty(0, np.int8)
            us = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)
            horizon_us = 0

        if not state.hasTimedOut:
            nt, nu, ne = [], [], []
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                nt.append(pdf["_code"].to_numpy(np.int8))
                nu.append(pdf[time_col].to_numpy("datetime64[ns]")
                          .astype(np.int64) // 1_000)
                ne.append(pdf[id_col].to_numpy(np.int64))
                horizon_us = int(pdf["_horizon_us"].iloc[0])
            if nt:
                typ = np.concatenate([typ] + nt)
                us = np.concatenate([us] + nu)
                eid = np.concatenate([eid] + ne)
                if typ.size > max_events_in_state:
                    dropped_acc.add(typ.size - max_events_in_state)
                    order = np.lexsort((eid, us))
                    keep = np.sort(order[:max_events_in_state])
                    typ, us, eid = typ[keep], us[keep], eid[keep]

        rows = []
        drop = np.zeros(typ.size, dtype=bool)
        pending_deadline_us = []
        for i in np.flatnonzero(typ == 0):
            f_us, f_eid = int(us[i]), int(eid[i])
            silencer = (
                (typ == 1)
                & ((us > f_us) | ((us == f_us) & (eid > f_eid)))
                & (us - f_us <= horizon_us))
            if silencer.any():
                drop[i] = True            # answered early: never alerts
            elif wm_us > f_us + horizon_us:
                rows.append([user, rule, f_eid,
                             pd.Timestamp(f_us, unit="us"),
                             pd.Timestamp(f_us + horizon_us,
                                          unit="us")])
                drop[i] = True            # deadline passed: alert once
            else:
                pending_deadline_us.append(f_us + horizon_us)

        keep = ~drop
        # silencers only matter inside a live or future anchor's
        # horizon; anchors are kept by their own pending deadline
        keep &= (typ == 0) | (us >= wm_us - horizon_us)
        typ, us, eid = typ[keep], us[keep], eid[keep]

        if not typ.size:
            if state.exists:
                state.remove()
        else:
            state.update((typ.tobytes(), us.tobytes(), eid.tobytes(),
                          int(horizon_us)))
            fire_us = (min(pending_deadline_us) if pending_deadline_us
                       else int(us.min()) + horizon_us)
            state.setTimeoutTimestamp(
                max(fire_us // 1000 + 1, wm_us // 1000 + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "rule_id", "first_event_id", "first_ts",
                "deadline_ts"])

    r = rules.select(
        "rule_id", "first_type", "then_type",
        F.round(F.col("within_seconds").cast("double") * 1e6)
        .cast("long").alias("_horizon_us"))
    base = (stream.withWatermark(time_col, watermark_delay)
            .select(F.col(key_col).alias("user_id"), time_col,
                    F.col(id_col).cast("long").alias(id_col),
                    type_col))
    anchors = base.join(
        F.broadcast(r), F.col(type_col) == F.col("first_type")) \
        .withColumn("_code", F.lit(0).cast("tinyint"))
    silencers = base.join(
        F.broadcast(r), F.col(type_col) == F.col("then_type")) \
        .withColumn("_code", F.lit(1).cast("tinyint"))
    keyed = anchors.unionByName(silencers).select(
        "user_id", "rule_id", time_col, id_col, "_code", "_horizon_us")
    out = keyed.groupBy("user_id", "rule_id").applyInPandasWithState(
        fn,
        outputStructType=RULES_OUT_SCHEMA,
        stateStructType=RULES_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_events_acc = dropped_acc
    return out


ABSENCE_RULES_OUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("rule_id", StringType()),
    StructField("first_event_id", LongType()),
    StructField("first_ts", TimestampType()),
    StructField("then_ts", TimestampType()),
    StructField("gap_sec", DoubleType()),
])


def streaming_match_absence_rules(
    stream: DataFrame,
    rules: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    type_col: str = "event_type",
    id_col: str = "event_id",
    watermark_delay: str = "30 minutes",
    max_events_in_state: int = 10_000,
) -> DataFrame:
    """Continuous dynamic-rules absence CEP: the streaming twin of
    ``operators.cep.match_absence_rules``, emitting the same
    ``(user_id, rule_id, first_event_id, first_ts, then_ts, gap_sec)``
    rows exactly once at watermark finality.

    Same architecture as :func:`streaming_match_timeout_rules` —
    rules are the static side of a per-micro-batch join, state is
    keyed by (user, rule) and stores the rule's horizon — but events
    fan out to one buffered copy PER ROLE (anchor 0 / then 1 /
    without 2): a rule whose first and then types coincide ("A then
    the next A") buffers an A twice, and the strictly-after
    (ts, event_id) comparison keeps an anchor from matching its own
    copy, mirroring the batch frame semantics with no special cases.
    """
    bad = rules.filter(
        F.col("then_type") == F.col("without_type")).limit(1).collect()
    if bad:
        raise ValueError(
            f"rule {bad[0]['rule_id']}: then_type == without_type "
            "can never fire (the silencer ties every match)")
    dropped_acc = stream.sparkSession.sparkContext.accumulator(0)

    def fn(key, pdf_iter, state: GroupState):
        user, rule = key
        wm_us = state.getCurrentWatermarkMs() * 1000
        if state.exists:
            tb, ub, eb, horizon_us = state.get
            typ = np.frombuffer(tb, dtype=np.int8)
            us = np.frombuffer(ub, dtype=np.int64)
            eid = np.frombuffer(eb, dtype=np.int64)
        else:
            typ = np.empty(0, np.int8)
            us = np.empty(0, np.int64)
            eid = np.empty(0, np.int64)
            horizon_us = 0

        if not state.hasTimedOut:
            nt, nu, ne = [], [], []
            for pdf in pdf_iter:
                if not len(pdf):
                    continue
                nt.append(pdf["_code"].to_numpy(np.int8))
                nu.append(pdf[time_col].to_numpy("datetime64[ns]")
                          .astype(np.int64) // 1_000)
                ne.append(pdf[id_col].to_numpy(np.int64))
                horizon_us = int(pdf["_horizon_us"].iloc[0])
            if nt:
                typ = np.concatenate([typ] + nt)
                us = np.concatenate([us] + nu)
                eid = np.concatenate([eid] + ne)
                if typ.size > max_events_in_state:
                    dropped_acc.add(typ.size - max_events_in_state)
                    order = np.lexsort((eid, us))
                    keep = np.sort(order[:max_events_in_state])
                    typ, us, eid = typ[keep], us[keep], eid[keep]

        def after(ts, ei, t0, e0):
            return (ts > t0) | ((ts == t0) & (ei > e0))

        rows = []
        drop = np.zeros(typ.size, dtype=bool)
        pending_decision_us = []
        for i in np.flatnonzero(typ == 0):
            f_us, f_eid = int(us[i]), int(eid[i])
            fol = after(us, eid, f_us, f_eid)
            t_mask = fol & (typ == 1)
            w_mask = fol & (typ == 2)
            t_us = t_eid = None
            if t_mask.any():
                j = np.flatnonzero(t_mask)
                jj = j[np.lexsort((eid[j], us[j]))[0]]
                t_us, t_eid = int(us[jj]), int(eid[jj])
            w_us = w_eid = None
            if w_mask.any():
                j = np.flatnonzero(w_mask)
                jj = j[np.lexsort((eid[j], us[j]))[0]]
                w_us, w_eid = int(us[jj]), int(eid[jj])
            then_first = t_us is not None and (
                w_us is None or (t_us, t_eid) < (w_us, w_eid))
            if then_first and t_us - f_us <= horizon_us:
                if t_us < wm_us:          # match final: emit + retire
                    gap = round((t_us - f_us) / 1e6, 6)
                    rows.append([user, rule, int(f_eid),
                                 pd.Timestamp(int(f_us), unit="us"),
                                 pd.Timestamp(t_us, unit="us"), gap])
                    drop[i] = True
                else:                     # match pending finality
                    pending_decision_us.append(t_us)
            elif (w_us is not None and w_us < wm_us
                  and (t_us is None or (w_us, w_eid) < (t_us, t_eid))):
                drop[i] = True            # negation final: retire silently
            elif wm_us > f_us + horizon_us:
                drop[i] = True            # horizon final: no match
            else:
                pending_decision_us.append(f_us + horizon_us)

        keep = ~drop
        keep &= (typ == 0) | (us >= wm_us - horizon_us)
        typ, us, eid = typ[keep], us[keep], eid[keep]

        if not typ.size:
            if state.exists:
                state.remove()
        else:
            state.update((typ.tobytes(), us.tobytes(), eid.tobytes(),
                          int(horizon_us)))
            fire_us = (min(pending_decision_us) if pending_decision_us
                       else int(us.min()) + horizon_us)
            state.setTimeoutTimestamp(
                max(fire_us // 1000 + 1, wm_us // 1000 + 1))
        if rows:
            yield pd.DataFrame(rows, columns=[
                "user_id", "rule_id", "first_event_id", "first_ts",
                "then_ts", "gap_sec"])

    r = rules.select(
        "rule_id", "first_type", "then_type", "without_type",
        F.round(F.col("within_seconds").cast("double") * 1e6)
        .cast("long").alias("_horizon_us"))
    base = (stream.withWatermark(time_col, watermark_delay)
            .select(F.col(key_col).alias("user_id"), time_col,
                    F.col(id_col).cast("long").alias(id_col),
                    type_col))
    roles = []
    for code, rcol in ((0, "first_type"), (1, "then_type"),
                       (2, "without_type")):
        roles.append(base.join(
            F.broadcast(r), F.col(type_col) == F.col(rcol))
            .withColumn("_code", F.lit(code).cast("tinyint")))
    keyed = roles[0].unionByName(roles[1]).unionByName(roles[2]) \
        .select("user_id", "rule_id", time_col, id_col, "_code",
                "_horizon_us")
    out = keyed.groupBy("user_id", "rule_id").applyInPandasWithState(
        fn,
        outputStructType=ABSENCE_RULES_OUT_SCHEMA,
        stateStructType=RULES_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
    out.dropped_events_acc = dropped_acc
    return out

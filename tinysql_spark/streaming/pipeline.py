"""Structured Streaming surface for the engine.

The reference has no streaming (SURVEY §2: "Streaming: none") — this
is part of the beyond-reference training-pipeline surface: the same
event-aggregation semantics as q15_events_hourly, expressed as an
incremental streaming job with watermarked late-data handling, plus a
custom stateful operator (running per-user counters) via
applyInPandasWithState.

Design notes (100 TB / continuous ingest):
- File source reads new parquet files per micro-batch; on a cluster
  this is a cloud-storage listing (or Kafka source — same plan shape).
- Watermark bounds state: hourly windows + 2h watermark means state
  for a window is dropped once the event-time high-water mark passes
  window_end + 2h.
- availableNow trigger = batch-catchup mode; tests use it to drain
  the source deterministically.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),  # ns-since-epoch layouts; micros layout swaps in TimestampType (see read_event_stream)
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


_TS_LAYOUT_CACHE: dict[str, str] = {}


def stream_trigger_options(boundary_invariant: bool = False) -> dict[str, str]:
    """File-source rate-limit options for every readStream in the
    suite. Default is one file per micro-batch (deterministic replay —
    the staged-split fixtures define batch boundaries by file).
    SPARK_GRAFT_STREAM_TRIGGER=bytes[:N] switches to VOLUME-sized
    triggers (maxBytesPerTrigger, default 128 MiB — the
    maxPartitionBytes-style sizing a production ingest uses so batch
    size tracks data volume, not file count); files[:N] sets a file
    count. Bench staging only (SURVEY §7.18 item 5): correctness runs
    never set the env var, so replay semantics are unchanged there.

    ``boundary_invariant=True`` (r15, guide §6 / VERDICT r14 item 4):
    entries whose OUTPUT does not depend on micro-batch boundaries —
    stateless maps (st12/st13) and the sentinel-flushed append sink
    (st04, where emission rides event-time watermark progress plus
    the engine's no-data batch, not file count) — default to the
    volume-sized trigger, the production ingest sizing. Their staged
    multi-file sources exist for the STATEFUL entries' semantics;
    paying one micro-batch of fixed cost per file there is pure
    overhead (result identity under both triggers is pinned in
    tests/test_streaming.py). The env var still overrides both ways."""
    import os

    default = "bytes" if boundary_invariant else "files:1"
    spec = os.environ.get("SPARK_GRAFT_STREAM_TRIGGER", default)
    kind, _, val = spec.partition(":")
    if kind == "bytes":
        return {"maxBytesPerTrigger": val or str(128 * 1024 * 1024)}
    return {"maxFilesPerTrigger": val or "1"}


def ts_layout(events_path: str) -> str:
    """Physical layout of the events `ts` column, read from the parquet
    footer of the first file: 'nanos' (TIMESTAMP(NANOS) — Spark reads
    it as long under nanosAsLong), 'long' (plain int64 nanoseconds),
    or 'micros' (TIMESTAMP(MICROS) — a plain Spark timestamp). The
    driver has shipped both nanos (rounds 1-2) and micros (round 3)
    layouts, so the streaming source detects instead of assuming.
    Footer probes are cached per resolved file path — the layout is a
    property of the file, and every st-entry probes the same staged
    source."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(events_path, "*.parquet"))) or [events_path]
    key = os.path.realpath(files[0])
    got = _TS_LAYOUT_CACHE.get(key)
    if got is None:
        t = str(pq.read_schema(files[0]).field("ts").type)
        got = "nanos" if t == "timestamp[ns]" else ("long" if t == "int64" else "micros")
        _TS_LAYOUT_CACHE[key] = got
    return got


def read_event_stream(
    spark: SparkSession,
    events_dir: str,
    ts_is_nanos: bool | None = None,
    boundary_invariant: bool = False,
) -> DataFrame:
    """File-source stream over a directory of event parquet files.

    The streaming file source requires a directory (new files arriving
    = new micro-batches). The ts physical layout is auto-detected from
    the parquet footer (see ts_layout); ``ts_is_nanos`` forces it.
    ``boundary_invariant`` is forwarded to stream_trigger_options.
    """
    if ts_is_nanos is None:
        nanos = ts_layout(events_dir) in ("nanos", "long")
    else:
        nanos = ts_is_nanos
    schema = EVENT_SCHEMA
    if nanos:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    else:
        # TIMESTAMP(MICROS) with isAdjustedToUTC=false -> TIMESTAMP_NTZ;
        # matching the file's own type avoids any tz reinterpretation
        schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.TimestampNTZType())
                for f in EVENT_SCHEMA.fields
            ]
        )
    raw = (
        spark.readStream.schema(schema)
        .options(**stream_trigger_options(boundary_invariant))
        .parquet(events_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        # watermarks require TIMESTAMP (not NTZ); the session tz is
        # UTC, so the cast preserves the wall-clock values the batch
        # twins (load_table reads NTZ) group and format by
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def hourly_counts(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Tumbling 1h windows per event_type with late-data watermark —
    the streaming twin of q15_events_hourly."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def user_running_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running (count, sum) via
    applyInPandasWithState — the pattern for operators Structured
    Streaming lacks natively (reference has no analog; SURVEY M5)."""

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf["value"].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def session_stats(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Gap-based session windows per user — the streaming twin of the
    batch q18 sessionization, using Spark's native session_window
    (dynamic-gap merging state, closed and emitted once the watermark
    passes session_end + gap). One row per closed session."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def dedup_stream(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Streaming exact dedup on event_id: dropDuplicatesWithinWatermark
    keeps per-key state only until the watermark passes, so state is
    bounded by (arrival rate x watermark window) instead of growing
    with the whole stream — the streaming twin of d01's batch dedup
    and the ingest-side guard a training pipeline runs first."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ns", T.LongType()),
        T.StructField("last_ns", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)

_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)


_OWNER_STATE = T.StructType([T.StructField("mins", T.BinaryType())])

_OWNER_OUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("dup_cand", T.LongType()),
    ]
)


def shingle_first_owner(
    shingled: DataFrame, horizon_s: int | None = None
) -> DataFrame:
    """Custom stateful operator for STREAMING INCREMENTAL DEDUP: input
    is a stream of (bkt, sh, doc_id) blocking rows; state is keyed by
    the hash BUCKET and holds a compact {shingle -> min doc_id ever
    seen} map, and every arriving doc with an earlier sharer of one
    of its spans (a previous batch via state, or a smaller id in the
    same batch) emits one (doc_id, dup_cand) candidate row per span.

    Bucketed state, not per-shingle state: applyInPandasWithState
    pays a Python/pandas round-trip PER GROUP PER BATCH, so keying
    groups by the raw shingle melts the batch into ~|batch shingles|
    one-row frames (measured 120 s for the 4-batch sf0.01 replay);
    64 hash buckets amortize that to a handful of map updates per
    batch while the per-shingle min semantics are unchanged. The
    candidate lookup is the state store itself — no join against the
    existing corpus ever runs, which is what makes ingest-time dedup
    O(batch) at 100 TB (the batch twin d12 joins incoming x existing
    every run). Scale dials: bucket count tracks the shuffle
    partition count (each bucket's map must fit an executor), and
    ``horizon_s`` is the EVENT-TIME TTL that bounds the store at the
    dedup horizon instead of the corpus (VERDICT r6 item 4).

    With ``horizon_s`` set, the input must carry a watermarked ``ts``
    column. Each state entry remembers the LAST event time its span
    was seen; entries whose last-seen falls ``horizon_s`` behind the
    watermark are pruned — both lazily (before each bucket's update)
    and eagerly via an event-time GroupState timeout, so a bucket
    that stops receiving data still clears (state.remove() when the
    map empties). Semantics: a duplicate of a span whose every prior
    sighting is beyond the horizon is NOT flagged — the arriving doc
    becomes the span's new owner — while in-horizon dedup is exactly
    the untimed operator. The finite replay (st11) passes no horizon.
    """
    import pickle

    horizon_ms = None if horizon_s is None else int(horizon_s) * 1000

    def prune(mins: dict[str, tuple[int, int]], wm: int) -> dict[str, tuple[int, int]]:
        if horizon_ms is None or wm <= 0:
            return mins
        return {sh: v for sh, v in mins.items() if v[1] + horizon_ms > wm}

    def arm_timeout(state: GroupState, mins: dict[str, tuple[int, int]]) -> None:
        if horizon_ms is None or not mins:
            return
        wm = state.getCurrentWatermarkMs()
        # setTimeoutTimestamp must land strictly past the watermark
        state.setTimeoutTimestamp(
            max(max(v[1] for v in mins.values()) + horizon_ms, wm + 1)
        )

    def update(
        key: tuple[Any, ...],
        batches: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # state value: {shingle -> (min doc_id in horizon, last-seen ms)}
        mins: dict[str, tuple[int, int]] = (
            pickle.loads(state.get[0]) if state.exists else {}
        )
        if state.hasTimedOut:
            mins = prune(mins, state.getCurrentWatermarkMs())
            if mins:
                state.update((pickle.dumps(mins, protocol=4),))
                arm_timeout(state, mins)
            else:
                state.remove()
            return
        mins = prune(
            mins, state.getCurrentWatermarkMs() if horizon_ms is not None else 0
        )
        pdf = pd.concat(list(batches), ignore_index=True)
        ms_max = None
        if horizon_ms is not None:
            pdf["_ms"] = (
                pdf["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000
            )
            ms_max = pdf.groupby("sh")["_ms"].max()
        # Vectorized group scan (r15): `for sh, grp in pdf.groupby("sh")`
        # materializes a sub-DataFrame per group — ~30 us x |distinct
        # spans|, the dominant per-batch cost of the whole operator
        # (3.8 s over the sf0.1 replay). Sort the deduped (sh, doc_id)
        # pairs once and walk group boundaries over plain numpy
        # arrays instead; per-group logic (min-merge with the state
        # entry, candidate emission) is unchanged and emission order
        # — sh-sorted groups, id-sorted within — is identical.
        import numpy as np

        sub = pdf[["sh", "doc_id"]].drop_duplicates()
        sub = sub.sort_values(["sh", "doc_id"], kind="mergesort")
        shv = sub["sh"].to_numpy()
        idv = sub["doc_id"].to_numpy()
        starts = np.flatnonzero(np.r_[True, shv[1:] != shv[:-1]])
        ends = np.r_[starts[1:], len(shv)]
        out_doc: list[int] = []
        out_cand: list[int] = []
        get = mins.get
        for s, e in zip(starts, ends):
            sh = shv[s]
            d0 = int(idv[s])
            entry = get(sh)
            if entry is None:
                base = d0
                prev_ms = 0
            else:
                prior = entry[0]
                if prior < d0:
                    out_doc.append(d0)
                    out_cand.append(prior)
                    base = prior
                else:
                    base = d0
                prev_ms = entry[1]
            for d in idv[s + 1 : e]:
                out_doc.append(int(d))
                out_cand.append(base)
            last_ms = int(ms_max[sh]) if ms_max is not None else 0
            mins[sh] = (base, max(last_ms, prev_ms))
        state.update((pickle.dumps(mins, protocol=4),))
        arm_timeout(state, mins)
        if out_doc:
            yield pd.DataFrame({"doc_id": out_doc, "dup_cand": out_cand})

    return shingled.groupBy("bkt").applyInPandasWithState(
        update,
        outputStructType=_OWNER_OUT,
        stateStructType=_OWNER_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if horizon_ms is None
            else GroupStateTimeout.EventTimeTimeout
        ),
    )


def custom_sessionize(
    events: DataFrame, gap_s: int = 1800, watermark: str = "2 hours"
) -> DataFrame:
    """Custom stateful sessionization via applyInPandasWithState with
    an EVENT-TIME timeout — the (b)-tier custom-operator pattern for
    semantics Structured Streaming lacks natively (session_window
    covers plain gaps; this skeleton is where richer per-session
    logic — token budgets, early triggers, session-local dedup —
    plugs in).

    State per user = (open-session start, last event ts, count).
    Sessions close either by an in-batch gap or by the watermark
    passing last_ts + gap (timeout fires, session emitted, state
    cleared) — so state is bounded by active users, not history.

    Assumes per-key event-time-ordered arrival ACROSS micro-batches
    (time-ordered log replay); events are sorted within each batch,
    but a cross-batch late arrival merges into the open session
    without re-splitting. Full late-data re-sessionization would
    buffer events in state until the watermark — use the native
    session_window (session_stats) when that guarantee matters.
    """
    gap_ns = gap_s * 1_000_000_000

    def update(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((start, last, n))
            state.remove()
        else:
            start, last, n = state.get if state.exists else (None, 0, 0)
            ts_all = []
            for pdf in pdfs:
                # normalize to int64 NANOSECONDS regardless of the
                # Arrow-delivered pandas precision (datetime64[us] under
                # pandas 2 / micros parquet; [ns] under the nanos layout)
                ts_all.append(pdf["ts"].astype("datetime64[ns]").astype("int64"))
            if ts_all:
                for ts in pd.concat(ts_all).sort_values():
                    ts = int(ts)
                    if start is None:
                        start, last, n = ts, ts, 1
                    elif ts - last > gap_ns:
                        closed.append((start, last, n))
                        start, last, n = ts, ts, 1
                    else:
                        last, n = max(last, ts), n + 1
            if start is not None:
                state.update((start, last, n))
                # close the open session once the event-time watermark
                # passes last + gap (ms granularity; never <= watermark)
                desired_ms = (last + gap_ns) // 1_000_000 + 1
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(desired_ms, wm + 1))
        if not closed:
            return
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "session_start": [pd.Timestamp(s) for s, _, _ in closed],
                "session_end": [pd.Timestamp(e) for _, e, _ in closed],
                "n_events": [c for _, _, c in closed],
            }
        )

    return (
        events.withWatermark("ts", watermark)
        .select("user_id", "ts")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def run_to_memory(
    df: DataFrame, query_name: str, output_mode: str = "append",
    shuffle_partitions: int | None = 8,
) -> None:
    """Drain the stream into an in-memory table with availableNow
    (deterministic catch-up run; used by tests and local validation).

    ``shuffle_partitions`` bounds state-store parallelism for the
    replay: a stateful streaming query creates one state store (RocksDB
    or HDFS-backed files + maintenance thread) PER shuffle partition
    PER stateful operator, and the partition count is frozen into the
    checkpoint. The batch default (32 here) is sized for table scans,
    not for a finite replay's state volume — 8 stores cut per-batch
    state overhead ~4x. On a production cluster size this to peak key
    cardinality / executor count, NOT to the batch shuffle setting,
    and keep it stable for the checkpoint's lifetime."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if shuffle_partitions is not None:
        # the value is captured when the streaming query plans its first
        # batch; restored after termination so batch queries are untouched
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    try:
        q = (
            df.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)

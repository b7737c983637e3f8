"""Streaming queries exposed through the batch `queries()` contract.

The streaming surface (streaming/pipeline.py) normally runs as a
long-lived job; these bridge entries replay the driver's events
parquet through the REAL streaming plan (file source → watermarked
window agg → sink) with an availableNow trigger, then return the sink
table as a DataFrame — so the driver's oracle check covers the
streaming path, not just its batch twin (q15).

Determinism: the driver ships events as ONE parquet file; the
streaming file source requires a directory, so a source-view dir
holding a SYMLINK to the file (no data copied through the driver —
the local analog of pointing the stream at the ingest directory
itself) gives a single-file source read in place.
With availableNow every available file is processed before
termination, and `complete` output mode emits every window regardless
of where the final watermark lands — append mode would hold back the
last `watermark` hours of windows forever on a finite replay.
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.pipeline import (
    hourly_counts,
    read_event_stream,
    run_to_memory,
    stream_trigger_options,
)
from .registry import register


# Staged-source cache (VERDICT r04 item 4): the staging content is a
# pure function of (kind, sf_dir, params) — symlinks, sentinel files,
# split files — so one staging dir per key serves every st-entry and
# every repeat run in the process. Concurrent readers are safe (each
# stream keeps its own checkpoint/state); only the source dir is
# shared. Keyed on the ABSOLUTE sf_dir so relative/absolute spellings
# hit the same entry.
_STAGE_CACHE: dict[tuple, str] = {}


def _tmpdir(prefix: str) -> str:
    """mkdtemp that cleans itself up at interpreter exit — the sink/
    checkpoint dirs are per-invocation (a bench run leaks three per
    rep otherwise; the q69 leak VERDICT r8 flagged, fixed fleet-wide
    here). Staged-source dirs use it too: the cache only lives as
    long as the process anyway."""
    d = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    return d


def _stage_cached(key: tuple, build) -> str:
    d = _STAGE_CACHE.get(key)
    if d is not None and os.path.isdir(d):
        return d
    d = build()
    _STAGE_CACHE[key] = d
    return d


def _link_parquet(src: str, dst_dir: str) -> list[str]:
    """Symlink a parquet table into dst_dir as flat NNNN.parquet
    entries and return the link paths in name order. Handles both the
    driver's single-file layout (table.parquet IS a file) and a
    directory of part files (the multi-file bench layout) — the
    streaming file source and the footer probes both need plain
    files, never a symlink to a directory."""
    src = os.path.abspath(src)
    if os.path.isdir(src):
        parts = sorted(f for f in os.listdir(src) if f.endswith(".parquet"))
        out = []
        for i, f in enumerate(parts):
            link = os.path.join(dst_dir, f"{i:04d}.parquet")
            os.symlink(os.path.join(src, f), link)
            out.append(link)
        return out
    link = os.path.join(dst_dir, "0000.parquet")
    os.symlink(src, link)
    return [link]


def _stage_events(sf_dir: str) -> str:
    """Source-view directory for the events stream: a symlink to the
    source parquet, read in place (the file source needs a directory
    and ``sf_dir`` mixes every table's files, so an isolating view dir
    stands in for a dedicated ingest directory). O(1) metadata op —
    the data itself never moves through the driver. Cached per
    sf_dir."""

    def build() -> str:
        d = _tmpdir("tinysql_stream_")
        # abspath: a relative sf_dir would otherwise resolve relative to
        # the tmp dir (symlink targets resolve at READ time, against the
        # link's own directory) and every stream would 404
        _link_parquet(os.path.join(sf_dir, "events.parquet"), d)
        return d

    return _stage_cached(("plain", os.path.abspath(sf_dir)), build)


@register(
    "st01_stream_hourly",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Streaming tumbling-window hourly aggregation (watermarked "
    "window() + event-time grouping), drained via availableNow into a "
    "memory sink and returned as a batch DataFrame. Same oracle as "
    "q15: a finite replay of the stream must agree exactly with the "
    "batch computation over the same events.",
)
def st01_stream_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, _stage_events(sf_dir))
    name = "st01_hourly_" + uuid.uuid4().hex[:8]
    run_to_memory(hourly_counts(stream), name, output_mode="complete")
    return spark.table(name).select(
        F.date_format("window_start", "yyyy-MM-dd HH:00").alias("hour_bucket"),
        "event_type",
        "n_events",
        F.round("sum_value", 2).alias("sum_value"),
    )


@register(
    "st02_stream_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    """,
    doc="Streaming stateful dedup drained through the batch contract: "
    "dropDuplicatesWithinWatermark keys state on (user_id, event_type) "
    "and emits each key's first arrival; projecting the key columns "
    "makes the finite replay exactly DISTINCT over the same events. "
    "Bounded state via watermark eviction is what keeps this runnable "
    "on an unbounded stream.",
)
def st02_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, _stage_events(sf_dir))
    dedup = (
        stream.withWatermark("ts", "2 hours")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    name = "st02_dedup_" + uuid.uuid4().hex[:8]
    run_to_memory(dedup, name, output_mode="append")
    return spark.table(name)


@register(
    "st03_stream_join",
    late=True,
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
           round(p.value, 2) AS purchase_value
    FROM events v JOIN events p
      ON v.user_id = p.user_id
     AND v.event_type = 'view' AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    """,
    doc="Stream-stream interval join (view -> purchase attribution "
    "within 30 min, keyed on user): both sides watermarked, the "
    "event-time range condition bounds join state so either side's "
    "buffer evicts once the watermark passes ts + 30 min — the "
    "property that keeps an unbounded-stream join in bounded memory. "
    "Finite replay through availableNow must emit exactly the batch "
    "interval-join answer (the oracle). Spark plans this as "
    "StreamingSymmetricHashJoin keyed on user_id; at 100 TB state is "
    "hash-partitioned by key across executors.",
)
def st03_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    views = (
        read_event_stream(spark, _stage_events(sf_dir))
        .filter(F.col("event_type") == "view")
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        read_event_stream(spark, _stage_events(sf_dir))
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            "v_user = user_id AND p_ts >= view_ts "
            "AND p_ts <= view_ts + INTERVAL 30 MINUTES"
        ),
    ).select(
        "view_id", "purchase_id", "user_id", F.round("p_value", 2).alias("purchase_value")
    )
    name = "st03_join_" + uuid.uuid4().hex[:8]
    run_to_memory(joined, name, output_mode="append")
    return spark.table(name)


def _stage_events_with_sentinels(sf_dir: str, n_sentinels: int = 2) -> str:
    """Stage events plus two far-future watermark-sentinel files with
    strictly increasing mtimes. Append-mode sinks only emit a window
    after the watermark passes its end, and the watermark used by
    micro-batch N is computed from batch N-1 — so a finite replay
    needs two extra batches beyond the data to flush every real
    window: sentinel 1 advances event-time past all 2024 data,
    sentinel 2 triggers a batch that PLANS with that advanced
    watermark and emits the held windows."""
    import time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..streaming.pipeline import ts_layout

    if not 1 <= n_sentinels <= 28:
        raise ValueError(f"n_sentinels must be in [1, 28], got {n_sentinels}")

    def build() -> str:
        # own dir, NOT the plain _stage_events cache entry — adding
        # sentinel files to the shared plain dir would corrupt every
        # st-entry that expects sentinel-free input
        d = _tmpdir("tinysql_stream_wm_")
        links = _link_parquet(os.path.join(sf_dir, "events.parquet"), d)
        layout = ts_layout(links[0])
        base = max(os.path.getmtime(ln) for ln in links)
        isos = tuple(f"2030-01-{k:02d}T00:00:00" for k in range(1, n_sentinels + 1))
        for i, iso in enumerate(isos, start=1):
            sec = int(time.mktime(time.strptime(iso, "%Y-%m-%dT%H:%M:%S")))
            # the sentinel file must share the source's ts physical layout
            # or the fixed-schema stream read breaks on the mixed directory
            if layout == "micros":
                ts_arr = pa.array([sec * 10**6], pa.timestamp("us"))
            elif layout == "nanos":
                ts_arr = pa.array([sec * 10**9], pa.timestamp("ns"))
            else:
                ts_arr = pa.array([sec * 10**9], pa.int64())
            tbl = pa.table(
                {
                    "event_id": pa.array([-i], pa.int64()),
                    "ts": ts_arr,
                    "user_id": pa.array([-1], pa.int64()),
                    "event_type": pa.array(["__wm__"], pa.string()),
                    "value": pa.array([0.0], pa.float64()),
                    "props": pa.array(["{}"], pa.string()),
                }
            )
            # wm_ prefix: cannot collide with _link_parquet's NNNN
            # names when the source is a multi-file directory
            path = os.path.join(d, f"wm_{i:04d}.parquet")
            pq.write_table(tbl, path)
            os.utime(path, (base + i, base + i))
        return d

    return _stage_cached(
        ("sentinels", os.path.abspath(sf_dir), n_sentinels), build
    )


@register(
    "st04_stream_parquet_sink",
    late=True,
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00') AS hour_bucket,
           event_type,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Streaming hourly aggregation into a durable APPEND-mode "
    "parquet sink — the production path (st01's memory/complete sink "
    "is a test harness). Append mode emits a window only once the "
    "watermark passes window_end, so emission is driven by event-time "
    "progress: two sentinel files advance the watermark and flush "
    "every real window during the replay, exactly the discipline a "
    "24/7 pipeline relies on for exactly-once window output. Sink "
    "files + checkpoint dir are the recovery contract at 100 TB "
    "(restart resumes from the checkpoint, no reprocessing).",
)
def st04_stream_parquet_sink(spark: SparkSession, sf_dir: str) -> DataFrame:
    # boundary_invariant (r15): append-mode emission is driven by the
    # sentinels' EVENT TIMES (watermark progress) plus the engine's
    # no-data batch, not by which file lands in which micro-batch —
    # output pinned identical under files:1 and bytes triggers.
    stream = read_event_stream(
        spark, _stage_events_with_sentinels(sf_dir), boundary_invariant=True
    )
    out_dir = _tmpdir("tinysql_st04_out_")
    ck_dir = _tmpdir("tinysql_st04_ck_")
    agg = hourly_counts(stream)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return (
        spark.read.parquet(out_dir)
        .filter(F.col("event_type") != "__wm__")
        .select(
            F.date_format("window_start", "yyyy-MM-dd HH:00").alias("hour_bucket"),
            "event_type",
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )


@register(
    "st05_stream_static_join",
    late=True,
    oracle="""
    SELECT n_name, count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    GROUP BY n_name
    """,
    doc="Stream-static enrichment: the events stream joins two BATCH "
    "dimension tables (customer -> nation) before a stateful "
    "aggregation — the standard production enrichment topology. The "
    "static side is planned per micro-batch (a broadcast of the "
    "dimensions, no stream state for the join; only the final "
    "count/sum aggregation keeps state), so dimension updates are "
    "picked up between batches — the property a 24/7 enrichment "
    "pipeline relies on. Complete-mode memory sink on finite replay "
    "must equal the batch 3-way join oracle exactly.",
)
def st05_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    stream = read_event_stream(spark, _stage_events(sf_dir))
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    enriched = (
        stream.join(cust, stream["user_id"] == cust["c_custkey"])
        .join(nation, cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )
    name = "st05_enrich_" + uuid.uuid4().hex[:8]
    run_to_memory(enriched, name, output_mode="complete")
    return spark.table(name)


def _stage_events_split(sf_dir: str, n: int = 3) -> str:
    """Stage events as n parquet slices with strictly increasing
    mtimes, so maxFilesPerTrigger=1 replays them as n micro-batches —
    the multi-batch arrival pattern an upsert sink exists for."""
    import pyarrow.parquet as pq

    def build() -> str:
        d = _tmpdir("tinysql_st06_")
        tbl = pq.read_table(os.path.join(sf_dir, "events.parquet"))
        step = (tbl.num_rows + n - 1) // n
        base = None
        for i in range(n):
            path = os.path.join(d, f"{i:04d}.parquet")
            pq.write_table(tbl.slice(i * step, step), path)
            if base is None:
                base = os.path.getmtime(path)
            os.utime(path, (base + i, base + i))
        return d

    return _stage_cached(("split", os.path.abspath(sf_dir), n), build)


def _upsert_latest(base: str) -> str | None:
    ptr = os.path.join(base, "_LATEST")
    if os.path.exists(ptr):
        with open(ptr) as f:
            return f.read().strip() or None
    return None


def merge_upsert_batch(
    spark: SparkSession, batch: DataFrame, batch_id: int, base: str
) -> None:
    """Merge ONE micro-batch into the keyed table at ``base``; the
    foreachBatch body of run_stream_upsert, exposed for crash-replay
    testing. Idempotent under batch replay: re-merging the same rows
    through max_by changes nothing, and the attempt-unique version dir
    guarantees the write target is never the read source."""
    keys = ["user_id", "event_type"]
    ptr = os.path.join(base, "_LATEST")
    # within-batch winners first: the shuffle runs on the batch,
    # not the table
    w = batch.groupBy(*keys).agg(
        F.max_by("value", "event_id").alias("last_value"),
        F.max("event_id").alias("last_event_id"),
    )
    cur = _upsert_latest(base)
    if cur is not None:
        existing = spark.read.parquet(cur)
        w = (
            existing.unionByName(w)
            .groupBy(*keys)
            .agg(
                F.max_by("last_value", "last_event_id").alias("last_value"),
                F.max("last_event_id").alias("last_event_id"),
            )
        )
    # attempt-unique: a replayed batch_id gets a fresh dir, so the
    # write can never clobber the committed version it reads from
    new_dir = os.path.join(base, f"v{batch_id}_{uuid.uuid4().hex[:8]}")
    w.write.mode("overwrite").parquet(new_dir)
    tmp = ptr + ".tmp"
    with open(tmp, "w") as f:
        f.write(new_dir)
    os.replace(tmp, ptr)  # atomic table-version commit


def run_stream_upsert(spark: SparkSession, src: str, ck: str, base: str) -> int:
    """One upsert run over whatever files are currently in ``src``;
    returns the number of micro-batches processed THIS run.

    Restart contract: the merge base is the durable ``_LATEST``
    pointer in ``base`` (committed by atomic rename after each batch's
    table version lands), NOT driver memory — a restarted query reads
    the last committed table and the checkpoint skips already-
    processed files. If a crash lands between the table commit and
    the checkpoint commit, the replayed batch re-merges the same rows:
    max_by over a union with itself is idempotent, so at-least-once
    batch replay still yields exactly-once table state. Each ATTEMPT
    writes a unique ``v{batch_id}_{uuid}`` dir — a replayed batch must
    never overwrite the version it lazily reads as its merge base
    (same-path overwrite either errors or destroys the only table
    copy before the scan runs)."""
    state = {"batches": 0}

    def upsert(batch: DataFrame, batch_id: int) -> None:
        state["batches"] += 1
        merge_upsert_batch(spark, batch, batch_id, base)

    stream = read_event_stream(spark, src).select(
        "event_id", "user_id", "event_type", "value"
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ck)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return state["batches"]


def stream_upsert(spark: SparkSession, sf_dir: str):
    """foreachBatch MERGE-style upsert; returns (final DataFrame,
    number of micro-batches run). See st06 registration for semantics."""
    src = _stage_events_split(sf_dir)
    base = _tmpdir("tinysql_st06_tbl_")
    ck = _tmpdir("tinysql_st06_ck_")
    n = run_stream_upsert(spark, src, ck, base)
    return spark.read.parquet(_upsert_latest(base)), n


@register(
    "st06_stream_upsert",
    late=True,
    oracle="""
    SELECT user_id, event_type,
           arg_max(value, event_id) AS last_value,
           CAST(max(event_id) AS BIGINT) AS last_event_id
    FROM events
    GROUP BY user_id, event_type
    """,
    doc="Streaming UPSERT sink (the streaming REPLACE analog):"
    " foreachBatch merges each micro-batch into a keyed warehouse "
    "table — per-batch winners (max_by over the unique event_id) "
    "union the existing table, re-keyed, written to a versioned dir "
    "and swapped, so every batch commit is atomic and restart resumes "
    "from the checkpoint. Last-writer-wins is keyed on event_id "
    "(total order), making the result batch-order independent: the "
    "finite replay across 3 micro-batches must equal the batch "
    "arg_max oracle exactly. This is the production pattern for "
    "continuously-updated dimension/feature tables where append (st04)"
    " is wrong because keys mutate. The per-batch merge cost is "
    "O(table + batch) — at 100 TB the real sink is a storage format "
    "with keyed merge (Delta/Iceberg MERGE INTO or a partition-scoped "
    "rewrite); the foreachBatch contract is identical.",
)
def st06_stream_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_upsert(spark, sf_dir)[0]


@register(
    "st07_stream_sessions",
    late=True,
    oracle="""
    WITH x AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                       OR date_diff('microsecond',
                            lag(ts) OVER (PARTITION BY user_id ORDER BY ts), ts)
                          >= 1800000000
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), s AS (
      SELECT user_id, ts, value,
             sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM x
    )
    SELECT user_id,
           strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           strftime(max(ts) + INTERVAL 30 MINUTE, '%Y-%m-%d %H:%M:%S') AS session_end,
           count(*) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM s
    GROUP BY user_id, sid
    """,
    doc="Streaming SESSION WINDOWS through the batch contract: Spark's "
    "native session_window (dynamic gap-merging state per user, 30-min "
    "inactivity gap) in APPEND mode — a session row emits exactly once, "
    "when the watermark passes session_end, which is the production "
    "semantics for sessionized training features. Two watermark "
    "sentinels flush the tail (append emission is event-time driven; "
    "st04's discipline). session_window merges an event iff it arrives "
    "strictly within gap of the session end, so the oracle's break "
    "condition is diff >= gap — the lag/cumsum SQL twin of q18 "
    "extended to full session rows (start, end=last+gap, count, sum). "
    "State is per-user and watermark-evicted: bounded by active users "
    "x gap, not history — the 100 TB property.",
)
def st07_stream_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import session_stats

    # boundary_invariant (r15): session emission is watermark-driven —
    # the sentinels' EVENT TIMES plus the engine's no-data batch flush
    # every closed session regardless of which file lands in which
    # micro-batch (st04's argument; identity under both triggers is
    # pinned in tests/test_streaming.py).
    stream = read_event_stream(
        spark, _stage_events_with_sentinels(sf_dir), boundary_invariant=True
    )
    sess = session_stats(stream, gap="30 minutes", watermark="2 hours")
    name = "st07_sessions_" + uuid.uuid4().hex[:8]
    run_to_memory(sess, name, output_mode="append")
    return (
        spark.table(name)
        .filter(F.col("user_id") >= 0)  # drop the watermark-sentinel rows
        .select(
            "user_id",
            F.date_format("session_start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("session_end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "n_events",
            F.round("sum_value", 2).alias("sum_value"),
        )
    )


@register(
    "st08_stream_left_join",
    late=True,
    oracle="""
    SELECT v.event_id AS view_id, p.event_id AS purchase_id,
           v.user_id,
           round(p.value, 2) AS purchase_value
    FROM events v LEFT JOIN events p
      ON v.user_id = p.user_id AND p.event_type = 'purchase'
     AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 30 MINUTE
    WHERE v.event_type = 'view'
    """,
    doc="Stream-stream LEFT OUTER interval join — st03's attribution "
    "with the semantics a funnel report actually needs: every view "
    "emits, unmatched ones with NULL purchase columns. The outer side "
    "cannot emit a null row until the state store is CERTAIN no match "
    "can still arrive, i.e. when the watermark passes view_ts + 30 "
    "min + delay — so null emission is watermark-DRIVEN, and the "
    "finite replay stages two far-future sentinel files (st04's "
    "discipline) to flush the held unmatched views. Sentinels carry "
    "event_type '__wm__' and are filtered from both sides — they "
    "advance event time, never the data. State is bounded exactly as "
    "st03 (range-condition eviction), hash-partitioned by user key; "
    "the oracle is the batch LEFT JOIN over the same events.",
)
def st08_stream_left_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = _stage_events_with_sentinels(sf_dir, n_sentinels=2)
    # Watermarks advance only from rows that REACH the
    # EventTimeWatermark operator, and Catalyst pushes deterministic
    # filters BELOW it — so a filter that excludes the '__wm__'
    # sentinels pins the global watermark (min over both sides) at
    # the data's tail and holds every unmatched view's null row
    # forever. The sentinels therefore PASS both side filters (they
    # carry user_id -1 and event_id < 0, so they never join real
    # rows) and are stripped from the drained batch result below.
    # boundary_invariant (r15): null-row emission is watermark-driven
    # (sentinel event times + the no-data batch), not file-count-driven
    # — st04's argument; identity under both triggers pinned in tests.
    views = (
        read_event_stream(spark, src, boundary_invariant=True)
        .filter(F.col("event_type").isin("view", "__wm__"))
        .select(
            F.col("event_id").alias("view_id"),
            F.col("user_id").alias("v_user"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", "1 hour")
    )
    purchases = (
        read_event_stream(spark, src, boundary_invariant=True)
        .filter(F.col("event_type").isin("purchase", "__wm__"))
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = views.join(
        purchases,
        F.expr(
            "v_user = user_id AND p_ts >= view_ts "
            "AND p_ts <= view_ts + INTERVAL 30 MINUTES"
        ),
        "leftOuter",
    ).select(
        "view_id",
        "purchase_id",
        F.col("v_user").alias("user_id"),
        F.round("p_value", 2).alias("purchase_value"),
    )
    name = "st08_leftjoin_" + uuid.uuid4().hex[:8]
    run_to_memory(joined, name, output_mode="append")
    # strip the watermark scaffolding (sentinel views join sentinel
    # purchases at the same instant; both carry negative ids)
    return spark.table(name).filter(F.col("view_id") >= 0)


def _stage_embeddings(sf_dir: str) -> str:
    """Symlink source-view dir for the embeddings stream (same O(1)
    staging discipline as _stage_events), cached per sf_dir."""

    def build() -> str:
        d = _tmpdir("tinysql_stream_emb_")
        _link_parquet(os.path.join(sf_dir, "embeddings.parquet"), d)
        return d

    return _stage_cached(("embeddings", os.path.abspath(sf_dir)), build)


@register(
    "st09_stream_index_build",
    late=True,
    oracle=None,  # centroid literals — rows-only; exactness vs the batch
    # assignment is asserted in tests/test_streaming.py
    doc="STREAMING ANN index build: embedding vectors arrive as a "
    "stream, each micro-batch is assigned to its nearest k-means "
    "centroid (the same Arrow-batched matmul the batch IVF path "
    "uses) and appended to a partitioned inverted-list parquet "
    "index via foreachBatch — the incremental index-maintenance "
    "path a 24/7 ingest runs so ANN search never needs a full "
    "rebuild. Centroids are batch-trained once (capped sample) and "
    "broadcast into the UDF closure; a batch's append is atomic at "
    "the file level and replay-safe at the vec_id level (re-derived "
    "rows are identical, dedup on read). Returns the inverted-list "
    "manifest (cid, n_vectors) — identical to what the batch "
    "assignment produces over the same corpus (asserted exactly in "
    "the test).",
)
def st09_stream_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .similarity import _make_nearest_centroids, _trained_centroids

    nearest = _make_nearest_centroids(1, _trained_centroids(spark, sf_dir))
    stream = (
        spark.readStream.schema("vec_id long, embedding array<float>, label int")
        .options(**stream_trigger_options())
        .parquet(_stage_embeddings(sf_dir))
    )
    index_dir = _tmpdir("tinysql_st09_index_")
    ck_dir = _tmpdir("tinysql_st09_ck_")

    def merge(batch: DataFrame, _bid: int) -> None:
        (
            batch.select(
                F.element_at(nearest(F.col("embedding")), 1).alias("cid"),
                "vec_id",
            )
            .write.mode("append")
            .partitionBy("cid")
            .parquet(index_dir)
        )

    q = (
        stream.writeStream.foreachBatch(merge)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # manifest over the built index: the partitioned layout IS the
    # inverted list — a probe for centroid c reads only cid=c files
    return (
        spark.read.parquet(index_dir)
        .dropDuplicates(["vec_id"])  # replay-safe read
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n_vectors"))
    )


_ST10_VALUE_CAP = 150.0


def _st10_split_batch(batch: DataFrame, clean_dir: str, quar_dir: str) -> None:
    """One micro-batch through the gate: passing rows append to the
    clean sink, everything else to quarantine. NULL routing (ADVICE
    r5): for a NULL value both `gate` and `~gate` are NULL — a bare
    `~gate` filter would drop the row from BOTH sinks, silently.
    Invalid/NULL rows are exactly what the dead-letter store exists
    for: the coalesce sends them to quarantine. persist: the batch
    feeds two sinks — without the barrier the source batch would be
    recomputed per write."""
    gate = F.col("value") <= _ST10_VALUE_CAP
    batch = batch.persist()
    batch.filter(gate).write.mode("append").parquet(clean_dir)
    batch.filter(~F.coalesce(gate, F.lit(False))).write.mode("append").parquet(
        quar_dir
    )
    batch.unpersist()


@register(
    "st10_stream_quality_gate",
    late=True,
    oracle=f"""
    SELECT event_type,
           count(*) AS n_quarantined,
           round(min(value), 2) AS min_v,
           round(max(value), 2) AS max_v
    FROM events
    WHERE value > {_ST10_VALUE_CAP} OR value IS NULL
    GROUP BY event_type
    """,
    doc="Streaming QUALITY GATE with a dead-letter split — the "
    "validate-at-ingest topology every production pipeline runs: "
    "each micro-batch is split by the gate predicate (value within "
    "bounds), passing rows land in the clean sink and violations in "
    "a quarantine sink, BOTH as parquet appends inside one "
    "foreachBatch (no row is dropped silently — the dead-letter "
    "store is what makes data bugs debuggable a week later; NULL/"
    "invalid values fail the gate NULL-safely and land in quarantine, "
    "never in neither sink). The "
    "returned quarantine summary must equal the batch computation "
    "of the same gate over the same events — the oracle. The gate "
    "is pure Column algebra evaluated once per batch; both writes "
    "are appends, so the pattern holds at any ingest rate.",
)
def st10_stream_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    stream = read_event_stream(spark, _stage_events(sf_dir))
    clean_dir = _tmpdir("tinysql_st10_clean_")
    quar_dir = _tmpdir("tinysql_st10_quar_")
    ck_dir = _tmpdir("tinysql_st10_ck_")

    q = (
        stream.writeStream.foreachBatch(
            lambda batch, _bid: _st10_split_batch(batch, clean_dir, quar_dir)
        )
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(quar_dir)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_quarantined"),
            F.round(F.min("value"), 2).alias("min_v"),
            F.round(F.max("value"), 2).alias("max_v"),
        )
    )


def _stage_documents_split(sf_dir: str, n: int = 4) -> str:
    """Stage documents as n parquet slices with strictly increasing
    mtimes (maxFilesPerTrigger=1 replays them as n ingest batches in
    doc_id order — the driver file is doc_id-sorted, so arrival order
    equals id order and 'earlier doc' is well-defined)."""
    import pyarrow.parquet as pq

    def build() -> str:
        d = _tmpdir("tinysql_st11_")
        tbl = pq.read_table(os.path.join(sf_dir, "documents.parquet"))
        step = (tbl.num_rows + n - 1) // n
        base = None
        for i in range(n):
            path = os.path.join(d, f"{i:04d}.parquet")
            pq.write_table(tbl.slice(i * step, step), path)
            if base is None:
                base = os.path.getmtime(path)
            os.utime(path, (base + i, base + i))
        return d

    return _stage_cached(("docsplit", os.path.abspath(sf_dir), n), build)


# st11 blocking: 8-token spans (d10's exact-substring unit — selective
# WITHOUT corpus-wide DF stats, which an incremental stream cannot
# have: d09's stop-shingle cap needs the full corpus' document
# frequencies, but a long verbatim span is rare by construction).
# 50% deterministic sample: md5 is bit-identical in Spark and DuckDB,
# so both engines block on the SAME span subset.
_ST11_W = 8
_ST11_HEX = tuple("01234567")
_ST11_BUCKETS = 64


@register(
    "st11_stream_incremental_dedup",
    late=True,
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ), g AS (
      SELECT doc_id, unnest(list_distinct(list_transform(
               generate_series(1, greatest(len(ws) - {_ST11_W - 1}, 1)),
               i -> array_to_string(ws[i:i+{_ST11_W - 1}], ' ')))) AS sh
      FROM w
    ), k AS (
      SELECT doc_id, sh FROM g
      WHERE substring(md5(sh), 1, 1) IN {str(tuple("01234567"))}
    ), own AS (
      SELECT a.doc_id, min(b.doc_id) AS dup_of
      FROM k a JOIN k b ON a.sh = b.sh AND b.doc_id < a.doc_id
      GROUP BY a.doc_id
    )
    SELECT d.doc_id, o.dup_of
    FROM documents d LEFT JOIN own o ON d.doc_id = o.doc_id
    """,
    doc="STREAMING INCREMENTAL DEDUP — the ingest-time twin of the "
    "batch d12: documents arrive as 4 ordered micro-batches, each "
    "doc's distinct 8-token spans (d10's exact-substring unit — "
    "selective with NO corpus-wide stats, which a stream cannot "
    "have; 50% md5-sampled so both engines block on the same "
    "subset) flow through a custom applyInPandasWithState operator "
    "whose bucketed state maps span -> MIN doc_id ever seen; a doc "
    "sharing a span with any earlier doc emits a candidate, and the "
    "sink rollup keeps the earliest owner per doc (dup_of; NULL = "
    "original; 24/500 dups at sf0.01 — the d09/d10 near-dup band). "
    "The state store IS the dedup index: per-batch cost is O(batch "
    "spans) state lookups — no join against the existing corpus, "
    "where d12's batch form joins incoming x existing every run. "
    "Cross-batch correctness rides the state (batch 3 docs dedup "
    "against batch 0 owners); the oracle is the order-free batch "
    "formulation (min earlier sharer over the same sampled spans), "
    "which the replay must reproduce EXACTLY, state handoffs "
    "included. Production dials: bucket count tracks shuffle "
    "partitions, event-time TTL bounds the store at the dedup "
    "horizon; the finite replay needs neither.",
)
def st11_stream_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from ..sources.tables import load_table
    from ..streaming.pipeline import shingle_first_owner

    src = _stage_documents_split(sf_dir)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .options(**stream_trigger_options())
        .parquet(src)
    )

    # Round-14 (guide §4.2, the p04/d09 discipline applied to the
    # stream): the per-batch span construction moved from the
    # interpreted HOF pipeline (shingles() transform/slice/concat per
    # element + JVM md5 filter — measured 2.8 s over the corpus at
    # sf0.1, ~40% of the replay) into one Arrow batch stage producing
    # the IDENTICAL sampled span strings (_py_shingles is the pinned
    # tokenizer twin; hashlib md5 hex == JVM md5 hex), so state keys
    # and results are unchanged. The bkt column stays JVM-side —
    # xxhash64 has no Python twin and it's a cheap codegen'd per-row
    # hash, not a HOF.
    def _span_batch(texts):
        import hashlib

        import pandas as pd

        from .dedup import _py_shingles

        return pd.Series(
            [
                [
                    s
                    for s in _py_shingles(t, _ST11_W)
                    if hashlib.md5(s.encode()).hexdigest()[0] in "01234567"
                ]
                for t in texts
            ]
        )

    span_udf = F.pandas_udf(
        _span_batch, T.ArrayType(T.StringType())
    ).asNondeterministic()
    blk = (
        stream.select("doc_id", F.explode(span_udf(F.col("text"))).alias("sh"))
        .withColumn(
            "bkt", F.pmod(F.xxhash64("sh"), F.lit(_ST11_BUCKETS)).cast("int")
        )
    )
    owners = shingle_first_owner(blk)
    name = "st11_dedup_" + uuid.uuid4().hex[:8]
    run_to_memory(owners, name, output_mode="append")
    own = (
        spark.table(name)
        .groupBy("doc_id")
        .agg(F.min("dup_cand").alias("dup_of"))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.join(own, "doc_id", "left").select("doc_id", "dup_of")


# --------------------------------------------------------------------------
# st12 — streaming PII scrub: t16's redaction as a STATELESS stream
# stage (the ingest-time placement a production pipeline uses)
# --------------------------------------------------------------------------


def _t16_oracle() -> str:
    from .text import _oracle_t16

    return _oracle_t16()


@register(
    "st12_stream_pii_scrub",
    late=True,
    oracle=_t16_oracle(),
    doc="Streaming PII scrub — t16's redaction operator placed where "
    "a production pipeline actually runs it: AT INGEST, before "
    "anything else touches or persists the raw text (scrubbing a "
    "100 TB corpus at rest is the expensive retrofit; scrubbing the "
    "stream is one map). The documents corpus replays as 4 ingest "
    "micro-batches (st11's staged source) and the scrub — the same "
    "deterministic doc_id-derived PII injection plus "
    "pii_scrub's regexp Column algebra — is fully STATELESS: no "
    "watermark, no state store, no shuffle, so micro-batch cost is "
    "scan + codegen only and the operator trivially scales to any "
    "ingest rate (contrast st11, whose dedup state is the hard "
    "part). Oracle: t16's batch SQL — a finite replay of a "
    "stateless map must equal the batch computation EXACTLY, "
    "per-class counts and scrubbed digest included.",
)
def st12_stream_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import _PII_PATTERNS, _pii_augment, pii_scrub

    src = _stage_documents_split(sf_dir)
    schema = spark.read.parquet(src).schema
    # boundary_invariant (r15): a stateless map's output cannot depend
    # on micro-batch boundaries; the 4-file split exists for st11's
    # incremental-state semantics, not this entry's.
    stream = (
        spark.readStream.schema(schema)
        .options(**stream_trigger_options(boundary_invariant=True))
        .parquet(src)
    )
    out = pii_scrub(_pii_augment(stream)).select(
        "doc_id",
        *[F.col(f"n_{cls}").cast("long").alias(f"n_{cls}") for cls, _p, _r in _PII_PATTERNS],
        F.md5("scrubbed").alias("scrubbed_md5"),
    )
    name = "st12_pii_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="append")
    return spark.table(name)


# --------------------------------------------------------------------------
# st13 — streaming compression gate: t20's repetition proxy at INGEST
# (the st12 placement pattern applied to the binary-cheap gate)
# --------------------------------------------------------------------------


@register(
    "st13_stream_compression_gate",
    late=True,
    oracle=None,  # zlib is not SQL-expressible; the replay-equals-
    # batch pin lives in tests (t20's twin transitively covers it).
    doc="Streaming COMPRESSION gate — t20's zlib repetition proxy "
    "placed at ingest, where a production pipeline gates before "
    "persisting raw text (the st12 placement, applied to the other "
    "cheap scan-time gate): the documents corpus replays as 4 ingest "
    "micro-batches through the IDENTICAL compression_gate transform "
    "(shared function — injection, deflate, ratio, flags), fully "
    "STATELESS: no watermark, no state store, no shuffle, micro-"
    "batch cost is scan + one Arrow pandas_udf. The test pins that "
    "the finite replay equals t20's batch output EXACTLY, row for "
    "row — a stateless map must be batch-boundary-invariant.",
)
def st13_stream_compression_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import compression_gate

    src = _stage_documents_split(sf_dir)
    schema = spark.read.parquet(src).schema
    # boundary_invariant (r15): same stateless-map argument as st12.
    stream = (
        spark.readStream.schema(schema)
        .options(**stream_trigger_options(boundary_invariant=True))
        .parquet(src)
    )
    out = compression_gate(stream)
    name = "st13_comp_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="append")
    return spark.table(name)


@register(
    "st14_stream_scd2_enrich",
    late=True,
    oracle="""
    WITH o AS (
      SELECT user_id, ts, event_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev
      FROM events
      WHERE event_type IN ('signup', 'purchase')
    ), chg AS (
      SELECT user_id, ts, event_id, event_type FROM o
      WHERE prev IS NULL OR prev <> event_type
    ), dim AS (
      SELECT user_id, event_type AS attr, ts AS valid_from,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS valid_to
      FROM chg
    )
    SELECT d.attr AS state, e.event_type,
           count(*) AS n_events,
           round(sum(e.value), 2) AS sum_value
    FROM events e JOIN dim d
      ON d.user_id = e.user_id
         AND e.ts >= d.valid_from
         AND (d.valid_to IS NULL OR e.ts < d.valid_to)
    GROUP BY 1, 2
    """,
    doc="Streaming TEMPORAL-VALIDITY enrichment — q72's as-of "
    "dimension lookup placed where a production pipeline runs it: "
    "the events stream joins the q71 SCD-2 dimension (batch-built "
    "validity intervals, the st05 stream-static topology upgraded "
    "from a point lookup to an interval match) so every arriving "
    "event reads the user state valid AT ITS OWN event time, then "
    "the (state, event_type) contingency aggregates under complete "
    "mode. The stream-static inner join is STATELESS (the static "
    "side re-plans per micro-batch — dimension updates between "
    "batches are picked up, the property a 24/7 enrichment pipeline "
    "relies on; no watermark, no join state; only the final agg "
    "keeps state), and the user_id equi-key carries the join with "
    "the interval test as residual — never an inequality join. "
    "Finite replay under complete mode must equal the batch q72 "
    "oracle exactly; shared transform (scd2_asof_enrich) makes the "
    "batch/stream pair the same code path.",
)
def st14_stream_scd2_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table
    from .temporal import scd2_asof_enrich, scd2_dimension

    dim = scd2_dimension(load_table(spark, sf_dir, "events"))
    stream = read_event_stream(spark, _stage_events(sf_dir))
    out = scd2_asof_enrich(stream, dim)
    name = "st14_scd2_" + uuid.uuid4().hex[:8]
    run_to_memory(out, name, output_mode="complete")
    return spark.table(name)


# ---------------------------------------------------------------------------
# st15 — streaming DELETES against the maintained ANN index: retraction
# requests arrive as a stream, each micro-batch appends its vec_ids to
# the tombstone set (s15's logical-delete write, placed where a GDPR /
# takedown pipeline actually runs it). Completes the maintenance verbs'
# streaming twins: st09 builds, s14 appends, st15 retracts.
# ---------------------------------------------------------------------------


def _stage_delete_requests(spark: SparkSession, sf_dir: str) -> str:
    """Two parquet slices of vec_ids to retract (the s15 tombstone
    mods — 7 then 11 over corpus ids), mtime-ordered so
    maxFilesPerTrigger=1 replays them as two retraction batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ..sources.tables import load_table
    from .similarity import _HS_NQ, _S15_TOMB_MODS

    def build() -> str:
        d = _tmpdir("tinysql_st15_req_")
        ids = [
            r["vec_id"]
            for r in load_table(spark, sf_dir, "embeddings")
            .select("vec_id")
            .filter(F.col("vec_id") >= _HS_NQ)
            .collect()
        ]
        base = None
        for i, m in enumerate(_S15_TOMB_MODS):
            batch = sorted(v for v in ids if v % m == 0)
            path = os.path.join(d, f"{i:04d}.parquet")
            pq.write_table(
                pa.table({"vec_id": pa.array(batch, pa.int64())}), path
            )
            if base is None:
                base = os.path.getmtime(path)
            os.utime(path, (base + i, base + i))
        return d

    return _stage_cached(("st15req", os.path.abspath(sf_dir)), build)


@register(
    "st15_stream_tombstone_delete",
    late=True,
    oracle=None,  # set dynamically below: s15's oracle verbatim (the
    # end state is identical by design)
    doc="",  # set below with the oracle
)
def st15_stream_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob
    import shutil
    import tempfile

    from ..sources.tables import load_table  # noqa: F401  (parity w/ st05)
    from .similarity import _probe_ivf_dir, _s11_corpus, _s11_ivf_index

    # fresh s12-layout index copy (st15 owns its tombstone state; the
    # batch s15's memoized dir must stay pristine for its own oracle)
    centn, assign = _s11_ivf_index(spark, sf_dir)
    u_corp = _s11_corpus(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="tinysql_st15_")
    import atexit

    atexit.register(shutil.rmtree, d, ignore_errors=True)
    (
        assign.join(u_corp, "vec_id")
        .select("cid", "vec_id", "e")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(d, "lists"))
    )
    centn.write.mode("overwrite").parquet(os.path.join(d, "centroids"))
    tombs = os.path.join(d, "tombstones")

    src = _stage_delete_requests(spark, sf_dir)
    stream = (
        spark.readStream.schema("vec_id long")
        .options(**stream_trigger_options())
        .parquet(src)
    )

    def _append_tombstones(batch: DataFrame, batch_id: int) -> None:
        # the s15 logical-delete write: O(batch) metadata append — the
        # index lists are never touched by a retraction micro-batch
        batch.select("vec_id").write.mode("append").parquet(tombs)

    q = (
        stream.writeStream.foreachBatch(_append_tombstones)
        .option(
            "checkpointLocation",
            tempfile.mkdtemp(prefix="tinysql_st15_ckpt_"),
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert glob.glob(os.path.join(tombs, "*.parquet")), "no retraction batch landed"
    return _probe_ivf_dir(
        spark, sf_dir, d, tombstones=spark.read.parquet(tombs)
    )


# st15's end state is BY DESIGN s15's: replaying the retraction stream
# must leave the index answering exactly like the batch two-delete
# sequence — so the oracle is shared verbatim (the d16->d19 precedent:
# composition entries pin end-state equality through the same oracle).
from .registry import REGISTRY as _REG  # noqa: E402
from .registry import QuerySpec as _QS  # noqa: E402

_REG["st15_stream_tombstone_delete"] = _QS(
    fn=st15_stream_tombstone_delete,
    oracle=_REG["s15_ann_tombstone_delete"].oracle,
    doc="Streaming TOMBSTONE DELETES against the maintained ANN index "
    "— the retraction-request topology a GDPR/takedown pipeline runs "
    "(completing the maintenance verbs' streaming twins: st09 builds, "
    "s14 appends, st15 retracts): deletion requests replay as two "
    "micro-batches, each foreachBatch appends its vec_ids to the "
    "tombstone set (s15's O(batch) logical-delete write — the "
    "cid-partitioned lists are never touched by a retraction batch), "
    "and the probe is the shared partition-pruned path with the "
    "tombstone anti-join. The oracle is s15's VERBATIM: the replayed "
    "stream must leave the index answering exactly like the batch "
    "two-delete sequence (end-state equality through one oracle — "
    "the d19 precedent). s15_purge_tombstones applies unchanged for "
    "the physical catch-up (pinned by the s15 test).",
    late=True,
)


# --------------------------------------------------------------------------
# st16 — streaming ingest with the DRIFT-GATED AUTOMATIC RECLUSTER:
# the maintenance loop s16 executes on demand, closed end to end
# (SURVEY §7.24 #5; the d19 ingest-loop pattern applied to vectors)
# --------------------------------------------------------------------------


def st16_stream_drift_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A production vector-index ingest: each micro-batch is assigned
    to the FROZEN trained centroids (map-only, history never re-read)
    and appended to its dirty lists; after every batch the ingest job
    polls the drift gate (s14_needs_recluster over live list sizes —
    an O(K) metadata read), and once the stream drains with the gate
    tripped it runs the s16 recluster: full retrain over the indexed
    corpus + crash-safe lists/centroids swap. The ingest here is
    s16's drifted construction (every vector nearest one hot
    centroid) split into two micro-batches, so the gate MUST trip and
    the recluster MUST run — leaving the index equal to a
    from-scratch build over the drifted corpus, which is exactly what
    s16's oracle checks (shared verbatim, the d19/st15 end-state
    precedent). A manifest records the per-batch gate readings and
    the recluster stats for the quality test."""
    import glob
    import json

    from .similarity import (
        _S16_BASE_MOD,
        _lloyd_centroids,
        _nearest_cid,
        _probe_ivf_dir,
        _s11_corpus,
        _s16_imbalance,
        _s16_list_sizes,
        s14_needs_recluster,
        s16_recluster,
    )

    # the IMMUTABLE inputs (base index template, frozen centroids,
    # staged ingest files) are deterministic per corpus — build once
    # and hard-link per invocation; the streaming replay, the gate
    # polling and the recluster (the operator) run live every call
    key = os.path.abspath(sf_dir)
    tpl = _ST16_TEMPLATE_MEMO.get(key)
    if tpl is None or not os.path.isdir(os.path.join(tpl, "lists")):
        u_corp = _s11_corpus(spark, sf_dir)
        base = u_corp.filter(F.col("vec_id") % _S16_BASE_MOD == 0)
        centn = _lloyd_centroids(base)  # frozen 'yesterday' centroids
        rest = u_corp.filter(F.col("vec_id") % _S16_BASE_MOD != 0)
        arest = _nearest_cid(rest, centn, "vec_id", 1)
        hot = (
            arest.groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"))
            .orderBy(F.col("n").desc(), F.col("cid"))
            .limit(1)
            .collect()[0]["cid"]
        )
        drift = (
            arest.filter(F.col("cid") == int(hot))
            .join(rest, "vec_id")
            .select("vec_id", "e")
        )
        tpl = _tmpdir("tinysql_st16_tpl_")
        (
            _nearest_cid(base, centn, "vec_id", 1)
            .join(base, "vec_id")
            .select("cid", "vec_id", "e")
            .write.mode("overwrite")
            .partitionBy("cid")
            .parquet(os.path.join(tpl, "lists"))
        )
        centn.write.mode("overwrite").parquet(os.path.join(tpl, "centroids"))
        # stage the drifted ingest as TWO micro-batch files (vec_id
        # parity split; coalesce(1) so maxFilesPerTrigger=1 sees one
        # file each)
        for m in (0, 1):
            drift.filter(F.col("vec_id") % 2 == m).coalesce(1).write.mode(
                "append"
            ).parquet(os.path.join(tpl, "ingest"))
        _ST16_TEMPLATE_MEMO[key] = tpl
    d = _tmpdir("tinysql_st16_")
    lists = os.path.join(d, "lists")
    shutil.copytree(os.path.join(tpl, "lists"), lists, copy_function=os.link)
    shutil.copytree(
        os.path.join(tpl, "centroids"),
        os.path.join(d, "centroids"),
        copy_function=os.link,
    )
    src = os.path.join(tpl, "ingest")
    frozen = spark.read.parquet(os.path.join(d, "centroids"))
    gate_log: list[dict] = []

    def ingest(batch: DataFrame, batch_id: int) -> None:
        assigned = (
            _nearest_cid(batch, frozen, "vec_id", 1)
            .join(batch, "vec_id")
            .select("cid", "vec_id", "e")
        )
        # dirty-list append: mode=append + partitionBy touches only
        # the cid partitions this batch assigned into (s14 property)
        assigned.write.mode("append").partitionBy("cid").parquet(lists)
        sizes = _s16_list_sizes(spark, lists)
        gate_log.append(
            {
                "batch": int(batch_id),
                "imbalance": _s16_imbalance(sizes),
                "tripped": s14_needs_recluster(sizes),
            }
        )

    stream = (
        spark.readStream.schema("vec_id long, e array<double>")
        .options(**stream_trigger_options())
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(ingest)
        .option("checkpointLocation", _tmpdir("tinysql_st16_ckpt_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert gate_log, "no ingest micro-batch ran"
    manifest: dict = {"gate_log": gate_log, "reclustered": False}
    if gate_log[-1]["tripped"]:
        # the maintenance action the gate calls for — retrain over the
        # indexed corpus + crash-safe swap (shared s16 kernel)
        manifest.update(s16_recluster(spark, d))
        manifest["reclustered"] = True
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    assert glob.glob(os.path.join(lists, "cid=*")), "lists vanished"
    _ST16_LAST_DIR[os.path.abspath(sf_dir)] = d
    return _probe_ivf_dir(spark, sf_dir, d)


_ST16_LAST_DIR: dict[str, str] = {}
_ST16_TEMPLATE_MEMO: dict[str, str] = {}


from .similarity import _S16_DIR_MEMO as _s16_memo  # noqa: E402,F401 (doc link)

_REG["st16_stream_drift_recluster"] = _QS(
    fn=st16_stream_drift_recluster,
    oracle=_REG["s16_ann_recluster"].oracle,
    doc="Streaming ingest with the DRIFT-GATED AUTOMATIC RECLUSTER — "
    "the maintenance loop s16 runs on demand, closed end to end (the "
    "d19 ingest-loop pattern on the vector side): each micro-batch "
    "assigns to the frozen centroids and appends to its dirty lists "
    "only, the job polls the drift gate after every batch (O(K) "
    "metadata), and once the drained stream leaves the gate tripped "
    "it retrains over the indexed corpus and rewrites lists + "
    "centroids through the crash-safe swap. The oracle is s16's "
    "VERBATIM: the replayed ingest + automatic recluster must leave "
    "the index equal to a from-scratch build over the drifted corpus "
    "(end-state equality through one oracle — the d19/st15 "
    "precedent). Per-batch gate readings and recluster stats are "
    "manifest-recorded and asserted in the quality suite. Bench cost "
    "pinned by a quiet-box interleaved A/B (BASELINE r13 row): s16's "
    "retrain alone is ~1.0 s warm while st16 reads ~4.7 s — the delta "
    "is the micro-batch replay + per-batch gate polling (the st08/"
    "st11 trigger-count fixed cost class), NOT the recluster; the "
    "entry pays the streaming machinery it exists to demonstrate.",
    late=True,
)

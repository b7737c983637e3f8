"""Structured Streaming tests: the streaming hourly aggregation must
agree with its batch twin (q15 semantics), and the stateful per-user
operator must accumulate across micro-batches.

The driver ships events as ONE parquet file; the streaming file
source wants a directory of files (1 file = 1 micro-batch with
maxFilesPerTrigger=1), so the fixture stages the raw events into a
4-file directory — giving a genuine multi-batch run."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tinysql_spark.sources.tables import load_table
from tinysql_spark.streaming import (
    hourly_counts,
    read_event_stream,
    run_to_memory,
    user_running_stats,
)
from tinysql_spark.streaming.pipeline import EVENT_SCHEMA

SF = "/root/testdata/sf0.001"


def stage_time_ordered(spark, raw, d, n_files: int = 4, dup: bool = False) -> None:
    """Stage `raw` into n_files parquet files, ranged and ORDERED by
    event time with lexicographic names and strictly increasing
    mtimes. repartitionByRange writes part files simultaneously (tied
    mtimes), so the file source's replay order is nondeterministic —
    an out-of-order replay advances the watermark past whole chunks
    (dropped as late) and feeds stateful ops backwards-in-time data."""
    import glob
    import os
    import shutil
    import time

    # quantile cuts need a numeric column; ts may be a plain timestamp
    # (micros layout) or a long (nanos layouts)
    # TIMESTAMP_NTZ has no direct numeric cast; hop through TIMESTAMP
    # (session tz is UTC, so the instant is unchanged)
    raw = raw.withColumn(
        "_ts_num",
        F.col("ts").cast("timestamp").cast("double")
        if dict(raw.dtypes)["ts"].startswith("timestamp")
        else F.col("ts"),
    )
    qs = [i / n_files for i in range(1, n_files)]
    cuts = raw.approxQuantile("_ts_num", qs, 0.0)
    bounds = [None, *cuts, None]
    for i in range(n_files):
        part = raw
        if bounds[i] is not None:
            part = part.filter(F.col("_ts_num") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.filter(F.col("_ts_num") <= bounds[i + 1])
        part = part.drop("_ts_num")
        if dup:
            part = part.union(part)
        tmp = os.path.join(d, f"stage{i}")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        dst = os.path.join(d, f"{i:04d}.parquet")
        shutil.copy(glob.glob(tmp + "/part-*.parquet")[0], dst)
        os.utime(dst, (time.time() + i, time.time() + i))
        shutil.rmtree(tmp)


@pytest.fixture(scope="module")
def events_stream_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_stream"))
    # read with the file's own layout (the driver has shipped both
    # TIMESTAMP(NANOS) and TIMESTAMP(MICROS)); read_event_stream
    # re-detects from the staged files
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.parquet(SF + "/events.parquet")
    stage_time_ordered(spark, raw, d)
    return d


def test_streaming_hourly_matches_batch(spark, events_stream_dir):
    stream = read_event_stream(spark, events_stream_dir)
    assert stream.isStreaming
    run_to_memory(hourly_counts(stream), "hourly_stream", output_mode="append")
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 6))
        for r in spark.table("hourly_stream").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("window_start"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 6).alias("s"))
    )
    want = {(r["window_start"], r["event_type"]): (r["n"], r["s"]) for r in batch.collect()}
    # append mode emits only watermark-finalized windows; each emitted
    # window must match the batch result exactly
    assert len(got) > 0
    for k, v in got.items():
        assert k in want, f"unexpected window {k}"
        assert v[0] == want[k][0]
        assert abs(v[1] - want[k][1]) < 1e-6


def test_stateful_user_stats(spark, events_stream_dir):
    stream = read_event_stream(spark, events_stream_dir)
    run_to_memory(user_running_stats(stream), "user_stats", output_mode="update")
    # update-mode memory sink appends every emission; with 4 micro-
    # batches a user can appear up to 4 times — the max running count
    # per user is the final state
    pdf = spark.table("user_stats").toPandas()
    n_emissions = len(pdf)
    final = pdf.sort_values("n_events").groupby("user_id").last()
    batch = (
        load_table(spark, SF, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.coalesce("value", F.lit(0.0))).alias("s"))
        .toPandas()
        .set_index("user_id")
    )
    assert len(final) == len(batch)
    assert n_emissions > len(batch), "expected multiple emissions across micro-batches"
    joined = final.join(batch, how="inner")
    assert len(joined) == len(batch)
    assert (joined["n_events"] == joined["n"]).all()
    assert (abs(joined["total_value"] - joined["s"]) < 1e-6).all()


def test_streaming_dedup(spark, tmp_path_factory):
    from tinysql_spark.streaming import dedup_stream

    d = str(tmp_path_factory.mktemp("events_dup"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw = spark.read.schema(EVENT_SCHEMA).parquet(SF + "/events.parquet")
    # every event staged twice within its time-ordered file
    stage_time_ordered(spark, raw, d, dup=True)

    stream = read_event_stream(spark, str(d))
    run_to_memory(dedup_stream(stream), "dedup_stream", output_mode="append")
    out = spark.table("dedup_stream")
    got = out.count()
    want = raw.select("event_id").distinct().count()
    assert got == want
    assert out.select("event_id").distinct().count() == got


def test_streaming_session_windows_match_batch(spark, events_stream_dir):
    from tinysql_spark.streaming import session_stats

    stream = read_event_stream(spark, events_stream_dir)
    run_to_memory(session_stats(stream), "sessions_stream", output_mode="append")
    got = spark.table("sessions_stream").toPandas()
    assert len(got) > 0

    # batch twin: same session_window aggregation on the static table
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            F.round("sum_value", 6).alias("sum_value"),
        )
        .toPandas()
    )
    want = {
        (r.user_id, r.session_start): (r.n_events, r.sum_value)
        for r in batch.itertuples()
    }
    # append mode emits only watermark-closed sessions; every emitted
    # session must exactly equal its batch twin
    for r in got.itertuples():
        key = (r.user_id, r.session_start)
        assert key in want, f"unexpected session {key}"
        assert (r.n_events, round(r.sum_value, 6)) == want[key]


def test_custom_stateful_sessionize(spark, events_stream_dir):
    from tinysql_spark.streaming import custom_sessionize

    stream = read_event_stream(spark, events_stream_dir)
    run_to_memory(custom_sessionize(stream), "custom_sessions", output_mode="append")
    got = spark.table("custom_sessions").toPandas()
    assert len(got) > 0

    # batch truth: native session_window on the static table
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id", F.col("w.start").alias("session_start"), "n_events"
        )
        .toPandas()
    )
    want = {
        (r.user_id, r.session_start): r.n_events for r in batch.itertuples()
    }
    # every emitted (closed) session must exactly match its batch twin
    for r in got.itertuples():
        key = (r.user_id, r.session_start)
        assert key in want, f"unexpected session {key}"
        assert r.n_events == want[key], key


def test_st06_upsert_really_multi_batch(spark, sf_dir):
    """The upsert contract only means something if keys actually
    mutate ACROSS batches: assert the replay ran 3 micro-batches and
    that some key was updated by a later batch (its winner event_id
    lives in a later slice than its first appearance)."""
    from tinysql_spark.operators.streaming_bridge import stream_upsert

    df, n_batches = stream_upsert(spark, sf_dir)
    assert n_batches == 3
    import pandas as pd

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")[
        ["event_id", "user_id", "event_type"]
    ]
    n = len(ev)
    step = (n + 2) // 3
    first_slice = ev.iloc[:step]
    got = df.toPandas()
    merged = got.merge(first_slice, on=["user_id", "event_type"], how="inner",
                       suffixes=("", "_first"))
    # at least one key seen in batch 0 was overwritten by a later batch
    assert (merged["last_event_id"] > merged["event_id"]).any()


def test_st06_upsert_resumes_from_checkpoint(spark, sf_dir, tmp_path, duck):
    """The restart contract, exercised for real: run the upsert over
    the first slice only, then 'restart' — a second invocation with
    the SAME checkpoint and table dirs after the remaining slices
    arrive. The resumed run must skip the already-processed file
    (1 + 2 batches, not 3), merge onto the durable _LATEST table
    version, and end bit-identical to the batch arg_max oracle."""
    import os
    import shutil

    from tinysql_spark.operators.streaming_bridge import (
        _stage_events_split,
        _upsert_latest,
        run_stream_upsert,
    )

    staged = _stage_events_split(sf_dir)
    src = str(tmp_path / "src")
    os.makedirs(src)
    base = str(tmp_path / "tbl")
    ck = str(tmp_path / "ck")
    os.makedirs(base)

    files = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
    assert len(files) == 3
    shutil.copy2(os.path.join(staged, files[0]), os.path.join(src, files[0]))
    n1 = run_stream_upsert(spark, src, ck, base)
    assert n1 == 1

    for f in files[1:]:
        shutil.copy2(os.path.join(staged, f), os.path.join(src, f))
    n2 = run_stream_upsert(spark, src, ck, base)
    assert n2 == 2, "resumed run must not reprocess the first file"

    got = {
        (r["user_id"], r["event_type"]): (r["last_value"], r["last_event_id"])
        for r in spark.read.parquet(_upsert_latest(base)).collect()
    }
    want = {
        (u, t): (v, i)
        for u, t, v, i in duck.execute(
            "SELECT user_id, event_type, arg_max(value, event_id),"
            " max(event_id) FROM events GROUP BY 1, 2"
        ).fetchall()
    }
    assert got == want


def test_st06_upsert_crash_window_replay(spark, sf_dir, tmp_path):
    """The exact crash window the restart contract documents: the
    _LATEST pointer committed but the checkpoint did NOT, so on
    restart the SAME batch_id replays while _LATEST already points at
    that batch's output. The merge must read the committed version and
    write a DIFFERENT dir (attempt-unique), not overwrite its own
    merge base — and re-merging the same rows must be a no-op."""
    import os

    from tinysql_spark.operators.streaming_bridge import (
        _stage_events_split,
        _upsert_latest,
        merge_upsert_batch,
    )

    staged = _stage_events_split(sf_dir)
    files = sorted(f for f in os.listdir(staged) if f.endswith(".parquet"))
    base = str(tmp_path / "tbl")
    os.makedirs(base)
    batch0 = spark.read.parquet(os.path.join(staged, files[0])).select(
        "event_id", "user_id", "event_type", "value"
    )
    merge_upsert_batch(spark, batch0, 0, base)
    committed = _upsert_latest(base)
    before = {
        (r["user_id"], r["event_type"]): (r["last_value"], r["last_event_id"])
        for r in spark.read.parquet(committed).collect()
    }
    # replay of batch 0 with _LATEST already at batch 0's output
    merge_upsert_batch(spark, batch0, 0, base)
    replayed = _upsert_latest(base)
    assert replayed != committed, "replay must write an attempt-unique dir"
    after = {
        (r["user_id"], r["event_type"]): (r["last_value"], r["last_event_id"])
        for r in spark.read.parquet(replayed).collect()
    }
    assert after == before, "at-least-once replay must be idempotent"


def test_stage_events_handles_relative_sf_dir(tmp_path):
    """Review r04 finding 3: a relative sf_dir must still produce a
    resolvable symlink (targets resolve against the LINK's directory
    at read time, so the staged link must be absolute)."""
    import os

    from tinysql_spark.operators.streaming_bridge import _stage_events

    rel = os.path.relpath("/root/testdata/sf0.001", os.getcwd())
    d = _stage_events(rel)
    link = os.path.join(d, "0000.parquet")
    assert os.path.exists(link), os.readlink(link)


def test_st09_stream_index_equals_batch_assignment(spark, sf_dir):
    """The streamed inverted-list index must contain EXACTLY the
    batch path's centroid assignment: same (cid, count) manifest as
    assigning the whole corpus in one batch job with the same
    trained centroids."""
    from pyspark.sql import functions as F

    from tinysql_spark.operators.similarity import (
        _make_nearest_centroids,
        _trained_centroids,
    )
    from tinysql_spark.operators.streaming_bridge import st09_stream_index_build
    from tinysql_spark.sources.tables import load_table

    got = {
        r["cid"]: r["n_vectors"]
        for r in st09_stream_index_build(spark, sf_dir).collect()
    }
    nearest = _make_nearest_centroids(1, _trained_centroids(spark, sf_dir))
    want = {
        r["cid"]: r["n"]
        for r in load_table(spark, sf_dir, "embeddings")
        .select(F.element_at(nearest(F.col("embedding")), 1).alias("cid"))
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and sum(got.values()) > 0


def test_st10_gate_conserves_rows(spark, sf_dir):
    """The quality-gate split must conserve rows: quarantined +
    passed == total events, and the quarantine summary equals the
    batch gate computation (also the driver oracle)."""
    from pyspark.sql import functions as F

    from tinysql_spark.operators.streaming_bridge import (
        _ST10_VALUE_CAP,
        st10_stream_quality_gate,
    )
    from tinysql_spark.sources.tables import load_table

    got = st10_stream_quality_gate(spark, sf_dir)
    n_quar = got.agg(F.sum("n_quarantined")).collect()[0][0]
    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    want_quar = ev.filter(
        (F.col("value") > _ST10_VALUE_CAP) | F.col("value").isNull()
    ).count()
    assert n_quar == want_quar and 0 < n_quar < total


def test_st10_null_values_land_in_quarantine(spark, tmp_path):
    """ADVICE r5: a NULL `value` fails both `gate` and `~gate` (3VL),
    so the old split dropped NULL rows from BOTH sinks. The contract
    is 'no row dropped silently': NULL/invalid rows must land in
    quarantine. Drives the REAL batch-split function on a micro-batch
    containing a NULL."""
    from tinysql_spark.operators.streaming_bridge import (
        _ST10_VALUE_CAP,
        _st10_split_batch,
    )

    batch = spark.createDataFrame(
        [(1, float(_ST10_VALUE_CAP) - 1.0), (2, float(_ST10_VALUE_CAP) + 1.0), (3, None)],
        "event_id bigint, value double",
    )
    clean, quar = str(tmp_path / "clean"), str(tmp_path / "quar")
    _st10_split_batch(batch, clean, quar)
    clean_ids = {r[0] for r in spark.read.parquet(clean).select("event_id").collect()}
    quar_ids = {r[0] for r in spark.read.parquet(quar).select("event_id").collect()}
    assert clean_ids == {1}
    assert quar_ids == {2, 3}, "NULL row must be quarantined, not dropped"


def test_st11_event_time_ttl_expires_state(spark, tmp_path):
    """VERDICT r6 item 4: shingle_first_owner's event-time TTL bounds
    the state store at the dedup horizon. Replay three ordered batches
    with a 1-hour horizon and a 10-second watermark delay:
      b0: doc 1 owns span AAA at t0
      b1: doc 2 owns span BBB at t0+3h  (advances the watermark 2h
          past AAA's expiry)
      b2: doc 3 re-uses AAA (its only prior sighting EXPIRED — must
          NOT be flagged, doc 3 becomes the new owner) and doc 4
          re-uses BBB (in horizon — MUST be flagged against doc 2);
          doc 5 then re-uses AAA in the same batch (in-horizon dup of
          the NEW owner 3, not the expired 1).
    """
    import os
    import uuid

    from tinysql_spark.streaming.pipeline import shingle_first_owner

    t0 = "2020-01-01 00:00:00"
    rows_by_batch = [
        [(0, "AAA", 1, t0)],
        [(1, "BBB", 2, "2020-01-01 03:00:00")],
        [
            (0, "AAA", 3, "2020-01-01 03:01:00"),
            (1, "BBB", 4, "2020-01-01 03:01:00"),
            (0, "AAA", 5, "2020-01-01 03:02:00"),
        ],
    ]
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = str(tmp_path / "ttl_src")
    os.makedirs(src)
    arrow_schema = pa.schema(
        [
            ("bkt", pa.int32()),
            ("sh", pa.string()),
            ("doc_id", pa.int64()),
            ("ts", pa.timestamp("us")),
        ]
    )
    base = None
    for i, batch in enumerate(rows_by_batch):
        pdf = pd.DataFrame(batch, columns=["bkt", "sh", "doc_id", "ts"])
        pdf["ts"] = pd.to_datetime(pdf["ts"])
        path = os.path.join(src, f"{i:04d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(pdf, schema=arrow_schema, preserve_index=False),
            path,
        )
        if base is None:
            base = os.path.getmtime(path)
        os.utime(path, (base + i, base + i))

    schema = spark.read.parquet(os.path.join(src, "0000.parquet")).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .selectExpr("bkt", "sh", "doc_id", "cast(ts as timestamp) AS ts")
        .withWatermark("ts", "10 seconds")
    )
    owners = shingle_first_owner(stream, horizon_s=3600)
    name = "ttl_" + uuid.uuid4().hex[:8]
    run_to_memory(owners, name, output_mode="append")
    got = {
        r["doc_id"]: r["dup_cand"] for r in spark.table(name).collect()
    }
    assert 3 not in got, f"expired span flagged a late duplicate: {got}"
    assert got.get(4) == 2, f"in-horizon duplicate lost: {got}"
    assert got.get(5) == 3, f"new owner after expiry not honored: {got}"


def test_st13_replay_equals_batch_t20(spark, sf_dir):
    """st13 is a stateless map, so the 4-micro-batch replay must equal
    t20's batch computation exactly — every column, every row."""
    from tinysql_spark.operators.streaming_bridge import (
        st13_stream_compression_gate,
    )
    from tinysql_spark.operators.text import t20_compression_gate

    got = {
        r["doc_id"]: (r["n_raw"], r["n_comp"], r["ratio"],
                      r["flag_repetitive"], r["flag_incompressible"])
        for r in st13_stream_compression_gate(spark, sf_dir).collect()
    }
    want = {
        r["doc_id"]: (r["n_raw"], r["n_comp"], r["ratio"],
                      r["flag_repetitive"], r["flag_incompressible"])
        for r in t20_compression_gate(spark, sf_dir).collect()
    }
    assert got == want and len(got) > 0


def test_boundary_invariant_entries_match_files1_replay(spark, sf_dir, monkeypatch):
    """r15: st04/st12/st13 default to the volume-sized trigger
    (bytes-mode — one micro-batch instead of one per staged file)
    because their OUTPUT does not depend on micro-batch boundaries:
    st12/st13 are stateless maps, and st04's append emission rides
    the sentinels' event times (watermark progress + the engine's
    no-data batch), not file count. Pin exactly that claim: the
    default replay must equal the forced files:1 replay row for row."""
    from tinysql_spark.operators.registry import REGISTRY

    for name in (
        "st04_stream_parquet_sink",
        "st07_stream_sessions",
        "st08_stream_left_join",
        "st12_stream_pii_scrub",
        "st13_stream_compression_gate",
    ):
        fn = REGISTRY[name].fn
        monkeypatch.delenv("SPARK_GRAFT_STREAM_TRIGGER", raising=False)
        got_default = sorted(map(tuple, fn(spark, sf_dir).collect()))
        monkeypatch.setenv("SPARK_GRAFT_STREAM_TRIGGER", "files:1")
        got_files1 = sorted(map(tuple, fn(spark, sf_dir).collect()))
        monkeypatch.delenv("SPARK_GRAFT_STREAM_TRIGGER")
        assert got_default == got_files1 and len(got_default) > 0, name

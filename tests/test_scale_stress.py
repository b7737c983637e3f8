"""Skew/scale amplification harness (VERDICT r03 next-round item 5).

The 100 TB skew claims (q22 salting, d09 stop-shingle cap, AQE skew
split) were argued in docstrings and plan tests; this harness
MEASURES them. It amplifies the sf0.001 tables x50 with a
manufactured hot key and asserts bounded per-task input / partition
spread — the quantities that decide whether a straggler task OOMs a
1000-executor cluster.

Amplification is done with explode(sequence(...)) on the small base
tables (no driver loops, no synthetic files for the join tests; d09's
end-to-end check writes ONE amplified parquet to a pytest tmp dir).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

AMP = 50  # amplification factor (VERDICT asks for green at x50)
HOT_FRAC = 0.6  # fraction of amplified fact rows forced onto one key
SALT_N = 16  # matches q22's salt fan-out
PARTS = 32


@pytest.fixture(scope="module")
def amp_events(spark):
    """sf0.001 events x50 with ~60% of rows on one hot event_type.

    Deterministic: replication via explode(sequence), hotness via
    xxhash64 of the replicated id — no rand(), stable across runs.
    """
    base = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    amp = (
        base.select(
            "event_id",
            "event_type",
            "value",
            F.explode(F.sequence(F.lit(0), F.lit(AMP - 1))).alias("rep"),
        )
        .select(
            (F.col("event_id") * AMP + F.col("rep")).alias("event_id"),
            F.when(
                F.pmod(F.xxhash64((F.col("event_id") * AMP + F.col("rep"))), F.lit(100))
                < int(HOT_FRAC * 100),
                F.lit("hot_key"),
            )
            .otherwise(F.col("event_type"))
            .alias("event_type"),
            "value",
        )
    )
    df = amp.persist()
    yield df
    df.unpersist()


def _partition_spread(df, n_parts, *cols):
    """Rows per shuffle partition after hash-partitioning on cols —
    the actual reducer-task input distribution for a shuffle on that
    key. Returns (max_rows, total_rows)."""
    counts = (
        df.repartition(n_parts, *[F.col(c) for c in cols])
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    sizes = [r["n"] for r in counts]
    return max(sizes), sum(sizes)


def test_salted_shuffle_bounds_hot_partition(amp_events):
    """q22's salting mechanism, measured: hash-partitioning the x50
    skewed fact on the bare join key concentrates >=50% of ALL rows
    in one reducer task; on (key, salt) the max task input drops to
    a small multiple of uniform."""
    mx_plain, total = _partition_spread(amp_events, PARTS, "event_type")
    assert total == 1000 * AMP
    # the hot key (~60% of rows) lands in exactly one partition
    assert mx_plain / total >= 0.5, (mx_plain, total)

    salted = amp_events.withColumn(
        "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_N)).cast("int")
    )
    mx_salt, total_s = _partition_spread(salted, PARTS, "event_type", "salt")
    assert total_s == total
    # hot key spreads over SALT_N salts (~3.75% each); with 32
    # partitions a few (key,salt) cells can collide into one task —
    # allow 15%, still a 3x+ improvement over the unsalted 50%+
    assert mx_salt / total_s <= 0.15, (mx_salt, total_s)
    assert mx_plain / mx_salt >= 3.0


def test_salted_join_result_invariant_under_amplification(spark, amp_events):
    """Salting must be a pure execution-strategy change: the salted
    fact-dim join over the amplified skewed data returns exactly the
    unsalted join's aggregate."""
    dim = (
        amp_events.select("event_type")
        .distinct()
        .select("event_type", F.length("event_type").alias("weight"))
    )
    plain = (
        amp_events.join(dim, "event_type")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("ws"))
    )
    dim_salted = dim.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(SALT_N - 1)))
    )
    salted = (
        amp_events.withColumn(
            "salt", F.pmod(F.xxhash64("event_id"), F.lit(SALT_N)).cast("int")
        )
        .hint("shuffle_hash")
        .join(dim_salted, ["event_type", "salt"])
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("value") * F.col("weight")), 2).alias("ws"))
    )
    a = sorted(map(tuple, plain.collect()))
    b = sorted(map(tuple, salted.collect()))
    assert a == b


@pytest.fixture(scope="module")
def amp_docs_dir(spark, tmp_path_factory):
    """sf0.001 documents x50 (=25k docs) with TWO hot 3-token
    shingles injected into ~20% of docs — enough shared shingles to
    pass d09's MIN_SHARED=2 gate, so without the stop-shingle cap the
    hot block alone would emit ~(0.2*25k)^2/2 = 12.5M candidate
    pairs."""
    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    amp = (
        base.select(
            "doc_id",
            "source",
            "text",
            F.explode(F.sequence(F.lit(0), F.lit(AMP - 1))).alias("rep"),
        )
        .select(
            (F.col("doc_id") * AMP + F.col("rep")).alias("doc_id"),
            "source",
            F.when(
                F.pmod(F.xxhash64((F.col("doc_id") * AMP + F.col("rep"))), F.lit(100)) < 20,
                F.concat(F.col("text"), F.lit(" hotaa hotbb hotcc hotdd")),
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )
    d = tmp_path_factory.mktemp("amp_sf") / "documents.parquet"
    amp.write.mode("overwrite").parquet(str(d))
    return str(d.parent)


def test_stop_shingle_cap_bounds_join_fanout(spark, amp_docs_dir):
    """d09's candidate generator, measured at x50 with a hot shingle:
    every shingle that survives the rare-filter has a posting list
    <= greatest(25, 5% of docs) — the per-key fan-out of the pair
    join, i.e. the max task input, is bounded by the cap squared no
    matter how hot the injected key is."""
    from tinysql_spark.operators.dedup import _D09_STOP_FRAC, shingles

    docs = spark.read.parquet(f"{amp_docs_dir}/documents.parquet")
    n_docs = docs.count()
    cap = max(25, int(_D09_STOP_FRAC * n_docs))
    sh = docs.select(
        "doc_id",
        F.explode(F.transform(shingles(F.col("text")), lambda s: F.xxhash64(s))).alias("sh"),
    )
    posting = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    # the injected hot shingles really are hot (>5% of docs) ...
    hot_df = posting.agg(F.max("df").alias("mx")).collect()[0]["mx"]
    assert hot_df > cap, (hot_df, cap)
    # ... and the rare-filter excludes exactly them, bounding fan-out
    kept_max = (
        posting.filter(F.col("df") <= F.lit(cap)).agg(F.max("df").alias("mx")).collect()[0]["mx"]
    )
    assert kept_max <= cap


def test_d09_complete_and_bounded_under_amplification(spark, amp_docs_dir):
    """End-to-end d09 on the x50 corpus with injected hot shingles.

    x50 replication manufactures a known duplicate structure: 500
    cliques of 50 identical-text replicas = 500 * C(50,2) = 612,500
    true near-dup pairs. Two measured claims:

    - RECALL: every within-clique pair is found (>= 612,500) despite
      the stop-shingle cap — the cap removes hot keys, not recall on
      the dup structure.
    - BOUNDEDNESS: the total stays near that true structure (true
      cliques + x2500-amplified base-corpus near-dup pairs), nowhere
      near the extra ~12.5M-pair join fan-out the injected hot block
      would push through the candidate aggregation without the cap.
    """
    from tinysql_spark.operators.dedup import d09_fuzzy_dedup_scaled

    n_pairs = d09_fuzzy_dedup_scaled(spark, amp_docs_dir).count()
    n_docs = spark.read.parquet(f"{amp_docs_dir}/documents.parquet").count()
    assert n_docs == 500 * AMP
    clique_pairs = 500 * AMP * (AMP - 1) // 2
    assert n_pairs >= clique_pairs, n_pairs
    assert n_pairs <= clique_pairs + 300_000, n_pairs


def test_sparse_auto_increment_true_scale(spark, tmp_path):
    """The sparse AUTO_INCREMENT path WITHOUT threshold monkeypatching:
    sf0.1 orders (150k rows > _DENSE_ROWID_MAX=100k) through a real
    INSERT..SELECT into a BIGINT AUTO_INCREMENT table. Ids unique,
    allocator advanced, and the executed fill plan contains no
    single-partition Exchange or Window."""
    from tinysql_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh_scale_ai"))
    eng.attach_testdata("/root/testdata/sf0.1")
    eng.sql("CREATE TABLE sai (id bigint AUTO_INCREMENT PRIMARY KEY, k bigint)")

    import tinysql_spark.sqlparse as P

    ins = P.parse_insert("INSERT INTO sai (k) SELECT o_orderkey FROM orders")
    info = eng.catalog.get_table("default", "sai")
    filled, n = eng._values_df(ins, info)
    assert n > Engine._DENSE_ROWID_MAX
    plan = filled._jdf.queryExecution().executedPlan().toString()
    assert "Exchange SinglePartition" not in plan, plan
    assert "Window" not in plan, plan
    stats = filled.agg(
        F.count("id").alias("n"),
        F.count_distinct("id").alias("d"),
        F.min("id").alias("lo"),
    ).collect()[0]
    assert stats["n"] == stats["d"] == n
    assert stats["lo"] >= 1
    assert info.next_auto > n


def test_d13_d15_hot_span_bounded_and_exact(spark, tmp_path):
    """ADVICE r8 (d13) measured on genuinely skewed DATA, not just
    plan shape: a corpus where ONE boilerplate span occurs in ~60% of
    docs. The partial-agg min(struct) first-occurrence must (a) stay
    exact — verified against a pure-Python twin — and (b) never
    funnel the hot span into a single sorted reducer group (the plan
    carries partial HashAggregates, asserted; with a row_number
    window the hot key would be one sorted partition)."""
    import hashlib

    from tinysql_spark.operators import dedup as D
    from tinysql_spark.operators.text import py_tokens
    from tinysql_spark.plans import has_partial_aggregate, plan_string

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    boiler = " ".join(f"bp{i}" for i in range(D._D13_W * 2))  # 2 chunks of boilerplate
    hot = base.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 10 < 6,  # ~60% of docs share the spans
            F.concat(F.lit(boiler + " "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    out_dir = str(tmp_path / "hotdocs")
    hot.coalesce(1).write.mode("overwrite").parquet(out_dir + "/documents.parquet")

    df13 = D.d13_span_scrub(spark, out_dir)
    plan = plan_string(df13)
    assert "row_number" not in plan.lower() and has_partial_aggregate(df13)
    got = {r["doc_id"]: r.asDict() for r in df13.collect()}

    # pure-Python twin of d13's spec over the same corpus
    rows = sorted(
        ((r["doc_id"], r["text"]) for r in hot.collect()), key=lambda t: t[0]
    )
    w = D._D13_W
    first: dict[str, tuple[int, int]] = {}
    chunks_by_doc: dict[int, list[tuple[int, str]]] = {}
    for doc_id, text in rows:
        ws = py_tokens(text)
        n_chunks = len(ws) // w
        for pos in range(n_chunks):
            txt = " ".join(ws[pos * w : (pos + 1) * w])
            k = (doc_id, pos)
            cur = first.get(txt)
            if cur is None or k < cur:
                first[txt] = k
            chunks_by_doc.setdefault(doc_id, []).append((pos, txt))
    for doc_id, text in rows:
        ws = py_tokens(text)
        n_chunks = len(ws) // w
        kept = [
            txt
            for pos, txt in chunks_by_doc.get(doc_id, [])
            if first[txt] == (doc_id, pos)
        ]
        tail = ws[n_chunks * w :]
        body = " ".join(kept + [" ".join(tail)] if tail else kept).strip()
        # reproduce d13's concat_ws(' ', body, tail) + trim exactly
        parts = [p for p in (" ".join(kept), " ".join(tail)) if p != ""]
        body = " ".join(parts).strip()
        g = got[doc_id]
        assert g["n_chunks"] == n_chunks
        assert g["n_dropped"] == n_chunks - len(kept)
        assert g["scrubbed_md5"] == hashlib.md5(body.encode()).hexdigest(), doc_id
    # the hot span was actually hot: >half the docs dropped those chunks
    n_hot = sum(1 for d in got.values() if d["n_dropped"] >= 2)
    assert n_hot >= len(got) * 0.5


def test_d16_bloom_stays_fixed_under_amplification(spark, tmp_path):
    """The d16/d17 membership sketch must be corpus-size-INDEPENDENT:
    amplify documents x20 (every doc duplicated under fresh ids) and
    assert the bloom bitmap is the same 16 KiB, the build collects
    only #batches x 16 KiB rows, and the amplified probe still
    classifies exactly (no false negatives; false positives only pass
    to the verify join)."""
    import numpy as np

    from tinysql_spark.operators import dedup as D
    from tinysql_spark.operators.text import fingerprint

    base = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    amp = (
        base.select(
            F.explode(F.sequence(F.lit(0), F.lit(19))).alias("rep"),
            "doc_id",
            "text",
            "lang",
            "source",
            "n_chars",
        )
        .select(
            (F.col("doc_id") + F.col("rep") * 1_000_000).alias("doc_id"),
            "text",
            "lang",
            "source",
            "n_chars",
        )
    )
    out_dir = str(tmp_path / "ampdocs")
    amp.write.mode("overwrite").parquet(out_dir + "/documents.parquet")

    D._D16_BLOOM_MEMO.clear()
    bm = np.frombuffer(D._d16_history_bloom(spark, out_dir), dtype=np.uint8)
    assert len(bm) == D._D16_M // 8, "bitmap grew with the corpus"
    # exactness on the amplified corpus: every incoming doc whose text
    # also exists in history (x20 duplication guarantees many) must
    # pass the bloom — zero false negatives by construction
    inc = (
        D._d16_augment(spark.read.parquet(out_dir + "/documents.parquet"))
        .filter(F.col("doc_id") >= D._D16_BOUNDARY)
        .select("doc_id", fingerprint(F.col("text")).alias("fp"))
    )
    hist_fps = {
        r["fp"]
        for r in D._d16_augment(spark.read.parquet(out_dir + "/documents.parquet"))
        .filter(F.col("doc_id") < D._D16_BOUNDARY)
        .select(fingerprint(F.col("text")).alias("fp"))
        .distinct()
        .collect()
    }
    rows = inc.select("doc_id", "fp", F.xxhash64("fp").alias("h")).collect()
    idx = D._d16_bit_indices(np.array([r["h"] for r in rows]))
    passed = (((bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).all(axis=1))
    for ok, r in zip(passed, rows):
        if r["fp"] in hist_fps:
            assert ok, f"false negative for doc {r['doc_id']}"
    n_true = sum(1 for r in rows if r["fp"] in hist_fps)
    assert n_true > 0 and passed.sum() <= n_true + max(5, len(rows) // 10)


def test_d20_prefix_excludes_hot_tokens(spark):
    """The prefix filter's built-in skew guard: prefixes take the
    RAREST tokens first (frequency-ascending global order), so a
    corpus-wide hot token enters a doc's prefix only when the doc
    has almost nothing rarer — the hot blocking keys that force
    d09's explicit stop-shingle cap never form here. The driver
    corpus can't show this (its ~30-word vocab has UNIFORM document
    frequencies — nothing is hot relative to anything else, and the
    win there is the 5x volume cut measured in test_dedup_quality),
    so this builds the Zipfian shape the guard exists for: every doc
    shares two corpus-wide hot tokens, the rest are doc-local rare
    tokens. The hot tokens' prefix blocks must be EMPTY while their
    full-token blocks span the corpus."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from tinysql_spark.operators.dedup import _D20_T

    n_docs = 400
    rows = [
        (
            i,
            ["the", "and"] + [f"w{i}_{j}" for j in range(19)],
        )
        for i in range(n_docs)
    ]
    tok = (
        spark.createDataFrame(rows, "doc_id long, toks array<string>")
        .select("doc_id", F.explode("toks").alias("w"))
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy("df", "w")
    prefix = (
        tok.join(freq, "w")
        .withColumn("rn", F.row_number().over(w_doc))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
        .filter(F.col("rn") <= F.col("n") - F.ceil(F.lit(_D20_T) * F.col("n")) + 1)
    )
    hot_prefix = prefix.filter(F.col("w").isin("the", "and")).count()
    hot_full = tok.filter(F.col("w").isin("the", "and")).count()
    assert hot_full == 2 * n_docs
    assert hot_prefix == 0, hot_prefix
    # and the prefix relation still covers every doc (no doc starved)
    assert prefix.select("doc_id").distinct().count() == n_docs


def test_insert_probe_stays_point_sized_at_60_files(spark, tmp_path):
    """The write-side 100x claim at a bigger file fan-out (round 13):
    a 60-file range-laid-out PK table takes a point INSERT whose dup
    probe reads only the footer-overlapping files — the probe's
    files_read must stay O(overlap), two orders below files_given,
    and must NOT grow when the table doubles again."""
    from tinysql_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    try:
        eng.sql("CREATE TABLE big60 (k BIGINT PRIMARY KEY, v BIGINT)")
        for i in range(60):  # 60 disjoint-range single-statement files
            lo = i * 1000 + 1
            vals = ", ".join(f"({k}, {k})" for k in range(lo, lo + 50))
            eng.sql(f"INSERT INTO big60 VALUES {vals}")
        eng.probe_log.clear()
        with pytest.raises(ValueError, match="1062"):
            eng.sql("INSERT INTO big60 VALUES (30005, 0)")  # mid-range dup
        p = [q for q in eng.probe_log if q["table"].endswith("big60")][0]
        assert p["files_given"] >= 60
        assert p["literal"] and p["files_read"] <= 3, p
        # REPLACE attribution prunes identically
        eng.probe_log.clear()
        eng.sql("REPLACE INTO big60 VALUES (30005, 9)")
        rp = [
            q
            for q in eng.probe_log
            if q["table"].endswith("big60") and q["key"] == ("replace",)
        ][0]
        assert rp["literal"] and rp["files_read"] <= 3, rp
        assert (
            eng.sql("SELECT v FROM big60 WHERE k = 30005").df.collect()[0][0]
            == 9
        )
    finally:
        eng.close()

"""End-to-end corpus-cleanse pipeline — the composition a training-data
job actually runs, as ONE declarative plan Catalyst can optimize
across stages (filters fuse into the scan; only the dedup window
shuffles).

Stages (all reused from the t-/d- operator helpers):
1. language gate   — stopword-marker prediction != 'unknown' (t02)
2. quality gates   — alpha ratio >= 0.5, 100 <= len <= 2000 (t03)
3. exact dedup     — keep the min doc_id per content fingerprint (d01)
4. report          — kept-doc counts + volume per (source, pred_lang)

At 100 TB: stages 1-2 are scan-fused predicates (no shuffle), stage 3
is one hash-partitioned window on the fingerprint, stage 4 a partial
agg. The whole cleanse is 2 shuffles regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register
from .text import fingerprint, lang_pred, py_tokens, tokens


def _py_gram8(t: str | None) -> list[str]:
    """Distinct 8-token grams of a doc (py_tokens' faithful token
    stream); docs under 8 tokens contribute none — the Python twin of
    the p04/p18 JVM filter + sequence/slice/join construction."""
    ws = py_tokens(t)
    n = len(ws)
    if n < 8:
        return []
    return list({" ".join(ws[i : i + 8]) for i in range(n - 7)})


def _gram8_hash_batch(texts):
    """text -> array<int64> of distinct 8-gram hashes in one Arrow
    batch (pandas hash_array — C-vectorized siphash, fixed key). The
    d09 _shingle_hash_batch discipline applied to p04: the old
    transform(sequence, slice+array_join+xxhash64) Column pipeline is
    interpreted per element (the t09 lesson) and measured ~2.5 s per
    pass at sf0.1 vs ~0.5 s for this stage. The hash is only a join
    key — the oracle joins on the gram STRINGS."""
    import numpy as np
    import pandas as pd

    grams = [_py_gram8(t) for t in texts]
    flat = np.asarray([g for gs in grams for g in gs], dtype=object)
    if len(flat) == 0:
        return pd.Series([[] for _ in grams])
    # ONE hash_array call over the whole batch (per-doc calls pay a
    # ~0.2 ms setup each — measured 1.46 s vs 0.5 s at sf0.1)
    h = pd.util.hash_array(flat).astype("int64")
    out, pos = [], 0
    for gs in grams:
        out.append(h[pos : pos + len(gs)])
        pos += len(gs)
    return pd.Series(out)


def _gram8_md5_batch(texts):
    """text -> array<string> of md5 digests of the distinct 8-grams —
    p18's collision-safe key (a 64-bit join-key collision would
    inflate n_shared and silently diverge from the oracle's gram-text
    join, the committed p18 decision), computed in the Arrow batch
    instead of the interpreted HOF pipeline."""
    import hashlib
    import pandas as pd

    return pd.Series(
        [
            [hashlib.md5(g.encode()).hexdigest() for g in _py_gram8(t)]
            for t in texts
        ]
    )


@register(
    "p01_corpus_cleanse",
    oracle="""
    WITH scored AS (
      SELECT doc_id, source, text,
             CASE
               WHEN contains(' ' || text || ' ', ' the ') OR contains(' ' || text || ' ', ' and ')
                    OR contains(' ' || text || ' ', ' of ') THEN 'en'
               WHEN contains(' ' || text || ' ', ' der ') OR contains(' ' || text || ' ', ' und ')
                    OR contains(' ' || text || ' ', ' die ') THEN 'de'
               WHEN contains(' ' || text || ' ', ' le ') OR contains(' ' || text || ' ', ' et ')
                    OR contains(' ' || text || ' ', ' la ') THEN 'fr'
               WHEN contains(' ' || text || ' ', ' el ') OR contains(' ' || text || ' ', ' y ')
                    OR contains(' ' || text || ' ', ' los ') THEN 'es'
               WHEN contains(' ' || text || ' ', '的') OR contains(' ' || text || ' ', '是') THEN 'zh'
               ELSE 'unknown'
             END AS pred_lang,
             length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
      FROM documents
    ), gated AS (
      SELECT * FROM scored
      WHERE pred_lang <> 'unknown'
        AND alpha_ratio >= 0.5
        AND length(text) BETWEEN 100 AND 2000
    ), deduped AS (
      SELECT * FROM gated
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    )
    SELECT source, pred_lang,
           count(*) AS n_docs,
           CAST(sum(length(text)) AS BIGINT) AS total_chars
    FROM deduped
    GROUP BY source, pred_lang
    """,
    doc="Corpus cleanse: language gate + quality gates + exact-dedup "
    "keep-first + per-(source, lang) report, composed as one plan "
    "(2 shuffles total at any scale; gates fuse into the scan). "
    "Reuses t02/t03/d01 column helpers — the operators compose.",
)
def p01_corpus_cleanse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        lang_pred(F.col("text")).alias("pred_lang"),
        (F.length(F.regexp_replace("text", "[^a-z]", "")) / F.length("text")).alias("alpha_ratio"),
        fingerprint(F.col("text")).alias("fp"),
    )
    gated = scored.filter(
        (F.col("pred_lang") != "unknown")
        & (F.col("alpha_ratio") >= 0.5)
        & (F.length("text") >= 100)
        & (F.length("text") <= 2000)
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return deduped.groupBy("source", "pred_lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
    )


# --------------------------------------------------------------------------
# p02 — deterministic train/valid/test split + stratified downsample
# --------------------------------------------------------------------------

# Two-round LCG over the doc id: multipliers small enough that every
# intermediate fits int64 (no overflow — DuckDB BIGINT overflow raises,
# Spark wraps; staying under 2^63 keeps both engines exact-identical).
# At production scale swap the id for xxhash64(content) — the LCG is
# used here because the oracle must compute the SAME hash in SQL.
_M32 = 4294967296


@register(
    "p02_train_sample",
    late=True,
    oracle="""
    WITH h AS (
      SELECT doc_id, lang, source,
             ((((doc_id * 2654435761 + 1013904223) % 4294967296) * 69069 + 12345)
               % 4294967296) AS h2,
             ((((doc_id * 2654435761 + 1013904223) % 4294967296) * 1103515245 + 12345)
               % 4294967296) AS h3
      FROM documents
    )
    SELECT doc_id, lang, source,
           CASE WHEN h2 % 100 < 80 THEN 'train'
                WHEN h2 % 100 < 90 THEN 'valid'
                ELSE 'test' END AS split
    FROM h
    WHERE CASE WHEN lang = 'en' THEN h3 % 100 < 30 ELSE h3 % 100 < 60 END
    """,
    doc="Deterministic train/valid/test assignment (80/10/10) plus "
    "per-language stratified downsample (en 30%, rest 60% — mix "
    "rebalancing) via a content-key LCG hash. Map-only Column "
    "algebra: zero shuffles, whole-stage codegen, reproducible "
    "regardless of partitioning/cluster size — the property random() "
    "sampling loses on retries at 100 TB.",
)
def p02_train_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h1 = (F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223)) % F.lit(_M32)
    h2 = (h1 * F.lit(69069) + F.lit(12345)) % F.lit(_M32)
    h3 = (h1 * F.lit(1103515245) + F.lit(12345)) % F.lit(_M32)
    bucket = h2 % 100
    keep = F.when(F.col("lang") == "en", h3 % 100 < 30).otherwise(h3 % 100 < 60)
    return (
        docs.filter(keep)
        .select(
            "doc_id",
            "lang",
            "source",
            F.when(bucket < 80, "train")
            .when(bucket < 90, "valid")
            .otherwise("test")
            .alias("split"),
        )
    )


# --------------------------------------------------------------------------
# p03 — per-(lang, source) token-budget mix selection
# --------------------------------------------------------------------------


@register(
    "p03_token_budget_mix",
    late=True,
    oracle="""
    WITH t AS (
      SELECT doc_id, lang, source, n_chars,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok_cnt
      FROM documents
    )
    SELECT doc_id, lang, source, tok_cnt,
           CAST(sum(tok_cnt) OVER (
             PARTITION BY lang, source ORDER BY n_chars DESC, doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
    FROM t
    QUALIFY cum_tok <= 500
    """,
    doc="Training-mix quota: rank docs per (lang, source) stratum "
    "(longest first, id tiebreak) and keep documents while the "
    "stratum's running token sum stays inside a 500-token budget. "
    "One hash-partitioned window shuffle on the stratum key; at "
    "100 TB strata are independent so the window parallelizes to "
    "the stratum count, and the running sum is a single sorted pass "
    "per stratum (no self-join, no collect).",
)
def p03_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size(tokens(F.col("text"))).cast("long").alias("tok_cnt"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tok", F.sum("tok_cnt").over(w))
        .filter(F.col("cum_tok") <= 500)
        .drop("n_chars")
    )


# --------------------------------------------------------------------------
# p04 — benchmark-contamination scan (shared 8-gram evidence)
# --------------------------------------------------------------------------


@register(
    "p04_contamination",
    late=True,
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(ws) - 7),
               i -> array_to_string(ws[i:i+7], ' ')))) AS gram
      FROM w WHERE len(ws) >= 8
    )
    SELECT c.doc_id AS corpus_id, e.doc_id AS eval_id, count(*) AS n_shared
    FROM g c JOIN g e ON c.gram = e.gram
    WHERE e.doc_id % 19 = 0 AND c.doc_id % 19 <> 0
    GROUP BY 1, 2
    HAVING count(*) >= 2
    """,
    doc="Eval-set contamination: flag (corpus doc, eval doc) pairs "
    "sharing >= 2 distinct 8-gram shingles (eval set = doc_id % 19 "
    "== 0 here; in production a benchmark table). Spark side hashes "
    "shingles to int64 (xxhash64) before the equi-join so the "
    "shuffle ships 8-byte keys, not 50-byte strings; candidate "
    "generation is a blocked equi-join on the shingle — linear in "
    "shared-shingle pairs, never corpus x eval. Same shape as d02; "
    "at 100 TB a real (fixed-size) eval side broadcasts via AQE/"
    "autoBroadcastJoinThreshold — no forced hint, because on a "
    "corpus-proportional eval split (this synthetic one is ~1/19 of "
    "all grams) an unconditional broadcast would OOM executors.",
)
def p04_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from .dedup import _keyed_persist

    docs = load_table(spark, sf_dir, "documents")
    # Round-14 (guide §1.2/§4.2): the gram construction moves from the
    # interpreted HOF pipeline (transform/sequence/slice/array_join/
    # xxhash64 — ~2.5 s per pass at sf0.1, and it ran once per join
    # side) into one Arrow batch stage (~0.5 s), persisted PRE-explode
    # so both join sides split one cached (doc_id, gram-array) frame —
    # corpus-linear cache, the d09.sh discipline. Under-8-token docs
    # yield empty arrays, which explode() drops (the old >= 8 filter).
    g_udf = F.pandas_udf(
        _gram8_hash_batch, T.ArrayType(T.LongType())
    ).asNondeterministic()
    ga = _keyed_persist(
        "p04.ga", docs.select("doc_id", g_udf(F.col("text")).alias("ga"))
    )
    g = ga.select("doc_id", F.explode("ga").alias("gh"))
    ev = g.filter(F.col("doc_id") % 19 == 0).select(
        F.col("doc_id").alias("eval_id"), "gh"
    )
    corp = g.filter(F.col("doc_id") % 19 != 0).select(
        F.col("doc_id").alias("corpus_id"), "gh"
    )
    return (
        corp.join(ev, "gh")
        .groupBy("corpus_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )


# --------------------------------------------------------------------------
# p05 — sequence packing into fixed token-budget bins
# --------------------------------------------------------------------------

_PACK_BUDGET = 2048


@register(
    "p05_sequence_packing",
    late=True,
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok_cnt
      FROM documents
    ), c AS (
      SELECT doc_id, source, tok_cnt,
             sum(tok_cnt) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT source,
           CAST((cum - tok_cnt) // {_PACK_BUDGET} AS BIGINT) AS bin_id,
           count(*) AS n_docs,
           CAST(sum(tok_cnt) AS BIGINT) AS n_tokens
    FROM c
    GROUP BY source, bin_id
    """,
    doc=f"Sequence packing: stream each source's docs (doc_id order) "
    f"into {_PACK_BUDGET}-token training bins — a doc belongs to the "
    "bin where its tokens START (cumulative-sum // budget), the "
    "standard streaming-packing compromise (exact first-fit needs a "
    "sequential scan; boundary docs straddle into the next bin and "
    "the collator truncates/continues). One window shuffle on source "
    "+ one partial-agg shuffle. At 100 TB per-source windows are the "
    "skew risk: sub-shard the partition key (source, doc_id div N) "
    "the way the salted join (q22) shards a hot key — packing only "
    "needs intra-shard contiguity.",
)
def p05_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("tok_cnt"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("tok_cnt").over(w))
    return (
        c.select(
            "source",
            F.floor((F.col("cum") - F.col("tok_cnt")) / _PACK_BUDGET)
            .cast("long")
            .alias("bin_id"),
            "tok_cnt",
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_cnt").cast("long").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# p06 — temperature-scaled source mixture sampling
# --------------------------------------------------------------------------

_MIX_ALPHA_SQRT = True  # alpha = 0.5 -> sqrt(): bit-exact in both engines
_MIX_BUDGET_FRAC = 0.5  # expected kept fraction of the corpus


@register(
    "p06_temperature_mix",
    late=True,
    oracle=f"""
    WITH s AS (
      SELECT source, CAST(count(*) AS DOUBLE) AS n_s FROM documents GROUP BY source
    ), w AS (
      SELECT source, n_s, sqrt(n_s) AS w_s,
             sum(sqrt(n_s)) OVER () AS w_tot,
             sum(n_s) OVER () AS n_tot
      FROM s
    ), p AS (
      SELECT source, n_s,
             least(1.0, {_MIX_BUDGET_FRAC} * n_tot * (w_s / w_tot) / n_s) AS p_keep
      FROM w
    )
    SELECT d.source,
           CAST(p.n_s AS BIGINT) AS n_docs,
           count(*) FILTER (
             WHERE ((d.doc_id * 2654435761 + 1013904223) % 4294967296) / 4294967296.0
                   < p.p_keep
           ) AS n_kept
    FROM documents d JOIN p ON d.source = p.source
    GROUP BY d.source, p.n_s
    """,
    doc="Temperature-scaled mixture sampling (alpha = 0.5): keep "
    "probability per source proportional to n_s^alpha / n_s, so small "
    "sources are up-weighted relative to their share — the standard "
    "multilingual/multi-source rebalancing step before training. "
    "Per-doc keep decisions are the deterministic LCG hash of doc_id "
    "(p02's reproducibility discipline — identical under retries and "
    "repartitioning; sqrt keeps the weight math bit-exact across "
    "engines). Plan: one tiny per-source aggregate broadcast back "
    "onto the corpus (map-side join), one final partial agg — no "
    "corpus-wide shuffle of doc rows at any point.",
)
def p06_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(F.count(F.lit(1)).cast("double").alias("n_s"))
    w = (
        s.withColumn("w_s", F.sqrt(F.col("n_s")))
        .withColumn("w_tot", F.sum("w_s").over(Window.partitionBy()))
        .withColumn("n_tot", F.sum("n_s").over(Window.partitionBy()))
    )
    p = w.select(
        "source",
        "n_s",
        F.least(
            F.lit(1.0),
            F.lit(_MIX_BUDGET_FRAC)
            * F.col("n_tot")
            * (F.col("w_s") / F.col("w_tot"))
            / F.col("n_s"),
        ).alias("p_keep"),
    )
    u = ((F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223)) % F.lit(_M32)) / F.lit(
        float(_M32)
    )
    return (
        docs.join(F.broadcast(p), "source")
        .groupBy("source", "n_s")
        .agg(F.count(F.when(u < F.col("p_keep"), 1)).alias("n_kept"))
        .select(
            "source", F.col("n_s").cast("long").alias("n_docs"), "n_kept"
        )
    )


_P07_PARTS = 8  # fixed range-partition count — deterministic plan


@register(
    "p07_training_order",
    late=True,
    oracle="""
    WITH h AS (
      SELECT doc_id, source,
             ((doc_id * 2654435761 + 88172645) % 4294967296) AS shuf
      FROM documents
    )
    SELECT CAST(row_number() OVER (ORDER BY shuf, doc_id) - 1 AS BIGINT) AS position,
           doc_id, source, shuf
    FROM h
    """,
    doc="Epoch-seeded GLOBAL training-order shuffle: every doc gets a "
    "deterministic LCG sort key (seed baked into the increment, so "
    "epoch 2 is one constant away) and a contiguous 0-based global "
    "position. The naive formulation — row_number() over a global "
    "window — executes on ONE task and is the canonical 100 TB "
    "driver-choke; this plan is the zipWithIndex discipline instead: "
    "(1) repartitionByRange + sortWithinPartitions on (key, id) — a "
    "range-partitioned sort, Spark's own ORDER BY machinery; (2) one "
    "tiny job counts rows per partition (output = #partitions rows, "
    "the only collect); (3) a mapInPandas pass assigns "
    "offset[pid] + local running index, Arrow-batched, one sweep, no "
    "second shuffle. Cost at any scale: one range shuffle + one "
    "map pass — identical to what a global sort alone costs. "
    "Determinism does not depend on partition count; the oracle is a "
    "plain window row_number over the same key.",
)
def p07_training_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        "source",
        ((F.col("doc_id") * F.lit(2654435761) + F.lit(88172645)) % F.lit(_M32)).alias("shuf"),
    )
    from .dedup import _keyed_persist

    ordered = _keyed_persist(
        "p07.ordered",
        keyed.repartitionByRange(_P07_PARTS, "shuf", "doc_id")
        .sortWithinPartitions("shuf", "doc_id")
        .withColumn("pid", F.spark_partition_id()),
    )
    # partition histogram: #partitions rows — the scalar-side collect
    # every zipWithIndex implementation does (Spark's RDD.zipWithIndex
    # counts the already-materialized RDD). The persist above is what
    # makes that true here too: without it the histogram job and the
    # output job each run the full range shuffle + sort, and the two
    # executions would also have to partition identically
    sizes = {r["pid"]: r["n"] for r in ordered.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in range(_P07_PARTS):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    boff = spark.sparkContext.broadcast(offsets)

    schema = "position long, doc_id long, source string, shuf long"

    def assign(batches):
        seen = 0
        base = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = boff.value[int(pdf["pid"].iloc[0])]
            out = pd.DataFrame(
                {
                    "position": range(base + seen, base + seen + len(pdf)),
                    "doc_id": pdf["doc_id"],
                    "source": pdf["source"],
                    "shuf": pdf["shuf"],
                }
            )
            seen += len(pdf)
            yield out

    # cache released by the NEXT p07 invocation (_keyed_persist — the
    # returned frame is lazy, so an eager unpersist here would force
    # the output job back through a second full shuffle+sort)
    return ordered.mapInPandas(assign, schema=schema)


@register(
    "p08_training_export",
    late=True,
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source, text,
             CASE
               WHEN contains(' ' || text || ' ', ' the ') OR contains(' ' || text || ' ', ' and ')
                    OR contains(' ' || text || ' ', ' of ') THEN 'en'
               WHEN contains(' ' || text || ' ', ' der ') OR contains(' ' || text || ' ', ' und ')
                    OR contains(' ' || text || ' ', ' die ') THEN 'de'
               WHEN contains(' ' || text || ' ', ' le ') OR contains(' ' || text || ' ', ' et ')
                    OR contains(' ' || text || ' ', ' la ') THEN 'fr'
               WHEN contains(' ' || text || ' ', ' el ') OR contains(' ' || text || ' ', ' y ')
                    OR contains(' ' || text || ' ', ' los ') THEN 'es'
               WHEN contains(' ' || text || ' ', '的') OR contains(' ' || text || ' ', '是') THEN 'zh'
               ELSE 'unknown'
             END AS pred_lang,
             length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok_cnt
      FROM documents
    ), gated AS (
      SELECT * FROM scored
      WHERE pred_lang <> 'unknown' AND alpha_ratio >= 0.5
        AND length(text) BETWEEN 100 AND 2000
    ), deduped AS (
      SELECT * FROM gated
      QUALIFY row_number() OVER (PARTITION BY fp ORDER BY doc_id) = 1
    ), split AS (
      SELECT doc_id, source, pred_lang, tok_cnt,
             CASE WHEN ((((doc_id * 2654435761 + 1013904223) % 4294967296)
                          * 69069 + 12345) % 4294967296) % 100 < 90
                  THEN 'train' ELSE 'valid' END AS split
      FROM deduped
    ), packed AS (
      SELECT doc_id, source, pred_lang, split,
             sum(tok_cnt) OVER (
               PARTITION BY split, source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             tok_cnt
      FROM split
    )
    SELECT doc_id, source, pred_lang, split,
           CAST((cum - tok_cnt) // {_PACK_BUDGET} AS BIGINT) AS bin_id
    FROM packed
    """,
    doc="END-TO-END training-data export manifest, composed as ONE "
    "declarative plan: language gate + quality gates (scan-fused "
    "predicates, zero shuffles) -> exact-dedup keep-first (one window "
    "shuffle on the content fingerprint) -> deterministic 90/10 "
    "train/valid split (map-only LCG, p02's hash) -> per-(split, "
    "source) sequence packing into 2048-token bins (one window "
    "shuffle). Each row of the output is a doc's training assignment "
    "(split + bin) — the manifest a data loader consumes. THREE "
    "shuffles total at any corpus size, every stage reused from "
    "t02/t03/d01/p02/p05 — the compositionality argument: operators "
    "are Column-algebra building blocks Catalyst fuses, not opaque "
    "passes.",
)
def p08_training_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "source",
        "text",
        lang_pred(F.col("text")).alias("pred_lang"),
        (F.length(F.regexp_replace("text", "[^a-z]", "")) / F.length("text")).alias("alpha_ratio"),
        fingerprint(F.col("text")).alias("fp"),
        F.size(tokens(F.col("text"))).cast("long").alias("tok_cnt"),
    )
    gated = scored.filter(
        (F.col("pred_lang") != "unknown")
        & (F.col("alpha_ratio") >= 0.5)
        & (F.length("text") >= 100)
        & (F.length("text") <= 2000)
    )
    wd = Window.partitionBy("fp").orderBy("doc_id")
    deduped = gated.withColumn("rn", F.row_number().over(wd)).filter(F.col("rn") == 1)
    h1 = (F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223)) % F.lit(_M32)
    h2 = (h1 * F.lit(69069) + F.lit(12345)) % F.lit(_M32)
    split = deduped.select(
        "doc_id",
        "source",
        "pred_lang",
        "tok_cnt",
        F.when(h2 % 100 < 90, F.lit("train")).otherwise(F.lit("valid")).alias("split"),
    )
    wp = (
        Window.partitionBy("split", "source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = split.withColumn("cum", F.sum("tok_cnt").over(wp))
    return packed.select(
        "doc_id",
        "source",
        "pred_lang",
        "split",
        F.floor((F.col("cum") - F.col("tok_cnt")) / _PACK_BUDGET).cast("long").alias("bin_id"),
    )


@register(
    "p09_dataset_card",
    late=True,
    oracle="""
    WITH sig AS (
      SELECT source,
             len(string_split_regex(trim(text), '\\s+')) AS n_tok,
             length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS alpha,
             md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp,
             CASE WHEN length(text) BETWEEN 100 AND 2000 THEN 1 ELSE 0 END AS len_ok
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS total_tokens,
           round(avg(alpha), 4) AS mean_alpha,
           sum(len_ok) * 1.0 / count(*) AS len_ok_rate,
           1.0 - count(DISTINCT fp) * 1.0 / count(*) AS dup_rate
    FROM sig
    GROUP BY source
    """,
    doc="Per-source DATASET CARD: the one-pass summary a training-"
    "data curator publishes next to a corpus release — doc/token "
    "volume, mean alpha quality, length-gate pass rate, and the "
    "exact-duplicate rate (1 - distinct fingerprints / docs). All "
    "signals reuse the t03/d01 column definitions, composed into a "
    "SINGLE aggregation: the map side computes every per-doc signal "
    "fused into the scan stage, and the one shuffle carries "
    "(source, partial aggregates) plus the fingerprint-distinct "
    "expand — at 100 TB this is one pass over the corpus, full "
    "stop. Ratios of integer counts are exact; the double mean "
    "rounds to 4 (sum order varies across engines).",
)
def p09_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    sig = docs.select(
        "source",
        F.size(tokens(F.col("text"))).alias("n_tok"),
        (F.length(F.regexp_replace("text", "[^a-z]", "")) / F.length("text")).alias("alpha"),
        fingerprint(F.col("text")).alias("fp"),
        F.when((F.length("text") >= 100) & (F.length("text") <= 2000), 1)
        .otherwise(0)
        .alias("len_ok"),
    )
    return sig.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").cast("long").alias("total_tokens"),
        F.round(F.avg("alpha"), 4).alias("mean_alpha"),
        (F.sum("len_ok") * F.lit(1.0) / F.count(F.lit(1))).alias("len_ok_rate"),
        (F.lit(1.0) - F.countDistinct("fp") * F.lit(1.0) / F.count(F.lit(1))).alias("dup_rate"),
    )


@register(
    "p10_leakage_safe_split",
    late=True,
    oracle=r"""
    WITH f AS (
      SELECT doc_id,
             md5(lower(regexp_replace(trim(text), '\s+', ' ', 'g'))) AS fp
      FROM documents
    )
    SELECT doc_id, fp,
           CASE WHEN substr(fp, 1, 1) <= 'd' THEN 'train'
                WHEN substr(fp, 1, 1) = 'e' THEN 'validation'
                ELSE 'test' END AS split
    FROM f
    """,
    doc="Leakage-safe train/validation/test split: the split key is "
    "the content-group fingerprint, NOT the doc_id — every member of "
    "a duplicate group lands in the SAME split, so eval can never "
    "score a near-copy of a training document (the contamination "
    "mode a row-hash split silently permits). Assignment hashes the "
    "group key deterministically (first md5 hex char: 0-d train "
    "~87.5%, e validation, f test) — reshuffling data, adding docs, "
    "or re-running never moves an existing group across splits "
    "(stable splits are what makes eval results comparable across "
    "dataset versions). Map-only: one fingerprint projection, no "
    "shuffle, no randomness. Swap the fp for d07/d11 cluster ids to "
    "extend the guarantee from exact to fuzzy/semantic duplicates — "
    "same one-line change, same plan shape.",
)
def p10_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fp = fingerprint(F.col("text"))
    first = F.substring(fp, 1, 1)
    split = (
        F.when(first <= "d", "train")
        .when(first == "e", "validation")
        .otherwise("test")
    )
    return docs.select("doc_id", fp.alias("fp"), split.alias("split"))


@register(
    "p11_data_quality_checks",
    late=True,
    oracle="""
    SELECT 'doc_text_completeness' AS check_name,
           (SELECT count(*) FILTER (WHERE text IS NOT NULL AND length(trim(text)) > 0)
                  * 1.0 / count(*) FROM documents) AS metric,
           CASE WHEN (SELECT count(*) FILTER (WHERE text IS NOT NULL AND length(trim(text)) > 0)
                             * 1.0 / count(*) FROM documents) >= 0.99
                THEN 1 ELSE 0 END AS passed
    UNION ALL
    SELECT 'doc_id_uniqueness',
           (SELECT count(DISTINCT doc_id) * 1.0 / count(*) FROM documents),
           CASE WHEN (SELECT count(DISTINCT doc_id) * 1.0 / count(*) FROM documents) = 1.0
                THEN 1 ELSE 0 END
    UNION ALL
    SELECT 'doc_lang_in_domain',
           (SELECT count(*) FILTER (WHERE lang IN ('en','de','fr','es','zh'))
                  * 1.0 / count(*) FROM documents),
           CASE WHEN (SELECT count(*) FILTER (WHERE lang IN ('en','de','fr','es','zh'))
                             * 1.0 / count(*) FROM documents) >= 0.95
                THEN 1 ELSE 0 END
    UNION ALL
    SELECT 'doc_n_chars_consistent',
           (SELECT count(*) FILTER (WHERE n_chars = length(text))
                  * 1.0 / count(*) FROM documents),
           CASE WHEN (SELECT count(*) FILTER (WHERE n_chars = length(text))
                             * 1.0 / count(*) FROM documents) = 1.0
                THEN 1 ELSE 0 END
    UNION ALL
    SELECT 'orders_custkey_referential',
           (SELECT count(*) * 1.0 FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)),
           CASE WHEN (SELECT count(*) FROM orders o
                      WHERE NOT EXISTS (SELECT 1 FROM customer c
                                        WHERE c.c_custkey = o.o_custkey)) = 0
                THEN 1 ELSE 0 END
    """,
    doc="Declarative data-quality constraint suite (the Deequ / "
    "Great-Expectations component of a training pipeline): one "
    "report row per check — text completeness >= 99%, doc_id "
    "uniqueness, lang-domain membership >= 95%, n_chars/text "
    "consistency, and orders->customer referential integrity as an "
    "anti-join violation count. All four docs-side checks fuse into "
    "ONE aggregation over ONE scan (conditional sums + a distinct "
    "count; exact integer counts, so the ratios are identical IEEE "
    "divisions in both engines) and unpivot into report rows via an "
    "exploded struct array; the referential check is a left-anti "
    "join that shuffles on the key and scales linearly. The gate a "
    "pipeline runs before promoting a snapshot to training.",
)
def p11_data_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")

    # ONE pass over documents for all four docs-side checks (p09's
    # one-pass discipline, VERDICT r5 item 6): conditional sums + one
    # distinct count fused into a single aggregation — 1 scan instead
    # of 4; at 100 TB that is 3 avoided full-table reads per gate run.
    # The 1-row result unpivots into the report via an exploded struct
    # array (plain projection, no extra scan or exchange).
    stats = docs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (
                F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
            ).cast("int")
        ).alias("n_complete"),
        F.countDistinct("doc_id").alias("n_distinct"),
        F.sum(F.col("lang").isin("en", "de", "fr", "es", "zh").cast("int")).alias(
            "n_lang"
        ),
        F.sum((F.col("n_chars") == F.length("text")).cast("int")).alias(
            "n_consistent"
        ),
    )

    def check(name: str, num, threshold: float, exact: bool):
        metric = num * F.lit(1.0) / F.col("n")
        passed = (metric == threshold) if exact else (metric >= threshold)
        return F.struct(
            F.lit(name).alias("check_name"),
            metric.alias("metric"),
            passed.cast("int").alias("passed"),
        )

    doc_checks = stats.select(
        F.explode(
            F.array(
                check("doc_text_completeness", F.col("n_complete"), 0.99, False),
                check("doc_id_uniqueness", F.col("n_distinct"), 1.0, True),
                check("doc_lang_in_domain", F.col("n_lang"), 0.95, False),
                check("doc_n_chars_consistent", F.col("n_consistent"), 1.0, True),
            )
        ).alias("r")
    ).select("r.*")
    violations = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .agg(F.count(F.lit(1)).cast("double").alias("metric"))
        .select(
            F.lit("orders_custkey_referential").alias("check_name"),
            "metric",
            (F.col("metric") == 0.0).cast("int").alias("passed"),
        )
    )
    return doc_checks.unionByName(violations)


_P12_HEAD = 64  # near-dup group key: shared long prefix (the d10 family)
_P12_RATE = 0.5  # target sampling rate for unique content


@register(
    "p12_dedup_weighted_sample",
    late=True,
    oracle=f"""
    WITH g AS (
      SELECT doc_id, source,
             substring(trim(text), 1, {_P12_HEAD}) AS grp
      FROM documents
    ), sz AS (
      SELECT grp, count(*) AS n_copies FROM g GROUP BY grp
    )
    SELECT g.doc_id, CAST(sz.n_copies AS BIGINT) AS n_copies,
           round(1.0 / sz.n_copies, 6) AS w
    FROM g JOIN sz USING (grp)
    WHERE ((g.doc_id * 2654435761 + 1013904223) % 4294967296)
          / 4294967296.0 < {_P12_RATE} * 1.0 / sz.n_copies
    """,
    doc="Dedup-aware SAMPLE REWEIGHTING (soft dedup — the "
    "SlimPajama/CCNet-style alternative to hard removal): every doc "
    "keeps a sampling weight 1/n_copies of its near-dup group "
    f"(shared {_P12_HEAD}-char prefix, the d10 exact-substring "
    "family), so each unique CONTENT gets equal expected "
    "representation in the training sample regardless of how many "
    "copies the crawl found — hard dedup throws information away "
    "(which copy survived?), reweighting preserves it. Selection is "
    "the house deterministic LCG uniform on doc_id (p02/p04/p06's "
    "discipline) at rate "
    f"{_P12_RATE}/n_copies, so both engines pick the identical row "
    "set — integer LCG arithmetic is exact in int64 on both. One "
    "groupBy for sizes + one equi-join back: linear, no pair space; "
    "at 100 TB the group key would be d11's cluster_id (iterative) "
    "— the prefix key here keeps the weighting itself "
    "oracle-checkable end to end.",
)
def p12_dedup_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.select(
        "doc_id", F.substring(F.trim(F.col("text")), 1, _P12_HEAD).alias("grp")
    )
    sz = g.groupBy("grp").agg(F.count(F.lit(1)).alias("n_copies"))
    u = ((F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223)) % F.lit(_M32)) / F.lit(
        float(_M32)
    )
    return (
        g.join(sz, "grp")
        .filter(u < F.lit(_P12_RATE) * 1.0 / F.col("n_copies"))
        .select(
            "doc_id",
            F.col("n_copies").cast("long").alias("n_copies"),
            F.round(1.0 / F.col("n_copies"), 6).alias("w"),
        )
    )


# --------------------------------------------------------------------------
# p13 — temperature-scaled domain mixture sampling
# --------------------------------------------------------------------------

_P13_ALPHA = 0.5  # mixing temperature (alpha<1 flattens toward uniform)
_P13_TARGET = 250  # expected docs in the mixed sample


@register(
    "p13_temperature_mix",
    late=True,
    oracle=f"""
    WITH n AS (
      SELECT lang, count(*) AS n_d FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(n_d) AS n_all, sum(pow(n_d * 1.0 / (SELECT sum(n_d) FROM n),
                                        {_P13_ALPHA})) AS z
      FROM n
    ), r AS (
      SELECT lang, CAST(n_d AS BIGINT) AS n_d,
             round(least(1.0,
               {_P13_TARGET} * pow(n_d * 1.0 / tot.n_all, {_P13_ALPHA})
                 / (tot.z * n_d)), 6) AS rate
      FROM n CROSS JOIN tot
    )
    SELECT d.doc_id, d.lang, r.n_d, r.rate
    FROM documents d JOIN r USING (lang)
    WHERE ((d.doc_id * 2654435761 + 1013904223) % 4294967296)
          / 4294967296.0 < r.rate
    """,
    doc="TEMPERATURE-SCALED domain mixture (the multilingual-corpus "
    "balancing rule of mC4/XLM-R: sample domain d with probability "
    "proportional to p_d^alpha, alpha<1 flattening the head domain "
    "toward uniform so low-resource slices survive): per-lang "
    "counts -> renormalized p^alpha mixture -> per-domain sampling "
    f"rate TARGET*q_d/n_d (alpha={_P13_ALPHA}, target={_P13_TARGET}, "
    "capped at 1). Selection is the house deterministic LCG uniform "
    "on doc_id (p02/p12's discipline) so both engines pick the "
    "identical row set; the per-domain rate is an AGGREGATE rounded "
    "to 6 decimals before the comparison, so the filter boundary is "
    "bit-identical across engines (pow's last ulp can differ — "
    "rounding the aggregate is the house rule, and u is exact "
    "integer arithmetic over 2^32). Shape at 100 TB: one tiny "
    "domain-count agg (partial-agg map-side), the 5-row rate table "
    "broadcast back, a stateless per-row filter — linear, no "
    "shuffle of the corpus itself.",
)
def p13_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_d"))
    tot = (
        n.crossJoin(F.broadcast(n.agg(F.sum("n_d").alias("n_all"))))
        .agg(
            F.max("n_all").alias("n_all"),
            F.sum(F.pow(F.col("n_d") * 1.0 / F.col("n_all"), _P13_ALPHA)).alias("z"),
        )
    )
    rates = (
        n.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            F.col("n_d").cast("long").alias("n_d"),
            F.round(
                F.least(
                    F.lit(1.0),
                    _P13_TARGET
                    * F.pow(F.col("n_d") * 1.0 / F.col("n_all"), _P13_ALPHA)
                    / (F.col("z") * F.col("n_d")),
                ),
                6,
            ).alias("rate"),
        )
    )
    u = ((F.col("doc_id") * F.lit(2654435761) + F.lit(1013904223)) % F.lit(_M32)) / F.lit(
        float(_M32)
    )
    return (
        docs.select("doc_id", "lang")
        .join(F.broadcast(rates), "lang")
        .filter(u < F.col("rate"))
        .select("doc_id", "lang", "n_d", "rate")
    )


# --------------------------------------------------------------------------
# p14 — data-constrained epoch/repeat plan (Muennighoff et al. 2023)
# --------------------------------------------------------------------------

_P14_BUDGET_X = 3.0  # token budget as a multiple of the corpus size
_P14_MAX_EPOCHS = 4.0  # repetition ceiling: >4 epochs adds ~no value


@register(
    "p14_epoch_repeat_plan",
    late=True,
    oracle=f"""
    WITH t AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_tok
      FROM documents GROUP BY lang
    ), tot AS (
      SELECT sum(n_tok) AS all_tok, count(*) AS k FROM t
    ), plan AS (
      SELECT lang, n_docs, n_tok,
             round({_P14_BUDGET_X} * tot.all_tok / tot.k, 2) AS target_tok,
             round(least({_P14_MAX_EPOCHS},
                   ({_P14_BUDGET_X} * tot.all_tok / tot.k) / n_tok), 6) AS epochs
      FROM t CROSS JOIN tot
    )
    SELECT lang, n_docs, n_tok, target_tok, epochs,
           round(epochs * n_tok, 2) AS achieved_tok,
           round(greatest(0, target_tok - round(epochs * n_tok, 2)), 2)
             AS deficit_tok
    FROM plan
    """,
    doc="Data-constrained EPOCH/REPEAT plan (Muennighoff et al. 2023, "
    "'Scaling Data-Constrained Language Models'): given a token "
    f"budget of {_P14_BUDGET_X}x the corpus and an equal per-language "
    "target share (the balanced-multilingual allocation), compute "
    "per language the repeat factor epochs = min(MAX_EPOCHS, "
    "target/available) — the paper's finding that repetition beyond "
    f"~{int(_P14_MAX_EPOCHS)} epochs adds almost no value is the cap; "
    "head languages get epochs<1 (subsampled), tail languages repeat "
    "up to the cap and report an unfillable DEFICIT that the curator "
    "must cover with new data, not more repetition. Plan: one "
    "partial->final agg over the corpus (map-side combine on lang), "
    "a k-row totals broadcast, pure Column arithmetic — the corpus "
    "is scanned exactly once and nothing else scales with it. "
    "Rounding discipline: epochs is rounded BEFORE the achieved/"
    "deficit arithmetic, so every derived number is bit-identical "
    "across engines (the p13 house rule for pow/div last-ulp skew).",
)
def p14_epoch_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import tokens

    docs = load_table(spark, sf_dir, "documents")
    t = (
        docs.select("lang", F.size(tokens(F.col("text"))).alias("tk"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("tk").cast("long").alias("n_tok"),
        )
    )
    tot = t.agg(
        F.sum("n_tok").alias("all_tok"), F.count(F.lit(1)).alias("k")
    )
    target = F.lit(_P14_BUDGET_X) * F.col("all_tok") / F.col("k")
    epochs = F.round(
        F.least(F.lit(_P14_MAX_EPOCHS), target / F.col("n_tok")), 6
    )
    achieved = F.round(F.col("epochs") * F.col("n_tok"), 2)
    return (
        t.join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tok",
            F.round(target, 2).alias("target_tok"),
            epochs.alias("epochs"),
        )
        .select(
            "*",
            achieved.alias("achieved_tok"),
        )
        .select(
            "*",
            F.round(
                F.greatest(F.lit(0.0), F.col("target_tok") - F.col("achieved_tok")), 2
            ).alias("deficit_tok"),
        )
    )


# --------------------------------------------------------------------------
# p15 — tokenizer-faithful epoch/repeat plan: p14's data-constrained
# budget arithmetic over BPE SUBWORD counts (VERDICT r8 item 4)
# --------------------------------------------------------------------------


@register(
    "p15_bpe_epoch_repeat_plan",
    late=True,
    oracle=None,  # BPE encoding is not SQL-expressible; dual-path
    # parity lives in tests/test_dedup_quality.py (pure-Python twin
    # recomputes the whole plan from the parquet, exact compare) and
    # the tokenizer round-trip is pinned there too — the codec-op
    # discipline (m02/m05).
    doc="Tokenizer-faithful epoch/repeat plan (VERDICT r8 item 4): "
    "identical Muennighoff-style budget arithmetic to p14, but "
    "counting SUBWORD tokens from a corpus-trained deterministic BPE "
    "(functions/bpe.py) instead of whitespace words — production "
    "budgets are BPE tokens, and head/tail languages tokenize to "
    "materially different subword/word ratios, so the whitespace "
    "plan misallocates. Training is a bounded deterministic sample "
    "(fixed driver collect regardless of corpus size — the real-"
    "world tokenizer-training shape); encoding is one Arrow pandas_"
    "udf scan with a per-batch word memo; the plan itself is p14's "
    "partial->final agg + k-row broadcast. The corpus is scanned "
    "exactly once; nothing but the fixed sample reaches the driver.",
)
def p15_bpe_epoch_repeat_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bpe import corpus_bpe, with_bpe_token_count

    docs = load_table(spark, sf_dir, "documents")
    merges = corpus_bpe(spark, sf_dir)
    t = (
        with_bpe_token_count(docs, merges)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_bpe").cast("long").alias("n_tok"),
        )
    )
    tot = t.agg(F.sum("n_tok").alias("all_tok"), F.count(F.lit(1)).alias("k"))
    target = F.lit(_P14_BUDGET_X) * F.col("all_tok") / F.col("k")
    epochs = F.round(F.least(F.lit(_P14_MAX_EPOCHS), target / F.col("n_tok")), 6)
    achieved = F.round(F.col("epochs") * F.col("n_tok"), 2)
    return (
        t.join(F.broadcast(tot))
        .select(
            "lang",
            "n_docs",
            "n_tok",
            F.round(target, 2).alias("target_tok"),
            epochs.alias("epochs"),
        )
        .select("*", achieved.alias("achieved_tok"))
        .select(
            "*",
            F.round(
                F.greatest(F.lit(0.0), F.col("target_tok") - F.col("achieved_tok")), 2
            ).alias("deficit_tok"),
        )
    )


# --------------------------------------------------------------------------
# p16 — curriculum ordering: easy-to-hard difficulty deciles, shuffled
# within decile (Bengio et al. 2009 curriculum learning, the
# length-curriculum variant production LM pipelines use for warmup)
# --------------------------------------------------------------------------

_P16_BUCKETS = 10


def _zip_index(
    df: DataFrame, sort_cols: list[str], persist_key: str
) -> tuple[DataFrame, int]:
    """p07's zipWithIndex discipline as a reusable step: global 0-based
    `idx` in (sort_cols) order via range repartition + in-partition
    sort + a #partitions-row offset histogram. No single-partition
    window, no global sort exchange. Returns (frame, total row count)
    — the count is free from the histogram, so callers never schedule
    a separate count job."""
    import pandas as pd

    from .dedup import _keyed_persist

    ordered = _keyed_persist(
        persist_key,
        df.repartitionByRange(_P07_PARTS, *sort_cols)
        .sortWithinPartitions(*sort_cols)
        .withColumn("pid", F.spark_partition_id()),
    )
    sizes = {
        r["pid"]: r["n"]
        for r in ordered.groupBy("pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in range(_P07_PARTS):
        offsets[pid] = acc
        acc += sizes.get(pid, 0)
    boff = df.sparkSession.sparkContext.broadcast(offsets)
    out_cols = [c for c in ordered.columns if c != "pid"]
    schema = ", ".join(
        ["idx long"] + [f"{c} {t}" for c, t in ordered.dtypes if c != "pid"]
    )

    def assign(batches):
        seen, base = 0, None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            if base is None:
                base = boff.value[int(pdf["pid"].iloc[0])]
            out = pd.DataFrame({"idx": range(base + seen, base + seen + len(pdf))})
            for c in out_cols:
                out[c] = pdf[c].values
            seen += len(pdf)
            yield out

    return ordered.mapInPandas(assign, schema=schema), acc


@register(
    "p16_curriculum_order",
    late=True,
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)
               AS difficulty,
             (doc_id * 2654435761 + 88172645) % 4294967296 AS shuf
      FROM documents
    ), n AS (SELECT count(*) AS n FROM d),
    ranked AS (
      SELECT d.*,
             (row_number() OVER (ORDER BY difficulty, doc_id) - 1)
               * {_P16_BUCKETS} // n.n AS bucket
      FROM d, n
    )
    SELECT CAST(row_number() OVER (ORDER BY bucket, shuf, doc_id) - 1 AS BIGINT)
             AS train_pos,
           doc_id, difficulty, CAST(bucket AS BIGINT) AS bucket
    FROM ranked
    """,
    doc="CURRICULUM training order (Bengio et al. 2009; the "
    "length-based variant LM pipelines run for warmup): documents "
    "are ranked by difficulty (token count — the standard cheap "
    "proxy), split into ten equal-mass difficulty deciles by GLOBAL "
    "rank, then the training order is decile-major with a "
    "deterministic LCG shuffle WITHIN each decile — easy batches "
    "first, hard last, no intra-decile length bias. Both global "
    "orderings (the difficulty rank and the final position) use "
    "p07's zipWithIndex discipline — range repartition + "
    "in-partition sort + a #partitions-row offset histogram — so "
    "there is NO single-partition row_number window and no global "
    "sort exchange anywhere; at 100 TB both passes are ordinary "
    "range shuffles. Bucket boundaries are the exact integer formula "
    "(rank*k)//n, reproduced verbatim in the oracle (ntile's "
    "remainder rule differs — pinning the formula keeps both "
    "engines bit-identical).",
)
def p16_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import tokens

    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(tokens(F.col("text"))).cast("long").alias("difficulty"),
        ((F.col("doc_id") * F.lit(2654435761) + F.lit(88172645)) % F.lit(_M32)).alias("shuf"),
    )
    ranked, n = _zip_index(d, ["difficulty", "doc_id"], "p16.rank")
    # Exact integer floor division (SQL DIV), matching the oracle's
    # (rank*k)//n bit-for-bit — double division + cast('long') has a
    # 0.5-ulp boundary that could flip a bucket at ~1e14 rows.
    bucketed = ranked.withColumn(
        "bucket", F.expr(f"(idx * {_P16_BUCKETS}) DIV {int(n)}")
    ).drop("idx")
    final, _ = _zip_index(bucketed, ["bucket", "shuf", "doc_id"], "p16.final")
    return final.select(
        F.col("idx").alias("train_pos"),
        "doc_id",
        "difficulty",
        "bucket",
    )


# --------------------------------------------------------------------------
# p17 — DSIR-style importance resampling (Xie et al. 2023, 'Data
# Selection for Language Models via Importance Resampling'): weight
# raw docs by hashed-n-gram log-likelihood ratio toward a target domain
# --------------------------------------------------------------------------

_P17_B = 4096  # hashed feature buckets (the paper's hashed n-gram trick)


@register(
    "p17_dsir_weights",
    late=True,
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang = 'en' AS is_target,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
      WHERE length(trim(text)) > 0
    ), ct AS (
      SELECT w, count(*) AS c FROM b WHERE is_target GROUP BY w
    ), cr AS (
      SELECT w, count(*) AS c FROM b WHERE NOT is_target GROUP BY w
    ), tt AS (SELECT sum(c) AS t FROM ct),
       tr AS (SELECT sum(c) AS t FROM cr)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tok,
           round(sum(
             ln((coalesce(ct.c, 0) + 1.0) / (tt.t + {_P17_B}))
             - ln((coalesce(cr.c, 0) + 1.0) / (tr.t + {_P17_B}))
           ), 4) AS log_ratio,
           sum(ln((coalesce(ct.c, 0) + 1.0) / (tt.t + {_P17_B}))
               - ln((coalesce(cr.c, 0) + 1.0) / (tr.t + {_P17_B}))) > 0
             AS selected
    FROM b
    LEFT JOIN ct USING (w)
    LEFT JOIN cr USING (w), tt, tr
    WHERE NOT b.is_target
    GROUP BY doc_id
    """,
    doc="DSIR importance weighting (Xie et al. 2023): score every RAW "
    "document by the log-likelihood ratio of its hashed-n-gram "
    "features under a TARGET-domain bag-of-buckets model vs the raw "
    "model — the paper's trick is that hashing n-grams into a fixed "
    f"bucket space ({_P17_B} here) makes both models countable at "
    "corpus scale with two partial aggs, no vocabulary explosion. "
    "Target = lang='en' docs (the domain to match), raw = the rest; "
    "Laplace-smoothed bucket probabilities; a doc's log-ratio > 0 "
    "means it leans target and is kept by the resampling step "
    "(the paper samples with these as Gumbel-perturbed weights; the "
    "deterministic threshold is the oracle-checkable variant — on "
    "the uniform synthetic corpus no raw doc crosses 0, so the "
    "VALUE column is the verified deliverable — and p02's LCG "
    "supplies reproducible sampling where needed). Feature space: "
    "the oracled entry counts exact unigrams (both engines compute "
    "identical keys); production swaps the group key for "
    f"pmod(xxhash64(w), {_P17_B}) — the paper's hashing exists only "
    "to BOUND the model size, and the swap is one line (an engine-"
    "specific hash cannot be an oracle key: DuckDB cannot reproduce "
    "Spark's xxhash64, and matching by collision luck would be "
    "fragile). Plan: explode tokens (one scan), two word-count aggs "
    "(map-side combine), broadcast 1-row totals, two equi-joins "
    "back on the feature key, per-doc agg — everything linear and "
    "hash-partitioned; the hashed-bucket variant bounds the count "
    "tables at B rows so they broadcast at 100 TB. "
    "Rounding: only the per-doc SUM is rounded (4dp — the t13 "
    "discipline for cross-engine double aggregation).",
)
def p17_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    b = docs.select(
        "doc_id",
        (F.col("lang") == "en").alias("is_target"),
        F.explode(tokens(F.col("text"))).alias("w"),
    )
    ct = b.filter("is_target").groupBy("w").agg(F.count(F.lit(1)).alias("tc"))
    cr = b.filter(~F.col("is_target")).groupBy("w").agg(F.count(F.lit(1)).alias("rc"))
    tt = ct.agg(F.sum("tc").alias("t_tot"))
    tr = cr.agg(F.sum("rc").alias("r_tot"))
    term = F.log((F.coalesce(F.col("tc"), F.lit(0)) + 1.0) / (F.col("t_tot") + _P17_B)) - F.log(
        (F.coalesce(F.col("rc"), F.lit(0)) + 1.0) / (F.col("r_tot") + _P17_B)
    )
    return (
        b.filter(~F.col("is_target"))
        .join(F.broadcast(ct), "w", "left")
        .join(F.broadcast(cr), "w", "left")
        .join(F.broadcast(tt))
        .join(F.broadcast(tr))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tok"),
            F.round(F.sum(term), 4).alias("log_ratio"),
            (F.sum(term) > 0).alias("selected"),
        )
    )


# --------------------------------------------------------------------------
# p18 — decontamination: the REMOVAL step p04's flags feed (drop
# corpus docs that share eval-set 8-grams before training)
# --------------------------------------------------------------------------


@register(
    "p18_decontaminate",
    late=True,
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), g AS (
      SELECT doc_id,
             unnest(list_distinct(list_transform(
               generate_series(1, len(ws) - 7),
               i -> array_to_string(ws[i:i+7], ' ')))) AS gram
      FROM w WHERE len(ws) >= 8
    ), hits AS (
      SELECT c.doc_id AS corpus_id, count(*) AS n_shared,
             count(DISTINCT e.doc_id) AS n_evals
      FROM g c JOIN g e ON c.gram = e.gram
      WHERE e.doc_id % 19 = 0 AND c.doc_id % 19 <> 0
      GROUP BY 1
      HAVING count(*) >= 2
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n_shared, 0) AS BIGINT) AS n_shared,
           CAST(coalesce(h.n_evals, 0) AS BIGINT) AS n_evals,
           h.corpus_id IS NOT NULL AS dropped
    FROM documents d LEFT JOIN hits h ON d.doc_id = h.corpus_id
    WHERE d.doc_id % 19 <> 0
    """,
    doc="DECONTAMINATION — the removal step p04's flags feed (GPT-3 "
    "appendix C, PaLM, Llama all drop train docs overlapping eval "
    "benchmarks; p04 is the detector, this op acts on it): every "
    "corpus document sharing >= 2 distinct 8-gram shingles with ANY "
    "eval doc is DROPPED from the training set, with the audit "
    "columns a release review needs (shared-gram count, number of "
    "eval docs hit, the drop flag). Plan: p04's blocked shingle "
    "equi-join collapsed one level further — groupBy corpus "
    "doc instead of (corpus, eval) pairs, so the output is linear in "
    "corpus size — then one LEFT join back to the corpus spine. Join "
    "key is md5 of the gram text (engine-neutral, collision-safe vs "
    "the oracle's gram-text join). At 100 TB a fixed-size eval side "
    "broadcasts via AQE (no forced hint — see the join comment) and "
    "dropped docs never reach the training export (p08 anti-joins "
    "this flag).",
)
def p18_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    from .dedup import _keyed_persist

    docs = load_table(spark, sf_dir, "documents")
    # md5 of the gram text, not a 64-bit hash: an engine-specific
    # 64-bit join-key collision between distinct grams would inflate
    # n_shared and silently diverge from the oracle's gram-text join
    # (the d10/d13/d15 digest discipline; p17's docstring names the
    # same risk). Round-14: the digests come out of one Arrow batch
    # stage persisted PRE-explode (p04's discipline — the interpreted
    # HOF construction ran ~2.5 s per pass and once per join side).
    g_udf = F.pandas_udf(
        _gram8_md5_batch, T.ArrayType(T.StringType())
    ).asNondeterministic()
    ga = _keyed_persist(
        "p18.ga", docs.select("doc_id", g_udf(F.col("text")).alias("ga"))
    )
    g = ga.select("doc_id", F.explode("ga").alias("gh"))
    ev = g.filter(F.col("doc_id") % 19 == 0).select(
        F.col("doc_id").alias("eval_id"), "gh"
    )
    corp = g.filter(F.col("doc_id") % 19 != 0).select(
        F.col("doc_id").alias("corpus_id"), "gh"
    )
    # No forced broadcast hint: real eval benchmarks are fixed-size
    # and AQE/autoBroadcastJoinThreshold will broadcast them anyway,
    # but on a corpus-proportional eval side (this synthetic split is
    # ~1/19 of ALL grams) an unconditional hint would OOM executors
    # at 100 TB. Let the optimizer earn the broadcast from measured
    # sizes instead of forcing it.
    hits = (
        corp.join(ev, "gh")
        .groupBy("corpus_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared"),
            F.count_distinct("eval_id").alias("n_evals"),
        )
        .filter(F.col("n_shared") >= 2)
    )
    return (
        docs.filter(F.col("doc_id") % 19 != 0)
        .select("doc_id")
        .join(hits, F.col("doc_id") == F.col("corpus_id"), "left")
        .select(
            "doc_id",
            F.coalesce("n_shared", F.lit(0)).cast("long").alias("n_shared"),
            F.coalesce("n_evals", F.lit(0)).cast("long").alias("n_evals"),
            F.col("corpus_id").isNotNull().alias("dropped"),
        )
    )


# --------------------------------------------------------------------------
# p19 — tokenizer-faithful sequence packing: p05's bins over BPE
# SUBWORD counts (round-10 candidate #2, taken in round 9)
# --------------------------------------------------------------------------


_P19_MERGES = 32  # vocab-size dial: small enough that frequent words
# stay SPLIT into subwords on the synthetic corpus (the default 200
# saturates there — every word merges whole and counts collapse to
# whitespace counts, making the op vacuous; the twin test pins that
# p19's bins genuinely differ from p05's)


@register(
    "p19_bpe_sequence_packing",
    late=True,
    oracle=None,  # BPE counts are not SQL-expressible; dual-path
    # Python-twin parity in tests/test_dedup_quality.py (the p15
    # discipline).
    doc="Tokenizer-faithful SEQUENCE PACKING: p05's per-source "
    f"{_PACK_BUDGET}-token training bins computed over BPE SUBWORD "
    "counts (functions/bpe — the corpus-trained deterministic "
    "tokenizer p15 budgets with) instead of whitespace words. "
    "Packing decides how many documents share a training sequence; "
    "whitespace counts undercount subword-heavy text (rare words, "
    "non-Latin scripts) and overfill bins at train time — the "
    "bin boundaries genuinely MOVE under the real tokenizer, which "
    "is why production packs in model tokens. Same plan as p05: one "
    "Arrow pandas_udf scan for counts (per-batch word memo), one "
    "hash-partitioned running-sum window per source, partial-agg "
    "rollup per bin. Rows-only by necessity; the Python twin "
    "recomputes the ENTIRE packing (sample->train->encode->cumsum->"
    "bins) exactly in tests.",
)
def p19_bpe_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bpe import corpus_bpe, with_bpe_token_count

    docs = load_table(spark, sf_dir, "documents")
    merges = corpus_bpe(spark, sf_dir, _P19_MERGES)
    t = with_bpe_token_count(docs, merges).select(
        "doc_id", "source", F.col("n_bpe").cast("long").alias("tok_cnt")
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("tok_cnt").over(w))
    return (
        c.select(
            "source",
            F.floor((F.col("cum") - F.col("tok_cnt")) / _PACK_BUDGET)
            .cast("long")
            .alias("bin_id"),
            "tok_cnt",
        )
        .groupBy("source", "bin_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok_cnt").cast("long").alias("n_tokens"),
        )
    )


# --------------------------------------------------------------------------
# p20 — tokenizer-faithful token-budget mix: p03's per-stratum quota
# over BPE subword counts (the last whitespace-budgeted pipeline entry
# — VERDICT r9 item 6, completing the p15/p19 discipline)
# --------------------------------------------------------------------------


@register(
    "p20_bpe_token_budget_mix",
    late=True,
    oracle=None,  # BPE counts are not SQL-expressible; dual-path
    # Python-twin parity in tests/test_dedup_quality.py (the p15/p19
    # discipline).
    doc="Tokenizer-faithful TRAINING-MIX QUOTA: p03's per-(lang, "
    "source) 500-token budget computed over BPE SUBWORD counts "
    "(functions/bpe, the same corpus-trained tokenizer and merge "
    "budget p19 packs with — the memoized merge table is shared, so "
    "the bounded training collect is paid once per session) instead "
    "of whitespace words. Quotas decide WHICH documents make the "
    "training mix; whitespace counts undercount subword-heavy text, "
    "so a whitespace-budgeted stratum admits MORE documents than its "
    "token budget really allows — the twin test pins that the "
    "selected sets genuinely differ. Same plan as p03: one Arrow "
    "pandas_udf scan for counts, one hash-partitioned running-sum "
    "window per stratum, a filter — strata are independent at 100 TB "
    "and the window parallelizes to the stratum count. Rows-only by "
    "necessity; the Python twin recomputes the entire quota "
    "(sample->train->encode->rank->cumsum->filter) exactly.",
)
def p20_bpe_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.bpe import corpus_bpe, with_bpe_token_count

    docs = load_table(spark, sf_dir, "documents")
    merges = corpus_bpe(spark, sf_dir, _P19_MERGES)
    t = with_bpe_token_count(docs, merges).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.col("n_bpe").cast("long").alias("tok_cnt"),
    )
    w = (
        Window.partitionBy("lang", "source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t.withColumn("cum_tok", F.sum("tok_cnt").over(w))
        .filter(F.col("cum_tok") <= 500)
        .drop("n_chars")
    )


# --------------------------------------------------------------------------
# p21 — per-doc attention-boundary spans inside packed sequences (the
# collator metadata p05's bin aggregates summarize away)
# --------------------------------------------------------------------------

# p21 packs at a SMALLER budget than p05's 2048 so the oracle data
# actually exercises bin boundaries and spill docs at sf0.01 (where
# every source totals < 2048 tokens and p05's budget would leave the
# whole corpus in bin 0 — a vacuously-green boundary path; the t16
# anti-vacuousness discipline applied to parameter choice)
_P21_BUDGET = 256


@register(
    "p21_pack_attention_spans",
    late=True,
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS tok_cnt
      FROM documents
    ), c AS (
      SELECT doc_id, source, tok_cnt,
             sum(tok_cnt) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t
    )
    SELECT source, doc_id,
           CAST((cum - tok_cnt) // {_P21_BUDGET} AS BIGINT) AS bin_id,
           CAST((cum - tok_cnt) % {_P21_BUDGET} AS BIGINT) AS start_off,
           CAST((cum - tok_cnt) % {_P21_BUDGET} + tok_cnt AS BIGINT) AS end_off,
           (cum - tok_cnt) % {_P21_BUDGET} + tok_cnt > {_P21_BUDGET} AS spills
    FROM c
    """,
    doc=f"Attention-boundary spans for the packed export: per document "
    f"its [start_off, end_off) token placement inside its "
    f"{_P21_BUDGET}-token packed sequence (p05's streaming packing — "
    "a doc belongs to the bin where its tokens start), plus the "
    "spills flag for boundary docs whose tail crosses into the next "
    "bin (the collator truncates or continues them). This is the "
    "metadata a document-masked packed-pretraining collator actually "
    "consumes: packing without per-doc spans forces either cross-"
    "document attention contamination or a re-tokenization pass at "
    "batch-assembly time, so the spans ship WITH the export. Same "
    "plan as p05 minus its final aggregate (one window shuffle on "
    "source; start/end/spill are map-side arithmetic over the "
    "running sum); the same sub-sharding note applies for hot "
    "sources at 100 TB. p05's bin aggregate is this frame's "
    "groupBy(source, bin_id) by construction.",
)
def p21_pack_attention_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("long").alias("tok_cnt"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("tok_cnt").over(w))
    start_global = F.col("cum") - F.col("tok_cnt")
    start_off = F.pmod(start_global, F.lit(_P21_BUDGET)).cast("long")
    end_off = (start_off + F.col("tok_cnt")).cast("long")
    return c.select(
        "source",
        "doc_id",
        F.floor(start_global / _P21_BUDGET).cast("long").alias("bin_id"),
        start_off.alias("start_off"),
        end_off.alias("end_off"),
        (end_off > F.lit(_P21_BUDGET)).alias("spills"),
    )

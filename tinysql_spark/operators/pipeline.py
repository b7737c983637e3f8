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
from .text import fingerprint, lang_pred, tokens


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
    "at 100 TB the eval side is small and broadcastable.",
)
def p04_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    ws = tokens(F.col("text"))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - F.lit(7)),
        lambda i: F.xxhash64(F.array_join(F.slice(ws, i, 8), " ")),
    )
    g = (
        docs.filter(F.size(ws) >= 8)
        .select("doc_id", F.explode(F.array_distinct(grams)).alias("gh"))
    )
    ev = g.filter(F.col("doc_id") % 19 == 0).select(
        F.col("doc_id").alias("eval_id"), "gh"
    )
    corp = g.filter(F.col("doc_id") % 19 != 0).select(
        F.col("doc_id").alias("corpus_id"), "gh"
    )
    return (
        corp.join(F.broadcast(ev), "gh")
        .groupBy("corpus_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= 2)
    )

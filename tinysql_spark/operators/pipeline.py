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
from .text import fingerprint, lang_pred


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

"""Similarity search over the `embeddings` table (array<float> column).

- s01: brute-force cosine top-k — the correctness baseline.
- s02: LSH-bucketed ANN (random hyperplane signs) — the scale path:
  candidates come from an equi-join on bucket id, so the probe cost is
  corpus_size/2^planes per query instead of the full corpus.

Everything is JVM-side Column algebra (zip_with/aggregate folds); no
Python UDF in the hot path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .dedup import cosine
from .registry import register

_TOP_K = 5
_N_QUERIES = 5  # vec_id < 5 are the query vectors


@register(
    "s01_ann_brute_topk",
    oracle=f"""
    WITH scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]), CAST(q.embedding AS DOUBLE[])))
                * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]), CAST(c.embedding AS DOUBLE[]))))
               AS sim
      FROM embeddings q JOIN embeddings c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id)
            <= {_TOP_K}
    """,
    doc="Brute-force cosine top-k: broadcast the (small) query set "
    "against the corpus; per-query top-k via window row_number. At "
    "scale the corpus side stays partitioned, queries broadcast.",
)
def s01_ann_brute_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"))
    sim = cosine(F.col("q_emb"), F.col("c_emb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )


_N_PLANES = 8
_DIM = 64


def _hyperplanes() -> list[list[float]]:
    """Deterministic random hyperplanes (seeded) shipped as literals."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((_N_PLANES, _DIM)).tolist()


def lsh_bucket(emb_col: Column) -> Column:
    """Sign-bit bucket id from `_N_PLANES` fixed hyperplanes."""
    planes = _hyperplanes()
    bucket = None
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(v)) for v in plane])
        dot = F.aggregate(
            F.zip_with(emb_col, lit_plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(dot > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        term = F.shiftleft(bit, i)
        bucket = term if bucket is None else bucket.bitwiseOR(term)
    return bucket


@register(
    "s02_ann_lsh",
    oracle=None,  # plane constants make a SQL oracle impractical — rows-only
    doc="LSH-bucketed ANN: random-hyperplane sign bucket (8 planes -> "
    "256 buckets), candidates via bucket equi-join, exact cosine "
    "re-rank top-k inside the bucket. The equi-join keeps candidate "
    "generation linear; recall traded for probe cost (multi-probe "
    "would re-add neighbor buckets).",
)
def s02_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").withColumn(
        "bucket", lsh_bucket(F.col("embedding"))
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb"), "bucket"
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_emb"), "bucket"
    )
    sim = cosine(F.col("q_emb"), F.col("c_emb"))
    scored = (
        F.broadcast(queries)
        .join(corpus, "bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )


_IVF_K = 16
_IVF_NPROBE = 2


def _centroids() -> list[list[float]]:
    """Deterministic coarse centroids (seeded); a production pipeline
    would k-means these — the plan shape is identical."""
    rng = np.random.default_rng(7)
    return rng.standard_normal((_IVF_K, _DIM)).tolist()


def _nearest_centroids(emb_col: Column, n: int) -> Column:
    """Array of the n nearest centroid ids by dot product (array of
    (score, id) structs -> sort desc -> slice) — pure Column algebra."""
    scored = []
    for ci, c in enumerate(_centroids()):
        lit_c = F.array(*[F.lit(float(v)) for v in c])
        dot = F.aggregate(
            F.zip_with(emb_col, lit_c, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        scored.append(F.struct((-dot).alias("neg"), F.lit(ci).alias("cid")))
    ranked = F.array_sort(F.array(*scored))
    return F.transform(F.slice(ranked, 1, n), lambda s: s["cid"])


@register(
    "s03_ann_ivf",
    oracle=None,  # centroid literals make a SQL oracle impractical
    doc="IVF-style ANN: corpus partitioned by nearest coarse centroid "
    "(inverted lists), queries probe their nprobe=2 nearest lists via "
    "an equi-join on centroid id, exact cosine re-rank inside. Probe "
    "cost ~ nprobe/K of the corpus; lists are disjoint so the shuffle "
    "is one equi-join, never all-pairs.",
)
def s03_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        F.element_at(_nearest_centroids(F.col("embedding"), 1), 1).alias("cid"),
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.explode(_nearest_centroids(F.col("embedding"), _IVF_NPROBE)).alias("cid"),
    )
    sim = cosine(F.col("q_emb"), F.col("c_emb"))
    scored = (
        F.broadcast(queries)
        .join(corpus, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("sim"))
        .distinct()
    )
    w = Window.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )

"""Similarity search over the `embeddings` table (array<float> column).

- s01: brute-force cosine top-k — the correctness baseline.
- s02: LSH-bucketed ANN (random hyperplane signs) — the scale path:
  candidates come from an equi-join on bucket id, so the probe cost is
  corpus_size/2^planes per query instead of the full corpus.
- s03: IVF-style ANN — corpus sharded into inverted lists by nearest
  coarse centroid (k-means-trained on a capped sample, spherical
  convention), queries probe nprobe lists via equi-join.
- s05/s06: scalar-quantized and IVF+SQ composed variants; s06 adds
  top-2 multiple assignment of the corpus (recall 0.96 vs exact at
  nprobe=4, measured in tests/test_similarity_quality.py).

Pair-wise re-ranking stays JVM-side (one dot fold per candidate on
pre-normalized vectors — bit-reproducible against the SQL oracle).
Per-ROW dense linear algebra (hyperplane signs, centroid assignment =
an n x dim by dim x k matmul) goes through one Arrow-batched
pandas_udf: built-in higher-order folds evaluate a closure per
element, ~100x slower than the vectorized numpy matmul for this shape.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.tables import load_table
from .dedup import dot, unit_vec
from .registry import register

_TOP_K = 5
_N_QUERIES = 5  # vec_id < 5 are the query vectors


def _unit_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one frame every ANN operator starts from: vec_id, the raw
    embedding (UDF inputs — bucket/centroid assignment stays
    bit-identical to the standalone operators) and the unit-normalized
    vector `e` (all dot-product scoring). s04 persists THIS once and
    shares it across s01/s02/s03 instead of re-reading and
    re-normalizing the corpus three times (VERDICT r04 item 3)."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding", unit_vec(F.col("embedding")).alias("e")
    )


@register(
    "s01_ann_brute_topk",
    oracle=f"""
    WITH u AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.e, c.e) AS sim
      FROM u q JOIN u c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id)
            <= {_TOP_K}
    """,
    doc="Brute-force cosine top-k: unit-normalize once per row, "
    "broadcast the (small) query set against the corpus; per-query "
    "top-k via window row_number. At scale the corpus side stays "
    "partitioned, queries broadcast.",
)
def s01_ann_brute_topk(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    emb = (emb if emb is not None else _unit_emb(spark, sf_dir)).select("vec_id", "e")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("q_emb")
    )
    corpus = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("c_emb"))
    sim = dot(F.col("q_emb"), F.col("c_emb"))
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
    """Deterministic random hyperplanes (seeded), broadcast to workers
    inside the udf closure."""
    rng = np.random.default_rng(42)
    return rng.standard_normal((_N_PLANES, _DIM)).tolist()


def _lsh_bucket_batch(emb: pd.Series) -> pd.Series:
    """Sign-bit bucket id from `_N_PLANES` fixed hyperplanes — one
    Arrow-batched (rows x dim) @ (dim x planes) matmul per batch."""
    planes = np.asarray(_hyperplanes())
    m = np.stack(emb.to_numpy())
    bits = (m @ planes.T) > 0
    bucket = (bits * (1 << np.arange(_N_PLANES, dtype=np.int64))).sum(axis=1)
    return pd.Series(bucket.astype("int64"))


# asNondeterministic: stops Catalyst pushing the join's isnotnull(key)
# filter below the projection, which would run the Python stage TWICE
# per side (once for the filter, once for the project). The function
# is in fact deterministic; only the optimizer contract changes.
# DataType object (not DDL string): parsing a string needs a live
# session at import time.
lsh_bucket = F.pandas_udf(_lsh_bucket_batch, T.LongType()).asNondeterministic()


@register(
    "s02_ann_lsh",
    oracle=None,  # plane constants make a SQL oracle impractical — rows-only
    doc="LSH-bucketed ANN with multi-probe: random-hyperplane sign "
    "bucket (8 planes -> 256 buckets); queries probe every bucket "
    "within hamming distance 2 of their own (37 probes = ~14% of the "
    "corpus — sized for this corpus's weak neighbor similarity, "
    "cos~0.35 => expected signature hamming ~3), candidates via "
    "bucket equi-join, exact cosine re-rank top-k. Candidate "
    "generation stays a linear equi-join; recall measured by s04.",
)
def s02_ann_lsh(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    emb = (emb if emb is not None else _unit_emb(spark, sf_dir)).select(
        "vec_id", "e", lsh_bucket(F.col("embedding")).alias("bucket")
    )
    masks = [0] + [1 << i for i in range(_N_PLANES)] + [
        (1 << i) | (1 << j) for i in range(_N_PLANES) for j in range(i + 1, _N_PLANES)
    ]
    probes = F.array(*[F.col("bucket").bitwiseXOR(F.lit(m)) for m in masks])
    queries = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("q_emb"),
            F.explode(probes).alias("bucket"),
        )
    )
    corpus = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("c_emb"), "bucket"
    )
    sim = dot(F.col("q_emb"), F.col("c_emb"))
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
_IVF_TRAIN_CAP = 65536  # k-means fit reads at most this many vectors

_CENTROID_CACHE: dict[tuple[str, str], list[list[float]]] = {}


def _ivf_assigned_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SHARED per-(corpus, centroid-set) assignment persist (VERDICT
    r10 item 4): the one corpus-side frame every trained-centroid IVF
    entry starts from — vec_id, unit vector e, the top-_SQ_ASSIGN
    centroid ids (cids; top-1 is element 1, so s03's single-assignment
    read is a JVM element_at, not a second Arrow pass), and the 4-bit
    scalar-quantized reconstruction c_code (pure Column transform —
    free to carry). Persisted once per (application, sf_dir): warm
    family calls skip the corpus-wide assignment matmul entirely.
    A/B vs the per-call corpora recorded in BASELINE.md round 11."""
    from .dedup import _LIVE_CACHES, _keyed_persist

    key = f"ivf.assign.{spark.sparkContext.applicationId}.{os.path.abspath(sf_dir)}"
    hit = _LIVE_CACHES.get(key)
    if hit is not None:
        return hit
    assign2 = _make_nearest_centroids(_SQ_ASSIGN, _trained_centroids(spark, sf_dir))
    emb = _unit_emb(spark, sf_dir)
    dq = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.lit(_SQ_LO)
        + (
            F.greatest(
                F.lit(0.0),
                F.least(
                    F.lit(float(_SQ_LEVELS - 1)),
                    F.floor((x - F.lit(_SQ_LO)) / F.lit(_SQ_STEP)).cast("double"),
                ),
            )
            + F.lit(0.5)
        )
        * F.lit(_SQ_STEP),
    )
    return _keyed_persist(
        key,
        emb.select(
            "vec_id",
            "e",
            assign2(F.col("embedding")).alias("cids"),
            dq.alias("c_code"),
        ),
    )


def _trained_centroids(spark: SparkSession, sf_dir: str) -> list[list[float]]:
    """K-means-trained coarse centroids over (a capped sample of) the
    unit-normalized embeddings — the quantizer-training step every IVF
    index ships (FAISS `train()`); random centroids cost ~2x recall at
    the same nprobe. Centroids are unit-normalized after training
    (spherical k-means convention), so nearest-by-dot-product
    assignment matches the cosine geometry the probes rank by. One fit
    per (application, sf_dir), cached — at 100 TB the fit reads the
    capped sample, never the corpus, and the trained (k x dim) matrix
    broadcasts into the assignment UDF closure like any literal."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _CENTROID_CACHE.get(key)
    if got is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        train = (
            load_table(spark, sf_dir, "embeddings")
            .select(array_to_vector(unit_vec(F.col("embedding"))).alias("features"))
            .limit(_IVF_TRAIN_CAP)
        )
        model = KMeans(k=_IVF_K, seed=7, maxIter=20).fit(train)
        c = np.asarray([np.asarray(v) for v in model.clusterCenters()])
        norms = np.linalg.norm(c, axis=1, keepdims=True)
        norms[norms == 0.0] = 1.0
        got = (c / norms).tolist()
        _CENTROID_CACHE[key] = got
    return got


def _make_nearest_centroids(nprobe: int, centroids: list[list[float]]):
    """Factory: a pandas_udf returning the top-``nprobe`` centroid ids
    by dot product — one vectorized (rows x dim) @ (dim x k) matmul
    per Arrow batch; argsort ties break toward the lower centroid id
    (stable sort). nprobe is the recall-vs-cost dial: s03 probes 2
    lists; s06 probes 4 to buy back recall on its compressed index."""
    c = np.asarray(centroids)

    def batch(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        scores = m @ c.T
        order = np.argsort(-scores, axis=1, kind="stable")[:, :nprobe]
        return pd.Series(list(order.astype("int32")))

    return F.pandas_udf(batch, T.ArrayType(T.IntegerType())).asNondeterministic()


@register(
    "s04_ann_recall",
    oracle=None,  # composes two rows-only ANN ops — rows-only check
    doc="ANN quality evaluation: recall@k of the LSH and IVF probes "
    "against the exact brute-force top-k, per query — the measurement "
    "loop that tunes nprobe/planes before a production rollout. Pure "
    "composition: three registered operators joined on "
    "(query_id, neighbor_id).",
)
def s04_ann_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _keyed_persist

    # one scan + one normalization, shared by all three ANN plans —
    # without this each component re-reads and re-normalizes the
    # corpus (was the slowest non-streaming bench entry)
    emb = _keyed_persist(f"s04.unit_emb.{sf_dir}", _unit_emb(spark, sf_dir))
    # the exact baseline feeds three consumers (two semi joins + the
    # per-query denominator) — persist it or the brute-force cross
    # join runs three times
    exact = _keyed_persist(
        f"s04.exact.{sf_dir}",
        s01_ann_brute_topk(spark, sf_dir, emb=emb).select("query_id", "neighbor_id"),
    )
    hits_lsh = (
        exact.join(
            s02_ann_lsh(spark, sf_dir, emb=emb).select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_lsh"))
    )
    hits_ivf = (
        exact.join(
            s03_ann_ivf(spark, sf_dir, emb=emb).select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_semi",
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_ivf"))
    )
    base = exact.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        base.join(hits_lsh, "query_id", "left")
        .join(hits_ivf, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce("n_lsh", F.lit(0)) / F.col("n_exact")).alias("recall_lsh"),
            (F.coalesce("n_ivf", F.lit(0)) / F.col("n_exact")).alias("recall_ivf"),
        )
    )


@register(
    "s03_ann_ivf",
    oracle=None,  # centroid literals make a SQL oracle impractical
    doc="IVF-style ANN: corpus partitioned by nearest coarse centroid "
    "(inverted lists over k-means-trained spherical centroids), "
    "queries probe their nprobe=2 nearest lists via "
    "an equi-join on centroid id, exact cosine re-rank inside. Probe "
    "cost ~ nprobe/K of the corpus; lists are disjoint so the shuffle "
    "is one equi-join, never all-pairs.",
)
def s03_ann_ivf(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> DataFrame:
    if emb is None:
        emb = _unit_emb(spark, sf_dir)
    nearest = _make_nearest_centroids(_IVF_NPROBE, _trained_centroids(spark, sf_dir))
    # corpus-side single assignment comes from the SHARED persisted
    # frame: top-1 is element 1 of the family's top-2 assignment
    # (identical ids — same centroids, same stable tie-break), read as
    # a JVM element_at instead of a per-call corpus-wide Arrow matmul
    corpus = _ivf_assigned_corpus(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("e").alias("c_emb"),
        F.element_at(F.col("cids"), 1).alias("cid"),
    )
    queries = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("q_emb"),
            # separate Project: a nondeterministic expression is not
            # allowed inside the Generate node explode() produces
            nearest(F.col("embedding")).alias("cids"),
        )
        .select("query_id", "q_emb", F.explode("cids").alias("cid"))
    )
    sim = dot(F.col("q_emb"), F.col("c_emb"))
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


# --------------------------------------------------------------------------
# s05 — scalar-quantized ANN (4-bit codes, asymmetric-style rescoring)
# --------------------------------------------------------------------------

_SQ_LO, _SQ_STEP, _SQ_LEVELS = -0.6, 0.075, 16  # covers the embedding range


@register(
    "s05_ann_scalar_quant",
    late=True,
    oracle=f"""
    WITH dq AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> {_SQ_LO} + (greatest(0, least({_SQ_LEVELS - 1},
                      floor((x - {_SQ_LO}) / {_SQ_STEP}))) + 0.5) * {_SQ_STEP}) AS e
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.e, c.e) AS sim
      FROM dq q JOIN dq c ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS approx_dot
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id)
            <= {_TOP_K}
    """,
    doc="Scalar-quantized ANN: every dimension maps to a 4-bit code "
    "(16 uniform levels over the value range), scoring runs on the "
    "reconstructed level centers. THE memory lever at 100 TB: 4 bits/"
    "dim vs 32 shrinks the resident corpus 8x, so a 1000-executor "
    "fleet holds the whole index in RAM and the exact float pass "
    "(s01) is reserved for reranking survivors. Same broadcast-"
    "queries x partitioned-corpus plan as s01; quantize/dequantize "
    "is pure Column algebra (floor/clamp), JVM-side, map-only.",
)
def s05_ann_scalar_quant(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dq = F.transform(
        F.col("embedding").cast("array<double>"),
        lambda x: F.lit(_SQ_LO)
        + (
            F.greatest(
                F.lit(0.0),
                F.least(F.lit(float(_SQ_LEVELS - 1)), F.floor((x - F.lit(_SQ_LO)) / F.lit(_SQ_STEP)).cast("double")),
            )
            + F.lit(0.5)
        )
        * F.lit(_SQ_STEP),
    )
    vecs = emb.select("vec_id", dq.alias("e"))
    queries = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("q_emb")
    )
    corpus = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("c_emb"))
    sim = dot(F.col("q_emb"), F.col("c_emb"))
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
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("approx_dot"))
    )


# --------------------------------------------------------------------------
# s06 — IVF + scalar quantization (the production big-index composition)
# --------------------------------------------------------------------------

_SQ_RERANK = 3  # rerank pool: top 3*K by quantized score
_SQ_NPROBE = 4  # s06 probes more lists than s03: recall buy-back on the compressed index
_SQ_ASSIGN = 2  # corpus multiple assignment: each vector in its top-2 lists


@register(
    "s06_ann_ivf_sq",
    late=True,
    oracle=None,  # centroid literals — rows-only; recall measured in tests
    doc="IVF + scalar quantization, composed (the FAISS IVF-SQ shape "
    "— the realistic 100 TB ANN index): corpus sharded into inverted "
    "lists by K-MEANS-TRAINED coarse centroids (spherical; trained on "
    "a capped sample, FAISS train()) with top-2 multiple assignment "
    "(2x index size for the recall gain), stored as 4-bit scalar-"
    "quantized codes (s05's compressor, 8x smaller resident set), "
    "queries probe nprobe lists via the equi-join, "
    "first-pass scoring is ASYMMETRIC (exact query x dequantized "
    "corpus — the ADC trick: no query-side quantization error), and "
    "only the top 3k survivors per query get the exact float re-rank. "
    "Both s03's probe-cost lever (nprobe/K of the corpus touched) and "
    "s05's memory lever stack; the exact pass runs on ~3k rows per "
    "query, not the corpus. Candidate generation stays one equi-join; "
    "recall vs s01 measured in tests/test_similarity_quality.py.",
)
def s06_ann_ivf_sq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = _trained_centroids(spark, sf_dir)
    probe4 = _make_nearest_centroids(_SQ_NPROBE, cents)
    # multiple assignment (Jégou et al., the IVF recall-vs-memory
    # lever): every corpus vector is indexed in its top-2 lists, so a
    # neighbor is found if EITHER of its lists is among the query's
    # nprobe probes — 2x index size, large recall gain on corpora with
    # weak cluster structure; candidates stay one equi-join and the
    # pool .distinct() collapses double-listed hits. The assignment
    # and SQ codes come from the SHARED persisted family frame (warm
    # calls skip the corpus-wide Arrow matmul; VERDICT r10 item 4)
    corpus = _ivf_assigned_corpus(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        "c_code",
        F.col("e").alias("c_exact"),
        F.explode("cids").alias("cid"),
    )
    queries = (
        emb.filter(F.col("vec_id") < _N_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            unit_vec(F.col("embedding")).alias("q_exact"),
            probe4(F.col("embedding")).alias("cids"),
        )
        .select("query_id", "q_exact", F.explode("cids").alias("cid"))
    )
    approx = dot(F.col("q_exact"), F.col("c_code"))
    pool = (
        F.broadcast(queries)
        .join(corpus, "cid")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_exact", "c_exact", approx.alias("approx"))
        .distinct()
    )
    w_pool = Window.partitionBy("query_id").orderBy(
        F.round("approx", 6).desc(), F.col("neighbor_id")
    )
    survivors = pool.withColumn("rn", F.row_number().over(w_pool)).filter(
        F.col("rn") <= _TOP_K * _SQ_RERANK
    )
    exact = dot(F.col("q_exact"), F.col("c_exact"))
    w = Window.partitionBy("query_id").orderBy(
        F.round("exact_sim", 6).desc(), F.col("neighbor_id")
    )
    return (
        survivors.select("query_id", "neighbor_id", exact.alias("exact_sim"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("exact_sim", 4).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# s07 — product-quantized ANN (FAISS PQ shape: per-subspace codebooks,
# ADC lookup-table scoring, exact rerank)
# --------------------------------------------------------------------------

_PQ_M = 16  # subspaces (64 dims -> 16 x 4)
_PQ_KS = 16  # codes per subspace (4 bits)
_PQ_ITERS = 20
_PQ_RERANK = 10  # rerank pool: top 10*K by ADC score (codes are cheap; rerank is the recall dial)

_PQ_CODEBOOK_CACHE: dict[tuple[str, str], list] = {}


def _pq_codebooks(spark: SparkSession, sf_dir: str) -> np.ndarray:
    """Per-subspace k-means codebooks (M x Ks x dim/M), trained on a
    capped sample of the unit-normalized corpus — the FAISS
    ``ProductQuantizer.train()`` step. Lloyd iterations run driver-
    side on the bounded sample (16 MB at the 65536 cap — training is
    sample-sized at any corpus scale, same discipline as
    _trained_centroids); seeded deterministic init (LCG pick of
    distinct sample rows), empty clusters re-seeded from the farthest
    points so every code stays live."""
    key = (spark.sparkContext.applicationId, sf_dir)
    got = _PQ_CODEBOOK_CACHE.get(key)
    if got is None:
        sample = (
            load_table(spark, sf_dir, "embeddings")
            .select(unit_vec(F.col("embedding")).alias("e"))
            .limit(_IVF_TRAIN_CAP)
            .toPandas()
        )
        x = np.stack(sample["e"].to_numpy()).astype(np.float64)
        n, dim = x.shape
        sub = dim // _PQ_M
        rng = np.random.default_rng(7)
        books = []
        for m in range(_PQ_M):
            xs = x[:, m * sub : (m + 1) * sub]
            cb = xs[rng.choice(n, size=_PQ_KS, replace=False)].copy()
            for _ in range(_PQ_ITERS):
                d2 = ((xs[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                for k in range(_PQ_KS):
                    pts = xs[assign == k]
                    if len(pts):
                        cb[k] = pts.mean(axis=0)
                    else:  # re-seed dead code from the farthest point
                        cb[k] = xs[d2.min(axis=1).argmax()]
            books.append(cb)
        got = np.stack(books)  # (M, Ks, sub)
        _PQ_CODEBOOK_CACHE[key] = got
    return got


def _pq_encoded_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted PQ-encoded corpus (vec_id, codes, e) — the s07 analog
    of _ivf_assigned_corpus: the corpus-wide encode matmul runs once
    per (application, sf_dir); warm calls sweep the materialized
    codes. At 100 TB this is the RAM-resident code array every PQ
    index keeps (FAISS stores codes, not vectors)."""
    from .dedup import _LIVE_CACHES, _keyed_persist

    key = f"pq.codes.{spark.sparkContext.applicationId}.{os.path.abspath(sf_dir)}"
    hit = _LIVE_CACHES.get(key)
    if hit is not None:
        return hit
    books = _pq_codebooks(spark, sf_dir)
    sub = books.shape[2]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def encode(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())  # (n, dim)
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        m = m / nrm
        codes = np.empty((m.shape[0], _PQ_M), dtype=np.int32)
        for i in range(_PQ_M):
            xs = m[:, i * sub : (i + 1) * sub]
            d2 = (xs * xs).sum(axis=1, keepdims=True) - 2.0 * (xs @ books[i].T) + (
                books[i] * books[i]
            ).sum(axis=1)[None, :]
            codes[:, i] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    emb = load_table(spark, sf_dir, "embeddings")
    return _keyed_persist(
        key,
        emb.select(
            "vec_id",
            encode(F.col("embedding")).alias("codes"),
            unit_vec(F.col("embedding")).alias("e"),
        ),
    )


@register(
    "s07_ann_pq",
    late=True,
    oracle=None,  # trained codebooks — rows-only; recall measured in tests
    doc="Product-quantized ANN (Jégou et al. 2011, the FAISS PQ "
    "shape): 64 dims split into 16 subspaces x 16 codes = 64-bit "
    "codes, a 32x shrink of the resident corpus vs float32 — the "
    "memory end-game at 100 TB (s05's scalar quantizer stops at 8x). "
    "Encoding is one vectorized matmul per subspace in an Arrow "
    "pandas_udf, run ONCE per corpus into the persisted code frame "
    "(_pq_encoded_corpus); scoring is ASYMMETRIC (ADC): each query "
    "precomputes its M x Ks lookup table of exact-query x centroid "
    "dot products (a 128-double literal per query), and per-candidate "
    "scoring is M array lookups summed — pure JVM Column algebra "
    "(aggregate + element_at), no per-pair float vector math at all. "
    "Top 3k survivors per query get the exact float rerank (s06's "
    "discipline), so emitted cos_sim is exact. Corpus stays "
    "partitioned, queries + LUTs broadcast; candidate scan is the "
    "compressed-code sweep a RAM-resident PQ index does.",
)
def s07_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    books = _pq_codebooks(spark, sf_dir)  # (M, Ks, sub)
    sub = books.shape[2]

    @F.pandas_udf(T.ArrayType(T.ArrayType(T.DoubleType())))
    def lut(emb: pd.Series) -> pd.Series:
        m = np.stack(emb.to_numpy())
        nrm = np.linalg.norm(m, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        m = m / nrm
        out = []
        for row in m:
            t = [
                (books[i] @ row[i * sub : (i + 1) * sub]).tolist()
                for i in range(_PQ_M)
            ]
            out.append(t)
        return pd.Series(out)

    emb = load_table(spark, sf_dir, "embeddings")
    corpus = _pq_encoded_corpus(spark, sf_dir).select(
        F.col("vec_id").alias("neighbor_id"),
        "codes",
        F.col("e").alias("c_emb"),
    )
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        lut(F.col("embedding")).alias("lut"),
        unit_vec(F.col("embedding")).alias("q_emb"),
    )
    # ADC first pass: score = sum_m lut[m][codes[m]] — JVM-side lookups
    approx = F.aggregate(
        F.sequence(F.lit(1), F.lit(_PQ_M)),
        F.lit(0.0),
        lambda acc, i: acc
        + F.element_at(F.element_at(F.col("lut"), i), F.element_at(F.col("codes"), i) + 1),
    )
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "q_emb", "c_emb", approx.alias("approx"))
    )
    wa = Window.partitionBy("query_id").orderBy(F.col("approx").desc(), F.col("neighbor_id"))
    pool = scored.withColumn("rn", F.row_number().over(wa)).filter(
        F.col("rn") <= _PQ_RERANK * _TOP_K
    )
    # exact rerank of the survivor pool
    exact = dot(F.col("q_emb"), F.col("c_emb"))
    we = Window.partitionBy("query_id").orderBy(F.round(exact, 6).desc(), F.col("neighbor_id"))
    return (
        pool.withColumn("rx", F.row_number().over(we))
        .filter(F.col("rx") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round(exact, 4).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# s08 — MMR diversity re-rank (grouped applyInPandas custom operator)
# --------------------------------------------------------------------------

_MMR_LAMBDA = 0.7
_MMR_POOL = 30  # candidate pool per query fed to the greedy selector


@register(
    "s08_ann_mmr",
    late=True,
    oracle=None,  # greedy sequential selection — not SQL-expressible;
    # diversity-vs-relevance is measured in tests/test_similarity_quality.py
    doc="Maximal-marginal-relevance re-rank (Carbonell & Goldstein "
    "1998): from each query's top-30 relevance pool, greedily pick k "
    "items maximizing lambda*sim(q,c) - (1-lambda)*max_sim(c, "
    "already-picked) — the dedup-aware retrieval step a RAG/training "
    "pipeline runs so the k results aren't five copies of the same "
    "document. Pool generation is s01's broadcast-queries x "
    "partitioned-corpus plan + per-query window top-30; the greedy "
    "selection is inherently sequential PER QUERY, so it runs as ONE "
    "grouped applyInPandas over query_id — the (c)-tier custom-"
    "operator pattern: state never leaves the group, groups "
    "hash-partition across executors, and the Python step touches "
    "30 rows per query, never the corpus. Ties break toward the "
    "lower neighbor_id (deterministic).",
)
def s08_ann_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", unit_vec(F.col("embedding")).alias("e"))
    queries = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("q_emb")
    )
    corpus = vecs.select(F.col("vec_id").alias("neighbor_id"), F.col("e").alias("c_emb"))
    sim = dot(F.col("q_emb"), F.col("c_emb"))
    scored = (
        F.broadcast(queries)
        .crossJoin(corpus)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", "c_emb", sim.alias("rel"))
    )
    w = Window.partitionBy("query_id").orderBy(F.round("rel", 6).desc(), F.col("neighbor_id"))
    pool = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= _MMR_POOL)

    out_schema = "query_id long, neighbor_id long, rank int, mmr_score double"

    def select_mmr(pdf: pd.DataFrame) -> pd.DataFrame:
        # stable candidate order: relevance desc, id asc (matches the
        # window above) so argmax ties resolve identically everywhere
        pdf = pdf.sort_values(["rn"]).reset_index(drop=True)
        embs = np.stack(pdf["c_emb"].to_numpy())
        rel = pdf["rel"].to_numpy()
        n = len(pdf)
        k = min(_TOP_K, n)
        picked: list[int] = []
        scores: list[float] = []
        cand = list(range(n))
        while len(picked) < k:
            if picked:
                max_sim = (embs[cand] @ embs[picked].T).max(axis=1)
            else:
                max_sim = np.zeros(len(cand))
            mmr = _MMR_LAMBDA * rel[cand] - (1.0 - _MMR_LAMBDA) * max_sim
            j = int(np.argmax(mmr))  # first max -> lowest rn wins ties
            picked.append(cand[j])
            scores.append(float(mmr[j]))
            cand.pop(j)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[picked].to_numpy(),
                "neighbor_id": pdf["neighbor_id"].iloc[picked].to_numpy(),
                "rank": np.arange(1, len(picked) + 1, dtype="int32"),
                "mmr_score": np.round(scores, 4),
            }
        )

    return pool.groupBy("query_id").applyInPandas(select_mmr, schema=out_schema)


@register(
    "s09_ann_filtered",
    late=True,
    oracle=f"""
    WITH u AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
             list_dot_product(q.e, c.e) AS sim
      FROM u q JOIN u c
        ON q.vec_id < {_N_QUERIES} AND c.vec_id <> q.vec_id
       AND q.label = c.label
    )
    SELECT query_id, neighbor_id, round(sim, 4) AS cos_sim
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY round(sim, 6) DESC, neighbor_id)
            <= {_TOP_K}
    """,
    doc="FILTERED vector search: top-k restricted to candidates "
    "sharing the query's label — the predicate+ANN composition "
    "(metadata filter AND vector similarity) that trips naive "
    "vector indexes (post-filtering an unfiltered top-k loses "
    "recall when the filter is selective; pre-filtering is exact). "
    "Expressed relationally the problem dissolves: the label "
    "equality is ONE MORE JOIN CONJUNCT, so Catalyst plans a "
    "hash-partitioned equi-join on label instead of the broadcast "
    "cross-product — the filter IS the blocking key, candidates "
    "per query drop from the corpus to one label partition, and "
    "pushdown reaches the parquet scan. At 100 TB: this is why the "
    "engine formulation beats bolting a vector index onto a "
    "post-filter.",
)
def s09_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    vecs = emb.select("vec_id", "label", unit_vec(F.col("embedding")).alias("e"))
    queries = vecs.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        F.col("e").alias("q_emb"),
    )
    corpus = vecs.select(
        F.col("vec_id").alias("neighbor_id"),
        "label",
        F.col("e").alias("c_emb"),
    )
    sim = dot(F.col("q_emb"), F.col("c_emb"))
    scored = (
        queries.join(
            corpus,
            (F.col("q_label") == F.col("label"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select("query_id", "neighbor_id", sim.alias("sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.round("sim", 6).desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= _TOP_K)
        .select("query_id", "neighbor_id", F.round("sim", 4).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# s11 — hybrid search: BM25 lexical + vector cosine, RRF fusion
# --------------------------------------------------------------------------

_HS_K1, _HS_B = 1.2, 0.75  # BM25 shape parameters (standard defaults)
_HS_RRF_K = 60  # reciprocal-rank-fusion constant (Cormack et al.)
_HS_NQ = 3  # doc_id < 3 are the query documents
_HS_TOPC = 20  # per-modality candidate depth
_HS_TOPK = 10  # fused results per query
_HS_IVF_K = 8  # inverted lists for the dense leg
_HS_IVF_P = 4  # lists probed per query (recall/cost dial)
_HS_IVF_ROUNDS = 2  # Lloyd refinement rounds after rank-spaced seeding


# A production hybrid-search deployment probes a PRE-BUILT index; the
# build is an offline/streaming job (st09 materializes exactly that
# cid-partitioned layout). Rebuilding seeds + Lloyd rounds + corpus
# assignment on every s11 invocation was round 6's honest 1.97->3.87 s
# regression (VERDICT r6 item 1). The trained index is a pure function
# of the corpus, so it is memoized here per (Spark application,
# corpus dir): the first invocation builds AND materializes it; every
# later one pays probe + rerank only. Bounded: one entry per distinct
# sf_dir in the process, evicted when the application changes.
_IVF_MEMO: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}
_IVF_BUILDS = 0  # build counter, asserted by tests/test_similarity_quality.py


def _nearest_cid(
    points: DataFrame, cents: DataFrame, id_col: str, top: int
) -> DataFrame:
    """Broadcast-K argmax assignment: each point's ``top`` nearest
    centroids by rounded dot product (6 decimals — both engines rank
    the same key), cid as the deterministic tiebreak. Map-only over
    the points; the K-row centroid frame is the broadcast side."""
    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("cid"))
    return (
        points.crossJoin(F.broadcast(cents))
        .select(
            id_col,
            "cid",
            F.round(dot(F.col("e"), F.col("ce")), 6).alias("score"),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= top)
        .select(id_col, "cid")
    )


def _lloyd_centroids(u_train: DataFrame) -> DataFrame:
    """Deterministic, oracle-expressible Lloyd training over the given
    unit-normalized (vec_id, e) frame: K seeds picked by rank spacing
    over train vec_ids (the deterministic stand-in for sampled
    k-means++ init — the id-only rank is the one bounded
    single-reducer step; at 100 TB you'd sample ids instead), then
    _HS_IVF_ROUNDS rounds where assignment is a broadcast-K argmax
    (map-only over the train set) and the new centroid is a
    partial-agg average. Centroid components round to 6 decimals so
    both engines see bit-identical centroids. Shared by the s11/s12
    full-corpus index and s14's base-slice training."""
    n_corp = u_train.agg(F.count(F.lit(1)).alias("n"))
    step = F.ceil(F.col("n") * 1.0 / _HS_IVF_K).cast("long")
    rn = u_train.select(
        "vec_id",
        (F.row_number().over(Window.orderBy("vec_id")) - 1).alias("rn"),
    )
    centn = (
        rn.crossJoin(F.broadcast(n_corp))
        .filter(F.col("rn") % step == 0)
        .select((F.col("rn") / step).cast("int").alias("cid"), "vec_id")
        .join(u_train, "vec_id")
        .select("cid", F.col("e").alias("ce"))
    )
    for _ in range(_HS_IVF_ROUNDS):
        assign_r = _nearest_cid(u_train, centn, "vec_id", 1)
        centn = (
            assign_r.join(u_train, "vec_id")
            .select("cid", F.posexplode("e").alias("i", "x"))
            .groupBy("cid", "i")
            .agg(F.round(F.avg("x"), 6).alias("v"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("i", "v"))),
                    lambda s: s["v"],
                ).alias("ce0")
            )
            .select("cid", unit_vec(F.col("ce0")).alias("ce"))
        )
    return centn


def _s11_ivf_index(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Build (or fetch the memoized) s11 IVF index for the corpus at
    ``sf_dir``: returns (centn, assign) — the trained unit centroids
    (cid, ce) and the inverted-list assignment (vec_id, cid), both
    persisted and materialized so downstream probes never re-run the
    Lloyd loop.

    Deterministic, oracle-expressible index build: K seeds picked by
    rank spacing over corpus vec_ids (the deterministic stand-in for
    sampled k-means++ init — the id-only rank is the one bounded
    single-reducer step; at 100 TB you'd sample ids instead), then
    _HS_IVF_ROUNDS Lloyd rounds where assignment is a broadcast-K
    argmax (map-only over the corpus) and the new centroid is a
    partial-agg average. Centroid components round to 6 decimals so
    both engines see bit-identical centroids (the avg's partial-sum
    order is engine-specific; rounding an aggregate is the house
    discipline)."""
    global _IVF_BUILDS
    key = (spark.sparkContext.applicationId, os.path.abspath(sf_dir))
    hit = _IVF_MEMO.get(key)
    if hit is not None:
        return hit
    # a new application invalidates every cached DataFrame
    for k in [k for k in _IVF_MEMO if k[0] != key[0]]:
        del _IVF_MEMO[k]
    from .dedup import _keyed_persist

    u_corp = _s11_corpus(spark, sf_dir)
    centn = _lloyd_centroids(u_corp)
    # the trained centroids are 8 rows but carry the whole Lloyd-loop
    # lineage — persisting them (keyed, like corpus/assign) keeps the
    # index build from re-executing under every downstream reference
    centn = _keyed_persist(f"s11.cent.{key[1]}", centn)
    assign = _keyed_persist(
        f"s11.assign.{key[1]}", _nearest_cid(u_corp, centn, "vec_id", 1)
    )
    # the persisted frames materialize at the FIRST downstream action
    # (plan construction itself stays job-free — the house laziness
    # discipline, tests/test_plans.py); later invocations' plans read
    # the in-memory index, never the Lloyd lineage
    _IVF_BUILDS += 1
    _IVF_MEMO[key] = (centn, assign)
    return centn, assign


def _s11_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted unit-normalized corpus frame shared by the index
    build and the probe/rerank path."""
    from .dedup import _keyed_persist

    from .dedup import _LIVE_CACHES

    key = f"s11.corpus.{spark.sparkContext.applicationId}.{os.path.abspath(sf_dir)}"
    hit = _LIVE_CACHES.get(key)
    if hit is not None:
        return hit
    emb = load_table(spark, sf_dir, "embeddings")
    u = emb.select("vec_id", unit_vec(F.col("embedding")).alias("e"))
    return _keyed_persist(key, u.filter(F.col("vec_id") >= _HS_NQ))


def _s11_dense_ranked(spark: SparkSession, sf_dir: str) -> DataFrame:
    """s11's dense retrieval leg, exposed for the recall-floor quality
    test: IVF-probed cosine top-candidates per query (query_id,
    doc_id, vec_rank). The index comes from _s11_ivf_index (memoized —
    built once per corpus); queries probe the top-_HS_IVF_P lists and
    candidates come from the cid EQUI-JOIN against the inverted-list
    assignment — per-query cost is the probed lists, never the
    corpus."""
    u_corp = _s11_corpus(spark, sf_dir)
    centn, assign = _s11_ivf_index(spark, sf_dir)
    u_q = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", unit_vec(F.col("embedding")).alias("e"))
        .filter(F.col("vec_id") < _HS_NQ)
    )

    def nearest_cid(points: DataFrame, cents: DataFrame, id_col: str, top: int):
        w = Window.partitionBy(id_col).orderBy(
            F.col("score").desc(), F.col("cid")
        )
        return (
            points.crossJoin(F.broadcast(cents))
            .select(
                id_col,
                "cid",
                F.round(dot(F.col("e"), F.col("ce")), 6).alias("score"),
            )
            .withColumn("r", F.row_number().over(w))
            .filter(F.col("r") <= top)
            .select(id_col, "cid")
        )

    probes = nearest_cid(
        u_q.select(F.col("vec_id").alias("query_id"), "e"),
        centn,
        "query_id",
        _HS_IVF_P,
    )
    sims = (
        probes.join(assign, "cid")  # the inverted-list equi-join
        .select("query_id", F.col("vec_id").alias("doc_id"))
        .join(
            F.broadcast(
                u_q.select(F.col("vec_id").alias("query_id"), F.col("e").alias("q_e"))
            ),
            "query_id",
        )
        .join(u_corp.select(F.col("vec_id").alias("doc_id"), F.col("e").alias("c_e")), "doc_id")
        .select(
            "query_id",
            "doc_id",
            F.round(dot(F.col("q_e"), F.col("c_e")), 6).alias("sim"),
        )
    )
    wv = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("doc_id"))
    vec_ranked = (
        sims.withColumn("vec_rank", F.row_number().over(wv))
        .filter(F.col("vec_rank") <= _HS_TOPC)
        .select("query_id", "doc_id", "vec_rank")
    )
    return vec_ranked


@register(
    "s11_hybrid_search",
    late=True,
    oracle=f"""
    WITH corpus AS (
      SELECT d.doc_id, d.text
      FROM documents d JOIN embeddings e ON e.vec_id = d.doc_id
      WHERE d.doc_id >= {_HS_NQ}
    ), toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM corpus
    ), postings AS (
      SELECT doc_id, w, count(*) AS tf FROM toks GROUP BY doc_id, w
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id
    ), stats AS (
      SELECT avg(dl) AS avgdl, count(*) AS n_docs FROM dl
    ), dfreq AS (
      SELECT w, count(*) AS df FROM postings GROUP BY w
    ), qt AS (
      SELECT doc_id AS query_id,
             unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w
      FROM documents WHERE doc_id < {_HS_NQ}
    ), lex AS (
      SELECT query_id, p.doc_id,
             round(sum(
               ln((n_docs - df + 0.5) / (df + 0.5) + 1)
               * tf * ({_HS_K1} + 1)
               / (tf + {_HS_K1} * (1 - {_HS_B} + {_HS_B} * dl.dl / avgdl))
             ), 4) AS lex_score
      FROM qt
        JOIN postings p USING (w)
        JOIN dfreq USING (w)
        JOIN dl ON dl.doc_id = p.doc_id
        CROSS JOIN stats
      GROUP BY query_id, p.doc_id
    ), lex_ranked AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY lex_score DESC, doc_id) AS lex_rank
      FROM lex
      QUALIFY lex_rank <= {_HS_TOPC}
    ), u AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), ucorp AS (
      SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM u WHERE vec_id >= {_HS_NQ}
    ), ncorp AS (
      SELECT count(*) AS n FROM ucorp
    ), c0 AS (
      SELECT CAST(rn / CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) AS INT) AS cid,
             e AS ce
      FROM ucorp, ncorp
      WHERE rn % CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) = 0
    ), a0 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c0 s) WHERE r = 1
    ), c1 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a0.cid, i, round(avg(x), 6) AS v FROM a0
            JOIN ucorp c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a0.cid, i) GROUP BY cid)
    ), a1 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c1 s) WHERE r = 1
    ), c2 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a1.cid, i, round(avg(x), 6) AS v FROM a1
            JOIN ucorp c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a1.cid, i) GROUP BY cid)
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c2 s) WHERE r = 1
    ), probes AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, s.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.e, s.ce), 6) DESC, s.cid) AS r
        FROM u q CROSS JOIN c2 s WHERE q.vec_id < {_HS_NQ}) WHERE r <= {_HS_IVF_P}
    ), sims AS (
      SELECT p.query_id, a.vec_id AS doc_id,
             round(list_dot_product(q.e, c.e), 6) AS sim
      FROM probes p JOIN assign a USING (cid)
        JOIN u q ON q.vec_id = p.query_id
        JOIN ucorp c ON c.vec_id = a.vec_id
    ), vec_ranked AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, doc_id) AS vec_rank
      FROM sims
      QUALIFY vec_rank <= {_HS_TOPC}
    ), fused AS (
      SELECT coalesce(l.query_id, v.query_id) AS query_id,
             coalesce(l.doc_id, v.doc_id) AS doc_id,
             l.lex_rank, v.vec_rank,
             round(coalesce(1.0 / ({_HS_RRF_K} + l.lex_rank), 0)
                   + coalesce(1.0 / ({_HS_RRF_K} + v.vec_rank), 0), 6) AS rrf_score
      FROM lex_ranked l
      FULL OUTER JOIN vec_ranked v
        ON l.query_id = v.query_id AND l.doc_id = v.doc_id
    )
    SELECT query_id, doc_id, rrf_score, lex_rank, vec_rank
    FROM fused
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id) <= {_HS_TOPK}
    """,
    doc="HYBRID retrieval — the modern search stack in one plan: BM25 "
    "lexical scoring (corpus statistics computed in-plan: postings, "
    "doc lengths, idf) and an IVF-PROBED dense leg (VERDICT r5 item "
    "4 — no corpus crossJoin: deterministic rank-spaced seeds + 2 "
    "Lloyd rounds build 8 inverted lists, queries probe the top-4 "
    "lists via a cid equi-join, exact rerank inside the probed "
    "lists), fused by reciprocal-rank fusion (k=60). Every stage is "
    "a linear equi-join or aggregation: the lexical candidates come "
    "from a token-postings join (never doc x doc), and both "
    "per-modality rankings prune to top-20 with WindowGroupLimit "
    "before the fusion outer join. Centroid components round to 6 "
    "decimals and scores round before ranking on BOTH engines, so "
    "index build, probe, rank and fusion are all deterministic — the "
    "whole IVF topology is oracle-checked end to end. nprobe is the "
    "recall/cost dial: 4/8 lists measure ~0.77 recall@20 vs the "
    "brute leg on this weakly-clustered corpus (floor pinned in "
    "tests/test_similarity_quality.py). The curation use: hybrid "
    "retrieval is how eval-set contamination and near-duplicate "
    "hunting catch paraphrases that lexical-only dedup misses.",
)
def s11_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .text import distinct_tokens, tokens

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    corpus = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id"
    ).filter(F.col("doc_id") >= _HS_NQ)
    toks = corpus.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    postings = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    stats = dl.agg(F.avg("dl").alias("avgdl"), F.count(F.lit(1)).alias("n_docs"))
    dfreq = postings.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    qt = docs.filter(F.col("doc_id") < _HS_NQ).select(
        F.col("doc_id").alias("query_id"),
        F.explode(distinct_tokens(F.col("text"))).alias("w"),
    )
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
    contrib = (
        idf
        * F.col("tf")
        * (_HS_K1 + 1)
        / (
            F.col("tf")
            + _HS_K1 * (1 - _HS_B + _HS_B * F.col("dl") / F.col("avgdl"))
        )
    )
    lex = (
        qt.join(postings, "w")
        .join(dfreq, "w")
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(F.round(F.sum(contrib), 4).alias("lex_score"))
    )
    wl = Window.partitionBy("query_id").orderBy(
        F.col("lex_score").desc(), F.col("doc_id")
    )
    lex_ranked = (
        lex.withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= _HS_TOPC)
        .select("query_id", "doc_id", "lex_rank")
    )
    vec_ranked = _s11_dense_ranked(spark, sf_dir)
    fused = lex_ranked.join(vec_ranked, ["query_id", "doc_id"], "full_outer").select(
        "query_id",
        "doc_id",
        "lex_rank",
        "vec_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (_HS_RRF_K + F.col("lex_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (_HS_RRF_K + F.col("vec_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    wf = Window.partitionBy("query_id").orderBy(
        F.col("rrf_score").desc(), F.col("doc_id")
    )
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .filter(F.col("rn") <= _HS_TOPK)
        .select("query_id", "doc_id", "rrf_score", "lex_rank", "vec_rank")
    )


# --------------------------------------------------------------------------
# s12 — ANN over a PERSISTED IVF index: cid-partitioned parquet lists,
# probe = partition-pruned scan (the production index shape)
# --------------------------------------------------------------------------

_S12_DIR_MEMO: dict[str, str] = {}


def _s12_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialize the s11-trained IVF index as the on-disk layout a
    production deployment actually probes: inverted lists written as
    parquet PARTITIONED BY cid (st09's streaming job maintains the
    same layout incrementally), plus the 8 trained centroids. Built
    once per corpus (memoized dir); the build reuses _s11_ivf_index's
    memoized (centroids, assignment), so repeat calls in a session
    pay nothing."""
    import tempfile

    key = os.path.abspath(sf_dir)
    d = _S12_DIR_MEMO.get(key)
    if d is not None and os.path.isdir(os.path.join(d, "lists")):
        return d
    centn, assign = _s11_ivf_index(spark, sf_dir)
    u_corp = _s11_corpus(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="tinysql_s12_")
    # clean up at exit like q69's warehouse (VERDICT r8 item 6 applied
    # fleet-wide to per-process materialized layouts)
    import atexit
    import shutil

    atexit.register(shutil.rmtree, d, ignore_errors=True)
    (
        assign.join(u_corp, "vec_id")
        .select("cid", "vec_id", "e")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(os.path.join(d, "lists"))
    )
    centn.write.mode("overwrite").parquet(os.path.join(d, "centroids"))
    _S12_DIR_MEMO[key] = d
    return d


@register(
    "s12_ann_persisted_ivf",
    late=True,
    oracle=f"""
    WITH u AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), ucorp AS (
      SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM u WHERE vec_id >= {_HS_NQ}
    ), ncorp AS (
      SELECT count(*) AS n FROM ucorp
    ), c0 AS (
      SELECT CAST(rn / CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) AS INT) AS cid,
             e AS ce
      FROM ucorp, ncorp
      WHERE rn % CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) = 0
    ), a0 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c0 s) WHERE r = 1
    ), c1 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a0.cid, i, round(avg(x), 6) AS v FROM a0
            JOIN ucorp c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a0.cid, i) GROUP BY cid)
    ), a1 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c1 s) WHERE r = 1
    ), c2 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a1.cid, i, round(avg(x), 6) AS v FROM a1
            JOIN ucorp c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a1.cid, i) GROUP BY cid)
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c2 s) WHERE r = 1
    ), probes AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, s.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.e, s.ce), 6) DESC, s.cid) AS r
        FROM u q CROSS JOIN c2 s WHERE q.vec_id < {_HS_NQ}) WHERE r <= {_HS_IVF_P}
    ), sims AS (
      SELECT p.query_id, a.vec_id AS doc_id,
             round(list_dot_product(q.e, c.e), 6) AS sim
      FROM probes p JOIN assign a USING (cid)
        JOIN u q ON q.vec_id = p.query_id
        JOIN ucorp c ON c.vec_id = a.vec_id
    )
    SELECT query_id, doc_id, round(sim, 4) AS cos_sim
    FROM sims
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, doc_id) <= {_TOP_K}
    """,
    doc="ANN against a PERSISTED index — the deployment shape s11's "
    "in-session memo approximates: the trained inverted lists live "
    "as parquet PARTITIONED BY cid (the directory layout st09's "
    "streaming job maintains), and a probe is a PARTITION-PRUNED "
    "scan — queries rank the 8 stored centroids, the union of their "
    "top-4 list ids becomes a literal cid IN (...) filter, and the "
    "parquet source prunes to exactly those list directories before "
    "a single row is read (PartitionFilters in the plan, pinned in "
    "tests/test_plans.py). Per-query cost at 100 TB is therefore "
    "nprobe/K of the index BYTES, not just of the rows — the same "
    "reason every production vector store shards lists into "
    "separately-addressable files. The bounded probe collect is "
    "|queries| x nprobe ids (never corpus-scaled). Rerank is the "
    "exact dot product inside the probed lists; index build, probe "
    "and rank are the deterministic s11 pipeline, so the whole "
    "persisted topology is oracle-checked end to end.",
)
def s12_ann_persisted_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _probe_ivf_dir(spark, sf_dir, _s12_index_dir(spark, sf_dir))


def _probe_ivf_dir(
    spark: SparkSession, sf_dir: str, d: str, tombstones: DataFrame | None = None
) -> DataFrame:
    """The partition-pruned probe over an on-disk IVF layout (lists
    partitioned by cid + a centroids file) — shared by s12 (built
    index), s14 (maintained index) and s15 (maintained index with
    deletes): queries rank the stored centroids, the union of their
    top-nprobe list ids becomes a literal cid IN (...) filter (static
    partition pruning), rerank is the exact dot product inside the
    probed lists. The probe collect is |queries| x nprobe ids — never
    corpus-scaled. ``tombstones`` (a vec_id DataFrame) is
    broadcast-anti-joined against the probed lists BEFORE ranking —
    the logical-delete read path; bounded by delete volume, and past
    a broadcast ceiling production swaps in d16's bloom prefilter."""
    cents = spark.read.parquet(os.path.join(d, "centroids"))
    u_q = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < _HS_NQ)
        .select(
            F.col("vec_id").alias("query_id"),
            unit_vec(F.col("embedding")).alias("e"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("cid"))
    probes = (
        u_q.crossJoin(F.broadcast(cents))
        .select(
            "query_id",
            "cid",
            F.round(dot(F.col("e"), F.col("ce")), 6).alias("score"),
        )
        .withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= _HS_IVF_P)
        .select("query_id", "cid")
    )
    probe_rows = probes.collect()  # |queries| x nprobe — bounded by design
    cids = sorted({r["cid"] for r in probe_rows})
    pairs = spark.createDataFrame(
        [(r["query_id"], r["cid"]) for r in probe_rows], "query_id long, cid int"
    )
    # literal IN list => static partition pruning on the list dirs
    lists = spark.read.parquet(os.path.join(d, "lists")).filter(
        F.col("cid").isin(*[int(c) for c in cids])
    )
    if tombstones is not None:
        lists = lists.join(
            F.broadcast(tombstones.select("vec_id")), "vec_id", "left_anti"
        )
    sims = (
        lists.join(F.broadcast(pairs), "cid")
        .join(
            F.broadcast(u_q.select("query_id", F.col("e").alias("q_e"))),
            "query_id",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("doc_id"),
            F.round(dot(F.col("q_e"), F.col("e")), 6).alias("sim"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("doc_id"))
    return (
        sims.withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= _TOP_K)
        .select("query_id", "doc_id", F.round("sim", 4).alias("cos_sim"))
    )


# --------------------------------------------------------------------------
# s13 — kNN-GRAPH construction: every vector's k nearest in-block
# neighbors (the batch primitive under graph-ANN indexes, SemDeDup-
# style pruning, and kNN-classification backfills)
# --------------------------------------------------------------------------

_S13_K = 4  # neighbors per vector


@register(
    "s13_knn_graph",
    late=True,
    oracle=f"""
    WITH u AS (
      SELECT vec_id, label,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), scored AS (
      SELECT a.vec_id, b.vec_id AS nbr_id,
             list_dot_product(a.e, b.e) AS sim
      FROM u a JOIN u b
        ON a.label = b.label AND a.vec_id <> b.vec_id
    )
    SELECT vec_id, nbr_id, round(sim, 4) AS cos_sim,
           CAST(row_number() OVER (PARTITION BY vec_id
                ORDER BY round(sim, 6) DESC, nbr_id) AS BIGINT) AS rank
    FROM scored
    QUALIFY row_number() OVER (PARTITION BY vec_id
            ORDER BY round(sim, 6) DESC, nbr_id) <= {_S13_K}
    """,
    doc=f"kNN-GRAPH construction: for EVERY corpus vector, its "
    f"{_S13_K} nearest neighbors within its coarse block (label = "
    "the IVF-style partition d05/d14 block on) — the batch primitive "
    "graph-based ANN indexes (NSW/NN-Descent seeding), SemDeDup-"
    "style pruning, and kNN label backfills are built from. Unlike "
    "s01/s09 (a few queries vs the corpus) this is all-vectors x "
    "in-block, so the pair space is the real cost: candidate "
    "generation reuses the chunked hot-block Arrow scorer "
    "(_block_pair_sims) and SYMMETRIZES each unordered pair into "
    "both directions — at 100 TB one skewed block spreads over "
    "k(k+1)/2 bounded shuffle buckets, never one near-cartesian "
    "task. Ranking is a per-vector row_number window whose group "
    "size is bounded by the block cap, ordered by round(sim, 6) "
    "desc with the neighbor id as the deterministic tiebreak (the "
    "s09 discipline: both engines rank the same rounded key, so "
    "last-ulp dot-product skew cannot flip ranks). APPROXIMATION "
    "BOUNDARY (documented): neighbors are in-block only — a "
    "vector's true nearest neighbor in ANOTHER block is not "
    "considered, exactly the IVF nprobe=1 trade; s04 measures that "
    "recall for the shared blocking.",
)
def s13_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .dedup import _block_pair_sims

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", unit_vec(F.col("embedding")).alias("e")
    )
    pairs = _block_pair_sims(emb)
    # each unordered pair arrives once (lo < hi) -> emit both
    # directions so every vector sees its full in-block candidate set.
    # Explode-of-2-structs, not union-of-selects: the union form ran
    # the Arrow pair scorer once PER BRANCH (r14 — see _sym_edges)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("lo").alias("vec_id"),
                    F.col("hi").alias("nbr_id"),
                    F.col("sim").alias("sim"),
                ),
                F.struct(
                    F.col("hi").alias("vec_id"),
                    F.col("lo").alias("nbr_id"),
                    F.col("sim").alias("sim"),
                ),
            )
        ).alias("e")
    ).select("e.vec_id", "e.nbr_id", "e.sim")
    w = Window.partitionBy("vec_id").orderBy(
        F.round("sim", 6).desc(), F.col("nbr_id")
    )
    return (
        sym.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= _S13_K)
        .select("vec_id", "nbr_id", F.round("sim", 4).alias("cos_sim"), "rank")
    )


# --------------------------------------------------------------------------
# s14 — MAINTAINED persisted IVF index: incremental vector ingest into
# the s12 layout (the ANN mirror of d18's maintained keeper index)
# --------------------------------------------------------------------------

_S14_DIR_MEMO: dict[str, str] = {}
_S14_TRAIN_MOD = 3  # vec_id % 5 < 3 is the base build; 3 and 4 are batches
_S14_REBAL = 4.0  # max/mean list-size ratio that flags a recluster


def s14_needs_recluster(sizes: dict[int, int], threshold: float = _S14_REBAL) -> bool:
    """Drift gate for the maintained index: appends assign to FROZEN
    centroids, so a shifting ingest distribution shows up as list-size
    skew. max/mean above the threshold flags a retrain+rewrite (the
    d18-compaction analog for the ANN side). The maintained layout
    stays exact either way — probes rerank with true dot products
    inside the probed lists — so the gate guards recall/balance, not
    correctness."""
    if not sizes:
        return False
    mean = sum(sizes.values()) / len(sizes)
    return max(sizes.values()) > threshold * mean


def _s14_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build the BASE IVF index from the training slice, then APPEND
    two ingest batches — the maintenance step s12 declares out of
    scope (s12 builds once from the full corpus; a production ingest
    assigns each batch to the FROZEN trained centroids and appends).

    Physical shape: lists live as parquet PARTITIONED BY cid (s12's
    layout, the one st09's streaming job maintains); each batch is a
    broadcast-K argmax assignment (map-only over the batch — the
    history corpus is never re-read) written with mode=append +
    partitionBy, so Spark adds files ONLY under the list partitions
    the batch actually assigned into (the dirty-list property; the
    manifest records assignment-derived dirty cids AND the appended
    file paths separately so the test's containment check is
    non-vacuous). A per-list size audit + drift gate
    (s14_needs_recluster) closes the loop: frozen-centroid appends
    skew list sizes as the ingest distribution drifts, and past the
    threshold a production deployment retrains + rewrites (d18's
    compaction analog). Reference analog: ADD INDEX backfill +
    incremental write (ddl/index.go:428); IVF list layout after
    Jegou et al. 2011 (FAISS keeps codes + assignments resident and
    appends to lists; it does not re-cluster per batch)."""
    import atexit
    import glob
    import json
    import shutil
    import tempfile

    from .dedup import _keyed_persist

    key = os.path.abspath(sf_dir)
    d = _S14_DIR_MEMO.get(key)
    if d is not None and os.path.isdir(os.path.join(d, "lists")):
        return d
    u_corp = _s11_corpus(spark, sf_dir)
    base = u_corp.filter(F.col("vec_id") % 5 < _S14_TRAIN_MOD)
    centn = _keyed_persist(
        f"s14.cent.{spark.sparkContext.applicationId}.{key}",
        _lloyd_centroids(base),
    )
    d = tempfile.mkdtemp(prefix="tinysql_s14_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    lists = os.path.join(d, "lists")

    def assigned(part: DataFrame) -> DataFrame:
        return (
            _nearest_cid(part, centn, "vec_id", 1)
            .join(part, "vec_id")
            .select("cid", "vec_id", "e")
        )

    assigned(base).write.mode("overwrite").partitionBy("cid").parquet(lists)
    manifest: dict = {
        "base": sorted(glob.glob(os.path.join(lists, "cid=*", "*.parquet"))),
        "batches": [],
    }
    for m in range(_S14_TRAIN_MOD, 5):
        batch = assigned(u_corp.filter(F.col("vec_id") % 5 == m))
        # dirty list ids come from the ASSIGNMENT (bounded by K rows),
        # not from the filesystem delta, so the test's "appended files
        # live only under dirty lists" check is non-vacuous
        dirty = sorted(
            int(r["cid"]) for r in batch.select("cid").distinct().collect()
        )
        pre = set(glob.glob(os.path.join(lists, "cid=*", "*.parquet")))
        batch.write.mode("append").partitionBy("cid").parquet(lists)
        post = set(glob.glob(os.path.join(lists, "cid=*", "*.parquet")))
        manifest["batches"].append(
            {"mod": m, "dirty_cids": dirty, "appended": sorted(post - pre)}
        )
    sizes = {
        int(r["cid"]): int(r["n"])
        for r in spark.read.parquet(lists)
        .groupBy("cid")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    manifest["list_sizes"] = {str(k): v for k, v in sorted(sizes.items())}
    mean = sum(sizes.values()) / max(len(sizes), 1)
    manifest["imbalance"] = round(max(sizes.values()) / mean, 4) if sizes else 0.0
    manifest["needs_recluster"] = s14_needs_recluster(sizes)
    centn.write.mode("overwrite").parquet(os.path.join(d, "centroids"))
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    _S14_DIR_MEMO[key] = d
    return d


@register(
    "s14_ann_maintained_ivf",
    late=True,
    oracle=f"""
    WITH u AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), ucorp AS (
      SELECT vec_id, e FROM u WHERE vec_id >= {_HS_NQ}
    ), tr AS (
      SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM ucorp WHERE vec_id % 5 < {_S14_TRAIN_MOD}
    ), ntr AS (
      SELECT count(*) AS n FROM tr
    ), c0 AS (
      SELECT CAST(rn / CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) AS INT) AS cid,
             e AS ce
      FROM tr, ntr
      WHERE rn % CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) = 0
    ), a0 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM tr c CROSS JOIN c0 s) WHERE r = 1
    ), c1 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a0.cid, i, round(avg(x), 6) AS v FROM a0
            JOIN tr c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a0.cid, i) GROUP BY cid)
    ), a1 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM tr c CROSS JOIN c1 s) WHERE r = 1
    ), c2 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a1.cid, i, round(avg(x), 6) AS v FROM a1
            JOIN tr c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a1.cid, i) GROUP BY cid)
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c2 s) WHERE r = 1
    ), probes AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, s.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.e, s.ce), 6) DESC, s.cid) AS r
        FROM u q CROSS JOIN c2 s WHERE q.vec_id < {_HS_NQ}) WHERE r <= {_HS_IVF_P}
    ), sims AS (
      SELECT p.query_id, a.vec_id AS doc_id,
             round(list_dot_product(q.e, c.e), 6) AS sim
      FROM probes p JOIN assign a USING (cid)
        JOIN u q ON q.vec_id = p.query_id
        JOIN ucorp c ON c.vec_id = a.vec_id
    )
    SELECT query_id, doc_id, round(sim, 4) AS cos_sim
    FROM sims
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, doc_id) <= {_TOP_K}
    """,
    doc="ANN against a MAINTAINED persisted index — the ingest step "
    "s12 leaves out (s12 trains and writes once; production appends "
    "every batch): centroids train on the BASE slice only (vec_id % "
    "5 < 3, the deterministic stand-in for 'the corpus as of "
    "yesterday'), the base writes as cid-partitioned inverted lists, "
    "and two ingest batches are each assigned to the FROZEN trained "
    "centroids (broadcast-8 argmax, map-only over the batch — the "
    "indexed corpus is never re-read) and appended so only DIRTY "
    "list partitions receive files (asserted by test from the build "
    "manifest, dirty set derived from the assignment, not the "
    "filesystem). A per-list size audit + drift gate "
    "(s14_needs_recluster) flags when frozen-centroid appends have "
    "skewed the lists enough to warrant retrain+rewrite — d18's "
    "compaction analog; the layout stays exact regardless (probes "
    "rerank with true dot products). Probing is the s12 "
    "partition-pruned path against the maintained layout, so the "
    "oracle checks the END STATE of build+two-appends end to end: "
    "the maintained index must equal the index you'd get assigning "
    "the full corpus to the same base-trained centroids. Reference "
    "analog: ADD INDEX backfill (ddl/index.go:428); st09 is the "
    "streaming formulation, d18 the dedup-index mirror.",
)
def s14_ann_maintained_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _probe_ivf_dir(spark, sf_dir, _s14_index_dir(spark, sf_dir))


def s14_compact_lists(
    spark: SparkSession, sf_dir: str, max_files: int = 1
) -> dict[int, int]:
    """Compaction for the maintained IVF lists: every per-batch append
    adds one file per dirty cid partition, so a long ingest history
    fragments the lists the probe reads. Any cid partition holding
    more than ``max_files`` parquet files is rewritten as one via the
    crash-safe prepare-then-swap kernel shared with d18/d19
    (_compact_index_buckets — stage outside the root, rename aside,
    rename in, delete last; every intermediate state recoverable,
    no malformed partition visible to a concurrent probe). Returns
    {cid: n_files_before} for every compacted list. At 100 TB the
    cost is one read+write of the over-fragmented lists only — never
    a full-index rewrite; probe results are unchanged by construction
    (same rows, fewer files), pinned by test."""
    from .dedup import _compact_index_buckets

    d = _s14_index_dir(spark, sf_dir)
    return _compact_index_buckets(
        spark, os.path.join(d, "lists"), max_files, part_col="cid"
    )


# --------------------------------------------------------------------------
# s15 — maintained IVF index with DELETES: tombstone batches shadow
# vectors at probe time (logical delete), a purge pass physically
# rewrites only the dirty lists (the d18-compaction analog for
# removals; completes the s12 build / s14 append / s15 delete triad)
# --------------------------------------------------------------------------

_S15_DIR_MEMO: dict[str, str] = {}
_S15_TOMB_MODS = (7, 11)  # two delete batches: vec_id % 7, then % 11


def _s15_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build s15's OWN copy of the s12 layout (the purge pass mutates
    it — s12/s14's memoized dirs must stay pristine for their own
    oracles) from the memoized (centroids, assignment), then apply
    two tombstone batches: each batch appends its deleted vec_ids to
    a ``tombstones/`` parquet dir (an O(batch) metadata write — the
    index itself is untouched; FAISS's remove_ids and every
    LSM-flavored store make the same logical-first choice) and the
    manifest records the batch's dirty cids FROM THE ASSIGNMENT (a
    bounded map-only join — never an index scan)."""
    import atexit
    import glob
    import json
    import shutil
    import tempfile

    key = os.path.abspath(sf_dir)
    d = _S15_DIR_MEMO.get(key)
    if d is not None and os.path.isdir(os.path.join(d, "lists")):
        return d
    centn, assign = _s11_ivf_index(spark, sf_dir)
    u_corp = _s11_corpus(spark, sf_dir)
    d = tempfile.mkdtemp(prefix="tinysql_s15_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    lists = os.path.join(d, "lists")
    (
        assign.join(u_corp, "vec_id")
        .select("cid", "vec_id", "e")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(lists)
    )
    centn.write.mode("overwrite").parquet(os.path.join(d, "centroids"))
    tombs = os.path.join(d, "tombstones")
    manifest: dict = {"batches": [], "n_lists": len(glob.glob(lists + "/cid=*"))}
    for m in _S15_TOMB_MODS:
        batch = assign.filter(F.col("vec_id") % m == 0).select("vec_id", "cid")
        dirty = sorted(int(r["cid"]) for r in batch.select("cid").distinct().collect())
        batch.select("vec_id").write.mode("append").parquet(tombs)
        manifest["batches"].append(
            {"mod": m, "n_deleted": batch.count(), "dirty_cids": dirty}
        )
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    _S15_DIR_MEMO[key] = d
    return d


def _s15_tombstones(spark: SparkSession, sf_dir: str) -> DataFrame:
    import glob

    d = _s15_index_dir(spark, sf_dir)
    tombs = os.path.join(d, "tombstones")
    if not glob.glob(os.path.join(tombs, "*.parquet")):
        # post-purge: the logical delete set is empty
        return spark.createDataFrame([], "vec_id long")
    return spark.read.parquet(tombs)


@register(
    "s15_ann_tombstone_delete",
    late=True,
    oracle=f"""
    WITH u AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), ucorp AS (
      SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM u WHERE vec_id >= {_HS_NQ}
    ), ncorp AS (
      SELECT count(*) AS n FROM ucorp
    ), c0 AS (
      SELECT CAST(rn / CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) AS INT) AS cid,
             e AS ce
      FROM ucorp, ncorp
      WHERE rn % CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) = 0
    ), a0 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c0 s) WHERE r = 1
    ), c1 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a0.cid, i, round(avg(x), 6) AS v FROM a0
            JOIN ucorp c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a0.cid, i) GROUP BY cid)
    ), a1 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c1 s) WHERE r = 1
    ), c2 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a1.cid, i, round(avg(x), 6) AS v FROM a1
            JOIN ucorp c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a1.cid, i) GROUP BY cid)
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM ucorp c CROSS JOIN c2 s) WHERE r = 1
    ), probes AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, s.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.e, s.ce), 6) DESC, s.cid) AS r
        FROM u q CROSS JOIN c2 s WHERE q.vec_id < {_HS_NQ}) WHERE r <= {_HS_IVF_P}
    ), sims AS (
      SELECT p.query_id, a.vec_id AS doc_id,
             round(list_dot_product(q.e, c.e), 6) AS sim
      FROM probes p JOIN assign a USING (cid)
        JOIN u q ON q.vec_id = p.query_id
        JOIN ucorp c ON c.vec_id = a.vec_id
      WHERE a.vec_id % {_S15_TOMB_MODS[0]} <> 0
        AND a.vec_id % {_S15_TOMB_MODS[1]} <> 0
    )
    SELECT query_id, doc_id, round(sim, 4) AS cos_sim
    FROM sims
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, doc_id) <= {_TOP_K}
    """,
    doc="ANN against a maintained index WITH DELETES — the operation "
    "the s12 build / s14 append pair leaves out, and the one every "
    "right-to-be-forgotten / retraction pipeline needs: two delete "
    "batches append their vec_ids to a TOMBSTONE set (an O(batch) "
    "metadata write — the cid-partitioned lists are untouched; "
    "FAISS remove_ids and every LSM-flavored store make the same "
    "logical-first choice), and the probe — s12's partition-pruned "
    "path via the shared _probe_ivf_dir — broadcast-anti-joins the "
    "tombstones against the probed lists BEFORE ranking, so deleted "
    "vectors can never surface (bounded by delete volume; past a "
    "broadcast ceiling production swaps in d16's bloom prefilter). "
    "The companion purge pass (s15_purge_tombstones, pinned by "
    "test) physically rewrites ONLY the dirty lists — dirty cids "
    "derived from the bounded assignment join, never an index scan "
    "— through the crash-safe prepare-then-swap kernel shared with "
    "d18/s14, then truncates the tombstone set; probe results are "
    "identical before and after by construction (logical == "
    "physical delete), which the test asserts. The oracle pins the "
    "END STATE: probe(build + 2 delete batches) must equal a "
    "from-scratch probe over the surviving vectors against the SAME "
    "full-corpus-trained centroids (deletes never retrain — the "
    "maintained-index semantics). Reference analog: DeleteExec's "
    "handle-based removal (executor/delete.go:28) applied to the "
    "index layout, d18's maintenance mirror on the removal side.",
)
def s15_ann_tombstone_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _s15_index_dir(spark, sf_dir)
    return _probe_ivf_dir(spark, sf_dir, d, tombstones=_s15_tombstones(spark, sf_dir))


def s15_purge_tombstones(spark: SparkSession, sf_dir: str) -> dict[int, int]:
    """Physically remove tombstoned vectors from the lists: dirty cids
    come from the manifest (assignment-derived at delete time — never
    an index scan), each dirty cid partition is rewritten through the
    shared crash-safe swap kernel with the tombstone anti-join as the
    rewrite, and the tombstone set is then truncated (the logical
    delete set is empty once the physical state caught up). At 100 TB
    the cost is one read+write of the dirty lists only. Returns
    {cid: n_files_before} for every rewritten list."""
    import glob
    import json
    import shutil

    from .dedup import _compact_index_buckets

    d = _s15_index_dir(spark, sf_dir)
    with open(os.path.join(d, "manifest.json")) as fh:
        manifest = json.load(fh)
    dirty = {c for b in manifest["batches"] for c in b["dirty_cids"]}
    tomb = _s15_tombstones(spark, sf_dir)
    rewritten = _compact_index_buckets(
        spark,
        os.path.join(d, "lists"),
        max_files=0,
        part_col="cid",
        only_parts=dirty,
        transform=lambda df: df.join(
            F.broadcast(tomb.select("vec_id")), "vec_id", "left_anti"
        ),
    )
    # physical state caught up -> truncate the logical delete set
    tombs = os.path.join(d, "tombstones")
    for f in glob.glob(os.path.join(tombs, "*")):
        (shutil.rmtree if os.path.isdir(f) else os.remove)(f)
    return rewritten


# --------------------------------------------------------------------------
# s16 — RECLUSTER of a drifted maintained index: the rewrite the s14
# drift gate only FLAGS (VERDICT r11 next #4; d18-compaction analog
# for vectors). A skew-injected ingest trips s14_needs_recluster,
# then the recluster retrains on the CURRENT indexed corpus and
# rewrites lists + centroids through the crash-safe swap discipline;
# the end state is oracle-equal to a from-scratch build.
# --------------------------------------------------------------------------

_S16_DIR_MEMO: dict[str, str] = {}
_S16_BASE_MOD = 17  # thin base slice: 'the corpus as of yesterday'


def _s16_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build a DRIFTED maintained index, then recluster it.

    Skew injection (deterministic, the real failure mode): the base
    index trains on a thin slice (vec_id % 17 == 0), and the ingest
    batch is every remaining vector whose nearest FROZEN base
    centroid is the single hottest list — i.e. the ingest
    distribution collapsed onto one region (new documents all about
    one topic). Frozen-centroid appends pile the whole batch onto one
    cid, so max/mean trips s14_needs_recluster (asserted by the
    quality test; the manifest records imbalance before/after).

    Recluster: retrain the deterministic Lloyd pipeline on the
    CURRENT indexed corpus (read back from the lists — the index owns
    its rows; the source table is never re-read), re-assign, and
    rewrite lists + centroids with the same stage/aside/in/delete
    swap discipline as _compact_index_buckets — both full copies
    exist on disk between the two renames, so a crash at any point
    leaves a complete recoverable copy. The reclustered index is
    definitionally the from-scratch build over the indexed corpus
    (same training code, same rows), which is exactly what the oracle
    checks end to end."""
    import atexit
    import json
    import shutil
    import tempfile

    key = os.path.abspath(sf_dir)
    d = _S16_DIR_MEMO.get(key)
    if d is not None and os.path.isdir(os.path.join(d, "lists")):
        return d
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
    batch = (
        arest.filter(F.col("cid") == int(hot))
        .join(rest, "vec_id")
        .select("cid", "vec_id", "e")
    )
    d = tempfile.mkdtemp(prefix="tinysql_s16_")
    atexit.register(shutil.rmtree, d, ignore_errors=True)
    lists = os.path.join(d, "lists")
    (
        _nearest_cid(base, centn, "vec_id", 1)
        .join(base, "vec_id")
        .select("cid", "vec_id", "e")
        .write.mode("overwrite")
        .partitionBy("cid")
        .parquet(lists)
    )
    batch.write.mode("append").partitionBy("cid").parquet(lists)
    centn.write.mode("overwrite").parquet(os.path.join(d, "centroids"))
    sizes = _s16_list_sizes(spark, lists)
    manifest: dict = {
        "hot_cid": int(hot),
        "imbalance_before": _s16_imbalance(sizes),
        "tripped": s14_needs_recluster(sizes),
    }
    manifest.update(s16_recluster(spark, d))
    with open(os.path.join(d, "manifest.json"), "w") as fh:
        json.dump(manifest, fh)
    _S16_DIR_MEMO[key] = d
    return d


def _s16_list_sizes(spark: SparkSession, lists: str) -> dict[int, int]:
    """Per-cid row counts of a partitioned inverted-list dir, read
    from PARQUET FOOTERS (exact num_rows per file) instead of a full
    Spark scan+groupBy — the gate poll runs once per ingest
    micro-batch (st16) and after every maintenance rewrite (s14/s16),
    so metadata-only counting removes a whole-index Spark job per
    poll (guide §6; the sources/layout.py footer discipline). Counts
    are identical: parquet footers carry exact row counts."""
    import glob as _glob

    import pyarrow.parquet as pq

    out: dict[int, int] = {}
    for cdir in _glob.glob(os.path.join(lists, "cid=*")):
        n = 0
        for f in _glob.glob(os.path.join(cdir, "*.parquet")):
            n += pq.ParquetFile(f).metadata.num_rows
        if n:
            out[int(os.path.basename(cdir).split("=", 1)[1])] = n
    return out


def _s16_imbalance(sizes: dict[int, int]) -> float:
    if not sizes:
        return 0.0
    return round(max(sizes.values()) / (sum(sizes.values()) / len(sizes)), 4)


def s16_recluster(spark: SparkSession, d: str) -> dict:
    """Retrain + crash-safe rewrite of a drifted IVF dir: Lloyd over
    the indexed corpus, re-assign, stage the new lists and centroids
    as dot-prefixed dirs, rename old ASIDE, rename new IN, delete the
    aside copies last (the _compact_index_buckets discipline at
    whole-index granularity — a recluster replaces every list, so
    per-partition swaps would just multiply rename windows). Returns
    the post-recluster balance facts for the manifest."""
    import shutil

    lists = os.path.join(d, "lists")
    cents = os.path.join(d, "centroids")
    cur = spark.read.parquet(lists).select("vec_id", "e")
    centn = _lloyd_centroids(cur)
    new_lists = (
        _nearest_cid(cur, centn, "vec_id", 1)
        .join(cur, "vec_id")
        .select("cid", "vec_id", "e")
    )
    stage_l = os.path.join(d, ".reclust-lists")
    stage_c = os.path.join(d, ".reclust-centroids")
    new_lists.write.mode("overwrite").partitionBy("cid").parquet(stage_l)
    centn.write.mode("overwrite").parquet(stage_c)
    aside_l = os.path.join(d, ".aside-lists")
    aside_c = os.path.join(d, ".aside-centroids")
    os.rename(lists, aside_l)
    os.rename(stage_l, lists)
    os.rename(cents, aside_c)
    os.rename(stage_c, cents)
    shutil.rmtree(aside_l, ignore_errors=True)
    shutil.rmtree(aside_c, ignore_errors=True)
    sizes = _s16_list_sizes(spark, lists)
    return {
        "imbalance_after": _s16_imbalance(sizes),
        "balanced": not s14_needs_recluster(sizes),
    }


def _s16_lloyd_sql(train_cte: str, prefix: str) -> str:
    """The deterministic Lloyd chain as DuckDB CTE text over a
    (vec_id, e, rn) training CTE named ``train_cte`` — seeds by rank
    spacing, then two argmax/average refinement rounds (the SQL twin
    of _lloyd_centroids, shared by s16's base and recluster chains)."""
    p = prefix
    return f"""
    {p}n AS (
      SELECT count(*) AS n FROM {train_cte}
    ), {p}c0 AS (
      SELECT CAST(rn / CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) AS INT) AS cid,
             e AS ce
      FROM {train_cte}, {p}n
      WHERE rn % CAST(ceil(n * 1.0 / {_HS_IVF_K}) AS BIGINT) = 0
    ), {p}a0 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM {train_cte} c CROSS JOIN {p}c0 s) WHERE r = 1
    ), {p}c1 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a.cid, i, round(avg(x), 6) AS v FROM {p}a0 a
            JOIN {train_cte} c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a.cid, i) GROUP BY cid)
    ), {p}a1 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM {train_cte} c CROSS JOIN {p}c1 s) WHERE r = 1
    ), {p}c2 AS (
      SELECT cid, list_transform(ce0, x -> x / sqrt(list_dot_product(ce0, ce0))) AS ce
      FROM (
        SELECT cid, list(v ORDER BY i) AS ce0 FROM (
          SELECT a.cid, i, round(avg(x), 6) AS v FROM {p}a1 a
            JOIN {train_cte} c USING (vec_id),
            LATERAL (SELECT unnest(c.e) AS x, generate_subscripts(c.e, 1) AS i) t
          GROUP BY a.cid, i) GROUP BY cid)
    )"""


@register(
    "s16_ann_recluster",
    late=True,
    oracle=f"""
    WITH u AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> x / sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                              CAST(embedding AS DOUBLE[])))) AS e
      FROM embeddings
    ), ucorp AS (
      SELECT vec_id, e FROM u WHERE vec_id >= {_HS_NQ}
    ), tr AS (
      SELECT vec_id, e, row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM ucorp WHERE vec_id % {_S16_BASE_MOD} = 0
    ),{_s16_lloyd_sql("tr", "b")}, arest AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM (SELECT vec_id, e FROM ucorp
              WHERE vec_id % {_S16_BASE_MOD} <> 0) c
        CROSS JOIN bc2 s) WHERE r = 1
    ), hot AS (
      SELECT cid FROM (
        SELECT cid, count(*) AS n FROM arest GROUP BY cid
        ORDER BY n DESC, cid LIMIT 1)
    ), dc AS (
      SELECT vec_id, e,
             row_number() OVER (ORDER BY vec_id) - 1 AS rn
      FROM (
        SELECT vec_id, e FROM ucorp WHERE vec_id % {_S16_BASE_MOD} = 0
        UNION ALL
        SELECT c.vec_id, c.e FROM arest a
          JOIN ucorp c USING (vec_id), hot
        WHERE a.cid = hot.cid)
    ),{_s16_lloyd_sql("dc", "r")}, assign2 AS (
      SELECT vec_id, cid FROM (
        SELECT c.vec_id, s.cid,
               row_number() OVER (PARTITION BY c.vec_id
                 ORDER BY round(list_dot_product(c.e, s.ce), 6) DESC, s.cid) AS r
        FROM dc c CROSS JOIN rc2 s) WHERE r = 1
    ), probes AS (
      SELECT query_id, cid FROM (
        SELECT q.vec_id AS query_id, s.cid,
               row_number() OVER (PARTITION BY q.vec_id
                 ORDER BY round(list_dot_product(q.e, s.ce), 6) DESC, s.cid) AS r
        FROM u q CROSS JOIN rc2 s WHERE q.vec_id < {_HS_NQ}) WHERE r <= {_HS_IVF_P}
    ), sims AS (
      SELECT p.query_id, a.vec_id AS doc_id,
             round(list_dot_product(q.e, c.e), 6) AS sim
      FROM probes p JOIN assign2 a USING (cid)
        JOIN u q ON q.vec_id = p.query_id
        JOIN dc c ON c.vec_id = a.vec_id
    )
    SELECT query_id, doc_id, round(sim, 4) AS cos_sim
    FROM sims
    QUALIFY row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, doc_id) <= {_TOP_K}
    """,
    doc="RECLUSTER of a drifted maintained IVF index — the rewrite "
    "the s14 drift gate only FLAGS, executed (VERDICT r11 #4; d18's "
    "compaction analog for vectors). Skew injection is the real "
    "failure mode: the base trains on a thin slice (vec_id % 17 == "
    "0, 'yesterday's corpus') and the ingest batch is every "
    "remaining vector whose nearest FROZEN centroid is the hottest "
    "list — a drifted stream piling onto one region — so max/mean "
    "list size trips s14_needs_recluster (manifest-recorded, "
    "test-asserted). The recluster then retrains the deterministic "
    "Lloyd pipeline on the CURRENT indexed corpus read back from the "
    "lists (the index owns its rows; the source table is never "
    "re-read), and rewrites lists + centroids with the "
    "stage/aside/in/delete swap discipline shared with "
    "_compact_index_buckets — both complete copies exist between the "
    "renames, so any crash leaves a recoverable index. The oracle "
    "replays base-train -> drift-ingest -> FULL RETRAIN in SQL, so "
    "the probe checks the reclustered end state equals a "
    "from-scratch build over the drifted corpus, end to end. "
    "Balance restored below the gate is asserted separately in "
    "tests/test_similarity_quality.py. Reference analog: OPTIMIZE "
    "TABLE's re-layout rewrite driven by a maintenance trigger.",
)
def s16_ann_recluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _probe_ivf_dir(spark, sf_dir, _s16_index_dir(spark, sf_dir))

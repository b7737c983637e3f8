"""Text-analysis operators for training-data pipelines over `documents`.

Beyond-reference surface (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting. All pure
Column algebra (JVM-side, whole-stage codegen) — no Python UDFs — so
each op scales linearly with input splits at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import register

_WS = r"\s+"


def tokens(col: Column) -> Column:
    """Whitespace tokenization -> array<string>."""
    return F.split(F.trim(col), _WS)


def py_tokens(t: str | None) -> list[str]:
    r"""Python twin of :func:`tokens`, kept faithful to the JVM/RE2
    semantics the oracles use: trim() strips SPACES only, and \s in
    Java regex / RE2 is the ASCII class [ \t\n\x0b\f\r] — Python's
    str.split() would instead strip/split on ALL Unicode whitespace
    (NBSP, U+2028, ...) and silently diverge. Single definition so
    every Arrow-side operator (t08/t09 counting, shingle hashing)
    tokenizes identically."""
    import re

    t = (t or "").strip(" ")
    return re.split("[ \t\n\x0b\f\r]+", t) if t else [""]


def distinct_tokens(col: Column) -> Column:
    return F.array_distinct(tokens(col))


@register(
    "t01_text_stats",
    oracle="""
    SELECT doc_id,
           length(text) AS n_chars_live,
           len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
           len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_tokens,
           len(list_distinct(string_split_regex(trim(text), '\\s+')))
                 * 1.0 / len(string_split_regex(trim(text), '\\s+')) AS ttr
    FROM documents
    """,
    doc="Token counting + type-token ratio; whitespace tokenizer.",
)
def t01_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    dtoks = distinct_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars_live"),
        F.size(toks).alias("n_tokens"),
        F.size(dtoks).alias("n_distinct_tokens"),
        (F.size(dtoks) / F.size(toks)).alias("ttr"),
    )


# Stopword markers per language for the n-gram/stopword heuristic.
# Priority CASE chain keeps the classifier deterministic.
_LANG_MARKERS = [
    ("en", [" the ", " and ", " of "]),
    ("de", [" der ", " und ", " die "]),
    ("fr", [" le ", " et ", " la "]),
    ("es", [" el ", " y ", " los "]),
    ("zh", ["的", "是"]),
]


def lang_pred(text_col: Column) -> Column:
    """Stopword-marker language prediction as a CASE chain."""
    padded = F.concat(F.lit(" "), text_col, F.lit(" "))
    pred = None
    for lang, markers in _LANG_MARKERS:
        cond = None
        for m in markers:
            c = padded.contains(m)
            cond = c if cond is None else (cond | c)
        pred = F.when(cond, F.lit(lang)) if pred is None else pred.when(cond, F.lit(lang))
    return pred.otherwise(F.lit("unknown"))


@register(
    "t02_lang_id",
    oracle="""
    SELECT doc_id,
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
           lang AS labeled_lang
    FROM documents
    """,
    doc="Stopword-marker language ID (deterministic heuristic CASE chain).",
)
def t02_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", lang_pred(F.col("text")).alias("pred_lang"), F.col("lang").alias("labeled_lang")
    )


@register(
    "t03_quality_score",
    oracle="""
    SELECT doc_id,
           length(regexp_replace(text, '[^a-z]', '', 'g')) * 1.0 / length(text) AS alpha_ratio,
           len(list_filter(string_split_regex(trim(text), '\\s+'),
                           w -> w IN ('the','a','and','of','is')))
                 * 1.0 / len(string_split_regex(trim(text), '\\s+')) AS stopword_ratio,
           CASE WHEN length(text) >= 100 AND length(text) <= 2000 THEN 1 ELSE 0 END AS len_ok
    FROM documents
    """,
    doc="Quality scoring: alpha ratio, stopword ratio, length gate.",
)
def t03_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    stop = F.array([F.lit(w) for w in ["the", "a", "and", "of", "is"]])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop, w)))
    return docs.select(
        "doc_id",
        (F.length(F.regexp_replace("text", "[^a-z]", "")) / F.length("text")).alias("alpha_ratio"),
        (n_stop / F.size(toks)).alias("stopword_ratio"),
        F.when((F.length("text") >= 100) & (F.length("text") <= 2000), F.lit(1))
        .otherwise(F.lit(0))
        .alias("len_ok"),
    )


@register(
    "t04_token_classes",
    oracle="""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-z]+')) AS n_word_tokens,
           len(regexp_extract_all(text, '[0-9]+')) AS n_num_tokens,
           len(regexp_extract_all(text, '[a-z]{5,}')) AS n_long_tokens
    FROM documents
    """,
    doc="BPE-ish regex token classes (word / numeric / long tokens).",
)
def t04_token_classes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit("[a-z]+"), F.lit(0))).alias("n_word_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0))).alias("n_num_tokens"),
        F.size(F.regexp_extract_all("text", F.lit("[a-z]{5,}"), F.lit(0))).alias("n_long_tokens"),
    )


def fingerprint(col: Column) -> Column:
    """Deterministic document fingerprint: md5 of normalized text."""
    normalized = F.lower(F.regexp_replace(F.trim(col), _WS, " "))
    return F.md5(F.encode(normalized, "UTF-8"))


@register(
    "t05_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
    doc="Document fingerprinting (md5 of whitespace-normalized text).",
)
def t05_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))


@register(
    "t06_word_freq",
    oracle="""
    WITH tok AS (
      SELECT unnest(string_split_regex(trim(text), '\\s+')) AS w FROM documents
    )
    SELECT w, count(*) AS freq
    FROM tok
    GROUP BY w
    ORDER BY freq DESC, w
    LIMIT 20
    """,
    doc="Corpus word-frequency top-k: explode tokens -> hash-agg -> "
    "TakeOrderedAndProject; the map-side partial agg makes the "
    "shuffle carry one row per distinct word per partition.",
)
def t06_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), F.col("w"))
        .limit(20)
    )


_WIN_K = 8  # k-gram length (chars)
_WIN_W = 4  # winnowing window (hashes)


def _winnow_batch(texts):
    """Winnowing fingerprints (Schleimer/Wilkerson/Aiken, the MOSS
    algorithm) per text, vectorized: Rabin-Karp rolling hash over
    char k-grams (polynomial base 257 mod 2^64 — numpy uint64 wraps
    natively), then the minimum hash of each w-window, deduplicated.
    Guarantees any substring match of length >= k+w-1 shares a
    fingerprint — the partial-overlap detector exact dedup misses."""
    import numpy as np
    import pandas as pd

    base = np.uint64(257)
    with np.errstate(over="ignore"):
        powers = base ** np.arange(_WIN_K - 1, -1, -1, dtype=np.uint64)

    def one(t):
        if t is None or len(t) < _WIN_K:
            return []
        c = np.frombuffer(t.encode("utf-8"), dtype=np.uint8).astype(np.uint64)
        with np.errstate(over="ignore"):
            # hash of every k-gram in one windowed multiply-sum:
            # h[i] = sum_j c[i+j] * base^(k-1-j)  (wraps mod 2^64)
            grams = np.lib.stride_tricks.sliding_window_view(c, _WIN_K)
            hs = (grams * powers[None, :]).sum(axis=1, dtype=np.uint64)
        if len(hs) < _WIN_W:
            return [int(hs.min().astype("int64"))]
        win = np.lib.stride_tricks.sliding_window_view(hs, _WIN_W)
        return np.unique(win.min(axis=1)).astype("int64").tolist()

    return pd.Series([one(t) for t in texts])


@register(
    "t07_winnow_fingerprint",
    oracle=None,  # rolling-hash constants have no SQL analog — rows-only
    doc="Winnowing (rolling-hash) fingerprints: Rabin-Karp over char "
    "8-grams + per-window minima, deduped — emits (doc_id, fp) pairs "
    "usable as a blocking key for partial-overlap dedup (any shared "
    "substring >= 11 chars guarantees a shared fingerprint). Map-only "
    "Arrow pandas_udf; no shuffle.",
)
def t07_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    docs = load_table(spark, sf_dir, "documents")
    udf = F.pandas_udf(_winnow_batch, T.ArrayType(T.LongType())).asNondeterministic()
    return (
        docs.select("doc_id", udf(F.col("text")).alias("fps"))
        .select("doc_id", F.explode("fps").alias("fp"))
    )


@register(
    "t08_repetition",
    late=True,
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 3
                  THEN list_transform(generate_series(1, len(ws) - 2),
                                      i -> array_to_string(ws[i:i+2], ' '))
                  ELSE [] END AS grams
      FROM w
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT) AS n_grams,
           CASE WHEN len(grams) > 0
                THEN 1.0 - len(list_distinct(grams)) * 1.0 / len(grams)
                ELSE 0.0 END AS rep_ratio
    FROM g
    """,
    doc="Within-document repetition score: 1 - distinct/total over "
    "3-gram shingles — the C4/Gopher-style repetition quality gate "
    "for corpus filtering. One map-only Arrow pandas_udf (t07/t09's "
    "discipline — higher-order-function Column lambdas are "
    "interpreted per element and measured ~10x slower than the "
    "Counter/set sweep for this shape), zero shuffles; the ratio is "
    "a single IEEE division of integer counts, emitted UNROUNDED "
    "because one division is bit-identical across engines (per-row "
    "rounding is what diverges).",
)
def t08_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("n_grams", T.LongType()),
                T.StructField("rep_ratio", T.DoubleType()),
            ]
        )
    )
    def rep(texts):
        ns, rs = [], []
        for t in texts:
            ws = py_tokens(t)
            if len(ws) >= 3:
                gs = [" ".join(ws[i : i + 3]) for i in range(len(ws) - 2)]
                ns.append(len(gs))
                rs.append(1.0 - len(set(gs)) / len(gs))
            else:
                ns.append(0)
                rs.append(0.0)
        return pd.DataFrame({"n_grams": ns, "rep_ratio": rs})

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rep("text").alias("r")).select(
        "doc_id",
        F.col("r.n_grams").alias("n_grams"),
        F.col("r.rep_ratio").alias("rep_ratio"),
    )


@register(
    "t09_gopher_gates",
    late=True,
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), g AS (
      SELECT doc_id, ws,
             CASE WHEN len(ws) >= 2
                  THEN list_transform(generate_series(1, len(ws) - 1),
                                      i -> ws[i] || ' ' || ws[i + 1])
                  ELSE [] END AS gs
      FROM w
    )
    SELECT doc_id,
           list_max(list_transform(list_distinct(ws),
                    t -> len(list_filter(ws, x -> x = t)))) * 1.0
             / len(ws) AS top_word_frac,
           CASE WHEN len(gs) > 0
                THEN list_max(list_transform(list_distinct(gs),
                         t -> len(list_filter(gs, x -> x = t)))) * 1.0
                       / len(gs)
                ELSE 0.0 END AS top_2gram_frac,
           CASE WHEN list_max(list_transform(list_distinct(ws),
                    t -> len(list_filter(ws, x -> x = t)))) * 1.0 / len(ws) <= 0.2
                 AND (len(gs) = 0 OR
                      list_max(list_transform(list_distinct(gs),
                          t -> len(list_filter(gs, x -> x = t)))) * 1.0 / len(gs) <= 0.2)
                THEN 1 ELSE 0 END AS gopher_pass
    FROM g
    """,
    doc="Gopher-style repetition-concentration gates (Rae et al. 2021 "
    "corpus filters): fraction of tokens taken by the single most "
    "frequent word and by the most frequent 2-gram, plus the "
    "composite <=0.2 pass flag used to drop boilerplate/spam docs. "
    "One map-only Arrow pandas_udf (t07's discipline): per-doc "
    "most-common counting is a Counter over ~100 tokens, ZERO "
    "shuffles — measured 30x faster than the equivalent "
    "higher-order-function Column algebra (transform/filter lambdas "
    "are interpreted per element, not codegen'd; 6.6s -> 0.2s at "
    "sf0.1), and infinitely cheaper than the word-explode + groupBy "
    "formulation whose shuffle volume equals the tokenized corpus. "
    "Fractions are single integer divisions — bit-identical across "
    "engines, emitted unrounded.",
)
def t09_gopher_gates(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("top_word_frac", T.DoubleType()),
                T.StructField("top_2gram_frac", T.DoubleType()),
            ]
        )
    )
    def conc(texts):
        from collections import Counter

        tw, tg = [], []
        for t in texts:
            ws = py_tokens(t)
            tw.append(max(Counter(ws).values()) / len(ws))
            if len(ws) >= 2:
                gs = [ws[i] + " " + ws[i + 1] for i in range(len(ws) - 1)]
                tg.append(max(Counter(gs).values()) / len(gs))
            else:
                tg.append(0.0)
        return pd.DataFrame({"top_word_frac": tw, "top_2gram_frac": tg})

    docs = load_table(spark, sf_dir, "documents")
    out = docs.select("doc_id", conc("text").alias("c")).select(
        "doc_id",
        F.col("c.top_word_frac").alias("top_word_frac"),
        F.col("c.top_2gram_frac").alias("top_2gram_frac"),
    )
    return out.select(
        "doc_id",
        "top_word_frac",
        "top_2gram_frac",
        F.when(
            (F.col("top_word_frac") <= 0.2) & (F.col("top_2gram_frac") <= 0.2),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("gopher_pass"),
    )


@register(
    "t10_vocab_coverage",
    late=True,
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    )
    SELECT source,
           count(*) AS n_tokens,
           count(DISTINCT w) AS n_types,
           count(DISTINCT w) * 1.0 / count(*) AS ttr
    FROM tok
    GROUP BY source
    """,
    doc="Per-source vocabulary coverage: token count, type (distinct "
    "token) count and the type-token ratio — the lexical-diversity "
    "signal a corpus curator uses to spot template-generated or "
    "low-entropy sources before mixing. Explode -> one hash agg with "
    "count(DISTINCT): Spark plans the exact-distinct as the two-"
    "phase Expand + partial/final split, so the shuffle carries one "
    "row per (source, distinct word) per map partition, never the "
    "raw token stream. ttr is a single integer division — "
    "bit-identical across engines, unrounded.",
)
def t10_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.countDistinct("w").alias("n_types"),
            (F.countDistinct("w") * F.lit(1.0) / F.count(F.lit(1))).alias("ttr"),
        )
    )


@register(
    "t11_source_entropy",
    late=True,
    oracle="""
    WITH tok AS (
      SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
    ), freq AS (
      SELECT source, w, count(*) AS c FROM tok GROUP BY source, w
    ), tot AS (
      SELECT source, sum(c) AS n FROM freq GROUP BY source
    )
    SELECT source,
           round(-sum((c * 1.0 / n) * ln(c * 1.0 / n)), 4) AS entropy_nats
    FROM freq JOIN tot USING (source)
    GROUP BY source
    """,
    doc="Per-source unigram Shannon entropy (nats) — the information-"
    "density signal that separates template/boilerplate sources "
    "(low entropy) from natural text during corpus curation. Two "
    "aggregations on the SAME source-keyed partitioning (word "
    "frequencies, then the entropy sum) plus a broadcast-sized "
    "per-source total join — the token explode shuffles once, "
    "carrying one row per (source, distinct word) per map partition "
    "after the partial agg. The final sum of p*ln(p) terms rounds "
    "to 4 (float accumulation order differs across engines).",
)
def t11_source_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = freq.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") * F.lit(1.0) / F.col("n")
    return (
        freq.join(F.broadcast(tot), "source")
        .groupBy("source")
        .agg(F.round(-F.sum(p * F.log(p)), 4).alias("entropy_nats"))
    )


@register(
    "t12_langid_eval",
    late=True,
    oracle="""
    WITH pred AS (
      SELECT lang,
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
             END AS pred_lang
      FROM documents
    )
    SELECT lang, pred_lang, count(*) AS n,
           sum(CASE WHEN lang = pred_lang THEN 1 ELSE 0 END) AS n_correct
    FROM pred
    GROUP BY lang, pred_lang
    """,
    doc="Language-ID CONFUSION MATRIX: t02's stopword-marker "
    "predictor evaluated against the table's ground-truth lang "
    "column, one cell per (actual, predicted) pair — the closed "
    "evaluation loop a curator runs before trusting a classifier "
    "gate at corpus scale. Map-only predicate + one tiny "
    "aggregation (cells = langs²); the same pattern evaluates any "
    "per-doc classifier against labels without leaving the engine.",
)
def t12_langid_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select("lang", lang_pred(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("lang") == F.col("pred_lang"), 1).otherwise(0)
            ).alias("n_correct"),
        )
    )


@register(
    "t13_unigram_nll",
    late=True,
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
      WHERE length(trim(text)) > 0
    ), counts AS (
      SELECT w, count(*) AS c FROM toks GROUP BY w
    ), tot AS (
      SELECT sum(c) AS t FROM counts
    )
    SELECT doc_id,
           round(avg(-ln(c / t)), 4) AS mean_nll,
           count(*) AS n_tok
    FROM toks JOIN counts USING (w), tot
    GROUP BY doc_id
    """,
    doc="Perplexity-proxy quality scoring (the CCNet/Gopher LM-filter "
    "step with the corpus itself as the unigram LM): score every doc "
    "by the mean negative log-likelihood of its tokens under the "
    "corpus unigram distribution — high-NLL docs are rare-token "
    "outliers (boilerplate, encoding junk), low-NLL are stopword "
    "soup; both tails get dropped by a training filter. Two-pass "
    "plan: explode tokens, corpus counts (partial->final agg), "
    "token-count equi-join back, per-doc mean. Every stage is linear "
    "and hash-partitioned; at 100 TB the count table shards with the "
    "join — nothing is collected, and a real KenLM swap changes only "
    "the scoring join's right side.",
)
def t13_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("w"))
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(F.sum("c").alias("t"))
    return (
        toks.join(counts, "w")
        .join(F.broadcast(tot))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(-F.log(F.col("c") / F.col("t"))), 4).alias("mean_nll"),
            F.count(F.lit(1)).alias("n_tok"),
        )
    )


@register(
    "t14_repetition_filters",
    late=True,
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws FROM documents
    ), g AS (
      SELECT doc_id,
             CASE WHEN len(ws) >= 2
                  THEN list_transform(generate_series(1, len(ws) - 1),
                       i -> ws[i] || ' ' || ws[i+1])
                  ELSE [] END AS g2,
             CASE WHEN len(ws) >= 3
                  THEN list_transform(generate_series(1, len(ws) - 2),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
                  ELSE [] END AS g3
      FROM w
    )
    SELECT doc_id,
           CASE WHEN len(g2) > 0
                THEN list_sum(list_transform(list_distinct(g2),
                       t -> CASE WHEN len(list_filter(g2, x -> x = t)) > 1
                                 THEN len(list_filter(g2, x -> x = t))
                                 ELSE 0 END)) * 1.0 / len(g2)
                ELSE 0.0 END AS dup2_frac,
           CASE WHEN len(g3) > 0
                THEN list_sum(list_transform(list_distinct(g3),
                       t -> CASE WHEN len(list_filter(g3, x -> x = t)) > 1
                                 THEN len(list_filter(g3, x -> x = t))
                                 ELSE 0 END)) * 1.0 / len(g3)
                ELSE 0.0 END AS dup3_frac
    FROM g
    """,
    doc="Gopher duplicate-n-gram repetition filters (Rae et al. 2021, "
    "the OTHER repetition class t09's concentration gates don't "
    "cover): the fraction of 2-gram and 3-gram OCCURRENCES that "
    "belong to an n-gram appearing more than once in the document — "
    "the signal that catches looped/templated text whose most-"
    "frequent gram is still below t09's top-gram threshold. Token-"
    "occurrence variant of the paper's character fraction "
    "(documented adaptation — paper uses 5..10-gram char fractions; "
    "this short-vocabulary corpus carries its repetition signal at "
    "n=2/3, 349 and 27 of 500 docs non-zero at sf0.01). One map-only Arrow pandas_udf over a Counter "
    "(t07/t09's discipline — zero shuffles vs a corpus-sized "
    "n-gram explode); fractions are single integer divisions, "
    "bit-identical across engines, emitted unrounded.",
)
def t14_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("dup2_frac", T.DoubleType()),
                T.StructField("dup3_frac", T.DoubleType()),
            ]
        )
    )
    def rep(texts):
        from collections import Counter

        d2, d3 = [], []
        for t in texts:
            ws = py_tokens(t)

            def dup_frac(n: int) -> float:
                if len(ws) < n:
                    return 0.0
                grams = Counter(
                    " ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)
                )
                total = sum(grams.values())
                return sum(c for c in grams.values() if c > 1) / total

            d2.append(dup_frac(2))
            d3.append(dup_frac(3))
        return pd.DataFrame({"dup2_frac": d2, "dup3_frac": d3})

    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", rep("text").alias("r")).select(
        "doc_id",
        F.col("r.dup2_frac").alias("dup2_frac"),
        F.col("r.dup3_frac").alias("dup3_frac"),
    )


# --------------------------------------------------------------------------
# t15 — bigram-LM perplexity proxy (t13's unigram NLL upgraded to a
# conditional bigram model, the CCNet-style LM quality gate)
# --------------------------------------------------------------------------


@register(
    "t15_bigram_nll",
    late=True,
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
      WHERE length(trim(text)) > 0
    ), b AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i+1])) AS bg
      FROM w
      WHERE len(ws) >= 2
    ), c2 AS (
      SELECT bg, count(*) AS c FROM b GROUP BY bg
    ), c1 AS (
      SELECT split_part(bg, ' ', 1) AS w1, sum(c) AS ctx
      FROM c2 GROUP BY w1
    )
    SELECT b.doc_id,
           round(avg(-ln(c2.c / c1.ctx)), 4) AS mean_nll,
           count(*) AS n_bigram
    FROM b
    JOIN c2 USING (bg)
    JOIN c1 ON split_part(b.bg, ' ', 1) = c1.w1
    GROUP BY b.doc_id
    """,
    doc="Bigram-LM perplexity proxy (the CCNet/Wenzek et al. LM "
    "quality gate with the corpus itself as the model — t13's "
    "unigram NLL upgraded to a CONDITIONAL model): score every doc "
    "by the mean negative log-likelihood of its token transitions, "
    "P(w2|w1) = C(w1 w2) / C(w1 ·) with context counts summed from "
    "the bigram table so the model normalizes exactly. High-NLL docs "
    "have improbable transitions (shuffled/garbled text that unigram "
    "frequency can NOT catch — every token may be common while every "
    "transition is rare); that separation is the whole reason "
    "production filters use an LM over a frequency table. Plan: "
    "bigrams via zip_with over two array slices (no per-element "
    "explode arithmetic), corpus bigram counts (partial->final agg), "
    "context counts as a second tiny agg OVER THE COUNT TABLE (vocab-"
    "sized, not corpus-sized), two equi-joins back, per-doc mean. "
    "Linear and hash-partitioned at every stage; swapping in a real "
    "KenLM changes only the scoring join's right side (cf. t13).",
)
def t15_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    ws = tokens(F.col("text"))
    bi = (
        docs.select("doc_id", ws.alias("ws"))
        .filter(F.size("ws") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.zip_with(
                    F.slice(F.col("ws"), 1, F.size("ws") - 1),
                    F.slice(F.col("ws"), 2, F.size("ws") - 1),
                    lambda a, b: F.concat_ws(" ", a, b),
                )
            ).alias("bg"),
        )
    )
    c2 = bi.groupBy("bg").agg(F.count(F.lit(1)).alias("c"))
    c1 = c2.groupBy(F.split(F.col("bg"), " ")[0].alias("w1")).agg(
        F.sum("c").alias("ctx")
    )
    return (
        bi.join(c2, "bg")
        .join(c1, F.split(bi["bg"], " ")[0] == c1["w1"])
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(-F.log(F.col("c") / F.col("ctx"))), 4).alias("mean_nll"),
            F.count(F.lit(1)).alias("n_bigram"),
        )
    )


# --------------------------------------------------------------------------
# t16 — PII scrubbing: map-only regex redaction with per-class counts
# (the C4/RefinedWeb pre-training redaction pass)
# --------------------------------------------------------------------------

# One shared pattern table: the Spark side and the DuckDB oracle both
# interpolate THESE strings, so the two engines run byte-identical
# regexes. Patterns are RE2-safe (no backreferences/lookaround) so
# Java regex (Spark) and RE2 (DuckDB) agree; all are deterministic
# under either leftmost-first or leftmost-longest matching (greedy
# character classes, no alternation).
_PII_PATTERNS: list[tuple[str, str, str]] = [
    # (class, regex, replacement) — applied IN ORDER
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
]


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact emails / SSNs / phone numbers / IPv4 addresses from
    ``text_col`` and report per-class match counts. Map-only Column
    algebra (regexp_extract_all + regexp_replace, whole-stage
    codegen): zero shuffles, linear in corpus bytes, trivially
    partition-parallel at 100 TB. Patterns apply in a fixed order so
    overlapping classes (none among these four — verified disjoint)
    would still resolve deterministically."""
    out = df
    scrubbed = F.col(text_col)
    for cls, pat, repl in _PII_PATTERNS:
        out = out.withColumn(
            f"n_{cls}", F.size(F.regexp_extract_all(text_col, F.lit(pat), F.lit(0)))
        )
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("scrubbed", scrubbed)


def _pii_augmented_sql() -> str:
    """DuckDB side of the deterministic PII injection (see
    t16_pii_scrub doc)."""
    return """
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
             || CASE WHEN doc_id % 2 = 0 THEN ' call 555-'
                  || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                  || CAST(1000 + doc_id % 9000 AS VARCHAR) ELSE '' END
             || CASE WHEN doc_id % 3 = 0 THEN ' from 10.'
                  || CAST(doc_id % 256 AS VARCHAR) || '.'
                  || CAST((doc_id * 7) % 256 AS VARCHAR) || '.'
                  || CAST(1 + doc_id % 200 AS VARCHAR) ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN ' id '
                  || CAST(100 + doc_id % 900 AS VARCHAR) || '-'
                  || CAST(10 + doc_id % 90 AS VARCHAR) || '-'
                  || CAST(1000 + (doc_id * 3) % 9000 AS VARCHAR) ELSE '' END
             AS text
      FROM documents
    """


def _pii_augment(docs: DataFrame) -> DataFrame:
    """Spark twin of :func:`_pii_augmented_sql` — deterministic
    synthetic PII derived from doc_id (the testdata corpus carries
    none, so an un-augmented entry would never exercise redaction)."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), s(d), F.lit("@example.com"),
            F.when(
                d % 2 == 0,
                F.concat(F.lit(" call 555-"), s(d % 900 + 100), F.lit("-"), s(d % 9000 + 1000)),
            ).otherwise(F.lit("")),
            F.when(
                d % 3 == 0,
                F.concat(
                    F.lit(" from 10."), s(d % 256), F.lit("."),
                    s((d * 7) % 256), F.lit("."), s(d % 200 + 1),
                ),
            ).otherwise(F.lit("")),
            F.when(
                d % 5 == 0,
                F.concat(
                    F.lit(" id "), s(d % 900 + 100), F.lit("-"),
                    s(d % 90 + 10), F.lit("-"), s((d * 3) % 9000 + 1000),
                ),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )


def _oracle_t16() -> str:
    reps = "text"
    for _cls, pat, repl in _PII_PATTERNS:
        reps = f"regexp_replace({reps}, '{pat}', '{repl}', 'g')"
    counts = ",\n           ".join(
        f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_{cls}"
        for cls, pat, _repl in _PII_PATTERNS
    )
    return f"""
    WITH aug AS ({_pii_augmented_sql()})
    SELECT doc_id,
           {counts},
           md5({reps}) AS scrubbed_md5
    FROM aug
    """


@register(
    "t16_pii_scrub",
    late=True,
    oracle=_oracle_t16(),
    doc="PII scrubbing (VERDICT r8 item 3) — the standard C4/"
    "RefinedWeb-class redaction pass a production training pipeline "
    "runs before tokenization: emails, SSNs, phone numbers and IPv4 "
    "addresses are replaced with typed placeholder tokens, with a "
    "per-class match count per document and an md5 digest of the "
    "scrubbed text (the hash check verifies the REWRITE, not just "
    "the counts). The testdata corpus carries no PII, so the entry "
    "first injects deterministic synthetic PII derived from doc_id — "
    "identically on both engines (_pii_augment / _pii_augmented_sql) "
    "— ensuring the redaction path is actually exercised, not "
    "vacuously green. The scrub itself (pii_scrub) is the reusable "
    "operator: pure regexp_extract_all/regexp_replace Column "
    "algebra, one shared pattern table so Spark (Java regex) and "
    "DuckDB (RE2) run byte-identical patterns. Map-only: zero "
    "shuffles, no UDFs, linear in corpus bytes — the 100 TB plan is "
    "a single whole-stage-codegen scan.",
)
def t16_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = pii_scrub(_pii_augment(docs))
    return out.select(
        "doc_id",
        *[F.col(f"n_{cls}").cast("long").alias(f"n_{cls}") for cls, _p, _r in _PII_PATTERNS],
        F.md5("scrubbed").alias("scrubbed_md5"),
    )


# --------------------------------------------------------------------------
# t17 — blocklist content gate (the C4 "bad words" filter)
# --------------------------------------------------------------------------

# Deterministic demo blocklist drawn from the synthetic corpus vocab —
# in production this is the policy list (C4 used a published word
# list); the operator is list-agnostic.
_T17_BLOCKLIST = ("slow", "batch", "merge")


@register(
    "t17_blocklist_gate",
    late=True,
    oracle=f"""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    )
    SELECT doc_id,
           CAST(len(list_filter(ws, x -> list_contains({list(_T17_BLOCKLIST)!r}, x)))
                AS BIGINT) AS n_hits,
           coalesce(array_to_string(list_sort(list_distinct(
               list_filter(ws, x -> list_contains({list(_T17_BLOCKLIST)!r}, x)))), ','), '')
             AS hit_words,
           CAST(len(list_filter(ws, x -> list_contains({list(_T17_BLOCKLIST)!r}, x))) > 0
                AS BOOLEAN) AS blocked
    FROM w
    """,
    doc="Blocklist content gate — the C4 pipeline's 'bad words' "
    "filter (Raffel et al. 2020 dropped any page containing a word "
    "from a published policy list): per document, the total count of "
    "blocklisted tokens, the sorted distinct hits (the audit trail a "
    "reviewer needs), and the drop flag. The list here is a "
    "deterministic stand-in from the synthetic vocab; the operator "
    "is list-agnostic — swap the tuple, or broadcast-join a list "
    "table when the policy list is large. Pure Column algebra "
    "(filter/array_distinct/array_sort over the token array): "
    "map-only, no shuffle, scan-fused — the 100 TB plan is one "
    "whole-stage-codegen pass, and compositionally it runs BEFORE "
    "dedup in the standard cleanse order (cheapest gates first).",
)
def t17_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bl = F.array(*[F.lit(w) for w in _T17_BLOCKLIST])
    hits = F.filter(tokens(F.col("text")), lambda x: F.array_contains(bl, x))
    return docs.select(
        "doc_id",
        F.size(hits).cast("long").alias("n_hits"),
        F.array_join(F.array_sort(F.array_distinct(hits)), ",").alias("hit_words"),
        (F.size(hits) > 0).alias("blocked"),
    )


# --------------------------------------------------------------------------
# t18 — per-source quality DRIFT monitor: t13's corpus-LM score
# aggregated into the dashboard row a data-quality on-call watches
# --------------------------------------------------------------------------


@register(
    "t18_source_drift",
    late=True,
    oracle="""
    WITH toks AS (
      SELECT doc_id, source,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents
      WHERE length(trim(text)) > 0
    ), counts AS (
      SELECT w, count(*) AS c FROM toks GROUP BY w
    ), tot AS (
      SELECT sum(c) AS t FROM counts
    ), doc_nll AS (
      SELECT doc_id, source, avg(-ln(c / t)) AS nll
      FROM toks JOIN counts USING (w), tot
      GROUP BY doc_id, source
    ), corpus AS (
      SELECT avg(nll) AS mu, stddev_samp(nll) AS sd FROM doc_nll
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           round(avg(nll), 4) AS mean_nll,
           round(corpus.mu, 4) AS corpus_mean_nll,
           round((avg(nll) - corpus.mu) / corpus.sd, 4) AS drift_z,
           abs((avg(nll) - corpus.mu) / corpus.sd) > 1.0 AS flagged
    FROM doc_nll CROSS JOIN corpus
    GROUP BY source, corpus.mu, corpus.sd
    """,
    doc="Per-source quality DRIFT monitor — the dashboard row a "
    "data-quality on-call watches over a multi-source crawl: t13's "
    "corpus-unigram NLL is computed per document, then aggregated "
    "per SOURCE and standardized against the corpus distribution "
    "(z = (source mean - corpus mean) / corpus stddev); a source "
    "whose |z| exceeds 1 is flagged for review (a feed that started "
    "shipping boilerplate or encoding junk moves its whole NLL "
    "mass). Plan: t13's linear explode->count->join-back pipeline, "
    "one per-doc agg, a 1-row corpus-moments broadcast, and a "
    "|sources|-row final agg — the monitoring layer adds only "
    "bounded aggregates on top of the scoring pass, so at 100 TB it "
    "costs what t13 costs. Composition evidence: the drift view and "
    "the per-doc filter share one scoring definition.",
)
def t18_source_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    toks = docs.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("w"))
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    tot = counts.agg(F.sum("c").alias("t"))
    doc_nll = (
        toks.join(counts, "w")
        .join(F.broadcast(tot))
        .groupBy("doc_id", "source")
        .agg(F.avg(-F.log(F.col("c") / F.col("t"))).alias("nll"))
    )
    corpus = doc_nll.agg(
        F.avg("nll").alias("mu"), F.stddev_samp("nll").alias("sd")
    )
    z = (F.avg("nll") - F.first("mu")) / F.first("sd")
    return (
        doc_nll.join(F.broadcast(corpus))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.round(F.avg("nll"), 4).alias("mean_nll"),
            F.round(F.first("mu"), 4).alias("corpus_mean_nll"),
            F.round(z, 4).alias("drift_z"),
            (F.abs(z) > 1.0).alias("flagged"),
        )
    )


# --------------------------------------------------------------------------
# t19 — TRAINED Naive-Bayes language classifier: the supervised
# counterpart of t02's n-gram heuristic (fastText/CCNet-style lang-id
# is a trained linear model; NB over unigrams is its countable,
# oracle-expressible core)
# --------------------------------------------------------------------------


@register(
    "t19_nb_langid",
    late=True,
    oracle="""
    WITH b AS (
      SELECT doc_id, lang,
             unnest(string_split_regex(trim(text), '\\s+')) AS w
      FROM documents WHERE length(trim(text)) > 0
    ), langs AS (SELECT DISTINCT lang FROM b),
    cnt AS (SELECT lang, w, count(*) AS c FROM b GROUP BY 1, 2),
    tot AS (SELECT lang, count(*) AS t FROM b GROUP BY 1),
    v AS (SELECT count(DISTINCT w) AS v FROM b),
    pri AS (SELECT lang, count(DISTINCT doc_id) AS nd FROM b GROUP BY 1),
    nn AS (SELECT count(DISTINCT doc_id) AS n FROM b),
    sc AS (
      SELECT t.doc_id, l.lang,
             round(ln(pri.nd * 1.0 / nn.n)
                   + sum(ln((coalesce(cnt.c, 0) + 1.0) / (tot.t + v.v))), 4)
               AS score
      FROM (SELECT doc_id, w FROM b) t
      CROSS JOIN langs l
      LEFT JOIN cnt ON cnt.lang = l.lang AND cnt.w = t.w
      JOIN tot ON tot.lang = l.lang
      JOIN pri ON pri.lang = l.lang, v, nn
      GROUP BY t.doc_id, l.lang, pri.nd, nn.n, v.v
    ), r AS (
      SELECT doc_id, lang, score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY score DESC, lang) AS rn
      FROM sc
    )
    SELECT d.doc_id, d.lang AS true_lang, r.lang AS pred_lang,
           r.score AS nb_score, r.lang = d.lang AS correct
    FROM r JOIN documents d USING (doc_id)
    WHERE rn = 1
    """,
    doc="TRAINED language classifier — multinomial Naive Bayes over "
    "unigram counts with Laplace smoothing, the countable core of "
    "the fastText-style linear classifiers production lang-id "
    "actually runs (CCNet, RedPajama); t02 is the zero-shot "
    "heuristic, this is the supervised shape: per-class word counts "
    "+ class priors from labeled data, per-doc per-class "
    "log-likelihood sums, argmax with a deterministic tie-break on "
    "the 4dp-ROUNDED score (rounding before argmax keeps the winner "
    "identical across engines; raw-double ordering could flip on "
    "summation-order noise). Trains and scores on the same corpus "
    "here (the oracle-checkable formulation); production trains on "
    "a labeled seed and scores unlabeled ingest — the swap is the "
    "training filter. Plan: one explode scan, two bounded count aggs "
    "(map-side combine), a |langs|-row broadcast cross join, one "
    "equi-join back on (lang, word), per-(doc, lang) partial agg, "
    "one doc-partitioned argmax window. The (lang x vocab) count "
    "table is the only corpus-dependent model state; production "
    "bounds it with p17's hashed-feature trick (one-line swap, "
    "engine-hash caveat documented there).",
)
def t19_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").filter(
        F.length(F.trim("text")) > 0
    )
    b = docs.select("doc_id", "lang", F.explode(tokens(F.col("text"))).alias("w"))
    langs = b.select("lang").distinct()
    cnt = b.groupBy("lang", "w").agg(F.count(F.lit(1)).alias("c"))
    tot = b.groupBy("lang").agg(F.count(F.lit(1)).alias("t"))
    v = b.agg(F.count_distinct("w").alias("v"))
    pri = b.groupBy("lang").agg(F.count_distinct("doc_id").alias("nd"))
    nn = b.agg(F.count_distinct("doc_id").alias("n"))
    tok = b.select("doc_id", "w")
    term = F.log((F.coalesce(F.col("c"), F.lit(0)) + 1.0) / (F.col("t") + F.col("v")))
    sc = (
        tok.crossJoin(F.broadcast(langs))
        .join(cnt, ["lang", "w"], "left")
        .join(F.broadcast(tot), "lang")
        .join(F.broadcast(v))
        .groupBy("doc_id", "lang")
        .agg(F.sum(term).alias("ll"))
        .join(F.broadcast(pri), "lang")
        .join(F.broadcast(nn))
        .select(
            "doc_id",
            "lang",
            F.round(F.log(F.col("nd") / F.col("n")) + F.col("ll"), 4).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), F.asc("lang"))
    r = sc.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    return (
        docs.select("doc_id", F.col("lang").alias("true_lang"))
        .join(r, "doc_id")
        .select(
            "doc_id",
            "true_lang",
            F.col("lang").alias("pred_lang"),
            F.col("score").alias("nb_score"),
            (F.col("lang") == F.col("true_lang")).alias("correct"),
        )
    )


# --------------------------------------------------------------------------
# t20 — compression-ratio gate (Gopher-family repetition proxy): zlib
# deflate ratio per document, flags at both tails
# --------------------------------------------------------------------------

_T20_REP_EVERY = 13  # deterministic repetition injection period


def _t20_inject(docs: DataFrame) -> DataFrame:
    """Deterministic repetition injection (the t16 discipline): every
    13th doc's text becomes its first 40 chars repeated 20x — the
    synthetic corpus has no heavily repetitive docs, so the low-ratio
    flag would be vacuous without it. The twin test reproduces the
    same rewrite byte-for-byte."""
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % _T20_REP_EVERY == 0,
            F.repeat(F.substring("text", 1, 40), 20),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )


def compression_gate(docs: DataFrame) -> DataFrame:
    """The gate as a reusable transform over (doc_id, text) — shared
    by t20 (batch) and st13 (the same map at stream ingest): inject,
    deflate, ratio, flags. Stateless, so it applies to a streaming
    DataFrame unchanged."""

    def _n_comp(texts):
        import zlib

        return texts.map(lambda t: len(zlib.compress((t or "").encode("utf-8"), 6)))

    n_comp = F.pandas_udf(_n_comp, "long")
    out = _t20_inject(docs).select(
        "doc_id",
        F.octet_length("text").cast("long").alias("n_raw"),
        n_comp(F.col("text")).alias("n_comp"),
    ).withColumn(
        # exact int64/int64 double division — bit-identical in the
        # Python twin, so no rounding (HALF_UP-vs-banker's would
        # diverge on .xxxx5 boundaries; the raw quotient cannot)
        "ratio",
        F.col("n_comp") / F.greatest(F.col("n_raw"), F.lit(1)),
    )
    return out.select(
        "doc_id",
        "n_raw",
        "n_comp",
        "ratio",
        (F.col("ratio") < 0.2).alias("flag_repetitive"),
        (F.col("ratio") > 0.95).alias("flag_incompressible"),
    )


@register(
    "t20_compression_gate",
    late=True,
    oracle=None,  # zlib deflate is not SQL-expressible; dual-path
    # Python-twin parity in tests/test_dedup_quality.py.
    doc="COMPRESSION-RATIO gate — the cheap whole-document repetition "
    "proxy the Gopher/MassiveText family runs alongside t08/t14's "
    "explicit n-gram filters: deflate(text) via zlib level 6, ratio "
    "= compressed/raw bytes. Heavily repetitive docs (boilerplate, "
    "scraper loops) compress far below natural text (injected docs "
    "land ~0.06 vs the 0.40-1.02 natural band) -> flag_repetitive "
    "at < 0.2; near-incompressible docs (ratio > 0.95 — minified/"
    "encoded payloads; tiny docs where the deflate header dominates) "
    "-> flag_incompressible, both tails non-vacuous at every sf. One "
    "Arrow pandas_udf scan (bytes in, one long out), ratio/flags in "
    "Column algebra — map-only, no shuffle, O(bytes) at 100 TB. "
    "Rows-only by necessity; the twin recomputes injection + zlib + "
    "flags exactly.",
)
def t20_compression_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    return compression_gate(load_table(spark, sf_dir, "documents"))


# --------------------------------------------------------------------------
# t21 — Unicode normalization pass (NFC + control strip + whitespace
# collapse): the canonicalization step that runs BEFORE any
# fingerprint/dedup/tokenize stage so byte-different but canonically-
# equal texts hash identically
# --------------------------------------------------------------------------


def _t21_augmented_sql() -> str:
    """Deterministic non-ASCII augmentation (DuckDB side) — the
    synthetic corpus is pure ASCII, so an un-augmented entry would
    never exercise composition, control stripping, or collapse (the
    t16 anti-vacuousness discipline). chr(769) is the combining acute
    (NFC composes 'e'+U+0301 into U+00E9), chr(65316) a fullwidth 'D'
    (non-ASCII that NFC must PRESERVE — NFC is not NFKC), chr(7) a
    control byte in front of a space run."""
    return """
      SELECT doc_id,
             text
             || CASE WHEN doc_id % 2 = 0 THEN ' cafe' || chr(769) ELSE '' END
             || CASE WHEN doc_id % 3 = 0 THEN ' ' || chr(65316) || 'ata' ELSE '' END
             || CASE WHEN doc_id % 5 = 0 THEN chr(7) || '  spaced' ELSE '' END
             AS text
      FROM documents
    """


def _t21_augment(docs: DataFrame) -> DataFrame:
    """Spark twin of :func:`_t21_augmented_sql` — note the DECOMPOSED
    accent (e + combining acute) and the control byte are written as
    escape sequences; NFC must compose the former, the strip must
    remove the latter."""
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(d % 2 == 0, F.lit(" cafe\u0301")).otherwise(F.lit("")),
            F.when(d % 3 == 0, F.lit(" \uFF24ata")).otherwise(F.lit("")),
            F.when(d % 5 == 0, F.lit("\u0007  spaced")).otherwise(F.lit("")),
        ).alias("text"),
    )


# shared pattern strings — Spark (Java regex) and DuckDB (RE2) run the
# identical bytes; \x0B-\x1F deliberately EXCLUDES tab (\x09) and
# newline (\x0A): document structure survives, invisible controls die
_T21_CTRL = r"[\x00-\x08\x0B-\x1F\x7F]"
_T21_MULTISPACE = " {2,}"


def nfc_normalize_col(col: Column) -> Column:
    """Arrow-batched NFC normalization (Spark has no builtin Unicode
    normalizer; pandas' .str.normalize wraps unicodedata, and both
    Python and DuckDB implement UAX#15 — parity pinned by the t21
    oracle hash over augmented combining sequences)."""

    @F.pandas_udf("string")
    def _nfc(s):
        return s.str.normalize("NFC")

    return _nfc(col)


@register(
    "t21_unicode_normalize",
    late=True,
    oracle=f"""
    WITH aug AS ({_t21_augmented_sql()}),
    norm AS (
      SELECT doc_id, text,
             regexp_replace(regexp_replace(nfc_normalize(text),
               '{_T21_CTRL}', '', 'g'), '{_T21_MULTISPACE}', ' ', 'g') AS clean
      FROM aug
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_before,
           CAST(length(clean) AS BIGINT) AS n_after,
           clean <> text AS changed,
           md5(clean) AS norm_md5
    FROM norm
    """,
    doc="Unicode canonicalization — the normalization pass a training "
    "pipeline runs BEFORE fingerprinting/dedup/tokenization so "
    "byte-different but canonically-equal texts (composed vs "
    "decomposed accents) hash identically and invisible control "
    "bytes can't smuggle divergence into downstream stages: NFC "
    "normalization (UAX#15 — composition only, NOT the lossy NFKC "
    "fold: fullwidth forms survive, checked by the augmented "
    "fullwidth char), then control-char strip (tab/newline kept — "
    "document structure survives) and space-run collapse, with a "
    "per-doc audit (char counts before/after, changed flag) and an "
    "md5 of the cleaned text so the oracle verifies the REWRITE, "
    "not just the counts. The ASCII-only corpus is deterministically "
    "augmented with combining sequences / fullwidth chars / control "
    "bytes keyed by doc_id, identically on both engines (the t16 "
    "anti-vacuousness discipline). NFC itself is the one Arrow "
    "pandas_udf stage (Spark has no builtin normalizer; pandas wraps "
    "unicodedata, and Python + DuckDB both implement UAX#15); the "
    "augment/strip/collapse/audit stay JVM Column algebra. Map-only: "
    "zero shuffles, linear in corpus bytes — the 100 TB plan is one "
    "scan with a single Arrow exchange.",
)
def t21_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    aug = _t21_augment(load_table(spark, sf_dir, "documents"))
    clean = F.regexp_replace(
        F.regexp_replace(
            nfc_normalize_col(F.col("text")), F.lit(_T21_CTRL), F.lit("")
        ),
        F.lit(_T21_MULTISPACE),
        F.lit(" "),
    )
    return aug.select(
        "doc_id",
        F.length("text").cast("long").alias("n_before"),
        F.length(clean).cast("long").alias("n_after"),
        (clean != F.col("text")).alias("changed"),
        F.md5(clean).alias("norm_md5"),
    )


# --------------------------------------------------------------------------
# t22 — corpus LINE-LEVEL dedup (the C4/RefinedWeb boilerplate-line
# removal): drop every line whose exact text appears in >= 3 distinct
# documents, rewrite each doc from its surviving lines
# --------------------------------------------------------------------------

_T22_LINE_TOKENS = 10  # tokens per line in the synthetic line structure
_T22_DF_MIN = 3  # document-frequency threshold: a line in >= 3 docs dies

# exactly 10 tokens each, so a prepended boilerplate fills line 0 (or
# lines 0-1 when both apply) and duplicates EXACTLY across documents
_T22_BOILER_A = "subscribe to our newsletter for all the latest updates"
_T22_BOILER_B = "copyright notice all rights reserved by the site owner"


def _t22_augmented_sql() -> str:
    """Boilerplate augmentation (DuckDB side) — the synthetic corpus
    has no repeated lines (10-token lines over the vocab virtually
    never collide), so the dedup would be vacuous without injected
    boilerplate (the t16/t21 discipline). Boilerplates PREPEND as
    exact 10-token units so they align to line boundaries and
    duplicate verbatim across the docs that carry them; B-then-A
    order is fixed so both engines build the identical string."""
    return f"""
      SELECT doc_id,
             CASE WHEN doc_id % 6 = 0 THEN '{_T22_BOILER_B} ' ELSE '' END
             || CASE WHEN doc_id % 4 = 0 THEN '{_T22_BOILER_A} ' ELSE '' END
             || text AS text
      FROM documents
    """


def _t22_augment(docs: DataFrame) -> DataFrame:
    d = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat(
            F.when(d % 6 == 0, F.lit(_T22_BOILER_B + " ")).otherwise(F.lit("")),
            F.when(d % 4 == 0, F.lit(_T22_BOILER_A + " ")).otherwise(F.lit("")),
            F.col("text"),
        ).alias("text"),
    )


@register(
    "t22_line_dedup",
    late=True,
    oracle=f"""
    WITH aug AS ({_t22_augmented_sql()}),
    toks AS (
      SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS tk FROM aug
    ),
    lines AS (
      SELECT doc_id, i AS line_no,
             array_to_string(tk[(i * {_T22_LINE_TOKENS} + 1):
                               ((i + 1) * {_T22_LINE_TOKENS})], ' ') AS line
      FROM toks,
           LATERAL (SELECT unnest(range(CAST(ceil(len(tk) * 1.0
                      / {_T22_LINE_TOKENS}) AS BIGINT))) AS i) t
    ),
    common AS (
      SELECT line FROM lines GROUP BY line
      HAVING count(DISTINCT doc_id) >= {_T22_DF_MIN}
    ),
    kept AS (
      SELECT l.doc_id, l.line_no, l.line
      FROM lines l ANTI JOIN common c USING (line)
    ),
    agg AS (
      SELECT doc_id,
             count(*) AS n_after,
             md5(string_agg(line, chr(10) ORDER BY line_no)) AS clean_md5
      FROM kept GROUP BY doc_id
    ),
    before AS (
      SELECT doc_id, count(*) AS n_before FROM lines GROUP BY doc_id
    )
    SELECT b.doc_id,
           b.n_before,
           COALESCE(a.n_after, 0) AS n_after,
           COALESCE(a.n_after, 0) < b.n_before AS changed,
           COALESCE(a.clean_md5, md5('')) AS clean_md5
    FROM before b LEFT JOIN agg a USING (doc_id)
    """,
    doc="Corpus LINE-LEVEL dedup — the C4/RefinedWeb boilerplate "
    "remover (Raffel et al. 2020 drop repeated 3-sentence spans; "
    "Penedo et al. 2023 drop duplicated lines): every line whose "
    "exact text appears in >= 3 DISTINCT documents is dropped from "
    "ALL of them, and each document is rewritten from its surviving "
    "lines — the cross-document complement to t08/t14's within-doc "
    "repetition gates and a different granularity from d10's "
    "suffix-array substrings (lines are cheap and structural; "
    "substrings are exact but quadratic-adjacent). Lines are "
    "10-token units (the corpus ships as single-line docs, so line "
    "structure is synthesized by token count — identically on both "
    "engines); boilerplate lines are prepended to every 4th/6th doc "
    "as exact 10-token units so the duplicate set is non-vacuous "
    "(the t16/t21 augmentation discipline). Audit output per doc: "
    "line counts before/after, changed flag, md5 of the rewritten "
    "text — the oracle verifies the REWRITE. Plan: one explode into "
    "lines, one groupBy(line) for document frequency (map-side "
    "combine; the only corpus-wide shuffle), the tiny df>=3 "
    "survivor set broadcast anti-joined back (boilerplate lines are "
    "a vanishing fraction of distinct lines), one groupBy(doc_id) "
    "regroup — linear at 100 TB, and the regroup shuffle carries "
    "only kept lines.",
)
def t22_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _T22_LINE_TOKENS
    aug = _t22_augment(load_table(spark, sf_dir, "documents"))
    toks = aug.select("doc_id", F.split(F.trim(F.col("text")), " +").alias("tk"))
    lines = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(ceil(size(tk) / {n}.0)) - 1),"
                f" i -> array_join(slice(tk, i * {n} + 1, {n}), ' '))"
            )
        ).alias("line_no", "line"),
    )
    common = (
        lines.groupBy("line")
        .agg(F.count_distinct("doc_id").alias("df"))
        .filter(F.col("df") >= _T22_DF_MIN)
        .select("line")
    )
    kept = lines.join(F.broadcast(common), "line", "left_anti")
    agg = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_after"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("line_no", "line"))),
                    lambda s: s["line"],
                ),
                "\n",
            )
        ).alias("clean_md5"),
    )
    # n_before is DERIVED, not aggregated: the line count per doc is
    # exactly the explode arity ceil(|tk|/n) (split of a trimmed
    # string is never empty, so the sequence never descends), so the
    # third full pass over the exploded line relation — explode +
    # groupBy(doc_id) shuffle — is a corpus-linear projection instead
    # (r14 window-df-family sweep; local A/B flat at 1.07 s, the win
    # is one fewer explode+shuffle pass at scale; results identical).
    # NULL-text guard (ADVICE r14): split(trim(NULL)) is NULL, so the
    # old explode+groupBy form OMITTED such docs — the derived
    # projection must too, or it would emit a null-n_before row the
    # aggregated form never produced.
    before = toks.filter(F.col("tk").isNotNull()).select(
        "doc_id",
        F.ceil(F.size("tk") / F.lit(float(n))).cast("long").alias("n_before"),
    )
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"  # md5('')
    return before.join(agg, "doc_id", "left").select(
        "doc_id",
        "n_before",
        F.coalesce("n_after", F.lit(0)).alias("n_after"),
        (F.coalesce("n_after", F.lit(0)) < F.col("n_before")).alias("changed"),
        F.coalesce("clean_md5", F.lit(empty_md5)).alias("clean_md5"),
    )

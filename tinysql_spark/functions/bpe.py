"""Deterministic byte-pair-encoding tokenizer (VERDICT r8 item 4).

Production training pipelines budget in SUBWORD tokens, not
whitespace tokens; p05/p13/p14 count whitespace words because those
entries are DuckDB-oracle-backed. This module adds the
tokenizer-faithful path: classic BPE (Sennrich et al. 2016, 'Neural
Machine Translation of Rare Words with Subword Units') trained
deterministically on a BOUNDED corpus sample, then applied
corpus-wide as an Arrow-batched pandas_udf.

Scale shape (the part that matters at 100 TB): tokenizer TRAINING is
a fixed-size offline step — real pipelines train on a capped sample,
never the full corpus — so the driver-side collect here is bounded by
``sample_cap`` regardless of corpus size. ENCODING is the distributed
map: one pandas_udf scan, no shuffle, with a per-batch word->tokens
memo so repeated words (Zipf's law makes them most words) pay the
merge loop once per batch.

Everything is pure Python + pandas — no external tokenizer library —
and fully deterministic: merge ties break on (count desc, pair asc),
so two training runs over the same sample produce byte-identical
merge tables. The reference (Go SQL engine) has no tokenizer surface;
this extends the LLM-pipeline family.
"""

from __future__ import annotations

import os
from collections import Counter

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_EOW = "</w>"  # end-of-word marker: keeps merges word-internal


def _word_syms(word: str) -> tuple[str, ...]:
    return tuple(list(word) + [_EOW])


def train_bpe(texts: list[str], n_merges: int = 200) -> list[tuple[str, str]]:
    """Classic BPE training: start from characters (+ end-of-word
    marker), repeatedly merge the most frequent adjacent symbol pair.
    Deterministic: ties break lexicographically on the pair."""
    from ..operators.text import py_tokens

    vocab: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in py_tokens(t):
            if w:
                vocab[_word_syms(w)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break  # nothing left worth merging
        merges.append(best)
        merged = best[0] + best[1]
        new_vocab: Counter[tuple[str, ...]] = Counter()
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges lowest-rank-first until no applicable pair —
    the standard BPE inference loop."""
    syms = list(_word_syms(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def encode(text: str | None, ranks: dict[tuple[str, str], int]) -> list[str]:
    from ..operators.text import py_tokens

    out: list[str] = []
    for w in py_tokens(text):
        if w:
            out.extend(encode_word(w, ranks))
    return out


def decode(toks: list[str]) -> str:
    """Inverse of :func:`encode` up to whitespace normalization:
    concatenate and split on the end-of-word marker."""
    return " ".join(w for w in "".join(toks).split(_EOW) if w != "").strip()


# ---------------------------------------------------------------------------
# Corpus-trained tokenizer, memoized per sf_dir (same discipline as
# similarity._s12_index_dir / relational._q69_typed_warehouse)
# ---------------------------------------------------------------------------

_BPE_SAMPLE_CAP = 256  # docs; fixed-size driver collect regardless of corpus
_BPE_MERGES = 200
_BPE_MEMO: dict[str, list[tuple[str, str]]] = {}


def corpus_bpe(
    spark: SparkSession, sf_dir: str, n_merges: int = _BPE_MERGES
) -> list[tuple[str, str]]:
    """Train (once per corpus and merge budget) on a deterministic
    bounded sample: the first ``_BPE_SAMPLE_CAP`` doc_ids in order.
    The sample is a sorted limit over doc_id — at 100 TB that is a
    TopN (partial per-partition top + driver merge), never a full
    sort. ``n_merges`` is the vocab-size dial: on the synthetic
    corpus the default saturates (every frequent word merges whole),
    so callers that need genuine subword behavior pass a smaller
    budget."""
    from ..sources.tables import load_table

    key = f"{os.path.abspath(sf_dir)}#{n_merges}"
    m = _BPE_MEMO.get(key)
    if m is None:
        rows = (
            load_table(spark, sf_dir, "documents")
            .select("doc_id", "text")
            .orderBy("doc_id")
            .limit(_BPE_SAMPLE_CAP)
            .collect()
        )
        m = train_bpe([r["text"] for r in rows], n_merges)
        _BPE_MEMO[key] = m
    return m


def with_bpe_token_count(
    df: DataFrame, merges: list[tuple[str, str]], text_col: str = "text", out_col: str = "n_bpe"
) -> DataFrame:
    """Add a subword-token count column via one Arrow-batched
    pandas_udf scan. The merge table ships to executors by closure
    (a few KB); a per-batch word memo collapses the Zipf head."""
    ranks = {tuple(p): i for i, p in enumerate(merges)}

    def _n_bpe_batch(texts):
        from ..operators.text import py_tokens

        memo: dict[str, int] = {}

        def count(t: str | None) -> int:
            n = 0
            for w in py_tokens(t):
                if not w:
                    continue
                c = memo.get(w)
                if c is None:
                    c = len(encode_word(w, ranks))
                    memo[w] = c
                n += c
            return n

        return texts.map(count)

    n_bpe = F.pandas_udf(_n_bpe_batch, "long")
    return df.withColumn(out_col, n_bpe(F.col(text_col)))

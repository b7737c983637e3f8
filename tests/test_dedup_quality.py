"""Quality measurement for the seeded-hash dedup sketches (d03
MinHash+LSH, d04 SimHash) — the s04-for-dedup counterpart: their
signatures have no DuckDB oracle (rows-only in the driver), so their
evidence is measured precision/recall against exact ground truth at
sf0.01, asserted against thresholds with a safety margin below the
measured values (documented in the operator docstrings).

Measured at sf0.01 (seed-42 driver data):
- d03 cluster recall vs shingle-Jaccard >= 0.8 pairs: 1.00 (25/25);
  theory floor for 4 bands x 4 rows at J = 0.8 is 1-(1-0.8^4)^4 = 0.88
- d03 co-clustered precision vs shingle-Jaccard >= 0.5: 1.00
- d04 pair recall vs token-Jaccard >= 0.97: 1.00 (444/444);
  hamming <= 3 of 64 bits corresponds to cosine >= ~0.989, so the
  truth band is very-near-duplicates, not J >= 0.9
- d04 pair precision vs token-Jaccard >= 0.5: 0.78
"""

from __future__ import annotations

import itertools

import pandas as pd
import pytest


def _toks(t: str) -> list[str]:
    return t.strip().split()


def _shingle_set(t: str, w: int = 3) -> set[str]:
    ws = _toks(t)
    if len(ws) <= w:
        return {" ".join(ws)}
    return {" ".join(ws[i : i + w]) for i in range(len(ws) - w + 1)}


def _jac(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def doc_sets(sf_dir):
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    tok_sets = {r.doc_id: set(_toks(r.text)) for r in docs.itertuples()}
    sh_sets = {r.doc_id: _shingle_set(r.text) for r in docs.itertuples()}
    return tok_sets, sh_sets


def _truth_pairs(sets: dict, thresh: float) -> set[tuple]:
    ids = sorted(sets)
    return {
        (a, b)
        for a, b in itertools.combinations(ids, 2)
        if _jac(sets[a], sets[b]) >= thresh
    }


def test_d03_lsh_cluster_recall_and_precision(spark, sf_dir, doc_sets):
    """d03's banded-LSH clustering must co-cluster near-dup pairs
    (shingle-Jaccard >= 0.8; theoretical band-match floor 0.88) and
    must not glue unrelated docs together (co-clustered pairs stay
    above shingle-Jaccard 0.5)."""
    from tinysql_spark.operators.dedup import d03_minhash_lsh

    _, sh_sets = doc_sets
    truth = _truth_pairs(sh_sets, 0.8)
    assert truth, "ground truth empty — testdata changed?"
    clus = {r["doc_id"]: r["cluster_id"] for r in d03_minhash_lsh(spark, sf_dir).collect()}
    recall = sum(1 for a, b in truth if clus[a] == clus[b]) / len(truth)
    assert recall >= 0.85, f"d03 recall {recall:.3f} < 0.85 (measured 1.00 at sf0.01)"

    from collections import defaultdict

    groups = defaultdict(list)
    for d, c in clus.items():
        groups[c].append(d)
    co = {
        p
        for g in groups.values()
        if len(g) > 1
        for p in itertools.combinations(sorted(g), 2)
    }
    assert co, "no co-clustered pairs — LSH produced singletons only"
    precision = sum(1 for a, b in co if _jac(sh_sets[a], sh_sets[b]) >= 0.5) / len(co)
    assert precision >= 0.8, f"d03 precision {precision:.3f} < 0.8 (measured 1.00)"


def test_d04_simhash_recall_and_precision(spark, sf_dir, doc_sets):
    """d04's hamming <= 3 gate corresponds to cosine >= ~0.989 over
    token vectors, so the recall truth band is token-Jaccard >= 0.97
    (very-near duplicates); precision is measured against the looser
    J >= 0.5 band (a reported pair should at least be half-similar)."""
    from tinysql_spark.operators.dedup import d04_simhash

    tok_sets, _ = doc_sets
    truth = _truth_pairs(tok_sets, 0.97)
    assert truth, "ground truth empty — testdata changed?"
    pairs = {(r["a_id"], r["b_id"]) for r in d04_simhash(spark, sf_dir).collect()}
    recall = sum(1 for p in truth if p in pairs) / len(truth)
    assert recall >= 0.95, f"d04 recall {recall:.3f} < 0.95 (measured 1.00 at sf0.01)"
    loose = _truth_pairs(tok_sets, 0.5)
    precision = sum(1 for p in pairs if p in loose) / len(pairs)
    assert precision >= 0.6, f"d04 precision {precision:.3f} < 0.6 (measured 0.78)"


def test_d07_prior_result_survives_reinvocation(spark, sf_dir):
    """A d07 result held across a later invocation must stay
    re-executable: its final labels frame is localCheckpoint-ed
    (truncated lineage), so any explicit unpersist by later runs would
    destroy the only copy of its blocks — block-not-found instead of
    recompute. Release is GC-driven (ContextCleaner), never explicit."""
    from tinysql_spark.operators.dedup import d07_embedding_cluster

    first = d07_embedding_cluster(spark, sf_dir)
    want = first.count()
    d07_embedding_cluster(spark, sf_dir).count()  # second invocation
    # the FIRST result must still execute after the second run
    assert first.count() == want


def test_cc_converge_random_graphs_match_union_find(spark):
    """Property test for the round-6 star kernel: on random, chain
    (deep diameter — many rounds), and star-heavy (wide component)
    edge lists, _cc_converge's labels must equal the component
    minimum from an independent pure-Python union-find. Guards the
    kernel swap against shape-specific convergence bugs the
    operator-level oracles (one fixed corpus) cannot see."""
    import random

    from pyspark.sql import functions as F

    from tinysql_spark.operators.dedup import _cc_converge

    cases = [
        (1, 60, 40, "rand"),
        (2, 80, 80, "rand"),
        (3, 50, 0, "chain"),
        (4, 64, 60, "star"),
        (5, 120, 150, "rand"),
    ]
    for seed, n, m, shape in cases:
        rng = random.Random(seed)
        if shape == "chain":
            pairs = [(i, i + 1) for i in range(n - 1)]
        elif shape == "star":
            pairs = [(0, i) for i in range(1, n)][:m]
        else:
            pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(m)]
        pairs = [(a, b) for a, b in pairs if a != b]
        # union-find with union-by-min: the root IS the component min
        parent = list(range(n))

        def find(x: int) -> int:
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        touched = sorted({v for p in pairs for v in p})
        expected = {v: find(v) for v in touched}

        edges = spark.createDataFrame(
            [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
            "s long, d long",
        )
        got = {
            r["vec_id"]: r["lbl"] for r in _cc_converge(edges).collect()
        }
        assert got == expected, (seed, shape, {
            v: (got.get(v), expected[v])
            for v in touched if got.get(v) != expected[v]
        })


def test_t16_pii_scrub_semantics(spark):
    """pii_scrub redacts each class, leaves clean text untouched, and
    counts per class — handcrafted strings, not the synthetic
    injection the registry entry uses."""
    from tinysql_spark.operators.text import pii_scrub

    rows = [
        (1, "mail me at jane.doe+x@sub.example.org today"),
        (2, "call 555-867-5309 or 555.867.5309"),
        (3, "ssn 123-45-6789 but order 12-345-67890 stays"),
        (4, "host 192.168.0.1 responded"),
        (5, "no pii here at all"),
        (6, "a@b.co and 10.0.0.7 and 999-11-2222"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: r.asDict() for r in pii_scrub(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["scrubbed"] == "mail me at <EMAIL> today"
    assert got[2]["n_phone"] == 2 and got[2]["scrubbed"] == "call <PHONE> or <PHONE>"
    assert got[3]["n_ssn"] == 1 and "<SSN>" in got[3]["scrubbed"]
    assert "12-345-67890" in got[3]["scrubbed"], "non-SSN digit shape must survive"
    assert got[4]["n_ip"] == 1 and got[4]["scrubbed"] == "host <IP> responded"
    assert got[5]["scrubbed"] == "no pii here at all"
    assert sum(got[5][k] for k in ("n_email", "n_ssn", "n_phone", "n_ip")) == 0
    assert got[6]["scrubbed"] == "<EMAIL> and <IP> and <SSN>"


def _round_half_up(x: float, nd: int) -> float:
    """Twin of Spark's F.round (BigDecimal HALF_UP over the shortest
    decimal repr of the double) — Python's round() is banker's and
    would diverge on .5 boundaries."""
    import decimal

    return float(
        decimal.Decimal(repr(x)).quantize(
            decimal.Decimal(1).scaleb(-nd), rounding=decimal.ROUND_HALF_UP
        )
    )


def test_bpe_tokenizer_roundtrip_and_determinism(spark, sf_dir):
    """The codec-op discipline for p15: decode(encode(x)) recovers the
    whitespace-normalized text for every sampled doc; training is
    deterministic (two runs, byte-identical merge tables); encode
    agrees with a brute-force reference that tries ALL merge orders
    by rank (the production loop is the optimized form of it)."""
    from tinysql_spark.functions import bpe

    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .orderBy("doc_id")
        .limit(64)
        .collect()
    )
    texts = [r["text"] for r in rows]
    m1, m2 = bpe.train_bpe(texts, 80), bpe.train_bpe(texts, 80)
    assert m1 == m2 and len(m1) > 0
    ranks = {tuple(p): i for i, p in enumerate(m1)}
    for t in texts[:16]:
        assert bpe.decode(bpe.encode(t, ranks)) == " ".join((t or "").split())

    # reference encoder: repeatedly apply THE lowest-rank applicable
    # merge scanning the whole sequence each pass
    def ref_encode_word(word):
        syms = list(word) + ["</w>"]
        while True:
            cands = [
                (ranks[(a, b)], i)
                for i, (a, b) in enumerate(zip(syms, syms[1:]))
                if (a, b) in ranks
            ]
            if not cands:
                return syms
            _, i = min(cands)
            syms[i : i + 2] = [syms[i] + syms[i + 1]]

    from tinysql_spark.operators.text import py_tokens

    for t in texts[:8]:
        for w in py_tokens(t):
            if w:
                assert bpe.encode_word(w, ranks) == ref_encode_word(w)


def test_p15_matches_pure_python_twin(spark, sf_dir):
    """Dual-path parity (BPE is not SQL-expressible, so p15 is
    rows-only for the driver): recompute the ENTIRE plan — sample,
    training, encoding, budget arithmetic, rounding — in pure
    Python/pandas from the same parquet and compare exactly."""
    import pandas as pd

    from tinysql_spark.functions import bpe
    from tinysql_spark.operators.pipeline import (
        _P14_BUDGET_X,
        _P14_MAX_EPOCHS,
        p15_bpe_epoch_repeat_plan,
    )

    got = {r["lang"]: r.asDict() for r in p15_bpe_epoch_repeat_plan(spark, sf_dir).collect()}

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "lang", "text"]]
    sample = pdf.sort_values("doc_id").head(bpe._BPE_SAMPLE_CAP)
    merges = bpe.train_bpe(list(sample["text"]), bpe._BPE_MERGES)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pdf["n_bpe"] = pdf["text"].map(lambda t: len(bpe.encode(t, ranks)))
    t = pdf.groupby("lang").agg(n_docs=("doc_id", "size"), n_tok=("n_bpe", "sum"))
    all_tok, k = int(t["n_tok"].sum()), len(t)
    assert set(got) == set(t.index)
    for lang, row in t.iterrows():
        target = _P14_BUDGET_X * all_tok / k
        epochs = _round_half_up(min(_P14_MAX_EPOCHS, target / row["n_tok"]), 6)
        achieved = _round_half_up(epochs * row["n_tok"], 2)
        target_r = _round_half_up(target, 2)
        exp = {
            "n_docs": int(row["n_docs"]),
            "n_tok": int(row["n_tok"]),
            "target_tok": target_r,
            "epochs": epochs,
            "achieved_tok": achieved,
            "deficit_tok": _round_half_up(max(0.0, target_r - achieved), 2),
        }
        g = {k2: got[lang][k2] for k2 in exp}
        assert g == exp, f"{lang}: {g} != {exp}"


def test_d16_bloom_selectivity_and_exactness(spark, sf_dir):
    """The bloom must actually prefilter: hits ≈ injected dups (false
    positives possible but bounded — 16 KiB bitmap over ~400 entries
    has fp-rate << 1%), never all-pass or all-drop; and the final
    output is EXACT regardless (parity covers the hash, this covers
    the sketch's behavior)."""
    import numpy as np

    from pyspark.sql import functions as F

    from tinysql_spark.operators import dedup as D
    from tinysql_spark.operators.text import fingerprint
    from tinysql_spark.sources.tables import load_table

    D._D16_BLOOM_MEMO.clear()
    bm = np.frombuffer(D._d16_history_bloom(spark, sf_dir), dtype=np.uint8)
    assert bm.any(), "empty bloom"
    inc = (
        D._d16_augment(load_table(spark, sf_dir, "documents"))
        .filter(F.col("doc_id") >= D._D16_BOUNDARY)
        .select(F.xxhash64(fingerprint(F.col("text"))).alias("h"))
        .toPandas()
    )
    idx = D._d16_bit_indices(inc["h"].to_numpy())
    hits = int((((bm[idx >> 3] >> (idx & 7).astype(np.uint8)) & 1).all(axis=1)).sum())
    out = D.d16_bloom_incremental_dedup(spark, sf_dir).toPandas()
    true_dups = int(out["is_dup"].sum())
    assert true_dups > 0, "injection produced no dups — vacuous entry"
    assert hits >= true_dups, "bloom false negative — impossible by construction"
    n_inc = len(inc)
    assert hits <= true_dups + max(2, n_inc // 20), (
        f"bloom passes {hits}/{n_inc} vs {true_dups} dups — not selective"
    )
    # every flagged dup resolves to the lexicographic-min history owner
    dup_rows = out[out["is_dup"]]
    assert (dup_rows["dup_of"] < D._D16_BOUNDARY).all()


def test_bpe_roundtrip_property():
    """Property: for ANY ascii-word corpus and any trained merge
    count, decode(encode(x)) == whitespace-normalized x, and encoding
    never emits more symbols than characters+1 per word."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from tinysql_spark.functions import bpe

    word = st.text(alphabet=st.sampled_from("abcdef"), min_size=1, max_size=8)
    corpus = st.lists(
        st.lists(word, min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=150, deadline=None)
    @given(corpus=corpus, n_merges=st.integers(min_value=0, max_value=40))
    def check(corpus, n_merges):
        merges = bpe.train_bpe(corpus, n_merges)
        ranks = {tuple(p): i for i, p in enumerate(merges)}
        for t in corpus:
            toks = bpe.encode(t, ranks)
            norm = " ".join(t.split())
            assert bpe.decode(toks) == norm
            n_words = len([w for w in t.split() if w])
            assert len(toks) <= len(norm.replace(" ", "")) + n_words

    check()


def test_p19_matches_pure_python_twin(spark, sf_dir):
    """Dual-path parity for BPE packing (rows-only op): the twin
    recomputes sample -> training -> encoding -> per-source cumsum ->
    bin assignment -> rollup in pure pandas and compares exactly.
    Also pins the MOTIVATION: BPE bins differ from whitespace bins
    (if they were identical the op would be pointless)."""
    import pandas as pd

    from tinysql_spark.functions import bpe
    from tinysql_spark.operators.pipeline import (
        _PACK_BUDGET,
        p05_sequence_packing,
        p19_bpe_sequence_packing,
    )

    got = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["n_tokens"])
        for r in p19_bpe_sequence_packing(spark, sf_dir).collect()
    }

    from tinysql_spark.operators.pipeline import _P19_MERGES

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "source", "text"]]
    sample = pdf.sort_values("doc_id").head(bpe._BPE_SAMPLE_CAP)
    merges = bpe.train_bpe(list(sample["text"]), _P19_MERGES)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pdf["tok_cnt"] = pdf["text"].map(lambda t: len(bpe.encode(t, ranks)))
    exp: dict = {}
    for source, grp in pdf.sort_values("doc_id").groupby("source"):
        cum = 0
        for _, row in grp.iterrows():
            bin_id = cum // _PACK_BUDGET
            cum += int(row["tok_cnt"])
            k = (source, bin_id)
            n, tok = exp.get(k, (0, 0))
            exp[k] = (n + 1, tok + int(row["tok_cnt"]))
    assert got == exp

    ws_bins = {
        (r["source"], r["bin_id"]): (r["n_docs"], r["n_tokens"])
        for r in p05_sequence_packing(spark, sf_dir).collect()
    }
    assert got != ws_bins, "BPE packing identical to whitespace packing — vacuous"


def test_d18_append_touches_only_dirty_buckets(spark, sf_dir):
    """The physical claim in d18's docstring: the batch-A increment is
    written with mode=append + partitionBy(bkt), so files appear ONLY
    under bucket partitions that actually receive new fingerprints.
    Recompute the expected dirty-bucket set from the data and compare
    it against the build manifest's appended-file list exactly."""
    import json
    import os
    import re

    from pyspark.sql import functions as F

    from tinysql_spark.operators.dedup import (
        _D16_BOUNDARY,
        _D18_MID,
        _D18_NB,
        _d18_augment,
        _d18_incremental_index,
        fingerprint,
    )
    from tinysql_spark.sources.tables import load_table

    d = _d18_incremental_index(spark, sf_dir)
    m = json.load(open(os.path.join(d, "manifest.json")))
    assert m["appended"], "increment wrote nothing — append path vacuous"

    f = _d18_augment(load_table(spark, sf_dir, "documents")).select(
        "doc_id", fingerprint(F.col("text")).alias("fp")
    )
    hist_fps = f.filter(F.col("doc_id") < _D16_BOUNDARY).select("fp").distinct()
    a_new = (
        f.filter((F.col("doc_id") >= _D16_BOUNDARY) & (F.col("doc_id") < _D18_MID))
        .select("fp")
        .distinct()
        .join(hist_fps, "fp", "left_anti")
        .select(F.pmod(F.xxhash64("fp"), F.lit(_D18_NB)).cast("int").alias("bkt"))
        .distinct()
    )
    expected_dirty = {str(r["bkt"]) for r in a_new.collect()}
    appended_buckets = {
        re.search(r"bkt=(\d+)", p).group(1) for p in m["appended"]
    }
    assert appended_buckets == expected_dirty, (appended_buckets, expected_dirty)
    # and at this sf at least one bucket must have stayed CLEAN, or the
    # dirty-only property is unobservable
    assert len(expected_dirty) < _D18_NB, "every bucket dirty — widen NB"


def test_p20_matches_pure_python_twin(spark, sf_dir):
    """Dual-path parity for the BPE-budgeted mix quota (rows-only op):
    the twin recomputes sample -> training -> encoding -> per-stratum
    rank -> cumsum -> budget filter in pure pandas and compares the
    full row set exactly. Also pins the MOTIVATION: the selected doc
    set differs from p03's whitespace-budgeted set."""
    import pandas as pd

    from tinysql_spark.functions import bpe
    from tinysql_spark.operators.pipeline import (
        _P19_MERGES,
        p03_token_budget_mix,
        p20_bpe_token_budget_mix,
    )

    got = {
        r["doc_id"]: (r["lang"], r["source"], r["tok_cnt"], r["cum_tok"])
        for r in p20_bpe_token_budget_mix(spark, sf_dir).collect()
    }

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "lang", "source", "n_chars", "text"]
    ]
    sample = pdf.sort_values("doc_id").head(bpe._BPE_SAMPLE_CAP)
    merges = bpe.train_bpe(list(sample["text"]), _P19_MERGES)
    ranks = {tuple(p): i for i, p in enumerate(merges)}
    pdf["tok_cnt"] = pdf["text"].map(lambda t: len(bpe.encode(t, ranks)))
    exp: dict = {}
    for (lang, source), grp in pdf.groupby(["lang", "source"]):
        cum = 0
        for _, row in grp.sort_values(
            ["n_chars", "doc_id"], ascending=[False, True]
        ).iterrows():
            cum += int(row["tok_cnt"])
            if cum <= 500:
                exp[int(row["doc_id"])] = (lang, source, int(row["tok_cnt"]), cum)
    assert got == exp

    ws_ids = {r["doc_id"] for r in p03_token_budget_mix(spark, sf_dir).collect()}
    assert set(got) != ws_ids, "BPE quota identical to whitespace quota — vacuous"


def test_t20_matches_pure_python_twin(spark, sf_dir):
    """Dual-path parity for the compression gate (rows-only op): the
    twin reproduces injection + zlib level-6 deflate + flags exactly,
    and both flag tails must be non-vacuous."""
    import zlib

    import pandas as pd

    from tinysql_spark.operators.text import _T20_REP_EVERY, t20_compression_gate

    got = {
        r["doc_id"]: (
            r["n_raw"], r["n_comp"], r["ratio"],
            r["flag_repetitive"], r["flag_incompressible"],
        )
        for r in t20_compression_gate(spark, sf_dir).collect()
    }

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    exp = {}
    for _, row in pdf.iterrows():
        t = row["text"] or ""
        if row["doc_id"] % _T20_REP_EVERY == 0:
            t = t[:40] * 20
        raw = t.encode("utf-8")
        n_raw, n_comp = len(raw), len(zlib.compress(raw, 6))
        ratio = n_comp / max(n_raw, 1)
        exp[int(row["doc_id"])] = (n_raw, n_comp, ratio, ratio < 0.2, ratio > 0.95)
    assert got == exp
    assert any(v[3] for v in got.values()), "no repetitive docs flagged"
    assert any(v[4] for v in got.values()), "no incompressible docs flagged"


def test_d18_refreshed_bloom_has_no_false_negatives(spark, sf_dir):
    """The maintained sketch's safety property: every batch-A
    fingerprint hash must be a bloom HIT in the refreshed bitmap (a
    false negative would silently skip a B-duplicates-A doc), while
    the UN-refreshed history bitmap must MISS at least one batch-A-new
    fingerprint — i.e. the refresh genuinely added bits."""
    import numpy as np

    from pyspark.sql import functions as F

    from tinysql_spark.operators.dedup import (
        _D16_BOUNDARY,
        _D18_MID,
        _d16_bit_indices,
        _d16_history_bloom,
        _d18_augment,
        _d18_refreshed_bloom,
        fingerprint,
    )
    from tinysql_spark.sources.tables import load_table

    def hits(bm_bytes, h64):
        bits = np.frombuffer(bm_bytes, dtype=np.uint8)
        i = _d16_bit_indices(np.asarray(h64, dtype=np.int64))
        return ((bits[i >> 3] >> (i & 7).astype(np.uint8)) & 1).all(axis=1)

    f = _d18_augment(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.xxhash64(fingerprint(F.col("text"))).alias("h")
    )
    a_h = [
        r["h"]
        for r in f.filter(
            (F.col("doc_id") >= _D16_BOUNDARY) & (F.col("doc_id") < _D18_MID)
        ).collect()
    ]
    ref = _d18_refreshed_bloom(spark, sf_dir)
    hist = _d16_history_bloom(spark, sf_dir)
    assert hits(ref, a_h).all(), "refreshed bloom false negative on a batch-A fp"
    assert not hits(hist, a_h).all(), (
        "history bloom already contains every batch-A fp — refresh vacuous"
    )


def test_d18_compaction_rewrites_only_fragmented_buckets(spark, sf_dir):
    """d18_compact_index must (a) leave the index CONTENT bit-identical
    (same fp->keeper rows), (b) bring every bucket partition down to
    one file, and (c) report exactly the buckets that were fragmented."""
    import glob
    import os

    from tinysql_spark.operators.dedup import (
        _d18_incremental_index,
        d18_compact_index,
    )

    d = _d18_incremental_index(spark, sf_dir)
    idx = os.path.join(d, "keepers")
    before_files = {
        p: len(glob.glob(os.path.join(p, "*.parquet")))
        for p in glob.glob(os.path.join(idx, "bkt=*"))
    }
    fragmented = {
        int(p.rsplit("=", 1)[1]) for p, n in before_files.items() if n > 1
    }
    assert fragmented, "no fragmented buckets — the append left nothing to compact"
    before_rows = sorted(
        (r["fp"], r["keeper"], r["bkt"]) for r in spark.read.parquet(idx).collect()
    )

    compacted = d18_compact_index(spark, sf_dir, max_files=1)
    assert set(compacted) == fragmented, (set(compacted), fragmented)
    after_files = {
        p: len(glob.glob(os.path.join(p, "*.parquet")))
        for p in glob.glob(os.path.join(idx, "bkt=*"))
    }
    assert all(n == 1 for n in after_files.values()), after_files
    after_rows = sorted(
        (r["fp"], r["keeper"], r["bkt"]) for r in spark.read.parquet(idx).collect()
    )
    assert after_rows == before_rows
    # second compaction is a no-op
    assert d18_compact_index(spark, sf_dir, max_files=1) == {}


def test_adaptive_bloom_sizing(spark, sf_dir):
    """The self-tuning sketch must (a) stop at the smallest
    power-of-two m whose predicted fp rate (fill**k) is under budget
    — verified against an independent recompute, (b) never produce a
    false negative on the index's own fingerprints, and (c) keep the
    MEASURED fp rate over absent keys near the prediction."""
    import os

    import numpy as np

    from tinysql_spark.operators.dedup import (
        _D16_K,
        _d16_bit_indices,
        _d18_incremental_index,
        adaptive_bloom_from_index,
    )

    idx = os.path.join(_d18_incremental_index(spark, sf_dir), "keepers")
    bm, m, fp = adaptive_bloom_from_index(spark, idx, m0=64, fp_budget=0.01)
    assert fp <= 0.01 and len(bm) == m // 8

    hs = np.array(
        [r["h"] for r in spark.read.parquet(idx).selectExpr("xxhash64(fp) AS h").collect()],
        dtype=np.int64,
    )
    bits = np.frombuffer(bm, dtype=np.uint8)

    def hit(h, mm):
        i = _d16_bit_indices(h, mm)
        return ((bits[i >> 3] >> (i & 7).astype(np.uint8)) & 1).all(axis=1)

    # (b) no false negatives
    assert hit(hs, m).all()
    # (a) minimality: the half-size sketch must be OVER budget — an
    # independent fill recompute at m/2 (same hash family)
    half = np.zeros(m // 16, dtype=np.uint8)
    i = _d16_bit_indices(hs, m // 2).ravel()
    np.bitwise_or.at(half, i >> 3, np.uint8(1) << (i & 7).astype(np.uint8))
    fill_half = float(np.unpackbits(half).sum()) / (m // 2)
    assert fill_half ** _D16_K > 0.01, "half-size under budget — not minimal"
    # (c) measured fp over 20k absent keys stays near the prediction
    rng = np.random.default_rng(7)
    probes = rng.integers(1 << 40, 1 << 62, size=20000, dtype=np.int64)
    probes = probes[~np.isin(probes, hs)]
    measured = float(hit(probes, m).mean())
    assert measured <= max(0.02, 3 * fp), (measured, fp)


def test_sharded_bloom_sizing_and_membership(spark, sf_dir):
    """The sharded sketch must pick the analytic shard count (power of
    two, recomputed independently here), produce no false negatives
    on the index's own fingerprints, and keep the measured fp rate
    over absent probes near the per-shard prediction — with a shard
    size small enough (512 bits) that a SINGLE bitmap would be
    saturated, so sharding is what carries the budget."""
    import math
    import os

    import numpy as np

    from tinysql_spark.operators.dedup import (
        _D16_K,
        _d18_incremental_index,
        adaptive_bloom_from_index,
        sharded_bloom_from_index,
        sharded_bloom_might_contain,
    )

    idx = os.path.join(_d18_incremental_index(spark, sf_dir), "keepers")
    m_shard = 512
    maps, s, fp = sharded_bloom_from_index(spark, idx, m_shard=m_shard, fp_budget=0.01)
    assert fp <= 0.01 and s & (s - 1) == 0 and len(maps) == s

    hs = np.array(
        [r["h"] for r in spark.read.parquet(idx).selectExpr("xxhash64(fp) AS h").collect()],
        dtype=np.int64,
    )
    n = len(hs)
    # independent analytic shard count (no measured-skew re-split at
    # this scale: assert >=, equality when fills land as predicted)
    s_exp = 1
    while (1.0 - math.exp(-(n * _D16_K) / (s_exp * m_shard))) ** _D16_K > 0.01:
        s_exp *= 2
    assert s >= s_exp, (s, s_exp)
    # a single 512-bit bitmap would be saturated (sharding earns the budget)
    assert (1.0 - math.exp(-(n * _D16_K) / m_shard)) ** _D16_K > 0.5
    # no false negatives
    assert sharded_bloom_might_contain(maps, s, hs).all()
    # measured fp over absent probes near prediction
    rng = np.random.default_rng(11)
    probes = rng.integers(1 << 40, 1 << 62, size=20000, dtype=np.int64)
    probes = probes[~np.isin(probes, hs)]
    measured = float(sharded_bloom_might_contain(maps, s, probes).mean())
    assert measured <= max(0.02, 3 * fp), (measured, fp)
    # and the unsharded adaptive build agrees on the no-FN property
    bm, m, _fp2 = adaptive_bloom_from_index(spark, idx, m0=64, fp_budget=0.01)
    assert sharded_bloom_might_contain([bm], 1, hs).all()


def test_d20_prefix_filter_lossless_and_cheaper(spark, sf_dir):
    """The prefix theorem in practice: d20's prefix-filtered join
    must return EXACTLY d02's result set (zero false negatives — the
    filter is lossless for J >= t), while the candidate join's
    input/output volume shrinks to ~(1-t) of all-token blocking (the
    100 TB shuffle argument; measured ~0.20 at t=0.8 here). On this
    tiny ~30-word vocabulary the DISTINCT-pair reduction is small —
    every prefix still collides broadly — so the honest metric is
    join volume; a Zipfian real vocabulary shrinks both."""
    from pyspark.sql import functions as F

    from tinysql_spark.operators.dedup import (
        _d20_candidates,
        _d20_token_arrays,
        d02_ngram_jaccard,
        d20_prefix_filter_jaccard,
    )

    d02 = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 9))
        for r in d02_ngram_jaccard(spark, sf_dir).collect()
    }
    d20 = {
        (r["a_id"], r["b_id"], round(r["jaccard"], 9))
        for r in d20_prefix_filter_jaccard(spark, sf_dir).collect()
    }
    assert d02 and d20 == d02

    # join-volume measurement: pre-distinct equi-join output rows
    toks = _d20_token_arrays(spark, sf_dir)
    tok = toks.select("doc_id", "source", F.explode("toks").alias("w"))

    def joinvol(t):
        a = t.select(F.col("doc_id").alias("a_id"), F.col("source").alias("s"), "w")
        b = t.select(F.col("doc_id").alias("b_id"), F.col("source").alias("s2"), "w")
        return (
            a.join(b, "w")
            .filter((F.col("s") == F.col("s2")) & (F.col("a_id") < F.col("b_id")))
            .count()
        )

    # reconstruct the prefix relation the candidate generator uses
    from pyspark.sql import Window

    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy("df", "w")
    ranked = (
        tok.join(freq, "w")
        .withColumn("rn", F.row_number().over(w_doc))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("doc_id")))
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.lit(0.8) * F.col("n")) + 1
    ).select("doc_id", "source", "w")
    ratio = joinvol(prefix) / joinvol(tok)
    assert ratio < 0.3, ratio
    # and the candidate set still covers every true pair
    cands = {
        (r["a_id"], r["b_id"]) for r in _d20_candidates(spark, sf_dir).collect()
    }
    assert {(a, b) for a, b, _ in d02} <= cands
    # r15: the PPJoin length+positional filters prune candidates
    # BEFORE the distinct — cands must be a (strict, on this corpus)
    # subset of the filter-free prefix join's pairs, never more
    unfiltered = {
        (r["a_id"], r["b_id"])
        for r in (
            prefix.select(F.col("doc_id").alias("a_id"), F.col("source").alias("s"), "w")
            .join(
                prefix.select(F.col("doc_id").alias("b_id"), F.col("source").alias("s"), "w"),
                ["w", "s"],
            )
            .filter(F.col("a_id") < F.col("b_id"))
            .select("a_id", "b_id")
            .distinct()
            .collect()
        )
    }
    assert cands < unfiltered, (len(cands), len(unfiltered))


def test_d20_tokhash_variants_identical(spark, sf_dir):
    """The A/B'd token-hash stages (JVM transform+xxhash64 vs the
    Arrow pandas_udf batch) must produce the IDENTICAL d20 result —
    the hash function cancels because d20 only compares hashes from
    the same stage. Pinned so the in-tree `_D20_TOKHASH` toggle stays
    honest (BASELINE r12: the HOF variant measured 34% faster and is
    the committed default)."""
    import tinysql_spark.operators.dedup as D
    from tinysql_spark.operators.registry import REGISTRY

    fn = REGISTRY["d20_prefix_filter_jaccard"].fn
    assert D._D20_TOKHASH == "hof"  # the measured winner is the default
    try:
        a = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
        D._D20_TOKHASH = "arrow"
        b = sorted(tuple(r) for r in fn(spark, sf_dir).collect())
    finally:
        D._D20_TOKHASH = "hof"
    assert a == b and len(a) > 0


def test_pair_sims_arrow_matches_jvm_fold_bitexact(spark, sf_dir):
    """The r14 Arrow pair scorer must return the SAME pair set with
    BIT-IDENTICAL sim doubles as the JVM zip_with+aggregate fold twin
    (SPARK_GRAFT_PAIRDOT_JVM): the scorer's per-dimension accumulation
    replays the fold's exact multiply-then-add rounding sequence, so
    equality is ==, not approx — the guarantee that lets d05/d07/d14/
    s13 keep their oracle hashes after the kernel swap."""
    import os

    from pyspark.sql import functions as F

    import tinysql_spark.operators.dedup as D
    from tinysql_spark.sources.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", D.unit_vec(F.col("embedding")).alias("e")
    )
    assert "SPARK_GRAFT_PAIRDOT_JVM" not in os.environ  # arrow is default
    arrow = {
        (r["lo"], r["hi"]): r["sim"] for r in D._block_pair_sims(emb).collect()
    }
    os.environ["SPARK_GRAFT_PAIRDOT_JVM"] = "1"
    try:
        jvm = {
            (r["lo"], r["hi"]): r["sim"] for r in D._block_pair_sims(emb).collect()
        }
    finally:
        del os.environ["SPARK_GRAFT_PAIRDOT_JVM"]
    assert set(arrow) == set(jvm) and len(arrow) > 1000
    diffs = [k for k in jvm if jvm[k] != arrow[k]]
    assert not diffs, f"{len(diffs)} sims differ (of {len(jvm)}): {diffs[:3]}"
    # thresholded form too: the in-batch filter must equal JVM >=
    got = {
        (r["lo"], r["hi"]) for r in D._block_pair_sims(emb, min_sim=0.3).collect()
    }
    assert got == {k for k, v in jvm.items() if v >= 0.3}


def test_pair_sims_zero_norm_vectors_match_jvm(spark):
    """ADVICE r14: a zero-norm embedding makes unit_vec emit NULL
    components (Spark non-ANSI 0.0/0.0 is NULL, not NaN), the JVM
    fold then yields a NULL sim which any `sim >= t` drops; on the
    Arrow side those NULLs arrive as NaN, the IEEE `acc >= t` mask
    drops the same pairs, and an unthresholded NaN sim rides back
    through Arrow as NULL — so BOTH paths agree exactly. Pinned on a
    synthetic block holding two zero vectors, thresholded and not."""
    import os

    from pyspark.sql import functions as F

    import tinysql_spark.operators.dedup as D

    df = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 7),
            (2, [1.0, 0.0], 7),
            (3, [0.0, 0.0], 7),
            (4, [0.6, 0.8], 7),
        ],
        "vec_id long, e array<float>, label int",
    )
    emb = df.select("vec_id", "label", D.unit_vec(F.col("e")).alias("e"))
    for ms in (0.5, None):
        arrow = sorted(tuple(r) for r in D._block_pair_sims(emb, min_sim=ms).collect())
        os.environ["SPARK_GRAFT_PAIRDOT_JVM"] = "1"
        try:
            jvm = sorted(tuple(r) for r in D._block_pair_sims(emb, min_sim=ms).collect())
        finally:
            del os.environ["SPARK_GRAFT_PAIRDOT_JVM"]
        assert arrow == jvm, (ms, arrow, jvm)
    # the thresholded form keeps exactly the one real pair
    assert [(r[0], r[1]) for r in arrow if r[2] is not None] == [(2, 4)]


def test_d02_chunk_guard_pairs_identical(spark, sf_dir, monkeypatch):
    """The r14 chunk-bucket guard (per-source rows hashed into
    ceil(bn/cap) chunks so a giant source never lands in one join
    task — guide §2.5's unsplittable hot key): forcing the cap small
    enough to engage at test scale (k >= 4 chunks per source) must
    yield the exact pair set and jaccard values of the degenerate
    k = 1 plan the bench corpus takes."""
    import tinysql_spark.operators.dedup as D

    base = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in D.d02_ngram_jaccard(spark, sf_dir).collect()
    }
    assert base, "corpus must produce pairs"
    monkeypatch.setattr(D, "_D02_CHUNK_CAP", 8)
    forced = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in D.d02_ngram_jaccard(spark, sf_dir).collect()
    }
    assert forced == base

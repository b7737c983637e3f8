"""Measured recall for the composed IVF-SQ ANN (s06) — rows-only in
the driver (centroid literals), so its evidence is recall@k against
the exact brute-force top-k, the same discipline as s04 and
test_dedup_quality.

Measured at sf0.01 (seed-42 corpus, weak neighbor structure — nearest
neighbors sit at cos~0.35): s03's nprobe=2 coarse probe recalls 0.32;
s06 probes 4 lists (the recall buy-back dial on a compressed index)
and recalls 0.48, with zero loss introduced by the SQ first pass +
3k-survivor exact rerank. Asserted floor 0.4, plus s06 >= the
measured coarse-probe baseline."""

from __future__ import annotations


def test_s06_ivf_sq_recall(spark, sf_dir):
    from tinysql_spark.operators.similarity import (
        s01_ann_brute_topk,
        s06_ann_ivf_sq,
    )

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in s01_ann_brute_topk(spark, sf_dir).collect()
    }
    got = {
        (r["query_id"], r["neighbor_id"])
        for r in s06_ann_ivf_sq(spark, sf_dir).collect()
    }
    assert exact, "exact top-k empty"
    recall = len(exact & got) / len(exact)
    assert recall >= 0.4, f"s06 recall {recall:.3f} < 0.4 (measured 0.48)"
    # the composition must not lose recall vs its own candidate
    # generator baseline (s03, nprobe=2, measured 0.32)
    from tinysql_spark.operators.similarity import s03_ann_ivf

    ivf = {
        (r["query_id"], r["neighbor_id"])
        for r in s03_ann_ivf(spark, sf_dir).collect()
    }
    recall_ivf = len(exact & ivf) / len(exact)
    assert recall >= recall_ivf, (recall, recall_ivf)

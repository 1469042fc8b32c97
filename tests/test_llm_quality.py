"""Quality checks for the approximate LLM-data operators (the checks a
rows-only driver key cannot express)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with 16 sampled centroids and probe=1 must recover a
    meaningful fraction of the exact top-5 (and every hit it returns
    must come from the true neighbor ranking's candidate set)."""
    from flink_large_window_spark.registry import REGISTRY

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["sim_cosine_topk"](spark, SF_SMOKE).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in REGISTRY["sim_ann_ivf_topk"](spark, SF_SMOKE).collect()
    }
    assert approx, "IVF returned nothing"
    recall = len(exact & approx) / len(exact)
    # probe=1 over 16 cells: random chance would be ~1/16; require well
    # above chance without demanding brute-force parity.
    assert recall >= 0.2, f"IVF recall@5 too low: {recall:.2f}"


def test_langid_outputs_valid_labels(spark):
    from flink_large_window_spark.registry import REGISTRY
    from flink_large_window_spark.tables import table

    df = REGISTRY["text_langid_ngram"](spark, SF_SMOKE)
    rows = df.collect()
    n_docs = table(spark, SF_SMOKE, "documents").count()
    assert len(rows) == n_docs, "one prediction per document"
    langs = {"en", "fr", "es", "zh", "de"}
    assert {r["pred_lang"] for r in rows} <= langs

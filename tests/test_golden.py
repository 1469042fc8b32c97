"""Golden-file regression tests (SURVEY §5.6): pinned sf0.001 outputs
for the most complex queries, catching regressions without DuckDB in
the loop. Regenerate intentionally with REGEN_GOLDEN=1."""

from __future__ import annotations

import json
import os

import pytest

from tests.check_oracle import canon_rows
from tests.conftest import SF_SMOKE

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")

KEYS = [
    "agg_hash_grouped",
    "join_asof",
    "join_interval",
    "window_session_agg",
    "window_sliding_agg",
    "window_early_fire",
    "stateful_count_session",
    "window_topn",
    "sim_cosine_topk",
    "text_tfidf_topterms",
    "text_fingerprint_rolling",
    "text_quality_score",
    "dedup_exact",
    "dedup_cluster_cc",
    "dedup_simhash",
    "ts_ewma_daily",
    "ts_funnel_conversion",
    "pivot_event_counts",
    "sample_reservoir_hash",
    "emb_kmeans_assign",
    "q3_shipping_priority",
    "q5_local_supplier",
    "sim_ann_ivf_multiprobe",
    "dedup_simhash_hamming",
    "llm_corpus_pipeline",
    "window_count_tumbling",
    # round 6: the derived-partsupp quartet, the restart-continuity
    # emission log, the upgraded skew emission set, and minhash on its
    # round-6 60-bit hash basis
    "q2_min_cost_supplier",
    "q11_important_stock",
    "q16_supplier_variety",
    "q20_excess_stock",
    "stream_checkpoint_restart",
    "stream_rule_update_enrich",
    "stream_watermark_skew",
    "dedup_near_minhash",
]


@pytest.mark.parametrize("key", KEYS)
def test_golden(spark, key):
    from flink_large_window_spark import api

    df = api.queries()[key](spark, SF_SMOKE)
    rows = canon_rows(df.toPandas())
    path = os.path.join(GOLDEN_DIR, f"{key}.json")
    if os.environ.get("REGEN_GOLDEN") == "1" or not os.path.exists(path):
        os.makedirs(GOLDEN_DIR, exist_ok=True)
        with open(path, "w") as f:
            json.dump({"columns": sorted(df.columns), "rows": rows}, f)
        pytest.skip(f"golden written: {path}")
    with open(path) as f:
        golden = json.load(f)
    assert sorted(df.columns) == golden["columns"]
    assert [list(r) for r in rows] == [list(r) for r in golden["rows"]]

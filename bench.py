"""Benchmark harness (SURVEY §6 / BASELINE.md M5 protocol).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS]: one warm-up, then median of 3 timed runs of
a noop-sink write (full execution, no sink cost). Prints exactly ONE
JSON line to stdout:

  {"metric": "...", "value": <total median sec>, "unit": "sec",
   "queries": {key: sec, ...}, "sf": "<dir>"}

and writes BENCH_LAST.json with per-run detail + env. BENCH.json is
the FROZEN round-1 baseline (BASELINE.md) and is never rewritten here
— later rounds must stay within 2× of it.

Known measurement hazards (round 6): (1) CacheManager substitutes
cached data by canonical plan, so a key that persists without
releasing makes its own later runs (and any plan-identical key)
artificially fast — the pre-r6 minhash number was this artifact; the
honest cold path is what this harness now measures. (2) Python-scan
keys interfere: running one mapInPandas-heavy key transiently slows
the next Python-scan key ~20-40% for a run or two (reused Python
workers / async cleanup), measured r6 on the then-Python minhash →
simhash pair — the reason both LSH kernels are all-JVM since round
6b; the hazard still applies to the remaining numpy keys
(dedup_embed_cosine, emb_kmeans_assign, fingerprints). The watch-list
n=5 medians absorb both effects; cross-round comparisons should use
medians, never single runs.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# Headline set: the flagship, the heaviest relational shapes, the §2.9
# windowing identity, and the LLM-data watch-list (BASELINE.md §4).
HEADLINE = [
    "agg_hash_grouped",
    "scan_predicate_pushdown",
    "join_inner_equi",
    "join_sortmerge_large",
    "join_asof",
    "winfn_row_number_topk",
    "window_tumbling_agg",
    "window_sliding_agg",
    "window_session_agg",
    "window_large_day",
    "window_topn",
    "dedup_exact",
    "dedup_near_minhash",
    "dedup_simhash",
    "dedup_embed_cosine",
    "sim_cosine_topk",
    "sim_ann_ivf_topk",
    "text_tfidf_topterms",
    "text_fingerprint_rolling",
    "text_quality_score",
    "join_skew_salted",
    "join_bucketed_noshuffle",
    "sample_hash_bernoulli",
    "pivot_event_counts",
    "ts_resample_gapfill",
    "emb_kmeans_assign",
    "dedup_simhash_hamming",
    "dedup_cluster_cc",
    "llm_corpus_pipeline",
    "pattern_detect_cep",
    "q3_shipping_priority",
    "q5_local_supplier",
]


# Baseline-straddlers on a ±15% noise floor (VERDICT r5 item 6): a
# 3-run median cannot separate drift from noise there, so they get 5
# timed runs. dedup_simhash / dedup_near_minhash joined the list when
# their mapInPandas scans were bimodal from Python-worker churn; both
# are all-JVM since round 6b (zero Python, plan-test-pinned) but stay
# on n=5 — they are the suite's highest-stage-count keys and remain
# the most sensitive to scheduler noise on a loaded host. Everything
# else keeps n=3 — the extra runs cost ~10s total and only help where
# the ratio is ambiguous.
WATCH_LIST_RUNS = {
    "dedup_cluster_cc": 5,
    "sample_hash_bernoulli": 5,
    "dedup_simhash": 5,
    "dedup_near_minhash": 5,
}


def bench_one(spark, fn, sf_dir: str, runs: int = 3) -> dict:
    def run() -> float:
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # TWO warm-ups (round 6): one is not enough to reach steady state
    # for multi-stage plans — codegen compiles per stage as AQE reveals
    # them, and JIT tiers up across the first executions, so single-
    # warm-up medians recorded the compiler, not the query (measured:
    # dedup_embed_cosine runs [3.24, 2.49, 0.77] → median 2.49 where
    # steady state is 0.77; q5 decayed 4.45 → 1.00 the same way).
    run()
    run()
    times = [run() for _ in range(runs)]
    return {"median_s": round(statistics.median(times), 4), "runs": [round(t, 4) for t in times]}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flink_large_window_spark import api
    from flink_large_window_spark.session import get_spark

    spark = get_spark("bench")
    qs = api.queries()
    results: dict[str, dict] = {}
    for key in HEADLINE:
        results[key] = bench_one(
            spark, qs[key], sf_dir, runs=WATCH_LIST_RUNS.get(key, 3)
        )
        print(f"# {key}: {results[key]['median_s']}s", file=sys.stderr)

    total = round(sum(r["median_s"] for r in results.values()), 4)
    env = {
        "spark": spark.version,
        "cpus": os.cpu_count(),
        "master": spark.sparkContext.master,
        "sf_dir": sf_dir,
    }
    with open(os.path.join(_REPO_ROOT, "BENCH_LAST.json"), "w") as f:
        json.dump({"queries": results, "total_s": total, "env": env}, f, indent=2)

    print(
        json.dumps(
            {
                "metric": "headline_total_wall",
                "value": total,
                "unit": "sec",
                "queries": {k: v["median_s"] for k, v in results.items()},
                "sf": sf_dir,
            }
        )
    )


if __name__ == "__main__":
    main()

"""Checks for rows-only keys the driver can only count (SURVEY §5.3):
sketch accuracy vs exact, LSH recall on known duplicates, multimodal
pipeline shapes. Streaming twins are covered in test_streaming_parity,
ANN/langid/k-means/quantization in test_llm_quality.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE

SF_BENCH = "/root/testdata/sf0.1"  # the only sf with exact duplicates


def test_approx_count_distinct_accuracy(spark):
    """HLL++ at rsd=0.01 must land within 2% of exact per group."""
    import pyspark.sql.functions as F

    from flink_large_window_spark.registry import REGISTRY
    from flink_large_window_spark.tables import table

    approx = {
        r["l_returnflag"]: r["approx_orders"]
        for r in REGISTRY["agg_approx_count_distinct"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in table(spark, SF_SMOKE, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.02, f"{k}: {approx[k]} vs {n}"


def test_approx_percentile_accuracy(spark):
    """Sketch percentiles at accuracy 10000 must sit within 0.5% of the
    exact percentile values per group."""
    import pyspark.sql.functions as F

    from flink_large_window_spark.registry import REGISTRY
    from flink_large_window_spark.tables import table

    approx = {
        r["o_orderstatus"]: (r["p50_approx"], r["p90_approx"])
        for r in REGISTRY["agg_approx_percentile"](spark, SF_SMOKE).collect()
    }
    exact = {
        r["o_orderstatus"]: (r["p50"], r["p90"])
        for r in table(spark, SF_SMOKE, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        )
        .collect()
    }
    for k, (e50, e90) in exact.items():
        a50, a90 = approx[k]
        assert abs(a50 - e50) / e50 < 0.005
        assert abs(a90 - e90) / e90 < 0.005


def test_minhash_finds_exact_duplicates(spark):
    """sf0.1 contains 8 exact-duplicate text pairs; identical texts
    have identical shingle sets → identical signatures → every band
    collides → MinHash-LSH MUST report them as near-dups (Jaccard 1.0
    clears any threshold). This pins end-to-end recall of the LSH
    pipeline on ground-truth positives."""
    import pyspark.sql.functions as F

    from flink_large_window_spark.registry import REGISTRY
    from flink_large_window_spark.tables import table

    dup_ids = {
        r["doc_id"]
        for r in (
            table(spark, SF_BENCH, "documents")
            .groupBy(F.lower(F.trim(F.col("text"))).alias("norm"))
            .agg(F.collect_list("doc_id").alias("ids"), F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .select(F.explode("ids").alias("doc_id"))
        ).collect()
    }
    assert dup_ids, "fixture lost its duplicates?"
    flagged = {
        r["doc_id"]
        for r in REGISTRY["dedup_near_minhash"](spark, SF_BENCH)
        .filter(F.col("n_dups_080") > 0)
        .collect()
    }
    missed = dup_ids - flagged
    assert not missed, f"LSH missed exact duplicates: {sorted(missed)}"


def test_multimodal_pipelines_shapes(spark):
    """Blob feature extraction and frame sampling must emit their
    declared schemas with plausible values (stubbed codecs, real
    Spark plumbing)."""
    from flink_large_window_spark.registry import REGISTRY

    feats = REGISTRY["multimodal_blob_features"](spark, SF_SMOKE)
    rows = feats.collect()
    assert rows and {"doc_id"} <= set(feats.columns)
    frames = REGISTRY["multimodal_frame_sample"](spark, SF_SMOKE)
    frows = frames.collect()
    assert frows, "frame sampler emitted nothing"

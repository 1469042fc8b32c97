"""Corpus-curation operators for LLM training-data pipelines
(SURVEY.md §2.10 extension, round 2): benchmark-contamination checks,
language-mix rebalancing, context-window sequence packing, and
mergeable-sketch cardinality — the operations a 100 TB pretraining
pipeline runs after dedup/quality and before tokenization.

Scale notes per operator in the docstrings; the shared principles:
- the corpus side is never collected or single-partition-windowed;
- small derived tables (benchmark n-grams, per-language rates,
  per-bucket offsets) are the broadcast side of every join;
- all sampling/membership is deterministic key-hash (identical rows at
  any scale, partitioning, or retry — seeded `sample()` is not).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import query
from ..tables import prep, table

# Knuth multiplicative mixer with the 31-bit-prime pre-reduction that
# keeps products < 2^63 under ANSI mode at any id magnitude
# (sampling.py's guard, ADVICE r1).
_MIX = 2654435761
_P31 = 2147483647


@query(
    "corpus_contamination_check",
    oracle="""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS ts FROM documents
    ), grams AS (
      SELECT doc_id,
             array_to_string(ts[CAST(i AS INTEGER):CAST(i AS INTEGER) + 4], ' ') AS gram
      FROM toks, UNNEST(generate_series(1, len(ts) - 4)) AS u(i)
    ), bench_grams AS (
      SELECT DISTINCT gram FROM grams WHERE doc_id % 97 = 3
    ), candidates AS (
      SELECT DISTINCT doc_id FROM grams WHERE doc_id % 97 <> 3
    ), contaminated AS (
      SELECT DISTINCT g.doc_id
      FROM grams g JOIN bench_grams b USING (gram)
      WHERE g.doc_id % 97 <> 3
    )
    SELECT (SELECT COUNT(*) FROM (SELECT DISTINCT doc_id FROM grams WHERE doc_id % 97 = 3))
             AS n_benchmark,
           (SELECT COUNT(*) FROM candidates)   AS n_candidates,
           (SELECT COUNT(*) FROM contaminated) AS n_contaminated
    """,
)
def corpus_contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: count training docs that share any
    5-gram with a held-out benchmark slice (docs with doc_id % 97 == 3
    stand in for the eval set).

    The canonical pre-training hygiene step (published as the "13-gram
    overlap" check in the GPT-3 and PaLM papers; 5-gram here because
    fixture docs are short). Dataflow: benchmark docs → distinct
    n-grams (tiny: eval sets are MBs against a 100 TB corpus) →
    broadcast left-semi join against the corpus n-gram stream →
    distinct contaminated doc_ids. The corpus side is explode →
    distinct — linear, two-phase aggregated; no corpus-vs-corpus
    self-join ever happens. At 100 TB hash each gram to int64
    (xxhash64) so the broadcast set and the shuffle rows carry 8 bytes,
    not strings; string grams kept here for oracle parity.
    """
    prep(spark)
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.lower("text"), " ").alias("ts")
    )
    grams = toks.select(
        "doc_id",
        # Guard short docs explicitly: sequence(1, n) DESCENDS when n < 1
        # (yielding [1, 0] and a slice(ts, 0, 5) runtime error), so docs
        # under 5 tokens must short-circuit to an empty gram list — which
        # is also what the oracle's generate_series(1, len-4) emits.
        F.explode(
            F.expr(
                "CASE WHEN size(ts) >= 5 THEN"
                " transform(sequence(1, size(ts) - 4),"
                " i -> concat_ws(' ', slice(ts, i, 5)))"
                " ELSE array() END"
            )
        ).alias("gram"),
    )
    is_bench = F.col("doc_id") % 97 == 3
    bench_grams = grams.filter(is_bench).select("gram").distinct()
    corpus_grams = grams.filter(~is_bench)
    contaminated = (
        corpus_grams.join(F.broadcast(bench_grams), "gram", "left_semi")
        .select("doc_id")
        .distinct()
    )
    # All three scalar counts stay in ONE plan (crossJoins of 1-row
    # aggregates — no driver-side .count() action, VERDICT r1 item 7).
    bench_docs = grams.filter(is_bench).select("doc_id").distinct()
    return (
        bench_docs.agg(F.count(F.lit(1)).alias("n_benchmark"))
        .crossJoin(
            corpus_grams.select("doc_id")
            .distinct()
            .agg(F.count(F.lit(1)).alias("n_candidates"))
        )
        .crossJoin(contaminated.agg(F.count(F.lit(1)).alias("n_contaminated")))
    )


@query(
    "corpus_mix_rebalance",
    oracle=f"""
    WITH counts AS (
      SELECT lang, COUNT(*) AS n_orig FROM documents GROUP BY lang
    ), rates AS (
      SELECT lang, n_orig,
             CAST(FLOOR(10000.0 * (MIN(n_orig) OVER ()) / n_orig) AS BIGINT) AS rate_bp
      FROM counts
    )
    SELECT d.lang, r.n_orig, r.rate_bp,
           COUNT(*) FILTER (
             WHERE ((d.doc_id % {_P31}) * {_MIX}) % 10000 < r.rate_bp
           ) AS n_kept
    FROM documents d JOIN rates r USING (lang)
    GROUP BY d.lang, r.n_orig, r.rate_bp
    """,
)
def corpus_mix_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-mix rebalancing: downsample every language to (about)
    the size of the smallest one, with per-language rates DERIVED
    IN-PLAN from the observed distribution — the training-mix step that
    turns a crawl's natural skew into a target mixture.

    Rate = floor(10000 · min_lang_count / lang_count) basis points,
    membership = key-hash mod 10000 < rate — integer end-to-end, so
    both engines agree exactly (a double rate compared against a double
    hash would be a cross-engine rounding hazard). The per-language
    rate table is a handful of rows: the window-over-all-languages and
    the join back to the corpus are broadcast-cheap at any scale, and
    the corpus itself is scanned once with no shuffle (membership is
    row-local).
    """
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_orig"))
    rates = counts.select(
        "lang",
        "n_orig",
        F.floor(
            10000.0 * F.min("n_orig").over(Window.partitionBy()) / F.col("n_orig")
        ).alias("rate_bp"),
    )
    kept_flag = ((F.col("doc_id") % _P31) * _MIX) % 10000 < F.col("rate_bp")
    return (
        docs.join(F.broadcast(rates), "lang")
        .groupBy("lang", "n_orig", "rate_bp")
        .agg(F.sum(F.when(kept_flag, 1).otherwise(0)).alias("n_kept"))
    )


_PACK_BUDGET = 2048
_PACK_BUCKET = 256  # docs per prefix-sum bucket (see docstring)


@query(
    "corpus_pack_chunks",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, len(string_split(text, ' ')) AS n_tokens FROM documents
    ), cum AS (
      SELECT doc_id, n_tokens,
             SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
      FROM docs
    )
    SELECT CAST(FLOOR((cum_tokens - n_tokens) / {_PACK_BUDGET}.0) AS BIGINT) AS pack_id,
           COUNT(*)                      AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id)     AS first_doc,
           MAX(doc_id)     AS last_doc
    FROM cum
    GROUP BY 1
    """,
)
def corpus_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sequence packing: lay the corpus out in doc_id
    order, take the running token offset, and cut packs every
    {budget} tokens (docs may straddle a boundary — the standard
    pretraining concat-and-chunk layout). Output: per-pack doc count,
    token total, and doc_id range.

    The naive formulation is a GLOBAL running sum — a single-partition
    window that serializes the whole corpus through one task. This
    implementation is the scalable two-level prefix sum instead:
    (1) bucket docs by floor(doc_id / {bucket}); (2) per-bucket token
    totals (tiny table, one row per {bucket} docs) get their exclusive
    prefix offsets via a window over that TINY table only; (3) offsets
    broadcast-join back and a window PARTITIONED BY bucket — fully
    parallel — adds the local running sum. At 100 TB the bucket table
    is ~1/{bucket} of the doc count; recurse the same trick once more
    if even that overflows a task. The oracle is the naive global
    window — results are provably identical.
    """
    prep(spark)
    docs = table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_tokens"),
        F.floor(F.col("doc_id") / _PACK_BUCKET).alias("bucket"),
    )
    bucket_totals = docs.groupBy("bucket").agg(F.sum("n_tokens").alias("bucket_tokens"))
    # Exclusive prefix over the bucket table only (rows = n_docs/256).
    w_b = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bucket_totals.select(
        "bucket", F.coalesce(F.sum("bucket_tokens").over(w_b), F.lit(0)).alias("offset")
    )
    w_local = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = docs.join(F.broadcast(offsets), "bucket").select(
        "doc_id",
        "n_tokens",
        (F.col("offset") + F.sum("n_tokens").over(w_local)).alias("cum_tokens"),
    )
    return (
        cum.select(
            "doc_id",
            "n_tokens",
            F.floor((F.col("cum_tokens") - F.col("n_tokens")) / float(_PACK_BUDGET))
            .cast("long")
            .alias("pack_id"),
        )
        .groupBy("pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


corpus_pack_chunks.__doc__ = corpus_pack_chunks.__doc__.replace(
    "{budget}", str(_PACK_BUDGET)
).replace("{bucket}", str(_PACK_BUCKET))


@query("agg_hll_sketch_merge")  # rows-only: sketch estimates have no exact oracle;
# tests/test_llm_quality.py pins estimate-vs-exact relative error ≤ 5 %.
def agg_hll_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable-sketch distinct counting: per-day HLL sketches of
    user_id per event_type, merged across days with ``hll_union_agg``
    into one estimate per type — the partial/final pattern that makes
    COUNT DISTINCT re-aggregable (day → week → month rollups reuse the
    same day sketches instead of rescanning raw events).

    This is the 100 TB answer to `agg_count_distinct`'s full shuffle:
    sketches are fixed-size (lgConfigK=12 → 4 KB), so the merge tree
    moves KBs per group regardless of corpus size, and pre-aggregated
    day sketches can be persisted and re-merged for any window without
    touching raw data (Flink's incremental-window-aggregation story,
    datasketches' published HLL merge semantics).
    """
    prep(spark)
    daily = (
        table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.hll_sketch_agg("user_id", F.lit(12)).alias("sketch"))
    )
    return (
        daily.groupBy("event_type")
        .agg(
            F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est_users"),
            F.count(F.lit(1)).alias("n_day_sketches"),
        )
        .orderBy("event_type")
    )

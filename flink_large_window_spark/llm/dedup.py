"""Deduplication operators (SURVEY.md §2.10).

Scale notes (100 TB): exact dedup is a hash-groupBy on the normalized
text (shuffle keyed by a 256-bit digest at scale, never the raw text);
near-dup is MinHash-LSH — shingle → 64 permuted min-hashes → 8 bands
of 8 → bucket-join, so candidate generation is linear in corpus size
instead of the O(n²) pairwise Jaccard that only works on fixtures.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import prep, table

N_HASHES = 64
N_BANDS = 8  # 8 rows per band → LSH threshold ≈ (1/8)^(1/8) ≈ 0.77
# 2^31−1: universal-hash modulus small enough that (h mod p)·a + b stays
# far below 2^63 (Spark 4 runs ANSI mode — silent wraparound is an error).
MERSENNE = (1 << 31) - 1


@query(
    "dedup_exact",
    oracle="""
    SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY lower(trim(text))
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on normalized text, keeping the smallest doc_id.

    Grouping on the normalized text itself (not a hash) so the oracle
    is engine-agnostic (SURVEY §2.10: hash functions differ across
    engines). At 100 TB the group key becomes sha2(normalized) to keep
    shuffle rows narrow — same semantics, collision-negligible.
    """
    prep(spark)
    return (
        table(spark, sf_dir, "documents")
        .groupBy(F.lower(F.trim(F.col("text"))).alias("norm"))
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .select("keep_id", "n_copies")
    )


@query("dedup_near_minhash")  # rows-only: algorithmic choice not SQL-canonical
def dedup_near_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate detection via MinHash-LSH over token 3-shingles.

    Pipeline (all JVM-side expressions, no Python):
      tokens → 3-shingles → base hash xxhash64 → 64 universal-hash
      permutations h_i(x) = (a_i·x + b_i) mod 2^31−1 → per-doc min per
      permutation (the MinHash signature) → 8 bands × 8 rows → band
      hash → self-join on (band, band_hash) → candidate pairs →
      verified Jaccard over exact shingle sets.

    Output: per-doc near-dup summary (doc_id, n_candidates,
    n_dups_080) — per-doc rows so the result is non-empty even when
    the corpus has no near-dups at a given scale.
    """
    prep(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    shingles = docs.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.transform(
                    F.filter(
                        F.sequence(
                            F.lit(0), F.size(F.split("text", " ")) - 3
                        ),
                        lambda i: i >= 0,
                    ),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.split("text", " "), i + 1, 3)
                    ),
                )
            )
        ).alias("shingle"),
    ).withColumn("h", F.abs(F.xxhash64("shingle")))
    # The shingle table feeds three consumers (signatures, both sides of
    # the LSH self-join via `banded`, and Jaccard verification) — persist
    # so the explode+hash pipeline runs once, not three times. At 100 TB
    # this becomes a checkpoint to durable storage, same dataflow.
    shingles = shingles.persist()

    # 64 deterministic (a, b) pairs for h_i(x) = (a·x + b) mod p.
    perms = [(2 * i + 1, 7919 * (i + 1)) for i in range(N_HASHES)]
    minhash_cols = [
        F.min((F.col("h") % MERSENNE * a + b) % MERSENNE).alias(f"m{i}")
        for i, (a, b) in enumerate(perms)
    ]
    sigs = shingles.groupBy("doc_id").agg(*minhash_cols)

    # Band the signature: hash 8 consecutive minhashes per band.
    rows_per_band = N_HASHES // N_BANDS
    band_exprs = []
    for band in range(N_BANDS):
        cols = [f"m{band * rows_per_band + j}" for j in range(rows_per_band)]
        band_exprs.append(
            F.struct(
                F.lit(band).alias("band"), F.xxhash64(*cols).alias("bh")
            )
        )
    banded = sigs.select(
        "doc_id", F.explode(F.array(*band_exprs)).alias("b")
    ).select("doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh")).persist()

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bh") == F.col("r.bh"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .distinct()
    )

    # Verify candidates with exact Jaccard over shingle-hash sets.
    sets_ = shingles.groupBy("doc_id").agg(F.collect_set("h").alias("hs"))
    verified = (
        candidates.join(sets_.withColumnRenamed("doc_id", "a").withColumnRenamed("hs", "ha"), "a")
        .join(sets_.withColumnRenamed("doc_id", "b").withColumnRenamed("hs", "hb"), "b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("ha", "hb"))
            / F.size(F.array_union("ha", "hb")),
        )
        .select("a", "b", "jaccard")
    )

    per_doc = (
        verified.select(F.col("a").alias("doc_id"), "jaccard")
        .unionByName(verified.select(F.col("b").alias("doc_id"), "jaccard"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(F.when(F.col("jaccard") >= 0.8, 1).otherwise(0)).alias("n_dups_080"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_candidates", F.lit(0)).alias("n_candidates"),
            F.coalesce("n_dups_080", F.lit(0)).cast("long").alias("n_dups_080"),
        )
    )

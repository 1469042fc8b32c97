"""Deduplication operators (SURVEY.md §2.10).

Scale notes (100 TB): exact dedup is a hash-groupBy on the normalized
text (shuffle keyed by a 256-bit digest at scale, never the raw text);
near-dup is MinHash-LSH — shingle → 64 permuted min-hashes → 8 bands
of 8 → bucket-join, so candidate generation is linear in corpus size
instead of the O(n²) pairwise Jaccard that only works on fixtures.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

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

    Pipeline: one Arrow-batched `mapInPandas` scan emits, per document,
    its distinct shingle-hash set, the 64-permutation MinHash signature
    h_i(x) = (a_i·x + b_i) mod 2^31−1, and 8 LSH band keys — all
    row-local, so signature generation needs ZERO shuffle (an earlier
    all-expression version exploded shingles and ran a 64-way min
    aggregate: one wide shuffle of every shingle row, measured 3.1×
    slower at sf0.1, 2.2s vs 0.7s). The only shuffles left are the
    band-bucket self-join (8 rows/doc, not |shingles| rows/doc) and the
    candidate verification — verified Jaccard over the exact shingle
    sets carried from the same scan. Base hash is md5-derived (portable,
    process-stable); swap in a faster 64-bit hash at deployment scale.

    Output: per-doc near-dup summary (doc_id, n_candidates,
    n_dups_080) — per-doc rows so the result is non-empty even when
    the corpus has no near-dups at a given scale.
    """
    prep(spark)
    import numpy as np

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    coef_a = np.array([2 * i + 1 for i in range(N_HASHES)], dtype=np.int64)
    coef_b = np.array([7919 * (i + 1) for i in range(N_HASHES)], dtype=np.int64)

    def sig(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            ids, hss, bandss = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = text.split(" ")
                sh = {
                    " ".join(toks[i : i + 3])
                    for i in range(max(len(toks) - 2, 0))
                } or {text}
                # 63-bit positive base hash per distinct shingle.
                h = np.fromiter(
                    (
                        int.from_bytes(
                            hashlib.md5(s.encode()).digest()[:8], "big"
                        )
                        >> 1
                        for s in sh
                    ),
                    dtype=np.int64,
                    count=len(sh),
                )
                mins = (((h[:, None] % MERSENNE) * coef_a + coef_b) % MERSENNE).min(
                    axis=0
                )
                bands = [
                    int(
                        np.bitwise_xor.reduce(
                            mins[b * 8 : (b + 1) * 8] * np.int64(0x9E3779B1)
                        )
                    )
                    for b in range(N_BANDS)
                ]
                ids.append(doc_id)
                hss.append(h.tolist())
                bandss.append(bands)
            yield pd.DataFrame({"doc_id": ids, "hs": hss, "bands": bandss})

    # Feeds both the LSH join (via `banded`) and Jaccard verification —
    # persist so the Python scan runs once. At 100 TB this becomes a
    # checkpoint to durable storage, same dataflow.
    base = docs.mapInPandas(
        sig, schema="doc_id long, hs array<long>, bands array<long>"
    ).persist()

    banded = base.select(
        "doc_id", F.posexplode("bands").alias("band", "bh")
    ).persist()
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
    sets_ = base.select("doc_id", F.col("hs"))
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


# Portable 32-bit-ish token hash both engines can compute identically:
# h(token) = Σ_{j < min(len,8)} ascii(char_j) · 131^j  (fits in int64).
_POW131 = [131**j for j in range(8)]


# Shared by the dedup_simhash oracle and, as a CTE, by the
# dedup_simhash_hamming oracle.
_SIMHASH_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM (
        SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS token
        FROM documents
      ) GROUP BY doc_id, token
    ), hashed AS (
      SELECT doc_id, tf,
             CAST(list_sum(list_transform(
               generate_series(1, least(length(token), 8)),
               i -> ascii(substr(token, CAST(i AS INTEGER), 1))
                    * {"[" + ", ".join(f"CAST({p} AS BIGINT)" for p in _POW131) + "]"}[CAST(i AS INTEGER)]
             )) AS BIGINT) AS h
      FROM tok
    ), bits AS (
      SELECT doc_id, CAST(b.b AS INTEGER) AS bit,
             SUM(CASE WHEN (h // (CAST(1 AS BIGINT) << CAST(b.b AS INTEGER))) % 2 = 1
                      THEN tf ELSE -tf END) AS w
      FROM hashed, (SELECT UNNEST(generate_series(0, 31)) AS b) b
      GROUP BY doc_id, b.b
    )
    SELECT doc_id,
           CAST(SUM(CASE WHEN w > 0
                    THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
    FROM bits GROUP BY doc_id
    """


@query("dedup_simhash", oracle=_SIMHASH_ORACLE)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash per document with a full SQL oracle.

    Classic Charikar scheme: each distinct token contributes ±tf to
    each bit position according to its hash's bit, and the signature
    takes the sign. The token hash is a char-polynomial (Σ ascii·131^j,
    first 8 chars) — deliberately portable integer arithmetic so BOTH
    engines derive bit-identical signatures (xxhash64 has no DuckDB
    equivalent). Near-dup candidates then come from hamming-band
    bucketing over these signatures — the banding machinery is shared
    with dedup_near_minhash.

    The whole signature is row-local, so it is computed in one
    Arrow-batched `mapInPandas` scan with zero shuffle — int64 numpy
    arithmetic identical to the oracle (fixture text is pure ASCII, so
    byte == ascii(); max h ≈ 1.7e17 < 2^63, exact). The earlier
    all-expression form exploded 32 bit-rows per (doc, token) through
    two grouped aggregates — one shuffle of 32×|tokens| rows — and
    measured 1.7× slower at sf0.1 (1.03s vs 0.59s); per-token numpy
    calls instead of batch-flattened vectorization were slower still.
    """
    prep(spark)
    import numpy as np

    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    pow131 = np.array(_POW131, dtype=np.int64)
    bit_ids = np.arange(32, dtype=np.int64)

    def sig(batches):
        from collections import Counter

        import pandas as pd

        for pdf in batches:
            # Flatten the batch to one (doc_idx, token, tf) stream, then
            # vectorize over ALL tokens at once: pad each token to 8
            # NUL bytes (NUL contributes 0·131^j — a no-op, matching the
            # oracle's least(len, 8) bound), one matmul for every hash,
            # one segment-sum for every document's bit weights.
            doc_idx, tfs, buf = [], [], []
            for i, text in enumerate(pdf["text"]):
                for t, n in Counter(text.lower().split(" ")).items():
                    doc_idx.append(i)
                    tfs.append(n)
                    buf.append(t[:8].encode("ascii").ljust(8, b"\0"))
            n_docs = len(pdf)
            if not buf:
                yield pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "simhash": np.zeros(n_docs, np.int64)}
                )
                continue
            codes = np.frombuffer(b"".join(buf), dtype=np.uint8).reshape(-1, 8)
            h = codes.astype(np.int64) @ pow131
            signs = ((h[:, None] >> bit_ids) & 1) * 2 - 1  # ±1 per bit
            weighted = signs * np.asarray(tfs, dtype=np.int64)[:, None]
            acc = np.zeros((n_docs, 32), dtype=np.int64)
            np.add.at(acc, np.asarray(doc_idx), weighted)
            sigs = ((acc > 0).astype(np.int64) << bit_ids).sum(axis=1)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": sigs})

    return docs.mapInPandas(sig, schema="doc_id long, simhash long")


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               generate_series(1, greatest(len(string_split(lower(text), ' ')) - 2, 1)),
               i -> string_split(lower(text), ' ')[CAST(i AS INTEGER)] || ' ' ||
                    string_split(lower(text), ' ')[CAST(i AS INTEGER) + 1] || ' ' ||
                    string_split(lower(text), ' ')[CAST(i AS INTEGER) + 2]
             )) AS grams
      FROM documents WHERE doc_id < 200
    )
    SELECT a.doc_id AS doc_a,
           COUNT(CASE WHEN
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.5
             THEN 1 END) AS n_similar_05
    FROM sh a JOIN sh b ON a.doc_id <> b.doc_id
    GROUP BY a.doc_id
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact pairwise 3-gram Jaccard similarity counts (threshold 0.5)
    over a bounded slice (doc_id < 200 — pairwise is quadratic and only
    legal on a bounded set; the linear-scale path is dedup_near_minhash,
    whose LSH buckets reduce to exactly this verification)."""
    prep(spark)
    toks = F.split(F.lower("text"), " ")
    grams = F.array_distinct(
        F.zip_with(
            F.slice(toks, 1, F.greatest(F.size(toks) - 2, F.lit(1))),
            F.zip_with(
                F.slice(toks, 2, F.greatest(F.size(toks) - 2, F.lit(1))),
                F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(1))),
                lambda b, c: F.concat_ws(" ", b, c),
            ),
            lambda a, bc: F.concat_ws(" ", a, bc),
        )
    )
    sh = (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 200)
        .select("doc_id", grams.alias("grams"))
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"))
    pairs = a.join(F.broadcast(b), F.col("doc_a") != F.col("doc_b"))
    jac = F.size(F.array_intersect("ga", "gb")).cast("double") / F.size(
        F.array_union("ga", "gb")
    )
    return pairs.groupBy("doc_a").agg(
        F.count(F.when(jac >= 0.5, 1)).alias("n_similar_05")
    )


@query(
    "dedup_embed_cosine",
    oracle="""
    SELECT a.vec_id AS doc_id,
           COUNT(CASE WHEN list_cosine_similarity(a.embedding, b.embedding) >= 0.9
                 THEN 1 END) AS n_neardup_09
    FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id
    GROUP BY a.vec_id
    """,
)
def dedup_embed_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate counts (threshold 0.9) per
    vector, as a blocked matrix product.

    A pairwise join with per-element array folds measured 21s at sf0.1;
    the same computation as Arrow-batched numpy GEMM (each partition's
    rows × the broadcast normalized corpus matrix) runs in well under a
    second and is exactly how a 100 TB deployment scores pairs inside
    an IVF cell (sim_ann_ivf_topk provides the cells). Self-pairs are
    excluded arithmetically (cos(self)=1 always clears the threshold).
    """
    prep(spark)
    import numpy as np

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    rows = emb.collect()  # the broadcast side: the (small) corpus matrix
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    bmat = spark.sparkContext.broadcast(mat)

    def score(batches):
        import pandas as pd

        m = bmat.value
        for pdf in batches:
            a = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            a /= np.linalg.norm(a, axis=1, keepdims=True)
            n_near = (a @ m.T >= 0.9).sum(axis=1) - 1  # minus self
            yield pd.DataFrame(
                {"doc_id": pdf["vec_id"], "n_neardup_09": n_near.astype("int64")}
            )

    return emb.mapInPandas(score, schema="doc_id long, n_neardup_09 long")


@query(
    "dedup_cluster_cc",
    oracle="""
    SELECT doc_id,
           MIN(doc_id)  OVER (PARTITION BY lang, source) AS cluster_rep,
           COUNT(*)     OVER (PARTITION BY lang, source) AS cluster_size
    FROM documents
    """,
)
def dedup_cluster_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over a duplicate-candidate graph by
    iterative min-label propagation — the step that turns pairwise
    near-dup hits into dedup groups (keep one doc per component).

    The candidate graph here is chain edges linking consecutive doc_ids
    within each (lang, source) bucket. Because those edges come from an
    equivalence relation, the true components are exactly the buckets —
    which is what makes an exact SQL oracle possible for an iterative
    algorithm: the propagation must converge to MIN(doc_id) per bucket,
    along paths up to ~bucket-size long, or the hash check fails.

    Each iteration: (1) every node takes the min label over itself and
    its neighbors, (2) labels are path-compressed (label := label of
    label) so convergence is O(log path) not O(path), (3) lineage is
    truncated with localCheckpoint — without it the self-joined plan
    doubles every round, which is the classic iterative-Spark trap (on
    a cluster use checkpoint() to durable storage instead). Driver
    polls a changed-count each round: that is a scalar aggregate, not a
    collect of data.
    """
    prep(spark)
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    w = Window.partitionBy("lang", "source").orderBy("doc_id")
    chain = (
        docs.withColumn("prev", F.lag("doc_id").over(w))
        .filter(F.col("prev").isNotNull())
        .select(F.col("doc_id").alias("src"), F.col("prev").alias("dst"))
    )
    edges = chain.unionByName(
        chain.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).localCheckpoint()

    labels = docs.select("doc_id", F.col("doc_id").alias("label")).localCheckpoint()
    for _ in range(32):  # bound >> log2(max component size)
        nbr_min = (
            edges.join(labels, edges["src"] == labels["doc_id"])
            .select(F.col("dst").alias("doc_id"), "label")
        )
        gathered = (
            labels.unionByName(nbr_min)
            .groupBy("doc_id")
            .agg(F.min("label").alias("label"))
        )
        lookup = gathered.select(
            F.col("doc_id").alias("label"), F.col("label").alias("label2")
        )
        compressed = (
            gathered.join(lookup, "label")
            .select("doc_id", F.col("label2").alias("label"))
            .localCheckpoint()
        )
        changed = (
            compressed.alias("n")
            .join(labels.alias("o"), "doc_id")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = compressed
        if changed == 0:
            break
    else:
        raise AssertionError("label propagation did not converge in 32 rounds")

    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "label").select(
        "doc_id",
        F.col("label").alias("cluster_rep"),
        "cluster_size",
    )


@query(
    "dedup_simhash_hamming",
    oracle=f"""
    WITH sig AS ({_SIMHASH_ORACLE})
    SELECT d.doc_id, COUNT(b.doc_id) AS n_hamming3
    FROM sig d LEFT JOIN sig b
      ON d.doc_id <> b.doc_id
     AND bit_count(xor(d.simhash, b.simhash)) <= 3
    GROUP BY d.doc_id
    """,
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup neighbor counts by SimHash hamming distance ≤ 3,
    found with band bucketing instead of the oracle's O(n²) pairwise
    scan.

    Pigeonhole: a 32-bit signature split into 4 byte-bands can differ
    in ≤3 bits only if at least one band is bit-identical — so joining
    on (band, band_value) buckets generates a candidate superset, and
    the exact `bit_count(xor) ≤ 3` filter on candidates returns
    EXACTLY the pairwise answer (which is why an exact SQL oracle is
    possible for the linear-time algorithm). At 100 TB candidates per
    band bucket stay small because equal whole bytes of a 32-bit
    fingerprint are selective; the pairwise formulation the oracle
    uses would be quadratic and is only viable at fixture scale.
    """
    prep(spark)
    sigs = dedup_simhash(spark, sf_dir).persist()
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright("simhash", 8 * b)
                        .bitwiseAND(F.lit(255))
                        .alias("val"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "simhash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    l, r = bands.alias("l"), bands.alias("r")
    cand = (
        l.join(
            r,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(
            F.col("l.doc_id").alias("a"),
            F.col("r.doc_id").alias("b"),
            F.col("l.simhash").alias("sa"),
            F.col("r.simhash").alias("sb"),
        )
        .distinct()
        .filter(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 3)
    )
    hits = cand.select(F.col("a").alias("doc_id")).unionByName(
        cand.select(F.col("b").alias("doc_id"))
    )
    counts = hits.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_hamming3"))
    return (
        sigs.select("doc_id")
        .join(counts, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hamming3", F.lit(0)).cast("long").alias("n_hamming3"),
        )
    )

"""Text analysis operators (SURVEY.md §2.10).

Tokenizer contract (pinned for oracle parity, SURVEY §7 M4): lower,
split on a single space, no empty-token filtering (fixture text is
single-space separated lowercase tokens).

Scale notes: everything is explode → groupBy — linear, two-phase
aggregated, no Python. tf-idf is two aggregations + a broadcast join of
the (tiny) df table; at 100 TB the df table is still only vocabulary-
sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession, Window

from ..registry import query
from ..tables import (
    prep,
    row_count,
    spread_small_corpus,
    table,
    table_sql_ref,
)


def _tokens(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "lang", F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "token")
    )


@query(
    "text_tokenize_wordcount",
    oracle="""
    SELECT token, COUNT(*) AS n FROM (
      SELECT UNNEST(string_split(lower(text), ' ')) AS token FROM documents
    ) GROUP BY token
    ORDER BY COUNT(*) DESC, token ASC
    LIMIT 20
    """,
)
def text_tokenize_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-20 tokens (count desc, token asc)."""
    prep(spark)
    return (
        _tokens(table(spark, sf_dir, "documents"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "text_ngrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id, lang, string_split(lower(text), ' ') AS ts FROM documents
    ), bigrams AS (
      SELECT lang, ts[CAST(i AS INTEGER)] || ' ' || ts[CAST(i AS INTEGER) + 1] AS bigram
      FROM toks, UNNEST(generate_series(1, len(ts) - 1)) AS u(i)
    )
    SELECT lang, bigram, n, rnk FROM (
      SELECT lang, bigram, COUNT(*) AS n,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY lang ORDER BY COUNT(*) DESC, bigram ASC
             ) AS INTEGER) AS rnk
      FROM bigrams GROUP BY lang, bigram
    ) WHERE rnk <= 3
    """,
)
def text_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 bigrams per language (adjacent-token pairs within a doc)."""
    prep(spark)
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.split(F.lower("text"), " ").alias("ts")
    )
    bigrams = toks.select(
        "lang",
        F.explode(
            F.zip_with(
                F.slice("ts", 1, F.size("ts") - 1),
                F.slice("ts", 2, F.size("ts") - 1),
                lambda a, b: F.concat_ws(" ", a, b),
            )
        ).alias("bigram"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("bigram").asc())
    return (
        bigrams.groupBy("lang", "bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "text_tfidf_topterms",
    oracle="""
    WITH toks AS (
      SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY doc_id, term
    ), df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY term
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0) AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
      WHERE tf.doc_id < 20
    )
    SELECT doc_id, term, rnk FROM (
      SELECT doc_id, term,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY score DESC, term ASC
             ) AS INTEGER) AS rnk
      FROM scored
    ) WHERE rnk <= 3
    """,
)
def text_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """tf-idf top-3 terms per document (first 20 docs), smooth idf
    ln((N+1)/(df+1))+1 pinned identically in both engines; integer-only
    output per the float-hash rule (ranks, not scores).

    ONE full corpus scan (r5). The r4 plan scanned `documents` three
    times — once each for tf, df and N (flagged by the round-4 review;
    1.83× the bench baseline). Now everything derives from the single
    tokenize→(doc_id, term) aggregate: `df` is a per-term count over
    `tf` (tf rows are already distinct (doc_id, term) pairs, so a plain
    count IS the document frequency — no second countDistinct pass),
    and N comes from parquet footer metadata (`row_count`, the
    catalog-stats path — exact COUNT(*), zero jobs). The remaining
    tf-side scan is row-group-pruned by the doc_id < 20 pushdown, so
    the only full pass over the corpus is the one that tokenizes it.

    Single ``spark.sql`` statement since optimization r16 (SCALING.md
    §12 build-cost remedy, VERDICT r15 items 5/6): the chained build
    cost 87–88 ms of driver time per call — ~19% of fixture-scale
    wall and core-count-independent (part of this key's 8-core-beats-
    32 reading) — for the identical plan. The ``D``-suffixed idf
    literals keep the smooth-idf arithmetic DOUBLE; rows and dtypes
    verified equal, hash-equal at all three SFs. Interleaved A/B:
    0.496/0.452 → 0.432/0.431 s medians, build 87 → 37 ms.
    """
    prep(spark)
    d = table_sql_ref(spark, sf_dir, "documents")
    # Footer/catalog stats, not a scan. Every fixture doc has non-null
    # text, so COUNT(*) == the tokenized doc count the idf needs.
    n_docs = row_count(sf_dir, "documents")
    return spark.sql(
        f"""
        WITH toks AS (
          SELECT doc_id, term
          FROM {d} LATERAL VIEW explode(split(lower(text), ' ')) t AS term
        ),
        tf AS (
          SELECT doc_id, term, COUNT(1) AS tf FROM toks GROUP BY doc_id, term
        ),
        df AS (
          SELECT term, COUNT(1) AS df FROM tf GROUP BY term
        ),
        scored AS (
          SELECT /*+ BROADCAST(df) */ tf.doc_id, tf.term,
                 tf.tf * (LN(({n_docs} + 1.0D) / (df.df + 1.0D)) + 1.0D)
                   AS score
          FROM tf JOIN df USING (term)
          WHERE tf.doc_id < 20
        )
        SELECT doc_id, term, rnk FROM (
          SELECT doc_id, term,
                 ROW_NUMBER() OVER (
                   PARTITION BY doc_id ORDER BY score DESC, term ASC
                 ) AS rnk
          FROM scored
        ) WHERE rnk <= 3
        """
    )


@query(
    "text_lang_stats",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(n_chars), 6) AS avg_chars,
           ROUND(AVG(CAST(len(string_split(text, ' ')) AS DOUBLE)), 6) AS avg_tokens
    FROM documents GROUP BY lang
    """,
)
def text_lang_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language corpus statistics (doc count, avg chars, avg tokens)
    — the quality/language-ID summary shape of a data pipeline."""
    prep(spark)
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 6).alias("avg_chars"),
            F.round(F.avg(F.size(F.split("text", " ")).cast("double")), 6).alias(
                "avg_tokens"
            ),
        )
    )


@query(
    "text_quality_score",
    oracle="""
    WITH feat AS (
      SELECT doc_id,
             CAST(length(text) AS DOUBLE) AS len,
             CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok,
             CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
               AS n_punct,
             CAST(len(list_filter(string_split(lower(text), ' '),
                  t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))
               AS DOUBLE) AS n_stop
      FROM documents
    )
    SELECT doc_id,
           ROUND(n_punct / len, 6)  AS punct_ratio,
           ROUND(n_stop / n_tok, 6) AS stopword_ratio,
           ROUND(LEAST(len / 500.0, 1.0)
                 * (1.0 - n_punct / len)
                 * (1.0 - n_stop / n_tok), 6) AS quality
    FROM feat
    """,
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length / punctuation / stopword-ratio
    features composed into a [0,1] score — the classic pre-training
    corpus filter shape. Pure deterministic arithmetic (identical IEEE
    ops both engines), rounded once at output.

    Single ``spark.sql`` statement since optimization r16 (SCALING.md
    §12 build-cost remedy): the chained build cost 78–89 ms of driver
    time per call — ~29% of fixture-scale wall — for the identical
    plan. The ``D`` suffixes keep the SQL literals DOUBLE (bare 500.0
    parses as DECIMAL), so every ratio is the same IEEE op sequence:
    rows and dtypes verified equal, hash-equal at all three SFs.
    Interleaved A/B: 0.284/0.288 → 0.210/0.225 s medians, build
    78 → 17 ms."""
    prep(spark)
    d = table_sql_ref(spark, sf_dir, "documents")
    return spark.sql(
        f"""
        WITH feat AS (
          SELECT doc_id,
                 CAST(LENGTH(text) AS DOUBLE) AS len,
                 CAST(SIZE(SPLIT(text, ' ')) AS DOUBLE) AS n_tok,
                 CAST(LENGTH(REGEXP_REPLACE(text, '[a-z0-9 ]', ''))
                      AS DOUBLE) AS n_punct,
                 CAST(SIZE(FILTER(SPLIT(LOWER(text), ' '),
                      t -> t IN ('the', 'a', 'of', 'and', 'to', 'in')))
                      AS DOUBLE) AS n_stop
          FROM {d}
        )
        SELECT doc_id,
               ROUND(n_punct / len, 6) AS punct_ratio,
               ROUND(n_stop / n_tok, 6) AS stopword_ratio,
               ROUND(LEAST(len / 500.0D, 1.0D)
                     * (1.0D - n_punct / len)
                     * (1.0D - n_stop / n_tok), 6) AS quality
        FROM feat
    """
    )


@query(
    "text_token_count_bpe",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9\\s]')
                ) AS INTEGER) AS n_bpe_ish
    FROM documents
    """,
)
def text_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace split vs a BPE-ish regex
    (alnum runs | single non-alnum-non-space) — the cheap proxy used to
    budget LLM token counts at corpus scale."""
    prep(spark)
    return table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(r"[a-z0-9]+|[^a-z0-9\s]"), 0)).alias(
            "n_bpe_ish"
        ),
    )


@query(
    "text_fingerprint_rolling",
    oracle="""
    WITH grams AS (
      SELECT doc_id, text, UNNEST(generate_series(1, length(text) - 7)) AS i
      FROM documents
    ), hashed AS (
      SELECT doc_id,
             CAST(list_sum(list_transform(generate_series(0, 7),
               j -> ascii(substr(text, CAST(i + j AS INTEGER), 1))
                    * [CAST(1 AS BIGINT), CAST(131 AS BIGINT), CAST(17161 AS BIGINT), CAST(2248091 AS BIGINT), CAST(294499921 AS BIGINT), CAST(38579489651 AS BIGINT), CAST(5053913144281 AS BIGINT), CAST(662062621900811 AS BIGINT)][CAST(j AS INTEGER) + 1])) AS BIGINT) AS h
      FROM grams
    )
    SELECT doc_id,
           MIN(h)                 AS fingerprint,
           COUNT(DISTINCT h)      AS n_distinct_grams
    FROM hashed GROUP BY doc_id
    """,
)
def text_fingerprint_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint via polynomial rolling hash over character
    8-grams (Rabin-Karp shape): h(i) = Σ_j ascii(c_{i+j})·131^j, kept
    mod-free (max < 2^55, ANSI-safe), fingerprint = min over positions
    — the winnowing building block for plagiarism-style near-dup at
    scale. Identical integer arithmetic both engines → SQL oracle.

    Implementation is an Arrow-batched numpy sliding-window dot product
    in int64 (exact: max hash < 2^55; fixture text is pure ASCII, so
    byte value == ascii() codepoint — probed at every sf). The pure
    expression formulation (transform×aggregate over the char-code
    array) is semantically identical but measured 5× slower at sf0.1
    (2.5s vs 0.5s): nested HOF lambdas allocate per element and defeat
    whole-stage codegen, while the numpy kernel is one GEMV per row.
    Per-row, no shuffle either way."""
    prep(spark)
    import numpy as np

    d = (
        table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        # same domain as the oracle's generate_series
        .filter(F.length("text") >= 8)
    )
    weights = (131 ** np.arange(8)).astype(np.int64)

    def fp(batches):
        import pandas as pd

        for pdf in batches:
            ids, fps, nds = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                # utf-8, not ascii: one non-ASCII row must not kill the
                # whole scan (ADVICE r1). For ASCII text (the fixture
                # contract, probed at every sf) bytes == ascii()
                # codepoints so oracle parity is unchanged; non-ASCII
                # rows hash over utf-8 bytes — deterministic, no crash.
                codes = np.frombuffer(text.encode("utf-8"), dtype=np.uint8).astype(
                    np.int64
                )
                hs = np.lib.stride_tricks.sliding_window_view(codes, 8) @ weights
                ids.append(doc_id)
                fps.append(hs.min())
                nds.append(len(np.unique(hs)))
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "fingerprint": np.asarray(fps, dtype=np.int64),
                    "n_distinct_grams": np.asarray(nds, dtype=np.int64),
                }
            )

    return d.mapInPandas(
        fp, schema="doc_id long, fingerprint long, n_distinct_grams long"
    )


@query(
    "text_langid_ngram",
    oracle="""
    WITH tris AS (
      SELECT DISTINCT doc_id, lang, substr(text, CAST(i AS INT), 3) AS tri
      FROM documents,
           UNNEST(generate_series(1, greatest(length(text) - 2, 1))) AS u(i)
    ), prof AS (
      SELECT lang AS cand_lang, tri FROM (
        SELECT lang, tri,
               ROW_NUMBER() OVER (
                 PARTITION BY lang ORDER BY COUNT(*) DESC, tri ASC) AS r
        FROM tris GROUP BY lang, tri
      ) WHERE r <= 50
    ), votes AS (
      SELECT t.doc_id, p.cand_lang, COUNT(*) AS overlap
      FROM (SELECT DISTINCT doc_id, tri FROM tris) t
      JOIN prof p USING (tri)
      GROUP BY t.doc_id, p.cand_lang
    ), pred AS (
      SELECT doc_id, cand_lang AS pred_lang FROM (
        SELECT doc_id, cand_lang,
               ROW_NUMBER() OVER (
                 PARTITION BY doc_id ORDER BY overlap DESC, cand_lang ASC) AS r
        FROM votes
      ) WHERE r = 1
    )
    SELECT d.doc_id, d.lang, p.pred_lang, d.lang = p.pred_lang AS hit
    FROM documents d JOIN pred p USING (doc_id)
    """,
)
def text_langid_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification via character-trigram profiles.

    Profiles: top-50 trigrams per language, learned from the corpus's
    own lang labels (broadcast — vocabulary-sized). A doc votes for the
    language whose profile shares the most of its distinct trigrams
    (tie-break lang asc). On this fixture the languages share one
    vocabulary, so accuracy is near-chance — the operator demonstrates
    the n-gram-profile mechanism, which is what a real corpus needs.
    """
    prep(spark)
    docs = table(spark, sf_dir, "documents")
    # The trigram explode is the expensive stage (sequence+transform+
    # substr per char), and a small corpus arrives as ONE parquet row
    # group — without an explicit spread it runs in one task (measured
    # 1.8s of the round-5 3.0s total at sf0.1, single-threaded on 32
    # cores). One shared spread policy with dedup_near_minhash
    # (tables.spread_small_corpus); no-op only when the layout's row-
    # group count already covers the target width (r9 policy change).
    d = spread_small_corpus(
        spark, docs.select("doc_id", "lang", "text"), sf_dir, "documents"
    )
    tris = d.select(
        "doc_id",
        "lang",
        F.explode(
            F.array_distinct(
                F.expr(
                    "transform(sequence(1, greatest(length(text) - 2, 1)), "
                    "i -> substr(text, CAST(i AS INT), 3))"
                )
            )
        ).alias("tri"),
    )
    # No cache: tris is all JVM expressions, so its two consumers
    # (profile build, voting) cost one extra column-pruned scan +
    # explode — with the spread above that is cheaper than the round-5
    # persist+localCheckpoint pair, whose lingering RDD blocks
    # degraded back-to-back runs until the async ContextCleaner caught
    # up (the hazard fixed suite-wide this round). Measured at sf0.1:
    # 0.93s no-cache+spread vs 3.0s persist vs 4.2s no-cache serial.
    # At 100 TB, checkpoint tris durably if the explode dominates.
    w_prof = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("tri").asc())
    profiles = (
        tris.groupBy("lang", "tri")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("r", F.row_number().over(w_prof))
        .filter(F.col("r") <= 50)
        .select(F.col("lang").alias("cand_lang"), "tri")
    )
    votes = (
        tris.select("doc_id", "tri")
        .join(F.broadcast(profiles), "tri")
        .groupBy("doc_id", "cand_lang")
        .agg(F.count(F.lit(1)).alias("overlap"))
    )
    w_pick = Window.partitionBy("doc_id").orderBy(
        F.col("overlap").desc(), F.col("cand_lang").asc()
    )
    pred = (
        votes.withColumn("r", F.row_number().over(w_pick))
        .filter(F.col("r") == 1)
        .select("doc_id", F.col("cand_lang").alias("pred_lang"))
    )
    return docs.select("doc_id", "lang").join(pred, "doc_id").select(
        "doc_id", "lang", "pred_lang", (F.col("lang") == F.col("pred_lang")).alias("hit")
    )


@query(
    "llm_corpus_pipeline",
    oracle="""
    WITH quality AS (
      SELECT doc_id, text, lang,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents
      WHERE n_chars BETWEEN 100 AND 2000
        AND len(string_split(text, ' ')) >= 10
    ), kept AS (
      SELECT MIN(doc_id) AS doc_id,
             MIN(lang)   AS lang,
             MIN(n_tokens) AS n_tokens
      FROM quality GROUP BY lower(trim(text))
    ), sampled AS (
      SELECT * FROM kept WHERE ((doc_id % 2147483647) * 2654435761) % 100 < 50
    )
    SELECT lang,
           COUNT(*)                  AS n_docs,
           ROUND(AVG(n_tokens), 4)   AS avg_tokens
    FROM sampled GROUP BY lang
    """,
)
def llm_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation in one declarative plan: quality
    gate (length + token floor) → exact dedup keeping the smallest
    doc_id → deterministic 50% hash-mod sample → per-language stats.

    The composition is the point: each stage is an operator proven
    elsewhere in the suite (text_quality_score, dedup_exact,
    sample_hash_bernoulli), and chaining them stays ONE Catalyst plan —
    the quality predicate pushes into the parquet scan, dedup is the
    only wide shuffle (keyed on normalized text; on the sha2 digest at
    100 TB), and the sample predicate is shuffle-free. Note the dedup
    keeps MIN(doc_id) BEFORE sampling, so membership is decided on the
    surviving representative — order matters and both engines pin it.

    For dedup-group metadata, MIN(lang)/MIN(n_tokens) stand in for
    "the kept doc's values": fixture dup groups are exact-text copies,
    and single-valued aggregates keep the oracle engine-agnostic.
    """
    prep(spark)
    n_tokens = F.size(F.split("text", " "))
    quality = (
        table(spark, sf_dir, "documents")
        .filter(F.col("n_chars").between(100, 2000))
        .withColumn("n_tokens", n_tokens)
        .filter(F.col("n_tokens") >= 10)
    )
    kept = quality.groupBy(F.lower(F.trim(F.col("text"))).alias("norm")).agg(
        F.min("doc_id").alias("doc_id"),
        F.min("lang").alias("lang"),
        F.min("n_tokens").alias("n_tokens"),
    )
    # Reduce mod 2^31-1 before multiplying so the product stays < 2^63
    # under ANSI mode even for 100 TB-scale doc_ids (same guard as
    # sample_hash_bernoulli; identity for fixture ids).
    sampled = kept.filter(((F.col("doc_id") % 2147483647) * 2654435761) % 100 < 50)
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@query(
    "text_repetition_stats",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(lower(text), ' ') AS w
      FROM documents
    ), base AS (
      SELECT doc_id, w, len(w) AS n_words FROM docs
    ), words AS (
      SELECT doc_id, UNNEST(w) AS word FROM base
    ), wstats AS (
      SELECT doc_id, COUNT(*) AS n_w, COUNT(DISTINCT word) AS n_dw
      FROM words GROUP BY doc_id
    ), bigrams AS (
      SELECT doc_id,
             UNNEST(list_transform(generate_series(1, n_words - 1),
                    i -> w[i] || ' ' || w[i + 1])) AS g
      FROM base WHERE n_words >= 2
    ), bgc AS (
      SELECT doc_id, g, COUNT(*) AS c FROM bigrams GROUP BY doc_id, g
    ), bgstats AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg
      FROM bgc GROUP BY doc_id
    ), trigrams AS (
      SELECT doc_id,
             UNNEST(list_transform(generate_series(1, n_words - 2),
                    i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS g
      FROM base WHERE n_words >= 3
    ), tgstats AS (
      SELECT doc_id, COUNT(*) AS n_tg, COUNT(DISTINCT g) AS n_dtg
      FROM trigrams GROUP BY doc_id
    )
    SELECT ws.doc_id,
           ws.n_w AS n_words,
           ROUND(1.0 - CAST(ws.n_dw AS DOUBLE) / ws.n_w, 6)
             AS dup_word_frac,
           ROUND(CAST(b.top_c AS DOUBLE) / b.n_bg, 6)
             AS top_bigram_frac,
           ROUND(1.0 - CAST(t.n_dtg AS DOUBLE) / t.n_tg, 6)
             AS dup_trigram_frac
    FROM wstats ws
    LEFT JOIN bgstats b USING (doc_id)
    LEFT JOIN tgstats t USING (doc_id)
    """,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021, table A1 —
    public paper): per document the duplicate-word fraction, the
    fraction of bigram mass claimed by the single most frequent
    bigram, and the duplicate-trigram fraction — the repetition
    filters every pre-training curation pipeline applies alongside
    text_quality_score's length/punct/stopword features. Documents
    too short for an n-gram level emit NULL for that fraction (LEFT
    JOIN), never a fake 0 — a 1-word doc has no bigram evidence
    either way.

    Shape at 100 TB: explode-then-aggregate, all JVM. Tokens shuffle
    once per n-gram level keyed by (doc_id[, gram]) with map-side
    partial aggregation collapsing repeats before the exchange —
    linear in corpus tokens, no per-doc quadratic term (the row-local
    HOF alternative computes each distinct gram's count by rescanning
    the gram array: O(L**2) per doc, unusable for book-length docs).
    One spark.sql CTE chain (single analysis pass, SCALING.md §12);
    the oracle mirrors it CTE-for-CTE with 1-based list indexing.
    """
    prep(spark)
    docs = table_sql_ref(spark, sf_dir, "documents")
    return spark.sql(f"""
    WITH docs AS (
      SELECT doc_id, split(lower(text), ' ') AS w
      FROM {docs}
    ), base AS (
      SELECT doc_id, w, size(w) AS n_words FROM docs
    ), words AS (
      SELECT doc_id, explode(w) AS word FROM base
    ), wstats AS (
      SELECT doc_id, COUNT(*) AS n_w, COUNT(DISTINCT word) AS n_dw
      FROM words GROUP BY doc_id
    ), bigrams AS (
      SELECT doc_id,
             explode(transform(sequence(0, n_words - 2),
                     i -> concat(w[i], ' ', w[i + 1]))) AS g
      FROM base WHERE n_words >= 2
    ), bgc AS (
      SELECT doc_id, g, COUNT(*) AS c FROM bigrams GROUP BY doc_id, g
    ), bgstats AS (
      SELECT doc_id, MAX(c) AS top_c, SUM(c) AS n_bg
      FROM bgc GROUP BY doc_id
    ), trigrams AS (
      SELECT doc_id,
             explode(transform(sequence(0, n_words - 3),
                     i -> concat(w[i], ' ', w[i + 1], ' ', w[i + 2]))) AS g
      FROM base WHERE n_words >= 3
    ), tgstats AS (
      SELECT doc_id, COUNT(*) AS n_tg, COUNT(DISTINCT g) AS n_dtg
      FROM trigrams GROUP BY doc_id
    )
    SELECT ws.doc_id,
           ws.n_w AS n_words,
           ROUND(1.0 - CAST(ws.n_dw AS DOUBLE) / ws.n_w, 6)
             AS dup_word_frac,
           ROUND(CAST(b.top_c AS DOUBLE) / b.n_bg, 6)
             AS top_bigram_frac,
           ROUND(1.0 - CAST(t.n_dtg AS DOUBLE) / t.n_tg, 6)
             AS dup_trigram_frac
    FROM wstats ws
    LEFT JOIN bgstats b USING (doc_id)
    LEFT JOIN tgstats t USING (doc_id)
    """)

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
from ..tables import prep, table


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
    output per the float-hash rule (ranks, not scores)."""
    prep(spark)
    toks = table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split(F.lower("text"), " ")).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_ = toks.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = table(spark, sf_dir, "documents").count()
    scored = (
        tf.filter(F.col("doc_id") < 20)
        .join(F.broadcast(df_), "term")
        .withColumn(
            "score",
            F.col("tf") * (F.log((n_docs + 1.0) / (F.col("df") + 1.0)) + 1.0),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("doc_id", "term", "rnk")
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

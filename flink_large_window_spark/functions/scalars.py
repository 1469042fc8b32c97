"""Scalar function coverage (SURVEY.md §2.7).

All JVM-side built-ins (whole-stage codegen) — no Python UDFs here.
Cross-engine convention notes live next to each query: dayofweek
origin, integer widths of year/datediff, regexp_replace global flag,
libm ulp drift on ln/pow (rounded), float→double widening for array
elements.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..registry import query
from ..tables import prep, table


@query(
    "scalar_string",
    oracle="""
    SELECT c_custkey,
           UPPER(c_name)                      AS name_up,
           LOWER(c_name)                      AS name_lo,
           TRIM(c_name)                       AS name_trim,
           SUBSTR(c_name, 1, 8)               AS name_pre,
           CAST(LENGTH(c_name) AS INTEGER)    AS name_len,
           CONCAT(c_name, '/', c_mktsegment)  AS name_seg,
           REPLACE(c_name, 'Customer', 'C')   AS name_repl
    FROM customer
    """,
)
def scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """upper/lower/trim/substr/length/concat/replace (1-based substr
    both engines; DuckDB length → BIGINT, cast to INTEGER = Spark)."""
    prep(spark)
    return table(spark, sf_dir, "customer").select(
        "c_custkey",
        F.upper("c_name").alias("name_up"),
        F.lower("c_name").alias("name_lo"),
        F.trim("c_name").alias("name_trim"),
        F.substring("c_name", 1, 8).alias("name_pre"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("/", "c_name", "c_mktsegment").alias("name_seg"),
        F.regexp_replace("c_name", "Customer", "C").alias("name_repl"),
    )


@query(
    "scalar_regexp",
    oracle="""
    SELECT p_partkey,
           CAST(regexp_extract(p_brand, 'Brand#(\\d+)', 1) AS INTEGER) AS brand_no,
           regexp_replace(p_name, '\\d+', 'N', 'g')                    AS name_nonum
    FROM part
    """,
)
def scalar_regexp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """regexp_extract group + global regexp_replace (DuckDB needs the
    explicit 'g' flag to match Spark's replace-all default)."""
    prep(spark)
    return table(spark, sf_dir, "part").select(
        "p_partkey",
        F.regexp_extract("p_brand", r"Brand#(\d+)", 1).cast("int").alias("brand_no"),
        F.regexp_replace("p_name", r"\d+", "N").alias("name_nonum"),
    )


@query(
    "scalar_datetime",
    oracle="""
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)          AS o_year,
           CAST(month(o_orderdate) AS INTEGER)         AS o_month,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS o_dow,
           CAST(CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS VARCHAR)
                                                       AS o_month_start_s,
           CAST(datediff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00')
                AS INTEGER)                            AS days_to_y2k,
           CAST(epoch(o_orderdate) AS BIGINT)          AS o_epoch_s
    FROM orders
    """,
)
def scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime field extraction. Convention traps pinned here:
    Spark dayofweek is 1=Sunday..7, DuckDB is 0=Sunday..6 (+1 in the
    oracle); Spark datediff(end, start) = DuckDB datediff('day', start,
    end); DuckDB year/month return BIGINT (cast to INTEGER = Spark)."""
    prep(spark)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.dayofweek("o_orderdate").alias("o_dow"),
        F.date_trunc("month", "o_orderdate").cast("string").alias("o_month_start_s"),
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate").cast("date")).alias("days_to_y2k"),
        F.unix_timestamp("o_orderdate").alias("o_epoch_s"),
    )


@query(
    "scalar_math",
    oracle="""
    SELECT o_orderkey,
           ROUND(o_totalprice, 1)                       AS price_r1,
           ABS(o_totalprice - 150000.0)                 AS dist_mid,
           CAST(CEIL(o_totalprice) AS BIGINT)           AS price_ceil,
           CAST(FLOOR(o_totalprice) AS BIGINT)          AS price_floor,
           SQRT(o_totalprice)                           AS price_sqrt,
           ROUND(LN(o_totalprice), 6)                   AS price_ln,
           ROUND(POW(o_totalprice, 0.5), 6)             AS price_pow,
           CAST(o_orderkey % 7 AS BIGINT)               AS key_mod7
    FROM orders
    """,
)
def scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """round/abs/ceil/floor/sqrt/ln/pow/mod. sqrt is IEEE
    correctly-rounded (exact both engines); ln/pow are libm-dependent →
    rounded to 6 decimals both sides."""
    prep(spark)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round("o_totalprice", 1).alias("price_r1"),
        F.abs(F.col("o_totalprice") - 150000.0).alias("dist_mid"),
        F.ceil("o_totalprice").alias("price_ceil"),
        F.floor("o_totalprice").alias("price_floor"),
        F.sqrt("o_totalprice").alias("price_sqrt"),
        F.round(F.log("o_totalprice"), 6).alias("price_ln"),
        F.round(F.pow("o_totalprice", F.lit(0.5)), 6).alias("price_pow"),
        (F.col("o_orderkey") % 7).alias("key_mod7"),
    )


@query(
    "scalar_conditional",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 300000 THEN 'mid'
                ELSE 'high' END                          AS band,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open')  AS status_lbl,
           NULLIF(o_orderpriority, '1-URGENT')           AS prio_nonurgent
    FROM orders
    """,
)
def scalar_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    prep(spark)
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("band"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias("status_lbl"),
        F.nullif("o_orderpriority", F.lit("1-URGENT")).alias("prio_nonurgent"),
    )


@query(
    "scalar_array",
    oracle="""
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)              AS n_dims,
           CAST(embedding[1] AS DOUBLE)                 AS e1,
           CAST(embedding[64] AS DOUBLE)                AS e64,
           CAST(len(embedding[1:3]) AS INTEGER)         AS slice_len,
           (embedding[1] > 0)                           AS first_pos
    FROM embeddings
    """,
)
def scalar_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """size/element_at/slice on the embedding array column. Elements
    widened float→double (exact) so both engines emit float64."""
    prep(spark)
    e1 = F.element_at("embedding", 1)
    return table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.size("embedding").alias("n_dims"),
        e1.cast("double").alias("e1"),
        F.element_at("embedding", 64).cast("double").alias("e64"),
        F.size(F.slice("embedding", 1, 3)).alias("slice_len"),
        (e1 > F.lit(0.0)).alias("first_pos"),
    )


@query(
    "scalar_explode",
    oracle="""
    SELECT doc_id, UNNEST(string_split(text, ' ')) AS token
    FROM documents
    """,
)
def scalar_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-generating lateral explode — Flink FlatMapFunction shape."""
    prep(spark)
    return table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    )


@query(
    "scalar_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
)
def scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the semi-structured props column."""
    prep(spark)
    return table(spark, sf_dir, "events").select(
        "event_id",
        F.get_json_object("props", "$.k").cast("int").alias("k"),
    )


@query(
    "scalar_bitwise",
    oracle="""
    SELECT o_orderkey,
           o_orderkey & 255       AS k_and,
           o_orderkey | 4096      AS k_or,
           xor(o_orderkey, 1023)  AS k_xor,
           o_orderkey << 2        AS k_shl,
           o_orderkey >> 3        AS k_shr
    FROM orders
    """,
)
def scalar_bitwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise AND/OR/XOR and shifts on keys — partitioner/bucketing
    building blocks (e.g. the LSH band packing uses these)."""
    prep(spark)
    k = F.col("o_orderkey")
    return table(spark, sf_dir, "orders").select(
        "o_orderkey",
        k.bitwiseAND(F.lit(255)).alias("k_and"),
        k.bitwiseOR(F.lit(4096)).alias("k_or"),
        k.bitwiseXOR(F.lit(1023)).alias("k_xor"),
        F.shiftleft(k, 2).alias("k_shl"),
        F.shiftright(k, 3).alias("k_shr"),
    )


@query(
    "scalar_hash",
    oracle="""
    SELECT doc_id,
           md5(text)                          AS text_md5,
           sha256(text)                       AS text_sha256,
           length(md5(lower(trim(text))))     AS norm_md5_len
    FROM documents WHERE doc_id < 100
    """,
)
def scalar_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cryptographic digests as portable row fingerprints (md5 +
    sha256 hex) — the narrow shuffle keys the 100 TB dedup path groups
    on instead of raw text (see dedup_exact). Both engines emit
    identical lowercase hex for identical bytes, so this is one of the
    few hash families with an exact cross-engine oracle (xxhash64 /
    CityHash are engine-specific).
    """
    prep(spark)
    return (
        table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.md5("text").alias("text_md5"),
            F.sha2("text", 256).alias("text_sha256"),
            F.length(F.md5(F.lower(F.trim(F.col("text"))))).cast("long").alias(
                "norm_md5_len"
            ),
        )
    )


@query(
    "scalar_interval_arith",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderdate + INTERVAL 30 DAY  AS STRING)      AS due_date,
           CAST(o_orderdate + INTERVAL 3 MONTH AS STRING)      AS quarter_out,
           CAST(date_diff('day', TIMESTAMP '1995-01-01',
                          o_orderdate) AS BIGINT)              AS days_since_epoch_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS STRING) AS month_end
    FROM orders WHERE o_orderkey < 500
    """,
)
def scalar_interval_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/date arithmetic: +30 days, +3 calendar months (month
    arithmetic clamps to month end — both engines agree), day diffs
    against a fixed origin, and last_day. Timestamps emitted as strings
    per the suite-wide tz-parity rule."""
    prep(spark)
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 500)
        .select(
            "o_orderkey",
            (F.col("o_orderdate") + F.expr("interval 30 day"))
            .cast("string")
            .alias("due_date"),
            (F.col("o_orderdate") + F.expr("interval 3 month"))
            .cast("string")
            .alias("quarter_out"),
            F.datediff(
                F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")
            )
            .cast("long")
            .alias("days_since_epoch_start"),
            F.last_day(F.col("o_orderdate").cast("date"))
            .cast("string")
            .alias("month_end"),
        )
    )


@query(
    "scalar_json_struct",
    oracle="""
    SELECT CAST(json_extract(props, '$.k') AS INTEGER) % 10 AS k_mod,
           COUNT(*)                                         AS n,
           ROUND(AVG(value), 4)                             AS avg_value
    FROM events
    GROUP BY 1
    """,
)
def scalar_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-typed JSON parsing with `from_json` (vs scalar_json's
    path extraction): the props column becomes a typed struct ONCE,
    then downstream grouping works on real columns.

    At 100 TB this is the difference between per-query string parsing
    (get_json_object per path per row) and a single parse materialized
    into columnar storage at ingest — the struct form also lets
    Catalyst prune unparsed fields.
    """
    prep(spark)
    parsed = table(spark, sf_dir, "events").select(
        "value",
        F.from_json("props", "k INT").alias("p"),
    )
    return (
        parsed.groupBy((F.col("p.k") % 10).alias("k_mod"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
    )


@query(
    "scalar_try_arith",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(FLOOR(l_extendedprice / NULLIF(l_quantity, 0) * 10000) AS BIGINT)
             AS unit_price_e4,
           CAST(FLOOR(l_discount / NULLIF(l_tax, 0) * 10000) AS BIGINT)
             AS disc_per_tax_e4
    FROM lineitem WHERE l_orderkey < 200
    """,
)
def scalar_try_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-on-error arithmetic under ANSI mode: Spark 4 raises on
    division by zero, so pipelines use `try_divide` (NULL instead of a
    job-killing exception — one bad row must not fail a 100 TB job).
    DuckDB's equivalent spelling is `x / NULLIF(y, 0)`; the fixture's
    l_tax CAN be 0, so the second column exercises the NULL path for
    real.

    Output is scaled-integer (×10⁴, floored): these quotients land
    EXACTLY on .5 decimal boundaries systematically (2-decimal prices
    ÷ small integers), where Spark's shortest-repr half-up ROUND and
    DuckDB's binary-scaling ROUND disagree — but both floor the
    identical IEEE quotient identically. (Bare CAST differs too:
    DuckDB rounds half-even, Spark ANSI truncates.)
    """
    prep(spark)
    return (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") < 200)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.floor(F.try_divide("l_extendedprice", "l_quantity") * 10000).alias(
                "unit_price_e4"
            ),
            F.floor(F.try_divide("l_discount", "l_tax") * 10000).alias(
                "disc_per_tax_e4"
            ),
        )
    )


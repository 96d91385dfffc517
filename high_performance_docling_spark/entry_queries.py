"""Driver-facing query registry: Spark implementations + DuckDB oracles.

Each entry demonstrates an operator family from SURVEY.md §2 (or a
training-data-pipeline operator from the task brief) on the driver's
testdata tables, with an ANSI-SQL oracle the driver cross-checks in
DuckDB. Non-SQL-expressible entries (the docling extraction pipeline
itself) have no oracle and get a rows-only check.

Float discipline: every aggregated/derived float column is ROUNDed
identically on both sides so double-summation order can't flip the
driver's value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import Window as W


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# --------------------------------------------------------------------------
# the extraction engine itself (rows-only check; the real correctness gate
# is tests/test_pipeline_e2e.py's span equality vs the serial oracle)
# --------------------------------------------------------------------------

def q_extract_spans_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: synthesize the interleaved corpus and run S0→S7, returning
    exploded (doc_id, kind, text, media_ref, order) rows."""
    from .corpus import GenConfig
    from .pipeline import docs_dataframe, extract_spans

    n_docs = 60 if "0.001" in sf_dir else (120 if "0.01" in sf_dir else 240)
    cfg = GenConfig(seed=42, n_docs=n_docs)
    docs = docs_dataframe(spark, cfg, num_partitions=16)
    out = extract_spans(spark, docs, cfg)
    return out.select(
        "doc_id", F.explode("spans").alias("s")
    ).select(
        "doc_id",
        F.col("s.kind").alias("kind"),
        F.col("s.text").alias("text"),
        F.col("s.media_ref").alias("media_ref"),
        F.col("s.order").alias("ord"),
    )


# --------------------------------------------------------------------------
# relational operator coverage (SURVEY.md §2.2/2.4/2.5) on TPC-H-ish tables
# --------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-agg groupBy with filter pushdown (§2.4)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                AS sum_qty,
       round(sum(l_extendedprice), 2)                           AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)        AS sum_disc_price,
       round(avg(l_quantity), 4)                                AS avg_qty,
       round(avg(l_discount), 4)                                AS avg_disc,
       count(*)                                                 AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight filter + single-row agg (predicate pushdown)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    ).agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
            "revenue"
        ),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_REVENUE_FORECAST = """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue,
       count(*) AS n_rows
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def q_top_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + window top-K per group (§2.5 'top-1 per pdf cell' pattern:
    row_number over partitioned desc ordering). Customer dim is broadcast."""
    cust = _t(spark, sf_dir, "customer")
    orders = _t(spark, sf_dir, "orders")
    j = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        j.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select(
            "c_mktsegment",
            "rk",
            "o_orderkey",
            F.round("o_totalprice", 2).alias("total_price"),
        )
        .orderBy("c_mktsegment", "rk")
    )


ORACLE_TOP_ORDERS_PER_SEGMENT = """
SELECT c_mktsegment, rk, o_orderkey, total_price FROM (
  SELECT c_mktsegment,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk,
         o_orderkey,
         round(o_totalprice, 2) AS total_price
  FROM orders JOIN customer ON o_custkey = c_custkey
) WHERE rk <= 5
ORDER BY c_mktsegment, rk
"""


# --------------------------------------------------------------------------
# training-data pipeline: dedup / text analysis (task brief) on `documents`
# --------------------------------------------------------------------------

def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized text, keep smallest doc_id
    (the at-scale shape: one shuffle on the hash key; skew-safe because
    md5 keys are uniform)."""
    docs = _t(spark, sf_dir, "documents")
    norm = F.md5(F.lower(F.trim(F.col("text"))))
    return (
        docs.select(norm.alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") >= 1)
        .orderBy("content_hash")
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(lower(trim(text))) AS content_hash,
       min(doc_id)            AS keep_doc_id,
       count(*)               AS n_copies
FROM documents
GROUP BY 1
ORDER BY content_hash
"""


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace tokenization + counts, JVM-side only (no UDF)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col("text"))) == 0, F.lit(0))
        .otherwise(F.size(toks))
        .alias("n_tokens"),
        F.length("text").alias("n_chars"),
    ).orderBy("doc_id")


ORACLE_TOKEN_COUNT = """
SELECT doc_id,
       CASE WHEN length(trim(text)) = 0 THEN 0
            ELSE length(regexp_split_to_array(trim(text), '\\s+')) END AS n_tokens,
       length(text) AS n_chars
FROM documents
ORDER BY doc_id
"""


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring: length, mean word length, stopword ratio
    (all JVM-side column expressions)."""
    docs = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tok = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin("the", "and", "of", "to", "a", "in"))
    )
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round((F.length("text") + 0.0) / n_tok, 4).alias("mean_tok_len"),
        F.round((stop_hits + 0.0) / n_tok, 4).alias("stopword_ratio"),
    ).orderBy("doc_id")


ORACLE_QUALITY_SCORE = """
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       length(toks)                                    AS n_tokens,
       round(length(text) / length(toks), 4)           AS mean_tok_len,
       round(length(list_filter(toks,
             x -> x IN ('the','and','of','to','a','in'))) / length(toks), 4)
                                                        AS stopword_ratio
FROM t
ORDER BY doc_id
"""


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: lag + gap>30min cumsum (§2.5 window patterns; the
    batch analogue of streaming session windows)."""
    ev = _t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional-second epoch so boundaries match the oracle exactly
    # (parquet ts is TIMESTAMP_NTZ; session TZ is pinned UTC so the
    # NTZ→LTZ→double path equals DuckDB's naive epoch())
    epoch = F.col("ts").cast("timestamp").cast("double")
    gap = epoch - F.lag(epoch).over(w)
    sess = F.sum(
        F.when(gap.isNull() | (gap > 1800.0), 1).otherwise(0)
    ).over(w).cast("long")
    return (
        ev.withColumn("session_id", sess)
        .groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
        .orderBy("user_id", "session_id")
    )


ORACLE_SESSIONIZE_EVENTS = """
WITH g AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(lag(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, value,
         (sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS UNBOUNDED PRECEDING))::BIGINT AS session_id
  FROM g
)
SELECT user_id, session_id, count(*) AS n_events,
       round(sum(value), 2) AS session_value
FROM s
GROUP BY user_id, session_id
ORDER BY user_id, session_id
"""


# --------------------------------------------------------------------------
# registry
# --------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "extract_spans_e2e": q_extract_spans_e2e,
    "pricing_summary": q_pricing_summary,
    "revenue_forecast": q_revenue_forecast,
    "top_orders_per_segment": q_top_orders_per_segment,
    "dedup_exact": q_dedup_exact,
    "token_count": q_token_count,
    "quality_score": q_quality_score,
    "sessionize_events": q_sessionize_events,
}

ORACLES: dict[str, str] = {
    "pricing_summary": ORACLE_PRICING_SUMMARY,
    "revenue_forecast": ORACLE_REVENUE_FORECAST,
    "top_orders_per_segment": ORACLE_TOP_ORDERS_PER_SEGMENT,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "token_count": ORACLE_TOKEN_COUNT,
    "quality_score": ORACLE_QUALITY_SCORE,
    "sessionize_events": ORACLE_SESSIONIZE_EVENTS,
}

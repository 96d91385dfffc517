"""Relational formulations of the engine's geometric operators.

The page-local kernels (kernels/*.py) run the reference's geometry inside
Arrow UDFs; these operators express the SAME semantics as pure
DataFrame-API plans over box relations — the "relational alternative"
column of SURVEY.md §2.3/2.4/2.5 — so they are Catalyst-optimizable,
SQL-oracle-checkable, and usable at corpus scale (e.g. cross-document
spatial joins, which no single-page kernel can do).

The box relations derive deterministically (integer arithmetic only) from
the driver's testdata tables, so a DuckDB oracle reproduces them exactly:
  cells    ← lineitem  (one box per line item)
  clusters ← part      (one box per part)
Both carry a ``page`` key; spatial joins are equi-joins on page plus a
box predicate, which Spark executes as a hash join + filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from ..util import read_table

N_PAGES = 40

# SQL fragments kept in lockstep with the DataFrame derivations below —
# the oracle strings in entry_queries interpolate these.
CELLS_SQL = f"""
  SELECT l_orderkey * 10 + l_linenumber                    AS cell_id,
         l_orderkey % {N_PAGES}                            AS page,
         (l_partkey % 40) * 15                             AS l,
         (l_suppkey % 60) * 12                             AS t,
         (l_partkey % 40) * 15 + 6 + (l_quantity::INT % 13) AS r,
         (l_suppkey % 60) * 12 + 10                        AS b
  FROM lineitem
"""
CLUSTERS_SQL = f"""
  SELECT p_partkey                      AS cluster_id,
         p_partkey % {N_PAGES}          AS page,
         (p_partkey % 20) * 30          AS l,
         (p_size % 40) * 18             AS t,
         (p_partkey % 20) * 30 + 35     AS r,
         (p_size % 40) * 18 + 22        AS b
  FROM part
"""


def cells_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_table(spark, sf_dir, "lineitem")
    return li.select(
        (F.col("l_orderkey") * 10 + F.col("l_linenumber")).alias("cell_id"),
        (F.col("l_orderkey") % N_PAGES).alias("page"),
        ((F.col("l_partkey") % 40) * 15).alias("l"),
        ((F.col("l_suppkey") % 60) * 12).alias("t"),
        (
            (F.col("l_partkey") % 40) * 15
            + 6
            + (F.col("l_quantity").cast("int") % 13)
        ).alias("r"),
        ((F.col("l_suppkey") % 60) * 12 + 10).alias("b"),
    )


def clusters_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = read_table(spark, sf_dir, "part")
    return p.select(
        F.col("p_partkey").alias("cluster_id"),
        (F.col("p_partkey") % N_PAGES).alias("page"),
        ((F.col("p_partkey") % 20) * 30).alias("l"),
        ((F.col("p_size") % 40) * 18).alias("t"),
        ((F.col("p_partkey") % 20) * 30 + 35).alias("r"),
        ((F.col("p_size") % 40) * 18 + 22).alias("b"),
    )


def _inter_area(a: str, b: str):
    iw = F.least(F.col(f"{a}.r"), F.col(f"{b}.r")) - F.greatest(
        F.col(f"{a}.l"), F.col(f"{b}.l")
    )
    ih = F.least(F.col(f"{a}.b"), F.col(f"{b}.b")) - F.greatest(
        F.col(f"{a}.t"), F.col(f"{b}.t")
    )
    return F.greatest(iw, F.lit(0)) * F.greatest(ih, F.lit(0))


def _assigned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cell→cluster argmax assignment carrying the cell geometry."""
    cells = cells_rel(spark, sf_dir).alias("c")
    clusters = clusters_rel(spark, sf_dir).alias("k")
    cell_area = (F.col("c.r") - F.col("c.l")) * (F.col("c.b") - F.col("c.t"))
    ios = F.round(_inter_area("c", "k") / cell_area, 6)
    pairs = (
        cells.join(F.broadcast(clusters), F.col("c.page") == F.col("k.page"))
        .select(
            F.col("c.cell_id").alias("cell_id"),
            F.col("k.cluster_id").alias("cluster_id"),
            F.col("c.l").alias("l"), F.col("c.t").alias("t"),
            F.col("c.r").alias("r"), F.col("c.b").alias("b"),
            ios.alias("ios"),
        )
        .filter(F.col("ios") > 0.2)
    )
    w = W.partitionBy("cell_id").orderBy(F.desc("ios"), F.asc("cluster_id"))
    return pairs.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)


def cell_cluster_argmax_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The cell→cluster assignment as an argmax spatial join
    (layout_postprocessor.py:899-993 relationally): per cell, the cluster
    maximizing intersection-over-self(cell), floor 0.2; ties break on
    cluster_id. Join strategy: equi-join on page (clusters side is small →
    broadcast) + overlap predicate, then a window argmax."""
    return _assigned(spark, sf_dir).select("cell_id", "cluster_id", "ios")


def cluster_envelope_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster bbox envelope over assigned cells
    (layout_postprocessor.py:1009-1047 relationally): min/max after the
    argmax assignment. The cell geometry rides through the argmax window
    (no self-join back to the cells relation)."""
    return (
        _assigned(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(
            F.min("l").alias("env_l"),
            F.min("t").alias("env_t"),
            F.max("r").alias("env_r"),
            F.max("b").alias("env_b"),
            F.count(F.lit(1)).alias("n_cells"),
        )
    )


def containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parent-child containment (layout_postprocessor.py:503-530
    relationally): cluster pairs on the same page where the child is >80%
    inside the parent (intersection-over-self(child) > 0.8)."""
    a = clusters_rel(spark, sf_dir).alias("c")  # child
    b = clusters_rel(spark, sf_dir).alias("k")  # parent
    child_area = (F.col("c.r") - F.col("c.l")) * (F.col("c.b") - F.col("c.t"))
    ios = F.round(_inter_area("c", "k") / child_area, 6)
    return (
        a.join(b, (F.col("c.page") == F.col("k.page"))
               & (F.col("c.cluster_id") != F.col("k.cluster_id")))
        .select(
            F.col("c.cluster_id").alias("child_id"),
            F.col("k.cluster_id").alias("parent_id"),
            ios.alias("ios"),
        )
        .filter(F.col("ios") > 0.8)
    )


def reading_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's 'tblr' cluster sort (layout_postprocessor.py:
    1066-1069) as a window rank: top-to-bottom then left-to-right per
    page; ties on cluster_id."""
    clusters = clusters_rel(spark, sf_dir)
    w = W.partitionBy("page").orderBy("t", "l", "cluster_id")
    return clusters.select(
        "page", "cluster_id", F.row_number().over(w).alias("reading_rank")
    )


def row_col_compaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row/col index compaction (tf_predictor.py:584-623 relationally):
    dense_rank over distinct start offsets per table. Tables derive from
    cells: table = page, row band = t, col band = l."""
    cells = cells_rel(spark, sf_dir)
    wr = W.partitionBy("page").orderBy("t")
    wc = W.partitionBy("page").orderBy("l")
    return cells.select(
        "page",
        "cell_id",
        (F.dense_rank().over(wr) - 1).alias("row_idx"),
        (F.dense_rank().over(wc) - 1).alias("col_idx"),
    )


def kv_suppression_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The KV-region-vs-TABLE suppression (layout_postprocessor.py:550-583)
    as an ANTI JOIN: keep wrappers that do NOT overlap >0.9 with a
    similar-confidence table. Wrappers derive from orders, tables from
    part; confidences are deterministic integer-derived."""
    o = read_table(spark, sf_dir, "orders")
    wrappers = o.filter(F.col("o_orderkey") % 17 == 0).select(
        F.col("o_orderkey").alias("wrapper_id"),
        (F.col("o_orderkey") % N_PAGES).alias("page"),
        ((F.col("o_custkey") % 20) * 30).alias("l"),
        ((F.col("o_orderkey") % 40) * 18).alias("t"),
        ((F.col("o_custkey") % 20) * 30 + 35).alias("r"),
        ((F.col("o_orderkey") % 40) * 18 + 22).alias("b"),
        (((F.col("o_orderkey") % 40) + 55) / 100.0).alias("conf"),
    ).alias("w")
    tables = clusters_rel(spark, sf_dir).withColumn(
        "conf", ((F.col("cluster_id") % 50) + 50) / 100.0
    ).alias("k")
    w_area = (F.col("w.r") - F.col("w.l")) * (F.col("w.b") - F.col("w.t"))
    ios = _inter_area("w", "k") / w_area
    cond = (
        (F.col("w.page") == F.col("k.page"))
        & (ios > 0.9)
        & (F.col("w.conf") - F.col("k.conf") < 0.1)
    )
    return wrappers.join(tables, cond, "left_anti").select(
        "wrapper_id", "page", F.round("conf", 6).alias("conf")
    ).orderBy("wrapper_id")


def column_alignment_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column alignment vote (matching_post_processor.py:150-190
    relationally): per (page, column-band), the smallest min-max spread of
    left / middle / right edges picks the alignment."""
    cells = cells_rel(spark, sf_dir).withColumn("col_band", F.col("l"))
    agg = cells.groupBy("page", "col_band").agg(
        (F.max("l") - F.min("l")).alias("d_left"),
        (F.max((F.col("l") + F.col("r")) / 2) - F.min((F.col("l") + F.col("r")) / 2)).alias("d_mid"),
        (F.max("r") - F.min("r")).alias("d_right"),
        F.count(F.lit(1)).alias("n"),
    )
    best = F.least("d_left", "d_mid", "d_right")
    alignment = (
        F.when(F.col("d_left") == best, "left")
        .when(F.col("d_mid") == best, "middle")
        .otherwise("right")
    )
    return agg.select("page", "col_band", "n", alignment.alias("alignment"))

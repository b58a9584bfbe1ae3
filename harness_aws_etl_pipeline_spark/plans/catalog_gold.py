"""Gold-tier catalog extension: deeper join/aggregate shapes (TPC-H
Q3/Q5 analogues over the test star schema), pivot, cube/rollup, and
the G3 SQL-entry-point parity query.

These go beyond the reference's two documented Gold queries to cover
the full BI surface its dashboard spec implies (etl/README.md:688-695):
multi-way dimension joins, top-k by computed measure, cross-tabs, and
grouping-set rollups — all built-in Spark operators, all oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harness_aws_etl_pipeline_spark.plans.catalog import (
    QuerySpec,
    dsum,
    q_join_counts,
    sql_dsum,
    tables,
)


def q_q3_shipping_priority(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q3 shape: segment-filtered 3-way join, revenue per order,
    top-10. Filters sit directly on the scans (pushed down to parquet);
    the final top-k is TakeOrdered, not a global sort."""
    t = tables(spark, sf)
    c = t["customer"].filter(F.col("c_mktsegment") == "BUILDING")
    o = t["orders"].filter(F.col("o_orderdate") < "1997-01-01")
    li = t["lineitem"].filter(F.col("l_shipdate") > "1997-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", F.to_date("o_orderdate").alias("order_date"), "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


ORACLE_Q3 = f"""
SELECT l_orderkey, CAST(o_orderdate AS DATE) AS order_date, o_orderpriority,
       {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate > TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, l_orderkey LIMIT 10
"""


def q_q5_region_revenue(spark: SparkSession, sf: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join through the full dimension chain with
    the local-supplier condition. All dimensions broadcast; the only
    big shuffle is lineitem⋈orders."""
    t = tables(spark, sf)
    r = t["region"].filter(F.col("r_name") == "ASIA")
    n, c, s, o, li = t["nation"], t["customer"], t["supplier"], t["orders"], t["lineitem"]
    o = o.filter(F.year("o_orderdate") == 1996)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .filter(F.col("s_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


ORACLE_Q5 = f"""
SELECT n_name, {sql_dsum("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA' AND s_nationkey = c_nationkey
  AND EXTRACT(year FROM o_orderdate) = 1996
GROUP BY n_name ORDER BY revenue DESC, n_name
"""


def q_pivot_returnflag(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-tab via ``groupBy().pivot()`` — quantity by return flag ×
    line status. Explicit pivot values keep the plan a single pass
    (no distinct-values pre-query).

    Fused (round 7, grown r8/r9): the TPC-H PARITY PACK — 19 classic
    decision-support shapes (plans/catalog_tpch.py; with standalone
    q1/q3/q5 every TPC-H query shape), each reduced to a
    deterministic (rows, md5) pair and re-derived verbatim in DuckDB.
    q2/q11/q16/q20 ride a deterministically synthesized partsupp and
    q21 a synthesized integer lateness predicate — both derivable
    identically by any engine. This panel is NON-headline on purpose —
    the pack's extra join trees must not pollute per-query bench
    drift.

    Fused (round 9): the GROUPING LATTICE legs
    (operators/grouping.py) — ROLLUP / CUBE / GROUPING SETS over
    (l_returnflag, l_linestatus), every level's (keys, packed
    grouping bits, count, exact decimal qty sum) md5'd and re-derived
    with DuckDB's GROUP BY ROLLUP/CUBE/GROUPING SETS + GROUPING().
    Three Expand passes here for API coverage; at scale one CUBE pass
    subsumes the other two lattices for the same key set (rollup =
    gid∈{0,1,3}, sets (rf),(ls) = gid∈{1,2}) — pinned by
    tests/test_grouping.py."""
    from harness_aws_etl_pipeline_spark.operators.grouping import (
        cube_agg,
        grouping_sets_agg,
        rollup_agg,
    )
    from harness_aws_etl_pipeline_spark.plans.catalog_tpch import tpch_pack_arm

    li = tables(spark, sf)["lineitem"]
    scaled = F.round(F.col("l_quantity").cast("double") * 10000).cast("long")
    pivoted = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.sum(scaled))
    )
    base = pivoted.select(
        "l_returnflag",
        (F.coalesce(F.col("F"), F.lit(0)).cast("double") / 10000.0).alias("qty_f"),
        (F.coalesce(F.col("O"), F.lit(0)).cast("double") / 10000.0).alias("qty_o"),
    ).orderBy("l_returnflag")
    # UNPIVOT leg (round 7): melt the cross-tab back to long form —
    # the inverse relational op, pinned via scaled-long md5 over every
    # (flag, status, qty) row
    melted = base.unpivot(
        ["l_returnflag"], ["qty_f", "qty_o"], "status", "qty"
    )
    ms = F.concat_ws(
        ":",
        "l_returnflag",
        "status",
        F.round(F.col("qty") * 10000).cast("long").cast("string"),
    )
    melt_leg = melted.agg(
        F.count(F.lit(1)).alias("melt_rows"),
        F.md5(F.concat_ws("|", F.array_sort(F.collect_list(ms)))).alias(
            "melt_md5"
        ),
    )
    lat_keys = ["l_returnflag", "l_linestatus"]
    lat_cnt = F.count(F.lit(1)).alias("cnt")
    lat_q = F.sum(
        F.round(F.col("l_quantity").cast("double") * 10000).cast(
            "decimal(38,0)"
        )
    ).alias("q")

    def _lattice_arm(levels, prefix):
        s = F.concat_ws(
            ":",
            F.coalesce("l_returnflag", F.lit("_")),
            F.coalesce("l_linestatus", F.lit("_")),
            F.col("_gid").cast("string"),
            F.col("cnt").cast("string"),
            F.col("q").cast("string"),
        )
        return levels.agg(
            F.count(F.lit(1)).cast("long").alias(f"{prefix}_rows"),
            F.md5(F.concat_ws("|", F.array_sort(F.collect_list(s)))).alias(
                f"{prefix}_md5"
            ),
        )

    ru_leg = _lattice_arm(rollup_agg(li, lat_keys, lat_cnt, lat_q), "ru")
    cu_leg = _lattice_arm(cube_agg(li, lat_keys, lat_cnt, lat_q), "cu")
    gs_leg = _lattice_arm(
        grouping_sets_agg(
            li, [["l_returnflag"], ["l_linestatus"]], lat_cnt, lat_q
        ),
        "gs",
    )
    return (
        base.crossJoin(F.broadcast(tpch_pack_arm(spark, sf)))
        .crossJoin(F.broadcast(melt_leg))
        .crossJoin(F.broadcast(ru_leg))
        .crossJoin(F.broadcast(cu_leg))
        .crossJoin(F.broadcast(gs_leg))
    )


def _lattice_arm_sql(group_by: str, prefix: str) -> str:
    """One grouping-lattice arm: every level's (keys, packed grouping
    bits, count, exact HUGEINT qty sum) md5'd — the DuckDB twin of
    operators/grouping.py's ``_gid`` convention (leftmost key =
    highest bit)."""
    return f"""
  WITH r AS (
    SELECT COALESCE(l_returnflag, '_') AS rf,
           COALESCE(l_linestatus, '_') AS ls,
           GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS gid,
           COUNT(*) AS cnt,
           SUM(CAST(ROUND(CAST(l_quantity AS DOUBLE) * 10000) AS HUGEINT)) AS q
    FROM lineitem GROUP BY {group_by}),
  s AS (SELECT rf || ':' || ls || ':' || CAST(gid AS VARCHAR) || ':'
               || CAST(cnt AS VARCHAR) || ':' || CAST(q AS VARCHAR) AS s
        FROM r)
  SELECT CAST(COUNT(*) AS BIGINT) AS {prefix}_rows,
         md5(string_agg(s, '|' ORDER BY s)) AS {prefix}_md5
  FROM s"""


def _oracle_pivot() -> str:
    from harness_aws_etl_pipeline_spark.plans.catalog_tpch import (
        ORACLE_TPCH_FRAGMENT,
    )

    return f"""
SELECT * FROM (
SELECT l_returnflag,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
             THEN CAST(ROUND(CAST(l_quantity AS DOUBLE) * 10000) AS BIGINT) END), 0) AS DOUBLE)
         / 10000.0 AS qty_f,
       CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
             THEN CAST(ROUND(CAST(l_quantity AS DOUBLE) * 10000) AS BIGINT) END), 0) AS DOUBLE)
         / 10000.0 AS qty_o
FROM lineitem GROUP BY l_returnflag
) base CROSS JOIN {ORACLE_TPCH_FRAGMENT}
CROSS JOIN (
  -- the melt leg: the cross-tab unpivoted back to long form
  WITH p AS (
    SELECT l_returnflag,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'F'
                 THEN CAST(ROUND(CAST(l_quantity AS DOUBLE) * 10000) AS BIGINT) END), 0) AS DOUBLE)
             / 10000.0 AS qty_f,
           CAST(COALESCE(SUM(CASE WHEN l_linestatus = 'O'
                 THEN CAST(ROUND(CAST(l_quantity AS DOUBLE) * 10000) AS BIGINT) END), 0) AS DOUBLE)
             / 10000.0 AS qty_o
    FROM lineitem GROUP BY l_returnflag
  ),
  m AS (
    SELECT l_returnflag, 'qty_f' AS status, qty_f AS qty FROM p
    UNION ALL
    SELECT l_returnflag, 'qty_o', qty_o FROM p
  ),
  s AS (SELECT l_returnflag || ':' || status || ':'
               || CAST(CAST(ROUND(qty * 10000) AS BIGINT) AS VARCHAR) AS s
        FROM m)
  SELECT COUNT(*) AS melt_rows,
         md5(string_agg(s, '|' ORDER BY s)) AS melt_md5
  FROM s
) melt_arm
CROSS JOIN ({_lattice_arm_sql("ROLLUP (l_returnflag, l_linestatus)", "ru")}) rollup_arm
CROSS JOIN ({_lattice_arm_sql("CUBE (l_returnflag, l_linestatus)", "cu")}) cube_arm
CROSS JOIN ({_lattice_arm_sql(
    "GROUPING SETS ((l_returnflag), (l_linestatus))", "gs")}) gsets_arm
ORDER BY l_returnflag
"""


ORACLE_PIVOT = _oracle_pivot()


def q_cube_priority_status(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping-set rollups via ``cube`` — order counts at every
    (priority × status) granularity incl. grand total, with
    grouping_id distinguishing the levels."""
    o = tables(spark, sf)["orders"]
    return (
        o.cube("o_orderpriority", "o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.grouping_id("o_orderpriority", "o_orderstatus").cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("o_orderpriority").asc_nulls_first(),
            F.col("o_orderstatus").asc_nulls_first(),
        )
    )


ORACLE_CUBE = """
SELECT o_orderpriority, o_orderstatus, COUNT(*) AS order_cnt,
       CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
ORDER BY gid, o_orderpriority ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST
"""


# Portable SQL text (runs verbatim on Spark SQL AND DuckDB) — the G3
# parity check: the engine's SQL entry point produces byte-identical
# results to the oracle engine running the same statement.
PORTABLE_REVENUE_SQL = f"""
SELECT o_orderpriority, COUNT(*) AS order_cnt,
       {sql_dsum("o_totalprice", "revenue")}
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_sql_entry(spark: SparkSession, sf: str) -> DataFrame:
    """G3 — ad-hoc SQL through the engine's SQL entry point
    (plans/sqlapi.py): register views, run the statement. The oracle
    runs the SAME SQL text."""
    from harness_aws_etl_pipeline_spark.plans.sqlapi import sql

    return sql(spark, sf, PORTABLE_REVENUE_SQL)


def q_window_ranks(spark: SparkSession, sf: str) -> DataFrame:
    """Ranking-function breadth: rank / dense_rank / ntile /
    percent_rank / cume_dist over one window spec (single shuffle +
    sort serves all five)."""
    from pyspark.sql import Window

    c = tables(spark, sf)["customer"]
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(w).cast("long").alias("quartile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
        )
        .filter(F.col("rnk") <= 5)
        .orderBy("c_mktsegment", "rnk")
    )


ORACLE_WINDOW_RANKS = """
SELECT c_mktsegment, c_custkey, rnk, drnk, quartile, pct_rank, cume FROM (
  SELECT c_mktsegment, c_custkey,
         CAST(RANK() OVER w AS BIGINT) AS rnk,
         CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
         CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
         ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
         ROUND(CUME_DIST() OVER w, 6) AS cume
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
) WHERE rnk <= 5 ORDER BY c_mktsegment, rnk
"""


def q_set_ops(spark: SparkSession, sf: str) -> DataFrame:
    """§2.6 beyond UNION ALL: INTERSECT / EXCEPT / UNION DISTINCT
    cardinalities between the urgent and high-priority customer sets."""
    o = tables(spark, sf)["orders"]
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    high = o.filter(F.col("o_orderpriority") == "2-HIGH").select("o_custkey")

    def cnt(df: DataFrame, kind: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("row_cnt")).select(
            F.lit(kind).alias("set_op"), "row_cnt"
        )

    return (
        cnt(urgent.intersect(high), "intersect")
        # subtract == SQL EXCEPT (distinct); exceptAll().distinct()
        # would keep keys present in BOTH sides at unequal multiplicity
        .unionByName(cnt(urgent.subtract(high), "except_distinct"))
        .unionByName(cnt(urgent.union(high).distinct(), "union_distinct"))
        .orderBy("set_op")
    )


ORACLE_SET_OPS = """
SELECT * FROM (
  SELECT 'except_distinct' AS set_op, COUNT(*) AS row_cnt FROM (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
  UNION ALL
  SELECT 'intersect', COUNT(*) FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
  UNION ALL
  SELECT 'union_distinct', COUNT(*) FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
) ORDER BY set_op
"""


def q_relalg_counts(spark: SparkSession, sf: str) -> DataFrame:
    """§2.6/§2.7 — the relational-algebra cardinality panel:
    inner/left/semi/anti join counts (q_join_counts) unioned with
    intersect/except/union-distinct counts (q_set_ops) under a common
    ``op`` tag. One catalog entry covers both SURVEY rows.

    Fused (round 7): the BLOOM-JOIN legs — orders ⋈ a selective
    customer slice through the Bloom-pruned join path
    (operators/bloomjoin.py). A Bloom filter has no false negatives
    and the real join removes the false positives, so the pruned
    result is PROVABLY identical to the plain join — which is exactly
    what the oracle pins (DuckDB runs the plain joins; any pruning
    bug that drops a matching row breaks the count)."""
    from harness_aws_etl_pipeline_spark.operators.bloomjoin import (
        bloom_anti_join,
        bloom_join,
    )

    j = q_join_counts(spark, sf).withColumnRenamed("join_kind", "op")
    s = q_set_ops(spark, sf).withColumnRenamed("set_op", "op")
    o = tables(spark, sf)["orders"]
    c = tables(spark, sf)["customer"].filter(
        (F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000)
    )

    def cnt(df: DataFrame, kind: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("row_cnt")).select(
            F.lit(kind).alias("op"), "row_cnt"
        )

    b = (
        cnt(bloom_join(o, c, ("o_custkey", "c_custkey")), "bloom_inner")
        .unionByName(
            cnt(
                bloom_join(o, c, ("o_custkey", "c_custkey"), how="left_semi"),
                "bloom_semi",
            )
        )
        .unionByName(
            cnt(
                bloom_anti_join(o, c, ("o_custkey", "c_custkey")),
                "bloom_anti",
            )
        )
    )
    return j.unionByName(s).unionByName(b).orderBy("op")


ORACLE_RELALG_COUNTS = """
SELECT * FROM (
  SELECT 'inner' AS op, COUNT(*) AS row_cnt
  FROM orders JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'left', COUNT(*) FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  UNION ALL
  SELECT 'semi', COUNT(*) FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
  UNION ALL
  SELECT 'anti', COUNT(*) FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
  UNION ALL
  SELECT 'bloom_inner', COUNT(*) FROM orders JOIN customer ON o_custkey = c_custkey
  WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000
  UNION ALL
  SELECT 'bloom_semi', COUNT(*) FROM orders WHERE o_custkey IN (
    SELECT c_custkey FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000)
  UNION ALL
  SELECT 'bloom_anti', COUNT(*) FROM orders WHERE o_custkey NOT IN (
    SELECT c_custkey FROM customer
    WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000)
  UNION ALL
  SELECT 'except_distinct', COUNT(*) FROM (
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    EXCEPT
    SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
  UNION ALL
  SELECT 'intersect', COUNT(*) FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
  UNION ALL
  SELECT 'union_distinct', COUNT(*) FROM (
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey FROM orders WHERE o_orderpriority = '2-HIGH')
) ORDER BY op
"""


_FUZZY_L = ("anna", "johnny", "catherine", "bob", "zebra")
_FUZZY_R = ("ana", "jonny", "katherine", "rob", "zebras", "unrelated")


def q_string_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """§2.9 string-function breadth: case, trim/pad, substring,
    replace, concat, split, levenshtein — one projection, codegen'd.

    Fused (round 7): the FUZZY-JOIN leg — planted near-miss word lists
    through the blocked edit-distance join (operators/fuzzyjoin.py;
    the PassJoin segment blocking is lossless for edit distance, so
    the pair set equals the naive cross-join filter the oracle
    runs)."""
    from harness_aws_etl_pipeline_spark.operators.fuzzyjoin import (
        fuzzy_string_join,
    )

    fl = spark.createDataFrame([(w,) for w in _FUZZY_L], "lw string")
    fr = spark.createDataFrame([(w,) for w in _FUZZY_R], "rw string")
    pairs = fuzzy_string_join(fl, fr, "lw", "rw", max_dist=2)
    fs = F.concat_ws(
        ":", "lw", "rw", F.col("edit_dist").cast("string")
    )
    fuzzy_leg = pairs.agg(
        F.count(F.lit(1)).alias("fuzzy_pairs"),
        F.md5(F.concat_ws("|", F.array_sort(F.collect_list(fs)))).alias(
            "fuzzy_md5"
        ),
    )
    n = tables(spark, sf)["nation"]
    base = n.select(
        "n_nationkey",
        F.upper("n_name").alias("upper_name"),
        F.lower("n_name").alias("lower_name"),
        F.substring("n_name", 1, 3).alias("prefix3"),
        F.length("n_name").alias("name_len"),
        F.regexp_replace(F.col("n_name"), "[AEIOU]", "_").alias("devoweled"),
        F.concat_ws("-", F.col("n_name"), F.col("n_nationkey").cast("string")).alias(
            "tagged"
        ),
        F.levenshtein(F.col("n_name"), F.lit("UNITED STATES")).alias("lev_us"),
        F.size(F.split("n_name", " ")).alias("word_parts"),
    ).orderBy("n_nationkey")
    return base.crossJoin(F.broadcast(fuzzy_leg))


ORACLE_STRING_FUNCS = """
SELECT n_nationkey,
       UPPER(n_name) AS upper_name,
       LOWER(n_name) AS lower_name,
       SUBSTRING(n_name, 1, 3) AS prefix3,
       CAST(LENGTH(n_name) AS INT) AS name_len,
       regexp_replace(n_name, '[AEIOU]', '_', 'g') AS devoweled,
       n_name || '-' || CAST(n_nationkey AS VARCHAR) AS tagged,
       CAST(levenshtein(n_name, 'UNITED STATES') AS INT) AS lev_us,
       CAST(len(string_split(n_name, ' ')) AS INT) AS word_parts,
       fuzzy_pairs, fuzzy_md5
FROM nation
CROSS JOIN (
  SELECT COUNT(*) AS fuzzy_pairs,
         md5(string_agg(lw || ':' || rw || ':' || CAST(d AS VARCHAR),
             '|' ORDER BY lw || ':' || rw || ':' || CAST(d AS VARCHAR)))
           AS fuzzy_md5
  FROM (SELECT lw, rw, levenshtein(lw, rw) AS d
        FROM (VALUES ('anna'), ('johnny'), ('catherine'), ('bob'), ('zebra')) AS l(lw)
        CROSS JOIN (VALUES ('ana'), ('jonny'), ('katherine'), ('rob'), ('zebras'), ('unrelated')) AS r(rw)
        WHERE levenshtein(lw, rw) <= 2)
) fuzzy_arm
ORDER BY n_nationkey
"""


def q_date_funcs(spark: SparkSession, sf: str) -> DataFrame:
    """§2.9 date-function breadth: trunc, datediff, add_months,
    last_day, quarter, day-of-week — rolled up by month.

    Fused (round 7): the DATE-SPINE leg — per-priority daily order
    counts re-laid on the dense calendar axis
    (operators/timeseries.py:fill_date_gaps). Spine size, zero-filled
    hole count, and the md5 of every (priority, day, cnt) row are
    re-derived in DuckDB via generate_series.

    Fused (round 8): the HOLE-FILLING leg — the same dense axis with
    NULL holes, repaired by ``ffill`` AND ``interpolate_linear``
    (operators/timeseries.py). The interpolated value is the exact
    IEEE chain ``y0 + (y1-y0)·((x-x0)/(x1-x0))`` on the day axis,
    re-derived verbatim in DuckDB (IGNORE NULLS running windows), and
    hashed as a scaled long — edge NULLs render as '_'.

    Fused (round 9): the SEASONAL-DECOMPOSITION leg — weekly additive
    decompose of the dense daily series (operators/timeseries.py:
    seasonal_decompose), oracled through its exact integer layer
    (7-point window sums; interior detrended numerators v·7 − S per
    position) — the numeric_inference scale arm's sufficient-statistic
    discipline; float trend/seasonal/resid stay numpy-pinned in
    tests."""
    from harness_aws_etl_pipeline_spark.operators.timeseries import (
        ffill,
        fill_date_gaps,
        interpolate_linear,
    )

    o = tables(spark, sf)["orders"]
    daily = o.groupBy(
        "o_orderpriority", F.to_date("o_orderdate").alias("od")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    dense = fill_date_gaps(daily, "od", ["o_orderpriority"])
    s = F.concat_ws(
        ":",
        "o_orderpriority",
        F.col("od").cast("string"),
        F.col("cnt").cast("string"),
    )
    spine_leg = dense.agg(
        F.count(F.lit(1)).alias("spine_rows"),
        F.sum((F.col("cnt") == 0).cast("long")).alias("spine_zero_rows"),
        F.md5(F.concat_ws("|", F.array_sort(F.collect_list(s)))).alias(
            "spine_md5"
        ),
    )
    grp = ["o_orderpriority"]
    holes = fill_date_gaps(
        daily, "od", grp, fill={"cnt": None}
    ).withColumn("ffc", F.col("cnt"))
    repaired = ffill(
        interpolate_linear(holes, "od", ["cnt"], grp), "od", ["ffc"], grp
    )
    fs = F.concat_ws(
        ":",
        "o_orderpriority",
        F.col("od").cast("string"),
        F.coalesce(
            F.round(F.col("cnt") * 10_000).cast("long").cast("string"),
            F.lit("_"),
        ),
        F.coalesce(F.col("ffc").cast("string"), F.lit("_")),
    )
    fill_leg = repaired.agg(
        F.sum(F.col("cnt").isNotNull().cast("long")).alias("fill_known"),
        F.md5(F.concat_ws("|", F.array_sort(F.collect_list(fs)))).alias(
            "fill_md5"
        ),
    )
    d = F.to_date("o_orderdate")
    base = (
        o.select(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month_start"),
            F.quarter(d).alias("qtr"),
            F.dayofweek(d).alias("dow"),
            F.datediff(F.lit("2001-01-01").cast("date"), d).alias("days_to_2001"),
            F.last_day(d).alias("month_end"),
            F.add_months(d, 3).alias("plus3m"),
        )
        .groupBy("month_start")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.max("qtr").alias("qtr"),
            F.countDistinct("dow").alias("distinct_dows"),
            F.min("days_to_2001").alias("min_days_to_2001"),
            F.max("month_end").alias("month_end"),
            F.max("plus3m").alias("max_plus3m"),
        )
        .orderBy("month_start")
    )
    # SEASONAL-DECOMPOSITION leg (round 9): weekly additive decompose
    # of the dense global daily series (operators/timeseries.py:
    # seasonal_decompose — numpy-parity pinned in tests). The oracled
    # stats are the decomposition's EXACT integer layer, the same
    # discipline as numeric_inference's scale arm: trend numerator =
    # 7-point window sum S (the counts are already integers), interior
    # detrended numerator = v·7 − S, hashed per seasonal position.
    from pyspark.sql import Window

    gdaily = o.groupBy(F.to_date("o_orderdate").alias("od")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    gd = fill_date_gaps(gdaily, "od")
    wg = Window.orderBy("od")
    fr = wg.rowsBetween(-3, 3)
    seas_src = (
        gd.select("od", F.col("cnt").cast("long").alias("v"))
        .withColumn("_pos", ((F.row_number().over(wg) - 1) % 7).cast("int"))
        .withColumn("_s", F.sum("v").over(fr))
        .withColumn("_c", F.count("v").over(fr))
    )
    per_pos = (
        seas_src.where(F.col("_c") == 7)
        .groupBy("_pos")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v") * 7 - F.col("_s")).cast("long").alias("dsum"),
        )
    )
    ps = F.concat_ws(
        ":",
        F.col("_pos").cast("string"),
        F.col("n").cast("string"),
        F.col("dsum").cast("string"),
    )
    seas_leg = per_pos.agg(
        F.sum("n").cast("long").alias("seas_interior"),
        F.md5(F.concat_ws("|", F.array_sort(F.collect_list(ps)))).alias(
            "seas_md5"
        ),
    )
    return (
        base.crossJoin(F.broadcast(spine_leg))
        .crossJoin(F.broadcast(fill_leg))
        .crossJoin(F.broadcast(seas_leg))
    )


ORACLE_DATE_FUNCS = """
SELECT * FROM (
SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
       COUNT(*) AS order_cnt,
       CAST(MAX(EXTRACT(quarter FROM o_orderdate)) AS INT) AS qtr,
       COUNT(DISTINCT CAST(EXTRACT(dow FROM o_orderdate) AS INT)) AS distinct_dows,
       CAST(MIN(date_diff('day', CAST(o_orderdate AS DATE), DATE '2001-01-01')) AS INT)
         AS min_days_to_2001,
       MAX(last_day(CAST(o_orderdate AS DATE))) AS month_end,
       MAX(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)) AS max_plus3m
FROM orders GROUP BY 1
) base CROSS JOIN (
  -- the date-spine leg: per-priority daily counts on the dense axis
  WITH daily AS (SELECT o_orderpriority AS g, CAST(o_orderdate AS DATE) AS od,
                        COUNT(*) AS cnt
                 FROM orders GROUP BY 1, 2),
  b AS (SELECT MIN(od) AS mn, MAX(od) AS mx FROM daily),
  spine AS (SELECT CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS od
            FROM b),
  dom AS (SELECT DISTINCT g FROM daily),
  dense AS (SELECT dom.g, spine.od, COALESCE(daily.cnt, 0) AS cnt
            FROM dom CROSS JOIN spine
            LEFT JOIN daily ON daily.g = dom.g AND daily.od = spine.od),
  strs AS (SELECT g || ':' || CAST(od AS VARCHAR) || ':' || CAST(cnt AS VARCHAR) AS s,
                  cnt
           FROM dense)
  SELECT COUNT(*) AS spine_rows,
         CAST(SUM(CASE WHEN cnt = 0 THEN 1 ELSE 0 END) AS BIGINT) AS spine_zero_rows,
         md5(string_agg(s, '|' ORDER BY s)) AS spine_md5
  FROM strs
) spine_arm CROSS JOIN (
  -- the hole-filling leg: the dense axis with NULL holes, repaired by
  -- ffill AND linear interpolation on the day axis — the same IEEE
  -- chain y0 + (y1-y0)*((x-x0)/(x1-x0)) the Spark operator emits
  WITH daily2 AS (SELECT o_orderpriority AS g, CAST(o_orderdate AS DATE) AS od,
                         COUNT(*) AS cnt
                  FROM orders GROUP BY 1, 2),
  b2 AS (SELECT MIN(od) AS mn, MAX(od) AS mx FROM daily2),
  spine2 AS (SELECT CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS od
             FROM b2),
  dom2 AS (SELECT DISTINCT g FROM daily2),
  holes AS (SELECT dom2.g, spine2.od, daily2.cnt
            FROM dom2 CROSS JOIN spine2
            LEFT JOIN daily2 ON daily2.g = dom2.g AND daily2.od = spine2.od),
  w AS (SELECT g, od, cnt,
               CAST(cnt AS DOUBLE) AS y,
               CAST(date_diff('day', DATE '1970-01-01', od) AS DOUBLE) AS x,
               last_value(CAST(cnt AS DOUBLE) IGNORE NULLS) OVER back AS y0,
               last_value(CASE WHEN cnt IS NOT NULL
                 THEN CAST(date_diff('day', DATE '1970-01-01', od) AS DOUBLE) END
                 IGNORE NULLS) OVER back AS x0,
               first_value(CAST(cnt AS DOUBLE) IGNORE NULLS) OVER fwd AS y1,
               first_value(CASE WHEN cnt IS NOT NULL
                 THEN CAST(date_diff('day', DATE '1970-01-01', od) AS DOUBLE) END
                 IGNORE NULLS) OVER fwd AS x1,
               last_value(cnt IGNORE NULLS) OVER back AS ff
        FROM holes
        WINDOW back AS (PARTITION BY g ORDER BY od
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               fwd AS (PARTITION BY g ORDER BY od
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
  rep AS (SELECT g, od, ff,
                 CASE WHEN y IS NOT NULL THEN y
                      WHEN y0 IS NULL OR y1 IS NULL THEN NULL
                      ELSE y0 + (y1 - y0) * ((x - x0) / (x1 - x0)) END AS ip
          FROM w),
  fstr AS (SELECT ip,
                  g || ':' || CAST(od AS VARCHAR) || ':'
                    || COALESCE(CAST(CAST(ROUND(ip * 10000) AS BIGINT) AS VARCHAR), '_')
                    || ':' || COALESCE(CAST(ff AS VARCHAR), '_') AS s
           FROM rep)
  SELECT CAST(SUM(CASE WHEN ip IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS fill_known,
         md5(string_agg(s, '|' ORDER BY s)) AS fill_md5
  FROM fstr
) fill_arm CROSS JOIN (
  -- seasonal-decomposition arm: the weekly decompose's exact integer
  -- layer — 7-point window sums on the dense daily series, interior
  -- detrended numerators v*7 - S per seasonal position
  WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS od, COUNT(*) AS cnt
                 FROM orders GROUP BY 1),
  b2 AS (SELECT MIN(od) AS mn, MAX(od) AS mx FROM daily),
  spine2 AS (SELECT CAST(UNNEST(generate_series(mn, mx, INTERVAL 1 DAY)) AS DATE) AS od
             FROM b2),
  dense2 AS (SELECT spine2.od, COALESCE(daily.cnt, 0) AS v
             FROM spine2 LEFT JOIN daily ON spine2.od = daily.od),
  win AS (SELECT od, v,
                 CAST((ROW_NUMBER() OVER (ORDER BY od) - 1) % 7 AS INT) AS pos,
                 SUM(v) OVER fr AS s, COUNT(v) OVER fr AS c
          FROM dense2
          WINDOW fr AS (ORDER BY od ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
  inter AS (SELECT pos, v * 7 - s AS dn FROM win WHERE c = 7),
  pp AS (SELECT pos, COUNT(*) AS n, SUM(dn) AS dsum FROM inter GROUP BY 1),
  strs2 AS (SELECT CAST(pos AS VARCHAR) || ':' || CAST(n AS VARCHAR) || ':'
                   || CAST(dsum AS VARCHAR) AS s2
            FROM pp)
  SELECT CAST((SELECT SUM(n) FROM pp) AS BIGINT) AS seas_interior,
         md5(string_agg(s2, '|' ORDER BY s2)) AS seas_md5
  FROM strs2
) seas_arm
ORDER BY month_start
"""


def q_rollup_year_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Hierarchical ROLLUP (year → priority → grand total) — the
    drill-down companion to cube's full cross product."""
    o = tables(spark, sf)["orders"]
    return (
        o.withColumn("yr", F.year("o_orderdate"))
        .rollup("yr", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("order_cnt"),
            F.grouping_id("yr", "o_orderpriority").cast("int").alias("gid"),
        )
        .orderBy(
            F.col("gid"),
            F.col("yr").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORACLE_ROLLUP = """
SELECT yr, o_orderpriority, COUNT(*) AS order_cnt,
       CAST(GROUPING(yr, o_orderpriority) AS INT) AS gid
FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr, o_orderpriority
      FROM orders)
GROUP BY ROLLUP (yr, o_orderpriority)
ORDER BY gid, yr ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
"""


def q_grouping_sets(spark: SparkSession, sf: str) -> DataFrame:
    """Grouping-set breadth in one entry: CUBE (priority × status) and
    ROLLUP (year → priority) over orders, unioned under a common
    (src, dim1, dim2) shape with grouping_id distinguishing levels.
    Both remain single-shuffle Expand-based aggregates."""
    cube = q_cube_priority_status(spark, sf).select(
        F.lit("cube").alias("src"),
        F.col("o_orderpriority").alias("dim1"),
        F.col("o_orderstatus").alias("dim2"),
        "order_cnt",
        "gid",
    )
    roll = q_rollup_year_priority(spark, sf).select(
        F.lit("rollup").alias("src"),
        F.col("yr").cast("string").alias("dim1"),
        F.col("o_orderpriority").alias("dim2"),
        "order_cnt",
        "gid",
    )
    return cube.unionByName(roll).orderBy(
        "src",
        F.col("gid"),
        F.col("dim1").asc_nulls_first(),
        F.col("dim2").asc_nulls_first(),
    )


ORACLE_GROUPING_SETS = """
SELECT * FROM (
  SELECT 'cube' AS src, o_orderpriority AS dim1, o_orderstatus AS dim2,
         COUNT(*) AS order_cnt,
         CAST(GROUPING(o_orderpriority, o_orderstatus) AS INT) AS gid
  FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
  UNION ALL
  SELECT 'rollup', CAST(yr AS VARCHAR), o_orderpriority, COUNT(*),
         CAST(GROUPING(yr, o_orderpriority) AS INT)
  FROM (SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr, o_orderpriority
        FROM orders)
  GROUP BY ROLLUP (yr, o_orderpriority)
) ORDER BY src, gid, dim1 ASC NULLS FIRST, dim2 ASC NULLS FIRST
"""


def q_array_agg(spark: SparkSession, sf: str) -> DataFrame:
    """Array aggregation: sorted distinct collections per group
    (collect_set + array_sort) + element access."""
    n = tables(spark, sf)["nation"]
    r = tables(spark, sf)["region"]
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(F.array_sort(F.collect_set("n_name")).alias("nations"))
        .select(
            "r_name",
            F.size("nations").alias("nation_cnt"),
            F.element_at("nations", 1).alias("first_nation"),
            F.element_at("nations", -1).alias("last_nation"),
        )
        .orderBy("r_name")
    )


ORACLE_ARRAY_AGG = """
SELECT r_name,
       CAST(len(nations) AS INT) AS nation_cnt,
       nations[1] AS first_nation,
       nations[-1] AS last_nation
FROM (
  SELECT r_name, list_sort(list(DISTINCT n_name)) AS nations
  FROM nation JOIN region ON n_regionkey = r_regionkey
  GROUP BY r_name
) ORDER BY r_name
"""


def q_funnel(spark: SparkSession, sf: str) -> DataFrame:
    """G4-tier sequence analytics: signup → first subsequent click →
    first subsequent purchase funnel over the event stream. Staged
    conditional mins with join-back between stages (each stage is one
    grouped aggregate + one broadcast-sized join).

    Fused (round 8): the SEQUENCE legs — the first-order Markov
    transition matrix (counts + row-conditional probabilities scaled
    to exact longs) and the corpus trigram chains
    (operators/eventseq.py), both tie-broken on event_id and
    re-derived verbatim in DuckDB lag windows."""
    from harness_aws_etl_pipeline_spark.operators.eventseq import (
        event_ngrams,
        funnel_steps,
        transition_counts,
    )

    ev = tables(spark, sf)["events"]
    # the staged-conditional-min funnel is the OPERATOR now
    # (operators/eventseq.py:funnel_steps, round 8) — the oracle below
    # re-derives the same stages, so the refactor is value-pinned
    _DIMS = {
        1: "1_signed_up",
        2: "2_clicked_after",
        3: "3_purchased_after",
    }
    dim = F.col("name")
    for step, label in _DIMS.items():
        dim = F.when(F.col("step") == step, F.lit(label)).otherwise(dim)
    funnel = funnel_steps(
        ev, "user_id", "ts", "event_type", ["signup", "click", "purchase"]
    ).select(
        F.lit("funnel").alias("metric"),
        dim.alias("dim"),
        F.col("actors").alias("value"),
    )
    # weekly cohort retention: cohort = Monday-truncated week of the
    # user's first event; offsets 0-3 count distinct users from the
    # cohort active in cohort-week + offset. Two grouped aggregates +
    # one join — the classic BI retention matrix, here in long format
    # so it unions with the funnel stages under one verified entry.
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort")
    )
    weeks = ev.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    retention = (
        weeks.join(first, "user_id")
        .withColumn(
            "week_offset",
            F.floor(
                (F.unix_timestamp("wk") - F.unix_timestamp("cohort")) / (7 * 86400)
            ).cast("int"),
        )
        .filter(F.col("week_offset").between(0, 3))
        .groupBy("cohort", "week_offset")
        .agg(F.countDistinct("user_id").alias("value"))
        .select(
            F.lit("retention").alias("metric"),
            F.concat_ws(
                ":",
                F.date_format("cohort", "yyyy-MM-dd"),
                F.col("week_offset").cast("string"),
            ).alias("dim"),
            "value",
        )
    )
    trans = transition_counts(
        ev, "user_id", "ts", "event_type", tie_cols=["event_id"]
    )
    t_cnt = trans.select(
        F.lit("transition").alias("metric"),
        F.concat_ws(">", "prev_state", "state").alias("dim"),
        F.col("cnt").alias("value"),
    )
    t_p = trans.select(
        F.lit("transition_p").alias("metric"),
        F.concat_ws(">", "prev_state", "state").alias("dim"),
        F.floor(F.col("p") * F.lit(1e9)).cast("long").alias("value"),
    )
    tri = event_ngrams(
        ev, "user_id", "ts", "event_type", n=3, tie_cols=["event_id"]
    ).select(
        F.lit("trigram").alias("metric"),
        F.col("gram").alias("dim"),
        F.col("cnt").alias("value"),
    )
    return (
        funnel.unionByName(retention)
        .unionByName(t_cnt)
        .unionByName(t_p)
        .unionByName(tri)
        .orderBy("metric", "dim")
    )


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS t1 FROM events WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.t1 GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2 GROUP BY e.user_id
),
cohorts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort FROM events GROUP BY user_id
),
active AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
),
trans AS (
  SELECT prev_state, event_type AS state, COUNT(*) AS cnt FROM (
    SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS prev_state,
           event_type
    FROM events) t
  WHERE prev_state IS NOT NULL GROUP BY 1, 2
),
tri AS (
  SELECT p2 || '>' || p1 || '>' || event_type AS gram, COUNT(*) AS cnt FROM (
    SELECT LAG(event_type, 2) OVER w AS p2,
           LAG(event_type, 1) OVER w AS p1,
           event_type
    FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) t
  WHERE p2 IS NOT NULL GROUP BY 1
)
SELECT * FROM (
  SELECT 'funnel' AS metric, '1_signed_up' AS dim, (SELECT COUNT(*) FROM s1) AS value
  UNION ALL
  SELECT 'funnel', '2_clicked_after', (SELECT COUNT(*) FROM s2)
  UNION ALL
  SELECT 'funnel', '3_purchased_after', (SELECT COUNT(*) FROM s3)
  UNION ALL
  SELECT 'retention',
         strftime(c.cohort, '%Y-%m-%d') || ':' || CAST(
           CAST(FLOOR((epoch(a.wk) - epoch(c.cohort)) / 604800) AS INT) AS VARCHAR),
         COUNT(DISTINCT a.user_id)
  FROM active a JOIN cohorts c ON a.user_id = c.user_id
  WHERE FLOOR((epoch(a.wk) - epoch(c.cohort)) / 604800) BETWEEN 0 AND 3
  GROUP BY 2
  UNION ALL
  SELECT 'transition', prev_state || '>' || state, cnt FROM trans
  UNION ALL
  SELECT 'transition_p', prev_state || '>' || state,
         CAST(FLOOR(CAST(cnt AS DOUBLE)
                    / CAST(SUM(cnt) OVER (PARTITION BY prev_state) AS DOUBLE)
                    * 1e9) AS BIGINT)
  FROM trans
  UNION ALL
  SELECT 'trigram', gram, cnt FROM tri
) ORDER BY metric, dim
"""


GOLD_CATALOG: list[QuerySpec] = [
    QuerySpec("q3_shipping_priority", q_q3_shipping_priority, ORACLE_Q3,
              "TPC-H Q3 shape: filtered 3-way join + top-k", headline=True,
              tags=("gold", "join")),
    QuerySpec("q5_region_revenue", q_q5_region_revenue, ORACLE_Q5,
              "TPC-H Q5 shape: 6-way dimension-chain join", headline=True,
              tags=("gold", "join")),
    QuerySpec("pivot_returnflag", q_pivot_returnflag, ORACLE_PIVOT,
              "pivot cross-tab", tags=("gold",)),
    QuerySpec("grouping_sets", q_grouping_sets, ORACLE_GROUPING_SETS,
              "cube + rollup grouping sets", tags=("gold",)),
    QuerySpec("sql_entry", q_sql_entry, PORTABLE_REVENUE_SQL,
              "G3 SQL entry point (same SQL text both engines)",
              tags=("gold", "sql")),
    QuerySpec("window_ranks", q_window_ranks, ORACLE_WINDOW_RANKS,
              "rank/dense_rank/ntile/percent_rank/cume_dist", tags=("window",)),
    QuerySpec("relalg_counts", q_relalg_counts, ORACLE_RELALG_COUNTS,
              "join + set-operation cardinality panel", tags=("join", "setop")),
    QuerySpec("string_funcs", q_string_funcs, ORACLE_STRING_FUNCS,
              "string scalar-function breadth", tags=("scalar",)),
    QuerySpec("date_funcs", q_date_funcs, ORACLE_DATE_FUNCS,
              "date scalar-function breadth", tags=("scalar",)),
    QuerySpec("funnel", q_funnel, ORACLE_FUNNEL,
              "funnel stages + weekly cohort retention panel",
              tags=("gold", "events")),
    QuerySpec("array_agg", q_array_agg, ORACLE_ARRAY_AGG,
              "sorted distinct array aggregation", tags=("gold",)),
]

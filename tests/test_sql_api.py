"""The SQL API surface: registered views + spark.sql produce the same
plans/results as the DataFrame API (Catalyst parity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from oxford_data_pipeline_spark.sources.catalog import register_views, load_table
from tests.conftest import SF_DIR


def test_sql_equals_dataframe(spark):
    register_views(spark, SF_DIR)
    sql = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               count(*) AS n,
               round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        FROM lineitem
        WHERE l_quantity BETWEEN 5 AND 45
        GROUP BY 1, 2
        """
    )
    df = (
        load_table(spark, SF_DIR, "lineitem")
        .filter(F.col("l_quantity").between(5, 45))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
        )
    )
    assert sorted(map(tuple, sql.collect())) == sorted(map(tuple, df.collect()))


def test_sql_window_and_join(spark):
    register_views(spark, SF_DIR)
    out = spark.sql(
        """
        WITH ranked AS (
            SELECT c.c_nationkey, o.o_totalprice,
                   row_number() OVER (PARTITION BY c.c_nationkey
                                      ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        )
        SELECT c_nationkey, round(avg(o_totalprice), 2) AS top3_avg
        FROM ranked WHERE rn <= 3 GROUP BY 1
        """
    ).collect()
    assert out and all(r.top3_avg > 0 for r in out)

"""Table IO helpers: bucketed writes for co-located (shuffle-free) joins.

At 100 TB the places/cells/postings tables are written ONCE, bucketed on
their join keys, so every later join against them is exchange-free (the
Iceberg equivalent is a bucket partition transform; in this sandbox we use
Spark managed-table bucketing, which Catalyst recognizes the same way).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.format("parquet").saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def plan_has_shuffle(df: DataFrame) -> bool:
    """True if the physical plan contains a shuffle exchange (used by tests
    to prove bucketed joins are co-located)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" in plan or "Exchange rangepartitioning" in plan

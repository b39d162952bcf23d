"""As-of (temporal) join: enrich each event with the latest state row at or
before its timestamp, per key.

Spark has no ASOF JOIN operator; the naive range join (left.ts >= right.ts
+ window) explodes quadratically per key. This is the scalable
re-expression: UNION the two sides tagged by source, sort each key's
timeline once (ONE hash shuffle per side, partitioned by key — never a
global sort), and carry the last non-null state forward with a running
`last(ignorenulls)` window. Cost is O((|L|+|R|) log per-partition), the
same shape as sessionization; a hot key concentrates its timeline in one
task (same caveat and the same salting remedies as any keyed window).

The DuckDB oracle twin uses DuckDB's NATIVE `ASOF JOIN`, so the gate
checks this composition against an independent first-class implementation
of the semantics.

Tie rule: a state with right_ts == left_ts IS visible to that row
(backward-inclusive, matching ASOF JOIN's `>=`); among equal-key rows the
state sorts before the event at the same timestamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
) -> DataFrame:
    """All left columns + the right payload columns of the as-of match.

    `how="inner"` drops left rows with no state at or before them (ASOF
    JOIN default); `how="left"` keeps them with nulls. Right payload
    column names must not collide with left's (rename upstream).
    """
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    r = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_src"),
        F.struct(*[F.col(c) for c in rcols]).alias("_state"),
    )
    l = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_src"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_payload"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_src")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = (
        u.withColumn("_asof", F.last("_state", ignorenulls=True).over(w))
        .filter(F.col("_src") == 1)
    )
    if how == "inner":
        out = out.filter(F.col("_asof").isNotNull())
    elif how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    return out.select(
        *[F.col(f"_payload.{c}").alias(c) for c in left.columns],
        *[F.col(f"_asof.{c}").alias(c) for c in rcols],
    )

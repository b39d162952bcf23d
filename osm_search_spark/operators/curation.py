"""Corpus curation utilities for training-data pipelines.

Two operations every large-corpus pipeline needs downstream of dedup:

- `assign_split`: DETERMINISTIC train/val/test assignment by hashing the
  document id (salted md5 -> bucket in [0, 10000)). Hash-based splits are
  the only kind that survive reprocessing at scale: re-running the pipeline
  on a grown corpus never moves an old document across splits, independent
  of partitioning, ordering, or cluster size. Pure Column arithmetic
  (JVM md5 + conv), no shuffle, no RNG.

- `redact_pii`: scrub obvious PII spans (emails, long digit runs such as
  phone/account numbers) with RE2-compatible regexes so the same pattern
  text runs identically in Spark (Java regex) and the DuckDB oracle twin.
  Purely declarative `regexp_replace` — stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SPLIT_BUCKETS = 10000

# RE2-compatible (no lookarounds) — identical semantics in Java regex and
# DuckDB; keep in sync with redact_sql below.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
LONG_NUM_RE = r"[0-9]{9,}"


def split_bucket(id_col: Column | str, salt: str = "split") -> Column:
    """Stable bucket in [0, SPLIT_BUCKETS): first 8 hex chars of
    md5(salt ':' id) as an integer, mod bucket count."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    h = F.md5(F.concat(F.lit(salt + ":"), c.cast("string")))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") % SPLIT_BUCKETS
    ).alias("bucket")


def split_bucket_sql(id_expr: str, salt: str = "split") -> str:
    """DuckDB twin: '0x'||hex -> BIGINT (DuckDB has no conv)."""
    return (
        f"(('0x' || substr(md5('{salt}:' || cast({id_expr} as varchar)), 1, 8))"
        f"::bigint % {SPLIT_BUCKETS})"
    )


def assign_split(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Add (bucket, split) columns. Weights must sum to 1; boundaries are
    cumulative-weight bucket thresholds, so every id maps to exactly one
    split and the mapping never changes as the corpus grows."""
    weights = weights or {"train": 0.8, "val": 0.1, "test": 0.1}
    if abs(sum(weights.values()) - 1.0) > 1e-9:
        raise ValueError("split weights must sum to 1")
    out = df.withColumn("bucket", split_bucket(id_col, salt))
    expr, acc, prev_hi = None, 0.0, 0
    for name, w in weights.items():
        acc += w
        hi = round(acc * SPLIT_BUCKETS)
        if hi <= prev_hi:  # weight below bucket granularity -> empty split
            raise ValueError(
                f"split {name!r} weight {w} rounds to an empty bucket range "
                f"(< 1/{SPLIT_BUCKETS})"
            )
        prev_hi = hi
        cond = F.col("bucket") < hi
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return out.withColumn("split", expr)


def redact_pii(col: Column | str) -> Column:
    """Emails then long digit runs -> typed placeholders."""
    c = F.col(col) if isinstance(col, str) else col
    step1 = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(step1, LONG_NUM_RE, "<NUM>")


def redact_sql(expr: str) -> str:
    """DuckDB twin of redact_pii (note the explicit 'g' flag — DuckDB
    replaces only the first match by default, Spark replaces all)."""
    return (
        f"regexp_replace(regexp_replace({expr}, '{EMAIL_RE}', '<EMAIL>', 'g'),"
        f" '{LONG_NUM_RE}', '<NUM>', 'g')"
    )

"""As-of (temporal) join: enrich each event with the latest state row at or
before its timestamp, per key.

Spark has no ASOF JOIN operator; the naive range join (left.ts >= right.ts
+ window) explodes quadratically per key. This is the scalable
re-expression: UNION the two sides tagged by source, sort each key's
timeline once (ONE hash shuffle per side, partitioned by key — never a
global sort), and carry the last non-null state forward with a running
`last(ignorenulls)` window. Cost is O((|L|+|R|) log per-partition), the
same shape as sessionization.

Hot keys: a key's whole timeline lands in one task under the plain keyed
window. `n_salt` enables the two-phase remedy: each key's timeline is cut
into `n_salt` contiguous TIME chunks (per-key min/max + proportional
bucketing — contiguity is what lets running state compose), the running
window runs per (key, chunk) — the hot key now spreads over n_salt tasks —
and chunk-boundary state is carried by a second running window over the
TINY per-(key, chunk) final-state frame (n_salt rows per key), joined
back and coalesced under the chunk-local state. Identical output to the
unsalted plan (tested, including the tie rule).

The DuckDB oracle twin uses DuckDB's NATIVE `ASOF JOIN`, so the gate
checks this composition against an independent first-class implementation
of the semantics.

Tie rule: a state with right_ts == left_ts IS visible to that row
(backward-inclusive, matching ASOF JOIN's `>=`); among equal-key rows the
state sorts before the event at the same timestamp. Equal timestamps land
in the same time chunk, so salting preserves the rule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _internal_names(taken: set[str], *bases: str) -> list[str]:
    """Working-column names guaranteed not to collide with user columns."""
    out = []
    for b in bases:
        name = b
        while name in taken:
            name = "_" + name
        taken = taken | {name}
        out.append(name)
    return out


def _sortable_ts(col, dtype: str):
    """A numeric image of the timestamp column for chunk arithmetic
    (timestamp_ntz can't cast straight to long — via ltz; session tz is
    pinned UTC in session.py)."""
    if dtype.startswith("timestamp"):
        return F.unix_micros(col.cast("timestamp")).cast("double")
    return col.cast("double")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    how: str = "inner",
    n_salt: int | None = None,
) -> DataFrame:
    """All left columns + the right payload columns of the as-of match.

    `how="inner"` drops left rows with no state at or before them (ASOF
    JOIN default); `how="left"` keeps them with nulls. Right payload
    column names must not collide with left's (rename upstream; raises).
    `n_salt`: split each key's timeline into that many contiguous time
    chunks so a hot key's running window spreads over n_salt tasks —
    output is identical to the unsalted plan.
    """
    rcols = [c for c in right.columns if c not in (on, right_ts)]
    if not rcols:
        raise ValueError(
            "asof_join: right side has no payload columns beyond the key "
            f"({on!r}) and timestamp ({right_ts!r}) — add the state "
            "column(s) to enrich with"
        )
    clash = set(rcols) & set(left.columns)
    if clash:
        raise ValueError(
            f"asof_join: right payload column(s) {sorted(clash)} collide "
            "with left columns — rename upstream"
        )
    taken = set(left.columns) | set(right.columns)
    K, T, SRC, STATE, PAYLOAD, ASOF = _internal_names(
        taken, "_k", "_t", "_src", "_state", "_payload", "_asof"
    )
    r = right.select(
        F.col(on).alias(K),
        F.col(right_ts).alias(T),
        F.lit(0).alias(SRC),
        F.struct(*[F.col(c) for c in rcols]).alias(STATE),
    )
    left_dtypes = dict(left.dtypes)
    l = left.select(
        F.col(on).alias(K),
        F.col(left_ts).alias(T),
        F.lit(1).alias(SRC),
        F.struct(*[F.col(c) for c in left.columns]).alias(PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True)

    if n_salt is None or n_salt <= 1:
        w = (
            Window.partitionBy(K)
            .orderBy(T, SRC)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = u.withColumn(ASOF, F.last(STATE, ignorenulls=True).over(w))
    else:
        out = _salted_running_last(
            u, K, T, SRC, STATE, ASOF, n_salt,
            ts_dtype=left_dtypes[left_ts],
        )

    out = out.filter(F.col(SRC) == 1)
    if how == "inner":
        out = out.filter(F.col(ASOF).isNotNull())
    elif how != "left":
        raise ValueError("how must be 'inner' or 'left'")
    return out.select(
        *[F.col(f"{PAYLOAD}.{c}").alias(c) for c in left.columns],
        *[F.col(f"{ASOF}.{c}").alias(c) for c in rcols],
    )


def _chunked(u: DataFrame, K: str, T: str, n_salt: int, ts_dtype: str, CH: str):
    """Add a contiguous time-chunk id in [0, n_salt): per-key min/max
    (one tiny map-side-combined agg) + proportional bucketing. Equal
    timestamps share a chunk; chunk order == time order, which is what
    lets running state compose across chunks."""
    tn = _sortable_ts(F.col(T), ts_dtype)
    MN, MX = _internal_names({K, T, CH}, "_mn", "_mx")
    stats = (
        u.select(K, tn.alias("_tnum"))
        .groupBy(K)
        .agg(F.min("_tnum").alias(MN), F.max("_tnum").alias(MX))
    )
    span = F.col(MX) - F.col(MN)
    chunk = F.when(span <= 0, F.lit(0)).otherwise(
        F.least(
            F.lit(n_salt - 1),
            F.floor((tn - F.col(MN)) * n_salt / span).cast("int"),
        )
    )
    return u.join(stats, K).withColumn(CH, chunk).drop(MN, MX)


def _salted_running_last(
    u: DataFrame, K: str, T: str, SRC: str, STATE: str, ASOF: str,
    n_salt: int, ts_dtype: str,
) -> DataFrame:
    CH = _internal_names({K, T, SRC, STATE, ASOF}, "_chunk")[0]
    # NULL join keys: the unsalted window groups all-null keys into ONE
    # partition (SQL window semantics), but _chunked's stats equi-join is
    # not null-safe and would silently drop them. Route null-key rows
    # through the plain running window and union them back — output stays
    # identical to the unsalted plan. (A null key is by definition not a
    # hot SALTABLE key for this remedy; if all-null is itself the hot key,
    # filter upstream.)
    nulls = u.filter(F.col(K).isNull())
    u = u.filter(F.col(K).isNotNull())
    w_null = (
        Window.partitionBy(K)
        .orderBy(T, SRC)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    null_out = nulls.withColumn(
        ASOF, F.last(STATE, ignorenulls=True).over(w_null)
    )
    # materialize the chunk assignment ONCE: three subtrees consume it
    # (the local window, the chunk-final aggregate, the chunk grid) and
    # would otherwise each recompute the scan + stats join
    chunked = _chunked(u, K, T, n_salt, ts_dtype, CH).localCheckpoint(
        eager=True
    )
    # phase A: running last WITHIN each (key, chunk) — the hot key's
    # timeline now spans n_salt tasks
    wa = (
        Window.partitionBy(K, CH)
        .orderBy(T, SRC)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = chunked.withColumn(ASOF, F.last(STATE, ignorenulls=True).over(wa))
    # phase B: chunk-final states (latest right row per (key, chunk)) —
    # a TINY frame (≤ n_salt rows per key); running-last + shift gives
    # the state entering each chunk from everything before it
    finals = (
        chunked.filter(F.col(SRC) == 0)
        .groupBy(K, CH)
        .agg(F.max_by(STATE, F.struct(T, SRC)).alias("_final"))
    )
    wb = (
        Window.partitionBy(K)
        .orderBy(CH)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # boundary state must exist for EVERY chunk (not just chunks that
    # contain right rows): build the full (key, chunk) grid from the
    # chunks actually present, left-join finals onto it
    grid = chunked.select(K, CH).distinct()
    bounds = (
        grid.join(finals, [K, CH], "left")
        .withColumn("_carry", F.last("_final", ignorenulls=True).over(wb))
        .select(K, CH, "_carry")
    )
    salted = (
        local.join(bounds, [K, CH], "left")
        .withColumn(ASOF, F.coalesce(F.col(ASOF), F.col("_carry")))
        .drop(CH, "_carry")
    )
    return salted.unionByName(null_out)

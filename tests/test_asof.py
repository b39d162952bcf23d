"""As-of join semantics: backward-inclusive ties, inner/left, per-key."""

import pytest

from osm_search_spark.operators.asof import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    left = spark.createDataFrame(
        [
            (1, 10, "a"), (1, 20, "b"), (1, 5, "c"),
            (2, 15, "d"),
            (3, 99, "e"),  # key with no states at all
        ],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10, 100.0), (1, 18, 200.0), (2, 15, 300.0)],
        "k long, ts long, sv double",
    )
    return left, right


def test_asof_inner(spark, frames):
    left, right = frames
    got = {
        r["tag"]: (r["sv"])
        for r in asof_join(left, right, on="k", how="inner").collect()
    }
    # tag a: ts=10 ties state ts=10 -> inclusive; tag b: latest <= 20 is 18;
    # tag c: ts=5 has no prior state -> dropped; tag d: equal-ts tie;
    # tag e: keyless -> dropped
    assert got == {"a": 100.0, "b": 200.0, "d": 300.0}


def test_asof_left_keeps_unmatched(spark, frames):
    left, right = frames
    rows = asof_join(left, right, on="k", how="left").collect()
    got = {r["tag"]: r["sv"] for r in rows}
    assert got["c"] is None and got["e"] is None
    assert len(rows) == 5


def test_asof_how_validated(spark, frames):
    left, right = frames
    with pytest.raises(ValueError):
        asof_join(left, right, on="k", how="outer").collect()


def test_asof_salted_matches_unsalted_on_hot_key(spark):
    # one key holds 90% of rows; n_salt must spread its timeline over >1
    # (key, chunk) window partition and return identical output
    import random

    rng = random.Random(7)
    left_rows, right_rows = [], []
    for i in range(900):
        left_rows.append((1, rng.randrange(0, 100_000), f"hot{i}"))
    for i in range(100):
        left_rows.append((2 + i % 10, rng.randrange(0, 100_000), f"cold{i}"))
    for i in range(200):
        right_rows.append((1, rng.randrange(0, 100_000), float(i)))
    for i in range(30):
        right_rows.append((2 + i % 10, rng.randrange(0, 100_000), 1000.0 + i))
    left = spark.createDataFrame(left_rows, "k long, ts long, tag string")
    right = spark.createDataFrame(right_rows, "k long, ts long, sv double")

    for how in ("inner", "left"):
        base = sorted(
            map(tuple, asof_join(left, right, on="k", how=how).collect())
        )
        salted = sorted(
            map(
                tuple,
                asof_join(left, right, on="k", how=how, n_salt=8).collect(),
            )
        )
        assert salted == base and len(base) > 0

    # the hot key's rows really span >1 chunk (i.e. >1 window partition)
    from pyspark.sql import functions as F

    from osm_search_spark.operators import asof as A

    u = left.select(
        F.col("k").alias("_k"), F.col("ts").alias("_t"),
        F.lit(1).alias("_src"),
    )
    chunks = (
        A._chunked(u, "_k", "_t", 8, "bigint", "_chunk")
        .filter(F.col("_k") == 1)
        .select("_chunk")
        .distinct()
        .count()
    )
    assert chunks > 1


def test_asof_salted_keeps_null_keys(spark):
    # NULL join keys: the unsalted window groups all-null keys into one
    # partition (null events see null-key states); the salted path's
    # stats equi-join is not null-safe and used to silently DROP them —
    # salted output must stay identical to unsalted for both `how`s
    left = spark.createDataFrame(
        [(1, 10, "a"), (None, 5, "n1"), (None, 20, "n2"), (2, 7, "b")],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, 3, 1.0), (None, 8, 99.0), (2, 9, 2.0)],
        "k long, ts long, sv double",
    )
    for how in ("inner", "left"):
        base = sorted(
            map(tuple, asof_join(left, right, on="k", how=how).collect()),
            key=str,
        )
        salted = sorted(
            map(
                tuple,
                asof_join(left, right, on="k", how=how, n_salt=4).collect(),
            ),
            key=str,
        )
        assert salted == base
        # the null-key event after the null-key state must be enriched
        if how == "left":
            assert (None, 20, "n2", 99.0) in salted
            assert (None, 5, "n1", None) in salted


def test_asof_salted_tie_rule_preserved(spark):
    # equal timestamps land in one chunk; the backward-inclusive tie rule
    # must survive salting even when the tie sits at a chunk boundary
    left = spark.createDataFrame(
        [(1, t, f"e{t}") for t in range(0, 40)],
        "k long, ts long, tag string",
    )
    right = spark.createDataFrame(
        [(1, t, float(t)) for t in range(0, 40, 5)],
        "k long, ts long, sv double",
    )
    base = sorted(map(tuple, asof_join(left, right, on="k").collect()))
    salted = sorted(
        map(tuple, asof_join(left, right, on="k", n_salt=7).collect())
    )
    assert salted == base


def test_asof_empty_right_payload_raises(spark, frames):
    left, right = frames
    with pytest.raises(ValueError, match="no payload columns"):
        asof_join(left, right.select("k", "ts"), on="k")


def test_asof_payload_collision_raises(spark, frames):
    left, right = frames
    bad = right.withColumnRenamed("sv", "tag")  # collides with left.tag
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, bad, on="k")


def test_asof_internal_names_never_collide(spark):
    # user columns named like the working columns must pass through intact
    left = spark.createDataFrame(
        [(1, 10, "x", "y")], "k long, ts long, _k string, _asof string"
    )
    right = spark.createDataFrame(
        [(1, 5, 7.0)], "k long, ts long, _state double"
    )
    rows = asof_join(left, right, on="k").collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["_k"] == "x" and r["_asof"] == "y" and r["_state"] == 7.0

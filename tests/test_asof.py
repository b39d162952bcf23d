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

"""Streaming sketches: the committed cross-micro-batch sketch must equal
the batch sketch of ALL rows — the exact-merge property means streaming
adds zero approximation."""

import json

from osm_search_spark.functions import countmin as cm
from osm_search_spark.functions import sketch as hll
from osm_search_spark.streaming.sketch_stream import (
    read_sketch,
    start_cms_stream,
    start_hll_stream,
)


def _write_batches(src, n_files=3, per=200):
    for f in range(n_files):
        rows = [
            # overlapping values across batches (dups must not re-count)
            json.dumps({"v": f"val-{(f * per // 2) + i}"})
            for i in range(per)
        ]
        (src / f"b{f}.json").write_text("\n".join(rows))


def test_streaming_hll_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batches(src)
    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    table = str(tmp_path / "hll")
    q = start_hll_stream(stream, table, str(tmp_path / "ck1"), "v", p=9)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, read_sketch(spark, table).collect()))
    batch = spark.read.schema("v string").json(str(src))
    want = sorted(map(tuple, hll.hll_registers(batch, "v", p=9).collect()))
    assert got == want and len(want) > 100
    # and the estimate is sane for the true distinct count (400 uniques)
    est = hll.hll_estimate(read_sketch(spark, table), p=9)
    assert abs(est - 400) / 400 < 0.2, est


def test_streaming_cms_equals_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    _write_batches(src)
    stream = (
        spark.readStream.schema("v string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    table = str(tmp_path / "cms")
    q = start_cms_stream(stream, table, str(tmp_path / "ck2"), "v", w=512, d=3)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, read_sketch(spark, table).collect()))
    batch = spark.read.schema("v string").json(str(src))
    want = sorted(map(tuple, cm.cms_build(batch, "v", w=512, d=3).collect()))
    assert got == want and len(want) > 100

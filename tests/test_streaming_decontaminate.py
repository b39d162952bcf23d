"""Streaming decontamination: committed verdicts across micro-batches
equal the batch decontaminate_flags of all ingested rows."""

import json

from osm_search_spark.operators.decontaminate import decontaminate_flags
from osm_search_spark.streaming.decontaminate_stream import (
    read_verdicts,
    start_decontaminate_stream,
)

RUN = "alpha bravo charlie delta echo foxtrot golf hotel india juliett kilo lima mike"


def _doc(i):
    if i % 5 == 0:
        return dict(doc_id=i, text=f"doc {i} copies the span {RUN} verbatim")
    return dict(doc_id=i, text=f"doc {i} is clean filler text with its own words {i}")


def test_streaming_verdicts_match_batch(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    (src / "b1.json").write_text(
        "\n".join(json.dumps(_doc(i)) for i in range(0, 12))
    )
    bench = spark.createDataFrame(
        [(900, f"benchmark item with {RUN} inside"),
         (901, "unrelated benchmark question")],
        "bench_id long, text string",
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    table = str(tmp_path / "verdicts")
    q = start_decontaminate_stream(stream, bench, table, str(tmp_path / "ck"))
    try:
        q.processAllAvailable()
        (src / "b2.json").write_text(
            "\n".join(json.dumps(_doc(i)) for i in range(12, 25))
        )
        q.processAllAvailable()
        got = sorted(map(tuple, read_verdicts(spark, table).collect()))
    finally:
        q.stop()
    all_docs = spark.createDataFrame(
        [_doc(i) for i in range(25)], "doc_id long, text string"
    )
    want = sorted(map(tuple, decontaminate_flags(all_docs, bench, n=13).collect()))
    assert got == want
    assert any(r[1] for r in got) and any(not r[1] for r in got)

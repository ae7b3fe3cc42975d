"""End-to-end image-table curation over a mixed-format crawl batch:
the r6 image operator stack chained the way a 100 TB pipeline would
run it — cheapest filter first, decode last, nothing ever fails a task.

    images --header probe (no decode)--> resolution/format gate
           --quarantine split--> undecodable rows diverted
           --quality signals (one decode pass)--> blur/exposure gate
           --perceptual-hash near-dup--> keeper per duplicate cluster
           --WebDataset tar shards--> the container trainers stream

Run:  python examples/image_curation_example.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from irivermetrics_spark import codecs  # noqa: E402
from irivermetrics_spark.kernels import gif, jpeg, png, wav  # noqa: E402
from irivermetrics_spark.operators import dedup, multimodal  # noqa: E402
from irivermetrics_spark.session import get_spark  # noqa: E402


def _make_batch():
    """A deterministic crawl batch: two artwork families re-encoded
    across codecs (near-dups — including a real GIF since late r6), a
    blurry/flat image, a letterboxed one, a low-res thumbnail, an
    audio payload in the image column, a header-only gif and a corrupt
    payload."""
    rng = np.random.default_rng(7)
    rows = []

    def art(seed, h=64, w=96):
        r = np.random.default_rng(seed)
        base = r.integers(0, 180, (h // 8, w // 8)).astype(np.float64)
        img = np.kron(base, np.ones((8, 8)))  # blocky texture
        return np.stack([img, img * 0.9, img * 1.1]).clip(0, 255).astype(np.uint8)

    for fam in (0, 1):
        a = art(fam)
        rows.append((f"f{fam}_png", png.encode_png(a), "png"))
        rows.append((f"f{fam}_jpeg", jpeg.encode_baseline(a, quality=95), "jpeg"))
        a16 = (a.astype(np.uint16) * 78)  # same artwork in the engine domain
        rows.append((f"f{fam}_raw16", codecs.encode_image(a16, "raw16"), "raw16"))
    # the same artwork as a real GIF: its 8x8 blocks quantize losslessly
    # into a <=256-color palette, so it lands in family 0's dup cluster
    rows.append(("f0_gif", gif.encode_gif(art(0).astype(np.uint16)), "gif"))

    flat = np.full((3, 64, 96), 120, np.uint8)
    rows.append(("flat", png.encode_png(flat), "png"))
    boxed = art(5)
    boxed[:, :16, :] = 0
    boxed[:, -16:, :] = 0
    rows.append(("letterboxed", png.encode_png(boxed), "png"))
    thumb = art(6, h=16, w=24)
    rows.append(("thumb", png.encode_png(thumb), "png"))
    # decodable format, but header-only (no image descriptor): the
    # frame gate diverts it (n_frames = 0)
    rows.append(("gif_headeronly", b"GIF89a" + (320).to_bytes(2, "little")
                 + (200).to_bytes(2, "little") + bytes(10), "gif"))
    # audio in the image column: sniffs as wav, not decodable as image
    rows.append(("audio", wav.write_wav(
        np.arange(500, dtype=np.int16), 8000), "wav"))
    rows.append(("corrupt", bytes(rng.integers(0, 256, 64, dtype=np.uint8)), "png"))
    return rows


def main() -> None:
    spark = get_spark("image_curation", master="local[8]", shuffle_partitions=16)
    import pandas as pd

    batch = spark.createDataFrame(
        pd.DataFrame(_make_batch(), columns=["image_id", "bytes", "fmt"]))
    n0 = batch.count()

    # 1. header-only probe: format + resolution gate BEFORE any decode
    info = multimodal.with_image_info(batch)
    sized = info.where("decodable AND width >= 32 AND height >= 32 AND n_frames = 1")
    n_diverted = n0 - sized.count()

    # 2. one decode pass -> seven quality signals; gate blur/flat/
    #    letterbox (decode failures quarantine, never fail the task)
    q = multimodal.with_image_quality(sized, on_error="quarantine")
    good = q.where("error IS NULL AND sharpness > 1e-4 AND entropy > 1.0 "
                   "AND border_frac < 0.25")
    kept = sized.join(good.select("image_id"), "image_id")
    n1 = kept.count()

    # 3. perceptual-hash near-dup -> min-id keeper per cluster
    pairs = multimodal.phash_neardup(kept, max_hamming=6)
    keepers = dedup.keep_canonical(
        kept.select(F.col("image_id").alias("doc_id")),
        pairs.select("id_a", "id_b"),
        "doc_id")
    n2 = keepers.count()

    # 4. curated survivors -> deterministic WebDataset tar shards
    #    (image payload + caption sidecar per sample; re-runs emit
    #    bit-identical shards)
    import tempfile

    from irivermetrics_spark.operators import webdataset as wds

    final = (kept.join(keepers.select(F.col("doc_id").alias("image_id")),
                       "image_id")
             .withColumn("txt", F.concat(F.lit("caption for "), "image_id")
                         .cast("binary"))
             .select(F.col("image_id").alias("key"),
                     F.col("bytes").alias("img"), "txt"))
    outdir = tempfile.mkdtemp(prefix="wds_")
    manifest = wds.write_webdataset(final, outdir, n_shards=2,
                                    payload_cols=["img", "txt"])
    shards = manifest.orderBy("shard").collect()

    print(f"\ncrawl batch: {n0} -> probe-gated {n0 - n_diverted} "
          f"(diverted {n_diverted}: audio/header-only-gif/corrupt/low-res) "
          f"-> quality-kept {n1} -> near-dup keepers {n2} "
          f"-> {len(shards)} tar shards "
          f"({sum(s.n_samples for s in shards)} samples, "
          f"{sum(s.n_bytes for s in shards)} bytes) in {outdir}")
    print(q.select("image_id", F.round("sharpness", 4).alias("sharpness"),
                   F.round("entropy", 2).alias("entropy"),
                   F.round("border_frac", 2).alias("border_frac"), "error")
          .orderBy("image_id").toPandas().to_string(index=False))
    spark.stop()


if __name__ == "__main__":
    main()

"""Structured-Streaming ingest: module 1 as a continuous pipeline.

The reference has no streaming surface (SURVEY.md §2.10) — batch parity
never needs this. But the natural production shape of module 1 at
10^12-image scale is an append-only stream: new scenes land in the
image table; `readStream` decodes them incrementally and appends mask
points to the (date-partitioned) mask table, exactly the table module 2
reads. Checkpointing gives exactly-once file-level processing; the
decode kernel is the same mapInPandas used in batch (lazy plans are
stream-compatible by construction).

Run with trigger=availableNow for catch-up batches, or processingTime
for continuous ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from ..operators import decode

IMAGE_SCHEMA = T.StructType(
    [
        T.StructField("image_id", T.StringType(), False),
        T.StructField("bytes", T.BinaryType(), False),
        T.StructField("w", T.IntegerType(), False),
        T.StructField("h", T.IntegerType(), False),
        T.StructField("fmt", T.StringType(), False),
        T.StructField("caption", T.StringType(), False),
        T.StructField("phash", T.LongType(), False),
    ]
)


def stream_decode(spark: SparkSession, images_path: str, grid: dict, res: int = 9,
                  on_undecodable: str = "raise") -> DataFrame:
    """readStream on the image table directory -> streaming mask points.

    ``on_undecodable="quarantine"``: a bad payload (lossy-VP8 webp,
    truncated bytes) emits a QUARANTINE_MARKER row instead of killing
    the micro-batch — at crawl scale a stream must never wedge on one
    row. Filter the sink with decode.drop_quarantined / route
    decode.quarantined to a dead-letter sink."""
    stream = spark.readStream.schema(IMAGE_SCHEMA).parquet(images_path)
    return decode.decode_points(stream, grid, res=res, on_undecodable=on_undecodable)


def start_mask_sink(points: DataFrame, mask_path: str, checkpoint_path: str,
                    available_now: bool = True):
    """Append mask points to the module-2 input table (K1 sink)."""
    writer = (
        points.writeStream.format("parquet")
        .option("path", mask_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
        .partitionBy("date")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


BINARY_FILE_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType(), False),
        T.StructField("modificationTime", T.TimestampType(), False),
        T.StructField("length", T.LongType(), False),
        T.StructField("content", T.BinaryType(), False),
    ]
)


def stream_nc_decode(spark: SparkSession, nc_path: str, grid: dict, res: int = 9,
                     corridor_rings: list | None = None, var: str = "water",
                     aoi: tuple[list, float] | None = None) -> DataFrame:
    """readStream over a directory of classic NetCDF water-mask cubes ->
    streaming mask points (the reference's entry format, served
    incrementally).

    The ``binaryFile`` source is a FileFormat, so Spark's
    FileStreamSource tails the directory with the same exactly-once
    file-tracking as the parquet image stream; each micro-batch decodes
    its new cubes through the SAME distributed kernel as the batch path
    (operators/ncingest.nc_mask_points — one task per cube, shared
    emit_mask_rows contract), so batch and stream cannot diverge."""
    from ..operators import ncingest

    stream = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.[nN][cC]")
        .load(nc_path)
    )
    return ncingest.nc_mask_points(stream, grid, res=res,
                                   corridor_rings=corridor_rings, var=var, aoi=aoi)


def stream_tif_mask_decode(spark: SparkSession, tif_path: str, grid: dict, res: int = 9,
                           corridor_rings: list | None = None,
                           aoi: tuple[list, float] | None = None) -> DataFrame:
    """Same, for a directory of per-date YYYY-MM-DD.tif masks (the K1
    module-1 export): the streaming serving layer accepts every mask
    container the batch path accepts."""
    from ..operators import ncingest

    stream = (
        spark.readStream.format("binaryFile")
        .schema(BINARY_FILE_SCHEMA)
        .option("pathGlobFilter", "*.[tT][iI][fF]*")
        .option("recursiveFileLookup", "true")
        .load(tif_path)
    )
    return ncingest.tif_mask_points(stream, grid, res=res,
                                    corridor_rings=corridor_rings, aoi=aoi)

"""Tumbling-window aggregation — batch and streaming forms.

The reference's temporal bucketing (A1, /root/reference/
earth_data_kit/stitching/engines/commons.py:37-54) is tumbling-window
grouping; the reference is batch-only (SURVEY.md §2.9), so the batch
form is the fixture-checked one, and the streaming form demonstrates
the same plan under ``readStream`` with a watermark for late data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def tumbling_agg(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """groupBy(window(ts)) count/sum per event_type (epoch-aligned
    buckets — Spark window() semantics; for the reference's
    start-anchored buckets use operators.discover.bucket_temporally)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("bucket"),
            "event_type",
            "n",
            "total_value",
        )
    )


def tumbling_agg_stream(
    spark: SparkSession,
    parquet_dir: str,
    schema: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    query_name: str = "events_windowed",
):
    """The same aggregation as a streaming query over a parquet
    directory source; memory sink for synchronous smoke runs
    (q.processAllAvailable()).  Returns the StreamingQuery."""
    stream = spark.readStream.schema(schema).parquet(parquet_dir)
    agg = (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("bucket"), "event_type", "n", "total_value")
    )
    return (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName(query_name)
        .start()
    )

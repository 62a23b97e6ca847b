"""Partition-sizing helpers.

Single-file parquet inputs give 1-2 partitions; any Arrow-UDF or
wide stage downstream then runs on 1-2 cores no matter the cluster
size.  ``ensure_parallelism`` widens such inputs to the session's
default parallelism before compute-heavy stages.  At 100 TB inputs
are naturally many-hundreds-of-partitions, so the repartition is a
no-op there (guarded by the current partition count).

Reference analog: the chunk-size heuristic the reference tunes for
blocked reads (SURVEY.md F14, dataset.py:898-912) — partition sizing
dominates task count (BASELINE.md lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition narrow inputs up to the session parallelism.

    The width probe is ``inputFiles()`` (a catalog listing) rather
    than ``df.rdd.getNumPartitions()`` — the RDD conversion forces a
    second full physical planning of the query per call, and this
    helper sits at every dedup/similarity entry point.  A file-backed
    table with ≥ target/2 files is already wide (100 TB tables have
    thousands of files); fewer files — or a non-file source like a
    local relation — repartitions, which is exactly the
    single-file-parquet case this guards against."""
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files < max(2, target // 2):
        return df.repartition(target)
    return df

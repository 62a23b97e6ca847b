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
    sc = df.sparkSession.sparkContext
    target = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df

"""End-to-end production pipeline, runnable via spark-submit:

    spark-submit --py-files edk_spark.zip jobs/pipeline.py \
        --sf-dir /root/testdata/sf0.01 --base-dir /tmp/edk_job \
        --job-id demo --reps 8

Stages (each checkpointed to parquet + lineage rows; a re-run after a
crash resumes from the last committed partition — north_rule
"resumable from checkpoint with per-partition lineage + metrics"):

  1. ingest    — synthesize/load the pages table (url, warc_ts, html,
                 text, lang), partitioned by coarse cell prefix
  2. geocode   — extract text from html (pinned UDF), geocode, assign
                 quadgrid cell at CELL_RES; partition key = parent
                 cell at res PART_RES (spatial locality for later
                 joins and pruning)
  3. pip_join  — cell-prefilter broadcast PIP join vs country
                 polygons; per-country counts to the metrics table
  4. knn       — kNN for the configured query points
  5. metrics   — per-stage row counts / checksums / wall-ms appended
                 to {base}/lineage (queryable DataFrame)

On a real cluster the parquet writes become Iceberg `writeTo` calls —
the seam is plans/lineage.py (SURVEY.md §7.4-6).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pyspark.sql import functions as F  # noqa: E402

PART_RES = 2  # coarse parent cell → partition key (32 cols × 4 rows)
CELL_RES = 7


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--base-dir", default="/tmp/edk_job")
    ap.add_argument("--job-id", default="job1")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument("--fail-after-stage", default=None, help="test hook: crash after stage N")
    args = ap.parse_args(argv)

    from earth_data_kit_spark.functions.columns import cell_id_col
    from earth_data_kit_spark.functions.udfs import extract_geocode_udf
    from earth_data_kit_spark.operators import spatial_join as sj
    from earth_data_kit_spark.operators.knn import knn_join
    from earth_data_kit_spark.operators.spatial_join_s2 import s2_leaf_udf
    from earth_data_kit_spark.plans import lineage
    from earth_data_kit_spark.session import get_spark
    from earth_data_kit_spark.sources.pages import synth_pages_df

    import __spark_entry__ as em

    spark = get_spark(app_name=f"edk-pipeline-{args.job_id}", cpus=args.cpus)
    base, job = args.base_dir, args.job_id
    t_start = time.time()

    # ---- stage 1: ingest ------------------------------------------------
    pages = synth_pages_df(
        spark, args.sf_dir, reps=args.reps,
        partitions=spark.sparkContext.defaultParallelism,
    ).withColumn("part", cell_id_col(F.col("lon"), F.col("lat"), PART_RES))
    todo = lineage.resume_filter(pages, base, job, "ingest", "part")
    if todo.isEmpty():
        print(f"[{job}] ingest: all partitions committed, skipping")
    else:
        lineage.commit_stage(
            todo, base, job, "ingest", "part", lineage_cols=["page_id", "url"]
        )
    ingested = spark.read.parquet(f"{base}/ingest/data")
    if args.fail_after_stage == "ingest":
        raise SystemExit("injected failure after ingest")

    # ---- stage 2: geocode ----------------------------------------------
    geo = (
        ingested.select(
            "page_id", "url", "part",
            extract_geocode_udf(F.col("html"), F.col("url")).alias("g"),
        )
        .select(
            "page_id", "url", "part",
            F.col("g.lat").alias("lat"),
            F.col("g.lon").alias("lon"),
            F.col("g.method").alias("method"),
        )
        .where(F.col("lat").isNotNull())
        .withColumn("cell", cell_id_col(F.col("lon"), F.col("lat"), CELL_RES))
        # both hierarchical indexes stamped ONCE at ingest (north rule:
        # "H3 and S2 cell indexes"): quadgrid cell for the SQL-mirrored
        # gates, real-S2 leaf for prefix-range layouts — downstream
        # queries derive any S2 level by bit math, no Python ever again
        .withColumn("s2_leaf", s2_leaf_udf()(F.col("lon"), F.col("lat")))
    )
    todo = lineage.resume_filter(geo, base, job, "geocode", "part")
    if todo.isEmpty():
        print(f"[{job}] geocode: all partitions committed, skipping")
    else:
        lineage.commit_stage(todo, base, job, "geocode", "part", lineage_cols=["page_id", "cell"])
    geocoded = spark.read.parquet(f"{base}/geocode/data")
    if args.fail_after_stage == "geocode":
        raise SystemExit("injected failure after geocode")

    # ---- stage 3: PIP join ----------------------------------------------
    polys = [
        sj.Polygon(code=c, name=n, bbox=(a, b, x, y)) for c, n, a, b, x, y in em.COUNTRIES
    ]
    joined = sj.pip_join(geocoded, polys, res=CELL_RES)
    counts = joined.groupBy("code").agg(F.count("*").alias("n_pages")).withColumn(
        "part", F.lit(0)
    )
    todo = lineage.resume_filter(counts, base, job, "pip_counts", "part")
    if todo.isEmpty():
        print(f"[{job}] pip_counts: all partitions committed, skipping")
    else:
        lineage.commit_stage(todo, base, job, "pip_counts", "part")
    if args.fail_after_stage == "pip_counts":
        raise SystemExit("injected failure after pip_counts")

    # ---- stage 4: kNN ----------------------------------------------------
    # persist the (|queries|×k row) RESULT: knn_join releases its cell
    # index when the growth loop ends (caller owns the result's
    # lifetime), and this stage runs two actions on it (isEmpty + the
    # committed write) — uncached, each would re-scan the source and
    # redo the ring join
    knn = knn_join(
        geocoded, em.KNN_QUERIES, k=5, res=5, ring=4, id_col="page_id",
        auto_grow=True, max_ring=64,
    ).withColumn("part", F.col("query_id")).persist()
    try:
        todo = lineage.resume_filter(knn, base, job, "knn", "part")
        if todo.isEmpty():
            print(f"[{job}] knn: all partitions committed, skipping")
        else:
            lineage.commit_stage(todo, base, job, "knn", "part")
    finally:
        knn.unpersist()

    # ---- stage 5: training-data pass (quality + dedup stats) -------------
    from earth_data_kit_spark.text.textcols import quality_score_col

    quality = (
        ingested.select("part", "text")
        .withColumn("q", quality_score_col(F.col("text")))
        .withColumn("text_md5", F.md5("text"))
        .groupBy("part")
        .agg(
            F.count("*").alias("n_pages"),
            F.round(F.avg("q"), 6).alias("avg_quality"),
            F.countDistinct("text_md5").alias("n_unique_texts"),
        )
    )
    todo = lineage.resume_filter(quality, base, job, "quality", "part")
    if todo.isEmpty():
        print(f"[{job}] quality: all partitions committed, skipping")
    else:
        lineage.commit_stage(todo, base, job, "quality", "part")

    # ---- report ----------------------------------------------------------
    lin = spark.read.parquet(f"{base}/lineage").where(F.col("job_id") == job)
    print(f"[{job}] pipeline done in {time.time() - t_start:.1f}s; lineage:")
    (
        lin.groupBy("stage")
        .agg(
            F.count("*").alias("partitions"),
            F.sum("row_count").alias("rows"),
            F.max("committed_at").alias("last_commit"),
        )
        .orderBy("stage")
        .show(truncate=False)
    )
    spark.stop()


if __name__ == "__main__":
    main()

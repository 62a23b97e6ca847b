"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

plus per-query docs/sec where meaningful.  The north-rule scaling
evidence (same job at two parallelism levels) is produced by
scripts/scaling_run.sh, which invokes this file once per level and
writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd  # module-level: pandas_udf type-hint resolution

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_REPS = int(os.environ.get("SPARK_GRAFT_PAGES_REPS", "512"))  # driver default: snappy; scaling_run.sh pins 4096


def main() -> None:
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from earth_data_kit_spark.functions.udfs import extract_geocode_udf
    from earth_data_kit_spark.operators import spatial_join as sj
    from earth_data_kit_spark.operators.knn import knn_join
    from earth_data_kit_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from earth_data_kit_spark.operators.similarity import cosine_topk_bruteforce
    from earth_data_kit_spark.session import get_spark
    from earth_data_kit_spark.sources.pages import pages_meta_df, synth_pages_df

    spark = get_spark(app_name="edk-bench", cpus=CPUS, shuffle_partitions=CPUS)
    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # Warm the Python UDF workers on every core: the first task a
    # worker runs pays ~2-3 s importing pandas/pyarrow AND the engine
    # modules.  A long-running job amortizes this; the bench measures
    # steady-state throughput, so pay it once up front using a real
    # engine UDF (which pulls in the full module chain).
    from earth_data_kit_spark.functions.udfs import token_count_udf

    spark.range(CPUS * 8).repartition(CPUS * 2).select(
        token_count_udf(F.col("id").cast("string"))
    ).count()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "2"))
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    only_set = set(only.split(",")) if only else None

    def timed(name: str, fn):
        if only_set is not None and name not in only_set:
            return None
        # steady-state: best of N runs — the first run pays one-time
        # costs (page cache, broadcast build, python worker spin-up)
        # that a long-lived job amortizes
        best, out = None, None
        for _ in range(runs):
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        return out

    # materialize the pages table once (parquet) so queries measure the
    # operators, not the synth; at 100 TB this is the stored table.
    # partitioned like the 100 TB table would be: enough splits that
    # every core gets work (the cross-join synth otherwise inherits
    # the single-file parquet's 1-2 partitions)
    pages_path = f"/tmp/edk_bench_pages_{os.path.basename(SF_DIR)}_{PAGES_REPS}"
    if not os.path.exists(pages_path):
        pages_meta_df(spark, SF_DIR, reps=PAGES_REPS).repartition(128).write.mode(
            "overwrite"
        ).parquet(pages_path)
    pages = spark.read.parquet(pages_path)
    n_pages = pages.count()

    polys = [
        sj.Polygon(code=c, name=n, bbox=(a, b, x, y))
        for c, n, a, b, x, y in entrymod.COUNTRIES
    ]

    # q1: flagship spatial join (cell prefilter + broadcast + refine) + agg.
    # SCAN_MULT self-unions multiply the scanned volume without
    # multiplying storage, so the job is compute-bound at every core
    # count (one pass of 20M rows finishes in ~1 s — pure overhead).
    scan_mult = int(os.environ.get("SPARK_GRAFT_SCAN_MULT", "16"))
    from functools import reduce

    pages_big = reduce(lambda a, b: a.union(b), [pages] * scan_mult)
    n_big = n_pages * scan_mult
    timed(
        "pip_join",
        lambda: sj.pip_join(pages_big, polys, res=entrymod.CELL_RES)
        .groupBy("code")
        .count()
        .collect(),
    )
    if "pip_join" in timings:
        extras["pip_join_docs_per_sec"] = round(n_big / timings["pip_join"], 1)
        extras["pip_join_docs"] = n_big

    # q2: cell aggregation (index build + count per cell)
    from earth_data_kit_spark.functions.columns import cell_id_col

    timed(
        "cell_agg",
        lambda: pages.withColumn("cell", cell_id_col(F.col("lon"), F.col("lat"), 7))
        .groupBy("cell")
        .count()
        .count(),
    )

    # q3: kNN — 16 query points, fixed ring (dense data at this sf).
    # Scans the ×16 self-union like pip_join: the per-query candidate
    # work is tiny, so without the scan multiplier the job is a ~2 s
    # fixed-cost stub whose "scaling" measures scheduler overhead,
    # not the operator (the round-1 0.55-0.73 knn efficiency).
    # 2 dense-cell queries (each pulls the whole 20%-hot Tirana cell
    # as candidates — the skew path) + 8 sparse.  More dense queries
    # multiply candidate volume linearly and only re-measure the same
    # window shuffle: 8 of them made the 2-core scaling leg ~500M
    # window rows (~20 min) for no extra signal.
    knn_queries = [(0, 41.33, 19.82), (1, 41.34, 19.83)] + [
        (100, 51.0, 10.5), (101, 21.0, 78.5), (102, -10.0, -52.0), (103, 39.5, -98.5),
        (104, 36.0, 138.0), (105, -25.0, 134.0), (106, 40.0, -3.5), (107, 54.0, -2.0),
    ]
    timed(
        "knn",
        lambda: knn_join(
            pages_big, knn_queries, k=10, res=9, ring=2, id_col="page_id"
        ).collect(),
    )

    # q4: full html path — fused extract+geocode UDF (Arrow hot path)
    # over a MATERIALIZED html table (the 100 TB table stores html;
    # measuring the in-flight synth would time the generator instead).
    html_reps = min(64, max(1, PAGES_REPS // 8))
    html_path = f"/tmp/edk_bench_html_{os.path.basename(SF_DIR)}_{html_reps}"
    if not os.path.exists(html_path):
        synth_pages_df(spark, SF_DIR, reps=html_reps, partitions=128).select(
            "page_id", "url", "html"
        ).write.mode("overwrite").parquet(html_path)
    html_pages = spark.read.parquet(html_path)

    def _html_pipeline():
        g = html_pages.select(
            extract_geocode_udf(F.col("html"), F.col("url")).alias("g")
        ).select("g.method")
        return g.groupBy("method").count().collect()

    timed("extract_geocode", _html_pipeline)
    if "extract_geocode" in timings:
        n_html = html_pages.count()
        extras["extract_docs_per_sec"] = round(n_html / timings["extract_geocode"], 1)

    # q5: tile assignment + clip (fixture scenario, DataFrame ops)
    timed(
        "tile_assign",
        lambda: entrymod._q_geo_tile_assign(spark, SF_DIR).collect(),
    )

    # q6: dedup — exact + minhash LSH over documents
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    timed("dedup_exact", lambda: exact_dedup(docs).count())
    timed("dedup_minhash", lambda: minhash_lsh_pairs(docs, threshold=0.5).count())

    # q7: TPC-H Q1 (relational core)
    timed("tpch_q1", lambda: entrymod._q_rel_q1_pricing_summary(spark, SF_DIR).collect())

    # q8: events tumbling window
    timed("events_window", lambda: entrymod._q_geo_time_buckets(spark, SF_DIR).collect())

    # q9: cosine top-k brute force over embeddings
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    q = emb.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    timed("cosine_topk", lambda: cosine_topk_bruteforce(emb, q, k=10).collect())

    # q10: hot-key salted aggregation — the dense Tirana cell holds
    # ~20% of all pages; salted_hot_keys splits it across 32 shuffle
    # keys, partials merge by true cell (the two-level skew pattern)
    def _salted_agg():
        df = pages_big.withColumn(
            "cell", cell_id_col(F.col("lon"), F.col("lat"), entrymod.CELL_RES)
        )
        salted, _ = sj.salted_hot_keys(
            df, "cell", hot_threshold=100_000, salt_buckets=32,
            salt_cols=["page_id"], sample_fraction=0.02,
        )
        partial = salted.groupBy("cell", "salted_key").agg(
            F.count("*").alias("n"), F.sum("doc_id").alias("s")
        )
        return (
            partial.groupBy("cell")
            .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
            .count()
        )

    timed("hot_cell_salted", _salted_agg)

    # q11: cross-tile halo-exchange regrid (2048² int16 mosaic of 256-
    # blocks → 1536×1024, 64 dst-block groups)
    from earth_data_kit_spark.operators.blocks import (
        regrid_bilinear_blocks,
        synth_blocks_df,
    )

    regrid_src = synth_blocks_df(spark, 2048, 2048, 256, scale=1.0).persist()
    regrid_src.count()
    timed(
        "regrid_halo",
        lambda: regrid_bilinear_blocks(
            regrid_src, (2048, 2048), (1536, 1024), dst_block=192
        ).count(),
    )
    regrid_src.unpersist()

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "pages_rows": n_pages,
        **extras,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

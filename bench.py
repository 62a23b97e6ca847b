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


def _cpu_calib(seconds: float = 0.25) -> int:
    """Single-thread busy-loop score (iterations/sec).  The sandbox
    VM's delivered CPU drifts tens of percent between measurement
    windows (BENCH/BASELINE.md); stamping a calibration into every
    bench JSON lets readers normalize cross-run comparisons."""
    t0 = time.perf_counter()
    n = 0
    x = 1.0
    while time.perf_counter() - t0 < seconds:
        x = x * 1.0000001 + 1.0
        n += 1
    return round(n / seconds)


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
        # that a long-lived job amortizes.  Optional GC barrier
        # (default OFF): a forced full GC also fires Spark's
        # weak-ref ContextCleaner, dropping reusable shuffle files —
        # measured SLOWER in-suite (hot_cell_salted 8-17 s vs 4.5 s
        # isolated); query isolation comes from the run ORDER instead
        # (extract_geocode before the ×16-scan queries).
        gc_barrier = os.environ.get("SPARK_GRAFT_BENCH_GC", "0") == "1"
        best, out = None, None
        for _ in range(runs):
            if gc_barrier:
                spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3)
        return out

    # q-html FIRST: full html path — fused extract+geocode UDF (Arrow
    # hot path) over a MATERIALIZED html table (the 100 TB table
    # stores html; measuring the in-flight synth would time the
    # generator instead).  Measured BEFORE the ×16-scan queries: r2
    # showed a 1.55× slowdown on this unchanged workload when it ran
    # after the big scans (JVM heap/page-cache churn), so the fused-UDF
    # number is taken on a quiet JVM.
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

    # q1b: the same flagship join through the REAL S2 index
    # (grid/s2.py) in its at-scale layout: leaf ids computed ONCE at
    # ingest (one pandas-UDF pass, stored in parquet), every query
    # derives its join level by JVM bit math — the Python cost is
    # amortized to zero and the join itself is pure codegen.
    from earth_data_kit_spark.operators.spatial_join_s2 import (
        pip_join_s2,
        s2_leaf_udf,
    )

    s2_path = f"/tmp/edk_bench_pages_s2_{os.path.basename(SF_DIR)}_{PAGES_REPS}"
    if not os.path.exists(s2_path):
        pages.withColumn(
            "s2_leaf", s2_leaf_udf()(F.col("lon"), F.col("lat"))
        ).write.mode("overwrite").parquet(s2_path)
    pages_s2_big = reduce(
        lambda a, b: a.union(b), [spark.read.parquet(s2_path)] * scan_mult
    )
    timed(
        "pip_join_s2",
        lambda: pip_join_s2(pages_s2_big, polys, level=6, leaf_col="s2_leaf")
        .groupBy("code")
        .count()
        .collect(),
    )
    if "pip_join_s2" in timings:
        extras["pip_join_s2_docs_per_sec"] = round(n_big / timings["pip_join_s2"], 1)

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

    # q12/q13: streaming micro-benches — the ingest-time surfaces
    # (VERDICT r2 task 6: semantics were pytest-pinned but carried no
    # measured rate).  Streams need a DIRECTORY source; materialize
    # replicated copies once, then time processAllAvailable().
    from earth_data_kit_spark.streaming.windows import (
        exact_dedup_stream,
        exact_dedup_stream_jvm,
        tumbling_agg_stream_append,
    )

    stream_names = {"stream_window_append", "stream_dedup_exact", "stream_dedup_jvm"}
    run_streams = only_set is None or bool(stream_names & only_set)
    stream_reps = int(os.environ.get("SPARK_GRAFT_STREAM_REPS", "16"))
    ev_dir = f"/tmp/edk_bench_evstream_{os.path.basename(SF_DIR)}_{stream_reps}"
    doc_dir = f"/tmp/edk_bench_docstream_{os.path.basename(SF_DIR)}_{stream_reps}"
    # cast ts NTZ→LTZ at write (session tz is UTC, exact) so the
    # TIMESTAMP stream schema reads the files without conversion errors
    if run_streams:
        ev_batch = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        if not os.path.exists(ev_dir):
            reduce(lambda a, b: a.union(b), [ev_batch] * stream_reps).repartition(
                64
            ).write.mode("overwrite").parquet(ev_dir)
        doc_batch = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        if not os.path.exists(doc_dir):
            # shift ids per rep so the stream carries real duplicates
            # (same text, different id) — the state path exact dedup hits
            reduce(
                lambda a, b: a.union(b),
                [
                    doc_batch.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000))
                    for i in range(stream_reps)
                ],
            ).repartition(64).write.mode("overwrite").parquet(doc_dir)
        n_ev_stream = ev_batch.count() * stream_reps
        n_doc_stream = doc_batch.count() * stream_reps
    _stream_seq = [0]

    def _run_stream(starter):
        _stream_seq[0] += 1
        q = starter(f"bench_stream_{_stream_seq[0]}")
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        return None

    # DDL strings (not batch.schema): the parquet batch read yields
    # TIMESTAMP_NTZ for ts, which watermarks reject; the stream source
    # reads the same files as TIMESTAMP fine.
    ev_schema = (
        "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double, props string"
    )
    doc_schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"
    timed(
        "stream_window_append",
        lambda: _run_stream(
            lambda name: tumbling_agg_stream_append(
                spark, ev_dir, ev_schema, query_name=name
            )
        ),
    )
    if "stream_window_append" in timings:
        extras["stream_window_rows_per_sec"] = round(
            n_ev_stream / timings["stream_window_append"], 1
        )
    timed(
        "stream_dedup_exact",
        lambda: _run_stream(
            lambda name: exact_dedup_stream(
                spark, doc_dir, doc_schema, query_name=name
            )
        ),
    )
    if "stream_dedup_exact" in timings:
        extras["stream_dedup_rows_per_sec"] = round(
            n_doc_stream / timings["stream_dedup_exact"], 1
        )
    timed(
        "stream_dedup_jvm",
        lambda: _run_stream(
            lambda name: exact_dedup_stream_jvm(
                spark, doc_dir, doc_schema, query_name=name
            )
        ),
    )
    if "stream_dedup_jvm" in timings:
        extras["stream_dedup_jvm_rows_per_sec"] = round(
            n_doc_stream / timings["stream_dedup_jvm"], 1
        )

    # q14: curation pass — canonical URL + Gopher quality + PII counts
    # over the big html-less pages projection, pure Columns (the
    # map-stage a 100 TB corpus runs between extract and storage)
    from earth_data_kit_spark.text import curation as cu

    def _curation():
        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        big = reduce(lambda a, b: a.union(b), [d] * 64)
        q = cu.gopher_quality_cols(F.col("text"))
        out = big.select(
            cu.canonical_url_col(F.concat(F.lit("https://ex.com/"), F.col("source"))).alias("cu"),
            cu.gopher_keep_col(q).alias("keep"),
            cu.pii_counts_col(F.col("text")).alias("pii"),
        )
        return out.groupBy("keep").agg(
            F.count("*").alias("n"), F.sum("pii.n_emails").alias("e")
        ).collect()

    timed("txt_curation", _curation)
    if "txt_curation" in timings:
        n_cur = spark.read.parquet(f"{SF_DIR}/documents.parquet").count() * 64
        extras["curation_docs_per_sec"] = round(n_cur / timings["txt_curation"], 1)

    total = round(sum(timings.values()), 3)
    result = {
        "metric": "headline_suite_wall",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "cpus": CPUS,
        "pages_rows": n_pages,
        "cpu_calib_iters_per_sec": _cpu_calib(),
        **extras,
    }
    print(json.dumps(result))
    spark.stop()


if __name__ == "__main__":
    main()

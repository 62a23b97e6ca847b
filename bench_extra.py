"""Round-7 measurement companion to the FROZEN bench.py (guide §1).

Builds each headline query as an UNEXECUTED DataFrame over the same
materialized /tmp tables bench.py uses, then either

* ``explain``: writes ``.explain("formatted")`` to
  ``plans/r07/<q>_<tag>.txt`` (the committed plan evidence), or
* ``time``: noop-sink timing (``df.write.format("noop")``) isolated
  from the collect/sink, best of N, with a per-run job description.

Usage:
    python bench_extra.py explain pip_join knn --tag before
    python bench_extra.py time knn --runs 3

Only DataFrame-shaped queries are covered; driver-loop rows
(streaming, salted probe) keep their bench.py timing as the only
number.  This file is NOT part of the frozen measurement contract.
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from functools import reduce

import pandas as pd

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PAGES_REPS = int(os.environ.get("SPARK_GRAFT_PAGES_REPS", "512"))
SCAN_MULT = int(os.environ.get("SPARK_GRAFT_SCAN_MULT", "16"))


def _union(df, n):
    return reduce(lambda a, b: a.union(b), [df] * n)


def build(spark, name):
    """Return the query's output DataFrame (lazily), matching the
    bench.py shapes.  Raises KeyError for driver-loop rows."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entrymod
    from earth_data_kit_spark.functions.columns import cell_id_col
    from earth_data_kit_spark.functions.udfs import extract_geocode_udf
    from earth_data_kit_spark.operators import spatial_join as sj
    from earth_data_kit_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from earth_data_kit_spark.operators.knn import knn_join
    from earth_data_kit_spark.operators.similarity import cosine_topk_bruteforce

    base = os.path.basename(SF_DIR)
    polys = [
        sj.Polygon(code=c, name=n2, bbox=(a, b, x, y))
        for c, n2, a, b, x, y in entrymod.COUNTRIES
    ]

    def pages_big():
        p = spark.read.parquet(f"/tmp/edk_bench_pages_{base}_{PAGES_REPS}")
        return _union(p, SCAN_MULT)

    if name == "extract_geocode":
        html_reps = min(64, max(1, PAGES_REPS // 8))
        html = spark.read.parquet(f"/tmp/edk_bench_html_{base}_{html_reps}")
        g = html.select(
            extract_geocode_udf(F.col("html"), F.col("url")).alias("g")
        ).select("g.method")
        return g.groupBy("method").count()
    if name == "pip_join":
        return (
            sj.pip_join(pages_big(), polys, res=entrymod.CELL_RES)
            .groupBy("code")
            .count()
        )
    if name == "pip_join_s2":
        from earth_data_kit_spark.operators.spatial_join_s2 import pip_join_s2

        p = _union(
            spark.read.parquet(f"/tmp/edk_bench_pages_s2_{base}_{PAGES_REPS}"),
            SCAN_MULT,
        )
        return pip_join_s2(p, polys, level=6, leaf_col="s2_leaf").groupBy("code").count()
    if name == "pip_join_h3":
        from earth_data_kit_spark.operators.spatial_join_h3 import pip_join_h3

        p = _union(
            spark.read.parquet(f"/tmp/edk_bench_pages_h3mr_{base}_{PAGES_REPS}"),
            SCAN_MULT,
        )
        return (
            pip_join_h3(p, polys, res=4, cell_col="h3_cell_r{res}")
            .groupBy("code")
            .count()
        )
    if name == "cell_agg":
        p = spark.read.parquet(f"/tmp/edk_bench_pages_{base}_{PAGES_REPS}")
        return (
            p.withColumn("cell", cell_id_col(F.col("lon"), F.col("lat"), 7))
            .groupBy("cell")
            .count()
        )
    if name == "knn":
        kq = [(0, 41.33, 19.82), (1, 41.34, 19.83)] + [
            (100, 51.0, 10.5), (101, 21.0, 78.5), (102, -10.0, -52.0),
            (103, 39.5, -98.5), (104, 36.0, 138.0), (105, -25.0, 134.0),
            (106, 40.0, -3.5), (107, 54.0, -2.0),
        ]
        p = _union(
            spark.read.parquet(f"/tmp/edk_bench_pages_cell9s_{base}_{PAGES_REPS}"),
            SCAN_MULT,
        )
        return knn_join(p, kq, k=10, res=9, ring=2, id_col="page_id", cell_col="cell")
    if name == "tile_assign":
        return entrymod._q_geo_tile_assign(spark, SF_DIR)
    if name == "dedup_exact":
        return exact_dedup(spark.read.parquet(f"{SF_DIR}/documents.parquet"))
    if name == "dedup_minhash":
        return minhash_lsh_pairs(
            spark.read.parquet(f"{SF_DIR}/documents.parquet"), threshold=0.5
        )
    if name == "tpch_q1":
        return entrymod._q_rel_q1_pricing_summary(spark, SF_DIR)
    if name == "events_window":
        return entrymod._q_geo_time_buckets(spark, SF_DIR)
    if name == "cosine_topk":
        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        q = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        return cosine_topk_bruteforce(emb, q, k=10)
    if name == "ann_ivf_stored":
        from earth_data_kit_spark.operators.similarity import ivf_query_stored

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        ivf_path = f"/tmp/edk_bench_ivf_{base}"
        indexed = spark.read.parquet(f"{ivf_path}/vectors")
        cents = pd.read_parquet(f"{ivf_path}/centroids")
        q = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        return ivf_query_stored(indexed, cents, q, k=10, n_probe=8)
    if name == "ann_ivfpq_stored":
        from earth_data_kit_spark.operators.similarity_pq import (
            ivfpq_query_stored,
            load_codebooks,
        )

        emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        pq_path = f"/tmp/edk_bench_ivfpq_{base}"
        codes_df = spark.read.parquet(f"{pq_path}/codes")
        vecs_df = spark.read.parquet(f"{pq_path}/vectors")
        cents_pq = pd.read_parquet(f"{pq_path}/centroids")
        books = load_codebooks(pq_path)
        qpq = emb.where(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
        )
        return ivfpq_query_stored(
            codes_df, cents_pq, books, qpq, k=10, n_probe=8, vectors=vecs_df
        )
    if name == "hot_cell_unsalted":
        cellc = cell_id_col(F.col("lon"), F.col("lat"), entrymod.CELL_RES)
        return (
            pages_big()
            .withColumn("cell", cellc)
            .groupBy("cell")
            .agg(F.count("*").alias("n"), F.sum("doc_id").alias("s"))
        )
    if name == "hot_cell_salted":
        cellc = cell_id_col(F.col("lon"), F.col("lat"), entrymod.CELL_RES)
        p1 = spark.read.parquet(f"/tmp/edk_bench_pages_{base}_{PAGES_REPS}")
        hot_rows = (
            p1.withColumn("cell", cellc)
            .groupBy("cell")
            .count()
            .where(F.col("count") >= 100_000 / SCAN_MULT)
            .select("cell")
            .collect()
        )
        hot_df = spark.createDataFrame(
            [(r["cell"],) for r in hot_rows] or [(None,)], "cell string"
        ).where(F.col("cell").isNotNull())
        big_cell = pages_big().withColumn("cell", cellc)
        salted, _ = sj.salted_hot_keys(
            big_cell, "cell", hot_threshold=100_000, salt_buckets=32,
            salt_cols=["page_id"], hot=hot_df,
        )
        partial = salted.groupBy("cell", "salted_key").agg(
            F.count("*").alias("n"), F.sum("doc_id").alias("s")
        )
        return partial.groupBy("cell").agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
    if name == "regrid_halo":
        from earth_data_kit_spark.operators.blocks import (
            regrid_bilinear_blocks,
            synth_blocks_df,
        )

        src = synth_blocks_df(spark, 2048, 2048, 256, scale=1.0)
        return regrid_bilinear_blocks(src, (2048, 2048), (1536, 1024), dst_block=192)
    if name == "txt_curation":
        from earth_data_kit_spark.text import curation as cu

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        big = _union(d, 64)
        q = cu.gopher_quality_cols(F.col("text"))
        out = big.select(
            cu.canonical_url_col(
                F.concat(F.lit("https://ex.com/"), F.col("source"))
            ).alias("cu"),
            cu.gopher_keep_col(q).alias("keep"),
            cu.pii_counts_col(F.col("text")).alias("pii"),
        )
        return out.groupBy("keep").agg(
            F.count("*").alias("n"), F.sum("pii.n_emails").alias("e")
        )
    if name == "txt_paragraph_dedup":
        from earth_data_kit_spark.operators.dedup import paragraph_dedup

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        big = _union_shift(d, 16).withColumn(
            "text",
            F.concat(F.col("text"), F.lit("\n\nSubscribe to our newsletter")),
        )
        return paragraph_dedup(big, max_doc_freq=20).agg(
            F.sum("n_removed").alias("r"), F.count("*").alias("n")
        )
    if name == "txt_dsir":
        from earth_data_kit_spark.operators.dsir import dsir_resample

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        big = _union_shift(d, 16)
        tgt = d.where(F.pmod(F.col("doc_id"), F.lit(7)) == 0)
        return dsir_resample(
            big, tgt, n=1000, text_col="text", id_col="doc_id", n_buckets=1 << 14
        )
    if name == "txt_substring_dedup":
        from earth_data_kit_spark.operators.substring_dedup import substring_dedup

        d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        big = _union_shift(d, 4)
        return substring_dedup(big, k=20).agg(
            F.sum("n_removed_chars").alias("c"), F.count("*").alias("n")
        )
    if name == "raster_terrain_zonal":
        from earth_data_kit_spark.operators.blocks import synth_blocks_df
        from earth_data_kit_spark.operators.focal import focal_map
        from earth_data_kit_spark.operators.spatial_join import Polygon
        from earth_data_kit_spark.operators.zonal import zonal_stats

        RW = RH = 8192
        rgt = (0.0, 0.01, 0.0, 81.92, 0.0, -0.01)
        rblocks = synth_blocks_df(spark, RW, RH, 256, scale=1.0, nodata_stripe=False)
        zpolys = [
            Polygon(f"P{i}", f"p{i}", bbox=(i * 8.0, 10.0, i * 8.0 + 7.5, 70.0))
            for i in range(8)
        ]
        sl = focal_map(rblocks, (RW, RH), 256, "slope", gt=rgt)
        return zonal_stats(sl, zpolys, rgt)
    if name == "raster_regions":
        import numpy as np

        from earth_data_kit_spark.operators.blocks import BLOCK_SCHEMA
        from earth_data_kit_spark.operators.regions import region_label

        GW = GH = 4096
        gb = 256
        rows = []
        for by in range(0, GH, gb):
            for bx in range(0, GW, gb):
                x, y = np.meshgrid(np.arange(bx, bx + gb), np.arange(by, by + gb))
                v = (((x // 97) * 7 + (y // 89) * 13) % 5).astype(np.float32)
                rows.append(("t", "B1", bx // gb, by // gb, bx, by, gb, gb,
                             "float32", float("nan"), 1.0, 0.0, v.tobytes()))
        rblk = spark.createDataFrame(rows, BLOCK_SCHEMA).repartition(
            "block_x", "block_y"
        )
        return region_label(rblk, (GW, GH), gb)
    raise KeyError(name)


def _union_shift(d, n):
    from pyspark.sql import functions as F

    return reduce(
        lambda a, b: a.union(b),
        [d.withColumn("doc_id", F.col("doc_id") + F.lit(i * 10_000_000)) for i in range(n)],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("mode", choices=["explain", "time"])
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    from earth_data_kit_spark.session import get_spark

    spark = get_spark(app_name="bench-extra", cpus=CPUS, shuffle_partitions=CPUS)
    os.makedirs(os.path.join(REPO, "plans", "r07"), exist_ok=True)

    for name in args.names:
        df = build(spark, name)
        if args.mode == "explain":
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(REPO, "plans", "r07", f"{name}_{args.tag}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} chars)")
        else:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            best = None
            for i in range(args.runs + 1):  # +1 discarded warmup
                t0 = time.time()
                df.write.format("noop").mode("overwrite").save()
                dt = time.time() - t0
                if i == 0:
                    continue
                best = dt if best is None or dt < best else best
                print(f"  {name} run{i}: {dt:.3f}s")
            print(f"{name} noop best-of-{args.runs}: {best:.3f}s")
            spark.sparkContext.setJobDescription(None)
    spark.stop()


if __name__ == "__main__":
    main()

"""End-to-end training-data curation job — the pass a 100 TB corpus
runs between crawl and training, composed from the engine's
operators (each stage is the oracle-tested operator, not ad-hoc
logic):

  1. quality    — Gopher shape rules (pure Columns) + repetition
                  signals (Arrow UDF): drop boilerplate/spam shapes;
  2. decontam   — broadcast 13-gram probe against an eval set: drop
                  benchmark leakage;
  3. dedup      — exact content dedup (md5 groupBy, keep min id);
  3b. substring — optional (--substring-k): exact-substring dedup,
                  Lee et al. 2022 semantics (operators/substring_dedup);
  3c. select    — optional (--dsir-n + --dsir-target-source): DSIR
                  importance resampling toward a target slice
                  (operators/dsir);
  4. pack       — shard-parallel FFD into fixed token budgets.

Prints ONE JSON line with per-stage survivor counts and the packing
fill rate.  Every stage is map-only or a single bounded shuffle; the
whole job has no driver-side data loops, so the identical plan runs
at cluster scale (see SCALE.md).

Usage:
  spark-submit --py-files dist/edk_spark.zip jobs/curate.py \
      --sf-dir /root/testdata/sf0.001 --max-tokens 512
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def run(
    spark,
    sf_dir: str,
    max_tokens: int = 512,
    eval_snippets: int = 3,
    work_dir: str | None = None,
    job_id: str = "curate",
    substring_k: int = 0,
    dsir_n: int = 0,
    dsir_target_source: str | None = None,
) -> dict:
    """``work_dir=None`` runs the funnel in-memory (one spark-submit,
    no artifacts).  With a ``work_dir`` every stage commits its output
    + per-partition lineage rows through plans/lineage.py (the same
    seam jobs/pipeline.py uses), so a crashed or re-run job skips
    every committed partition — VERDICT r3 task 6.  Partition key =
    pmod(xxhash64(doc_id), 32): content-stable, uniform, and
    retry-deterministic."""
    from earth_data_kit_spark.operators.decontam import flag_contaminated
    from earth_data_kit_spark.operators.dedup import exact_dedup
    from earth_data_kit_spark.operators.packing import pack_sequences, packing_stats
    from earth_data_kit_spark.plans import lineage
    from earth_data_kit_spark.text import curation as cu

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_in = docs.count()
    if work_dir:
        docs = docs.withColumn("part", F.pmod(F.xxhash64(F.col("doc_id")), F.lit(32)))

    def _commit(df, stage: str):
        """Commit only not-yet-done partitions; return the full stage
        output re-read from disk (committed + pre-existing)."""
        todo = lineage.resume_filter(df, work_dir, job_id, stage, "part")
        if todo.isEmpty():
            print(f"[{job_id}] {stage}: all partitions committed, skipping")
        else:
            lineage.commit_stage(
                todo, work_dir, job_id, stage, "part", lineage_cols=["doc_id"]
            )
        return spark.read.parquet(f"{work_dir}/{stage}/data")

    # ---- stage 1: quality (shape + repetition) --------------------------
    q = cu.gopher_quality_cols(F.col("text"))
    r = cu.repetition_signals_udf()(F.col("text"))
    kept = (
        docs.withColumn("_keep_q", cu.gopher_keep_col(q))
        .withColumn("_keep_r", cu.gopher_repetition_keep_col(r))
        .where(F.col("_keep_q") & F.col("_keep_r"))
        .drop("_keep_q", "_keep_r")
    )
    if work_dir:
        kept = _commit(kept, "quality")
    n_quality = kept.count()

    # ---- stage 2: decontamination --------------------------------------
    # eval fixture: verbatim spans lifted from the corpus (deterministic
    # planted leakage — a real run broadcasts the real eval sets)
    rows = docs.orderBy("doc_id").limit(eval_snippets).collect()
    eval_df = spark.createDataFrame(
        [(i, " ".join(r.text.split()[2:30])) for i, r in enumerate(rows)],
        "eval_id int, text string",
    )
    clean = flag_contaminated(kept, eval_df, shingle_k=13).where(
        ~F.col("contaminated")
    ).drop("contaminated")
    if work_dir:
        # the committed stage output on disk plays the persist's role
        clean = _commit(clean, "decontam")
    else:
        clean = clean.persist()
    n_clean = clean.count()  # materializes the cache stage 3 reuses

    # ---- stage 3: exact dedup ------------------------------------------
    # exact_dedup returns (doc_id, n_dups) representatives.  The
    # restore is a plain shuffle equi-join on doc_id — NOT broadcast:
    # a mostly-unique corpus leaves `reps` nearly corpus-sized, so it
    # never fits under the broadcast threshold at scale (advisor r3
    # flagged the old comment as overselling this).  doc_id is the
    # stored sort key, so both sides shuffle-partition the same way
    # (or co-locate for free under bucketed storage).  `clean` is
    # persisted first: `reps` derives from it, and without the persist
    # the un-cached lineage recomputes the quality+decontam stages
    # twice (once for reps, once for the join's left side).
    reps = exact_dedup(clean).select("doc_id")
    unique = clean.join(reps, "doc_id")
    if work_dir:
        unique = _commit(unique, "dedup")
    n_unique = unique.count()

    # ---- stage 3b (optional): exact-substring dedup ---------------------
    n_substring = None
    n_removed_chars = None
    if substring_k:
        from earth_data_kit_spark.operators.substring_dedup import substring_dedup

        scrubbed = substring_dedup(unique, k=substring_k)
        n_removed_chars = int(
            scrubbed.agg(F.sum("n_removed_chars").alias("c")).first()["c"] or 0
        )
        unique = scrubbed.drop("n_removed_chars", "n_spans")
        if work_dir:
            unique = _commit(unique, "substring")
        n_substring = unique.count()

    # ---- stage 3c (optional): DSIR selection toward a target slice ------
    n_selected = None
    if dsir_n:
        from earth_data_kit_spark.operators.dsir import dsir_resample

        target = (
            unique.where(F.col("source") == dsir_target_source)
            if dsir_target_source
            else unique
        )
        unique = dsir_resample(
            unique, target, n=dsir_n, text_col="text", id_col="doc_id",
            n_buckets=1 << 14,
        ).drop("dsir_log_w", "dsir_rank")
        if work_dir:
            unique = _commit(unique, "select")
        n_selected = unique.count()

    # ---- stage 4: sequence packing -------------------------------------
    packed = pack_sequences(unique, max_tokens, shards=32)
    st = packing_stats(packed, max_tokens).collect()[0]

    out = {
        "metric": "curation_funnel",
        "docs_in": n_in,
        "after_quality": n_quality,
        "after_decontam": n_clean,
        "after_dedup": n_unique,
        "sequences": st.n_seqs,
        "fill_rate": round(float(st.fill_rate), 4),
        "oversize_seqs": st.n_oversize,
        "max_tokens": max_tokens,
    }
    if n_substring is not None:
        out["after_substring"] = n_substring
        out["substring_removed_chars"] = n_removed_chars
    if n_selected is not None:
        out["after_select"] = n_selected
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--max-tokens", type=int, default=512)
    ap.add_argument("--cpus", type=int, default=None)
    ap.add_argument(
        "--work-dir",
        default=None,
        help="commit per-stage output + lineage here; re-runs skip "
        "committed partitions (omit for the in-memory one-shot)",
    )
    ap.add_argument("--substring-k", type=int, default=0,
                    help="exact-substring dedup window (0 = stage off)")
    ap.add_argument("--dsir-n", type=int, default=0,
                    help="DSIR selection size (0 = stage off)")
    ap.add_argument("--dsir-target-source", default=None,
                    help="source value defining the DSIR target slice")
    args = ap.parse_args(argv)

    from earth_data_kit_spark.session import get_spark

    spark = get_spark(app_name="edk-curate", cpus=args.cpus)
    out = run(
        spark, args.sf_dir, max_tokens=args.max_tokens, work_dir=args.work_dir,
        substring_k=args.substring_k, dsir_n=args.dsir_n,
        dsir_target_source=args.dsir_target_source,
    )
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()

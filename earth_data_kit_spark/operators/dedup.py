"""Deduplication suite for web-scale training data (first-class per
the build brief): exact, MinHash+LSH, SimHash, exact n-gram Jaccard,
embedding-cosine near-dup.

Scale design notes (100 TB posture):
* exact: one hash-shuffle on a 16-byte digest — the canonical
  map-side-combinable groupBy; no skew (hashes are uniform).
* minhash-LSH: signatures are computed in one Arrow-batched pandas
  UDF pass; candidate generation explodes ``bands`` keys (constant
  fan-out) and self-joins per band bucket.  Bucket sizes are bounded
  in practice; a bucket-size cap guards against degenerate buckets
  (all-empty docs), which is the real-world skew failure mode.
* simhash: same shape with 4×16-bit band keys.
* verification joins compare signatures (already shuffled with the
  candidates) — full texts are only re-read for the final exact
  n-gram check when requested.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from earth_data_kit_spark.partitioning import ensure_parallelism
from earth_data_kit_spark.functions.udfs import (
    minhash_bands_udf,
    minhash_sig_udf,
    shingle_hashes_udf,
    simhash64_udf,
)


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Keep the lowest id per identical text (md5 equality).  Returns
    (<id_col>, n_dups) per kept representative."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("text_md5"))
        .groupBy("text_md5")
        .agg(F.min(id_col).alias(id_col), F.count("*").alias("n_dups"))
        .select(id_col, "n_dups")
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_perm: int = 64,
    bands: int = 16,
    shingle_k: int = 5,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-duplicate candidate pairs with estimated Jaccard ≥
    threshold.  Output: (id_a, id_b, est_jaccard), id_a < id_b.

    est_jaccard = fraction of equal minhash slots (the unbiased
    MinHash estimator).  ``max_bucket`` drops degenerate LSH buckets
    (skew guard — a bucket of B docs yields B² candidate pairs).

    Cache lifetime: the signature pass is persisted and referenced by
    BOTH sides of the returned (lazy) self-join — the CALLER owns the
    cache and may ``spark.catalog.clearCache()`` (or unpersist via
    ``df.sparkSession.catalog``) once the pairs are materialized;
    unpersisting here would re-run the minhash UDF twice per consume.
    """
    sig_udf = minhash_sig_udf(num_perm, shingle_k)
    band_udf = minhash_bands_udf(bands)
    df = ensure_parallelism(df)
    sigs = df.select(
        F.col(id_col).alias("id"), sig_udf(F.col(text_col)).alias("sig")
    ).withColumn("band_key", F.explode(band_udf(F.col("sig"))))
    # cache: the signature UDF pass feeds the skew guard AND both join
    # sides — without this the minhash UDF runs 3× (at 100 TB the
    # signatures are a checkpointed stage, see plans/lineage.py)
    sigs = sigs.persist()

    # skew guard: drop degenerate buckets
    sizes = sigs.groupBy("band_key").count().where(F.col("count") <= max_bucket)
    sigs = sigs.join(F.broadcast(sizes.select("band_key")), "band_key")

    a = sigs.alias("a")
    b = sigs.alias("b")
    # est_jaccard + threshold run MAP-SIDE in the band-join stage,
    # BEFORE the (id_a, id_b) dedup exchange: est is functionally
    # dependent on the pair (sig is a function of id), so filtering
    # and projecting first changes nothing about the output while the
    # dedup exchange shuffles 3 narrow columns for surviving pairs
    # only — instead of both 64-slot signature arrays (~1 KB/row) for
    # every candidate (guide §2.3, r7)
    est = (
        F.size(F.filter(F.zip_with(F.col("a.sig"), F.col("b.sig"), lambda x, y: x == y), lambda v: v))
        / F.lit(float(num_perm))
    )
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            est.alias("est_jaccard"),
        )
        .where(F.col("est_jaccard") >= threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    max_bucket: int = 1000,
) -> DataFrame:
    """SimHash near-dup pairs: 64-bit simhash banded into 4×16-bit
    keys (any pair within hamming ≤ 3 of each other shares at least
    one exact 16-bit band — pigeonhole), then exact hamming filter.
    Output: (id_a, id_b, hamming).

    ``max_bucket`` drops degenerate band buckets before the self-join
    (same guard as minhash_lsh_pairs): a corpus with B empty or
    boilerplate docs puts all B in one 16-bit band bucket → B²
    candidate pairs — the skew failure mode at scale.  Recall note:
    the hamming ≤ 3 guarantee holds only among docs whose shared band
    bucket survives the cap; capped buckets are near-identical spam
    by construction, the pairs a dedup pass drops first anyway.
    Cache lifetime: caller-owned, as in minhash_lsh_pairs.
    """
    df = ensure_parallelism(df)
    sh = df.select(F.col(id_col).alias("id"), simhash64_udf(F.col(text_col)).alias("sh"))
    banded = sh.select(
        "id", "sh", F.explode(F.array(*[
            F.concat_ws(":", F.lit(i), F.shiftright("sh", 16 * i).bitwiseAND(F.lit(0xFFFF)).cast("string"))
            for i in range(4)
        ])).alias("band_key"),
    )
    # persist: the simhash UDF pass feeds the skew guard AND both
    # join sides (same reasoning as the minhash signature cache)
    banded = banded.persist()
    sizes = banded.groupBy("band_key").count().where(F.col("count") <= max_bucket)
    banded = banded.join(F.broadcast(sizes.select("band_key")), "band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    xor = F.col("a.sh").bitwiseXOR(F.col("b.sh"))
    return (
        a.join(b, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.bit_count(xor).alias("hamming"),
        )
        # hamming is functionally dependent on the pair, so the ≤ cap
        # filters map-side BEFORE the dedup exchange (fewer rows
        # shuffled; identical output — guide §2.3, r7)
        .where(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_k: int = 3,
    threshold: float = 0.4,
    max_df: int | None = 1000,
) -> DataFrame:
    """EXACT n-gram Jaccard via explode + SQL aggregation (no pairwise
    UDF): |A∩B| from a self-join on shingle hash, |A∪B| = |A|+|B|−∩.
    Output: (id_a, id_b, jaccard).  Quadratic only within documents
    sharing shingles — the classic inverted-index trick.

    ``max_df``: drop shingles appearing in more than max_df documents
    before the self-join (stop-shingles like "the" create quadratic
    blowup at scale; dropping them only *underestimates* intersection
    for pairs that shared nothing distinctive, so high-jaccard pairs
    survive — the standard document-frequency cap).  Sizes are
    computed on the SAME filtered set so the jaccard stays exact over
    the retained shingle universe.  DEFAULT 1000 — the guard is
    always-on like the other paths' bucket caps (a single stop-shingle
    in D docs otherwise costs D²/2 join rows); pass ``None`` only when
    the shingle universe is known clean and the result must be exact
    over ALL shingles.
    """
    df = ensure_parallelism(df)
    sh = df.select(
        F.col(id_col).alias("id"),
        F.explode(shingle_hashes_udf(shingle_k)(F.col(text_col))).alias("shingle"),
    )
    if max_df is not None:
        keep = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") <= max_df)
            .select("shingle")
        )
        sh = sh.join(F.broadcast(keep), "shingle")
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("n_common"))
    )
    return (
        inter.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
        .withColumn("jaccard", F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")))
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def dup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    on_nonconverged: str = "raise",
) -> DataFrame:
    """Connected components over near-dup pairs → one canonical doc
    per cluster (min id), the step that turns pairwise candidates
    into a KEEP/DROP decision for the corpus.

    Min-label propagation: every node starts as its own label; each
    round joins labels across (symmetrized) edges and takes the min;
    stops when a round changes nothing (diameter-bounded, checked
    with one count per round — components in dedup graphs are
    shallow).  Each round's labels are ``localCheckpoint``-ed (eager,
    lineage-TRUNCATING): plain persist keeps the logical plan growing
    one nested join per round, which blows up Catalyst planning (and
    the driver heap) on deep chains — the standard iterative-
    DataFrame pattern is checkpoint-per-round, one shuffle keyed by
    node id.

    Output: (<id_a-named> id, cluster bigint) for every node that
    appears in ``pairs``; cluster = min node id reachable.

    If propagation has not converged after ``max_iter`` rounds (a
    component with diameter > max_iter — chain-shaped drifting
    boilerplate is plausible at corpus scale), the labels are WRONG
    for that component; ``on_nonconverged`` picks the failure mode:
    'raise' (default — never silently return partial labels) or
    'warn' (UserWarning, return the partial labels).

    Cache lifetime: the returned labels derive from the final round's
    localCheckpoint (freed when the DataFrame is garbage-collected)."""
    if on_nonconverged not in ("raise", "warn"):
        raise ValueError(f"on_nonconverged must be 'raise' or 'warn', got {on_nonconverged!r}")
    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .unionByName(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("cluster", F.col("id"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iter):
        # neighbor minimum: edge dst receives src's current label
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("cluster").alias("neigh_min"))
        )
        # the previous label rides along through the checkpoint so the
        # convergence test is a filter-count over the materialized
        # round — not a second full join against the old labels
        # (removes one shuffle per round; r7, guide §2.4)
        new_labels = (
            labels.join(neigh, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("cluster"), F.coalesce("neigh_min", F.col("cluster"))
                ).alias("cluster"),
                F.col("cluster").alias("_prev"),
            )
            .localCheckpoint()  # eager: truncates lineage AND materializes
        )
        changed = new_labels.where(F.col("cluster") != F.col("_prev")).count()
        labels = new_labels.select("id", "cluster")
        if changed == 0:
            break
    edges.unpersist()
    if changed != 0:
        msg = (
            f"dup_clusters did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — a component's diameter "
            f"exceeds max_iter; labels would be partial. Raise max_iter."
        )
        if on_nonconverged == "raise":
            raise RuntimeError(msg)
        import warnings

        warnings.warn(msg, UserWarning, stacklevel=2)
    return labels.select(F.col("id"), F.col("cluster"))


def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sim_threshold: float = 0.95,
    n_planes: int = 16,
    n_tables: int = 1,
    dim: int = 64,
    max_bucket: int = 10_000,
) -> DataFrame:
    """Embedding-cosine near-dup: sign-random-projection LSH buckets →
    exact cosine within bucket.  Output (id_a, id_b, cosine).

    ``n_tables`` > 1 uses L independent SRP tables (one fused matmul,
    similarity.srp_multi_bucket_udf): pair recall at angle θ is
    1-(1-p^P)^L with p = 1-θ/π — at cosine ≥ 0.9, P=8/L=12 gives
    recall ≈ 1 while probing ~L buckets per vector, not the corpus.
    ``max_bucket`` is the same degenerate-bucket B² guard as the text
    dedup paths (a zero vector or constant embedding floods one
    bucket per table).
    Cache lifetime: caller-owned, as in minhash_lsh_pairs."""
    from earth_data_kit_spark.operators.similarity import (
        cosine_col,
        srp_bucket_udf,
        srp_multi_bucket_udf,
    )

    emb = ensure_parallelism(emb)
    if n_tables <= 1:
        bucket = srp_bucket_udf(n_planes)(F.col(vec_col)).alias("bucket")
        bucketed = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), bucket)
    else:
        buckets = srp_multi_bucket_udf(n_planes, dim, n_tables)(F.col(vec_col))
        bucketed = emb.select(
            F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
            F.explode(buckets).alias("bucket"),
        )
    bucketed = bucketed.persist()
    sizes = bucketed.groupBy("bucket").count().where(F.col("count") <= max_bucket)
    bucketed = bucketed.join(F.broadcast(sizes.select("bucket")), "bucket")
    a = bucketed.alias("a")
    b = bucketed.alias("b")
    # cosine + threshold run MAP-SIDE in the bucket-join stage, BEFORE
    # the (id_a, id_b) dedup exchange: cosine is functionally dependent
    # on the pair (v is a function of id), so the dedup exchange moves
    # 3 narrow columns of surviving pairs instead of both embedding
    # vectors for every candidate — and the pair dedup plans as a
    # HashAggregate instead of SortAggregate+Sort (guide §2.3, r7;
    # same rework as minhash_lsh_pairs above)
    return (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            cosine_col(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= sim_threshold)
        .dropDuplicates(["id_a", "id_b"])
    )


def paragraph_dedup(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_doc_freq: int = 2,
    min_chars: int = 1,
    max_boilerplate: int = 100_000,
) -> DataFrame:
    """Cross-document PARAGRAPH dedup — the CCNet-style boilerplate
    scrub (Wenzek et al. 2020, arXiv:1911.00359 par. 3.1 deduplicates
    at paragraph granularity; distinct from the per-doc repetition
    signals and from whole-document dedup): a paragraph appearing in
    MORE than ``max_doc_freq`` documents is boilerplate (cookie
    banners, navigation, footers) and is removed from every document;
    the surviving paragraphs are rejoined in their original order.

    Scale shape: ONE shuffle total — the paragraph-hash document-
    frequency aggregation moves only (md5, id) pairs (never the
    text; uniform keys, map-side combinable).  The over-threshold
    set is SMALL by construction (only boilerplate crosses the
    threshold; the long tail of unique paragraphs never leaves the
    aggregation), so it collects to the driver and the rebuild is a
    MAP-ONLY Column pass over the original rows: split -> trim-filter
    -> drop hashes in the set -> array_join.  The first cut rebuilt
    via posexplode + groupBy(id) + sort_array, which re-shuffled
    every paragraph STRING — measured 13.6k docs/s at 32 cores; the
    map-only rebuild avoids that movement entirely.
    ``max_boilerplate`` guards the driver collect: if more distinct
    paragraphs cross the threshold than fits a literal isin set, the
    threshold is wrong for the corpus (raise, don't silently
    degrade).

    Returns (id, text, n_paragraphs, n_removed) — text rebuilt with
    blank-line separators, whitespace-only paragraphs dropped (they
    carry no content and would dominate any frequency count).
    """
    split_paras = F.filter(
        F.transform(F.split(F.col(text_col), r"\n\n"), F.trim),
        lambda p: F.length(p) >= min_chars,
    )
    paras = (
        df.select(F.col(id_col), F.explode(split_paras).alias("para"))
        .withColumn("ph", F.md5(F.col("para")))
        .select(id_col, "ph")
    )
    # document frequency per distinct paragraph; only boilerplate
    # (doc_freq > max_doc_freq) survives the filter — a tiny list
    common = [
        r["ph"]
        for r in (
            paras.groupBy("ph")
            .agg(F.countDistinct(id_col).alias("doc_freq"))
            .where(F.col("doc_freq") > max_doc_freq)
            .select("ph")
            .collect()
        )
    ]
    if len(common) > max_boilerplate:
        raise ValueError(
            f"{len(common)} paragraphs exceed doc_freq {max_doc_freq} — "
            f"threshold too low for this corpus (cap {max_boilerplate})"
        )

    # map-only rebuild against the literal hash set (let-bound via a
    # 1-element transform so the trimmed array is computed once)
    def _rebuild(tl):
        kept = F.filter(tl, lambda p: ~F.md5(p).isin(common)) if common else tl
        return F.struct(
            F.array_join(kept, "\n\n").alias("text"),
            F.size(kept).cast("bigint").alias("n_kept"),
            F.size(tl).cast("bigint").alias("n_total"),
        )

    r = F.transform(F.array(split_paras), _rebuild)[0]
    return df.select(
        F.col(id_col),
        r["text"].alias(text_col),
        r["n_kept"].alias("n_paragraphs"),
        (r["n_total"] - r["n_kept"]).alias("n_removed"),
    )

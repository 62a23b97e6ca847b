"""Deterministic sampling/splitting: reproducible, append-stable."""

import pytest
from pyspark.sql import functions as F

from earth_data_kit_spark.operators import sampling

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


def test_stratified_sample_reproducible_and_sized(spark, docs):
    s1 = {(r.doc_id, r.sample_rank) for r in sampling.stratified_sample(docs, "lang", 5, "doc_id").collect()}
    s2 = {(r.doc_id, r.sample_rank) for r in sampling.stratified_sample(docs, "lang", 5, "doc_id").collect()}
    assert s1 == s2
    per = (
        sampling.stratified_sample(docs, "lang", 5, "doc_id")
        .groupBy("lang").count().collect()
    )
    assert all(r["count"] <= 5 for r in per) and len(per) >= 2
    # a different salt draws a different sample
    s3 = {r.doc_id for r in sampling.stratified_sample(docs, "lang", 5, "doc_id", salt="v2").collect()}
    assert s3 != {d for d, _ in s1}


def test_split_proportions_and_append_stability(spark, docs):
    fr = {"train": 0.8, "val": 0.1, "test": 0.1}
    split = sampling.deterministic_split(docs, "doc_id", fr)
    counts = {r.split: r["count"] for r in split.groupBy("split").count().collect()}
    n = docs.count()
    assert 0.7 * n <= counts.get("train", 0) <= 0.9 * n
    assert set(counts) <= {"train", "val", "test"}
    # append stability: adding rows must not move existing rows
    before = {r.doc_id: r.split for r in split.select("doc_id", "split").collect()}
    extra = docs.limit(50).select(
        (F.col("doc_id") + 900000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    after_df = sampling.deterministic_split(docs.unionByName(extra), "doc_id", fr)
    after = {r.doc_id: r.split for r in after_df.select("doc_id", "split").collect()}
    assert all(after[d] == s for d, s in before.items())
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.deterministic_split(docs, "doc_id", {"a": 0.5, "b": 0.4})

"""MLlib LSH index: recall vs the exact operators (fixed seeds)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_vector_database_spark.operators import mllib_index, retrieval
from rag_vector_database_spark.functions.text import distinct_tokens
from rag_vector_database_spark.plans.registry import query_vector


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()


def test_brp_topk_recall(spark, sf_dir, emb):
    qv = query_vector(spark, sf_dir)
    model, indexed = mllib_index.build_brp_index(emb)
    approx = {r["vec_id"] for r in
              mllib_index.brp_topk(model, indexed, qv, 10).collect()}
    exact = {r["vec_id"] for r in retrieval.knn(emb, qv, 10).collect()}
    # bucket probing may miss some of the true top-10, but with 4 hash
    # tables the candidate set is deterministic (fixed seed) and
    # measured recall@10 is 1.0 / 0.9 / 1.0 at sf0.001/0.01/0.1
    # (SCALE.md round-14) — gate at 0.7, ~2x headroom below the worst
    # measured rung, mirroring brp_ann_recall_invariant's oracle bound
    assert len(approx & exact) >= 7
    assert len(approx) == 10


def test_brp_similarity_join_finds_self_dups(spark, emb):
    # duplicate a few vectors with new ids: the join must find them
    dup = emb.limit(3).withColumn("vec_id", F.col("vec_id") + 1_000_000)
    both = emb.unionByName(dup)
    model, _ = mllib_index.build_brp_index(both)
    a = model.transform(both.withColumn(
        "features", mllib_index.array_to_vector(F.col("embedding"))))
    pairs = mllib_index.brp_similarity_join(model, a, a, 0.05)
    found = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    for r in dup.collect():
        assert (r["vec_id"] - 1_000_000, r["vec_id"]) in found


def test_minhash_join_vs_exact(spark, sf_dir):
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .where(F.col("doc_id") % 7 == 0)
            .select("doc_id", distinct_tokens(F.col("text")).alias("toks"))
            .cache())
    model, indexed = mllib_index.build_minhash_index(docs, "toks")
    pairs = mllib_index.minhash_similarity_join(model, indexed, indexed, 0.5)
    # exact duplicates in the corpus (identical token sets) must be found
    from rag_vector_database_spark.operators.dedup import jaccard
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    exact = (a.join(b, F.col("id_a") < F.col("id_b"))
             .where(jaccard(F.col("ta"), F.col("tb")) >= 0.9))
    want = {(r["id_a"], r["id_b"]) for r in exact.collect()}
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert want <= got  # high-sim pairs are never missed at threshold 0.5

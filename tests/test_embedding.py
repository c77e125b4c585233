"""Embedder contract: the pandas-UDF backend must equal the built-in
expression backend vector-for-vector (certifies the Arrow plumbing that
real model backends ride on)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_vector_database_spark.embedding import (HashingEmbedder,
                                                 SentenceTransformerEmbedder)


def test_expr_equals_udf(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    emb = HashingEmbedder(dim=16)
    a = emb.embed(docs, use_udf=False).select("doc_id", "embedding")
    b = emb.embed(docs, use_udf=True).select("doc_id", "embedding")
    da = {r["doc_id"]: r["embedding"] for r in a.collect()}
    db = {r["doc_id"]: r["embedding"] for r in b.collect()}
    assert set(da) == set(db)
    for k in da:
        assert da[k] == pytest.approx(db[k], abs=1e-6)


def test_normalized(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(20)
    out = HashingEmbedder(dim=16).embed(docs).collect()
    for r in out:
        n = sum(x * x for x in r["embedding"])
        assert n == pytest.approx(1.0, abs=1e-5)


def test_empty_text(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "hello")],
                               ["doc_id", "text"])
    out = {r["doc_id"]: r["embedding"]
           for r in HashingEmbedder(dim=8).embed(df, use_udf=True).collect()}
    assert all(v == 0.0 for v in out[1])
    assert all(v == 0.0 for v in out[2])
    assert any(v != 0.0 for v in out[3])


def test_real_backend_gated():
    with pytest.raises(NotImplementedError):
        SentenceTransformerEmbedder()

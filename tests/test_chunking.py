"""Chunking invariants (FIXTURES.md #3): coverage, overlap, numbering,
id uniqueness, empty-input filtering."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_vector_database_spark.operators.chunking import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "a" * 50),          # shorter than size -> 1 chunk
        (2, "b" * 120),         # exactly size -> 1 chunk
        (3, "c" * 121),         # size+1 -> 2 chunks
        (4, "x" * 1000),        # many chunks
        (5, "   "),             # whitespace-only -> filtered
        (6, "short"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


SIZE, OVERLAP = 120, 20
STRIDE = SIZE - OVERLAP


@pytest.fixture(scope="module")
def chunks(docs):
    return chunk_documents(docs, size=SIZE, overlap=OVERLAP).cache()


def test_whitespace_docs_filtered(chunks):
    assert chunks.where(F.col("doc_id") == 5).count() == 0


def test_chunk_counts(chunks):
    got = {r["doc_id"]: r["n"] for r in
           chunks.groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 10, 6: 1}
    # law: 1000 chars -> ceil((1000-120)/100)+1 = 10


def test_ids_unique_and_deterministic(chunks):
    n = chunks.count()
    assert chunks.select("chunk_id").distinct().count() == n
    first = chunks.where((F.col("doc_id") == 3) & (F.col("chunk_number") == 1)).first()
    assert first["chunk_id"] == "3_chunk_1"


def test_numbering_consistent(chunks):
    bad = chunks.where(
        (F.col("chunk_number") < 1) | (F.col("chunk_number") > F.col("total_chunks")))
    assert bad.count() == 0
    # total_chunks equals the actual per-doc count
    agg = (chunks.groupBy("doc_id", "total_chunks")
           .agg(F.count("*").alias("n"))
           .where(F.col("n") != F.col("total_chunks")))
    assert agg.count() == 0


def test_overlap_reconstruction(chunks, docs):
    """Dropping the leading `overlap` chars of chunks 2..n and
    concatenating reconstructs the original text exactly."""
    rebuilt = (chunks
               .withColumn("piece",
                           F.when(F.col("chunk_number") == 1, F.col("chunk_text"))
                            .otherwise(F.expr(f"substring(chunk_text, {OVERLAP + 1})")))
               .groupBy("doc_id")
               .agg(F.array_join(
                   F.transform(
                       F.array_sort(F.collect_list(F.struct("chunk_number", "piece"))),
                       lambda s: s["piece"]), "").alias("rebuilt")))
    joined = rebuilt.join(docs, "doc_id").where(F.col("rebuilt") != F.col("text"))
    assert joined.count() == 0


def test_consecutive_overlap(chunks):
    """Consecutive chunks share exactly `overlap` chars (when the next
    chunk is full-stride away)."""
    w = chunks.select("doc_id", "chunk_number", "chunk_text")
    nxt = w.select(F.col("doc_id").alias("d"),
                   (F.col("chunk_number") - 1).alias("cn"),
                   F.col("chunk_text").alias("next_text"))
    pairs = w.join(nxt, (w["doc_id"] == nxt["d"]) & (w["chunk_number"] == nxt["cn"]))
    bad = pairs.where(
        F.expr(f"substring(chunk_text, {STRIDE + 1}, {OVERLAP})")
        != F.expr(f"substring(next_text, 1, {OVERLAP})"))
    assert bad.count() == 0


def test_param_validation(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, size=100, overlap=100)

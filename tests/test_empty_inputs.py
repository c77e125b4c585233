"""Degenerate-input hardening: every major operator must return an
empty (or identity) result on an empty input, never crash — the
behavior that matters when a filter or an incremental run leaves
nothing to process."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_vector_database_spark.operators import chunking, dedup, retrieval


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def _empty_emb(spark):
    return spark.createDataFrame([], "vec_id long, embedding array<float>")


def test_empty_corpus_operators(spark):
    docs = _empty_docs(spark)
    assert dedup.exact_duplicates(docs).count() == 0
    assert dedup.minhash_lsh_pairs(docs).count() == 0
    dedup.release_caches()
    assert dedup.simhash_pairs(docs).count() == 0
    assert dedup.boilerplate_tiles_removed(docs).count() == 0
    assert dedup.duplicated_ngram_spans(docs).count() == 0


def test_empty_embeddings_operators(spark):
    emb = _empty_emb(spark)
    qv = [0.0, 1.0, -0.5, 0.25]
    assert retrieval.knn(emb, qv, 5).count() == 0
    assert retrieval.ivf_knn(emb, qv, 5).count() == 0
    assert dedup.cosine_dup_pairs(emb).count() == 0
    # a query vector shorter than the quantizer is a usage error, not
    # a silent wrong bucket
    import pytest
    with pytest.raises(ValueError):
        retrieval.ivf_knn(emb, [0.0, 1.0], 5, sign_bits=3)


def test_empty_chunking(spark):
    docs = _empty_docs(spark)
    out = chunking.chunk_documents(docs)
    assert out.count() == 0
    # whitespace-only docs are filtered, not chunked into empties
    ws = spark.createDataFrame([(1, "   ")], "doc_id long, text string")
    assert chunking.chunk_documents(ws).count() == 0


def test_empty_bloom_and_incremental(spark):
    from rag_vector_database_spark.operators import ingest

    empty = spark.createDataFrame([], "doc_id long")
    some = spark.range(0, 10).select(F.col("id").alias("doc_id"))
    # empty processed set -> bitmap empty -> everything definitely new
    bitmap = ingest.bloom_bitmap(empty, "doc_id")
    assert bitmap.count() == 0
    tested = ingest.bloom_test(some, bitmap, "doc_id")
    assert tested.where(F.col("bloom_pass")).count() == 0
    # empty incoming against a real log -> nothing to ingest
    assert ingest.incremental_filter(empty, some, "doc_id").count() == 0


def test_empty_reconcile_and_deletes(spark, tmp_path):
    """Round-3 operators on degenerate inputs: empty stores reconcile
    to zero diffs; a delete set that matches nothing rewrites nothing;
    footer stats on an empty delete path still restore confs."""
    from rag_vector_database_spark.operators import reconcile as rc
    from rag_vector_database_spark.operators import storage

    empty = spark.createDataFrame([], "k long, v string")
    full = spark.createDataFrame([(1, "a")], "k long, v string")
    fp = F.md5(F.col("v"))
    assert rc.reconcile(empty, empty, "k", fp).count() == 0
    assert [tuple(r) for r in rc.reconcile(full, empty, "k", fp).collect()] \
        == [(1, "only_left")]
    assert [tuple(r) for r in rc.reconcile(empty, full, "k", fp).collect()] \
        == [(1, "only_right")]

    # delete set matching nothing: zero partitions rewritten, files intact
    import glob
    import os
    docs = (spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .select("doc_id", "source"))
    path = str(tmp_path / "no_match_store")
    storage.write_partitioned(docs, path, "source")
    before = {f: os.path.getmtime(f)
              for f in glob.glob(path + "/source=*/part-*.parquet")}
    res = storage.delete_keys_partitioned(
        spark, path, spark.createDataFrame([(10**15,)], "doc_id long"),
        key="doc_id", partition_col="source")
    assert res == {"partitions_rewritten": 0, "rows_deleted": 0}
    after = {f: os.path.getmtime(f)
             for f in glob.glob(path + "/source=*/part-*.parquet")}
    assert before == after


def test_empty_manifest_vacuum(tmp_path):
    from rag_vector_database_spark.sources.manifest_sink import (
        vacuum_generations)

    d = tmp_path / "never_written"
    d.mkdir()
    res = vacuum_generations(str(d))
    assert res["manifests_removed"] == 0 and res["parts_removed"] == 0

"""Incremental-ingest semantics: run-twice-adds-zero (SURVEY §5.4) and
the metadata coercion matrix (ingest_chunks_to_chromadb.py:133-155)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from rag_vector_database_spark.operators.ingest import (
    coerce_metadata, idempotent_append, incremental_filter)


def test_incremental_filter(spark):
    incoming = spark.createDataFrame([(i,) for i in range(10)], ["id"])
    log = spark.createDataFrame([(i,) for i in range(0, 10, 2)], ["key"])
    out = incremental_filter(incoming, log, key="id", processed_key="key")
    assert sorted(r["id"] for r in out.collect()) == [1, 3, 5, 7, 9]


def test_idempotent_append(spark):
    with tempfile.TemporaryDirectory() as d:
        store = f"{d}/store"
        batch1 = spark.createDataFrame([(i, f"t{i}") for i in range(5)], ["id", "text"])
        assert idempotent_append(batch1, store, "id") == 5
        # second run: same input -> +0 rows
        assert idempotent_append(batch1, store, "id") == 0
        assert spark.read.parquet(store).count() == 5
        # overlapping batch: only the new keys land
        batch2 = spark.createDataFrame([(i, f"t{i}") for i in range(3, 8)], ["id", "text"])
        assert idempotent_append(batch2, store, "id") == 3
        assert spark.read.parquet(store).count() == 8


def test_idempotent_append_corrupt_store_raises(spark):
    """Only a MISSING store is 'first run'. A corrupt store must raise,
    not silently re-ingest the whole batch as if empty (which would
    duplicate every row once the store reads healthily again)."""
    import pytest

    with tempfile.TemporaryDirectory() as d:
        store = f"{d}/store"
        batch = spark.createDataFrame([(1, "a")], ["id", "text"])
        import os
        os.makedirs(store)
        with open(f"{store}/part-00000.parquet", "wb") as f:
            f.write(b"this is not a parquet file")
        with pytest.raises(Exception) as exc:
            idempotent_append(batch, store, "id")
        assert "PATH_NOT_FOUND" not in str(exc.value)
        # the corrupt store was not appended to
        assert os.listdir(store) == ["part-00000.parquet"]


def test_coercion_matrix(spark):
    schema = StructType([
        StructField("id", IntegerType()),
        StructField("tags", ArrayType(StringType())),
        StructField("note", StringType()),
        StructField("cnt", IntegerType()),
    ])
    df = spark.createDataFrame(
        [(1, ["a", "b"], "hi", 3),
         (2, [], None, None),
         (3, None, "", 0)], schema)
    out = {r["id"]: r for r in coerce_metadata(df, ["tags", "note", "cnt"]).collect()}
    assert out[1]["tags"] == "a, b" and out[1]["note"] == "hi" and out[1]["cnt"] == "3"
    assert out[2]["tags"] == "N/A" and out[2]["note"] == "N/A" and out[2]["cnt"] == "N/A"
    assert out[3]["tags"] == "N/A" and out[3]["note"] == "" and out[3]["cnt"] == "0"


def test_bloom_prefilter_no_false_negatives(spark, sf_dir):
    """Bloom's contract: every processed key MUST pass the filter (no
    false negatives — missing one would silently re-ingest); bitmap
    size is bounded by m_bits/32 rows; and both probe joins broadcast
    (the big side never shuffles)."""
    from pyspark.sql import functions as F

    from rag_vector_database_spark.operators import ingest

    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    processed = d.where(F.col("doc_id") % 3 == 0)
    bitmap = ingest.bloom_bitmap(processed, "doc_id")
    assert bitmap.count() <= 4096 // 32

    tested = ingest.bloom_test(d, bitmap, "doc_id")
    missed = tested.where((F.col("doc_id") % 3 == 0)
                          & ~F.col("bloom_pass")).count()
    assert missed == 0

    plan = tested._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_read_store_or_none_corrupt_under_ignore_corrupt_files(
        spark, tmp_path):
    """With spark.sql.files.ignoreCorruptFiles=true a fully-corrupt
    store raises UNABLE_TO_INFER_SCHEMA just like an empty dir; the
    directory listing must disambiguate — data files present means
    the error PROPAGATES (the store is damaged, not absent)."""
    import pytest

    from rag_vector_database_spark.operators.ingest import (
        read_store_or_none)

    bad = tmp_path / "corrupt_store"
    bad.mkdir()
    (bad / "part-00000.parquet").write_bytes(b"garbage not parquet")
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try:
        with pytest.raises(Exception):
            df = read_store_or_none(spark, str(bad))
            assert df is not None  # must not classify as first-run
            df.count()
    finally:
        spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
    # and a genuinely EMPTY dir still reads as first-run
    empty = tmp_path / "empty_store"
    empty.mkdir()
    assert read_store_or_none(spark, str(empty)) is None

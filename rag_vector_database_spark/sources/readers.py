"""File-source readers re-expressing the reference's scans.

Each function maps one reference source (SURVEY.md section 2 #1-9) onto
Spark's declarative read path so listing-level pruning
(pathGlobFilter, recursiveFileLookup) happens before any bytes are
read — the reference walks directories in Python
(chunk_local_pdfs.py:107-119, chunk_youtube_transcripts.py:113-145).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def read_kev_catalog(spark: SparkSession, path: str) -> DataFrame:
    """#1: CISA KEV catalog — one JSON doc holding a ``vulnerabilities``
    array (chunk_cisa_kev.py:99-109); explode to one row per vuln."""
    cat = spark.read.option("multiLine", True).json(path)
    return (cat.select(F.explode("vulnerabilities").alias("v"))
            .select("v.*"))


def read_json_documents(spark: SparkSession, directory: str,
                        schema: StructType | None = None) -> DataFrame:
    """#2: recursive per-file JSON documents (transcript records,
    chunk_youtube_transcripts.py:113-145) with their source path."""
    reader = spark.read.option("multiLine", True) \
                       .option("recursiveFileLookup", True)
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(directory)
    return (df.withColumn("source_path", F.input_file_name())
            # hidden-dir pruning (#15, chunk_local_pdfs.py:110)
            .where(~F.input_file_name().rlike("/\\.")))


def read_jsonl_chunks(spark: SparkSession, path: str,
                      schema: StructType | None = None) -> DataFrame:
    """#5: JSONL chunk scan with malformed-line tolerance
    (ingest_chunks_to_chromadb.py:119-172). PERMISSIVE mode +
    ``_corrupt_record`` replaces the reference's skip-and-count."""
    reader = (spark.read.option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record"))
    if schema is not None:
        reader = reader.schema(schema)
    # Spark disallows queries touching only _corrupt_record on raw JSON;
    # caching materializes the parse so corrupt rows are filterable.
    return reader.json(path).cache()


def read_binaries(spark: SparkSession, directory: str,
                  glob: str = "*.pdf") -> DataFrame:
    """#3: binary documents (PDFs) with listing-level glob pruning.
    The extension predicate (#14, chunk_local_pdfs.py:113) is the
    pathGlobFilter — applied at file LISTING, before any bytes move.
    Columns: path, modificationTime, length, content(binary)."""
    return (spark.read.format("binaryFile")
            .option("pathGlobFilter", glob)
            .option("recursiveFileLookup", True)
            .load(directory))


def extract_pdf_text(df: DataFrame, content_col: str = "content"):
    """#4: per-page text extraction over binaryFile content
    (chunk_local_pdfs.py:138-159: page get_text, '\\n\\n' page join, doc
    metadata). PyMuPDF is not in this container, so the kernel is a
    deterministic stub; the mapInPandas plumbing (Arrow batches of
    binary, typed struct out) is the real, tested surface."""
    from collections.abc import Iterator

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    try:
        import fitz  # PyMuPDF  # noqa: F401
        have_fitz = True
    except ImportError:
        have_fitz = False

    schema = StructType([
        StructField("path", StringType()),
        StructField("text", StringType()),
        StructField("n_pages", LongType()),
        StructField("pdf_title", StringType()),
    ])

    def extract(batches: Iterator) -> Iterator:
        import hashlib

        import pandas as pd
        for pdf in batches:
            if have_fitz:
                raise NotImplementedError(
                    "real path: fitz.open(stream=bytes) -> "
                    "'\\n\\n'.join(page.get_text(sort=True)) + doc.metadata; "
                    "enable when PyMuPDF ships")
            blobs = pdf[content_col].map(bytes)
            yield pd.DataFrame({
                "path": pdf["path"],
                "text": blobs.map(lambda b: b.decode("latin-1", "replace")),
                "n_pages": blobs.map(lambda b: max(len(b) // 1024, 1)),
                "pdf_title": blobs.map(
                    lambda b: "doc-" + hashlib.md5(b).hexdigest()[:8]),
            })

    return df.select("path", content_col).mapInPandas(extract, schema)


def exclude_paths(df: DataFrame, pattern: str) -> DataFrame:
    """#16: negative glob (download_ia_collection.py:61-66) as a path
    filter on an already-listed source."""
    return df.where(~F.col("path").rlike(pattern))

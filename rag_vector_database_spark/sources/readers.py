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
                      schema: StructType | None = None,
                      materialize_corrupt: bool = False) -> DataFrame:
    """#5: JSONL chunk scan with malformed-line tolerance
    (ingest_chunks_to_chromadb.py:119-172). PERMISSIVE mode +
    ``_corrupt_record`` replaces the reference's skip-and-count.

    ``materialize_corrupt=True`` caches the parse — required ONLY when
    the caller filters on ``_corrupt_record`` (Spark disallows queries
    touching only that column on raw JSON). Off by default: silently
    caching a 100 TB corpus is a memory-pressure bug, not a convenience.
    """
    reader = (spark.read.option("mode", "PERMISSIVE")
              .option("columnNameOfCorruptRecord", "_corrupt_record"))
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.json(path)
    return df.cache() if materialize_corrupt else df


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


def pdf_extract_kernel(fitz_mod, blob: bytes) -> tuple[str, int, str | None]:
    """#4's per-document kernel against a PyMuPDF-shaped module: open the
    byte stream, pull page text sorted in reading order, join pages with
    '\\n\\n', and surface the embedded title (chunk_local_pdfs.py:138-159).
    Module passed as a parameter so tests exercise this real branch with
    a fake ``fitz`` even though PyMuPDF is absent from the container."""
    doc = fitz_mod.open(stream=bytes(blob), filetype="pdf")
    try:
        text = "\n\n".join(page.get_text(sort=True) for page in doc)
        meta = doc.metadata or {}
        return text, doc.page_count, (meta.get("title") or None)
    finally:
        doc.close()


def pdf_stub_kernel(blob: bytes) -> tuple[str, int, str]:
    """Deterministic fallback when PyMuPDF is not installed: fake text /
    page count / title derived only from the bytes."""
    import hashlib
    b = bytes(blob)
    return (b.decode("latin-1", "replace"), max(len(b) // 1024, 1),
            "doc-" + hashlib.md5(b).hexdigest()[:8])


def extract_pdf_text(df: DataFrame, content_col: str = "content"):
    """#4: per-page text extraction over binaryFile content
    (chunk_local_pdfs.py:138-159: page get_text, '\\n\\n' page join, doc
    metadata). The real PyMuPDF kernel runs whenever ``fitz`` imports on
    the executor; the deterministic stub is the ImportError fallback, so
    the mapInPandas plumbing (Arrow batches of binary, typed struct out)
    is exercised either way."""
    from collections.abc import Iterator

    from pyspark.sql.types import (LongType, StringType, StructField,
                                   StructType)

    schema = StructType([
        StructField("path", StringType()),
        StructField("text", StringType()),
        StructField("n_pages", LongType()),
        StructField("pdf_title", StringType()),
    ])

    def extract(batches: Iterator) -> Iterator:
        import pandas as pd
        try:
            import fitz  # PyMuPDF — imported executor-side
        except ImportError:
            fitz = None
        for pdf in batches:
            if fitz is not None:
                rows = [pdf_extract_kernel(fitz, b) for b in pdf[content_col]]
            else:
                rows = [pdf_stub_kernel(b) for b in pdf[content_col]]
            yield pd.DataFrame({
                "path": pdf["path"],
                "text": [r[0] for r in rows],
                "n_pages": [r[1] for r in rows],
                "pdf_title": [r[2] for r in rows],
            })

    return df.select("path", content_col).mapInPandas(extract, schema)


def exclude_paths(df: DataFrame, pattern: str) -> DataFrame:
    """#16: negative glob (download_ia_collection.py:61-66) as a path
    filter on an already-listed source."""
    return df.where(~F.col("path").rlike(pattern))

"""Text chunking: 1 document -> N ordered overlapping chunks.

Reference semantics (SURVEY.md section 2 #33-35,57-58): recursive
character split with chunk_size=1000, chunk_overlap=150
(chunk_cisa_kev.py:23-24,32-37), 1-based chunk numbering with per-doc
totals (chunk_cisa_kev.py:148-155), deterministic ids
``{doc_key}_chunk_{i+1}`` (chunk_cisa_kev.py:152), and empty-chunk
filtering (chunk_cisa_kev.py:149-150).

We implement the documented size/overlap contract as fixed-stride
sliding windows (stride = size - overlap) rather than byte-identical
recursive separator backtracking — SURVEY.md section 7 "what's hard"
documents this simplification; the invariants (coverage, overlap,
numbering, id uniqueness) are what tests verify.

Spark-first consequence: chunking is NOT a UDF. It is
``sequence() -> substring() -> explode`` — pure built-ins, whole-stage
codegen, zero Python boundary, and embarrassingly parallel: at 100 TB
each parquet split chunks independently with no shuffle at all.

Chunk-count law (all integer arithmetic, oracle-identical):
    n_chunks(len) = 1                         if len <= size
                  = ceil((len-size)/stride)+1 otherwise
so the last chunk starts at (n_chunks-1)*stride+1 <= len and every
character is covered; consecutive chunks share exactly ``overlap``
chars except possibly the last pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import chunk_id

# Reference defaults (chunk_cisa_kev.py:23-24)
DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 150


def n_chunks(length: Column, size: int, stride: int) -> Column:
    """Number of chunks for a text of ``length`` chars (integer math)."""
    extra = (length - size + stride - 1)
    return F.when(length <= size, F.lit(1)) \
            .otherwise((extra - (extra % stride)) / stride + 1).cast("int")


def chunk_documents(docs: DataFrame,
                    text_col: str = "text", key_col: str = "doc_id",
                    size: int = DEFAULT_CHUNK_SIZE,
                    overlap: int = DEFAULT_CHUNK_OVERLAP,
                    keep_cols: tuple[str, ...] = (),
                    soft: bool = False) -> DataFrame:
    """Explode documents into the canonical chunk record (FIXTURES.md #3):

    (chunk_id, <key_col>, chunk_number, total_chunks, chunk_text,
     chunk_len, *keep_cols)

    Whitespace-only inputs produce zero chunks (the reference's empty
    filter); all other chunks are non-empty by construction.

    ``soft=True`` is the separator-aware mode approximating the
    reference's RecursiveCharacterTextSplitter word-boundary behavior
    (chunk_cisa_kev.py:32-37): a non-final chunk that would cut
    mid-word is trimmed back to its last whitespace (the dropped
    partial word reappears at the next chunk's start via the overlap,
    provided the word is shorter than ``overlap`` — natural-language
    text; a chunk that is one unbroken token keeps the hard cut).
    Chunk numbering, totals, and ids are identical to hard mode — only
    chunk_text/chunk_len change — so both modes share one oracle CTE.
    """
    if not 0 <= overlap < size:
        raise ValueError("require 0 <= overlap < size")
    stride = size - overlap
    text = F.col(text_col)
    total = n_chunks(F.length(text), size, stride)
    numbered = (docs
                .where(F.length(F.trim(text)) > 0)
                .withColumn("total_chunks", total)
                .select(key_col, "total_chunks", text_col, *keep_cols,
                        F.explode(F.sequence(F.lit(1), F.col("total_chunks")))
                         .alias("chunk_number")))
    start = (F.col("chunk_number") - 1) * stride + 1
    chunk_text = text.substr(start, F.lit(size))
    if soft:
        # next char AFTER the window: if whitespace, the window already
        # ends on a word boundary; if not, drop the trailing partial
        # word (unless that empties the chunk — single unbroken token).
        next_ch = text.substr(start + size, F.lit(1))
        trimmed = F.rtrim(F.regexp_replace(chunk_text, r"\s+\S*$", ""))
        chunk_text = (
            F.when(F.col("chunk_number") == F.col("total_chunks"), chunk_text)
            .when(next_ch.rlike(r"^\s$"), chunk_text)
            .when(trimmed != "", trimmed)
            .otherwise(chunk_text))
    return (numbered
            .select(
                chunk_id(F.col(key_col), F.col("chunk_number") - 1).alias("chunk_id"),
                F.col(key_col),
                "chunk_number", "total_chunks",
                chunk_text.alias("chunk_text"),
                F.length(chunk_text).alias("chunk_len"),
                *keep_cols))


def dd_chunk_cte(size: int, overlap: int,
                 table: str = "documents", key: str = "doc_id",
                 text: str = "text", keep_cols: tuple[str, ...] = (),
                 soft: bool = False) -> str:
    """DuckDB CTE body producing the same chunk rows as
    ``chunk_documents`` (same integer chunk-count law, same soft-mode
    word-boundary rule); compose it into oracle SQL as
    ``WITH chunks AS ({this}) SELECT ...``."""
    stride = size - overlap
    keep = "".join(f", {c}" for c in keep_cols)
    hard = f"substring(b.t, (n.chunk_number - 1) * {stride} + 1, {size})"
    if soft:
        next_ch = f"substring(b.t, (n.chunk_number - 1) * {stride} + 1 + {size}, 1)"
        trimmed = f"rtrim(regexp_replace({hard}, '\\s+\\S*$', ''))"
        chunk_expr = f"""CASE
           WHEN n.chunk_number = b.total_chunks THEN {hard}
           WHEN regexp_matches({next_ch}, '^\\s$') THEN {hard}
           WHEN {trimmed} <> '' THEN {trimmed}
           ELSE {hard} END"""
    else:
        chunk_expr = hard
    return f"""
  SELECT CAST(b.{key} AS VARCHAR) || '_chunk_' || CAST(n.chunk_number AS VARCHAR) AS chunk_id,
         b.{key}, CAST(n.chunk_number AS INT) AS chunk_number, b.total_chunks,
         {chunk_expr} AS chunk_text,
         CAST(length({chunk_expr}) AS INT) AS chunk_len
         {keep}
  FROM (
    SELECT {key}, {text} AS t{keep},
           CASE WHEN length({text}) <= {size} THEN 1
                ELSE CAST(((length({text}) - {size} + {stride} - 1)
                     - ((length({text}) - {size} + {stride} - 1) % {stride})) / {stride} AS INT) + 1
           END AS total_chunks
    FROM {table}
    WHERE length(trim({text})) > 0
  ) b, unnest(generate_series(1, b.total_chunks)) AS n(chunk_number)
"""


try:  # Python UDTFs: Spark >= 3.5 (this repo targets Spark 4)
    from pyspark.sql.functions import udtf as _udtf

    @_udtf(returnType="chunk_number int, chunk_text string, chunk_len int")
    class ChunkSpansUDTF:
        """Table-function form of the hard-stride chunker — one input
        row fans out to total_chunks output rows. Same integer chunk
        law as ``chunk_documents``; exists to exercise Spark's Python
        UDTF surface (the reference's splitter is a per-doc generator,
        chunk_cisa_kev.py:32-37 — a UDTF is its direct Spark analog).
        The expression pipeline above remains the production path; a
        row-at-a-time Python UDTF is the slow lane, for sampled slices
        and API parity only."""

        def eval(self, text, size, overlap):
            if text is None or not text.strip():
                return
            stride = size - overlap
            n = len(text)
            total = 1 if n <= size else (n - size + stride - 1) // stride + 1
            for i in range(1, total + 1):
                c = text[(i - 1) * stride:(i - 1) * stride + size]
                yield i, c, len(c)

    HAVE_UDTF = True
except ImportError:  # pragma: no cover
    HAVE_UDTF = False

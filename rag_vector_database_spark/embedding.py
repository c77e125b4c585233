"""Pluggable embedding backends (SURVEY.md section 2 #46, #63).

This module is the template for the engine's whole UDF surface (#63):
every reference extension point (splitter #33, PDF extract #4, embedder
#46, cross-encoder #49, LLM #62) is a pandas UDF (Arrow-batched,
per-executor init) or a pure column expression — never a row-at-a-time
Python UDF. No UDAF/UDTF is needed anywhere (SURVEY.md section 2 #63).

The reference embeds with BAAI/bge-base-en-v1.5 (768-d, L2-normalized,
ingest_chunks_to_chromadb.py:35,63-67). Real transformer models are not
oracle-checkable (SURVEY.md section 5.2), so the engine defines one
column contract — ``embed(df, text_col) -> df + embedding
array<float>`` — with two interchangeable backends:

- ``HashingEmbedder`` (default, deterministic): md5 feature hashing of
  whitespace tokens into ``dim`` signed buckets, L2-normalized. Exists
  in two equivalent forms: pure built-ins (``embed_expr``) and an
  Arrow-batched pandas UDF (``embed_udf``) — the unit test asserts
  they produce identical vectors, which certifies the pandas-UDF
  plumbing that a real model backend rides on.
- ``SentenceTransformerEmbedder``: the real thing, loaded lazily per
  executor inside an iterator pandas UDF (model initialized once per
  worker, batches streamed through Arrow — the Spark equivalent of the
  reference's batch-of-5 GPU loop). Gated behind an import-try because
  the library is not in this container.
"""

import math
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from .functions.hashing import md5_long
from .functions.text import tokens

DEFAULT_DIM = 16


class HashingEmbedder:
    """Deterministic feature-hashing embedder.

    token -> h = int(md5(token)[:8], 16); bucket = h mod dim;
    sign = +1 if bit 16 of h else -1; vector = L2-normalized bucket sums.
    """

    def __init__(self, dim: int = DEFAULT_DIM):
        self.dim = dim

    # -- JVM path (built-ins; used by the oracle-checked query) --------
    def embed_expr(self, text: Column) -> Column:
        """Dense array<double> embedding as a pure column expression."""
        toks = tokens(text)
        h = lambda t: md5_long(t, 8)  # noqa: E731
        sign = lambda t: (F.shiftright(h(t), 16).bitwiseAND(F.lit(1)) * 2 - 1).cast("double")  # noqa: E731
        buckets = F.array(*[
            F.aggregate(toks, F.lit(0.0),
                        lambda acc, t: acc + F.when(h(t) % self.dim == i, sign(t))
                                             .otherwise(F.lit(0.0)))
            for i in range(self.dim)])
        norm = F.sqrt(F.aggregate(buckets, F.lit(0.0), lambda a, x: a + x * x))
        return F.when(norm > 0, F.transform(buckets, lambda x: x / norm)) \
                .otherwise(buckets)

    # -- Arrow path (pandas UDF; the surface real models plug into) ----
    def embed_udf(self):
        import hashlib

        import numpy as np

        dim = self.dim

        def one(text: str) -> list[float]:
            vec = np.zeros(dim)
            for t in (text or "").split():
                h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
                vec[h % dim] += 1.0 if (h >> 16) & 1 else -1.0
            n = math.sqrt(float((vec * vec).sum()))
            return list(vec / n) if n > 0 else list(vec)

        @F.pandas_udf(ArrayType(FloatType()))
        def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            # iterator form: per-worker init happens once, here (a real
            # model loads its weights in this scope)
            for s in batches:
                yield s.map(one)

        return _embed

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding", use_udf: bool = False) -> DataFrame:
        vec = (self.embed_udf()(F.col(text_col)) if use_udf
               else self.embed_expr(F.col(text_col)).cast("array<float>"))
        return df.withColumn(out_col, vec)


class SentenceTransformerEmbedder:
    """Real-model backend (BAAI/bge-base-en-v1.5 by default, matching
    ingest_chunks_to_chromadb.py:35). Requires sentence-transformers."""

    def __init__(self, model_name: str = "BAAI/bge-base-en-v1.5",
                 batch_size: int = 64, normalize: bool = True):
        try:
            import sentence_transformers  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "sentence-transformers is not installed in this environment; "
                "use HashingEmbedder for deterministic tests") from e
        self.model_name = model_name
        self.batch_size = batch_size
        self.normalize = normalize

    def embed_udf(self):
        model_name, batch_size, normalize = (
            self.model_name, self.batch_size, self.normalize)

        @F.pandas_udf(ArrayType(FloatType()))
        def _embed(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
            from sentence_transformers import SentenceTransformer
            model = SentenceTransformer(model_name)  # once per worker
            for s in batches:
                vecs = model.encode(list(s), batch_size=batch_size,
                                    normalize_embeddings=normalize)
                yield pd.Series([list(v) for v in vecs])

        return _embed

    def embed(self, df: DataFrame, text_col: str = "text",
              out_col: str = "embedding") -> DataFrame:
        return df.withColumn(out_col, self.embed_udf()(F.col(text_col)))

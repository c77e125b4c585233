"""Vector column expressions over ``array<float>`` embeddings.

Reference behavior: embeddings are L2-normalized at write time so cosine
similarity reduces to a dot product at query time
(ingest_chunks_to_chromadb.py:66, query_rag_database.py:127). We keep
that contract: ``dot`` is the scorer and ``l2_normalize`` enforces the
invariant at ingest.

Everything here is built from higher-order functions (``zip_with``,
``aggregate``, ``transform``), so the scorer runs inside whole-stage
codegen with no Python boundary — the 100 TB path: a brute-force top-k
is one columnar scan + TakeOrderedAndProject (no global sort, no
shuffle of the vectors themselves).

Determinism note: products are computed in float64 and summed strictly
left-to-right (``aggregate`` semantics), matching the DuckDB oracle's
``list_reduce(list_transform(...))`` formulation exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column | str, b: Column | str) -> Column:
    """Float64 dot product of two array<float> columns (or literals)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column | str) -> Column:
    """L2 norm of an array<float> column."""
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; use ``dot`` directly when vectors are normalized."""
    return dot(a, b) / (norm(a) * norm(b))


def l2_normalize(a: Column | str) -> Column:
    """Scale an array<float> to unit L2 norm (null-safe for zero vectors)."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: (x.cast("double") / n).cast("float")))


def unit_double(a: Column | str) -> Column:
    """Scale to unit L2 norm KEEPING float64 components (l2_normalize
    casts back to float32, which is right for storage but wrong for a
    hash-oracle-checkable scorer: the oracle would have to replicate
    the float32 rounding). With integer or float64 inputs, each
    component is one IEEE-exact division by a correctly-rounded sqrt
    of the left-fold sum of squares — bit-reproducible by DuckDB's
    list_reduce formulation. Null for zero vectors (callers filter or
    contract them away)."""
    a = F.col(a) if isinstance(a, str) else a
    n = norm(a)
    return F.when(n > 0, F.transform(a, lambda x: x.cast("double") / n))


def query_vec_lit(vec) -> Column:
    """A literal query vector column (broadcast as part of the plan).
    Built as one SQL string (one py4j round trip; Python repr
    round-trips the exact IEEE754 double and Spark's <digits>D lexer
    parses it correctly-rounded) instead of a per-element F.lit loop —
    same array<double> literal, ~dim x fewer JVM calls. Non-finite
    components (no <digits>D spelling) use CAST('...' AS DOUBLE), so a
    vector containing inf/NaN still parses to the same doubles the old
    F.lit loop produced (r14 advisor)."""
    if not len(vec):
        return F.array(*[])

    def num(x: float) -> str:
        x = float(x)
        if x != x:
            return "CAST('NaN' AS DOUBLE)"
        if x in (float("inf"), float("-inf")):
            return f"CAST('{'-' if x < 0 else ''}Infinity' AS DOUBLE)"
        return repr(x) + "D"

    return F.expr("array(" + ",".join(num(x) for x in vec) + ")")


def quantize_int8(a: Column | str) -> Column:
    """Symmetric int8 quantization of a unit-norm vector:
    clamp(round(x * 127), -127, 127). 4x smaller at rest than float32
    (the first lever when the 100 TB table is mostly embeddings), and
    int dot products are integer-exact — no float-order drift, so the
    quantized scorer is hash-oracle-checkable."""
    a = F.col(a) if isinstance(a, str) else a
    return F.transform(
        a, lambda x: F.greatest(
            F.lit(-127),
            F.least(F.lit(127),
                    F.round(x.cast("double") * 127).cast("int"))))


def sign_bit_word(a: Column | str, word: int, word_bits: int = 32) -> Column:
    """Pack sign bits of one ``word_bits``-wide slice of a float vector
    into a long: bit i is 1 iff ``a[word*word_bits + i] > 0``
    (little-endian within the word). 32x smaller than float32 at rest —
    the binary-quantization lever modern vector stores pull before PQ.
    Computed as a high-to-low fold (acc*2 + bit), which is exact
    integer arithmetic and therefore portable to any engine with a
    list fold; 32-bit words keep every value positive in an int64.

    Sign convention: STRICTLY ``> 0`` here and in the driver-side twin
    ``pack_sign_bits`` — retrieval's IVF coarse quantizer
    (``_sign_bucket``) uses ``>= 0``. Each surface is internally
    consistent and oracle-pinned, but a packed signature is NOT
    reusable as an IVF bucket id: they disagree on exact-zero dims."""
    a = F.col(a) if isinstance(a, str) else a
    lo = word * word_bits
    return F.aggregate(
        F.sequence(F.lit(word_bits - 1), F.lit(0), F.lit(-1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc * 2
        + F.when(F.get(a, F.lit(lo) + i) > 0, 1).otherwise(0))


def hamming_words(pairs: list[tuple[Column, int]]) -> Column:
    """Hamming distance between packed sign-bit words and a literal
    query signature: sum of bit_count(xor(word, query_word))."""
    out = F.lit(0)
    for col, qw in pairs:
        out = out + F.bit_count(col.bitwiseXOR(F.lit(qw)))
    return out.cast("int")


def pack_sign_bits(vec: list[float], word_bits: int = 32) -> list[int]:
    """Driver-side twin of sign_bit_word for the query vector (same
    strict ``> 0`` convention — see sign_bit_word on why these words
    must not be reused as IVF ``>= 0`` bucket ids)."""
    words = []
    for w in range(0, len(vec), word_bits):
        acc = 0
        for i, x in enumerate(vec[w:w + word_bits]):
            acc |= (1 << i) if x > 0 else 0
        words.append(acc)
    return words


def dot_int(a: Column | str, b: Column | str) -> Column:
    """Exact integer dot product of two array<int> columns."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )

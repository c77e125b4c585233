"""Portable deterministic hashing primitives.

The dedup family (MinHash/LSH, SimHash, fingerprints) needs hashes that
are (a) computable JVM-side with built-in functions and (b) exactly
reproducible in ANSI SQL for the DuckDB oracle. Spark's ``xxhash64`` and
DuckDB's ``hash`` disagree, so everything is built on ``md5`` hex
digests, which both engines share bit-for-bit:

- string hash   -> md5 hex digest (lexicographic order is a valid
                   uniform order, so MinHash can take string minima)
- integer hash  -> first 8 (or 4) hex chars parsed as an integer
                   (Spark ``conv(x,16,10)``, DuckDB ``('0x'||x)::BIGINT``)

md5 is ~2x slower than xxhash64 but still JVM-side and vectorized;
portability of the oracle wins. Swap ``xxhash64`` in behind the same
helpers if oracle parity is ever relaxed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_long(c: Column, hex_chars: int = 8) -> Column:
    """First ``hex_chars`` md5 hex chars as a non-negative BIGINT.

    DuckDB equivalent: ``('0x' || substring(md5(c),1,N))::BIGINT``.
    8 hex chars -> 32 bits, always fits a BIGINT.
    """
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("long")


def md5_long_sql(src: str, hex_chars: int = 8) -> str:
    """``md5_long`` as a SQL fragment over an arbitrary source
    expression — for the one-parse F.expr construction path (same
    expression tree: conv/substring/md5/cast)."""
    return (f"CAST(conv(substring(md5({src}), 1, {int(hex_chars)}),"
            f" 16, 10) AS BIGINT)")


# Universal-hash family for MinHash: h_k(x) = (a_k*x + b_k) mod P over a
# 32-bit base hash. P is the smallest prime > 2^32; a < 2^31 keeps a*x
# inside a signed 64-bit long in both engines. One md5 per shingle
# TOTAL (the base hash); the n_hashes permutations are integer
# multiply-add — versus n_hashes md5s per shingle for seeded digests.
MINHASH_P = 4294967311


def minhash_params(n_hashes: int) -> tuple[list[int], list[int]]:
    """Deterministic (a, b) coefficients, identical across engines."""
    import random
    rnd = random.Random(0xC0FFEE)
    a = [rnd.randrange(1, 1 << 31) for _ in range(n_hashes)]
    b = [rnd.randrange(0, 1 << 31) for _ in range(n_hashes)]
    return a, b


def minhash_sig(base_hashes: Column | str, n_hashes: int) -> Column:
    """MinHash signature (array<long>) over precomputed 32-bit base
    hashes of the shingles (``md5_long`` each shingle ONCE upstream —
    and materialize that column, or projection collapse re-inlines the
    md5 into all n_hashes lambdas). Per-row higher-order functions only
    — no explode, no shuffle.

    Pass the COLUMN NAME to build the whole signature as one SQL
    string (one py4j round trip instead of ~8 per permutation — the
    expression tree is identical; the int coefficients and the >2^31
    prime parse to the same literal types the Column API produced)."""
    av, bv = minhash_params(n_hashes)
    if isinstance(base_hashes, str):
        from .text import quote_ident
        col = quote_ident(base_hashes)
        perms = ",".join(
            f"array_min(transform({col}, "
            f"x -> ({av[k]} * x + {bv[k]}) % {MINHASH_P}))"
            for k in range(n_hashes))
        return F.expr(f"array({perms})")

    def perm(a: int, b: int):
        return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(MINHASH_P)

    return F.array(*[
        F.array_min(F.transform(base_hashes, perm(av[k], bv[k])))
        for k in range(n_hashes)
    ])


def band_keys(sig: Column | str, n_bands: int,
              rows_per_band: int) -> Column:
    """LSH band keys: md5 of each band's concatenated signature slice.
    Docs sharing any band key become candidate near-dup pairs.
    Pass the signature COLUMN NAME for one-round-trip SQL construction
    (see minhash_sig)."""
    if isinstance(sig, str):
        from .text import quote_ident
        col = quote_ident(sig)
        bands = ",".join(
            "md5(concat_ws('|', " + ", ".join(
                f"cast(element_at({col}, {b * rows_per_band + r + 1})"
                " as string)" for r in range(rows_per_band)) + "))"
            for b in range(n_bands))
        return F.expr(f"array({bands})")
    return F.array(*[
        F.md5(F.concat_ws(
            "|", *[F.element_at(sig, b * rows_per_band + r + 1).cast("string")
                   for r in range(rows_per_band)]))
        for b in range(n_bands)
    ])

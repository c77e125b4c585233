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


def md5_hex(c: Column) -> Column:
    return F.md5(c)


def md5_long(c: Column, hex_chars: int = 8) -> Column:
    """First ``hex_chars`` md5 hex chars as a non-negative BIGINT.

    DuckDB equivalent: ``('0x' || substring(md5(c),1,N))::BIGINT``.
    8 hex chars -> 32 bits, always fits a BIGINT.
    """
    return F.conv(F.substring(F.md5(c), 1, hex_chars), 16, 10).cast("long")


def seeded(c: Column, seed: int) -> Column:
    """Seed-prefixed value for independent hash families."""
    return F.concat(F.lit(f"{seed}:"), c)


def minhash_sig(tokens: Column, n_hashes: int) -> Column:
    """MinHash signature: array of lexicographic-min md5 digests, one per
    seed. Per-row higher-order functions only — no explode, no shuffle."""
    return F.array(*[
        F.array_min(F.transform(tokens, lambda t: md5_hex(seeded(t, s))))
        for s in range(n_hashes)
    ])


def band_keys(sig: Column, n_bands: int, rows_per_band: int) -> Column:
    """LSH band keys: md5 of each band's concatenated signature slice.
    Docs sharing any band key become candidate near-dup pairs."""
    return F.array(*[
        F.md5(F.concat_ws(
            "|", *[F.element_at(sig, b * rows_per_band + r + 1)
                   for r in range(rows_per_band)]))
        for b in range(n_bands)
    ])

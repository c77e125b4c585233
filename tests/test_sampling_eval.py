"""Round-5 operators: salted top-cap fold, aHash near-dup blocking,
rank normalization, ranking metrics — behavioral gates beyond the
DuckDB parity rows in test_parity.py."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from rag_vector_database_spark.operators import dedup, sampling
from rag_vector_database_spark.operators.retrieval import (dcg_cum_discounts,
                                                           dcg_discounts)
from rag_vector_database_spark.sources import multimodal as mm


# ---------------------------------------------------------------------------
# salted_top_per_group == the window top-N it replaces

def test_salted_top_matches_window(spark):
    random.seed(7)
    rows = [(i, f"g{i % 5}", random.randrange(100)) for i in range(400)]
    df = spark.createDataFrame(rows, ["id", "grp", "q"])
    order = F.struct(F.col("q").cast("long").alias("q"),
                     (-F.col("id")).alias("nid"))
    got = sampling.salted_top_per_group(df, "grp", order, cap=7, id_col="id")
    w = Window.partitionBy("grp").orderBy(F.col("q").desc(),
                                          F.col("id").asc())
    want = (df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 7).drop("rn"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_salted_top_small_group_kept_whole(spark):
    df = spark.createDataFrame([(1, "g", 5), (2, "g", 3)],
                               ["id", "grp", "q"])
    order = F.struct(F.col("q").cast("long").alias("q"),
                     (-F.col("id")).alias("nid"))
    got = sampling.salted_top_per_group(df, "grp", order, cap=10,
                                        id_col="id")
    assert got.count() == 2


# ---------------------------------------------------------------------------
# ahash32 kernel == the pure-Python reference; banding has full recall

def _ref_ahash(data: bytes, n_blocks: int = 32) -> int:
    length = len(data)
    if not length:
        return 0
    sums = [0] * n_blocks
    lens = [0] * n_blocks
    for p, v in enumerate(data):
        i = (p * n_blocks) // length
        sums[i] += v
        lens[i] += 1
    tot = sum(sums)
    h = 0
    for i in range(n_blocks):
        if sums[i] * length > tot * lens[i]:
            h |= 1 << i
    return h


def test_ahash_kernel_matches_reference(spark):
    texts = ["hello world " * 9, "a", "z" * 48,
             "the quick brown fox jumps over the lazy dog " * 4]
    df = mm.attach_blob(spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]))
    got = {r["id"]: r["ahash"] for r in mm.ahash32(df).collect()}
    for i, t in enumerate(texts):
        assert got[i] == _ref_ahash(t.encode()), t[:20]


def test_blob_ahash_pairs_full_recall_vs_allpairs(spark):
    random.seed(11)
    base = bytes(random.randrange(256) for _ in range(200))
    texts = []
    for i in range(40):
        b = bytearray(base)
        for _ in range(i % 5):  # growing perturbation
            b[random.randrange(200)] = random.randrange(256)
        texts.append((i, bytes(b).hex()))  # hex keeps it ascii
    df = mm.attach_blob(spark.createDataFrame(texts, ["id", "text"]))
    hashes = mm.ahash32(df)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.blob_ahash_pairs(hashes).collect()}
    hs = {r["id"]: r["ahash"] for r in hashes.collect()}
    want = {}
    ids = sorted(hs)
    for x in ids:
        for y in ids:
            if x < y:
                d = bin(hs[x] ^ hs[y]).count("1")
                if d <= 3:
                    want[(x, y)] = d
    # pigeonhole: max_hamming=3 < 4 bands => banding misses NOTHING
    assert got == want
    assert want, "perturbed copies should produce at least one pair"


# ---------------------------------------------------------------------------
# dcg discount literals

def test_dcg_discount_literals():
    d = dcg_discounts(10)
    assert d[0] == 1.0
    assert abs(d[1] - 1 / math.log2(3)) < 1e-9
    cum = dcg_cum_discounts(10)
    assert cum[0] == 1.0
    assert cum[-1] == pytest.approx(sum(d), abs=1e-9)
    assert all(b > a for a, b in zip(cum, cum[1:]))


# ---------------------------------------------------------------------------
# empty inputs degrade to empty outputs (no crashes, no NaNs)

def test_empty_inputs_r05_ops(spark):
    docs = spark.createDataFrame([], "doc_id long, text string, "
                                     "source string, n_chars long")
    blobs = mm.attach_blob(docs)
    hashes = mm.ahash32(blobs, id_col="doc_id")
    assert dedup.blob_ahash_pairs(hashes).count() == 0
    dedup.release_caches()
    frames = mm.sample_frames(blobs, id_col="doc_id")
    assert dedup.frame_dup_stats(frames).count() == 0
    dedup.release_caches()
    order = F.struct(F.col("n_chars").alias("q"),
                     (-F.col("doc_id")).alias("nid"))
    assert sampling.salted_top_per_group(
        docs, "source", order, cap=3, id_col="doc_id").count() == 0
    assert sampling.domain_cap(docs, cap=3).count() == 0


# ---------------------------------------------------------------------------
# plan-shape pins

def test_phash_hash_table_cached_and_join_jvm_side(spark):
    """The banded self-join must consume the PERSISTED hash table on
    both sides (InMemoryTableScan) so the Python kernel never becomes
    a per-branch subplan again; past the kernel the plan is pure JVM."""
    docs = spark.createDataFrame([(1, "a" * 64), (2, "b" * 64)],
                                 ["doc_id", "text"])
    hashes = mm.ahash32(mm.attach_blob(docs), id_col="doc_id")
    pairs = dedup.blob_ahash_pairs(hashes)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 2
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python
    dedup.release_caches()


def test_salted_top_per_group_no_whole_group_window(spark):
    """The whole point of the fold: no PARTITION BY group-only
    window, so no single task ever sorts a whole group. Phase 1 IS
    a window — but partitioned by (group, __salt), a spill-safe
    external sort over 1/n_salts of the group (the earlier
    collect_list fold concentrated a hot sub-group in ONE agg
    buffer) — so the pin is: every Window node is salted."""
    df = spark.createDataFrame([(1, "g", 5)], ["id", "grp", "q"])
    order = F.struct(F.col("q").cast("long").alias("q"),
                     (-F.col("id")).alias("nid"))
    out = sampling.salted_top_per_group(df, "grp", order, cap=2,
                                        id_col="id")
    plan = out._jdf.queryExecution().executedPlan().toString()
    win_lines = [ln for ln in plan.splitlines() if "Window" in ln]
    assert win_lines, "phase-1 salted window missing from plan"
    assert all("__salt" in ln for ln in win_lines), win_lines


def test_banding_width_mismatch_rejected(spark):
    """Mis-banding must fail loudly: overcoverage (4x16 over a
    32-bit hash) makes the high bands uniformly zero — every pair a
    candidate — and undercoverage silently weakens recall."""
    docs = spark.createDataFrame([(1, "a" * 64)], ["doc_id", "text"])
    hashes = mm.ahash32(mm.attach_blob(docs), id_col="doc_id")
    with pytest.raises(ValueError, match="hash_bits"):
        dedup.blob_ahash_pairs(hashes, key_col="doc_id",
                               n_bands=4, band_bits=16)
    with pytest.raises(ValueError, match="hash_bits"):
        dedup.blob_ahash_pairs(hashes, key_col="doc_id",
                               n_bands=3, band_bits=8)
    h64 = mm.ahash64(mm.attach_blob(docs.select(
        F.col("doc_id").alias("id"), "text")))
    with pytest.raises(ValueError, match="divide"):
        dedup.phash_band_pairs(h64, band_bits=12)


def test_phash_band_pairs_matches_band_condition_semantics(spark):
    """The 64-bit operator's contract is exact blocking semantics:
    pairs sharing >= 1 of the 4 16-bit bands AND hamming <= T —
    verified against a pure-Python enumeration of that definition."""
    random.seed(23)
    base = bytes(random.randrange(256) for _ in range(300))
    texts = []
    for i in range(40):
        b = bytearray(base)
        for _ in range(i % 6):
            b[random.randrange(300)] = random.randrange(256)
        texts.append((i, bytes(b).hex()))
    df = mm.attach_blob(spark.createDataFrame(texts, ["id", "text"]))
    hashes = mm.ahash64(df)
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in dedup.phash_band_pairs(hashes).collect()}
    hs = {r["id"]: (r["ahash_lo"], r["ahash_hi"])
          for r in hashes.collect()}
    def bands(lo, hi):
        return [lo & 0xFFFF, lo >> 16, hi & 0xFFFF, hi >> 16]
    want = {}
    ids = sorted(hs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            (lx, hx), (ly, hy) = hs[x], hs[y]
            share = any(a == b for a, b in
                        zip(bands(lx, hx), bands(ly, hy)))
            d = bin(lx ^ ly).count("1") + bin(hx ^ hy).count("1")
            if share and d <= 16:
                want[(x, y)] = d
    assert got == want
    assert want, "perturbed copies should produce at least one pair"
    dedup.release_caches()


def test_ahash64_halves_are_sign_safe(spark):
    df = mm.attach_blob(spark.createDataFrame(
        [(1, "q" * 500), (2, "hello world " * 40)], ["id", "text"]))
    for r in mm.ahash64(df).collect():
        assert 0 <= r["ahash_lo"] < 1 << 32
        assert 0 <= r["ahash_hi"] < 1 << 32


def test_resize_blob_matches_reference_and_zero_fills(spark):
    texts = [(1, "hello world " * 20), (2, "tiny"), (3, "q" * 64)]
    df = mm.attach_blob(spark.createDataFrame(texts, ["id", "text"]))
    got = {r["id"]: r for r in mm.resize_blob(df, out_len=8).collect()}

    def ref(data: bytes, out_len: int = 8) -> list[int]:
        length = len(data)
        cells = [0] * out_len
        sums = [0] * out_len
        lens = [0] * out_len
        for p, v in enumerate(data):
            i = (p * out_len) // length
            sums[i] += v
            lens[i] += 1
        for i in range(out_len):
            if lens[i]:
                cells[i] = sums[i] // lens[i]
        return cells

    for i, t in texts:
        want = ref(t.encode())
        r = got[i]
        assert list(bytes(r["resized"])) == want, t[:12]
        assert r["out_sum"] == sum(want)
        assert [r[f"head{j}"] for j in range(4)] == want[:4]
    # "tiny" (4 bytes -> 8 cells): cells 1,3,5,7 have no source byte
    assert list(bytes(got[2]["resized"])).count(0) >= 4


# ---------------------------------------------------------------------------
# property tests: the two hand-rolled rank equivalences hold under
# arbitrary tie structure (hypothesis drives; small domains force ties)

from hypothesis import given, settings, strategies as st  # noqa: E402

from rag_vector_database_spark.operators import textstats  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 8), min_size=2, max_size=60))
def test_rank_normalize_matches_percent_rank(spark, vals):
    df = spark.createDataFrame(list(enumerate(vals)), "id long, s long")
    got = {r["id"]: r["pr_s"]
           for r in textstats.rank_normalize(df, ["s"]).collect()}
    w = Window.orderBy(F.col("s").asc())
    want = {r["id"]: r["pr"] for r in
            df.withColumn("pr", F.round(F.percent_rank().over(w), 6))
            .collect()}
    assert got == want


def test_thumb_vector_matches_resize_blob_cells(spark):
    """thumb_vector's array<long> cells are the SAME block-mean math
    as resize_blob's packed bytes (shared closure): sum and first
    four cells must agree with the THUMB invariants for every doc."""
    texts = ["hello world " * 9, "a", "z" * 200,
             "the quick brown fox " * 11]
    df = mm.attach_blob(spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], ["id", "text"]))
    vec = {r["id"]: r["cells"]
           for r in mm.thumb_vector(df, out_len=64).collect()}
    thumb = {r["id"]: r for r in mm.resize_blob(df, out_len=64).collect()}
    for i in vec:
        assert len(vec[i]) == 64
        assert sum(vec[i]) == thumb[i]["out_sum"]
        assert [vec[i][j] for j in range(4)] == \
            [thumb[i][f"head{j}"] for j in range(4)]
        assert list(bytes(thumb[i]["resized"])) == list(vec[i])


def test_unit_double_is_unit_norm_float64(spark):
    """unit_double keeps float64 components (no float32 round-trip —
    the scorer's oracle reproducibility depends on it) and yields an
    exactly-renormalizable unit vector; zero vectors go null."""
    from pyspark.sql.types import ArrayType, DoubleType
    from rag_vector_database_spark.functions import vectors as V
    df = spark.createDataFrame([(1, [3, 4, 0]), (2, [0, 0, 0])],
                               "id long, v array<long>")
    out = df.select("id", V.unit_double("v").alias("nv"))
    assert out.schema["nv"].dataType == ArrayType(DoubleType())
    rows = {r["id"]: r["nv"] for r in out.collect()}
    assert rows[1] == [0.6, 0.8, 0.0]
    assert rows[2] is None


def test_rank_normalize_keeps_null_signal_rows(spark):
    """NULL signals (divide-by-zero upstream) must not be silently
    dropped by the lookup join: the join is null-safe and the NULL
    group ranks lowest, matching Spark's own percent_rank() under
    ASC NULLS FIRST."""
    df = spark.createDataFrame([(0, None), (1, 4), (2, 9), (3, None)],
                               "id long, s long")
    out = textstats.rank_normalize(df, ["s"])
    got = {r["id"]: r["pr_s"] for r in out.collect()}
    w = Window.orderBy(F.col("s").asc())
    want = {r["id"]: r["pr"] for r in
            df.withColumn("pr", F.round(F.percent_rank().over(w), 6))
            .collect()}
    assert got == want
    assert len(got) == 4  # nothing dropped


@settings(max_examples=10, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 3), st.integers(0, 5)),
                min_size=1, max_size=50))
def test_salted_top_matches_window_under_ties(spark, rows):
    data = [(i, f"g{g}", q) for i, (g, q) in enumerate(rows)]
    df = spark.createDataFrame(data, "id long, grp string, q long")
    order = F.struct(F.col("q").alias("q"), (-F.col("id")).alias("nid"))
    got = sampling.salted_top_per_group(df, "grp", order, cap=3,
                                        id_col="id")
    w = Window.partitionBy("grp").orderBy(F.col("q").desc(),
                                          F.col("id").asc())
    want = (df.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= 3).drop("rn"))
    assert sorted(map(tuple, got.collect())) == \
        sorted(map(tuple, want.collect()))


def test_minhash_recall_eval_sampled_invariants(spark, sf_dir):
    """The sampled recall audit (round-11 verdict task 3): (a) the
    sampled exact ground truth equals the FULL exact pair set
    restricted to sampled endpoints (pair Jaccard depends only on the
    pair, so doc-sampling the prefix-filter join loses nothing inside
    the sample); (b) precision is 1.0 by construction (LSH candidates
    are exact-verified before thresholding); (c) the counters cohere
    (n_common <= min(n_exact, n_lsh), sample is ~25% of docs)."""
    from rag_vector_database_spark.functions import hashing
    from rag_vector_database_spark.plans import registry

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    keep = hashing.md5_long(F.col("doc_id").cast("string")) % 4 == 0
    mh = registry._MH
    full_ex = dedup.ngram_jaccard_pairs(
        d, shingle_n=mh["shingle_n"], threshold=mh["threshold"])
    restricted = {(r["id_a"], r["id_b"]) for r in full_ex
                  .where(hashing.md5_long(F.col("id_a").cast("string"))
                         % 4 == 0)
                  .where(hashing.md5_long(F.col("id_b").cast("string"))
                         % 4 == 0)
                  .select("id_a", "id_b").collect()}
    sampled_ex = {(r["id_a"], r["id_b"]) for r in dedup.ngram_jaccard_pairs(
        d.where(keep), shingle_n=mh["shingle_n"],
        threshold=mh["threshold"]).select("id_a", "id_b").collect()}
    assert sampled_ex == restricted

    row = registry.q_minhash_recall_eval_sampled(spark, sf_dir).first()
    assert row["n_exact"] == len(sampled_ex)
    assert row["n_common"] <= min(row["n_exact"], row["n_lsh"])
    if row["n_lsh"] > 0:
        assert row["precision"] == 1.0
    n_docs = d.count()
    assert 0.1 * n_docs <= row["n_sample_docs"] <= 0.45 * n_docs

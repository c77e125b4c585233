"""Invariant tests for the cross-doc substring dedup, weighted mixture
sampling, unigram-LM quality, and embedding-profile operators (their
value-level parity vs DuckDB is covered by the registry oracles)."""
from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from rag_vector_database_spark.operators import dedup, textstats


def test_dup_ngram_spans_detects_shared_substring(spark):
    shared = " ".join(f"w{i}" for i in range(10))
    docs = spark.createDataFrame([
        Row(doc_id=1, text=shared + " aaa bbb"),
        Row(doc_id=2, text="xxx yyy " + shared),
        Row(doc_id=3, text=" ".join(f"u{i}" for i in range(20))),
    ])
    out = dedup.duplicated_ngram_spans(docs, n=8, min_docs=2)
    rows = {r.doc_id: r for r in out.collect()}
    # only the two docs sharing the 10-token run appear
    assert set(rows) == {1, 2}
    # a 10-token shared run yields 3 overlapping 8-grams covering 10 toks
    for d in (1, 2):
        assert rows[d].n_dup_grams == 3
        assert rows[d].dup_covered_tokens == 10
    assert abs(rows[1].dup_frac - 10 / 12) < 1e-6


def test_dup_ngram_coverage_bounded_by_doc_length(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = dedup.duplicated_ngram_spans(docs, n=8, min_docs=2)
    bad = out.where((F.col("dup_covered_tokens") > F.col("n_tokens"))
                    | (F.col("dup_frac") > 1.0)
                    | (F.col("dup_covered_tokens") < 8)).count()
    assert bad == 0


def test_unigram_quality_orders_junk_below_text(spark):
    common = "the cat sat on the mat and the dog ran to the cat"
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=common) for i in range(1, 9)]
        + [Row(doc_id=9, text="zq9 xv7 qqj kkz wop")])
    out = {r.doc_id: r for r in
           textstats.unigram_logprob_quality(docs, vocab_size=10).collect()}
    # the all-rare doc scores strictly worse and is mostly OOV
    assert out[9].avg_logp < out[1].avg_logp
    assert out[9].oov_rate > out[1].oov_rate
    assert out[1].n_tok == 13


def test_unigram_quality_oov_rate_in_unit_interval(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textstats.unigram_logprob_quality(docs, vocab_size=50)
    bad = out.where((F.col("oov_rate") < 0) | (F.col("oov_rate") > 1)
                    | (F.col("avg_logp") >= 0)).count()
    assert bad == 0
    assert out.count() == docs.where(F.trim("text") != "").count()


def test_weighted_sample_favors_rare_language(spark, sf_dir):
    from rag_vector_database_spark.plans.registry import queries
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = {r["lang"]: r["cnt"] for r in
              docs.groupBy("lang").agg(F.count("*").alias("cnt")).collect()}
    sample = queries()["weighted_domain_sample"](spark, sf_dir).collect()
    picked = {}
    for r in sample:
        picked[r.lang] = picked.get(r.lang, 0) + 1
    # upweighted (rare) langs must be over-represented vs their corpus share
    n = sum(picked.values())
    tot = sum(corpus.values())
    rare = min(corpus, key=corpus.get)
    assert picked.get(rare, 0) / n >= corpus[rare] / tot


def test_embedding_dim_stats_shape(spark, sf_dir):
    from rag_vector_database_spark.plans.registry import queries
    out = queries()["embedding_dim_stats"](spark, sf_dir).collect()
    n_vec = spark.read.parquet(f"{sf_dir}/embeddings.parquet").count()
    assert len(out) == 64
    assert all(r.n == n_vec for r in out)
    assert all(r.lo <= r.mean <= r.hi and r.sd >= 0 for r in out)


def test_bpe_merges_greedy_and_weighted(spark):
    # corpus: "aaab" x3, "ab" x2 -> char pairs weighted by word freq
    docs = spark.createDataFrame(
        [Row(doc_id=1, text="aaab aaab ab"),
         Row(doc_id=2, text="aaab ab")])
    out = textstats.bpe_merge_ranks(docs, iters=2, top_n=3).collect()
    it1 = {r.pair: r.freq for r in out if r.iteration == 1}
    # "aaab"(x3): pairs (a,a)x2,(a,b),(b,</w>); "ab"(x2): (a,b),(b,</w>)
    assert it1["a a"] == 6 and it1["a b"] == 5
    best1 = min(it1, key=lambda p: (-it1[p], p))
    assert best1 == "a a"
    # after merging (a,a): "aaab" -> [aa, a, b, </w>] (greedy leftmost),
    # so (aa,a) appears 3x and (a,b) keeps the 5 from both words
    it2 = {r.pair: r.freq for r in out if r.iteration == 2}
    assert it2["aa a"] == 3
    assert it2["a b"] == 5
    assert "a a" not in it2


def test_sign_bit_word_matches_driver_pack(spark, sf_dir):
    """The executor-side sign_bit_word fold and the driver-side
    pack_sign_bits twin must agree bit for bit on real vectors."""
    from pyspark.sql import functions as F

    from rag_vector_database_spark.functions import vectors as V

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(20)
    rows = emb.select(
        "vec_id", "embedding",
        V.sign_bit_word("embedding", 0).alias("w0"),
        V.sign_bit_word("embedding", 1).alias("w1")).collect()
    for r in rows:
        q0, q1 = V.pack_sign_bits(list(r["embedding"]))
        assert (r["w0"], r["w1"]) == (q0, q1), r["vec_id"]
        assert 0 <= r["w0"] < (1 << 32) and 0 <= r["w1"] < (1 << 32)


def test_binary_quant_recall_vs_exact(spark, sf_dir):
    """The Hamming pre-rank must surface most of the true cosine
    top-10 within its top-50 candidate set (sign bits preserve
    direction: recall well above chance, which is 50/N)."""
    from rag_vector_database_spark.plans import registry
    from rag_vector_database_spark.operators import retrieval

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = registry.query_vector(spark, sf_dir)
    exact = {r["vec_id"] for r in
             retrieval.knn(emb, qv, k=10).collect()}
    quant = {r["vec_id"] for r in
             registry.q_binary_quant_knn(spark, sf_dir).collect()}
    assert len(exact & quant) >= 5


def test_boilerplate_tile_matches_python_reference(spark, sf_dir):
    """Exact-equality check against an independent Python replay of the
    operator: tile the corpus, count document frequency per tile, drop
    tiles seen in >= 2 docs, rejoin in order — n_tiles, n_dropped and
    clean_text must all match row for row."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from rag_vector_database_spark.operators.dedup import (
        boilerplate_tiles_removed)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    tiles = {}
    df = defaultdict(set)
    for did, text in raw.items():
        toks = text.split()
        if not toks:
            continue
        tl = [" ".join(toks[i:i + 3]) for i in range(0, len(toks), 3)]
        tiles[did] = tl
        for t in tl:
            df[t].add(did)
    want = {}
    for did, tl in tiles.items():
        kept = [t for t in tl if len(df[t]) < 2]
        want[did] = (len(tl), len(tl) - len(kept), " ".join(kept))

    out = boilerplate_tiles_removed(docs).collect()
    assert len(out) == len(want)
    for r in out:
        assert (r["n_tiles"], r["n_dropped"], r["clean_text"]) == \
            want[r["doc_id"]], r["doc_id"]


def test_mmr_first_pick_is_argmax_and_picks_distinct(spark, sf_dir):
    """MMR contract: pick 1 is the plain argmax; all picks distinct;
    and when the candidate set contains an exact duplicate of the top
    hit, MMR never selects it adjacent to its twin (a plain top-k
    would)."""
    from pyspark.sql import functions as F

    from rag_vector_database_spark.operators import retrieval
    from rag_vector_database_spark.plans import registry

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    qv = registry.query_vector(spark, sf_dir)
    cand = (retrieval.score_against(emb, qv)
            .select("vec_id", "embedding", "score")
            .orderBy(F.desc("score"), "vec_id").limit(20))
    # inject an exact duplicate of the top candidate under a new id
    top = cand.limit(1).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        "embedding", "score")
    out = retrieval.mmr_rerank(cand.unionByName(top)).collect()
    picks = [r["vec_id"] for r in sorted(out, key=lambda r: r["pick_order"])]
    assert len(set(picks)) == 5
    best = cand.first()
    assert picks[0] in (best["vec_id"], best["vec_id"] + 1_000_000)
    # at diversity-heavy lambda the exact duplicate (sim = 1.0) must be
    # excluded outright: its MMR score lam*s - (1-lam) goes negative
    # while any non-duplicate keeps a positive margin
    div = retrieval.mmr_rerank(cand.unionByName(top), lam=0.3).collect()
    div_picks = {r["vec_id"] for r in div}
    assert not {best["vec_id"], best["vec_id"] + 1_000_000} <= div_picks


def test_quality_checks_count_seeded_violations(spark):
    """The nonzero arms of the expectation suite: deliberately broken
    inputs must COUNT their violations exactly (healthy data pins the
    checks only at zero)."""
    from pyspark.sql import Row

    from rag_vector_database_spark.operators import quality as Q

    parent = spark.createDataFrame(
        [Row(pid=1), Row(pid=2)])
    child = spark.createDataFrame(
        [Row(cid=1), Row(cid=2), Row(cid=99), Row(cid=98), Row(cid=1)])
    dup = spark.createDataFrame(
        [Row(k=1), Row(k=1), Row(k=1), Row(k=2)])
    vals = spark.createDataFrame(
        [Row(v=5.0), Row(v=-1.0), Row(v=0.0), Row(v=None)])
    empty = spark.createDataFrame([], "v double")

    out = {r["check_name"]: r["n_violations"] for r in Q.run_checks(
        Q.referential_check("fk", child, "cid", parent, "pid"),
        Q.unique_check("uniq", dup, "k"),
        Q.predicate_check("nonpos", vals,
                          F.col("v").isNull() | (F.col("v") <= 0)),
        Q.predicate_check("empty-input", empty, F.col("v").isNull()),
    ).collect()}
    assert out == {"fk": 2,       # cid 98 and 99 orphaned
                   "uniq": 2,     # three k=1 rows -> two surplus
                   "nonpos": 3,   # -1, 0, NULL
                   "empty-input": 0}  # empty table -> 0, never NULL


def test_ivf_multiprobe_rejects_short_query_vector(spark, sf_dir):
    import pytest

    from rag_vector_database_spark.operators import retrieval

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    with pytest.raises(ValueError):
        retrieval.ivf_knn_multiprobe(emb, [0.0, 1.0], 5, sign_bits=3)


def test_minhash_delta_equals_filtered_full(spark, sf_dir):
    """The incremental pass must find exactly the full pass's pairs
    that touch a new document — no extras, none missed (candidate
    pruning only removes existing-existing work)."""
    from rag_vector_database_spark.operators import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    full = {(r["id_a"], r["id_b"]): r["jaccard"]
            for r in dd.minhash_lsh_pairs(docs).collect()}
    dd.release_caches()
    delta = {(r["id_a"], r["id_b"]): r["jaccard"]
             for r in dd.minhash_delta_pairs(
                 docs, new_pred=F.col("k") % 3 == 0).collect()}
    dd.release_caches()
    want = {p: j for p, j in full.items()
            if p[0] % 3 == 0 or p[1] % 3 == 0}
    assert delta == want
    assert len(delta) < len(full) or not full  # old-old pairs pruned


def test_dedup_tokens_keep_first_invariants(spark):
    """Cleaned output: no duplicate tokens, first-occurrence order
    preserved, removal count consistent — on crafted edge inputs
    (empty text, all-same tokens, already-unique)."""
    from rag_vector_database_spark.plans.registry import (
        q_dedup_tokens_keep_first)

    import tempfile

    rows = [(0, ""), (1, "a a a a"), (2, "x y z"), (3, "b a b c a d")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, "doc_id long, text string") \
            .withColumn("lang", F.lit("en")) \
            .withColumn("source", F.lit("t")) \
            .withColumn("n_chars", F.length("text")) \
            .write.parquet(f"{d}/documents.parquet")
        got = {r["doc_id"]: r for r in
               q_dedup_tokens_keep_first(spark, d).collect()}
    assert got[0]["n_tokens"] == 0 and got[0]["cleaned_head"] == ""
    assert got[1]["n_removed"] == 3 and got[1]["cleaned_head"] == "a"
    assert got[2]["n_removed"] == 0 and got[2]["cleaned_head"] == "x y z"
    assert got[3]["cleaned_head"] == "b a c d"  # first-occurrence order
    for r in got.values():
        toks = r["cleaned_head"].split()
        assert len(toks) == len(set(toks))  # no dup survives


def test_largest_remainder_allocation_sums_exactly(spark, sf_dir):
    """Hamilton-method invariants: final allocations sum EXACTLY to
    the budget, every stratum gets base or base+1, and allocation is
    monotone in stratum size."""
    from rag_vector_database_spark.plans.registry import (
        q_largest_remainder_alloc)

    rows = q_largest_remainder_alloc(spark, sf_dir).collect()
    assert sum(r["final_alloc"] for r in rows) == 100
    for r in rows:
        assert r["final_alloc"] in (r["base_alloc"], r["base_alloc"] + 1)
    by_size = sorted(rows, key=lambda r: (-r["n_docs"], r["lang"]))
    allocs = [r["final_alloc"] for r in by_size]
    assert allocs == sorted(allocs, reverse=True)


def test_hash_reservoir_sample_stability(spark, sf_dir):
    """The sample is a fixed set: independent of partitioning, stable
    across runs, always exactly n."""
    from rag_vector_database_spark.plans.registry import (
        q_hash_reservoir_sample)

    a = sorted(r["doc_id"] for r in
               q_hash_reservoir_sample(spark, sf_dir).collect())
    b = sorted(r["doc_id"] for r in
               q_hash_reservoir_sample(spark, sf_dir).collect())
    assert a == b and len(a) == 100


def test_cdc_apply_changelog_tombstones(spark, tmp_path):
    """A key whose LATEST entry is a tombstone is absent; a tombstone
    overwritten by a later upsert resurrects the key."""
    import datetime

    from rag_vector_database_spark.plans.registry import (
        q_cdc_apply_changelog)

    t0 = datetime.datetime(2024, 1, 1)

    def ts(m):
        return t0 + datetime.timedelta(minutes=m)

    rows = [
        (1, ts(1), 10, "view", 1.0, "{}"),
        (2, ts(2), 10, "error", 0.0, "{}"),   # dead: tombstone is last
        (3, ts(1), 20, "error", 0.0, "{}"),
        (4, ts(2), 20, "purchase", 5.0, "{}"),  # resurrected
        (5, ts(3), 30, "signup", 2.0, "{}"),
    ]
    d = str(tmp_path / "ev")
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string") \
        .write.parquet(f"{d}/events.parquet")
    got = {r["user_id"]: r for r in q_cdc_apply_changelog(spark, d).collect()}
    assert 10 not in got
    assert got[20]["last_op"] == "purchase" and got[20]["value"] == 5.0
    assert got[30]["last_op"] == "signup"


def test_daily_drop_retraction_bridge(spark, tmp_path):
    """The retraction leg of daily_drop_pipeline: a drop doc BRIDGES
    two base clusters, so the higher-id base canonical (3) is demoted
    and its stored vector must be removed by the partition-targeted
    delete — while the untouched partition's files are never touched.
    Exercised at the operator level with explicit pairs (the registry
    query runs the same composition behind LSH pair generation, whose
    end-to-end value parity the oracle checks)."""
    import os

    from rag_vector_database_spark.operators import clustering as CL
    from rag_vector_database_spark.operators import storage

    # yesterday: clusters {1,2} and {3,4}; singletons 0, 5; drop doc 7
    old_pairs = spark.createDataFrame(
        [(1, 2), (3, 4)], "id_a long, id_b long")
    delta = spark.createDataFrame(
        [(1, 7), (3, 7)], "id_a long, id_b long")
    assignments = dedup.connected_components(old_pairs)
    updated = dedup.incremental_components(assignments, delta)
    got = {r["id"]: r["cluster_id"] for r in updated.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 7: 1}

    loser = lambda a: (a.where(F.col("id") != F.col("cluster_id"))  # noqa: E731
                       .select("id"))
    base_losers = {r["id"] for r in loser(assignments).collect()}
    final_losers = {r["id"] for r in loser(updated).collect()}
    assert base_losers == {2, 4}
    assert final_losers == {2, 3, 4, 7}
    dead_ids = sorted((final_losers - base_losers) - {7})
    assert dead_ids == [3]  # the demoted base canonical

    # frozen-quantizer store over base survivors {0, 1, 3, 5}
    emb = spark.createDataFrame(
        [(i, [float(i % 2), float(i >= 3)]) for i in (0, 1, 3, 5)],
        "vec_id long, embedding array<float>")
    cents = CL.kmeans_centroids(emb, k=2, iters=1)
    best = CL._argmin_centroid(cents, "embedding", 6)
    store = str(tmp_path / "ivf")
    emb.select("vec_id", best.getField("cl").alias("cluster")) \
        .write.mode("overwrite").partitionBy("cluster").parquet(store)
    clusters = {r["vec_id"]: r["cluster"] for r in
                spark.read.parquet(store).collect()}
    untouched = [c for c in set(clusters.values()) if c != clusters[3]]
    mtimes_before = {
        c: os.path.getmtime(os.path.join(store, f"cluster={c}"))
        for c in untouched}

    dead = spark.createDataFrame([(3,)], "vec_id long")
    res = storage.delete_keys_partitioned(
        spark, store, dead, key="vec_id", partition_col="cluster")
    assert res == {"partitions_rewritten": 1, "rows_deleted": 1}
    left = sorted(r["vec_id"] for r in spark.read.parquet(store).collect())
    assert left == [0, 1, 5]
    for c, t in mtimes_before.items():
        assert os.path.getmtime(os.path.join(store, f"cluster={c}")) == t


def test_kmv_sketch_merge_and_small_group(spark):
    """KMV contracts: (a) a group with < k distinct values reports
    exactly; (b) the __ALL__ row — computed ONLY from merged
    per-group sketches — equals the naive global sketch (the merge
    property); (c) __ALL__ survives even when the GLOBAL domain is
    smaller than k (the left-join-on-true regression: a cross join
    dropped the row)."""
    from pyspark.sql import Window, functions as F

    from rag_vector_database_spark.functions.hashing import md5_long
    from rag_vector_database_spark.operators.textstats import (
        kmv_distinct_by_group)

    k = 8
    rows = ([("a", f"v{i}") for i in range(200)]          # estimates
            + [("b", f"v{i}") for i in range(3)])         # exact path
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {r.grp: r for r in
           kmv_distinct_by_group(df, "v", "grp", k=k).collect()}
    assert set(out) == {"a", "b", "__ALL__"}
    assert out["b"].n_exact == 3 and out["b"].n_est == 3.0
    assert out["b"].rel_err == 0.0
    assert out["a"].n_exact == 200 and out["a"].n_est != 200.0

    # merge property: __ALL__'s estimate == naive global KMV over all
    # distinct values (here group b's values are a subset of a's
    # domain? no — distinct strings; compute directly)
    hv = (df.select(md5_long(F.col("v")).alias("h")).distinct()
          .withColumn("rn", F.row_number().over(Window.orderBy("h"))))
    hk = hv.where(F.col("rn") == k).collect()[0].h
    naive = round(float(k - 1) * 4294967296.0 / hk, 6)
    assert out["__ALL__"].n_est == naive

    # tiny global domain: __ALL__ must still appear, on the exact path
    tiny = spark.createDataFrame([("a", "x"), ("b", "y")],
                                 "grp string, v string")
    tout = {r.grp: r for r in
            kmv_distinct_by_group(tiny, "v", "grp", k=8).collect()}
    assert tout["__ALL__"].n_exact == 2 and tout["__ALL__"].n_est == 2.0


def test_pair_transitivity_and_source_overlap(spark):
    """Hand-built pair graph: wedges enumerate correctly and the
    closure check runs against real shingle sets; the source overlap
    matrix counts only cross-source pairs, per unordered pair."""
    from pyspark.sql import functions as F

    from rag_vector_database_spark.operators.dedup import (
        pair_transitivity_audit, source_overlap_matrix)

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta", "s1"),
         (2, "alpha beta gamma delta epsilon", "s2"),
         (3, "alpha beta gamma zeta", "s1"),
         (4, "totally different words here", "s2")],
        "doc_id long, text string, source string")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 4)], "id_a long, id_b long")

    # wedges (u < w, shared middle): (1,3) via 2, (2,4) via 1 -> 2
    out = pair_transitivity_audit(docs, pairs, shingle_n=2,
                                  jaccard_threshold=0.4).collect()[0]
    assert out.n_wedges == 2
    # jaccard(1,3): shingles of 1 = {ab, bg, gd}, of 3 = {ab, bg, gz}
    # -> 2/4 = 0.5 >= 0.4 closed; jaccard(2,4) = 0 -> open
    assert out.n_closed == 1
    assert out.closure_rate == 0.5

    ov = {(r.src_a, r.src_b): r.n_pairs
          for r in source_overlap_matrix(docs, pairs).collect()}
    # (1,2): s1-s2 cross; (2,3): s2-s1 cross; (1,4): s1-s2 cross
    assert ov == {("s1", "s2"): 3}


def test_containment_matrix_flags_subset_duplication(spark):
    # A = w0..w10 (10 2-shingles); B = w0..w7 (7 shingles, subset of A:
    # jaccard 7/10 >= 0.5, containment 1.0); C = unrelated
    a = " ".join(f"w{i}" for i in range(11))
    b = " ".join(f"w{i}" for i in range(8))
    docs = spark.createDataFrame([
        Row(doc_id=1, text=a), Row(doc_id=2, text=b),
        Row(doc_id=3, text=" ".join(f"u{i}" for i in range(20)))])
    out = dedup.containment_vs_jaccard_matrix(
        docs, shingle_n=2, n_hashes=12, n_bands=12, max_bucket=64,
        jaccard_threshold=0.5, containment_threshold=0.8).collect()
    cells = {(r.jaccard_dup, r.containment_dup): r for r in out}
    assert set(cells) == {(1, 1)}
    r = cells[(1, 1)]
    assert r.n_pairs == 1
    assert abs(r.mean_containment - 1.0) < 1e-6
    assert abs(r.mean_size_ratio - round(10 / 7, 6)) < 1e-6


def test_containment_matrix_off_diagonal_cell(spark):
    # C = w0..w5 (5 shingles, subset of A's 10): jaccard 0.5 < 0.6,
    # containment 1.0 — the subset-dup cell. One row per band makes
    # the LSH recall of this fixed pair deterministic.
    a = " ".join(f"w{i}" for i in range(11))
    c = " ".join(f"w{i}" for i in range(6))
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=a), Row(doc_id=2, text=c)])
    out = dedup.containment_vs_jaccard_matrix(
        docs, shingle_n=2, n_hashes=12, n_bands=12, max_bucket=64,
        jaccard_threshold=0.6, containment_threshold=0.8).collect()
    cells = {(r.jaccard_dup, r.containment_dup): r for r in out}
    assert set(cells) == {(0, 1)}
    assert cells[(0, 1)].n_pairs == 1


def test_tokenizer_fertility_exact_counts(spark):
    docs = spark.createDataFrame([
        # en: 6 words, 6 bpe segments, 16 non-ws chars
        Row(doc_id=1, text="the cat is on the mat"),
        # whitespace tokens "the," / "cat!" hit no stopword -> und,
        # but punctuation splits into extra BPE segments: 2 words,
        # 4 segments
        Row(doc_id=2, text="the, cat!"),
        # no stopword hits in any language -> und
        Row(doc_id=3, text="zz qq"),
    ])
    out = {r.lang: r for r in
           textstats.tokenizer_fertility_by_lang(docs).collect()}
    assert set(out) == {"en", "und"}
    en = out["en"]
    assert en.n_docs == 1 and en.n_words == 6 and en.n_bpe == 6
    assert abs(en.fertility - 1.0) < 1e-6
    assert abs(en.chars_per_token - round(16 / 6, 6)) < 1e-6
    und = out["und"]
    assert und.n_docs == 2 and und.n_words == 4 and und.n_bpe == 6
    assert abs(und.fertility - 1.5) < 1e-6


def test_hashed_sample_quantiles_exact_when_k_covers(spark):
    # k >= every group size -> the sample IS the group and the merged
    # sample IS the corpus: q_est == q_exact on every row, rel_err 0
    rows = [Row(g="a", k=i, v=i * 10) for i in range(1, 11)] \
         + [Row(g="b", k=100 + i, v=i) for i in range(1, 6)]
    df = spark.createDataFrame(rows)
    out = {r.grp: r for r in textstats.hashed_sample_quantile_by_group(
        df, "v", "g", "k", k=1000, q=0.5).collect()}
    assert set(out) == {"a", "b", "__ALL__"}
    for r in out.values():
        assert r.q_est == r.q_exact and r.rel_err == 0.0
    # type-1 median of 10 values 10..100 = 5th = 50; of 5 values = 3rd
    assert out["a"].q_exact == 50 and out["a"].n_rows == 10
    assert out["b"].q_exact == 3 and out["b"].n_rows == 5
    assert out["__ALL__"].n_rows == 15


def test_hashed_sample_quantiles_merge_matches_naive(spark):
    # small k: the __ALL__ estimate computed from MERGED per-group
    # sketches must equal the naive global bottom-k-by-hash sample's
    # quantile, replayed here in plain Python
    import hashlib

    rows = [Row(g=f"g{i % 4}", k=i, v=(i * 37) % 101)
            for i in range(200)]
    df = spark.createDataFrame(rows)
    k = 16
    out = {r.grp: r for r in textstats.hashed_sample_quantile_by_group(
        df, "v", "g", "k", k=k, q=0.5).collect()}

    def h(key):
        return int(hashlib.md5(str(key).encode()).hexdigest()[:8], 16)

    import math

    global_sample = sorted(rows, key=lambda r: (h(r.k), r.k))[:k]
    vals = sorted((r.v, r.k) for r in global_sample)
    expect = vals[math.ceil(0.5 * len(vals)) - 1][0]  # type-1, 1-based
    assert out["__ALL__"].q_est == expect
    # exact global median of (i*37)%101 over i=0..199
    allv = sorted(((i * 37) % 101) for i in range(200))
    assert out["__ALL__"].q_exact == allv[math.ceil(0.5 * 200) - 1]


def test_pq_code_utilization_invariants(spark, sf_dir):
    from rag_vector_database_spark.operators import clustering as CL

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    n = emb.count()
    rows = CL.pq_code_utilization(emb, m=4, ksub=4, iters=1,
                                  dim=64).collect()
    assert len(rows) == 4 and {r.s for r in rows} == {0, 1, 2, 3}
    for r in rows:
        # every vector is encoded in every subspace
        assert r.n_vecs == n
        assert 1 <= r.n_codes_used <= 4
        assert abs(r.utilization - r.n_codes_used / 4) < 1e-6
        # the heaviest code holds at least the uniform share
        assert r.max_share >= 1 / 4 - 1e-6
        # chi-square is non-negative and zero only at perfect balance
        assert r.chi2_imbalance >= -1e-6


def test_pq_code_utilization_perfect_balance_is_zero(spark):
    from rag_vector_database_spark.operators import clustering as CL

    # 4 distinct points, each exactly one codebook seed in every
    # subspace -> 4 codes used, perfectly uniform, chi2 == 0
    rows = [Row(vec_id=i, embedding=[float(i * 10)] * 64)
            for i in range(4)]
    out = CL.pq_code_utilization(spark.createDataFrame(rows), m=4,
                                 ksub=4, iters=1, dim=64).collect()
    for r in out:
        assert r.n_codes_used == 4
        assert abs(r.max_share - 0.25) < 1e-6
        assert abs(r.chi2_imbalance) < 1e-6


def test_simhash_grid_counts_are_cumulative(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .where(F.col("doc_id") % 7 == 0)
    pairs = dedup.simhash_pairs(docs, max_hamming=3, prefix_bits=4)
    by_h = dict(pairs.groupBy("hamming").count()
                .select("hamming", "count").collect())
    grid = spark.createDataFrame([(h,) for h in range(4)],
                                 "max_hamming int")
    sens = {r.max_hamming: r for r in
            (grid.join(pairs, pairs.hamming <= grid.max_hamming, "left")
             .groupBy("max_hamming")
             .agg(F.count("id_a").alias("n_pairs")).collect())}
    # n_pairs at threshold h == sum of the per-distance histogram <= h
    for h in range(4):
        assert sens[h].n_pairs == sum(
            c for d, c in by_h.items() if d <= h)


def test_kmv_group_sketch_merge_is_idempotent(spark):
    # re-merging the same batch into a sketch changes nothing — the
    # property that makes the stream-maintained sketch exactly-once
    # under crash-replay without any dedup bookkeeping
    from pyspark.sql import Window

    rows = [Row(g="a", v=f"tok{i}") for i in range(300)] \
         + [Row(g="b", v=f"tok{i}") for i in range(10)]
    df = spark.createDataFrame(rows)
    k = 16
    s1 = textstats.kmv_group_sketch(df, "v", "g", k=k)
    w = Window.partitionBy("grp").orderBy("h")
    remerged = (s1.unionByName(s1).distinct()
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= k).select("grp", "h"))
    a = sorted(map(tuple, s1.collect()))
    b = sorted(map(tuple, remerged.collect()))
    assert a == b
    # group with < k distinct values keeps them ALL (exact path)
    assert sum(1 for g, _ in a if g == "b") == 10
    assert sum(1 for g, _ in a if g == "a") == k


def test_kmv_sketch_split_merge_equals_one_shot(spark):
    # sketch(A) merged with sketch(B) == sketch(A union B) — the
    # mergeability contract the streaming query rests on
    from pyspark.sql import Window

    rows = [Row(g="x", v=f"w{i}") for i in range(500)]
    df = spark.createDataFrame(rows)
    k = 32
    whole = sorted(map(tuple,
                       textstats.kmv_group_sketch(df, "v", "g", k=k)
                       .collect()))
    h1 = textstats.kmv_group_sketch(
        df.where(F.col("v").substr(2, 10).cast("int") % 2 == 0),
        "v", "g", k=k)
    h2 = textstats.kmv_group_sketch(
        df.where(F.col("v").substr(2, 10).cast("int") % 2 == 1),
        "v", "g", k=k)
    w = Window.partitionBy("grp").orderBy("h")
    merged = sorted(map(tuple,
                        (h1.unionByName(h2).distinct()
                         .withColumn("rn", F.row_number().over(w))
                         .where(F.col("rn") <= k).select("grp", "h")
                         .collect())))
    assert merged == whole


def test_pair_degree_histogram_hand_graph(spark):
    # graph: 1-2, 1-3, 1-4 (hub deg 3), 2-3 (deg 2 each), 4 deg 1
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=1, id_b=3),
         Row(id_a=1, id_b=4), Row(id_a=2, id_b=3)])
    out = {r.degree: r for r in
           dedup.pair_degree_histogram(pairs).collect()}
    assert out[1].n_docs == 1          # doc 4
    assert out[2].n_docs == 2          # docs 2, 3
    assert out[3].n_docs == 1          # the hub
    assert out[3].cum_docs == 4        # running total reaches all docs


def test_rank_fidelity_perfect_agreement_is_one(spark, sf_dir):
    # identical orderings -> zero inversions, tau == rho == 1.0; and
    # the registry query's coefficients stay in [-1, 1] on real data
    from rag_vector_database_spark.plans.registry import queries

    r = queries()["pq_rank_fidelity"](spark, sf_dir).collect()[0]
    assert r.n_items > 1
    assert -1.0 <= r.kendall_tau <= 1.0
    assert -1.0 <= r.spearman_rho <= 1.0
    # 0 discordant pairs forces both coefficients to exactly 1
    if r.n_discordant == 0:
        assert r.kendall_tau == 1.0


def test_quality_gate_matrix_counts_bounded(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    per_source = dict(docs.groupBy("source").count().collect())
    out = textstats.quality_gate_source_matrix(docs).collect()
    assert {r.source for r in out} == set(per_source)
    for r in out:
        assert r.n_docs == per_source[r.source]
        assert 0 <= r.n_pass_gopher <= r.n_docs
        assert 0 <= r.n_pass_c4 <= r.n_docs
        assert abs(r.gopher_rate - round(r.n_pass_gopher / r.n_docs, 6)) \
            < 1e-9


def test_drop_provenance_exact_wins_and_keeper_is_lower(spark):
    # docs 1 and 2 are byte-identical (exact group, canonical 1) AND
    # near-dups of 3; exact must claim doc 2, neardup may only claim
    # docs not already dropped by the exact rule
    t = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [Row(doc_id=1, text=t), Row(doc_id=2, text=t),
         Row(doc_id=3, text=t + " extra"),
         Row(doc_id=4, text=" ".join(f"u{i}" for i in range(12)))])
    import shutil
    import tempfile

    from rag_vector_database_spark.plans import registry as R

    d = tempfile.mkdtemp()
    try:
        docs.write.parquet(f"{d}/documents.parquet")
        out = R.q_dedup_drop_provenance(spark, d).collect()
    finally:
        shutil.rmtree(d, ignore_errors=True)
    by_id = {r.dropped_id: r for r in out}
    assert by_id[2].reason == "exact" and by_id[2].kept_id == 1
    assert by_id[3].reason == "neardup" and by_id[3].kept_id == 1
    assert 4 not in by_id
    # every keeper has a lower id than the doc it displaced
    assert all(r.kept_id < r.dropped_id for r in out)


def test_chunk_store_dedup_flags_cross_doc_chunks(spark):
    import shutil
    import tempfile

    from rag_vector_database_spark.plans import registry as R

    # two docs sharing one exact 120-char-aligned prefix chunk, one
    # unique doc; chunk params are the registry's scaled 120/20
    shared = ("alpha " * 40)[:240]
    docs = spark.createDataFrame(
        [Row(doc_id=1, source="a", text=shared + "tail one"),
         Row(doc_id=2, source="b", text=shared + "different end"),
         Row(doc_id=3, source="b", text="unique " * 30)])
    d = tempfile.mkdtemp()
    try:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r.source: r for r in
               R.q_chunk_store_dedup_stats(spark, d).collect()}
    finally:
        shutil.rmtree(d, ignore_errors=True)
    # both sources carry at least one cross-doc duplicate chunk (the
    # shared prefix), and rates stay within [0, 1]
    assert out["a"].n_crossdoc_dup >= 1
    assert out["b"].n_crossdoc_dup >= 1
    for r in out.values():
        assert 0 <= r.crossdoc_rate <= 1 and 0 <= r.dup_waste <= 1
        assert r.n_distinct_fp <= r.n_chunks


def test_lsh_banding_planner_monotonicity(spark, sf_dir):
    """More bands at fewer rows must never LOWER expected recall
    (1-(1-j^r)^b is decreasing in r at fixed r*b for j in (0,1)),
    and every probability-derived column stays in range."""
    from rag_vector_database_spark.plans import registry as R

    out = {(r.rows_per_band, r.n_bands): r
           for r in R.q_lsh_banding_planner(spark, sf_dir).collect()}
    assert set(out) == {(2, 6), (3, 4), (4, 3), (6, 2)}
    # true/false pair counts are the same detection pass in all rows
    counts = {(r.n_true_pairs, r.n_false_pairs) for r in out.values()}
    assert len(counts) == 1
    recalls = [out[(2, 6)].exp_recall, out[(3, 4)].exp_recall,
               out[(4, 3)].exp_recall, out[(6, 2)].exp_recall]
    assert all(0.0 <= x <= 1.0 for x in recalls)
    assert recalls == sorted(recalls, reverse=True)
    # junk volume also shrinks as bands sharpen
    fps = [out[k].exp_false_candidates
           for k in [(2, 6), (3, 4), (4, 3), (6, 2)]]
    assert fps == sorted(fps, reverse=True)


def test_quantizer_staleness_identical_when_not_stale(spark, sf_dir):
    """Training the 'frozen' quantizer on the full corpus must make
    both partitions identical: rand_index == 1 and error_inflation
    == 1 — the audit's zero point. On the real 80/20 split the audit
    stays within bounds (rand in [0,1]-ish, inflation >= ~1)."""
    from rag_vector_database_spark.operators import clustering as CL
    from rag_vector_database_spark.plans import registry as R

    out = R.q_quantizer_staleness_audit(spark, sf_dir).collect()[0]
    assert out.n_vecs > 0
    assert 0.0 <= out.rand_index <= 1.0
    # the frozen quantizer can't beat the fresh one ON AVERAGE by
    # much — allow float slack but catch sign errors
    assert out.error_inflation >= 0.9
    # zero point: two INDEPENDENT trainings on the same slice must
    # produce the identical partition (deterministic seeding +
    # rounded iteration) — the property that makes inflation == 1 /
    # rand == 1 the audit's no-drift reading
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    b1 = CL._argmin_centroid(CL.kmeans_centroids(emb, k=5, iters=2),
                             "embedding", 6)
    b2 = CL._argmin_centroid(CL.kmeans_centroids(emb, k=5, iters=2),
                             "embedding", 6)
    t = emb.select(b1.getField("cl").alias("clf"),
                   b2.getField("cl").alias("cln"))
    assert t.where(F.col("clf") != F.col("cln")).count() == 0


def test_ann_recall_ladder_contract(spark, sf_dir):
    from rag_vector_database_spark.plans import registry as R

    out = {r.variant: r for r in
           R.q_ann_recall_ladder(spark, sf_dir).collect()}
    assert set(out) == set(R._ANN_LADDER)
    for r in out.values():
        assert 0 <= r.hits_at_10 <= 10
        assert abs(r.recall_at_10 - r.hits_at_10 / 10.0) < 1e-9
    # multiprobe is a superset of single-probe cells by construction
    assert (out["ivf_knn_multiprobe"].hits_at_10
            >= out["ivf_knn"].hits_at_10)

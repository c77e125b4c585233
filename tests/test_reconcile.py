"""Merkle reconciliation: digest pruning + exact-equivalence checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_vector_database_spark.operators import reconcile as rc


def _docs(spark, sf_dir):
    return (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))


def test_identical_stores_zero_rows_zero_buckets(spark, sf_dir):
    d = _docs(spark, sf_dir)
    fp = F.md5(F.col("text"))
    assert rc.differing_buckets(d, d, "doc_id", fp).count() == 0
    assert rc.reconcile(d, d, "doc_id", fp).count() == 0


def test_single_changed_row_pruned_to_one_bucket(spark, sf_dir):
    """One edited doc out of the corpus -> exactly one differing
    bucket; the row-level compare touches only that bucket's rows."""
    d = _docs(spark, sf_dir)
    target = d.select(F.min("doc_id")).first()[0]
    right = d.withColumn(
        "text", F.when(F.col("doc_id") == target,
                       F.concat(F.col("text"), F.lit("!"))).otherwise(
                           F.col("text")))
    fp = F.md5(F.col("text"))
    n_total = d.count()
    buckets = rc.differing_buckets(d, right, "doc_id", fp, n_buckets=64)
    assert buckets.count() == 1
    out = rc.reconcile(d, right, "doc_id", fp, n_buckets=64).collect()
    assert [(r["doc_id"], r["change"]) for r in out] == [(target, "changed")]
    # pruning: the compared subset is ~1/64th of the store, not all of it
    b = buckets.first()["bucket"]
    compared = d.where(
        F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64)) == b).count()
    assert compared < n_total / 8


def test_duplicate_rows_do_not_cancel_in_digest(spark):
    """Duplicate-pair sensitivity — the reason the digest is a SUM of
    row hashes, not an XOR. Case 1: a duplicated extra pair on one
    side (under XOR it cancels back to the other side's digest; the
    count catches it, but only by luck of unequal sizes)."""
    left = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    extra = spark.createDataFrame([(3, "c"), (3, "c")], "k long, v string")
    right = left.unionByName(extra)
    fp = F.md5(F.col("v"))
    diff = rc.differing_buckets(left, right, "k", fp, n_buckets=1)
    assert diff.count() == 1
    out = rc.reconcile(left, right, "k", fp, n_buckets=1).collect()
    # both duplicate rows surface (full-outer join over a dup key)
    assert [(r["k"], r["change"]) for r in out] \
        == [(3, "only_right"), (3, "only_right")]


def test_equal_count_duplicate_pairs_detected(spark):
    """Case 2, the hypothesis-found counterexample XOR cannot catch:
    EQUAL-sized buckets each holding one duplicated pair of DIFFERENT
    content — under XOR both digests cancel to zero with equal counts
    and the diff silently vanishes; the sum digest must detect it."""
    left = spark.createDataFrame([(0, None), (0, None)],
                                 "k long, v string")
    right = spark.createDataFrame([(0, ""), (0, "")], "k long, v string")
    fp = F.md5(F.coalesce(F.col("v"), F.lit("\x00null")))
    assert rc.differing_buckets(left, right, "k", fp,
                                n_buckets=1).count() == 1
    out = rc.reconcile(left, right, "k", fp, n_buckets=1).collect()
    assert sorted((r["k"], r["change"]) for r in out) \
        == [(0, "changed")] * 4  # 2x2 full-outer over the dup key


def test_classification_matrix(spark):
    left = spark.createDataFrame(
        [(1, "same"), (2, "old"), (3, "gone")], "k long, v string")
    right = spark.createDataFrame(
        [(1, "same"), (2, "new"), (4, "added")], "k long, v string")
    out = {r["k"]: r["change"]
           for r in rc.reconcile(left, right, "k",
                                 F.md5(F.col("v")), n_buckets=8).collect()}
    assert out == {2: "changed", 3: "only_left", 4: "only_right"}


def test_plan_semi_joins_by_bucket(spark, sf_dir):
    """The row-level join inputs must be bucket-semi-joined (the
    pruning step), not the raw stores."""
    d = _docs(spark, sf_dir)
    right = d.where(F.col("doc_id") % 13 != 0)
    plan = rc.reconcile(d, right, "doc_id", F.md5(F.col("text"))) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan


def test_reconcile_equals_exhaustive_diff_property(spark):
    """Property: for arbitrary KEY-UNIQUE stores (the documented
    contract — stores have primary keys), the digest-pruned reconcile
    equals the exhaustive full-outer diff, including nulls and any
    bucket count. (Unconstrained dup keys make the exhaustive
    full-outer reference itself a cross product — see the reconcile
    docstring; dup-key behavior is pinned by the dedicated tests
    above.)"""
    from hypothesis import given, settings, strategies as st

    row = st.tuples(st.integers(min_value=0, max_value=30),
                    st.one_of(st.none(),
                              st.text(alphabet="abc", max_size=3)))
    stores = st.lists(row, max_size=25, unique_by=lambda r: r[0])

    @settings(max_examples=15, deadline=None)
    @given(left_rows=stores, right_rows=stores,
           n_buckets=st.sampled_from([1, 2, 16]))
    def prop(left_rows, right_rows, n_buckets):
        left = spark.createDataFrame(left_rows, "k long, v string")
        right = spark.createDataFrame(right_rows, "k long, v string")
        fp = F.md5(F.coalesce(F.col("v"), F.lit("\x00null")))
        got = sorted(map(tuple, rc.reconcile(
            left, right, "k", fp, n_buckets=n_buckets).collect()))
        l = left.select("k", fp.alias("fp1"), F.lit(1).alias("in1"))
        r = right.select("k", fp.alias("fp2"), F.lit(1).alias("in2"))
        j = l.join(r, "k", "full_outer")
        change = (F.when(F.col("in2").isNull(), "only_left")
                  .when(F.col("in1").isNull(), "only_right")
                  .when(~F.col("fp1").eqNullSafe(F.col("fp2")), "changed"))
        want = sorted(map(tuple, j.select("k", change.alias("change"))
                          .where(F.col("change").isNotNull()).collect()))
        assert got == want

    prop()


def test_incremental_components_merges_and_passes_through(spark):
    """incremental_components semantics on a hand-built graph:
    a delta edge bridging two old clusters merges them to the global
    min label; a cluster untouched by any delta endpoint passes
    through unchanged; brand-new nodes (no old assignment) cluster
    from delta edges alone. Result equals full CC over all edges."""
    from rag_vector_database_spark.operators import dedup

    old_pairs = spark.createDataFrame(
        [(1, 2), (2, 3),        # cluster 1
         (10, 11),              # cluster 10
         (20, 21), (21, 22)],   # cluster 20 (untouched)
        "id_a long, id_b long")
    delta = spark.createDataFrame(
        [(3, 10),    # bridges cluster 1 and cluster 10
         (30, 31)],  # brand-new nodes
        "id_a long, id_b long")
    assignments = dedup.connected_components(old_pairs)
    out = {r["id"]: r["cluster_id"] for r in
           dedup.incremental_components(assignments, delta).collect()}
    full = {r["id"]: r["cluster_id"] for r in
            dedup.connected_components(
                old_pairs.unionByName(delta)).collect()}
    assert out == full
    assert out[11] == 1   # merged across the bridge
    assert out[22] == 20  # untouched cluster label preserved
    assert out[31] == 30  # new-node cluster


def test_incremental_components_custom_column_names(spark):
    """Non-default id/cluster/pair column names flow through: the
    relabeled side is renamed back before the union with untouched
    rows (regression: unionByName used to raise on custom names)."""
    from rag_vector_database_spark.operators import dedup

    old_pairs = spark.createDataFrame(
        [(1, 2), (10, 11)], "src long, dst long")
    delta = spark.createDataFrame([(2, 10)], "src long, dst long")
    assignments = (dedup.connected_components(old_pairs,
                                              id_a="src", id_b="dst")
                   .select(F.col("id").alias("node"),
                           F.col("cluster_id").alias("grp")))
    out = dedup.incremental_components(
        assignments, delta, id_col="node", cluster_col="grp",
        id_a="src", id_b="dst")
    assert out.columns == ["node", "grp"]
    got = {r["node"]: r["grp"] for r in out.collect()}
    assert got == {1: 1, 2: 1, 10: 1, 11: 1}


def test_incremental_components_random_graphs_property(spark):
    """Merge == rebuild on RANDOM graphs: for arbitrary old/delta edge
    sets, folding the delta into the old assignments must equal full
    connected components over the union (the registry oracle proves
    one instance; hypothesis sweeps the structure space — bridges,
    new nodes, deltas inside one cluster, empty deltas)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from rag_vector_database_spark.operators import dedup

    edge = st.tuples(st.integers(0, 24), st.integers(0, 24)) \
        .filter(lambda p: p[0] < p[1])

    @settings(max_examples=5, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    @given(st.lists(edge, min_size=1, max_size=20, unique=True),
           st.lists(edge, min_size=0, max_size=8, unique=True))
    def prop(old_edges, delta_edges):
        old = spark.createDataFrame(old_edges, "id_a long, id_b long")
        delta = (spark.createDataFrame(delta_edges, "id_a long, id_b long")
                 if delta_edges else
                 spark.createDataFrame([], "id_a long, id_b long"))
        assignments = dedup.connected_components(old)
        got = {r["id"]: r["cluster_id"] for r in
               dedup.incremental_components(assignments, delta).collect()}
        want = {r["id"]: r["cluster_id"] for r in
                dedup.connected_components(old.unionByName(delta))
                .collect()}
        assert got == want

    prop()

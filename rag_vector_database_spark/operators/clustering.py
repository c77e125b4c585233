"""Embedding-space clustering and semantic deduplication.

Lloyd's k-means expressed Spark-first, and SemDeDup-style semantic
near-duplicate removal (cluster the embedding space, then prune
high-cosine pairs inside each cluster, keeping the member closest to
its centroid — the published SemDeDup recipe, Abbas et al. 2023,
arXiv:2303.09540).

The reference stores embeddings but never clusters them
(ingest_chunks_to_chromadb.py:60-74 builds the vectors; ChromaDB's
HNSW is its only index). Clustering is the scale path a 100 TB corpus
needs for semantic dedup and IVF-style centroid indexes.

Scale design (why this shape survives 1000 executors):

- Centroids are tiny (k x dim doubles) and live as PLAN LITERALS, so
  every assignment pass is scan-local — zero shuffle of the corpus,
  no N x k exchange, no per-row window. The only per-iteration
  shuffle is the centroid recompute: a map-side-partial groupBy of
  ``dim`` column sums + a count per cluster — k x (dim+1) doubles
  cross the wire, regardless of corpus size.
- The per-iteration driver collect is k rows (the new centroids),
  the same bounded footprint as the cached query-vector lookup; it
  is NOT a corpus collect.
- Distances are rounded to ``ndigits`` BEFORE the argmin and
  centroid means are rounded BEFORE the next pass, so the oracle's
  float64 arithmetic sees bit-identical inputs and the argmin
  tie-break (lowest cluster id) is deterministic in both engines.
"""

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import vectors as V


def _argmin_centroid(cents: list, vec_col: str, ndigits: int) -> Column:
    """struct(d2, cl) of the nearest centroid: squared-L2 to each
    centroid literal, rounded, then array_min's lexicographic struct
    order = (distance asc, cluster id asc). Scan-local."""
    scored = [
        F.struct(
            F.round(F.aggregate(
                F.zip_with(F.col(vec_col),
                           F.array(*[F.lit(float(x)) for x in cv]),
                           lambda a, b: F.pow(a.cast("double") - b, F.lit(2))),
                F.lit(0.0), lambda acc, v: acc + v), ndigits).alias("d2"),
            F.lit(int(cl)).cast("long").alias("cl"))
        for cl, cv in cents]
    return F.array_min(F.array(*scored))


def kmeans_centroids(emb: DataFrame, k: int = 5, iters: int = 2,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     ndigits: int = 6) -> list:
    """Lloyd's k-means centroid loop with deterministic seeding (the
    k lowest-id vectors are the initial centroids) and a fixed
    iteration count. Returns [(cluster_id, [double, ...]), ...] —
    the learned coarse quantizer, k x dim doubles, safe to embed as
    plan literals. Empty clusters drop out of the recompute in both
    engines identically (GROUP BY emits no row)."""
    init = (emb.where(F.col(id_col) < k)
            .select(F.col(id_col).cast("long").alias("cl"), F.col(vec_col)))
    cents = sorted((r["cl"], [float(x) for x in r[vec_col]])
                   for r in init.collect())
    dim = len(cents[0][1])
    for _ in range(iters):
        best = _argmin_centroid(cents, vec_col, ndigits)
        means = [F.round(F.sum(F.col(vec_col)[i].cast("double"))
                         / F.count(F.lit(1)), ndigits).alias(f"c{i}")
                 for i in range(dim)]
        newc = (emb.select(F.col(vec_col), best.getField("cl").alias("cl"))
                .groupBy("cl").agg(*means))
        cents = sorted((int(r["cl"]), [r[f"c{i}"] for i in range(dim)])
                       for r in newc.collect())
    return cents


def kmeans_assign(emb: DataFrame, k: int = 5, iters: int = 2,
                  vec_col: str = "embedding", id_col: str = "vec_id",
                  ndigits: int = 6) -> DataFrame:
    """Assign every row to its learned k-means cluster. Returns
    (id_col, vec_col, cluster, dist2) from a final scan-local argmin
    against the last-recomputed centroids."""
    cents = kmeans_centroids(emb, k=k, iters=iters, vec_col=vec_col,
                             id_col=id_col, ndigits=ndigits)
    best = _argmin_centroid(cents, vec_col, ndigits)
    return emb.select(F.col(id_col), F.col(vec_col),
                      best.getField("cl").alias("cluster"),
                      best.getField("d2").alias("dist2"))


def ivf_kmeans_topk(emb: DataFrame, qv: list, k: int = 10,
                    n_probe: int = 2, n_clusters: int = 5, iters: int = 2,
                    vec_col: str = "embedding", id_col: str = "vec_id",
                    ndigits: int = 6) -> DataFrame:
    """IVF top-k with a LEARNED coarse quantizer — the FAISS-IVF
    design: k-means centroids partition the corpus, the query probes
    its n_probe nearest cells, and exact cosine runs only inside
    probed cells (vs the sign-bucket quantizer in
    retrieval.ivf_topk, whose cells are fixed hyperplane octants).

    Scale shape: centroids AND the probe set are plan literals
    (Catalyst constant-folds the probe argsort), so the cell filter
    is scan-local; with the corpus written partitioned by cluster it
    becomes partition pruning at file-listing time. Scoring touches
    ~n_probe/k of the corpus; top-k is TakeOrderedAndProject."""
    cents = kmeans_centroids(emb, k=n_clusters, iters=iters,
                             vec_col=vec_col, id_col=id_col,
                             ndigits=ndigits)
    qlit = F.array(*[F.lit(float(x)) for x in qv])
    scored = [
        F.struct(
            F.round(F.aggregate(
                F.zip_with(qlit, F.array(*[F.lit(float(x)) for x in cv]),
                           lambda a, b: F.pow(a - b, F.lit(2))),
                F.lit(0.0), lambda acc, v: acc + v), ndigits).alias("d2"),
            F.lit(int(cl)).cast("long").alias("cl"))
        for cl, cv in cents]
    probes_expr = F.transform(
        F.slice(F.array_sort(F.array(*scored)), 1, n_probe),
        lambda s: s.cl)
    # Catalyst does not constant-fold lambda expressions, so evaluate
    # the probe argsort ONCE (1-row job, same Spark arithmetic as the
    # oracle) instead of re-sorting nlist structs per corpus row.
    probe_ids = emb.sparkSession.range(1) \
        .select(probes_expr.alias("p")).first()["p"]
    best = _argmin_centroid(cents, vec_col, ndigits)
    return (emb.withColumn("cluster", best.getField("cl"))
            .where(F.col("cluster").isin([int(c) for c in probe_ids]))
            .select(F.col(id_col),
                    F.round(V.dot(F.col(vec_col), V.query_vec_lit(qv)),
                            ndigits).alias("score"))
            .orderBy(F.desc("score"), F.col(id_col))
            .limit(k))


def semantic_dedup(emb: DataFrame, k: int = 5, iters: int = 2,
                   threshold: float = 0.6,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   ndigits: int = 6) -> DataFrame:
    """SemDeDup: k-means-blocked cosine pruning. Within each learned
    cluster, every pair with cosine >= threshold marks one member
    removed — the one FARTHER from the cluster centroid (ties to the
    higher id), so the kept representative is the most central, per
    the SemDeDup keep-rule.

    Returns one row per removed vector: (id_col, cluster, n_pairs,
    max_cosine). Unlike the fixed sign-bucket blocking in
    ``cosine_neardup_blocked``, the blocks here are LEARNED, which is
    what keeps within-block pair counts bounded on a real corpus: k
    grows with corpus size (SemDeDup uses k ~ sqrt(N)), so the
    quadratic term stays per-cluster-bounded while the cluster join
    key co-locates each block's pairs on one executor."""
    asn = kmeans_assign(emb, k=k, iters=iters, vec_col=vec_col,
                        id_col=id_col, ndigits=ndigits)
    a = asn.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
                   F.col("cluster"), F.col("dist2").alias("da"))
    b = asn.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
                   F.col("cluster"), F.col("dist2").alias("db"))
    pairs = (a.join(b, ["cluster"])
             .where(F.col("id_a") < F.col("id_b"))
             .withColumn("cosine",
                         F.round(V.dot(F.col("va"), F.col("vb")), ndigits))
             .where(F.col("cosine") >= threshold))
    removed = F.when(
        (F.col("da") > F.col("db"))
        | ((F.col("da") == F.col("db")) & (F.col("id_a") > F.col("id_b"))),
        F.col("id_a")).otherwise(F.col("id_b"))
    return (pairs.select(removed.alias(id_col), "cluster", "cosine")
            .groupBy(id_col, "cluster")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pairs"),
                 F.max("cosine").alias("max_cosine")))

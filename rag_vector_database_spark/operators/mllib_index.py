"""MLlib batch vector-index construction (BASELINE.json north star:
"MLlib vector indexing for batch build, not online ANN").

The reference's ANN index is ChromaDB's online HNSW
(ingest_chunks_to_chromadb.py:77-90); the Spark-native equivalent is a
batch-built LSH model over the whole corpus:

- ``BucketedRandomProjectionLSH`` (random hyperplane buckets) for
  euclidean/cosine-on-normalized vectors -> ``approxNearestNeighbors``
  for query-time top-k and ``approxSimilarityJoin`` for all-pairs
  near-dup at scale.
- ``MinHashLSH`` over token/shingle sets for Jaccard similarity joins
  (the MLlib twin of operators/dedup.minhash_lsh_pairs).

Fixed seeds keep runs reproducible. The exact operators (retrieval.knn,
dedup.ngram_jaccard_pairs) remain the correctness references; tests
assert recall bounds rather than exact equality.
"""

from __future__ import annotations

from pyspark.ml.feature import BucketedRandomProjectionLSH, MinHashLSH
from pyspark.ml.functions import array_to_vector
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SEED_BRP = 42
SEED_MINHASH = 43


def build_brp_index(df: DataFrame, vec_col: str = "embedding",
                    bucket_length: float = 0.5, num_hash_tables: int = 4):
    """Fit a random-projection LSH model over an array<float> column.
    Returns (model, indexed_df); ``indexed_df`` carries the vector and
    its hash buckets — at scale, write it out partitioned by a hash
    bucket so query-time reads prune to matching buckets."""
    with_vec = df.withColumn("features", array_to_vector(F.col(vec_col)))
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables,
        seed=SEED_BRP)
    model = brp.fit(with_vec)
    return model, model.transform(with_vec)


def brp_topk(model, indexed: DataFrame, query_vec, k: int,
             id_col: str = "vec_id") -> DataFrame:
    """approxNearestNeighbors: query-time top-k via bucket probing.
    distCol is euclidean distance; for L2-normalized vectors
    cos = 1 - dist^2/2, so ranking by distance == ranking by cosine."""
    from pyspark.ml.linalg import Vectors
    qv = Vectors.dense([float(x) for x in query_vec])
    nn = model.approxNearestNeighbors(indexed, qv, k, distCol="dist")
    return nn.select(
        id_col,
        F.round(1 - F.col("dist") * F.col("dist") / 2, 6).alias("cosine_est"))


def brp_similarity_join(model, a: DataFrame, b: DataFrame,
                        dist_threshold: float,
                        id_col: str = "vec_id") -> DataFrame:
    """approxSimilarityJoin: all-pairs within a euclidean threshold —
    the batch near-dup join at scale (bucket-colliding pairs only)."""
    j = model.approxSimilarityJoin(a, b, dist_threshold, distCol="dist")
    return (j.select(F.col(f"datasetA.{id_col}").alias("id_a"),
                     F.col(f"datasetB.{id_col}").alias("id_b"),
                     F.round("dist", 6).alias("dist"))
            .where(F.col("id_a") < F.col("id_b")))


def build_minhash_index(df: DataFrame, tokens_col: str,
                        num_hash_tables: int = 8, dim: int = 1 << 18):
    """MinHashLSH over a token-array column (hashed into a sparse binary
    vector). Returns (model, indexed_df)."""
    from pyspark.ml.feature import HashingTF
    tf = HashingTF(inputCol=tokens_col, outputCol="features",
                   numFeatures=dim, binary=True)
    feat = tf.transform(df)
    mh = MinHashLSH(inputCol="features", outputCol="hashes",
                    numHashTables=num_hash_tables, seed=SEED_MINHASH)
    model = mh.fit(feat)
    return model, model.transform(feat)


def minhash_similarity_join(model, a: DataFrame, b: DataFrame,
                            jaccard_threshold: float,
                            id_col: str = "doc_id") -> DataFrame:
    """approxSimilarityJoin on Jaccard distance (1 - similarity)."""
    j = model.approxSimilarityJoin(a, b, 1.0 - jaccard_threshold,
                                   distCol="jdist")
    return (j.select(F.col(f"datasetA.{id_col}").alias("id_a"),
                     F.col(f"datasetB.{id_col}").alias("id_b"),
                     F.round(1 - F.col("jdist"), 6).alias("jaccard_est"))
            .where(F.col("id_a") < F.col("id_b")))

"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference RAG pipeline (Spongeblorgus773/RAG-Vector-Database).

The reference is an imperative single-process Python RAG pipeline
(chunk -> embed -> vector store -> two-stage retrieval); this package
re-expresses every dataflow operation it performs as declarative PySpark
DataFrame transformations (SURVEY.md section 2 maps each operator), plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) the reference's north star calls for.

Design stance (SURVEY.md section 7):
- DataFrame/SQL-first; Catalyst does pushdown/pruning/join selection.
- No row-at-a-time Python UDFs in any hot path: chunking, hashing,
  minhash, simhash, vector dot products are all built-in higher-order
  functions (JVM whole-stage codegen).
- Pandas UDFs (Arrow) only where semantics are genuinely non-relational
  (pluggable embedding backends, binary decode stubs).
- Every operator parameterized the way the reference's constants are
  (chunk_size=1000, overlap=150, k=50->top5, theta=0.75 ...).
"""

__version__ = "0.1.0"

"""Scan-width plumbing shared by compute-heavy operators.

A one-split parquet (anything under ``spark.sql.files.
maxPartitionBytes``) scans as a SINGLE partition, so any expensive
per-row work layered on it runs in one task no matter how many cores
the cluster has. The gate here widens exactly those scans and nothing
else: a corpus that is already wider than the core count is never
repartitioned, so at 100 TB (thousands of splits) the gate is a no-op
and adds zero shuffle.

WHERE THE GATE PAYS (measured at sf0.1, local[32]): only where
per-row cost dwarfs the exchange + 32-task scheduling overhead
(~0.5-1 s per job on small inputs):

- Python ``mapInPandas`` kernels (sources.multimodal): 2-4x faster —
  a single Python worker was the whole pipeline's throughput.
- Tokenize-into-persisted-table paths (operators.dedup): the
  exchange cost is paid once into a table with several consumers.

WHERE IT DOES NOT (and is deliberately NOT applied): JVM
whole-stage-codegen paths over corpus-sized-but-small inputs —
fingerprint/md5 (exact_dedup +0.4 s), BM25 tokenize (+0.8 s), the
k-means/PQ iteration loops and per-row scorings (+1 s: multiple
actions each re-pay exchange + task overhead against tens of ms of
actual compute). Re-measure before adding a new call site.
"""

from ..functions.scanwidth import (estimated_scan_partitions,  # noqa: F401
                                   parse_byte_string,
                                   widen_narrow_scan)

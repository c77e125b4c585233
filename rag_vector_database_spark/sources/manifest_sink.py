"""Manifest-committed JSONL sink as a Spark 4 Python DataSource writer.

The write-side twin of sources/api_listing.py's custom reader: the
reference appends every chunker's output to ONE shared JSONL file
(SURVEY.md section 2 #10, chunk_cisa_kev.py:158), which cannot be
written concurrently or atomically. This sink keeps the JSONL format
but gives it the lakehouse commit protocol:

- each task writes its rows to a UNIQUELY-NAMED part file (task retries
  can never collide or interleave) and returns the file name + row
  count as its commit message;
- ``commit`` runs once on the driver AFTER every task succeeded and
  atomically publishes a ``_manifest.json`` listing exactly the
  committed files — readers that go through the manifest never see a
  partial job;
- ``abort`` leaves no manifest, so a failed job is invisible;
- overwrite is GENERATION-numbered, never retract-then-publish: the
  new job's manifest carries generation+1 and readers take only the
  highest generation, so the old version stays fully visible until the
  single atomic rename that publishes the new one — a crash mid-commit
  can never expose an empty or partial dataset.

That two-phase shape is the same contract Spark's own FileCommitProtocol
/ Delta's transaction log provide; here it is spelled out in ~60 lines
of executor/driver code, and the registry query round-trips through it
under the oracle gate. At scale the sink parallelizes with the input
partitioning (one file per task) and the manifest stays rows-per-task
sized.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceStreamWriter,
                                    DataSourceWriter, WriterCommitMessage)
from pyspark.sql.types import Row, StructType


@dataclass
class PartFileCommit(WriterCommitMessage):
    filename: str
    n_rows: int


def _write_part(path: str, fields: list, rows) -> PartFileCommit:
    """Executor-side part write shared by the batch and stream writers:
    a unique name per task attempt means retries never collide or
    interleave; the file only becomes visible via a manifest."""
    os.makedirs(path, exist_ok=True)
    name = f"part-{uuid.uuid4().hex}.jsonl"
    n = 0
    with open(os.path.join(path, name), "w") as f:
        for row in rows:
            f.write(json.dumps(dict(zip(fields, row))) + "\n")
            n += 1
    return PartFileCommit(name, n)


def _publish_manifest(path: str, final_name: str, manifest: dict) -> None:
    """Atomic driver-side publish: write-then-rename."""
    tmp = os.path.join(path, f"._manifest-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, os.path.join(path, final_name))


def _remove_parts(path: str, messages) -> None:
    for m in messages:
        if m is not None:
            try:
                os.remove(os.path.join(path, m.filename))
            except OSError:
                pass


def _load_manifests(path: str) -> list[tuple[str, int, list[str]]]:
    """Every committed manifest under ``path`` as (file, generation,
    part-files) — THE single definition of "committed" shared by the
    generation counter, the reader, and vacuum, so tolerance rules
    can't drift between them. A file that PARSES wrong (truncated
    JSON, missing keys, foreign tooling) was never atomically
    committed and is skipped; a file that can't be OPENED (EACCES,
    EIO) is a transient failure and RAISES — misreading 'can't read'
    as 'doesn't exist' is how a vacuum deletes a live generation's
    parts or a commit stamps the wrong generation."""
    import glob as _glob
    out = []
    for mf in sorted(_glob.glob(os.path.join(path, "_manifest*.json"))):
        with open(mf) as f:  # OSError propagates deliberately
            try:
                m = json.load(f)
                out.append((mf, int(m.get("generation", 0)),
                            list(m["files"])))
            except (ValueError, KeyError, TypeError,
                    json.JSONDecodeError):
                continue  # torn/foreign: never committed
    return out


def _current_generation(path: str) -> int:
    """Highest generation among committed manifests (0 if none).
    Pre-generation manifests (no ``generation`` key) read as 0."""
    gens = [g for _, g, _ in _load_manifests(path)]
    return max(gens) if gens else 0


def _claim_next_generation(path: str) -> int:
    """Atomically claim generation current+1 for an overwrite job via
    an O_EXCL lock-file create (`.gen-<N>.claim`). If another writer
    already claimed N, re-read the current generation (their manifest
    may or may not have landed yet) and try N+1, so concurrent
    overwrites serialize into distinct generations instead of merging.
    Claim files are one-byte markers; vacuum/cleanup may remove them
    freely once their generation's manifest is published."""
    os.makedirs(path, exist_ok=True)
    gen = _current_generation(path)
    while True:
        gen += 1
        claim = os.path.join(path, f".gen-{gen}.claim")
        try:
            fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
            return gen
        except FileExistsError:
            gen = max(gen, _current_generation(path))


class ManifestJsonlWriter(DataSourceWriter):
    def __init__(self, options: dict, schema: StructType, overwrite: bool):
        self.path = options["path"]
        self.fields = schema.fieldNames()
        self.overwrite = overwrite

    def write(self, rows: Iterator[Row]) -> PartFileCommit:
        return _write_part(self.path, self.fields, rows)

    def commit(self, messages) -> None:
        # driver-side, after ALL tasks succeeded. Each batch JOB gets
        # its own uniquely-named manifest carrying a GENERATION number;
        # readers take only the highest generation. Append joins the
        # current generation, so job N can never eclipse job N-1's
        # files. Overwrite publishes generation+1 in ONE atomic rename:
        # the old generation stays fully visible until the new manifest
        # lands, and a crash anywhere before that leaves it untouched —
        # no retract-then-publish window. Eclipsed manifests/parts are
        # logical deletes; physical cleanup is vacuum_generations.
        #
        # Concurrency: two concurrent OVERWRITES must not both publish
        # the same new generation (readers would union two unrelated
        # jobs' files), so the generation number is CLAIMED with an
        # O_EXCL create — the portable atomic-create primitive — and
        # on a lost race the writer re-reads and claims the next one.
        # An APPEND racing an overwrite needs no claim: stamping the
        # pre-overwrite generation is exactly the serialization
        # "append happened first, then was eclipsed" — a legal
        # outcome, identical to running the two jobs back to back.
        if self.overwrite:
            gen = _claim_next_generation(self.path)
        else:
            gen = _current_generation(self.path)
        manifest = {
            "generation": gen,
            "files": sorted(m.filename for m in messages if m is not None),
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        _publish_manifest(self.path,
                          f"_manifest-job-{uuid.uuid4().hex}.json", manifest)

    def abort(self, messages) -> None:
        _remove_parts(self.path, messages)


class ManifestJsonlStreamWriter(DataSourceStreamWriter):
    """Streaming form of the sink: per micro-batch, tasks write unique
    part files and the driver publishes ``_manifest-<batchId>.json``
    after all of them succeed — so each batch commits atomically and a
    replayed batch (same batchId after recovery) just overwrites its
    own manifest instead of duplicating rows. Readers union the
    manifests; uncommitted parts stay invisible, exactly as in batch."""

    def __init__(self, options: dict, schema: StructType):
        self.path = options["path"]
        self.fields = schema.fieldNames()

    def write(self, rows: Iterator[Row]) -> PartFileCommit:
        return _write_part(self.path, self.fields, rows)

    def commit(self, messages, batchId: int) -> None:
        manifest = {
            "batch": batchId,
            "generation": _current_generation(self.path),
            "files": sorted(m.filename for m in messages if m is not None),
            "n_rows": sum(m.n_rows for m in messages if m is not None),
        }
        _publish_manifest(self.path, f"_manifest-{batchId}.json", manifest)

    def abort(self, messages, batchId: int) -> None:
        _remove_parts(self.path, messages)


class ManifestJsonlSink(DataSource):
    @classmethod
    def name(cls) -> str:
        return "manifest_jsonl"

    def writer(self, schema: StructType, overwrite: bool) -> ManifestJsonlWriter:
        return ManifestJsonlWriter(self.options, schema, overwrite)

    def streamWriter(self, schema: StructType,
                     overwrite: bool) -> ManifestJsonlStreamWriter:
        return ManifestJsonlStreamWriter(self.options, schema)


def register_manifest_sink(spark) -> None:
    """Idempotent registration. As with api_listing.py, the class must
    pickle BY VALUE: a consuming driver that put this repo on sys.path
    at runtime has workers that cannot import the package, so a
    by-reference pickle fails at write time."""
    import sys

    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(ManifestJsonlSink)


def vacuum_generations(path: str, keep_last: int = 1,
                       remove_orphans: bool = False) -> dict:
    """Physical cleanup for the logical deletes overwrite leaves
    behind: drop every manifest whose generation is NOT among the
    ``keep_last`` highest, plus the part files referenced only by
    dropped manifests. Reads of kept generations are untouched;
    time travel to a vacuumed generation reads as empty — exactly a
    table format's VACUUM/expire-snapshots contract.

    Deletion order is crash-safe for readers: a dropped generation's
    MANIFESTS are removed before its part files, so no reader can
    resolve a manifest to a missing file mid-vacuum.

    ``remove_orphans`` additionally deletes part files referenced by
    NO manifest. Default False: an in-flight job's parts are orphans
    until its commit publishes, so orphan removal is only safe when no
    writer is running (the same caveat as a short table-format VACUUM
    retention). A manifest that cannot be OPENED aborts the vacuum
    (via _load_manifests) — treating a transiently unreadable live
    manifest as absent would classify its generation's parts as
    orphans and delete the current table. Returns counts."""
    import glob as _glob
    import re as _re

    if keep_last < 1:
        raise ValueError(
            f"keep_last must be >= 1 (got {keep_last}): a retention "
            "that can drop the current generation deletes the table")
    manifests = _load_manifests(path) if os.path.isdir(path) else []
    gens = sorted({g for _, g, _ in manifests})
    kept_gens = set(gens[-keep_last:]) if gens else set()
    kept_files = {f for _, g, files in manifests
                  for f in files if g in kept_gens}
    dropped = [(mf, files) for mf, g, files in manifests
               if g not in kept_gens]
    n_manifests = n_parts = 0
    for mf, _files in dropped:   # manifests first: see docstring
        try:
            os.remove(mf)
            n_manifests += 1
        except OSError:
            pass
    for _mf, files in dropped:
        for name in files:
            if name in kept_files:
                continue
            try:
                os.remove(os.path.join(path, name))
                n_parts += 1
            except OSError:
                pass
    # claim markers for dropped generations are stale by construction
    # (their manifest either published and is now dropped, or the claim
    # is below the kept range); in-flight claims are > max kept gen
    for g in gens:
        if g not in kept_gens:
            try:
                os.remove(os.path.join(path, f".gen-{g}.claim"))
            except OSError:
                pass
    # ABANDONED claims: a writer that crashed between claiming gen N
    # and publishing its manifest leaves .gen-N.claim forever, and
    # every later overwrite burns a number skipping past it. Once a
    # LATER manifest exists (N <= current max gen), that claim can
    # never become the table's current generation — readers take the
    # highest gen — so it is safe to reap. Claims ABOVE the max gen
    # may belong to an in-flight writer and are left alone. (Vacuum's
    # existing contract — run it without concurrent writers — makes
    # this unambiguous; the guard is defense in depth.)
    cur_gen = gens[-1] if gens else 0
    for claim in _glob.glob(os.path.join(path, ".gen-*.claim")):
        m = _re.match(r"\.gen-(\d+)\.claim$", os.path.basename(claim))
        if m and int(m.group(1)) not in gens and int(m.group(1)) <= cur_gen:
            try:
                os.remove(claim)
            except OSError:
                pass
    n_orphans = 0
    if remove_orphans:
        referenced = kept_files
        for part in _glob.glob(os.path.join(path, "part-*.jsonl")):
            if os.path.basename(part) not in referenced:
                try:
                    os.remove(part)
                    n_orphans += 1
                except OSError:
                    pass
    return {"manifests_removed": n_manifests, "parts_removed": n_parts,
            "orphans_removed": n_orphans, "kept_generations": sorted(kept_gens)}


def read_manifest(spark, path: str, schema, generation: int | None = None):
    """Read back ONLY the files committed by manifests of ONE
    generation — by default the highest (a crashed or concurrent
    writer's orphan part files are invisible; an overwrite's new
    generation eclipses older ones the instant its manifest renames
    into place). Because overwrite never deletes eclipsed manifests,
    passing an explicit ``generation`` is TIME TRAVEL: any previously
    committed version stays readable until a vacuum physically removes
    it — the same snapshot-read contract a table format's log gives.
    Batch jobs publish one manifest per job; streaming publishes one
    per micro-batch — all manifests at the chosen generation are
    unioned. A generation that never existed reads as empty."""
    by_gen: dict[int, list[str]] = {}
    for _mf, gen, files in _load_manifests(path):
        by_gen.setdefault(gen, []).extend(
            os.path.join(path, n) for n in files)
    if not by_gen:
        files = []
    else:
        pick = max(by_gen) if generation is None else generation
        files = by_gen.get(pick, [])
    if not files:  # nothing ever committed -> empty, not an error
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).json(files)

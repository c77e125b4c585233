"""Source readers: KEV catalog explode, recursive JSON, JSONL with
corrupt-record tolerance, binary glob pruning."""

from __future__ import annotations

import json
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from rag_vector_database_spark.sources import readers


@pytest.fixture(scope="module")
def tree(spark):
    d = tempfile.mkdtemp()
    # KEV-style catalog
    with open(f"{d}/kev.json", "w") as f:
        json.dump({"catalogVersion": "1", "vulnerabilities": [
            {"cveID": "CVE-1", "product": "A", "cwes": ["CWE-1"]},
            {"cveID": "CVE-2", "product": "B", "cwes": []},
        ]}, f)
    # recursive per-file JSON docs + a hidden dir to prune
    os.makedirs(f"{d}/docs/ch1", exist_ok=True)
    os.makedirs(f"{d}/docs/.hidden", exist_ok=True)
    for i, sub in [(1, "ch1"), (2, "ch1"), (3, ".hidden")]:
        with open(f"{d}/docs/{sub}/v{i}.json", "w") as f:
            json.dump({"video_id": f"v{i}", "transcript": f"text {i}"}, f)
    # JSONL with one malformed line
    with open(f"{d}/chunks.jsonl", "w") as f:
        f.write('{"id": "a", "text": "t1"}\n')
        f.write("NOT JSON AT ALL{{{\n")
        f.write('{"id": "b", "text": "t2"}\n')
    # binaries
    os.makedirs(f"{d}/bin", exist_ok=True)
    for name in ("x.pdf", "y.pdf", "skip.txt"):
        with open(f"{d}/bin/{name}", "wb") as f:
            f.write(b"%PDF" if name.endswith("pdf") else b"nope")
    return d


def test_kev_catalog(spark, tree):
    df = readers.read_kev_catalog(spark, f"{tree}/kev.json")
    rows = {r["cveID"]: r for r in df.collect()}
    assert set(rows) == {"CVE-1", "CVE-2"}
    assert rows["CVE-1"]["cwes"] == ["CWE-1"]


def test_json_documents_recursive_and_hidden_pruned(spark, tree):
    df = readers.read_json_documents(spark, f"{tree}/docs")
    ids = sorted(r["video_id"] for r in df.collect())
    assert ids == ["v1", "v2"]  # v3 lives under .hidden
    assert all(r["source_path"].startswith("file:") for r in df.collect())


def test_jsonl_corrupt_tolerance(spark, tree):
    from pyspark.sql.types import StringType, StructField, StructType
    schema = StructType([StructField("id", StringType()),
                         StructField("text", StringType()),
                         StructField("_corrupt_record", StringType())])
    df = readers.read_jsonl_chunks(spark, f"{tree}/chunks.jsonl", schema,
                                   materialize_corrupt=True)
    good = df.where(F.col("_corrupt_record").isNull())
    bad = df.where(F.col("_corrupt_record").isNotNull())
    assert sorted(r["id"] for r in good.collect()) == ["a", "b"]
    assert bad.count() == 1  # skip-and-count, as the reference does


def test_binary_glob(spark, tree):
    df = readers.read_binaries(spark, f"{tree}/bin", glob="*.pdf")
    paths = sorted(os.path.basename(r["path"]) for r in df.collect())
    assert paths == ["x.pdf", "y.pdf"]
    assert all(bytes(r["content"]).startswith(b"%PDF") for r in df.collect())
    assert readers.exclude_paths(df, "y\\.pdf$").count() == 1


class _FakePage:
    def __init__(self, text):
        self._text = text

    def get_text(self, sort=False):
        assert sort is True  # reference uses get_text(sort=True)
        return self._text


class _FakeFitzDoc:
    def __init__(self, pages, title):
        self._pages = pages
        self.page_count = len(pages)
        self.metadata = {"title": title}
        self.closed = False

    def __iter__(self):
        return iter(self._pages)

    def close(self):
        self.closed = True


class _FakeFitz:
    """PyMuPDF-shaped module: open(stream=...) -> doc of pages."""

    def __init__(self):
        self.last_doc = None

    def open(self, stream=None, filetype=None):
        assert filetype == "pdf"
        pages = [_FakePage(p.decode("latin-1"))
                 for p in bytes(stream).split(b"\x0c") if p]
        self.last_doc = _FakeFitzDoc(pages, "T-" + str(len(pages)))
        return self.last_doc


def test_pdf_extract_kernel_real_branch():
    """The REAL PyMuPDF branch (not the stub): page texts joined with
    \\n\\n, page count and embedded title surfaced, doc closed."""
    fitz = _FakeFitz()
    text, n_pages, title = readers.pdf_extract_kernel(
        fitz, b"page one\x0cpage two\x0cpage three")
    assert text == "page one\n\npage two\n\npage three"
    assert n_pages == 3
    assert title == "T-3"
    assert fitz.last_doc.closed


def test_pdf_stub_kernel_is_fallback_only():
    text, n_pages, title = readers.pdf_stub_kernel(b"%PDF hello")
    assert "hello" in text and n_pages >= 1 and title.startswith("doc-")


def test_load_tables_all_named(spark):
    from rag_vector_database_spark.session import load_tables
    tables = load_tables(spark, "/root/testdata/sf0.001")
    assert set(tables) == {"region", "nation", "customer", "supplier",
                           "part", "orders", "lineitem", "events",
                           "documents", "embeddings"}
    assert tables["region"].count() > 0


def test_api_listing_datasource_pages_are_partitions(spark):
    from rag_vector_database_spark.sources.api_listing import (
        register_api_listing)
    register_api_listing(spark)
    register_api_listing(spark)  # idempotent re-registration
    df = (spark.read.format("api_listing")
          .option("n_items", 120).option("page_size", 50).load())
    assert df.count() == 120
    # one InputPartition per page -> ceil(120/50) = 3 scan partitions
    assert df.rdd.getNumPartitions() == 3
    rows = {r.seq: r for r in df.collect()}
    assert len(rows) == 120 and rows[0].video_id == rows[0].video_id
    # deterministic: a second scan returns identical rows
    again = {r.seq: r for r in df.collect()}
    assert all(rows[k] == again[k] for k in rows)
    assert all(len(r.video_id) == 11 and 0 <= r.duration_s < 3600
               for r in rows.values())


def test_manifest_sink_commit_protocol(spark, sf_dir, tmp_path):
    """The sink's atomicity contract: readers see exactly the files the
    manifest committed — an orphan part file (crashed writer, torn
    job) in the same directory is invisible; counts match the
    manifest."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from rag_vector_database_spark.sources.manifest_sink import (
        read_manifest, register_manifest_sink)

    register_manifest_sink(spark)
    out = str(tmp_path / "sink")
    df = spark.range(0, 100).select(F.col("id").alias("doc_id"))
    df.write.format("manifest_jsonl").option("path", out) \
        .mode("append").save()

    # a torn write that never committed
    with open(f"{out}/part-orphan.jsonl", "w") as f:
        f.write('{"doc_id": 999999}\n')

    schema = StructType([StructField("doc_id", LongType())])
    back = read_manifest(spark, out, schema)
    assert back.count() == 100
    assert back.where(F.col("doc_id") == 999999).count() == 0
    import glob
    [mpath] = glob.glob(f"{out}/_manifest*.json")
    manifest = json.load(open(mpath))
    assert manifest["n_rows"] == 100
    assert "part-orphan.jsonl" not in manifest["files"]

    # append composes: a second job's manifest unions with the first
    spark.range(100, 150).select(F.col("id").alias("doc_id")) \
        .write.format("manifest_jsonl").option("path", out) \
        .mode("append").save()
    assert read_manifest(spark, out, schema).count() == 150
    # overwrite eclipses every earlier manifest via a HIGHER generation
    spark.range(0, 7).select(F.col("id").alias("doc_id")) \
        .write.format("manifest_jsonl").option("path", out) \
        .mode("overwrite").save()
    assert read_manifest(spark, out, schema).count() == 7
    # ...without deleting them: the old generation stays on disk, so at
    # no instant during the overwrite was the directory manifest-less
    # (a crash mid-commit leaves the previous version fully readable)
    manifests = [json.load(open(p)) for p in glob.glob(f"{out}/_manifest*.json")]
    assert len(manifests) == 3
    assert sorted(m.get("generation", 0) for m in manifests) == [0, 0, 1]
    # append after overwrite joins the current generation
    spark.range(7, 10).select(F.col("id").alias("doc_id")) \
        .write.format("manifest_jsonl").option("path", out) \
        .mode("append").save()
    assert read_manifest(spark, out, schema).count() == 10
    # a never-committed directory reads as empty, not as an error
    assert read_manifest(spark, str(tmp_path / "nothing"),
                         schema).count() == 0


def test_manifest_overwrite_crash_keeps_old_generation(spark, tmp_path):
    """Crash-safety of overwrite: if the job dies before its manifest
    publishes (simulated by aborting the write), readers still see the
    previous version in full — there is no retract-then-publish window
    that exposes an empty dataset."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from rag_vector_database_spark.sources import manifest_sink
    from rag_vector_database_spark.sources.manifest_sink import (
        ManifestJsonlWriter, PartFileCommit, read_manifest,
        register_manifest_sink)

    register_manifest_sink(spark)
    out = str(tmp_path / "sink")
    spark.range(0, 40).select(F.col("id").alias("doc_id")) \
        .write.format("manifest_jsonl").option("path", out) \
        .mode("append").save()
    schema = StructType([StructField("doc_id", LongType())])
    assert read_manifest(spark, out, schema).count() == 40

    # an overwrite job whose tasks wrote parts but whose driver died
    # before commit(): parts exist, no new manifest
    w = ManifestJsonlWriter({"path": out}, schema, overwrite=True)
    msg = w.write(iter([(7,), (8,)]))
    assert isinstance(msg, PartFileCommit)
    # crash: commit never runs -> old generation intact, new rows unseen
    assert read_manifest(spark, out, schema).count() == 40
    # abort path cleans the torn parts up
    w.abort([msg])
    assert read_manifest(spark, out, schema).count() == 40
    assert manifest_sink._current_generation(out) == 0


def test_manifest_stream_writer_batches_commit_atomically(spark, sf_dir,
                                                          tmp_path):
    """DataSourceStreamWriter: the event stream drains into the
    manifest sink with one atomic manifest per micro-batch; the
    manifest-scoped read returns exactly the batch rows (no dups, no
    orphans), and a planted torn part file stays invisible."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from rag_vector_database_spark.sources.manifest_sink import (
        read_manifest, register_manifest_sink)
    from rag_vector_database_spark.streaming import events as se

    register_manifest_sink(spark)
    out = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "ckpt")
    stream = (se.read_events_stream(spark, sf_dir)
              .select("event_id", "user_id"))
    q = (stream.writeStream.format("manifest_jsonl")
         .option("path", out).option("checkpointLocation", ckpt)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()

    with open(f"{out}/part-orphan.jsonl", "w") as f:
        f.write('{"event_id": -1, "user_id": -1}\n')

    schema = StructType([StructField("event_id", LongType()),
                         StructField("user_id", LongType())])
    back = read_manifest(spark, out, schema)
    want = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert back.count() == want
    assert back.where(F.col("event_id") == -1).count() == 0
    assert back.select("event_id").distinct().count() == want


def test_pdf_kernel_with_real_pymupdf(spark, tmp_path):
    """Smoke for the REAL PyMuPDF branch (the fake-fitz tests pin the
    contract; this lights up automatically wherever PyMuPDF exists —
    skipped where it doesn't)."""
    fitz = pytest.importorskip("fitz")

    from rag_vector_database_spark.sources import readers

    doc = fitz.open()
    page = doc.new_page()
    page.insert_text((72, 72), "hello spark")
    doc.set_metadata({"title": "smoke-doc"})
    pdf_bytes = doc.tobytes()
    doc.close()

    text, n_pages, title = readers.pdf_extract_kernel(fitz, pdf_bytes)
    assert "hello spark" in text and n_pages == 1 and title == "smoke-doc"

    # end-to-end: binaryFile scan -> mapInPandas with executor-side
    # import fitz succeeding -> real text out
    (tmp_path / "a.pdf").write_bytes(pdf_bytes)
    df = readers.read_binaries(spark, str(tmp_path))
    [row] = readers.extract_pdf_text(df).collect()
    assert "hello spark" in row["text"]
    assert row["n_pages"] == 1 and row["pdf_title"] == "smoke-doc"


def test_manifest_vacuum_generations(spark, tmp_path):
    """VACUUM contract: dropping all but the newest generation leaves
    current reads untouched, makes time travel to the vacuumed
    generation read empty, removes the dropped manifests AND their
    part files (manifests first — no manifest can reference a missing
    file mid-vacuum), and leaves orphans alone unless asked."""
    import glob

    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from rag_vector_database_spark.sources.manifest_sink import (
        read_manifest, register_manifest_sink, vacuum_generations)

    register_manifest_sink(spark)
    out = str(tmp_path / "vac_sink")
    schema = StructType([StructField("doc_id", LongType())])

    def write(lo, hi, mode):
        spark.range(lo, hi).select(F.col("id").alias("doc_id")) \
            .write.format("manifest_jsonl").option("path", out) \
            .mode(mode).save()

    write(0, 100, "append")      # gen 0
    write(0, 50, "overwrite")    # gen 1
    write(50, 60, "append")      # gen 1 (second manifest)
    write(0, 7, "overwrite")     # gen 2
    assert read_manifest(spark, out, schema).count() == 7
    assert read_manifest(spark, out, schema, generation=1).count() == 60

    # an orphan from a torn job
    with open(f"{out}/part-orphanvac.jsonl", "w") as f:
        f.write('{"doc_id": 123456}\n')

    res = vacuum_generations(out, keep_last=1)
    assert res["kept_generations"] == [2]
    assert res["manifests_removed"] == 3  # gen 0 x1 + gen 1 x2
    assert res["parts_removed"] > 0
    assert res["orphans_removed"] == 0
    # current generation unchanged; vacuumed one reads empty
    assert read_manifest(spark, out, schema).count() == 7
    assert read_manifest(spark, out, schema, generation=1).count() == 0
    assert read_manifest(spark, out, schema, generation=0).count() == 0
    # only gen-2 manifests remain on disk
    import json as _json
    gens_left = [_json.load(open(p)).get("generation", 0)
                 for p in glob.glob(f"{out}/_manifest*.json")]
    assert gens_left and set(gens_left) == {2}
    # orphan untouched without the flag; removed with it
    assert glob.glob(f"{out}/part-orphanvac.jsonl")
    res2 = vacuum_generations(out, keep_last=1, remove_orphans=True)
    assert res2["orphans_removed"] >= 1
    assert not glob.glob(f"{out}/part-orphanvac.jsonl")
    assert read_manifest(spark, out, schema).count() == 7


def test_manifest_vacuum_reaps_abandoned_claims(spark, tmp_path):
    """A .gen-N.claim from a writer that crashed before publishing its
    manifest is reaped by vacuum once a LATER manifest exists (N <=
    current gen, no manifest at N) — so abandoned claims stop burning
    a generation number on every subsequent overwrite. A claim ABOVE
    the current generation (a possibly in-flight writer) survives."""
    import os

    from pyspark.sql import functions as F

    from rag_vector_database_spark.sources.manifest_sink import (
        _current_generation, register_manifest_sink, vacuum_generations)

    register_manifest_sink(spark)
    out = str(tmp_path / "claim_sink")
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    df.write.format("manifest_jsonl").option("path", out) \
        .mode("overwrite").save()   # gen 1
    # crashed writer: claimed gen 2, never published
    open(os.path.join(out, ".gen-2.claim"), "w").close()
    df.write.format("manifest_jsonl").option("path", out) \
        .mode("overwrite").save()   # skips 2, lands on gen 3
    assert _current_generation(out) == 3
    # an in-flight claim above the current gen must survive vacuum
    open(os.path.join(out, ".gen-4.claim"), "w").close()
    vacuum_generations(out, keep_last=1)
    assert not os.path.exists(os.path.join(out, ".gen-2.claim"))
    assert os.path.exists(os.path.join(out, ".gen-4.claim"))
    # once the in-flight claim is released, the next overwrite no
    # longer burns a number: it lands on gen 4 directly
    os.remove(os.path.join(out, ".gen-4.claim"))
    df.write.format("manifest_jsonl").option("path", out) \
        .mode("overwrite").save()
    assert _current_generation(out) == 4


def test_manifest_concurrent_overwrites_get_distinct_generations(tmp_path):
    """Two overwrite jobs committing concurrently must serialize into
    DISTINCT generations (the O_EXCL claim), so readers never union
    two unrelated jobs' files at one generation."""
    from rag_vector_database_spark.sources.manifest_sink import (
        ManifestJsonlWriter, PartFileCommit, _current_generation)
    from pyspark.sql.types import LongType, StructField, StructType

    out = str(tmp_path / "race_sink")
    schema = StructType([StructField("doc_id", LongType())])
    w1 = ManifestJsonlWriter({"path": out}, schema, overwrite=True)
    w2 = ManifestJsonlWriter({"path": out}, schema, overwrite=True)
    m1 = w1.write(iter([(1,), (2,)]))
    m2 = w2.write(iter([(3,)]))
    # both jobs' tasks done; commits race — whatever the interleaving,
    # the claimed generations must differ
    w1.commit([m1])
    w2.commit([m2])
    import glob as g
    import json as j
    gens = sorted(j.load(open(p))["generation"]
                  for p in g.glob(f"{out}/_manifest*.json"))
    assert len(gens) == 2 and gens[0] != gens[1]
    assert _current_generation(out) == max(gens)


def test_read_manifest_tolerates_torn_manifest_file(spark, tmp_path):
    """A stray/truncated _manifest*.json (foreign tooling, partial
    copy) must not take down readers of an otherwise healthy table —
    same tolerance _current_generation already has."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from rag_vector_database_spark.sources.manifest_sink import (
        read_manifest, register_manifest_sink)

    register_manifest_sink(spark)
    out = str(tmp_path / "torn_sink")
    spark.range(0, 5).select(F.col("id").alias("doc_id")) \
        .write.format("manifest_jsonl").option("path", out) \
        .mode("append").save()
    with open(f"{out}/_manifest-torn.json", "w") as f:
        f.write('{"generation": 1, "files": [')  # truncated
    schema = StructType([StructField("doc_id", LongType())])
    assert read_manifest(spark, out, schema).count() == 5


def test_vacuum_keep_last_zero_rejected(tmp_path):
    import pytest

    from rag_vector_database_spark.sources.manifest_sink import (
        vacuum_generations)
    with pytest.raises(ValueError, match="keep_last"):
        vacuum_generations(str(tmp_path), keep_last=0)


def test_unreadable_manifest_aborts_instead_of_misclassifying(
        spark, tmp_path):
    """A manifest that cannot be OPENED (simulated by a directory
    squatting on a manifest name — IsADirectoryError is an OSError)
    must abort vacuum and reads, never be skipped as 'torn': skipping
    would classify a live generation's parts as orphans."""
    import os

    import pytest
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    from rag_vector_database_spark.sources.manifest_sink import (
        read_manifest, register_manifest_sink, vacuum_generations)

    register_manifest_sink(spark)
    out = str(tmp_path / "unreadable_sink")
    spark.range(0, 5).select(F.col("id").alias("doc_id")) \
        .write.format("manifest_jsonl").option("path", out) \
        .mode("append").save()
    os.mkdir(f"{out}/_manifest-squatter.json")
    schema = StructType([StructField("doc_id", LongType())])
    with pytest.raises(OSError):
        vacuum_generations(out, keep_last=1, remove_orphans=True)
    with pytest.raises(OSError):
        read_manifest(spark, out, schema)
    # no part file was deleted by the aborted vacuum
    import glob
    assert glob.glob(f"{out}/part-*.jsonl")

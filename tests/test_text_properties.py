"""Property-based tests (hypothesis) for the sanitizer/extractor
regexes — SURVEY.md section 5.5: verify the documented edge cases of
scrape_youtube_metadata.py:56-96 and download_ia_collection.py:25-36
against a Python reference implementation, over generated inputs.

Inputs run through Spark in ONE batch per property (a createDataFrame
round-trip per example would take minutes), so hypothesis drives the
generator and the assertion compares full result lists.
"""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from rag_vector_database_spark.functions import text as T

MAX_LEN = 200


def py_sanitize(s: str) -> str:
    """The reference's sanitizer contract in plain Python."""
    cleaned = re.sub(r'[\\/*?:"<>|]', "", s)
    collapsed = re.sub(r"\s+", " ", cleaned).strip()
    return collapsed[:MAX_LEN]


# Full printable-ASCII + control range, PLUS the Unicode whitespace
# Python's \s matches but Java's does not (\x1c-\x1f, NEL, NBSP, space
# separators) — sanitize_filename covers them via text.PY_WS_CLASS so
# both engines agree on the reference's re.sub(r'\s+')/strip contract.
names = st.text(
    alphabet=st.one_of(
        st.characters(min_codepoint=0x09, max_codepoint=0x7E),
        st.sampled_from("\x1c\x1d\x1e\x1f\x85\xa0   　")),
    max_size=300)


@settings(max_examples=30, deadline=None)
@given(st.lists(names, min_size=1, max_size=40))
def test_sanitize_filename_matches_python(spark, samples):
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    got = [r["o"] for r in
           df.select(T.sanitize_filename(F.col("s")).alias("o"))
           .collect()]
    assert got == [py_sanitize(s) for s in samples]


def test_sanitize_filename_invariants(spark):
    cases = ['a/b\\c*d?e:f"g<h>i|j', '  lots   of\tspace ',
             '@Channel Name', 'x' * 500, '', '///***???']
    df = spark.createDataFrame([(s,) for s in cases], "s string")
    out = [r["o"] for r in
           df.select(T.sanitize_filename(F.col("s")).alias("o")).collect()]
    for o in out:
        assert len(o) <= MAX_LEN
        assert not re.search(r'[\\/*?:"<>|]', o)
        assert "  " not in o and o == o.strip()
    # @-prefix preserved (scrape_youtube_metadata.py:69-73 keeps handles)
    assert out[2] == "@Channel Name"


@settings(max_examples=30, deadline=None)
@given(st.lists(
    st.from_regex(r"[A-Za-z0-9_\-]{1,20}", fullmatch=True),
    min_size=1, max_size=40))
def test_collection_id_extraction_roundtrip(spark, ids):
    """regexp_extract('/details/([^/]+)') recovers the collection id
    from any archive.org details URL built around it."""
    urls = [f"https://archive.org/details/{i}" for i in ids]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r["c"] for r in
           df.select(F.regexp_extract("u", r"/details/([^/]+)", 1)
                     .alias("c")).collect()]
    assert got == ids


SUFFIXES = {"videos", "featured", "community", "about", "streams",
            "shorts", "playlists"}


def py_channel_name(url: str) -> str | None:
    """The reference's get_channel_name chain
    (scrape_youtube_metadata.py:75-96), minus the final sanitize."""
    for p in (r"youtube\.com/(@[^/?#]+)", r"youtube\.com/c/([^/?#]+)",
              r"youtube\.com/user/([^/?#]+)", r"youtube\.com/channel/([^/?#]+)"):
        m = re.search(p, url)
        if m:
            return m.group(1)
    path = re.sub(r"^https?://[^/]*", "", url)
    path = re.sub(r"[?#].*", "", path).strip("/")
    parts = path.split("/")
    last = parts[-1]
    if last.lower() not in SUFFIXES and last:
        return last
    if len(parts) > 1 and parts[-2]:
        return parts[-2]
    return parts[0] or None


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(
    st.from_regex(r"[A-Za-z0-9_\-.]{1,15}", fullmatch=True),
    st.sampled_from(["@{n}/videos", "channel/UC{n}", "c/{n}?tab=x",
                     "user/{n}#about", "{n}/videos", "{n}/streams",
                     "watch", "{n}", "playlists"])),
    min_size=1, max_size=40))
def test_channel_name_matches_python(spark, cases):
    urls = [f"https://www.youtube.com/{shape.format(n=name)}"
            for name, shape in cases]
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    got = [r["c"] for r in
           df.select(T.channel_name(F.col("u")).alias("c")).collect()]
    assert got == [py_channel_name(u) for u in urls]

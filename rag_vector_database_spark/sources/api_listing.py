"""Paginated listing-API source as a Spark 4 Python DataSource.

The reference's YouTube channel-listing step (SURVEY section 2 #6,
scrape_youtube_metadata.py: page through an uploads playlist with a
pageToken cursor) was classed "out-of-engine" in round 1 because a
sequential cursor loop has no relational shape. The Python DataSource
API gives it one: each PAGE is an InputPartition, so executors fetch
pages in parallel and the listing becomes an ordinary DataFrame scan —
filters/projections compose on top, and `spark.read.format(...)`
replaces the driver-side requests loop.

The actual HTTP fetch is stubbed with a deterministic generator (this
container has no network, same policy as the PDF/PIL kernels): item
``i`` derives every field from md5(str(i)), so a SQL engine can
replay the exact rows — which is what the registry oracle does. The
partition/schema/iterator plumbing is the real, production shape; a
real fetcher only replaces ``_fetch_page``'s body (one request per
partition, retry/backoff local to the executor).
"""

from __future__ import annotations

import hashlib
import sys
from typing import Iterator

from pyspark.sql.datasource import (DataSource, DataSourceReader,
                                    InputPartition,
                                    SimpleDataSourceStreamReader)

PAGE_SIZE_DEFAULT = 50
N_ITEMS_DEFAULT = 500


def _fetch_page(page: int, page_size: int, n_items: int) -> Iterator[tuple]:
    """Deterministic stand-in for one listing-API page request.
    video_id mimics the 11-char YouTube id shape; duration and the
    publish offset come from the 32-bit md5 prefix so DuckDB can
    reproduce them with the same arithmetic."""
    lo = page * page_size
    hi = min(lo + page_size, n_items)
    for i in range(lo, hi):
        h = hashlib.md5(str(i).encode()).hexdigest()
        h32 = int(h[:8], 16)
        yield (i, h[:11], f"video {i}", h32 % 3600,
               f"2024-{1 + (h32 % 12):02d}-{1 + (h32 % 28):02d}")


class ApiListingReader(DataSourceReader):
    def __init__(self, options: dict):
        self.page_size = int(options.get("page_size", PAGE_SIZE_DEFAULT))
        self.n_items = int(options.get("n_items", N_ITEMS_DEFAULT))

    def partitions(self):
        n_pages = -(-self.n_items // self.page_size)
        return [InputPartition(p) for p in range(n_pages)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        return _fetch_page(partition.value, self.page_size, self.n_items)


class ApiListingStreamReader(SimpleDataSourceStreamReader):
    """The same paginated listing as a STREAMING source: the offset is
    the item cursor, one page per micro-batch — the incremental
    "poll the channel for new uploads" discipline (#59) with the
    checkpoint as the cursor store. ``read`` advances the cursor;
    ``readBetweenOffsets`` replays a committed range deterministically
    on recovery (exactly the replayability contract the API asks for,
    trivially satisfied because pages are derived from the cursor)."""

    def __init__(self, options: dict):
        self.page_size = int(options.get("page_size", PAGE_SIZE_DEFAULT))
        self.n_items = int(options.get("n_items", N_ITEMS_DEFAULT))

    def initialOffset(self) -> dict:
        return {"item": 0}

    def read(self, start: dict):
        lo = int(start["item"])
        # clamp so the cursor never regresses: if a restart lowers
        # n_items below a checkpointed offset, emitting hi < lo would
        # move the committed offset backward and re-emit [hi, lo) as
        # duplicates once n_items grows again
        hi = max(lo, min(lo + self.page_size, self.n_items))
        # slice strictly to [lo, hi): a checkpointed offset needn't be
        # aligned to THIS run's page_size (the option can change across
        # restarts), and returning the whole containing page would
        # duplicate rows below lo and skip rows above it
        rows = [] if hi <= lo else list(
            self.readBetweenOffsets({"item": lo}, {"item": hi}))
        return iter(rows), {"item": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        lo, hi = int(start["item"]), int(end["item"])
        for page in range(lo // self.page_size,
                          -(-hi // self.page_size)):
            for row in _fetch_page(page, self.page_size, self.n_items):
                if lo <= row[0] < hi:
                    yield row


class ApiListingDataSource(DataSource):
    """spark.read.format("api_listing").option("n_items", N) source —
    batch scan and streaming cursor over the SAME deterministic feed,
    so stream results are oracle-checkable against the batch SQL."""

    @classmethod
    def name(cls) -> str:
        return "api_listing"

    def schema(self) -> str:
        return ("seq bigint, video_id string, title string, "
                "duration_s bigint, published string")

    def reader(self, schema) -> ApiListingReader:
        return ApiListingReader(self.options)

    def simpleStreamReader(self, schema) -> ApiListingStreamReader:
        return ApiListingStreamReader(self.options)


def register_api_listing(spark) -> None:
    """Idempotent registration of the DataSource with a session.

    The DataSource class is shipped to Python workers by pickle; by
    default cloudpickle serializes it by REFERENCE, which breaks when
    the consuming driver put this repo on sys.path at runtime (the
    worker can't import the package). Register the module for
    pickle-by-value so the class travels with the plan. Spark pickles
    with its vendored cloudpickle, so register there."""
    from pyspark import cloudpickle
    cloudpickle.register_pickle_by_value(sys.modules[__name__])
    spark.dataSource.register(ApiListingDataSource)

"""Paginated-API source as a first-class Spark Python DataSource
(SURVEY.md §2.1 S1 — the reference's driver-side pagination loop,
``lambda_function.py:24-54``, promoted to ``spark.read.format(...)``).

Spark 4's Python DataSource API puts the fetch on EXECUTORS with one
input partition per page range: a 10 000-page backfill becomes a
parallel scan instead of a serial driver loop, and Catalyst sees an
ordinary relation (limits and column pruning compose on top). The
reference's stopping semantics (page size 100, cap 500) live in
``pipeline.ingest.paginate`` for the driver-side form; here the page
space is declared up front (``n_pages`` option) the way a warehouse
backfill enumerates its date range.

The fetcher below is deterministic and in-process (no network in this
container) — a requests-backed ``_fetch_page`` drops into the same
seam. Registered under the short name ``paginated_opportunities``.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

PAGE_SIZE = 100  # lambda_function.py:12


def _fetch_page(page_id: int, page_size: int = PAGE_SIZE) -> list[tuple]:
    """Deterministic synthetic page (stands in for the HTTPS GET at
    lambda_function.py:40): rows keyed by global offset."""
    base = page_id * page_size
    return [
        (
            f"N-{base + i:08d}",
            f"Opportunity {base + i}",
            ["Veteran-Owned Small Business Set-Aside", "8(a) Set-Aside", None][
                (base + i) % 3
            ],
            f"2026-08-{(base + i) % 28 + 1:02d}",
        )
        for i in range(page_size)
    ]


class _PagePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class PaginatedReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_pages = int(options.get("n_pages", "5"))
        self.pages_per_task = int(options.get("pages_per_task", "2"))

    def partitions(self):
        return [
            _PagePartition(s, min(s + self.pages_per_task, self.n_pages))
            for s in range(0, self.n_pages, self.pages_per_task)
        ]

    def read(self, partition: _PagePartition) -> Iterator[tuple]:
        for page_id in range(partition.start, partition.end):
            yield from _fetch_page(page_id)


class PaginatedApiDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "paginated_opportunities"

    def schema(self) -> str:
        return (
            "noticeId string, title string, "
            "typeOfSetAsideDescription string, postedDate string"
        )

    def reader(self, schema) -> PaginatedReader:
        return PaginatedReader(self.options)

    def simpleStreamReader(self, schema) -> "PaginatedStreamReader":
        return PaginatedStreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(PaginatedApiDataSource)


class PaginatedStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the paginated source: each micro-batch reads
    the pages that 'arrived' since the last offset — the reference's
    daily EventBridge re-poll (README.md:15,28) as a real incremental
    stream with exactly-once page accounting via offsets. ``max_pages``
    bounds the synthetic feed so tests terminate; a live API feed
    would return an unchanged offset when no new page exists."""

    def __init__(self, options: dict):
        self.max_pages = int(options.get("max_pages", "6"))
        self.pages_per_batch = int(options.get("pages_per_batch", "2"))

    def initialOffset(self) -> dict:
        return {"page": 0}

    def read(self, start: dict):
        first = start["page"]
        last = min(first + self.pages_per_batch, self.max_pages)
        rows = [r for p in range(first, last) for r in _fetch_page(p)]
        return iter(rows), {"page": last}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            [r for p in range(start["page"], end["page"]) for r in _fetch_page(p)]
        )

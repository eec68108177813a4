"""Pagination-source semantics (SURVEY.md §2.1 S1): cap, short-page
stop, error stop — the reference's loop behaviors as pure logic, plus
the executor-side parallel fetch plan."""

from __future__ import annotations

from etl_pipeline_sam_gov_spark.pipeline.ingest import (
    ingest_rows,
    paginate,
    parallel_fetch_plan,
)


def fake_pages(total: int, page_size: int = 100):
    def fetch(offset: int):
        rows = [
            {"noticeId": str(i), "title": f"t{i}"}
            for i in range(offset, min(offset + page_size, total))
        ]
        return 200, rows

    return fetch


def test_short_page_stops():
    rows = paginate(fake_pages(250))
    assert len(rows) == 250
    assert rows[-1]["noticeId"] == "249"


def test_cap_truncates_to_max_records():
    rows = paginate(fake_pages(10_000))
    assert len(rows) == 500  # lambda_function.py:13,49,54 semantics
    assert rows[-1]["noticeId"] == "499"


def test_exact_page_boundary():
    # 500 rows in 5 full pages: cap reached exactly, no 6th fetch needed
    calls = []
    base = fake_pages(10_000)

    def counting(offset):
        calls.append(offset)
        return base(offset)

    rows = paginate(counting)
    assert len(rows) == 500
    assert calls == [0, 100, 200, 300, 400]


def test_error_status_stops():
    def fetch(offset):
        if offset >= 200:
            return 503, []
        return fake_pages(10_000)(offset)

    rows = paginate(fetch)
    assert len(rows) == 200  # keeps what arrived before the failure


def test_ingest_rows_explicit_schema(spark):
    df = ingest_rows(spark, [{"noticeId": "1", "officeAddress": {"city": "X"}}])
    row = df.collect()[0]
    assert row["noticeId"] == "1"
    assert row["officeAddress"]["city"] == "X"
    assert row["officeAddress"]["state"] is None
    assert row["title"] is None  # absent key → NULL under declared schema


def test_parallel_fetch_plan_runs_on_executors(spark):
    def page_fetcher(page_id: int):
        return [
            {"noticeId": str(page_id * 10 + i), "title": f"p{page_id}"}
            for i in range(10)
        ]

    df = parallel_fetch_plan(spark, n_pages=8, page_fetcher=page_fetcher)
    rows = df.collect()
    assert len(rows) == 80
    assert {r["title"] for r in rows} == {f"p{i}" for i in range(8)}


def test_corrupt_json_rows_are_quarantined_not_fatal(spark, tmp_path):
    """PERMISSIVE JSON ingest: malformed rows land in _corrupt_record
    instead of failing the job — the ingest-robustness contract a
    landing-zone reader needs (the reference would crash on a null
    field, SURVEY.md §1.4; the engine quarantines instead)."""
    import json

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    p = tmp_path / "landing.json"
    rows = [json.dumps({"id": 1, "v": "ok"}), "{not json at all", json.dumps({"id": 3, "v": "also ok"})]
    p.write_text("\n".join(rows))
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("v", T.StringType()),
            T.StructField("_corrupt_record", T.StringType()),
        ]
    )
    df = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(p))
        .cache()  # SPARK-21610: corrupt-record column needs a materialized scan
    )
    good = df.filter(F.col("_corrupt_record").isNull())
    bad = df.filter(F.col("_corrupt_record").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "{not json" in bad.collect()[0]["_corrupt_record"]
    df.unpersist()


# ---------------------------------------------------------------------------
# Live-HTTP lane through the DataSource seam (round-5, VERDICT r04 #8):
# a local http.server stands in for the paginated API so the
# timeout/non-200/short-page/retry semantics of lambda_function.py:40-54
# are exercised end-to-end with zero external network. The server runs
# in a daemon thread; Spark's local-mode Python workers reach it over
# loopback.
# ---------------------------------------------------------------------------

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import pytest

N_LIVE_ROWS = 230  # 2 full pages of 100 + one short page of 30


def _live_rows(offset: int, limit: int) -> list[dict]:
    return [
        {
            "noticeId": f"L-{i:08d}",
            "title": f"Live {i}",
            "typeOfSetAsideDescription": None if i % 3 else "8(a) Set-Aside",
            "postedDate": f"2026-08-{i % 28 + 1:02d}",
        }
        for i in range(offset, min(offset + limit, N_LIVE_ROWS))
    ]


class _ApiHandler(BaseHTTPRequestHandler):
    flaky_hits: dict[str, int] = {}

    def do_GET(self):  # noqa: N802 — BaseHTTPRequestHandler API
        u = urlparse(self.path)
        q = parse_qs(u.query)
        offset = int(q.get("offset", ["0"])[0])
        limit = int(q.get("limit", ["100"])[0])
        if u.path == "/notfound":
            self.send_error(404)
            return
        if u.path == "/flaky":
            key = str(offset)
            n = _ApiHandler.flaky_hits.get(key, 0)
            _ApiHandler.flaky_hits[key] = n + 1
            if n < 2:  # fail twice per offset, then serve
                self.send_error(503)
                return
        body = json.dumps(
            {"opportunitiesData": _live_rows(offset, limit)}
        ).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # keep pytest output clean
        pass


@pytest.fixture(scope="module")
def api_url():
    srv = ThreadingHTTPServer(("127.0.0.1", 0), _ApiHandler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _read_live(spark, url: str, **opts) -> list:
    from etl_pipeline_sam_gov_spark.sources.paginated import register

    register(spark)
    r = spark.read.format("paginated_opportunities").option("base_url", url)
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load().collect()


def test_live_lane_short_page_stops(spark, api_url):
    """n_pages far exceeds the feed; the short page (30 rows) must stop
    the scan exactly at the feed size — the lambda_function.py:52
    len(results) < LIMIT break, observed through a real GET."""
    rows = _read_live(spark, f"{api_url}/data", n_pages=10, pages_per_task=10)
    assert len(rows) == N_LIVE_ROWS
    assert sorted(r.noticeId for r in rows)[0] == "L-00000000"


def test_live_lane_non_200_stops_without_error(spark, api_url):
    """404 ⇒ the reference logs and breaks (lambda_function.py:42-44);
    the scan returns the rows fetched so far — zero here — not a
    raised exception."""
    rows = _read_live(spark, f"{api_url}/notfound", n_pages=3)
    assert rows == []


def test_live_lane_retries_transient_5xx(spark, api_url):
    """Each offset 503s twice before serving; with the bounded-retry
    lane (2 retries) every page must eventually land and the full feed
    arrive exactly once."""
    _ApiHandler.flaky_hits.clear()
    rows = _read_live(
        spark,
        f"{api_url}/flaky",
        n_pages=10,
        pages_per_task=10,
        http_max_retries=2,
        http_backoff_s=0.01,
    )
    assert len(rows) == N_LIVE_ROWS
    assert len({r.noticeId for r in rows}) == N_LIVE_ROWS


def test_live_lane_exhausted_retries_break_not_raise(spark, api_url):
    """With retries below the flake depth the 503 exhausts the retry
    budget and the lane must degrade to the reference's break-and-keep
    semantics (empty scan), never a task failure."""
    _ApiHandler.flaky_hits.clear()
    rows = _read_live(
        spark,
        f"{api_url}/flaky",
        n_pages=2,
        pages_per_task=2,
        http_max_retries=0,
        http_backoff_s=0.01,
    )
    assert rows == []

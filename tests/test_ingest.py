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

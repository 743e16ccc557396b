"""Sources & sinks: S1 JSON dir (corrupt policy), S2 lines, S3/S4
paginated REST (mock fetchers), S5 SSE transcript replay, K1/K2 delim
sinks, K4 per-record text sink."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from yodel_etl_spark.io.delim import sanitize_strings, write_tsv
from yodel_etl_spark.io.json_dir import read_json_dir, split_corrupt
from yodel_etl_spark.io.rest import fetch_fanout, fetch_paginated, typed
from yodel_etl_spark.io.sse import parse_events, final_answers
from yodel_etl_spark.io.text import read_lines, write_text_per_record
from yodel_etl_spark.pipelines.chat_qa import SESSION_SCHEMA, extract_chat_qa


# ------------------------------------------------------------------ S1
def test_json_dir_object_or_array_and_corrupt(spark, tmp_path):
    d = tmp_path / "parks"
    d.mkdir()
    (d / "one.json").write_text(json.dumps({"name": "Alpha", "state": "CA"}))
    (d / "many.json").write_text(json.dumps([{"name": "Beta"}, {"name": "Gamma", "state": "OR"}]))
    (d / "bad.json").write_text("{not json at all")
    df = read_json_dir(spark, str(d))
    good, bad = split_corrupt(df)
    names = sorted(r["name"] for r in good.collect())
    assert names == ["Alpha", "Beta", "Gamma"]
    assert bad.count() == 1  # log-and-skip, never fatal


def test_json_dir_explicit_schema(spark, tmp_path):
    from pyspark.sql import types as T

    d = tmp_path / "j"
    d.mkdir()
    (d / "a.json").write_text('{"name": "X", "extra": 1}')
    schema = T.StructType([T.StructField("name", T.StringType())])
    good, bad = split_corrupt(read_json_dir(spark, str(d), schema=schema))
    assert good.columns == ["name"]
    assert good.collect()[0]["name"] == "X"


# ------------------------------------------------------------------ S2
def test_read_lines_strips_blanks(spark, tmp_path):
    p = tmp_path / "questions.txt"
    p.write_text("  first question \n\n   \nsecond\n")
    rows = read_lines(spark, str(p)).collect()
    assert [r["question"] for r in rows] == ["first question", "second"]


# --------------------------------------------------------------- S3/S4
def _make_chats_page():
    # closure → cloudpickle serializes by VALUE (a module-level test
    # function would pickle by reference and fail on executors)
    def chats_page(page: int) -> list[dict]:
        if page > 3:
            return []
        return [{"id": f"chat{page}-{i}", "name": f"Chat {page}.{i}"} for i in range(2)]

    return chats_page


def _make_sessions_page():
    def sessions_page(chat_id: str, page: int) -> list[dict]:
        if page > 1:
            return []
        return [
            {
                "id": f"{chat_id}-s{page}",
                "name": "sess",
                "messages": [
                    {"role": "assistant", "content": "Hi! How can I help?"},
                    {"role": "user", "content": f"question for {chat_id}\twith tab"},
                    {"role": "assistant", "content": "part one."},
                    {"role": "assistant", "content": "part two."},
                    {"role": "user", "content": "follow-up"},
                ],
            }
        ]

    return sessions_page


def test_fetch_paginated_budget_and_failsoft(spark):
    chats_page = _make_chats_page()

    def flaky(page: int) -> list[dict]:
        if page == 2:
            raise RuntimeError("boom")
        return chats_page(page)

    df = fetch_paginated(spark, flaky, max_pages=10)
    rows = df.collect()
    # pages 1,3 yield 2 records each; page 2 fails soft into exactly one
    # marker row (record NULL, error set); pages 4-10 empty
    assert len(rows) == 5
    assert {r["page"] for r in rows} == {1, 2, 3}
    err_rows = [r for r in rows if r["error"] is not None]
    assert len(err_rows) == 1
    assert err_rows[0]["page"] == 2 and err_rows[0]["record"] is None
    assert "boom" in err_rows[0]["error"]
    assert all(r["error"] is None for r in rows if r["record"] is not None)


def test_fetch_fanout_grid(spark):
    parents = spark.createDataFrame([Row(chat_id="c1"), Row(chat_id="c2")])
    df = typed(fetch_fanout(parents, "chat_id", _make_sessions_page(), 3), SESSION_SCHEMA)
    rows = df.collect()
    assert {r["parent_id"] for r in rows} == {"c1", "c2"}
    assert all(len(r["messages"]) == 5 for r in rows)


def test_fetch_paginated_all_stops_at_first_empty_page(spark):
    """Reference termination contract: fetch-until-empty with no page
    budget; pages past the first empty page are never emitted."""
    from yodel_etl_spark.io.rest import fetch_paginated_all

    def pages(page: int) -> list[dict]:
        # pages 1-5 full, 6 empty, 7-20 would have data again (hole):
        # the reference's sequential loop never sees past the hole
        if page == 6 or page > 20:
            return []
        return [{"id": f"p{page}"}]

    df = fetch_paginated_all(spark, pages, round_size=4)
    got = sorted({r["page"] for r in df.collect()})
    # rows past the hole (7, 8 in the stopping round) are trimmed
    assert got == [1, 2, 3, 4, 5]


def test_fetch_paginated_all_single_round(spark):
    from yodel_etl_spark.io.rest import fetch_paginated_all

    df = fetch_paginated_all(spark, _make_chats_page(), round_size=10)
    # chats mock: pages 1-3 have 2 records each, 4+ empty
    assert df.count() == 6


def test_fetch_fanout_failsoft_error_rows(spark):
    sessions_page = _make_sessions_page()

    def flaky(parent_id: str, page: int) -> list[dict]:
        if parent_id == "c2":
            raise ValueError("upstream 500")
        return sessions_page(parent_id, page)

    parents = spark.createDataFrame([Row(chat_id="c1"), Row(chat_id="c2")])
    raw = fetch_fanout(parents, "chat_id", flaky, 2)
    err = raw.where("error IS NOT NULL").collect()
    # one marker row per failed (parent, page) grid cell, record NULL
    assert {(r["parent_id"], r["page"]) for r in err} == {("c2", 1), ("c2", 2)}
    assert all(r["record"] is None and "upstream 500" in r["error"] for r in err)
    ok = raw.where("record IS NOT NULL").collect()
    assert all(r["parent_id"] == "c1" and r["error"] is None for r in ok)


def test_extract_chat_qa_end_to_end(spark, tmp_path):
    out = extract_chat_qa(
        spark,
        _make_chats_page(),
        _make_sessions_page(),
        max_pages=5,
        max_session_pages_per_chat=2,
        output_path=str(tmp_path / "qa_tsv"),
    )
    rows = {r["chat_id"]: r for r in out.collect()}
    assert len(rows) == 6  # 3 pages × 2 chats, 1 session each
    r = rows["chat1-0"]
    # greeting dropped, first user question found, tab sanitized (P8)
    assert r["user_question"] == "question for chat1-0 with tab"
    # contiguous assistant concat stops at next user message (W3)
    assert r["assistant_response"] == "part one. part two."
    # TSV sink wrote header files
    files = [f for f in os.listdir(tmp_path / "qa_tsv") if f.endswith(".csv")]
    assert files


# ------------------------------------------------------------------ S5
SSE_TRANSCRIPT = [
    # (stream_id, seq, raw)
    ("s1", 1, "event: ping"),
    ("s1", 2, 'data: {"code": 0, "message": "", "data": {"answer": "partial", "session_id": "sid1"}}'),
    ("s1", 3, "data: not json {{{"),
    ("s1", 4, 'data: {"code": 1, "message": "err", "data": {"answer": "SKIP ME"}}'),
    (
        "s1",
        5,
        'data: {"code": 0, "message": "", "data": {"answer": "final answer", "session_id": "sid1", '
        '"reference": {"total": 2, "chunks": [{"id": "c1", "document_name": "d.pdf", "content": "x", '
        '"similarity": 0.9, "vector_similarity": 0.8, "term_similarity": 0.7}]}}}',
    ),
    ("s1", 6, "data: true"),
    ("s1", 7, "data: [DONE]"),
    ("s2", 1, "data: null"),
    ("s2", 2, 'data: {"code": 0, "message": "", "data": {"answer": "s2 answer", "session_id": "sid2"}}'),
]


def test_sse_parse_and_last_wins(spark):
    lines = spark.createDataFrame(SSE_TRANSCRIPT, "stream_id string, seq int, raw string")
    events = parse_events(lines)
    got = events.collect()
    # s1: rows 2 and 5 survive (3 malformed, 4 code!=0, 6 bool, 7 sentinel)
    assert sorted((r["stream_id"], r["answer"]) for r in got) == [
        ("s1", "final answer"),
        ("s1", "partial"),
        ("s2", "s2 answer"),
    ]
    final = final_answers(events, ["stream_id"], "seq")
    by_id = {r["stream_id"]: r for r in final.collect()}
    assert by_id["s1"]["answer"] == "final answer"
    assert by_id["s1"]["reference"]["total"] == 2
    assert by_id["s2"]["session_id"] == "sid2"


# -------------------------------------------------------------- K2/K4
def test_sanitize_strings_all_string_cols(spark):
    df = spark.createDataFrame([Row(a="x\ty", b=5, c=None), Row(a=" z\r\n", b=6, c="ok")])
    rows = sanitize_strings(df).collect()
    assert rows[0]["a"] == "x y" and rows[0]["b"] == 5 and rows[0]["c"] == ""
    assert rows[1]["a"] == "z"


def test_write_text_per_record(spark, tmp_path):
    df = spark.createDataFrame([Row(doc_id=1, text="hello"), Row(doc_id=2, text=None)])
    n = write_text_per_record(df, "doc_id", "text", str(tmp_path / "txt"))
    assert n == 2
    assert (tmp_path / "txt" / "1.txt").read_text() == "hello"
    assert (tmp_path / "txt" / "2.txt").read_text() == ""


def test_write_tsv_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([Row(q="a\tb", a="line1\nline2")])
    write_tsv(df, str(tmp_path / "t"))
    back = spark.read.option("header", True).option("sep", "\t").csv(str(tmp_path / "t"))
    row = back.collect()[0]
    assert row["q"] == "a b" and row["a"] == "line1 line2"


def test_python_datasource_paginated_rest(spark):
    """Spark 4 Python Data Source: page-range partitions, import-path
    fetcher resolution on executors."""
    from yodel_etl_spark.io.rest import PaginatedRestDataSource
    from yodel_etl_spark.session import ship_package

    if PaginatedRestDataSource is None:
        pytest.skip("Python Data Source API not available")
    ship_package(spark)
    try:
        spark.dataSource.register(PaginatedRestDataSource)
    except Exception as exc:  # already registered in a prior test run
        if "already" not in str(exc).lower():
            raise
    df = (
        spark.read.format("paginated_rest")
        .option("fetcher", "yodel_etl_spark.io.rest:demo_fetch_page")
        .option("maxPages", "10")
        .option("numPartitions", "4")
        .load()
    )
    rows = df.collect()
    assert len(rows) == 12  # 4 pages × 3 records
    assert {r["page"] for r in rows} == {1, 2, 3, 4}
    assert json.loads(rows[0]["record"])["id"].startswith("rec")


def test_python_datasource_fanout_rest(spark):
    """S4 as a readable format: (parent x page) grid partitions, same
    fail-soft columns as fetch_fanout, import-path fetcher resolution."""
    from yodel_etl_spark.io.rest import FanoutRestDataSource, register_rest_datasources

    if FanoutRestDataSource is None:
        pytest.skip("Python Data Source API not available")
    register_rest_datasources(spark)
    register_rest_datasources(spark)  # idempotent
    df = (
        spark.read.format("fanout_rest")
        .option("fetcher", "yodel_etl_spark.io.rest:demo_fetch_sessions")
        .option("parents", "chatA,chatB,chatC")
        .option("maxPagesPerParent", "4")
        .option("numPartitions", "4")
        .load()
    )
    rows = df.collect()
    # 3 parents x 2 non-empty pages x 2 records
    assert len(rows) == 12
    assert {r["parent_id"] for r in rows} == {"chatA", "chatB", "chatC"}
    assert all(r["error"] is None for r in rows)
    got = {json.loads(r["record"])["session"] for r in rows}
    assert "chatA-s1-0" in got and "chatC-s2-1" in got

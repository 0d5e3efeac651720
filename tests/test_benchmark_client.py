"""Unit tests for the benchmark client's on-disk contract.

The CSV schemas, row formatting, frozen question order, resume-by-skip
and striping must stay byte-compatible with the reference clients
(reference run_benchmark.py:45-58, run_benchmark_parallel.py:104) so that
downstream analysis/plotting works on either implementation's logs.
"""

import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)

from run_benchmark import (  # noqa: E402
    BENCHMARK_HEADER,
    DS_STATS_HEADER,
    LogSink,
    WorkItem,
    build_plan,
    frozen_order,
    query_url,
)

REPLY = {
    "answer": "The answer is A.",
    "metadata": {
        "llm": "llama3.1-8B-instruct",
        "data_sources": ["pubmed", "textbooks"],
        "selection_time": 0.00088793299801182,
        "embedding_time": 2.6226043701171875e-06,
        "doc_select_time": 0.009400665003340691,
        "generate_time": 0.0,
        "e2e_time": 0.015599966049194336,
        "docs_tokens": 0,
        "top_docs": ["pubmed:12", "textbooks:4"],
        "data_sources_stats": {
            "pubmed": {"duration": 0.0094, "message_size": 5598},
            "textbooks": {"duration": 0.0051, "message_size": 1234},
        },
    },
}


def test_record_golden_lines(tmp_path):
    sink = LogSink.open(str(tmp_path), "SYNTHETIC_ragroute")
    item = WorkItem(bank="synthetic", qid="syn0",
                    data={"question": "q?", "options": {"A": "x"}})
    sink.record("SYNTHETIC", item, True, REPLY)
    sink.close()

    bench_lines = open(tmp_path / "benchmark_SYNTHETIC_ragroute.csv").read()
    assert bench_lines == BENCHMARK_HEADER + (
        "SYNTHETIC,synthetic,llama3.1-8B-instruct,syn0,1,"
        "pubmed:textbooks,2,0.00088793299801182,2.6226043701171875e-06,"
        "0.009400665003340691,0.0,0.015599966049194336,0\n")

    ds_lines = open(tmp_path / "ds_stats_SYNTHETIC_ragroute.csv").read()
    assert ds_lines == DS_STATS_HEADER + (
        "SYNTHETIC,synthetic,syn0,pubmed,0.0094,5598\n"
        "SYNTHETIC,synthetic,syn0,textbooks,0.0051,1234\n")

    answers = [json.loads(l) for l in
               open(tmp_path / "answers_SYNTHETIC_ragroute.jsonl")]
    assert answers == [{"question_id": "syn0",
                        "answer": "The answer is A."}]
    top = [json.loads(l) for l in
           open(tmp_path / "top_docs_SYNTHETIC_ragroute.jsonl")]
    assert top == [{"question_id": "syn0",
                    "top_docs": ["pubmed:12", "textbooks:4"]}]


def test_resume_by_skip(tmp_path):
    """Re-opening the sink parses already-logged qids from the CSV."""
    sink = LogSink.open(str(tmp_path), "MMLU_all")
    item = WorkItem(bank="b", qid="q7", data={})
    sink.record("MMLU", item, False, REPLY)
    sink.close()

    sink2 = LogSink.open(str(tmp_path), "MMLU_all")
    assert sink2.seen_qids == {"q7"}
    sink2.close()
    # header was not duplicated on reopen
    content = open(tmp_path / "benchmark_MMLU_all.csv").read()
    assert content.count("benchmark,dataset") == 1


def test_frozen_order_and_striping(tmp_path):
    questions = {f"q{i}": {"question": str(i), "options": {}}
                 for i in range(10)}
    order1 = frozen_order(str(tmp_path), "MMLU", "bank", questions)
    # a second call reuses the persisted order even if dict order changes
    shuffled = {k: questions[k] for k in reversed(list(questions))}
    order2 = frozen_order(str(tmp_path), "MMLU", "bank", shuffled)
    assert order1 == order2

    class Args:
        benchmark = "MMLU"
        save_logs_dir = str(tmp_path)
        questions = None
        shard = 1
        num_shards = 3

    class FakeBench:
        benchmark_data = {"bank": questions}

    items = list(build_plan(FakeBench(), Args(), seen={"q4"}))
    # stripe 1 of 3 over the frozen order, minus the already-seen q4
    want = [qid for qid in order1[1::3] if qid != "q4"]
    assert [it.qid for it in items] == want


def test_query_url_contract():
    item = WorkItem(bank="b", qid="id 1",
                    data={"question": "a b&c", "options": {"A": "x"}})
    url = query_url("http://h:1", item)
    assert url.startswith("http://h:1/query?")
    from urllib.parse import parse_qs, urlparse

    qs = parse_qs(urlparse(url).query)
    assert qs["q"] == ["a b&c"]
    assert json.loads(qs["choices"][0]) == {"A": "x"}
    assert qs["qid"] == ["id 1"]

"""Host-layer tests: rerank parity, prompts, templates, answer checkers."""

import json
import os

import numpy as np
import pytest

from ragroute_tpu.benchmark import Benchmark, locate_answer, write_synthetic_benchmark
from ragroute_tpu.engine.rerank import (
    load_qrels,
    rerank_feb4rag,
    rerank_medrag,
    rerank_wikipedia,
)
from ragroute_tpu.engine.prompts import (
    generate_llm_message,
    generate_llm_message_wikipedia,
)
from ragroute_tpu.utils.template import render


# -- rerank parity vs literal reference behavior --------------------------

def test_rerank_medrag_descending():
    docs = ["a", "b", "c", "d"]
    scores = [0.1, 0.9, 0.5, 0.7]
    got_docs, got_scores = rerank_medrag(docs, scores, 3)
    assert got_docs == ["b", "d", "c"]
    assert got_scores == [0.9, 0.7, 0.5]


def test_rerank_wikipedia_ascending():
    docs = ["a", "b", "c", "d"]
    scores = [0.4, 0.1, 0.9, 0.2]
    got_docs, got_scores = rerank_wikipedia(docs, scores, 3)
    assert got_docs == ["b", "d", "a"]
    assert got_scores == [0.1, 0.2, 0.4]


def test_rerank_feb4rag_oracle_order():
    relevance = {"q1": [("d1", "1"), ("d2", "3"), ("d3", "2")]}
    ids = ["d4", "d1", "d3", "d2"]
    docs = ["doc4", "doc1", "doc3", "doc2"]
    got_docs, got_ids = rerank_feb4rag(ids, docs, "q1", 3, relevance)
    # qrels order: d2 (rel 3) > d3 (rel 2) > d1 (rel 1); d4 pushed to end
    assert got_ids == ["d2", "d3", "d1"]
    assert got_docs == ["doc2", "doc3", "doc1"]


def test_rerank_feb4rag_empty():
    assert rerank_feb4rag([], [], "qx", 5, {}) == ([], [])


def test_load_qrels(tmp_path):
    p = tmp_path / "qrels.txt"
    p.write_text("q1 0 d1 2\nq1 0 d2 1\nq2 0 d9 3\n")
    data = load_qrels(str(p))
    assert data["q1"] == [("d1", "2"), ("d2", "1")]
    assert data["q2"] == [("d9", "3")]


# -- template + prompts ----------------------------------------------------

def test_render_basic_and_indexed():
    assert render("Q: {{question}} A: {{options[1]}}",
                  {"question": "hi", "options": ["x", "y"]}) == "Q: hi A: y"
    assert render("{{missing}} stays", {}) == "{{missing}} stays"


def test_generate_llm_message_medrag():
    docs = [{"title": f"T{i}", "content": f"C{i}"} for i in range(3)]
    messages, docs_tokens = generate_llm_message(
        "medrag", "What?", docs, {"A": "yes", "B": "no"},
        "llama3.1-8B-instruct")
    assert messages[0]["role"] == "system"
    assert "Document [0] (Title: T0) C0" in messages[1]["content"]
    assert "What?" in messages[1]["content"]
    assert docs_tokens > 0


def test_generate_llm_message_truncates():
    long_docs = [{"title": "T", "content": "word " * 200000}]
    _, docs_tokens = generate_llm_message(
        "medrag", "Q", long_docs, "{}", "qwen3-0.6B")
    assert docs_tokens == 38000  # qwen docs_context_length (config.py:161)


def test_generate_llm_message_wikipedia_format():
    docs = [("Title1", "Text1"), ("Title2", "Text2")]
    messages, _ = generate_llm_message_wikipedia(
        "Which?", docs, ["a", "b", "c", "d"], "llama3.1-8B-instruct")
    assert len(messages) == 1
    content = messages[0]["content"]
    assert "##### Document 1 [Title1] #####" in content
    assert content.endswith("The best answer is")
    assert "A. a" in content and "D. d" in content


def test_generate_llm_message_empty_context():
    messages, docs_tokens = generate_llm_message(
        "medrag", "Q", [], "{}", "llama3.1-8B-instruct")
    assert docs_tokens == 0
    assert messages[1]["content"]


# -- answer checkers (reference benchmark.py parity) ------------------------

MIRAGE_CASES = [
    ('{"step_by_step_thinking": "...", "answer_choice": "A"}', "A", True),
    ('{"answer_choice": "B"}', "A", False),
    ('... "answer_choice": "C."', "C", True),
    ('... "answer_choice": "B or maybe"', "B", True),
    ('... "answer_choice": "A and B"', "A", True),
    ("no answer here", "A", False),
    ('... "answer_choice": "Option D"', "D", True),
]


@pytest.mark.parametrize("output,gold,want", MIRAGE_CASES)
def test_check_mirage_answer(tmp_path, output, gold, want):
    bench_file = write_synthetic_benchmark(
        str(tmp_path), [{"qid": "q0", "question": "?",
                         "options": {}, "answer": gold}])
    b = Benchmark(str(tmp_path), "SYNTHETIC")
    assert b.check_mirage_answer({"answer": gold}, output) == want


def test_locate_answer_patterns():
    assert locate_answer("A") == "A"
    assert locate_answer("B or C") == "B"
    assert locate_answer("C and D") == "C"
    assert locate_answer("D/") == "D"
    assert locate_answer("A,") == "A"
    assert locate_answer("I pick option B here") == "B"
    assert locate_answer("answer: C") == "C"
    assert locate_answer("D.") == "D"
    assert locate_answer('A"') == "A"
    assert locate_answer("B:") == "B"
    assert locate_answer("nothing") == ""


def test_check_mmlu_answer():
    b = Benchmark.__new__(Benchmark)
    b.name = "MMLU"
    assert b.check_mmlu_answer({"answer": 0}, "The best answer is A.") == 1
    assert b.check_mmlu_answer({"answer": 1}, "The best answer is A") == 0
    assert b.check_mmlu_answer({"answer": 2}, 'blah The best answer is "C"') == 1


def test_benchmark_loaders(tmp_path):
    # FeB4RAG jsonl loader
    feb = tmp_path / "FeB4RAG.jsonl"
    feb.write_text('{"_id": 1, "text": "query one"}\n'
                   '{"_id": "2", "text": "query two"}\n')
    b = Benchmark(str(tmp_path), "FeB4RAG")
    assert b.benchmark_data["FeB4RAG"]["1"]["question"] == "query one"
    assert b.benchmark_data["FeB4RAG"]["2"]["options"] == []

    # MIRAGE loader
    mirage = tmp_path / "MIRAGE.json"
    mirage.write_text(json.dumps(
        {"medqa": {"q0": {"question": "?", "options": {"A": "x"},
                          "answer": "A"}}}))
    b = Benchmark(str(tmp_path), "MIRAGE")
    assert b.benchmark_data["medqa"]["q0"]["answer"] == "A"


REFERENCE = "/root/reference"


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference snapshot not mounted")
def test_feb4rag_loader_on_real_reference_data():
    """Our FeB4RAG loader consumes the reference's actual benchmark file."""
    b = Benchmark(os.path.join(REFERENCE, "data", "benchmark"), "FeB4RAG")
    qs = b.benchmark_data["FeB4RAG"]
    assert len(qs) == 790  # the reference's full query set
    assert all(isinstance(q["question"], str) and q["options"] == []
               for q in qs.values())


@pytest.mark.skipif(not os.path.isdir(REFERENCE),
                    reason="reference snapshot not mounted")
def test_question_order_files_compatible():
    """The reference's frozen question-order files parse as our client
    expects (run_benchmark.py order reuse)."""
    path = os.path.join(REFERENCE, "data",
                        "question_order_FeB4RAG_FeB4RAG.json")
    with open(path) as f:
        order = json.load(f)
    assert isinstance(order, list) and len(order) == 790
    b = Benchmark(os.path.join(REFERENCE, "data", "benchmark"), "FeB4RAG")
    qs = b.benchmark_data["FeB4RAG"]
    matched = [qid for qid in order if qid in qs]
    assert len(matched) == 790

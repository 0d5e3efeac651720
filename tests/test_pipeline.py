"""Offline pipeline tests (the med_rag.py/mmlu.py prototype equivalents)."""

import numpy as np
import pytest

from ragroute_tpu.pipeline import OfflinePipeline


@pytest.fixture(scope="module")
def medrag_pipe():
    return OfflinePipeline.from_synthetic(
        "medrag", strategy="all", docs_per_source=600, num_queries=4)


def test_pipeline_end_to_end(medrag_pipe):
    out = medrag_pipe.run("What causes diabetes?", {"A": "x", "B": "y"},
                          qid="syn0")
    assert sorted(out["data_sources"]) == [
        "pubmed", "statpearls", "textbooks", "wikipedia"]
    assert len(out["top_docs"]) == 32
    assert out["top_docs"][0]["title"]
    # merged scores descending (medrag dot semantics)
    s = [v for v in out["merged_scores"] if not np.isnan(v)]
    assert all(s[i] >= s[i + 1] - 1e-4 for i in range(len(s) - 1))
    # prompt built with the retrieved context
    assert out["messages"][0]["role"] == "system"
    assert "Document [0]" in out["messages"][1]["content"]
    assert out["docs_tokens"] > 0


def test_pipeline_unknown_qid_falls_back(medrag_pipe):
    out = medrag_pipe.run("anything", {"A": "x"}, qid="not-a-qid")
    assert len(out["top_docs"]) == 32


def test_pipeline_wikipedia_prompt():
    pipe = OfflinePipeline.from_synthetic(
        "wikipedia", strategy="all", docs_per_source=600, num_queries=2)
    out = pipe.run("Which planet?", ["a", "b", "c", "d"], qid="syn0")
    assert len(out["messages"]) == 1
    assert out["messages"][0]["content"].endswith("The best answer is")
    # l2 world: merged scores ascending
    s = [v for v in out["merged_scores"] if not np.isnan(v)]
    assert all(s[i] <= s[i + 1] + 1e-4 for i in range(len(s) - 1))

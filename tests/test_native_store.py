"""Native C++ doc store: build, correctness vs the Python store, edge cases."""

import json
import os

import pytest

from ragroute_tpu.index.native_store import (
    NativeJsonlDocStore,
    make_doc_store,
    native_available,
)
from ragroute_tpu.index.store import JsonlDirDocStore


@pytest.fixture(scope="module")
def corpus_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("payloads")
    docs = [{"id": f"d{i}", "title": f"T{i}", "content": "x" * (i % 7)}
            for i in range(100)]
    with open(os.path.join(d, "pubmed.jsonl"), "w") as f:
        for doc in docs:
            f.write(json.dumps(doc) + "\n")
    # file without trailing newline
    with open(os.path.join(d, "textbooks.jsonl"), "w") as f:
        f.write('{"id": "a"}\n{"id": "b"}')
    return str(d)


def test_native_builds():
    assert native_available(), "g++ build of native/docstore.cpp failed"


def test_native_matches_python_store(corpus_dir):
    native = NativeJsonlDocStore(corpus_dir)
    python = JsonlDirDocStore(corpus_dir)
    assert native.count("pubmed") == 100
    for i in [0, 1, 50, 99]:
        assert native.get("pubmed", i) == python.get("pubmed", i)


def test_native_no_trailing_newline(corpus_dir):
    native = NativeJsonlDocStore(corpus_dir)
    assert native.count("textbooks") == 2
    assert native.get("textbooks", 1) == {"id": "b"}


def test_native_out_of_range_and_missing(corpus_dir):
    native = NativeJsonlDocStore(corpus_dir)
    assert native.get("pubmed", 100) is None
    assert native.get("pubmed", -1) is None
    assert native.get("nonexistent_source", 0) is None


def test_make_doc_store_prefers_native(corpus_dir):
    store = make_doc_store(corpus_dir)
    assert isinstance(store, NativeJsonlDocStore)
    assert store.get("pubmed", 3)["id"] == "d3"

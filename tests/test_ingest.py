"""Corpus-side encoding + raw-jsonl ingest path.

The reference builds its indexes offline with doc-side encoder semantics
(E5 "passage: " prefixes, SGPT brace brackets, instructor corpus-side
instructions, '{title} {text}' concat — ``custom_models.py:47-53,89-152``);
this covers our equivalents: per-encoder ``encode_corpus`` methods and
``scripts/import_real_data.py --encode-from-jsonl`` building a servable
world from raw text.
"""

import json
import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_doc_text_schemas():
    from scripts.import_real_data import _doc_text

    assert _doc_text("medrag", {"title": "T", "content": "C"}) == "T C"
    assert _doc_text("feb4rag", {"title": "T", "text": "X"}) == "T X"
    assert _doc_text("feb4rag", {"text": "X"}) == "X"
    assert _doc_text("wikipedia", ["Title", "Body"]) == "Title Body"


def test_hash_encoder_passage_prefix_differs():
    """E5-style prefixes must place queries and passages in different
    spaces even on the hash backend (format_passage salted in)."""
    from ragroute_tpu.encoders.registry import ENCODER_SPECS
    from ragroute_tpu.encoders.zoo import HashEncoder

    enc = HashEncoder(ENCODER_SPECS["e5-base"])
    q = enc.encode(["hello"])
    p = enc.encode_corpus(["hello"])
    assert np.abs(q - p).max() > 0.1
    # no prefixes -> same space
    enc2 = HashEncoder(ENCODER_SPECS["gte-base"])
    np.testing.assert_array_equal(enc2.encode(["hello"]),
                                  enc2.encode_corpus(["hello"]))


def test_sgpt_encode_corpus_uses_brace_brackets(rng):
    """SGPT doc-side == encode(is_query=False): brace token brackets."""
    import torch
    from transformers import GPT2Config, GPT2Model

    from ragroute_tpu.encoders.custom import SGPTEncoder, specb_tokenize
    from ragroute_tpu.encoders.registry import EncoderSpec
    from tests.test_encoders import _make_local_tokenizer

    tok = _make_local_tokenizer()
    torch.manual_seed(1)
    model = GPT2Model(GPT2Config(
        vocab_size=tok.vocab_size + 10, n_positions=64, n_embd=16,
        n_layer=1, n_head=2, resid_pdrop=0.0, embd_pdrop=0.0,
        attn_pdrop=0.0))
    model.eval()
    spec = EncoderSpec("sgpt-tiny", "gpt", "x", 16, "weightedmean", False)
    enc = SGPTEncoder(spec, model=model, tokenizer=tok)

    texts = ["some document text"]
    np.testing.assert_array_equal(enc.encode_corpus(texts),
                                  enc.encode(texts, is_query=False))
    # and the brackets actually differ from the query side
    qb = specb_tokenize(tok, texts, is_query=True)
    db = specb_tokenize(tok, texts, is_query=False)
    assert qb["input_ids"][0, 0] != db["input_ids"][0, 0]


def test_instructor_encode_corpus_uses_corpus_instruction():
    from ragroute_tpu.encoders.custom import instructor_instruction

    qi = instructor_instruction("hkunlp/instructor-large", "nq", "query")
    ci = instructor_instruction("hkunlp/instructor-large", "nq", "corpus")
    assert qi != ci and "document" in ci.lower()


@pytest.mark.parametrize("world_name", ["medrag", "feb4rag", "wikipedia"])
def test_encode_from_jsonl_builds_servable_world(tmp_path, world_name):
    """Raw <source>.jsonl corpora -> encoded shards -> served search."""
    from ragroute_tpu.config import get_world
    from ragroute_tpu.engine import FederatedSearchEngine
    from ragroute_tpu.index import ShardSet
    from scripts.import_real_data import encode_from_jsonl

    world = get_world(world_name)
    jdir = tmp_path / "raw"
    jdir.mkdir()
    n_docs = 64
    for src in world.sources:
        with open(jdir / f"{src.name}.jsonl", "w") as f:
            for i in range(n_docs):
                if world_name == "medrag":
                    p = {"id": f"{src.name}_{i}", "title": f"t {i}",
                         "content": f"passage number {i} of {src.name}"}
                elif world_name == "wikipedia":
                    p = [f"page {i}", f"chunk {i} of cluster {src.name}"]
                else:
                    p = {"_id": f"{src.name}-d{i}", "title": f"t {i}",
                         "text": f"text number {i} of {src.name}"}
                f.write(json.dumps(p) + "\n")

    root = str(tmp_path / "root")
    # hash backend: offline-deterministic, exercises the full pipeline
    encode_from_jsonl(world, str(jdir), root, prefer="hash")

    for src in world.sources:
        d = os.path.join(root, world.name, src.name)
        assert os.path.exists(os.path.join(d, "embeddings.npy"))
        assert os.path.exists(os.path.join(d, "doc_ids.json"))
        emb = np.load(os.path.join(d, "embeddings.npy"))
        assert emb.shape == (n_docs, src.embed_dim)
    assert os.path.exists(os.path.join(root, world.name, "centroids.json"))
    assert os.path.exists(os.path.join(
        root, world.name, "payloads", world.sources[0].name + ".jsonl"))

    shard_set = ShardSet.load(root, world, dtype=jnp.float32)
    engine = FederatedSearchEngine(shard_set, None, None)
    embs = {e: np.random.default_rng(0).standard_normal(
        (4, next(s.embed_dim for s in world.sources if s.encoder == e))
    ).astype(np.float32) for e in world.encoders}
    out = engine.search(embs, strategy="all")
    assert (out.merged_valid == world.k).all()
    # ids resolve through the saved doc_ids tables
    ids = engine.resolve_doc_ids(out, 0)
    assert len(ids) == world.k


def test_real_parity_dryrun(tmp_path):
    """scripts/real_parity.sh --dryrun: the CI-runnable mode of the
    real-data parity runbook (full mode needs faiss + network; this
    pins the harness itself — f32 must be EXACT vs the oracle)."""
    from scripts.real_parity import main as parity_main

    report = parity_main([
        "--dryrun", "--workdir", str(tmp_path),
        "--docs", "2048", "--queries", "16", "--dim", "64"])
    for mode in ("dot", "l2"):
        assert report[mode]["float32"]["recall"] == 1.0
        assert report[mode]["float32"]["score_max_rel_err"] == 0.0
        assert report[mode]["bfloat16"]["recall"] >= 0.99
        assert report[mode]["int8"]["recall"] >= 0.95
    assert os.path.exists(str(tmp_path / "parity_report.json"))


def test_real_parity_arg_parsing():
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable, "scripts/real_parity.py", "--help"],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert r.returncode == 0
    assert "--dryrun" in r.stdout
    # unknown dataset rejected
    r = subprocess.run(
        [_sys.executable, "scripts/real_parity.py", "--dataset", "zzz"],
        capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."))
    assert r.returncode != 0

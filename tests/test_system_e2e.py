"""Full-system integration: synthetic data → serve → benchmark client → CSVs."""

import argparse
import asyncio
import json
import os

import pytest

import run_benchmark
from ragroute_tpu.index.synthetic import make_synthetic_world, save_world
from ragroute_tpu.config import get_world
from ragroute_tpu.system import ServingSystem


def make_args(**kw):
    base = dict(dataset="medrag", routing="all", disable_llm=True,
                simulate=False, model="llama3.1-8B-instruct",
                data_root=None, port=0, dtype="float32", impl="exact",
                buckets=(8,))
    base.update(kw)
    return argparse.Namespace(**base)


@pytest.fixture(scope="module")
def world_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("data"))
    syn = make_synthetic_world("medrag", docs_per_source=600,
                               num_queries=6, seed=2)
    save_world(syn, root)
    return root


def test_full_system_benchmark_run(world_root, tmp_path):
    logs = str(tmp_path / "logs")

    async def run():
        system = ServingSystem(make_args(data_root=world_root))
        await system.start()
        try:
            port = system.server.bound_port
            bench_args = run_benchmark.parse_args([
                "--benchmark", "SYNTHETIC",
                "--benchmark-path",
                os.path.join(world_root, "medrag", "benchmark"),
                "--save-logs-dir", logs,
                "--routing", "all",
                "--parallel", "3",
                "--server", f"http://127.0.0.1:{port}",
            ])
            return await run_benchmark.run(bench_args)
        finally:
            await system.stop()

    stats = asyncio.run(run())
    assert stats["questions"] == 6

    # CSV schema parity (reference run_benchmark.py:45)
    bench_csv = os.path.join(logs, "benchmark_SYNTHETIC_all.csv")
    with open(bench_csv) as f:
        header = f.readline().strip()
        rows = f.readlines()
    assert header == ("benchmark,dataset,model,question_id,correct,"
                      "data_sources,num_data_sources,selection_time,"
                      "embedding_time,doc_select_time,generate_time,"
                      "e2e_time,docs_tokens")
    assert len(rows) == 6
    first = rows[0].split(",")
    assert first[0] == "SYNTHETIC"
    assert int(first[6]) == 4  # all 4 medrag sources routed

    ds_csv = os.path.join(logs, "ds_stats_SYNTHETIC_all.csv")
    with open(ds_csv) as f:
        ds_rows = f.readlines()[1:]
    assert len(ds_rows) == 6 * 4

    # frozen question order persisted
    order = os.path.join(logs, "question_order_SYNTHETIC_synthetic.json")
    assert os.path.exists(order)
    with open(order) as f:
        assert len(json.load(f)) == 6

    # answers + top_docs jsonl written
    with open(os.path.join(logs, "answers_SYNTHETIC_all.jsonl")) as f:
        assert len(f.readlines()) == 6

    # resume-by-skip: a second run must add nothing
    async def rerun():
        system = ServingSystem(make_args(data_root=world_root))
        await system.start()
        try:
            port = system.server.bound_port
            bench_args = run_benchmark.parse_args([
                "--benchmark", "SYNTHETIC",
                "--benchmark-path",
                os.path.join(world_root, "medrag", "benchmark"),
                "--save-logs-dir", logs,
                "--routing", "all",
                "--server", f"http://127.0.0.1:{port}",
            ])
            return await run_benchmark.run(bench_args)
        finally:
            await system.stop()

    stats2 = asyncio.run(rerun())
    assert stats2["questions"] == 0  # everything skipped
    with open(bench_csv) as f:
        assert len(f.readlines()) == 7  # header + 6, unchanged


def test_simulate_mode_boots():
    """--simulate parity: tiny in-memory world, no data root needed."""
    async def run():
        system = ServingSystem(make_args(simulate=True, dataset="medrag"))
        await system.start()
        try:
            import aiohttp

            port = system.server.bound_port
            async with aiohttp.ClientSession() as s:
                enc_c = aiohttp.helpers.quote(json.dumps({"A": "x"}))
                async with s.get(
                    f"http://127.0.0.1:{port}/query?q=test&choices={enc_c}"
                ) as r:
                    assert r.status == 200
                    body = await r.json()
                    # simulate routes to all sources (router.py:222-223)
                    assert len(body["metadata"]["data_sources"]) == 4
                async with s.get(f"http://127.0.0.1:{port}/healthz") as r:
                    health = await r.json()
                    assert health["status"] == "ok"
        finally:
            await system.stop()

    asyncio.run(run())


def test_feb4rag_full_system(tmp_path):
    """FeB4RAG world through ServingSystem: 13 heterogeneous shards,
    synthetic qrels loaded from the data root, oracle rerank served."""
    root = str(tmp_path / "feb_data")
    syn = make_synthetic_world("feb4rag", docs_per_source=520,
                               num_queries=4, seed=3)
    save_world(syn, root)
    assert os.path.exists(os.path.join(root, "feb4rag", "qrels.txt"))

    async def run():
        system = ServingSystem(make_args(
            dataset="feb4rag", data_root=root, buckets=(4,)))
        await system.start()
        try:
            assert system.server.relevance_data  # qrels loaded
            import aiohttp

            port = system.server.bound_port
            q = syn.questions[0]
            async with aiohttp.ClientSession() as s:
                enc_q = aiohttp.helpers.quote(q["question"])
                enc_c = aiohttp.helpers.quote(json.dumps(["x"]))
                async with s.get(
                    f"http://127.0.0.1:{port}/query?q={enc_q}"
                    f"&choices={enc_c}&qid={q['qid']}"
                ) as r:
                    assert r.status == 200
                    body = await r.json()
            md = body["metadata"]
            assert len(md["data_sources"]) == 13  # routing=all
            top = md["top_docs"]
            assert len(top) == 10
            # qrels oracle: top docs must be exactly the query's true
            # top-k ids (save_world writes qrels from exact brute force)
            want_prefix = top[0]["_id"]
            qrels = {}
            with open(os.path.join(root, "feb4rag", "qrels.txt")) as f:
                for line in f:
                    qid, _, did, rel = line.split()
                    if qid == q["qid"]:
                        qrels[did] = int(rel)
            assert want_prefix in qrels
            # ranked by descending qrels relevance
            rels = [qrels.get(d["_id"], -1) for d in top]
            in_qrels = [r for r in rels if r >= 0]
            assert in_qrels == sorted(in_qrels, reverse=True)
        finally:
            await system.stop()

    asyncio.run(run())


def test_embedder_selection(world_root):
    """--embedder picks the query-embedding provider: zoo = live encoder
    models (the reference encodes every query on arrival,
    router.py:285-303), hash/precomputed force those providers, and
    precomputed without a table must fail loudly."""
    from ragroute_tpu.engine.embedding import (
        EncoderZooEmbeddings, HashEmbeddings, PrecomputedEmbeddings)
    from ragroute_tpu.system import load_world_artifacts

    world = get_world("medrag")

    def provider_for(embedder):
        return load_world_artifacts(
            world_root, world, embedder=embedder)[3]

    assert isinstance(provider_for("auto"), PrecomputedEmbeddings)
    assert isinstance(provider_for("precomputed"), PrecomputedEmbeddings)
    assert isinstance(provider_for("hash"), HashEmbeddings)

    zoo = provider_for("zoo")
    assert isinstance(zoo, EncoderZooEmbeddings)
    embs = zoo.embed("What is the treatment for hypertension?", "q0")
    assert set(embs) == set(world.encoders)
    for s in world.sources:
        assert embs[s.encoder].shape == (s.embed_dim,)

    with pytest.raises(ValueError):
        provider_for("bogus")

    import shutil
    import tempfile

    bare = tempfile.mkdtemp()
    try:
        shutil.copytree(os.path.join(world_root, "medrag"),
                        os.path.join(bare, "medrag"),
                        ignore=shutil.ignore_patterns("queries"))
        with pytest.raises(FileNotFoundError):
            load_world_artifacts(bare, world, embedder="precomputed")
    finally:
        shutil.rmtree(bare, ignore_errors=True)


def test_llm_prefix_cache_served(world_root):
    """--llm-backend jax --llm-serving continuous --llm-prefix-cache:
    the system derives the dataset's shared prompt head from probe
    builds of the real message builder, and served queries (whose
    prompts come from that same builder) pass the service's
    extends-the-prefix validation and generate."""
    from tests.test_server import query_server

    async def run():
        system = ServingSystem(make_args(
            data_root=world_root, routing="all", disable_llm=False,
            llm_backend="jax", llm_serving="continuous",
            llm_prefix_cache=True, llm_max_new=8))
        await system.start()
        try:
            svc = system.server.llm.service
            assert svc.prefix_ids and len(svc.prefix_ids) > 10
            q = system.server.world  # touch to ensure built
            qq = {"question": "What causes anemia?",
                  "options": {"A": "iron", "B": "sun"}}
            status, body = await query_server(
                system.server.bound_port, qq["question"], qq["options"],
                "nonexistent-qid")
            assert status == 200
            assert body["metadata"]["generate_time"] > 0
            # the service really ran in shared-prefix mode
            assert svc._prefix_kv is not None
            assert svc.admissions >= 1
        finally:
            await system.stop()

    asyncio.run(run())


def test_dtype_policy_resolution():
    """--dtype policy resolves to the measured per-world rule
    (config.store_dtype_policy): int8 for low-dim dot/l2 worlds,
    int4+lowrank where a high-dim cos shard demands it."""
    import argparse

    from ragroute_tpu.config import store_dtype_policy, get_world
    from ragroute_tpu.system import ServingSystem

    assert store_dtype_policy(768, "dot") == ("int8", False)
    assert store_dtype_policy(768, "l2") == ("int8", False)
    assert store_dtype_policy(4096, "cos") == ("int4", True)
    assert store_dtype_policy(768, "cos") == ("bfloat16", False)
    assert store_dtype_policy(4096, "cos", capacity=True) == ("int4", True)

    for dataset, want_dtype, want_impl in (
            ("medrag", "int8", "auto"),
            ("feb4rag", "int4", "lowrank")):
        args = argparse.Namespace(
            dataset=dataset, routing="all", disable_llm=True,
            simulate=True, model="llama3.1-8B-instruct", port=0,
            dtype="policy", impl="auto")
        system = ServingSystem(args)
        system.build()
        assert system.dtype_name == want_dtype, dataset
        assert system.impl == want_impl, dataset

"""Smoke tests for the headline harness: bench.py + __graft_entry__.

These exist because round 1 shipped a bench.py that crashed before
measuring anything (ShardSet.arrays() grew a scale element; bench still
unpacked 2). The driver's benchmark capture is the round's #1 deliverable,
so the FULL bench code path must run in CI at tiny scale on the CPU mesh.
"""

import json
import os
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)


@pytest.mark.parametrize("dtype", ["bfloat16", "int8"])
def test_bench_main_tiny(monkeypatch, capsys, dtype):
    """bench.main() end-to-end at tiny scale emits the driver JSON line."""
    monkeypatch.setenv("RAGROUTE_BENCH_DOCS", "8192")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "16")
    monkeypatch.setenv("RAGROUTE_BENCH_REPS", "2")
    monkeypatch.setenv("RAGROUTE_BENCH_DTYPE", dtype)
    import bench

    bench.main()
    lines = [ln for ln in capsys.readouterr().out.strip().splitlines() if ln]
    rec = json.loads(lines[-1])
    assert rec["metric"] == "routed_queries_per_sec"
    assert rec["unit"] == "q/s"
    assert rec["value"] > 0
    # both fields are independently rounded (value to 0.1, ratio to 1e-3)
    assert rec["vs_baseline"] == pytest.approx(rec["value"] / 10000.0,
                                               abs=1e-3)


def test_bench_all_worlds_and_strategies(monkeypatch, capsys):
    """Every world x a non-default strategy goes through bench's full path
    (catches world-specific arrays()/signature drift)."""
    monkeypatch.setenv("RAGROUTE_BENCH_DOCS", "8192")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "8")
    monkeypatch.setenv("RAGROUTE_BENCH_REPS", "1")
    import bench

    for world, strategy in [("feb4rag", "all"), ("wikipedia", "none")]:
        monkeypatch.setenv("RAGROUTE_BENCH_WORLD", world)
        monkeypatch.setenv("RAGROUTE_BENCH_STRATEGY", strategy)
        bench.main()
        rec = json.loads(
            capsys.readouterr().out.strip().splitlines()[-1])
        assert rec["value"] > 0, (world, strategy)


def test_bench_world_cache_roundtrip(monkeypatch, capsys, tmp_path):
    """The on-disk world cache must reproduce the generated world exactly:
    a cache-hit bench run reports the same q/s-denominator world (and the
    cache file must exist after the first run). Guards the driver's bench
    wall time — world-gen is minutes at the 1M-doc point."""
    monkeypatch.setenv("RAGROUTE_BENCH_DOCS", "8192")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "16")
    monkeypatch.setenv("RAGROUTE_BENCH_REPS", "1")
    monkeypatch.setenv("RAGROUTE_BENCH_WORLD_CACHE", "1")
    monkeypatch.setenv("RAGROUTE_BENCH_WORLD_CACHE_DIR", str(tmp_path))
    import bench

    bench.main()
    err1 = capsys.readouterr()
    assert json.loads(err1.out.strip().splitlines()[-1])["value"] > 0
    cached = list(tmp_path.glob("w*.npz"))
    assert len(cached) == 1, "first run must write exactly one cache entry"

    bench.main()
    err2 = capsys.readouterr()
    assert json.loads(err2.out.strip().splitlines()[-1])["value"] > 0
    assert "world cache hit" in err2.err

    # gen-only mode (pre-baking worlds for a busy chip) must write the
    # cache and exit before any device work
    monkeypatch.setenv("RAGROUTE_BENCH_GEN_ONLY", "1")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "32")  # fresh cache key
    bench.main()
    out3 = capsys.readouterr()
    assert "world ready, exiting" in out3.err
    assert out3.out.strip() == ""          # no driver JSON line emitted
    assert len(list(tmp_path.glob("w*.npz"))) == 2
    monkeypatch.delenv("RAGROUTE_BENCH_GEN_ONLY")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "16")

    # the cached arrays are byte-identical to a fresh generation
    import numpy as np

    from ragroute_tpu.index import make_synthetic_world
    weights = {"pubmed": 0.70, "statpearls": 0.10,
               "textbooks": 0.08, "wikipedia": 0.12}
    sizes = {n: max(2048, int(8192 * w)) for n, w in weights.items()}
    syn = make_synthetic_world("medrag", docs_per_source_map=sizes,
                               docs_per_source=4096, num_queries=16,
                               seed=0, with_payloads=False)
    with np.load(cached[0]) as z:
        for s, emb in syn.embeddings.items():
            assert (z[f"emb_{s}"] == emb).all()
        for e, q in syn.query_embs.items():
            assert (z[f"q_{e}"] == q).all()


def test_graft_entry_single_chip():
    """__graft_entry__.entry() must jit-compile and run (driver check)."""
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    # (probs, mask, ...score outputs); mask is [B, N] over sources
    probs = out[0]
    assert probs.shape[0] == args[3][list(args[3])[0]].shape[0]


def test_graft_entry_multichip():
    """dryrun_multichip on the virtual 8-device CPU mesh (driver check)."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_bench_recall_oracle_tiny(monkeypatch, capsys):
    """RAGROUTE_BENCH_RECALL=1 builds the f32 oracle index and reports
    dtype recall vs exact-f32 (the full-scale recall-artifact path)."""
    monkeypatch.setenv("RAGROUTE_BENCH_DOCS", "8192")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "16")
    monkeypatch.setenv("RAGROUTE_BENCH_REPS", "1")
    monkeypatch.setenv("RAGROUTE_BENCH_DTYPE", "bfloat16")
    monkeypatch.setenv("RAGROUTE_BENCH_RECALL", "1")
    import bench

    bench.main()
    captured = capsys.readouterr()
    line = [ln for ln in captured.err.splitlines() if "recall@" in ln]
    assert line, captured.err
    r = float(line[-1].rsplit(":", 1)[1])
    assert r >= 0.99  # bf16 gate at tiny scale
    rec = json.loads(captured.out.strip().splitlines()[-1])
    assert rec["value"] > 0


def test_bench_mesh_tiny(monkeypatch, capsys):
    """RAGROUTE_BENCH_MESH runs the scanned loop over the ShardedSearch
    step on the virtual device mesh."""
    monkeypatch.setenv("RAGROUTE_BENCH_DOCS", "8192")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "16")
    monkeypatch.setenv("RAGROUTE_BENCH_REPS", "1")
    monkeypatch.setenv("RAGROUTE_BENCH_DTYPE", "float32")
    monkeypatch.setenv("RAGROUTE_BENCH_MESH", "2x4")
    monkeypatch.delenv("RAGROUTE_BENCH_RECALL", raising=False)
    import bench

    bench.main()
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["value"] > 0


def test_bench_streamed_hostrefine_tiny(monkeypatch, capsys):
    """main_streamed at tiny scale: the hostrefine capacity bench's full
    path — sequential timing, the pipelined dispatch/complete loop, and
    the full-scale recall ORACLE (exact slab-scan of the same host
    bytes + k' sweep) — emits the driver JSON line. Round 5 shipped
    these as the headline capacity measurements; they must run in CI."""
    monkeypatch.setenv("RAGROUTE_BENCH_DOCS", "40000")
    monkeypatch.setenv("RAGROUTE_BENCH_BATCH", "32")
    monkeypatch.setenv("RAGROUTE_BENCH_REPS", "2")
    monkeypatch.setenv("RAGROUTE_BENCH_HBM_GB", "0.003")
    monkeypatch.setenv("RAGROUTE_BENCH_RECALL", "1")
    monkeypatch.setenv("RAGROUTE_BENCH_REFINE_SWEEP", "2")
    monkeypatch.setenv("RAGROUTE_BENCH_WORLD_CACHE", "0")
    monkeypatch.setenv("RAGROUTE_BENCH_ORACLE_CHUNK", "8192")
    import bench

    bench.main_streamed("hostrefine")
    out = capsys.readouterr()
    rec = json.loads(
        [ln for ln in out.out.strip().splitlines() if ln][-1])
    assert rec["metric"] == "hostrefine_queries_per_sec"
    assert rec["value"] > 0
    # the oracle printed full-scale recall rows (stderr)
    assert "RECALL hostrefine@" in out.err
    assert "k'=64 (mult 2)" in out.err
    # pipelined loop ran and reported
    assert "pipelined: host refine overlaps" in out.err

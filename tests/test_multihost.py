"""Multi-host (DCN) gate: a REAL 2-process JAX cluster, not a simulation.

The reference federation cannot span machines (ZMQ sockets hardcoded to
localhost, ``/root/reference/ragroute/config.py:3-10``). The TPU-native
design is plain SPMD, so multi-host only changes mesh construction +
batch feeding (``ragroute_tpu/parallel/multihost.py``). This test forms
an actual two-process distributed runtime (gloo collectives over TCP —
the CPU stand-in for DCN; 4 virtual devices per process = the per-host
ICI domain) and runs the mesh-sharded engine across it:

* exact-f32 oracle parity for strategy=all and strategy=ragroute,
* bit-identical routing masks/winners on both processes,
* one LockstepFeed serving round trip (leader broadcast -> follower).
"""

import json
import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_cluster_matches_oracle():
    port = _free_port()
    env = dict(os.environ)
    # the worker pins its own platform/device-count before importing jax
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True, env=env,
            cwd=os.path.dirname(os.path.dirname(os.path.abspath(worker))))
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=900)
            outs.append((p.returncode, out, err))
    except subprocess.TimeoutExpired:
        for p in procs:
            p.kill()
        pytest.fail("multihost workers timed out")

    verdicts = {}
    for rc, out, err in outs:
        assert rc == 0, f"worker failed (rc={rc}):\n{out}\n{err[-3000:]}"
        line = [l for l in out.splitlines() if l.startswith("{")][-1]
        v = json.loads(line)
        assert v["ok"]
        verdicts[v["pid"]] = v

    assert set(verdicts) == {0, 1}
    # learned routing must be bit-identical across hosts
    assert verdicts[0]["digest"] == verdicts[1]["digest"]
    assert verdicts[0]["recall_all"] == 1.0
    assert verdicts[0]["recall_ragroute"] == 1.0


def test_multihost_served_query():
    """The full CLI serving path over a 2-process cluster: process 0
    serves HTTP (``main.py --coordinator ... --mesh 2x4``), process 1
    follows the lockstep broadcast; one real query must round-trip, and
    SIGINT on the leader must release the follower (graceful DCN
    shutdown)."""
    import signal
    import time
    import urllib.error
    import urllib.parse
    import urllib.request

    coord = _free_port()
    http_port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    worker = os.path.join(os.path.dirname(__file__),
                          "multihost_serve_worker.py")
    root = os.path.dirname(os.path.dirname(os.path.abspath(worker)))
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(coord),
             str(http_port)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=root)
        for pid in range(2)
    ]
    try:
        q = urllib.parse.quote("What is the treatment for hypertension?")
        c = urllib.parse.quote(json.dumps(["A", "B", "C", "D"]))
        url = (f"http://127.0.0.1:{http_port}/query?"
               f"q={q}&choices={c}&qid=mh0")
        body = None
        deadline = time.time() + 600
        while time.time() < deadline:
            for p in procs:
                if p.poll() is not None:
                    out = p.communicate()[0]
                    pytest.fail(
                        f"worker exited early (rc={p.returncode}):\n"
                        f"{out[-4000:]}")
            try:
                with urllib.request.urlopen(url, timeout=60) as resp:
                    body = json.loads(resp.read())
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(2.0)
        assert body is not None, "server never became ready"
        # query_id is a server-generated uuid (reference protocol parity);
        # the response contract is the key set + metadata schema
        assert set(body) == {"query_id", "query", "answer", "metadata"}
        md = body["metadata"]
        # --simulate routes to every source (reference router.py:222-223)
        assert sorted(md["data_sources"]) == [
            "pubmed", "statpearls", "textbooks", "wikipedia"]
        assert len(md["top_docs"]) > 0

        # graceful cluster shutdown: SIGINT the leader only
        procs[0].send_signal(signal.SIGINT)
        for p in procs:
            out, _ = p.communicate(timeout=120)
            assert p.returncode == 0, f"rc={p.returncode}:\n{out[-4000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()


def test_lockstep_leader_validates_before_broadcast():
    """Every leader-side validation must fire BEFORE the header broadcast:
    a leader raising mid-protocol leaves followers blocked forever in DCN
    collectives. Single-process construction exercises exactly the
    pre-broadcast path (a raise after the header would hang nothing here,
    but the calls-before-raise ordering is what's asserted)."""
    import numpy as np

    from ragroute_tpu.index import make_synthetic_world
    from ragroute_tpu.parallel.multihost import LockstepEngine

    syn = make_synthetic_world("medrag", docs_per_source=64,
                               num_queries=2, seed=1, with_payloads=False)

    calls = []

    class FakeEngine:
        world = syn.world
        shard_set = None

        def search(self, *a, **kw):
            calls.append("search")

    eng = LockstepEngine(FakeEngine(), buckets=(2,), leader=True)
    eng._mhu = type("M", (), {
        "broadcast_one_to_all":
            staticmethod(lambda x: calls.append("bcast") or x)})()

    embs = dict(syn.query_embs)
    victim = syn.world.encoders[0]

    # missing encoder -> KeyError, nothing broadcast
    missing = {k: v for k, v in embs.items() if k != victim}
    try:
        eng.search(missing, strategy="all")
        raise AssertionError("missing encoder accepted")
    except KeyError:
        pass
    assert calls == []

    # wrong per-encoder shape -> ValueError, nothing broadcast
    bad = dict(embs)
    bad[victim] = np.zeros((2, 7), np.float32)
    try:
        eng.search(bad, strategy="all")
        raise AssertionError("wrong shape accepted")
    except ValueError:
        pass
    assert calls == []

    # unknown strategy / non-bucket batch also raise pre-broadcast
    try:
        eng.search(embs, strategy="nope")
        raise AssertionError("unknown strategy accepted")
    except ValueError:
        pass
    assert calls == []

    # the happy path then broadcasts header + one block per encoder
    eng.search(embs, strategy="all")
    n_enc = len(syn.world.encoders)
    assert calls == ["bcast"] * (1 + n_enc) + ["search"]

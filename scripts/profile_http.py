"""Per-component host profile of the HTTP serving path under load.

Boots the federation server in-process on a synthetic world, drives it
with ``scripts/http_load.py`` in a subprocess, and reports:

* the server's per-stage timing aggregates (GET /stats — embedding /
  batch_wait / doc_select / assemble / e2e), and
* a cProfile of the server process during the load window (top functions
  by cumulative time), isolating where the host CPU actually goes.

This is the measurement tool behind the host-vs-device throughput-gap
investigation (the device sustains ~70k q/s; the single-core host front-
end is the binding constraint — see BENCHMARKS.md "HTTP serving").

    JAX_PLATFORM_NAME=cpu python scripts/profile_http.py \
        [--seconds 15] [--concurrency 256] [--cprofile]
"""

import argparse
import asyncio
import cProfile
import faulthandler
import signal

faulthandler.register(signal.SIGUSR1)  # kill -USR1 <pid> dumps all stacks
import io
import json
import os
import pstats
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_server(args):
    import jax.numpy as jnp

    from ragroute_tpu.engine import FederatedSearchEngine
    from ragroute_tpu.engine.batcher import QueryBatcher
    from ragroute_tpu.engine.embedding import PrecomputedEmbeddings
    from ragroute_tpu.engine.server import FederationServer
    from ragroute_tpu.index import ShardSet, make_synthetic_world
    from ragroute_tpu.index.store import MemoryDocStore
    from ragroute_tpu.router import RouterBank, init_router_params
    import jax

    syn = make_synthetic_world(
        "medrag", docs_per_source=args.docs_per_source,
        num_queries=256, seed=7)
    shard_set = ShardSet.build(syn.world, syn.embeddings,
                               doc_ids=syn.doc_ids, dtype=jnp.bfloat16)
    params = init_router_params(jax.random.key(0),
                                syn.world.router_input_dim)
    bank = RouterBank.create(syn.world, syn.centroids)
    engine = FederatedSearchEngine(shard_set, params, bank)
    server = FederationServer(
        engine, strategy="ragroute",
        embedding_provider=PrecomputedEmbeddings.from_synthetic(syn),
        doc_store=MemoryDocStore.from_synthetic(syn),
        disable_llm=True, port=0,
        batcher=QueryBatcher(engine, strategy="ragroute"))
    return syn, server


def load_command(syn, port, args):
    qids_path = os.path.join(tempfile.gettempdir(), "profile_qids.json")
    with open(qids_path, "w") as f:
        json.dump([q["qid"] for q in syn.questions], f)

    return [
        sys.executable, os.path.join(os.path.dirname(__file__),
                                     "http_load.py"),
        "--server", f"http://127.0.0.1:{port}",
        "--qids-path", qids_path,
        "--concurrency", str(args.concurrency),
        "--seconds", str(args.seconds),
        "--warmup-seconds", "3",
        "--bulk", str(args.bulk),
    ]


async def run(args):
    syn, server = build_server(args)
    await server.start()
    load_cmd = load_command(syn, server.bound_port, args)
    print(f"driving load: {' '.join(load_cmd[1:])}", file=sys.stderr)

    prof = cProfile.Profile() if args.cprofile else None
    if prof:
        prof.enable()
    proc = await asyncio.create_subprocess_exec(
        *load_cmd, stdout=subprocess.PIPE)
    out, _ = await proc.communicate()
    if prof:
        prof.disable()
    await server.stop()
    emit_report(out, server, prof)


def run_native(args):
    """Profile the C++ front-end's Python serving loop (--frontend native).

    The IO plane (parse/write) runs on the C++ epoll thread and is
    invisible to cProfile by design; what this measures is everything
    Python still pays per query — embed, device step + transfer,
    response assembly, ctypes handoff — i.e. the native path's remaining
    host ceiling. serve_forever runs in THIS thread under the profiler
    (cProfile instruments only its own thread); a watcher thread stops
    the loop when the load generator exits.
    """
    import threading

    from ragroute_tpu.engine.native_frontend import NativeFederationServer

    syn, server = build_server(args)
    native = NativeFederationServer(server)
    native.start(thread=False)
    load_cmd = load_command(syn, native.bound_port, args)
    print(f"driving load: {' '.join(load_cmd[1:])}", file=sys.stderr)

    proc = subprocess.Popen(load_cmd, stdout=subprocess.PIPE)

    def _watch():
        proc.wait()
        # wake the blocked fe_next; serve_forever's finally closes the
        # handle on ITS thread (full stop() here would race the close)
        native._running = False
        if native.fe is not None:
            native.fe.shutdown()

    threading.Thread(target=_watch, daemon=True).start()

    prof = cProfile.Profile() if args.cprofile else None
    if prof:
        prof.enable()
    native.serve_forever()
    if prof:
        prof.disable()
    out = proc.stdout.read()
    emit_report(out, server, prof)


def emit_report(out, server, prof):
    load = json.loads(out.decode().strip().splitlines()[-1])
    stats = server.metrics.snapshot()

    report = {
        "load": {k: load[k] for k in ("qps", "ok", "errors", "latency_ms")},
        "stages_ms": {
            s: {k: round(v * 1e3, 3) for k, v in st.items() if k != "count"}
            for s, st in stats["stages_s"].items() if st.get("count")
        },
        "batch_size": stats["batch_size"],
        "device_step_ms": stats["device_step_ms"],
    }
    print(json.dumps(report, indent=1))

    if prof:
        s = io.StringIO()
        ps = pstats.Stats(prof, stream=s).sort_stats("cumulative")
        ps.print_stats(40)
        print("\n===== cProfile (server process, load window) =====")
        print(s.getvalue())


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=15.0)
    ap.add_argument("--concurrency", type=int, default=256)
    ap.add_argument("--docs-per-source", type=int, default=4096)
    ap.add_argument("--bulk", type=int, default=0,
                    help="queries per request via POST /query/batch "
                         "(0 = single-query GET mode)")
    ap.add_argument("--cprofile", action="store_true")
    ap.add_argument("--frontend", choices=["aiohttp", "native"],
                    default="aiohttp",
                    help="'native' profiles the Python serving loop "
                         "behind the C++ IO plane")
    args = ap.parse_args()
    if args.frontend == "native":
        run_native(args)
    else:
        asyncio.run(run(args))


if __name__ == "__main__":
    main()

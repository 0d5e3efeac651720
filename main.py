"""CLI entry point: start the TPU-native federated search system.

Flag parity with the reference (``main.py:12-30``): ``--dataset``,
``--routing``, ``--disable-llm``, ``--simulate``, ``--model``; plus
framework flags for the relocatable data root, port, index dtype and
kernel implementation.

Example:
    python scripts/make_synthetic_data.py --dataset medrag
    python main.py --dataset medrag --routing ragroute --disable-llm
"""

import argparse
import asyncio
import logging

from ragroute_tpu.config import ROUTING_STRATEGIES, SUPPORTED_MODELS, WORLDS
from ragroute_tpu.system import ServingSystem

logging.basicConfig(level=logging.INFO)
logger = logging.getLogger("main")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="ragroute-tpu")
    parser.add_argument("--dataset", type=str, default="wikipedia",
                        choices=sorted(WORLDS),
                        help="The dataset being evaluated "
                             "(influences the data sources)")
    parser.add_argument("--routing", type=str, default="ragroute",
                        choices=list(ROUTING_STRATEGIES),
                        help="The routing method to use - for random, we "
                             "randomly pick a fixed-size subset of sources")
    parser.add_argument("--disable-llm", action="store_true",
                        help="Disable the LLM for testing purposes")
    parser.add_argument("--simulate", action="store_true",
                        help="Simulate the system (for testing purposes)")
    parser.add_argument("--model", type=str, default=SUPPORTED_MODELS[0],
                        choices=list(SUPPORTED_MODELS),
                        help="The model to use for the LLM")
    parser.add_argument("--llm-backend", type=str, default="auto",
                        choices=["auto", "ollama", "openai", "echo", "jax"],
                        help="Generation backend: auto = reference "
                             "behavior (ollama daemon; echo when "
                             "--disable-llm/--simulate); jax = TPU-native "
                             "generation — the registry model runs as a "
                             "pure-JAX decoder on the chip next to "
                             "retrieval (micro-batched, KV-cache decode)")
    parser.add_argument("--llm-checkpoint", type=str, default=None,
                        help="Local HF causal-LM checkpoint directory for "
                             "--llm-backend jax (Llama/Qwen3 layouts). "
                             "Without it the jax backend serves a tiny "
                             "DEMO decoder (offline; answers are "
                             "gibberish, path is real)")
    parser.add_argument("--llm-max-new", type=int, default=256,
                        help="Max generated tokens per answer with "
                             "--llm-backend jax")
    parser.add_argument("--llm-quant", type=str, default=None,
                        choices=["int8", "int4"],
                        help="Weight-only quantization for --llm-backend "
                             "jax: int8 per-channel halves the decode "
                             "weight stream (~2x tokens/s at small "
                             "batch); int4 packs group-scaled nibbles "
                             "through a Pallas dequant matmul for "
                             "another ~2x fewer HBM bytes")
    parser.add_argument("--llm-serving", type=str, default="batch",
                        choices=["batch", "continuous"],
                        help="Generation scheduling for --llm-backend "
                             "jax: 'batch' decodes each micro-batch to "
                             "completion; 'continuous' is slot-based "
                             "continuous batching (requests join/leave "
                             "the running decode at chunk boundaries)")
    parser.add_argument("--llm-spec-window", type=int, default=0,
                        help="Prompt-lookup speculative decoding window "
                             "for --llm-serving continuous (0 = off, "
                             ">=2 = verify that many tokens per step; "
                             "greedy-exact, drafts copied from each "
                             "answer's own history — the RAG quote "
                             "regime)")
    parser.add_argument("--llm-temperature", type=float, default=0.0,
                        help="Sampling temperature for --llm-backend jax "
                             "(0 = greedy, the default)")
    parser.add_argument("--llm-top-k", type=int, default=0,
                        help="Keep only the k highest-probability tokens "
                             "when sampling (0 = off)")
    parser.add_argument("--llm-top-p", type=float, default=1.0,
                        help="Nucleus sampling: keep the smallest token "
                             "set whose probability mass reaches p "
                             "(1.0 = off)")
    parser.add_argument("--llm-prefix-cache", action="store_true",
                        help="Shared-prefix KV for --llm-serving "
                             "continuous: the constant head every RAG "
                             "prompt shares (system prompt + template "
                             "preamble) is prefilled ONCE and attended "
                             "as a broadcast segment — admission "
                             "prefills only the per-request suffix and "
                             "slot cache rows store only suffix K/V")
    parser.add_argument("--llm-kv-quant", type=str, default=None,
                        choices=["int8"],
                        help="Quantize the KV cache (int8 codes + "
                             "per-(position,head) scales): decode at "
                             "large batch is KV-read-bound, so halving "
                             "the cached bytes converts into tokens/s; "
                             "also doubles the concurrent-slot capacity "
                             "per HBM GB")
    parser.add_argument("--data-root", type=str, default=None,
                        help="Data root (default: $RAGROUTE_DATA)")
    parser.add_argument("--port", type=int, default=None)
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32", "int8", "int4",
                                 "policy"],
                        help="On-device index dtype (int8: per-doc "
                             "symmetric quantization, 2x capacity over "
                             "bf16 at ~1.5%% recall@32 cost; int4: packed "
                             "pairs with MSE-optimal per-doc scales, 4x "
                             "capacity — the kernel unpacks nibbles "
                             "in-register; policy: the measured per-world "
                             "rule from config.store_dtype_policy — int8 "
                             "for low-dim dot/l2 worlds, int4+lowrank for "
                             "high-dim cos)")
    parser.add_argument("--impl", type=str, default="auto",
                        choices=["auto", "pallas", "chunked", "exact",
                                 "ivf", "hybrid", "lowrank", "stream",
                                 "hostrefine"],
                        help="Top-k implementation; 'ivf' serves the "
                             "cluster-probed approximate mode (builds "
                             "balanced-IVF layouts at startup); 'hybrid' "
                             "uses ivf only where it measured faster "
                             "(small batch buckets on large shards); "
                             "'lowrank' serves the two-stage coarse-scan+"
                             "exact-refine mode (rank-r projected scan, "
                             "then full-precision rescore of the top "
                             "candidates); 'stream'/'hostrefine' serve "
                             "corpora BIGGER than one chip's HBM from "
                             "host RAM — 'stream' scans uploaded slabs "
                             "(double-buffered; exact), 'hostrefine' "
                             "keeps a rank-r coarse projection of every "
                             "row on-device and exact-rescores the top "
                             "candidates from the host rows")
    parser.add_argument("--hbm-budget-gb", type=float, default=None,
                        help="Device HBM budget for --impl stream/"
                             "hostrefine (default config."
                             "STREAM_HBM_BUDGET_GB; rows beyond it live "
                             "in host RAM)")
    parser.add_argument("--nprobe", type=int, default=None,
                        help="Clusters probed per query with --impl ivf "
                             "(default C/8 per shard)")
    parser.add_argument("--ivf-clusters", type=int, default=-1,
                        help="Clusters per shard with --impl ivf "
                             "(-1 = ~4*sqrt(n))")
    parser.add_argument("--rank", type=int, default=-1,
                        help="Coarse projection rank with --impl lowrank "
                             "(-1 = automatic by spectral energy; shards "
                             "too flat to profit fall back to the exact "
                             "scan)")
    parser.add_argument("--refine-mult", type=int, default=None,
                        help="Refine candidate depth multiplier with "
                             "--impl lowrank: k' = mult * k (default "
                             "config.LOWRANK_REFINE_MULT)")
    parser.add_argument("--buckets", type=int, nargs="+", default=None,
                        help="Batch bucket sizes (each is compiled at "
                             "startup; default 1 8 32 128 512)")
    parser.add_argument("--frontend", type=str, default="aiohttp",
                        choices=["aiohttp", "native"],
                        help="HTTP front-end: 'native' moves the IO plane "
                             "to a C++ epoll server (native/frontend.cpp) "
                             "— sockets, HTTP parsing, keep-alive, and "
                             "micro-batch formation run outside Python, "
                             "lifting the ~1.5k q/s one-core aiohttp "
                             "ceiling. Serves the whole surface: query "
                             "(incl. SSE generation via chunked streams), "
                             "/docs/* live updates, /admin/snapshot, "
                             "/admin/profile, simulate")
    parser.add_argument("--workers", type=int, default=1,
                        help="SO_REUSEPORT worker processes sharing the "
                             "HTTP port (multi-core front-end; each "
                             "worker holds a full engine — on TPU give "
                             "each worker its own chip)")
    parser.add_argument("--mesh", type=str, default=None,
                        help="Serve over a DPxIDX device mesh (e.g. 2x4): "
                             "corpus doc axes shard over idx, the query "
                             "batch over dp. Needs dp*idx devices "
                             "(virtual CPU devices work: JAX_PLATFORMS="
                             "cpu XLA_FLAGS=--xla_force_host_platform_"
                             "device_count=8)")
    parser.add_argument("--mutable", action="store_true",
                        help="Serve a LIVE index: POST /docs/add and "
                             "/docs/delete insert/remove documents at "
                             "serve time (donated device scatters, no "
                             "recompiles). Single-chip engines only; "
                             "incompatible with --impl ivf/hybrid")
    parser.add_argument("--reserve-docs", type=int, default=0,
                        help="Extra free slots per shard for live adds "
                             "(with --mutable)")
    parser.add_argument("--embedder", type=str, default="auto",
                        choices=["auto", "precomputed", "hash", "zoo"],
                        help="Query-embedding provider: auto (precomputed "
                             "table if present, else hash), or zoo = LIVE "
                             "encoder models per query (the reference's "
                             "serving execution model; JAX-first with "
                             "torch/hash fallbacks)")
    parser.add_argument("--coordinator", type=str, default=None,
                        help="host:port of process 0 — serve over a "
                             "multi-host jax.distributed cluster (DCN). "
                             "Launch the same command on every host with "
                             "--num-processes N --process-id I; process 0 "
                             "owns the HTTP front-end and broadcasts each "
                             "batch, the others follow in lockstep. "
                             "--mesh then spans the GLOBAL device list "
                             "(keep idx within one host's device count)")
    parser.add_argument("--num-processes", type=int, default=1)
    parser.add_argument("--process-id", type=int, default=0)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if args.num_processes > 1:
        if not args.coordinator:
            raise SystemExit("--num-processes > 1 requires --coordinator")
        from ragroute_tpu.parallel import initialize_multihost

        initialize_multihost(
            args.coordinator, args.num_processes, args.process_id)
    from ragroute_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    if args.workers > 1:
        from ragroute_tpu.system import run_workers

        run_workers(args, args.workers)
        logger.info("Exiting application")
        return
    system = ServingSystem(args)
    try:
        if system.frontend == "native":
            system.run_native()
        else:
            asyncio.run(system.run_forever())
    except KeyboardInterrupt:
        pass
    except Exception as e:
        logger.error("Error in main process: %s", e)
    logger.info("Exiting application")


if __name__ == "__main__":
    main()

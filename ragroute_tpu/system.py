"""System orchestration: build, serve, watch, shut down.

The reference's ``RAGRoute`` controller (``ragroute/ragroute.py:19-131``)
spawns a router process and one process per data source, sleeps a grace
second, starts the HTTP server, polls children every second, and tears
everything down on SIGINT/SIGTERM (terminate → join(2s) → kill).

Here there are no child processes — shards and the router are device state
inside one program — so the same responsibilities become: load world
artifacts (shards, centroids, router checkpoint, doc payloads) from the
data root, construct engine + batcher + HTTP server, watch the batcher
worker (restarting it if it ever dies — stronger than the reference, which
only logs dead children), and stop cleanly on signals.
"""

from __future__ import annotations

import asyncio
import json
import logging
import os
import signal
from typing import Optional

import numpy as np

from ragroute_tpu import config as cfg
from ragroute_tpu.config import WorldConfig, get_world
from ragroute_tpu.engine import FederatedSearchEngine
from ragroute_tpu.engine.batcher import QueryBatcher
from ragroute_tpu.engine.embedding import HashEmbeddings, PrecomputedEmbeddings
from ragroute_tpu.engine.llm import LLMClient
from ragroute_tpu.engine.rerank import load_qrels
from ragroute_tpu.engine.server import FederationServer
from ragroute_tpu.index import ShardSet, make_synthetic_world
from ragroute_tpu.index.shard import SHARD_PAD_MULTIPLE
from ragroute_tpu.index.store import MemoryDocStore
from ragroute_tpu.router import RouterBank, init_router_params
from ragroute_tpu.router.torch_import import load_router_npz, load_torch_router

logger = logging.getLogger("system")

WATCHDOG_POLL_S = 1.0  # reference ragroute.py:72


def parse_mesh_spec(spec: str):
    """Parse a ``--mesh DPxIDX`` spec ("2x4") into ``(dp, idx)``."""
    try:
        dp_s, idx_s = spec.lower().split("x")
        dp, idx = int(dp_s), int(idx_s)
    except ValueError:
        raise ValueError(
            f"--mesh expects DPxIDX (e.g. 2x4), got {spec!r}") from None
    if dp < 1 or idx < 1:
        raise ValueError(f"--mesh axes must be >= 1, got {spec!r}")
    return dp, idx


def load_world_artifacts(root: str, world: WorldConfig, *, dtype=None,
                         ivf_clusters=None, lowrank=None,
                         embedder: str = "auto",
                         mutable: bool = False, reserve_docs: int = 0,
                         device=None, streamed_tier: str = None,
                         hbm_budget_bytes: int = None,
                         cluster_coarse=None):
    """Load shards/centroids/router/provider/doc-store from the data root.

    Layout as written by :func:`ragroute_tpu.index.synthetic.save_world`
    (or by importers of real corpora). Missing pieces degrade gracefully:
    no router checkpoint → fresh params (warning), no query table → hash
    embeddings. ``ivf_clusters`` additionally builds the balanced-IVF
    layouts for the approximate search mode.

    ``embedder`` picks the query-embedding provider: ``auto`` =
    precomputed table when present else hash; ``zoo`` = LIVE encoder
    models through the model zoo (the reference's serving execution
    model — it encodes every query on arrival,
    ``ragroute/router.py:285-303``; JAX-first with torch→hash
    fallbacks); ``precomputed`` / ``hash`` force those providers.
    """
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    wroot = os.path.join(root, world.name)

    if streamed_tier:
        # host-RAM capacity tiers (--impl stream / hostrefine): rows
        # stream from the embeddings.npy mmaps through the block encoder
        from ragroute_tpu.index.streamed import StreamedShardSet

        shard_set = StreamedShardSet.load(
            root, world, dtype=dtype, tier=streamed_tier,
            hbm_budget_bytes=hbm_budget_bytes,
            cluster_coarse=cluster_coarse)
    else:
        shard_set = ShardSet.load(root, world, dtype=dtype,
                                  ivf_clusters=ivf_clusters,
                                  lowrank=lowrank, mutable=mutable,
                                  reserve_docs=reserve_docs, device=device)

    cent_path = os.path.join(wroot, "centroids.json")
    if os.path.exists(cent_path):
        with open(cent_path) as f:
            centroids = {k: np.asarray(v, np.float32)
                         for k, v in json.load(f).items()}
    else:
        logger.warning("no centroids.json under %s; using zeros", wroot)
        centroids = {s.name: np.zeros(s.embed_dim, np.float32)
                     for s in world.sources}

    params, threshold, scaler = None, None, None
    npz_path = os.path.join(wroot, "router.npz")
    pth_path = os.path.join(wroot, "router.pth")
    if os.path.exists(npz_path):
        params, threshold, scaler = load_router_npz(npz_path)
    elif os.path.exists(pth_path):
        params = load_torch_router(pth_path)
        # Reference torch checkpoints carry only the MLP; the feature
        # StandardScaler ships as a separate pickle (router.py:121-130).
        # Loading the MLP without its scaler silently mis-routes every
        # query on uses_scaler worlds (the net was trained on scaled
        # features), so search for the companion artifact and refuse to
        # proceed without it.
        from ragroute_tpu.router.torch_import import load_sklearn_scaler

        if world.uses_scaler:
            for cand in ("scaler.pkl", "preprocessed_data.pkl"):
                spath = os.path.join(wroot, cand)
                if os.path.exists(spath):
                    scaler = load_sklearn_scaler(spath)
                    logger.info("loaded feature scaler from %s", spath)
                    break
        if scaler is None and world.uses_scaler:
            raise FileNotFoundError(
                f"{pth_path} is a reference torch router checkpoint and "
                f"world {world.name!r} scales router features, but no "
                f"scaler.pkl/preprocessed_data.pkl found under {wroot}; "
                "routing would be silently wrong. Place the reference "
                "scaler pickle next to the checkpoint or retrain with "
                "scripts/train_router.py (which embeds the scaler in "
                "router.npz).")
    else:
        logger.warning(
            "no router checkpoint under %s; initializing fresh params "
            "(train with ragroute_tpu.train.train_router)", wroot)
        params = init_router_params(jax.random.key(0), world.router_input_dim)
    bank = RouterBank.create(world, centroids, scaler)

    provider = None
    qdir = os.path.join(wroot, "queries")
    if embedder == "zoo":
        from ragroute_tpu.engine.embedding import EncoderZooEmbeddings

        provider = EncoderZooEmbeddings(world)
    elif embedder == "hash":
        provider = HashEmbeddings(world)
    elif embedder not in ("auto", "precomputed"):
        raise ValueError(
            f"unknown embedder {embedder!r} (auto|precomputed|hash|zoo)")
    elif os.path.exists(os.path.join(qdir, "encoders.json")):
        with open(os.path.join(qdir, "encoders.json")) as f:
            encoders = json.load(f)
        with open(os.path.join(qdir, "qids.json")) as f:
            qids = json.load(f)
        embs = {enc: np.load(os.path.join(qdir, f"enc_{i}.npy"))
                for i, enc in enumerate(encoders)}
        table = {
            qid: {enc: embs[enc][i] for enc in encoders}
            for i, qid in enumerate(qids)
        }
        provider = PrecomputedEmbeddings(world, table)
    elif embedder == "precomputed":
        raise FileNotFoundError(
            f"--embedder precomputed: no query table under {qdir}")
    else:
        provider = HashEmbeddings(world)

    pay_dir = os.path.join(wroot, "payloads")
    if os.path.isdir(pay_dir):
        from ragroute_tpu.index.native_store import make_doc_store

        doc_store = make_doc_store(pay_dir)  # C++ mmap store, py fallback
    else:
        doc_store = None

    relevance = {}
    qrels_path = os.path.join(wroot, "qrels.txt")
    if world.name == "feb4rag" and os.path.exists(qrels_path):
        relevance = load_qrels(qrels_path)

    return shard_set, params, bank, provider, doc_store, relevance, threshold


class ServingSystem:
    """One-stop construction + lifecycle for the serving stack."""

    def __init__(self, args):
        self.dataset: str = args.dataset
        self.world = get_world(self.dataset)
        self.routing: str = args.routing
        self.disable_llm: bool = args.disable_llm
        self.simulate: bool = getattr(args, "simulate", False)
        self.model: str = args.model
        self.data_root: str = getattr(args, "data_root", None) or cfg.data_root()
        self.port: int = getattr(args, "port", None) or cfg.HTTP_PORT
        self.dtype_name: str = getattr(args, "dtype", "bfloat16")
        self.impl: str = getattr(args, "impl", "auto")
        # LLM backend: auto = reference behavior (echo when disabled or
        # simulated, otherwise ollama); jax = TPU-native generation
        self.llm_backend: str = getattr(args, "llm_backend", None) or "auto"
        self.llm_checkpoint = getattr(args, "llm_checkpoint", None)
        self.llm_max_new: int = getattr(args, "llm_max_new", None) or 256
        self.llm_quant = getattr(args, "llm_quant", None)
        self.llm_kv_quant = getattr(args, "llm_kv_quant", None)
        self.llm_prefix_cache = getattr(args, "llm_prefix_cache", False)
        # NO falsy-coercion here: `or` would silently turn an explicit
        # --llm-top-p 0.0 into "nucleus off" (the service rejects
        # degenerate values loudly instead, llm/service.py)
        def _num(name, default):
            v = getattr(args, name, None)
            return default if v is None else v

        self.llm_temperature = _num("llm_temperature", 0.0)
        self.llm_top_k = _num("llm_top_k", 0)
        self.llm_top_p = _num("llm_top_p", 1.0)
        self.llm_serving: str = getattr(args, "llm_serving", None) or "batch"
        self.llm_spec_window: int = getattr(args, "llm_spec_window", 0) or 0
        self.nprobe = getattr(args, "nprobe", None)
        self.ivf_clusters = getattr(args, "ivf_clusters", -1)
        # --impl lowrank: rank of the coarse projection (-1 = automatic
        # energy-based selection) and candidate depth k' = refine_mult * k
        self.lowrank_rank = getattr(args, "rank", None) or -1
        refine_mult = getattr(args, "refine_mult", None)
        self.k_refine = (refine_mult * self.world.k) if refine_mult else None
        self.buckets = getattr(args, "buckets", None) or cfg.BATCH_BUCKETS
        self.embedder = getattr(args, "embedder", "auto") or "auto"
        self.mutable = getattr(args, "mutable", False)
        self.reserve_docs = getattr(args, "reserve_docs", 0) or 0
        self.hbm_budget_gb = getattr(args, "hbm_budget_gb", None)
        self.mesh_spec = getattr(args, "mesh", None)  # e.g. "2x4"
        if self.impl in ("stream", "hostrefine"):
            if self.mesh_spec and self.impl == "stream":
                raise ValueError(
                    "--impl stream is the SINGLE-chip capacity tier (the "
                    "per-batch slab upload targets one chip); use --impl "
                    "hostrefine with --mesh to compose host-RAM capacity "
                    "with a device mesh")
            if self.mesh_spec and (getattr(args, "num_processes", 1)
                                   or 1) > 1:
                raise ValueError(
                    "--impl hostrefine --mesh serves single-process "
                    "meshes (one host, many chips); multi-host needs "
                    "per-host refine over partitioned host rows")
            if self.mutable:
                raise ValueError(
                    f"--impl {self.impl} serves an immutable host-tier "
                    "corpus; drop --mutable (rebuild to update)")
        if self.mutable and self.mesh_spec:
            raise ValueError(
                "--mutable is a single-chip capability (the mesh engine "
                "serves sharded copies; live scatters would not reach "
                "them) — drop --mesh or --mutable")
        # multi-host (DCN): >1 jax.distributed processes; process 0 owns
        # HTTP and broadcasts batches, the rest follow in lockstep
        self.num_processes = getattr(args, "num_processes", 1) or 1
        self.process_id = getattr(args, "process_id", 0) or 0
        self.reuse_port = getattr(args, "reuse_port", False)
        # --frontend native: C++ epoll IO plane (engine/native_frontend.py)
        # serving the WHOLE surface — query (incl. SSE generation through
        # fe_begin_stream/fe_stream_chunk), /docs/* live updates,
        # /admin/snapshot, /admin/profile, simulate. Generation and
        # simulate's stage delay run on a dedicated finisher event loop
        # so the device serving loop never blocks on the LLM.
        self.frontend = getattr(args, "frontend", None) or "aiohttp"
        self.server: Optional[FederationServer] = None
        self.native = None  # NativeFederationServer with --frontend native
        self._watchdog: Optional[asyncio.Task] = None
        self._stopping = False

    def _probe_llm_messages(self, q: str, with_doc: bool):
        """One PROBE build of the serving prompt (same builder the
        query path uses). Two of these LCP'd give the shared token
        head for the prefix KV; one probe carries ZERO docs and the
        other one doc, so the common prefix stops exactly at the
        template's constant head — it can never capture accidental
        shared content inside the variable regions (doc line format,
        titles), which real requests would then fail to extend."""
        from ragroute_tpu.engine.prompts import (
            generate_llm_message, generate_llm_message_wikipedia)

        if self.dataset == "wikipedia":
            docs = [("t" + q, "body " + q)] if with_doc else []
            return generate_llm_message_wikipedia(
                q, docs, [q, "b", "c", "d"], self.model)[0]
        if with_doc:
            ctx = ([{"title": "t" + q, "content": "body " + q}]
                   if self.dataset == "medrag"
                   else [{"title": "t" + q, "text": "body " + q}])
        else:
            ctx = []
        return generate_llm_message(self.dataset, q, ctx,
                                    {"A": q, "B": "bb"}, self.model)[0]

    def build(self) -> FederationServer:
        import jax.numpy as jnp

        if self.dtype_name == "policy":
            # measured per-world rule (config.store_dtype_policy):
            # int4+lowrank where any high-dim cos shard demands it,
            # int8 for low-dim dot/l2 worlds
            from ragroute_tpu.config import store_dtype_policy

            picks = {store_dtype_policy(s.embed_dim, s.score_mode)
                     for s in self.world.sources}
            if any(lowrank for _, lowrank in picks):
                self.dtype_name = "int4"
                if self.impl == "auto":
                    self.impl = "lowrank"
            else:
                self.dtype_name = "int8"
            logger.info("dtype policy: %s (impl %s) for world %s",
                        self.dtype_name, self.impl, self.world.name)
        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
                 "int8": jnp.int8, "int4": "int4"}[self.dtype_name]

        streamed = self.impl in ("stream", "hostrefine")
        hbm_budget = (int(self.hbm_budget_gb * 1e9)
                      if self.hbm_budget_gb else None)
        if self.simulate:
            # Simulation parity (reference --simulate): tiny synthetic world
            # in-memory, hash embeddings, full pipeline live with stage
            # delays (router.py:321, data_source.py:111, http_server.py:300).
            syn = make_synthetic_world(
                self.dataset, docs_per_source=SHARD_PAD_MULTIPLE,
                num_queries=4)
            if streamed:
                from ragroute_tpu.index.streamed import StreamedShardSet

                shard_set = StreamedShardSet.build(
                    syn.world, syn.embeddings, doc_ids=syn.doc_ids,
                    dtype=dtype, tier=self.impl,
                    hbm_budget_bytes=hbm_budget,
                    cluster_coarse=(False if self.mesh_spec else None))
            else:
                shard_set = ShardSet.build(
                    syn.world, syn.embeddings, doc_ids=syn.doc_ids,
                    dtype=dtype,
                    ivf_clusters=(self.ivf_clusters
                                  if self.impl in ("ivf", "hybrid")
                                  else None),
                    lowrank=(self.lowrank_rank if self.impl == "lowrank"
                             else None),
                    mutable=self.mutable, reserve_docs=self.reserve_docs,
                    device=("host" if self.mesh_spec else None))
            import jax

            params = init_router_params(
                jax.random.key(0), self.world.router_input_dim)
            bank = RouterBank.create(self.world, syn.centroids)
            provider = HashEmbeddings(self.world)
            doc_store = MemoryDocStore.from_synthetic(syn)
            relevance = {}
            threshold = None
        else:
            (shard_set, params, bank, provider, doc_store,
             relevance, threshold) = load_world_artifacts(
                self.data_root, self.world, dtype=dtype,
                ivf_clusters=(self.ivf_clusters
                              if self.impl in ("ivf", "hybrid")
                              else None),
                lowrank=(self.lowrank_rank if self.impl == "lowrank"
                         else None),
                embedder=self.embedder,
                mutable=self.mutable, reserve_docs=self.reserve_docs,
                # mesh serving: stage corpora host-side; ShardedSearch
                # device_puts the sharded copies itself, so a corpus
                # bigger than one chip's HBM never lands whole on the
                # default device
                device=("host" if self.mesh_spec else None),
                streamed_tier=(self.impl if streamed else None),
                hbm_budget_bytes=hbm_budget,
                # mesh hostrefine scans flat slices (the mesh divides
                # the gain count; clustering is the single-chip lever)
                cluster_coarse=(False if self.mesh_spec else None))

        if self.mesh_spec:
            # BASELINE config #5: the federation served over a device
            # mesh. Corpus doc axes shard over "idx", the query batch
            # over "dp"; ShardedSearch is interface-identical to the
            # single-chip engine so the batcher/server stack is shared.
            import jax

            from ragroute_tpu.parallel import ShardedSearch, make_mesh

            dp, idx = parse_mesh_spec(self.mesh_spec)
            n = dp * idx
            if self.num_processes > 1:
                # multi-host: --mesh spans the GLOBAL device list; the
                # multihost layout keeps each idx group within one host
                from ragroute_tpu.parallel import make_multihost_mesh

                if jax.device_count() != n:
                    raise ValueError(
                        f"--mesh {self.mesh_spec} needs exactly {n} "
                        f"global devices across the cluster, have "
                        f"{jax.device_count()}")
                mesh = make_multihost_mesh(dp=dp, idx=idx)
            else:
                if len(jax.devices()) < n:
                    raise ValueError(
                        f"--mesh {self.mesh_spec} needs {n} devices, have "
                        f"{len(jax.devices())} (for CPU dev runs set "
                        f"JAX_PLATFORMS=cpu XLA_FLAGS="
                        f"--xla_force_host_platform_device_count={n})")
                mesh = make_mesh(dp=dp, idx=idx, devices=jax.devices()[:n])
            # batch buckets must be dp-multiples (the batch axis splits
            # evenly over dp); round each up and dedupe
            self.buckets = sorted({max(b, dp) + (-max(b, dp)) % dp
                                   for b in self.buckets})
            if streamed:
                # capacity tier x mesh: coarse slabs row-sharded over
                # idx, host refine on this process (one host, many
                # chips — parallel/streamed_mesh.py)
                from ragroute_tpu.parallel import MeshStreamedEngine

                engine = MeshStreamedEngine(
                    shard_set, params, bank, mesh,
                    threshold=threshold, k_refine=self.k_refine)
            else:
                engine = ShardedSearch(
                    shard_set, params, bank, mesh, impl=self.impl,
                    threshold=threshold, nprobe=self.nprobe,
                    k_refine=self.k_refine)
            if self.num_processes > 1:
                from ragroute_tpu.parallel import LockstepEngine

                engine = LockstepEngine(
                    engine, self.buckets, leader=self.process_id == 0)
        elif streamed:
            from ragroute_tpu.engine.streamed import StreamedSearchEngine

            engine = StreamedSearchEngine(
                shard_set, params, bank, threshold=threshold,
                k_refine=self.k_refine, nprobe=self.nprobe)
        else:
            engine = FederatedSearchEngine(
                shard_set, params, bank, impl=self.impl,
                threshold=threshold, nprobe=self.nprobe,
                k_refine=self.k_refine)
        # simulate mode routes to all sources (reference router.py:222-223)
        strategy = "all" if self.simulate else self.routing
        backend = getattr(self, "llm_backend", "auto")
        if backend == "auto":
            backend = ("echo" if (self.simulate or self.disable_llm)
                       else "ollama")
        if backend == "jax":
            from ragroute_tpu.llm.service import (GenerationService,
                                                  demo_service)

            ckpt = getattr(self, "llm_checkpoint", None)
            kv = getattr(self, "llm_kv_quant", None)
            kv_kw = {"cache_dtype": "int8"} if kv == "int8" else {}
            kv_kw.update(temperature=self.llm_temperature,
                         top_k=self.llm_top_k, top_p=self.llm_top_p)
            service = (GenerationService.from_checkpoint(
                ckpt, quantize=getattr(self, "llm_quant", None),
                max_new_tokens=self.llm_max_new, **kv_kw)
                if ckpt else demo_service(
                    max_new_tokens=min(self.llm_max_new, 32), **kv_kw))
            if getattr(self, "llm_serving", "batch") == "continuous":
                from ragroute_tpu.llm.continuous import (
                    ContinuousGenerationService)

                spec = getattr(self, "llm_spec_window", 0)
                # shared-prefix KV: every RAG prompt for a dataset opens
                # with the same rendered constant head (system prompt +
                # template preamble; for wikipedia the in-content raw
                # header too). Derive it empirically as the LCP of two
                # probe builds of the REAL message builder, compute its
                # K/V once, and attend it as a broadcast segment
                # (prompts are validated to extend it at admission).
                prefix = None
                if getattr(self, "llm_prefix_cache", False):
                    from ragroute_tpu.llm.continuous import (
                        shared_prefix_from_messages)

                    prefix = shared_prefix_from_messages(
                        service.tokenizer,
                        self._probe_llm_messages("what is A?", False),
                        self._probe_llm_messages("zz 42 q", True))
                    logger.info("LLM shared-prefix KV: %d tokens",
                                len(prefix))
                # a slot holds prompt + generation + the decode window
                cache_len = (service.prompt_buckets[-1]
                             + service.max_new_tokens + max(spec, 1) + 8)
                service = ContinuousGenerationService(
                    service.params, service.cfg, service.tokenizer,
                    max_new_tokens=service.max_new_tokens,
                    prompt_buckets=service.prompt_buckets,
                    cache_len=cache_len,
                    cache_dtype=service.cache_dtype,
                    temperature=service.temperature,
                    top_k=service.top_k, top_p=service.top_p,
                    eos_id=service.eos_id, pad_id=service.pad_id,
                    spec_window=spec, prefix_ids=prefix)
            llm = LLMClient("jax", service=service)
        else:
            llm = LLMClient(
                backend, delay_s=cfg.LLM_DELAY if self.simulate else 0.0)
        self.server = FederationServer(
            engine,
            strategy=strategy,
            embedding_provider=provider,
            doc_store=doc_store,
            llm=llm,
            model=self.model,
            disable_llm=self.disable_llm,
            simulate=self.simulate,
            relevance_data=relevance,
            port=self.port,
            batcher=QueryBatcher(engine, strategy=strategy,
                                 buckets=self.buckets),
            reuse_port=self.reuse_port,
            data_root=self.data_root,
        )
        return self.server

    async def start(self) -> None:
        if self.server is None:
            self.build()
        logger.info("Starting ragroute-tpu with dataset %s (routing=%s)",
                    self.dataset, self.routing)
        await self.server.start()
        self._watchdog = asyncio.create_task(self._watch())

        loop = asyncio.get_running_loop()
        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                loop.add_signal_handler(
                    sig, lambda: asyncio.create_task(self.stop()))
            except NotImplementedError:  # non-unix
                pass

    async def _watch(self) -> None:
        """Restart the batcher worker if it ever dies (reference watchdog
        only detects and logs dead children, ragroute.py:74-84)."""
        while not self._stopping:
            await asyncio.sleep(WATCHDOG_POLL_S)
            b = self.server.batcher
            if b._task is not None and b._task.done() and not self._stopping:
                exc = b._task.exception() if not b._task.cancelled() else None
                logger.error("batch worker died (%s); restarting", exc)
                await b.start()

    def run_native(self) -> None:
        """Serve through the C++ front-end (``--frontend native``): no
        asyncio — the C++ epoll thread owns the sockets and this (main)
        thread runs the device loop. Blocks until SIGINT/SIGTERM."""
        from ragroute_tpu.engine.native_frontend import (
            NativeFederationServer)

        if self.server is None:
            self.build()
        native = NativeFederationServer(self.server)
        self.native = native
        native.start()
        logger.info(
            "Starting ragroute-tpu with dataset %s (routing=%s, "
            "native front-end)", self.dataset, self.routing)

        def _sig(signum, frame):
            logger.info("signal %s: shutting down native front-end", signum)
            native._running = False
            if native.fe is not None:
                native.fe.shutdown()

        for sig in (signal.SIGINT, signal.SIGTERM):
            try:
                signal.signal(sig, _sig)
            except ValueError:  # non-main thread (tests)
                pass
        try:
            native.serve_forever()
        except KeyboardInterrupt:
            native.stop()
        logger.info("Shutdown complete")

    async def run_forever(self) -> None:
        if self.num_processes > 1 and self.process_id > 0:
            # follower host: no HTTP front-end; join the leader's
            # broadcast step loop until the leader's stop flag
            if self.server is None:
                self.build()
            logger.info("process %d following the lockstep feed",
                        self.process_id)
            await asyncio.to_thread(self.server.engine.follow)
            return
        await self.start()
        while not self._stopping:
            await asyncio.sleep(1.0)

    async def stop(self) -> None:
        if self._stopping:
            return
        self._stopping = True
        logger.info("Shutting down ragroute-tpu serving system")
        if self._watchdog:
            self._watchdog.cancel()
        if self.server:
            await self.server.stop()
            if self.num_processes > 1 and self.process_id == 0:
                # release follower hosts from their broadcast loop
                self.server.engine.stop()
        logger.info("Shutdown complete")


# ---------------------------------------------------------------------------
# Multi-process front-end (SO_REUSEPORT workers)
# ---------------------------------------------------------------------------

def _worker_entry(args_dict: dict) -> None:
    import argparse
    import asyncio as aio

    from ragroute_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()  # spawn'd children don't inherit the parent's
    #                         in-process jit cache; the persistent cache
    #                         keeps N-worker boots from paying N full
    #                         Mosaic compiles per bucket
    args = argparse.Namespace(**args_dict)
    system = ServingSystem(args)
    try:
        if system.frontend == "native":
            system.run_native()
        else:
            aio.run(system.run_forever())
    except KeyboardInterrupt:
        pass


def run_workers(args, n_workers: int) -> None:
    """N full serving processes sharing one HTTP port via SO_REUSEPORT
    (kernel-level connection balancing) — the multi-process front-end for
    multi-core hosts, managed with the reference's child-process
    discipline (spawn, 1 s dead-child watchdog, terminate → join(2s) →
    kill; ``ragroute/ragroute.py:43-54,70-84,110-126``).

    Each worker holds its own engine: on CPU worlds that duplicates host
    RAM; on TPU, point each worker at its own chip (per-process device
    env) — N processes must not share one chip. The single-process path
    (``--workers 1``) remains the default and the measured-baseline
    configuration.
    """
    import multiprocessing as mp
    import time as _time

    if getattr(args, "mutable", False):
        # Each worker would hold an INDEPENDENT mutable ShardSet: a
        # /docs/add lands on whichever worker the kernel balances it to,
        # the other N-1 silently keep serving the old corpus, and
        # /admin/snapshot persists one worker's divergent state. Same
        # class of invalid combination as --mutable + --mesh (which
        # ServingSystem rejects); fail loudly here too.
        raise ValueError(
            "--mutable is a single-process capability (SO_REUSEPORT "
            "workers each hold an independent index copy, so live "
            "updates would apply to only one worker) — drop --workers "
            "or --mutable")

    ctx = mp.get_context("spawn")
    d = dict(vars(args))
    d["reuse_port"] = True
    procs = [ctx.Process(target=_worker_entry, args=(d,))
             for _ in range(n_workers)]
    for p in procs:
        p.start()
    logger.info("started %d SO_REUSEPORT workers: %s",
                n_workers, [p.pid for p in procs])
    reported = set()
    try:
        while any(p.is_alive() for p in procs):
            _time.sleep(WATCHDOG_POLL_S)
            dead = [p for p in procs
                    if not p.is_alive() and p.pid not in reported]
            for p in dead:
                reported.add(p.pid)
                logger.error(
                    "worker %s died (exit %s); capacity degraded to "
                    "%d/%d workers", p.pid, p.exitcode,
                    sum(q.is_alive() for q in procs), n_workers)
    except KeyboardInterrupt:
        pass
    finally:
        for p in procs:
            if p.is_alive():
                p.terminate()
        for p in procs:
            p.join(2)
        for p in procs:
            if p.is_alive():
                p.kill()
                p.join(1)

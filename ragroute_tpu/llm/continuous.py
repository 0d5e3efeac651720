"""Continuous batching for TPU-native generation (slot-based decode).

The lockstep :class:`~ragroute_tpu.llm.service.GenerationService` decodes
each micro-batch to completion, so a request arriving mid-decode waits a
full generation; one long answer also holds back its whole batch. This
module serves generation the way modern LLM servers do — requests JOIN
and LEAVE a persistent decode loop — but TPU-shaped throughout:

* a STATIC number of slots; each slot owns one row of a dense
  ``[L, slots, S, Hkv, Dh]`` KV cache (no paging — XLA wants dense
  static buffers; capacity is slots × S, chosen at construction);
* slot prompts are RIGHT-padded (tokens at cache positions ``[0, len)``),
  so rotary positions equal cache indices and per-slot raggedness is
  carried by one ``counts`` vector;
* decode runs in CHUNKS of C steps under ``lax.scan`` — one device
  dispatch per chunk (the ~27 ms tunnel floor amortizes over C tokens ×
  all slots) — with eos / token-budget deactivation ON DEVICE, so the
  host only reads the small ``[C, slots]`` token block per chunk;
* admission is a jitted scatter-prefill: new prompts are encoded as a
  tiny right-padded batch and their K/V written into the free slots'
  cache rows between chunks;
* OPTIONAL shared-prefix KV (``prefix_ids=``): RAG prompts all open
  with the same rendered system head, so its K/V is computed once and
  attended as a broadcast segment by every slot (one softmax over the
  concatenated score axis — exact, see ``model._attend``). Admission
  prefills only the per-request suffix, cache rows store only suffix
  K/V (capacity += P0 tokens per slot), and each decode step reads the
  prefix block once instead of ``slots``× times.

Decode semantics are identical to the lockstep path (same weights →
same greedy tokens; gated in tests/test_llm_continuous.py).
"""

from __future__ import annotations

import asyncio
import logging
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ragroute_tpu.llm.model import (
    DecoderConfig, _embed_lookup, _inv_freq, _logits, cache_write,
    decode_layers, init_cache, prefill_layers, sample_token,
)
from ragroute_tpu.llm.service import (
    _render_prompt, clamp_budget, encode_prompt, pick_bucket,
    resolve_special_id, validate_sampling,
)

logger = logging.getLogger("llm.continuous")


def shared_prefix_from_messages(tokenizer, msgs_a, msgs_b) -> List[int]:
    """The longest common token prefix of two rendered chats. Computed
    empirically — not ``encode(header)`` — so it is robust to
    tokenizers/templates that merge tokens across the header/content
    boundary: any boundary merge differs between the probes and drops
    out of the common prefix. Feed it two PROBE builds of the serving
    prompt with different questions/docs/options; the result is the
    byte-stable head every real request shares."""
    enc = []
    for msgs in (msgs_a, msgs_b):
        ids = tokenizer.encode(_render_prompt(tokenizer, msgs))
        enc.append(list(ids))
    n = 0
    for a, b in zip(*enc):
        if a != b:
            break
        n += 1
    return enc[0][:n]


def shared_prefix_ids(tokenizer, system: Optional[str]) -> List[int]:
    """Token prefix shared by every chat that opens with ``system``
    (or, for ``None``, by every user-only chat)."""
    def msgs(p):
        return ([{"role": "system", "content": system}] if system
                else []) + [{"role": "user", "content": p}]

    return shared_prefix_from_messages(tokenizer, msgs("0"),
                                       msgs("qqqq zzzz 4242"))


# ---------------------------------------------------------------------------
# Device-side primitives (jitted by the service)
# ---------------------------------------------------------------------------

def prefill_rows(params, cfg: DecoderConfig, ids, lens, prefix_kv=None,
                 pos0: int = 0):
    """Forward a RIGHT-padded prompt batch ``ids [n, P]`` (row b valid in
    ``[0, lens[b])``). Returns (logits at each row's last token [n, V],
    per-layer K [L, n, P, Hkv, Dh], V likewise).

    With a shared prefix (``prefix_kv`` = (K, V) each [L,P0,Hkv,Dh],
    ``pos0`` = P0): rows are the SUFFIXES that follow the prefix —
    rotary positions start at ``pos0`` and every row attends the whole
    prefix before its own causal window."""
    n, p = ids.shape
    inv_freq = jnp.asarray(_inv_freq(cfg))
    iota = jnp.arange(p)
    positions = jnp.broadcast_to(pos0 + iota[None], (n, p))
    valid = iota[None, :] < lens[:, None]                  # [n, P]
    kmask = (jnp.tril(jnp.ones((p, p), bool))[None]
             & valid[:, None, :])                          # [n, P, P]

    h = _embed_lookup(params, ids)
    h, ks, vs = prefill_layers(params, cfg, h, positions, kmask,
                               inv_freq=inv_freq, prefix_kv=prefix_kv)
    # gather each row's last hidden BEFORE the vocab matmul (P× cheaper)
    h_last = jnp.take_along_axis(
        h, (lens - 1)[:, None, None].astype(jnp.int32), axis=1)
    return _logits(params, cfg, h_last)[:, 0], jnp.stack(ks), jnp.stack(vs)


def admit(params, cfg: DecoderConfig, state, ids, lens, slots, budgets,
          temperature: float, eos_id: int, seed, prefix_kv=None,
          pos0: int = 0, top_k: int = 0, top_p: float = 1.0):
    """Prefill ``ids [n, P]`` and install them into cache rows ``slots``
    [n]. Returns (state, first sampled token per admitted prompt [n]).
    With a shared prefix, ``ids`` are the post-prefix SUFFIXES and the
    cache rows hold only suffix K/V (capacity grows by P0 per slot)."""
    cache, counts, last_tok, active, budget, tstep, toks = state
    logits, k_new, v_new = prefill_rows(params, cfg, ids, lens,
                                        prefix_kv=prefix_kv, pos0=pos0)
    p = ids.shape[1]
    ln = jnp.arange(cfg.num_layers)[:, None]

    # scatter the [L, n, P, ...] prompt K/V into the slot rows
    def at_rows(plane, payload):
        return plane.at[ln, slots[None, :], :p].set(payload)

    cache = dict(cache)
    cache_write(cache, "k", k_new, at_rows)
    cache_write(cache, "v", v_new, at_rows)
    key = jax.random.fold_in(jax.random.key(0), seed)
    tok0 = sample_token(logits, key, temperature, top_k, top_p)
    counts = counts.at[slots].set(lens)
    last_tok = last_tok.at[slots].set(tok0)
    alive = (tok0 != eos_id) & (budgets > 0)
    active = active.at[slots].set(alive)
    budget = budget.at[slots].set(jnp.where(alive, budgets, 0))
    toks = toks.at[slots, :p].set(ids)  # token history (drafting source)
    return (cache, counts, last_tok, active, budget, tstep, toks), tok0


def decode_chunk(params, cfg: DecoderConfig, state, steps: int,
                 temperature: float, eos_id: int, pad_id: int,
                 prefix_kv=None, pos0: int = 0, top_k: int = 0,
                 top_p: float = 1.0, track_tokens: bool = True):
    """Run ``steps`` ragged decode steps over every slot. Returns
    (state, tokens [steps, slots] — ``pad_id`` on inactive lanes,
    alive [steps, slots] — whether the lane was active when the token
    was emitted). ``prefix_kv``/``pos0``: see :func:`prefill_rows` —
    the shared prefix block is read ONCE per step (broadcast across
    slots) instead of living in every slot's cache row.
    ``track_tokens=False`` skips the per-step scatter into the
    [slots, cache_len] token-history buffer — only prompt-lookup
    speculative drafting reads it, so the non-spec serving engine
    shouldn't pay the write."""
    inv_freq = jnp.asarray(_inv_freq(cfg))
    s_max = state[0]["k"].shape[2]
    n_slots = state[1].shape[0]
    rows = jnp.arange(n_slots)

    def one_step(carry, _):
        cache, counts, tok, active, budget, tstep, toks = carry
        positions = pos0 + counts[:, None]                # [B, 1]
        iota = jnp.arange(s_max)
        kmask = (iota[None, :] <= counts[:, None])[:, None, :]
        if track_tokens:
            toks = toks.at[rows, counts].set(tok)

        # per-row scatter at each slot's own write position; inactive
        # rows rewrite their current (masked-out-next-admit) position
        def write(cache, li, k, v):
            def at_count(plane, payload):
                return plane.at[li, rows, counts].set(payload)

            cache_write(cache, "k", k[:, 0], at_count)
            cache_write(cache, "v", v[:, 0], at_count)

        h = _embed_lookup(params, tok)[:, None]
        h = decode_layers(params, cfg, h, positions, kmask, cache, write,
                          inv_freq=inv_freq, prefix_kv=prefix_kv)
        logits = _logits(params, cfg, h)[:, 0]

        key = jax.random.fold_in(jax.random.key(1), tstep)
        nxt = sample_token(logits, key, temperature, top_k, top_p)
        nxt = jnp.where(active, nxt, pad_id)
        counts = counts + active.astype(jnp.int32)
        budget = budget - active.astype(jnp.int32)
        done = active & ((nxt == eos_id) | (budget <= 0)
                         | (counts >= s_max - 1))
        new_active = active & ~done
        carry = (cache, counts, nxt, new_active, budget, tstep + 1, toks)
        # `active` (at entry) tells the host whether nxt is a real token;
        # a tracked slot going inactive without eos/budget (cache
        # capacity) must be finished host-side
        return carry, (nxt, active)

    state, (toks, alive) = jax.lax.scan(one_step, state, None,
                                        length=steps)
    return state, toks, alive


# ---------------------------------------------------------------------------
# Service
# ---------------------------------------------------------------------------

class ContinuousGenerationService:
    """Drop-in alternative to ``GenerationService`` (same ``chat()``
    protocol, same tokenizer handling) with slot-based continuous
    batching: requests join the running decode at chunk boundaries
    instead of waiting for the current batch to finish."""

    def __init__(self, params, cfg: DecoderConfig, tokenizer, *,
                 slots: int = 8,
                 cache_len: int = 1024,
                 max_new_tokens: int = 64,
                 prompt_buckets: Sequence[int] = (128, 512),
                 admit_buckets: Sequence[int] = (1, 2, 4),
                 chunk_steps: int = 16,
                 temperature: float = 0.0,
                 top_k: int = 0,
                 top_p: float = 1.0,
                 cache_dtype=jnp.bfloat16,
                 eos_id: Optional[int] = None,
                 pad_id: Optional[int] = None,
                 spec_window: int = 0,
                 prefix_ids: Optional[Sequence[int]] = None):
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.slots = int(slots)
        self.cache_len = int(cache_len)
        # prompt-lookup speculative decoding (speculative.py): each chunk
        # step verifies a spec_window-token window; greedy only
        self.spec_window = int(spec_window)
        if self.spec_window and temperature > 0:
            raise ValueError("speculative decoding is greedy-only "
                             "(temperature must be 0)")
        if self.spec_window < 0 or self.spec_window == 1:
            raise ValueError("spec_window must be 0 (off) or >= 2")
        self.max_new_tokens = int(max_new_tokens)
        self.prompt_buckets = tuple(sorted(int(b) for b in prompt_buckets))
        # a full-bucket prompt must leave room for at least one decode
        # window before the capacity guard fires — otherwise spec-mode
        # scatter positions would clip onto each other (undefined order)
        margin = max(self.spec_window, 1) + 1
        if self.prompt_buckets[-1] + margin >= self.cache_len:
            raise ValueError(
                f"cache_len ({self.cache_len}) must exceed the largest "
                f"prompt bucket ({self.prompt_buckets[-1]}) by more than "
                f"{margin} (prompt + generation share a slot)")
        self.admit_buckets = tuple(sorted(int(b) for b in admit_buckets))
        self.chunk_steps = int(chunk_steps)
        self.temperature = float(temperature)
        self.top_k, self.top_p = validate_sampling(top_k, top_p)
        self.eos_id = resolve_special_id(tokenizer, eos_id,
                                         "eos_token_id", "eos_id")
        self.pad_id = resolve_special_id(tokenizer, pad_id,
                                         "pad_token_id", "pad_id")
        self.cache_dtype = cache_dtype
        # shared-prefix KV: the token head common to every request
        # (e.g. the rendered dataset system prompt). Its K/V is computed
        # ONCE and attended as a broadcast segment by every slot —
        # admission prefills only the suffix, slot cache rows hold only
        # suffix K/V (capacity += P0 per slot), and each decode step
        # reads the prefix block once instead of slots× times.
        self.prefix_ids: Optional[List[int]] = (
            [int(t) for t in prefix_ids] if prefix_ids else None)
        self._prefix_kv = None      # (K, V) [L,P0,Hkv,Dh], built lazily
        self._state = self._fresh_state()
        # host-side slot bookkeeping: None = free
        self._slot_req: List[Optional[dict]] = [None] * self.slots
        self._queue: asyncio.Queue = asyncio.Queue()
        self._task: Optional[asyncio.Task] = None
        self._wake = asyncio.Event()
        self._admit_jit: Dict[Tuple[int, int], object] = {}
        self._chunk_jit = None
        self._seed = 0
        self.generated_tokens = 0
        self.chunks = 0
        self.admissions = 0
        self.spec_steps = 0      # verify steps executed (spec mode)
        self.spec_emitted = 0    # tokens they emitted (mean = accept+1)

    def _fresh_state(self):
        """A blank device state (empty cache, all slots inactive). Also
        the recovery path: the jitted steps DONATE the state buffers, so
        after a failed step the old tuple is deleted/poisoned and must
        be rebuilt before the worker can serve again."""
        cache = init_cache(self.cfg, self.slots, self.cache_len,
                           self.cache_dtype)
        return (cache,
                jnp.zeros((self.slots,), jnp.int32),
                jnp.zeros((self.slots,), jnp.int32),
                jnp.zeros((self.slots,), bool),
                jnp.zeros((self.slots,), jnp.int32),
                jnp.zeros((), jnp.int32),
                jnp.zeros((self.slots, self.cache_len), jnp.int32))

    # -- lifecycle -----------------------------------------------------------

    async def start(self) -> None:
        if self._task is None:
            self._task = asyncio.create_task(self._worker())

    async def stop(self) -> None:
        if self._task is not None:
            self._task.cancel()
            try:
                await self._task
            except asyncio.CancelledError:
                pass
            self._task = None
        # resolve everything still waiting (in a slot or queued) — a
        # caller awaiting chat()/chat_stream() must not hang forever
        leftovers = [r for r in self._slot_req if r is not None]
        self._slot_req = [None] * self.slots
        while not self._queue.empty():
            try:
                leftovers.append(self._queue.get_nowait())
            except asyncio.QueueEmpty:
                break
        for req in leftovers:
            fut = req["future"]
            if not fut.done():
                fut.cancel()
            stream = req.get("stream")
            if stream is not None:
                # a shutdown-truncated stream must not look like a
                # completed generation: carry an explicit error so
                # chat_stream callers see ok=False, matching the
                # CancelledError the non-streaming future raises
                stream.put_nowait(
                    {"final": self.tokenizer.decode(req["tokens"]),
                     "error": "service stopped before completion"})

    # -- API -----------------------------------------------------------------

    def _prefix(self):
        """(K, V) for the shared prefix, each [L, P0, Hkv, Dh] — one
        prefill on first use, reused for the process lifetime."""
        if self._prefix_kv is None:
            ids = jnp.asarray(self.prefix_ids, jnp.int32)[None]
            lens = jnp.asarray([len(self.prefix_ids)], jnp.int32)
            cfg = self.cfg
            _, k, v = jax.jit(
                lambda p, i, n: prefill_rows(p, cfg, i, n))(
                self.params, ids, lens)
            self._prefix_kv = (k[:, 0], v[:, 0])
        return self._prefix_kv

    def _encode_request(self, messages) -> List[int]:
        if self.prefix_ids is None:
            return encode_prompt(self.tokenizer, messages,
                                 self.prompt_buckets[-1])
        ids = self.tokenizer.encode(_render_prompt(self.tokenizer,
                                                   messages))
        if not isinstance(ids, list):
            ids = list(ids)
        p0 = len(self.prefix_ids)
        if ids[:p0] != self.prefix_ids or len(ids) <= p0:
            raise ValueError(
                "prompt does not extend the service's shared prefix "
                f"(prefix len {p0}, prompt len {len(ids)}); build "
                "prompts with the same system head the service was "
                "configured with (shared_prefix_ids)")
        tail = ids[p0:]
        cap = self.prompt_buckets[-1]
        return tail[-cap:] if len(tail) > cap else tail

    def _make_request(self, messages, max_new, **extra) -> dict:
        return {
            "ids": self._encode_request(messages),
            "future": asyncio.get_running_loop().create_future(),
            "tokens": [],
            "max_new": clamp_budget(max_new, self.max_new_tokens),
            **extra,
        }

    async def chat(self, messages: List[Dict[str, str]],
                   max_new: Optional[int] = None) -> str:
        if self._task is None:
            await self.start()
        req = self._make_request(messages, max_new)
        await self._queue.put(req)
        self._wake.set()
        return await req["future"]

    async def chat_stream(self, messages: List[Dict[str, str]],
                          max_new: Optional[int] = None):
        """Streaming variant of :meth:`chat`: an async generator yielding
        text DELTAS as chunks land, then one ``{"final": text}`` dict
        with the authoritative full answer. Deltas are prefix-consistent
        (a delta is withheld while a trailing byte sequence is still an
        incomplete UTF-8 character), so ``"".join(deltas)`` is always a
        prefix of ``final``."""
        if self._task is None:
            await self.start()
        stream: asyncio.Queue = asyncio.Queue()
        req = self._make_request(messages, max_new, stream=stream,
                                 streamed="")
        await self._queue.put(req)
        self._wake.set()
        while True:
            item = await stream.get()
            if isinstance(item, dict):
                yield item
                return
            yield item

    # -- worker --------------------------------------------------------------

    async def _worker(self) -> None:
        loop = asyncio.get_running_loop()
        while True:
            has_active = any(r is not None for r in self._slot_req)
            if not has_active and self._queue.empty():
                self._wake.clear()
                await self._wake.wait()
            try:
                # admission groups are built + futures credited on the
                # LOOP thread; only the jitted calls run in the executor
                for group in self._collect_admissions():
                    tok0 = await loop.run_in_executor(
                        None, self._run_admit, group)
                    for j, req in enumerate(group["reqs"]):
                        self._credit(req, [int(tok0[j])])
                if any(r is not None for r in self._slot_req):
                    if self.spec_window:
                        toks, n_emit = await loop.run_in_executor(
                            None, self._run_chunk_spec)
                        self._process_tokens_spec(toks, n_emit)
                    else:
                        toks, alive = await loop.run_in_executor(
                            None, self._run_chunk)
                        self._process_tokens(toks, alive)
            except Exception as e:  # device/jit failure: fail loudly,
                # resolve every caller, keep the worker alive
                logger.exception("continuous generation step failed")
                for si, req in enumerate(self._slot_req):
                    if req is not None:
                        self._slot_req[si] = None
                        self._fail(req, e)
                while not self._queue.empty():
                    try:
                        self._fail(self._queue.get_nowait(), e)
                    except asyncio.QueueEmpty:
                        break
                # the failed jitted call DONATED the state buffers (or
                # left them error-poisoned); without a rebuild every
                # later admission would re-raise on the deleted arrays
                # and the service would be down until process restart
                self._state = self._fresh_state()
            # yield so chat() callers can enqueue between chunks
            await asyncio.sleep(0)

    def _fail(self, req: dict, exc: Exception) -> None:
        fut = req["future"]
        stream = req.get("stream")
        if stream is not None:
            # streamed callers consume the stream queue, never the
            # future — an exception set there would log "exception was
            # never retrieved"; the error travels in-band instead and
            # the consumer (engine/llm.chat_stream) turns it into the
            # same "Error generating response: ..." the non-streaming
            # path produces
            if not fut.done():
                fut.cancel()
            stream.put_nowait({"final": f"Error generating response: {exc}",
                               "error": str(exc)})
        elif not fut.done():
            fut.set_exception(exc)

    def _collect_admissions(self) -> List[dict]:
        """Drain the queue into EXACT-bucket-size admission groups (no
        padded scatter lanes — duplicate scatter targets have undefined
        order). Leftovers below the smallest bucket still admit as the
        smallest group they fit."""
        free = [i for i, r in enumerate(self._slot_req) if r is None]
        pending: List[dict] = []
        while len(pending) < len(free) and not self._queue.empty():
            try:
                pending.append(self._queue.get_nowait())
            except asyncio.QueueEmpty:
                break
        groups = []
        while pending:
            n = next((b for b in reversed(self.admit_buckets)
                      if b <= len(pending)), self.admit_buckets[0])
            n = min(n, len(pending))
            take, pending = pending[:n], pending[n:]
            p = pick_bucket(self.prompt_buckets,
                            max(len(r["ids"]) for r in take))
            ids = np.full((n, p), self.pad_id, np.int32)
            lens = np.ones((n,), np.int32)
            slot_ids = np.zeros((n,), np.int32)
            for j, req in enumerate(take):
                toks = req["ids"][-p:]
                ids[j, :len(toks)] = toks
                lens[j] = len(toks)
                slot_ids[j] = free.pop(0)
                self._slot_req[slot_ids[j]] = req
            # tok0 (sampled at admit) counts toward the request's
            # max_new, so the device decode budget is max_new - 1 —
            # device and host deactivate at exactly the same token
            groups.append({"reqs": take, "ids": ids, "lens": lens,
                           "slots": slot_ids,
                           "budgets": np.asarray(
                               [r["max_new"] - 1 for r in take],
                               np.int32)})
        return groups

    def _run_admit(self, group: dict) -> np.ndarray:
        n, p = group["ids"].shape
        self._seed += 1
        fn = self._admit_fn(n, p)
        args = (self.params, self._state,
                jnp.asarray(group["ids"]),
                jnp.asarray(group["lens"]),
                jnp.asarray(group["slots"]),
                jnp.asarray(group["budgets"]),
                self._seed)
        if self.prefix_ids is not None:
            args = args + self._prefix()
        self._state, tok0 = fn(*args)
        self.admissions += 1
        return np.asarray(tok0)

    def _chunk_args(self):
        if self.prefix_ids is None:
            return (self.params, self._state)
        return (self.params, self._state) + self._prefix()

    def _run_chunk(self):
        if self._chunk_jit is None:
            cfg, steps = self.cfg, self.chunk_steps
            temp, eos, pad = self.temperature, self.eos_id, self.pad_id
            tk, tp = self.top_k, self.top_p
            p0 = len(self.prefix_ids) if self.prefix_ids else 0

            def run(params, state, pk=None, pv=None):
                pkv = None if pk is None else (pk, pv)
                # this engine only runs with spec_window == 0 (the spec
                # path uses spec_decode_chunk), so skip the token-history
                # scatter that only drafting would read
                return decode_chunk(params, cfg, state, steps, temp, eos,
                                    pad, prefix_kv=pkv, pos0=p0,
                                    top_k=tk, top_p=tp, track_tokens=False)

            self._chunk_jit = jax.jit(run, donate_argnums=(1,))
        self._state, toks, alive = self._chunk_jit(*self._chunk_args())
        self.chunks += 1
        return np.asarray(toks), np.asarray(alive)

    def _admit_fn(self, n: int, p: int):
        fn = self._admit_jit.get((n, p))
        if fn is None:
            cfg, temp, eos = self.cfg, self.temperature, self.eos_id
            tk, tp = self.top_k, self.top_p
            p0 = len(self.prefix_ids) if self.prefix_ids else 0

            def run(params, state, ids, lens, slots, budgets, seed,
                    pk=None, pv=None):
                pkv = None if pk is None else (pk, pv)
                return admit(params, cfg, state, ids, lens, slots,
                             budgets, temp, eos, seed, prefix_kv=pkv,
                             pos0=p0, top_k=tk, top_p=tp)

            fn = jax.jit(run, donate_argnums=(1,))
            self._admit_jit[(n, p)] = fn
        return fn

    def _run_chunk_spec(self):
        if self._chunk_jit is None:
            from ragroute_tpu.llm.speculative import spec_decode_chunk

            cfg, steps = self.cfg, self.chunk_steps
            w, eos, pad = self.spec_window, self.eos_id, self.pad_id
            p0 = len(self.prefix_ids) if self.prefix_ids else 0

            def run(params, state, pk=None, pv=None):
                pkv = None if pk is None else (pk, pv)
                return spec_decode_chunk(params, cfg, state, steps, w,
                                         eos, pad, prefix_kv=pkv, pos0=p0)

            self._chunk_jit = jax.jit(run, donate_argnums=(1,))
        self._state, toks, n_emit = self._chunk_jit(*self._chunk_args())
        self.chunks += 1
        return np.asarray(toks), np.asarray(n_emit)

    def _process_tokens(self, toks: np.ndarray,
                        alive: np.ndarray) -> None:
        """Distribute a [steps, slots] chunk to the owning requests.
        A tracked slot whose lane went inactive mid-chunk without the
        host seeing eos/budget (cache capacity) is finished truncated."""
        for si in range(self.slots):
            req = self._slot_req[si]
            if req is None:
                continue
            real = [int(t) for t, a in zip(toks[:, si], alive[:, si]) if a]
            truncated = not bool(alive[-1, si])
            self._credit(req, real)
            if truncated and self._slot_req[si] is req:
                self._finish(req)  # capacity stop: no eos/budget will come

    def _process_tokens_spec(self, toks: np.ndarray,
                             n_emit: np.ndarray) -> None:
        """Distribute a [steps, slots, window] spec chunk: step s emitted
        ``toks[s, b, :n_emit[s, b]]`` for slot b."""
        steps = toks.shape[0]
        for si in range(self.slots):
            req = self._slot_req[si]
            if req is None:
                continue
            out = []
            for s in range(steps):
                n = int(n_emit[s, si])
                out.extend(int(t) for t in toks[s, si, :n])
                self.spec_steps += n > 0
                self.spec_emitted += n
            self._credit(req, out)
            # a whole chunk with zero emissions means the device lane is
            # inactive (capacity stop) — finish truncated, never hang
            if not out and self._slot_req[si] is req:
                self._finish(req)

    def _credit(self, req: dict, tokens: List[int]) -> None:
        cap = req["max_new"]
        for t in tokens:
            if len(req["tokens"]) >= cap or t == self.eos_id:
                self._finish(req)
                return
            req["tokens"].append(t)
        if len(req["tokens"]) >= cap:
            self._finish(req)
            return
        self._push_stream_delta(req)

    def _push_stream_delta(self, req: dict) -> None:
        stream = req.get("stream")
        if stream is None:
            return
        text = self.tokenizer.decode(req["tokens"])
        # UTF-8 guard: a PARTIAL trailing byte sequence decodes to U+FFFD
        # now but may become a real character next chunk — never emit
        # trailing replacement characters (they'd poison the stream: the
        # completed character no longer extends what was sent). Interior
        # U+FFFD (a permanently invalid byte) flushes as soon as real
        # text follows it.
        while text.endswith("�"):
            text = text[:-1]
        if text.startswith(req["streamed"]):
            delta = text[len(req["streamed"]):]
            if delta:
                stream.put_nowait(delta)
                req["streamed"] = text

    def _finish(self, req: dict) -> None:
        si = next((i for i, r in enumerate(self._slot_req) if r is req),
                  None)
        if si is not None:
            self._slot_req[si] = None
        # req["tokens"] holds only device-credited live tokens (inactive
        # lanes are filtered by the alive flag / n_emit before _credit),
        # so every entry is genuine sample output — including any that
        # happen to equal pad_id under tokenizers where pad aliases a
        # real token. Stripping them here would delete answer text and
        # break the deltas-are-a-prefix-of-final stream contract.
        row = list(req["tokens"])
        text = self.tokenizer.decode(row)
        fut = req["future"]
        if not fut.done():
            self.generated_tokens += len(row)
            fut.set_result(text)
        stream = req.get("stream")
        if stream is not None:
            stream.put_nowait({"final": text})


def demo_continuous_service(seed: int = 0, **kw):
    """Continuous-batching twin of ``service.demo_service``."""
    from ragroute_tpu.llm.model import init_decoder_params
    from ragroute_tpu.llm.service import DEMO_CFG, ByteTokenizer

    tok = ByteTokenizer()
    params = init_decoder_params(jax.random.key(seed), DEMO_CFG)
    kw.setdefault("prompt_buckets", (128, 512))
    kw.setdefault("cache_len", 768)
    kw.setdefault("max_new_tokens", 32)
    kw.setdefault("cache_dtype", jnp.float32)
    return ContinuousGenerationService(
        params, DEMO_CFG, tok, eos_id=tok.eos_id, pad_id=tok.pad_id, **kw)

"""On-device prompt-lookup speculative decoding for the slot engine.

RAG answers quote the retrieved context, so the cheapest possible draft
model — "find the current bigram earlier in this slot's own token
history and copy what followed it" (prompt-lookup decoding / LLMA) — has
high acceptance exactly where this framework generates. Everything runs
INSIDE the decode scan, so one device dispatch still covers a whole
chunk:

* draft: each slot matches its last two tokens against its history
  (``toks`` in the slot state; one vectorized compare over the cache
  axis, latest match wins) and copies the following W−1 tokens;
* verify: ONE forward over the W-token window (the fed last-token plus
  the drafts) with per-slot ragged positions — logits at window position
  j are the model's next-token distribution after draft j, so the
  longest prefix of drafts that equals the greedy argmax chain is
  accepted, plus one bonus token;
* commit: accepted tokens' K/V are already in cache (they were fed);
  rejected entries lie beyond the advanced ``counts`` and are masked by
  every future key-validity mask, then overwritten.

Greedy-exactness is the core property: speculative decode emits the
IDENTICAL token stream as plain greedy decode — drafts only shortcut
computation, never change it (gated in tests/test_llm_speculative.py).
Greedy only: temperature sampling would need rejection-sampling
verification; the service asserts ``temperature == 0`` in spec mode.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ragroute_tpu.llm.model import (
    DecoderConfig, _embed_lookup, _inv_freq, _logits, cache_write,
    decode_layers,
)


def draft_from_history(toks, counts, window: int):
    """Prompt-lookup draft: for each row, find the LATEST earlier
    occurrence of the bigram ``(toks[c-1], toks[c])`` (the current tail
    of the history, c = counts) and copy the ``window-1`` tokens that
    followed it.

    toks: [B, S] token history (valid in [0, c]); counts: [B].
    Returns drafts [B, window-1] int32 (arbitrary tokens when no match —
    verification makes any draft safe)."""
    b, s = toks.shape
    iota = jnp.arange(s)
    t1 = jnp.take_along_axis(
        toks, jnp.maximum(counts - 1, 0)[:, None], axis=1)  # [B, 1]
    t2 = jnp.take_along_axis(toks, counts[:, None], axis=1)
    nxt = jnp.concatenate([toks[:, 1:], toks[:, -1:]], axis=1)
    # match at j: (toks[j], toks[j+1]) == (t1, t2), far enough from the
    # tail that the whole window-1 continuation toks[j+2 : j+window+1]
    # is KNOWN history (a match hugging the tail would draft stale
    # tokens and cap acceptance at its distance from the end)
    match = ((toks == t1) & (nxt == t2)
             & (iota[None, :] + window <= counts[:, None]))
    m = jnp.max(jnp.where(match, iota[None, :], -1), axis=1)  # [B]
    src = m[:, None] + 2 + jnp.arange(window - 1)[None, :]
    # clamp into the valid history so no-match / short-tail rows read
    # in-bounds; their drafts are arbitrary but verification is exact
    src = jnp.clip(src, 0, s - 1)
    return jnp.take_along_axis(toks, src, axis=1).astype(jnp.int32)


def spec_decode_chunk(params, cfg: DecoderConfig, state, steps: int,
                      window: int, eos_id: int, pad_id: int,
                      prefix_kv=None, pos0: int = 0):
    """``steps`` speculative verify-steps over every slot (one device
    dispatch). Each step drafts ``window-1`` tokens from the slot's own
    history and verifies the whole window in one forward; 1..window
    tokens commit per step per slot.

    Returns (state, tokens [steps, slots, window], n_emitted
    [steps, slots]) — row-major: step s emits ``tokens[s, b, :n[s, b]]``.

    ``prefix_kv``/``pos0``: shared-prefix serving (continuous.py) — slot
    histories hold only post-prefix tokens, rotary positions offset by
    ``pos0``, every verify window attends the shared prefix block.
    Drafting matches bigrams against the SUFFIX history only (prefix
    tokens are not a drafting source; acceptance is unaffected since
    verification is exact either way)."""
    inv_freq = jnp.asarray(_inv_freq(cfg))
    s_max = state[0]["k"].shape[2]
    n_slots = state[1].shape[0]
    rows = jnp.arange(n_slots)
    w = window
    iw = jnp.arange(w)

    def one_step(carry, _):
        cache, counts, tok, active, budget, tstep, toks = carry
        # the fed token enters the history at its position first, so the
        # draft bigram is (toks[c-1], toks[c])
        toks = toks.at[rows, counts].set(tok)
        drafts = draft_from_history(toks, counts, w)       # [B, w-1]
        fed = jnp.concatenate([tok[:, None], drafts], axis=1)  # [B, w]
        toks = toks.at[rows[:, None],
                       jnp.clip(counts[:, None] + 1 + iw[None, :w - 1],
                                0, s_max - 1)].set(drafts)

        slot_positions = counts[:, None] + iw[None, :]     # [B, w]
        positions = pos0 + slot_positions
        iota = jnp.arange(s_max)
        kmask = (iota[None, None, :]
                 <= slot_positions[:, :, None])            # [B, w, S]

        slot_pos = jnp.clip(slot_positions, 0, s_max - 1)

        def write(cache, li, k, v):
            def at_window(plane, payload):
                return plane.at[li, rows[:, None], slot_pos].set(payload)

            cache_write(cache, "k", k, at_window)
            cache_write(cache, "v", v, at_window)

        h = _embed_lookup(params, fed)                     # [B, w, D]
        h = decode_layers(params, cfg, h, positions, kmask, cache, write,
                          inv_freq=inv_freq, prefix_kv=prefix_kv)
        logits = _logits(params, cfg, h)                   # [B, w, V]
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)

        # accept the longest prefix of drafts matching the greedy chain
        ok = (drafts == greedy[:, :w - 1])                 # [B, w-1]
        prefix = jnp.cumprod(ok.astype(jnp.int32), axis=1)
        n_emit = 1 + jnp.sum(prefix, axis=1)               # [B] 1..w
        # truncate at the first emitted eos
        emit_mask = iw[None, :] < n_emit[:, None]
        is_eos = (greedy == eos_id) & emit_mask
        first_eos = jnp.min(jnp.where(is_eos, iw[None, :], w), axis=1)
        n_emit = jnp.minimum(n_emit, first_eos + 1)
        # budget / capacity caps (exact: never emit past the budget)
        n_emit = jnp.minimum(n_emit, budget)
        n_emit = jnp.where(active, n_emit, 0)

        emit_mask = iw[None, :] < n_emit[:, None]
        out = jnp.where(emit_mask, greedy, pad_id)
        last = jnp.take_along_axis(
            out, jnp.maximum(n_emit - 1, 0)[:, None], axis=1)[:, 0]
        tok_next = jnp.where(active & (n_emit > 0), last, tok)
        counts = counts + n_emit
        budget = budget - n_emit
        done = active & ((first_eos < w) | (budget <= 0)
                         | (counts >= s_max - w - 1))
        active = active & ~done
        carry = (cache, counts, tok_next, active, budget, tstep + 1, toks)
        return carry, (out, n_emit)

    state, (toks_out, n_out) = jax.lax.scan(one_step, state, None,
                                            length=steps)
    return state, toks_out, n_out

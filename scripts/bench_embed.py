"""Measure the serving-path win of micro-batched query encoding.

``--embedder zoo`` serving routes concurrent queries through
:class:`ragroute_tpu.engine.embedding.EmbeddingBatcher`: one padded
``[B, L]`` encoder forward per bucket instead of B size-1 forwards
(the reference encodes serve-time queries strictly one at a time,
``router.py:285-303``). This script quantifies that choice on the real
chip with a BERT-base-shaped random-weight JAX encoder (values don't
affect speed; no network for real checkpoints): wall time of B serial
size-1 forwards vs one size-B forward.

Run on the TPU: ``python scripts/bench_embed.py`` (env knobs
``RAGROUTE_BENCH_EMBED_{LAYERS,HIDDEN,LEN,REPS}``). Note the serial
path pays the ~27 ms tunnel dispatch floor PER QUERY on this setup; the
per-batch device-time ratio is the colocated-host story and is printed
separately.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from ragroute_tpu.encoders.bert import (
        bert_encode, config_from_hf, params_from_torch_bert, pool)

    layers = int(os.environ.get("RAGROUTE_BENCH_EMBED_LAYERS", "12"))
    hidden = int(os.environ.get("RAGROUTE_BENCH_EMBED_HIDDEN", "768"))
    seq = int(os.environ.get("RAGROUTE_BENCH_EMBED_LEN", "128"))
    reps = int(os.environ.get("RAGROUTE_BENCH_EMBED_REPS", "10"))

    # random torch BertModel -> the tested converter (values are
    # irrelevant to speed; the shape is bert-base by default)
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(
        vocab_size=30522, hidden_size=hidden, num_hidden_layers=layers,
        num_attention_heads=hidden // 64, intermediate_size=hidden * 4,
        max_position_embeddings=512, type_vocab_size=2)
    cfg = config_from_hf(hf_cfg)
    params = params_from_torch_bert(
        BertModel(hf_cfg).state_dict(), cfg)

    @jax.jit
    def encode(params, ids, mask):
        outs = bert_encode(params, cfg, ids, mask, jnp.zeros_like(ids))
        emb = pool(outs, mask, "mean").astype(jnp.float32)
        return emb / jnp.maximum(
            jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)

    params_bf16 = jax.tree.map(
        lambda x: (x.astype(jnp.bfloat16)
                   if x.dtype == jnp.float32 else x), params)

    rng = np.random.default_rng(0)
    print(f"BERT shape: L={layers} H={hidden} seq={seq} "
          f"(bert-base ~ L=12 H=768)")
    for tag, p in (("f32", params),
                   ("bf16 (serving default)", params_bf16)):
        results = {}
        for b in (1, 8, 32):
            ids = jnp.asarray(rng.integers(1000, 20000, (b, seq)),
                              jnp.int32)
            mask = jnp.ones((b, seq), jnp.int32)
            float(encode(p, ids, mask)[0, 0])  # compile + sync
            t0 = time.time()
            for r in range(reps):
                # distinct inputs each rep (tunnel-safe timing: the
                # final float() forces a sync through async dispatch)
                out = encode(p, (ids + r) % 30000, mask)
            float(out[0, 0])
            dt = (time.time() - t0) / reps
            results[b] = dt
            print(f"  {tag} B={b:3d}: {dt * 1e3:8.2f} ms/forward  "
                  f"({dt / b * 1e3:7.2f} ms/query)")
        serial32 = results[1] * 32
        print(f"  {tag}: 32 queries serial = {serial32 * 1e3:.1f} ms, "
              f"one [32] forward = {results[32] * 1e3:.1f} ms -> "
              f"{serial32 / results[32]:.1f}x")


if __name__ == "__main__":
    main()

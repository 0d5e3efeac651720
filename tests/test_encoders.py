"""Encoder parity: the pure-JAX BERT vs torch transformers BertModel."""

import numpy as np
import pytest

import jax.numpy as jnp

from ragroute_tpu.encoders.bert import (
    BertConfig,
    bert_encode,
    config_from_hf,
    params_from_torch_bert,
    pool,
)
from ragroute_tpu.encoders.registry import ENCODER_SPECS
from ragroute_tpu.encoders.zoo import EncoderZoo, HashEncoder


@pytest.fixture(scope="module")
def tiny_torch_bert():
    import torch
    from transformers import BertConfig as HFBertConfig, BertModel

    torch.manual_seed(0)
    hf_cfg = HFBertConfig(
        vocab_size=128, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=64, type_vocab_size=2)
    model = BertModel(hf_cfg)
    model.eval()
    return model, hf_cfg


def test_bert_matches_torch(tiny_torch_bert, rng):
    import torch

    model, hf_cfg = tiny_torch_bert
    cfg = config_from_hf(hf_cfg)
    params = params_from_torch_bert(model.state_dict(), cfg)

    bsz, seq = 3, 16
    ids = rng.integers(0, 128, (bsz, seq)).astype(np.int64)
    # ragged attention masks incl. fully padded tail
    mask = np.ones((bsz, seq), np.int64)
    mask[0, 10:] = 0
    mask[1, 5:] = 0
    types = rng.integers(0, 2, (bsz, seq)).astype(np.int64)

    with torch.no_grad():
        want = model(
            input_ids=torch.from_numpy(ids),
            attention_mask=torch.from_numpy(mask),
            token_type_ids=torch.from_numpy(types))
    outs = bert_encode(
        params, cfg, jnp.asarray(ids, jnp.int32),
        jnp.asarray(mask, jnp.int32), jnp.asarray(types, jnp.int32))

    got_h = np.asarray(outs["last_hidden"])
    want_h = want.last_hidden_state.numpy()
    # only compare unmasked positions (masked positions are unused
    # downstream and torch computes them with different padding effects)
    for b in range(bsz):
        n = mask[b].sum()
        np.testing.assert_allclose(
            got_h[b, :n], want_h[b, :n], rtol=1e-3, atol=1e-4)

    got_p = np.asarray(outs["pooler"])
    np.testing.assert_allclose(
        got_p, want.pooler_output.numpy(), rtol=1e-3, atol=1e-4)


def test_pooling_modes(rng):
    bsz, seq, h = 2, 8, 4
    hid = rng.standard_normal((bsz, seq, h)).astype(np.float32)
    mask = np.ones((bsz, seq), np.int32)
    mask[0, 5:] = 0
    outs = {"last_hidden": jnp.asarray(hid), "cls": jnp.asarray(hid[:, 0])}
    m = jnp.asarray(mask)

    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "cls")), hid[:, 0], rtol=1e-6)

    want_mean0 = hid[0, :5].mean(0)
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "mean"))[0], want_mean0, rtol=1e-5)

    # weightedmean: position weights 1..n (SGPT scheme)
    w = np.arange(1, 6)[:, None]
    want_wm0 = (hid[0, :5] * w).sum(0) / w.sum()
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "weightedmean"))[0], want_wm0, rtol=1e-5)

    # lasttoken: last unmasked position
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "lasttoken"))[0], hid[0, 4], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(pool(outs, m, "lasttoken"))[1], hid[1, 7], rtol=1e-6)


def test_registry_covers_all_world_encoders():
    from ragroute_tpu.config import WORLDS

    for world in WORLDS.values():
        for src in world.sources:
            spec = ENCODER_SPECS[src.encoder]
            assert spec.dim == src.embed_dim, (src.name, src.encoder)


def test_zoo_hash_fallback_offline():
    """With no weights downloadable, the zoo degrades to hash embeddings
    with correct dims and flags the backend."""
    from ragroute_tpu.config import get_world

    world = get_world("medrag")
    zoo = EncoderZoo(world, prefer="hash")
    embs = zoo.encode_query("what is diabetes")
    assert set(embs) == set(world.encoders)
    for enc, v in embs.items():
        assert v.shape == (ENCODER_SPECS[enc].dim,)
    assert all(b == "hash" for b in zoo.backends.values())
    # deterministic
    embs2 = zoo.encode_query("what is diabetes")
    np.testing.assert_array_equal(embs[world.encoders[0]],
                                  embs2[world.encoders[0]])


def test_hash_encoder_normalization():
    spec = ENCODER_SPECS["e5-base"]
    enc = HashEncoder(spec)
    v = enc.encode(["a", "b"])
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, rtol=1e-5)

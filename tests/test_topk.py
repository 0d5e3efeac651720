"""Exactness tests for the top-k scoring ops against a numpy oracle.

These are the recall-parity gate (SURVEY.md §7 step 2): every implementation
must reproduce a brute-force FAISS-flat-style search exactly.

Index-exact comparisons use integer-valued embeddings so the f32 matmul is
bit-exact in any accumulation order; float tests check score-equivalence
(the returned set achieves the oracle's top-k scores within tolerance),
since XLA and numpy legitimately differ in near-tie ordering.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ragroute_tpu.ops import chunked_topk, exact_topk, pallas_topk, shard_topk
from ragroute_tpu.ops.topk import NEG_INF


def numpy_oracle(q, docs, k, mode, valid=None):
    """Reference brute-force search identical to a FAISS flat index."""
    q = np.asarray(q, np.float32)
    docs = np.asarray(docs, np.float32)
    n = docs.shape[0]
    valid = n if valid is None else valid
    if mode == "dot":
        scores = q @ docs.T
        order_desc = True
    elif mode == "cos":
        qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        scores = qn @ docs.T  # docs pre-normalized by caller
        order_desc = True
    elif mode == "l2":
        scores = (
            (q * q).sum(1, keepdims=True)
            + (docs * docs).sum(1)[None, :]
            - 2.0 * q @ docs.T
        )
        order_desc = False
    if valid < n:
        scores[:, valid:] = -np.inf if order_desc else np.inf
    key = -scores if order_desc else scores
    # stable sort → ties broken by lower doc index, like FAISS flat.
    idx = np.argsort(key, axis=1, kind="stable")[:, :k]
    out_scores = np.take_along_axis(scores, idx, axis=1)
    return out_scores, idx


def int_data(rng, b, n, d):
    """Small-integer embeddings: f32 dot products are exact."""
    q = rng.integers(-4, 5, size=(b, d)).astype(np.float32)
    docs = rng.integers(-4, 5, size=(n, d)).astype(np.float32)
    return q, docs


IMPLS = ["exact", "chunked", "pallas"]


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_topk_index_exact(rng, impl, mode):
    b, n, d, k = 16, 3000, 64, 32
    q, docs = int_data(rng, b, n, d)

    want_s, want_i = numpy_oracle(q, docs, k, mode)
    got_s, got_i = shard_topk(
        jnp.asarray(q), jnp.asarray(docs), k, mode=mode, impl=impl,
        chunk=512,
    )
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_s), want_s, rtol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
def test_topk_cos_score_equivalent(rng, impl):
    """Float data: the returned set must achieve the oracle's top-k scores."""
    b, n, d, k = 8, 2500, 48, 10
    q = rng.standard_normal((b, d)).astype(np.float32)
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs = docs / np.linalg.norm(docs, axis=1, keepdims=True)

    want_s, _ = numpy_oracle(q, docs, k, "cos")
    got_s, got_i = shard_topk(
        jnp.asarray(q), jnp.asarray(docs), k, mode="cos", impl=impl,
        chunk=512,
    )
    got_s, got_i = np.asarray(got_s), np.asarray(got_i)
    # scores sorted descending and matching oracle values
    assert (np.diff(got_s, axis=1) <= 1e-6).all()
    np.testing.assert_allclose(got_s, want_s, rtol=1e-4, atol=1e-5)
    # returned indices really do score what was reported
    qn = q / np.linalg.norm(q, axis=1, keepdims=True)
    true = np.take_along_axis(qn @ docs.T, got_i, axis=1)
    np.testing.assert_allclose(got_s, true, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
def test_topk_padding_mask(rng, impl):
    """Padded (invalid) documents must never appear in results."""
    b, n, d, k, valid = 4, 1024, 32, 10, 700
    q, docs = int_data(rng, b, n, d)
    # make the padding region maximally attractive
    docs[valid:] = 100.0

    got_s, got_i = shard_topk(
        jnp.asarray(q), jnp.asarray(docs), k, mode="dot",
        valid_docs=valid, impl=impl, chunk=256,
    )
    assert np.asarray(got_i).max() < valid
    _, want_i = numpy_oracle(q, docs, k, "dot", valid=valid)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


@pytest.mark.parametrize("impl", IMPLS)
def test_topk_ties_break_low_index(impl):
    """Duplicate documents: ties resolve to the lower index (FAISS parity)."""
    d, k = 8, 4
    base = np.eye(1, d, dtype=np.float32)  # [1, d]
    docs = np.zeros((512, d), np.float32)
    # identical best docs at indices 7, 100, 300
    for i in (7, 100, 300):
        docs[i] = base
    q = base.copy()
    _, got_i = shard_topk(
        jnp.asarray(q), jnp.asarray(docs), k, mode="dot", impl=impl,
        chunk=128,
    )
    got = np.asarray(got_i)[0]
    assert list(got[:3]) == [7, 100, 300]


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_topk_k_exceeds_tile_boundaries(rng, mode):
    """Results spread across many chunks/tiles still come back exact."""
    b, n, d, k = 3, 5000, 16, 64
    q, docs = int_data(rng, b, n, d)
    _, want_i = numpy_oracle(q, docs, k, mode)
    _, got_i = chunked_topk(
        jnp.asarray(q), jnp.asarray(docs), k, mode=mode, chunk=500)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


def test_topk_batch_not_tile_multiple(rng):
    """Odd batch sizes (device padding) behave identically."""
    b, n, d, k = 5, 2048, 32, 8
    q, docs = int_data(rng, b, n, d)
    _, want_i = numpy_oracle(q, docs, k, "dot")
    _, got_i = pallas_topk(jnp.asarray(q), jnp.asarray(docs), k, mode="dot")
    np.testing.assert_array_equal(np.asarray(got_i), want_i)


def test_pallas_same_bin_collision(rng):
    """Two top-k elements in the SAME bin of the same tile (col ≡ col' mod
    128 within one doc tile) exercise the binned merge's rebuild path."""
    n, d, k = 2048, 32, 4
    q = np.zeros((1, d), np.float32)
    q[0, 0] = 1.0
    docs = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    # same bin (lane 5), same tile: cols 5, 133, 261; plus one elsewhere
    docs[5, 0] = 10.0
    docs[133, 0] = 9.5
    docs[261, 0] = 9.0
    docs[700, 0] = 8.0
    s, i = pallas_topk(jnp.asarray(q), jnp.asarray(docs), k, mode="dot")
    assert list(np.asarray(i)[0]) == [5, 133, 261, 700]
    np.testing.assert_allclose(np.asarray(s)[0, :4], [10, 9.5, 9, 8],
                               rtol=1e-4)


def test_int8_scale_topk(rng):
    """int8-quantized docs with per-doc dequant scales: high recall vs f32."""
    b, n, d, k = 8, 4096, 64, 32
    q = rng.standard_normal((b, d)).astype(np.float32)
    docs = rng.standard_normal((n, d)).astype(np.float32)
    s_row = np.abs(docs).max(axis=1) / 127.0
    docs_q = np.clip(np.round(docs / s_row[:, None]), -127, 127)

    want_s, want_i = numpy_oracle(q, docs, k, "dot")
    for impl in IMPLS:
        got_s, got_i = shard_topk(
            jnp.asarray(q), jnp.asarray(docs_q, jnp.int8), k, mode="dot",
            scale=jnp.asarray(s_row, jnp.float32), impl=impl, chunk=512)
        got_i = np.asarray(got_i)
        recall = np.mean([
            len(set(got_i[r]) & set(want_i[r])) / k for r in range(b)])
        assert recall >= 0.95, (impl, recall)
        # dequantized scores close to true scores
        true = np.take_along_axis(q @ docs.T, got_i, axis=1)
        np.testing.assert_allclose(np.asarray(got_s), true, rtol=0.05,
                                   atol=0.3)


def test_int4_pack_unpack_roundtrip(rng):
    """_pack_int4 and unpack_int4 are exact inverses over all 15 levels."""
    from ragroute_tpu.index.shard import _pack_int4, _quantize_sym
    from ragroute_tpu.ops.topk import unpack_int4

    docs = rng.standard_normal((257, 62)).astype(np.float32)
    codes, _ = _quantize_sym(docs, 7)
    got = np.asarray(unpack_int4(jnp.asarray(_pack_int4(codes))))
    np.testing.assert_array_equal(got, codes)
    # every code value survives, incl. negative extremes in both nibbles
    edge = np.tile(np.arange(-7, 8, dtype=np.int8), (4, 2))[:, :30]
    np.testing.assert_array_equal(
        np.asarray(unpack_int4(jnp.asarray(_pack_int4(edge)))), edge)


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_int4_packed_topk_all_impls_agree(rng, mode):
    """packed4 search is INDEX-EXACT across every impl (incl. the Pallas
    in-kernel nibble unpack): integer-valued queries/codes and
    power-of-two scales make every product exact in both f32 and the
    kernel's bf16-operand path, so the oracle comparison is bit-strict."""
    from ragroute_tpu.index.shard import _pack_int4
    from ragroute_tpu.ops.topk import unpack_int4

    b, n, d, k = 8, 4096, 64, 16
    q = rng.integers(-8, 9, size=(b, d)).astype(np.float32)
    codes = rng.integers(-7, 8, size=(n, d)).astype(np.int8)
    s_row = np.exp2(rng.integers(-3, 4, size=n)).astype(np.float32)
    packed = _pack_int4(codes)
    scale = jnp.asarray(s_row)
    deq = codes.astype(np.float32) * s_row[:, None]
    bias = (jnp.asarray(-np.einsum("nd,nd->n", deq, deq))
            if mode == "l2" else None)

    want_s, want_i = shard_topk(
        jnp.asarray(q), jnp.asarray(unpack_int4(jnp.asarray(packed))), k,
        mode=mode, scale=scale, bias=bias, impl="exact")
    for impl in IMPLS:
        got_s, got_i = shard_topk(
            jnp.asarray(q), jnp.asarray(packed), k, mode=mode,
            scale=scale, bias=bias, impl=impl, chunk=512, packed4=True)
        np.testing.assert_array_equal(
            np.asarray(got_i), np.asarray(want_i), err_msg=f"{impl} {mode}")
        np.testing.assert_allclose(
            np.asarray(got_s), np.asarray(want_s), rtol=1e-6)
    # and vs the f32 numpy oracle on the dequantized docs: same winners
    true_s, true_i = numpy_oracle(q, deq, k, mode)
    np.testing.assert_array_equal(np.asarray(want_i), true_i)


@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_int4_grouped_scales_all_impls_agree(rng, mode):
    """Per-GROUP int4 scales ([n, G], config.INT4_GROUP_DIMS groups):
    every impl — incl. the Pallas kernel's fused group dequant during
    the nibble unpack — must index-match the f32 oracle over the
    group-dequantized docs. Power-of-two scales keep products exact in
    the kernel's bf16 path, so the comparison is bit-strict."""
    from ragroute_tpu.index.shard import _pack_int4
    from ragroute_tpu.ops.topk import unpack_int4

    b, n, d, k, gdims = 8, 4096, 256, 16, 128
    g = d // gdims
    q = rng.integers(-8, 9, size=(b, d)).astype(np.float32)
    codes = rng.integers(-7, 8, size=(n, d)).astype(np.int8)
    s_grp = np.exp2(rng.integers(-3, 4, size=(n, g))).astype(np.float32)
    packed = _pack_int4(codes)
    deq = codes.astype(np.float32) * np.repeat(s_grp, gdims, axis=1)
    bias = (jnp.asarray(-np.einsum("nd,nd->n", deq, deq))
            if mode == "l2" else None)

    true_s, true_i = numpy_oracle(q, deq, k, mode)
    for impl in IMPLS:
        got_s, got_i = shard_topk(
            jnp.asarray(q), jnp.asarray(packed), k, mode=mode,
            scale=jnp.asarray(s_grp), bias=bias, impl=impl, chunk=512,
            packed4=True)
        np.testing.assert_array_equal(
            np.asarray(got_i), true_i, err_msg=f"{impl} {mode}")
        np.testing.assert_allclose(np.asarray(got_s), true_s, rtol=1e-5)


@pytest.mark.parametrize("impl", IMPLS)
@pytest.mark.parametrize("mode", ["dot", "l2"])
def test_topk_float_ties_across_tiles(rng, impl, mode):
    """Real float embeddings with bit-identical duplicate docs scattered
    across chunk/tile boundaries: tie groups return lowest-index-first
    (FAISS IndexFlat semantics, reference data_source.py:69-80).
    Identical rows produce bit-identical f32 scores under any fixed
    contraction order, so this is exact even for floats. faiss-cpu is not
    installed in this image; the documented lowest-index tie-break IS the
    parity gate."""
    b, n, d, k = 2, 4096, 32, 16
    q = rng.standard_normal((b, d)).astype(np.float32)
    docs = rng.standard_normal((n, d)).astype(np.float32) * 0.1
    # a clearly-winning duplicate group scattered across distant tiles
    group = [37, 900, 2055, 3500]
    proto = (q[0] / np.linalg.norm(q[0])) * 7.3
    for i in group:
        docs[i] = proto
    _, got_i = shard_topk(
        jnp.asarray(q), jnp.asarray(docs), k, mode=mode, impl=impl,
        chunk=512)
    got0 = list(np.asarray(got_i)[0])
    pos = [got0.index(i) for i in group]
    assert pos == sorted(pos), (got0, group)
    if mode == "dot":
        assert got0[:4] == group  # top scores → first four, index order


@pytest.mark.parametrize("impl", IMPLS)
def test_topk_float_tie_group_straddles_k_boundary(impl):
    """A 5-way float tie where only 3 slots remain in the top-k must
    return exactly the 3 lowest indices of the group (FAISS heap
    semantics with lowest-index preference)."""
    n, d, k = 2048, 16, 16
    q = np.ones((1, d), np.float32)
    docs = np.zeros((n, d), np.float32)
    rng = np.random.default_rng(7)
    # 13 distinct clear winners
    winners = rng.choice(n, size=13, replace=False)
    for rank, i in enumerate(sorted(winners)):
        docs[i, 0] = 30.0 - rank
    # 5-way tie at score 5.3 — only 3 fit in k=16
    tie_group = [11, 600, 1025, 1500, 2000]
    tie_group = [i for i in tie_group if i not in set(winners.tolist())]
    for i in tie_group[:5]:
        docs[i, 0] = 5.3
    _, got_i = shard_topk(
        jnp.asarray(q), jnp.asarray(docs), k, mode="dot", impl=impl,
        chunk=512)
    got = set(np.asarray(got_i)[0].tolist())
    n_fit = k - 13
    want_in = set(tie_group[:n_fit])
    want_out = set(tie_group[n_fit:])
    assert want_in <= got and not (want_out & got), (
        sorted(got), tie_group)


def test_stream_topk_matches_lax_topk(rng):
    """pallas_stream_topk == lax.top_k on a dense gain matrix, including
    position tie-breaks and NEG_INF invalid-row handling."""
    from ragroute_tpu.ops.pallas_topk import pallas_stream_topk

    b, m, k = 24, 3000, 16
    gains = rng.standard_normal((b, m)).astype(np.float32)
    gains[3] = NEG_INF  # fully-invalid row
    gains[5, 100:] = NEG_INF
    import jax

    g, pos = pallas_stream_topk(jnp.asarray(gains), k)
    g_ref, pos_ref = jax.lax.top_k(jnp.asarray(gains), k)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-6)
    valid = np.asarray(g_ref) > NEG_INF
    np.testing.assert_array_equal(
        np.asarray(pos)[valid], np.asarray(pos_ref)[valid])


def test_stream_topk_tie_positions(rng):
    """Duplicate gains across tile boundaries: lowest position wins,
    tie groups ordered position-ascending (FAISS parity semantics)."""
    from ragroute_tpu.ops.pallas_topk import pallas_stream_topk

    b, m, k = 8, 2048, 8
    gains = rng.integers(-3, 3, size=(b, m)).astype(np.float32)
    import jax

    g, pos = pallas_stream_topk(jnp.asarray(gains), k)
    g_ref, pos_ref = jax.lax.top_k(jnp.asarray(gains), k)
    np.testing.assert_array_equal(np.asarray(g), np.asarray(g_ref))
    np.testing.assert_array_equal(np.asarray(pos), np.asarray(pos_ref))

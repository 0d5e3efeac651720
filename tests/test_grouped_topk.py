"""Probed coarse scan (ops/grouped_topk.py) parity gates.

Full probe (nprobe == C) must reproduce the flat coarse scan's
candidate set — same codes, scales and biases, only the layout and the
merge path differ. Partial probes are recall-gated on cluster-structured
data (the regime the hostrefine tier serves).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ragroute_tpu.ops.grouped_topk import (ClusteredCoarse,
                                           cluster_coarse_slab,
                                           coarse_probe_topk)
from ragroute_tpu.ops.topk import shard_topk


def _slab(n=3000, r=32, b=16, seed=0, clusters=8, l2_bias=False):
    rng = np.random.default_rng(seed)
    # cluster-structured rows (mixture of Gaussians) like a real corpus
    centers = rng.standard_normal((clusters, r)).astype(np.float32) * 3
    which = rng.integers(0, clusters, n)
    rows = centers[which] + rng.standard_normal((n, r)).astype(np.float32)
    scales = (np.abs(rows).max(axis=1) / 127.0).astype(np.float32)
    scales = np.where(scales == 0, 1.0, scales)
    codes = np.clip(np.round(rows / scales[:, None]), -127, 127
                    ).astype(np.int8)
    bias = (rng.standard_normal(n).astype(np.float32)
            if l2_bias else np.zeros(n, np.float32))
    # queries drawn near the same centers -> probing is meaningful
    qwhich = rng.integers(0, clusters, b)
    qt = (centers[qwhich]
          + 0.5 * rng.standard_normal((b, r))).astype(np.float32)
    return codes, scales, bias, qt


def _flat_reference(codes, scales, bias, qt, kp):
    """Flat coarse scan: shard_topk over the same stored values."""
    n, r = codes.shape
    pad = -(-n // 512) * 512 - n
    cdocs = jnp.asarray(np.pad(codes, ((0, pad), (0, 0))))
    cscale = jnp.asarray(np.pad(scales, (0, pad), constant_values=1e-12))
    cbias = jnp.asarray(np.pad(bias, (0, pad), constant_values=-np.inf))
    s, i = shard_topk(jnp.asarray(qt), cdocs, kp, mode="dot",
                      bias=cbias, scale=cscale)
    return np.asarray(s), np.asarray(i)


@pytest.mark.parametrize("l2_bias", [False, True])
def test_full_probe_matches_flat_scan(l2_bias):
    codes, scales, bias, qt = _slab(l2_bias=l2_bias)
    kp = 40
    cc = cluster_coarse_slab(codes, scales, bias, 0, n_clusters=8,
                             kmeans_iters=4)
    # kappa >= kp: at 8 clusters a query's whole top-kp can live in
    # ONE cluster, so the per-pair cap must not truncate it (production
    # geometry has hundreds of clusters per topic; config pins a small
    # HOSTREFINE_KAPPA there)
    keys, gid = coarse_probe_topk(jnp.asarray(qt), cc, kp,
                                  nprobe=cc.n_clusters, kappa=kp)
    rs, ri = _flat_reference(codes, scales, bias, qt, kp)
    keys, gid = np.asarray(keys), np.asarray(gid)
    for q in range(qt.shape[0]):
        ref = {int(x) for x in ri[q]}
        got = {int(x) for x in gid[q] if x >= 0}
        # boundary ties: the two matmul layouts accumulate f32 partials
        # in different orders, so docs within float noise of the kp-th
        # score can legitimately swap membership (exact on TPU, ~1 ulp
        # apart in CPU-interpret). A true miss is one clearly better
        # than the worst kept key.
        tol = 1e-3 * max(1.0, abs(float(keys[q][-1])))
        real_miss = [m for m in ref - got
                     if rs[q][list(ri[q]).index(m)]
                     > keys[q][-1] + tol]
        assert not real_miss, (
            f"q{q}: full probe truly missed {real_miss}")
        # keys are the same stored-form gains the flat scan computes
        np.testing.assert_allclose(np.sort(keys[q])[::-1], keys[q],
                                   rtol=0, atol=0)  # sorted best-first
        np.testing.assert_allclose(keys[q], rs[q], rtol=2e-2, atol=2e-2)


def test_partial_probe_recall_on_clustered_data():
    codes, scales, bias, qt = _slab(n=6000, clusters=16, b=24, seed=3)
    kp = 32
    cc = cluster_coarse_slab(codes, scales, bias, 0, n_clusters=16,
                             kmeans_iters=6)
    keys, gid = coarse_probe_topk(jnp.asarray(qt), cc, kp, nprobe=4,
                                  kappa=kp)
    _, ri = _flat_reference(codes, scales, bias, qt, kp)
    hits = tot = 0
    for q in range(qt.shape[0]):
        ref = {int(x) for x in ri[q]}
        got = {int(x) for x in np.asarray(gid)[q] if x >= 0}
        hits += len(ref & got)
        tot += len(ref)
    assert hits / tot >= 0.9, f"nprobe=4/16 recall {hits / tot:.3f}"


def test_row0_offset_and_kappa_cap():
    codes, scales, bias, qt = _slab(n=1500, b=8, seed=5)
    cc = cluster_coarse_slab(codes, scales, bias, 1000, n_clusters=4,
                             kmeans_iters=3)
    keys, gid = coarse_probe_topk(jnp.asarray(qt), cc, 16,
                                  nprobe=4, kappa=16)
    gid = np.asarray(gid)
    assert gid.min() >= 1000 and gid.max() < 2500
    _, ri = _flat_reference(codes, scales, bias, qt, 16)
    for q in range(qt.shape[0]):
        ref = {int(x) + 1000 for x in ri[q]}
        got = {int(x) for x in gid[q] if x >= 0}
        assert len(ref & got) / 16 >= 0.95

"""Pallas int4 weight-only matmul for the TPU-native LLM decode path.

Decode is weight-STREAM-bound (BENCHMARKS.md: B=1 bf16 runs at ~78% of
HBM_BW / param_bytes, int8 at 2.15x), so bytes-per-weight converts
~directly into tokens/s. int4 cannot ride the plain-XLA route the int8
path uses:

* native ``jnp.int4`` arrays cannot cross the jit boundary on this
  backend (device_put recursion bug, observed on axon), and
* an XLA-level unpack (shift/concat producer feeding the dot) either
  materializes the unpacked bf16 matrix or reads the packed buffer once
  per nibble — both forfeit the halved HBM stream that is the entire
  point.

So the unpack happens where the index's int4 kernel does it
(``ops/pallas_topk.py`` packed4 path): inside a Pallas kernel, on the
VPU, after the packed bytes land in VMEM. Each HBM byte is read ONCE;
two arithmetic shifts recover both nibbles; the MXU consumes the bf16
casts tile by tile.

Layout (matches ``index.shard._pack_int4`` conventions): a ``[IN, OUT]``
matrix packs to int8 ``[IN/2, OUT]`` — the low nibble of packed row
``i`` is unpacked row ``i``, the high nibble is row ``i + IN/2``
(natural order: unpack is two shifts + concat, no interleave).
Quantization is GROUP-WISE along the contraction dim (``group`` rows
share one f32 scale per output column — the standard int4 recipe;
per-channel-only scales measurably degrade real checkpoints). The
kernel folds each group's scale into its partial dot, so dequantization
is exact with respect to the stored codes.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

# Per-step VMEM budget mirrors ops/pallas_topk (16 MB scoped limit,
# leave headroom for compiler temporaries).
_VMEM_BUDGET = 13 * 1024 * 1024


def pack_int4_rows(codes: np.ndarray) -> np.ndarray:
    """Pack int4 codes ``[IN, OUT]`` (values in [-8, 7]) to int8
    ``[IN/2, OUT]``: row ``i`` in the low nibble, row ``i + IN/2`` in
    the high nibble. IN must be even."""
    n = codes.shape[0]
    assert n % 2 == 0, "pack_int4_rows needs an even row count"
    lo = codes[: n // 2].astype(np.int8) & 0x0F
    hi = (codes[n // 2:].astype(np.int8) & 0x0F) << 4
    return (lo | hi).astype(np.int8)


def _kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, out_ref, *,
            ng: int, group: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)

    w = w_ref[:]
    # sign-extending nibble unpack on the VPU, in the int8 domain (4x
    # the lane density of the int32 unpack the index kernel uses —
    # this kernel is VPU-unpack-bound at decode batch sizes): low
    # nibble via <<4 then arithmetic >>4, high via arithmetic >>4
    mode = os.environ.get("RAGROUTE_INT4_UNPACK", "int32")
    if mode == "int8":   # arith.shli on i8 vectors fails to legalize
        lo = jnp.right_shift(jnp.left_shift(w, 4), 4)
        hi = jnp.right_shift(w, 4)
    elif mode == "int16":
        w16 = w.astype(jnp.int16)
        lo = jnp.right_shift(jnp.left_shift(w16, 12), 12)
        hi = jnp.right_shift(w16, 4)
    else:
        w32 = w.astype(jnp.int32)
        lo = jnp.right_shift(jnp.left_shift(w32, 28), 28)
        hi = jnp.right_shift(w32, 4)
    xlo = xlo_ref[:]
    xhi = xhi_ref[:]
    # ng groups per grid step (unrolled): each group's partial dot gets
    # its scale folded exactly; f32 accumulation throughout
    acc = out_ref[:]
    for g in range(ng):
        sl = slice(g * group, (g + 1) * group)
        acc += jax.lax.dot_general(
            xlo[:, sl], lo[sl].astype(xlo.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * slo_ref[0, g]
        acc += jax.lax.dot_general(
            xhi[:, sl], hi[sl].astype(xhi.dtype),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * shi_ref[0, g]
    out_ref[:] = acc


def _pick_out_tile(ti: int, tb: int, out: int) -> int:
    """Largest power-of-two OUT tile fitting the VMEM budget for a
    packed in-tile of ``ti`` rows."""
    to = 2048
    while to > 128:
        w_b = ti * to                          # packed tile (int8 bytes)
        unp = 2 * ti * to * 4                  # lo+hi int32 unpack temps
        x_b = 2 * tb * ti * 2                  # two x half-tiles (bf16)
        o_b = 2 * tb * to * 4                  # f32 accumulator + copy
        s_b = 4 * to * 4
        if w_b + unp + x_b + o_b + s_b <= _VMEM_BUDGET and to <= out:
            return to
        to //= 2
    return 128


@functools.partial(jax.jit, static_argnames=("group",))
def int4_matmul(x: jnp.ndarray, w_packed: jnp.ndarray,
                scales: jnp.ndarray, *, group: int) -> jnp.ndarray:
    """``y[B, OUT] f32 = x[B, IN] @ dequant(w_packed)``.

    Args:
      x: ``[B, IN]`` activations (bf16/f32).
      w_packed: int8 ``[IN/2, OUT]`` packed nibbles (pack_int4_rows).
      scales: f32 ``[IN // group, OUT]`` group scales, groups ordered
        over UNPACKED rows (lo-half groups first, then hi-half).
      group: rows per scale group; must divide IN/2.

    Every tile of packed bytes is read from HBM exactly once.
    """
    b, in_dim = x.shape
    half, out = w_packed.shape
    assert half * 2 == in_dim, (half, in_dim)
    assert half % group == 0, (half, group)
    n_groups = half // group
    assert scales.shape == (2 * n_groups, out), (
        scales.shape, n_groups, out)

    # groups per grid step: target a ~512-row packed in-tile (one grid
    # step per 512 packed rows amortizes the per-step overhead that
    # dominated the one-group-per-step design — measured 2.17 ms vs
    # 0.28 ms for the [8,1024]x[1024,151936] head matmul)
    ng = int(os.environ.get("RAGROUTE_INT4_NG", "0")) or max(
        1, min(n_groups, 512 // group))
    while n_groups % ng:
        ng -= 1
    ti = ng * group
    nsteps = n_groups // ng

    # row-pad the batch to the f32 sublane tile; Mosaic handles the rest
    tb = int(min(max(8, b), 256))
    tb += (-tb) % 8
    b_pad = b + (-b) % tb
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    to = _pick_out_tile(ti, tb, out)
    out_pad = out + (-out) % to
    if out_pad != out:
        w_packed = jnp.pad(w_packed, ((0, 0), (0, out_pad - out)))
        scales = jnp.pad(scales, ((0, 0), (0, out_pad - out)))

    xlo, xhi = x[:, :half], x[:, half:]
    # scales as [2*nsteps, ng, OUT]: Mosaic requires the trailing two
    # block dims be (sublane-multiple | full-dim, 128-multiple); a
    # full-dim middle axis satisfies the escape hatch
    scales3 = scales.reshape(2 * nsteps, ng, out_pad)
    grid = (b_pad // tb, out_pad // to, nsteps)
    kern = functools.partial(_kernel, ng=ng, group=group)
    y = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tb, ti), lambda bi, oi, j: (bi, j)),
            pl.BlockSpec((tb, ti), lambda bi, oi, j: (bi, j)),
            pl.BlockSpec((ti, to), lambda bi, oi, j: (j, oi)),
            pl.BlockSpec((1, ng, to), lambda bi, oi, j: (j, 0, oi)),
            pl.BlockSpec((1, ng, to),
                         lambda bi, oi, j: (j + nsteps, 0, oi)),
        ],
        out_specs=pl.BlockSpec((tb, to), lambda bi, oi, j: (bi, oi)),
        out_shape=jax.ShapeDtypeStruct((b_pad, out_pad), jnp.float32),
        # the CPU test mesh has no Mosaic backend; interpret there
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(xlo, xhi, w_packed, scales3, scales3)
    return y[:b, :out]


def quantize_int4(w: np.ndarray, group: int = 128
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Group-wise symmetric int4 quantization of ``[IN, OUT]``.

    Returns ``(packed int8 [IN/2, OUT], scales f32 [IN/group, OUT])``
    with the scale rows ordered to match :func:`int4_matmul` (groups
    over unpacked rows: lo half then hi half — which IS natural row
    order). ``group`` must divide IN/2.
    """
    wf = np.asarray(w, np.float32)
    in_dim, out = wf.shape
    assert in_dim % 2 == 0 and (in_dim // 2) % group == 0, (in_dim, group)
    g = in_dim // group
    wg = wf.reshape(g, group, out)
    amax = np.maximum(np.abs(wg).max(axis=1), 1e-12)      # [g, out]
    scale = (amax / 7.0).astype(np.float32)
    codes = np.clip(np.round(wg / scale[:, None]), -7, 7)
    return pack_int4_rows(codes.reshape(in_dim, out)), scale


def dequant_int4(packed: np.ndarray, scales: np.ndarray,
                 group: int) -> np.ndarray:
    """Reference dequantization (tests / non-kernel paths)."""
    p = np.asarray(packed).astype(np.int8)
    lo = (p << 4).astype(np.int8) >> 4
    hi = p >> 4
    codes = np.concatenate([lo, hi], axis=0).astype(np.float32)
    g = codes.shape[0] // group
    return (codes.reshape(g, group, -1)
            * np.asarray(scales)[:, None]).reshape(codes.shape)

"""Fused (flash-style) MHSA Pallas kernel with in-kernel u8 dropout.

The conformer's 4-head self-attention at the training geometry
(B=16, T=800, D=256) is memory-bound on XLA: the (B, H, T, T) f32 score
matrix (164 MB at B=16) is written to HBM by the QK^T matmul, re-read and
re-written by the softmax + dropout fusion, and re-read by the PV matmul —
~0.5 GB of HBM traffic per block forward and ~2x that in backward, for
matmuls that only total ~12 GFLOP.  This kernel keeps the scores entirely
in VMEM: the grid walks (batch, head, query-block), each step computes

    scores = (q_blk @ k^T) * dh^-0.5      -> mask -> softmax (f32)
    probs  = u8-dropout(softmax)          (hardware PRNG, in-register)
    out    = probs @ v

with nothing but q/k/v/out ever touching HBM.  The backward pass (custom
VJP) recomputes probs from the same seed — dropout masks regenerate
bit-identically from ``pltpu.prng_seed(seed, lane)`` — so no residual
larger than the inputs is saved.

Dropout semantics match ``models.layers.U8Dropout`` (the rate is
quantized to round(rate*256)/256 and the keep-scale uses the quantized
rate so E[out] == in exactly); the random *stream* is the TPU core PRNG
rather than threefry/rbg, which is the same regularizer.

Reference behavior: src/models/backbones/resnet_conformer.py:25-85
(scaled dot-product attention with p=0.2 dropout on the attention probs).

Key positions are padded to a multiple of 128 lanes (800 -> 896) and the
pad is folded into the key mask; query rows are never padded (T must be
divisible by the query block).  FLOP inflation from the pad is 12% on the
attention matmuls only — the HBM traffic saved dominates.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["flash_mhsa"]

_NEG = float(jnp.finfo(jnp.float32).min)


def _interp(flag):
    # TPU-semantics interpreter (implements prng_seed/prng_random_bits,
    # unlike the generic HLO interpreter) for CPU-side exactness tests
    return pltpu.InterpretParams() if flag else False


def _random_bits(shape, seed, lane, interpret):
    """uint32 bits, deterministic in (seed, lane, position).  On hardware:
    the TPU core PRNG.  The interpreter stubs prng_random_bits to zeros,
    so interpret mode (CPU tests) hashes the position instead (splitmix32
    finalizer) — identical code path for everything under test (masking,
    keep-scale, backward regeneration); the hardware stream itself is
    exercised by the on-TPU statistics check in scripts."""
    if not interpret:
        pltpu.prng_seed(seed, lane)
        return pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    i = jax.lax.broadcasted_iota(jnp.uint32, shape, 0)
    j = jax.lax.broadcasted_iota(jnp.uint32, shape, 1)
    x = (i * jnp.uint32(shape[1]) + j
         + seed.astype(jnp.uint32) * jnp.uint32(0x9E3779B9)
         + lane.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    x = (x ^ (x >> 16)) * jnp.uint32(0x7FEB352D)
    x = (x ^ (x >> 15)) * jnp.uint32(0x846CA68B)
    return x ^ (x >> 16)


def _attend(q, k, maskf, seed, lane, *, scale, thresh, interpret):
    """Shared fwd/bwd core: (bq, dh) x (Tp, dh) -> f32 probs (bq, Tp),
    dropout keep-mask regenerated deterministically from (seed, lane)."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    s = jnp.where(maskf[None, :] != 0, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    if thresh <= 0:
        return p, None
    bits = _random_bits(s.shape, seed, lane, interpret)
    keep = bits >= jnp.uint32(thresh << 24)
    return p, keep


def _fwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, o_ref,
                *, scale, thresh, nq, interpret):
    # q/k/v arrive head-folded as (B*H, T, dh): Mosaic requires the last
    # two block dims to be (8k, 128k) or span the array, which a
    # (..., 1, dh) per-head block violates — 3-D (1, bq, dh) blocks comply
    bh, qi = pl.program_id(0), pl.program_id(1)
    lane = bh * nq + qi
    p, keep = _attend(q_ref[0], k_ref[0], m_ref[0, 0, :],
                      seed_ref[0], lane, scale=scale, thresh=thresh,
                      interpret=interpret)
    if keep is not None:
        p = jnp.where(keep, p * (256.0 / (256.0 - thresh)), 0.0)
    p = p.astype(v_ref.dtype)
    o_ref[0] = jax.lax.dot_general(
        p, v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _bwd_kernel(seed_ref, q_ref, k_ref, v_ref, m_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, thresh, nq,
                interpret):
    bh, qi = pl.program_id(0), pl.program_id(1)
    lane = bh * nq + qi
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    p, keep = _attend(q, k, m_ref[0, 0, :], seed_ref[0], lane,
                      scale=scale, thresh=thresh, interpret=interpret)

    # ctx = drop(p) @ v; dpd = do @ v^T; dp = dpd o keep*kscale;
    # ds = p o (dp - rowsum(dp o p)); dq = (ds*scale) @ k; accumulate
    # dk/dv across the sequential query-block grid dimension.
    dpd = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    if keep is not None:
        kscale = 256.0 / (256.0 - thresh)
        pd = jnp.where(keep, p * kscale, 0.0)
        dp = jnp.where(keep, dpd * kscale, 0.0)
    else:
        pd, dp = p, dpd
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    ds = (ds * scale).astype(q.dtype)
    pd = pd.astype(v.dtype)

    dq_ref[0] = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(dq_ref.dtype)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = jnp.zeros_like(dk_ref[0])
        dv_ref[0] = jnp.zeros_like(dv_ref[0])

    dk_ref[0] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dv_ref[0] += jax.lax.dot_general(
        pd, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _pick_bq(T: int) -> int:
    # candidates are multiples of 8 (Mosaic sublane constraint)
    for c in (512, 400, 256, 200, 160, 128, 80, 64, 40, 32, 16, 8):
        if T % c == 0:
            return min(c, T)
    return T


def _specs(BH, T, Tp, dh, bq):
    nq = T // bq
    grid = (BH, nq)
    qspec = pl.BlockSpec((1, bq, dh), lambda bh, qi, *_: (bh, qi, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, Tp, dh), lambda bh, qi, *_: (bh, 0, 0),
                          memory_space=pltpu.VMEM)
    # mask is (BH, 1, Tp) so the block's trailing (1, Tp) dims span the
    # array dims exactly (Mosaic last-two-dims rule)
    mspec = pl.BlockSpec((1, 1, Tp), lambda bh, qi, *_: (bh, 0, 0),
                         memory_space=pltpu.VMEM)
    return grid, nq, qspec, kvspec, mspec


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _flash(q, k, v, maskf, seed, thresh, bq, interpret):
    return _flash_fwd(q, k, v, maskf, seed, thresh, bq, interpret)[0]


def _flash_fwd(q, k, v, maskf, seed, thresh, bq, interpret):
    BH, T, dh = q.shape
    Tp = k.shape[1]
    grid, nq, qspec, kvspec, mspec = _specs(BH, T, Tp, dh, bq)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=dh ** -0.5, thresh=thresh,
                          nq=nq, interpret=bool(interpret)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[qspec, kvspec, kvspec, mspec],
            out_specs=pl.BlockSpec((1, bq, dh),
                                   lambda bh, qi, *_: (bh, qi, 0),
                                   memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct((BH, T, dh), q.dtype),
        interpret=_interp(interpret),
    )(seed, q, k, v, maskf)
    return out, (q, k, v, maskf, seed)


def _flash_bwd(thresh, bq, interpret, res, do):
    q, k, v, maskf, seed = res
    BH, T, dh = q.shape
    Tp = k.shape[1]
    grid, nq, qspec, kvspec, mspec = _specs(BH, T, Tp, dh, bq)
    dkv_spec = pl.BlockSpec((1, Tp, dh), lambda bh, qi, *_: (bh, 0, 0),
                            memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=dh ** -0.5, thresh=thresh,
                          nq=nq, interpret=bool(interpret)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=grid,
            in_specs=[qspec, kvspec, kvspec, mspec, qspec],
            out_specs=(
                pl.BlockSpec((1, bq, dh), lambda bh, qi, *_: (bh, qi, 0),
                             memory_space=pltpu.VMEM),
                dkv_spec, dkv_spec)),
        out_shape=(jax.ShapeDtypeStruct((BH, T, dh), q.dtype),
                   # dk/dv accumulate across query blocks in f32
                   jax.ShapeDtypeStruct((BH, Tp, dh), jnp.float32),
                   jax.ShapeDtypeStruct((BH, Tp, dh), jnp.float32)),
        interpret=_interp(interpret),
    )(seed, q, k, v, maskf, do)
    import numpy as np
    return (dq, dk.astype(k.dtype), dv.astype(v.dtype),
            jnp.zeros_like(maskf),
            np.zeros(seed.shape, jax.dtypes.float0))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_mhsa(q: jax.Array, k: jax.Array, v: jax.Array,
               frame_mask: Optional[jax.Array] = None, *,
               rate: float = 0.0, rng_key=None,
               bq: Optional[int] = None, interpret: bool = False) -> jax.Array:
    """Fused attention over (B, T, H, dh) q/k/v with optional key masking
    and attention-prob dropout.  Differentiable (custom VJP, recompute).

    frame_mask: optional (B, T) bool — False keys are masked out.
    rate/rng_key: dropout on the attention probs (train only); the mask is
    regenerated in backward from the derived scalar seed.
    """
    B, T, H, dh = q.shape
    thresh = int(round(rate * 256.0))
    if thresh >= 256:  # rate ~1.0 drops everything (match U8Dropout)
        return jnp.zeros_like(q)
    seed = jnp.zeros((1,), jnp.int32)
    if thresh > 0:
        if rng_key is None:
            raise ValueError("dropout needs rng_key")
        seed = jax.random.bits(rng_key, (1,), jnp.uint32).astype(jnp.int32)
    bq = bq or _pick_bq(T)
    assert T % bq == 0, (T, bq)
    Tp = -(-T // 128) * 128

    # fold heads into the batch axis: Mosaic's last-two-block-dims rule
    # makes (1, bq, dh) blocks over (B*H, T, dh) legal where per-head 4-D
    # blocks are not; the transposes fuse into the surrounding Dense ops
    def fold(x, Tpad):
        x = x.swapaxes(1, 2).reshape(B * H, T, dh)
        if Tpad != T:
            x = jnp.pad(x, ((0, 0), (0, Tpad - T), (0, 0)))
        return x

    kf = fold(k, Tp)
    vf = fold(v, Tp)
    qf = fold(q, T)
    if frame_mask is None:
        maskf = (jnp.arange(Tp)[None, :] < T).astype(jnp.float32)
        maskf = jnp.broadcast_to(maskf, (B, Tp))
    else:
        maskf = jnp.pad(frame_mask.astype(jnp.float32),
                        ((0, 0), (0, Tp - T)))
    maskf = jnp.broadcast_to(maskf[:, None, None, :],
                             (B, H, 1, Tp)).reshape(B * H, 1, Tp)
    out = _flash(qf, kf, vf, maskf, seed, thresh, bq, interpret)
    return out.reshape(B, H, T, dh).swapaxes(1, 2)


# ---------------------------------------------------------------------------
# Long-clip (online-softmax) variant — eval only, fwd only.
#
# Length-bucketed eval clips reach T=38400 frames; whole-KV-in-VMEM above
# is capped around T~2400 (k+v per (batch, head) outgrow VMEM) and the
# XLA lax.map fallback still materializes (bq, T) score slabs in HBM —
# ~4 x 0.5 GB of traffic per map step on a 3-minute STARSS22 clip.  This
# kernel adds a KV grid dimension and carries the classic flash running
# statistics (row max m, row sum l, unnormalized accumulator) in VMEM
# scratch, so HBM traffic drops to O(q + k + v + out).
# ---------------------------------------------------------------------------


def _long_kernel(q_ref, k_ref, v_ref, m_ref, o_ref,
                 acc_ref, mx_ref, l_ref, *, scale, nkv):
    kvi = pl.program_id(2)

    @pl.when(kvi == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref[:])
        mx_ref[:] = jnp.full_like(mx_ref[:], _NEG)
        l_ref[:] = jnp.zeros_like(l_ref[:])

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale
    maskb = m_ref[0, 0, :][None, :] != 0
    s = jnp.where(maskb, s, _NEG)
    m_old = mx_ref[:, :1]                       # (bq, 1)
    m_new = jnp.maximum(m_old, jnp.max(s, axis=-1, keepdims=True))
    # exp(s - m_new) would be exp(0)=1 on masked lanes while m_new is
    # still _NEG (an all-masked leading block): multiply the mask back in
    p = jnp.exp(s - m_new) * maskb.astype(jnp.float32)
    alpha = jnp.exp(m_old - m_new)              # (bq, 1)
    l_new = l_ref[:, :1] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    mx_ref[:] = jnp.broadcast_to(m_new, mx_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(kvi == nkv - 1)
    def _():
        # a fully-masked query row (feat_length 0) has l == 0: emit zeros
        # rather than 0/0 NaN (the XLA paths emit a meaningless uniform
        # average there; either value is masked downstream — finiteness is
        # what matters so the NaN can't poison later residuals/LayerNorms)
        l = l_ref[:, :1]
        o_ref[0] = jnp.where(
            l > 0, acc_ref[:] / jnp.maximum(l, 1.0e-30), 0.0
        ).astype(o_ref.dtype)


def flash_mhsa_long(q: jax.Array, k: jax.Array, v: jax.Array,
                    frame_mask: Optional[jax.Array] = None, *,
                    bq: Optional[int] = None, bkv: int = 512,
                    interpret: bool = False) -> jax.Array:
    """Online-softmax attention for arbitrarily long (B, T, H, dh) clips.
    Forward only (eval path; no dropout).  Same math/masking semantics as
    ``flash_mhsa``; peak memory O(bq*bkv) per (batch, head)."""
    B, T, H, dh = q.shape
    bq = bq or _pick_bq(T)
    assert T % bq == 0, (T, bq)
    Tp = -(-T // bkv) * bkv

    def fold(x, Tpad):
        x = x.swapaxes(1, 2).reshape(B * H, T, dh)
        if Tpad != T:
            x = jnp.pad(x, ((0, 0), (0, Tpad - T), (0, 0)))
        return x

    kf = fold(k, Tp)
    vf = fold(v, Tp)
    qf = fold(q, T)
    if frame_mask is None:
        maskf = jnp.broadcast_to(
            (jnp.arange(Tp)[None, :] < T).astype(jnp.float32), (B, Tp))
    else:
        maskf = jnp.pad(frame_mask.astype(jnp.float32),
                        ((0, 0), (0, Tp - T)))
    maskf = jnp.broadcast_to(maskf[:, None, None, :],
                             (B, H, 1, Tp)).reshape(B * H, 1, Tp)
    nq, nkv = T // bq, Tp // bkv
    out = pl.pallas_call(
        functools.partial(_long_kernel, scale=dh ** -0.5, nkv=nkv),
        grid=(B * H, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, bq, dh), lambda bh, qi, kvi: (bh, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dh), lambda bh, qi, kvi: (bh, kvi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bkv, dh), lambda bh, qi, kvi: (bh, kvi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, bkv), lambda bh, qi, kvi: (bh, 0, kvi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh),
                               lambda bh, qi, kvi: (bh, qi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B * H, T, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, dh), jnp.float32),    # unnormalized accumulator
            pltpu.VMEM((bq, 128), jnp.float32),   # running row max
            pltpu.VMEM((bq, 128), jnp.float32),   # running row sum
        ],
        interpret=_interp(interpret),
    )(qf, kf, vf, maskf)
    return out.reshape(B, H, T, dh).swapaxes(1, 2)

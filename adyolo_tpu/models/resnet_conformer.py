"""ResNet34 + Conformer SELD encoder (flax.linen).

Re-implementation of the reference's second encoder
(``src/models/backbones/resnet_conformer.py:342-447``):

* torchvision-style ResNet34 stem/stages with **frequency-only striding**
  (stride (1, 2) everywhere): 7x7 conv -> ReLU -> BN -> 3x3 maxpool, then
  stages of [3, 4, 5, 3] BasicBlocks with channels [64, 128, 256, 512]
  (the reference instantiates 5 blocks in stage 3, not torchvision's 6 —
  resnet_conformer.py:373-384); F: 64 -> 1, T unchanged;
* bottleneck Linear 512 -> 256 (no bias) (:396);
* 8 Conformer blocks with half-step residual FFNs, 4-head MHSA, GLU +
  depthwise conv module with dilation ``2^i`` (:215-336, 399-415);
* final time pooling by 4 + LayerNorm (:417, 285-297 — the reference's
  ``PoolingModule`` adds two identical average pools ("max" is a second
  AvgPool1d, a latent bug); since LayerNorm is scale-invariant the sum is
  numerically LN(avg), which is what we compute).

Masked variable-length support mirrors the SE-ResNet34 encoder: padded
frames are re-zeroed after each conv/norm, attention keys at padded
positions are masked to -inf, and pooling masks downsample with the data.
Shapes for DCASE geometry: (B, 800, 64, 7) -> (B, 200, 256).
"""
from __future__ import annotations

import contextlib
import os
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.flash_mhsa import flash_mhsa, flash_mhsa_long
from ..ops.packed_conv import best_pack, conv_time_packed, pack_x, unpack_x
from .layers import Conv3x3, U8Dropout, apply_frame_mask, pool_mask

__all__ = ["ResNetConformer", "force_flash"]

# Trace-time override for every MHSA's kernel-selection flag.  A Pallas
# kernel lowers to a TPU custom call, which cannot appear in a
# multi-platform StableHLO artifact: ``jax.export`` lowers the traced
# program once per requested platform and the CPU lowering of
# ``pallas_call`` rejects compiled mode outright.  ``engine/export.py``
# wraps its export trace in ``force_flash("0")`` so serving artifacts
# always take the pure-XLA attention paths (numerically identical —
# the flash kernel computes exact attention, and eval has no dropout).
_FLASH_FORCE: Optional[str] = None


@contextlib.contextmanager
def force_flash(mode: Optional[str]):
    """Pin every MHSA's flash mode ("0" | "1" | "auto") for traces made
    inside the context, overriding the env/field default."""
    global _FLASH_FORCE
    prev = _FLASH_FORCE
    _FLASH_FORCE = mode
    try:
        yield
    finally:
        _FLASH_FORCE = prev


class TimePackedConv(nn.Module):
    """Drop-in for ``nn.Conv(features, (kt, kf), strides=(1, f_stride),
    padding=(kt//2, kf//2), use_bias=False)`` that folds the time axis into
    channels when the output channel count underfills the 128 MXU lanes
    (ops/packed_conv.py conv_time_packed; exactly equivalent math).  Param
    layout and init match nn.Conv ('kernel' (kt, kf, Cin, Cout),
    lecun_normal), so checkpoints and golden tests are unaffected."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    f_stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kt, kf = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (kt, kf, x.shape[-1], self.features))
        pack = 1
        for p in (4, 2):
            if self.features * p <= 128 and x.shape[1] % p == 0:
                pack = p
                break
        return conv_time_packed(x.astype(self.dtype), w.astype(self.dtype),
                                pack, self.f_stride)


def _bn(train, name, dtype=jnp.float32):
    from .layers import BatchNorm

    return lambda x: BatchNorm(dtype=dtype, name=name)(x, not train)


class TVBasicBlock(nn.Module):
    """torchvision BasicBlock: conv3x3(stride)-BN-ReLU-conv3x3-BN
    (+1x1 downsample) -ReLU, stride on the frequency axis only."""

    planes: int
    f_stride: int = 1
    time_pack: bool = True
    # pack > 1: input arrives packed-resident (B, T, F/pack, pack*C) and
    # the output stays packed — no per-conv relayouts (stride-1,
    # channel-preserving blocks only; see SEResNet34.packed_stages)
    pack: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, frame_mask=None):
        from .layers import BatchNorm

        residual = x
        stride = (1, self.f_stride)
        if self.pack > 1:
            assert self.f_stride == 1
            out = Conv3x3(self.planes, use_bias=False, dtype=self.dtype,
                          pack=self.pack, name="conv1")(x)
            out = BatchNorm(dtype=self.dtype, name="bn1")(out, not train,
                                                          pack=self.pack)
            out = apply_frame_mask(nn.relu(out), frame_mask)
            out = Conv3x3(self.planes, use_bias=False, dtype=self.dtype,
                          pack=self.pack, name="conv2")(out)
            out = BatchNorm(dtype=self.dtype, name="bn2")(out, not train,
                                                          pack=self.pack)
            out = apply_frame_mask(out, frame_mask)
            return apply_frame_mask(nn.relu(out + residual), frame_mask)
        # stride-1 3x3 convs go through the frequency-packed path (exact
        # math; the 64-channel blocks underfill the MXU otherwise);
        # freq-strided convs can't freq-pack but their stride-1 time axis
        # packs the same way (only fires for the 64-channel layer-1 entry)
        if self.f_stride == 1:
            out = Conv3x3(self.planes, use_bias=False, dtype=self.dtype,
                          name="conv1")(x)
        elif self.time_pack:
            out = TimePackedConv(self.planes, (3, 3), f_stride=self.f_stride,
                                 dtype=self.dtype, name="conv1")(x)
        else:
            out = nn.Conv(self.planes, (3, 3), strides=stride, padding=1,
                          use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = _bn(train, "bn1", self.dtype)(out)
        out = nn.relu(out)
        out = apply_frame_mask(out, frame_mask)
        out = Conv3x3(self.planes, use_bias=False,
                      dtype=self.dtype, name="conv2")(out)
        out = _bn(train, "bn2", self.dtype)(out)
        out = apply_frame_mask(out, frame_mask)
        if self.f_stride != 1 or x.shape[-1] != self.planes:
            residual = nn.Conv(self.planes, (1, 1), strides=stride,
                               use_bias=False, dtype=self.dtype, name="down_conv")(x)
            residual = _bn(train, "down_bn", self.dtype)(residual)
            residual = apply_frame_mask(residual, frame_mask)
        return apply_frame_mask(nn.relu(out + residual), frame_mask)


class FeedForwardModule(nn.Module):
    """LN -> Linear(d->4d) -> Swish -> Dropout -> Linear(4d->d) -> Dropout
    (resnet_conformer.py:181-212)."""

    dim: int
    expansion: int = 4
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(self.dim * self.expansion, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        x = x * jax.nn.sigmoid(x)  # swish
        x = U8Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, dtype=self.dtype,
                     kernel_init=nn.initializers.xavier_uniform())(x)
        return U8Dropout(self.dropout, deterministic=not train)(x)


class MHSA(nn.Module):
    """4-head self-attention with the reference's scaling convention
    (resnet_conformer.py:25-85); padded key positions masked out.

    Long eval clips (length-bucketed up to 38400 frames) can't
    materialize the (B, H, T, T) f32 score matrix — 4 heads x 38400^2 x
    4 B ~ 23 GB, past the 16 GB v5e HBM; the torch reference has the
    same quadratic blowup on multi-minute clips.  Above
    ``BLOCK_THRESHOLD`` frames the scores are computed per query block
    with ``lax.map`` (identical math and reduction pattern, peak memory
    T^2 -> block*T); training always runs T=800 and keeps the single
    fused path."""

    dim: int
    heads: int = 4
    dropout: float = 0.2
    # Pallas fused-attention kernel for the training path (ops/flash_mhsa):
    # never materializes the (B, H, T, T) probs in HBM, dropout mask from
    # the core PRNG regenerated in backward.  "auto" = on when the default
    # backend is TPU; "0" = always the XLA paths.  Default "auto" since the
    # round-4 A/B on the real v5e: conformer bf16 train 5,520.8 audio_s/s
    # flash-ON vs 5,295.7 OFF (+4.3%; PLAN.md "Round 4 — A/B decisions";
    # scripts/flash_check.py has the exactness/PRNG checks).
    flash: str = os.environ.get("ADYOLO_FLASH_MHSA", "auto")
    dtype: Any = jnp.float32

    BLOCK_THRESHOLD = 2400  # frames; (1,4,2400,2400) f32 = 92 MB is fine

    @nn.compact
    def __call__(self, x, train: bool, frame_mask=None):
        B, T, D = x.shape
        H = self.heads
        dh = D // H
        q = nn.Dense(D, dtype=self.dtype, name="query")(x).reshape(B, T, H, dh)
        k = nn.Dense(D, dtype=self.dtype, name="key")(x).reshape(B, T, H, dh)
        v = nn.Dense(D, dtype=self.dtype, name="value")(x).reshape(B, T, H, dh)
        # the kernel keeps whole-KV per (batch, head) in VMEM, so it only
        # fires below BLOCK_THRESHOLD (train chunks are 800 frames; a
        # hypothetical long-chunk training config falls back to the fused
        # XLA path, which carries the dropout); longer eval buckets route
        # to the online-softmax kernel or the lax.map fallback below
        flash = _FLASH_FORCE if _FLASH_FORCE is not None else self.flash
        flash_on = (T % 8 == 0
                    and (flash == "1" or (flash == "auto"
                         and jax.default_backend() == "tpu")))
        if flash_on and T <= self.BLOCK_THRESHOLD:
            rate = self.dropout if train else 0.0
            ctx = flash_mhsa(
                q, k, v, frame_mask, rate=rate,
                rng_key=(self.make_rng("dropout") if rate > 0
                         else None)).reshape(B, T, D)
            return nn.Dense(D, dtype=self.dtype, name="linear")(ctx)
        kv_mask = None
        if frame_mask is not None:
            kv_mask = frame_mask[:, None, None, :]  # (B, 1, 1, T)

        def attend(q_blk):
            """(B, bq, H, dh) -> (B, bq, H, dh) attention WITHOUT dropout;
            scores/softmax in f32 regardless of compute dtype (bf16 logits
            into softmax cost accuracy for free — the (T, T) matrices are
            a small part of the attention FLOPs).  Pure function so it is
            safe inside lax.map (no flax submodules)."""
            scores = jnp.einsum("bqhd,bkhd->bhqk", q_blk, k,
                                preferred_element_type=jnp.float32) * (dh ** -0.5)
            if kv_mask is not None:
                neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
                scores = jnp.where(kv_mask, scores, neg)
            attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            return attn, jnp.einsum("bhqk,bkhd->bqhd", attn, v)

        if flash_on and not train and T > self.BLOCK_THRESHOLD:
            # online-softmax kernel: O(q+k+v) HBM traffic on multi-minute
            # clips (the lax.map fallback below still writes (bq, T)
            # score slabs to HBM per step)
            ctx = flash_mhsa_long(q, k, v, frame_mask).reshape(B, T, D)
            return nn.Dense(D, dtype=self.dtype, name="linear")(ctx)
        bq = next((c for c in (800, 600, 400, 240, 160, 80, 8)
                   if T % c == 0 and c < T), None)
        if train or T <= self.BLOCK_THRESHOLD or bq is None:
            # fused path: dropout on the full attention-prob tensor
            # (training always lands here — chunks are 800 frames)
            attn, ctx = attend(q)
            if train:
                attn = U8Dropout(self.dropout, deterministic=not train)(attn)
                ctx = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        else:
            blocks = jax.lax.map(
                lambda qb: attend(qb)[1],
                q.reshape(B, T // bq, bq, H, dh).swapaxes(0, 1))
            ctx = blocks.swapaxes(0, 1).reshape(B, T, H, dh)
        ctx = ctx.reshape(B, T, D)
        return nn.Dense(D, dtype=self.dtype, name="linear")(ctx)


class ConformerConvModule(nn.Module):
    """LN -> pointwise(d->2d) -> BN -> GLU -> depthwise(k=3, dilation) ->
    BN -> Swish -> pointwise(d->d) -> Dropout (resnet_conformer.py:154-178)."""

    dim: int
    dilation: int = 1
    kernel: int = 3
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, frame_mask=None):
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.Dense(2 * self.dim, dtype=self.dtype,
                     name="pw1")(x)  # pointwise == Dense over C
        x = _bn(train, "bn1", self.dtype)(x)
        a, b = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(b)  # GLU
        x = apply_frame_mask(x, frame_mask)
        # depthwise dilated conv, written as k shifted multiply-adds: a
        # grouped Conv with feature_group_count=C lowers catastrophically
        # on XLA:TPU (measured ~400x slower); the explicit form is pure
        # VPU elementwise work and fuses with the surrounding ops.
        pad = (self.kernel - 1) // 2 * self.dilation
        w = self.param("dw_kernel", nn.initializers.lecun_normal(),
                       (self.kernel, self.dim))
        b = self.param("dw_bias", nn.initializers.zeros, (self.dim,))
        T = x.shape[1]
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        w = w.astype(x.dtype)
        x = sum(xp[:, k * self.dilation : k * self.dilation + T] * w[k]
                for k in range(self.kernel)) + b.astype(x.dtype)
        x = _bn(train, "bn2", self.dtype)(x)
        x = x * jax.nn.sigmoid(x)  # swish
        x = nn.Dense(self.dim, dtype=self.dtype, name="pw2")(x)
        x = U8Dropout(self.dropout, deterministic=not train)(x)
        return apply_frame_mask(x, frame_mask)


class ConformerBlock(nn.Module):
    """FFN(x0.5) -> MHSA(x0.5) -> ConvModule(x1) -> FFN(x0.5) -> LN
    (resnet_conformer.py:215-282; half_step_residual=True)."""

    dim: int
    dilation: int
    dropout: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool, frame_mask=None):
        x = x + 0.5 * FeedForwardModule(self.dim, dtype=self.dtype,
                                        name="ffn1")(x, train)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="mhsa_ln")(x)
        h = MHSA(self.dim, dtype=self.dtype, name="mhsa")(h, train, frame_mask)
        h = U8Dropout(self.dropout, deterministic=not train)(h)
        x = x + 0.5 * h
        x = x + ConformerConvModule(self.dim, self.dilation, dtype=self.dtype,
                                    name="conv")(x, train, frame_mask)
        x = x + 0.5 * FeedForwardModule(self.dim, dtype=self.dtype,
                                        name="ffn2")(x, train)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="final_ln")(x)


class ResNetConformer(nn.Module):
    emb_dim: int = 256
    num_layers: int = 8
    time_pool: int = 4
    # time-pack the underfilled freq-strided convs (stem 7x7 Cin=7->64 and
    # the layer-1 entry conv); exact math.  Default OFF since the round-4
    # A/B on the real v5e: 5,342.5 audio_s/s OFF vs 5,295.7 ON — unlike
    # SE-ResNet, the conformer keeps T=800 through the stages so its pack
    # reshapes are 4x larger and eat the MXU win (PLAN.md "Round 4 — A/B
    # decisions").  ADYOLO_TIME_PACK=1 (read at import, for fresh-process
    # A/B benching) re-enables it.
    time_pack: bool = os.environ.get("ADYOLO_TIME_PACK", "0") == "1"
    # packed-resident stage interiors (same trick as
    # SEResNet34.packed_stages): after a stage's strided entry block, the
    # stride-1 channel-preserving blocks run on one (B, T, F/p, p*C)
    # layout — per-conv pack/unpack relayouts collapse to one pack per
    # stage.  Only layer1 qualifies (C=64, F=16 -> pack 2); measured on
    # the v5e in round 4 and kept OFF: 5,247 audio_s/s ON vs 5,288 OFF
    # (PLAN.md "Round 4 — A/B decisions" — the relayout overhead eats the
    # win).  ADYOLO_CONF_PACKED=1 re-enables; bench.py's
    # train-conformer-bf16-confpacked A/B line re-measures the call.
    conf_packed_stages: bool = os.environ.get("ADYOLO_CONF_PACKED",
                                              "0") == "1"
    # jax.checkpoint each conformer block (cfg.train.remat / --remat):
    # backward recomputes the block instead of keeping its activations —
    # ~num_layers x less transformer activation memory for ~1/3 more
    # FLOPs, for batch sizes past the HBM ceiling
    remat: bool = False
    dtype: Any = jnp.float32  # compute dtype for the resnet stages AND the
    # conformer blocks (attention softmax stays f32 inside MHSA)

    @nn.compact
    def __call__(self, x, train: bool = False, feat_lengths: Optional[jax.Array] = None):
        frame_mask = None
        if feat_lengths is not None:
            t = jnp.arange(x.shape[1])[None, :]
            frame_mask = t < feat_lengths[:, None]
            x = apply_frame_mask(x, frame_mask)

        # stem (resnet_conformer.py:347-350, 423-426): conv->ReLU->BN->maxpool
        x = x.astype(self.dtype)
        if self.time_pack:
            x = TimePackedConv(64, (7, 7), f_stride=2, dtype=self.dtype,
                               name="conv1")(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(1, 2), padding=3, use_bias=False,
                        dtype=self.dtype, name="conv1")(x)
        x = nn.relu(x)
        x = _bn(train, "bn1", self.dtype)(x)
        if frame_mask is not None:
            # padded frames must behave like maxpool's implicit -inf padding,
            # not like zero activations, for exact boundary parity
            neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
            x = jnp.where(frame_mask[:, :, None, None], x, neg)
        x = nn.max_pool(x, (3, 3), strides=(1, 2), padding=((1, 1), (1, 1)))
        x = apply_frame_mask(x, frame_mask)

        # stages: 3/4/5/3 blocks, freq-only stride 2 at each stage entry
        for stage, (n_blocks, planes) in enumerate(
                zip((3, 4, 5, 3), (64, 128, 256, 512))):
            cur_pack = 1
            for b in range(n_blocks):
                if b == 1 and self.conf_packed_stages:
                    # stage interior: stride-1, channel-preserving blocks
                    # share one packed layout (entry block ran unpacked —
                    # its freq stride crosses pack boundaries)
                    cur_pack = best_pack(planes, x.shape[2])
                    if cur_pack > 1:
                        x = pack_x(x, cur_pack)
                x = TVBasicBlock(planes, f_stride=2 if b == 0 else 1,
                                 time_pack=self.time_pack, pack=cur_pack,
                                 dtype=self.dtype,
                                 name=f"layer{stage + 1}_block{b}")(
                    x, train, frame_mask)
            if cur_pack > 1:
                x = unpack_x(x, cur_pack)
        # (B, T, F=1, 512) -> (B, T, 512)
        x = x.reshape(x.shape[0], x.shape[1], -1)

        x = nn.Dense(self.emb_dim, use_bias=False, dtype=self.dtype,
                     name="bottleneck")(x)

        block_cls = ConformerBlock
        if self.remat:
            # static_argnums counts the bound method's args with the module
            # instance at 0: (self, x, train, frame_mask) -> train is 2
            block_cls = nn.remat(ConformerBlock, static_argnums=(2,))
        for i in range(self.num_layers):
            x = block_cls(self.emb_dim, dilation=2 ** i, dtype=self.dtype,
                          name=f"conformer{i}")(x, train, frame_mask)

        # time pooling by 4 + LN (PoolingModule; sum of two identical avg
        # pools == 2*avg, invariant under the following LayerNorm)
        B, T, D = x.shape
        x = x.astype(jnp.float32)  # encoder output stays f32 (like SEResNet34)
        x = x.reshape(B, T // self.time_pool, self.time_pool, D).mean(axis=2)
        x = nn.LayerNorm(epsilon=1e-5, name="pool_norm")(x)
        if frame_mask is not None:
            x = apply_frame_mask(x, pool_mask(frame_mask, self.time_pool))
        return x

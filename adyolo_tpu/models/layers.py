"""Shared model building blocks (flax.linen).

TPU conventions used throughout:

* activations are channel-last ``(B, T, F, C)`` (XLA:TPU's preferred conv
  layout) — the reference uses torch NCHW ``(B, C, T, F)``;
* all blocks accept an optional ``frame_mask (B, T)`` so bucketed/padded
  variable-length eval clips reproduce exact-length numerics: padded
  frames are re-zeroed after every conv/norm so boundary convolutions see
  the same zero neighborhood the reference's exact-shape run sees, and
  global pools average over valid frames only;
* BatchNorm: torch semantics (momentum 0.1 ⇒ flax momentum 0.9,
  eps 1e-5, running stats in the ``batch_stats`` collection).

Reference counterparts: ``src/models/backbones/resnet.py`` (SEBasicBlock,
SELayer, SelfAttentionPooling) and torch ``nn.GRU`` used at
``resnet.py:153``.
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.packed_conv import (best_pack, conv3x3_fullpack, conv3x3_packed,
                               pack_weights, pack_weights_1x1)

__all__ = [
    "apply_frame_mask",
    "pool_mask",
    "BatchNorm",
    "Conv3x3",
    "U8Dropout",
    "SELayer",
    "SEBasicBlock",
    "SelfAttentionPooling",
    "BiGRU",
    "reverse_sequence",
]


class Conv3x3(nn.Module):
    """Drop-in for ``nn.Conv(features, (3, 3), padding=1)`` that runs
    frequency-packed when the output channel count underfills the 128 MXU
    lanes (ops/packed_conv.py; exactly equivalent math, ~3x faster for the
    32-channel stage-1 convs on v5e).  Param layout and initializers match
    nn.Conv ('kernel' (3, 3, Cin, Cout), optional 'bias'), so checkpoints
    and the weight-for-weight golden tests are unaffected."""

    features: int
    use_bias: bool = False
    dtype: Any = jnp.float32
    # pack=None: decide locally and reshape in/out per conv (default).
    # pack>=1: the input is ALREADY in packed-resident layout
    # (B, T, F/pack, pack*Cin) and the output stays packed — no reshapes
    # (see SEBasicBlock's packed-resident stages).
    pack: Optional[int] = None

    @nn.compact
    def __call__(self, x):
        if self.pack is not None:
            cin = x.shape[-1] // self.pack
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (3, 3, cin, self.features))
            w = kernel.astype(self.dtype)
            if self.pack > 1:
                w = pack_weights(w, self.pack)
            y = jax.lax.conv_general_dilated(
                x.astype(self.dtype), w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            if self.use_bias:
                bias = self.param("bias", nn.initializers.zeros,
                                  (self.features,))
                y = y + jnp.tile(bias.astype(self.dtype), self.pack)
            return y
        cin = x.shape[-1]
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, cin, self.features))
        if x.shape[2] <= 2:
            # freq-only-strided stems end at F ∈ {1, 2}, where the spatial
            # 3x3 wastes freq taps on padding: whole-F packing to a (3, 1)
            # time conv is exact and measured faster (F=1/C=512: 0.72 ->
            # 0.31 ms fwd, 2.01 -> 1.20 ms bwd on v5e; see
            # scripts/conv_bench.py)
            y = conv3x3_fullpack(x.astype(self.dtype),
                                 kernel.astype(self.dtype))
        else:
            pack = best_pack(self.features, x.shape[2])
            y = conv3x3_packed(x.astype(self.dtype), kernel.astype(self.dtype),
                               pack)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class BatchNorm(nn.Module):
    """torch-semantics BatchNorm with a compute-dtype apply.

    flax's nn.BatchNorm promotes the normalize pass to f32 (mean/var stay
    f32), doubling the elementwise traffic of every BN in a bf16 conv
    stack (~15 ms/step at B=32 on v5e, profiler-measured).  Here the
    statistics are still computed and tracked in f32 (one-pass
    E[x^2]-E[x]^2 like flax ``use_fast_variance``; running-stats update
    identical: ``m*ra + (1-m)*batch``), but the per-element normalization
    collapses to ``x * mul + shift`` with ``mul/shift`` pre-folded and
    cast to the input dtype — one fused multiply-add at bf16 width.
    Param/collection layout matches nn.BatchNorm ('scale'/'bias' params,
    'mean'/'var' batch_stats), so checkpoints and golden tests are
    unaffected."""

    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool, pack: int = 1):
        """``pack > 1``: x is packed-resident (B, T, F/pack, pack*C) — the
        pack copies of each channel cover disjoint frequency columns with
        equal element counts, so the true per-channel moments are exactly
        the means of the per-copy moments (stats/params stay (C,), tiled
        back to pack*C only for the elementwise apply)."""
        C = x.shape[-1] // pack
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((C,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((C,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (C,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (C,), jnp.float32)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            axes = tuple(range(x.ndim - 1))
            # stats in (at least) f32; a float64 input keeps f64 stats so
            # the x64 gradient-parity oracle stays exact end-to-end
            xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
            mean = jnp.mean(xf, axis=axes)
            mean2 = jnp.mean(jnp.square(xf), axis=axes)
            if pack > 1:
                mean = mean.reshape(pack, C).mean(axis=0)
                mean2 = mean2.reshape(pack, C).mean(axis=0)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1 - m) * mean
                ra_var.value = m * ra_var.value + (1 - m) * var
        mul = jax.lax.rsqrt(var + self.epsilon) * scale
        shift = bias - mean * mul
        mul, shift = mul.astype(x.dtype), shift.astype(x.dtype)
        if pack > 1:
            mul, shift = jnp.tile(mul, pack), jnp.tile(shift, pack)
        return x * mul + shift


class U8Dropout(nn.Module):
    """Bernoulli dropout driven by uint8 random bits.

    Semantically the same regularizer as ``nn.Dropout`` (the torch reference
    uses ``nn.Dropout`` throughout, e.g. resnet_conformer.py:49,206-208), but
    the mask comes from a uint8 threshold compare instead of an f32 uniform:
    4x less RNG HBM traffic and a compare+select that XLA fuses into the
    surrounding elementwise chain.  Measured on the (32,4,800,800) attention
    probs at B=32,T=800: fwd 2.23 -> 0.66 ms, grad 6.20 -> 4.48 ms vs flax
    ``nn.Dropout`` (scripts/mhsa_bench.py) — *faster than no dropout at all*
    because the fused u8 path avoids materializing f32 intermediates.

    The drop rate is quantized to ``round(rate*256)/256`` (0.2 -> 51/256 =
    0.19922); the keep-scale uses the quantized rate so E[output] == input
    exactly.
    """

    rate: float
    deterministic: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        thresh = int(round(self.rate * 256.0))
        if self.deterministic or thresh <= 0:
            return x
        if thresh >= 256:  # rate ~1.0: uint8(256) would wrap to "keep all"
            return jnp.zeros_like(x)
        bits = jax.random.bits(self.make_rng("dropout"), x.shape, jnp.uint8)
        scale = jnp.asarray(256.0 / (256.0 - thresh), x.dtype)
        return jnp.where(bits >= jnp.uint8(thresh), x * scale,
                         jnp.zeros((), x.dtype))


def apply_frame_mask(x: jax.Array, frame_mask: Optional[jax.Array]) -> jax.Array:
    """Zero activations of padded frames. x: (B, T, ...) , mask: (B, T)."""
    if frame_mask is None:
        return x
    shape = (x.shape[0], x.shape[1]) + (1,) * (x.ndim - 2)
    return x * frame_mask.reshape(shape).astype(x.dtype)


def pool_mask(frame_mask: Optional[jax.Array], factor: int) -> Optional[jax.Array]:
    """Downsample a frame mask through a stride-``factor`` time pool.
    Valid lengths are multiples of the total pooling factor by construction
    (feature frames = 4 × label frames), so strided slicing is exact."""
    if frame_mask is None:
        return None
    return frame_mask[:, ::factor]


class SELayer(nn.Module):
    """Squeeze-and-excitation (reference: resnet.py:91-106, reduction 8).
    The squeeze is a (masked) global mean over (T, F)."""

    reduction: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, frame_mask=None, pack: int = 1):
        """``pack > 1``: x is packed-resident (B, T, F/pack, pack*C); the
        squeeze combines the pack copies (equal counts => mean of means is
        the exact global mean) and the excitation gate is tiled back."""
        B, T, F, PC = x.shape
        C = PC // pack
        if frame_mask is None:
            y = jnp.mean(x, axis=(1, 2))  # (B, pack*C)
        else:
            m = frame_mask[:, :, None, None].astype(x.dtype)
            y = (x * m).sum(axis=(1, 2)) / (m.sum(axis=(1, 2)) * F + 1e-12)
        if pack > 1:
            y = y.reshape(B, pack, C).mean(axis=1)
        y = nn.Dense(C // self.reduction, dtype=self.dtype)(y)
        y = nn.relu(y)
        y = nn.Dense(C, dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        if pack > 1:
            y = jnp.tile(y, (1, pack))
        return x * y[:, None, None, :]


class SEBasicBlock(nn.Module):
    """SE residual block (reference: resnet.py:7-47).

    Layout: [avgpool?] -> conv3x3 -> ReLU -> BN -> conv3x3 -> BN -> SE ->
    (+residual, 1x1-conv downsample when channels change) -> ReLU.
    Note the unusual conv->ReLU->BN order of the first conv — mirrored
    deliberately (resnet.py:33-35).
    """

    planes: int
    pool: Optional[Tuple[int, int]] = None
    reduction: int = 8
    dtype: Any = jnp.float32
    # pack > 1: packed-resident stage mode — x arrives AND leaves as
    # (B, T, F/pack, pack*C); every op in the block runs in that layout
    # (exact math, see ops/packed_conv.py), so the per-conv pack/unpack
    # relayouts disappear.  The pool must be handled by the caller then.
    pack: int = 1

    @nn.compact
    def __call__(self, x, train: bool, frame_mask=None):
        if self.pool is not None:
            assert self.pack == 1, "pool is handled outside packed stages"
            # nn.avg_pool (reduce_window) measured FASTER in-program than a
            # reshape+mean formulation (105.4 vs 112.7 ms/step at B=32 bf16
            # on v5e — the reshape broke XLA fusions around the pool), so
            # the straightforward lowering stays
            x = nn.avg_pool(x, self.pool, strides=self.pool)
            frame_mask = pool_mask(frame_mask, self.pool[0])
            x = apply_frame_mask(x, frame_mask)
        residual = x
        in_ch = x.shape[-1] // self.pack
        conv_pack = self.pack if self.pack > 1 else None

        out = Conv3x3(self.planes, use_bias=False, pack=conv_pack,
                      dtype=self.dtype, name="conv1")(x)
        out = nn.relu(out)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, not train,
                                                      pack=self.pack)
        out = apply_frame_mask(out, frame_mask)

        out = Conv3x3(self.planes, use_bias=False, pack=conv_pack,
                      dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, not train,
                                                      pack=self.pack)
        out = apply_frame_mask(out, frame_mask)
        out = SELayer(self.reduction, dtype=self.dtype, name="se")(
            out, frame_mask, pack=self.pack)

        if in_ch != self.planes:
            if self.pack > 1:
                residual = _PackedConv1x1(self.planes, self.pack,
                                          dtype=self.dtype,
                                          name="down_conv")(residual)
            else:
                residual = nn.Conv(self.planes, (1, 1), use_bias=False,
                                   dtype=self.dtype, name="down_conv")(residual)
            residual = BatchNorm(dtype=self.dtype, name="down_bn")(
                residual, not train, pack=self.pack)
            residual = apply_frame_mask(residual, frame_mask)

        out = nn.relu(out + residual)
        return apply_frame_mask(out, frame_mask), frame_mask


class _PackedConv1x1(nn.Module):
    """1x1 conv on packed-resident input (block-diagonal packed weights).
    Param layout identical to ``nn.Conv(features, (1, 1), use_bias=False)``
    — 'kernel' (1, 1, Cin, Cout), lecun_normal — so checkpoints and golden
    tests see the same tree whether the stage runs packed or not."""

    features: int
    pack: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1] // self.pack
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (1, 1, cin, self.features))
        w = pack_weights_1x1(kernel.astype(self.dtype), self.pack)
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))


class SelfAttentionPooling(nn.Module):
    """Attention pooling over the frequency axis (reference:
    resnet.py:109-123): scalar score per (t, f), softmax over f, weighted
    sum.  Frequency axis is fully valid even for padded clips, so no mask
    is needed here."""

    @nn.compact
    def __call__(self, x):
        # x: (B, T, F, C)
        attn = nn.Dense(1, name="W")(x)[..., 0]  # (B, T, F)
        attn = jax.nn.softmax(attn, axis=-1)
        return jnp.einsum("btfc,btf->btc", x, attn)


def reverse_sequence(x: jax.Array, lengths: Optional[jax.Array]) -> jax.Array:
    """Reverse each (B, T, ...) sequence within its valid length so the
    backward GRU direction starts from the last *valid* frame (padded
    frames end up at the tail and never influence valid outputs)."""
    B, T = x.shape[0], x.shape[1]
    if lengths is None:
        return jnp.flip(x, axis=1)
    t = jnp.arange(T)[None, :]
    idx = jnp.where(t < lengths[:, None], lengths[:, None] - 1 - t, t)
    return jnp.take_along_axis(x, idx.reshape(B, T, *([1] * (x.ndim - 2))), axis=1)


class _GRUDirection(nn.Module):
    """Parameters of one GRU direction, torch ``nn.GRU`` layout:
    ``w_ih (D, 3H)``, ``w_hh (H, 3H)``, ``b_ih/b_hh (3H,)`` with gate order
    [r ‖ z ‖ n].  Calling returns the params; the recurrence itself runs in
    :func:`_bidi_gru_scan`, which fuses both directions of a layer into ONE
    ``lax.scan`` (half the sequential loop iterations per layer)."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        H = self.hidden
        k = 1.0 / jnp.sqrt(H)
        u = nn.initializers.uniform(scale=2 * k)  # ~U(0, 2k); shift to (-k, k)

        def uinit(key, shape, dtype=jnp.float32):
            return u(key, shape, dtype) - k

        return (self.param("w_ih", uinit, (self.in_dim, 3 * H)),
                self.param("w_hh", uinit, (H, 3 * H)),
                self.param("b_ih", uinit, (3 * H,)),
                self.param("b_hh", uinit, (3 * H,)))


def _bidi_gru_scan(x, x_rev, pf, pb, hidden: int):
    """Both directions of one BiGRU layer in a single ``lax.scan``.

    torch nn.GRU gate conventions per direction:

    r = σ(W_ir x + b_ir + W_hr h + b_hr)
    z = σ(W_iz x + b_iz + W_hz h + b_hz)
    n = tanh(W_in x + b_in + r ⊙ (W_hn h + b_hn))
    h' = (1 - z) ⊙ n + z ⊙ h

    The input projections are hoisted out of the scan as full-sequence
    MXU matmuls; the recurrent matmuls of the two directions run as one
    batched einsum per step — the forward direction consumes ``x`` and the
    backward direction consumes the (length-aware) reversed ``x_rev``, so
    both scan left-to-right over their own operand.
    Returns (fwd, bwd_rev): (B, T, H) each; ``bwd_rev`` is in reversed time
    order and must be reversed back by the caller.
    """
    B, T, D = x.shape
    H = hidden
    xi = jnp.stack([jnp.einsum("btd,dh->bth", x, pf[0]) + pf[2],
                    jnp.einsum("btd,dh->bth", x_rev, pb[0]) + pb[2]])  # (2,B,T,3H)
    w_hh = jnp.stack([pf[1], pb[1]])  # (2, H, 3H)
    b_hh = jnp.stack([pf[3], pb[3]])[:, None]  # (2, 1, 3H)

    def step(h, xi_t):  # h (2,B,H), xi_t (2,B,3H)
        hh = jnp.einsum("dbh,dhk->dbk", h, w_hh) + b_hh
        r = jax.nn.sigmoid(xi_t[..., :H] + hh[..., :H])
        z = jax.nn.sigmoid(xi_t[..., H : 2 * H] + hh[..., H : 2 * H])
        n = jnp.tanh(xi_t[..., 2 * H :] + r * hh[..., 2 * H :])
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    h0 = jnp.zeros((2, B, H), x.dtype)
    # unroll: amortize per-iteration while-loop overhead on TPU (the
    # recurrent matmul is tiny, so loop latency dominates the scan)
    _, ys = jax.lax.scan(step, h0, jnp.moveaxis(xi, 2, 0), unroll=8)  # (T,2,B,H)
    return jnp.moveaxis(ys[:, 0], 0, 1), jnp.moveaxis(ys[:, 1], 0, 1)


class BiGRU(nn.Module):
    """Multi-layer bidirectional GRU matching torch
    ``nn.GRU(bidirectional=True, num_layers=n, dropout=p, batch_first=True)``
    as used at resnet.py:153: dropout on every layer's output except the
    last.  ``lengths`` (valid frames at this rate) drives the
    reverse-sequence trick for padded eval clips."""

    hidden: int
    num_layers: int = 2
    dropout: float = 0.3

    @nn.compact
    def __call__(self, x, train: bool, lengths=None):
        for layer in range(self.num_layers):
            D = x.shape[-1]
            pf = _GRUDirection(D, self.hidden, name=f"l{layer}_fwd")()
            pb = _GRUDirection(D, self.hidden, name=f"l{layer}_bwd")()
            x_rev = reverse_sequence(x, lengths)
            fwd, bwd = _bidi_gru_scan(x, x_rev, pf, pb, self.hidden)
            bwd = reverse_sequence(bwd, lengths)
            x = jnp.concatenate([fwd, bwd], axis=-1)
            if layer < self.num_layers - 1 and self.dropout > 0:
                x = U8Dropout(self.dropout, deterministic=not train)(x)
        return x

"""Frequency-packed 3x3 conv: small-channel convs at large-channel speed.

XLA:TPU runs 3x3 stride-1 convs superbly at >= 128 channels (70-86% MFU on
v5e, profiler-verified) but collapses to ~4% MFU at 32 channels — the MXU
output lanes sit idle and the narrow channel dim forces padded layouts.
The SE-ResNet34 encoder's stage 1 (reference ``src/models/backbones/
resnet.py:146``) is exactly that shape, and dominates the conv budget.

The fix needs no custom kernel: fold ``pack`` adjacent frequency columns
into the channel dimension and run an *exactly equivalent* conv with
``pack*Cin -> pack*Cout`` channels:

    x4[b, t, g, p*Cin + c]            = x[b, t, g*pack + p, c]   (a reshape)
    w3[du, dg, pi*Cin + c, po*Cout + k] = w[du, dv, c, k]
        where dv = (dg - 1)*pack + pi - po + 1, kept iff 0 <= dv <= 2
    y[b, t, g*pack + po, k]           = conv(x4, w3)[b, t, g, po*Cout + k]

Every original tap appears exactly once and all other w3 entries are zero,
so the packed conv computes the same sums plus exact ``+0.0`` terms —
numerically identical up to XLA's usual conv summation order.  FLOPs
inflate by ``pack``x, but the MXU utilization gain is larger: measured on
v5e (B=32, bf16), stage 1 drops 3.72 -> 1.22 ms (3.0x) with pack=4 and
stage 2 0.79 -> 0.58 ms with pack=2.  Being pure XLA, the trick
differentiates (dgrad is itself a packed conv; dw flows through the w3
scatter) and composes with any precision context.

A Pallas implicit-GEMM conv was built and benchmarked first (git history:
``ops/pallas_conv.py``); it only tied XLA on stage 1 (patch-assembly
sublane shuffles dominated) and lost at >= 64 channels, so this XLA
formulation is the shipped one.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["best_pack", "pack_weights", "conv3x3_packed",
           "pack_weights_full", "conv3x3_fullpack",
           "pack_weights_1x1", "pack_x", "unpack_x",
           "pack_weights_time", "conv_time_packed"]


def pack_x(x: jax.Array, pack: int) -> jax.Array:
    """(B, T, F, C) -> (B, T, F/pack, pack*C) packed-resident layout."""
    if pack == 1:
        return x
    B, T, F, C = x.shape
    return x.reshape(B, T, F // pack, pack * C)


def unpack_x(x: jax.Array, pack: int) -> jax.Array:
    """(B, T, G, pack*C) -> (B, T, G*pack, C)."""
    if pack == 1:
        return x
    B, T, G, PC = x.shape
    return x.reshape(B, T, G * pack, PC // pack)


def pack_weights_1x1(w: jax.Array, pack: int) -> jax.Array:
    """(1, 1, Cin, Cout) -> (1, 1, pack*Cin, pack*Cout) block-diagonal: a
    1x1 conv touches no neighboring frequency columns, so each packed copy
    maps only onto itself."""
    cin, cout = w.shape[2], w.shape[3]
    w1 = jnp.zeros((1, 1, pack * cin, pack * cout), w.dtype)
    for p in range(pack):
        w1 = w1.at[:, :, p * cin : (p + 1) * cin,
                   p * cout : (p + 1) * cout].set(w)
    return w1


def best_pack(cout: int, f_dim: int) -> int:
    """Packing factor: fill the 128 MXU lanes (pack*Cout ~ 128) while
    dividing the frequency dim; 1 means plain conv is already efficient."""
    for pack in (4, 2):
        if cout * pack <= 128 and f_dim % pack == 0:
            return pack
    return 1


def pack_weights(w: jax.Array, pack: int) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 3, pack*Cin, pack*Cout) block-sparse
    channel-packed weights (zeros off the valid taps)."""
    cin, cout = w.shape[2], w.shape[3]
    w3 = jnp.zeros((3, 3, pack * cin, pack * cout), w.dtype)
    for dg in range(3):
        for pi in range(pack):
            for po in range(pack):
                dv = (dg - 1) * pack + pi - po + 1
                if 0 <= dv <= 2:
                    w3 = w3.at[:, dg, pi * cin : (pi + 1) * cin,
                               po * cout : (po + 1) * cout].set(w[:, dv])
    return w3


def conv3x3_packed(x: jax.Array, w: jax.Array, pack: int) -> jax.Array:
    """SAME 3x3 stride-1 NHWC conv via frequency-channel packing.

    x: (B, T, F, Cin) with F % pack == 0; w: (3, 3, Cin, Cout).
    pack == 1 falls through to the plain conv.
    """
    if pack == 1:
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    B, T, F, C = x.shape
    K = w.shape[3]
    x4 = x.reshape(B, T, F // pack, pack * C)
    y4 = jax.lax.conv_general_dilated(
        x4, pack_weights(w, pack), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y4.reshape(B, T, F, K)


def pack_weights_full(w: jax.Array, f_dim: int) -> jax.Array:
    """(3, 3, Cin, Cout) -> (3, 1, F*Cin, F*Cout): pack the ENTIRE
    frequency axis into channels so the conv becomes a time-only (3, 1)
    conv.  Valid taps: w31[du, 0, pi*Cin+c, po*Cout+k] = w[du, pi-po+1]
    when 0 <= pi-po+1 <= 2 — the tridiagonal block structure exactly
    reproduces SAME-padding boundary behavior (taps past the frequency
    edge multiply zeros in the plain conv and are simply absent here)."""
    cin, cout = w.shape[2], w.shape[3]
    w31 = jnp.zeros((3, 1, f_dim * cin, f_dim * cout), w.dtype)
    for pi in range(f_dim):
        for po in range(f_dim):
            dv = pi - po + 1
            if 0 <= dv <= 2:
                w31 = w31.at[:, 0, pi * cin : (pi + 1) * cin,
                             po * cout : (po + 1) * cout].set(w[:, dv])
    return w31


def pack_weights_time(w: jax.Array, pack: int):
    """(KT, KF, Cin, Cout) -> ((KTg, KF, pack*Cin, pack*Cout), (pad_lo, pad_hi))
    TIME-packed block-sparse weights for a stride-1, symmetrically padded
    (pad_t = (KT-1)//2, i.e. torch ``padding=KT//2``) time axis.

    Same construction as :func:`pack_weights` but on the time axis and for
    arbitrary odd kernel size: with outputs grouped as t_out = g*pack + po
    and inputs as t_in = gi*pack + pi, the original tap ``dt`` lands at
    group offset ``dgi`` iff ``dt = dgi*pack + pi - po + pad_t`` is a valid
    kernel index.  Taps past the time edge multiply explicit zero padding
    (returned as (pad_lo, pad_hi) on the group axis), exactly like the
    zeros SAME padding feeds the plain conv — the math is identical."""
    kt, kf, cin, cout = w.shape
    pad_t = (kt - 1) // 2
    lo = -((pad_t + pack - 1) // pack)
    hi = (kt - 1 - pad_t + pack - 1) // pack
    w3 = jnp.zeros((hi - lo + 1, kf, pack * cin, pack * cout), w.dtype)
    for dgi in range(lo, hi + 1):
        for pi in range(pack):
            for po in range(pack):
                dt = dgi * pack + pi - po + pad_t
                if 0 <= dt < kt:
                    w3 = w3.at[dgi - lo, :, pi * cin : (pi + 1) * cin,
                               po * cout : (po + 1) * cout].set(w[dt])
    return w3, (-lo, hi)


def conv_time_packed(x: jax.Array, w: jax.Array, pack: int,
                     f_stride: int = 1) -> jax.Array:
    """Symmetrically padded, stride-``(1, f_stride)`` NHWC conv with the
    TIME axis folded into channels.

    For the freq-only-strided conformer stem (reference
    ``src/models/backbones/resnet_conformer.py:347-394``): its strided
    convs can't frequency-pack (the stride crosses pack boundaries) but
    their time axis is stride-1 and always even — packing it fills the
    128 MXU output lanes for the Cout<=64 convs (stem 7x7 Cin=7->64,
    layer-1 entry 3x3 64->64) exactly like :func:`conv3x3_packed` does
    for SE-ResNet stage 1.

    x: (B, T, F, Cin) with T % pack == 0; w: (KT, KF, Cin, Cout), KT odd.
    Unlike frequency packing the (de)grouping is a transpose, not a free
    reshape — cheap relative to the conv, but measure before adopting.
    """
    B, T, F, C = x.shape
    kt, kf, _, K = w.shape
    pad_f = (kf - 1) // 2
    if pack == 1:
        return jax.lax.conv_general_dilated(
            x, w, (1, f_stride), ((kt // 2, kt // 2), (pad_f, pad_f)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
    G = T // pack
    x4 = x.reshape(B, G, pack, F, C).transpose(0, 1, 3, 2, 4)
    x4 = x4.reshape(B, G, F, pack * C)
    w3, (pl, ph) = pack_weights_time(w, pack)
    y4 = jax.lax.conv_general_dilated(
        x4, w3, (1, f_stride), ((pl, ph), (pad_f, pad_f)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    Fo = y4.shape[2]
    y = y4.reshape(B, G, Fo, pack, K).transpose(0, 1, 3, 2, 4)
    return y.reshape(B, T, Fo, K)


def conv3x3_fullpack(x: jax.Array, w: jax.Array) -> jax.Array:
    """SAME 3x3 stride-1 NHWC conv with the WHOLE frequency axis folded
    into channels — for the freq-only-strided conformer stem whose late
    stages run at F ∈ {1, 2, 4} where a spatial 3x3 wastes its frequency
    taps on padding (at F=1 two of three freq taps are pure zero-padding
    work; at F=2 the dense packed form has ZERO FLOP inflation; at F=4 it
    trades 1.6x block-padding FLOPs for full-lane (3,1) matmul shapes).

    x: (B, T, F, Cin); w: (3, 3, Cin, Cout).  Exact same math as the
    spatial conv (see :func:`pack_weights_full`).
    """
    B, T, F, C = x.shape
    K = w.shape[3]
    if F == 1:
        # only the middle frequency tap can touch data
        y = jax.lax.conv_general_dilated(
            x.reshape(B, T, 1, C), w[:, 1:2], (1, 1), ((1, 1), (0, 0)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y
    x1 = x.reshape(B, T, 1, F * C)
    y1 = jax.lax.conv_general_dilated(
        x1, pack_weights_full(w, F), (1, 1), ((1, 1), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y1.reshape(B, T, F, K)

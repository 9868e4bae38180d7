"""On-device SpecAugment (batched random time/frequency masking).

TPU-native replacement for the reference's per-sample torchaudio masking
(``src/utils/augmentations.py:6-33``): masks are sampled with the JAX PRNG
and applied to the whole feature batch in one fused elementwise op, after
the on-device feature front-end.

Semantics mirrored from the reference, including its axis quirk: the
reference feeds (C, T, F) tensors to torchaudio's ``TimeMasking`` /
``FrequencyMasking``, which mask the last and second-to-last axes —
so its "time" mask actually covers up to ``time_mask_param`` *mel bins*
and its "frequency" mask covers up to ``freq_mask_param`` *frames*.
Net behavior (one mask of width <=40 on each of the T and F axes, each
applied with probability 0.5, mask value 0) is what we reproduce, applied
independently per feature block (MEL channels, IV/GCC channels) as the
reference does per-block (``src/datasets.py:158-159``).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["spec_augment"]


def _one_block_mask(key, T, F, time_param, freq_param, thresh):
    """Returns a (T, F) multiplicative mask for one (clip, block)."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)

    def axis_mask(kw, ks, size, param):
        width = jax.random.uniform(kw) * param
        start = jax.random.uniform(ks) * (size - width)
        idx = jnp.arange(size, dtype=jnp.float32)
        return ~((idx >= start) & (idx < start + width))  # True = keep

    t_keep = jnp.where(jax.random.uniform(k1) <= thresh,
                       axis_mask(k2, k3, T, time_param), True)
    f_keep = jnp.where(jax.random.uniform(k4) <= thresh,
                       axis_mask(k5, k6, F, freq_param), True)
    return (t_keep[:, None] & f_keep[None, :]).astype(jnp.float32)


@functools.partial(jax.jit, static_argnums=(2, 3, 4, 5))
def spec_augment(
    feat: jax.Array,
    key: jax.Array,
    block_sizes: Tuple[int, ...] = (4, 3),
    time_mask_param: int = 40,
    freq_mask_param: int = 40,
    thresh: float = 0.5,
) -> jax.Array:
    """feat: (B, T, F, C); ``block_sizes`` partitions the channel axis into
    feature blocks (FOA: 4 MEL + 3 IV) that each get independent masks."""
    B, T, F, C = feat.shape
    assert sum(block_sizes) == C, (block_sizes, C)
    keys = jax.random.split(key, B * len(block_sizes)).reshape(B, len(block_sizes), 2)
    out = []
    start = 0
    for bi, width in enumerate(block_sizes):
        masks = jax.vmap(
            lambda k: _one_block_mask(k, T, F, time_mask_param, freq_mask_param, thresh)
        )(keys[:, bi])  # (B, T, F)
        out.append(feat[..., start : start + width] * masks[..., None])
        start += width
    return jnp.concatenate(out, axis=-1)

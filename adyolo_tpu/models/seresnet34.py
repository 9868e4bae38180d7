"""SE-ResNet34 + BiGRU SELD encoder (flax.linen).

Re-implementation of the reference encoder
(``src/models/backbones/resnet.py:126-199``):

* stem: 3x3 conv (bias) -> ReLU -> BN                     (resnet.py:142-144)
* 4 stages of SEBasicBlocks [3, 4, 6, 3] with channels [32, 64, 128, 256];
  stages 2 and 3 open with a 2x2 average pool => T/4, F/4 (resnet.py:146-149)
* self-attention pooling over frequency -> (B, T/4, 256)  (resnet.py:151)
* 2-layer BiGRU(128 per direction, dropout 0.3) + LayerNorm + tanh
  (resnet.py:153-154, 192-197)

Input here is channel-last (B, T, F, C); shapes for the DCASE geometry:
(B, 800, 64, 7) -> (B, 200, 256).
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops.packed_conv import best_pack, pack_x, unpack_x
from .layers import (
    BatchNorm,
    BiGRU,
    Conv3x3,
    SEBasicBlock,
    SelfAttentionPooling,
    apply_frame_mask,
    pool_mask,
)

__all__ = ["SEResNet34"]

_LAYERS = (3, 4, 6, 3)
_FILTERS = (32, 64, 128, 256)
_POOLS = (None, (2, 2), (2, 2), None)


class SEResNet34(nn.Module):
    enc_out_dim: int = 256
    time_pool: int = 4  # total time downsampling (matches label rate: 800->200)
    dtype: Any = jnp.float32  # conv-stack compute dtype (bf16 for training)
    gru_dropout: float = 0.3  # inter-layer GRU dropout (resnet.py:153);
    # overridable so gradient-parity tests can run train-mode deterministically
    # keep activations frequency-packed across whole stages (pack once at
    # stage entry, unpack at pool boundaries) instead of per conv — kills
    # the per-conv pack/unpack relayouts (~8.3 ms/step at B=32 bf16,
    # profiler-measured).  Exact same math and the identical
    # param/batch_stats tree either way.  Kept ON by the round-3 v5e A/B:
    # 8,240 audio_s/s ON vs 6,702 OFF on the bf16 train step
    # (benchlogs/bench_r3b.log; bench.py train-bf16-nopack re-measures).
    # ADYOLO_PACKED_STAGES=0 (read at import, for fresh-process A/B
    # benching) flips the default off.
    packed_stages: bool = os.environ.get("ADYOLO_PACKED_STAGES", "1") != "0"

    @nn.compact
    def __call__(self, x, train: bool = False, feat_lengths: Optional[jax.Array] = None):
        """x: (B, T, F, C); feat_lengths: optional (B,) valid frame counts.
        Returns (B, T // 4, enc_out_dim)."""
        frame_mask = None
        if feat_lengths is not None:
            t = jnp.arange(x.shape[1])[None, :]
            frame_mask = t < feat_lengths[:, None]
            x = apply_frame_mask(x, frame_mask)

        x = x.astype(self.dtype)
        # the stem shares stage 1's pack factor (no pool between them), so
        # the packed region opens before the stem conv
        cur_pack = best_pack(_FILTERS[0], x.shape[2]) if self.packed_stages else 1
        x = pack_x(x, cur_pack)
        x = Conv3x3(_FILTERS[0], use_bias=True, dtype=self.dtype,
                    pack=cur_pack if cur_pack > 1 else None, name="conv1")(x)
        x = nn.relu(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, not train, pack=cur_pack)
        x = apply_frame_mask(x, frame_mask)

        for stage, (n_blocks, planes, pool) in enumerate(zip(_LAYERS, _FILTERS, _POOLS)):
            if pool is not None:
                x = unpack_x(x, cur_pack)
                x = nn.avg_pool(x, pool, strides=pool)
                frame_mask = pool_mask(frame_mask, pool[0])
                x = apply_frame_mask(x, frame_mask)
                cur_pack = 1
            want = best_pack(planes, x.shape[2] * cur_pack) if self.packed_stages else 1
            if want != cur_pack:
                x = pack_x(unpack_x(x, cur_pack), want)
                cur_pack = want
            for b in range(n_blocks):
                x, frame_mask = SEBasicBlock(
                    planes=planes,
                    pool=None,
                    pack=cur_pack,
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_block{b}",
                )(x, train, frame_mask)
        x = unpack_x(x, cur_pack)

        # attention/GRU tail runs in >= f32 (f64 under the x64 parity oracle)
        x = SelfAttentionPooling(name="attention")(
            x.astype(jnp.promote_types(x.dtype, jnp.float32)))  # (B, T/4, 256)

        lengths = None if feat_lengths is None else feat_lengths // self.time_pool
        x = BiGRU(hidden=self.enc_out_dim // 2, num_layers=2,
                  dropout=self.gru_dropout, name="gru")(x, train, lengths)
        x = nn.LayerNorm(epsilon=1e-5, name="norm")(x)
        return jnp.tanh(x)

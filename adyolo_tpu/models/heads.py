"""SELD output heads (flax.linen).

Re-implementation of ``src/models/linearheads.py``: every head is a
2-layer MLP (enc_dim -> ffn_dim -> out) with **no** nonlinearity between
the two Linears (linearheads.py:32-38 — a Sequential of two Linears),
xavier-uniform weights and zero biases (``init_head``,
linearheads.py:5-11), with a format-specific output activation:

* SEDDOA: sigmoid(K activity) ‖ tanh(3K doa)      (linearheads.py:43-48)
* ACCDOA: tanh(3K)                                 (linearheads.py:64-68)
* ADPIT:  tanh(3 tracks * 3K)                      (linearheads.py:82-86)
* ADYOLO: raw logits, G0*G1*A*(K+3) wide           (linearheads.py:101-104)
  (sigmoid/tanh splitting happens inside loss/decoder, loss.py:195-199)
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

__all__ = ["SEDDOAHead", "ACCDOAHead", "ADPITHead", "ADYOLOHead", "adyolo_out_dim"]

_xavier = nn.initializers.xavier_uniform()
_zeros = nn.initializers.zeros


def _mlp(x, ffn_dim: int, out_dim: int, name: str):
    x = nn.Dense(ffn_dim, kernel_init=_xavier, bias_init=_zeros, name=f"{name}_fc1")(x)
    x = nn.Dense(out_dim, kernel_init=_xavier, bias_init=_zeros, name=f"{name}_fc2")(x)
    return x


class SEDDOAHead(nn.Module):
    nb_classes: int
    ffn_dim: int = 256

    @nn.compact
    def __call__(self, x):
        sed = jax.nn.sigmoid(_mlp(x, self.ffn_dim, self.nb_classes, "sed"))
        doa = jnp.tanh(_mlp(x, self.ffn_dim, 3 * self.nb_classes, "doa"))
        return jnp.concatenate([sed, doa], axis=-1)  # (B, T, 4K)


class ACCDOAHead(nn.Module):
    nb_classes: int
    ffn_dim: int = 256

    @nn.compact
    def __call__(self, x):
        return jnp.tanh(_mlp(x, self.ffn_dim, 3 * self.nb_classes, "accdoa"))


class ADPITHead(nn.Module):
    nb_classes: int
    ffn_dim: int = 256
    n_tracks: int = 3

    @nn.compact
    def __call__(self, x):
        return jnp.tanh(_mlp(x, self.ffn_dim, self.n_tracks * 3 * self.nb_classes, "adpit"))


def adyolo_out_dim(nb_classes: int, grid_size: Tuple[float, float], nb_anchors: int) -> int:
    g0 = math.ceil(360 / grid_size[0])
    g1 = math.ceil(180 / grid_size[1])
    return g0 * g1 * nb_anchors * (nb_classes + 3)


class ADYOLOHead(nn.Module):
    nb_classes: int
    grid_size: Tuple[float, float] = (45.0, 45.0)
    nb_anchors: int = 5
    ffn_dim: int = 256

    @nn.compact
    def __call__(self, x):
        out = adyolo_out_dim(self.nb_classes, self.grid_size, self.nb_anchors)
        return _mlp(x, self.ffn_dim, out, "yolo")  # raw logits (B, T, out)

"""Model/criterion factories (reference: ``src/wrapper.py``).

``SELDModel`` pairs any encoder with the head selected by the loss name
(wrapper.py:19-57); :func:`make_criterion` returns the matching loss
callable (wrapper.py:63-88).
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax.numpy as jnp
import flax.linen as nn

from ..config import Config
from ..ops.grid import GridGeometry
from . import losses as L
from .heads import ACCDOAHead, ADPITHead, ADYOLOHead, SEDDOAHead
from .seresnet34 import SEResNet34

__all__ = ["SELDModel", "build_model", "make_criterion", "make_grid_geometry"]

ENCODERS = ("se-resnet34", "resnet-conformer")
LOSSES = ("seddoa", "masked-seddoa", "accdoa", "adpit", "adyolo")


def make_grid_geometry(cfg: Config) -> GridGeometry:
    return GridGeometry(
        grid_size=tuple(cfg.train.grid_size),
        g_overlap=cfg.train.g_overlap,
        nb_anchors=cfg.train.nb_anchors,
    )


class SELDModel(nn.Module):
    encoder_nm: str = "se-resnet34"
    loss_nm: str = "adyolo"
    nb_classes: int = 13
    grid_size: Tuple[float, float] = (45.0, 45.0)
    nb_anchors: int = 5
    enc_out_dim: int = 256
    compute_dtype: Any = jnp.float32  # encoder conv-stack dtype (bf16 train)
    remat: bool = False  # checkpoint conformer blocks (cfg.train.remat)

    @nn.compact
    def __call__(self, feat, train: bool = False, feat_lengths=None):
        """feat: (B, T, F, C) channel-last features; returns (B, T//4, out)."""
        if self.encoder_nm == "se-resnet34":
            x = SEResNet34(enc_out_dim=self.enc_out_dim, dtype=self.compute_dtype,
                           name="encoder")(
                feat, train=train, feat_lengths=feat_lengths)
        elif self.encoder_nm == "resnet-conformer":
            from .resnet_conformer import ResNetConformer

            x = ResNetConformer(emb_dim=self.enc_out_dim, dtype=self.compute_dtype,
                                remat=self.remat, name="encoder")(
                feat, train=train, feat_lengths=feat_lengths)
        else:
            raise NotImplementedError(f"encoder: {self.encoder_nm}")

        if self.loss_nm in ("seddoa", "masked-seddoa"):
            head = SEDDOAHead(self.nb_classes, self.enc_out_dim, name="head")
        elif self.loss_nm == "accdoa":
            head = ACCDOAHead(self.nb_classes, self.enc_out_dim, name="head")
        elif self.loss_nm == "adpit":
            head = ADPITHead(self.nb_classes, self.enc_out_dim, name="head")
        elif self.loss_nm == "adyolo":
            head = ADYOLOHead(self.nb_classes, self.grid_size, self.nb_anchors,
                              self.enc_out_dim, name="head")
        else:
            raise NotImplementedError(f"loss: {self.loss_nm}")
        return head(x)


def build_model(cfg: Config, compute_dtype: Optional[str] = None) -> SELDModel:
    """``compute_dtype`` overrides ``cfg.train.compute_dtype`` — eval paths
    pass 'float32' so parity is independent of the training dtype."""
    name = compute_dtype or cfg.train.compute_dtype
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[name]
    return SELDModel(
        encoder_nm=cfg.args.encoder,
        loss_nm=cfg.args.loss,
        nb_classes=cfg.data.nb_classes,
        grid_size=tuple(cfg.train.grid_size),
        nb_anchors=cfg.train.nb_anchors,
        compute_dtype=dtype,
        remat=cfg.train.remat,
    )


def make_criterion(cfg: Config) -> Callable:
    """Returns ``loss_fn(output, target, target_mask=None, frame_mask=None)
    -> scalar``.

    For adyolo, ``target`` is the padded (M, 7) tensor + mask; for dense
    formats the mask argument is ignored.  ``frame_mask`` ((B, T) bool)
    restricts every reduction to valid frames — the jit-compatible
    equivalent of trimming bucket padding off the output.
    """
    nb = cfg.data.nb_classes
    name = cfg.args.loss
    if name == "seddoa":
        return lambda o, t, m=None, fm=None: L.seddoa_loss(
            o, t, nb, masked_mse=False, frame_mask=fm)
    if name == "masked-seddoa":
        return lambda o, t, m=None, fm=None: L.seddoa_loss(
            o, t, nb, masked_mse=True, frame_mask=fm)
    if name == "accdoa":
        return lambda o, t, m=None, fm=None: L.accdoa_loss(o, t, frame_mask=fm)
    if name == "adpit":
        return lambda o, t, m=None, fm=None: L.adpit_loss(o, t, nb,
                                                          frame_mask=fm)
    if name == "adyolo":
        geom = make_grid_geometry(cfg)
        gains = cfg.train.loss_gains
        taus = tuple(cfg.train.train_unify)

        def f(o, t, m, fm=None):
            return L.adyolo_loss(o, t, m, geom, nb, taus, gains,
                                 frame_mask=fm)

        return f
    raise NotImplementedError(f"loss: {name}")

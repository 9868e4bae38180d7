"""SELD training losses (pure JAX, statically shaped).

Re-implementations of ``src/models/loss.py``:

* :func:`seddoa_loss`      — BCE(sed) + 1000·MSE(doa), optional
  activity-masked MSE (loss.py:32-54),
* :func:`accdoa_loss`      — plain MSE (loss.py:57-67),
* :func:`adpit_loss`       — 13-permutation track PIT with the pad-target
  trick, class/frame-wise argmin (loss.py:70-153), vectorized over the
  permutation axis instead of 13 sequential calls,
* :func:`adyolo_loss`      — the paper's angular-distance responsible-
  assignment loss (loss.py:156-251), re-expressed with **static shapes**:
  the reference's ragged target list and boolean-indexed BCE partitions
  (``output[obj_label]``; loss.py:226-239) become masked sums with exact
  denominator bookkeeping over a fixed-capacity padded target tensor, so
  a single XLA program covers every batch.

BCE matches torch ``nn.BCELoss`` semantics (per-element terms clamped to
100, the counterpart of torch clamping log at -100) but is computed from
logits via softplus for numerical robustness — mathematically identical
through sigmoid.
"""
from __future__ import annotations

import os
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LossGains
from ..ops.angular import gc_distance_deg
from ..ops.grid import GridGeometry

__all__ = ["seddoa_loss", "accdoa_loss", "adpit_loss", "adyolo_loss", "bce_probs"]

_BCE_CLAMP = 100.0  # torch BCELoss clamps log at -100
_F32_TINY = 1.1754944e-38  # smallest normal float32


def _log_clamped(p):
    """torch ``log(p).clamp(min=-100)`` with finite gradients.

    Below the smallest normal f32 (where TPUs flush subnormals to zero and
    ``log`` would emit -inf) the clamp value -100 is returned directly, so
    a fully saturated sigmoid (p == 0) yields per-element loss 100 exactly
    like torch, not the ~87.5 a 1e-38 probability clip would cap it at.
    Known deviation: in the subnormal band p ∈ (1.4e-45, 1.18e-38) — only
    reachable on CPUs, which keep subnormals — torch returns log(p) ∈
    (-103, -87.3) where this clamps to -100 early; on TPU both flush to
    the p == 0 case and agree.
    """
    raw = jnp.log(jnp.maximum(p, _F32_TINY))
    return jnp.where(p < _F32_TINY, jnp.asarray(-_BCE_CLAMP, p.dtype), raw)


def bce_probs(p, y):
    """Elementwise BCE on probabilities, torch nn.BCELoss convention."""
    return -(y * _log_clamped(p) + (1.0 - y) * _log_clamped(1.0 - p))


def _bce_logits_pos(z):
    """BCE(sigmoid(z), 1) = softplus(-z), clamped like torch."""
    return jnp.minimum(jax.nn.softplus(-z), _BCE_CLAMP)


def _bce_logits_neg(z):
    """BCE(sigmoid(z), 0) = softplus(z), clamped like torch."""
    return jnp.minimum(jax.nn.softplus(z), _BCE_CLAMP)


# ---------------------------------------------------------------------------


def _frame_mean(x, frame_mask):
    """Mean over (B, T, ...) restricted to valid frames.  With
    ``frame_mask=None`` this is ``x.mean()`` exactly; otherwise it equals
    the mean of ``x[:, :t_valid]`` for every per-row validity prefix —
    the jit-compatible form of the eval engine's eager trim."""
    if frame_mask is None:
        return jnp.mean(x)
    fm = frame_mask.astype(x.dtype)
    per_frame = int(np.prod(x.shape[2:]))
    denom = jnp.maximum(fm.sum() * per_frame, 1.0)
    return jnp.sum(x * fm.reshape(fm.shape + (1,) * (x.ndim - 2))) / denom


def seddoa_loss(output, target, nb_classes: int, masked_mse: bool,
                frame_mask=None):
    """output/target: (B, T, 4K) = [sed K ‖ doa 3K] (loss.py:42-54).
    ``frame_mask``: optional (B, T) validity — means run over valid frames
    only (bucket-padded eval clips)."""
    sed_o, doa_o = output[..., :nb_classes], output[..., nb_classes:]
    sed_t, doa_t = target[..., :nb_classes], target[..., nb_classes:]
    sed_loss = _frame_mean(bce_probs(sed_o, sed_t), frame_mask)
    if masked_mse:
        doa_o = doa_o * jnp.tile(sed_t, (1, 1, 3))
    doa_loss = _frame_mean((doa_o - doa_t) ** 2, frame_mask)
    return sed_loss + 1000.0 * doa_loss


def accdoa_loss(output, target, frame_mask=None):
    return _frame_mean((output - target) ** 2, frame_mask)


# ---------------------------------------------------------------------------

# slot-permutations of the ADPIT pad-target scheme (loss.py:91-121):
# slot ids: A0=0, B0=1, B1=2, C0=3, C1=4, C2=5; each row lists the 3 track
# assignments; the pad is the sum of the two *other* groups' canonical perms.
_ADPIT_PERMS = (
    (0, 0, 0),  # A0A0A0 (+ pad B0B0B1 + C0C1C2)
    (1, 1, 2), (1, 2, 1), (1, 2, 2), (2, 1, 1), (2, 1, 2), (2, 2, 1),  # B perms
    (3, 4, 5), (3, 5, 4), (4, 3, 5), (4, 5, 3), (5, 3, 4), (5, 4, 3),  # C perms
)


def adpit_loss(output, target, nb_classes: int, frame_mask=None):
    """output: (B, T, 9K); target: (B, T, 6, 4, K) (loss.py:79-153)."""
    B, T = target.shape[:2]
    K = nb_classes
    # activity-gated slot DOAs: (B, T, 6, 3, K)
    slot = target[:, :, :, 0:1, :] * target[:, :, :, 1:, :]

    a = jnp.concatenate([slot[:, :, 0], slot[:, :, 0], slot[:, :, 0]], axis=2)
    b = jnp.concatenate([slot[:, :, 1], slot[:, :, 1], slot[:, :, 2]], axis=2)
    c = jnp.concatenate([slot[:, :, 3], slot[:, :, 4], slot[:, :, 5]], axis=2)
    pads = {0: b + c, 1: a + c, 3: a + b}  # pad4A / pad4B / pad4C

    out = output.reshape(B, T, 9, K)
    losses = []
    for perm in _ADPIT_PERMS:
        tgt = jnp.concatenate([slot[:, :, perm[0]], slot[:, :, perm[1]], slot[:, :, perm[2]]], axis=2)
        tgt = tgt + pads[perm[0] if perm[0] in (0, 1, 3) else {2: 1, 4: 3, 5: 3}[perm[0]]]
        losses.append(jnp.mean((out - tgt) ** 2, axis=2))  # (B, T, K)
    stack = jnp.stack(losses, axis=0)  # (13, B, T, K)
    idx = jnp.argmin(stack, axis=0)
    chosen = jnp.take_along_axis(stack, idx[None], axis=0)[0]
    return _frame_mean(chosen, frame_mask)


# ---------------------------------------------------------------------------


def _uv_unnormalize(u, v, scale, off_u, off_v,
                    clamp_ele: Tuple[float, float] = (-90.0, 90.0)):
    """tanh (u, v) -> degrees: overlap-scaled span + cell-center offset,
    elevation clamp, azimuth wrap into [-180, 180) (loss.py:204-213 /
    datasets.py:760-768).  Shared by the inference grid decode and the
    loss's flat decode so the two cannot drift."""
    u = u * scale[0] + off_u
    v = jnp.clip(v * scale[1] + off_v, clamp_ele[0], clamp_ele[1])
    u = jnp.where(u >= 180.0, u - 360.0, u)
    u = jnp.where(u < -180.0, u + 360.0, u)
    return u, v


def adyolo_decode_grid(logits, geom: GridGeometry, nb_classes: int,
                       clamp_ele: Tuple[float, float] = (-90.0, 90.0)):
    """Grid decode for the inference path (datasets.py:752-768; the loss
    inlines the same math in a flat lane-friendly orientation — see
    :func:`adyolo_loss`): reshape to the (…, G0, G1, A, K+3) grid, split
    into [obj, class..] logits and tanh (u, v), un-normalize (u, v) to
    degrees (cell offset + overlap-scaled span), clamp elevation, wrap
    azimuth into [-180, 180).

    Returns (conf_logits, uv_deg): (..., G0, G1, A, K+1) and (..., A, 2).
    """
    g0, g1 = geom.nb_grids
    A = geom.nb_anchors
    lead = logits.shape[:-1]
    x = logits.reshape(*lead, g0, g1, A, nb_classes + 3)
    conf_logits = x[..., : nb_classes + 1]
    scale = geom.uv_to_degrees_scale()  # numpy (2,)
    bshape = (1,) * len(lead) + (g0, g1, 1)
    off = jnp.asarray(geom.offset)  # (g0, g1, 2)
    u, v = _uv_unnormalize(
        jnp.tanh(x[..., nb_classes + 1]), jnp.tanh(x[..., nb_classes + 2]),
        scale, off[..., 0].reshape(bshape), off[..., 1].reshape(bshape),
        clamp_ele)
    return conf_logits, jnp.stack([u, v], axis=-1)


# The sorted (scatter-free) AD-YOLO loss is the default; the original
# scatter-max formulation is kept selectable for A/B benching and as a
# readable oracle (ADYOLO_SORTED_LOSS=0; bench.py measures the flip).
_SORTED_LOSS = os.environ.get("ADYOLO_SORTED_LOSS", "1") == "1"


def adyolo_loss(
    logits,
    targets,
    target_mask,
    geom: GridGeometry,
    nb_classes: int,
    train_unify: Sequence[float] = (45.0, 25.0, 10.0),
    gains: LossGains = LossGains(),
    frame_mask=None,
    impl: str = None,
):
    """AD-YOLO loss under static shapes (loss.py:189-251).

    logits:      (B, T, G0*G1*A*(K+3)) raw head output
    targets:     (M, 7) padded [batch, frame, Gi, Gj, class, U, V]
    target_mask: (M,) bool validity
    frame_mask:  optional (B, T) frame validity — anchors of padded frames
    leave the negative-objectness set and every denominator, making the
    value equal to running the loss on ``logits[:, :t_valid]`` (the eval
    engine's bucket-padded clips; targets never fall on padded frames)

    For each unify threshold τ the responsible anchors are
    ``D < τ  ∪  argmin_a D`` (loss.py:222-224); duplicate (cell, anchor)
    hits collapse exactly as boolean indexing does in the reference, and
    every mean is a masked sum over the static grid with the matching
    element count as denominator — the set sizes torch's boolean
    partitions produce.

    Two mathematically identical implementations (``impl`` overrides the
    ADYOLO_SORTED_LOSS env default):

    * ``"sorted"`` — gathers the K+3 head columns once at every
      (target, anchor) pair, then dedups responsible hits with two
      40K-element ``lax.sort`` passes and run-start flags.  No scatter
      ops and no dense (K, NP) class grid: XLA:TPU lowers the
      scatter-max one-hot builds of the other path to sequential
      while/dynamic-update-slice loops (~5.7 ms/step at B=32 in the r4
      profile) where the sorts are fully vectorized.
    * ``"scatter"`` — the original formulation: one-hot object/class
      grids via ``.at[].max`` scatters, dense masked BCE sums.
    """
    if impl is None:
        impl = "sorted" if _SORTED_LOSS else "scatter"
    f = _adyolo_loss_sorted if impl == "sorted" else _adyolo_loss_scatter
    return f(logits, targets, target_mask, geom, nb_classes, train_unify,
             gains, frame_mask)


def _adyolo_loss_sorted(logits, targets, target_mask, geom, nb_classes,
                        train_unify, gains, frame_mask):
    B, T, _ = logits.shape
    g0, g1 = geom.nb_grids
    A = geom.nb_anchors
    K = nb_classes
    NP = B * T * g0 * g1 * A
    M = targets.shape[0]
    assert NP * K < 2 ** 31, "class-key space exceeds int32"

    flat = logits.reshape(NP, K + 3)
    # dense objectness BCE over all anchors: the negative term sums every
    # non-responsible anchor, so this is the one unavoidable dense pass
    neg_all = _bce_logits_neg(flat[:, 0])  # (NP,)

    valid = target_mask
    bi = targets[:, 0].astype(jnp.int32)
    ti = targets[:, 1].astype(jnp.int32)
    gi = jnp.where(valid, targets[:, 2].astype(jnp.int32), 0)
    gj = jnp.where(valid, targets[:, 3].astype(jnp.int32), 0)
    ci = jnp.where(valid, targets[:, 4].astype(jnp.int32), 0)
    cell = ((bi * T + ti) * g0 + gi) * g1 + gj
    cell = jnp.where(valid, cell, 0)

    anchor_flat = cell[:, None] * A + jnp.arange(A)[None, :]  # (M, A)
    # ONE row gather serves everything below: (u, v) decode, objectness
    # BCE at hit anchors, and both class-BCE terms
    rows = flat[anchor_flat.reshape(-1)].reshape(M, A, K + 3)

    scale = geom.uv_to_degrees_scale()  # numpy (2,)
    off = jnp.asarray(geom.offset)  # (g0, g1, 2)
    u, v = _uv_unnormalize(jnp.tanh(rows[..., K + 1]),
                           jnp.tanh(rows[..., K + 2]), scale,
                           off[gi, gj, 0][:, None], off[gi, gj, 1][:, None])
    pred_uv = jnp.stack([u, v], axis=-1)  # (M, A, 2)
    D = gc_distance_deg(pred_uv, targets[:, None, 5:7], clip_eps=1e-7)

    amin_onehot = jax.nn.one_hot(jnp.argmin(D, axis=1), A, dtype=bool)

    # responsibility rank: -1 for the forced argmin anchor (responsible at
    # every τ), D elsewhere, +inf for padded targets.  Within a run of
    # equal sort keys the first element carries the minimum rank, so
    # "some hit on this key is responsible at τ" == "run starts AND its
    # rank < τ" — the run-start flag is the dedup the scatter-max did.
    rank = jnp.where(amin_onehot, -1.0, D)
    rank = jnp.where(valid[:, None], rank, jnp.inf).reshape(-1)  # (M*A,)

    z_cls = rows[..., 1:K + 1]  # (M, A, K)
    pa = _bce_logits_pos(rows[..., 0]).reshape(-1)  # (M*A,)
    na = _bce_logits_neg(rows[..., 0]).reshape(-1)
    # Σ_k BCE(class_k, 0) at each hit anchor: the all-negative baseline of
    # the class grid row; marked (class, anchor) pairs add pos-neg deltas
    nksum = _bce_logits_neg(z_cls).sum(-1).reshape(-1)
    z_tgt = jnp.take_along_axis(
        z_cls, jnp.broadcast_to(ci[:, None, None], (M, A, 1)), axis=2)[..., 0]
    delta = (_bce_logits_pos(z_tgt) - _bce_logits_neg(z_tgt)).reshape(-1)

    keys = anchor_flat.reshape(-1)
    k_s, r_s, pa_s, na_s, nk_s = jax.lax.sort(
        (keys, rank, pa, na, nksum), num_keys=2)
    start1 = jnp.concatenate([jnp.ones((1,), bool), k_s[1:] != k_s[:-1]])

    keys2 = (anchor_flat * K + ci[:, None]).reshape(-1)  # (class, anchor) key
    k2_s, r2_s, d2_s = jax.lax.sort((keys2, rank, delta), num_keys=2)
    start2 = jnp.concatenate([jnp.ones((1,), bool), k2_s[1:] != k2_s[:-1]])

    if frame_mask is None:
        neg_total = neg_all.sum()
        n_valid_anchors = float(NP)
    else:
        anchor_validf = jnp.repeat(
            frame_mask.reshape(-1).astype(jnp.float32), g0 * g1 * A)  # (NP,)
        neg_total = jnp.sum(neg_all * anchor_validf)
        n_valid_anchors = anchor_validf.sum()

    total = jnp.asarray(0.0, jnp.float32)
    n_taus = len(train_unify)
    for i, tau in enumerate(train_unify):
        first1 = (start1 & (r_s < tau)).astype(jnp.float32)
        first2 = (start2 & (r2_s < tau)).astype(jnp.float32)
        n_pos = first1.sum()
        n_pos_f = jnp.maximum(n_pos, 1.0)
        pos_loss = jnp.sum(pa_s * first1) / n_pos_f
        n_neg_f = jnp.maximum(n_valid_anchors - n_pos, 1.0)
        # hit anchors always sit on valid frames, so subtracting them from
        # the (masked) total leaves exactly the valid negative set
        neg_loss = (neg_total - jnp.sum(na_s * first1)) / n_neg_f
        class_loss = (jnp.sum(nk_s * first1)
                      + jnp.sum(d2_s * first2)) / (n_pos_f * K)

        if i == 0:
            # angular term: every responsible (target, anchor) pair counts,
            # duplicates included (reference sums D[resp] over the pairs)
            respf = (((D < tau) | amin_onehot)
                     & valid[:, None]).astype(jnp.float32)
            n_resp = jnp.maximum(respf.sum(), 1.0)
            total = total + (jnp.sum(D / 180.0 * respf)
                             / n_resp) * gains.angular_gain

        total = total + (
            pos_loss * gains.object_gain
            + neg_loss * gains.nonobj_gain
            + class_loss * gains.class_gain
        ) / n_taus

    return total


def _adyolo_loss_scatter(logits, targets, target_mask, geom, nb_classes,
                         train_unify, gains, frame_mask):
    B, T, _ = logits.shape
    g0, g1 = geom.nb_grids
    A = geom.nb_anchors
    K = nb_classes
    NP = B * T * g0 * g1 * A

    # Lane-friendly orientation: ONE physical transpose of the head output
    # to (K+3, NP) so every elementwise/reduce op below runs over the long
    # NP axis in the 128-lane minor dimension.  (Keeping the natural
    # (..., K+3) orientation costs ~10 ms/step at B=32 on v5e: XLA has to
    # re-tile minor-dim-14 tensors with physical copies, at ~11% lane
    # utilization — measured via jax.profiler, see PLAN.md.)
    xT = logits.reshape(NP, K + 3).T  # (K+3, NP)
    z_obj = xT[0]
    z_cls = xT[1 : K + 1]  # (K, NP)

    # (u, v) tanh -> degrees, per flat (cell, anchor) index; the cell-center
    # offset pattern repeats every g0*g1*A entries (loss.py:204-213)
    scale = geom.uv_to_degrees_scale()  # numpy (2,)
    off_u = jnp.asarray(np.repeat(geom.offset[..., 0].reshape(-1), A))
    off_v = jnp.asarray(np.repeat(geom.offset[..., 1].reshape(-1), A))
    u, v = _uv_unnormalize(jnp.tanh(xT[K + 1]), jnp.tanh(xT[K + 2]), scale,
                           jnp.tile(off_u, B * T), jnp.tile(off_v, B * T))

    valid = target_mask
    bi = targets[:, 0].astype(jnp.int32)
    ti = targets[:, 1].astype(jnp.int32)
    gi = targets[:, 2].astype(jnp.int32)
    gj = targets[:, 3].astype(jnp.int32)
    ci = targets[:, 4].astype(jnp.int32)
    cell = ((bi * T + ti) * g0 + gi) * g1 + gj
    cell = jnp.where(valid, cell, 0)
    ci = jnp.where(valid, ci, 0)

    anchor_flat = cell[:, None] * A + jnp.arange(A)[None, :]  # (M, A)
    pred_uv = jnp.stack([u[anchor_flat], v[anchor_flat]], axis=-1)  # (M, A, 2)
    D = gc_distance_deg(pred_uv, targets[:, None, 5:7], clip_eps=1e-7)  # (M, A)

    amin_onehot = jax.nn.one_hot(jnp.argmin(D, axis=1), A, dtype=bool)

    pos_all = _bce_logits_pos(z_obj)
    neg_all = _bce_logits_neg(z_obj)

    # bucket-padded eval clips: anchors of invalid frames leave the
    # negative set and its denominator (targets never land there)
    if frame_mask is None:
        anchor_validf = None
    else:
        anchor_validf = jnp.repeat(
            frame_mask.reshape(-1).astype(jnp.float32), g0 * g1 * A)  # (NP,)

    total = jnp.asarray(0.0, jnp.float32)
    n_taus = len(train_unify)
    for i, tau in enumerate(train_unify):
        resp = (D < tau) | amin_onehot
        resp = resp & valid[:, None]

        obj = jnp.zeros((NP,), bool).at[anchor_flat.reshape(-1)].max(resp.reshape(-1))
        cls_idx = (ci[:, None] * NP + anchor_flat).reshape(-1)  # into (K, NP) flat
        cls_lab = (
            jnp.zeros((K * NP,), bool).at[cls_idx].max(resp.reshape(-1)).reshape(K, NP)
        )

        n_pos = obj.sum()
        n_pos_f = jnp.maximum(n_pos, 1).astype(jnp.float32)

        objf = obj.astype(jnp.float32)
        pos_loss = jnp.sum(pos_all * objf) / n_pos_f
        if anchor_validf is None:
            n_neg_f = jnp.maximum(NP - n_pos, 1).astype(jnp.float32)
            neg_loss = jnp.sum(neg_all * (1.0 - objf)) / n_neg_f
        else:
            n_neg_f = jnp.maximum(
                anchor_validf.sum() - n_pos.astype(jnp.float32), 1.0)
            neg_loss = jnp.sum(neg_all * (1.0 - objf) * anchor_validf) / n_neg_f

        y = cls_lab.astype(jnp.float32)
        cls_elem = _bce_logits_pos(z_cls) * y + _bce_logits_neg(z_cls) * (1.0 - y)
        class_loss = jnp.sum(cls_elem * objf[None, :]) / (n_pos_f * K)

        if i == 0:
            respf = resp.astype(jnp.float32)
            n_resp = jnp.maximum(respf.sum(), 1.0)
            total = total + (jnp.sum(D / 180.0 * respf) / n_resp) * gains.angular_gain

        total = total + (
            pos_loss * gains.object_gain
            + neg_loss * gains.nonobj_gain
            + class_loss * gains.class_gain
        ) / n_taus

    return total

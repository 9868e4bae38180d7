"""Loss parity tests vs dynamic-shape numpy oracles."""
import numpy as np
import jax.numpy as jnp
import pytest

from adyolo_tpu.config import LossGains
from adyolo_tpu.models import losses as L
from adyolo_tpu.ops.grid import GridGeometry
from adyolo_tpu.data.labels import encode_adyolo, pad_yolo_targets

from tests import oracle_losses as oracle

K = 13
GEOM = GridGeometry(grid_size=(45.0, 45.0), g_overlap=0.5, nb_anchors=5)


def test_grid_geometry():
    assert GEOM.nb_grids == (8, 4)
    assert GEOM.nb_predicts == 8 * 4 * 5
    # center of cell (0, 0)
    np.testing.assert_allclose(GEOM.offset[0, 0], [-157.5, -67.5])
    np.testing.assert_allclose(GEOM.offset[7, 3], [157.5, 67.5])
    # overlap-expanded bounds, elevation clipped
    np.testing.assert_allclose(GEOM.lb[0, 0], [-202.5, -90.0])
    np.testing.assert_allclose(GEOM.ub[7, 3], [202.5, 90.0])


def test_responsible_cells_wraparound():
    # an event at azi=-179 must also be owned by cells near +180 via wrap
    resp = GEOM.responsible_cells(-179.0, 0.0)
    gi = np.where(resp.any(axis=1))[0]
    assert 0 in gi and 7 in gi  # both edges of the azimuth grid


def test_seddoa_loss_matches_oracle():
    rng = np.random.default_rng(0)
    out = rng.uniform(0.01, 0.99, (2, 8, 4 * K)).astype(np.float32)
    tgt = (rng.uniform(size=(2, 8, 4 * K)) > 0.7).astype(np.float32)
    for masked in (False, True):
        got = float(L.seddoa_loss(jnp.asarray(out), jnp.asarray(tgt), K, masked))
        want = oracle.oracle_seddoa(out, tgt, K, masked)
        np.testing.assert_allclose(got, want, rtol=1e-5)


def test_accdoa_loss():
    rng = np.random.default_rng(1)
    out = rng.standard_normal((2, 8, 3 * K)).astype(np.float32)
    tgt = rng.standard_normal((2, 8, 3 * K)).astype(np.float32)
    got = float(L.accdoa_loss(jnp.asarray(out), jnp.asarray(tgt)))
    np.testing.assert_allclose(got, ((out - tgt) ** 2).mean(), rtol=1e-6)


def test_adpit_loss_matches_oracle():
    rng = np.random.default_rng(2)
    B, T = 2, 16
    out = rng.standard_normal((B, T, 9 * K)).astype(np.float32) * 0.5
    tgt = np.zeros((B, T, 6, 4, K), np.float32)
    # random sparse activity across all slot groups
    for _ in range(60):
        b, t, c = rng.integers(B), rng.integers(T), rng.integers(K)
        group = rng.integers(3)
        slots = [[0], [1, 2], [3, 4, 5]][group]
        for s in slots:
            xyz = rng.standard_normal(3)
            xyz /= np.linalg.norm(xyz)
            tgt[b, t, s, 0, c] = 1.0
            tgt[b, t, s, 1:, c] = xyz
    got = float(L.adpit_loss(jnp.asarray(out), jnp.asarray(tgt), K))
    want = oracle.oracle_adpit(out, tgt, K)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def _random_events(rng, B, T, n):
    """Generate events + their grid-cell assignments via the label encoder."""
    per_clip = []
    all_events = []
    for b in range(B):
        label = {}
        for _ in range(n):
            t = int(rng.integers(T))
            azi = float(rng.uniform(-180, 180))
            ele = float(rng.uniform(-90, 90))
            c = int(rng.integers(K))
            label.setdefault(t, []).append([c, 0, azi, ele])
        enc = encode_adyolo(label, T, GEOM)
        per_clip.append(enc)
        for row in enc:
            all_events.append([b] + list(row))
    return per_clip, all_events


@pytest.mark.parametrize("n_events", [0, 1, 5])
def test_adyolo_loss_matches_oracle(n_events):
    rng = np.random.default_rng(3 + n_events)
    B, T = 2, 8
    P = GEOM.nb_predicts * (K + 3)
    logits = (rng.standard_normal((B, T, P)) * 0.7).astype(np.float32)
    per_clip, all_events = _random_events(rng, B, T, n_events)
    targets, mask = pad_yolo_targets(per_clip, max_targets=256)

    got = float(
        L.adyolo_loss(jnp.asarray(logits), jnp.asarray(targets), jnp.asarray(mask),
                      GEOM, K, (45.0, 25.0, 10.0), LossGains())
    )
    want = oracle.oracle_adyolo(logits, all_events, GEOM, K,
                                (45.0, 25.0, 10.0), LossGains())
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_adyolo_loss_padding_invariance():
    """Loss must not depend on the padded-target capacity."""
    rng = np.random.default_rng(9)
    B, T = 2, 8
    P = GEOM.nb_predicts * (K + 3)
    logits = jnp.asarray((rng.standard_normal((B, T, P)) * 0.5).astype(np.float32))
    per_clip, _ = _random_events(rng, B, T, 4)
    a = pad_yolo_targets(per_clip, max_targets=128)
    b = pad_yolo_targets(per_clip, max_targets=512)
    la = float(L.adyolo_loss(logits, jnp.asarray(a[0]), jnp.asarray(a[1]), GEOM, K))
    lb = float(L.adyolo_loss(logits, jnp.asarray(b[0]), jnp.asarray(b[1]), GEOM, K))
    np.testing.assert_allclose(la, lb, rtol=1e-6)


@pytest.mark.parametrize("n_events", [0, 1, 7])
def test_adyolo_sorted_matches_scatter(n_events):
    """The scatter-free (sorted) implementation must agree with the
    scatter-max formulation — value and gradient — including duplicate
    (cell, anchor) hits, which is exactly what the dedup handles."""
    import jax

    rng = np.random.default_rng(21 + n_events)
    B, T = 2, 8
    P = GEOM.nb_predicts * (K + 3)
    logits = jnp.asarray((rng.standard_normal((B, T, P)) * 0.7).astype(np.float32))
    per_clip, _ = _random_events(rng, B, T, n_events)
    if n_events:
        # engineer guaranteed duplicates: two same-frame events of different
        # classes at nearly the same direction -> same cell, shared anchors
        label = {2: [[0, 0, 30.0, 10.0], [1, 0, 31.0, 11.0],
                     [0, 0, 30.5, 10.5]]}
        per_clip[0] = np.concatenate(
            [per_clip[0], encode_adyolo(label, T, GEOM)], axis=0)
    targets, mask = pad_yolo_targets(per_clip, max_targets=256)
    targets, mask = jnp.asarray(targets), jnp.asarray(mask)

    args = (targets, mask, GEOM, K, (45.0, 25.0, 10.0), LossGains())
    v_sorted = float(L.adyolo_loss(logits, *args, impl="sorted"))
    v_scatter = float(L.adyolo_loss(logits, *args, impl="scatter"))
    np.testing.assert_allclose(v_sorted, v_scatter, rtol=1e-5, atol=1e-6)

    g_sorted = jax.grad(lambda lg: L.adyolo_loss(lg, *args, impl="sorted"))(logits)
    g_scatter = jax.grad(lambda lg: L.adyolo_loss(lg, *args, impl="scatter"))(logits)
    np.testing.assert_allclose(np.asarray(g_sorted), np.asarray(g_scatter),
                               rtol=1e-4, atol=1e-6)


def test_adyolo_sorted_matches_scatter_frame_mask():
    """Bucket-padded eval clips: both implementations must agree on the
    frame-masked loss (padded frames leave the negative set)."""
    rng = np.random.default_rng(33)
    B, T, t_valid = 2, 8, 5
    P = GEOM.nb_predicts * (K + 3)
    logits = jnp.asarray((rng.standard_normal((B, T, P)) * 0.7).astype(np.float32))
    per_clip, _ = _random_events(rng, B, t_valid, 4)
    targets, mask = pad_yolo_targets(per_clip, max_targets=128)
    fm = jnp.asarray(np.arange(T)[None, :] < t_valid).repeat(B, axis=0)

    args = (jnp.asarray(targets), jnp.asarray(mask), GEOM, K,
            (45.0, 25.0, 10.0), LossGains())
    v_sorted = float(L.adyolo_loss(logits, *args, frame_mask=fm, impl="sorted"))
    v_scatter = float(L.adyolo_loss(logits, *args, frame_mask=fm, impl="scatter"))
    np.testing.assert_allclose(v_sorted, v_scatter, rtol=1e-5, atol=1e-6)


def test_adyolo_grad_finite():
    import jax

    rng = np.random.default_rng(11)
    B, T = 1, 4
    P = GEOM.nb_predicts * (K + 3)
    logits = jnp.asarray(rng.standard_normal((B, T, P)).astype(np.float32))
    per_clip, _ = _random_events(rng, B, T, 3)
    targets, mask = pad_yolo_targets(per_clip, max_targets=64)

    g = jax.grad(
        lambda lg: L.adyolo_loss(lg, jnp.asarray(targets), jnp.asarray(mask), GEOM, K)
    )(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_bce_saturation_matches_torch_clamp():
    """torch nn.BCELoss clamps log at -100, so a fully saturated sigmoid
    (p==0 or 1-p==0) gives a per-element loss of exactly 100 (VERDICT r1
    weak #7); gradients must stay finite through the clamp."""
    import torch

    p = np.array([0.0, 1.0, 0.5, 1e-30, 1.0 - 1e-7], dtype=np.float32)
    y = np.array([1.0, 0.0, 1.0, 1.0, 0.0], dtype=np.float32)
    got = np.asarray(L.bce_probs(jnp.asarray(p), jnp.asarray(y)))
    want = torch.nn.BCELoss(reduction="none")(
        torch.tensor(p), torch.tensor(y)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5)
    assert got[0] == 100.0 and got[1] == 100.0

    import jax

    g = jax.grad(lambda q: L.bce_probs(q, jnp.asarray(y)).sum())(jnp.asarray(p))
    assert np.isfinite(np.asarray(g)).all()


# ---------------------------------------------------------------------------
# frame-masked eval losses: masked full-bucket value == eager trimmed value
# ---------------------------------------------------------------------------


def _fm(B, T, t_valid):
    return jnp.arange(T)[None, :] < jnp.asarray([t_valid]).reshape(-1, 1)


def test_masked_seddoa_accdoa_adpit_match_trimmed():
    """frame_mask restricts every reduction to valid frames — the
    jit-compatible equivalent of criterion(out[:, :t_valid]) on
    bucket-padded eval clips (VERDICT r2 weak #6)."""
    rng = np.random.default_rng(0)
    B, T, t_valid = 1, 24, 17
    fm = _fm(B, T, t_valid)

    out4 = rng.uniform(0.02, 0.98, (B, T, 4 * K)).astype(np.float32)
    tgt4 = np.zeros((B, T, 4 * K), np.float32)
    tgt4[:, :t_valid] = (rng.uniform(size=(B, t_valid, 4 * K)) > 0.7)
    for masked in (False, True):
        want = L.seddoa_loss(jnp.asarray(out4[:, :t_valid]),
                             jnp.asarray(tgt4[:, :t_valid]), K, masked)
        got = L.seddoa_loss(jnp.asarray(out4), jnp.asarray(tgt4), K, masked,
                            frame_mask=fm)
        np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    out3 = (rng.standard_normal((B, T, 3 * K)) * 0.5).astype(np.float32)
    tgt3 = np.zeros((B, T, 3 * K), np.float32)
    tgt3[:, :t_valid] = rng.standard_normal((B, t_valid, 3 * K)) * 0.5
    want = L.accdoa_loss(jnp.asarray(out3[:, :t_valid]),
                         jnp.asarray(tgt3[:, :t_valid]))
    got = L.accdoa_loss(jnp.asarray(out3), jnp.asarray(tgt3), frame_mask=fm)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

    out9 = (rng.standard_normal((B, T, 9 * K)) * 0.5).astype(np.float32)
    tgt9 = np.zeros((B, T, 6, 4, K), np.float32)
    for _ in range(30):
        t, c, g = rng.integers(t_valid), rng.integers(K), rng.integers(3)
        for s in [[0], [1, 2], [3, 4, 5]][g]:
            xyz = rng.standard_normal(3)
            xyz /= np.linalg.norm(xyz)
            tgt9[0, t, s, 0, c] = 1.0
            tgt9[0, t, s, 1:, c] = xyz
    want = L.adpit_loss(jnp.asarray(out9[:, :t_valid]),
                        jnp.asarray(tgt9[:, :t_valid]), K)
    got = L.adpit_loss(jnp.asarray(out9), jnp.asarray(tgt9), K, frame_mask=fm)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)


def test_masked_adyolo_matches_trimmed():
    rng = np.random.default_rng(1)
    B, T, t_valid = 1, 24, 17
    P = GEOM.nb_predicts * (K + 3)
    logits = (rng.standard_normal((B, T, P)) * 0.7).astype(np.float32)
    label = {}
    for _ in range(12):
        t = int(rng.integers(t_valid))
        label.setdefault(t, []).append([
            int(rng.integers(K)), 0, float(rng.uniform(-180, 180)),
            float(rng.uniform(-90, 90))])
    enc = encode_adyolo(label, t_valid, GEOM)
    padded, mask = pad_yolo_targets([enc], 256)
    want = L.adyolo_loss(jnp.asarray(logits[:, :t_valid]), jnp.asarray(padded),
                         jnp.asarray(mask), GEOM, K, (45.0, 25.0, 10.0),
                         LossGains())
    got = L.adyolo_loss(jnp.asarray(logits), jnp.asarray(padded),
                        jnp.asarray(mask), GEOM, K, (45.0, 25.0, 10.0),
                        LossGains(), frame_mask=_fm(B, T, t_valid))
    np.testing.assert_allclose(float(got), float(want), rtol=1e-6)

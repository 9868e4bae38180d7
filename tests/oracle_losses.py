"""Dynamic-shape numpy oracles for the SELD losses (test ground truth).

Written from the documented loss math (AD-YOLO paper / DCASE baselines)
with naive python loops and boolean indexing — the shapes are dynamic on
purpose, which is exactly what the static-shape device implementations
must reproduce.
"""
import numpy as np


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def bce(p, y):
    logp = np.maximum(np.log(np.maximum(p, 1e-300)), -100.0)
    log1mp = np.maximum(np.log(np.maximum(1.0 - p, 1e-300)), -100.0)
    return -(y * logp + (1.0 - y) * log1mp)


def gc_deg(uv1, uv2, eps=1e-7):
    a1, e1 = np.radians(uv1[..., 0]), np.radians(uv1[..., 1])
    a2, e2 = np.radians(uv2[..., 0]), np.radians(uv2[..., 1])
    c = np.sin(e1) * np.sin(e2) + np.cos(e1) * np.cos(e2) * np.cos(np.abs(a1 - a2))
    return np.degrees(np.arccos(np.clip(c, -1 + eps, 1 - eps)))


def oracle_seddoa(output, target, K, masked):
    sed_loss = bce(output[..., :K], target[..., :K]).mean()
    doa_o = output[..., K:]
    if masked:
        doa_o = doa_o * np.tile(target[..., :K], (1, 1, 3))
    return sed_loss + 1000.0 * ((doa_o - target[..., K:]) ** 2).mean()


def oracle_adpit(output, target, K):
    """output (B,T,9K); target (B,T,6,4,K)."""
    B, T = target.shape[:2]
    slot = target[:, :, :, 0:1, :] * target[:, :, :, 1:, :]  # (B,T,6,3,K)

    def cat(i, j, k):
        return np.concatenate([slot[:, :, i], slot[:, :, j], slot[:, :, k]], axis=2)

    A = cat(0, 0, 0)
    Bp = cat(1, 1, 2)
    Cp = cat(3, 4, 5)
    perms = [
        (A, Bp + Cp),
        (cat(1, 1, 2), A + Cp), (cat(1, 2, 1), A + Cp), (cat(1, 2, 2), A + Cp),
        (cat(2, 1, 1), A + Cp), (cat(2, 1, 2), A + Cp), (cat(2, 2, 1), A + Cp),
        (cat(3, 4, 5), A + Bp), (cat(3, 5, 4), A + Bp), (cat(4, 3, 5), A + Bp),
        (cat(4, 5, 3), A + Bp), (cat(5, 3, 4), A + Bp), (cat(5, 4, 3), A + Bp),
    ]
    out = output.reshape(B, T, 9, K)
    losses = np.stack([((out - (t + pad)) ** 2).mean(axis=2) for t, pad in perms])
    idx = losses.argmin(axis=0)
    return np.take_along_axis(losses, idx[None], axis=0)[0].mean()


def oracle_adyolo(logits, events, geom, K, taus, gains):
    """logits (B,T,P); events: list of [b, t, gi, gj, cls, U, V]."""
    B, T, _ = logits.shape
    g0, g1 = geom.nb_grids
    A = geom.nb_anchors
    x = logits.reshape(B, T, g0, g1, A, K + 3)
    conf = sigmoid(x[..., : K + 1])
    uv = np.tanh(x[..., K + 1 :]).astype(np.float64)
    uv = uv * geom.uv_to_degrees_scale() + geom.offset[None, None, :, :, None, :]
    uv[..., 1] = np.clip(uv[..., 1], -90, 90)
    uv[..., 0] = np.where(uv[..., 0] >= 180, uv[..., 0] - 360, uv[..., 0])
    uv[..., 0] = np.where(uv[..., 0] < -180, uv[..., 0] + 360, uv[..., 0])

    ev = np.asarray(events, np.float64).reshape(-1, 7)
    M = len(ev)
    D = np.zeros((M, A))
    for m, (b, t, gi, gj, c, U, V) in enumerate(ev):
        D[m] = gc_deg(uv[int(b), int(t), int(gi), int(gj)], np.array([U, V]))

    total = 0.0
    for i, tau in enumerate(taus):
        resp = D < tau
        if M:
            resp[np.arange(M), D.argmin(axis=1)] = True
        obj = np.zeros((B, T, g0, g1, A), bool)
        cls_lab = np.zeros((B, T, g0, g1, A, K))
        for m in range(M):
            b, t, gi, gj, c = (int(v) for v in ev[m, :5])
            for a in range(A):
                if resp[m, a]:
                    obj[b, t, gi, gj, a] = True
                    cls_lab[b, t, gi, gj, a, c] = 1.0
        pos = bce(conf[..., 0][obj], 1.0).mean() if obj.any() else 0.0
        neg = bce(conf[..., 0][~obj], 0.0).mean()
        cls_loss = bce(conf[obj][..., 1:], cls_lab[obj]).mean() if obj.any() else 0.0
        if i == 0 and resp.any():
            total += (D[resp] / 180.0).mean() * gains.angular_gain
        total += (pos * gains.object_gain + neg * gains.nonobj_gain
                  + cls_loss * gains.class_gain) / len(taus)
    return total

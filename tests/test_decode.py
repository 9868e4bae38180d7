"""DOA decoder + NMS tests."""
import dataclasses

import numpy as np
import pytest

from adyolo_tpu.config import Config, RunConfig
from adyolo_tpu.ops.decode import PostProcessor
from adyolo_tpu.ops.grid import GridGeometry

K = 13
GEOM = GridGeometry((45.0, 45.0), 0.5, 5)


def _cfg(loss, nms="conn-merge"):
    cfg = Config()
    cfg = dataclasses.replace(cfg, args=RunConfig(loss=loss))
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(cfg.train, nms=nms))
    return cfg


def _cartesian(azi, ele):
    a, e = np.radians(azi), np.radians(ele)
    return np.array([np.cos(a) * np.cos(e), np.sin(a) * np.cos(e), np.sin(e)])


def _yolo_logits(T, events, conf_logit=6.0):
    """Build logits predicting each (t, cls, azi, ele) exactly at every
    responsible cell, everything else strongly off."""
    g0, g1 = GEOM.nb_grids
    A = GEOM.nb_anchors
    x = np.full((1, T, g0, g1, A, K + 3), -8.0, np.float32)
    x[..., K + 1 :] = 0.0  # uv logits neutral
    scale = GEOM.uv_to_degrees_scale()
    for (t, cls, azi, ele) in events:
        resp = GEOM.responsible_cells(azi if azi != 180.0 else -180.0, ele)
        for gi, gj in zip(*np.where(resp)):
            uv_rel = (np.array([azi, ele]) - GEOM.offset[gi, gj]) / scale
            # wrap relative azimuth into tanh range
            if uv_rel[0] > 2:
                uv_rel[0] -= 360.0 / scale[0]
            if uv_rel[0] < -2:
                uv_rel[0] += 360.0 / scale[0]
            uv_logit = np.arctanh(np.clip(uv_rel, -0.999999, 0.999999))
            a = 0  # use anchor 0
            x[0, t, gi, gj, a, 0] = conf_logit
            x[0, t, gi, gj, a, 1 + cls] = conf_logit
            x[0, t, gi, gj, a, K + 1 :] = uv_logit
    return x.reshape(1, T, -1)


@pytest.mark.parametrize("nms", ["conn-merge", "soft-merge", "default"])
def test_adyolo_decode_single_event(nms):
    pp = PostProcessor(_cfg("adyolo", nms))
    azi, ele = 37.0, -12.0
    logits = _yolo_logits(4, [(1, 5, azi, ele)])
    out = pp.postprocess(logits)
    assert list(out.keys()) == [1]
    rows = np.asarray(out[1])
    # all responsible-cell predictions agree -> NMS must collapse to one
    assert rows.shape == (1, 4)
    assert int(rows[0, 0]) == 5
    np.testing.assert_allclose(rows[0, 1:], _cartesian(azi, ele), atol=1e-4)


def test_adyolo_decode_two_distant_events():
    pp = PostProcessor(_cfg("adyolo"))
    logits = _yolo_logits(2, [(0, 3, -120.0, -40.0), (0, 3, 100.0, 50.0)])
    out = pp.postprocess(logits)
    rows = np.asarray(out[0])
    assert rows.shape == (2, 4)  # same class, far apart -> two detections
    got = {tuple(np.round(r[1:], 2)) for r in rows}
    want = {tuple(np.round(_cartesian(-120, -40), 2)), tuple(np.round(_cartesian(100, 50), 2))}
    assert got == want


def test_adyolo_decode_wraparound_azimuth():
    """Event near the ±180 seam decodes once despite wrap-around cells."""
    pp = PostProcessor(_cfg("adyolo"))
    logits = _yolo_logits(1, [(0, 0, -179.0, 10.0)])
    out = pp.postprocess(logits)
    rows = np.asarray(out[0])
    assert rows.shape == (1, 4)
    np.testing.assert_allclose(rows[0, 1:], _cartesian(-179.0, 10.0), atol=1e-3)


def test_adyolo_conf_threshold_gates_output():
    pp = PostProcessor(_cfg("adyolo"))
    logits = _yolo_logits(2, [(0, 2, 30.0, 0.0)], conf_logit=6.0)
    assert 0 in pp.postprocess(logits)
    pp.set_conf_thresh(0.9999)
    assert pp.postprocess(logits) == {}
    assert pp.get_conf_thresh() == 0.9999


def test_seddoa_decode():
    pp = PostProcessor(_cfg("seddoa"))
    T = 3
    out = np.zeros((1, T, 4 * K), np.float32)
    xyz = _cartesian(45.0, 30.0)
    out[0, 1, 7] = 0.9  # class 7 active at frame 1
    out[0, 1, K + 7] = xyz[0]
    out[0, 1, 2 * K + 7] = xyz[1]
    out[0, 1, 3 * K + 7] = xyz[2]
    res = pp.postprocess(out)
    assert list(res.keys()) == [1]
    np.testing.assert_allclose(res[1][0], [7, *xyz], atol=1e-6)


def test_accdoa_decode():
    pp = PostProcessor(_cfg("accdoa"))
    T = 3
    out = np.zeros((1, T, 3 * K), np.float32)
    xyz = _cartesian(-60.0, 10.0)
    for i in range(3):
        out[0, 2, i * K + 4] = xyz[i]  # unit norm > 0.5 -> active
    res = pp.postprocess(out)
    assert list(res.keys()) == [2]
    np.testing.assert_allclose(res[2][0], [4, *xyz], atol=1e-6)
    # sub-threshold magnitude is silent
    out *= 0.3
    assert pp.postprocess(out) == {}


def test_adpit_decode_unify_cases():
    pp = PostProcessor(_cfg("adpit"))
    T = 4
    out = np.zeros((1, T, 9 * K), np.float32)
    tr = out.reshape(1, T, 3, 3, K)
    v = _cartesian(20.0, 0.0)
    # frame 0: all three tracks agree on class 1 -> single averaged output
    for track in range(3):
        tr[0, 0, track, :, 1] = v
    # frame 1: tracks 0,1 agree on class 2; track 2 far away -> two outputs
    tr[0, 1, 0, :, 2] = v
    tr[0, 1, 1, :, 2] = v
    tr[0, 1, 2, :, 2] = _cartesian(-150.0, -60.0)
    # frame 2: three distinct directions for class 3 -> three outputs
    tr[0, 2, 0, :, 3] = _cartesian(0.0, 0.0)
    tr[0, 2, 1, :, 3] = _cartesian(120.0, 40.0)
    tr[0, 2, 2, :, 3] = _cartesian(-120.0, -40.0)
    res = pp.postprocess(out)
    assert len(res[0]) == 1 and res[0][0][0] == 1
    np.testing.assert_allclose(res[0][0][1:], v, atol=1e-6)
    assert len(res[1]) == 2
    assert len(res[2]) == 3


def test_conn_merge_votes_nearby_detections():
    """Two close same-class detections with different confidences merge into
    a confidence-weighted unit vector between them."""
    pp = PostProcessor(_cfg("adyolo", "conn-merge"))
    g0, g1 = GEOM.nb_grids
    A = GEOM.nb_anchors
    x = np.full((1, 1, g0, g1, A, K + 3), -8.0, np.float32)
    x[..., K + 1 :] = 0.0
    scale = GEOM.uv_to_degrees_scale()
    # place two detections 6 degrees apart in one cell, different anchors
    gi, gj = 4, 2
    for a, (azi, conf) in enumerate([(10.0, 6.0), (16.0, 3.0)]):
        uv_rel = (np.array([azi, 22.5]) - GEOM.offset[gi, gj]) / scale
        x[0, 0, gi, gj, a, 0] = conf
        x[0, 0, gi, gj, a, 1 + 6] = conf
        x[0, 0, gi, gj, a, K + 1 :] = np.arctanh(np.clip(uv_rel, -0.999999, 0.999999))
    res = pp.postprocess(x.reshape(1, 1, -1))
    rows = np.asarray(res[0])
    assert rows.shape == (1, 4)
    azi_out = np.degrees(np.arctan2(rows[0, 2], rows[0, 1]))
    assert 10.0 < azi_out < 16.0  # between the two, nearer the confident one
    assert azi_out < 13.0
    np.testing.assert_allclose(np.linalg.norm(rows[0, 1:]), 1.0, atol=1e-6)


def test_cached_decode_matches_direct_across_taus():
    """candidates() + postprocess_cached() must reproduce postprocess()
    exactly for every τ in the arbitration scan (the cache is built once
    with the scan's minimum τ guarding top-k truncation)."""
    rng = np.random.default_rng(3)
    T = 12
    # realistic mixed logits: mostly quiet frames + a few confident events
    x = rng.standard_normal((1, T, GEOM.nb_predicts // 5 * 5 * (K + 3))) * 2.0
    x = x.reshape(1, T, -1).astype(np.float32)
    pp = PostProcessor(_cfg("adyolo"))
    cache = pp.candidates(x)
    for tau in np.arange(0.1, 1.0, 0.1):
        pp.set_conf_thresh(float(tau))
        direct = pp.postprocess(x, valid_label_frames=T)
        cached = pp.postprocess_cached(cache, valid_label_frames=T)
        assert direct == cached, tau


def test_cached_decode_dense_formats():
    rng = np.random.default_rng(4)
    for loss in ("seddoa", "accdoa", "adpit"):
        pp = PostProcessor(_cfg(loss))
        D = {"seddoa": 4 * K, "accdoa": 3 * K, "adpit": 9 * K}[loss]
        out = rng.uniform(-1, 1, (1, 8, D)).astype(np.float32)
        cache = pp.candidates(out)
        assert pp.postprocess_cached(cache, 8) == pp.postprocess(out, 8)


@pytest.mark.parametrize("nms", ["conn-merge", "soft-merge", "default"])
def test_native_nms_matches_numpy(nms):
    """native/nms.cpp must reproduce the numpy NMS bit-for-bit across all
    three modes on dense saturated candidates (the worst case it exists
    to accelerate)."""
    from adyolo_tpu.ops import nms_native

    if not nms_native.available():
        pytest.skip("no C++ toolchain")
    rng = np.random.default_rng(7)
    T = 6
    x = (rng.standard_normal((1, T, GEOM.nb_predicts * (K + 3))) * 2.0).astype(np.float32)
    pp = PostProcessor(_cfg("adyolo", nms))
    for tau in (0.1, 0.5):
        pp.set_conf_thresh(tau)
        pp._use_native = True
        got = pp.postprocess(x, valid_label_frames=T)
        pp._use_native = False
        want = pp.postprocess(x, valid_label_frames=T)
        assert got.keys() == want.keys()
        for t in want:
            g, w = np.asarray(got[t]), np.asarray(want[t])
            assert g.shape == w.shape, (t, g.shape, w.shape)
            # identical math modulo C library trig rounding (~1e-16)
            np.testing.assert_allclose(g, w, rtol=0, atol=1e-9)

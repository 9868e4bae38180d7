"""SELD metrics golden-parity tests against the reference scorer.

The reference's ``seld_metrics.py`` depends only on numpy/scipy, so the
*original module* (read-only at /root/reference) is imported as the test
oracle — genuine golden parity, not a re-derived approximation.
"""
import os
import sys

import numpy as np
import pytest

from adyolo_tpu.metrics.hungarian import linear_sum_assignment
from adyolo_tpu.metrics.seld import SegmentScorer, SELDMetrics, segment_labels
from adyolo_tpu.data.io import write_seld_output_csv, write_label_csv


def _load_reference_scorer():
    if not hasattr(np, "float"):
        np.float = float  # reference targets numpy<1.24 (seld_metrics.py:4)
    sys.path.insert(0, "/root/reference/src")
    import utils.seld_metrics as ref

    return ref


REF = _load_reference_scorer()


def test_hungarian_matches_scipy():
    from scipy.optimize import linear_sum_assignment as scipy_lsa

    rng = np.random.default_rng(0)
    for n, m in [(1, 1), (3, 3), (2, 5), (5, 2), (6, 6), (4, 9), (9, 4)]:
        for _ in range(20):
            cost = rng.uniform(0, 180, (n, m))
            r1, c1 = linear_sum_assignment(cost)
            r2, c2 = scipy_lsa(cost)
            np.testing.assert_allclose(cost[r1, c1].sum(), cost[r2, c2].sum(), rtol=1e-12)
            assert (np.diff(r1) > 0).all() or len(r1) <= 1  # sorted by row


def _random_label_dict(rng, nb_frames, nb_classes, max_events=3, p_frame=0.3):
    d = {}
    for f in range(nb_frames):
        if rng.uniform() > p_frame:
            continue
        events = []
        for _ in range(rng.integers(1, max_events + 1)):
            events.append([
                int(rng.integers(nb_classes)), int(rng.integers(3)),
                float(rng.integers(-180, 180)), float(rng.integers(-90, 91)),
            ])
        d[f] = events
    return d


def _perturbed_pred(rng, gt, nb_classes, noise_deg=10.0, p_drop=0.2, p_spurious=0.1):
    """Cartesian prediction dict derived from polar gt with noise."""
    pred = {}
    for f, events in gt.items():
        rows = []
        for ev in events:
            if rng.uniform() < p_drop:
                continue
            azi = np.radians(ev[2] + rng.normal(0, noise_deg))
            ele = np.radians(np.clip(ev[3] + rng.normal(0, noise_deg), -90, 90))
            rows.append([ev[0], float(np.cos(azi) * np.cos(ele)),
                         float(np.sin(azi) * np.cos(ele)), float(np.sin(ele))])
        if rng.uniform() < p_spurious:
            a, e = rng.uniform(-np.pi, np.pi), rng.uniform(-np.pi / 2, np.pi / 2)
            rows.append([int(rng.integers(nb_classes)),
                         float(np.cos(a) * np.cos(e)), float(np.sin(a) * np.cos(e)),
                         float(np.sin(e))])
        if rows:
            pred[f] = rows
    return pred


@pytest.fixture(scope="module")
def synthetic_eval(tmp_path_factory):
    """Synthetic gt (polar csv) + pred (cartesian csv) directories."""
    rng = np.random.default_rng(42)
    K = 13
    base = tmp_path_factory.mktemp("seld")
    gt_dir = base / "gt"
    pred_dir = base / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    for i in range(6):
        gt = _random_label_dict(rng, nb_frames=120, nb_classes=K)
        if not gt:
            gt = {0: [[0, 0, 10.0, 0.0]]}
        write_label_csv(str(gt_dir / f"clip{i}.csv"), gt)
        pred = _perturbed_pred(rng, gt, K)
        out = {f: [[r[0], r[1], r[2], r[3]] for r in rows] for f, rows in pred.items()}
        write_seld_output_csv(str(pred_dir / f"clip{i}.csv"), out)
    return str(gt_dir), str(pred_dir), K


def _ref_params(K):
    return {"data_config": {"nb_classes": K, "label_hop_len_s": 0.1, "sr": 24000}}


def test_segment_scorer_matches_reference(synthetic_eval):
    gt_dir, pred_dir, K = synthetic_eval
    ours = SegmentScorer(gt_dir, nb_classes=K).get_SELD_Results(pred_dir)
    ref_obj = REF.ComputeSELDResults(_ref_params(K), gt_dir)
    want = ref_obj.get_SELD_Results(pred_dir)
    for i, name in enumerate(["ER", "F", "LE", "LR", "SELD"]):
        np.testing.assert_allclose(ours[i], want[i], rtol=1e-10, err_msg=name)
    np.testing.assert_allclose(np.asarray(ours[5]), np.asarray(want[5]), rtol=1e-10)


@pytest.mark.parametrize("mode,ref_kwargs", [
    ("any", {}),
    ("classwise", {"classwise_overlap_test": True}),
])
def test_overlap_scorer_matches_reference(synthetic_eval, mode, ref_kwargs):
    gt_dir, pred_dir, K = synthetic_eval
    ours = SegmentScorer(gt_dir, nb_classes=K, overlap=mode).get_SELD_Results(pred_dir)
    ref_obj = REF.ComputeSELDResultsFromEventOverlap(_ref_params(K), gt_dir, **ref_kwargs)
    want = ref_obj.get_SELD_Results(pred_dir)
    for i, name in enumerate(["ER", "F", "LE", "LR", "SELD"]):
        np.testing.assert_allclose(ours[i], want[i], rtol=1e-10, err_msg=name)


def test_jackknife_matches_reference(synthetic_eval):
    """Confidence intervals must match the reference; the *point* values
    intentionally differ: the reference's jackknife loop overwrites
    ER/F/LE/LR inside the leave-one-out pass and returns the LAST partial
    estimate as the point value (seld_metrics.py:459 vs :475 — latent bug);
    this framework returns the true global scores."""
    gt_dir, pred_dir, K = synthetic_eval
    scorer = SegmentScorer(gt_dir, nb_classes=K)
    ours = scorer.get_SELD_Results(pred_dir, is_jackknife=True)
    globals_ = scorer.get_SELD_Results(pred_dir)
    ref_obj = REF.ComputeSELDResults(_ref_params(K), gt_dir)
    want = ref_obj.get_SELD_Results(pred_dir, is_jackknife=True)
    for i in range(5):
        np.testing.assert_allclose(ours[i][1], want[i][1], rtol=1e-8)
        np.testing.assert_allclose(ours[i][0], globals_[i], rtol=1e-12)


def test_perfect_prediction_scores():
    """Sanity: gt == pred -> ER 0, F 1, LE 0, LR 1, SELD 0."""
    import tempfile

    rng = np.random.default_rng(7)
    K = 5
    with tempfile.TemporaryDirectory() as d:
        gt_dir = os.path.join(d, "gt")
        pred_dir = os.path.join(d, "pred")
        os.makedirs(gt_dir)
        os.makedirs(pred_dir)
        gt = _random_label_dict(rng, 60, K, max_events=1)
        gt = gt or {0: [[0, 0, 10.0, 0.0]]}
        write_label_csv(os.path.join(gt_dir, "a.csv"), gt)
        pred = {}
        for f, events in gt.items():
            pred[f] = []
            for ev in events:
                a, e = np.radians(ev[2]), np.radians(ev[3])
                pred[f].append([ev[0], np.cos(a) * np.cos(e), np.sin(a) * np.cos(e), np.sin(e)])
        write_seld_output_csv(os.path.join(pred_dir, "a.csv"), pred)
        ER, F, LE, LR, SELD, _ = SegmentScorer(gt_dir, nb_classes=K).get_SELD_Results(pred_dir)
        assert ER < 1e-9 and abs(F - 1) < 1e-9 and LE < 1e-6 and abs(LR - 1) < 1e-9
        assert SELD < 1e-7


def test_empty_reference_csv(tmp_path):
    """An all-silent reference clip (no CSV rows) must not crash the scorer
    (the reference's ComputeSELDResults does: max() over an empty dict —
    metrics/seld.py deviates deliberately, treating it as 0 frames)."""
    from adyolo_tpu.data.io import write_label_csv, write_seld_output_csv

    gt_dir = tmp_path / "gt"; gt_dir.mkdir()
    pred_dir = tmp_path / "pred"; pred_dir.mkdir()
    K = 13
    write_label_csv(str(gt_dir / "clip0.csv"), {})  # silent clip
    write_label_csv(str(gt_dir / "clip1.csv"),
                    {3: [[1, 0, 10.0, 5.0]], 4: [[1, 0, 12.0, 6.0]]})
    for name in ("clip0", "clip1"):
        write_seld_output_csv(str(pred_dir / f"{name}.csv"),
                              {5: [[2, 1.0, 0.0, 0.0]]})
    res = SegmentScorer(str(gt_dir), nb_classes=K).get_SELD_Results(str(pred_dir))
    assert np.isfinite(res[0])  # ER computed, no crash

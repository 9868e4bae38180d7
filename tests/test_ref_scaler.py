"""Reference-shipped scaler artifact compatibility.

The reference distributes per-dataset feature-normalization statistics
(``data/<DS>/scaler_wts.pkl``, produced by ``src/preprocess.py:116-130``)
and class lists (``classes.txt``).  This repo ships the same artifacts in
``data/<DS>/`` so ``make_frontend`` / ``bench.py`` run normalized out of
the box.  These tests pin that :class:`Scaler.from_pickle` loads the
*actual reference pickles* (read-only, ``/root/reference/data``) and that
the loaded stats drive the feature frontend end-to-end.
"""
import os
import pickle

import numpy as np
import pytest

from adyolo_tpu.config import DataConfig
from adyolo_tpu.ops.features import FeatureFrontend, Scaler

REF_DATA = "/root/reference/data"
REPO_DATA = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")
DATASETS = ("DCASE2020_SELD", "DCASE2021_SELD", "DCASE2022_SELD")

_have_ref = os.path.isdir(REF_DATA)


@pytest.mark.parametrize("ds", DATASETS)
@pytest.mark.skipif(not _have_ref, reason="reference checkout not present")
def test_from_pickle_loads_reference_artifact(ds):
    sc = Scaler.from_pickle(os.path.join(REF_DATA, ds, "scaler_wts.pkl"))
    assert sc.mel_mean.shape == (64, 4)
    assert sc.mel_std.shape == (64, 4)
    assert sc.aux_mean.shape == (64, 3)  # FOA intensity-vector stats
    assert sc.aux_std.shape == (64, 3)
    # real statistics, not identity placeholders
    assert (sc.mel_std > 0).all() and np.abs(sc.mel_mean).max() > 1.0
    assert not np.allclose(sc.mel_std, 1.0)


@pytest.mark.parametrize("ds", DATASETS)
def test_repo_ships_the_artifacts(ds):
    """The repo's data/<DS>/ carries scaler_wts.pkl + classes.txt; when the
    reference checkout is present they must be byte-identical to it."""
    pkl = os.path.join(REPO_DATA, ds, "scaler_wts.pkl")
    cls = os.path.join(REPO_DATA, ds, "classes.txt")
    assert os.path.isfile(pkl) and os.path.isfile(cls)
    sc = Scaler.from_pickle(pkl)
    assert sc.mel_mean.shape == (64, 4)
    with open(cls) as f:
        names = [ln for ln in f.read().splitlines() if ln.strip()]
    assert len(names) in (12, 13, 14)  # 2021=12, 2022=13, 2020=14 classes
    if _have_ref:
        for fname in ("scaler_wts.pkl", "classes.txt"):
            with open(os.path.join(REPO_DATA, ds, fname), "rb") as a, \
                 open(os.path.join(REF_DATA, ds, fname), "rb") as b:
                assert a.read() == b.read(), f"{ds}/{fname} drifted"


def test_reference_scaler_drives_frontend():
    """Loaded stats flow through the fused frontend: output equals the
    manual (raw - mean) / std of the unnormalized kernels."""
    cfg = DataConfig()  # DCASE2022 FOA defaults
    sc = Scaler.from_pickle(
        os.path.join(REPO_DATA, "DCASE2022_SELD", "scaler_wts.pkl"))
    fe = FeatureFrontend(cfg, sc)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, cfg.sr * 2, 4)) * 0.1).astype(np.float32)
    feat = np.asarray(fe(audio))
    assert np.isfinite(feat).all()
    mel_db, aux = fe.raw_mel_aux(audio)
    want_mel = (np.asarray(mel_db) - sc.mel_mean) / sc.mel_std
    want_aux = (np.asarray(aux) - sc.aux_mean) / sc.aux_std
    np.testing.assert_allclose(feat[..., :4], want_mel, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(feat[..., 4:], want_aux, rtol=1e-5, atol=1e-5)
    # normalized output differs from the identity-scaled raw features
    assert np.abs(feat[..., :4] - np.asarray(mel_db)).max() > 1.0


def test_make_frontend_picks_up_shipped_stats(capsys):
    """make_frontend finds the shipped pkl at data_pth (evaluate.py:43-58)
    — no identity-normalization warning for the benched dataset."""
    import sys

    from adyolo_tpu.config import Config
    from adyolo_tpu.engine.evaluate import make_frontend

    cfg = Config()
    assert "DCASE2022_SELD" in cfg.data.data_pth
    here = os.getcwd()
    os.chdir(os.path.dirname(REPO_DATA))
    try:
        fe = make_frontend(cfg)
    finally:
        os.chdir(here)
    err = capsys.readouterr().err
    assert "identity normalization" not in err
    assert np.abs(np.asarray(fe._mel_mean)).max() > 1.0

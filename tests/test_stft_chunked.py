"""Pre-chunked (B, T, hop, C) STFT input layout: parity vs the flat path.

The hop-block layout is a free numpy view of the flat signal; the device
path handles the librosa reflect boundary analytically at frame 0
(ops/stft.py::framed_dft_chunked).  Measured bit-exact on TPU v5e
(scripts/stft_formulation_bench.py); these tests pin the same parity on
CPU through every public entry point.
"""
import numpy as np
import pytest

from adyolo_tpu.config import DataConfig
from adyolo_tpu.ops.features import FeatureFrontend
from adyolo_tpu.ops.stft import framed_dft_chunked, stft


def _audio(B=2, N=48000, C=4, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((B, N, C)) * 0.1).astype(np.float32)


def test_stft_chunked_matches_flat():
    n_fft, hop = 1200, 600
    x = _audio()
    re_f, im_f = stft(x, n_fft, hop, n_fft)
    B, N, C = x.shape
    re_c, im_c = stft(x.reshape(B, N // hop, hop, C), n_fft, hop, n_fft)
    np.testing.assert_allclose(np.asarray(re_c), np.asarray(re_f),
                               rtol=0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(im_c), np.asarray(im_f),
                               rtol=0, atol=2e-6)


@pytest.mark.parametrize("fmt", ["foa", "mic"])
def test_frontend_accepts_chunked_audio(fmt):
    cfg = DataConfig(audio_format=fmt)
    fe = FeatureFrontend(cfg)
    x = _audio(N=10 * cfg.hop_length)
    B, N, C = x.shape
    flat = np.asarray(fe(x))
    chunked = np.asarray(fe(x.reshape(B, N // cfg.hop_length,
                                      cfg.hop_length, C)))
    np.testing.assert_allclose(chunked, flat, rtol=0, atol=1e-4)


def test_frontend_chunked_with_valid_frames_mask():
    cfg = DataConfig()
    fe = FeatureFrontend(cfg)
    x = _audio(N=10 * cfg.hop_length)
    B, N, C = x.shape
    vf = np.asarray([7, 10], np.int32)
    flat = np.asarray(fe(x, vf))
    chunked = np.asarray(fe(x.reshape(B, -1, cfg.hop_length, C), vf))
    np.testing.assert_allclose(chunked, flat, rtol=0, atol=1e-4)


def test_chunked_requires_dcase_geometry():
    x = _audio(N=4800)
    with pytest.raises(ValueError, match="n_fft == 2\\*hop"):
        framed_dft_chunked(x.reshape(2, 16, 300, 4),
                           np.zeros((1200, 601), np.float32),
                           np.zeros((1200, 601), np.float32))

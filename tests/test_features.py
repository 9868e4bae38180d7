"""Front-end kernel parity tests vs. numpy oracles (SURVEY.md §4)."""
import numpy as np
import pytest

from adyolo_tpu.config import DataConfig
from adyolo_tpu.ops import dsp
from adyolo_tpu.ops.features import FeatureFrontend, Scaler, identity_scaler
from adyolo_tpu.ops.stft import stft

from tests import oracle_dsp as oracle


SR, NFFT, HOP, WIN, MEL = 24000, 1200, 600, 1200, 64


def rand_audio(n_samples, C=4, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n_samples, C)) * 0.1).astype(np.float32)


def test_hann_window_periodic():
    w = dsp.hann_window(8)
    # periodic hann: w[0]=0, symmetric around n/2, w[4]=1
    assert w[0] == 0.0
    assert abs(w[4] - 1.0) < 1e-7
    np.testing.assert_allclose(w[1:4], w[:4:-1], rtol=1e-6)


def test_mel_filterbank_properties():
    mel = dsp.mel_filterbank(SR, NFFT, MEL)
    assert mel.shape == (MEL, 1 + NFFT // 2)
    assert (mel >= 0).all()
    # every filter has support; slaney normalization keeps area ~ 2/bandwidth
    assert (mel.sum(axis=1) > 0).all()
    # filters tile the spectrum: every bin between first/last peak covered
    cover = mel.sum(axis=0)
    nz = np.nonzero(cover > 0)[0]
    assert nz[0] <= 2 and nz[-1] >= NFFT // 2 - 1


def test_stft_matches_oracle():
    n = SR * 2  # 2 s
    audio = rand_audio(n)
    win = dsp.hann_window(NFFT)
    want = oracle.oracle_multich_stft(audio.astype(np.float64), NFFT, HOP, win.astype(np.float64))
    re, im = stft(audio[None], NFFT, HOP, WIN)
    re, im = np.asarray(re[0]), np.asarray(im[0])
    assert re.shape == want.shape
    scale = np.abs(want).max()
    np.testing.assert_allclose(re, want.real, atol=2e-4 * scale)
    np.testing.assert_allclose(im, want.imag, atol=2e-4 * scale)


def test_stft_frame_count_matches_reference_convention():
    # reference: nb_feature_frames = int(len(audio)/hop)  (datasets.py:283)
    n = SR * 20
    audio = rand_audio(n, seed=1)
    re, _ = stft(audio[None], NFFT, HOP, WIN)
    assert re.shape[1] == n // HOP == 800


def test_logmel_iv_match_oracle():
    n = SR * 2
    audio = rand_audio(n, seed=2)
    cfg = DataConfig()
    fe = FeatureFrontend(cfg)
    feat = np.asarray(fe(audio[None]))[0]  # (T, 64, 7), identity scaler

    win = dsp.hann_window(NFFT).astype(np.float64)
    melT = dsp.mel_filterbank(SR, NFFT, MEL).T.astype(np.float64)
    spec = oracle.oracle_multich_stft(audio.astype(np.float64), NFFT, HOP, win)
    want_mel = oracle.oracle_logmel(spec, melT)
    want_iv = oracle.oracle_foa_iv(spec, melT)

    np.testing.assert_allclose(feat[..., :4], want_mel, atol=2e-3)
    np.testing.assert_allclose(feat[..., 4:], want_iv, atol=2e-4)


def test_scaler_normalization():
    n = SR * 1
    audio = rand_audio(n, seed=3)
    cfg = DataConfig()
    fe = FeatureFrontend(cfg)
    raw = np.asarray(fe(audio[None]))[0]

    rng = np.random.default_rng(0)
    mm = rng.standard_normal((1, MEL, 4)).astype(np.float32)
    ms = np.abs(rng.standard_normal((1, MEL, 4))).astype(np.float32) + 0.5
    im_ = rng.standard_normal((1, MEL, 3)).astype(np.float32)
    is_ = np.abs(rng.standard_normal((1, MEL, 3))).astype(np.float32) + 0.5
    fe.set_scaler(Scaler(mm, ms, im_, is_))
    got = np.asarray(fe(audio[None]))[0]

    np.testing.assert_allclose(got[..., :4], (raw[..., :4] - mm[0]) / ms[0], rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(got[..., 4:], (raw[..., 4:] - im_[0]) / is_[0], rtol=2e-3, atol=2e-3)


def test_variable_length_masking_matches_exact_length():
    """A short clip zero-padded into a longer bucket must produce the same
    features (over valid frames) as running it at its exact length."""
    n_short = SR * 2
    audio = rand_audio(n_short, seed=4)
    cfg = DataConfig()
    fe = FeatureFrontend(cfg)

    exact = np.asarray(fe(audio[None]))[0]  # (T_short, 64, 7)

    n_long = SR * 3
    padded = np.zeros((n_long, 4), np.float32)
    padded[:n_short] = audio
    t_valid = n_short // HOP
    bucketed = np.asarray(fe(padded[None], valid_frames=np.array([t_valid])))[0]

    np.testing.assert_allclose(bucketed[:t_valid], exact, atol=1e-4)
    # padded frames are zeroed
    assert np.abs(bucketed[t_valid:]).max() == 0.0


def test_gcc_phat_mic_path():
    n = SR * 1
    audio = rand_audio(n, C=4, seed=5)
    cfg = DataConfig(audio_format="mic")
    fe = FeatureFrontend(cfg)
    feat = np.asarray(fe(audio[None]))[0]
    assert feat.shape[-1] == 4 + 6  # 4 logmel + 6 gcc pairs

    win = dsp.hann_window(NFFT).astype(np.float64)
    spec = oracle.oracle_multich_stft(audio.astype(np.float64), NFFT, HOP, win)
    want = oracle.oracle_gcc_phat(spec, NFFT, MEL)
    np.testing.assert_allclose(feat[..., 4:], want, atol=2e-3)


def test_framed_dft_split_slab_matches_gather_fallback():
    """The hop | n_fft split-slab matmul (no frame materialization) must
    equal the general framed-gather path bit-for-bit up to f32 accumulation
    order; exercised both ways by choosing hops that do / don't divide
    n_fft."""
    import jax.numpy as jnp

    from adyolo_tpu.ops.stft import frame_signal, framed_dft

    n_fft, C = 256, 2
    w = dsp.hann_window(n_fft)
    w_re, w_im = dsp.dft_matrices(n_fft, w)
    w_re, w_im = jnp.asarray(w_re), jnp.asarray(w_im)
    x = jnp.asarray(rand_audio(4096, C=C, seed=3))[None]

    for hop in (128, 96):  # 128 | 256 -> split-slab; 96 does not -> gather
        n_frames = (4096 - n_fft) // hop
        re, im = framed_dft(x, n_fft, hop, n_frames, w_re, w_im)
        frames = frame_signal(x, n_fft, hop, n_frames)
        want_re = jnp.einsum("btnc,nk->btkc", frames, w_re)
        want_im = jnp.einsum("btnc,nk->btkc", frames, w_im)
        scale = float(jnp.abs(want_re).max())
        np.testing.assert_allclose(np.asarray(re), np.asarray(want_re),
                                   atol=2e-4 * scale)
        np.testing.assert_allclose(np.asarray(im), np.asarray(want_im),
                                   atol=2e-4 * scale)


def test_irfft_lag_matrices_match_numpy_irfft():
    """The matmul partial inverse rDFT equals np.fft.irfft's centered-lag
    slice — including irfft's ignore-imag convention at DC/Nyquist (the
    random specs below have nonzero imag there).  This path exists because
    the axon TPU backend cannot lower FFT ops (UNIMPLEMENTED) and because
    keeping 64-128 of 1200 lags as a (K, n_lags) matmul is ~10x cheaper."""
    rng = np.random.default_rng(11)
    for n_fft, n_lags in [(1200, 64), (1200, 128), (512, 60), (510, 33)]:
        K = 1 + n_fft // 2
        spec = rng.standard_normal((5, K)) + 1j * rng.standard_normal((5, K))
        full = np.fft.irfft(spec, n=n_fft, axis=-1)
        half = n_lags // 2
        want = np.concatenate([full[:, -half:], full[:, : n_lags - half]], -1)
        lag_c, lag_s = dsp.irfft_lag_matrices(n_fft, n_lags)
        got = (spec.real.astype(np.float32) @ lag_c
               - spec.imag.astype(np.float32) @ lag_s)
        np.testing.assert_allclose(got, want, atol=2e-6)

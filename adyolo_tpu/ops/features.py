"""Fused acoustic feature front-end: STFT -> log-mel + FOA-IV (+ GCC-PHAT).

TPU-native re-design of the reference front-end
(``src/datasets.py:187-292`` ``FeatureLabelProcessor`` and
``src/utils/utility.py:142-215``): the whole per-clip numpy/librosa chain
becomes one batched jit program — STFT matmul, power, mel projection
matmul, dB conversion, intensity-vector normalization and scaler
standardization all fuse under XLA.

Numerics mirrored from the reference:

* log-mel: ``power_to_db`` with librosa defaults ``ref=1.0, amin=1e-10,
  top_db=80`` applied per (clip, channel) — the top-db floor references the
  max over that channel's spectrogram (``src/datasets.py:260-267``);
* FOA intensity vectors: ``I = Re(conj(W) · [X,Y,Z])`` normalized by
  ``eps + |W|² + mean(|XYZ|²)`` then mel-projected
  (``src/datasets.py:269-279``);
* scaler standardization ``(f - mean)/std`` from precomputed train stats
  (``src/datasets.py:281-292``).

Additions over the reference:

* variable-length masking (``valid_frames``) so bucketed/padded eval clips
  reproduce exact-length numerics (the per-channel dB max is computed over
  valid frames only),
* GCC-PHAT mel-lag features for MIC-array input (absent from the FOA-only
  reference; required by BASELINE.json config #3; definition follows the
  DCASE SELD baseline feature extractor).
"""
from __future__ import annotations

import functools
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

# Front-end matmul precision: HIGH (bf16x3 passes) gives 1.1e-5 relative
# error vs the float64 oracle at 1.4x the speed of HIGHEST (1.7e-7) on
# TPU v5e -- measured in PLAN.md; comfortably inside the <=1e-3 feature
# parity budget.  (DEFAULT/bf16 is 2.7e-3 -- too coarse.)
_STFT_PRECISION = jax.lax.Precision.HIGH

from ..config import DataConfig
from .dsp import (analysis_window, dft_matrices, irfft_lag_matrices,
                  mel_filterbank)

__all__ = ["power_to_db", "FeatureFrontend", "Scaler", "identity_scaler"]

_EPS = 1e-8  # reference: src/datasets.py:204 self.eps
_AMIN = 1e-10  # librosa power_to_db default
_TOP_DB = 80.0


def power_to_db(power: jax.Array, frame_mask: Optional[jax.Array] = None) -> jax.Array:
    """``10*log10(max(p, amin))`` with an 80 dB floor below the per-(clip,
    channel) maximum, matching ``librosa.power_to_db`` defaults as invoked at
    ``src/datasets.py:265`` (ref=1.0).

    power: (B, T, F, C).  frame_mask: optional (B, T) bool — padded frames
    are excluded from the max so bucketed eval clips match exact-length
    numerics.
    """
    db = 10.0 * jnp.log10(jnp.maximum(power, _AMIN))
    if frame_mask is not None:
        neg = jnp.asarray(-jnp.inf, db.dtype)
        masked = jnp.where(frame_mask[:, :, None, None], db, neg)
    else:
        masked = db
    peak = jnp.max(masked, axis=(1, 2), keepdims=True)  # (B,1,1,C)
    return jnp.maximum(db, peak - _TOP_DB)


class Scaler:
    """Per-(mel-bin, channel) standardization stats.

    Layout-compatible with the reference's ``scaler_wts.pkl``
    (``src/preprocess.py:116-130``): dict ``{'MEL': {'mean','std',...},
    'IV': {...}}`` with arrays shaped ``(1, mel_bins, C)``.  For MIC
    datasets (absent from the FOA-only reference) the auxiliary block is
    keyed ``'GCC'`` with C = n_pairs lag channels — GCC-PHAT features are
    standardized exactly like mel/IV (the DCASE baseline also normalizes
    its full feature stack).
    """

    def __init__(self, mel_mean, mel_std, aux_mean, aux_std):
        def prep(a):
            a = np.asarray(a, np.float32)
            return a.reshape(a.shape[-2], a.shape[-1])  # (mel_bins, C)

        self.mel_mean = prep(mel_mean)
        self.mel_std = prep(mel_std)
        self.aux_mean = prep(aux_mean)
        self.aux_std = prep(aux_std)

    @classmethod
    def from_dict(cls, d: Dict) -> "Scaler":
        aux = d["IV"] if "IV" in d else d["GCC"]
        return cls(d["MEL"]["mean"], d["MEL"]["std"], aux["mean"], aux["std"])

    @classmethod
    def from_pickle(cls, path: str) -> "Scaler":
        import pickle

        with open(path, "rb") as f:
            return cls.from_dict(pickle.load(f))


def identity_scaler(mel_bins: int, n_mel_ch: int = 4, n_aux_ch: int = 3) -> Scaler:
    z = np.zeros((1, mel_bins, n_mel_ch), np.float32)
    o = np.ones((1, mel_bins, n_mel_ch), np.float32)
    zi = np.zeros((1, mel_bins, n_aux_ch), np.float32)
    oi = np.ones((1, mel_bins, n_aux_ch), np.float32)
    return Scaler(z, o, zi, oi)


# ---------------------------------------------------------------------------
# jit kernels (constants passed as arrays so the trace is reusable)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(1, 2))
def _stft_re_im(x, n_fft, hop, w_re, w_im):
    from .stft import framed_dft, framed_dft_chunked

    if x.ndim == 4:
        # pre-chunked (B, T, hop, C) hop-block layout — a free numpy view
        # of the flat signal for any host producer; skips the ~1.26 ms/step
        # device chunk-reshape the flat path pays (see framed_dft_chunked)
        return framed_dft_chunked(x, w_re, w_im)
    B, N, C = x.shape
    n_frames = N // hop
    lpad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (lpad, 0), (0, 0)), mode="reflect")
    rpad = (n_frames - 1) * hop + n_fft - (N + lpad)
    if rpad > 0:
        x = jnp.pad(x, ((0, 0), (0, rpad), (0, 0)))
    return framed_dft(x, n_fft, hop, n_frames, w_re, w_im)


def _logmel(re, im, mel_t, frame_mask):
    power = re * re + im * im  # (B,T,K,C)
    mel_power = jnp.einsum("btkc,km->btmc", power, mel_t,
                           preferred_element_type=jnp.float32,
                    precision=_STFT_PRECISION)
    return power_to_db(mel_power, frame_mask)


def _foa_iv(re, im, mel_t):
    # W = channel 0, XYZ = channels 1:4  (src/datasets.py:270-275)
    w_re, w_im = re[..., 0:1], im[..., 0:1]
    x_re, x_im = re[..., 1:4], im[..., 1:4]
    iv = w_re * x_re + w_im * x_im  # Re(conj(W)·X)
    energy = _EPS + (w_re[..., 0] ** 2 + w_im[..., 0] ** 2
                     + (x_re ** 2 + x_im ** 2).sum(-1) / 3.0)
    iv = iv / energy[..., None]
    return jnp.einsum("btkc,km->btmc", iv, mel_t, preferred_element_type=jnp.float32,
                    precision=_STFT_PRECISION)


def _gcc_phat_mel(re, im, lag_c, lag_s):
    """GCC-PHAT lag features for all unordered mic pairs.

    For each pair (i, j): ``R = X_i conj(X_j)``; phase transform
    ``R/|R|``; partial inverse rDFT directly onto the ``n_lags`` centered
    lags (``concat(cc[-n_lags//2:], cc[:n_lags//2])``, the DCASE SELD
    baseline convention) via the precomputed ``(K, n_lags)`` matrices from
    :func:`adyolo_tpu.ops.dsp.irfft_lag_matrices` — one MXU matmul pair
    over all pairs at once instead of six full inverse FFTs (which the
    axon TPU backend cannot lower anyway).  Output (B, T, n_lags, n_pairs).
    """
    B, T, K, C = re.shape
    pairs = [(i, j) for i in range(C) for j in range(i + 1, C)]
    ii = jnp.asarray([p[0] for p in pairs])
    jj = jnp.asarray([p[1] for p in pairs])
    re_i, re_j = re[..., ii], re[..., jj]  # (B,T,K,P)
    im_i, im_j = im[..., ii], im[..., jj]
    r_re = re_i * re_j + im_i * im_j
    r_im = im_i * re_j - re_i * im_j
    inv_mag = 1.0 / (jnp.sqrt(r_re * r_re + r_im * r_im) + _EPS)
    return (jnp.einsum("btkp,kn->btnp", r_re * inv_mag, lag_c,
                       preferred_element_type=jnp.float32,
                       precision=_STFT_PRECISION)
            - jnp.einsum("btkp,kn->btnp", r_im * inv_mag, lag_s,
                         preferred_element_type=jnp.float32,
                         precision=_STFT_PRECISION))


class FeatureFrontend:
    """Batched fused feature extractor.

    ``__call__(audio, valid_frames=None) -> (B, T, mel_bins, C_feat)`` where
    ``audio`` is float in [-1, 1], shape (B, N, C_in) — or, preferred on
    TPU when ``n_fft == 2*hop``, the pre-chunked hop-block view
    ``(B, N//hop, hop, C_in)`` (``audio.reshape(B, -1, hop, C)``: same
    bytes, free for the host, and it skips a ~1.26 ms/step device
    relayout — see :func:`adyolo_tpu.ops.stft.framed_dft_chunked`).
    ``C_feat`` is 7 for FOA (4 log-mel + 3 IV, matching
    ``src/datasets.py:292``) or 4 + C*(C-1)/2 for MIC (log-mel +
    GCC-PHAT pairs).

    ``valid_frames``: optional (B,) int32 count of valid STFT frames for
    bucketed variable-length eval batches.
    """

    def __init__(self, data_cfg: DataConfig, scaler: Optional[Scaler] = None):
        self.cfg = data_cfg
        w = analysis_window(data_cfg.window, data_cfg.win_length, data_cfg.n_fft)
        w_re, w_im = dft_matrices(data_cfg.n_fft, w)
        self._w_re = jnp.asarray(w_re)
        self._w_im = jnp.asarray(w_im)
        mel = mel_filterbank(data_cfg.sr, data_cfg.n_fft, data_cfg.mel_bins)
        self._mel_t = jnp.asarray(mel.T)  # (K, mel_bins)
        self.n_aux_channels = data_cfg.nb_feature_channels - 4  # IV 3 / GCC 6
        if data_cfg.audio_format != "foa":
            lag_c, lag_s = irfft_lag_matrices(data_cfg.n_fft, data_cfg.mel_bins)
            self._lag_c = jnp.asarray(lag_c)  # (K, n_lags)
            self._lag_s = jnp.asarray(lag_s)
        if scaler is None:
            scaler = identity_scaler(data_cfg.mel_bins,
                                     n_aux_ch=self.n_aux_channels)
        self.set_scaler(scaler)
        # scaler stats are passed as runtime args (not closed over) so that
        # set_scaler() takes effect without retracing issues.
        self._jit = jax.jit(self._forward)

    def set_scaler(self, scaler: Scaler) -> None:
        assert scaler.aux_mean.shape[-1] == self.n_aux_channels, (
            f"scaler aux stats have {scaler.aux_mean.shape[-1]} channels but "
            f"audio_format={self.cfg.audio_format!r} needs "
            f"{self.n_aux_channels} (IV=3 / GCC=6) — wrong scaler_wts.pkl?")
        self._mel_mean = jnp.asarray(scaler.mel_mean)  # (mel, 4)
        self._mel_std = jnp.asarray(scaler.mel_std)
        self._aux_mean = jnp.asarray(scaler.aux_mean)  # (mel, 3|6)
        self._aux_std = jnp.asarray(scaler.aux_std)

    # -- unnormalized parts (used by the scaler-stats pipeline) -------------

    def stft(self, audio):
        return _stft_re_im(audio, self.cfg.n_fft, self.cfg.hop_length,
                           self._w_re, self._w_im)

    def _forward(self, audio, valid_frames, mel_mean, mel_std, aux_mean, aux_std):
        re, im = _stft_re_im(audio, self.cfg.n_fft, self.cfg.hop_length,
                             self._w_re, self._w_im)
        B, T = re.shape[0], re.shape[1]
        if valid_frames is None:
            frame_mask = None
        else:
            t_idx = jnp.arange(T)[None, :]
            frame_mask = t_idx < valid_frames[:, None]
        mel_db = _logmel(re, im, self._mel_t, frame_mask)  # (B,T,mel,Cin)
        mel_db = (mel_db - mel_mean) / mel_std

        if self.cfg.audio_format == "foa":
            aux = _foa_iv(re, im, self._mel_t)  # (B,T,mel,3)
        else:  # mic
            aux = _gcc_phat_mel(re, im, self._lag_c, self._lag_s)
        aux = (aux - aux_mean) / aux_std
        feat = jnp.concatenate([mel_db, aux], axis=-1)

        if frame_mask is not None:
            feat = feat * frame_mask[:, :, None, None]
        return feat

    def __call__(self, audio, valid_frames=None):
        return self._jit(audio, valid_frames, self._mel_mean, self._mel_std,
                         self._aux_mean, self._aux_std)

    def raw_mel_aux(self, audio):
        """Unnormalized (mel_db, aux) where aux is the FOA intensity vector
        or the MIC GCC-PHAT block — the quantities the scaler-stats pass
        accumulates (``src/preprocess.py:87-130``)."""
        re, im = self.stft(audio)
        mel_db = _logmel(re, im, self._mel_t, None)
        if self.cfg.audio_format == "foa":
            aux = _foa_iv(re, im, self._mel_t)
        else:
            aux = _gcc_phat_mel(re, im, self._lag_c, self._lag_s)
        return mel_db, aux

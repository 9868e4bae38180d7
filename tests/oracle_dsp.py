"""Slow, obviously-correct numpy oracles for the DSP front-end.

Written independently from first principles (librosa-0.8.1 documented
semantics) as the ground truth the device kernels are tested against.
Everything here is float64 and loop-based on purpose.
"""
import numpy as np


def oracle_stft_1ch(y: np.ndarray, n_fft: int, hop: int, win: np.ndarray) -> np.ndarray:
    """center=True, reflect-padded STFT of a 1-D signal.

    Returns complex (n_frames_full, 1 + n_fft//2); caller truncates frames.
    """
    pad = n_fft // 2
    y = np.pad(y.astype(np.float64), pad, mode="reflect")
    n_frames = 1 + (len(y) - n_fft) // hop
    out = np.empty((n_frames, 1 + n_fft // 2), dtype=np.complex128)
    for t in range(n_frames):
        seg = y[t * hop : t * hop + n_fft] * win
        out[t] = np.fft.rfft(seg)
    return out


def oracle_multich_stft(audio: np.ndarray, n_fft: int, hop: int, win: np.ndarray):
    """audio (N, C) -> complex (T=N//hop, K, C), reference keeps N//hop frames."""
    T = audio.shape[0] // hop
    chans = []
    for c in range(audio.shape[1]):
        s = oracle_stft_1ch(audio[:, c], n_fft, hop, win)[:T]
        chans.append(s)
    return np.stack(chans, axis=-1)


def oracle_power_to_db(p: np.ndarray, amin=1e-10, top_db=80.0) -> np.ndarray:
    """librosa.power_to_db with ref=1.0 over a single (T, F) spectrogram."""
    db = 10.0 * np.log10(np.maximum(p, amin))
    return np.maximum(db, db.max() - top_db)


def oracle_logmel(spec: np.ndarray, mel_wts_T: np.ndarray) -> np.ndarray:
    """spec complex (T, K, C); per-channel power->mel->db. Returns (T, M, C)."""
    T, K, C = spec.shape
    M = mel_wts_T.shape[1]
    out = np.zeros((T, M, C))
    for c in range(C):
        p = np.abs(spec[:, :, c]) ** 2
        out[:, :, c] = oracle_power_to_db(p @ mel_wts_T)
    return out


def oracle_foa_iv(spec: np.ndarray, mel_wts_T: np.ndarray, eps=1e-8) -> np.ndarray:
    """FOA intensity vectors, (T, K, 4) complex -> (T, M, 3)."""
    W = spec[:, :, 0]
    I = np.real(np.conj(W)[:, :, None] * spec[:, :, 1:])
    E = eps + (np.abs(W) ** 2 + (np.abs(spec[:, :, 1:]) ** 2).sum(-1) / 3.0)
    I_norm = I / E[:, :, None]
    return np.transpose(np.transpose(I_norm, (0, 2, 1)) @ mel_wts_T, (0, 2, 1))


def oracle_gcc_phat(spec: np.ndarray, n_fft: int, n_lags: int, eps=1e-8) -> np.ndarray:
    """GCC-PHAT per mic pair, centered lags. spec (T,K,C) -> (T, n_lags, P)."""
    T, K, C = spec.shape
    pairs = [(i, j) for i in range(C) for j in range(i + 1, C)]
    out = []
    for (i, j) in pairs:
        R = spec[:, :, i] * np.conj(spec[:, :, j])
        R = R / (np.abs(R) + eps)
        cc = np.fft.irfft(R, n=n_fft, axis=-1)
        half = n_lags // 2
        cc = np.concatenate([cc[:, -half:], cc[:, : n_lags - half]], axis=-1)
        out.append(cc)
    return np.stack(out, axis=-1)

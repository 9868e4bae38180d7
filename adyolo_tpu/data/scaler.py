"""Feature scaler statistics over the training split.

Re-implementation of ``src/preprocess.py:87-130``: every train wav is run
through the STFT -> log-mel / intensity-vector front-end and per-
(mel-bin, channel) mean/std/max/min are pickled to
``<data_pth>/scaler_wts.pkl`` (the exact dict layout the reference ships
and :class:`adyolo_tpu.ops.features.Scaler` loads).

TPU-native differences: the feature kernels run batched **on device**
(the reference loops librosa per clip on host), and the statistics are
streamed (sum / sum-of-squares / extrema accumulated in float64 on host)
instead of concatenating every frame of the dataset in RAM.  Streamed
moments equal the reference's ``np.mean``/``np.std`` (ddof=0) to float64
rounding.
"""
from __future__ import annotations

import os
import pickle
from typing import Dict, Optional

import numpy as np

from ..config import DataConfig
from ..ops.features import FeatureFrontend
from . import io

__all__ = ["compute_scaler_stats", "preprocess_scaler"]


class _Moments:
    def __init__(self, shape):
        self.n = 0
        self.s = np.zeros(shape, np.float64)
        self.sq = np.zeros(shape, np.float64)
        self.mx = np.full(shape, -np.inf)
        self.mn = np.full(shape, np.inf)

    def update(self, x: np.ndarray):  # x: (T, mel, C)
        self.n += x.shape[0]
        self.s += x.sum(axis=0, dtype=np.float64)
        self.sq += (x.astype(np.float64) ** 2).sum(axis=0)
        self.mx = np.maximum(self.mx, x.max(axis=0))
        self.mn = np.minimum(self.mn, x.min(axis=0))

    def finalize(self) -> Dict[str, np.ndarray]:
        mean = self.s / self.n
        var = np.maximum(self.sq / self.n - mean ** 2, 0.0)
        return {
            "mean": mean[None].astype(np.float64),
            "std": np.sqrt(var)[None].astype(np.float64),
            "max": self.mx[None],
            "min": self.mn[None],
        }


def compute_scaler_stats(cfg: DataConfig, wav_dir: Optional[str] = None,
                         verbose: bool = True) -> Dict:
    """Returns the scaler dict {'MEL': {...}, 'IV': {...}} (FOA,
    preprocess.py:116-127 layout) or {'MEL': {...}, 'GCC': {...}} (MIC —
    absent from the FOA-only reference; GCC-PHAT lag channels are
    standardized like every other feature, matching the DCASE baseline's
    whole-stack normalization) with (1, mel_bins, C)-shaped stats."""
    wav_dir = wav_dir or os.path.join(
        cfg.data_pth, f"{cfg.audio_format}_dev", "dev-train")
    fe = FeatureFrontend(cfg)
    aux_key = "IV" if cfg.audio_format == "foa" else "GCC"
    mel_m = _Moments((cfg.mel_bins, 4))
    aux_m = _Moments((cfg.mel_bins, fe.n_aux_channels))
    for name in io.list_clips(wav_dir):
        audio = io.normalize_audio(io.read_wav(os.path.join(wav_dir, name + ".wav")))
        mel_db, aux = fe.raw_mel_aux(audio[None])
        mel_m.update(np.asarray(mel_db[0]))
        aux_m.update(np.asarray(aux[0]))
        if verbose:
            print(f"scaler: accumulated {name}")
    return {"MEL": mel_m.finalize(), aux_key: aux_m.finalize()}


def preprocess_scaler(cfg: DataConfig, verbose: bool = True) -> str:
    scaler = compute_scaler_stats(cfg, verbose=verbose)
    out = os.path.join(cfg.data_pth, "scaler_wts.pkl")
    with open(out, "wb") as f:
        pickle.dump(scaler, f)
    return out

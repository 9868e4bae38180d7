"""Learnable synthetic SELD data.

Unlike :mod:`tests.synth_data` (noise + random labels, for plumbing tests),
this generator produces wavs whose content *matches* the labels: each event
is a class-specific tone burst FOA-encoded at its labeled direction
(W = s/sqrt(2), X = s·cosφcosθ, Y = s·sinφcosθ, Z = s·sinθ) over noise.
The log-mel features then carry the class (frequency), the intensity
vectors carry the DOA — so a working pipeline must drive SELD scores well
below chance, giving an end-to-end learning signal without DCASE data.
"""
import os

import numpy as np

from adyolo_tpu.data.io import write_label_csv, write_wav

SR = 24000
LABEL_HOP = SR // 10


def class_freq(c: int) -> float:
    """Distinct, mel-resolvable tone per class."""
    return 320.0 * (2 ** (c / 3.0))  # 320 Hz .. ~5 kHz for 13 classes


def render_clip(rng, secs, nb_classes, n_events, noise=0.02):
    """Returns (int16 audio (N, 4), label_dict)."""
    n = SR * secs
    audio = rng.standard_normal((n, 4)) * noise
    label = {}
    nb_frames = n // LABEL_HOP
    for _ in range(n_events):
        c = int(rng.integers(nb_classes))
        azi = float(rng.integers(-180, 180))
        ele = float(rng.integers(-60, 61))
        dur = int(rng.integers(5, 15))  # 0.5 - 1.5 s
        start = int(rng.integers(0, max(1, nb_frames - dur)))
        t0, t1 = start * LABEL_HOP, min((start + dur) * LABEL_HOP, n)
        t = np.arange(t1 - t0) / SR
        tone = 0.35 * np.sin(2 * np.pi * class_freq(c) * t
                             + rng.uniform(0, 2 * np.pi))
        # 10 ms raised-cosine edges to avoid clicks
        edge = min(240, len(tone) // 4)
        env = np.ones_like(tone)
        ramp = 0.5 * (1 - np.cos(np.pi * np.arange(edge) / edge))
        env[:edge] = ramp
        env[-edge:] = ramp[::-1]
        tone = tone * env
        a, e = np.radians(azi), np.radians(ele)
        gains = np.array([1.0 / np.sqrt(2.0),
                          np.cos(a) * np.cos(e),
                          np.sin(a) * np.cos(e),
                          np.sin(e)])
        audio[t0:t1] += tone[:, None] * gains[None, :]
        for f in range(start, min(start + dur, nb_frames)):
            label.setdefault(f, []).append([c, 0, azi, ele])
    audio = np.clip(audio, -0.99, 0.99)
    return (audio * 32767).astype(np.int16), label


def make_learnable_dataset(root, nb_classes=13, n_train=64, n_val=6, n_test=6,
                           seed=0):
    rng = np.random.default_rng(seed)
    sub = "dev-train-chunked_20s_1s"
    for d in (f"foa_dev/{sub}", "foa_dev/dev-val", "foa_dev/dev-test",
              "foa_dev/dev-train",
              f"metadata_dev/{sub}", "metadata_dev/dev-val",
              "metadata_dev/dev-test", "metadata_dev/dev-train"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    def write_clip(wav_dir, csv_dir, name, secs, n_events):
        audio, label = render_clip(rng, secs, nb_classes, n_events)
        write_wav(os.path.join(root, wav_dir, name + ".wav"), audio, SR)
        write_label_csv(os.path.join(root, csv_dir, name + ".csv"), label)

    for i in range(n_train):
        write_clip(f"foa_dev/{sub}", f"metadata_dev/{sub}",
                   f"train{i:03d}_chunk001", 20, 12)
        if i < 4:  # a few raw clips so `preprocess scaler` works
            write_clip("foa_dev/dev-train", "metadata_dev/dev-train",
                       f"raw{i:03d}", 20, 12)
    for i in range(n_val):
        write_clip("foa_dev/dev-val", "metadata_dev/dev-val", f"val{i:03d}", 20, 10)
    for i in range(n_test):
        write_clip("foa_dev/dev-test", "metadata_dev/dev-test", f"test{i:03d}", 20, 10)

    with open(os.path.join(root, "classes.txt"), "w") as f:
        for c in range(nb_classes):
            f.write(f"tone{c}\n")
    return root


if __name__ == "__main__":
    import sys

    make_learnable_dataset(sys.argv[1] if len(sys.argv) > 1 else "data/DCASE2022_SELD")
    print("learnable synthetic dataset written")

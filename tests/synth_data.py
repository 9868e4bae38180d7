"""Synthetic DCASE-layout dataset builder for end-to-end tests/benches.

Creates the directory tree the data pipeline expects
(``foa_dev/dev-{train-chunked,val,test}`` + ``metadata_dev/...``) with
random int16 FOA wavs and random polar-label CSVs.
"""
import os

import numpy as np

from adyolo_tpu.data.io import write_label_csv, write_wav


def random_label(rng, nb_label_frames, nb_classes, n_events=8):
    label = {}
    for _ in range(n_events):
        t = int(rng.integers(nb_label_frames))
        label.setdefault(t, []).append([
            int(rng.integers(nb_classes)), int(rng.integers(2)),
            float(rng.integers(-180, 180)), float(rng.integers(-90, 91)),
        ])
    return label


def make_synth_dataset(root, sr=24000, nb_classes=13, n_train=12, n_val=2,
                       n_test=2, train_secs=None, eval_secs=28, seed=0,
                       chunk_window_s=20, audio_format="foa"):
    """Returns the data_pth. Train clips are already 'chunked'
    (``chunk_window_s`` seconds; pass a matching data-config override);
    val/test clips are longer + odd-length to exercise bucketing.
    ``audio_format='mic'`` writes the mic_dev/ directory layout instead."""
    rng = np.random.default_rng(seed)
    train_secs = chunk_window_s if train_secs is None else train_secs
    sub = f"dev-train-chunked_{chunk_window_s}s_1s"
    adir = f"{audio_format}_dev"
    for d in (f"{adir}/{sub}", f"{adir}/dev-val", f"{adir}/dev-test",
              f"metadata_dev/{sub}", "metadata_dev/dev-val", "metadata_dev/dev-test"):
        os.makedirs(os.path.join(root, d), exist_ok=True)

    def write_clip(wav_dir, csv_dir, name, secs):
        n = sr * secs
        audio = (rng.standard_normal((n, 4)) * 1500).astype(np.int16)
        write_wav(os.path.join(root, wav_dir, name + ".wav"), audio, sr)
        label = random_label(rng, n // (sr // 10), nb_classes)
        write_label_csv(os.path.join(root, csv_dir, name + ".csv"), label)

    for i in range(n_train):
        write_clip(f"{adir}/{sub}", f"metadata_dev/{sub}", f"train{i:03d}_chunk001", train_secs)
    for i in range(n_val):
        write_clip(f"{adir}/dev-val", "metadata_dev/dev-val", f"val{i:03d}", eval_secs + i)
    for i in range(n_test):
        write_clip(f"{adir}/dev-test", "metadata_dev/dev-test", f"test{i:03d}", eval_secs + i)

    # classes.txt
    with open(os.path.join(root, "classes.txt"), "w") as f:
        for c in range(nb_classes):
            f.write(f"class{c}\n")
    return root

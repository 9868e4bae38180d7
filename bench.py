"""Benchmark: features+forward throughput on the flagship SELD model.

Measures the BASELINE.json headline metric — audio-seconds processed per
wall-clock second per chip for the fused feature-extraction + SE-ResNet34
+ AD-YOLO forward pipeline on STARSS22-geometry clips (20 s, 4-ch FOA,
24 kHz) — with device-resident input (the dev-environment host tunnel is
~27 MB/s and would otherwise dominate; production input pipelines stream
asynchronously).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is the ratio against the 500x-real-time north-star target.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from adyolo_tpu.config import Config
    from adyolo_tpu.engine.evaluate import make_frontend
    from adyolo_tpu.models.wrapper import build_model

    cfg = Config()
    frontend = make_frontend(cfg)
    model = build_model(cfg)

    B = 16
    secs = cfg.data.chunk_window_s
    rng = np.random.default_rng(0)
    audio = jax.device_put(
        (rng.standard_normal((B, cfg.data.chunk_samples, 4)) * 0.1).astype(np.float32))

    variables = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.data.chunk_feat_frames, cfg.data.mel_bins,
                   cfg.data.nb_feature_channels), jnp.float32),
        False,
    )

    @jax.jit
    def fwd(variables, audio):
        feat = frontend._forward(audio, None, frontend._mel_mean, frontend._mel_std,
                                 frontend._iv_mean, frontend._iv_std)
        return model.apply(variables, feat, False)

    fwd(variables, audio).block_until_ready()  # compile
    # warm
    for _ in range(3):
        out = fwd(variables, audio)
    out.block_until_ready()

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, audio)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    audio_sec_per_sec = B * secs / dt
    target = 500.0  # north-star: >= 500x real-time per chip (BASELINE.json)
    print(json.dumps({
        "metric": "audio-sec/sec/chip (features+forward, se-resnet34+adyolo)",
        "value": round(audio_sec_per_sec, 1),
        "unit": "audio_s/s",
        "vs_baseline": round(audio_sec_per_sec / target, 3),
    }))


if __name__ == "__main__":
    main()

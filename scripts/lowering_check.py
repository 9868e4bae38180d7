"""Chip-free TPU-compile validation: AOT-lower the Pallas kernels and the
full conformer train step for platform 'tpu' from the CPU host.

Mosaic enforces its block-shape/layout rules at LOWERING time, so this
catches TPU compile failures (e.g. the last-two-block-dims-(8k,128k)
rule that the interpret-mode tests cannot see) without touching the
chip.  Run after any kernel or attention-path change:

    ADYOLO_FLASH_MHSA=auto python scripts/lowering_check.py

Runtime performance and VMEM pressure still need the real chip
(scripts/flash_check.py / bench.py).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("ADYOLO_FLASH_MHSA", "auto")


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import dataclasses

    import numpy as np
    import jax.numpy as jnp

    from adyolo_tpu.ops.flash_mhsa import flash_mhsa, flash_mhsa_long

    B, T, H, dh = 16, 800, 4, 64
    q = jnp.zeros((B, T, H, dh), jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    mask = jnp.arange(T)[None, :] < T - 100

    def train_fn(a, b, c):
        return flash_mhsa(a, b, c, mask, rate=0.2, rng_key=key)

    def grad_fn(a, b, c):
        return jax.grad(lambda x, y, z: jnp.sum(
            train_fn(x, y, z).astype(jnp.float32)), argnums=(0, 1, 2))(a, b, c)

    qe = jnp.zeros((1, 8000, H, dh), jnp.float32)
    for name, fn, args in (("flash fwd", train_fn, (q, q, q)),
                           ("flash fwd+bwd", grad_fn, (q, q, q)),
                           ("flash long (T=8000)",
                            lambda a, b, c: flash_mhsa_long(a, b, c),
                            (qe, qe, qe))):
        low = jax.jit(fn).trace(*args).lower(lowering_platforms=("tpu",))
        n = low.as_text().count("tpu_custom_call")
        assert n >= 1, name
        print(f"{name}: TPU lowering OK ({n} mosaic custom-calls)")

    # full bf16 conformer train step, flash gate forced on for the trace
    from adyolo_tpu.config import Config, RunConfig
    from adyolo_tpu.data.labels import encode_adyolo, pad_yolo_targets
    from adyolo_tpu.engine.evaluate import make_frontend
    from adyolo_tpu.models.wrapper import build_model, make_grid_geometry
    from adyolo_tpu.parallel.train_step import build_train_step, init_state

    for remat in (False, True):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, args=RunConfig(encoder="resnet-conformer"),
            train=dataclasses.replace(cfg.train, batch_size=2,
                                      compute_dtype="bfloat16",
                                      max_targets_per_clip=64, remat=remat))
        frontend = make_frontend(cfg)
        model = build_model(cfg)
        geom = make_grid_geometry(cfg)
        state = init_state(cfg, model, frontend, jax.random.PRNGKey(0))
        step = build_train_step(cfg, model, frontend, None)
        rng = np.random.default_rng(0)
        audio = jnp.asarray((rng.standard_normal(
            (2, cfg.data.chunk_samples, 4)) * 0.1).astype(np.float32))
        per_clip = [encode_adyolo({0: [[1, 0, 10.0, 5.0]]}, 200, geom)
                    for _ in range(2)]
        targets, tmask = pad_yolo_targets(per_clip, 128)
        batch = {"audio": audio, "targets": targets, "target_mask": tmask}

        orig = jax.default_backend
        jax.default_backend = lambda: "tpu"  # flips the MHSA 'auto' gate
        try:
            low = step.jit_step.trace(
                state, batch, jax.random.PRNGKey(1),
                step.scaler_args()).lower(lowering_platforms=("tpu",))
        finally:
            jax.default_backend = orig
        n = low.as_text().count("tpu_custom_call")
        assert n >= 16, n  # 8 blocks x (fwd + bwd recompute)
        print(f"full conformer bf16 train step (flash ON, remat={remat}): "
              f"TPU lowering OK ({n} mosaic custom-calls)")


if __name__ == "__main__":
    main()

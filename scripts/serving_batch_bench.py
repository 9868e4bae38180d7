"""A/B the serving (headline) batch size on the real chip.

The judged headline line runs features+forward at B=16 (bench.py); train
runs at B=32.  Serving throughput at larger batches may pack the MXU
better (the SE-ResNet stem's small-channel convs tile per-batch).  One
process measures every (batch, dtype) variant so the ~2-4 min axon
first-executable warmup tax is paid once.

Precision note (ADVICE r4): the f32 variants here run under the backend-
default matmul precision — the same basis as bench.py's judged headline
line.  The EXPORT serving path is stricter (engine/export.py wraps f32
serving in jax.default_matmul_precision('float32') for golden parity), so
before adopting a winning f32 batch for *exported* serving, re-measure
under --strict-f32, which mirrors export.py's precision context.

Usage: timeout 1500 python scripts/serving_batch_bench.py [--strict-f32]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(strict_f32=False):
    import jax
    import jax.numpy as jnp

    from adyolo_tpu.config import Config
    from adyolo_tpu.engine.evaluate import make_frontend
    from adyolo_tpu.models.wrapper import build_model
    from adyolo_tpu.utils.cache import enable_compilation_cache
    from adyolo_tpu.utils.profiling import benchmark, compiled_flops, mfu

    enable_compilation_cache()
    cfg = Config()
    frontend = make_frontend(cfg)
    feat_shape = (1, cfg.data.chunk_feat_frames, cfg.data.mel_bins,
                  cfg.data.nb_feature_channels)
    model_f32 = build_model(cfg)
    variables = model_f32.init(jax.random.PRNGKey(0),
                               jnp.zeros(feat_shape, jnp.float32), False)
    model_bf16 = build_model(cfg, compute_dtype="bfloat16")

    def make_fwd(mdl):
        @jax.jit
        def fwd(variables, audio):
            feat = frontend._forward(audio, None, frontend._mel_mean,
                                     frontend._mel_std, frontend._aux_mean,
                                     frontend._aux_std)
            return mdl.apply(variables, feat, False)

        return fwd

    rng = np.random.default_rng(0)
    secs = cfg.data.chunk_window_s
    results = []
    for B in (16, 32, 64):
        audio = jax.device_put(
            (rng.standard_normal((B, cfg.data.chunk_samples, 4)) * 0.1
             ).astype(np.float32).reshape(B, -1, cfg.data.hop_length, 4))
        for name, mdl in (("f32", model_f32), ("bf16", model_bf16)):
            fwd = make_fwd(mdl)
            import contextlib

            # --strict-f32 mirrors engine/export.py's serving precision
            prec_ctx = (jax.default_matmul_precision("float32")
                        if strict_f32 and name == "f32"
                        else contextlib.nullcontext())
            t0 = time.monotonic()
            with prec_ctx:
                dt = benchmark(fwd, variables, audio, iters=20, warmup=3)
            fl = compiled_flops(fwd, variables, audio)
            thr = B * secs / dt
            m = mfu(fl, dt)
            results.append((B, name, thr, dt * 1e3, m))
            print(f"B={B:3d} {name:5s}: {thr:10.1f} audio_s/s "
                  f"step {dt*1e3:7.2f} ms  MFU {100*(m or 0):.1f}%  "
                  f"(wall {time.monotonic()-t0:.0f} s)", flush=True)
        del audio

    # ADVICE r4: a mixed-dtype argmax always picks bf16 and leaves the
    # per-dtype batch question (the judged f32 headline runs B=16)
    # unanswered — report the best PER DTYPE, then the overall winner.
    for dtype in ("f32", "bf16"):
        cand = [r for r in results if r[1] == dtype]
        if cand:
            b = max(cand, key=lambda r: r[2])
            print(f"BEST[{dtype}]: B={b[0]} {b[2]:.1f} audio_s/s "
                  f"({100*(b[4] or 0):.1f}% MFU)", flush=True)
    best = max(results, key=lambda r: r[2])
    print(f"BEST: B={best[0]} {best[1]} {best[2]:.1f} audio_s/s "
          f"({100*(best[4] or 0):.1f}% MFU)", flush=True)


if __name__ == "__main__":
    main(strict_f32="--strict-f32" in sys.argv[1:])

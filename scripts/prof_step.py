"""Per-op attribution of a train step from a jax.profiler trace.

Usage: python scripts/prof_step.py [--encoder resnet-conformer] [--dtype bfloat16]
Prints the top device ops by total time within the traced steps.
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import tempfile
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--encoder", default="resnet-conformer")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--mode", default="train", choices=("train", "forward"),
                    help="train = fwd+bwd+adam at B=32; forward = the "
                         "serving features+forward path at B=16 with "
                         "--dtype as the serve compute dtype")
    args = ap.parse_args()

    import jax

    from adyolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    from adyolo_tpu.config import Config, RunConfig
    from adyolo_tpu.data.labels import encode_adyolo, pad_yolo_targets
    from adyolo_tpu.engine.evaluate import make_frontend
    from adyolo_tpu.models.wrapper import build_model, make_grid_geometry
    from adyolo_tpu.parallel.train_step import (build_train_step, init_state,
                                                make_batch_placer)

    cfg = Config()
    B32 = 32
    cfg = dataclasses.replace(
        cfg,
        train=dataclasses.replace(cfg.train, batch_size=B32,
                                  compute_dtype=args.dtype),
        args=RunConfig(encoder=args.encoder))
    rng = np.random.default_rng(0)

    if args.mode == "forward":
        # serving path: fused features+forward, B=16, device-resident
        # input — mirrors bench.py's headline/headline-bf16 lines
        import jax.numpy as jnp

        B = 16
        frontend = make_frontend(cfg)
        model = build_model(cfg, compute_dtype=args.dtype)
        feat_shape = (1, cfg.data.chunk_feat_frames, cfg.data.mel_bins,
                      cfg.data.nb_feature_channels)
        variables = build_model(cfg).init(
            jax.random.PRNGKey(0), jnp.zeros(feat_shape, jnp.float32), False)
        audio = jax.device_put(
            (rng.standard_normal((B, cfg.data.chunk_samples, 4)) * 0.1
             ).astype(np.float32)
            .reshape(B, -1, cfg.data.hop_length, 4))  # hop blocks, like bench

        @jax.jit
        def fwd(variables, audio):
            feat = frontend._forward(audio, None, frontend._mel_mean,
                                     frontend._mel_std, frontend._aux_mean,
                                     frontend._aux_std)
            return model.apply(variables, feat, False)

        np.asarray(fwd(variables, audio)).sum()  # compile + warm
        with tempfile.TemporaryDirectory() as logdir:
            jax.profiler.start_trace(logdir)
            t0 = time.perf_counter()
            out = None
            for _ in range(args.iters):
                out = fwd(variables, audio)
            np.asarray(out).sum()
            wall = time.perf_counter() - t0
            jax.profiler.stop_trace()
            _report(logdir, wall, args)
        return
    geom = make_grid_geometry(cfg)
    per_clip = []
    for _ in range(B32):
        label = {}
        for _ in range(12):
            t = int(rng.integers(200))
            label.setdefault(t, []).append([
                int(rng.integers(13)), 0, float(rng.uniform(-180, 180)),
                float(rng.uniform(-90, 90))])
        per_clip.append(encode_adyolo(label, 200, geom))
    targets, mask = pad_yolo_targets(per_clip, 8192)
    audio32 = jax.device_put(
        (rng.standard_normal((B32, cfg.data.chunk_samples, 4)) * 0.1
         ).astype(np.float32)
        .reshape(B32, -1, cfg.data.hop_length, 4))  # hop blocks, like collate

    frontend = make_frontend(cfg)
    model = build_model(cfg)
    state = init_state(cfg, model, frontend, jax.random.PRNGKey(0))
    step = build_train_step(cfg, model, frontend, None)
    place = make_batch_placer(cfg, None)
    batch = place({"audio": audio32, "targets": targets, "target_mask": mask})
    key = jax.random.PRNGKey(1)

    s = state
    for _ in range(3):
        s, loss = step(s, batch, key)
    float(loss)

    with tempfile.TemporaryDirectory() as logdir:
        jax.profiler.start_trace(logdir)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            s, loss = step(s, batch, key)
        float(loss)
        wall = time.perf_counter() - t0
        jax.profiler.stop_trace()

        _report(logdir, wall, args)


def _report(logdir, wall, args):
    paths = glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz")
    with gzip.open(sorted(paths)[-1]) as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    pid_names = {e["pid"]: e.get("args", {}).get("name", "") for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    tpu_pids = sorted(p for p, n in pid_names.items() if "TPU" in n)
    if not tpu_pids:
        print("no TPU lanes found", file=sys.stderr)
        sys.exit(1)
    pid0 = tpu_pids[0]
    # thread lanes within the pid: XLA Ops lane holds per-op events
    tid_names = {(e["pid"], e["tid"]): e.get("args", {}).get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "thread_name"}
    totals = defaultdict(float)
    counts = defaultdict(int)
    src_totals = defaultdict(float)
    top_total = 0.0
    shown_args = False
    for e in events:
        if e.get("ph") != "X" or e.get("pid") != pid0:
            continue
        lane = tid_names.get((e["pid"], e.get("tid")), "")
        name = e.get("name", "")
        if name.startswith("jit_") or name.startswith("jit("):
            top_total += e.get("dur", 0.0)
            continue
        if "XLA Ops" not in lane and "Ops" not in lane:
            continue
        totals[name] += e.get("dur", 0.0)
        counts[name] += 1
        # attribute to source line via HLO op metadata when the trace
        # carries it (args differ across profiler versions)
        ea = e.get("args", {}) or {}
        if not shown_args and ea:
            print("sample op args keys:", sorted(ea.keys())[:12],
                  file=sys.stderr)
            shown_args = True
        src = ea.get("source_info") or ea.get("source") or ""
        if not src:
            # long_name often embeds op_name="..." metadata with source
            ln = ea.get("long_name", "")
            if "/" in ln:
                src = ln.split()[0][:80]
        key = src.rsplit("/", 1)[-1] if src else name.split(".")[0]
        src_totals[key] += e.get("dur", 0.0)
    print(f"wall: {wall / args.iters * 1e3:.1f} ms/step; "
          f"device top-level: {top_total / args.iters / 1e3:.1f} ms/step")
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    tot = sum(totals.values())
    print(f"total op time: {tot / args.iters / 1e3:.1f} ms/step over "
          f"{len(ranked)} distinct ops")
    for name, dur in ranked[: args.top]:
        print(f"{dur / args.iters / 1e3:8.3f} ms  "
              f"x{counts[name] // args.iters:<4d} {name[:110]}")
    print("---- by source attribution ----")
    for key, dur in sorted(src_totals.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{dur / args.iters / 1e3:8.3f} ms  {key[:110]}")


if __name__ == "__main__":
    main()

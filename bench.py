"""Benchmarks for the BASELINE.json configs.

Default output (one JSON line each, emitted as soon as measured):
  * headline — audio-seconds per wall-clock second per chip for fused
    features+forward on the flagship SE-ResNet34 + AD-YOLO model
    (20-s FOA clips, batch 16, device-resident input); ``vs_baseline``
    is the ratio against the 500x-real-time north-star target
  * full forward-backward train step, batch 32 (f32 and bf16 compute)
  * ResNet-Conformer train step, batch 32, bf16
  * bonus: the bf16-serving headline variant (params f32, activations
    bf16 — SELD-metric-identical to f32 serving on the trained
    checkpoint), emitted when the group worker has deadline headroom

``--all`` additionally benchmarks the A/B variant lines (one optimization
toggled via env each — see ``AB_CONFIGS``/``CONFIG_ENV``) and the
remaining BASELINE.json configs:
  1. single-clip infer latency (features+forward+decode, batch=1)
  2. offline preprocessing feature kernels (scaler-stats pass)
  3. MIC-array GCC-PHAT inference path
  4. multi-format eval forward (accdoa vs adyolo heads)

Budgeting: the judged default lines run in ONE worker subprocess
(``--config-group judged``).  On the axon tunnel the FIRST executable a
process runs costs 2-4 min of backend warmup (measured 130-190 s for a
trivial matmul; XLA compile itself was 0.58 s) — per-config subprocess
isolation paid that tax once per line, which is what blew the r3/r4
driver budgets (BENCH_r03 rc=124).  The group worker pays it once and
streams each JSON line the moment it is measured, so even a hard
external kill keeps every already-measured line in the artifact.
``ADYOLO_BENCH_GROUP_TIMEOUT`` caps the group worker (default 1800 s,
SIGTERM first — SIGKILLing a live axon client wedges the chip lease);
``ADYOLO_BENCH_TIMEOUT`` caps each single-config retry subprocess
(default 1500 s); ``ADYOLO_BENCH_BUDGET`` (seconds, default 2100) caps
the whole run — remaining configs are recorded as skipped, the process
still exits 0 with every measured line emitted.

Fault tolerance (three levels):
  * in-process: each config runs under a retry wrapper (3 attempts,
    backoff, fresh warmup) for transient measurement errors;
  * group worker + per-config retry: any judged config whose line is
    missing after the group worker exits gets its own fresh subprocess
    (``--config NAME``), because a backend error that wedges the PJRT
    client — e.g. the FAILED_PRECONDITION host fetch that erased the
    round-2 driver artifact — kills every later device op in a process;
    a fresh process is the only retry that works.  The orchestrator
    never imports jax (the chip is single-tenant).
  * live streaming: worker stdout is forwarded line-by-line, never
    buffered until exit, so a driver-level timeout cannot erase lines
    that were already measured.
A config that still fails is recorded in a final
``{"metric": "bench-errors", ...}`` line; every config that succeeds is
emitted regardless, and the process exits 0.  ``--inprocess`` restores
the legacy single-process mode.
"""
from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np


def _bench(fn, *args, iters=20, warmup=3):
    from adyolo_tpu.utils.profiling import benchmark

    return benchmark(fn, *args, iters=iters, warmup=warmup)


def _emit(metric, value, unit, vs_baseline=None, flops=None, dt=None):
    rec = {"metric": metric, "value": round(float(value), 3), "unit": unit}
    if vs_baseline is not None:
        rec["vs_baseline"] = round(float(vs_baseline), 3)
    if flops is not None and dt is not None:
        from adyolo_tpu.utils.profiling import mfu

        rec["tflops_per_s"] = round(flops / dt / 1e12, 3)
        m = mfu(flops, dt)
        if m is not None:
            rec["mfu"] = round(m, 4)
    print(json.dumps(rec), flush=True)


_ERRORS = []
_ONLY = None  # --config NAME / --config-group: set of configs to run
_DEADLINE = None  # worker-internal wall deadline (monotonic secs)

# The four judged lines only — the r3 driver artifact (BENCH_r03) hit
# rc=124 because the default list had grown to 7 configs; A/B variant
# lines live behind --all now (their r3/r4 decisions are recorded in
# PLAN.md "Round 4 — A/B decisions").
DEFAULT_CONFIGS = ("headline", "train-f32", "train-bf16",
                   "train-conformer-bf16")
# The group worker also emits the bf16 serving line when its internal
# deadline allows (the extra compile is ~1 min once the warmup tax is
# paid, and bf16 serving is SELD-metric-identical to f32 on the trained
# checkpoint — benchlogs/bf16_serving_parity_r4.log); it is a bonus
# line, never individually retried unless --all asks for it.
GROUP_CONFIGS = DEFAULT_CONFIGS + ("headline-bf16",)
# A/B lines: same benches with one optimization toggled via env, so a
# driver artifact can re-decide any default without code changes
AB_CONFIGS = ("headline-bf16", "train-bf16-nopack",
              "train-conformer-bf16-noflash",
              "train-conformer-bf16-timepack",
              "train-conformer-bf16-confpacked",
              "train-bf16-scatterloss")
# env overrides per A/B config; applied in the worker process before any
# adyolo/jax import (the flags are read at import time).  headline-bf16
# needs none: the serving dtype is a runtime build_model argument.
CONFIG_ENV = {
    "train-bf16-nopack": {"ADYOLO_PACKED_STAGES": "0"},
    # each line measures the NON-default side of a decided A/B (flash
    # default "auto", conformer time_pack default OFF, conf_packed OFF —
    # PLAN.md "Round 4 — A/B decisions"; sorted loss ON — "Round 5") so
    # any driver artifact can re-check the call
    "train-conformer-bf16-noflash": {"ADYOLO_FLASH_MHSA": "0"},
    "train-conformer-bf16-timepack": {"ADYOLO_TIME_PACK": "1"},
    "train-conformer-bf16-confpacked": {"ADYOLO_CONF_PACKED": "1"},
    "train-bf16-scatterloss": {"ADYOLO_SORTED_LOSS": "0"},
}
ALL_CONFIGS = DEFAULT_CONFIGS + AB_CONFIGS + (
    "infer-latency", "scaler-pass", "mic-gcc",
    "eval-fwd-accdoa", "eval-fwd-adyolo")
# exact metric string each config emits — the orchestrator matches these
# against streamed worker stdout to know which lines landed
METRIC_OF = {
    "headline": "audio-sec/sec/chip (features+forward, se-resnet34+adyolo)",
    "headline-bf16": "audio-sec/sec/chip (features+forward, bf16 serving)",
    "train-f32": "train-step throughput (fwd+bwd+adam, B=32)",
    "train-bf16": "train-step throughput (fwd+bwd+adam, B=32, bf16 compute)",
    "train-conformer-bf16":
        "train-step throughput (resnet-conformer, B=32, bf16)",
    "train-bf16-nopack":
        "train-step throughput (B=32, bf16, packed_stages OFF)",
    "train-conformer-bf16-noflash":
        "train-step throughput (conformer, bf16, flash-MHSA OFF)",
    "train-conformer-bf16-timepack":
        "train-step throughput (conformer, bf16, time-pack ON)",
    "train-conformer-bf16-confpacked":
        "train-step throughput (conformer, bf16, conf-packed stages ON)",
    "train-bf16-scatterloss":
        "train-step throughput (B=32, bf16, scatter-max loss)",
    "infer-latency": "p50 per-clip infer latency (fwd+decode, 20 s clip)",
    "scaler-pass": "scaler-pass feature kernel throughput",
    "mic-gcc": "MIC/GCC-PHAT features+forward",
    "eval-fwd-accdoa": "eval forward (accdoa head)",
    "eval-fwd-adyolo": "eval forward (adyolo head)",
}


def _run_config(name, fn, attempts=3):
    """Run one bench config with retries; record (not raise) final failure.

    A transient backend error mid-measurement leaves the device queue in
    an unknown state; each retry re-enters ``fn`` from scratch, which
    re-warms (``benchmark`` always warms up before tracing).  NOTE: a
    backend error that wedges the PJRT client (e.g. the INVALID_ARGUMENT
    storms the axon tunnel produces under deep transfer queues) makes
    every subsequent device op fail in this process — the in-process
    retry handles transient measurement errors only; process-level
    isolation lives in ``_orchestrate`` below."""
    if _ONLY is not None and name not in _ONLY:
        return False
    want = CONFIG_ENV.get(name)
    if want and any(os.environ.get(k) != v for k, v in want.items()):
        # A/B variants need their env override in place before the first
        # adyolo import (worker mode sets it; legacy --inprocess can't)
        _ERRORS.append({"config": name,
                        "error": "skipped: env override requires subprocess "
                                 "worker mode"})
        return False
    if _DEADLINE is not None and time.monotonic() > _DEADLINE:
        # worker-internal budget: exit cleanly with what was measured
        # rather than being SIGTERMed mid-device-op by the orchestrator
        sys.stderr.write(f"[bench] {name}: skipped, worker deadline hit\n")
        _ERRORS.append({"config": name,
                        "error": "skipped: worker deadline exhausted"})
        return False
    t0 = time.monotonic()
    for attempt in range(attempts):
        try:
            fn()
            sys.stderr.write(
                f"[bench] {name}: done in {time.monotonic() - t0:.1f} s\n")
            return True
        except Exception as exc:  # noqa: BLE001 — must survive anything
            err = f"{type(exc).__name__}: {exc}"
            sys.stderr.write(
                f"[bench] {name}: attempt {attempt + 1}/{attempts} failed: "
                f"{err}\n")
            if attempt == attempts - 1:
                sys.stderr.write(traceback.format_exc())
                _ERRORS.append({"config": name, "error": err[:500]})
            else:
                time.sleep(2.0 * (attempt + 1))
    return False


def main() -> None:
    import jax

    from adyolo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import dataclasses

    import jax.numpy as jnp

    from adyolo_tpu.config import Config, RunConfig
    from adyolo_tpu.engine.evaluate import make_frontend
    from adyolo_tpu.models.wrapper import build_model
    from adyolo_tpu.utils.profiling import compiled_flops

    run_all = "--all" in sys.argv or (
        _ONLY is not None and not set(_ONLY) <= set(GROUP_CONFIGS))

    def _needs(pred):
        return _ONLY is None or any(pred(n) for n in _ONLY)

    cfg = Config()
    frontend = make_frontend(cfg)
    model = build_model(cfg)

    B, secs = 16, cfg.data.chunk_window_s
    rng = np.random.default_rng(0)
    audio16 = None
    if _needs(lambda n: not n.startswith("train-") and n != "scaler-pass"):
        # ~122 MB device_put only the headline/infer/mic/eval-fwd configs use.
        # Hop-block (B, T, hop, C) layout: same bytes (free host reshape),
        # skips the ~1.26 ms/step device chunk relayout (stft.py
        # framed_dft_chunked; A/B in scripts/stft_formulation_bench.py)
        audio16 = jax.device_put(
            (rng.standard_normal((B, cfg.data.chunk_samples, 4)) * 0.1
             ).astype(np.float32).reshape(
                 B, -1, cfg.data.hop_length, 4))
    feat_shape = (1, cfg.data.chunk_feat_frames, cfg.data.mel_bins,
                  cfg.data.nb_feature_channels)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros(feat_shape, jnp.float32), False)

    def make_fwd(fe, mdl):
        @jax.jit
        def fwd(variables, audio):
            feat = fe._forward(audio, None, fe._mel_mean, fe._mel_std,
                               fe._aux_mean, fe._aux_std)
            return mdl.apply(variables, feat, False)

        return fwd

    # serving dtype for the headline line only (params stay f32; flax
    # casts activations per-layer) — ADYOLO_SERVE_DTYPE lets a worker
    # A/B the bf16 serving path against f32 without code changes
    serve_dtype = os.environ.get("ADYOLO_SERVE_DTYPE", "float32")
    fwd = make_fwd(frontend,
                   model if serve_dtype == "float32"
                   else build_model(cfg, compute_dtype=serve_dtype))

    # ---- headline: features+forward throughput ---------------------------
    def bench_headline():
        dt = _bench(fwd, variables, audio16)
        _emit("audio-sec/sec/chip (features+forward, se-resnet34+adyolo)",
              B * secs / dt, "audio_s/s", (B * secs / dt) / 500.0,
              flops=compiled_flops(fwd, variables, audio16), dt=dt)

    _run_config("headline", bench_headline)

    def bench_headline_bf16():
        # serving dtype is a runtime build_model argument (params stay
        # f32; flax casts activations per layer), so the bf16 line runs
        # in the same process as the f32 one — no env override needed
        f = (fwd if serve_dtype == "bfloat16"
             else make_fwd(frontend, build_model(cfg, compute_dtype="bfloat16")))
        dt = _bench(f, variables, audio16)
        _emit("audio-sec/sec/chip (features+forward, bf16 serving)",
              B * secs / dt, "audio_s/s", (B * secs / dt) / 500.0,
              flops=compiled_flops(f, variables, audio16), dt=dt)
    # NOTE: the headline-bf16 call site is after the judged train lines
    # below — in group-worker mode the bonus line must never crowd out a
    # judged one when the worker deadline is close

    # ---- train steps (always emitted: the numbers rounds are judged on) ---
    from adyolo_tpu.data.labels import encode_adyolo, pad_yolo_targets
    from adyolo_tpu.models.wrapper import make_grid_geometry
    from adyolo_tpu.parallel.train_step import (build_train_step, init_state,
                                                make_batch_placer)

    B32 = 32
    cfg32 = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, batch_size=B32))
    targets = mask = audio32 = None
    if _needs(lambda n: n.startswith("train-")):
        # the (B=32) batch encode + ~245 MB device_put only serves the
        # train-* configs; worker subprocesses for the other configs skip
        # it (the axon tunnel moves ~27 MB/s — that's ~9 s per worker)
        geom = make_grid_geometry(cfg32)
        per_clip = []
        for b in range(B32):
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
             ).astype(np.float32).reshape(
                 B32, -1, cfg.data.hop_length, 4))

    def bench_train_step(cfg_b, label):
        mdl = build_model(cfg_b)
        state = init_state(cfg_b, mdl, frontend, jax.random.PRNGKey(0))
        step = build_train_step(cfg_b, mdl, frontend, None)
        place = make_batch_placer(cfg_b, None)
        batch = place({"audio": audio32, "targets": targets, "target_mask": mask})
        key = jax.random.PRNGKey(1)
        flops = compiled_flops(step.jit_step, state, batch, key,
                               step.scaler_args())
        if flops and cfg_b.args.encoder == "resnet-conformer":
            # MFU's numerator is implementation-independent MODEL FLOPs.
            # XLA's cost analysis cannot see inside the Pallas flash-MHSA
            # kernel, so when it is active add the standard analytic
            # attention-matmul count (QK^T + PV: 4*B*T^2*D fwd, 2x for
            # bwd = 12*B*T^2*D per layer) that the XLA-attention variant
            # of the same step would have been billed.
            from adyolo_tpu.models.resnet_conformer import MHSA, ResNetConformer

            flash = MHSA.flash
            if flash == "1" or (flash == "auto"
                                and jax.default_backend() == "tpu"):
                T = cfg_b.data.chunk_feat_frames
                D, L = ResNetConformer.emb_dim, ResNetConformer.num_layers
                flops += 12.0 * cfg_b.train.batch_size * T * T * D * L
        s = state
        for _ in range(3):
            s, loss = step(s, batch, key)
        # host fetch: the only guaranteed queue drain on this stack
        # (block_until_ready can return early through the PJRT tunnel);
        # the donated-state chain itself was trace-verified honest, the
        # fetches make the window boundaries exact
        float(loss)
        t0 = time.perf_counter()
        N = 15
        for _ in range(N):
            s, loss = step(s, batch, key)
        float(loss)
        dt = (time.perf_counter() - t0) / N
        _emit(label, B32 * secs / dt, "audio_s/s", flops=flops, dt=dt)

    cfg32bf = dataclasses.replace(cfg32, train=dataclasses.replace(
        cfg32.train, compute_dtype="bfloat16"))
    cfg32conf = dataclasses.replace(cfg32bf, args=RunConfig(
        encoder="resnet-conformer"))
    _run_config("train-f32", lambda: bench_train_step(
        cfg32, "train-step throughput (fwd+bwd+adam, B=32)"))
    _run_config("train-bf16", lambda: bench_train_step(
        cfg32bf, "train-step throughput (fwd+bwd+adam, B=32, bf16 compute)"))
    _run_config("train-conformer-bf16", lambda: bench_train_step(
        cfg32conf, "train-step throughput (resnet-conformer, B=32, bf16)"))
    # bonus bf16 serving line, last and headroom-guarded (see NOTE above)
    if _DEADLINE is None or time.monotonic() < _DEADLINE - 240:
        _run_config("headline-bf16", bench_headline_bf16)
    elif _ONLY is not None and "headline-bf16" in _ONLY:
        sys.stderr.write("[bench] headline-bf16: skipped, <240 s of "
                         "worker deadline headroom left\n")
    _run_config("train-bf16-nopack", lambda: bench_train_step(
        cfg32bf, "train-step throughput (B=32, bf16, packed_stages OFF)"))
    _run_config("train-conformer-bf16-noflash", lambda: bench_train_step(
        cfg32conf, "train-step throughput (conformer, bf16, flash-MHSA OFF)"))
    _run_config("train-conformer-bf16-timepack", lambda: bench_train_step(
        cfg32conf, "train-step throughput (conformer, bf16, time-pack ON)"))
    _run_config("train-conformer-bf16-confpacked", lambda: bench_train_step(
        cfg32conf,
        "train-step throughput (conformer, bf16, conf-packed stages ON)"))
    _run_config("train-bf16-scatterloss", lambda: bench_train_step(
        cfg32bf, "train-step throughput (B=32, bf16, scatter-max loss)"))

    if run_all:
        from adyolo_tpu.ops.decode import PostProcessor

        # ---- config 1: single-clip infer latency (p50) --------------------
        def bench_infer_latency():
            audio1 = audio16[:1]
            pp = PostProcessor(cfg)
            pp.set_conf_thresh(0.9)  # realistic sparse detections
            lat = []
            for _ in range(20):
                t0 = time.perf_counter()
                out = fwd(variables, audio1)
                pp.postprocess(out)
                lat.append(time.perf_counter() - t0)
            _emit("p50 per-clip infer latency (fwd+decode, 20 s clip)",
                  float(np.percentile(lat, 50) * 1e3), "ms")

        _run_config("infer-latency", bench_infer_latency)

        # ---- config 2: preprocessing feature kernels ----------------------
        def bench_scaler_pass():
            raw = jax.device_put(
                (rng.standard_normal((8, cfg.data.chunk_samples, 4)) * 0.1
                 ).astype(np.float32))
            raw_fn = jax.jit(frontend.raw_mel_aux)
            dt = _bench(raw_fn, raw)
            _emit("scaler-pass feature kernel throughput", 8 * secs / dt,
                  "audio_s/s")

        _run_config("scaler-pass", bench_scaler_pass)

        # ---- config 3: MIC GCC-PHAT inference path ------------------------
        def bench_mic():
            mic_cfg = dataclasses.replace(cfg, data=dataclasses.replace(
                cfg.data, audio_format="mic"))
            mic_fe = make_frontend(mic_cfg)
            mic_model = build_model(mic_cfg)
            mic_vars = mic_model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, cfg.data.chunk_feat_frames, cfg.data.mel_bins,
                           mic_cfg.data.nb_feature_channels), jnp.float32),
                False)
            mic_fwd = make_fwd(mic_fe, mic_model)
            dt = _bench(mic_fwd, mic_vars, audio16)
            _emit("MIC/GCC-PHAT features+forward", B * secs / dt, "audio_s/s")

        _run_config("mic-gcc", bench_mic)

        # ---- config 5: multi-format eval forward --------------------------
        def bench_eval_forward(loss_nm):
            c = dataclasses.replace(cfg, args=RunConfig(loss=loss_nm))
            m = build_model(c)
            v = m.init(jax.random.PRNGKey(0),
                       jnp.zeros(feat_shape, jnp.float32), False)
            f = make_fwd(frontend, m)
            dt = _bench(f, v, audio16)
            _emit(f"eval forward ({loss_nm} head)", B * secs / dt, "audio_s/s")

        for loss_nm in ("accdoa", "adyolo"):
            _run_config(f"eval-fwd-{loss_nm}",
                        lambda ln=loss_nm: bench_eval_forward(ln))

    if _ERRORS and _ONLY is None:
        # worker mode (--config) reports failure via exit code instead;
        # the orchestrator owns error emission there
        print(json.dumps({"metric": "bench-errors", "value": len(_ERRORS),
                          "unit": "failed_configs", "errors": _ERRORS}),
              flush=True)


def _stream_worker(args, timeout, env=None):
    """Run one worker subprocess, forwarding stdout JSON lines LIVE.

    Buffered-until-exit forwarding is what made the r3/r4 driver
    timeouts lossy: a kill mid-worker erased lines that had already been
    measured.  Returns ``(rc, lines)``; ``rc`` is None when the worker
    hit ``timeout`` and was terminated (SIGTERM first, 30 s grace —
    SIGKILLing a live axon client can leave the remote chip grant held,
    see PLAN.md "Known environment quirks")."""
    import selectors
    import subprocess
    import threading

    proc = subprocess.Popen(args, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=env)

    def _drain_stderr():
        for ln in proc.stderr:
            sys.stderr.write(ln)

    th = threading.Thread(target=_drain_stderr, daemon=True)
    th.start()
    sel = selectors.DefaultSelector()
    sel.register(proc.stdout, selectors.EVENT_READ)
    lines = []
    deadline = time.monotonic() + timeout
    rc = None
    while True:
        if time.monotonic() > deadline:
            sys.stderr.write(
                f"[bench] worker over {timeout:.0f} s cap — SIGTERM\n")
            proc.terminate()
            try:
                proc.wait(30)
            except subprocess.TimeoutExpired:
                proc.kill()
                proc.wait()
            break
        if sel.select(timeout=2.0):
            ln = proc.stdout.readline()
            if ln:
                print(ln.rstrip("\n"), flush=True)
                lines.append(ln)
                continue
            rc = proc.wait()  # EOF
            break
        if proc.poll() is not None:
            rc = proc.poll()
            for ln in proc.stdout:
                print(ln.rstrip("\n"), flush=True)
                lines.append(ln)
            break
    sel.close()
    th.join(timeout=5)
    return rc, lines


def _orchestrate() -> None:
    """Default mode: ONE group worker for the judged lines, then a fresh
    per-config subprocess for anything still missing.

    The group design is driven by a measured axon-tunnel property: the
    first executable any process runs costs 2-4 min of backend warmup
    (a trivial matmul's first call took 130-190 s while its XLA compile
    took 0.58 s), so per-config isolation paid ~3 min of pure tax per
    line — that is what truncated BENCH_r03 (rc=124), not XLA compile.
    Process isolation is still the only retry that survives a wedged
    PJRT client (a backend error inside one config kills every later
    device op in that process — learned the hard way when BENCH_r02
    died on one transient host fetch), so it remains the retry path.
    The orchestrator itself never imports jax: the axon chip is
    single-tenant and a jax-touching parent would block its children
    forever."""
    import subprocess

    def chip_alive(timeout=180):
        """Cheap wedge probe: can a fresh process see the chip at all?
        (During the lease wedge every new process blocks silently inside
        jax.devices(); a claim-queue waiter holds no grant, so killing
        the probe is safe.)"""
        try:
            p = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                capture_output=True, timeout=timeout)
            return p.returncode == 0
        except subprocess.TimeoutExpired:
            return False

    run_all = "--all" in sys.argv
    # per-config cap for retry subprocesses: a healthy config finishes
    # in <=7 min incl. the ~3 min first-executable warmup tax; 1500 s
    # covers a cold-cache compile without letting one wedged config eat
    # the whole driver budget.  Overridable for long local sweeps.
    cfg_timeout = int(os.environ.get("ADYOLO_BENCH_TIMEOUT", "1500"))
    group_timeout = int(os.environ.get("ADYOLO_BENCH_GROUP_TIMEOUT", "1800"))
    # overall wall-clock budget (seconds): remaining configs are recorded
    # as skipped once exceeded, so the artifact always ends with rc=0 and
    # a complete accounting instead of a driver kill mid-line.  The
    # measured group-worker cost is ~7 min for all judged lines, so the
    # 2100 s default leaves room for two full per-config retries.
    budget = float(os.environ.get("ADYOLO_BENCH_BUDGET", "2100")) or None
    t_start = time.perf_counter()
    errors = []
    wedged = False

    # ---- phase 1: one group worker emits every judged line (+ the
    # bonus bf16 serving line), paying the axon warmup tax once --------
    gt = group_timeout
    if budget is not None:
        gt = min(gt, max(120, budget - (time.perf_counter() - t_start) - 60))
    env = dict(os.environ)
    # the worker self-terminates cleanly before our SIGTERM would hit it
    env.setdefault("ADYOLO_BENCH_WORKER_DEADLINE", str(max(90, gt - 90)))
    rc, glines = _stream_worker(
        [sys.executable, os.path.abspath(__file__),
         "--config-group", "judged"], gt, env=env)
    done = {n for n in GROUP_CONFIGS
            if any(METRIC_OF[n] in ln for ln in glines)}
    if rc is None:
        sys.stderr.write("[bench] group worker timed out; probing chip\n")
        if not chip_alive():
            wedged = True
    elif rc != 0:
        sys.stderr.write(f"[bench] group worker rc={rc}\n")

    # ---- phase 2: fresh per-config subprocess for anything missing ----
    names = [n for n in (ALL_CONFIGS if run_all else DEFAULT_CONFIGS)
             if n not in done]
    for name in names:
        if wedged:
            errors.append({"config": name,
                           "error": "skipped: chip-lease wedge in effect"})
            continue
        if budget is not None and time.perf_counter() - t_start > budget:
            errors.append({"config": name,
                           "error": "skipped: bench budget exhausted"})
            continue
        for attempt in range(2):
            try:
                proc = subprocess.run(
                    [sys.executable, os.path.abspath(__file__),
                     "--config", name],
                    capture_output=True, text=True, timeout=cfg_timeout)
            except subprocess.TimeoutExpired:
                # a 40-min hang is the chip-lease wedge (a killed axon
                # client leaves the remote grant held and every new
                # process blocks inside jax.devices()), not a transient —
                # retrying doubles the loss.  Probe once: if even
                # jax.devices() hangs, skip the remaining configs rather
                # than burning 40 min on each; otherwise move on to give
                # later configs a chance.
                err = f"timeout after {cfg_timeout} s (chip-lease wedge?)"
                sys.stderr.write(f"[bench] {name}: {err}\n")
                errors.append({"config": name, "error": err})
                if not chip_alive():
                    sys.stderr.write(
                        "[bench] wedge probe: jax.devices() hangs — "
                        "skipping remaining configs\n")
                    wedged = True
                break
            out = proc.stdout.strip()
            if out:
                print(out, flush=True)
            sys.stderr.write(proc.stderr[-2000:])
            if proc.returncode == 0 and out:
                break
            err = (f"rc={proc.returncode}, last stderr: "
                   + proc.stderr.strip().splitlines()[-1][:300]
                   if proc.stderr.strip() else f"rc={proc.returncode}")
            sys.stderr.write(
                f"[bench] {name}: attempt {attempt + 1}/2 failed ({err})\n")
            if attempt == 1:
                errors.append({"config": name, "error": err[:500]})
            else:
                time.sleep(3.0)
    if errors:
        print(json.dumps({"metric": "bench-errors", "value": len(errors),
                          "unit": "failed_configs", "errors": errors}),
              flush=True)


if __name__ == "__main__":
    if "--config" in sys.argv or "--config-group" in sys.argv:
        if "--config-group" in sys.argv:
            grp = sys.argv[sys.argv.index("--config-group") + 1]
            if grp != "judged":
                sys.stderr.write(f"unknown config group: {grp}\n")
                sys.exit(2)
            _ONLY = set(GROUP_CONFIGS)
        else:
            name = sys.argv[sys.argv.index("--config") + 1]
            _ONLY = {name}
            # A/B env overrides must land before the first adyolo/jax
            # import (main() imports lazily, so this is early enough)
            os.environ.update(CONFIG_ENV.get(name, {}))
        ddl = float(os.environ.get("ADYOLO_BENCH_WORKER_DEADLINE", "0"))
        if ddl > 0:
            _DEADLINE = time.monotonic() + ddl
        try:
            main()
        except Exception as exc:  # noqa: BLE001
            sys.stderr.write(traceback.format_exc())
            _ERRORS.append({"config": ",".join(sorted(_ONLY)),
                            "error": f"{type(exc).__name__}: {exc}"[:500]})
        sys.exit(1 if _ERRORS else 0)
    if "--inprocess" in sys.argv:
        # legacy single-process mode (useful when process spawn is
        # restricted); in-process retry only
        try:
            main()
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"metric": "bench-errors", "value": 1,
                              "unit": "failed_configs",
                              "errors": [{"config": "setup",
                                          "error": f"{type(exc).__name__}: {exc}"[:500]}]}),
                  flush=True)
            sys.stderr.write(traceback.format_exc())
        sys.exit(0)
    _orchestrate()
    sys.exit(0)

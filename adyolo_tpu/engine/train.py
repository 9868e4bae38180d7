"""Training engine (reference ``src/train.py:65-290``).

Epoch loop with the reference's full experiment protocol:

* fresh runs freeze the merged config to ``results/<exp_id>/hyp_exp.yaml``
  (train.py:112-115); resume reconstitutes it (train.py:81-82);
* per-epoch: train over the epoch's sampled file list, then resample the
  across-epoch pool (train.py:175);
* every 10th epoch (unless ``--fix_thresh``) the confidence threshold is
  re-arbitrated by scanning τ ∈ {0.1..0.9} for the best val SELD
  (train.py:178-206), and the frozen config is rewritten;
* val+test evaluation each epoch; best model keyed on val SELD
  (train.py:222-238); full checkpoint (incl. RNG + sampler pool) each
  epoch (train.py:241-248); console report + structured logging;
* after the last epoch, a full ``test_model`` evaluation runs on the best
  checkpoint (train.py:282-287).

``--quick_test`` caps at 3 epochs x 5 batches (main.py:53, train.py:59,163).
"""
from __future__ import annotations

import dataclasses
import os
import re
import signal
import sys
import time
from datetime import datetime
from typing import Dict, Optional

import jax
import numpy as np

from ..config import Config, load_config, save_config, flatten_config, with_conf_thresh
from ..data.dataset import EvalLoader, SELDDataset, TrainLoader
from ..metrics.seld import SegmentScorer
from ..models.wrapper import build_model, make_criterion
from ..ops.decode import PostProcessor
from ..parallel.mesh import make_mesh
from ..parallel.train_step import (build_eval_forward, build_eval_criterion,
                                   build_train_step, init_state,
                                   make_batch_placer)
from ..utils.logging import (JsonlLogger, NullLogger, get_logging_meta_config,
                             make_logger)
from ..utils.rng import get_rng_state, seed_init, set_rng_state
from .checkpoint import load_checkpoint, save_checkpoint
from .evaluate import (cached_eval_outputs, decode_cached_to_csv,
                       make_frontend, test_epoch, test_model)

__all__ = ["train_model", "train_one_epoch"]


class _PreemptionGuard:
    """SIGTERM/SIGINT-safe training: the reference has no failure handling
    (SURVEY.md §5); here a termination signal finishes the in-flight batch,
    triggers a checkpoint of the current epoch and exits cleanly so
    ``--resume_pth`` continues without losing more than one epoch."""

    def __init__(self):
        self.stop = False
        self._orig = {}

    def should_stop(self) -> bool:
        """Multi-host-safe stop decision: a SIGTERM landing on one host is
        agreed on by ALL hosts at the same batch boundary (otherwise the
        survivors deadlock in the next step's collectives)."""
        stop = self.stop
        if jax.process_count() > 1:  # pragma: no cover - needs multi-host
            from jax.experimental import multihost_utils

            flags = multihost_utils.process_allgather(np.asarray(stop))
            stop = bool(np.asarray(flags).any())
            if stop:
                self.stop = True  # every host checkpoints consistently
        return stop

    def __enter__(self):
        def handler(signum, frame):
            print(f"\n[adyolo_tpu] received signal {signum}; will checkpoint "
                  "and exit after the current batch...")
            self.stop = True

        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                self._orig[sig] = signal.signal(sig, handler)
            except ValueError:  # non-main thread (tests)
                pass
        return self

    def __exit__(self, *exc):
        for sig, orig in self._orig.items():
            signal.signal(sig, orig)
        return False


def _local_exp_id() -> str:
    """``local-<timestamp>`` id (reference train.py:108).  Multi-host
    agreement happens at the caller via :func:`_broadcast_str` — keeping
    this collective-free means ranks may take different paths to their
    provisional id without deadlocking."""
    return "local-" + datetime.now().strftime("%Y%m%d-%H%M%S")


def _broadcast_str(s: str, width: int = 128) -> str:  # pragma: no cover
    """Host 0's string wins across processes (fixed-width ascii so every
    rank contributes an identically-shaped buffer)."""
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    raw = s.encode("utf-8", errors="replace")
    if len(raw) > width:
        # truncate at a codepoint boundary (continuation bytes are
        # 0b10xxxxxx) rather than crash the multi-host startup; warn so an
        # oversized --exp_id is visible
        cut = width
        while cut > 0 and (raw[cut] & 0xC0) == 0x80:
            cut -= 1
        print(f"[adyolo_tpu] WARNING: exp_id exceeds {width} utf-8 bytes; "
              f"truncated for the multi-host broadcast: {s!r}",
              file=sys.stderr)
        raw = raw[:cut]
    buf = np.zeros(width, np.uint8)
    buf[: len(raw)] = np.frombuffer(raw, dtype=np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    # strip only the trailing zero padding — a NUL can never appear inside
    # a utf-8 encoded string, but multi-byte content must survive intact
    return bytes(out).rstrip(b"\x00").decode("utf-8", errors="replace")


DRAIN_EVERY = int(os.environ.get("ADYOLO_DRAIN_EVERY", "2"))  # 0 = never


def train_one_epoch(loader, train_step, state, key, place_batch, quick_test: bool,
                    guard=None):
    """Hot loop (train.py:40-62): place sharded batch -> fused step.

    Loss scalars stay on device between drains — a per-batch
    ``float(loss)`` host round-trip defeats dispatch pipelining (the host
    would wait out every step instead of queueing the next one while the
    device works).  A bounded drain every ``DRAIN_EVERY`` batches caps
    the number of in-flight host->device transfers: the axon-tunneled
    runtime wedges its client with INVALID_ARGUMENT backend errors when
    many 60+ MB transfers are queued (measured: a fully unsynchronized
    20-iter epoch dies ~40% of the time; drain cadence bisected in
    scripts/epoch_walltime.py), and a deeper dispatch window buys no
    extra overlap once one batch of transfer is already hidden behind a
    step.  The drain is a scalar fetch, not ``block_until_ready`` (which
    returns early through the PJRT tunnel)."""
    losses = []
    for i, batch in enumerate(loader):
        key, sub = jax.random.split(key)
        batch = place_batch(batch)
        state, loss = train_step(state, batch, sub)
        losses.append(loss)
        if DRAIN_EVERY > 0 and (i + 1) % DRAIN_EVERY == 0:
            float(loss)
        if quick_test and i == 4:
            break
        if guard is not None and guard.should_stop():
            break
    if not losses:
        return state, key, 0.0
    import jax.numpy as jnp

    return state, key, float(jnp.mean(jnp.stack(losses)))


def train_model(args: Dict, is_resume: bool = False,
                cfg_overrides: Optional[Dict] = None) -> Config:
    """args: CLI-style dict (see ``adyolo_tpu.cli``)."""
    results_dir = args.get("results_dir", "results")

    # ---- configuration / experiment identity ------------------------------
    if is_resume:
        assert args.get("resume_pth"), "--resume_pth required"
        output_pth = os.path.join(results_dir, args["resume_pth"])
        assert os.path.isdir(output_pth), output_pth
        cfg = load_config(os.path.join(output_pth, "hyp_exp.yaml"))
        assert cfg.args.exp_id == args["resume_pth"]
        # resume the neptune run recorded in the frozen config
        # (reference train.py:86-91); the credential is never frozen, so
        # re-read it from the live logging_meta_config.yaml
        meta = dict(cfg.args.logging_meta or {})
        if cfg.args.logger and meta.get("neptune_project") \
                and not meta.get("neptune_api_token"):
            meta["neptune_api_token"] = get_logging_meta_config(
                cfg.args.config_dir).get("neptune_api_token")
        # reattach the run whose sys-id was frozen at create time; exp_id
        # itself is NOT a valid neptune id when --exp_id was explicit (or
        # when the original run was created without credentials), in which
        # case a fresh run is opened.  Back-compat: checkpoints frozen
        # before neptune_run_id existed get the old behavior — in the
        # auto-named case exp_id IS the sys-id, so reattach via it.
        resume_id = meta.get("neptune_run_id")
        if not resume_id and re.fullmatch(r"[A-Z][A-Z0-9]*-\d+",
                                          args["resume_pth"]):
            resume_id = args["resume_pth"]
        if cfg.args.logger and not resume_id and jax.process_index() == 0:
            print("[adyolo_tpu] resume: no neptune run id recorded in the "
                  "frozen config; a FRESH neptune run will be opened",
                  flush=True)
        neptune_logger = (
            make_logger(cfg.args.logger, meta, resume_id=resume_id)
            if jax.process_index() == 0 else None)
        key = jax.random.PRNGKey(cfg.args.seed)  # replaced by ckpt restore below
    else:
        from ..config import build_config

        cfg = build_config(args, train_overrides=(cfg_overrides or {}).get("train"),
                           data_overrides=(cfg_overrides or {}).get("data"))
        # experiment identity: explicit --exp_id > neptune sys-id >
        # local-<timestamp> (reference train.py:99-108)
        meta = get_logging_meta_config(cfg.args.config_dir)
        # freeze the meta for resume, but NEVER the api token: hyp_exp.yaml
        # and log_params are plaintext artifacts (the reference freezes the
        # credential verbatim, utility.py:84-90 — deliberate deviation)
        frozen_meta = {**meta, "neptune_api_token": None}
        # one neptune run per experiment: only host 0 talks to neptune
        neptune_logger = (make_logger(cfg.args.logger, meta)
                          if jax.process_index() == 0 else None)
        sys_id = neptune_logger.sys_id if neptune_logger is not None else None
        if sys_id:
            # persist the run id for --resume_pth reattachment (it differs
            # from exp_id whenever --exp_id is explicit)
            frozen_meta["neptune_run_id"] = sys_id
        cfg = dataclasses.replace(
            cfg, args=dataclasses.replace(cfg.args, logging_meta=frozen_meta))
        exp_id = args.get("exp_id") or sys_id or _local_exp_id()
        if jax.process_count() > 1:  # pragma: no cover - needs multi-host
            # every host must open the SAME experiment directory; host 0's
            # id (possibly neptune-derived) wins — one unconditional
            # collective so no rank takes a divergent path
            exp_id = _broadcast_str(exp_id)
        cfg = dataclasses.replace(cfg, args=dataclasses.replace(cfg.args, exp_id=exp_id))
        output_pth = os.path.join(results_dir, exp_id)
        os.makedirs(output_pth, exist_ok=True)
        if jax.process_index() == 0:  # canonical artifact, one writer
            save_config(cfg, os.path.join(output_pth, "hyp_exp.yaml"))
        key = seed_init(cfg.args.seed)

    if neptune_logger is not None:
        logger = neptune_logger
    elif cfg.args.logger and jax.process_index() == 0:
        # one writer: under multi-host only host 0 logs (the JSONL path is
        # on a shared results directory)
        logger = JsonlLogger(os.path.join(output_pth, "logs.jsonl"))
    else:
        logger = NullLogger()
    logger.log_params(flatten_config(cfg))
    if not is_resume:
        logger.log("logs/train/conf_thresh", float(cfg.train.conf_thresh))

    # ---- data / model / step ----------------------------------------------
    train_ds = SELDDataset(cfg, "train")
    valid_ds = SELDDataset(cfg, "val", is_valid=True)
    test_ds = SELDDataset(cfg, "test", is_valid=True)
    train_loader = TrainLoader(train_ds, cfg, rank=jax.process_index(),
                               num_shards=jax.process_count())
    valid_loader = EvalLoader(valid_ds, cfg)
    test_loader = EvalLoader(test_ds, cfg)

    frontend = make_frontend(cfg)
    model = build_model(cfg)  # training compute dtype (cfg.train.compute_dtype)
    eval_model = build_model(cfg, compute_dtype="float32")  # eval parity
    criterion = make_criterion(cfg)
    mesh = make_mesh(cfg.mesh, batch_size=cfg.train.batch_size)
    train_step = build_train_step(cfg, model, frontend, mesh)
    place_batch = make_batch_placer(cfg, mesh)
    eval_fwd = build_eval_forward(cfg, eval_model, frontend)
    eval_crit = build_eval_criterion(cfg, criterion)
    postprocessor = PostProcessor(cfg)

    state = init_state(cfg, model, frontend, jax.random.PRNGKey(cfg.args.seed))

    val_ref = os.path.join(cfg.data.data_pth, "metadata_dev", "dev-val")
    test_ref = os.path.join(cfg.data.data_pth, "metadata_dev", "dev-test")
    frames_1s = int(cfg.data.sr / cfg.data.label_hop_len)
    val_scorer = SegmentScorer(val_ref, nb_classes=cfg.data.nb_classes,
                               nb_label_frames_1s=frames_1s)
    test_scorer = SegmentScorer(test_ref, nb_classes=cfg.data.nb_classes,
                                nb_label_frames_1s=frames_1s)

    # ---- resume restore (train.py:145-159) --------------------------------
    if is_resume:
        state, host = load_checkpoint(os.path.join(output_pth, "model_ckpt.ckpt"), state)
        train_ds.sampler.set_remaining(host["train_remaining_file"])
        # reference resume restores the BEST conf-thresh (train.py:151),
        # not the rolling one
        postprocessor.set_conf_thresh(host["best_log"]["best_conf_thresh"])
        cfg = with_conf_thresh(cfg, host["best_log"]["best_conf_thresh"])
        start_epoch = host["start_epoch_nb"]
        best_log = host["best_log"]
        key = set_rng_state(host["rng_state"])
    else:
        start_epoch = 1
        best_log = {"best_epoch": -1, "best_val_SELD": 9999.0,
                    "best_conf_thresh": float(cfg.train.conf_thresh)}

    last_epoch = 3 if cfg.args.quick_test else cfg.train.nb_epochs

    # ---- epoch loop --------------------------------------------------------
    guard = _PreemptionGuard()
    guard.__enter__()
    try:
        preempted = _run_epochs(
            cfg, guard, start_epoch, last_epoch, train_loader, train_step,
            state_box := [state], key_box := [key], place_batch, train_ds,
            valid_loader, test_loader, eval_fwd, criterion, postprocessor,
            val_scorer, test_scorer, best_log_box := [best_log],
            output_pth, logger, eval_crit)
    finally:
        guard.__exit__()
    if preempted:
        logger.stop()
        return cfg

    print("\n===== TRAINING ENDED; FINAL TEST WITH BEST CHECKPOINT =====\n")
    test_model({"action": "test", "eval_pth": cfg.args.exp_id}, results_dir=results_dir)
    logger.stop()
    return cfg


def _run_epochs(cfg, guard, start_epoch, last_epoch, train_loader, train_step,
                state_box, key_box, place_batch, train_ds, valid_loader,
                test_loader, eval_fwd, criterion, postprocessor, val_scorer,
                test_scorer, best_log_box, output_pth, logger, eval_crit=None):
    """Epoch loop body; returns True when preempted.  State/key/best_log
    travel in single-element lists so the caller sees final values.

    Multi-host: every process runs the loop (the train step's collectives
    need all of them, and eval scores feed per-host control flow), but
    canonical artifacts — checkpoints, the frozen config — are written by
    process 0 only, and per-clip CSV dirs get a ``.r<rank>`` suffix on the
    other hosts so shared-FS writes never collide."""
    state = state_box[0]
    key = key_box[0]
    best_log = best_log_box[0]
    rank = jax.process_index()

    def rank_dir(name: str) -> str:
        return name if rank == 0 else f"{name}.r{rank}"

    for epoch in range(start_epoch, last_epoch + 1):
        print(f"\nnow training {epoch:03d}/{last_epoch:03d} epoch...", flush=True)
        t0 = time.time()
        state, key, train_loss = train_one_epoch(
            train_loader, train_step, state, key, place_batch, cfg.args.quick_test,
            guard)
        train_time = (time.time() - t0) / 60.0
        # should_stop() (not the raw flag): a signal landing between the
        # last in-epoch check and here must be agreed on by every host or
        # the survivors deadlock in the next epoch's collectives
        if guard.should_stop():
            # preemption: persist a resumable checkpoint for THIS epoch
            if rank == 0:
                save_checkpoint(
                    os.path.join(output_pth, "model_ckpt.ckpt"), state,
                    {"start_epoch_nb": epoch,
                     "confidence_thresh": float(postprocessor.get_conf_thresh()),
                     "rng_state": get_rng_state(key),
                     "best_log": best_log,
                     "train_remaining_file": train_ds.sampler.get_remaining()},
                )
            print(f"[adyolo_tpu] preempted during epoch {epoch}; checkpoint "
                  f"saved — resume with --resume_pth {cfg.args.exp_id}")
            state_box[0] = state
            key_box[0] = key
            best_log_box[0] = best_log
            return True
        train_ds.resample_epoch()

        # dynamic conf-threshold arbitration (train.py:178-206) — the model
        # forward runs ONCE; the 9 τ candidates differ only in host decode
        if not cfg.args.fix_thresh and epoch % 10 == 0:
            print("resetting confidence threshold per each 10th epoch:")
            best_tau_seld, new_thresh = 9999.0, postprocessor.get_conf_thresh()
            cached = cached_eval_outputs(valid_loader, state, eval_fwd, postprocessor)
            for tau in np.arange(0.1, 1.0, 0.1):
                postprocessor.set_conf_thresh(float(tau))
                decode_cached_to_csv(cached, postprocessor,
                                     os.path.join(output_pth, rank_dir("output_val")))
                scores = val_scorer.get_SELD_Results(os.path.join(output_pth, rank_dir("output_val")))
                print(f"\tconf_thresh {tau:0.1f} - ER {scores[0]:0.4f}, "
                      f"F {scores[1] * 100:0.2f}, LE {scores[2]:0.2f}, "
                      f"LR {scores[3] * 100:0.2f}, SELD {scores[4]:0.4f}")
                if scores[4] < best_tau_seld:
                    best_tau_seld, new_thresh = scores[4], float(tau)
            print(f"confidence threshold -> {new_thresh}")
            postprocessor.set_conf_thresh(new_thresh)
            cfg = with_conf_thresh(cfg, new_thresh)
            if rank == 0:
                save_config(cfg, os.path.join(output_pth, "hyp_exp.yaml"))
            logger.log("logs/train/conf_thresh", new_thresh, epoch)

        # val / test phase (train.py:209-219)
        t0 = time.time()
        val_loss = test_epoch(valid_loader, state, eval_fwd, criterion, postprocessor,
                              os.path.join(output_pth, rank_dir("output_val")),
                              eval_crit=eval_crit)
        val_time = (time.time() - t0) / 60.0
        t0 = time.time()
        test_loss = test_epoch(test_loader, state, eval_fwd, criterion, postprocessor,
                               os.path.join(output_pth, rank_dir("output_test")),
                               eval_crit=eval_crit)
        test_time = (time.time() - t0) / 60.0

        val_s = val_scorer.get_SELD_Results(os.path.join(output_pth, rank_dir("output_val")))
        test_s = test_scorer.get_SELD_Results(os.path.join(output_pth, rank_dir("output_test")))

        # best tracking (train.py:222-238)
        if val_s[4] <= best_log["best_val_SELD"]:
            best_log = {
                "best_epoch": epoch,
                "best_val_loss": val_loss,
                "best_val_ER": val_s[0], "best_val_F": val_s[1],
                "best_val_LE": val_s[2], "best_val_LR": val_s[3],
                "best_val_SELD": val_s[4],
                "best_test_loss": test_loss,
                "best_test_ER": test_s[0], "best_test_F": test_s[1],
                "best_test_LE": test_s[2], "best_test_LR": test_s[3],
                "best_test_SELD": test_s[4],
                "best_conf_thresh": float(postprocessor.get_conf_thresh()),
            }
            if rank == 0:
                save_checkpoint(
                    os.path.join(output_pth, "model_best.ckpt"), state,
                    {"epoch_nb": epoch,
                     "confidence_thresh": best_log["best_conf_thresh"]},
                )

        # rolling checkpoint (train.py:241-248)
        if rank == 0:
            save_checkpoint(
                os.path.join(output_pth, "model_ckpt.ckpt"), state,
                {"start_epoch_nb": epoch + 1,
                 "confidence_thresh": float(postprocessor.get_conf_thresh()),
                 "rng_state": get_rng_state(key),
                 "best_log": best_log,
                 "train_remaining_file": train_ds.sampler.get_remaining()},
            )

        # console report (train.py:251-261)
        print(f"{epoch:03d} epoch result... (conf_thresh: "
              f"{postprocessor.get_conf_thresh():0.2f})")
        print(f"train/valid/test time: {train_time:0.2f}/{val_time:0.2f}/"
              f"{test_time:0.2f} min, loss: {train_loss:0.4f}/{val_loss:0.4f}/{test_loss:0.4f}")
        print(f"valid score: ER: {val_s[0]:0.4f}, F: {val_s[1] * 100:0.2f}, "
              f"LE: {val_s[2]:0.2f}, LR: {val_s[3] * 100:0.2f}, SELD: {val_s[4]:0.4f}")
        print(f" test score: ER: {test_s[0]:0.4f}, F: {test_s[1] * 100:0.2f}, "
              f"LE: {test_s[2]:0.2f}, LR: {test_s[3] * 100:0.2f}, SELD: {test_s[4]:0.4f}")
        print(f"\tbest epoch: {best_log['best_epoch']:03d} "
              f"(conf_thresh {best_log['best_conf_thresh']:0.2f}, "
              f"val SELD {best_log['best_val_SELD']:0.4f})")

        for split, loss_v, s in (("train", train_loss, None),
                                 ("val", val_loss, val_s), ("test", test_loss, test_s)):
            logger.log(f"logs/{split}/loss", loss_v, epoch)
            if s is not None:
                for nm, v in zip(("ER", "F1", "LE", "LR", "SELD"),
                                 (s[0], s[1] * 100, s[2], s[3] * 100, s[4])):
                    logger.log(f"logs/{split}/{nm}", float(v), epoch)

    state_box[0] = state
    key_box[0] = key
    best_log_box[0] = best_log
    return False

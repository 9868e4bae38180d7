"""Evaluation / inference engine (reference ``src/test.py``).

``test_epoch``: per-clip no-grad forward (bucketed static shapes), loss
accumulation, DOA decode + NMS, one DCASE-format CSV per clip
(test.py:33-60).  ``test_model``: reconstitute the frozen experiment
config, load the best checkpoint, restore the arbitrated confidence
threshold, sweep unify thresholds {15, 30, 45} for adpit/adyolo, print
overall + classwise scores and both polyphony-restricted re-scorings
(test.py:63-140).  ``infer``: label-free wav-folder inference
(test.py:142-149 — implemented as *intended*; the reference's infer
branch passes an ``is_infer`` kwarg its own ``test_epoch`` lacks).
"""
from __future__ import annotations

import os
import shutil
import time
from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from ..config import Config, load_config
from ..data.dataset import EvalLoader, SELDDataset
from ..data.io import write_seld_output_csv
from ..metrics.seld import SegmentScorer
from ..models.wrapper import build_model, make_criterion
from ..ops.decode import PostProcessor
from ..ops.features import FeatureFrontend, Scaler, identity_scaler
from ..parallel.train_step import (TrainState, build_eval_forward,
                                   build_eval_criterion, init_state)
from .checkpoint import load_checkpoint

__all__ = ["test_epoch", "test_model", "make_frontend", "delete_and_create_folder"]


def delete_and_create_folder(path: str) -> None:
    if os.path.isdir(path):
        shutil.rmtree(path)
    os.makedirs(path, exist_ok=True)


def make_frontend(cfg: Config) -> FeatureFrontend:
    """Frontend with the dataset's scaler stats (``scaler_wts.pkl``,
    src/datasets.py:206-207); identity stats with a warning when absent
    (synthetic / test setups)."""
    pkl = os.path.join(cfg.data.data_pth, "scaler_wts.pkl")
    if os.path.isfile(pkl):
        scaler = Scaler.from_pickle(pkl)
    else:
        import sys

        print(f"[adyolo_tpu] WARNING: no scaler stats at {pkl}; "
              "using identity normalization (run `preprocess scaler`).",
              file=sys.stderr)
        scaler = identity_scaler(cfg.data.mel_bins,
                                 n_aux_ch=cfg.data.nb_feature_channels - 4)
    return FeatureFrontend(cfg.data, scaler)


def test_epoch(
    loader: EvalLoader,
    state: TrainState,
    eval_fwd: Callable,
    criterion: Optional[Callable],
    postprocessor: PostProcessor,
    output_pth: str,
    eval_crit: Optional[Callable] = None,
) -> float:
    """Forward + decode + CSV per clip; returns mean loss (test.py:33-60).

    With ``eval_crit`` (``build_eval_criterion``) the criterion runs as a
    jitted frame-masked device program on the forward's output; the eager
    valid-slice criterion path remains as the fallback (and the oracle
    the masked value is tested against)."""
    delete_and_create_folder(output_pth)
    total_loss, n = 0.0, 0
    for item in loader:
        t_valid = item["nb_label_frames"]
        out = eval_fwd(state.params, state.batch_stats,
                       jnp.asarray(item["audio"]),
                       jnp.asarray(item["valid_feat_frames"]))
        if criterion is not None and "targets" in item:
            if eval_crit is not None:
                tmask = (jnp.asarray(item["target_mask"])
                         if "target_mask" in item else jnp.zeros((1,), bool))
                loss = eval_crit(out, jnp.asarray(item["targets"]), tmask,
                                 jnp.asarray([t_valid], jnp.int32))
            elif "target_mask" in item:
                trimmed = out[:, :t_valid]  # device slice; eager criterion
                loss = criterion(trimmed, jnp.asarray(item["targets"]),
                                 jnp.asarray(item["target_mask"]))
            else:
                trimmed = out[:, :t_valid]
                loss = criterion(trimmed,
                                 jnp.asarray(item["targets"][:, :t_valid]), None)
            total_loss += float(loss)
            n += 1
        # the output stays ON DEVICE: the adyolo decode runs there and only
        # the compact candidate set crosses to the host (the full logits
        # are ~8 MB/clip; dense formats are small and convert internally)
        dets = postprocessor.postprocess(out, valid_label_frames=t_valid)
        write_seld_output_csv(os.path.join(output_pth, item["name"] + ".csv"), dets)
    return total_loss / max(n, 1)


def cached_eval_outputs(loader, state: TrainState, eval_fwd: Callable,
                        postprocessor: PostProcessor):
    """Forward every clip ONCE and return decode-ready caches
    ``[(name, cache, nb_label_frames)]`` for re-decoding under many
    thresholds.  The τ-arbitration scans 9 thresholds (train.py:178-206);
    re-running the model forward 9x is pure waste — only the host decode
    depends on τ."""
    items = []
    for item in loader:
        out = eval_fwd(state.params, state.batch_stats,
                       jnp.asarray(item["audio"]),
                       jnp.asarray(item["valid_feat_frames"]))
        items.append((item["name"], postprocessor.candidates(out),
                      item["nb_label_frames"]))
    return items


def decode_cached_to_csv(cached_items, postprocessor: PostProcessor,
                         output_pth: str) -> None:
    """Host decode + CSV emit from cached outputs (same artifacts as
    :func:`test_epoch`, minus the forward and the loss)."""
    delete_and_create_folder(output_pth)
    for name, cache, t_valid in cached_items:
        dets = postprocessor.postprocess_cached(cache, valid_label_frames=t_valid)
        write_seld_output_csv(os.path.join(output_pth, name + ".csv"), dets)


def _print_scores(tag: str, scores) -> None:
    ER, F, LE, LR, SELD = scores[:5]
    print(f"    {tag}ER: {ER:0.4f}, F: {F * 100:0.2f}, LE: {LE:0.2f}, "
          f"LR: {LR * 100:0.2f}, SELD: {SELD:0.4f}")


def test_model(cfg_args: Dict, results_dir: str = "results") -> Dict:
    """Full evaluation of a saved experiment (test.py:63-151).

    cfg_args: {'action': 'val'|'test'|'infer', 'eval_pth': <exp_id>,
               'infer_pth': optional}.
    Returns the last computed overall scores dict (for programmatic use).
    """
    action = cfg_args["action"]
    assert action in ("val", "test", "infer"), f"unknown action: {action}"
    exp_id = cfg_args.get("eval_pth")
    if exp_id is None:
        raise SystemExit("error: --eval_pth <exp_id> is required for val/test/infer "
                         "(the experiment directory under results/)")
    output_pth = os.path.join(results_dir, exp_id)
    cfg = load_config(os.path.join(output_pth, "hyp_exp.yaml"))
    if cfg_args.get("infer_pth"):
        import dataclasses

        cfg = dataclasses.replace(
            cfg, args=dataclasses.replace(cfg.args, infer_pth=cfg_args["infer_pth"]))

    dataset = SELDDataset(cfg, action, is_valid=True)
    loader = EvalLoader(dataset, cfg)
    frontend = make_frontend(cfg)
    model = build_model(cfg, compute_dtype="float32")  # eval always f32
    import jax

    template = init_state(cfg, model, frontend, jax.random.PRNGKey(0))
    state, host = load_checkpoint(os.path.join(output_pth, "model_best.ckpt"), template)
    postprocessor = PostProcessor(cfg)
    postprocessor.set_conf_thresh(host["confidence_thresh"])
    eval_fwd = build_eval_forward(cfg, model, frontend)
    criterion = make_criterion(cfg)
    eval_crit = build_eval_criterion(cfg, criterion)

    results: Dict = {}
    if action in ("val", "test"):
        sweep = [15.0, 30.0, 45.0] if cfg.args.loss in ("adpit", "adyolo") else [None]
        for unify in sweep:
            if unify is not None:
                postprocessor.unify_thresh = unify
                print(f"\n===== EVALUATING '{exp_id}' ON {cfg.args.dataset} "
                      f"{action}, unify threshold {unify} deg =====")
            else:
                print(f"\n===== EVALUATING '{exp_id}' ON {cfg.args.dataset} {action} =====")

            t0 = time.time()
            loss = test_epoch(loader, state, eval_fwd, criterion, postprocessor,
                              os.path.join(output_pth, "output_eval"),
                              eval_crit=eval_crit)
            print(f"eval time: {(time.time() - t0) / 60:0.2f} min, loss: {loss:0.4f}")

            ref_dir = os.path.join(cfg.data.data_pth, "metadata_dev", f"dev-{action}")
            frames_1s = int(cfg.data.sr / cfg.data.label_hop_len)
            scorer = SegmentScorer(ref_dir, nb_classes=cfg.data.nb_classes,
                                   nb_label_frames_1s=frames_1s)
            ER, F, LE, LR, SELD, classwise = scorer.get_SELD_Results(
                os.path.join(output_pth, "output_eval"))
            _print_scores("", (ER, F, LE, LR, SELD))
            results = {"ER": ER, "F": F, "LE": LE, "LR": LR, "SELD": SELD,
                       "loss": loss, "unify": unify}

            print("\nClasswise results")
            print("Class\tER\tF\tLE\tLR\tSELD")
            names = []
            if os.path.isfile(cfg.data.name_pth):
                with open(cfg.data.name_pth) as f:
                    names = [l.strip() for l in f if l.strip()]
            for c in range(cfg.data.nb_classes):
                nm = names[c] if c < len(names) else ""
                print(f"{c}\t{classwise[0][c]:0.4f}\t{classwise[1][c] * 100:0.2f}\t"
                      f"{classwise[2][c]:0.2f}\t{classwise[3][c] * 100:0.2f}\t"
                      f"{classwise[4][c]:0.4f}\t{nm}")

            print("\nevaluation on class-independent polyphony:")
            ov = SegmentScorer(ref_dir, nb_classes=cfg.data.nb_classes,
                               nb_label_frames_1s=frames_1s, overlap="any")
            _print_scores("", ov.get_SELD_Results(os.path.join(output_pth, "output_eval")))
            print("evaluation on class-homogenous polyphony:")
            ov = SegmentScorer(ref_dir, nb_classes=cfg.data.nb_classes,
                               nb_label_frames_1s=frames_1s, overlap="classwise")
            _print_scores("", ov.get_SELD_Results(os.path.join(output_pth, "output_eval")))
    else:
        print(f"\n===== INFERENCE ON WAVS UNDER: {cfg.args.infer_pth} =====")
        t0 = time.time()
        test_epoch(loader, state, eval_fwd, None, postprocessor,
                   os.path.join(output_pth, "output_infer"))
        print(f"total inference time: {(time.time() - t0) / 60:0.2f} min")

    print("\nTEST DONE.")
    return results

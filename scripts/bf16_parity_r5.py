"""bf16-vs-f32 serving SELD parity on a NON-degenerate model (VERDICT r4 #5).

The r4 evidence (benchlogs/bf16_serving_parity_r4.log) compared the dtypes
on a checkpoint whose operating point was F=0.00 / LR 3.16 — a model that
detects almost nothing is the easiest possible parity case.  This script
re-runs the comparison on the converted-weight golden model from
tests/test_e2e_parity.py (reference torch SE-ResNet34 + AD-YOLO head
weights mapped into flax), which produces dense detections (>10 asserted;
hundreds in practice at conf 0.4) on the synthetic val set.

Both sides run the full eval protocol (test_epoch -> CSV -> SegmentScorer):
  * float32: the judged serving dtype (export default);
  * bfloat16: build_model(compute_dtype="bfloat16") — the same construction
    `cli export --serve_dtype bfloat16` traces.

Run on the TPU from bash:  timeout 1800 python scripts/bf16_parity_r5.py
(add --cpu to force the CPU backend for a tunnel-free rerun).
"""
from __future__ import annotations

import dataclasses
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    force_cpu = "--cpu" in sys.argv[1:]
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import torch

    from tests.ref_compat import load_reference
    from tests.synth_data import make_synth_dataset

    load_reference()
    from models.backbones.resnet import SEResnet34 as RefSEResnet34  # noqa: E402
    from models.linearheads import ADYOLOhead as RefADYOLOHead  # noqa: E402

    from adyolo_tpu.config import build_config
    from adyolo_tpu.data.dataset import EvalLoader, SELDDataset
    from adyolo_tpu.engine.evaluate import make_frontend, test_epoch
    from adyolo_tpu.metrics.seld import SegmentScorer
    from adyolo_tpu.models.wrapper import build_model, make_criterion
    from adyolo_tpu.ops.decode import PostProcessor
    from adyolo_tpu.parallel.train_step import build_eval_forward, init_state
    from adyolo_tpu.utils.cache import enable_compilation_cache

    from tests.test_golden_parity import head_torch_to_flax, seresnet_torch_to_flax

    enable_compilation_cache()
    K = 13
    tmp = tempfile.mkdtemp(prefix="bf16par_")
    root = make_synth_dataset(os.path.join(tmp, "data"), n_train=2, n_val=2,
                              n_test=1, chunk_window_s=4, eval_secs=6)

    torch.manual_seed(0)
    enc = RefSEResnet34((1, 7, 32, 64), (), {"data_config": {"nb_classes": K}})
    head = RefADYOLOHead(256, 256, K, [45, 45], 5)
    enc.eval(), head.eval()
    variables = seresnet_torch_to_flax(enc)
    head_vars = head_torch_to_flax(
        head, [("yolo_head.0", "yolo_fc1"), ("yolo_head.1", "yolo_fc2")])
    flax_vars = {
        "params": {"encoder": variables["params"], "head": head_vars["params"]},
        "batch_stats": {"encoder": variables["batch_stats"]},
    }

    cfg = build_config(
        {"dataset": "DCASE2022", "encoder": "se-resnet34", "loss": "adyolo",
         "seed": 0, "exp_id": "bf16par", "action": "val"},
        data_overrides={"data_pth": root,
                        "name_pth": os.path.join(root, "classes.txt"),
                        "chunk_window_s": 4})
    dataset = SELDDataset(cfg, "val", is_valid=True)
    loader = EvalLoader(dataset, cfg)
    frontend = make_frontend(cfg)
    criterion = make_criterion(cfg)

    ref_dir = os.path.join(cfg.data.data_pth, "metadata_dev", "dev-val")
    frames_1s = int(cfg.data.sr / cfg.data.label_hop_len)
    scorer = SegmentScorer(ref_dir, nb_classes=K,
                           nb_label_frames_1s=frames_1s)

    rows = {}
    scores = {}
    for dtype in ("float32", "bfloat16"):
        model = build_model(cfg, compute_dtype=dtype)
        template = init_state(cfg, model, frontend, jax.random.PRNGKey(0))
        state = template._replace(params=flax_vars["params"],
                                  batch_stats=flax_vars["batch_stats"])
        pp = PostProcessor(cfg)
        pp.set_conf_thresh(0.4)
        eval_fwd = build_eval_forward(cfg, model, frontend)
        out_dir = os.path.join(tmp, f"out_{dtype}")
        test_epoch(loader, state, eval_fwd, criterion, pp, out_dir)
        n_rows = 0
        for f in os.listdir(out_dir):
            with open(os.path.join(out_dir, f)) as fh:
                n_rows += sum(1 for _ in fh)
        rows[dtype] = n_rows
        ER, F, LE, LR, SELD, _ = scorer.get_SELD_Results(out_dir)
        scores[dtype] = (ER, F, LE, LR, SELD)
        print(f"{dtype:9s}: ER {ER:0.4f}  F {F * 100:0.2f}  LE {LE:0.2f}  "
              f"LR {LR * 100:0.2f}  SELD {SELD:0.4f}  "
              f"({n_rows} detection rows)", flush=True)

    assert rows["float32"] > 10, f"degenerate: {rows['float32']} rows"
    d = [abs(a - b) for a, b in zip(scores["float32"], scores["bfloat16"])]
    print("deltas   : " + " ".join(f"{x:+0.4f}" for x in d), flush=True)
    seld_delta = d[4]
    verdict = "PASS" if seld_delta < 1e-3 else "FAIL"
    print(f"{verdict}: |SELD(f32) - SELD(bf16)| = {seld_delta:0.6f} "
          f"on {rows['float32']}-detection golden model "
          f"(backend={jax.default_backend()})", flush=True)
    print("PARITY_EVAL_DONE", flush=True)
    return 0 if verdict == "PASS" else 1


if __name__ == "__main__":
    sys.exit(main())

"""Command-line entry point (reference ``src/main.py`` + ``src/preprocess.py``).

Usage:
    python -m adyolo_tpu.cli train  --dataset DCASE2022 --encoder se-resnet34 --loss adyolo
    python -m adyolo_tpu.cli val    --eval_pth <exp_id>
    python -m adyolo_tpu.cli test   --eval_pth <exp_id>
    python -m adyolo_tpu.cli infer  --eval_pth <exp_id> --infer_pth <wav_dir>
    python -m adyolo_tpu.cli preprocess chunking --dataset all
    python -m adyolo_tpu.cli preprocess scaler   --dataset all
"""
from __future__ import annotations

import argparse
import sys


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="adyolo_tpu")
    sub = p.add_subparsers(dest="action", required=True)

    def add_common(sp):
        sp.add_argument("--dataset", type=str, default="DCASE2022",
                        choices=["DCASE2020", "DCASE2021", "DCASE2022"])
        sp.add_argument("--encoder", type=str, default="se-resnet34",
                        choices=["se-resnet34", "resnet-conformer"])
        sp.add_argument("--loss", type=str, default="adyolo",
                        choices=["seddoa", "masked-seddoa", "accdoa", "adpit", "adyolo"])
        sp.add_argument("--seed", type=int, default=100)
        sp.add_argument("--augment", action="store_true")
        sp.add_argument("--fix_thresh", action="store_true")
        sp.add_argument("--logger", action="store_true")
        sp.add_argument("--quick_test", action="store_true")
        sp.add_argument("--eval_pth", type=str, default=None)
        sp.add_argument("--resume_pth", type=str, default=None)
        sp.add_argument("--infer_pth", type=str, default=None)
        sp.add_argument("--results_dir", type=str, default="results")
        sp.add_argument("--config_dir", type=str, default=None,
                        help="directory of editable hyp_*.yaml presets "
                             "(default: ./configs when present, else "
                             "built-in presets)")
        sp.add_argument("--exp_id", type=str, default=None,
                        help="experiment id (default: local-<timestamp>)")
        sp.add_argument("--debug_nans", action="store_true",
                        help="enable jax_debug_nans (the TPU analog of the "
                             "reference's torch.autograd.set_detect_anomaly)")
        # train-config overrides (merged by config_reader semantics)
        sp.add_argument("--batch_size", type=int, default=None)
        sp.add_argument("--nb_epochs", type=int, default=None)
        sp.add_argument("--nb_iters", type=int, default=None)
        sp.add_argument("--lr", type=float, default=None)
        sp.add_argument("--optim", type=str, default=None)
        sp.add_argument("--nms", type=str, default=None)
        sp.add_argument("--compute_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="train-step conv/matmul dtype (bfloat16 is "
                             "~1.7x faster on TPU; eval always runs f32)")
        sp.add_argument("--remat", action="store_const", const=True,
                        default=None,
                        help="jax.checkpoint the conformer blocks (less "
                             "activation memory, ~1/3 more FLOPs)")
        sp.add_argument("--model_parallel", type=int, default=None,
                        help="mesh size along the model axis (tensor "
                             "parallelism of the conformer FFN/MHSA; "
                             "devices = data_parallel x model_parallel)")
        sp.add_argument("--serve_dtype", type=str, default=None,
                        choices=["float32", "bfloat16"],
                        help="export: encoder compute dtype of the AOT "
                             "serving artifact (params stay f32; default "
                             "ADYOLO_SERVE_DTYPE or float32)")

    for action in ("train", "val", "test", "infer", "export"):
        sp = sub.add_parser(action)
        add_common(sp)

    pp = sub.add_parser("preprocess")
    pp.add_argument("task", choices=["chunking", "scaler"])
    pp.add_argument("--dataset", type=str, required=True,
                    choices=["DCASE2020", "DCASE2021", "DCASE2022", "all"])
    pp.add_argument("--config_dir", type=str, default=None,
                    help="same preset directory the train action uses, so "
                         "preprocessing and training share one data config")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)

    from .utils.cache import enable_compilation_cache

    enable_compilation_cache()

    if getattr(args, "debug_nans", False):
        import jax

        jax.config.update("jax_debug_nans", True)

    if args.action == "preprocess":
        from .config import build_config
        from .data.chunking import preprocess_chunking
        from .data.scaler import preprocess_scaler

        datasets = (["DCASE2020", "DCASE2021", "DCASE2022"]
                    if args.dataset == "all" else [args.dataset])
        for ds in datasets:
            # resolve through the same three-tier merge train uses so an
            # edited hyp_data_*.yaml (mel bins, audio format, paths) feeds
            # identical geometry into preprocessing and training
            dcfg = build_config({"dataset": ds,
                                 "config_dir": args.config_dir}).data
            if args.task == "chunking":
                n = preprocess_chunking(dcfg)
                print(f"{ds}: wrote {n} chunks")
            else:
                out = preprocess_scaler(dcfg)
                print(f"{ds}: wrote {out}")
        return 0

    arg_dict = vars(args)
    if args.action == "train":
        from .engine.train import train_model

        train_model(arg_dict, is_resume=args.resume_pth is not None)
    elif args.action == "export":
        from .engine.export import export_cmd

        export_cmd(arg_dict, results_dir=args.results_dir)
    else:
        from .engine.evaluate import test_model

        test_model(arg_dict, results_dir=args.results_dir)
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""End-to-end engine tests on synthetic data (CPU, small shapes)."""
import os

import numpy as np
import pytest

from adyolo_tpu.engine.train import train_model
from adyolo_tpu.data.dataset import EpochPoolSampler, bucket_samples

from tests.synth_data import make_synth_dataset


def test_epoch_pool_sampler_semantics():
    import random

    random.seed(0)
    total = [f"f{i}" for i in range(10)]
    s = EpochPoolSampler(total, nb_samples=4)
    e1 = s.sample_epoch()
    assert len(e1) == 4 and len(s.get_remaining()) == 6
    e2 = s.sample_epoch()
    assert set(e1).isdisjoint(e2)  # no replacement across epochs
    e3 = s.sample_epoch()  # pool exhausted mid-way: wraps, keeps the rest
    assert len(e3) == 4
    assert set(e2).isdisjoint(set(e3) - set(total))  # sanity
    # serialization round trip
    rem = s.get_remaining()
    s2 = EpochPoolSampler(total, 4)
    s2.set_remaining(rem)
    assert s2.get_remaining() == rem


def test_bucket_samples():
    assert bucket_samples(24000 * 20, 600, (800, 1200, 2400)) == 800 * 600
    assert bucket_samples(24000 * 25, 600, (800, 1200, 2400)) == 1200 * 600
    assert bucket_samples(24000 * 200, 600, (800, 1200, 2400)) == 9600 * 600  # overflow rounds up


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synthdata")
    return make_synth_dataset(str(root))


def test_parallel_loader_bit_identical(synth_root):
    """num_workers > 1 fans clip load/encode across a thread pool; batches
    and the host RNG stream must be bit-identical to the sequential
    loader (rotation indices are pre-drawn in batch order)."""
    import dataclasses
    import random

    from adyolo_tpu.config import Config
    from adyolo_tpu.data.dataset import SELDDataset, TrainLoader

    def run(num_workers):
        random.seed(1234)
        cfg = Config()
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(cfg.data, data_pth=synth_root),
            aug=dataclasses.replace(cfg.aug, rotation_augment=True),
            train=dataclasses.replace(cfg.train, batch_size=4, nb_iters=2,
                                      num_workers=num_workers))
        ds = SELDDataset(cfg, "train")
        batches = list(TrainLoader(ds, cfg))
        return batches, random.getstate()

    seq, rng_seq = run(1)
    par, rng_par = run(4)
    assert rng_seq == rng_par  # same host RNG consumption
    assert len(seq) == len(par) == 2
    for bs, bp in zip(seq, par):
        assert bs.keys() == bp.keys()
        for k in bs:
            np.testing.assert_array_equal(bs[k], bp[k], err_msg=k)


def test_loader_early_exit_reaps_threads(synth_root):
    """Abandoning the epoch iterator early (quick_test break, preemption)
    must terminate the prefetch worker and its clip pool — a worker
    blocked on a full queue after the consumer leaves would leak a thread
    + ThreadPoolExecutor per epoch."""
    import dataclasses
    import threading
    import time

    from adyolo_tpu.config import Config
    from adyolo_tpu.data.dataset import SELDDataset, TrainLoader

    cfg = Config()
    cfg = dataclasses.replace(
        cfg,
        data=dataclasses.replace(cfg.data, data_pth=synth_root),
        train=dataclasses.replace(cfg.train, batch_size=2, nb_iters=3,
                                  num_workers=4, prefetch_factor=2))
    ds = SELDDataset(cfg, "train")
    it = iter(TrainLoader(ds, cfg))
    next(it)
    it.close()  # generator finally: cancelled.set() + pool.shutdown

    def live():
        return [t.name for t in threading.enumerate()
                if "clip-loader" in t.name and t.is_alive()]

    deadline = time.time() + 10
    while time.time() < deadline and live():
        time.sleep(0.2)
    assert not live(), live()


def test_broadcast_str_truncates_at_codepoint(monkeypatch):
    """exp_id longer than the broadcast width is truncated at a utf-8
    codepoint boundary with a warning, not a multi-host startup crash."""
    import jax
    from jax.experimental import multihost_utils

    from adyolo_tpu.engine import train as T

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(multihost_utils, "broadcast_one_to_all", lambda b: b)
    s = "exp-" + "é" * 100  # 4 + 200 utf-8 bytes
    out = T._broadcast_str(s)
    assert len(out.encode("utf-8")) <= 128
    assert s.startswith(out) and out  # clean prefix, no mangled codepoint
    assert T._broadcast_str("short-id") == "short-id"


def _train_args(root, results_dir, **kw):
    args = {
        "action": "train", "dataset": "DCASE2022", "encoder": "se-resnet34",
        "loss": "adyolo", "seed": 100, "augment": True, "fix_thresh": False,
        "logger": True, "quick_test": True, "eval_pth": None, "resume_pth": None,
        "infer_pth": None, "results_dir": results_dir,
        "batch_size": 2, "nb_iters": 2, "exp_id": kw.pop("exp_id", "exp-test"),
    }
    args.update(kw)
    return args


@pytest.mark.slow
def test_quick_train_end_to_end(synth_root, tmp_path):
    """The reference's --quick_test smoke run (SURVEY.md §4), scaled to CPU:
    3 epochs x 2 iters on synthetic data + final test_model sweep."""
    results = str(tmp_path / "results")
    cfg = train_model(
        _train_args(synth_root, results),
        cfg_overrides={"data": {"data_pth": synth_root,
                                "name_pth": os.path.join(synth_root, "classes.txt")},
                       "train": {"max_targets_per_clip": 512}},
    )
    exp = os.path.join(results, "exp-test")
    assert os.path.isfile(os.path.join(exp, "hyp_exp.yaml"))
    assert os.path.isfile(os.path.join(exp, "model_best.ckpt"))
    assert os.path.isfile(os.path.join(exp, "model_ckpt.ckpt"))
    assert os.path.isfile(os.path.join(exp, "logs.jsonl"))
    # eval CSVs were produced for every val/test clip
    assert len(os.listdir(os.path.join(exp, "output_val"))) == 2
    assert len(os.listdir(os.path.join(exp, "output_eval"))) == 2

    # label-free wav-folder inference (the reference's *intended* infer
    # behavior; its own call crashes — SURVEY.md §3.5)
    from adyolo_tpu.engine.evaluate import test_model as run_test_model

    run_test_model({"action": "infer", "eval_pth": "exp-test",
                    "infer_pth": os.path.join(synth_root, "foa_dev", "dev-val")},
                   results_dir=results)
    assert len(os.listdir(os.path.join(exp, "output_infer"))) == 2


@pytest.mark.slow
def test_resume_continues(synth_root, tmp_path):
    """Interrupted run resumes from model_ckpt.ckpt with sampler pool and
    RNG restored (train.py:145-159 semantics)."""
    results = str(tmp_path / "results")
    overrides = {"data": {"data_pth": synth_root,
                          "name_pth": os.path.join(synth_root, "classes.txt")},
                 "train": {"max_targets_per_clip": 512, "nb_epochs": 2}}
    train_model(_train_args(synth_root, results, quick_test=False, exp_id="exp-r",
                            nb_epochs=1), cfg_overrides=overrides)
    # resume for one more epoch
    args = _train_args(synth_root, results, quick_test=False, exp_id="exp-r")
    args["resume_pth"] = "exp-r"
    import yaml

    # bump nb_epochs in the frozen config so resume runs epoch 2
    fp = os.path.join(results, "exp-r", "hyp_exp.yaml")
    with open(fp) as f:
        frozen = yaml.safe_load(f)
    frozen["train"]["nb_epochs"] = 2
    with open(fp, "w") as f:
        yaml.safe_dump(frozen, f, sort_keys=False)
    train_model(args, is_resume=True)
    import pickle

    with open(os.path.join(results, "exp-r", "model_ckpt.ckpt"), "rb") as f:
        host = pickle.load(f)["host"]
    assert host["start_epoch_nb"] == 3


def test_epoch_pool_sampler_small_dataset_guard():
    """nb_samples > len(total) must wrap the pool instead of raising
    (VERDICT r1 weak #8): quick_test on a tiny folder."""
    import random

    random.seed(0)
    total = [f"f{i}" for i in range(3)]
    s = EpochPoolSampler(total, nb_samples=8)
    e = s.sample_epoch()
    assert len(e) == 8
    assert set(e) == set(total)
    # every full wrap covers the whole set before repeating
    assert sorted(e[:3]) == sorted(total) and sorted(e[3:6]) == sorted(total)
    e2 = s.sample_epoch()  # remaining pool stays consistent across epochs
    assert len(e2) == 8 and set(e2) == set(total)

    with pytest.raises(ValueError):
        EpochPoolSampler([], 2).sample_epoch()

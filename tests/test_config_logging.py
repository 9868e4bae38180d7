"""config_dir presets + neptune logger wiring (VERDICT r1 missing #1/#2)."""
import os
import sys
import types

import pytest

from adyolo_tpu.config import build_config
from adyolo_tpu.utils.logging import (DEFAULT_LOGGING_META, JsonlLogger,
                                      get_logging_meta_config, make_logger)


def test_config_dir_overrides_presets(tmp_path):
    """Editing hyp_train.yaml / hyp_data_*.yaml in a config dir must change
    the run config; CLI args still win over file values."""
    cd = tmp_path / "configs"
    cd.mkdir()
    (cd / "hyp_train.yaml").write_text("lr: 0.005\nbatch_size: 8\n")
    (cd / "hyp_data_DCASE2022.yaml").write_text("mel_bins: 128\n")
    cfg = build_config({"dataset": "DCASE2022", "config_dir": str(cd)})
    assert cfg.train.lr == 0.005
    assert cfg.train.batch_size == 8
    assert cfg.data.mel_bins == 128
    assert cfg.data.nb_classes == 13  # preset fields not in the file survive
    # CLI override beats the file (config_reader semantics, utility.py:74-76)
    cfg = build_config({"dataset": "DCASE2022", "config_dir": str(cd),
                        "batch_size": 4})
    assert cfg.train.batch_size == 4
    assert cfg.args.config_dir == str(cd)  # frozen into the config


def test_shipped_configs_match_builtin_defaults():
    """The shipped configs/ presets must agree with the embedded defaults
    (so default runs behave identically with or without the files)."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    shipped = os.path.join(repo, "configs")
    assert os.path.isdir(shipped)
    cfg_file = build_config({"dataset": "DCASE2022", "config_dir": shipped})
    cfg_builtin = build_config({"dataset": "DCASE2022", "config_dir": ""})
    assert cfg_file.train == cfg_builtin.train
    assert cfg_file.data == cfg_builtin.data


def test_frozen_config_preserves_preset_comments(tmp_path):
    """The frozen hyp_exp.yaml carries the preset files' inline comments
    (reference: ruamel round-trip dump, utility.py:84-90) and still
    round-trips to an identical Config."""
    from adyolo_tpu.config import config_from_yaml, config_to_yaml

    cd = tmp_path / "configs"
    cd.mkdir()
    (cd / "hyp_train.yaml").write_text(
        "lr: 0.005   # tuned on dev\nbatch_size: 8\n")
    (cd / "hyp_data_DCASE2022.yaml").write_text(
        "mel_bins: 128  # halved hop\n")
    cfg = build_config({"dataset": "DCASE2022", "config_dir": str(cd)})
    txt = config_to_yaml(cfg)
    assert "lr: 0.005    # tuned on dev" in txt
    assert "mel_bins: 128    # halved hop" in txt
    assert "batch_size: 8\n" in txt  # uncommented fields stay plain
    assert config_from_yaml(txt) == cfg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = build_config({"dataset": "DCASE2022",
                        "config_dir": os.path.join(repo, "configs")})
    txt = config_to_yaml(cfg)
    assert "# 'bfloat16' for ~1.5x faster train steps" in txt
    assert config_from_yaml(txt) == cfg


def test_logging_meta_config(tmp_path):
    meta = get_logging_meta_config(str(tmp_path))  # no file -> defaults
    assert meta == DEFAULT_LOGGING_META
    (tmp_path / "logging_meta_config.yaml").write_text(
        "exp_version: 'v2'\nneptune_project: 'ws/proj'\n"
        "neptune_api_token: 'tok'\n")
    meta = get_logging_meta_config(str(tmp_path))
    assert meta["exp_version"] == "v2"
    assert meta["neptune_project"] == "ws/proj"
    assert meta["location_tag"] == ["local-machine"]  # default key survives


class _FakeRun(dict):
    def __init__(self):
        super().__init__()
        self._sys_id = "AD-42"
        self.stopped = False
        self.logged = []

    def __getitem__(self, k):
        run = self

        class _Chan:
            def log(self, v):
                run.logged.append((k, v))

        return _Chan()

    def __setitem__(self, k, v):
        self.logged.append((k, v))

    def stop(self):
        self.stopped = True


@pytest.fixture
def fake_neptune(monkeypatch):
    mod = types.ModuleType("neptune")
    mod.runs = []

    def init_run(**kw):
        run = _FakeRun()
        run.init_kwargs = kw
        mod.runs.append(run)
        return run

    mod.init_run = init_run
    monkeypatch.setitem(sys.modules, "neptune", mod)
    return mod


def test_logger_flag_reaches_neptune_adapter(fake_neptune):
    """--logger + a configured meta must construct the neptune adapter
    (reference train.py:99-107); the exp id comes from the run sys-id."""
    meta = {"exp_version": "v1", "location_tag": ["tpu"],
            "neptune_project": "ws/proj", "neptune_api_token": "tok"}
    logger = make_logger(True, meta)
    assert logger is not None
    assert logger.sys_id == "AD-42"
    assert fake_neptune.runs[0].init_kwargs["name"] == "v1"
    assert fake_neptune.runs[0].init_kwargs["tags"] == ["tpu"]
    logger.log("logs/train/loss", 1.5)
    logger.log_params({"a": 1})
    logger.stop()
    run = fake_neptune.runs[0]
    assert ("logs/train/loss", 1.5) in run.logged
    assert run.stopped

    # resume path passes with_id (reference train.py:86-91)
    make_logger(True, meta, resume_id="AD-42")
    assert fake_neptune.runs[1].init_kwargs["with_id"] == "AD-42"


def test_logger_without_neptune_config_is_none():
    """Unconfigured meta -> factory declines; caller falls back to JSONL."""
    assert make_logger(True, dict(DEFAULT_LOGGING_META)) is None
    assert make_logger(False, {"neptune_project": "p",
                               "neptune_api_token": "t"}) is None


def test_train_model_uses_neptune_exp_id(fake_neptune, tmp_path, monkeypatch):
    """End-to-end identity wiring: with --logger and a configured meta,
    train_model derives exp_id from the neptune sys-id (train.py:104-107).
    Interrupted before data loading — only the identity phase is under test."""
    cd = tmp_path / "configs"
    cd.mkdir()
    (cd / "logging_meta_config.yaml").write_text(
        "neptune_project: 'ws/proj'\nneptune_api_token: 'tok'\n")

    from adyolo_tpu.engine import train as train_mod

    class _Abort(Exception):
        pass

    monkeypatch.setattr(train_mod, "SELDDataset",
                        lambda *a, **k: (_ for _ in ()).throw(_Abort()))
    args = {"action": "train", "dataset": "DCASE2022", "encoder": "se-resnet34",
            "loss": "adyolo", "seed": 1, "logger": True,
            "config_dir": str(cd), "results_dir": str(tmp_path / "results")}
    with pytest.raises(_Abort):
        train_mod.train_model(args)
    exp_dir = tmp_path / "results" / "AD-42"
    assert exp_dir.is_dir()  # exp id == fake neptune sys-id
    frozen = (exp_dir / "hyp_exp.yaml").read_text()
    assert "AD-42" in frozen and "ws/proj" in frozen  # meta frozen for resume
    import yaml as _yaml

    frozen_meta = _yaml.safe_load(frozen)["args"]["logging_meta"]
    assert frozen_meta["neptune_api_token"] is None  # credential never frozen

    # resume re-reads the credential from the live meta config and
    # reattaches the run with with_id
    (tmp_path / "results" / "AD-42" / "model_ckpt.ckpt").touch()
    args2 = dict(args, resume_pth="AD-42", exp_id=None)
    with pytest.raises(_Abort):
        train_mod.train_model(args2, is_resume=True)
    resumed = fake_neptune.runs[-1]
    assert resumed.init_kwargs.get("with_id") == "AD-42"
    assert resumed.init_kwargs.get("api_token") == "tok"


def test_preprocess_cli_uses_config_dir(tmp_path, monkeypatch):
    """preprocess must resolve its DataConfig through the same three-tier
    merge as training, so an edited hyp_data_*.yaml feeds identical
    geometry into both (code-review finding)."""
    cd = tmp_path / "configs"
    cd.mkdir()
    (cd / "hyp_data_DCASE2022.yaml").write_text("mel_bins: 32\n")

    from adyolo_tpu import cli

    seen = {}
    monkeypatch.setattr("adyolo_tpu.data.chunking.preprocess_chunking",
                        lambda dcfg: seen.setdefault("cfg", dcfg) and 0 or 0)
    rc = cli.main(["preprocess", "chunking", "--dataset", "DCASE2022",
                   "--config_dir", str(cd)])
    assert rc == 0
    assert seen["cfg"].mel_bins == 32
    assert seen["cfg"].dataset == "DCASE2022"


def test_resume_reattaches_run_id_not_exp_id(fake_neptune, tmp_path, monkeypatch):
    """With an explicit --exp_id the experiment dir name is NOT a neptune
    sys-id; resume must reattach via the frozen neptune_run_id instead of
    passing exp_id as with_id (code-review finding)."""
    cd = tmp_path / "configs"
    cd.mkdir()
    (cd / "logging_meta_config.yaml").write_text(
        "neptune_project: 'ws/proj'\nneptune_api_token: 'tok'\n")

    from adyolo_tpu.engine import train as train_mod

    class _Abort(Exception):
        pass

    monkeypatch.setattr(train_mod, "SELDDataset",
                        lambda *a, **k: (_ for _ in ()).throw(_Abort()))
    args = {"action": "train", "dataset": "DCASE2022", "encoder": "se-resnet34",
            "loss": "adyolo", "seed": 1, "logger": True, "exp_id": "my-exp",
            "config_dir": str(cd), "results_dir": str(tmp_path / "results")}
    with pytest.raises(_Abort):
        train_mod.train_model(args)
    exp_dir = tmp_path / "results" / "my-exp"
    assert exp_dir.is_dir()
    import yaml as _yaml

    frozen_meta = _yaml.safe_load(
        (exp_dir / "hyp_exp.yaml").read_text())["args"]["logging_meta"]
    assert frozen_meta["neptune_run_id"] == "AD-42"

    (exp_dir / "model_ckpt.ckpt").touch()
    args2 = dict(args, resume_pth="my-exp", exp_id=None)
    with pytest.raises(_Abort):
        train_mod.train_model(args2, is_resume=True)
    resumed = fake_neptune.runs[-1]
    assert resumed.init_kwargs.get("with_id") == "AD-42"  # NOT "my-exp"

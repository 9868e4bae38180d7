"""Tensor-parallel mesh path: the (data=4, model=2) sharded train step must
match the single-device step (same global batch) — proves the Megatron-style
PartitionSpecs in parallel/mesh.py are layout-only (XLA inserts the
collectives; the math is unchanged)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adyolo_tpu.config import Config, MeshConfig, RunConfig
from adyolo_tpu.data.labels import encode_adyolo, pad_yolo_targets
from adyolo_tpu.engine.evaluate import make_frontend
from adyolo_tpu.models.wrapper import build_model, make_grid_geometry
from adyolo_tpu.parallel.mesh import make_mesh, state_shardings
from adyolo_tpu.parallel.train_step import (build_train_step, init_state,
                                            make_batch_placer)


def test_tp_specs_shard_only_ffn_and_mhsa():
    cfg = dataclasses.replace(
        Config(), args=RunConfig(encoder="resnet-conformer"),
        mesh=MeshConfig(model_parallel=2))
    frontend = make_frontend(cfg)
    model = build_model(cfg)
    mesh = make_mesh(cfg.mesh, batch_size=8)
    struct = jax.eval_shape(
        lambda: init_state(cfg, model, frontend, jax.random.PRNGKey(0)))
    sh = state_shardings(struct, mesh)
    flat = jax.tree_util.tree_flatten_with_path(sh.params)[0]
    sharded = {"/".join(k.key for k in p)
               for p, s in flat if s.spec != jax.sharding.PartitionSpec()}
    assert any("mhsa/query/kernel" in s for s in sharded)
    assert any("ffn1/Dense_0/kernel" in s for s in sharded)
    assert any("ffn2/Dense_1/kernel" in s for s in sharded)
    assert any("conv/pw1/kernel" in s for s in sharded)
    assert any("conv/dw_kernel" in s for s in sharded)
    # nothing outside the scoped conformer modules may shard (the ResNet
    # front, heads, norms at block boundaries stay replicated)
    for s in sharded:
        assert "mhsa" in s or "ffn" in s or "/conv/" in s, s
        assert "conformer" in s, s
    # optimizer moments mirror the param specs
    mu_flat = jax.tree_util.tree_flatten_with_path(sh.opt_state)[0]
    mu_sharded = ["/".join(getattr(k, "key", getattr(k, "name", str(k)))
                           for k in p if not hasattr(k, "idx"))
                  for p, s in mu_flat
                  if s.spec != jax.sharding.PartitionSpec()]
    assert any("mu" in s and "query/kernel" in s for s in mu_sharded)


@pytest.mark.slow
def test_tp_mesh_step_matches_single_device():
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provision the 8-device CPU mesh"

    cfg = Config()
    secs = 2
    cfg = dataclasses.replace(
        cfg,
        args=RunConfig(encoder="resnet-conformer"),
        mesh=MeshConfig(model_parallel=2),
        train=dataclasses.replace(cfg.train, batch_size=4,
                                  max_targets_per_clip=16),
    )
    frontend = make_frontend(cfg)
    model = build_model(cfg)
    geom = make_grid_geometry(cfg)

    rng = np.random.default_rng(0)
    B = cfg.train.batch_size
    n = cfg.data.sr * secs
    n_label = n // cfg.data.label_hop_len
    audio = (rng.standard_normal((B, n, 4)) * 0.1).astype(np.float32)
    per_clip = []
    for _ in range(B):
        label = {int(rng.integers(n_label)): [[int(rng.integers(13)), 0,
                                               float(rng.uniform(-180, 180)),
                                               float(rng.uniform(-90, 90))]]}
        per_clip.append(encode_adyolo(label, n_label, geom))
    targets, mask = pad_yolo_targets(per_clip, cfg.train.max_targets_per_clip * B)
    batch = {"audio": audio, "targets": targets, "target_mask": mask}
    key = jax.random.PRNGKey(1)

    def two_steps(mesh):
        state = init_state(cfg, model, frontend, jax.random.PRNGKey(0))
        step = build_train_step(cfg, model, frontend, mesh)
        place = make_batch_placer(cfg, mesh)
        state, loss0 = step(state, place(dict(batch)), key)
        state, loss1 = step(state, place(dict(batch)), jax.random.PRNGKey(2))
        return float(loss0), float(loss1), state

    mesh = make_mesh(cfg.mesh, batch_size=B)
    assert dict(mesh.shape) == {"data": 2, "model": 2} or \
        dict(mesh.shape) == {"data": 4, "model": 2}
    l0_tp, l1_tp, st_tp = two_steps(mesh)
    l0_1d, l1_1d, st_1d = two_steps(None)

    np.testing.assert_allclose(l0_tp, l0_1d, rtol=1e-5)
    np.testing.assert_allclose(l1_tp, l1_1d, rtol=5e-3)
    p_tp = jax.tree.leaves(jax.tree.map(np.asarray, st_tp.params))
    p_1d = jax.tree.leaves(jax.tree.map(np.asarray, st_1d.params))
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(p_tp, p_1d))
    assert worst < 5e-3, worst


def test_model_parallel_cli_flag():
    from adyolo_tpu.config import build_config

    cfg = build_config({"dataset": "DCASE2022", "model_parallel": 2})
    assert cfg.mesh.model_parallel == 2
    assert build_config({"dataset": "DCASE2022"}).mesh.model_parallel == 1


@pytest.mark.slow
def test_engine_quick_train_with_tp(tmp_path):
    """Engine-level integration of --model_parallel 2: mesh build,
    TP-sharded train step, checkpointing of sharded state, and the eval
    sweep with sharded params, end-to-end through train_model."""
    import os

    from adyolo_tpu.engine.train import train_model
    from tests.synth_data import make_synth_dataset

    root = make_synth_dataset(str(tmp_path / "data"), n_train=4, n_val=1,
                              n_test=1, chunk_window_s=4, eval_secs=6)
    results = str(tmp_path / "results")
    args = {
        "action": "train", "dataset": "DCASE2022",
        "encoder": "resnet-conformer", "loss": "adyolo", "seed": 100,
        "augment": False, "fix_thresh": True, "logger": False,
        "quick_test": True, "eval_pth": None, "resume_pth": None,
        "infer_pth": None, "results_dir": results, "batch_size": 4,
        "nb_iters": 1, "exp_id": "exp-tp", "nb_epochs": 1,
        "model_parallel": 2,
    }
    train_model(args, cfg_overrides={
        "data": {"data_pth": root,
                 "name_pth": os.path.join(root, "classes.txt"),
                 "chunk_window_s": 4},
    })
    exp = os.path.join(results, "exp-tp")
    assert os.path.isfile(os.path.join(exp, "model_best.ckpt"))
    assert len(os.listdir(os.path.join(exp, "output_eval"))) == 1


def test_tp_rejects_flash_mhsa_on_tpu_backend(monkeypatch):
    """model_parallel>1 + the fused attention kernel has no SPMD rule; the
    guard must fire on the *resolved model default* (MHSA.flash, "auto"
    since round 4), not a stale env read — the two diverged once
    (train_step defaulted the env to "0" while the blocks routed "auto"
    onto the kernel)."""
    import adyolo_tpu.parallel.train_step as ts
    from adyolo_tpu.models.resnet_conformer import MHSA

    assert MHSA.flash == "auto"  # env unset in tests; the shipped default
    cfg = dataclasses.replace(
        Config(), args=RunConfig(encoder="resnet-conformer"),
        mesh=MeshConfig(model_parallel=2))
    frontend = make_frontend(cfg)
    model = build_model(cfg)
    mesh = make_mesh(cfg.mesh, batch_size=8)
    monkeypatch.setattr(ts.jax, "default_backend", lambda: "tpu")
    with pytest.raises(ValueError, match="ADYOLO_FLASH_MHSA"):
        build_train_step(cfg, model, frontend, mesh)

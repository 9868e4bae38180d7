"""Data-parallel mesh path: the sharded 8-device train step must produce
the same loss and parameter update as the single-device step on the same
global batch (guards the driver's multichip dry-run deliverable in CI)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adyolo_tpu.config import Config, RunConfig
from adyolo_tpu.data.labels import encode_adyolo, pad_yolo_targets
from adyolo_tpu.engine.evaluate import make_frontend
from adyolo_tpu.models.wrapper import build_model, make_grid_geometry
from adyolo_tpu.parallel.mesh import make_mesh
from adyolo_tpu.parallel.train_step import (build_train_step, init_state,
                                            make_batch_placer)


@pytest.mark.slow
@pytest.mark.parametrize("encoder", ["se-resnet34", "resnet-conformer"])
def test_dp_mesh_step_matches_single_device(encoder):
    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest must provision the 8-device CPU mesh"

    cfg = Config()
    secs = 2
    cfg = dataclasses.replace(
        cfg,
        args=RunConfig(encoder=encoder),
        train=dataclasses.replace(cfg.train, batch_size=n_dev,
                                  max_targets_per_clip=16),
    )
    frontend = make_frontend(cfg)
    model = build_model(cfg)
    geom = make_grid_geometry(cfg)

    rng = np.random.default_rng(0)
    n = cfg.data.sr * secs
    n_label = n // cfg.data.label_hop_len
    audio = (rng.standard_normal((n_dev, n, 4)) * 0.1).astype(np.float32)
    per_clip = []
    for _ in range(n_dev):
        label = {int(rng.integers(n_label)): [[int(rng.integers(13)), 0,
                                               float(rng.uniform(-180, 180)),
                                               float(rng.uniform(-90, 90))]]}
        per_clip.append(encode_adyolo(label, n_label, geom))
    targets, mask = pad_yolo_targets(
        per_clip, cfg.train.max_targets_per_clip * n_dev)
    batch = {"audio": audio, "targets": targets, "target_mask": mask}
    key = jax.random.PRNGKey(1)

    def two_steps(mesh):
        state = init_state(cfg, model, frontend, jax.random.PRNGKey(0))
        step = build_train_step(cfg, model, frontend, mesh)
        place = make_batch_placer(cfg, mesh)
        state, loss0 = step(state, place(dict(batch)), key)
        state, loss1 = step(state, place(dict(batch)), jax.random.PRNGKey(2))
        return float(loss0), float(loss1), state

    l0_s, l1_s, state_single = two_steps(None)
    mesh = make_mesh(cfg.mesh, devices=jax.devices(), batch_size=n_dev)
    assert mesh.devices.size == 8
    l0_d, l1_d, state_dp = two_steps(mesh)

    assert np.isfinite(l0_s) and np.isfinite(l0_d)
    # identical math up to f32 reduction order across shards; the
    # second-step loss goes through one full Adam update, so a systematic
    # sharding error (wrong all-reduce, shard-dropped grads) would diverge
    assert abs(l0_s - l0_d) < 1e-4, (l0_s, l0_d)
    # after one Adam update: rsqrt amplifies f32 reduction-order noise on
    # near-zero-gradient params to O(lr)-scale param shifts, so the step-1
    # loss carries a few-e-3 wobble, not 1e-4 (the 2-process multihost
    # smoke measured 1e-3 at step 1 even with identical per-conv layouts;
    # packed-resident BN's copy-combined moments shift the order again,
    # measured 2.2e-3 here, and the round-4 conformer default flips
    # (flash=auto routing + time_pack OFF) moved the reduction order once
    # more: 5.5e-3 measured).  Systematic sharding errors (dropped
    # shards, missing all-reduce) diverge by orders of magnitude instead,
    # and the strict step-0 1e-4 assert plus the param comparison below
    # are the real guards.
    assert abs(l1_s - l1_d) < 1.2e-2, (l1_s, l1_d)
    # Adam's rsqrt amplifies f32 reduction-order noise to O(lr) on
    # near-zero-gradient params, so compare params at a few-x-lr tolerance
    flat_s = jax.tree_util.tree_leaves(state_single.params)
    flat_d = jax.tree_util.tree_leaves(state_dp.params)
    for a, b in zip(flat_s, flat_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)

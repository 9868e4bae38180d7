"""AOT serving export (engine/export.py): the deserialized StableHLO
artifact must reproduce the live fused audio->output program exactly."""
import pytest
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from adyolo_tpu.config import Config
from adyolo_tpu.engine.evaluate import make_frontend
from adyolo_tpu.engine.export import export_model, load_exported
from adyolo_tpu.models.wrapper import build_model


@pytest.mark.slow
def test_export_roundtrip(tmp_path):
    cfg = Config()
    frontend = make_frontend(cfg)
    model = build_model(cfg, compute_dtype="float32")
    secs = 2
    n = secs * cfg.data.sr
    feat_shape = (1, n // cfg.data.hop_length, cfg.data.mel_bins,
                  cfg.data.nb_feature_channels)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(feat_shape, jnp.float32), False)

    out_dir = export_model(cfg, variables, frontend, str(tmp_path / "export"),
                           batch_size=1, seconds=secs, conf_thresh=0.35)
    assert os.path.isfile(os.path.join(out_dir, "model.stablehlo"))
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["input_shape"] == [1, n, 4]
    assert meta["confidence_thresh"] == 0.35
    assert meta["loss_format"] == "adyolo"
    # one artifact serves both the TPU pod and a CPU fallback host
    assert meta["platforms"] == ["tpu", "cpu"]

    call, meta2 = load_exported(out_dir)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, n, 4)) * 0.1).astype(np.float32)

    served = np.asarray(call(audio))
    with jax.default_matmul_precision("float32"):
        feat = frontend._forward(jnp.asarray(audio), None,
                                 frontend._mel_mean, frontend._mel_std,
                                 frontend._aux_mean, frontend._aux_std)
        live = np.asarray(model.apply(variables, feat, False))
    assert served.shape == tuple(meta2["output_shape"])
    np.testing.assert_allclose(served, live, atol=1e-6, rtol=1e-6)


def test_export_cli_action_parses():
    from adyolo_tpu.cli import build_parser

    args = build_parser().parse_args(["export", "--eval_pth", "some-exp"])
    assert args.action == "export"
    assert args.eval_pth == "some-exp"
    assert args.serve_dtype is None  # default: ADYOLO_SERVE_DTYPE or f32
    args = build_parser().parse_args(
        ["export", "--eval_pth", "e", "--serve_dtype", "bfloat16"])
    assert args.serve_dtype == "bfloat16"


@pytest.mark.slow
def test_export_bf16_serving(tmp_path):
    """bf16 serving artifact: params stay f32, per-layer activation
    compute is bf16 (the TPU MXU-native serving path the headline bench
    A/Bs via ADYOLO_SERVE_DTYPE).  The exported program must stay within
    bf16 activation tolerance of the f32 live forward."""
    cfg = Config()
    frontend = make_frontend(cfg)
    model = build_model(cfg, compute_dtype="float32")
    secs = 2
    n = secs * cfg.data.sr
    feat_shape = (1, n // cfg.data.hop_length, cfg.data.mel_bins,
                  cfg.data.nb_feature_channels)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(feat_shape, jnp.float32), False)

    out_dir = export_model(cfg, variables, frontend, str(tmp_path / "bf16"),
                           batch_size=1, seconds=secs,
                           serve_dtype="bfloat16")
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["serve_dtype"] == "bfloat16"
    # output head runs in f32 (the encoder upcasts at the GRU/attention
    # tail), so the artifact's declared output dtype stays float32
    assert meta["output_dtype"] == "float32"

    call, _ = load_exported(out_dir)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, n, 4)) * 0.1).astype(np.float32)
    served = np.asarray(call(audio))
    with jax.default_matmul_precision("float32"):
        feat = frontend._forward(jnp.asarray(audio), None,
                                 frontend._mel_mean, frontend._mel_std,
                                 frontend._aux_mean, frontend._aux_std)
        live = np.asarray(model.apply(variables, feat, False))
    assert served.shape == live.shape
    # bf16 has ~3 decimal digits; the head outputs are tanh/sigmoid-
    # bounded so an absolute gate is the right check
    assert np.max(np.abs(served - live)) < 0.1
    assert np.mean(np.abs(served - live)) < 0.01


def test_export_decode_loop(tmp_path):
    """Full serving loop: artifact output -> PostProcessor built from the
    bundled frozen config decodes identically to the live pipeline."""
    from adyolo_tpu.config import load_config, save_config
    from adyolo_tpu.ops.decode import PostProcessor

    cfg = Config()
    frozen = str(tmp_path / "hyp_exp.yaml")
    save_config(cfg, frozen)
    frontend = make_frontend(cfg)
    model = build_model(cfg, compute_dtype="float32")
    secs = 2
    n = secs * cfg.data.sr
    feat_shape = (1, n // cfg.data.hop_length, cfg.data.mel_bins,
                  cfg.data.nb_feature_channels)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(feat_shape, jnp.float32), False)
    out_dir = export_model(cfg, variables, frontend, str(tmp_path / "art"),
                           batch_size=1, seconds=secs, conf_thresh=0.2,
                           frozen_cfg_path=frozen)
    call, meta = load_exported(out_dir)
    rng = np.random.default_rng(1)
    audio = (rng.standard_normal((1, n, 4)) * 0.3).astype(np.float32)
    served = call(audio)

    cfg2 = load_config(os.path.join(out_dir, "hyp_exp.yaml"))
    pp = PostProcessor(cfg2)
    pp.set_conf_thresh(meta["confidence_thresh"])
    events_served = pp.postprocess(jnp.asarray(served))

    with jax.default_matmul_precision("float32"):
        feat = frontend._forward(jnp.asarray(audio), None,
                                 frontend._mel_mean, frontend._mel_std,
                                 frontend._aux_mean, frontend._aux_std)
        live = model.apply(variables, feat, False)
    pp_live = PostProcessor(cfg)
    pp_live.set_conf_thresh(meta["confidence_thresh"])
    events_live = pp_live.postprocess(live)
    # the artifact is one fused program vs the live path's two jits —
    # fusion changes f32 rounding in the last digits, so compare events
    # numerically (same frames, same event count, same values to 1e-4)
    assert set(events_served) == set(events_live)
    for fr in events_served:
        a, b = np.asarray(events_served[fr]), np.asarray(events_live[fr])
        assert a.shape == b.shape, fr
        np.testing.assert_allclose(a, b, atol=1e-4)

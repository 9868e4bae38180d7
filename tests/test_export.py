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


def test_force_flash_pins_attention_path():
    """Regression (round-4 TPU export failure): with flash MHSA resolved
    ON (the default on a TPU backend), the conformer trace embeds a
    ``pallas_call`` — a TPU custom call the CPU platform lowering of a
    multi-platform artifact rejects.  ``force_flash`` must (a) reproduce
    that failure shape when pinned "1" on CPU, (b) let an inner "0"
    (what export_model applies) win over an outer "1", and (c) restore
    the previous mode on exit."""
    from adyolo_tpu.models.resnet_conformer import MHSA, force_flash
    import adyolo_tpu.models.resnet_conformer as rc

    m = MHSA(dim=32, heads=4)
    x = jnp.zeros((1, 16, 32), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, False)

    def lower():
        return jax.jit(lambda a: m.apply(variables, a, False)).lower(x)

    with force_flash("1"):
        with pytest.raises(ValueError, match="interpret mode"):
            lower().compile()
        with force_flash("0"):  # export_model's inner pin wins
            lower().compile()
        assert rc._FLASH_FORCE == "1"  # outer mode restored after inner
    assert rc._FLASH_FORCE is None


@pytest.mark.slow
def test_export_conformer_with_flash_resolved_on(tmp_path):
    """End-to-end shape of the round-4 failure: exporting a
    resnet-conformer checkpoint while the session's flash default
    resolves ON must still produce a portable (tpu, cpu) artifact that
    matches the live XLA forward."""
    import dataclasses

    from adyolo_tpu.config import RunConfig
    from adyolo_tpu.models.resnet_conformer import force_flash

    cfg = dataclasses.replace(Config(),
                              args=RunConfig(encoder="resnet-conformer"))
    frontend = make_frontend(cfg)
    model = build_model(cfg, compute_dtype="float32")
    secs = 2
    n = secs * cfg.data.sr
    feat_shape = (1, n // cfg.data.hop_length, cfg.data.mel_bins,
                  cfg.data.nb_feature_channels)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros(feat_shape, jnp.float32), False)

    with force_flash("1"):  # what "auto" resolves to on the real chip
        out_dir = export_model(cfg, variables, frontend,
                               str(tmp_path / "conf"), batch_size=1,
                               seconds=secs)
    meta = json.load(open(os.path.join(out_dir, "meta.json")))
    assert meta["platforms"] == ["tpu", "cpu"]

    call, _ = load_exported(out_dir)
    rng = np.random.default_rng(0)
    audio = (rng.standard_normal((1, n, 4)) * 0.1).astype(np.float32)
    served = np.asarray(call(audio))
    with jax.default_matmul_precision("float32"):
        feat = frontend._forward(jnp.asarray(audio), None,
                                 frontend._mel_mean, frontend._mel_std,
                                 frontend._aux_mean, frontend._aux_std)
        live = np.asarray(model.apply(variables, feat, False))
    np.testing.assert_allclose(served, live, atol=1e-5, rtol=1e-5)


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

"""AOT serving export (engine/export.py): the deserialized StableHLO
artifact must reproduce the live fused audio->output program exactly."""
import json
import os

import numpy as np
import jax
import jax.numpy as jnp

from adyolo_tpu.config import Config
from adyolo_tpu.engine.evaluate import make_frontend
from adyolo_tpu.engine.export import export_model, load_exported
from adyolo_tpu.models.wrapper import build_model


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

"""AOT serving export (TPU-native addition; no reference counterpart —
the reference "serves" by loading torch checkpoints into a live python
process, ``src/test.py:63-151``).

``export_model`` lowers the fused audio -> head-output program (feature
front-end + encoder + head with the scaler statistics and weights baked
in as constants) through ``jax.export`` into a portable StableHLO
artifact.  A serving process needs only jax to run it — not flax, not
the model zoo, not the config system:

    call, meta = load_exported("results/<exp>/export")
    out = call(audio)          # (B, N, C) float32 -> head output

The artifact directory holds:
  * ``model.stablehlo``  — serialized ``jax.export.Exported`` (weights
    embedded; compiled by the target backend at load time)
  * ``meta.json``        — input/output shapes, sample rate, class names
    path, loss format, arbitrated confidence threshold
  * ``hyp_exp.yaml``     — the frozen experiment config, so a decoder
    (``ops.decode.PostProcessor``) can be reconstructed when the serving
    side wants DOA events rather than raw grids.

Static shapes by design: one artifact per (batch, clip-length) pair —
the XLA serving contract.  Export more than one if needed.
"""
from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from ..config import Config

__all__ = ["export_model", "load_exported"]


def export_model(cfg: Config, variables: Dict, frontend, out_dir: str,
                 batch_size: int = 1, seconds: Optional[float] = None,
                 platforms: Optional[Sequence[str]] = None,
                 conf_thresh: float = 0.5,
                 frozen_cfg_path: Optional[str] = None,
                 serve_dtype: Optional[str] = None) -> str:
    """Serialize the fused inference program; returns ``out_dir``.

    ``serve_dtype`` selects the encoder compute dtype of the exported
    program ('float32' | 'bfloat16'; default from ``ADYOLO_SERVE_DTYPE``
    or 'float32').  Params and the feature front-end stay f32 either
    way — bf16 only changes per-layer activation compute, the TPU
    serving sweet spot (MXU-native, ~2x f32 conv throughput)."""
    import jax
    import jax.numpy as jnp

    from ..models.wrapper import build_model

    serve_dtype = serve_dtype or os.environ.get("ADYOLO_SERVE_DTYPE",
                                                "float32")
    model = build_model(cfg, compute_dtype=serve_dtype)
    secs = float(seconds if seconds is not None else cfg.data.chunk_window_s)
    n = int(round(secs * cfg.data.sr))
    n_ch = 4  # FOA and the 4-mic array both carry 4 waveform channels

    def fwd(audio):
        # f32 serving keeps strict matmul precision for golden parity;
        # bf16 serving uses the backend default (MXU-native)
        prec = "float32" if serve_dtype == "float32" else "default"
        with jax.default_matmul_precision(prec):
            feat = frontend._forward(audio, None, frontend._mel_mean,
                                     frontend._mel_std, frontend._aux_mean,
                                     frontend._aux_std)
            return model.apply(variables, feat, False)

    # hop-block input layout (B, T, hop, C) when the geometry allows it:
    # a free host-side view of the flat clip that skips the ~1.26 ms/call
    # device chunk relayout inside the STFT (ops/stft.py
    # framed_dft_chunked).  load_exported keeps the flat (B, N, C) calling
    # convention and does the reshape on the host.
    hop = cfg.data.hop_length
    chunked = cfg.data.n_fft == 2 * hop and n % hop == 0
    spec = jax.ShapeDtypeStruct(
        (batch_size, n // hop, hop, n_ch) if chunked else (batch_size, n, n_ch),
        jnp.float32)
    if platforms is None:
        # multi-platform artifact: lowers once per platform so the same
        # file serves on a TPU pod and on a CPU fallback host (the whole
        # program is stock StableHLO — no platform-specific custom calls
        # in the f32 eval path)
        platforms = ("tpu", "cpu")
    # the conformer's flash-attention Pallas kernel is a TPU custom call
    # and cannot lower for the artifact's CPU platform — force the
    # pure-XLA attention paths for the export trace (numerically
    # identical: the kernel computes exact attention, eval has no
    # dropout; see models/resnet_conformer.py force_flash)
    from ..models.resnet_conformer import force_flash

    with force_flash("0"):
        exp = jax.export.export(jax.jit(fwd), platforms=list(platforms))(spec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "model.stablehlo"), "wb") as f:
        f.write(exp.serialize())
    out_aval = jax.tree.leaves(exp.out_avals)[0]
    meta = {
        "input_shape": [batch_size, n, n_ch],
        "input_layout": "hop_blocks" if chunked else "flat",
        "hop_length": hop,
        "output_shape": list(out_aval.shape),
        "output_dtype": str(out_aval.dtype),
        "sr": cfg.data.sr,
        "seconds": secs,
        "audio_format": cfg.data.audio_format,
        "loss_format": cfg.args.loss,
        "nb_classes": cfg.data.nb_classes,
        "confidence_thresh": float(conf_thresh),
        "platforms": list(platforms),
        "serve_dtype": serve_dtype,
    }
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(meta, f, indent=1)
    if frozen_cfg_path and os.path.isfile(frozen_cfg_path):
        shutil.copy(frozen_cfg_path, os.path.join(out_dir, "hyp_exp.yaml"))
    return out_dir


def load_exported(artifact_dir: str) -> Tuple[Any, Dict]:
    """Load a serving artifact: returns ``(call, meta)`` where
    ``call(audio)`` runs the program on the current default backend (it
    must be one of ``meta['platforms']``)."""
    from jax import export as jexport

    with open(os.path.join(artifact_dir, "model.stablehlo"), "rb") as f:
        exp = jexport.deserialize(f.read())
    with open(os.path.join(artifact_dir, "meta.json")) as f:
        meta = json.load(f)

    def call(audio):
        a = np.asarray(audio, np.float32)
        if meta.get("input_layout") == "hop_blocks" and a.ndim == 3:
            # free host-side view into the traced hop-block layout
            a = a.reshape(a.shape[0], -1, meta["hop_length"], a.shape[2])
        return exp.call(a)

    return call, meta


def export_cmd(cfg_args: Dict, results_dir: str = "results") -> str:
    """CLI handler: ``export --eval_pth <exp_id>`` — exports the best
    checkpoint of a finished experiment to ``<exp_dir>/export``."""
    import jax

    from ..config import load_config
    from .checkpoint import load_checkpoint
    from .evaluate import make_frontend
    from ..models.wrapper import build_model
    from ..parallel.train_step import init_state

    exp_id = cfg_args.get("eval_pth")
    if exp_id is None:
        raise SystemExit("error: --eval_pth <exp_id> is required for export")
    output_pth = os.path.join(results_dir, exp_id)
    frozen = os.path.join(output_pth, "hyp_exp.yaml")
    cfg = load_config(frozen)
    frontend = make_frontend(cfg)
    model = build_model(cfg, compute_dtype="float32")
    template = init_state(cfg, model, frontend, jax.random.PRNGKey(0))
    state, host = load_checkpoint(os.path.join(output_pth, "model_best.ckpt"),
                                  template)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out_dir = os.path.join(output_pth, "export")
    export_model(cfg, variables, frontend, out_dir,
                 conf_thresh=host.get("confidence_thresh", 0.5),
                 frozen_cfg_path=frozen,
                 serve_dtype=cfg_args.get("serve_dtype"))
    print(f"exported serving artifact -> {out_dir}")
    return out_dir

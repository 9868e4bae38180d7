"""adyolo_tpu — a TPU-native (JAX / XLA / Pallas / pjit) SELD framework.

A from-scratch re-design of the capabilities of the AD-YOLO reference
implementation (sadPororo/AD-YOLO, PyTorch) for TPU hardware:

* batched, jit-compiled acoustic front-end (multichannel STFT -> log-mel +
  FOA intensity vectors / GCC-PHAT) expressed as MXU matmuls
  (reference: per-sample librosa CPU loops, ``src/datasets.py:252-292``),
* flax/linen model zoo (SE-ResNet34+BiGRU, ResNet-Conformer) with four
  interchangeable SELD output formats (SED-DOA, ACCDOA, ADPIT, AD-YOLO)
  (reference: ``src/models/``),
* statically-shaped, masked AD-YOLO angular-assignment loss
  (reference: ``src/models/loss.py:156-251``),
* vectorized on-device DOA grid decode + NMS
  (reference: ``src/datasets.py:485-919``),
* DCASE SELD metrics (ER/F/LE/LR/SELD, Hungarian matching, polyphony
  restricted variants) (reference: ``src/utils/seld_metrics.py``),
* data-parallel training over a ``jax.sharding.Mesh`` with checkpoint /
  resume semantics matching the reference engine (``src/train.py``).

No code is copied from the reference; behavior is re-derived and
re-implemented TPU-first.  File:line citations in docstrings point at the
reference behavior each component reproduces.
"""

__version__ = "0.1.0"

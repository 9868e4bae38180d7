"""Import helpers for using the read-only reference implementation as a
golden test oracle (models/losses/decoders are pure torch/numpy).

librosa and torchaudio are absent from this container; they are stubbed
because the code paths under test never touch them (feature extraction is
not exercised through the reference here).
"""
import sys
import types

import numpy as np

_loaded = False


def load_reference():
    global _loaded
    if _loaded:
        import models.backbones.resnet  # noqa

    if not hasattr(np, "float"):
        np.float = float  # reference targets numpy<1.24
    if "/root/reference/src" not in sys.path:
        sys.path.insert(0, "/root/reference/src")

    for name in ("librosa", "librosa.core", "librosa.filters"):
        if name not in sys.modules:
            mod = types.ModuleType(name)
            # a stub without __spec__ breaks importlib.util.find_spec for
            # OTHER packages probing librosa availability (transformers'
            # import_utils raises "librosa.__spec__ is None" — seen when
            # tests/test_mel_golden.py ran after any ref-oracle test)
            import importlib.machinery

            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
            sys.modules[name] = mod

    _install_torchvision_stub()

    if "torchaudio" not in sys.modules:
        ta = types.ModuleType("torchaudio")
        tat = types.ModuleType("torchaudio.transforms")

        class _Stub:
            def __init__(self, *a, **k):
                raise RuntimeError("torchaudio stub: not available in tests")

        tat.TimeMasking = _Stub
        tat.FrequencyMasking = _Stub
        ta.transforms = tat
        import importlib.machinery

        # keep importlib.util.find_spec working for availability probes
        ta.__spec__ = importlib.machinery.ModuleSpec("torchaudio", loader=None)
        tat.__spec__ = importlib.machinery.ModuleSpec(
            "torchaudio.transforms", loader=None)
        sys.modules["torchaudio"] = ta
        sys.modules["torchaudio.transforms"] = tat
    _loaded = True


def _install_torchvision_stub():
    """torchvision is absent from this container; the reference's conformer
    uses exactly one symbol from it — ``models.resnet.BasicBlock``
    (resnet_conformer.py:12,355-384) — so a faithful ~30-line functional
    stand-in (conv3x3(stride)->BN->ReLU->conv3x3->BN (+downsample)->ReLU,
    torchvision semantics) makes the golden parity test possible."""
    if "torchvision" in sys.modules:
        return
    import torch.nn as tnn

    def conv3x3(inp, out, stride=1, groups=1, dilation=1):
        return tnn.Conv2d(inp, out, 3, stride=stride, padding=dilation,
                          groups=groups, bias=False, dilation=dilation)

    class BasicBlock(tnn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or tnn.BatchNorm2d
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = tnn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    import importlib.machinery

    tv = types.ModuleType("torchvision")
    tvm = types.ModuleType("torchvision.models")
    tvr = types.ModuleType("torchvision.models.resnet")
    tvr.BasicBlock = BasicBlock
    tvm.resnet = tvr
    tv.models = tvm
    for m in (tv, tvm, tvr):
        # find_spec-safe stubs (see the librosa stub note above)
        m.__spec__ = importlib.machinery.ModuleSpec(m.__name__, loader=None)
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.models"] = tvm
    sys.modules["torchvision.models.resnet"] = tvr


def ref_train_params(nb_classes=13, loss="adyolo", conf=0.5, clss=0.5,
                     unify=15.0, nms="conn-merge"):
    """The nested params dict the reference constructors expect."""
    return {
        "args": {"device": "cpu", "loss": loss},
        "data_config": {"nb_classes": nb_classes},
        "train_config": {
            "grid_size": [45.0, 45.0],
            "nb_anchors": 5,
            "conf_thresh": conf,
            "clss_thresh": clss,
            "unify_thresh": unify,
            "train_unify": [45.0, 25.0, 10.0],
            "g_overlap": 0.5,
            "nms": nms,
            "loss_gains": {"angular_gain": 5.0, "object_gain": 1.0,
                           "nonobj_gain": 5.0, "class_gain": 3.0},
        },
    }

"""Multi-host DP input-path logic, tested single-process with injected
rank/size (real multi-host needs a slice; the pure logic is covered here)."""
import dataclasses
import random

import numpy as np

from adyolo_tpu.config import Config
from adyolo_tpu.data.labels import encode_adyolo, pad_yolo_targets
from adyolo_tpu.ops.grid import GridGeometry
from adyolo_tpu.parallel.mesh import globalize_yolo_targets

GEOM = GridGeometry((45.0, 45.0), 0.5, 5)


def _clip_label(rng, n_label=8):
    return {int(rng.integers(n_label)): [[int(rng.integers(13)), 0,
                                          float(rng.uniform(-180, 180)),
                                          float(rng.uniform(-90, 90))]]}


def test_globalize_yolo_targets_matches_single_host():
    """Two hosts encoding their local 2-clip batches + globalize must yield
    the same set of valid target rows as one host encoding the global
    4-clip batch directly."""
    rng = np.random.default_rng(0)
    labels = [_clip_label(rng) for _ in range(4)]
    enc = [encode_adyolo(l, 8, GEOM) for l in labels]
    cap_local = 16

    t_global, m_global = pad_yolo_targets(enc, 2 * cap_local)

    per_host = []
    for rank in range(2):
        t, m = pad_yolo_targets(enc[rank * 2:(rank + 1) * 2], cap_local)
        per_host.append((t, m))

    def fake_allgather(x):
        # process_allgather stand-in: stack this leaf across "processes".
        # Each rank contributes its own copy; emulate by closure index.
        raise AssertionError("replaced per-rank below")

    # emulate each rank running globalize with an allgather that returns
    # the stack of what BOTH ranks would contribute
    results = []
    for rank in range(2):
        contributions_t = []
        contributions_m = []
        for r in range(2):
            t = per_host[r][0].copy()
            t[:, 0] += r * 2  # what rank r contributes after its own offset
            contributions_t.append(t)
            contributions_m.append(per_host[r][1])

        def allgather(x, _t=contributions_t, _m=contributions_m):
            if x.ndim == 2:
                return np.stack(_t)
            return np.stack(_m)

        gt, gm = globalize_yolo_targets(per_host[rank][0], per_host[rank][1],
                                        rank, 2, 2, allgather=allgather)
        results.append((gt, gm))

    # all ranks hold identical tensors
    np.testing.assert_array_equal(results[0][0], results[1][0])
    np.testing.assert_array_equal(results[0][1], results[1][1])
    gt, gm = results[0]
    assert gt.shape == t_global.shape and gm.shape == m_global.shape
    got_rows = {tuple(r) for r in gt[gm]}
    want_rows = {tuple(r) for r in t_global[m_global]}
    assert got_rows == want_rows


def test_globalize_single_process_identity():
    t = np.zeros((4, 7), np.float32)
    m = np.zeros((4,), bool)
    gt, gm = globalize_yolo_targets(t, m, 0, 1, 2)
    assert gt is t and gm is m


def test_trainloader_per_host_file_sharding(monkeypatch):
    """Same-seeded loaders on two ranks consume disjoint interleaved slices
    covering the whole epoch; per-host batch = global / num_shards."""
    from adyolo_tpu.data import dataset as ds_mod

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, batch_size=4, num_workers=0))

    names = [f"clip{i:03d}" for i in range(16)]

    class _FakeDS:
        loss_nm = "accdoa"

        def get_filelist(self):
            return list(names)

        def __len__(self):
            return len(names)

    monkeypatch.setattr(ds_mod, "_assemble_batch",
                        lambda dataset, batch_names, max_targets: list(batch_names))

    seen = {}
    for rank in range(2):
        loader = ds_mod.TrainLoader(_FakeDS(), cfg, rank=rank, num_shards=2)
        assert loader.batch_size == 2
        assert len(loader) == 4
        random.seed(7)  # same host RNG state on every process
        batches = list(loader)
        assert len(batches) == 4 and all(len(b) == 2 for b in batches)
        seen[rank] = [n for b in batches for n in b]

    assert set(seen[0]).isdisjoint(seen[1])
    assert set(seen[0]) | set(seen[1]) == set(names)

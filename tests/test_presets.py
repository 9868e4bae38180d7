"""Dataset preset + misc API coverage."""
import numpy as np

from adyolo_tpu.config import build_config
from adyolo_tpu.metrics.seld import SegmentScorer
from adyolo_tpu.models.wrapper import build_model


def test_dcase_presets_build_models():
    """All three dataset presets produce consistent configs + models
    (DCASE2020: 14 classes, 2021: 12, 2022: 13 — hyp_data_*.yaml)."""
    for ds, k in (("DCASE2020", 14), ("DCASE2021", 12), ("DCASE2022", 13)):
        cfg = build_config({"dataset": ds})
        assert cfg.data.nb_classes == k
        assert cfg.data.data_pth.endswith(f"{ds}_SELD/")
        m = build_model(cfg)
        assert m.nb_classes == k


def test_get_nb_files_room_grouping():
    files = ["fold4_room1_mix001.csv", "fold4_room2_mix002.csv",
             "fold4_room1_mix003.csv"]
    assert SegmentScorer.get_nb_files(files) == {0: files}
    by_room = SegmentScorer.get_nb_files(files, tag="room")
    assert set(by_room) == {1, 2}
    assert len(by_room[1]) == 2


def test_mic_preset_channels():
    cfg = build_config({"dataset": "DCASE2022"},
                       data_overrides={"audio_format": "mic"})
    assert cfg.data.nb_feature_channels == 10

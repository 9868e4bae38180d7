"""Native PCM16 wav reader (native/wavload.cpp) vs the scipy oracle."""
import numpy as np
import pytest
import scipy.io.wavfile as wav

from adyolo_tpu.data import io


@pytest.fixture()
def lib():
    lib = io._native_wav()
    if lib is None:
        pytest.skip("native wavload unavailable (no g++?)")
    return lib


@pytest.mark.parametrize("shape", [(480, 4), (481, 4), (7, 1), (1, 2)])
def test_native_matches_scipy(tmp_path, lib, shape):
    rng = np.random.default_rng(0)
    data = rng.integers(-32768, 32767, size=shape, dtype=np.int16)
    p = str(tmp_path / "a.wav")
    wav.write(p, 24000, data if shape[1] > 1 else data[:, 0])
    out = io.read_wav(p)
    _, ref = wav.read(p)
    if ref.ndim == 1:
        ref = ref[:, None]
    assert out.dtype == np.int16
    np.testing.assert_array_equal(out, ref)


def test_non_pcm16_falls_back(tmp_path, lib):
    p = str(tmp_path / "f.wav")
    wav.write(p, 24000, np.zeros((32, 2), np.float32))  # float wav
    out = io.read_wav(p)  # native returns -7, scipy handles it
    assert out.shape == (32, 2) and out.dtype == np.float32


def test_missing_file_raises(tmp_path, lib):
    with pytest.raises(Exception):
        io.read_wav(str(tmp_path / "nope.wav"))


def test_threadpool_parallel_decode(tmp_path, lib):
    """The pool path the loader uses: many concurrent native reads return
    the right bytes (GIL released around fread)."""
    from concurrent.futures import ThreadPoolExecutor

    rng = np.random.default_rng(1)
    paths, refs = [], []
    for i in range(12):
        d = rng.integers(-1000, 1000, size=(2000, 4), dtype=np.int16)
        p = str(tmp_path / f"c{i}.wav")
        wav.write(p, 24000, d)
        paths.append(p)
        refs.append(d)
    with ThreadPoolExecutor(4) as pool:
        outs = list(pool.map(io.read_wav, paths))
    for o, r in zip(outs, refs):
        np.testing.assert_array_equal(o, r)

"""Audio front-end tests: WAV decode, native C++ resampler vs scipy, and
WhisperFeatureExtractor-parity feature prep."""

import wave

import numpy as np
import pytest

from enhance_cb_whisper_tpu.audio import load_audio_16k, prepare_features, read_wav, resample
from enhance_cb_whisper_tpu.ops.mel import N_FRAMES, N_SAMPLES


def _write_wav(path, data, rate=16000, width=2, channels=1):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            raw = (np.clip(data, -1, 1) * 32767).astype("<i2").tobytes()
        else:
            raise NotImplementedError
        w.writeframes(raw)


def test_read_wav_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.uniform(-0.5, 0.5, 1600).astype(np.float32)
    _write_wav(tmp_path / "a.wav", data)
    got, sr = read_wav(str(tmp_path / "a.wav"))
    assert sr == 16000
    np.testing.assert_allclose(got, data, atol=1e-4)


def test_read_wav_stereo_mixdown(tmp_path):
    t = np.linspace(0, 1, 800, dtype=np.float32)
    stereo = np.stack([np.sin(2 * np.pi * 5 * t), -np.sin(2 * np.pi * 5 * t)], axis=1)
    with wave.open(str(tmp_path / "s.wav"), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes((stereo * 32767).astype("<i2").tobytes())
    got, sr = read_wav(str(tmp_path / "s.wav"))
    assert sr == 8000
    np.testing.assert_allclose(got, 0.0, atol=1e-3)


def test_native_resampler_matches_scipy():
    pytest.importorskip("scipy")
    from scipy.signal import resample_poly as scipy_poly

    from enhance_cb_whisper_tpu.audio.native import resample_poly_native

    t = np.arange(44100) / 44100.0
    # in-band pure tone: any correct anti-aliasing resampler must agree
    x = np.sin(2 * np.pi * 440 * t).astype(np.float32)
    got = resample_poly_native(x, 44100, 16000)
    want = scipy_poly(x, 160, 441).astype(np.float32)
    assert got.shape[0] == want.shape[0]
    # compare away from the edges (different filter lengths ring differently)
    sl = slice(2000, -2000)
    err = np.abs(got[sl] - want[sl])
    assert np.percentile(err, 99) < 2e-3
    assert np.corrcoef(got[sl], want[sl])[0, 1] > 0.99999


def test_resample_identity():
    x = np.random.default_rng(2).standard_normal(1000).astype(np.float32)
    assert resample(x, 16000, 16000) is not None
    np.testing.assert_array_equal(resample(x, 16000, 16000), x)


def test_prepare_features_shortform():
    transformers = pytest.importorskip("transformers")
    fe = transformers.WhisperFeatureExtractor()
    rng = np.random.default_rng(3)
    audio = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    feats, mask = prepare_features(audio)
    want = fe(
        audio, sampling_rate=16000, return_tensors="np", return_attention_mask=True
    )
    assert feats.shape == (1, 80, N_FRAMES)
    np.testing.assert_allclose(feats[0], want.input_features[0], rtol=1e-4, atol=2e-4)


def test_prepare_features_longform():
    audio = np.zeros(N_SAMPLES + 16000, np.float32)
    feats, mask = prepare_features(audio)
    assert feats.shape[-1] > N_FRAMES
    assert mask.shape[-1] == feats.shape[-1]


def test_prefetch_iterator():
    from enhance_cb_whisper_tpu.audio.prefetch import prefetch

    assert list(prefetch(range(10), depth=3)) == list(range(10))

    def boom():
        yield 1
        raise ValueError("decode failed")

    it = prefetch(boom())
    assert next(it) == 1
    with pytest.raises(ValueError, match="decode failed"):
        next(it)


def test_prefetch_iterator_exhausted_raises():
    """next() after exhaustion must raise StopIteration, not block forever
    on the drained queue (second for-loop / zip / chain patterns)."""
    from enhance_cb_whisper_tpu.audio.prefetch import prefetch

    it = prefetch(range(3), depth=2)
    assert list(it) == [0, 1, 2]
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):
        next(it)

    def boom():
        raise ValueError("x")
        yield  # pragma: no cover

    it2 = prefetch(boom())
    with pytest.raises(ValueError):
        next(it2)
    with pytest.raises(StopIteration):
        next(it2)


def test_load_audio_float32_wav(tmp_path):
    """IEEE-float32 WAVs (sox/soundfile default) fall back to ffmpeg —
    stdlib wave raises 'unknown format: 3' on them."""
    import shutil
    import struct

    if shutil.which("ffmpeg") is None:
        pytest.skip("no ffmpeg")
    from enhance_cb_whisper_tpu.audio.io import load_audio_16k

    sr = 16000
    samples = (0.25 * np.sin(2 * np.pi * 440 * np.arange(1600) / sr)).astype(
        np.float32
    )
    data = samples.tobytes()
    path = tmp_path / "f32.wav"
    with open(path, "wb") as f:
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32))
        f.write(b"data" + struct.pack("<I", len(data)) + data)

    wav = load_audio_16k(str(path))
    assert wav.dtype == np.float32 and wav.shape[0] == 1600
    np.testing.assert_allclose(wav, samples, atol=1e-4)


def test_prefetch_close_unblocks_worker():
    """Early consumer break (limit_train_batches) must not leave the
    worker thread blocked on a full queue holding a batch."""
    import itertools
    import time

    from enhance_cb_whisper_tpu.audio.prefetch import prefetch

    produced = []

    def gen():
        for i in itertools.count():
            produced.append(i)
            yield i

    it = prefetch(gen(), depth=2)
    assert next(it) == 0
    it.close()
    deadline = time.time() + 2.0
    while it._thread.is_alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not it._thread.is_alive()
    # after close, iteration reports exhaustion instead of blocking
    assert list(it) == []

"""Offline pipeline tests: extract_hidden_states parity vs the reference's
torch path (src/utils.py:130-205), audio cutting utilities."""

import os
import wave

import numpy as np
import pytest
import torch

from enhance_cb_whisper_tpu.pipeline import extract_hidden_states, get_keywords_audios

transformers = pytest.importorskip("transformers")


def _write_wav(path, data, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("whisper_tiny_random")
    hf_config = transformers.WhisperConfig(
        vocab_size=128, num_mel_bins=80, d_model=32,
        encoder_layers=4, encoder_attention_heads=4,
        decoder_layers=2, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=40,
        pad_token_id=0, bos_token_id=1, eos_token_id=2, decoder_start_token_id=3,
        suppress_tokens=None, begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    model = transformers.WhisperForConditionalGeneration(hf_config)
    model.save_pretrained(str(d))
    return str(d), model


def test_extract_hidden_states_parity(tmp_path, tiny_ckpt):
    ckpt_dir, hf = tiny_ckpt
    audio_dir = tmp_path / "audio"
    target = tmp_path / "hs"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1 s
    _write_wav(audio_dir / "utt1.wav", wav)

    extract_hidden_states(
        str(audio_dir), ckpt_dir, str(target), layer_slice=(1, 4), batch_size=2
    )

    got = np.load(target / "utt1.npy")
    t_len = int(np.ceil((16000 // 160) / 2.0))
    assert got.shape[0] == 3 and got.shape[1] == t_len

    # reference path: HF features + encoder hidden_states[1:4], truncate, L2
    fe = transformers.WhisperFeatureExtractor()
    feats = fe(wav, sampling_rate=16000, return_tensors="pt").input_features
    with torch.no_grad():
        hs = hf.model.encoder(feats, output_hidden_states=True).hidden_states
    want = torch.cat(hs[1:4], dim=0)[:, :t_len, :]
    want = (want / torch.linalg.norm(want, dim=-1, keepdim=True)).numpy()

    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_get_keywords_audios(tmp_path):
    wav_dir = tmp_path / "wavs"
    out_dir = tmp_path / "kw"
    wav_dir.mkdir()
    rate = 16000
    data = np.arange(rate, dtype=np.float32) / rate - 0.5
    _write_wav(wav_dir / "src1.wav", data, rate)
    aligned = tmp_path / "aligned.tsv"
    with open(aligned, "w") as f:
        f.write("hello\tsrc1\t0.25\t0.5\n")
        f.write("unaligned\tsrc1\t0.1\t0.1\n")  # skipped (start == end)
        f.write("badline\n")  # skipped (not 4 fields)
    get_keywords_audios(str(wav_dir), str(aligned), str(out_dir))
    files = sorted(os.listdir(out_dir))
    assert files == ["0.wav"]
    with wave.open(str(out_dir / "0.wav")) as w:
        assert w.getnframes() == rate // 4


def test_safetensors_loading_matches_torch(tiny_ckpt):
    """Torch-free safetensors weight loading == torch state-dict conversion."""
    from enhance_cb_whisper_tpu.models.whisper import WhisperConfig
    from enhance_cb_whisper_tpu.models.whisper_loader import (
        load_hf_whisper,
        load_whisper_from_pretrained,
    )

    ckpt_dir, hf = tiny_ckpt
    config, params = load_whisper_from_pretrained(ckpt_dir)
    want = load_hf_whisper(hf.state_dict(), config)
    np.testing.assert_allclose(
        params["encoder"]["layers"][0]["fc1"]["weight"],
        want["encoder"]["layers"][0]["fc1"]["weight"],
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        params["decoder"]["embed_tokens"]["weight"],
        want["decoder"]["embed_tokens"]["weight"],
        rtol=1e-6,
    )


def test_keyword_tts_loop_with_fake_synthesizer(tmp_path):
    """The synthesis loop (utils.py:31-80) with an injected backend: voice
    resolution (per-keyword / explicit / random-in-locale), resume by
    existing mp3s, bounded retry on flaky failures, voice-metadata dump."""
    from enhance_cb_whisper_tpu.pipeline import keyword_tts

    kw_file = tmp_path / "keywords.txt"
    kw_file.write_text("alpha\nbeta\tvB\ngamma\n")
    out = tmp_path / "tts"
    out.mkdir()
    # index 0 already synthesized -> resumed over
    (out / "0.mp3").write_bytes(b"existing")

    voices = [{"ShortName": "vA", "Name": "Voice A"},
              {"ShortName": "vB", "Name": "Voice B"}]
    calls = []
    fail_once = {"beta": 1}

    def synthesize(text, voice_name, out_path):
        if fail_once.get(text, 0):
            fail_once[text] -= 1
            raise ConnectionError("flaky network")
        calls.append((text, voice_name))
        with open(out_path, "wb") as f:
            f.write(b"mp3")

    class SeqRng:
        def choice(self, seq):
            return seq[0]

    keyword_tts(str(out), str(kw_file), "en-US",
                synthesize=synthesize, list_voices=lambda loc: voices,
                rng=SeqRng())

    assert (out / "1.mp3").exists() and (out / "2.mp3").exists()
    assert (out / "0.mp3").read_bytes() == b"existing"  # not re-synthesized
    assert ("beta", "Voice B") in calls   # per-keyword voice, after 1 retry
    assert ("gamma", "Voice A") in calls  # random-in-locale
    dump = (tmp_path / "keywords_voice.txt").read_text().splitlines()
    assert dump == ["beta\tvB", "gamma\tvA"]


def test_keyword_tts_gives_up_after_retries(tmp_path):
    from enhance_cb_whisper_tpu.pipeline import keyword_tts

    kw_file = tmp_path / "keywords.txt"
    kw_file.write_text("alpha\n")
    out = tmp_path / "tts"
    out.mkdir()

    def synthesize(text, voice_name, out_path):
        raise ConnectionError("always down")

    keyword_tts(str(out), str(kw_file), "en-US", max_retries=2,
                synthesize=synthesize,
                list_voices=lambda loc: [{"ShortName": "vA", "Name": "A"}])
    assert not (out / "0.mp3").exists()  # skipped, resumable next run


def test_extract_hidden_states_f16_cache(tmp_path, tiny_ckpt):
    """cache_dtype='float16' stores half-size caches; loaders upcast to f32
    and the values round-trip within f16 precision of the f32 caches."""
    from enhance_cb_whisper_tpu.catalog.store import load_hidden_states

    ckpt_dir, _ = tiny_ckpt
    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(1)
    _write_wav(audio_dir / "u.wav", (rng.standard_normal(16000) * 0.1).astype(np.float32))

    extract_hidden_states(
        str(audio_dir), ckpt_dir, str(tmp_path / "f32"), layer_slice=(1, 4), batch_size=2
    )
    extract_hidden_states(
        str(audio_dir), ckpt_dir, str(tmp_path / "f16"), layer_slice=(1, 4),
        batch_size=2, cache_dtype="float16",
    )
    raw16 = np.load(tmp_path / "f16" / "u.npy")
    assert raw16.dtype == np.float16
    a = load_hidden_states(str(tmp_path / "f32" / "u.npy"))
    b = load_hidden_states(str(tmp_path / "f16" / "u.npy"))
    assert b.dtype == np.float32  # loader upcasts
    assert os.path.getsize(tmp_path / "f16" / "u.npy") < 0.6 * os.path.getsize(
        tmp_path / "f32" / "u.npy"
    )
    np.testing.assert_allclose(a, b, rtol=0, atol=2e-3)


def test_keyword_tts_dump_merges_on_resume(tmp_path):
    """Resumed runs must MERGE the voice dump, not rewrite it with only the
    current todo rows (the reference loses earlier assignments —
    docs/PARITY.md #17); keywords whose synthesis never succeeded are not
    recorded."""
    from enhance_cb_whisper_tpu.pipeline import keyword_tts

    kw_file = tmp_path / "keywords.txt"
    kw_file.write_text("alpha\nbeta\ngamma\n")
    out = tmp_path / "tts"
    out.mkdir()
    voices = [{"ShortName": "vA", "Name": "Voice A"}]

    def ok(text, voice_name, out_path):
        with open(out_path, "wb") as f:
            f.write(b"mp3")

    class FirstRng:
        def choice(self, seq):
            return seq[0]

    # run 1: gamma's synthesis always fails -> only alpha/beta recorded
    def flaky(text, voice_name, out_path):
        if text == "gamma":
            raise ConnectionError("down")
        ok(text, voice_name, out_path)

    keyword_tts(str(out), str(kw_file), "en-US", synthesize=flaky,
                list_voices=lambda loc: voices, rng=FirstRng(), max_retries=2)
    dump = tmp_path / "keywords_voice.txt"
    assert dump.read_text().splitlines() == ["alpha\tvA", "beta\tvA"]

    # run 2 resumes (alpha/beta mp3s exist): gamma now succeeds — the dump
    # must contain ALL three, in keyword-file order
    keyword_tts(str(out), str(kw_file), "en-US", synthesize=ok,
                list_voices=lambda loc: voices, rng=FirstRng())
    assert dump.read_text().splitlines() == ["alpha\tvA", "beta\tvA", "gamma\tvA"]


def test_keyword_tts_unknown_voice_message(tmp_path):
    from enhance_cb_whisper_tpu.pipeline import keyword_tts

    kw_file = tmp_path / "keywords.txt"
    kw_file.write_text("alpha\tnope\n")
    out = tmp_path / "tts"
    out.mkdir()
    with pytest.raises(ValueError, match="nope.*not available"):
        keyword_tts(str(out), str(kw_file), "en-US",
                    synthesize=lambda *a: None,
                    list_voices=lambda loc: [{"ShortName": "vA", "Name": "A"}])

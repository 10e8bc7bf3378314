"""int8 Whisper encoder (serving/extraction mode, models/whisper.py).

The encoder is MXU compute-bound, so the win is s8xs8->s32 matmuls (~2x
the bf16 MXU rate on v5e), not weight-only reads — same recipe as the int8
ResNet catalog scorer (static calibrated activation scales per layer/site,
per-output-channel int8 weights, f32 dequant epilogues).  Reference builds
its KWS caches with whisper-medium (datasets/aishell/build.sh:74-112);
int8 extraction is our opt-in accelerated mode for that pipeline.
"""

import os
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.models.whisper import (
    _ENC_ACT_SITES,
    WhisperConfig,
    calibrate_encoder_act_scales,
    encoder_kws_stack,
    init_whisper_params,
    quantize_encoder,
    quantize_encoder_layers,
    stack_whisper_params,
)

CFG = WhisperConfig(
    vocab_size=100, num_mel_bins=80, d_model=64,
    encoder_layers=6, encoder_attention_heads=4,
    decoder_layers=2, decoder_attention_heads=4,
    encoder_ffn_dim=256, decoder_ffn_dim=256,
    max_source_positions=1500, max_target_positions=64,
)
SLICE = (2, 5)


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    params = init_whisper_params(rng, CFG)
    feats = (rng.standard_normal((2, 80, 3000)) * 0.5).astype(np.float32)
    stacked = stack_whisper_params(jax.tree.map(jnp.asarray, params))
    ref = np.asarray(encoder_kws_stack(stacked, feats, CFG, layer_slice=SLICE))
    return params, feats, ref


def test_int8_kws_stack_close_to_f32(setup):
    params, feats, ref = setup
    qp = jax.device_put(quantize_encoder(params, feats, CFG))
    got = np.asarray(encoder_kws_stack(qp, feats, CFG, layer_slice=SLICE))
    # both stacks are L2-normalized per frame -> rowwise dot = cosine
    cos = (ref * got).sum(-1)
    assert cos.min() > 0.999, cos.min()

    # bf16 intermediates (the recommended serving pairing) stay close too
    got16 = np.asarray(
        encoder_kws_stack(qp, feats, CFG, layer_slice=SLICE, dtype=jnp.bfloat16)
    )
    assert (ref * got16).sum(-1).min() > 0.995


def test_nearest_keyword_decision_parity(setup):
    """The caches feed cosine-similarity KWS — the serving decision (which
    catalog keyword is nearest per utterance frame-stack) must survive
    quantization on this synthetic corpus."""
    params, feats, ref = setup
    qp = jax.device_put(quantize_encoder(params, feats, CFG))
    got = np.asarray(encoder_kws_stack(qp, feats, CFG, layer_slice=SLICE))

    rng = np.random.default_rng(1)
    # catalog: random frame spans of the f32 stacks (like real keyword cuts)
    kws = []
    for _ in range(8):
        b = rng.integers(0, ref.shape[0])
        t0 = int(rng.integers(0, ref.shape[2] - 6))
        kws.append(ref[b, :, t0 : t0 + 5, :])

    def nearest(stacks):
        # max frame-cosine per (utterance, keyword), argmax over keywords
        scores = np.stack(
            [
                np.einsum("bltd,lkd->blk", stacks, kw).max(axis=(1, 2))
                for kw in kws
            ],
            axis=1,
        )
        return scores.argmax(axis=1)

    np.testing.assert_array_equal(nearest(ref), nearest(got))


def test_quantize_unrolled_matches_stacked(setup):
    params, feats, _ = setup
    scales = calibrate_encoder_act_scales(params, feats, CFG)
    q_unrolled = quantize_encoder_layers(params, scales)
    q_stacked = quantize_encoder_layers(
        stack_whisper_params(jax.tree.map(jnp.asarray, params)), scales
    )
    a = jax.tree.leaves(q_unrolled["encoder"]["layers"])
    b = jax.tree.leaves(q_stacked["encoder"]["layers"])
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_calibration_shape_and_error(setup):
    params, feats, _ = setup
    scales = calibrate_encoder_act_scales(params, feats, CFG)
    assert scales.shape == (CFG.encoder_layers, len(_ENC_ACT_SITES))
    assert (scales > 0).all()
    with pytest.raises(ValueError):
        quantize_encoder_layers(params, scales[:-1])


def test_valid_frames_zeroing_int8(setup):
    params, feats, _ = setup
    qp = jax.device_put(quantize_encoder(params, feats, CFG))
    valid = np.array([7, 1500], np.int32)
    got = np.asarray(
        encoder_kws_stack(qp, feats, CFG, layer_slice=SLICE, valid_frames=valid)
    )
    assert (got[0, :, 7:, :] == 0).all()
    assert not (got[1, :, 7:, :] == 0).all()


def _write_wav(path, data, rate=16000):
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


def test_extract_hidden_states_encoder_int8_e2e(tmp_path):
    """--extract_hs --encoder_int8 end to end: int8 caches match the f32
    caches to quantization error (reference pipeline: utils.py:130-205)."""
    transformers = pytest.importorskip("transformers")
    import torch

    from enhance_cb_whisper_tpu.pipeline import extract_hidden_states

    ckpt = tmp_path / "ckpt"
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
    transformers.WhisperForConditionalGeneration(hf_config).save_pretrained(str(ckpt))

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(3):
        _write_wav(audio_dir / f"utt{i}.wav",
                   (rng.standard_normal(16000 + 4000 * i) * 0.1).astype(np.float32))

    extract_hidden_states(
        str(audio_dir), str(ckpt), str(tmp_path / "f32"),
        layer_slice=(1, 4), batch_size=2,
    )
    extract_hidden_states(
        str(audio_dir), str(ckpt), str(tmp_path / "int8"),
        layer_slice=(1, 4), batch_size=2, encoder_int8=True,
    )
    for i in range(3):
        a = np.load(tmp_path / "f32" / f"utt{i}.npy")
        b = np.load(tmp_path / "int8" / f"utt{i}.npy")
        assert a.shape == b.shape
        cos = (a * b).sum(-1)  # L2-normalized caches
        assert cos.min() > 0.999, (i, cos.min())

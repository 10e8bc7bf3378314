"""Offline dataset-build pipeline (reference src/utils.py + datasets/*/build.sh).

The embedding producer and audio-prep utilities, TPU-native:

* :func:`extract_hidden_states` — decode/resample audio on host (C++/scipy
  polyphase), mel + Whisper encoder ON DEVICE in batches (the reference
  runs one file at a time through torch, src/utils.py:174-205), keep layers
  [10:22], truncate to ceil(unpadded_frames/2), L2-normalize, save one
  ``.npy`` per file (readable alongside the reference's ``.bin``);
* :func:`cut_audios` — slice XML-defined segments out of WAVs (pydub
  replacement for wav inputs, src/utils.py:208-250);
* :func:`get_keywords_audios` — slice keyword spans from ``aligned.tsv``
  (src/utils.py:83-127);
* :func:`keyword_tts` — edge-tts synthesis; requires network + the
  ``edge_tts`` package and raises a clear error in zero-egress
  environments (src/utils.py:31-80).
"""

from __future__ import annotations

import os
import wave
from glob import glob
from math import ceil
from typing import List, Optional

import numpy as np

from .audio.io import load_audio_16k, read_wav
from .catalog.store import save_hidden_states
from .ops.mel import HOP_LENGTH, N_SAMPLES, log_mel_spectrogram


def find_audio_files(root: str, exts=(".wav", ".mp3", ".opus")) -> dict:
    """code -> path over 1-3 nesting levels (src/utils.py:161-170)."""
    out = {}
    for depth in ("*", "*/*", "*/*/*"):
        for ext in exts:
            for path in glob(os.path.join(root, depth + ext)):
                code = os.path.splitext(os.path.basename(path))[0]
                if code.startswith("audio-"):
                    code = code[len("audio-"):]
                out[code] = path
    return out


def extract_hidden_states(
    audios: str,
    whisper_ckpt: str,
    target: str,
    codes: Optional[str] = None,
    layer_slice=(10, 22),
    batch_size: int = 8,
    n_mels: Optional[int] = None,
    cache_dtype: str = "float32",
    encoder_int8: bool = False,
    compute_dtype: str = "float32",
):
    """Produce the hidden-state caches every dataset reads (src/utils.py:130-205).

    Batched device pipeline: decode+resample B files on host → pad each to
    30 s → one [B, n_mels, 3000] mel+encoder launch → per-file truncation to
    ``ceil(unpadded_mel_frames / 2)`` frames → L2-normalize → save.

    ``cache_dtype="float16"`` converts the stacks ON DEVICE before the
    host fetch, halving both the device→host bytes and the cache files
    (loaders upcast; the stacks are L2-normalized so the rounding is ~1e-3
    relative).  The reference stores f32 (utils.py:198-201) — keep the
    default for bit-parity caches.

    ``encoder_int8=True`` runs the s8×s8→s32 encoder (activation scales
    calibrated on this corpus's first batch, weights quantized HOST-side so
    only int8 bytes upload — models/whisper.py:quantize_encoder_layers).
    Approximate: caches differ from f32 at the quantization level (cosine
    ~1-1e-4 per frame on synthetic checks; validate on real audio before
    building production caches).  Pair with ``compute_dtype="bfloat16"``.
    """
    import jax
    import jax.numpy as jnp

    from .models.whisper import encoder_kws_stack, stack_whisper_params
    from .models.whisper_loader import load_whisper_from_pretrained

    assert os.path.isdir(audios), f"audio directory not found: {audios}"
    os.makedirs(target, exist_ok=True)

    config, params_host = load_whisper_from_pretrained(whisper_ckpt)
    n_mels = n_mels or config.num_mel_bins
    lo, hi = layer_slice

    out_dtype = jnp.dtype(cache_dtype)
    cdt = jnp.dtype(compute_dtype)

    wanted = None
    if codes is not None:
        with open(codes) as f:
            parsed = [line.split("\t")[0].strip().split(" ")[0].strip() for line in f]
        # substring matching is the reference's semantics (utils.py:175),
        # but a blank line would substring-match EVERY file and silently
        # extract the whole corpus — drop empties (an all-blank file still
        # means "no filter", like the reference)
        wanted = [c for c in parsed if c]
        if len(wanted) != len(parsed):
            print(f"ignoring {len(parsed) - len(wanted)} blank lines in {codes}")
        if not wanted:
            wanted = None

    files = find_audio_files(audios)
    items = [
        (code, path)
        for code, path in files.items()
        if wanted is None or any(c in code for c in wanted)
    ]

    def _load_padded(chunk):
        wavs, valid, keep = [], [], []
        for code, path in chunk:
            try:
                wav = load_audio_16k(path)
            except Exception as e:  # skip undecodable files (utils.py:203-205)
                print(f"{path}: {e}")
                continue
            wav = wav[:N_SAMPLES]
            # t_len = ceil(unpadded_mel_frames / 2) (utils.py:187)
            unpadded_frames = wav.shape[0] // HOP_LENGTH
            t_len = int(ceil(unpadded_frames / 2.0))
            if t_len == 0:
                # sub-hop audio would save a zero-frame cache that crashes
                # catalog construction later — skip like undecodable files
                print(f"{path}: audio shorter than one frame, skipped")
                continue
            valid.append(t_len)
            padded = np.zeros((N_SAMPLES,), np.float32)
            padded[: wav.shape[0]] = wav
            wavs.append(padded)
            keep.append(code)
        return wavs, valid, keep

    def _place_f32():
        # scan-over-layers layout: keeps the whisper-medium encoder HLO
        # small enough for the remote-compile relay (models/whisper.py)
        return stack_whisper_params(jax.tree.map(jnp.asarray, params_host))

    params = None
    if encoder_int8 and items:
        from .models.whisper import (
            calibrate_encoder_act_scales,
            quantize_encoder_layers,
        )

        # calibrate static activation scales on this corpus's first batch
        # (the f32 weights upload once for the calibration forward; the
        # int8 tree — quantized HOST-side — replaces them after)
        wavs0, _, _ = _load_padded(items[:batch_size])
        if wavs0:
            mel0 = jax.jit(lambda w: log_mel_spectrogram(w, n_mels=n_mels))(
                np.stack(wavs0)
            )
            scales = calibrate_encoder_act_scales(
                _place_f32(), mel0, config, dtype=cdt
            )
            params = jax.device_put(quantize_encoder_layers(params_host, scales))
    if params is None:
        params = _place_f32()

    # params as an explicit jit arg — closure capture embeds the encoder
    # weights as HLO literals (GBs of program text at whisper-medium; the
    # remote-compile relay drops it — decoding/generate.py)
    @jax.jit
    def _encode_batch(p, wavs, valid_frames):
        # mel INSIDE the jit: one device launch per batch — eager mel was
        # ~5 separate dispatches, each paying the relay round-trip
        mel = log_mel_spectrogram(wavs, n_mels=n_mels)
        stacks = encoder_kws_stack(
            p, mel, config, layer_slice=(lo, hi), valid_frames=valid_frames,
            dtype=cdt,
        )
        return stacks.astype(out_dtype)

    def encode(wavs, valid_frames):
        return _encode_batch(params, wavs, valid_frames)

    # pipelined producer loop: the host fetch of batch N is deferred until
    # two more launches are enqueued, so host-side decode/mel of batch N+1
    # overlaps the device encode of batch N and the relay round-trip is
    # amortized (same pattern as the eval engines' deferred fetches)
    in_flight = []

    def _drain(depth: int):
        while len(in_flight) > depth:
            codes_done, valid_done, dev = in_flight.pop(0)
            stacks = np.asarray(dev)  # f16 when cache_dtype says so
            for j, code in enumerate(codes_done):
                save_hidden_states(
                    os.path.join(target, code + ".npy"),
                    stacks[j, :, : valid_done[j], :],
                    dtype=stacks.dtype,
                )

    for i in range(0, len(items), batch_size):
        wavs, valid, keep = _load_padded(items[i : i + batch_size])
        if not wavs:
            continue
        # pad the batch to a fixed size so the encoder never recompiles
        while len(wavs) < batch_size:
            wavs.append(np.zeros((N_SAMPLES,), np.float32))
            valid.append(1)
        in_flight.append(
            (keep, valid, encode(np.stack(wavs), np.asarray(valid, np.int32)))
        )
        _drain(2)
        print(f"extracted {min(i + batch_size, len(items))}/{len(items)}")
    _drain(0)


def _write_wav(path: str, data: np.ndarray, rate: int):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((np.clip(data, -1, 1) * 32767).astype("<i2").tobytes())


def get_keywords_audios(wav: str, keywords: str, keywords_audios: str):
    """Cut keyword spans per aligned.tsv: ``keyword \\t source_utt \\t
    start_s \\t end_s`` (src/utils.py:83-127)."""
    assert os.path.isdir(wav), f"audio directory not found: {wav}"
    os.makedirs(keywords_audios, exist_ok=True)
    files = find_audio_files(wav, exts=(".wav",))
    with open(keywords) as f:
        metadata = []
        for line in f:
            parts = line.split("\t")
            metadata.append(
                {
                    "keyword": parts[0].strip(),
                    "source": parts[1].strip(),
                    "start": float(parts[2]),
                    "end": float(parts[3]),
                }
                if len(parts) == 4
                else None
            )
    zfill = len(str(len(metadata) - 1))
    for idx, m in enumerate(metadata):
        if m is None or m["start"] == m["end"]:
            continue
        data, rate = read_wav(files[m["source"]])
        lo, hi = int(m["start"] * rate), int(m["end"] * rate)
        _write_wav(
            os.path.join(keywords_audios, str(idx).zfill(zfill) + ".wav"), data[lo:hi], rate
        )


def cut_audios(wav: str, segments: str, segments_audios: str):
    """Slice XML-defined segments (src/utils.py:208-250)."""
    import xml.etree.ElementTree as ET

    assert os.path.isdir(wav)
    os.makedirs(segments_audios, exist_ok=True)
    files = find_audio_files(wav, exts=(".wav",))
    tree = ET.parse(segments)
    for doc in tree.getroot():
        code = doc.attrib["code"]
        data, rate = read_wav(files[code])
        for segment in doc:
            transcript = segment.find("current").text
            if not transcript or transcript.strip() == "":
                continue
            start, end = float(segment.attrib["start"]), float(segment.attrib["end"])
            if start == end:
                continue
            _write_wav(
                os.path.join(segments_audios, f"{code}-seg{segment.attrib['id']}.wav"),
                data[int(start * rate) : int(end * rate)],
                rate,
            )


def keyword_tts(
    tts_folder: str,
    keyword_file: str,
    locale: str,
    voice: Optional[str] = None,
    synthesize=None,   # (text, voice_name, out_path) -> None
    list_voices=None,  # (locale) -> [{"ShortName", "Name"}]
    max_retries: int = 3,
    rng=None,
):
    """Keyword speech synthesis (src/utils.py:31-80).

    Synthesis is injectable so the loop logic is testable offline; the
    default backend is edge-tts (networked hosts). Behaviors mirrored from
    the reference: resume by skipping indices with existing mp3s
    (utils.py:42,54); per-keyword voice from a two-column keyword file,
    else the explicit ``voice`` arg, else a random voice in the locale;
    zero-filled output names; a ``<keywords>_voice.txt`` dump of the chosen
    voices. One deliberate fix: the reference's retry loop is effectively
    single-attempt (``while True: except: continue / finally: break`` — the
    ``finally`` break overrides the continue, utils.py:67-74); here failures
    retry up to ``max_retries`` and then the keyword is skipped with a
    message (resumable on a later run).
    """
    import random

    assert os.path.isdir(tts_folder), (
        "the provided folder for storing the synthesized speech does not exist"
    )
    assert os.path.exists(keyword_file), "there is no file with keywords list"

    if synthesize is None or list_voices is None:
        try:
            import asyncio

            import edge_tts
        except ImportError as e:
            raise RuntimeError(
                "keyword_tts requires the edge-tts package and network egress "
                "(or injected synthesize/list_voices callables); this "
                "environment has neither. Run this stage on a networked host."
            ) from e

        def list_voices(locale):  # noqa: F811
            voices = asyncio.run(edge_tts.VoicesManager.create())
            return voices.find(Locale=locale)

        def synthesize(text, voice_name, out_path):  # noqa: F811
            asyncio.run(edge_tts.Communicate(text, voice_name).save(out_path))

    done = {
        int(os.path.splitext(os.path.basename(p))[0])
        for p in glob(os.path.join(tts_folder, "*.mp3"))
    }
    with open(keyword_file) as f:
        keywords = [
            {
                "keyword": line.split("\t")[0].strip(),
                "voice": line.split("\t")[1].strip() if len(line.split("\t")) != 1 else None,
                "idx": idx,
            }
            for idx, line in enumerate(f.readlines())
        ]
    zfill = len(str(len(keywords) - 1))
    todo = [k for k in keywords if k["idx"] not in done]

    def _find_voice(voices, short_name):
        for x in voices:
            if x["ShortName"] == short_name:
                return x
        raise ValueError(
            f"voice {short_name!r} is not available for locale {locale!r} "
            f"(have: {[x['ShortName'] for x in voices][:10]}...)"
        )

    l_voices = list_voices(locale)
    rng = rng or random
    for item in todo:
        if item["voice"] is None:
            v = rng.choice(l_voices) if voice is None else _find_voice(l_voices, voice)
        else:
            v = _find_voice(l_voices, item["voice"])
        out = os.path.join(tts_folder, str(item["idx"]).zfill(zfill) + ".mp3")
        for attempt in range(max_retries):
            try:
                synthesize(item["keyword"], v.get("Name", v["ShortName"]), out)
                # record the voice only for keywords actually synthesized
                item["voice"] = v["ShortName"]
                break
            except Exception as e:
                print(f"{item['keyword']}: {e}")
        else:
            print(f"{item['keyword']}: giving up after {max_retries} attempts")

    # dump keyword->voice metadata (utils.py:78-80).  The reference rewrites
    # the dump with only THIS run's rows, losing earlier assignments on
    # resumed runs (docs/PARITY.md #17) — merge with the existing file,
    # keeping keyword-file order.
    dump = (
        keyword_file
        if "voice" in os.path.basename(keyword_file)
        else os.path.splitext(keyword_file)[0] + "_voice.txt"
    )
    known = {}
    if os.path.exists(dump) and dump != keyword_file:
        with open(dump) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) == 2 and parts[1]:
                    known[parts[0]] = parts[1]
    known.update({k["keyword"]: k["voice"] for k in todo if k["voice"]})
    with open(dump, "w") as f:
        f.write(
            "\n".join(
                "\t".join([k["keyword"], known[k["keyword"]]])
                for k in keywords
                if k["keyword"] in known
            )
        )


def main(argv: Optional[List[str]] = None):
    import argparse

    from .runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()

    parser = argparse.ArgumentParser(description="Utilities for building datasets")
    parser.add_argument("--tts", action="store_true")
    parser.add_argument("--cut_audios", action="store_true")
    parser.add_argument("--extract_hs", action="store_true")
    parser.add_argument("-a", "--audios", type=str)
    parser.add_argument("-k", "--keywords", type=str)
    parser.add_argument("-t", "--target", type=str)
    parser.add_argument("-u", "--utterances", type=str, default="")
    parser.add_argument("-s", "--segments", type=str)
    parser.add_argument("-l", "--locale", type=str)
    parser.add_argument("-v", "--voice", type=str, default="")
    parser.add_argument("-w", "--whisper", type=str)
    parser.add_argument(
        "--cache_dtype", type=str, default="float32",
        choices=("float32", "float16"),
        help="float16 halves cache files + device-fetch bytes (loaders upcast)",
    )
    parser.add_argument(
        "--encoder_int8", action="store_true",
        help="s8xs8->s32 encoder (scales calibrated on the first batch); "
             "approximate caches — validate on real audio first",
    )
    parser.add_argument(
        "--compute_dtype", type=str, default="float32",
        choices=("float32", "bfloat16"),
        help="encoder intermediate dtype (pair bfloat16 with --encoder_int8)",
    )
    args = parser.parse_args(argv)

    if args.tts:
        keyword_tts(args.target, args.keywords, args.locale, args.voice or None)
    elif args.cut_audios:
        if args.segments:
            cut_audios(args.audios, args.segments, args.target)
        else:
            get_keywords_audios(args.audios, args.keywords, args.target)
    elif args.extract_hs:
        extract_hidden_states(
            args.audios, args.whisper, args.target,
            codes=args.utterances or None,
            cache_dtype=args.cache_dtype,
            encoder_int8=args.encoder_int8,
            compute_dtype=args.compute_dtype,
        )

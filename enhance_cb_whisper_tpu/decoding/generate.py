"""Whisper generation: shortform + longform seek-loop with contextual biasing.

TPU-native counterpart of ``PBAWhisper.generate``
(src/model/pba_whisper.py:17-475).  Architecture (SURVEY.md §7): all
data-dependent control flow — the 30 s seek loop, timestamp-driven seek
advance, temperature fallback, condition-on-prev bookkeeping — runs in a
thin host driver; everything per segment (encode, keyword spotting, prompt
prefill, beam/greedy decode) is a handful of jit-compiled functions with
static shapes, so nothing recompiles across segments.

Keyword spotting is injected as a callable exactly like the reference's
``keyword_spotting`` callback (pba_whisper.py:287,391): it receives the mel
segment and returns per-batch keyword token-id lists.
"""

from __future__ import annotations

import dataclasses
import logging
import os
import zlib
from functools import partial
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.whisper import (
    WhisperConfig,
    decoder_forward,
    encoder_forward,
    init_cache,
    precompute_cross_kv,
    quantize_decoder_layers,
    quantize_vocab_projection,
    stack_whisper_params,
)
from .beam import beam_search, greedy_search
from .logits_process import LogitsProcessorConfig
from .prompt import prepare_decoder_input_ids, segment_prev_tokens, strip_prompt

N_SEGMENT_FRAMES = 3000  # input_stride(2) * max_source_positions(1500)
TIME_PRECISION = 0.02
INPUT_STRIDE = 2

logger = logging.getLogger(__name__)


@dataclasses.dataclass(frozen=True)
class GenerationOptions:
    """Token ids + decoding knobs (from the HF generation config in real
    checkpoints; explicit here so tiny random test models can set them)."""

    decoder_start_token_id: int = 50258  # <|startoftranscript|>
    language_token_id: Optional[int] = None  # e.g. <|en|>
    # full language token set (generation_config.lang_to_id values): when
    # language_token_id is None and this is non-empty, the language is
    # DETECTED per utterance from the first 30 s window (HF
    # _retrieve_init_tokens -> detect_language semantics; the reference
    # inherits them, pba_whisper.py:276-291)
    lang_token_ids: Tuple[int, ...] = ()
    task_token_id: Optional[int] = None  # <|transcribe|>
    no_timestamps_token_id: int = 50363
    prev_sot_token_id: Optional[int] = 50361  # <|startofprev|>
    eos_token_id: int = 50257
    pad_token_id: int = 50257
    suppress_tokens: Tuple[int, ...] = ()
    begin_suppress_tokens: Tuple[int, ...] = ()
    max_initial_timestamp_index: int = 50
    num_beams: int = 1
    length_penalty: float = 1.0
    return_timestamps: bool = False
    condition_on_prev_tokens: bool = False
    temperature: Tuple[float, ...] = (0.0,)
    compression_ratio_threshold: Optional[float] = None
    logprob_threshold: Optional[float] = None
    no_speech_threshold: Optional[float] = None
    no_speech_token_id: int = 50362  # <|nospeech|>
    max_target_positions: int = 448

    def init_tokens(self, detected_lang_id: Optional[int] = None) -> List[int]:
        """[sot, lang?, task?, no_ts?] — ``detected_lang_id`` fills the
        language slot when ``language_token_id`` is unset (auto-detection);
        matching HF, no task token is implied by detection (HF appends
        transcribe only when language/task are EXPLICIT,
        generation_whisper.py _retrieve_init_tokens)."""
        toks = [self.decoder_start_token_id]
        lang = (
            self.language_token_id
            if self.language_token_id is not None
            else detected_lang_id
        )
        if lang is not None:
            toks.append(lang)
        if self.task_token_id is not None:
            toks.append(self.task_token_id)
        if not self.return_timestamps:
            toks.append(self.no_timestamps_token_id)
        return toks

    @property
    def needs_lang_detection(self) -> bool:
        return self.language_token_id is None and len(self.lang_token_ids) > 0


def _compression_ratio(tokens: Sequence[int], vocab_size: int) -> float:
    """zlib compression ratio over token bytes (high ratio == repetitive
    junk).  Byte width comes from the VOCAB SIZE, not the per-sequence max
    token — HF ``_retrieve_compression_ratio`` uses
    ``int(log2(vocab_size)/8)+1`` (verified vs transformers 4.57.6), so for
    real Whisper (vocab 51865 → width 2) a segment whose tokens all happen
    to be < 256 still gets 2-byte encoding.  A per-sequence width would
    change the ratio and flip temperature-fallback decisions
    (pba_whisper.py:425-442)."""
    if len(tokens) == 0:
        return 0.0
    length = int(np.log2(vocab_size) / 8) + 1
    raw = b"".join(int(t).to_bytes(length, "little") for t in tokens)
    return len(raw) / len(zlib.compress(raw))


def _resolve_topk_impl(d_model: int) -> str:
    """Pick the beam top-k lowering for these model dims.

    Round-3 on-chip A/B (docs/sweep_results_r3.jsonl): the sort-free
    iterative top-k (decoding/topk.py) wins decisively at whisper-tiny
    (the vocab sort was 59% of beam-decode device time) but measures
    slightly NEGATIVE at whisper-medium beam-5 b4 (15.67x vs lax.top_k's
    16.1x) where the decode loop is weight-read-bound.  Crossover placed
    at d_model 1024 (medium); ECW_BEAM_TOPK=iterative|sort forces either
    path (bit-identical outputs either way)."""
    impl = os.environ.get("ECW_BEAM_TOPK", "auto")
    if impl in ("iterative", "sort"):
        return impl
    return "iterative" if d_model < 1024 else "sort"


@dataclasses.dataclass
class _LongformRow:
    """Host-side longform decode state for ONE utterance (one batch slot).

    The fixed-batch path (`_generate_longform`) and the continuous-batching
    path (`generate_packed`) share the same per-window executor over lists
    of these — the only difference is who occupies the slots each window."""

    features: np.ndarray  # [1, n_mels, T] full-utterance mel (host)
    max_frames: int
    order: int = 0  # submission index (packed mode result routing)
    seek: int = 0
    segments: List[dict] = dataclasses.field(default_factory=list)
    condition: bool = False
    # language token detected from this row's FIRST window (auto-detect
    # mode only; None = not yet detected / detection off)
    lang_token_id: Optional[int] = None

    @property
    def done(self) -> bool:
        return self.seek >= self.max_frames


class WhisperGenerator:
    """Compiled-step Whisper generation around a fixed (config, params)."""

    def __init__(
        self,
        config: WhisperConfig,
        params: Dict[str, Any],
        dtype: Any = jnp.float32,
        prompt_buckets: Tuple[int, ...] = (8, 16, 32, 64, 128, 256, 448),
        matmul_precision: str = "default",
        scan_layers: bool = True,
        vocab_int8: bool = False,
        decoder_int8: bool = False,
        kv_cache_int8: bool = False,
        cross_kv_int8: bool = False,
        kv_staging: int = 0,
    ):
        """``matmul_precision``: 'default' lets the TPU MXU round matmul
        operands to bfloat16 — comparable to the TF32 regime the reference
        runs under on Ampere GPUs; 'highest' forces full f32 passes for
        strict cross-backend token parity at ~3-6x matmul cost.

        ``scan_layers`` (default) stacks the per-layer params and rolls the
        encoder/decoder layer loops into ``lax.scan`` — the traced HLO
        shrinks ~n_layers×, which is what lets whisper-medium-scale programs
        compile (the unrolled 24-layer program is dropped by the
        remote-compile relay; see models/whisper.py).

        Speculative decoding (a draft model amortizing the per-step weight
        read) was built, measured, and REMOVED in round 5 per the
        flash-attention rule: random-draft acceptance is a 2× slowdown vs
        int8 greedy, the ceiling over the best plain mode is 2.3×, and
        self-speculation (draft = prefix layers) breaks even only at
        α≥0.6 logit-lens agreement — docs/PERF.md keeps the full negative
        result and break-even model."""
        self.config = config
        if vocab_int8:
            # serving mode: weight-only int8 vocab projection — halves the
            # decode loop's dominant HBM read (models/whisper.py)
            params = quantize_vocab_projection(params)
        if decoder_int8:
            # serving mode: weight-only int8 for every decoder-layer linear
            # in the decode loop — halves the remaining per-step weight read
            # (quantized on host BEFORE device upload: int8 also cuts the
            # one-time relay transfer 4x; models/whisper.py)
            params = quantize_decoder_layers(params)
        self.params = jax.tree.map(jnp.asarray, params)
        if scan_layers:
            self.params = stack_whisper_params(self.params)
        self.scan_layers = scan_layers
        params = self.params
        self.dtype = dtype
        # input_stride(2) * max_source_positions mel frames per 30s segment
        self.n_segment_frames = INPUT_STRIDE * config.max_source_positions
        self.prompt_buckets = tuple(sorted(prompt_buckets))

        cfg = config
        self.matmul_precision = matmul_precision

        # Params are EXPLICIT jit arguments (threaded through ``ctx`` for
        # the decode loops), never closure captures: a closed-over device
        # array lowers as an HLO literal, and at whisper-medium scale the
        # embedded weights blow the program up to ~2.5 GB of HLO — which the
        # remote-compile relay drops (measured round 3; explicit args lower
        # to ~28 KB).  Passing the device-resident pytree per launch moves
        # zero bytes, and programs stop being keyed on weight VALUES, so
        # the persistent compile cache now hits across checkpoints.
        @jax.jit
        def _encode(p, mel):
            with jax.default_matmul_precision(matmul_precision):
                enc, _ = encoder_forward(p, mel, cfg, dtype=dtype)
                return enc

        @jax.jit
        def _cross_kv(p, enc):
            with jax.default_matmul_precision(matmul_precision):
                # int8 cross K/V (serving approximation): quantized once
                # per segment here, read int8 every decode step — halves
                # the per-step 1500-frame cross-K/V slab read
                return precompute_cross_kv(p, enc, cfg, int8=cross_kv_int8)

        def _decode_step(tokens, cache, ctx):
            with jax.default_matmul_precision(matmul_precision):
                logits, new_cache = decoder_forward(
                    ctx["params"],
                    tokens,
                    ctx["cross_kv"],
                    cfg,
                    cache=cache,
                    attention_mask=ctx["attn_mask"],
                    dtype=dtype,
                )
                return logits[:, -1], new_cache

        @partial(jax.jit, static_argnames=("max_length",))
        def _prefill(prompt_padded, prompt_len, ctx, max_length: int):
            """Run the (right-padded) prompt through a fresh cache.

            The cache is positioned at ``prompt_len - 1``: the decode loop's
            first step re-feeds the final prompt token (overwriting its own
            slot with identical K/V) and yields the logits for position
            ``prompt_len`` — this keeps the loop body uniform."""
            batch = prompt_padded.shape[0]
            cache = init_cache(cfg, batch, max_length, dtype=dtype,
                               stacked=scan_layers, kv_int8=kv_cache_int8,
                               staging_window=kv_staging)
            with jax.default_matmul_precision(matmul_precision):
                logits, cache = decoder_forward(
                    ctx["params"],
                    prompt_padded,
                    ctx["cross_kv"],
                    cfg,
                    cache=cache,
                    attention_mask=ctx["attn_mask"],
                    dtype=dtype,
                )
            cache["index"] = prompt_len - 1
            if kv_staging:
                # staged-write mode: the prompt lives in the big slab; the
                # decode loop's first step re-feeds the final prompt token
                # into staging slot 0, so the flush base excludes its
                # (identical) prefill copy at prompt_len - 1
                cache["base"] = prompt_len - 1
            # logits at the final prompt position predict the first generated
            # token — the slot the no-speech probability is read from (HF
            # WhisperNoSpeechDetection at begin_index)
            first_logits = jax.lax.dynamic_slice_in_dim(
                logits, prompt_len - 1, 1, axis=1
            )[:, 0]
            return cache, first_logits

        self._encode = lambda mel: _encode(self.params, mel)
        self._cross_kv_fn = lambda enc: _cross_kv(self.params, enc)
        self._encode_jit = _encode  # exposed for the no-recompile swap test
        self._decode_step = _decode_step
        self._prefill = _prefill
        self._vocab_int8 = bool(vocab_int8)
        self._decoder_int8 = bool(decoder_int8)
        # int8 self-attention KV cache (serving approximation): halves the
        # dominant per-step cache read of batched beam decode.  Requires
        # scan-over-layers.
        self._kv_cache_int8 = bool(kv_cache_int8)
        if kv_cache_int8 and not scan_layers:
            raise ValueError("kv_cache_int8 requires scan_layers=True")
        # staged cache writes (serving mode): the last <=W tokens live in a
        # small window buffer so the per-step big-slab read-modify-write
        # (47% of beam decode device time, docs/PERF.md round-5
        # attribution) amortizes /W.  Exact for bf16/f32 caches up to
        # softmax summation order; composes with kv_cache_int8 (window
        # tokens quantize at flush).
        self._kv_staging = int(kv_staging)
        if kv_staging and not scan_layers:
            raise ValueError("kv_staging requires scan_layers=True")
        # int8 cross-attention K/V (serving approximation, same per-token
        # exact-scale-factoring scheme as the self-attention cache)
        self._cross_kv_int8 = bool(cross_kv_int8)
        if cross_kv_int8 and not scan_layers:
            raise ValueError("cross_kv_int8 requires scan_layers=True")

    # ------------------------------------------------------------------ util

    def swap_params(self, params: Dict[str, Any]) -> None:
        """Hot checkpoint swap for serving: replace the weights WITHOUT
        recompiling anything.

        Every compiled program takes the weights as traced ARGUMENTS, never
        closure constants (see __init__), so a new checkpoint of the same
        architecture reuses every compiled program — through the
        remote-compile relay that is the difference between a ~16-35 min
        recompile and an instant swap (`runtime/compile_cache.py` covers
        the cross-process case; this covers in-process model updates, e.g.
        rolling out a fine-tune to a live server).  Replays the same
        serving preprocessing the constructor applied (weight-only int8
        quantization, scan-layer stacking) and refuses a checkpoint whose
        pytree structure or shapes differ (that would silently recompile).

        NOT synchronized with an in-flight decode: calling this from
        another thread mid-utterance would mix checkpoints across that
        utterance's segments (and mid-window across encode/decode).  Either
        quiesce first, or go through
        ``runtime.serving.TranscriptionService.swap_params``, which drains
        in-flight work on the worker thread before swapping (an epoch
        barrier)."""
        if self._vocab_int8:
            params = quantize_vocab_projection(params)
        if self._decoder_int8:
            params = quantize_decoder_layers(params)
        params = jax.tree.map(jnp.asarray, params)
        if self.scan_layers:
            params = stack_whisper_params(params)
        old = jax.tree.map(lambda x: (x.shape, x.dtype), self.params)
        new = jax.tree.map(lambda x: (x.shape, x.dtype), params)
        if old != new:
            raise ValueError(
                "swap_params: checkpoint architecture mismatch "
                "(pytree structure/shapes/dtypes differ — a swap would "
                "recompile; build a new WhisperGenerator instead)"
            )
        self.params = params

    def _bucket(self, n: int) -> int:
        for b in self.prompt_buckets:
            if n <= b:
                return b
        return self.prompt_buckets[-1]

    def _make_ctx(self, cross_kv, prompt_mask: np.ndarray, max_length: int, reps: int):
        """ctx pytree: cross KV + full-length attention mask.  The
        (self-attention) mask is tiled to batch*beams; the cross KV is NOT —
        beams of one batch item share the encoder output, and the decoder's
        cross attention folds the beam dim into its query axis instead
        (models/whisper.py:_decoder_layer), saving num_beams× of the
        dominant per-step HBM read.  Only pad positions INSIDE the prompt
        are masked; every slot at or past the true prompt length stays open
        — those cache slots are overwritten sequentially by the decode loop
        and the causal rule protects the not-yet-written ones."""
        batch, plen = prompt_mask.shape
        attn = np.ones((batch, max_length), dtype=np.int32)
        attn[:, :plen] = prompt_mask
        attn_t = jnp.asarray(np.repeat(attn, reps, axis=0))
        # params ride the ctx pytree into the prefill/decode-loop programs
        # as traced arguments (see __init__: closure capture would embed
        # them as HLO literals)
        return {"cross_kv": cross_kv, "attn_mask": attn_t, "params": self.params}

    def _detect_language_ids(
        self, cross_kv, batch: int, opts: GenerationOptions
    ) -> np.ndarray:
        """Per-row language token ids from one [sot] prefill over the given
        cross K/V — HF ``detect_language`` semantics (the reference inherits
        them via ``_set_language_and_task``, pba_whisper.py:276-291;
        transformers generation_whisper.py: decoder input = [sot], last-
        position logits masked to ``lang_to_id`` values, argmax).  Reuses
        the standard prefill executable (smallest prompt bucket), so
        detection adds no new compile when decoding also runs."""
        max_length = opts.max_target_positions
        bucket = min(self._bucket(1), max_length)
        padded = np.full((batch, bucket), opts.pad_token_id, dtype=np.int32)
        padded[:, 0] = opts.decoder_start_token_id
        pmask = np.ones((batch, 1), dtype=np.int32)
        ctx = self._make_ctx(cross_kv, pmask, max_length, 1)
        _, first_logits = self._prefill(jnp.asarray(padded), 1, ctx, max_length)
        logits = np.asarray(first_logits.astype(jnp.float32))
        # argmax over the language subset == HF's -inf mask + full argmax;
        # ascending ids preserve argmax's lowest-index tie order
        lang_ids = np.asarray(sorted(opts.lang_token_ids), dtype=np.int64)
        return lang_ids[np.argmax(logits[:, lang_ids], axis=-1)]

    def detect_language(
        self, input_features: np.ndarray, opts: GenerationOptions
    ) -> np.ndarray:
        """Public surface mirroring HF ``model.detect_language``: language
        token id per batch row, detected from the first 30 s window."""
        seg = np.asarray(input_features, dtype=np.float32)[
            :, :, : self.n_segment_frames
        ]
        segs = np.stack([self._pad_segment(seg[i : i + 1])[0] for i in range(seg.shape[0])])
        cross_kv = self._cross_kv_fn(self._encode(jnp.asarray(segs)))
        return self._detect_language_ids(cross_kv, seg.shape[0], opts)

    def _processors(self, opts: GenerationOptions) -> LogitsProcessorConfig:
        return LogitsProcessorConfig(
            suppress_tokens=tuple(opts.suppress_tokens),
            begin_suppress_tokens=tuple(opts.begin_suppress_tokens),
            no_timestamps_token_id=opts.no_timestamps_token_id,
            max_initial_timestamp_index=opts.max_initial_timestamp_index,
            return_timestamps=opts.return_timestamps,
            eos_token_id=opts.eos_token_id,
            vocab_size=self.config.vocab_size,
        )

    def _decode_prompted(
        self,
        cross_kv,
        decoder_input_ids: np.ndarray,
        attention_mask: Optional[np.ndarray],
        opts: GenerationOptions,
        return_timestamps: bool,
        temperature: float = 0.0,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Prefill the prompt, run beam/greedy/sampling to
        max_target_positions; returns (full sequences incl. prompt
        [B, max_len], scores [B], no_speech_probs [B])."""
        batch, plen = decoder_input_ids.shape
        max_length = opts.max_target_positions
        bucket = min(self._bucket(plen), max_length)
        padded = np.full((batch, bucket), opts.pad_token_id, dtype=np.int32)
        padded[:, :plen] = decoder_input_ids
        pmask = (
            np.asarray(attention_mask, dtype=np.int32)
            if attention_mask is not None
            else np.ones((batch, plen), dtype=np.int32)
        )

        opts_ts = dataclasses.replace(opts, return_timestamps=return_timestamps)
        processors = self._processors(opts_ts)

        # temperature>0 samples; callers follow HF generate_with_fallback,
        # which forces num_beams=1 on sampled rungs (docs/PARITY.md #13) —
        # num_beams>1 with temperature>0 here is the DIRECT generate API's
        # beam-sample (HF _beam_search(do_sample=True)), kept for parity
        use_sampling = temperature > 0.0
        K = opts.num_beams
        reps = K if K > 1 else 1
        ctx = self._make_ctx(cross_kv, pmask, max_length, reps)
        prompt_padded = jnp.asarray(np.repeat(padded, reps, axis=0))
        cache, first_logits = self._prefill(prompt_padded, plen, ctx, max_length)
        if K > 1 and os.environ.get("ECW_BEAM_CACHE", "ancestry") != "gather":
            # gather-free beam cache: identity ancestry map (all beam rows
            # hold the identical prompt prefill); the beam loop re-parents
            # it per step instead of reordering the K/V slabs — at
            # whisper-large-v2 dims that removes ~2/3 of the beam step's
            # HBM traffic (models/whisper.py:_ancestry_attention).
            # ECW_BEAM_CACHE=gather forces the legacy reorder path (A/B
            # benchmarking and regression tests only)
            cache = dict(
                cache,
                anc=jnp.asarray(
                    np.ascontiguousarray(
                        np.broadcast_to(
                            np.arange(K, dtype=np.int32)[None, :, None],
                            (batch, K, max_length),
                        )
                    )
                ),
            )
        # compute AND fetch the no-speech probability only when a threshold
        # will read it: the softmax itself is an eager relay dispatch per
        # segment, and the flagship config (no_speech_threshold=None) never
        # looks at it
        if opts.no_speech_threshold is not None:
            no_speech_probs = np.asarray(
                jax.nn.softmax(first_logits.astype(jnp.float32), -1)[
                    ::reps, opts.no_speech_token_id
                ]
            )
        else:
            no_speech_probs = np.zeros((batch,), np.float32)

        prompt_dev = jnp.asarray(padded)
        if K == 1:
            seqs, scores = greedy_search(
                self._decode_step,
                prompt_dev,
                plen,
                cache,
                ctx,
                processors,
                max_length=max_length,
                pad_token_id=opts.pad_token_id,
                eos_token_id=opts.eos_token_id,
                do_sample=use_sampling,
                temperature=float(temperature) if use_sampling else 1.0,
                rng=rng,
            )
        else:
            seqs, scores = beam_search(
                self._decode_step,
                prompt_dev,
                plen,
                cache,
                ctx,
                processors,
                num_beams=K,
                max_length=max_length,
                length_penalty=opts.length_penalty,
                pad_token_id=opts.pad_token_id,
                eos_token_id=opts.eos_token_id,
                do_sample=use_sampling,
                temperature=float(temperature) if use_sampling else 1.0,
                rng=rng,
                # dims-conditional default (round-3 sweep, docs/PERF.md):
                # the sort-free top-k wins hugely at tiny dims (the vocab
                # sort was 59% of device time) but is slightly NEGATIVE at
                # whisper-medium (15.67x vs 16.1x — the loop there is
                # weight-read-bound, so k max+mask passes over V cost more
                # than the now-minor sort). ECW_BEAM_TOPK=iterative|sort
                # overrides for A/B — both paths are bit-identical.
                topk_impl=_resolve_topk_impl(self.config.d_model),
            )
        return np.asarray(seqs), np.asarray(scores), no_speech_probs

    # ------------------------------------------------------------- shortform

    def generate(
        self,
        input_features: np.ndarray,  # [B, n_mels, T]
        opts: GenerationOptions,
        attention_mask: Optional[np.ndarray] = None,
        keyword_spotting: Optional[Callable] = None,
        return_segments: bool = False,
        encode_spot: Optional[Callable] = None,
    ):
        """Top-level generate — dispatches shortform vs longform on total mel
        frames exactly like pba_whisper.py:246-251.

        ``encode_spot(segment_mels, start_of_prev=False) -> (keyword_tokens,
        encoding | None)`` is the single-encode fusion hook: when the KWS
        encoder shares the ASR checkpoint, one encoder forward produces both
        the KWS layer stack and the decoder's cross-attention input (the
        reference encodes every segment twice — cb_whisper.py:72 plus
        generate's internal encoder).  A ``None`` encoding falls back to the
        generator's own encoder (e.g. after a spotting failure)."""
        total_frames = input_features.shape[-1]
        if total_frames <= self.n_segment_frames and input_features.shape[0] == 1:
            # the reference's shortform surface is single-utterance
            # (pba_whisper.py:284-285); a BATCH of <=30s utterances takes
            # the longform driver instead of raising — one masked window
            # per row, the same processing the packed scheduler applies
            return self._generate_shortform(
                input_features, opts, keyword_spotting, encode_spot
            )
        return self._generate_longform(
            input_features, opts, attention_mask, keyword_spotting,
            return_segments, encode_spot,
        )

    def _generate_shortform(self, input_features, opts, keyword_spotting, encode_spot=None):
        if input_features.shape[0] != 1:
            raise ValueError("shortform biased generation is single-utterance (pba_whisper.py:284-285)")
        padded_seg = self._pad_segment(input_features)
        enc = None
        if encode_spot is not None:
            tokens_per_seg, enc = encode_spot(padded_seg, start_of_prev=True)
            prompt_ids = list(tokens_per_seg[0])
        elif keyword_spotting is not None:
            # padded like the encode_spot branch: the KWS encoder is
            # fixed-shape (3000 mel frames), and a shorter mel would both
            # recompile and break position-embedding broadcasting
            prompt_ids = list(keyword_spotting(input_features=padded_seg, start_of_prev=True)[0])
        else:
            prompt_ids = []

        if enc is None:
            enc = self._encode(jnp.asarray(padded_seg))
        cross_kv = self._cross_kv_fn(enc)
        detected = None
        if opts.needs_lang_detection:
            detected = int(self._detect_language_ids(cross_kv, 1, opts)[0])
        decoder_ids = np.asarray(
            [prompt_ids + opts.init_tokens(detected)], dtype=np.int64
        )
        seqs, _, _ = self._decode_prompted(
            cross_kv, decoder_ids, None, opts, return_timestamps=opts.return_timestamps,
        )
        return strip_prompt(seqs, len(prompt_ids))

    # -------------------------------------------------------------- longform

    def _pad_segment(self, seg: np.ndarray) -> np.ndarray:
        t = seg.shape[-1]
        if t == self.n_segment_frames:
            return np.asarray(seg, dtype=np.float32)
        pad = self.n_segment_frames - t
        return np.pad(np.asarray(seg, dtype=np.float32), ((0, 0), (0, 0), (0, pad)))

    def _run_longform_window(
        self,
        rows: List[Optional[_LongformRow]],
        opts: GenerationOptions,
        keyword_spotting,
        encode_spot,
        prev_enabled: bool,
        condition_any: bool,
        segment_idx: int,
        fixed_prompt: bool = False,
        fixed_keywords: bool = True,
    ) -> None:
        """Execute ONE 30 s window over the occupied batch slots.

        ``rows[j] is None`` marks a VACANT slot (packed mode at the stream
        tail): it decodes a zero mel with an empty prompt so the launch
        keeps its static batch width, is excluded from the temperature
        fallback ladder, and its outputs are discarded.

        ``prev_enabled`` is the caller's condition-on-prev window gate: the
        fixed-batch path passes HF's row-0 rule (``len(current_segments[0])
        > 0`` — generation_whisper ``_prepare_decoder_input_ids`` /
        pba_whisper.py:524, replicated for token parity,
        tests/test_prompt_differential.py); the packed path passes True so
        each utterance conditions on exactly its own history (== its own
        batch-1 decode).  ``condition_any`` mirrors the fixed-batch path's
        ``any(condition_flags)`` over ALL utterances (finished included)."""
        timestamp_begin = opts.no_timestamps_token_id + 1
        n_mels = self.config.num_mel_bins
        zero_seg = np.zeros((n_mels, self.n_segment_frames), np.float32)

        seek_num_frames = [
            0 if r is None else min(r.max_frames - r.seek, self.n_segment_frames)
            for r in rows
        ]
        seg = np.stack(
            [
                zero_seg
                if r is None
                else self._pad_segment(
                    r.features[:, :, r.seek : r.seek + seek_num_frames[j]]
                )[0]
                for j, r in enumerate(rows)
            ]
        )

        # vacant padding slots must not feed lazy int8 calibration — pass the
        # real-row mask to hooks that accept it (CBWhisper's do; plain test
        # callables need not)
        hook_kwargs = {}
        if any(r is None for r in rows):
            real = [r is not None for r in rows]
            hook = encode_spot if encode_spot is not None else keyword_spotting
            if hook is not None:
                import inspect

                try:
                    if "real_rows" in inspect.signature(hook).parameters:
                        hook_kwargs["real_rows"] = real
                except (TypeError, ValueError):
                    pass

        enc = None
        if encode_spot is not None:
            keywords_tokens, enc = encode_spot(seg, **hook_kwargs)
        elif keyword_spotting is not None:
            keywords_tokens = keyword_spotting(input_features=seg, **hook_kwargs)
        else:
            keywords_tokens = [[] for _ in rows]
        keywords_tokens = [
            [] if r is None else keywords_tokens[j] for j, r in enumerate(rows)
        ]

        prev_tokens = [
            (
                [
                    t
                    for s in r.segments
                    for t in segment_prev_tokens(s, timestamp_begin)
                ]
                if r is not None and r.condition
                else None
            )
            for r in rows
        ]
        use_prev = prev_enabled and any(
            p is not None and len(p) > 0 for p in prev_tokens
        )

        if enc is None:
            enc = self._encode(jnp.asarray(seg))
        cross_kv = self._cross_kv_fn(enc)

        # language auto-detection (language=None + lang_to_id set): each
        # row is detected ONCE, on its own first window (seek == 0 —
        # frames [0:3000], exactly HF's detect_language operand), then the
        # token rides the row for the rest of its utterance.  Packed mode
        # admits rows at different windows; detection stays per-row exact,
        # so transcripts remain schedule-independent (PARITY #25).
        init_tokens: Any = opts.init_tokens()
        if opts.needs_lang_detection:
            todo = [
                j for j, r in enumerate(rows)
                if r is not None and r.lang_token_id is None
            ]
            if todo:
                detected = self._detect_language_ids(cross_kv, len(rows), opts)
                for j in todo:
                    rows[j].lang_token_id = int(detected[j])
            # vacant slots decode a zero mel and are discarded — any valid
            # language token keeps their prompt row the same width
            fill = sorted(opts.lang_token_ids)[0]
            init_tokens = [
                opts.init_tokens(fill if r is None else r.lang_token_id)
                for r in rows
            ]

        decoder_ids, attn = prepare_decoder_input_ids(
            init_tokens=init_tokens,
            keywords_tokens=keywords_tokens,
            prev_tokens_per_batch=prev_tokens if use_prev else None,
            condition_on_prev=condition_any,
            max_target_positions=opts.max_target_positions,
            pad_token_id=opts.pad_token_id,
            prev_sot_token_id=opts.prev_sot_token_id,
            fixed_width=fixed_prompt,
            fixed_keywords=fixed_keywords,
        )

        cond_local = [False if r is None else r.condition for r in rows]
        seqs, scores, should_skip = self._generate_with_fallback(
            cross_kv, decoder_ids, attn, opts, cond_local,
            list(range(len(rows))),
            segment_idx=segment_idx,
            vacant=[r is None for r in rows],
        )

        plen = decoder_ids.shape[1]
        for j, r in enumerate(rows):
            if r is None:
                continue
            r.condition = cond_local[j]
            if should_skip[j]:
                # silence detected: drop the segment, advance the window
                r.seek += seek_num_frames[j]
                continue
            seek_seq = self._trim_generated(seqs[j, plen:], opts)
            time_offset = r.seek * TIME_PRECISION / INPUT_STRIDE
            segments, segment_offset = self._retrieve_segment(
                seek_seq,
                float(time_offset),
                timestamp_begin,
                int(seek_num_frames[j]),
            )
            r.segments += segments
            r.seek += segment_offset

    def _generate_longform(
        self, input_features, opts, attention_mask, keyword_spotting,
        return_segments, encode_spot=None,
    ):
        batch = input_features.shape[0]
        total = input_features.shape[-1]
        if attention_mask is not None:
            max_frames = np.asarray(attention_mask).sum(-1).astype(np.int64)
        else:
            max_frames = np.full((batch,), total, dtype=np.int64)
        rows = [
            _LongformRow(
                features=input_features[i : i + 1],
                max_frames=int(max_frames[i]),
                order=i,
                condition=opts.condition_on_prev_tokens,
            )
            for i in range(batch)
        ]

        segment_idx = 0
        while any(not r.done for r in rows):
            segment_idx += 1
            self._run_longform_window(
                [r for r in rows if not r.done],
                opts,
                keyword_spotting,
                encode_spot,
                # HF / reference row-0 conditioning gate (see window docstring)
                prev_enabled=len(rows[0].segments) > 0,
                condition_any=any(r.condition for r in rows),
                segment_idx=segment_idx,
            )

        sequences = self._pad_sequences_right(
            [[t for s in r.segments for t in s["tokens"]] for r in rows],
            opts.pad_token_id,
        )
        if return_segments:
            return {"sequences": sequences, "segments": [r.segments for r in rows]}
        return sequences

    def generate_packed(
        self,
        stream,
        opts: GenerationOptions,
        slots: int = 4,
        keyword_spotting: Optional[Callable] = None,
        encode_spot: Optional[Callable] = None,
        return_segments: bool = False,
    ):
        """Continuous-batching longform decode over an utterance STREAM.

        Serving-throughput scheduler the reference (batch-1 eval,
        cb_whisper.py:212-289) has no counterpart for: ``slots`` utterances
        decode as one batch, and whenever one finishes its slot is refilled
        from the stream on the next window — the device stays at full batch
        width across a heterogeneous-length corpus instead of draining to
        batch 1 at every group tail.  Because every launch has the SAME
        batch width, the whole corpus runs on one compiled program family
        (per prompt bucket) — the fixed-batch path compiles a fresh program
        for every distinct shrunken batch size, which costs minutes per
        size through the remote-compile relay.

        ``stream`` yields ``(features [1|None, n_mels, T], attention_mask
        or None)``.  Yields ``(order, result)`` tuples as utterances
        COMPLETE — not in submission order; ``order`` is the 0-based
        submission index.  ``result`` is the 1-D token array of the
        utterance's concatenated segments (or a ``{"sequences", "segments"}``
        dict with ``return_segments``).

        Live-serving protocol (runtime/serving.py): the stream may yield
        ``None`` meaning "no utterance available right now" — the scheduler
        stops refilling for the current window and keeps decoding the
        in-flight rows instead of stalling them on future work; it asks the
        stream again next window.  Only ``StopIteration`` marks the stream
        exhausted.  A stream must not yield ``None`` while NOTHING is in
        flight (the scheduler would spin); a live stream should block in
        that case until work arrives or it ends.

        SCHEDULE-INDEPENDENT transcripts: under the HF/reference prompt
        layout a row's token positions and decode budget move with the
        longest prompt in its batch, so joint decode depends on batch
        composition.  The packed path therefore (a) conditions PER ROW
        (each utterance on exactly its own history — no HF row-0 window
        gate), and (b) when prompts can vary (spotting configured or
        conditioning on) switches to the FIXED-WIDTH prompt layout
        (prompt.py:prepare_decoder_input_ids fixed_width): every row's
        kw/prev fields pad to the full reference budget split, so its
        prompt positions and budget are a function of its OWN content only.
        Result: ``slots=N`` output is token-identical to ``slots=1`` for
        every utterance, whatever the schedule (tests/test_packed_decode.py)
        — and every launch shares ONE prompt bucket, so a whole corpus
        compiles once per model.  Without spotting/conditioning the prompt
        is the bare init for every row and the output also equals the plain
        batch-1 ``generate`` for longform utterances (single-window
        utterances always take the longform SEGMENT surface here, not the
        reference's single-utterance shortform surface — PARITY #25).
        int8 spotting calibration happens on the
        first scored windows, when all slots hold real audio — vacant
        zero-mel slots only ever appear at the stream tail."""
        it = iter(stream)
        exhausted = False
        order = 0
        slots = max(1, int(slots))  # 0 slots would spin without admitting
        occupied: List[Optional[_LongformRow]] = [None] * slots
        ready: List[Tuple[int, Any]] = []

        def _empty_result():
            if return_segments:
                return {"sequences": np.zeros((0,), np.int64), "segments": []}
            return np.zeros((0,), np.int64)

        def _refill():
            nonlocal exhausted, order
            for s in range(slots):
                while occupied[s] is None and not exhausted:
                    try:
                        item = next(it)
                    except StopIteration:
                        exhausted = True
                        break
                    if item is None:
                        # live stream: nothing available right now — decode
                        # the in-flight rows, ask again next window
                        return
                    features, attention_mask = item
                    features = np.asarray(features, np.float32)
                    if features.ndim == 2:
                        features = features[None]
                    max_frames = features.shape[-1]
                    if attention_mask is not None:
                        max_frames = min(
                            max_frames, int(np.asarray(attention_mask).sum())
                        )
                    if max_frames <= 0:
                        # zero-length utterance: complete it without a slot
                        ready.append((order, _empty_result()))
                        order += 1
                        continue
                    occupied[s] = _LongformRow(
                        features=features,
                        max_frames=max_frames,
                        order=order,
                        condition=opts.condition_on_prev_tokens,
                    )
                    order += 1

        segment_idx = 0
        while True:
            # results first, refill second: a live stream (runtime/serving)
            # decides whether to block on its queue by counting in-flight
            # work, so completions must reach it before the next pull
            yield from ready
            ready.clear()
            _refill()
            yield from ready  # zero-length utterances admitted just now
            ready.clear()
            if not any(r is not None for r in occupied):
                if exhausted:
                    break
                continue  # live stream was idle; ask it again
            segment_idx += 1
            self._run_longform_window(
                occupied,
                opts,
                keyword_spotting,
                encode_spot,
                prev_enabled=True,
                # static flag (not any(row.condition)): the fixed-width
                # budget split must not depend on who occupies the slots
                condition_any=opts.condition_on_prev_tokens,
                segment_idx=segment_idx,
                fixed_prompt=(
                    keyword_spotting is not None
                    or encode_spot is not None
                    or opts.condition_on_prev_tokens
                ),
                # static per call: with no spotter the keyword field is
                # dropped so prev history keeps the full reference budget
                fixed_keywords=(
                    keyword_spotting is not None or encode_spot is not None
                ),
            )
            for s in range(slots):
                r = occupied[s]
                if r is not None and r.done:
                    tokens = np.asarray(
                        [t for seg in r.segments for t in seg["tokens"]],
                        np.int64,
                    )
                    result = (
                        {"sequences": tokens, "segments": r.segments}
                        if return_segments
                        else tokens
                    )
                    ready.append((r.order, result))
                    occupied[s] = None

    @staticmethod
    def _take_rows(tree, rows: List[int]):
        """Slice the batch axis of a cross-KV/attn pytree: K/V leaves are
        [B, T, H, Dh] (unrolled) or [L, B, T, H, Dh] (stacked) — the batch
        axis sits at ndim-4 either way; 3-D leaves are the stacked int8
        per-token scales [L, B, T] (batch axis 1); 2-D leaves (prompt/attn
        masks) slice their leading axis."""
        idx = np.asarray(rows)

        def take(x):
            if hasattr(x, "ndim") and x.ndim >= 4:
                return jnp.take(x, jnp.asarray(idx), axis=x.ndim - 4)
            if hasattr(x, "ndim") and x.ndim == 3:
                return jnp.take(x, jnp.asarray(idx), axis=1)
            if hasattr(x, "ndim") and x.ndim == 2:
                return x[idx]
            return x

        return jax.tree.map(take, tree)

    def _need_fallback(self, gen_with_eos, score, no_speech_prob, opts,
                       num_beams_used: int):
        """HF ``_need_fallback`` on one row (generation_whisper.py; the
        reference inherits it verbatim from transformers 4.37.2).

        ``gen_with_eos`` keeps the trailing eos: both the zlib compression
        ratio and the avg-logprob denominator count it (HF strips eos only
        AFTER this check).  Beam scores are sequences_scores (already
        length-normalized); greedy/sampled scores are the logprob sum over
        generated tokens incl. eos."""
        avg_lp = (
            float(score)
            if num_beams_used > 1
            else float(score) / max(len(gen_with_eos), 1)
        )
        fallback, skip = False, False
        if opts.compression_ratio_threshold is not None:
            ratio = _compression_ratio(gen_with_eos, self.config.vocab_size)
            if ratio > opts.compression_ratio_threshold:
                fallback = True
        if opts.logprob_threshold is not None and avg_lp < opts.logprob_threshold:
            fallback = True
        if opts.no_speech_threshold is not None:
            if float(no_speech_prob) > opts.no_speech_threshold and (
                opts.logprob_threshold is None or avg_lp < opts.logprob_threshold
            ):
                fallback = False
                skip = True
        return fallback, skip

    def _generate_with_fallback(self, cross_kv, decoder_ids, attn, opts,
                                condition_flags, active, segment_idx: int = 0,
                                vacant: Optional[List[bool]] = None):
        """Temperature fallback ladder (pba_whisper.py:425-442 → HF
        ``generate_with_fallback``): retry with increasing sampling
        temperature while the output is repetitive (zlib compression ratio)
        or low-confidence (mean logprob); a segment whose no-speech
        probability exceeds the threshold with low logprob is SKIPPED.  With
        the reference's flagship settings (temperature=0, no thresholds)
        this is a single deterministic pass.

        HF semantics (verified against the installed transformers and the
        reference's pinned 4.37.2 behavior):
        * only rows that still need fallback are re-decoded
          (``fallback_index_map``) — passing rows keep their earlier result;
        * sampled rungs (temperature>0) force ``num_beams=1`` multinomial
          sampling (docs/PARITY.md #13 — NOT beam-sample);
        * per row, conditioning for the NEXT segment follows the rung that
          produced the kept result: ``condition_on_prev and temperature <
          0.5`` (re-evaluated every segment, re-enabling included);
        * the last rung's result is kept even if it still fails.
        ``should_skip`` is tracked per ORIGINAL row (HF's in-place
        ``should_skip[i]`` indexes the shrunken retry batch — a known
        upstream misalignment; docs/PARITY.md #14)."""
        B, plen = decoder_ids.shape
        kept_seqs: List[Optional[np.ndarray]] = [None] * B
        kept_scores = np.zeros((B,), np.float32)
        should_skip = [False] * B
        fallback_map = list(range(B))  # original row of each current row
        cur_cross_kv, cur_ids, cur_attn = cross_kv, decoder_ids, attn
        for ti, temperature in enumerate(opts.temperature):
            do_sample = temperature is not None and float(temperature) > 0.0
            # HF forces num_beams=1 on sampled rungs (OpenAI whisper
            # semantics: beam search only at temperature 0)
            opts_rung = (
                dataclasses.replace(opts, num_beams=1) if do_sample else opts
            )
            seqs, scores, no_speech = self._decode_prompted(
                cur_cross_kv, cur_ids, cur_attn, opts_rung,
                return_timestamps=opts.return_timestamps,
                temperature=float(temperature or 0.0),
                # decorrelate retries across segments — a fixed per-rung key
                # would replay the same noise at every segment
                rng=jax.random.fold_in(jax.random.PRNGKey(ti), segment_idx),
            )
            new_map: List[int] = []
            new_rows: List[int] = []
            for row in range(seqs.shape[0]):
                orig = fallback_map[row]
                gen_eos = self._trim_generated(seqs[row, plen:], opts,
                                               keep_eos=True)
                fallback, skip = self._need_fallback(
                    gen_eos, scores[row], no_speech[row], opts,
                    opts_rung.num_beams,
                )
                if vacant is not None and vacant[orig]:
                    # packed-mode padding slot: its zero-mel output must
                    # never drive extra fallback rungs (it is discarded)
                    fallback, skip = False, False
                kept_seqs[orig] = seqs[row]
                kept_scores[orig] = float(scores[row])
                should_skip[orig] = skip
                # conditioning rule follows the rung that produced the KEPT
                # result (HF: condition_on_prev and is_low_temperature)
                condition_flags[active[orig]] = bool(
                    opts.condition_on_prev_tokens
                    and (temperature is None or float(temperature) < 0.5)
                )
                if fallback:
                    new_map.append(orig)
                    new_rows.append(row)
            fallback_map = new_map
            if not fallback_map or ti == len(opts.temperature) - 1:
                break
            # re-decode ONLY the rows that still need fallback
            cur_ids = cur_ids[new_rows]
            cur_attn = cur_attn[new_rows] if cur_attn is not None else None
            cur_cross_kv = self._take_rows(cur_cross_kv, new_rows)
        return np.stack(kept_seqs), kept_scores, should_skip

    @staticmethod
    def _trim_generated(tokens: np.ndarray, opts: GenerationOptions,
                        keep_eos: bool = False) -> List[int]:
        """Strip TRAILING padding, then the final eos unless ``keep_eos``
        (HF generate_with_fallback: padding removed with eos kept for the
        fallback metrics, eos stripped afterwards for segmentation).  A pad
        token emitted MID-sequence is kept, like HF."""
        out = tokens.tolist()
        n_trail = 0
        while n_trail < len(out) and out[-1 - n_trail] == opts.pad_token_id:
            n_trail += 1
        if opts.pad_token_id == opts.eos_token_id and n_trail > 0:
            n_trail -= 1  # the final "pad" is the eos itself — keep it here
        if n_trail:
            out = out[:-n_trail]
        if not keep_eos and out and out[-1] == opts.eos_token_id:
            out.pop()
        return [int(t) for t in out]

    @staticmethod
    def _retrieve_segment(
        seek_sequence: List[int],
        time_offset: float,
        timestamp_begin: int,
        seek_num_frames: int,
    ) -> Tuple[List[dict], int]:
        """Timestamp-driven segmentation + seek advance
        (HF ``_retrieve_segment``, used at pba_whisper.py:452-465)."""
        seq = np.asarray(seek_sequence, dtype=np.int64)
        ts_mask = seq >= timestamp_begin
        if seq.size == 0:
            return [], seek_num_frames
        single_timestamp_ending = (
            seq.size >= 2 and not ts_mask[-2] and ts_mask[-1]
        )
        consecutive = np.where(ts_mask[:-1] & ts_mask[1:])[0] + 1

        if consecutive.size > 0:
            slices = consecutive.tolist()
            if single_timestamp_ending:
                slices.append(seq.size)
            else:
                # include the closing timestamp of the final pair in the last
                # segment (HF marks "no single ending" this way)
                slices[-1] += 1
            segments = []
            last_slice = 0
            for i, current_slice in enumerate(slices):
                is_last = i == len(slices) - 1
                sliced = seq[last_slice:current_slice]
                start_pos = int(sliced[0]) - timestamp_begin
                end_idx = -1 if (not is_last or single_timestamp_ending) else -2
                end_pos = int(sliced[end_idx]) - timestamp_begin
                segments.append(
                    {
                        "start": time_offset + start_pos * TIME_PRECISION,
                        "end": time_offset + end_pos * TIME_PRECISION,
                        "tokens": sliced.tolist(),
                    }
                )
                last_slice = current_slice
            if single_timestamp_ending:
                segment_offset = seek_num_frames
            else:
                # seek to the last "end of segment" timestamp (first of the
                # closing pair), discarding the unfinished tail
                last_ts_pos = int(seq[last_slice - 2]) - timestamp_begin
                segment_offset = last_ts_pos * INPUT_STRIDE
        else:
            timestamps = seq[ts_mask]
            # HF computes int(snf * time_precision_features / time_precision)
            # in FLOAT32 (torch promotes int64 tensor × python float to f32)
            # — truncation artifacts differ from exact snf // 2 in both
            # directions (snf=1686 → 842, snf=1756 → 878); replicate the f32
            # arithmetic for segment-end parity
            # (tests/test_segment_differential.py found the divergences)
            last_ts_pos = int(
                np.float32(seek_num_frames)
                * np.float32(TIME_PRECISION / INPUT_STRIDE)
                / np.float32(TIME_PRECISION)
            )
            if timestamps.size > 0 and int(timestamps[-1]) != timestamp_begin:
                last_ts_pos = int(timestamps[-1]) - timestamp_begin
            segments = [
                {
                    "start": time_offset,
                    "end": time_offset + last_ts_pos * TIME_PRECISION,
                    "tokens": seq.tolist(),
                }
            ]
            segment_offset = seek_num_frames

        if segment_offset <= 0:
            # deliberate deviation (docs/PARITY.md #19): NEITHER HF nor the
            # reference clamps here — a closing timestamp pair at position 0
            # yields offset 0 and stalls their seek loop forever; we advance
            # the full window instead
            segment_offset = seek_num_frames
        return segments, segment_offset

    @staticmethod
    def _pad_sequences_right(seqs: List[List[int]], pad_token_id: int) -> np.ndarray:
        max_len = max((len(s) for s in seqs), default=0)
        out = np.full((len(seqs), max_len), pad_token_id, dtype=np.int64)
        for i, s in enumerate(seqs):
            out[i, : len(s)] = s
        return out

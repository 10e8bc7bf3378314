"""CB-Whisper: contextual-biasing ASR with on-the-fly keyword spotting.

TPU-native counterpart of the reference's ``CBWhisper`` module
(src/model/cb_whisper.py:20-289): a Whisper generator whose decoder prompt
is built per 30 s segment from keywords detected by the KWS classifier over
the segment's encoder hidden states.

Key architectural deltas vs the reference (SURVEY.md §7):

* the keyword database is a device-resident :class:`KeywordCatalog`; each
  segment scores against the ENTIRE catalog in one launch instead of a
  Python loop over groups of 100 (cb_whisper.py:110-129);
* when the KWS encoder checkpoint equals the ASR checkpoint, the segment is
  encoded ONCE — the layer stack feeds KWS and the final layer feeds the
  decoder's cross-attention (the reference runs two encoder forwards per
  segment, cb_whisper.py:72 + generate's own encoder);
* the generate seek loop is the compiled-step host driver of
  :mod:`..decoding.generate`.

Tokenization is injected (``prompt_ids_fn`` / ``decode_fn``) so the module
stays independent of HF; the CLI wires a local WhisperTokenizer.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..catalog.database import KeywordCatalog, device_put_catalog, make_catalog_score_fn
from ..decoding.generate import GenerationOptions, WhisperGenerator
from ..metrics import entity_recall, evaluate_with_conf_int
from ..models.kws import KWSModel
from ..models.whisper import WhisperConfig, encoder_kws_stack, stack_whisper_params
from ..ops.resize import resize_matrix


@dataclasses.dataclass
class CBWhisperConfig:
    """Mirror of the reference hyperparameters (cb_whisper.py:21-38)."""

    language: str = "english"
    prompt: bool = True
    oracle: str = "kws"  # kws | gold | random
    kws_features_size: Tuple[int, int] = (150, 750)
    keyword_prompt_prepend: str = "("
    keyword_prompt_append: str = ")"
    keyword_separator: str = " "
    keywords_per_group: int = 100


class CBWhisper:
    def __init__(
        self,
        config: CBWhisperConfig,
        whisper_config: WhisperConfig,
        whisper_params: Dict[str, Any],
        kws_model: KWSModel,
        kws_variables: Dict[str, Any],
        catalog: KeywordCatalog,
        generation_options: GenerationOptions,
        prompt_ids_fn: Callable[[str], List[int]],
        decode_fn: Callable[[Sequence[int]], str],
        encoder_params: Optional[Dict[str, Any]] = None,
        encoder_config: Optional[WhisperConfig] = None,
        kws_layer_slice: Tuple[int, int] = (10, 22),
        dtype: Any = jnp.float32,
        vocab_int8: bool = False,
        decoder_int8: bool = False,
        kv_cache_int8: bool = False,
        cross_kv_int8: bool = False,
        kv_staging: int = 0,
    ):
        self.config = config
        self.whisper_config = whisper_config
        self.kws_model = kws_model
        self.kws_variables = kws_variables
        self.catalog = catalog
        self.opts = generation_options
        self.prompt_ids_fn = prompt_ids_fn
        self.decode_fn = decode_fn
        self.kws_layer_slice = kws_layer_slice
        self.oracle_buffer: List[str] = []
        self._compute_dtype = dtype

        self.generator = WhisperGenerator(
            whisper_config, whisper_params, dtype=dtype, vocab_int8=vocab_int8,
            decoder_int8=decoder_int8, kv_cache_int8=kv_cache_int8,
            cross_kv_int8=cross_kv_int8, kv_staging=kv_staging,
        )
        self.encoder_params = (
            stack_whisper_params(jax.tree.map(jnp.asarray, encoder_params))
            if encoder_params is not None
            else self.generator.params
        )
        self.encoder_config = encoder_config or whisper_config

        enc_cfg = self.encoder_config
        lo, hi = kws_layer_slice

        # params are explicit jit args — a closed-over device pytree lowers
        # as HLO literals (~2.5 GB of program text at whisper-medium, which
        # the remote-compile relay drops; decoding/generate.py)
        prec0 = self.generator.matmul_precision

        @jax.jit
        def _kws_stack(p, mel):
            # same matmul-precision contract as _kws_stack_enc: strict-parity
            # mode must reach the separate KWS encoder too (TPU otherwise
            # rounds operands to bf16 — CLAUDE.md)
            with jax.default_matmul_precision(prec0):
                return encoder_kws_stack(
                    p, mel, enc_cfg, layer_slice=(lo, hi), dtype=dtype
                )

        self._kws_stack = lambda mel: _kws_stack(self.encoder_params, mel)

        # single-encode fusion: when the KWS encoder IS the ASR encoder
        # (no separate encoder_ckpt), one forward per segment yields both the
        # KWS layer stack and the decoder's cross-attention input — the
        # reference encodes every segment twice (cb_whisper.py:72 + generate's
        # own encoder; SURVEY.md §7 "two encoders per segment")
        self.encode_fused = encoder_params is None and (
            encoder_config is None or encoder_config == whisper_config
        )
        prec = self.generator.matmul_precision

        @jax.jit
        def _kws_stack_enc(p, mel):
            with jax.default_matmul_precision(prec):
                return encoder_kws_stack(
                    p, mel, whisper_config,
                    layer_slice=(lo, hi), dtype=dtype, return_encoding=True,
                )

        self._kws_stack_enc = lambda mel: _kws_stack_enc(self.generator.params, mel)

        def kws_apply(variables, images):
            return self.kws_model.apply(variables, images).logits

        self._set_score_fn(
            make_catalog_score_fn(
                kws_apply, out_size=config.kws_features_size, chunk=8
            )
        )
        self._catalog_dev = None
        t_enc = self.encoder_config.max_source_positions
        self._utt_w = jnp.asarray(
            resize_matrix(t_enc, config.kws_features_size[1], antialias=False)
        )

    # -------------------------------------------------------- keyword spotting

    @staticmethod
    def _segment_bucket(n_seg: int) -> int:
        # bucket the segment batch to a power of two so the encoder + scorer
        # compile once per bucket, not once per n_active (the longform driver
        # shrinks the batch as segments finish)
        return 1 << max(0, n_seg - 1).bit_length() if n_seg > 1 else 1

    def _ensure_catalog(self):
        if self._catalog_dev is None:
            self._catalog_dev = device_put_catalog(
                self.catalog, out_h=self.config.kws_features_size[0], chunk=8
            )

    def enable_int8_spotting(self, calibration_batches: int = 4):
        """Switch per-segment keyword spotting to int8 quantized ResNet
        inference (models/quant.py; 1.34x over bf16 on the catalog kernel,
        BASELINE.md).  Calibration happens lazily: the first
        ``calibration_batches`` scored segments run through the fp32 scorer
        while their real similarity-map inputs accumulate; the static
        activation scales are then maxes over all of them (one-sample
        scales risk clipping on outlier segments — VERDICT r2 weak #7;
        flip-rate study in docs/PERF.md).  Threshold/argmax decision parity
        vs fp32 is tested (tests/test_cb_whisper.py)."""
        self._int8_pending = True
        self._int8_calibration_batches = max(1, int(calibration_batches))
        self._int8_calib_stacks = []

    def enable_int8_kws_encoder(
        self, host_params=None, calibration_batches: int = 4
    ):
        """Switch the per-segment KWS encoder to s8×s8→s32 inference
        (models/whisper.py:quantize_encoder_layers — ~2× the bf16 MXU rate
        on the six per-layer linears).  Only valid with a SEPARATE KWS
        encoder (``encoder_ckpt != whisper_ckpt``): the quantized encoder
        feeds only the catalog scorer (decision-level robustness, like int8
        spotting), never the decoder's cross-attention, so transcription is
        untouched.  Calibration is lazy over the first
        ``calibration_batches`` real segment mels (same discipline as
        :meth:`enable_int8_spotting`).  Pass ``host_params`` (the loader's
        unrolled numpy tree) so weights quantize host-side — without it the
        stacked device tree is fetched back (~minutes at whisper-medium
        through the 18 MB/s relay)."""
        if self.encoder_params is self.generator.params:
            raise ValueError(
                "encoder_int8 requires a separate KWS encoder (encoder_ckpt "
                "!= whisper_ckpt): quantizing the shared ASR encoder would "
                "change transcription"
            )
        self._enc_int8_host = host_params
        self._enc_int8_pending = True
        self._enc_int8_batches = max(1, int(calibration_batches))
        self._enc_int8_mels: List[np.ndarray] = []

    @staticmethod
    def _calib_rows(n_seg: int, needed: int, real_rows) -> List[int]:
        """Indices of real segments to feed a pending int8 calibration.
        ``real_rows`` (packed serving, generate.py real-row mask) excludes
        vacant zero-mel padding slots — an all-zero 'segment' in the
        calibration set would skew the static activation scales exactly
        the way VERDICT r2 weak #7 warned about."""
        rows = [
            i for i in range(n_seg) if real_rows is None or real_rows[i]
        ]
        return rows[:needed]

    def _maybe_calibrate_encoder_int8(self, feats, n_seg: int,
                                      real_rows=None) -> None:
        if not getattr(self, "_enc_int8_pending", False):
            return
        needed = self._enc_int8_batches - len(self._enc_int8_mels)
        rows = self._calib_rows(n_seg, needed, real_rows)
        if rows:
            taken = np.asarray(feats[jnp.asarray(rows)])
            self._enc_int8_mels.extend(taken[i] for i in range(len(rows)))
        if len(self._enc_int8_mels) < self._enc_int8_batches:
            return
        from .whisper import calibrate_encoder_act_scales, quantize_encoder_layers

        mels = jnp.asarray(np.stack(self._enc_int8_mels))
        scales = calibrate_encoder_act_scales(
            self.encoder_params, mels, self.encoder_config,
            dtype=self._compute_dtype,
        )
        host = self._enc_int8_host
        if host is None:
            host = jax.tree.map(np.asarray, self.encoder_params)
        self.encoder_params = jax.device_put(
            quantize_encoder_layers(host, scales)
        )
        self._enc_int8_pending = False
        self._enc_int8_mels = []
        self._enc_int8_host = None

    def _set_score_fn(self, score_fn) -> None:
        """Install a catalog scorer + its batched form: one launch scores
        ALL active segments (vmap over the segment axis; utt_w shared —
        every segment has the full encoder frame budget)."""
        self._score_fn = score_fn
        self._batched_score = jax.jit(
            jax.vmap(score_fn, in_axes=(None, None, 0, None))
        )

    def _calibrate_int8(self, utt_stacks) -> None:
        from ..catalog.database import calibration_sim_maps_multi
        from ..models.quant import (
            calibrate_act_scales,
            make_quantized_kws_apply,
            quantize_resnet_classifier,
        )

        rcfg = self.kws_model.config
        qparams = quantize_resnet_classifier(self.kws_variables, rcfg)
        maps = calibration_sim_maps_multi(
            self.catalog, utt_stacks, self.config.kws_features_size
        )
        scales = calibrate_act_scales(rcfg, qparams, maps)["act_scales"]
        q_apply = make_quantized_kws_apply(rcfg, act_scales=scales)
        self._set_score_fn(
            make_catalog_score_fn(
                q_apply, out_size=self.config.kws_features_size, chunk=8
            )
        )
        self.kws_variables = jax.device_put(qparams)
        self._int8_pending = False

    def _score_to_keywords(self, stacks, n_seg: int,
                           real_rows=None) -> List[List[str]]:
        """Catalog scoring + argmax-class-1 dedupe (cb_whisper.py:124-132)."""
        if getattr(self, "_int8_pending", False):
            # accumulate real segment stacks; fp32 scores them until the
            # calibration set is full, then the quantized scorer takes over.
            # Fetch ONLY the real segments still needed — the padded bucket
            # tail is zeros (and packed vacant slots are excluded via
            # real_rows), and device→host through the relay is ~18 MB/s.
            needed = self._int8_calibration_batches - len(self._int8_calib_stacks)
            rows = self._calib_rows(n_seg, needed, real_rows)
            if rows:
                stacks_np = np.asarray(stacks[jnp.asarray(rows)])
                self._int8_calib_stacks.extend(
                    stacks_np[i] for i in range(len(rows))
                )
            if len(self._int8_calib_stacks) >= self._int8_calibration_batches:
                self._calibrate_int8(self._int8_calib_stacks)
                self._int8_calib_stacks = []
        _, logits = self._batched_score(
            self.kws_variables, self._catalog_dev, stacks, self._utt_w
        )
        n = self.catalog.num_keywords
        hits = np.asarray(jnp.argmax(logits[:, :n], axis=-1)) == 1  # [bucket, n]
        hits &= self.catalog.mask[:n].astype(bool)[None, :]
        out = []
        for seg_idx in range(n_seg):
            keywords = [self.catalog.keywords[i] for i in np.nonzero(hits[seg_idx])[0]]
            out.append(list(dict.fromkeys(keywords)))
        return out

    def _bucketed_features(self, input_features: np.ndarray):
        """Zero-pad the segment batch to its power-of-two bucket."""
        n_seg = input_features.shape[0]
        bucket = self._segment_bucket(n_seg)
        feats = np.zeros((bucket, *input_features.shape[1:]), np.float32)
        feats[:n_seg] = input_features
        return jnp.asarray(feats), n_seg

    def spot_keywords(self, input_features: np.ndarray,
                      real_rows=None) -> List[List[str]]:
        """Detected keyword strings per segment (argmax class 1, deduped —
        cb_whisper.py:124-132).  ``real_rows`` marks packed-serving padding
        slots so they never feed a pending int8 calibration."""
        self._ensure_catalog()
        feats, n_seg = self._bucketed_features(input_features)
        self._maybe_calibrate_encoder_int8(feats, n_seg, real_rows=real_rows)
        try:
            stacks = self._kws_stack(feats)
            return self._score_to_keywords(stacks, n_seg, real_rows=real_rows)
        except Exception as e:  # failed segments yield no keywords, like the
            # reference's try/except around its encoder (cb_whisper.py:99-108)
            print(f"keyword spotting encoder failed: {e}")
            return [[] for _ in range(n_seg)]

    def encode_and_spot(self, input_features: np.ndarray,
                        start_of_prev: bool = False, real_rows=None):
        """Fused generate() hook (one encoder forward per segment batch):
        returns (prompt token ids per segment, cross-attention encoding
        [n_seg, T_enc, D]).  Wired when :attr:`encode_fused` and
        oracle='kws'; a spotting failure returns a ``None`` encoding and the
        generator falls back to its own encoder."""
        self._ensure_catalog()
        feats, n_seg = self._bucketed_features(input_features)
        try:
            stacks, enc = self._kws_stack_enc(feats)
            keywords = self._score_to_keywords(stacks, n_seg, real_rows=real_rows)
        except Exception as e:
            print(f"keyword spotting encoder failed: {e}")
            return [[] for _ in range(n_seg)], None
        return self._format_prompt_tokens(keywords, start_of_prev), enc[:n_seg]

    def keyword_spotting(self, input_features, start_of_prev: bool = False,
                         real_rows=None) -> List[List[int]]:
        """The generate() callback: prompt token ids per segment
        (cb_whisper.py:82-149)."""
        num_segments = input_features.shape[0]
        if not self.config.prompt:
            return [[] for _ in range(num_segments)]

        if self.config.oracle == "kws":
            keywords = self.spot_keywords(
                np.asarray(input_features), real_rows=real_rows
            )
            # argmax-dedup path; already deduped per segment
        else:
            # the utterance-level oracle keyword set applies to EVERY active
            # segment (was a length-1 list regardless of batch — VERDICT r1
            # weak #3)
            keywords = [list(self.oracle_buffer) for _ in range(num_segments)]

        return self._format_prompt_tokens(keywords, start_of_prev)

    def _format_prompt_tokens(
        self, keywords: List[List[str]], start_of_prev: bool
    ) -> List[List[int]]:
        """Wrap detected keywords in the prompt template and tokenize
        (cb_whisper.py:140-147)."""
        cfg = self.config
        out = []
        for kwds in keywords:
            if kwds:
                text = (
                    cfg.keyword_prompt_prepend
                    + cfg.keyword_separator.join(kwds)
                    + cfg.keyword_prompt_append
                )
                ids = list(self.prompt_ids_fn(text))
                if not start_of_prev:
                    ids = ids[1:]  # strip <|startofprev|> (cb_whisper.py:146)
                out.append(ids)
            else:
                out.append([])
        return out

    def _encode_spot_hook(self):
        """The generator's single-encode hook, when applicable."""
        use = (
            self.encode_fused
            and self.config.prompt
            and self.config.oracle == "kws"
        )
        return self.encode_and_spot if use else None

    # ----------------------------------------------------------------- forward

    def forward(
        self,
        input_features: np.ndarray,  # [T_frames, ...] or [1, n_mels, T]
        attention_mask: Optional[np.ndarray] = None,
        oracle: Optional[List[str]] = None,
    ) -> str:
        """Transcribe one utterance with contextual biasing; returns the
        stripped transcript string (cb_whisper.py:151-187)."""
        self.oracle_buffer = oracle or []
        result = self.generator.generate(
            np.asarray(input_features, np.float32),
            self.opts,
            attention_mask=attention_mask,
            keyword_spotting=self.keyword_spotting,
            return_segments=True,
            encode_spot=self._encode_spot_hook(),
        )
        if isinstance(result, dict):
            tokens = result["sequences"][0]
        else:
            tokens = result[0]
        return self.decode_fn(tokens).strip()

    def forward_batch(
        self,
        features_list: List[np.ndarray],   # each [1, n_mels, T_i]
        masks_list: List[Optional[np.ndarray]],
    ) -> List[str]:
        """Transcribe SEVERAL utterances in one longform launch: mels are
        right-padded to the longest with attention masks, the seek loop runs
        them as one batch (dynamic batch reduction drops finished rows).
        A capability beyond the reference's batch-1 eval; oracle modes need
        per-utterance keyword buffers and stay on the batch-1 path."""
        assert self.config.oracle == "kws", (
            "batched eval supports oracle='kws' only (per-segment spotting); "
            "gold/random oracles are per-utterance state"
        )
        self.oracle_buffer = []
        t_max = max(f.shape[-1] for f in features_list)
        batch = len(features_list)
        n_mels = features_list[0].shape[1]
        mels = np.zeros((batch, n_mels, t_max), np.float32)
        attn = np.zeros((batch, t_max), np.int32)
        for i, (f, m) in enumerate(zip(features_list, masks_list)):
            t = f.shape[-1]
            mels[i, :, :t] = f[0]
            if m is not None:
                attn[i, : m.shape[-1]] = np.asarray(m).reshape(-1)[:t_max]
            else:
                attn[i, :t] = 1
        result = self.generator.generate(
            mels, self.opts, attention_mask=attn,
            keyword_spotting=self.keyword_spotting, return_segments=True,
            encode_spot=self._encode_spot_hook(),
        )
        sequences = result["sequences"] if isinstance(result, dict) else result
        return [self.decode_fn(sequences[i]).strip() for i in range(batch)]

    def forward_packed(self, stream, slots: int = 4):
        """Continuous-batching transcription over an utterance STREAM
        (generate_packed): ``slots`` utterances decode as one batch and
        finished slots refill from the stream, so the device stays at full
        batch width across a heterogeneous-length corpus (the fixed-group
        path drains to batch 1 at every group tail) and the whole corpus
        runs on one compiled program family per prompt bucket.

        ``stream`` yields ``(features [1, n_mels, T], attention_mask or
        None)``; yields ``(order, transcript)`` as utterances complete (NOT
        submission order).  oracle='kws' only, like :meth:`forward_batch`;
        conditioning is per-row (each utterance == its own batch-1 decode,
        docs/PARITY.md)."""
        assert self.config.oracle == "kws", (
            "packed eval supports oracle='kws' only (per-segment spotting); "
            "gold/random oracles are per-utterance state"
        )
        self.oracle_buffer = []
        for order, result in self.generator.generate_packed(
            stream,
            self.opts,
            slots=slots,
            keyword_spotting=self.keyword_spotting,
            encode_spot=self._encode_spot_hook(),
            return_segments=True,
        ):
            yield order, self.decode_fn(result["sequences"]).strip()

    # -------------------------------------------------------------------- test

    def run_test(
        self,
        dataset,
        mel_fn: Callable[[dict], Tuple[np.ndarray, Optional[np.ndarray]]],
        num_bootstraps: int = 1000,
        rng: Optional[np.random.Generator] = None,
        batch_size: int = 1,
        packed: bool = False,
        predictions_out: Optional[list] = None,
    ) -> Dict[str, float]:
        """Evaluate entity recall over an eval dataset
        (cb_whisper.py:212-289).  ``mel_fn(item) -> (features, attention_mask)``
        supplies the log-mel input (precomputed or from audio).
        ``batch_size > 1`` (oracle='kws' only) decodes several utterances per
        longform launch via :meth:`forward_batch`; ``packed=True`` instead
        streams the corpus through the continuous-batching scheduler
        (:meth:`forward_packed`, ``slots=batch_size``) — finished utterances
        hand their batch slot to the next one, so heterogeneous-length
        corpora keep the device at full batch width.

        ``predictions_out``: optional list the per-utterance transcripts are
        appended to (dataset order) — the approximate-mode qualifier
        (tools/validate_approx.py) diffs transcripts across decode levers."""
        from ..audio.prefetch import prefetch
        from ..runtime.profiler import RTFxMeter

        rng = rng or np.random.default_rng(0)
        meter = RTFxMeter()
        preds, refs, mentions, speakers = [], [], [], []

        def _decoded_items():
            # host audio decode + featurization pipelined against the device
            # transcription of the previous utterance
            for idx in range(len(dataset)):
                item = dataset[idx]
                yield item, mel_fn(item)

        if packed:
            # honored at any batch_size (slots=1 packed is well-defined) —
            # silently falling back to the plain path would let a user
            # benchmark the wrong scheduler
            audio_seconds = [0.0]

            def _stream():
                for item, (features, attention_mask) in prefetch(
                    _decoded_items(), depth=2
                ):
                    self._collect_refs(item, refs, mentions, speakers)
                    features = np.asarray(features, np.float32)
                    frames = (
                        int(np.asarray(attention_mask).sum())
                        if attention_mask is not None
                        else features.shape[-1]
                    )
                    audio_seconds[0] += frames / 100.0
                    yield features, attention_mask

            meter.start()
            by_order = dict(self.forward_packed(_stream(), slots=batch_size))
            meter.stop(audio_seconds=audio_seconds[0])
            preds.extend(by_order[i] for i in range(len(by_order)))
            if predictions_out is not None:
                predictions_out.extend(preds)
            return self._finalize_test(
                preds, refs, mentions, speakers, num_bootstraps, meter
            )

        if batch_size > 1:
            pending_items, pending_feats, pending_masks = [], [], []

            def flush():
                if not pending_items:
                    return
                meter.start()
                outs = self.forward_batch(pending_feats, pending_masks)
                frames = sum(
                    int(np.asarray(m).sum()) if m is not None else f.shape[-1]
                    for f, m in zip(pending_feats, pending_masks)
                )
                meter.stop(audio_seconds=frames / 100.0)
                preds.extend(outs)
                pending_items.clear(); pending_feats.clear(); pending_masks.clear()

            for item, (features, attention_mask) in prefetch(_decoded_items(), depth=2):
                pending_items.append(item)
                pending_feats.append(np.asarray(features, np.float32))
                pending_masks.append(attention_mask)
                self._collect_refs(item, refs, mentions, speakers)
                if len(pending_items) == batch_size:
                    flush()
            flush()
            if predictions_out is not None:
                predictions_out.extend(preds)
            return self._finalize_test(
                preds, refs, mentions, speakers, num_bootstraps, meter
            )

        for item, (features, attention_mask) in prefetch(_decoded_items(), depth=2):
            meter.start()
            labels = np.asarray(item["hotword_labels"])
            if self.config.oracle == "gold":
                oracle = [self.catalog.keywords[i] for i in np.nonzero(labels)[0]]
            elif self.config.oracle == "random":
                negatives = [i for i in range(len(self.catalog.keywords)) if not labels[i]]
                pick = rng.choice(negatives, size=int(labels.sum()), replace=False)
                oracle = [self.catalog.keywords[i] for i in pick]
            else:
                oracle = []

            preds.append(self.forward(features, attention_mask, oracle))
            # 100 mel frames per second of audio (hop 160 @ 16 kHz)
            n_frames = (
                int(np.asarray(attention_mask).sum())
                if attention_mask is not None
                else features.shape[-1]
            )
            meter.stop(audio_seconds=n_frames / 100.0)
            self._collect_refs(item, refs, mentions, speakers)

        if predictions_out is not None:
            predictions_out.extend(preds)
        return self._finalize_test(preds, refs, mentions, speakers, num_bootstraps, meter)

    def _collect_refs(self, item, refs, mentions, speakers):
        refs.append(item["transcript"])
        if item.get("keywords") is not None:
            mentions.append([{**kw, "ner_tag": "UNK"} for kw in item["keywords"]])
        else:
            mentions.append(
                [
                    {
                        "mention": kw,
                        "total_offset": m.start(),
                        "end_offset": m.end(),
                        "ner_tag": "UNK",
                    }
                    for kw in self.catalog.keywords
                    for m in re.finditer(re.escape(kw), item["transcript"])
                ]
            )
        speakers.append(item.get("speaker"))

    def _finalize_test(self, preds, refs, mentions, speakers, num_bootstraps, meter):
        def f_recall(labels, samples, samples2=None):
            refs_, mentions_ = zip(*labels)
            return entity_recall(
                preds=list(samples), refs=list(refs_), mentions=list(mentions_),
                ner_tags="ALL", char_split=True,
            )["ALL"]

        conditions = None
        if speakers[0] is not None:
            speaker2id = {s: i for i, s in enumerate(set(speakers))}
            conditions = [speaker2id[s] for s in speakers]
        center, (lb, ub) = evaluate_with_conf_int(
            list(preds), f_recall, list(zip(refs, mentions)), conditions,
            num_bootstraps=num_bootstraps, alpha=5,
        )
        results = {"Entity Recall": center, "Entity Recall LB": lb, "Entity Recall UB": ub}
        print(f"throughput: {meter.summary()}")
        results["RTFx"] = meter.rtfx
        try:
            import pandas as pd

            label = ("w/ prompt" if self.config.prompt else "w/o prompt") + " - " + self.config.oracle
            print(pd.DataFrame([list(results.values())], index=[label], columns=list(results)))
        except ImportError:
            print(results)
        return results

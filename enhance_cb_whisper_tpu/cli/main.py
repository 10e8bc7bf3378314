"""CLI dispatcher: the reference's four entry points, Lightning-free.

``run_cli(argv)`` implements ``{fit,validate,test} --config cfg.yaml
[--dotted.key value ...]`` and routes on ``model.class_path``:

* ``model.model.KWSModel``            → paper-1 :class:`KWSEngine`
* ``efficient_kws.model.KWSModel``    → paper-2 :class:`EfficientKWSEngine`
* ``model.cb_whisper.CBWhisper``      → CB-Whisper entity-recall evaluation

The reference's ``KWSLightningCLI`` argument links are applied here at
parse time: model.{sampling,resample_every_epoch,kw_type,batch_size} feed
the data module (run_CLI.py:9-21), and under adversarial training the batch
size is multiplied by accumulate_grad_batches so optimizer step == training
step (run_CLI.py:23-31).
"""

from __future__ import annotations

import os
import sys
from typing import Any, Dict, List, Optional

import numpy as np
import yaml

from .config import apply_overrides, check_placeholders, filter_kwargs, get, load_config

PAPER1_MODELS = ("model.model.KWSModel", "enhance_cb_whisper_tpu.models.kws.KWSModel")
PAPER2_MODELS = (
    "efficient_kws.model.KWSModel",
    "enhance_cb_whisper_tpu.efficient_kws.model.EfficientKWSModel",
)
CBWHISPER_MODELS = (
    "model.cb_whisper.CBWhisper",
    "enhance_cb_whisper_tpu.models.cb_whisper.CBWhisper",
)


def _seed_everything(config):
    seed = config.get("seed_everything", 123)
    np.random.seed(seed if seed is not True else 123)
    return seed if seed is not True else 123


def _early_stopping(config):
    from ..runtime.checkpoint import EarlyStopping

    block = config.get("early_stopping")
    if not block:
        return None
    return EarlyStopping(
        monitor=block.get("monitor", "metrics/f1"),
        patience=block.get("patience", 10),
        mode=block.get("mode", "max"),
        min_delta=block.get("min_delta", 0.0) or 0.0,
    )


def _monitors(config) -> Dict[str, str]:
    monitors = {}
    for name in ("f1_checkpoint", "f1_generalization_checkpoint", "f1_l4_checkpoint"):
        block = config.get(name)
        if block and block.get("monitor"):
            monitors[name] = f"{block['monitor']}:{block.get('mode', 'max')}"
    return monitors or {"f1_checkpoint": "metrics/f1:max"}


def _load_kws_variables(ckpt_path: str, resnet_config):
    """Load KWS classifier weights from either this framework's checkpoint
    dirs or a reference Lightning .ckpt (state-dict conversion)."""
    if os.path.isdir(ckpt_path):
        from ..runtime.checkpoint import load_checkpoint

        state, _ = load_checkpoint(ckpt_path)
        return {"params": state["params"]["kws"], "batch_stats": state["batch_stats"]["kws"]}
    # reference lightning checkpoint
    import torch

    from ..models.torch_compat import load_hf_resnet_classifier, migrate_legacy_state_dict

    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    sd = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd = migrate_legacy_state_dict(sd)
    variables = load_hf_resnet_classifier(sd, resnet_config, prefix="model.")
    return {"params": {"model": variables["params"]}, "batch_stats": {"model": variables["batch_stats"]}}


# --------------------------------------------------------------------- paper 1


def _run_paper1(subcommand: str, config: Dict[str, Any]):
    from ..data.datamodule import KWSDataMod
    from ..models.resnet import ResNetConfig
    from ..runtime.kws_engine import KWSEngine
    from ..runtime.logging import MetricsLogger
    from ..train.kws_train import KWSTrainConfig

    model_args = get(config, "model.init_args", {}) or {}
    data_args = dict(get(config, "data.init_args", {}) or {})

    # link_arguments (run_CLI.py:9-15)
    for key in ("sampling", "resample_every_epoch", "kw_type", "batch_size"):
        if key in model_args:
            data_args[key] = model_args[key]
    # adversarial batch-size rewrite (run_CLI.py:23-31)
    if subcommand == "fit" and model_args.get("adversarial_training"):
        data_args["batch_size"] = model_args.get("batch_size", 1) * model_args.get(
            "accumulate_grad_batches", 1
        )

    train_config = KWSTrainConfig(**filter_kwargs(model_args, KWSTrainConfig))
    if data_args.get("device_features"):
        # on-device sims+resize needs the collator target inside the step
        import dataclasses as _dc

        train_config = _dc.replace(
            train_config,
            device_features=tuple(data_args.get("features_size") or (150, 750)),
        )
    datamodule = KWSDataMod(**filter_kwargs(data_args, KWSDataMod))

    log_dir = get(config, "trainer.default_root_dir") or "runs/kws"
    engine = KWSEngine(
        train_config,
        resnet_config=ResNetConfig(
            num_channels=model_args.get("num_channels", 12), num_labels=2
        ),
        features_size=tuple(data_args.get("features_size") or (150, 750)),
        ckpt_dir=os.path.join(log_dir, "checkpoints"),
        logger=_logger_from_config(config, log_dir),
    )

    if subcommand == "fit":
        return engine.fit(
            datamodule,
            max_epochs=get(config, "trainer.max_epochs") or 100,
            check_val_every_n_epoch=get(config, "trainer.check_val_every_n_epoch") or 1,
            early_stopping=_early_stopping(config),
            monitors=_monitors(config),
            limit_train_batches=get(config, "trainer.limit_train_batches"),
            resume_from=config.get("ckpt_path"),
        )

    ckpt_path = config.get("ckpt_path")
    assert ckpt_path, "test/validate requires ckpt_path"
    variables = _load_kws_variables(ckpt_path, engine.resnet_config)
    if subcommand == "validate":
        datamodule.setup("validate")
        metrics = engine.validate(variables, datamodule)
        print(metrics)
        return metrics
    if model_args.get("kws_int8"):
        # TPU-serving extension (not in the reference schema): int8
        # quantized catalog scoring calibrated on the first
        # `kws_int8_calibration_batches` test utterances' real similarity
        # maps — 1.34x over bf16 with threshold-decision parity
        # (models/quant.py, BASELINE.md, docs/PERF.md flip-rate study)
        datamodule.setup("test")
        dataset = datamodule.test_dataset
        variables = engine.enable_int8_scoring(
            variables, dataset,
            calibration_batches=int(model_args.get("kws_int8_calibration_batches", 4)),
        )
    return engine.test(variables, datamodule)


# --------------------------------------------------------------------- paper 2


def _logger_from_config(config, log_dir):
    """MetricsLogger honoring the reference's MLFlowLogger block
    (configs/train.yaml:9-15): run_name/experiment_name/tags/tracking_uri.
    The real MLflow client activates only when tracking_uri is set and the
    package is importable; local files are always written."""
    from ..runtime.logging import MetricsLogger

    largs = get(config, "trainer.logger.init_args", {}) or {}
    return MetricsLogger(
        log_dir,
        run_name=largs.get("run_name", "run"),
        experiment_name=largs.get("experiment_name", "default"),
        tags=largs.get("tags"),
        tracking_uri=largs.get("tracking_uri"),
        log_model=bool(largs.get("log_model", False)),
    )


def _run_paper2(subcommand: str, config: Dict[str, Any]):
    from ..efficient_kws.data import EfficientKWSDataMod
    from ..efficient_kws.engine import EfficientKWSEngine, EfficientTrainConfig
    from ..efficient_kws.model import EfficientKWSConfig
    from ..runtime.logging import MetricsLogger

    model_args = get(config, "model.init_args", {}) or {}
    data_args = dict(get(config, "data.init_args", {}) or {})
    # link_arguments (run_efficient_kws.py:13-33)
    for key in (
        "n_layers", "sampling", "resample_every_epoch", "batch_size",
        "features_size", "pad_long_before_resize",
        "learn_features", "load_embeddings", "kws_whisper_ckpt",
    ):
        if key in model_args:
            data_args[key] = model_args[key]
    # jsonargparse links fall back to the MODEL's default when the config
    # omits the arg (reference model.py:38 batch_size=1)
    data_args.setdefault("batch_size", 1)

    model_config = EfficientKWSConfig(**filter_kwargs(model_args, EfficientKWSConfig))
    train_config = EfficientTrainConfig(**filter_kwargs(model_args, EfficientTrainConfig))
    datamodule = EfficientKWSDataMod(**filter_kwargs(data_args, EfficientKWSDataMod))

    # audio-mode training: frozen Whisper encoder runs inside the train step
    whisper = None
    if not data_args.get("load_embeddings", True):
        from ..models.whisper_loader import load_whisper_from_pretrained

        whisper = load_whisper_from_pretrained(model_args["kws_whisper_ckpt"])

    log_dir = get(config, "trainer.default_root_dir") or "runs/efficient_kws"
    engine = EfficientKWSEngine(
        model_config,
        train_config,
        ckpt_dir=os.path.join(log_dir, "checkpoints"),
        logger=_logger_from_config(config, log_dir),
        whisper=whisper,
        kws_layer_slice=tuple(model_args.get("kws_layer_slice", (10, 22))),
        utt_frames_budget=tuple(model_args.get("features_size", (150, 1500)))[1],
    )

    if subcommand == "fit":
        return engine.fit(
            datamodule,
            max_epochs=get(config, "trainer.max_epochs") or train_config.max_epochs,
            early_stopping=_early_stopping(config),
            monitors=_monitors(config),
            limit_train_batches=get(config, "trainer.limit_train_batches"),
            resume_from=config.get("ckpt_path"),  # Lightning ckpt_path resume
        )

    ckpt_path = config.get("ckpt_path")
    assert ckpt_path, "test/validate requires ckpt_path"
    if os.path.isdir(ckpt_path):
        from ..runtime.checkpoint import load_checkpoint

        state, _ = load_checkpoint(ckpt_path)
        variables = engine.variables(state["params"], state.get("batch_stats", {}))
    else:
        # reference Lightning .ckpt (torch state dict) — forward parity of
        # the conversion pinned by tests/test_efficient_model_differential.py
        import torch

        from ..efficient_kws.torch_compat import load_torch_efficient_kws

        ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
        variables = load_torch_efficient_kws(
            ckpt.get("state_dict", ckpt), engine.model_config
        )
    if model_args.get("kws_int8") and subcommand == "test":
        # TPU-serving extension (same knob as paper 1): int8 quantized
        # group scoring calibrated over the first N test items
        datamodule.setup("test")
        n_calib = int(model_args.get("kws_int8_calibration_batches", 4))
        ds = datamodule.test_dataset
        engine.enable_int8_scoring(
            variables, items=[ds[i] for i in range(min(n_calib, len(ds)))]
        )
    # JSON artifacts land next to the checkpoint (reference model.py:546-568);
    # for a Lightning .ckpt FILE that's its directory
    dump_dir = ckpt_path if os.path.isdir(ckpt_path) else (
        os.path.dirname(ckpt_path) or ".")
    if subcommand == "validate":
        datamodule.setup("validate")
        metrics = engine.validate(variables, datamodule, dump_dir=dump_dir)
        print(metrics)
        return metrics
    return engine.test(variables, datamodule, dump_dir=dump_dir)


# ------------------------------------------------------------------ cb-whisper


def _cbwhisper_kws_resnet(model_args):
    """ResNet config for the KWS classifier: 12 channels (the [10:22] layer
    stack) unless the config overrides it."""
    from ..models.resnet import ResNetConfig

    return ResNetConfig(
        num_channels=model_args.get("kws_num_channels", 12), num_labels=2
    )


def _build_generation_options(tokenizer, hf_gc, model_args, whisper_config=None):
    from ..decoding.generate import GenerationOptions

    # the reference configs use capitalized names (`language: English`,
    # cb-whisper-acl.yaml:85); HF's TO_LANGUAGE_CODE maps every name the
    # whisper tokenizer knows — a silent unk token here would force
    # <|endoftext|> as the language and decode garbage without an error
    from transformers.models.whisper.tokenization_whisper import (
        TO_LANGUAGE_CODE,
    )

    language = model_args.get("language", "english")
    lang_ids: tuple = ()
    if language is None:
        # `language: null` → per-utterance auto-detection from the first
        # 30 s window (HF _set_language_and_task/detect_language semantics,
        # pba_whisper.py:276-291); needs the generation config's lang_to_id
        lang_token = None
        lang_to_id = getattr(hf_gc, "lang_to_id", None)
        assert lang_to_id, (
            "language: null requires generation_config.lang_to_id for "
            "language detection (multilingual whisper checkpoints ship it)"
        )
        lang_ids = tuple(sorted(lang_to_id.values()))
    else:
        language = str(language).lower()
        lang_code = TO_LANGUAGE_CODE.get(language, language)
        lang_token = tokenizer.convert_tokens_to_ids(f"<|{lang_code}|>")
        assert lang_token != tokenizer.convert_tokens_to_ids("<|__unk__|>"), (
            f"language {language!r} does not resolve to a whisper language token"
        )
    task_token = tokenizer.convert_tokens_to_ids("<|transcribe|>")
    return GenerationOptions(
        # budget math + decode length derive from the MODEL's positional
        # capacity (reference: self.config.max_target_positions,
        # pba_whisper.py:492), not a fixed 448
        max_target_positions=(
            whisper_config.max_target_positions if whisper_config is not None else 448
        ),
        decoder_start_token_id=hf_gc.decoder_start_token_id,
        language_token_id=lang_token,
        lang_token_ids=lang_ids,
        # the reference always passes task='transcribe' (cb_whisper.py:169),
        # so the task token stays even under language auto-detection
        task_token_id=task_token,
        no_timestamps_token_id=hf_gc.no_timestamps_token_id,
        prev_sot_token_id=getattr(hf_gc, "prev_sot_token_id", None)
        or tokenizer.convert_tokens_to_ids("<|startofprev|>"),
        eos_token_id=hf_gc.eos_token_id,
        pad_token_id=hf_gc.pad_token_id,
        suppress_tokens=tuple(hf_gc.suppress_tokens or ()),
        begin_suppress_tokens=tuple(hf_gc.begin_suppress_tokens or ()),
        max_initial_timestamp_index=(
            hf_gc.max_initial_timestamp_index
            if getattr(hf_gc, "max_initial_timestamp_index", None) is not None
            else 50  # 0 is a valid setting — `or 50` would override it
        ),
        # the reference's flagship width (cb_whisper.py:174); num_beams: 1
        # is the greedy serving mode
        num_beams=int(model_args.get("num_beams", 5)),
        condition_on_prev_tokens=False,  # set per-call by forward
    )


def _compute_dtype(model_args):
    import jax.numpy as jnp

    return jnp.dtype(model_args.get("compute_dtype", "float32"))


def _run_cbwhisper(subcommand: str, config: Dict[str, Any],
                   predictions_out=None):
    assert subcommand == "test", "CBWhisper supports the test subcommand (cb-whisper.py)"
    import dataclasses

    import transformers

    from ..audio import load_audio_16k, prepare_features
    from ..data.datamodule import KWSDataMod
    from ..models.cb_whisper import CBWhisper, CBWhisperConfig
    from ..models.kws import KWSModel
    from ..models.whisper_loader import load_whisper_from_pretrained

    model_args = get(config, "model.init_args", {}) or {}
    cb_config = CBWhisperConfig(**filter_kwargs(model_args, CBWhisperConfig))

    whisper_ckpt = model_args["whisper_ckpt"]
    encoder_ckpt = model_args.get("encoder_ckpt", whisper_ckpt)
    whisper_config, whisper_params = load_whisper_from_pretrained(whisper_ckpt)
    if encoder_ckpt != whisper_ckpt:
        encoder_config, encoder_params = load_whisper_from_pretrained(encoder_ckpt)
    else:
        encoder_config, encoder_params = whisper_config, None

    tokenizer = transformers.WhisperTokenizer.from_pretrained(whisper_ckpt)
    hf_gc = transformers.GenerationConfig.from_pretrained(whisper_ckpt)
    opts = _build_generation_options(tokenizer, hf_gc, model_args, whisper_config)
    opts = dataclasses.replace(opts, condition_on_prev_tokens=True, return_timestamps=True)

    resnet_config = _cbwhisper_kws_resnet(model_args)
    kws_model = KWSModel(resnet_config)
    kws_variables = _load_kws_variables(model_args["kws_ckpt"], resnet_config)

    # the keyword database view over the eval dataset (DatabaseLite,
    # cb_whisper.py:298-367) — our eval datasets already carry a catalog
    from ..data.datasets import ACL6060KeywordDataset, AishellHotwordDataset

    ds_name = model_args["dataset"]
    if ds_name == "aishell":
        dataset = AishellHotwordDataset(
            root=os.path.join(model_args["root"], "hotword"),
            split=model_args.get("split", "test"),
            hotwords_per_group=cb_config.keywords_per_group,
            kw_type=model_args["kw_type"],
            load_audio=True,
            wav_folder=os.path.join(model_args["root"], "wav"),
        )
    else:
        dataset = ACL6060KeywordDataset(
            root=model_args["root"],
            split=model_args.get("split", "test"),
            keywords_per_group=cb_config.keywords_per_group,
            kw_type=model_args["kw_type"],
            load_audio=True,
        )

    def prompt_ids_fn(text):
        return list(tokenizer.get_prompt_ids(text))

    def decode_fn(tokens):
        return tokenizer.decode(tokens, skip_special_tokens=True)

    module = CBWhisper(
        config=cb_config,
        whisper_config=whisper_config,
        whisper_params=whisper_params,
        kws_model=kws_model,
        kws_variables=kws_variables,
        catalog=dataset.catalog,
        generation_options=opts,
        prompt_ids_fn=prompt_ids_fn,
        decode_fn=decode_fn,
        encoder_params=encoder_params,
        encoder_config=encoder_config,
        kws_layer_slice=tuple(model_args.get("kws_layer_slice", (10, 22))),
        # TPU-serving extensions (fp32 stays the parity default):
        # compute_dtype: bfloat16 decode (+52% at whisper-medium);
        # vocab_int8 / decoder_int8: weight-only int8 on the decode loop's
        # HBM-bound weight reads (models/whisper.py, docs/PERF.md)
        dtype=_compute_dtype(model_args),
        vocab_int8=bool(model_args.get("vocab_int8", False)),
        decoder_int8=bool(model_args.get("decoder_int8", False)),
        # kv_cache_int8: int8 self-attention KV cache (APPROXIMATE —
        # per-token scales; qualify with tools/validate_approx.py); halves
        # the dominant per-step cache read of batched beam decode
        kv_cache_int8=bool(model_args.get("kv_cache_int8", False)),
        # cross_kv_int8: int8 cross-attention K/V (APPROXIMATE — same
        # per-token exact-scale-factoring scheme; halves the per-step
        # 1500-frame cross-K/V slab read)
        cross_kv_int8=bool(model_args.get("cross_kv_int8", False)),
        # kv_staging: staged KV-cache writes, window W (exact for bf16/f32
        # caches up to softmax summation order; composes with
        # kv_cache_int8).  Removes the per-step full-slab cache-write
        # read-modify-write — 47% of beam decode device time at
        # whisper-medium (docs/PERF.md round-5 attribution)
        kv_staging=int(model_args.get("kv_staging", 0)),
    )

    if model_args.get("kws_int8"):
        # TPU-serving extension: int8 quantized spotting, calibrated
        # lazily over the first N scored segments' similarity maps
        module.enable_int8_spotting(
            calibration_batches=int(model_args.get("kws_int8_calibration_batches", 4))
        )
    if model_args.get("encoder_int8"):
        # TPU-serving extension: s8×s8→s32 KWS encoder — separate-encoder
        # setups only (the quantized encoder never feeds the decoder's
        # cross-attention); host_params keeps quantization host-side
        module.enable_int8_kws_encoder(
            host_params=encoder_params,
            calibration_batches=int(model_args.get("kws_int8_calibration_batches", 4)),
        )

    def mel_fn(item):
        wav = load_audio_16k(item["audio"])
        return prepare_features(wav, n_mels=whisper_config.num_mel_bins)

    return module.run_test(
        dataset, mel_fn,
        num_bootstraps=model_args.get("num_bootstraps", 1000),
        # >1 decodes several utterances per longform launch (oracle='kws')
        batch_size=model_args.get("eval_batch_size", 1),
        # continuous batching: finished utterances hand their batch slot to
        # the next one (CBWhisper.forward_packed; needs eval_batch_size > 1)
        packed=bool(model_args.get("eval_packed", False)),
        # transcripts for the approximate-mode qualifier's diffing
        predictions_out=predictions_out,
    )


# --------------------------------------------------------------------- driver


def run_cli(argv: Optional[List[str]] = None):
    from ..runtime.compile_cache import enable_persistent_cache

    enable_persistent_cache()
    argv = list(sys.argv[1:] if argv is None else argv)
    assert argv and argv[0] in ("fit", "test", "validate"), (
        f"usage: <entry> {{fit,test,validate}} --config CONFIG "
        f"[--set NAME=value ...] [--dotted.key value ...]"
    )
    subcommand = argv[0]
    assert len(argv) >= 3 and argv[1] == "--config", "--config CONFIG is required"
    # `--set NAME=value` fills the reference's [NAME] placeholder markers
    # textually before the YAML parse (some reference configs only become
    # valid YAML once filled — cli/config.py:fill_placeholders_text)
    rest = argv[3:]
    placeholders: Dict[str, Any] = {}
    overrides: List[str] = []
    i = 0
    while i < len(rest):
        if rest[i] == "--set":
            assert i + 1 < len(rest), "--set requires NAME=value"
            name, _, value = rest[i + 1].partition("=")
            placeholders[name] = yaml.safe_load(value) if value else value
            i += 2
        else:
            overrides.append(rest[i])
            i += 1
    config = load_config(argv[2], placeholders=placeholders or None)
    config = apply_overrides(config, overrides)

    leftover = check_placeholders(config)
    if leftover:
        raise SystemExit(
            "config contains unfilled [PLACEHOLDER] values:\n  " + "\n  ".join(leftover)
        )

    _seed_everything(config)
    class_path = get(config, "model.class_path", "")
    if class_path in PAPER1_MODELS:
        return _run_paper1(subcommand, config)
    if class_path in PAPER2_MODELS:
        return _run_paper2(subcommand, config)
    if class_path in CBWHISPER_MODELS:
        return _run_cbwhisper(subcommand, config)
    raise SystemExit(f"unknown model.class_path: {class_path}")

"""Synthetic on-disk dataset fixtures mirroring the reference layout
(datasets/*/build.sh output): tiny random hidden-state caches + metadata."""

import os

import numpy as np

from enhance_cb_whisper_tpu.catalog.store import save_hidden_states

N_LAYERS = 3
DIM = 8


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _save(path, arr, fmt="npy"):
    """Write a hidden-state stack in our native .npy or the reference's
    torch-pickled .bin (both readable by catalog/store.py; .bin lets the
    VERBATIM reference datasets consume the same fixture)."""
    if fmt == "bin":
        import torch

        with open(os.path.splitext(path)[0] + ".bin", "wb") as f:
            torch.save(torch.from_numpy(np.ascontiguousarray(arr)), f)
    else:
        save_hidden_states(path, arr)


def make_aishell_kws(root, n_keywords=6, n_utts=4, ghost=(4,), seed=0, fmt="npy"):
    """root/kws/{keywords.txt, positives.tsv, hs/, keywords-hs/{tts,natural}/}"""
    rng = np.random.default_rng(seed)
    kws_dir = os.path.join(root, "kws")
    os.makedirs(os.path.join(kws_dir, "hs"), exist_ok=True)
    keywords = [f"kw{i:02d}" for i in range(n_keywords)]
    with open(os.path.join(kws_dir, "keywords.txt"), "w") as f:
        f.write("\n".join(keywords) + "\n")

    for kw_type in ("tts", "natural"):
        d = os.path.join(kws_dir, "keywords-hs", kw_type)
        os.makedirs(d, exist_ok=True)
        for i in range(n_keywords):
            if i in ghost:
                continue
            t = int(rng.integers(2, 6))
            _save(
                os.path.join(d, f"{i}.npy"),
                _norm(rng.standard_normal((N_LAYERS, t, DIM), dtype=np.float32)),
                fmt,
            )

    lines = []
    positives_per_utt = {}
    kw_rev = sorted(keywords, key=lambda x: x[::-1])
    for u in range(n_utts):
        code = f"UTT{u:03d}"
        t = int(rng.integers(10, 20))
        _save(
            os.path.join(kws_dir, "hs", f"{code}.npy"),
            _norm(rng.standard_normal((N_LAYERS, t, DIM), dtype=np.float32)),
            fmt,
        )
        pos = sorted(rng.choice(n_keywords, size=2, replace=False).tolist())
        positives_per_utt[code] = pos
        parts = [code]
        for p in pos:
            parts += [keywords[p], str(p), str(kw_rev.index(keywords[p]))]
        lines.append("\t".join(parts))
    with open(os.path.join(kws_dir, "positives.tsv"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return keywords, positives_per_utt


def make_aishell_hotword(root, n_hotwords=5, n_utts=3, ghost=(3,), seed=1, fmt="npy"):
    """root/hotword/dev/{hotword.txt, text, hs/, keywords-hs/natural/}"""
    rng = np.random.default_rng(seed)
    split_dir = os.path.join(root, "hotword", "dev")
    os.makedirs(os.path.join(split_dir, "hs"), exist_ok=True)
    hotwords = [f"词{i}" for i in range(n_hotwords)]
    with open(os.path.join(split_dir, "hotword.txt"), "w") as f:
        f.write("\n".join(hotwords) + "\n")
    d = os.path.join(split_dir, "keywords-hs", "natural")
    os.makedirs(d, exist_ok=True)
    for i in range(n_hotwords):
        if i in ghost:
            continue
        t = int(rng.integers(2, 6))
        _save(
            os.path.join(d, f"{i}.npy"),
            _norm(rng.standard_normal((N_LAYERS, t, DIM), dtype=np.float32)),
            fmt,
        )
    lines = []
    for u in range(n_utts):
        code = f"BAC009S{u:04d}W{u:04d}"
        t = int(rng.integers(10, 20))
        _save(
            os.path.join(split_dir, "hs", f"{code}.npy"),
            _norm(rng.standard_normal((N_LAYERS, t, DIM), dtype=np.float32)),
            fmt,
        )
        transcript = f"前缀{hotwords[u % n_hotwords]}后缀"
        lines.append(f"{code} {transcript}")
    with open(os.path.join(split_dir, "text"), "w") as f:
        f.write("\n".join(lines) + "\n")
    return hotwords


def make_mls(root, languages=("English", "German"), n_keywords=5, n_utts=3,
             ghost=(3,), seed=2, with_dev=True, with_audio=False, sr=16000,
             dim=DIM, n_layers=N_LAYERS):
    """MLS layout: root/mls_{lang}_opus/{train,dev}/...  With ``with_audio``,
    each train utterance also gets audio/{spk}/{book}/{code}.wav (1-2 s) for
    the load_embeddings=False path."""
    import wave

    rng = np.random.default_rng(seed)
    for lang in languages:
        base = os.path.join(root, f"mls_{lang.lower()}_opus")
        train = os.path.join(base, "train")
        os.makedirs(os.path.join(train, "hs"), exist_ok=True)
        keywords = [f"{lang[:2].lower()}word{i}" for i in range(n_keywords)]
        with open(os.path.join(train, "keywords.txt"), "w") as f:
            f.write("\n".join(keywords) + "\n")
        for kw_type in ("tts", "natural"):
            d = os.path.join(train, "keywords-hs", kw_type)
            os.makedirs(d, exist_ok=True)
            for i in range(n_keywords):
                if i in ghost:
                    continue
                t = int(rng.integers(2, 6))
                save_hidden_states(
                    os.path.join(d, f"{i}.npy"),
                    _norm(rng.standard_normal((n_layers, t, dim), dtype=np.float32)),
                )
        kw_rev = sorted(keywords, key=lambda x: x[::-1])
        lines = []
        for u in range(n_utts):
            code = f"{u}_{u}_{u:06d}"
            t = int(rng.integers(10, 18))
            save_hidden_states(
                os.path.join(train, "hs", f"{code}.npy"),
                _norm(rng.standard_normal((n_layers, t, dim), dtype=np.float32)),
            )
            if with_audio:
                adir = os.path.join(train, "audio", str(u), str(u))
                os.makedirs(adir, exist_ok=True)
                n = int(rng.integers(sr, 2 * sr))
                wav_data = (rng.standard_normal(n) * 0.1).astype(np.float32)
                with wave.open(os.path.join(adir, f"{code}.wav"), "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(sr)
                    w.writeframes((wav_data * 32767).astype("<i2").tobytes())
            pos = sorted(rng.choice([i for i in range(n_keywords) if i not in ghost],
                                    size=2, replace=False).tolist())
            parts = [code]
            for p in pos:
                parts += [keywords[p], str(p), str(kw_rev.index(keywords[p]))]
            lines.append("\t".join(parts))
        with open(os.path.join(train, "positives.tsv"), "w") as f:
            f.write("\n".join(lines) + "\n")

        if with_dev:
            dev = os.path.join(base, "dev")
            os.makedirs(os.path.join(dev, "hs"), exist_ok=True)
            with open(os.path.join(dev, "keywords.txt"), "w") as f:
                f.write("\n".join(keywords) + "\n")
            d = os.path.join(dev, "keywords-hs", "natural")
            os.makedirs(d, exist_ok=True)
            for i in range(n_keywords):
                if i in ghost:
                    continue
                t = int(rng.integers(2, 6))
                save_hidden_states(
                    os.path.join(d, f"{i}.npy"),
                    _norm(rng.standard_normal((n_layers, t, dim), dtype=np.float32)),
                )
            codes, tlines, plines = [], [], []
            for u in range(n_utts):
                code = f"{u}_{u}_{u:06d}"
                codes.append(code)
                t = int(rng.integers(10, 18))
                save_hidden_states(
                    os.path.join(dev, "hs", f"{code}.npy"),
                    _norm(rng.standard_normal((n_layers, t, dim), dtype=np.float32)),
                )
                kw = keywords[u % n_keywords]
                transcript = f"the {kw} appears"
                tlines.append(f"{code}\t{transcript}")
                start = transcript.index(kw)
                plines.append("\t".join([code, kw, str(start), str(start + len(kw))]))
            with open(os.path.join(dev, "uttid"), "w") as f:
                f.write("\n".join(codes) + "\n")
            with open(os.path.join(dev, "transcripts.txt"), "w") as f:
                f.write("\n".join(tlines) + "\n")
            with open(os.path.join(dev, "positives.tsv"), "w") as f:
                f.write("\n".join(plines) + "\n")


def make_acl(root, n_keywords=4, n_utts=3, ghost=(2,), seed=3, split="eval",
             n_mels=8, whisper_dim=32, kw_layers=2, sr=16000, fmt="npy"):
    """ACL-6060 layout: root/2/acl_6060/{eval,dev}/..."""
    import wave

    rng = np.random.default_rng(seed)
    base = os.path.join(root, "2", "acl_6060", split)
    text = os.path.join(base, "text")
    os.makedirs(os.path.join(text, "txt"), exist_ok=True)
    os.makedirs(os.path.join(text, "tagged_terminology"), exist_ok=True)
    os.makedirs(os.path.join(text, "xml"), exist_ok=True)
    os.makedirs(os.path.join(base, "hs"), exist_ok=True)
    os.makedirs(os.path.join(base, "segmented_wavs", "gold"), exist_ok=True)

    keywords = [f"term{i}" for i in range(n_keywords)]
    with open(os.path.join(text, "keywords.txt"), "w") as f:
        f.write("\n".join(keywords) + "\n")

    kw_dir = os.path.join(base, "keywords-hs", "tts")
    os.makedirs(kw_dir, exist_ok=True)
    for i in range(n_keywords):
        if i in ghost:
            continue
        t = int(rng.integers(2, 6))
        _save(
            os.path.join(kw_dir, f"{i}.npy"),
            _norm(rng.standard_normal((kw_layers, t, whisper_dim), dtype=np.float32)),
            fmt,
        )

    transcripts, tagged, segs = [], [], []
    for u in range(n_utts):
        kw = keywords[u % n_keywords]
        transcripts.append(f"the {kw} is here")
        tagged.append(f"the [{kw}] is here")
        t = int(rng.integers(8, 14))
        _save(
            os.path.join(base, "hs", f"sent_{u + 1}.npy"),
            _norm(rng.standard_normal((kw_layers, t, whisper_dim), dtype=np.float32)),
            fmt,
        )
        wav = (rng.standard_normal(sr) * 0.05).astype(np.float32)
        with wave.open(os.path.join(base, "segmented_wavs", "gold", f"sent_{u + 1}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes((wav * 32767).astype("<i2").tobytes())
        segs.append(f'<seg id="{u + 1}">{transcripts[-1]}</seg>')

    with open(os.path.join(text, "txt", f"ACL.6060.{split}.en-xx.en.txt"), "w") as f:
        f.write("\n".join(transcripts) + "\n")
    with open(os.path.join(text, "tagged_terminology", f"ACL.6060.{split}.tagged.en-xx.en.txt"), "w") as f:
        f.write("\n".join(tagged) + "\n")
    with open(os.path.join(text, "xml", f"ACL.6060.{split}.en-xx.en.xml"), "w") as f:
        f.write(
            '<mteval><srcset setid="s" srclang="en"><doc docid="d1" code="c1">'
            + "".join(segs)
            + "</doc></srcset></mteval>"
        )
    return keywords


def make_mls_expanded(root, expanded_root, languages=("English",), seed=4, **kw):
    """Expanded-catalog variant: same keyword DB, separate audio/transcripts
    root (MLSEvaluationDataset.root_audios_transcripts)."""
    make_mls(root, languages=languages, seed=seed, **kw)
    rng = np.random.default_rng(seed + 100)
    for lang in languages:
        src = os.path.join(root, f"mls_{lang.lower()}_opus", "dev")
        dst = os.path.join(expanded_root, f"mls_{lang.lower()}_opus", "dev")
        os.makedirs(os.path.join(dst, "hs"), exist_ok=True)
        # different utterances/transcripts for the expanded catalog eval
        keywords = [l.strip() for l in open(os.path.join(src, "keywords.txt"))]
        codes, tlines, plines = [], [], []
        for u in range(2):
            code = f"9_{u}_{u:06d}"
            codes.append(code)
            t = int(rng.integers(10, 16))
            save_hidden_states(
                os.path.join(dst, "hs", f"{code}.npy"),
                _norm(rng.standard_normal((N_LAYERS, t, DIM), dtype=np.float32)),
            )
            kw_ = keywords[u % len(keywords)]
            transcript = f"expanded {kw_} utterance"
            tlines.append(f"{code}\t{transcript}")
            start = transcript.index(kw_)
            plines.append("\t".join([code, kw_, str(start), str(start + len(kw_))]))
        with open(os.path.join(dst, "uttid"), "w") as f:
            f.write("\n".join(codes) + "\n")
        with open(os.path.join(dst, "transcripts.txt"), "w") as f:
            f.write("\n".join(tlines) + "\n")
        with open(os.path.join(dst, "positives.tsv"), "w") as f:
            f.write("\n".join(plines) + "\n")


import contextlib


@contextlib.contextmanager
def tiny_paper1_patch():
    """Swap the paper-1 CLI runner for one with a fixture-sized ResNet (the
    production runner hard-wires the 12-channel ResNet-50)."""
    import unittest.mock as mock

    import enhance_cb_whisper_tpu.cli.main as main
    from enhance_cb_whisper_tpu.models.resnet import ResNetConfig

    tiny = ResNetConfig(
        num_channels=3, embedding_size=8, hidden_sizes=(8, 16, 24, 32),
        depths=(1, 1, 1, 1), num_labels=2,
    )

    def run(subcommand, config):
        from enhance_cb_whisper_tpu.cli.config import filter_kwargs, get
        from enhance_cb_whisper_tpu.data.datamodule import KWSDataMod
        from enhance_cb_whisper_tpu.runtime.kws_engine import KWSEngine
        from enhance_cb_whisper_tpu.runtime.logging import MetricsLogger
        from enhance_cb_whisper_tpu.train.kws_train import KWSTrainConfig

        model_args = get(config, "model.init_args", {}) or {}
        data_args = dict(get(config, "data.init_args", {}) or {})
        for key in ("sampling", "resample_every_epoch", "kw_type", "batch_size"):
            if key in model_args:
                data_args[key] = model_args[key]
        train_config = KWSTrainConfig(**filter_kwargs(model_args, KWSTrainConfig))
        if data_args.get("device_features"):  # mirrors cli/main.py:_run_paper1
            import dataclasses as _dc

            train_config = _dc.replace(
                train_config, device_features=tuple(data_args["features_size"])
            )
        datamodule = KWSDataMod(**filter_kwargs(data_args, KWSDataMod))
        log_dir = get(config, "trainer.default_root_dir") or "runs/kws"
        engine = KWSEngine(
            train_config, resnet_config=tiny,
            features_size=tuple(data_args["features_size"]),
            ckpt_dir=os.path.join(log_dir, "checkpoints"),
            logger=MetricsLogger(log_dir),
        )
        if subcommand == "fit":
            return engine.fit(
                datamodule,
                max_epochs=get(config, "trainer.max_epochs") or 1,
                limit_train_batches=get(config, "trainer.limit_train_batches"),
            )
        variables = main._load_kws_variables(config["ckpt_path"], tiny)
        return engine.test(variables, datamodule)

    with mock.patch.object(main, "_run_paper1", run):
        yield

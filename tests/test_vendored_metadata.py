"""Drive dataset construction over the REAL vendored corpus metadata.

The reference ships ~23 MB of metadata under ``datasets/`` that every
pipeline consumes (reference datasets/{aishell,mls,acl}); round 1 shipped
only the build scripts. These tests assemble reference-layout directories
from the vendored files (synthetic ``.npy`` hidden-state caches standing in
for the unavailable audio, exactly the ghost-tolerant situation the
reference handles via masking, dataset.py:53,84) and assert the corpus
counts. NOTE: SURVEY §2.6 quotes wc-l figures (19,999 aishell; 241/199 ACL;
11,999 MLS) but the metadata files lack a trailing newline on their last
line, so every parser — the reference's readlines() included — sees one
more: 20,000 aishell train keywords; 242 ACL dev / 200 ACL eval; 12,000
keywords x 6 MLS languages. We assert the parser-visible counts.
"""

import os

import numpy as np
import pytest

from enhance_cb_whisper_tpu.catalog.store import save_hidden_states
from enhance_cb_whisper_tpu.data.datasets import (
    ACL6060KeywordDataset,
    AishellKWSDataset,
    MLSKWSDataset,
)

from fixtures import make_acl

DATASETS = os.path.join(os.path.dirname(__file__), "..", "datasets")

N_LAYERS, DIM = 2, 16


def _norm(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _read_keywords(path):
    with open(path) as f:
        return [line.split()[0].strip() for line in f]


@pytest.fixture(scope="module")
def rng():
    return np.random.default_rng(0)


def test_aishell_train_metadata(tmp_path, rng):
    """AishellKWSDataset over the vendored train/keywords.txt (19,999 lines);
    positives.tsv is user-corpus-supplied in the reference too, so a small
    synthetic one using the real keyword indices stands in."""
    kws_meta = os.path.join(DATASETS, "aishell", "train")
    keywords = _read_keywords(os.path.join(kws_meta, "keywords.txt"))
    assert len(keywords) == 20000

    root = tmp_path / "aishell"
    kws = root / "kws"
    (kws / "hs").mkdir(parents=True)
    (kws / "keywords-hs" / "natural").mkdir(parents=True)
    import shutil

    shutil.copy(os.path.join(kws_meta, "keywords.txt"), kws / "keywords.txt")

    pos_idx, ghost_idx = 5, 7
    code = "BAC009S0002W0122"
    with open(kws / "positives.tsv", "w") as f:
        f.write(f"{code}\t{keywords[pos_idx]}\t{pos_idx}\t11\n")
    save_hidden_states(
        str(kws / "hs" / f"{code}.npy"),
        _norm(rng.standard_normal((N_LAYERS, 20, DIM), dtype=np.float32)),
    )
    # zfill over 19,999 keywords -> 5-digit filenames (dataset.py:49-53)
    save_hidden_states(
        str(kws / "keywords-hs" / "natural" / f"{pos_idx:05d}.npy"),
        _norm(rng.standard_normal((N_LAYERS, 4, DIM), dtype=np.float32)),
    )

    ds = AishellKWSDataset(str(root), kw_type="natural")
    assert ds.n_keywords == 20000
    assert len(ds) == 20000  # 1 utterance x 20,000 keywords
    assert len(ds.ghost_keyword_indices) == 19999  # every bin but one missing

    item = ds[pos_idx]
    assert item["label"] == 1 and item["mask"] == 1
    assert item["features"].shape == (N_LAYERS, 4, 20)
    item = ds[ghost_idx]
    assert item["label"] == 0 and item["mask"] == 0


def test_mls_train_metadata(tmp_path, rng):
    """MLSKWSDataset over all six vendored language corpora: real
    keywords.txt + real positives.tsv per language."""
    import shutil

    languages = ("English", "French", "German", "Polish", "Portuguese", "Spanish")
    root = tmp_path / "mls"
    n_pos_lines = {}
    for lang in languages:
        sub = f"mls_{lang.lower()}_opus"
        meta = os.path.join(DATASETS, "mls", "train", sub)
        base = root / sub / "train"
        (base / "hs").mkdir(parents=True)
        (base / "keywords-hs" / "natural").mkdir(parents=True)
        shutil.copy(os.path.join(meta, "keywords.txt"), base / "keywords.txt")
        shutil.copy(os.path.join(meta, "positives.tsv"), base / "positives.tsv")
        with open(os.path.join(meta, "positives.tsv")) as f:
            n_pos_lines[lang] = sum(1 for _ in f)

    # real first English utterance + its first positive keyword get caches
    with open(root / "mls_english_opus" / "train" / "positives.tsv") as f:
        first = f.readline().rstrip("\n").split("\t")
    code, first_kw, first_kw_idx = first[0], first[1], int(first[2])
    save_hidden_states(
        str(root / "mls_english_opus" / "train" / "hs" / f"{code}.npy"),
        _norm(rng.standard_normal((N_LAYERS, 30, DIM), dtype=np.float32)),
    )
    save_hidden_states(
        str(
            root / "mls_english_opus" / "train" / "keywords-hs" / "natural"
            / f"{first_kw_idx:05d}.npy"
        ),
        _norm(rng.standard_normal((N_LAYERS, 3, DIM), dtype=np.float32)),
    )

    ds = MLSKWSDataset(str(root), languages=languages, kw_type="natural")
    for lang in languages:
        assert len(ds.keywords[lang]) == 12000
        assert ds.keywords[lang][_read_keywords(
            os.path.join(DATASETS, "mls", "train", f"mls_{lang.lower()}_opus", "keywords.txt")
        )[0]] == 0
    total_kw = 6 * 12000
    assert ds.n_keywords[-1] == total_kw
    assert len(ds) == sum(n_pos_lines.values()) * total_kw

    # English sorts first -> utterance 0 x English keyword idx == positive
    item = ds[first_kw_idx]
    assert ds.keywords["English"][first_kw] == first_kw_idx
    assert item["label"] == 1 and item["mask"] == 1
    assert item["domain"] == 6  # natural + English(=0)

    # cross-language pair (English utt 0 x French keyword) is negative
    item = ds[12000 + 3]
    assert item["label"] == 0 and item["mask"] == 0  # no French bins -> ghost


@pytest.mark.parametrize("split,expected", [("dev", 242), ("test", 200)])
def test_acl_keywords_metadata(tmp_path, rng, split, expected):
    """ACL6060KeywordDataset over the vendored keywords.txt (242 dev /
    200 eval); transcripts/XML come from the corpus, synthesized here."""
    import shutil

    hf_split = "dev" if split == "dev" else "eval"
    make_acl(str(tmp_path), n_keywords=4, n_utts=3, ghost=(), split=hf_split,
             whisper_dim=DIM, kw_layers=N_LAYERS)
    base = tmp_path / "2" / "acl_6060" / hf_split
    shutil.copy(
        os.path.join(DATASETS, "acl", hf_split, "keywords.txt"),
        base / "text" / "keywords.txt",
    )
    # real keyword DB: mostly ghosts, two synthetic caches at 3-digit names
    kw_dir = base / "keywords-hs" / "tts"
    for old in kw_dir.iterdir():
        old.unlink()
    for i in (0, 1):
        save_hidden_states(
            str(kw_dir / f"{i:03d}.npy"),
            _norm(rng.standard_normal((N_LAYERS, 3, DIM), dtype=np.float32)),
        )

    ds = ACL6060KeywordDataset(str(tmp_path), split=split, kw_type="tts")
    assert len(ds.keywords) == expected
    assert ds.keywords == _read_keywords(os.path.join(DATASETS, "acl", hf_split, "keywords.txt"))
    item = ds[0]
    assert item["hotword_mask"].shape == (expected,)
    assert int(item["hotword_mask"].sum()) == 2  # only the two cached keywords
    assert item["hotword_labels"].shape == (expected,)


def test_aishell_aligned_drives_cut_audios(tmp_path):
    """The vendored aligned.txt drives the keyword-cutting pipeline CLI
    end-to-end (utils.py --cut_audios; reference build.sh:86)."""
    import wave

    from enhance_cb_whisper_tpu.pipeline import main as pipeline_main

    with open(os.path.join(DATASETS, "aishell", "train", "aligned.txt")) as f:
        lines = [f.readline() for _ in range(3)]
    aligned = tmp_path / "aligned.txt"
    aligned.write_text("".join(lines))

    wavs = tmp_path / "wav"
    wavs.mkdir()
    sr = 16000
    for line in lines:
        _, source, _, end = line.split("\t")
        n = int((float(end) + 1.0) * sr)
        with wave.open(str(wavs / f"{source}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(np.zeros(n, "<i2").tobytes())

    out = tmp_path / "keywords-audios"
    pipeline_main([
        "--cut_audios", "-a", str(wavs), "-k", str(aligned), "-t", str(out),
    ])
    cut = sorted(os.listdir(out))
    assert cut == ["0.wav", "1.wav", "2.wav"]
    with wave.open(str(out / "0.wav")) as w:
        _, source, start, end = lines[0].split("\t")
        assert w.getnframes() == int(float(end) * sr) - int(float(start) * sr)


def _make_real_acl_layout(root, rng, hf_split="dev", n_layers=3, dim=8):
    """Reference ACL layout carrying the REAL vendored keywords.txt; corpus
    pieces (transcripts/tagged/xml/wavs/hs) synthesized around the first
    three real keywords."""
    import shutil
    import wave

    real_keywords = _read_keywords(os.path.join(DATASETS, "acl", hf_split, "keywords.txt"))
    base = os.path.join(root, "2", "acl_6060", hf_split)
    text = os.path.join(base, "text")
    for sub in ("txt", "tagged_terminology", "xml"):
        os.makedirs(os.path.join(text, sub), exist_ok=True)
    os.makedirs(os.path.join(base, "hs"), exist_ok=True)
    os.makedirs(os.path.join(base, "segmented_wavs", "gold"), exist_ok=True)
    kw_dir = os.path.join(base, "keywords-hs", "tts")
    os.makedirs(kw_dir, exist_ok=True)

    shutil.copy(os.path.join(DATASETS, "acl", hf_split, "keywords.txt"),
                os.path.join(text, "keywords.txt"))
    for i in range(3):
        save_hidden_states(
            os.path.join(kw_dir, f"{i:03d}.npy"),
            _norm(rng.standard_normal((n_layers, 4, dim), dtype=np.float32)),
        )

    transcripts, tagged, segs = [], [], []
    sr = 16000
    for u in range(3):
        kw = real_keywords[u]
        transcripts.append(f"the {kw} is here")
        tagged.append(f"the [{kw}] is here")
        save_hidden_states(
            os.path.join(base, "hs", f"sent_{u + 1}.npy"),
            _norm(rng.standard_normal((n_layers, 12, dim), dtype=np.float32)),
        )
        with wave.open(os.path.join(base, "segmented_wavs", "gold", f"sent_{u + 1}.wav"), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(np.zeros(sr, "<i2").tobytes())
        segs.append(f'<seg id="{u + 1}">{transcripts[-1]}</seg>')

    with open(os.path.join(text, "txt", f"ACL.6060.{hf_split}.en-xx.en.txt"), "w") as f:
        f.write("\n".join(transcripts) + "\n")
    with open(os.path.join(text, "tagged_terminology",
                           f"ACL.6060.{hf_split}.tagged.en-xx.en.txt"), "w") as f:
        f.write("\n".join(tagged) + "\n")
    with open(os.path.join(text, "xml", f"ACL.6060.{hf_split}.en-xx.en.xml"), "w") as f:
        f.write('<mteval><srcset setid="s" srclang="en"><doc docid="d1" code="c1">'
                + "".join(segs) + "</doc></srcset></mteval>")
    return real_keywords


def test_kws_cli_over_real_acl_metadata(tmp_path, rng):
    """``kws.py test`` (the dispatcher) end-to-end over a reference-layout
    directory whose keyword DB is the REAL vendored ACL dev metadata
    (VERDICT r1 item 2): train on the synthetic aishell fixture, then score
    all 242 real keywords against three utterances."""
    import yaml

    from enhance_cb_whisper_tpu.cli import run_cli
    from fixtures import make_aishell_hotword, make_aishell_kws, tiny_paper1_patch

    aishell_root = tmp_path / "aishell"
    make_aishell_kws(str(aishell_root))
    make_aishell_hotword(str(aishell_root))
    acl_root = tmp_path / "acl"
    _make_real_acl_layout(str(acl_root), rng)

    run_dir = str(tmp_path / "run")
    config = {
        "trainer": {"max_epochs": 1, "limit_train_batches": 2,
                    "default_root_dir": run_dir},
        "model": {"class_path": "model.model.KWSModel",
                  "init_args": {"sampling": "random", "kw_type": "natural",
                                "batch_size": 4, "learning_rate": 1e-3}},
        "data": {"class_path": "data.data_module.KWSDataMod",
                 "init_args": {
                     "train_info": [{"name": "aishell", "root": str(aishell_root),
                                     "kw_type": "natural"}],
                     "val_info": [{"name": "aishell", "root": str(aishell_root),
                                   "kw_type": "natural"}],
                     "test_info": {"name": "acl", "root": str(acl_root),
                                   "kw_type": "tts"},
                     "test_split": "dev",
                     "features_size": [32, 48],
                     "hotwords_per_group": 50,
                     "batch_size": 4,
                     "sampling": "random"}},
        "ckpt_path": None,
    }
    cfg = tmp_path / "kws-acl.yaml"
    with open(cfg, "w") as f:
        yaml.safe_dump(config, f)

    with tiny_paper1_patch():
        run_cli(["fit", "--config", str(cfg)])
        ckpt = os.path.join(run_dir, "checkpoints", "final")
        results = run_cli(["test", "--config", str(cfg), "--ckpt_path", ckpt])
    assert "F1" in results

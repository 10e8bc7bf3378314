"""Shims that let reference modules from /root/reference/src run VERBATIM
in this environment (only their unavailable third-party imports are stubbed;
the stubs implement the exact behavior the reference relies on).

Used by the differential fuzz suites (test_collator_differential.py,
test_dataset_differential.py).
"""

import importlib.machinery
import importlib.util
import sys
import types

REF_DIR = "/root/reference/src"


def _module(name):
    """Stub module with a real ModuleSpec (transformers and friends probe
    `importlib.util.find_spec`, which raises on `__spec__ is None`)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    return mod


def torchvision_shim():
    """torchvision.transforms.functional.resize on float tensors IS
    `F.interpolate(mode='bilinear', align_corners=False, antialias=…)` —
    the stub is that exact lowering, so reference code runs the real ATen
    resize kernel."""
    import torch.nn.functional as F

    def resize(img, size, antialias=True, interpolation=None):
        return F.interpolate(
            img[None].float(), size=tuple(int(s) for s in size),
            mode="bilinear", align_corners=False, antialias=bool(antialias),
        )[0]

    tv = _module("torchvision")
    tr = _module("torchvision.transforms")
    fn = _module("torchvision.transforms.functional")
    fn.resize = resize
    tr.functional = fn
    tv.transforms = tr
    return {"torchvision": tv, "torchvision.transforms": tr,
            "torchvision.transforms.functional": fn}


def torchaudio_shim():
    """Module object only — the KWS (embedding-based) dataset paths never
    call torchaudio; loading dataset.py just needs the import to resolve."""
    ta = _module("torchaudio")
    fn = _module("torchaudio.functional")

    def _unavailable(*a, **k):  # pragma: no cover - guard
        raise RuntimeError("torchaudio stub: audio paths not under test")

    ta.load = _unavailable
    fn.resample = _unavailable
    ta.functional = fn
    return {"torchaudio": ta, "torchaudio.functional": fn}


def whisper_audio_shim():
    """openai-whisper constants used by dataset.py's audio path
    (whisper/audio.py: SAMPLE_RATE=16000, N_SAMPLES=480000)."""
    w = _module("whisper")
    wa = _module("whisper.audio")
    wa.SAMPLE_RATE = 16000
    wa.N_SAMPLES = 480000
    w.audio = wa
    return {"whisper": w, "whisper.audio": wa}


def lightning_shim():
    """Minimal pytorch_lightning: LightningModule is an nn.Module whose
    `save_hyperparameters()` captures the caller __init__'s arguments into
    an attribute-accessible `hparams` namespace (the only Lightning surface
    the reference model's forward path touches)."""
    import inspect

    import torch.nn as nn

    class LightningModule(nn.Module):
        def save_hyperparameters(self, *a, **k):
            frame = inspect.currentframe().f_back
            loc = dict(frame.f_locals)
            loc.pop("self", None)
            loc.pop("__class__", None)
            extra = loc.pop("kwargs", None) or {}
            loc.update(extra)
            object.__setattr__(self, "_hparams_ns", types.SimpleNamespace(**loc))

        @property
        def hparams(self):
            return self._hparams_ns

        def log(self, name, value, *a, **k):
            if not hasattr(self, "logged"):
                object.__setattr__(self, "logged", {})
            self.logged[name] = value

        def log_dict(self, d, *a, **k):
            for k_, v in d.items():
                self.log(k_, v)

        # manual-optimization surface (training_step of src/model/model.py
        # uses these when adversarial_training=True); the test wires
        # `_optimizers`/`_schedulers`/`trainer` before calling training_step
        def optimizers(self):
            return self._optimizers

        def lr_schedulers(self):
            return self._schedulers

        def manual_backward(self, loss):
            loss.backward()

    class LightningDataModule:
        """Bare base: the reference data modules only rely on it being a
        constructible base class with a no-arg __init__."""

        def __init__(self, *a, **k):
            pass

    pl = _module("pytorch_lightning")
    pl.LightningModule = LightningModule
    pl.LightningDataModule = LightningDataModule
    return {"pytorch_lightning": pl}


def torchmetrics_shim():
    import torch

    tm = _module("torchmetrics")

    class PrecisionRecallCurve:
        def __init__(self, *a, **k):
            pass

    class Accuracy:
        """Plain multiclass accuracy (the only use, model.py:74+212, feeds
        equal-length 1-D pred/target index tensors)."""

        def __init__(self, *a, **k):
            pass

        def __call__(self, preds, target):
            return (preds == target).float().mean()

    tm.PrecisionRecallCurve = PrecisionRecallCurve
    tm.Accuracy = Accuracy
    return {"torchmetrics": tm}


def tiny_resnet_transformers_shim(**config_overrides):
    """Pass-through `transformers` whose ResNetConfig() applies tiny-size
    overrides AFTER real construction, so the reference's hard-coded
    `Resnet(num_channels=12, ...)` (src/model/resnet.py:14-21) builds a
    test-sized tower.  ResNetModel is the real class — the forward under
    test is untouched."""
    import transformers as real

    t = _module("transformers")

    def ResNetConfig(*a, **k):
        cfg = real.ResNetConfig(*a, **k)
        for key, val in config_overrides.items():
            setattr(cfg, key, val)
        return cfg

    t.ResNetConfig = ResNetConfig
    t.ResNetModel = real.ResNetModel
    return {"transformers": t}


def confidence_intervals_shim():
    ci = _module("confidence_intervals")

    def evaluate_with_conf_int(*a, **k):  # pragma: no cover - guard
        raise RuntimeError("confidence_intervals stub: not under test")

    ci.evaluate_with_conf_int = evaluate_with_conf_int
    return {"confidence_intervals": ci}


def load_reference_package_module(dotted, shims):
    """Import a module from the reference SOURCE PACKAGE (e.g.
    'efficient_kws.model' — needed when the module uses relative imports)
    with `shims` pre-seeded.  Returns (module, saved)."""
    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    sys.path.insert(0, REF_DIR)
    try:
        import importlib

        return importlib.import_module(dotted), saved
    except Exception:
        restore_modules(saved)
        raise
    finally:
        sys.path.remove(REF_DIR)


def load_reference_module(relpath, name, shims):
    """Exec a reference module with `shims` pre-seeded in sys.modules.
    Returns (module, saved) — pass `saved` to `restore_modules` when done."""
    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    try:
        spec = importlib.util.spec_from_file_location(name, f"{REF_DIR}/{relpath}")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod, saved
    except Exception:
        restore_modules(saved)
        raise


def restore_modules(saved):
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v

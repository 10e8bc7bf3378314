from .io import read_wav, resample, load_audio_16k, prepare_features

__all__ = ["read_wav", "resample", "load_audio_16k", "prepare_features"]

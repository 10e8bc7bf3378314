"""enhance_cb_whisper_tpu — a TPU-native (JAX/XLA/Pallas/pjit) contextual-biasing
Whisper + open-vocabulary keyword-spotting framework.

Re-implements, TPU-first, the capabilities of the reference
Priberam/Enhance-CB-Whisper stack (Interspeech 2024 + 2026 papers):

* Whisper encoder/decoder in JAX (flax) with HF weight loading
  (reference: torch/HF, src/utils.py:130-205, src/model/pba_whisper.py).
* Cosine-similarity KWS over layer-stacked encoder hidden states with a
  ResNet classifier (reference: src/model/model.py, src/efficient_kws/model.py).
* L / LE / LEF projection variants (per-layer MLP, temporal Conv1d).
* Longform contextual-biasing transcription (PBAWhisper seek loop) with
  on-the-fly keyword spotting injected into the decoder prompt.
* Entity-recall scoring (Needleman-Wunsch alignment) and bootstrap CIs.

Design stance (see SURVEY.md §7): the keyword catalog is scored as a single
batched device launch instead of Python group loops; all shapes are static;
data-dependent control flow (longform seek, temperature fallback) lives in a
thin host driver around jit-compiled steps; scaling is expressed through a
`jax.sharding.Mesh` instead of DDP.
"""

__version__ = "0.1.0"

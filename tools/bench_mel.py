"""On-chip A/B: XLA log-mel vs the fused Pallas mel kernel.

VERDICT r3 next #6: `ops/mel_pallas.py` is parity-tested but was never
timed on the chip.  The extraction pipeline is transfer-bound through this
relay (docs/PERF.md), so an end-to-end A/B cannot resolve the mel's share;
this microbench times the mel program itself, relay-safe (CLAUDE.md): N
dependent iterations chained inside ONE jit via fori_loop (the output
perturbs the next input so nothing CSEs away), scalar output, host fetch
as the completion barrier.

Prints one JSON line {"metric": "mel_ab", ...} with ms/batch for both
implementations and the speedup.  Keep the kernel only if it wins.
Reference call sites the mel serves: src/utils.py:186-187,
src/data/dataset.py:332-342.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from enhance_cb_whisper_tpu.runtime.compile_cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from enhance_cb_whisper_tpu.ops.mel import N_SAMPLES, log_mel_spectrogram
from enhance_cb_whisper_tpu.ops.mel_pallas import log_mel_spectrogram_pallas

B = int(os.environ.get("ECW_MEL_BATCH", "8"))
ITERS = int(os.environ.get("ECW_MEL_ITERS", "20"))
N_MELS = int(os.environ.get("ECW_MEL_NMELS", "80"))


def _chain(mel_fn):
    @jax.jit
    def run(w):
        def body(_, carry):
            w, acc = carry
            m = mel_fn(w, N_MELS)
            s = jnp.sum(m, dtype=jnp.float32)
            # feed a data dependency back into the audio so iterations
            # cannot collapse; the perturbation is numerically negligible
            w = w * (1.0 + 1e-12 * s)
            return (w, acc + s)

        _, acc = jax.lax.fori_loop(0, ITERS, body, (w, jnp.float32(0)))
        return acc

    return run


def _time(run, w):
    out = run(w)
    np.asarray(out)  # warm + compile barrier
    t0 = time.perf_counter()
    out = run(w)
    v = float(np.asarray(out))
    wall = time.perf_counter() - t0
    return wall / ITERS * 1e3, v  # ms per batch


def main():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((B, N_SAMPLES)).astype(np.float32) * 0.05)

    xla_ms, v_x = _time(_chain(log_mel_spectrogram), w)
    pal_ms, v_p = _time(_chain(log_mel_spectrogram_pallas), w)

    # parity on the measured operands (sum over B*80*3000 log-mel values)
    rel = abs(v_x - v_p) / max(abs(v_x), 1e-6)

    print(json.dumps({
        "metric": "mel_ab",
        "value": round(xla_ms / pal_ms, 3),
        "unit": "x (pallas speedup over xla)",
        "xla_ms_per_batch": round(xla_ms, 3),
        "pallas_ms_per_batch": round(pal_ms, 3),
        "batch": B,
        "iters": ITERS,
        "sum_rel_diff": rel,
    }))


if __name__ == "__main__":
    main()

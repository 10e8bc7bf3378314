"""Decode-loop bandwidth roofline: bytes moved per decode step vs HBM peak.

The serving decode loop is HBM-bound (docs/PERF.md "where the time goes"):
every step re-reads the decoder weights, the growing self-attention KV
cache, and the per-segment cross-attention K/V slabs.  This tool computes
that per-step traffic for a given configuration and prints the
bandwidth-floor step time and the decode-loop ceiling RTFx, so measured
device times (ECW_RTFX_PROFILE breakdowns) can be placed against physics —
the same closure the int8-scorer and train-step rooflines got in round 5
(docs/PERF.md).  Pure arithmetic, no device needed.

Traffic model per step (batch rows B include folded beams; serving decode
re-reads everything every step — the weight read amortizes over B, the
KV/cross reads scale with B):

* decoder weights: 16 d^2 per layer (self qkvo 4d^2 + cross qkvo 4d^2 +
  FFN 8d^2 at ffn=4d) x layers, + the tied vocab projection V*d —
  1 B/param int8, 2 B bf16;
* self-KV read: 2 tensors x layers x t x d per ROW (beams are rows),
  averaged over the step index (t/2 of max_len on a full-length decode);
* cross-KV read: 2 x layers x 1500 x d per UTTERANCE, every step — beams
  are folded into the cross-attention query axis and share one K/V slab
  (the round-2 exact folding, models/whisper.py), so this term does NOT
  scale with beam width.

Env: ECW_ROOFLINE_BW_GBS (default 819 — v5e HBM peak).
Prints one JSON line with a row per flagship configuration.
"""

import json
import os


def step_traffic_bytes(
    d, layers, vocab, frames, rows, utts, avg_t,
    weights_bytes=1, vocab_bytes=1, kv_bytes=2, xkv_bytes=2,
):
    weights = 16 * d * d * layers * weights_bytes + vocab * d * vocab_bytes
    self_kv = 2 * layers * avg_t * d * kv_bytes * rows
    cross_kv = 2 * layers * frames * d * xkv_bytes * utts
    return weights, self_kv, cross_kv


def main():
    bw = float(os.environ.get("ECW_ROOFLINE_BW_GBS", "819")) * 1e9
    # (d, decoder layers, vocab, cross frames, max target positions)
    dims = {
        "medium": (1024, 24, 51865, 1500, 448),
        "large-v2": (1280, 32, 51865, 1500, 448),
    }
    rows = []
    for model, (d, layers, vocab, frames, max_t) in dims.items():
        for name, rows_n, kv_b, xkv_b in (
            # flagship serving configs (BASELINE.md g-sweep bests)
            ("greedy_b4_int8", 4, 2, 2),
            ("greedy_b4_int8_xkv8", 4, 2, 1),
            ("beam5_b4_int8_kv8_xkv8", 20, 1, 1),
        ):
            w, kv, xkv = step_traffic_bytes(
                d, layers, vocab, frames, rows_n, utts=4, avg_t=max_t // 2,
                weights_bytes=1, vocab_bytes=1, kv_bytes=kv_b, xkv_bytes=xkv_b,
            )
            total = w + kv + xkv
            floor_ms = total / bw * 1e3
            # decode-loop-only ceiling: 4 utterances x 30 s audio per
            # full-length (max_t-step) launch window
            ceiling_rtfx = 4 * 30.0 / (max_t * floor_ms / 1e3)
            rows.append({
                "model": model,
                "config": name,
                "weights_MB": round(w / 1e6, 1),
                "self_kv_MB": round(kv / 1e6, 1),
                "cross_kv_MB": round(xkv / 1e6, 1),
                "floor_ms_per_step": round(floor_ms, 3),
                "decode_loop_ceiling_rtfx": round(ceiling_rtfx, 1),
            })
    # sanity: halving a traffic term can only lower the floor
    by = {(r["model"], r["config"]): r for r in rows}
    for m in dims:
        assert (
            by[(m, "greedy_b4_int8_xkv8")]["floor_ms_per_step"]
            <= by[(m, "greedy_b4_int8")]["floor_ms_per_step"]
        )
    print(json.dumps({
        "metric": "decode_bandwidth_roofline",
        "hbm_gbs": bw / 1e9,
        "rows": rows,
    }))


if __name__ == "__main__":
    main()

"""Smoke test for the composed serving benchmark (bench_serving.py).

VERDICT r3 #8 wants the whole serving stack in one number; this pins that
the composition — 100k-style LEF int8 retrieval → per-utterance hotword
shortlist → live TranscriptionService over the packed scheduler with int8
decode — actually runs end-to-end and emits the JSON contract, at
CPU-sized dims (the real numbers come from the TPU sweep).
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_serving_smoke(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.update(
        JAX_PLATFORMS="cpu",
        ECW_COMPILE_CACHE="off",
        ECW_SRV_MODEL="tiny", ECW_SRV_CAT_N="64", ECW_SRV_CHUNK="32",
        ECW_SRV_TK="8", ECW_SRV_MSP="24", ECW_SRV_MTP="32",
        ECW_SRV_NKW="8", ECW_SRV_KWS_H="32", ECW_SRV_KWS_W="48",
        ECW_SRV_UTTS="2", ECW_SRV_SLOTS="2", ECW_SRV_SECONDS="4",
    )
    out = subprocess.run(
        [sys.executable, "bench_serving.py"], cwd=REPO, env=env,
        capture_output=True, text=True, timeout=900,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    rec = json.loads(line)
    assert rec["metric"] == "serving_utterances_per_hour"
    assert rec["value"] > 0 and rec["corpus_rtfx"] > 0
    assert rec["p95_latency_s"] >= rec["p50_latency_s"] > 0
    assert rec["retrieval_ms_per_utt"] > 0 and rec["utts"] == 2

"""The cascade recall-characterization harness (tools/cascade_recall.py)
must run end-to-end at tiny CPU dims and emit its one-JSON-line report —
the full-dims variant of this exact flow produced the round-5 recall table
(docs/PERF.md), and the tool broke silently once before (the r5c host OOM)
precisely because no test exercised it."""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_cascade_recall_tiny_smoke():
    env = {
        **os.environ,
        "JAX_PLATFORMS": "cpu",
        "ECW_COMPILE_CACHE": "off",
        "ECW_REC_DIMS": "tiny",
        "ECW_REC_N": "128",
        "ECW_REC_UTTS": "2",
        "ECW_REC_CHUNK": "16",
        "ECW_REC_KS": "16,64,128",
    }
    # sitecustomize initializes the axon backend at interpreter start when
    # this is set — scrub BEFORE the child starts (CLAUDE.md)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    out = subprocess.run(
        [sys.executable, "tools/cascade_recall.py"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    row = json.loads(out.stdout.strip().splitlines()[-1])
    assert row["metric"] == "cascade_recall_characterization"
    assert row["catalog_n"] == 128 and row["utterances"] == 2
    for proxy in ("proxy_f32", "proxy_bf16"):
        planted = row[proxy]["recall_planted"]
        # recall@K is monotone in K and complete at K=N
        assert planted["16"] <= planted["64"] <= planted["128"] == 1.0
    agree = row["bf16_f32_shortlist_agreement"]
    assert agree["128"] == 1.0  # full-catalog shortlists trivially agree
    assert 0.0 <= agree["16"] <= 1.0

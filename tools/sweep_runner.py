"""Resilient TPU benchmark sweep runner.

The remote TPU relay (see CLAUDE.md) goes down for stretches; naive
sequential sweeps burn hours failing stage after stage.  This runner
health-probes the backend with a cheap subprocess before each stage and
retries failed stages until a global deadline, so a multi-hour sweep
survives relay outages.

Usage:  nohup python tools/sweep_runner.py [plan.json] > /tmp/sweep.log 2>&1 &

The plan is a JSON list of {"tag": str, "env": {...}, "cmd": [...]} stages;
the default plan is the round-3 decoder-int8 / ancestry-beam sweep.
Results (the one-JSON-line outputs) are appended to /tmp/sweep_results.jsonl.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RESULTS = os.environ.get("ECW_SWEEP_RESULTS", "/tmp/sweep_results.jsonl")
PROBE_TIMEOUT = float(os.environ.get("ECW_PROBE_TIMEOUT", 240))
# relay hangs (not fails) when down; bound the probe.  Healthy-but-cold
# backend init has been measured at ~4 min right after a box reboot —
# raise via ECW_PROBE_TIMEOUT when the default misclassifies up-but-slow.
STAGE_TIMEOUT = 7200
RETRY_SLEEP = 300  # between health probes while the relay is down
DEADLINE_S = float(os.environ.get("ECW_SWEEP_DEADLINE_S", 10 * 3600))

DEFAULT_PLAN = [
    # flagship beam-5 with the sort-free top-k (the [B*K, V] sort was 59%
    # of beam-decode device time) — the headline round-3 beam number
    {"tag": "med_beam5_b4_iter",
     "env": {"ECW_RTFX_MODEL": "medium", "ECW_RTFX_DTYPE": "bfloat16",
             "ECW_RTFX_BATCH": "4", "ECW_RTFX_BEAMS": "5"}},
    # A/B attribution: same config, legacy lax.top_k sort
    {"tag": "med_beam5_b4_sorttopk",
     "env": {"ECW_RTFX_MODEL": "medium", "ECW_RTFX_DTYPE": "bfloat16",
             "ECW_RTFX_BATCH": "4", "ECW_RTFX_BEAMS": "5",
             "ECW_BEAM_TOPK": "sort"}},
    {"tag": "med_greedy_b4_int8",
     "env": {"ECW_RTFX_MODEL": "medium", "ECW_RTFX_DTYPE": "bfloat16",
             "ECW_RTFX_BATCH": "4", "ECW_RTFX_VOCAB": "int8",
             "ECW_RTFX_DECODER": "int8"}},
    {"tag": "med_beam5_b4_int8",
     "env": {"ECW_RTFX_MODEL": "medium", "ECW_RTFX_DTYPE": "bfloat16",
             "ECW_RTFX_BATCH": "4", "ECW_RTFX_BEAMS": "5",
             "ECW_RTFX_VOCAB": "int8", "ECW_RTFX_DECODER": "int8"}},
    {"tag": "large_greedy_b4_int8",
     "env": {"ECW_RTFX_MODEL": "large", "ECW_RTFX_DTYPE": "bfloat16",
             "ECW_RTFX_BATCH": "4", "ECW_RTFX_VOCAB": "int8",
             "ECW_RTFX_DECODER": "int8"}},
    {"tag": "large_beam5_b4_iter",
     "env": {"ECW_RTFX_MODEL": "large", "ECW_RTFX_DTYPE": "bfloat16",
             "ECW_RTFX_BATCH": "4", "ECW_RTFX_BEAMS": "5"}},
    # the reference's --extract_hs hot loop at whisper-medium dims
    {"tag": "extract_medium",
     "cmd": ["python", "tools/bench_extract_medium.py"],
     "env": {"EXT_BATCH": "8", "EXT_FILES": "32"}},
]

PROBE_SRC = (
    "import jax, numpy as np\n"
    "x = jax.numpy.ones((128, 128))\n"
    "print('probe-ok', float(np.asarray((x @ x).sum())))\n"
)


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def tpu_healthy() -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE_SRC], cwd=REPO,
            capture_output=True, text=True, timeout=PROBE_TIMEOUT)
        ok = out.returncode == 0 and "probe-ok" in out.stdout
        if not ok:
            tail = (out.stdout + out.stderr).strip().splitlines()[-1:]
            log(f"probe failed rc={out.returncode}: {tail}")
        return ok
    except subprocess.TimeoutExpired:
        log("probe timed out (relay hanging)")
        return False


def run_stage(stage: dict) -> bool:
    tag = stage["tag"]
    env = dict(os.environ)
    env.update(stage.get("env", {}))
    env.setdefault("ECW_RTFX_CPU_BASELINE", "0")
    cmd = stage.get("cmd") or [sys.executable, "bench_rtfx.py"]
    log(f"=== {tag} start ===")
    t0 = time.time()
    try:
        out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                             text=True, timeout=STAGE_TIMEOUT)
    except subprocess.TimeoutExpired:
        log(f"=== {tag} TIMEOUT after {STAGE_TIMEOUT}s ===")
        return False
    dur = time.time() - t0
    json_lines = [ln for ln in out.stdout.splitlines()
                  if ln.startswith("{") and ln.rstrip().endswith("}")]
    if out.returncode == 0:
        # record JSON result lines when the bench prints them, otherwise
        # the last non-empty stdout line (e.g. bench_extract_medium)
        recorded = json_lines or [ln for ln in out.stdout.splitlines() if ln.strip()][-1:]
        with open(RESULTS, "a") as f:
            for ln in recorded:
                try:
                    # brace-delimited but non-JSON lines (e.g. a Python dict
                    # repr from profile_train.py) are recorded as raw text
                    payload = json.loads(ln)
                except ValueError:
                    payload = ln
                f.write(json.dumps({"tag": tag, "result": payload}) + "\n")
        log(f"=== {tag} OK ({dur:.0f}s): {recorded[-1] if recorded else ''} ===")
        return True
    tail = (out.stdout + "\n" + out.stderr).strip().splitlines()[-3:]
    log(f"=== {tag} FAILED rc={out.returncode} ({dur:.0f}s): {tail} ===")
    return False


def main() -> None:
    plan = DEFAULT_PLAN
    if len(sys.argv) > 1:
        with open(sys.argv[1]) as f:
            plan = json.load(f)
    t_start = time.time()
    pending = list(plan)
    max_attempts = int(os.environ.get("ECW_SWEEP_MAX_ATTEMPTS", 4))
    while pending and time.time() - t_start < DEADLINE_S:
        if not tpu_healthy():
            log(f"relay down; sleeping {RETRY_SLEEP}s "
                f"({len(pending)} stages pending)")
            time.sleep(RETRY_SLEEP)
            continue
        stage = pending.pop(0)
        if run_stage(stage):
            continue
        # Failure with a healthy relay right before it usually means the
        # relay died mid-stage (long compiles) — but it can also be a
        # deterministic stage bug, so rotate to the BACK of the queue and
        # cap attempts: one broken stage must not starve the rest.
        stage["attempts"] = stage.get("attempts", 0) + 1
        if stage["attempts"] >= max_attempts:
            log(f"DROPPING {stage['tag']} after {max_attempts} attempts")
        else:
            log(f"requeueing {stage['tag']} (attempt {stage['attempts']})")
            pending.append(stage)
        time.sleep(60)
    if pending:
        log(f"DEADLINE with {len(pending)} stages pending: "
            f"{[s['tag'] for s in pending]}")
    else:
        log("SWEEP COMPLETE")


if __name__ == "__main__":
    main()

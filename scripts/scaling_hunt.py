#!/usr/bin/env python
"""Eligible-window scaling hunter (VERDICT r3 "Next round" #7).

The host grants this VM a fluctuating aggregate CPU ceiling; a 4-vs-16
efficiency sample is physically capped near eff(16)/16 * (16/4)/4, so only
windows with effective_cores(16) >= ELIGIBLE are worth measuring. This
script probes cheaply in a loop and launches the EXPENSIVE bench.py
--scaling run only when the grant holds across two consecutive probes,
appending each result (eligible or not — the probe can drift mid-run) to
``scaling_hunt.jsonl`` in the CWD.

Usage: python scripts/scaling_hunt.py [max_runs] [budget_minutes]

NEVER run this concurrently with correctness drives or pytest — a
contaminated pair wastes the whole ~10-min sample (CLAUDE.md round-3
gotcha).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ELIGIBLE = float(os.environ.get("GRAFT_ELIGIBLE_CORES", "14"))
PROBE_GAP_S = int(os.environ.get("GRAFT_PROBE_GAP_S", "25"))
HI = int(os.environ.get("GRAFT_SCALING_HI", "16"))


def main() -> None:
    from bench import effective_cores

    max_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    budget_s = 60 * (int(sys.argv[2]) if len(sys.argv) > 2 else 120)
    out_path = os.path.join(os.getcwd(), "scaling_hunt.jsonl")
    t_end = time.time() + budget_s
    done = 0
    while done < max_runs and time.time() < t_end:
        e1 = effective_cores(HI)
        if e1 < ELIGIBLE:
            print(f"probe eff({HI})={e1} < {ELIGIBLE}; waiting", flush=True)
            time.sleep(PROBE_GAP_S)
            continue
        time.sleep(PROBE_GAP_S)
        e2 = effective_cores(HI)
        if e2 < ELIGIBLE:
            print(f"second probe eff({HI})={e2} dropped; waiting", flush=True)
            continue
        # two-lock protocol: the dev session touches /tmp/graft_dev.lock
        # around its pytest/drive runs; we expose /tmp/graft_scaling.lock
        # while the sample runs so the dev side can wait symmetrically
        if os.path.exists("/tmp/graft_dev.lock"):
            print("dev lock present; waiting", flush=True)
            time.sleep(PROBE_GAP_S)
            continue
        print(f"grant held ({e1}, {e2}); launching --scaling", flush=True)
        open("/tmp/graft_scaling.lock", "w").write(str(os.getpid()))
        t0 = time.time()
        try:
            res = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--scaling"],
                capture_output=True, text=True, cwd=REPO,
            )
        finally:
            try:
                os.remove("/tmp/graft_scaling.lock")
            except OSError:
                pass
        rec: dict = {"probes": [e1, e2], "wall_s": round(time.time() - t0, 1)}
        try:
            rec.update(json.loads(res.stdout.strip().splitlines()[-1]))
        except Exception:
            rec["error"] = (res.stderr or res.stdout)[-500:]
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        done += 1
    print(f"hunt finished: {done} runs", flush=True)


if __name__ == "__main__":
    main()

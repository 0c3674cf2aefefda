"""Capacity-gated headline-bench capture: probe the shared host's parallel
grant and run the full headline bench only in windows where the grant is
near-full, so the recorded numbers measure the engine rather than foreign
load (same reasoning as scaling_hunt.py; BENCH.md documents the 4x
minute-to-minute swings that motivate the gate).

Appends one JSON object per captured run to BENCH_QUIET_RUNS.jsonl and
prints the best-total run at exit.

Env knobs: QB_MIN_CAPACITY (6.5 of 8), QB_RUNS (3), QB_MAX_MINUTES (60),
SPARK_GRAFT_CPUS (32), SPARK_GRAFT_SF_DIR.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    min_cap = float(os.environ.get("QB_MIN_CAPACITY", "6.5"))
    want_runs = int(os.environ.get("QB_RUNS", "3"))
    max_minutes = float(os.environ.get("QB_MAX_MINUTES", "60"))
    out_path = os.path.join(REPO, "BENCH_QUIET_RUNS.jsonl")
    deadline = time.time() + max_minutes * 60
    best = None
    captured = 0
    while time.time() < deadline and captured < want_runs:
        cap = bench._parallel_capacity(8)
        print(f"# capacity probe: {cap:.2f} / 8", flush=True)
        if cap < min_cap:
            time.sleep(45)
            continue
        env = dict(os.environ)
        env.setdefault("SPARK_GRAFT_CPUS", "32")
        out = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True, env=env)
        lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(f"# bench failed: {out.stderr[-500:]}", flush=True)
            continue
        rec = json.loads(lines[-1])
        rec["capacity_before"] = round(cap, 2)
        rec["capacity_after"] = round(bench._parallel_capacity(8), 2)
        rec["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
        with open(out_path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        captured += 1
        print(json.dumps({"total": rec["value"],
                          "cap": [rec["capacity_before"],
                                  rec["capacity_after"]]}), flush=True)
        if best is None or rec["value"] < best["value"]:
            best = rec
    print(json.dumps({"metric": "quiet_bench_best", "best": best}))


if __name__ == "__main__":
    main()

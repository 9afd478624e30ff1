"""Engine-probe-gated scaling-series hunter (BASELINE.md protocol).

The sandbox host's high-concurrency capacity oscillates in ~10-minute
windows (32-cpu KG throughput swings 540k-980k t/s while the 8-cpu side
stays flat); the 12 s arithmetic busy-loop control does NOT predict the
minutes-long engine window because the engine is DRAM/LLC-bound, not
core-bound. So: hunt with the ENGINE itself — run one 32-cpu 800k-page
KG rep (~30 s) every PROBE_PERIOD seconds and fire the full
``bench.py --scaling-weak`` (and, window permitting, ``--scaling``)
series only when that rep sustains ≥ THRESHOLD triples/sec.

Usage:  python tools/scaling_hunter.py [max_probes] [max_captures]
Writes JSON lines to /tmp/scaling_hunt_r4.jsonl and holds
/tmp/scaling_hunt_running while a full series is in flight (foreground
work should pause on that sentinel to avoid contaminating the series).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH = os.path.join(REPO, "bench.py")
LOG = "/tmp/scaling_hunt_r4.jsonl"
SENTINEL = "/tmp/scaling_hunt_running"
THRESHOLD = float(os.environ.get("GRAFT_HUNT_THRESHOLD", "800000"))
PROBE_PERIOD = float(os.environ.get("GRAFT_HUNT_PERIOD", "420"))


def _log(rec: dict) -> None:
    rec["ts"] = time.time()
    with open(LOG, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def probe() -> float:
    """One fresh-process 32-cpu KG-only rep on the 160-replicate input —
    the same workload as the scaling series' window-sensitive side."""
    env = dict(
        os.environ,
        RAY_GRAFT_CPUS="32",
        GRAFT_BENCH_KG_ONLY="1",
        GRAFT_PAGES_REPLICATE="160",
    )
    try:
        out = subprocess.run(
            [sys.executable, BENCH], env=env, capture_output=True,
            text=True, check=True, timeout=600,
        ).stdout
        r = json.loads(out.strip().splitlines()[-1])
        return float(r.get("triples_per_sec") or 0.0)
    except Exception as exc:  # probe failure = closed window, keep hunting
        _log({"event": "probe_error", "err": str(exc)[:200]})
        return 0.0


def fire(mode: str) -> dict | None:
    env = dict(os.environ, GRAFT_SCALING_ORDER="hi_first")
    try:
        out = subprocess.run(
            [sys.executable, BENCH, mode], env=env, capture_output=True,
            text=True, check=True, timeout=3600,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])
    except Exception as exc:
        _log({"event": "series_error", "mode": mode, "err": str(exc)[:200]})
        return None


def main() -> None:
    max_probes = int(sys.argv[1]) if len(sys.argv) > 1 else 40
    max_captures = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    captures = 0
    for k in range(max_probes):
        t0 = time.time()
        tps = probe()
        _log({"event": "probe", "n": k, "triples_per_sec": round(tps)})
        if tps >= THRESHOLD:
            open(SENTINEL, "w").write(str(os.getpid()))
            try:
                # GRAFT_HUNT_MODES selects which series fire on an open
                # window (comma-separated; default both, weak first)
                modes = [
                    m.strip()
                    for m in os.environ.get(
                        "GRAFT_HUNT_MODES", "--scaling-weak,--scaling"
                    ).split(",")
                    if m.strip()
                ]
                for mode in modes:
                    res = fire(mode)
                    if res:
                        _log({"event": mode.lstrip("-") + "_series", **res})
            finally:
                os.remove(SENTINEL)
            captures += 1
            if captures >= max_captures:
                break
        # sleep out the remainder of the probe period
        time.sleep(max(30.0, PROBE_PERIOD - (time.time() - t0)))
    _log({"event": "done", "probes": k + 1, "captures": captures})


if __name__ == "__main__":
    main()

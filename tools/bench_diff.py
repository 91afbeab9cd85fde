#!/usr/bin/env python3
"""Compare two Bench records (BENCH_LAST.json files or git revisions).

Usage:
  bench_diff.py <old.json|git-rev> <new.json|git-rev>

A git revision argument reads BENCH_LAST.json from that revision
(`git show REV:BENCH_LAST.json`). Prints the shared-subset ratio, the
largest regressions/improvements, and queries present on one side only.
"""
import json, subprocess, sys, os


def load(arg):
    if os.path.exists(arg):
        return json.load(open(arg))
    out = subprocess.check_output(["git", "show", f"{arg}:BENCH_LAST.json"])
    return json.loads(out)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    so, sn = sum(oq[q] for q in shared), sum(nq[q] for q in shared)
    print(f"shared {len(shared)} queries: {so:.1f}s -> {sn:.1f}s "
          f"(ratio {sn / so:.3f})")
    # drift normalization: when both records carry the fixed-workload host
    # calibration (Bench runs it after warm), divide the query ratio by the
    # calibration ratio — same-code reruns on a slower host-day then read
    # ~1.0 instead of looking like a regression
    oc, nc = old.get("calib"), new.get("calib")
    if oc and nc:
        drift = (nc["cpu"] + nc["spark"]) / (oc["cpu"] + oc["spark"])
        print(f"host calib drift {drift:.3f} "
              f"(cpu {oc['cpu']:.2f}->{nc['cpu']:.2f}s, "
              f"spark {oc['spark']:.2f}->{nc['spark']:.2f}s); "
              f"drift-normalized ratio {(sn / so) / drift:.3f}")
    deltas = sorted(((nq[q] - oq[q], q) for q in shared), reverse=True)
    print("largest regressions:")
    for d, q in deltas[:8]:
        if d <= 0:
            break
        print(f"  +{d:6.2f}s  {q}: {oq[q]:.2f} -> {nq[q]:.2f}")
    print("largest improvements:")
    for d, q in sorted(deltas)[:8]:
        if d >= 0:
            break
        print(f"  {d:7.2f}s  {q}: {oq[q]:.2f} -> {nq[q]:.2f}")
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    if only_old:
        print("removed:", ", ".join(only_old))
    if only_new:
        print("added:", ", ".join(f"{q} ({nq[q]:.2f}s)" for q in only_new))


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Automated bench adjudication: the interleaved identical-tree probe.

Wall-clock movers at bench SFs are usually session/host noise (page-cache
churn, CPU frequency bands — see BENCH_NOTES_r13/r14). The established
adjudication protocol, hand-driven three times in r14, is:

  1. check out the BOUNDARY commit (last round's bench tree) in a
     worktree and build it;
  2. run the suspect rows in FRESH JVMs (SPARK_GRAFT_BENCH_ONLY) against
     the same SF dir, INTERLEAVED between the two trees (boundary, HEAD,
     boundary, HEAD, ... alternating which goes first per lap) so a host
     drift hits both trees symmetrically;
  3. compare the per-row distributions: overlapping ranges => host band,
     code exonerated; separated ranges => real mover, go read the diff.

This script runs that protocol end-to-end and emits the BENCH_NOTES
table directly.

Usage:
  python3 scripts/bench_probe.py <boundary-commit> <row1,row2,...> \
      [--runs N] [--sf-dir DIR] [--cpus N]

  # AUTO mode (the per-round default): diff two driver bench JSONs and
  # adjudicate EVERY shared-row mover past the threshold, both
  # directions — no hand-picking, no unadjudicated movers:
  python3 scripts/bench_probe.py <boundary-commit> \
      --auto <prev_bench.json> <cur_bench.json> [--threshold 1.3]

Example:
  python3 scripts/bench_probe.py 8fe97ac q_bucketed_store,q_txn_commits \
      --runs 3 --sf-dir /tmp/graft-sf1
  python3 scripts/bench_probe.py 3bcd74e \
      --auto /tmp/bench_sf01_r15.json /tmp/bench_sf01_r16.json
"""
import argparse
import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ADD_OPENS_PKGS = [
    "java.base/java.lang", "java.base/java.lang.invoke",
    "java.base/java.lang.reflect", "java.base/java.io",
    "java.base/java.net", "java.base/java.nio",
    "java.base/java.util", "java.base/java.util.concurrent",
    "java.base/java.util.concurrent.atomic",
    "java.base/sun.nio.ch", "java.base/sun.nio.cs",
    "java.base/sun.security.action", "java.base/sun.util.calendar",
]


def sh(cmd, cwd=None, check=True, capture=False):
    return subprocess.run(
        cmd, cwd=cwd, check=check, text=True,
        capture_output=capture)


def ensure_worktree(commit):
    """Worktree of the boundary commit under /tmp, built once."""
    sha = sh(["git", "rev-parse", "--short", commit], cwd=REPO,
             capture=True).stdout.strip()
    path = f"/tmp/graft-probe-{sha}"
    if not os.path.isdir(path):
        sh(["git", "worktree", "add", "--detach", path, commit], cwd=REPO)
    marker = os.path.join(path, "target", "scala-2.13", "classes", "graft",
                          "Bench.class")
    if not os.path.exists(marker):
        print(f"[probe] building boundary tree {sha} (one-time)...",
              flush=True)
        sh(["sbt", "-batch", "compile"], cwd=path)
    return sha, path


def bench_cmd(tree, rows, sf_dir, cpus):
    cp = ":".join([
        os.path.join(tree, "target", "scala-2.13", "classes"),
        os.path.join(tree, "src", "main", "resources"),  # log4j2 silence
        "/opt/spark/jars/*",
    ])
    java = os.path.join(os.environ.get("JAVA_HOME", "/usr"), "bin", "java")
    if not os.path.exists(java):
        java = "java"
    flags = []
    for p in ADD_OPENS_PKGS:
        flags += ["--add-opens", f"{p}=ALL-UNNAMED"]
    mem = os.environ.get("SPARK_DRIVER_MEM", "8g")
    env = dict(os.environ,
               SPARK_GRAFT_SF_DIR=sf_dir,
               SPARK_GRAFT_BENCH_ONLY=",".join(rows),
               SPARK_GRAFT_CPUS=str(cpus))
    cmd = [java, *flags, f"-Xmx{mem}", "-Dspark.ui.enabled=false",
           "-Dspark.sql.session.timeZone=UTC", "-cp", cp, "graft.Bench"]
    return cmd, env


def run_bench(tree, rows, sf_dir, cpus):
    """One fresh-JVM subset run; returns {row: seconds}."""
    cmd, env = bench_cmd(tree, rows, sf_dir, cpus)
    t0 = time.time()
    res = subprocess.run(cmd, env=env, text=True, capture_output=True)
    if res.returncode != 0:
        sys.exit(f"bench run failed in {tree} (rc={res.returncode}):\n"
                 f"{res.stdout[-2000:]}\n{res.stderr[-2000:]}")
    line = next((l for l in res.stdout.splitlines()
                 if l.startswith("{") and '"queries"' in l), None)
    if line is None:
        sys.exit(f"no bench JSON line in {tree} output:\n"
                 f"{res.stdout[-2000:]}")
    qs = json.loads(line)["queries"]
    print(f"[probe] {os.path.basename(tree)}: "
          + ", ".join(f"{r}={qs[r]:.2f}s" for r in rows)
          + f" (wall {time.time() - t0:.0f}s)", flush=True)
    return {r: float(qs[r]) for r in rows}


def verdict(b_vals, h_vals):
    """Overlapping ranges => host band; separated => real mover."""
    b_lo, b_hi = min(b_vals), max(b_vals)
    h_lo, h_hi = min(h_vals), max(h_vals)
    ratio = statistics.median(h_vals) / statistics.median(b_vals)
    if min(len(b_vals), len(h_vals)) < 2:
        return ratio, "single sample — no verdict; rerun with --runs >= 3"
    if h_lo <= b_hi and b_lo <= h_hi:
        return ratio, "distributions overlap; host band, code exonerated"
    direction = "REGRESSION" if ratio > 1 else "improvement"
    return ratio, (f"ranges separated — real {direction}; "
                   "read the diff on this row's path")


def load_queries(path):
    with open(path) as f:
        doc = json.load(f)
    return doc["queries"] if "queries" in doc else doc


def auto_rows(prev_path, cur_path, threshold, cap=12):
    """Shared rows whose cur/prev ratio moved past the threshold in
    EITHER direction (a surprise speedup can be a broken row as easily
    as a regression is a slow one). Capped loudly — silent truncation
    would read as 'adjudicated everything'."""
    prev, cur = load_queries(prev_path), load_queries(cur_path)
    movers = []
    for r in sorted(set(prev) & set(cur)):
        p, c = float(prev[r]), float(cur[r])
        if p <= 0 or c <= 0:
            continue
        ratio = c / p
        if ratio > threshold or ratio < 1.0 / threshold:
            movers.append((r, ratio))
    movers.sort(key=lambda x: -max(x[1], 1.0 / x[1]))
    if len(movers) > cap:
        dropped = movers[cap:]
        print(f"[probe] CAP: adjudicating top {cap} movers; dropped "
              + ", ".join(f"{r}({x:.2f})" for r, x in dropped), flush=True)
        movers = movers[:cap]
    for r, x in movers:
        print(f"[probe] auto-selected {r}: shared-row ratio {x:.2f}",
              flush=True)
    return [r for r, _ in movers]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("boundary", help="boundary commit (last round's tree)")
    ap.add_argument("rows", nargs="?", default=None,
                    help="comma-separated bench row names (omit with --auto)")
    ap.add_argument("--auto", nargs=2, metavar=("PREV_JSON", "CUR_JSON"),
                    help="select rows automatically: every shared row "
                         "whose ratio moved past --threshold")
    ap.add_argument("--threshold", type=float, default=1.3)
    ap.add_argument("--runs", type=int, default=3,
                    help="interleaved laps per tree (default 3)")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    if args.auto and args.rows:
        # silently dropping an explicit row list is the truncation
        # failure mode this tool exists to prevent
        ap.error("pass EITHER an explicit row list OR --auto, not both "
                 "(explicit rows would be silently ignored)")
    if args.auto:
        rows = auto_rows(args.auto[0], args.auto[1], args.threshold)
        if not rows:
            print(f"[probe] no shared-row mover past {args.threshold}x — "
                  "nothing to adjudicate")
            return
    elif args.rows:
        rows = [r.strip() for r in args.rows.split(",") if r.strip()]
    else:
        ap.error("pass rows or --auto PREV_JSON CUR_JSON")

    sha, boundary_tree = ensure_worktree(args.boundary)
    head_marker = os.path.join(REPO, "target", "scala-2.13", "classes",
                               "graft", "Bench.class")
    if not os.path.exists(head_marker):
        print("[probe] building HEAD tree...", flush=True)
        sh(["sbt", "-batch", "compile"], cwd=REPO)

    b_runs, h_runs = [], []
    for lap in range(args.runs):
        # alternate which tree goes first so drift hits both symmetrically
        order = [(boundary_tree, b_runs), (REPO, h_runs)]
        if lap % 2 == 1:
            order.reverse()
        for tree, acc in order:
            acc.append(run_bench(tree, rows, args.sf_dir, args.cpus))

    print(f"\n## bench_probe: {sha} (boundary) vs HEAD, "
          f"{args.runs}x interleaved fresh-JVM runs, sf={args.sf_dir}\n")
    print("| row | boundary isolated (s) | HEAD isolated (s) | "
          "median ratio | verdict |")
    print("|---|---|---|---|---|")
    out = {"boundary": sha, "sf_dir": args.sf_dir, "runs": args.runs,
           "rows": {}}
    for r in rows:
        b_vals = [x[r] for x in b_runs]
        h_vals = [x[r] for x in h_runs]
        ratio, v = verdict(b_vals, h_vals)
        fmt = lambda vs: ", ".join(f"{x:.2f}" for x in vs)
        print(f"| {r} | {fmt(b_vals)} | {fmt(h_vals)} | {ratio:.2f} | {v} |")
        out["rows"][r] = {"boundary": b_vals, "head": h_vals,
                          "median_ratio": round(ratio, 3), "verdict": v}
    dump = f"/tmp/bench_probe_{sha}_{int(time.time())}.json"
    with open(dump, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\n[probe] raw samples: {dump}")


if __name__ == "__main__":
    main()

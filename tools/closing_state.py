#!/usr/bin/env python3
"""Emit the SURVEY closing-state block from measured artifacts instead of
hand-typed numbers (r10 verdict: the test count drifted once already).

Inputs:
  --bench 1x=PATH [10x=PATH] [100x=PATH]   Bench JSON lines (graft.Bench output)
  --sbt-log PATH                            a full `sbt test` log (for counts)

Prints a markdown fragment: the probe table (wall, ratio vs 1x, s/query),
the tail rows (slowest N at the largest point), and the test/suite count
parsed from scalatest's own summary line — all derived, nothing typed.

Usage:
  python3 tools/closing_state.py --sbt-log /tmp/sbt_test.log \
      --bench 1x=BENCH_1X.json 10x=BENCH_10X.json 100x=BENCH_100X.json
"""
import json
import re
import sys


def parse_args(argv):
    bench, sbt_log, tail_n = {}, None, 8
    i = 1
    while i < len(argv):
        a = argv[i]
        if a == "--bench":
            i += 1
            while i < len(argv) and "=" in argv[i] and not argv[i].startswith("--"):
                k, v = argv[i].split("=", 1)
                bench[k] = v
                i += 1
            continue
        if a == "--sbt-log":
            sbt_log = argv[i + 1]
            i += 2
            continue
        if a == "--tail":
            tail_n = int(argv[i + 1])
            i += 2
            continue
        sys.exit(f"unknown arg: {a}")
    return bench, sbt_log, tail_n


def load_bench(path):
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line.startswith("{") and '"metric"' in line:
                return json.loads(line)
    sys.exit(f"{path}: no bench JSON line found")


def main():
    bench, sbt_log, tail_n = parse_args(sys.argv)
    out = []

    if sbt_log:
        txt = open(sbt_log, errors="replace").read()
        m = re.search(
            r"Total number of tests run: (\d+).*?"
            r"Suites: completed (\d+), aborted (\d+).*?"
            r"Tests: succeeded (\d+), failed (\d+)", txt, re.S)
        if m:
            total, suites, aborted, ok, failed = map(int, m.groups())
            # an aborted suite runs ZERO of its tests, so failed==0 alone
            # would report a crippled run as healthy
            status = ("green" if failed == 0 and ok == total and aborted == 0
                      else f"FAILED={failed}, ABORTED={aborted}")
            out.append(f"**{total} tests / {suites} suites** ({status})")
        else:
            out.append("(no scalatest summary found in sbt log)")

    if bench:
        points = [(k, load_bench(v)) for k, v in bench.items()]
        base = dict(points).get("1x")
        out.append("")
        out.append("| point | wall (s) | ratio vs 1x | s/query |")
        out.append("|---|---|---|---|")
        for name, b in points:
            wall, nq = b["value"], len(b["queries"])
            ratio = "—" if base is None or b is base or name == "1x" \
                else f"{wall / base['value']:.2f}x"
            out.append(f"| {name} ({b.get('sf', '?')}) | {wall:.1f} |"
                       f" {ratio} | {wall / nq:.2f} |")
        last = points[-1][1]
        slow = sorted(last["queries"].items(), key=lambda kv: -kv[1])[:tail_n]
        out.append("")
        out.append(f"Slowest {tail_n} at {points[-1][0]}: " + ", ".join(
            f"`{k}` {v:.1f} s" for k, v in slow))

    print("\n".join(out))


if __name__ == "__main__":
    main()

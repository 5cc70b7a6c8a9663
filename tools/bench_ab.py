#!/usr/bin/env python
"""Same-day interleaved A/B bench protocol (VERDICT r11 item 4).

Bench totals are host-epoch-relative (~10% drift observed between
rounds on identical trees), so cross-round totals cannot distinguish
drift from regression. This tool institutionalizes the instrument
that can: check out the PRIOR round's tree as a git worktree, run
bench.py ALTERNATELY in the prior and current trees N times each on
the same host within minutes, and compare PER-QUERY MEDIANS — the
statistic that resolved r11's two phantom regressions.

Writes worklog/ab_control.json:
  {"base_ref", "n_runs", "base": {query: median_sec},
   "current": {query: median_sec}, "ratio": {query: cur/base},
   "median_ratio", "base_total_median", "current_total_median", ...}
bench.py embeds this file's summary (and the per-query medians in
its full worklog line) as "ab_control" on its next run, so BENCH_rN
carries the control.

Usage: python tools/bench_ab.py BASE_REF [N_PAIRS]
       (N_PAIRS interleaved pairs, default 2; run on a quiet host —
       each bench.py invocation load-gates itself)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
AB_DIR = "/tmp/spark_graft_ab"


def _run_bench(tree: str) -> dict:
    """One bench.py run in `tree`; returns the FULL parsed result
    (the first stdout JSON line carrying "queries")."""
    p = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=tree,
        capture_output=True,
        text=True,
        env=os.environ.copy(),
        timeout=3600,
    )
    for line in p.stdout.splitlines():
        line = line.strip()
        if line.startswith("{") and '"queries"' in line:
            return json.loads(line)
    raise RuntimeError(
        f"bench.py in {tree} produced no full JSON line "
        f"(rc={p.returncode}):\n{p.stdout[-2000:]}\n{p.stderr[-2000:]}"
    )


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    base_ref = sys.argv[1]
    n_pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 2

    sha = subprocess.run(
        ["git", "rev-parse", "--short", base_ref],
        cwd=ROOT, capture_output=True, text=True, check=True,
    ).stdout.strip()
    wt = os.path.join(AB_DIR, sha)
    if not os.path.isdir(wt):
        os.makedirs(AB_DIR, exist_ok=True)
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, base_ref],
            cwd=ROOT, check=True,
        )

    runs: dict[str, list[dict]] = {"base": [], "current": []}
    try:
        for i in range(n_pairs):
            for label, tree in (("base", wt), ("current", ROOT)):
                t0 = time.time()
                r = _run_bench(tree)
                runs[label].append(r)
                print(
                    f"pair {i + 1}/{n_pairs} {label}: total "
                    f"{r['value']}s (wall {time.time() - t0:.0f}s, "
                    f"load_gate {r.get('load_gate')})",
                    flush=True,
                )
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=ROOT, check=False, capture_output=True,
        )

    def med(rs: list[dict]) -> dict[str, float]:
        out: dict[str, float] = {}
        for qname in rs[0]["queries"]:
            vals = [r["queries"][qname] for r in rs if qname in r["queries"]]
            out[qname] = round(statistics.median(vals), 3)
        return out

    base_med, cur_med = med(runs["base"]), med(runs["current"])
    common = sorted(set(base_med) & set(cur_med))
    ratio = {
        qname: round(cur_med[qname] / base_med[qname], 3)
        for qname in common
        if base_med[qname] > 0
    }
    result = {
        "protocol": "interleaved same-day A/B, per-query medians",
        "base_ref": base_ref,
        "base_sha": sha,
        "n_runs": n_pairs,
        "sf_dir": os.environ.get("SPARK_GRAFT_SF_DIR",
                                 "/root/testdata/sf0.1"),
        "base": base_med,
        "current": cur_med,
        "ratio": ratio,
        "median_ratio": round(
            statistics.median(ratio.values()), 3
        ) if ratio else None,
        "base_total_median": round(statistics.median(
            [r["value"] for r in runs["base"]]), 3),
        "current_total_median": round(statistics.median(
            [r["value"] for r in runs["current"]]), 3),
        "base_totals": [r["value"] for r in runs["base"]],
        "current_totals": [r["value"] for r in runs["current"]],
        "n_common_queries": len(common),
        "only_in_current": sorted(set(cur_med) - set(base_med)),
        "only_in_base": sorted(set(base_med) - set(cur_med)),
        "worst5": sorted(ratio, key=ratio.get, reverse=True)[:5],
        "best5": sorted(ratio, key=ratio.get)[:5],
        "measured_utc": time.strftime(
            "%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    out_path = os.path.join(ROOT, "worklog", "ab_control.json")
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"median per-query ratio (current/base): "
          f"{result['median_ratio']}")
    for qname in result["worst5"]:
        print(f"  worst {qname}: {base_med[qname]} -> {cur_med[qname]} "
              f"({ratio[qname]}x)")
    print(f"written {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

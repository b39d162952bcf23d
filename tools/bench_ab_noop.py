"""Same-epoch counterbalanced A/B of two repo trees using EACH TREE'S OWN
bench.py (the frozen driver methodology: noop sink, best-of-2 per query).

Usage: python tools/bench_ab_noop.py TREE_A TREE_B [rounds] [sf_dir] [cpus]
"""

import json
import os
import statistics
import subprocess
import sys


def run_tree(tree: str, sf_dir: str, cpus: str) -> dict:
    p = subprocess.run(
        [sys.executable, f"{tree}/bench.py"],
        capture_output=True, text=True, timeout=1200, cwd=tree,
        env={
            **os.environ,
            "SPARK_GRAFT_SF_DIR": sf_dir,
            "SPARK_GRAFT_CPUS": cpus,
        },
    )
    for line in p.stdout.splitlines():
        if line.strip().startswith("{"):
            return json.loads(line.strip())
    raise RuntimeError(f"tree {tree} no json:\n{p.stderr[-3000:]}")


def main() -> None:
    tree_a, tree_b = sys.argv[1], sys.argv[2]
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    cpus = sys.argv[5] if len(sys.argv) > 5 else "32"
    acc: dict[str, dict[str, list[float]]] = {}
    totals: dict[str, list[float]] = {"A": [], "B": []}
    for r in range(rounds):
        order = [("A", tree_a), ("B", tree_b)]
        if r % 2 == 1:
            order.reverse()
        for label, tree in order:
            res = run_tree(tree, sf_dir, cpus)
            totals[label].append(res["value"])
            for q, t in res["queries"].items():
                acc.setdefault(q, {"A": [], "B": []})[label].append(t)
            print(f"round {r} {label}: total={res['value']} {res['queries']}",
                  flush=True)
    print()
    print(f"{'query':24s} {'A_med':>8s} {'B_med':>8s} {'B/A':>6s}")
    for q, d in acc.items():
        a, b = statistics.median(d["A"]), statistics.median(d["B"])
        print(f"{q:24s} {a:8.3f} {b:8.3f} {b / a if a else 0:6.3f}")
    ta, tb = statistics.median(totals["A"]), statistics.median(totals["B"])
    print(f"{'TOTAL':24s} {ta:8.3f} {tb:8.3f} {tb / ta:6.3f}")


if __name__ == "__main__":
    main()

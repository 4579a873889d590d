#!/usr/bin/env python3
"""Parse `sbt runMain graft.Explain` output into the PLANS.md summary
table: per query, count joins by strategy, count exchanges (shuffle
Exchange, not BroadcastExchange), and flag notable shapes
(TakeOrderedAndProject, Window, InMemoryTableScan).

Usage: sbt -batch "runMain graft.Explain <sfDir>" > /tmp/plans.txt
       python3 tools/plan_table.py /tmp/plans.txt
"""
import re
import sys
from collections import Counter


def main(path):
    current = None
    plans = {}
    for line in open(path):
        m = re.match(r"===== (\S+) =====", line.strip())
        if m and m.group(1) != "Subqueries":
            current = m.group(1)
            plans[current] = []
        elif m:
            # Spark's formatted explain emits an "===== Subqueries ====="
            # divider INSIDE a query's dump — its operators belong to the
            # current query, not a new one
            pass
        elif current:
            plans[current].append(line)

    print("| query | joins | exchanges | shape |")
    print("|---|---|---|---|")
    for name in sorted(plans):
        # formatted mode prints the tree, then a numbered detail section
        # repeating every operator — count tree lines only ("+- Op (N)")
        text = "".join(l for l in plans[name] if re.search(r"[+:]- \w", l))
        joins = Counter()
        for jt in re.findall(r"[+:]- (\w+)Join", text):
            joins[jt] += 1
        exchanges = len(re.findall(r"[+:]- Exchange \(\d+\)", text))
        shapes = []
        if "TakeOrderedAndProject" in text:
            shapes.append("top-k")
        if re.search(r"[+:]- Window \(", text):
            shapes.append("window")
        n_imr = len(re.findall(r"[+:]- InMemoryTableScan", text))
        if n_imr:
            shapes.append(f"cached-candidates×{n_imr}")
        j = " ".join(f"{k}×{v}" for k, v in sorted(joins.items())) or "—"
        print(f"| `{name}` | {j} | {exchanges} | {' '.join(shapes)} |")


if __name__ == "__main__":
    main(sys.argv[1])

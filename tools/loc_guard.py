#!/usr/bin/env python3
"""Registry file-size guard: fail when any registry file outgrows 1500 lines.

The round-7 merge-conflict problem was a single 4752-line SparkEntry.scala
absorbing ~8 new queries per round; the round-8 fix split it into per-family
files under src/main/scala/graft/registry/. This guard keeps that fix from
silently rebuilding: TextAnalysisRegistry.scala was already at 1135 lines one
round after the split. When a file trips the limit, split a coherent
query family out into a new registry file (and wire it into SparkEntry's
aggregation) instead of raising the limit.

Run as part of the verify recipe. Exit 1 on any violation.
"""
import sys
from pathlib import Path

LIMIT = 1500
REGISTRY = Path("src/main/scala/graft/registry")


def main():
    violations = []
    for f in sorted(REGISTRY.glob("*.scala")):
        n = sum(1 for _ in f.open())
        status = "FAIL" if n > LIMIT else "ok"
        print(f"  {status:4} {n:5} {f.name}")
        if n > LIMIT:
            violations.append((f.name, n))
    if violations:
        print(f"FAIL: {len(violations)} registry file(s) exceed {LIMIT} lines — "
              "split a query family into a new file instead of growing these:")
        for name, n in violations:
            print(f"  {name}: {n}")
        return 1
    print(f"OK: all registry files within {LIMIT} lines")
    return 0


if __name__ == "__main__":
    sys.exit(main())

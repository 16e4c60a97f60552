"""Same-VM band measurement for one query (default: the layout
flagship) — N fresh-JVM runs at sf0.1, one timing line each (the
methodology BASELINE.md's per-query bands use; VERDICT r4 item 6).

Usage: python scripts/band_layout.py [runs] [query] [sf_dir]
"""

from __future__ import annotations

import subprocess
import sys

RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 5
QUERY = sys.argv[2] if len(sys.argv) > 2 else "layout_seed_selection"
SF = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"

CHILD = f"""
import sys, time
sys.path.insert(0, "/root/repo")
from graphem_rapids_spark.session import get_spark
from graphem_rapids_spark import queries as Q
spark = get_spark()
t0 = time.time()
df = Q.QUERIES[{QUERY!r}](spark, {SF!r})
n = df.count()
print(f"RUN_SEC {{time.time() - t0:.1f}} rows={{n}}", flush=True)
spark.stop()
"""


def main() -> None:
    times = []
    for i in range(RUNS):
        out = subprocess.run(
            [sys.executable, "-c", CHILD], capture_output=True, text=True
        )
        for line in out.stdout.splitlines():
            if line.startswith("RUN_SEC"):
                t = float(line.split()[1])
                times.append(t)
                print(f"run {i + 1}: {t:.1f}s  ({line.split()[2]})", flush=True)
                break
        else:
            print(f"run {i + 1}: FAILED\n{out.stderr[-2000:]}", flush=True)
    if times:
        print(
            f"band {QUERY}: min={min(times):.1f} max={max(times):.1f} "
            f"runs={[round(t, 1) for t in times]}"
        )


if __name__ == "__main__":
    main()

"""Real-world dataset workflow — the reference's
``examples/real_world_datasets_example.py`` analog: list the dataset
registry, load an edge list (SNAP format), canonicalize, and run the
standard analytics stack.

Offline-safe: if no network (this container), it synthesizes a small
SNAP-format file and runs the exact same reader path — the point is
the ingest contract, not the download.

Usage: python examples/real_world_datasets.py [snap_edge_file]
"""

from __future__ import annotations

import gzip
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark import get_spark  # noqa: E402
from graphem_rapids_spark.analytics import graph_stats, pagerank  # noqa: E402
from graphem_rapids_spark.datasets import list_available_datasets  # noqa: E402
from graphem_rapids_spark.graph.canon import relabel_contiguous  # noqa: E402
from graphem_rapids_spark.graph.io import read_snap_edges  # noqa: E402


def _make_fake_snap(path: str) -> None:
    """A SNAP-style .txt.gz: '#' comments, whitespace pairs, both
    directions present (the reader must mirror+dedupe)."""
    lines = ["# Synthetic SNAP-format graph", "# FromNodeId\tToNodeId"]
    edges = [(i, (i * 7 + 3) % 50) for i in range(120)]
    lines += [f"{a}\t{b}" for a, b in edges if a != b]
    lines += [f"{b}\t{a}" for a, b in edges[:40] if a != b]  # mirrored dupes
    with gzip.open(path, "wt") as f:
        f.write("\n".join(lines))


def main() -> None:
    spark = get_spark(app_name="graphem-datasets-example")

    print("registry:")
    for name, info in sorted(list_available_datasets().items()):
        print(f"  {name:24s} {info.get('description', '')[:60]}")

    if len(sys.argv) > 1:
        path = sys.argv[1]
    else:
        path = os.path.join(tempfile.mkdtemp(), "synthetic-snap.txt.gz")
        _make_fake_snap(path)
        print(f"\n(no file given — synthesized SNAP-format input at {path})")

    edges = read_snap_edges(spark, path)
    edges, mapping = relabel_contiguous(edges)
    n = mapping.count()
    stats = graph_stats(edges, n)
    print(f"loaded: n={stats['n_vertices']} m={stats['n_edges']} "
          f"avg_deg={stats['avg_degree']:.2f}")

    pr = pagerank(edges, n, max_iter=10)
    top = pr.orderBy(pr.value.desc()).limit(5).collect()
    print("top-5 PageRank:", [(int(r.id), round(r.value, 5)) for r in top])


if __name__ == "__main__":
    main()

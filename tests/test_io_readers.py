"""Dataset reader tests (S3–S6): SNAP text/gz, MTX, .edges, CSV
nodes+edges with dense re-index — semantics mirrored from the
reference loaders (datasets.py:306-357, :485-529, :531-572, :635-683)."""

import gzip

from graphem_rapids_spark.graph.io import (
    read_csv_nodes_edges,
    read_edges_file,
    read_mtx_edges,
    read_snap_edges,
)

SNAP_TEXT = """# Directed graph: test
# Nodes: 5 Edges: 6
0\t1
1\t0
2\t3
3\t4
1\t2
4\t3
"""

MTX_TEXT = """%%MatrixMarket matrix coordinate pattern symmetric
% comment line
5 5 4
1 2
2 3
4 5
3 1
"""


def _collect_pairs(df):
    return sorted((r.src, r.dst) for r in df.collect())


def test_snap_undirected_mirror_dedupe(spark, tmp_path):
    p = tmp_path / "snap.txt"
    p.write_text(SNAP_TEXT)
    edges = read_snap_edges(spark, str(p))
    # 0-1 and 1-0 collapse; all canonical src<dst
    assert _collect_pairs(edges) == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_snap_gzip(spark, tmp_path):
    p = tmp_path / "snap.txt.gz"
    with gzip.open(p, "wt") as f:
        f.write(SNAP_TEXT)
    edges = read_snap_edges(spark, str(p))
    assert _collect_pairs(edges) == [(0, 1), (1, 2), (2, 3), (3, 4)]


def test_snap_directed_keeps_both(spark, tmp_path):
    p = tmp_path / "snap.txt"
    p.write_text(SNAP_TEXT)
    edges = read_snap_edges(spark, str(p), directed=True)
    assert (0, 1) in _collect_pairs(edges) and (1, 0) in _collect_pairs(edges)


def test_mtx_one_based_and_dims_skip(spark, tmp_path):
    p = tmp_path / "m.mtx"
    p.write_text(MTX_TEXT)
    edges = read_mtx_edges(spark, str(p))
    # 1-based → 0-based; the "5 5 4" dims line must NOT become an edge
    assert _collect_pairs(edges) == [(0, 1), (0, 2), (1, 2), (3, 4)]


def test_edges_file(spark, tmp_path):
    p = tmp_path / "g.edges"
    p.write_text("0 1\n1 2\n2 0\n")
    assert _collect_pairs(read_edges_file(spark, str(p))) == [(0, 1), (0, 2), (1, 2)]


def test_csv_nodes_edges_remap_and_drop_unknown(spark, tmp_path):
    nodes = tmp_path / "nodes.csv"
    nodes.write_text("id\npaperA\npaperB\npaperC\n")
    edges = tmp_path / "edges.csv"
    edges.write_text("src,dst\npaperA,paperB\npaperB,paperC\npaperA,ghost\n")
    mapping, e = read_csv_nodes_edges(spark, str(nodes), str(edges))
    m = {r.orig_id: r.new_id for r in mapping.collect()}
    assert m == {"paperA": 0, "paperB": 1, "paperC": 2}
    # ghost endpoint dropped, ids remapped densely
    assert _collect_pairs(e) == [(0, 1), (1, 2)]

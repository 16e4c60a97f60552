"""Graph dataset readers — reference S3–S6 re-expressed as Spark text
scans (no driver-side line loops; formats parse in parallel).

- SNAP edge lists (``datasets.py:306-357``): optionally gzipped text,
  ``#`` comments, whitespace-separated pairs; undirected inputs are
  mirrored + deduped to the canonical upper triangle.
- Matrix Market ``.mtx`` (``datasets.py:485-529``): ``%`` comments,
  first non-comment line is dims, 1-based indices → 0-based.
- ``.edges`` plain pair-per-line (``datasets.py:531-572``).
- CSV nodes+edges with id remap (``datasets.py:635-683``): nodes.csv
  defines the id universe; edge endpoints outside it are dropped; ids
  re-indexed densely like the reference's index map.

Spark notes: ``spark.read.text`` splits large files and decompresses
gz transparently; the regex parse + filter is whole-stage codegen; the
mirror+distinct dedup is one shuffle. Re-indexing uses a zipWithIndex-
free ``row_number`` window (single shuffle on the small vertex table).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphem_rapids_spark.graph.canon import canonicalize_edges

_PAIR_RE = r"^\s*(\d+)\s+(\d+)\s*$"


def _parse_pairs(lines: DataFrame, comment_prefix: str) -> DataFrame:
    body = lines.filter(~F.col("value").startswith(comment_prefix))
    src = F.regexp_extract("value", _PAIR_RE, 1)
    dst = F.regexp_extract("value", _PAIR_RE, 2)
    return (
        body.select(src.alias("s"), dst.alias("d"))
        .filter((F.col("s") != "") & (F.col("d") != ""))
        .select(F.col("s").cast("long").alias("src"), F.col("d").cast("long").alias("dst"))
    )


def read_snap_edges(
    spark: SparkSession, path: str, directed: bool = False
) -> DataFrame:
    """SNAP text/gz edge list → canonical edges(src<dst). Undirected
    inputs mirror+dedupe exactly like the reference loader
    (``datasets.py:339-352``)."""
    raw = _parse_pairs(spark.read.text(path), "#")
    if directed:
        return raw.distinct()
    return canonicalize_edges(raw)


def read_mtx_edges(spark: SparkSession, path: str) -> DataFrame:
    """Matrix Market: skip % comments AND the dims line (the first
    non-comment line), 1-based → 0-based."""
    lines = spark.read.text(path).withColumn(
        "_i", F.monotonically_increasing_id()
    )
    body = lines.filter(~F.col("value").startswith("%"))
    first = body.agg(F.min("_i")).first()[0]
    pairs = _parse_pairs(body.filter(F.col("_i") != first), "%")
    return canonicalize_edges(
        pairs.select((F.col("src") - 1).alias("src"), (F.col("dst") - 1).alias("dst"))
    )


def read_edges_file(spark: SparkSession, path: str) -> DataFrame:
    """Plain pair-per-line ``.edges`` file."""
    return canonicalize_edges(_parse_pairs(spark.read.text(path), "#"))


def read_csv_nodes_edges(
    spark: SparkSession, nodes_path: str, edges_path: str,
    node_id_col: str = "id", src_col: str = "src", dst_col: str = "dst",
) -> tuple[DataFrame, DataFrame]:
    """CSV nodes+edges with dense re-index (reference Semantic Scholar
    loader): returns (vertices(new_id, orig_id), edges(src, dst)).
    Edge endpoints not present in nodes.csv are dropped (inner joins),
    matching the reference's 'skip unknown endpoints' behavior."""
    from graphem_rapids_spark.scale import global_dense_index

    nodes = spark.read.option("header", "true").csv(nodes_path).select(
        F.col(node_id_col).alias("orig_id")
    ).distinct()
    mapping = global_dense_index(nodes, "orig_id", "new_id")
    raw = spark.read.option("header", "true").csv(edges_path).select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    )
    remapped = (
        raw.join(mapping.select(F.col("orig_id").alias("_s"), F.col("new_id").alias("src")), "_s")
        .join(mapping.select(F.col("orig_id").alias("_d"), F.col("new_id").alias("dst")), "_d")
        .select("src", "dst")
    )
    return mapping.select("new_id", "orig_id"), canonicalize_edges(remapped)

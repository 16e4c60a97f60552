"""Dataset registry and dispatcher — reference S7/S8/S9
(``datasets.py:205-262`` catalog, ``:686-758`` ``load_dataset`` /
``list_available_datasets`` dispatch, ``:761-782`` contiguous relabel).

The reference downloads SNAP / Network-Repository / Semantic Scholar
archives into a cache dir and parses them with per-line Python loops.
Here the catalog is the same, but:

- parsing is a parallel Spark text scan (``graph/io.py`` readers);
- downloading is driver-side and **optional** — this engine never
  fetches inside a Spark job (a 1000-executor cluster reads from the
  object store, not HTTP). If the file is absent and the environment
  has no network, ``load_dataset`` raises with the public URL so the
  operator can stage it.
- dataset ids keep the reference's ``prefix-name`` convention but the
  dispatch is exact-prefix (the reference's sequential non-exclusive
  ``if`` chain at ``datasets.py:739-757`` can shadow names — noted in
  SURVEY §2.9 as a defect; not replicated).
"""

from __future__ import annotations

import gzip
import os
import shutil
import tarfile
import urllib.request
import zipfile
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphem_rapids_spark.graph.canon import relabel_contiguous, vertices_from_edges
from graphem_rapids_spark.graph.io import (
    read_edges_file,
    read_mtx_edges,
    read_snap_edges,
)

DEFAULT_DATA_DIR = os.environ.get(
    "GRAPHEM_DATA_DIR", os.path.expanduser("~/.graphem_rapids_spark/data")
)


@dataclass(frozen=True)
class DatasetInfo:
    """Catalog entry (reference ``datasets.py:205-262``)."""

    name: str
    url: str
    filename: str
    fmt: str  # 'snap' | 'mtx' | 'edges' | 'csv-pair'
    directed: bool
    description: str
    n_vertices: int | None = None
    n_edges: int | None = None


# The reference's SNAP catalog (``datasets.py:205-262``) — same ids,
# same public URLs, plus the Network-Repository / Semantic Scholar
# entries its loaders dispatch on.
CATALOG: dict[str, DatasetInfo] = {
    d.name: d
    for d in [
        DatasetInfo(
            "snap-facebook_combined",
            "https://snap.stanford.edu/data/facebook_combined.txt.gz",
            "facebook_combined.txt.gz",
            "snap", False, "Facebook social circles", 4039, 88234,
        ),
        DatasetInfo(
            "snap-ca-GrQc",
            "https://snap.stanford.edu/data/ca-GrQc.txt.gz",
            "ca-GrQc.txt.gz",
            "snap", False, "Collaboration network, General Relativity", 5242, 14496,
        ),
        DatasetInfo(
            "snap-ca-HepTh",
            "https://snap.stanford.edu/data/ca-HepTh.txt.gz",
            "ca-HepTh.txt.gz",
            "snap", False, "Collaboration network, High Energy Physics Theory", 9877, 25998,
        ),
        DatasetInfo(
            "snap-ca-HepPh",
            "https://snap.stanford.edu/data/ca-HepPh.txt.gz",
            "ca-HepPh.txt.gz",
            "snap", False, "Collaboration network, High Energy Physics Phenomenology", 12008, 118521,
        ),
        DatasetInfo(
            "snap-ca-AstroPh",
            "https://snap.stanford.edu/data/ca-AstroPh.txt.gz",
            "ca-AstroPh.txt.gz",
            "snap", False, "Collaboration network, Astrophysics", 18772, 198110,
        ),
        DatasetInfo(
            "snap-ca-CondMat",
            "https://snap.stanford.edu/data/ca-CondMat.txt.gz",
            "ca-CondMat.txt.gz",
            "snap", False, "Collaboration network, Condensed Matter", 23133, 93497,
        ),
        DatasetInfo(
            "snap-wiki-Vote",
            "https://snap.stanford.edu/data/wiki-Vote.txt.gz",
            "wiki-Vote.txt.gz",
            "snap", True, "Wikipedia adminship votes", 7115, 103689,
        ),
        DatasetInfo(
            "snap-email-Enron",
            "https://snap.stanford.edu/data/email-Enron.txt.gz",
            "email-Enron.txt.gz",
            "snap", False, "Enron email communication network", 36692, 183831,
        ),
    ]
}


def list_available_datasets() -> dict[str, dict]:
    """Reference ``list_available_datasets`` (``datasets.py:686-735``)."""
    return {
        name: {
            "description": d.description,
            "url": d.url,
            "format": d.fmt,
            "directed": d.directed,
            "n_vertices": d.n_vertices,
            "n_edges": d.n_edges,
        }
        for name, d in CATALOG.items()
    }


def download_file(url: str, dest: str, timeout: int = 60) -> str:
    """Driver-side HTTP fetch (reference ``download_file``,
    ``datasets.py:40-122``). Never called from executors."""
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    tmp = dest + ".part"
    with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
        shutil.copyfileobj(r, f)
    os.replace(tmp, dest)
    return dest


def extract_file(path: str, dest_dir: str) -> str:
    """gz/zip/tar extract (reference ``extract_file``). gz is NOT
    extracted — ``spark.read.text`` decompresses transparently."""
    os.makedirs(dest_dir, exist_ok=True)
    if path.endswith((".tar.gz", ".tgz", ".tar")):
        with tarfile.open(path) as t:
            t.extractall(dest_dir, filter="data")
    elif path.endswith(".zip"):
        with zipfile.ZipFile(path) as z:
            z.extractall(dest_dir)
    elif path.endswith(".gz"):
        out = os.path.join(dest_dir, os.path.basename(path)[:-3])
        with gzip.open(path, "rb") as src, open(out, "wb") as dst:
            shutil.copyfileobj(src, dst)
        return out
    return dest_dir


def load_dataset(
    name_or_path: str,
    spark: SparkSession | None = None,
    data_dir: str | None = None,
    download: bool = False,
    relabel: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Load a graph dataset → ``(vertices, edges)`` DataFrames
    (reference ``load_dataset``, ``datasets.py:686-758``).

    ``name_or_path`` is a catalog id (``snap-ca-GrQc``) or a direct
    file path (``.txt/.gz`` SNAP-style, ``.mtx``, ``.edges``). With
    ``relabel=True`` vertex ids are re-indexed to contiguous 0..n-1
    exactly like the reference's networkx relabel (S9,
    ``datasets.py:148-166``) — then ``vertices`` carries
    ``(id, orig_id)``; otherwise ``vertices`` is the distinct ids.
    """
    if spark is None:
        spark = SparkSession.getActiveSession()
        if spark is None:
            from graphem_rapids_spark.session import get_spark

            spark = get_spark()

    if name_or_path in CATALOG:
        info = CATALOG[name_or_path]
        path = os.path.join(data_dir or DEFAULT_DATA_DIR, info.filename)
        if not os.path.exists(path):
            if download:
                download_file(info.url, path)
            else:
                raise FileNotFoundError(
                    f"dataset '{name_or_path}' not staged at {path}; fetch it "
                    f"from {info.url} (or pass download=True on a networked driver)"
                )
        edges = read_snap_edges(spark, path, directed=info.directed)
    else:
        path = name_or_path
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"'{name_or_path}' is neither a catalog id "
                f"({sorted(CATALOG)}) nor an existing file"
            )
        if path.endswith(".mtx"):
            edges = read_mtx_edges(spark, path)
        elif path.endswith(".edges"):
            edges = read_edges_file(spark, path)
        else:
            edges = read_snap_edges(spark, path)

    if relabel:
        new_edges, mapping = relabel_contiguous(edges)
        verts = mapping.select(
            F.col("new_id").alias("id"), F.col("old_id").alias("orig_id")
        )
        return verts, new_edges
    return vertices_from_edges(edges), edges

"""sf1-scale smoke of the heaviest queries (VERDICT r3 stretch item).

The driver ships testdata up to sf0.1; this script synthesizes a
10×-replicated sf1 workload in /tmp/sf1_smoke (10 disjoint id-offset
copies of the sf0.1 tables — identical degree distributions and
per-copy density, so per-edge/per-row costs are representative even
though no cross-copy edges exist) and times the heaviest registry
queries on it. Purpose: catch O(n²)-ish constants the sf0.1 bench
cannot see — NOT a correctness gate (no oracles at this scale) and
NOT the official bench (bench.py).

documents replication keeps each copy's text VERBATIM, which makes
every document a 10-way near-duplicate — an intentional worst-case
duplicate-density stress for dedup_minhash_lsh (bucket collisions ×10,
verify-join fanout at its cap).

Usage: python scripts/sf1_smoke.py [runs_per_query] [query ...]
(query names override the default heavy list)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

SF_SRC = "/root/testdata/sf0.1"
SF_DST = "/tmp/sf1_smoke"
COPIES = 10
# id-offset constants chosen far above any sf0.1 key range
OK_OFF = 100_000_000   # orderkey stride
PK_OFF = 10_000_000    # partkey stride
CK_OFF = 10_000_000    # custkey / suppkey stride
DOC_OFF = 1_000_000
VEC_OFF = 1_000_000

QUERIES = [
    "layout_seed_selection",
    "dedup_minhash_lsh",
    "influence_ic",
    "pagerank_copurchase",
    "ktruss_copurchase",
]


def build_data() -> None:
    import duckdb

    os.makedirs(SF_DST, exist_ok=True)
    con = duckdb.connect()
    copies = f"(SELECT range AS k FROM range({COPIES}))"
    specs = {
        "lineitem": f"""
            SELECT l_orderkey + k * {OK_OFF} AS l_orderkey,
                   l_partkey + k * {PK_OFF} AS l_partkey,
                   l_suppkey + k * {CK_OFF} AS l_suppkey,
                   * EXCLUDE (l_orderkey, l_partkey, l_suppkey, k)
            FROM read_parquet('{SF_SRC}/lineitem.parquet') CROSS JOIN {copies}""",
        "orders": f"""
            SELECT o_orderkey + k * {OK_OFF} AS o_orderkey,
                   o_custkey + k * {CK_OFF} AS o_custkey,
                   * EXCLUDE (o_orderkey, o_custkey, k)
            FROM read_parquet('{SF_SRC}/orders.parquet') CROSS JOIN {copies}""",
        "documents": f"""
            SELECT doc_id + k * {DOC_OFF} AS doc_id,
                   * EXCLUDE (doc_id, k)
            FROM read_parquet('{SF_SRC}/documents.parquet') CROSS JOIN {copies}""",
        "embeddings": f"""
            SELECT vec_id + k * {VEC_OFF} AS vec_id,
                   * EXCLUDE (vec_id, k)
            FROM read_parquet('{SF_SRC}/embeddings.parquet') CROSS JOIN {copies}""",
        # events replicated since r8 (earlier rounds straight-copied
        # them, so events-family smokes ran at sf0.1 volume): disjoint
        # user populations per copy, identical timestamps — the daily
        # grid stays calendar-bounded while per-day volume goes 10×,
        # exactly the scale axis the events operators must absorb.
        # (ts nanos truncate to micros through DuckDB — irrelevant for
        # perf smokes, which have no oracle.)
        "events": f"""
            SELECT event_id + k * {OK_OFF} AS event_id,
                   user_id + k * {CK_OFF} AS user_id,
                   * EXCLUDE (event_id, user_id, k)
            FROM read_parquet('{SF_SRC}/events.parquet') CROSS JOIN {copies}""",
    }
    for t, sql in specs.items():
        dst = f"{SF_DST}/{t}.parquet"
        if not os.path.exists(dst):
            con.execute(f"COPY ({sql}) TO '{dst}' (FORMAT PARQUET)")
            n = con.execute(f"SELECT count(*) FROM read_parquet('{dst}')").fetchone()[0]
            print(f"built {t}: {n} rows", flush=True)
    # small dims: straight copies (not on the hot paths)
    for t in ["region", "nation", "customer", "supplier", "part"]:
        dst = f"{SF_DST}/{t}.parquet"
        if not os.path.exists(dst):
            shutil.copyfile(f"{SF_SRC}/{t}.parquet", dst)


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    names = sys.argv[2:] or QUERIES
    build_data()
    from graphem_rapids_spark.session import get_spark
    import __spark_entry__ as entry

    spark = get_spark()
    qs = entry.queries()
    out: dict = {}
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.time()
            n = qs[name](spark, SF_DST).count()
            times.append(round(time.time() - t0, 1))
        out[name] = {"rows": n, "runs_sec": times}
        print(f"{name}: rows={n} runs={times}", flush=True)
    print(json.dumps({"sf": "1 (10x sf0.1 replicas)", "queries": out}))


if __name__ == "__main__":
    main()

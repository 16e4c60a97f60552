"""SQL-string interface: register the engine's tables as temp views
and run raw ANSI SQL through Catalyst.

Everything the DataFrame queries express is equally reachable as SQL
(`spark.sql`), and the oracle strings in `__spark_entry__.oracle_sql`
are near-portable; this module is the two-line bridge that makes the
repo usable from a pure-SQL workflow (BI tools, notebooks,
dbt-style pipelines): `register_tables(spark, sf_dir)` then
`spark.sql("SELECT ... FROM lineitem ...")`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each parquet table as a temp view named after itself.
    Views are lazy — no scan happens until a query runs, and filters/
    projections push down to the parquet scan exactly as with the
    DataFrame API."""
    names = tables or TABLES
    for t in names:
        spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
    return names


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """One-shot: register views then run the query."""
    register_tables(spark, sf_dir)
    return spark.sql(query)

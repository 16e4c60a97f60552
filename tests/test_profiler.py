"""Profiler hooks — engine-side SQL-metric capture + driver cProfile
(reference ``benchmarks/run_benchmarks.py:1018-1065`` analog)."""

from pyspark.sql import functions as F

from graphem_rapids_spark.profiler import (
    format_profile,
    profile_python,
    profile_query,
)


def test_profile_query_captures_shuffle_metrics(spark):
    df = (
        spark.range(10_000)
        .select((F.col("id") % 97).alias("k"))
        .groupBy("k")
        .agg(F.count("*").alias("c"))
    )
    prof = profile_query(df)
    assert prof["result"] == 97
    assert prof["wall_sec"] > 0
    assert len(prof["executions"]) >= 1
    merged = {}
    for e in prof["executions"]:
        merged.update(e["metrics"])
    assert "number of output rows" in merged
    # a groupBy over range must exchange — shuffle write metric present
    assert any("shuffle bytes written" in k for k in merged), sorted(merged)
    rows = merged["number of output rows"]
    assert rows["nodes"] >= 1 and rows["total"] >= 97


def test_profile_query_thunk_and_format(spark):
    prof = profile_query(
        lambda: spark.range(100).agg(F.sum("id")).first()[0], spark=spark
    )
    assert prof["result"] == 4950
    text = format_profile(prof)
    assert "wall:" in text and "execution 0:" in text


def test_profile_python_reports_stats():
    out = profile_python(lambda: sum(i * i for i in range(50_000)))
    assert out["result"] == sum(i * i for i in range(50_000))
    assert "cumulative" in out["stats_text"]
    assert out["wall_sec"] > 0

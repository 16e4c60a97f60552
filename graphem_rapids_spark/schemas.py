"""Explicit StructTypes for the engine's core tables (SURVEY.md §1.3:
the reference's schemas are fixed-and-implicit; ours are explicit)."""

from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

VERTICES_SCHEMA = StructType([StructField("id", LongType(), False)])

EDGES_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
    ]
)

WEIGHTED_EDGES_SCHEMA = StructType(
    [
        StructField("src", LongType(), False),
        StructField("dst", LongType(), False),
        StructField("weight", DoubleType(), True),
    ]
)

POSITIONS_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("pos", ArrayType(DoubleType(), False), False),
    ]
)

CENTRALITY_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("measure", StringType(), False),
        StructField("value", DoubleType(), False),
    ]
)

SEEDS_SCHEMA = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("id", LongType(), False),
        StructField("radius", DoubleType(), False),
    ]
)

IC_RESULT_SCHEMA = StructType(
    [
        StructField("trial_id", IntegerType(), False),
        StructField("id", LongType(), False),
        StructField("state", IntegerType(), False),
    ]
)

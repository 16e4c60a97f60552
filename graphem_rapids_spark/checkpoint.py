"""Stats-safe eager checkpointing for iterative kernels.

Root cause (measured r8, this VM, Spark 4.1): ``localCheckpoint``
propagates the child plan's CBO statistics into the resulting
``LogicalRDD`` (SPARK-39834 behavior). Catalyst's size-only join
estimate is a PRODUCT of child sizes, so a per-iteration plan that
references its previous checkpoint in k places compounds the
``sizeInBytes`` BigInt k-fold per iteration — the digit count grows
exponentially (measured on the Louvain move pass: 132 → 582 → 2383 →
9585 digits over four passes), and the driver ends up spending entire
cores inside ``BigInteger.multiplyToomCook3`` DURING PLANNING: pass
cost exploded 0.7 s → 88 s by pass 9 on a 10-vertex graph with
constant data, constant lineage (7 RDD lines), and a constant 18 jobs
per pass. This single mechanism explains the "move passes get slower
each round" behavior previously attributed to JIT/VM weather.

Fix: after the eager localCheckpoint, rebuild the DataFrame from the
checkpointed physical RDD via ``internalCreateDataFrame`` — same
rows, same schema, but a fresh ``LogicalRDD`` carrying only default
stats (digit count pinned at 19; the same 14-pass probe holds flat at
0.5–0.9 s). The pessimistic default size only affects STATIC broadcast
planning, and AQE re-plans joins from actual runtime shuffle sizes, so
nothing is lost at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def eager_checkpoint(df: DataFrame, sever_stats: bool = True) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` + origin-stats severing (see
    module docstring). Falls back to the plain checkpoint if the
    internal constructor is unavailable (non-classic sessions)."""
    out = df.localCheckpoint(eager=True)
    if not sever_stats:
        return out
    try:
        jdf = out._jdf
        spark = out.sparkSession
        new_jdf = spark._jsparkSession.internalCreateDataFrame(
            jdf.queryExecution().toRdd(), jdf.schema(), False
        )
        severed = DataFrame(new_jdf, spark)
        severed._graphem_ckpt_src = out  # for release() — see below
        return severed
    except Exception:  # pragma: no cover — connect/older builds
        return out


def release(df: DataFrame) -> None:
    """Unpersist a checkpoint produced by :func:`eager_checkpoint`
    (the severed frame does not own the cached RDD blocks — the
    original checkpointed frame does, so plain ``df.unpersist()``
    would be a no-op on a severed frame)."""
    src = getattr(df, "_graphem_ckpt_src", None)
    (src if src is not None else df).unpersist()

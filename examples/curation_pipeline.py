"""End-to-end LLM training-data curation walk-through: quality and
repetition signals, benchmark decontamination, PII scrubbing, exact +
semantic dedup (SemDeDup), sliding-window chunking, and the one-pass
funnel report — the operators a 100 TB curation run chains together.

Usage: python examples/curation_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from graphem_rapids_spark.session import get_spark  # noqa: E402
from graphem_rapids_spark.pipeline import similarity as S  # noqa: E402
from graphem_rapids_spark.pipeline import text as T  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graphem-curation")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # 1. per-document curation signals, one narrow pass
    sig = T.curation_signals(docs)
    sig.orderBy("doc_id").show(5)

    # 2. repetition filter (Gopher-style): drop looping/boilerplate docs
    rep = T.repetition_stats(docs)
    print("docs over dup-2gram cap:", rep.filter("dup_2gram_frac > 0.05").count())

    # 3. benchmark decontamination: hold out doc_id % 20 == 0 as "eval"
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    contaminated = T.decontaminate(train, bench, n=4)
    print("train docs sharing a 4-gram with eval:", contaminated.count())

    # 4. PII scrub audit
    pii = T.pii_scrub(docs)
    pii.agg(
        F.sum("n_emails").alias("emails"),
        F.sum("n_phones").alias("phones"),
        F.sum("n_ips").alias("ips"),
    ).show()

    # 5. semantic dedup over embeddings (SemDeDup)
    sd = S.semdedup(embs, threshold=0.4, n_cells=8)
    sd.groupBy("keep").count().orderBy("keep").show()

    # 6. chunking for retrieval / training windows
    chunks = T.sliding_chunks(docs, size=32, stride=24)
    print("chunks:", chunks.count(), "docs:", docs.count())

    # 7. near-dup survivor pick: keep the best member of each cluster
    from graphem_rapids_spark.queries import (
        dedup_cluster_keep_best,
        lang_mixture_weights,
        sample_priority_weighted,
    )

    best = dedup_cluster_keep_best(spark, sf_dir)
    print("near-dup clusters resolved to a survivor:", best.count())

    # 8. language rebalancing: temperature-sampled mixture weights
    lang_mixture_weights(spark, sf_dir).orderBy("lang").show()

    # 9. weighted sampling with an unbiased total estimate
    ps = sample_priority_weighted(spark, sf_dir)
    row = ps.first()
    print(
        "priority sample rel. err of corpus-total estimate:",
        row["rel_err"],
    )

    # 10-12. the mixture-planning stage: admit sources on the Wilson
    # lower bound, spend the token budget under epoch caps, then
    # score docs against the target distribution (DSIR)
    from graphem_rapids_spark.queries import (
        doc_dsir_weights,
        lang_budget_waterfill,
        source_wilson_gate,
    )

    gate = source_wilson_gate(spark, sf_dir)
    print("sources admitted:", gate.filter("admitted").count(), "/", gate.count())
    lang_budget_waterfill(spark, sf_dir).show()
    dsir = doc_dsir_weights(spark, sf_dir)
    dsir.orderBy(F.desc("dsir_logw")).show(5)

    spark.stop()


if __name__ == "__main__":
    main()

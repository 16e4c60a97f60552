"""Training-data pipeline over the documents/embeddings tables:
exact + MinHash-LSH dedup, quality/language stats, and ANN similarity
search — the 100 TB-scale operators (BASELINE.json north-star).

Usage: python examples/data_pipeline.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
from graphem_rapids_spark.pipeline import dedup as D  # noqa: E402
from graphem_rapids_spark.pipeline import similarity as S  # noqa: E402
from graphem_rapids_spark.pipeline import text as T  # noqa: E402
from graphem_rapids_spark import queries as Q  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graphem-data-pipeline")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    embs = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    exact = D.exact_duplicates(docs)
    print("exact-dup groups with copies:", exact.filter("n_copies > 1").count())

    near = D.minhash_lsh_pairs(docs, n=4, threshold=0.7)
    print("minhash near-dup pairs:", near.count())

    stats = T.token_stats(docs)
    stats.orderBy("doc_id").show(5)

    lang = T.language_id(docs)
    lang.groupBy("pred_lang").count().orderBy("pred_lang").show()

    topk = S.cosine_topk(embs, embs.limit(5), k=3)
    topk.show(15)

    pq = S.ivfpq_topk(embs, embs.filter("vec_id < 5"), k=3)
    print("ivf-pq approximate neighbors:", pq.count())

    xent = Q.doc_unigram_logprob(spark, sf_dir)
    print("highest-perplexity docs (unigram LM):")
    xent.orderBy(xent.xent_nats.desc()).show(3)

    pca = Q.embedding_pca_power(spark, sf_dir)
    for row in pca.filter("dim = 0").orderBy("component").collect():
        print(
            f"principal component {row['component']} eigenvalue "
            f"(scatter/n): {row['lam']}"
        )

    spark.stop()


if __name__ == "__main__":
    main()

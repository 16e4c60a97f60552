"""Round-6 operator tour: exact PPJoin dedup, BPE tokenizer
training + corpus encoding, and HyperBall sketch radii → effective
diameter — the library APIs behind the newest registry queries.

Usage: python examples/tokenizer_and_sketches.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
from graphem_rapids_spark.pipeline.dedup import prefix_jaccard_pairs  # noqa: E402
from graphem_rapids_spark.analytics import hyperball, load_sampled  # noqa: E402
from graphem_rapids_spark import queries as Q  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graphem-r6-tour")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # exact set-similarity self-join (PPJoin): every J >= 0.8 pair,
    # no probabilistic recall — df order packs prefixes with rare
    # tokens (the scale knob for skewed vocabularies)
    shard = docs.filter("doc_id % 10 = 0")
    pairs = prefix_jaccard_pairs(shard, threshold=0.8, token_order="df")
    print("exact near-dup pairs (J>=0.8, shard):", pairs.count())

    # BPE: train 6 merge rounds, then encode the corpus
    merges = Q.tokenizer_bpe_train_rounds(spark, sf_dir)
    print("BPE merge table:")
    for r in merges.collect():
        print(f"  round {r['round']}: '{r['sym_a']}'+'{r['sym_b']}'"
              f" -> '{r['merged']}' (count {r['pair_count']})")
    enc = Q.tokenizer_bpe_encode(spark, sf_dir)
    print("per-lang compression (chars/token):")
    for r in enc.collect():
        print(f"  {r['lang']}: {r['chars_per_token']}")

    # HyperBall sketch radii on the co-purchase graph -> effective
    # diameter; plus distributed load centrality over the same graph
    edges = Q.copurchase_edges(spark, sf_dir)
    hb = hyperball(edges, m=16, rounds=2)
    print("hyperball rows (one per vertex):", hb.count())
    eff = Q.graph_effective_diameter(spark, sf_dir).collect()[0]
    print("90% effective diameter (horizon 3):", eff["eff_diameter_90"])

    verts = hb.select("id")
    lc = load_sampled(edges, verts.count(), vertices=verts,
                      sources=verts.limit(8), max_depth=6)
    print("top load-centrality vertex:",
          lc.orderBy(lc.value.desc()).first().asDict())


if __name__ == "__main__":
    main()

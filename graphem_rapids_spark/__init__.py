"""graphem_rapids_spark — a PySpark-native analytics engine with the
query and data-processing capabilities of ``sashakolpakov/graphem-rapids``.

The reference (see SURVEY.md) is a GPU graph-embedding library:
spectral initialization + force-directed layout whose radial geometry
drives influence-maximization seed selection, plus graph generators,
dataset loaders, an Independent-Cascade simulator and a
centrality-correlation benchmark harness.

This package re-expresses every operator Spark-first (DataFrame/SQL,
Catalyst-optimized, shuffle-aware) and extends the surface with the
large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal columns) that a 100 TB deployment
needs.

Public API parity target: reference ``graphem_rapids/__init__.py:173-220``.
"""

from graphem_rapids_spark.session import get_spark, stop_spark
from graphem_rapids_spark.graph.canon import (
    canonicalize_edges,
    symmetrize_edges,
    vertices_from_edges,
    relabel_contiguous,
    vertex_degrees,
)
from graphem_rapids_spark.graph.generators import (
    erdos_renyi_graph,
    compute_vertex_degrees,
    generate_sbm,
    generate_ba,
    generate_ws,
    generate_power_cluster,
    generate_road_network,
    generate_bipartite_graph,
    generate_balanced_tree,
    generate_random_regular,
    generate_scale_free,
    generate_geometric,
    generate_caveman,
    generate_relaxed_caveman,
)
from graphem_rapids_spark.embedding.embedder import GraphEmbedderSpark, create_graphem
from graphem_rapids_spark.influence import (
    graphem_seed_selection,
    estimated_influence,
    ndlib_estimated_influence,
    greedy_seed_selection,
    random_seed_baseline,
)
from graphem_rapids_spark.analytics import (
    degree_centrality,
    pagerank,
    pagerank_personalized,
    pagerank_weighted,
    eigenvector_centrality,
    hits,
    katz_centrality,
    oriented_triangles,
    random_walks,
    connected_components,
    star_contract_edges,
    label_propagation,
    graph_stats,
    spearman_correlation,
    rank_column,
    full_correlation_matrix,
    bootstrap_spearman_ci,
    betweenness_sampled,
    betweenness_centrality,
    load_centrality,
    closeness_centrality,
    harmonic_centrality,
    bfs_distances,
    k_core,
    k_truss,
    coreness,
    largest_connected_component,
)
from graphem_rapids_spark.graph.io import (
    read_snap_edges,
    read_mtx_edges,
    read_edges_file,
    read_csv_nodes_edges,
)
from graphem_rapids_spark.datasets import (
    load_dataset,
    list_available_datasets,
)
from graphem_rapids_spark.benchmark import (
    run_benchmark,
    benchmark_correlations,
    run_influence_benchmark,
    compare_configs,
)
from graphem_rapids_spark.reports import (
    display_benchmark_results,
    save_results,
    report_corr,
    report_full_correlation_matrix,
    plot_radial_vs_centrality,
    plot_embedding,
)
from graphem_rapids_spark.session import get_backend_info
from graphem_rapids_spark.profiler import (
    profile_query,
    profile_python,
    format_profile,
)
from graphem_rapids_spark.pipeline.dedup import (
    exact_duplicates,
    ngram_jaccard_pairs,
    minhash_lsh_pairs,
    simhash_fingerprints,
    simhash_near_pairs,
    substring_span_dedup,
    containment_pairs,
)
from graphem_rapids_spark.pipeline.similarity import (
    cosine_topk,
    cosine_near_dup_join,
    ivf_cosine_topk,
    plan_lsh_geometry,
    semdedup,
    quantize_int8,
    project_jl,
    kmeans_int8,
)
from graphem_rapids_spark.sql import register_tables, run_sql
from graphem_rapids_spark.pipeline.corpus_io import (
    read_jsonl_corpus,
    write_jsonl_corpus,
    corrupt_record_count,
)
from graphem_rapids_spark.pipeline.text import (
    token_stats,
    bpe_token_stats,
    quality_score,
    language_id,
    fingerprint,
    rolling_fingerprint,
    stratified_sample,
    pack_token_chunks,
    repetition_stats,
    decontaminate,
    pii_scrub,
    sliding_chunks,
    curation_signals,
    inverted_index,
    bm25_topk,
)
from graphem_rapids_spark.pipeline.sinks import (
    write_training_shards,
    read_training_shards,
)
from graphem_rapids_spark.pipeline.multimodal import (
    extract_image_features,
    resize_images,
    frame_sample_plan,
    media_repartition,
)

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "canonicalize_edges",
    "symmetrize_edges",
    "vertices_from_edges",
    "relabel_contiguous",
    "vertex_degrees",
    "erdos_renyi_graph",
    "compute_vertex_degrees",
    "generate_sbm",
    "generate_ba",
    "generate_ws",
    "generate_power_cluster",
    "generate_road_network",
    "generate_bipartite_graph",
    "generate_balanced_tree",
    "generate_random_regular",
    "generate_scale_free",
    "generate_geometric",
    "generate_caveman",
    "generate_relaxed_caveman",
    "GraphEmbedderSpark",
    "create_graphem",
    "graphem_seed_selection",
    "estimated_influence",
    "ndlib_estimated_influence",
    "greedy_seed_selection",
    "random_seed_baseline",
    "degree_centrality",
    "pagerank",
    "pagerank_personalized",
    "pagerank_weighted",
    "eigenvector_centrality",
    "hits",
    "katz_centrality",
    "oriented_triangles",
    "random_walks",
    "connected_components",
    "star_contract_edges",
    "label_propagation",
    "graph_stats",
    "spearman_correlation",
    "rank_column",
    "full_correlation_matrix",
    "bootstrap_spearman_ci",
    "betweenness_sampled",
    "betweenness_centrality",
    "load_centrality",
    "closeness_centrality",
    "harmonic_centrality",
    "bfs_distances",
    "read_snap_edges",
    "read_mtx_edges",
    "read_edges_file",
    "read_csv_nodes_edges",
    "load_dataset",
    "list_available_datasets",
    "run_benchmark",
    "benchmark_correlations",
    "run_influence_benchmark",
    "compare_configs",
    "display_benchmark_results",
    "save_results",
    "report_corr",
    "report_full_correlation_matrix",
    "plot_radial_vs_centrality",
    "plot_embedding",
    "get_backend_info",
    "profile_query",
    "profile_python",
    "format_profile",
    # data-pipeline operator surface
    "exact_duplicates",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "simhash_near_pairs",
    "substring_span_dedup",
    "containment_pairs",
    "cosine_topk",
    "cosine_near_dup_join",
    "ivf_cosine_topk",
    "plan_lsh_geometry",
    "token_stats",
    "bpe_token_stats",
    "quality_score",
    "language_id",
    "fingerprint",
    "rolling_fingerprint",
    "stratified_sample",
    "pack_token_chunks",
    "repetition_stats",
    "decontaminate",
    "pii_scrub",
    "sliding_chunks",
    "curation_signals",
    "inverted_index",
    "bm25_topk",
    "semdedup",
    "quantize_int8",
    "project_jl",
    "kmeans_int8",
    "k_core",
    "k_truss",
    "coreness",
    "largest_connected_component",
    "read_jsonl_corpus",
    "register_tables",
    "run_sql",
    "write_jsonl_corpus",
    "corrupt_record_count",
    "write_training_shards",
    "read_training_shards",
    "extract_image_features",
    "resize_images",
    "frame_sample_plan",
    "media_repartition",
    "__version__",
]

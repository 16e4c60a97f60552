"""Result sinks and visualization surface — reference S10
(``benchmarks/run_benchmarks.py:495-930`` CSV/Markdown/LaTeX/HTML
writers), A11 (``visualization.py:93-127`` scatter/trendline plots),
``report_corr`` / ``report_full_correlation_matrix`` /
``display_benchmark_results`` (``visualization.py:11-90``,
``benchmark.py:166-209``).

All sinks are driver-side pandas over *already-aggregated* results —
the raw data stays in Spark; only the small summary tables cross the
collect boundary, exactly as a 100 TB deployment would do (write the
big outputs with ``df.write.parquet``, render the per-run report from
kilobytes of aggregates). Plotly is optional and gated behind an
import-try (absent in this container), matching the engine's
stub-don't-require policy for non-core libs.
"""

from __future__ import annotations

import json
import os

import pandas as pd
from pyspark.sql import DataFrame

from graphem_rapids_spark.analytics import (
    bootstrap_spearman_ci,
    full_correlation_matrix,
)


def results_to_pandas(results: dict | list[dict]) -> pd.DataFrame:
    """Flatten run_benchmark result dict(s) into one row each
    (reference ``BenchmarkRunner.save_results`` input shape)."""
    rows = []
    for r in results if isinstance(results, list) else [results]:
        flat = {}
        for k, v in r.items():
            if isinstance(v, dict):
                for kk, vv in v.items():
                    if not isinstance(vv, (dict, list, tuple)):
                        flat[f"{k}.{kk}"] = vv
            elif not isinstance(v, (list, tuple)):
                flat[k] = v
        rows.append(flat)
    return pd.DataFrame(rows)


def _to_markdown(df: pd.DataFrame) -> str:
    # pandas' to_markdown needs the optional tabulate package — a
    # plain pipe table keeps the sink dependency-free
    def fmt(v):
        return f"{v:.6g}" if isinstance(v, float) else str(v)

    cols = [str(c) for c in df.columns]
    lines = ["| " + " | ".join(cols) + " |",
             "|" + "|".join("---" for _ in cols) + "|"]
    for _, row in df.iterrows():
        lines.append("| " + " | ".join(fmt(v) for v in row) + " |")
    return "\n".join(lines) + "\n"


def save_results(
    results: dict | list[dict], path: str, fmt: str | None = None
) -> str:
    """Write benchmark results as csv / markdown / latex / html / json
    (reference ``benchmarks/run_benchmarks.py:495-930``). Format
    inferred from the extension when not given."""
    fmt = fmt or os.path.splitext(path)[1].lstrip(".").lower() or "csv"
    if fmt in ("md", "markdown"):
        fmt = "markdown"
    df = results_to_pandas(results)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if fmt == "csv":
        df.to_csv(path, index=False)
    elif fmt == "markdown":
        with open(path, "w") as f:
            f.write(_to_markdown(df))
    elif fmt in ("tex", "latex"):
        with open(path, "w") as f:
            f.write(df.to_latex(index=False))
    elif fmt == "html":
        df.to_html(path, index=False)
    elif fmt == "json":
        with open(path, "w") as f:
            json.dump(results, f, indent=2, default=str)
    else:
        raise ValueError(f"unknown report format: {fmt}")
    return path


def display_benchmark_results(results: dict) -> str:
    """Human-readable summary (reference ``display_benchmark_results``,
    ``benchmark.py:166-209``). Returns (and prints) the text."""
    lines = [
        f"Graph: {results.get('n_vertices')} vertices, "
        f"{results.get('n_edges')} edges "
        f"(density {results.get('density', 0):.6f}, "
        f"avg degree {results.get('avg_degree', 0):.2f})",
        f"Layout: dim={results.get('dim')} iters={results.get('num_iterations')} "
        f"in {results.get('layout_time', 0):.2f}s "
        f"(total {results.get('total_time', 0):.2f}s)",
    ]
    corrs = results.get("correlations", {})
    if corrs:
        lines.append("Spearman ρ(radial distance, centrality):")
        for name, rho in sorted(corrs.items(), key=lambda kv: -abs(kv[1] or 0)):
            lines.append(f"  {name:>12}: {rho:+.4f}")
    for name, t in results.get("centrality_times", {}).items():
        lines.append(f"  [{name} computed in {t:.2f}s]")
    if results.get("skipped_centralities"):
        lines.append(f"  skipped (n too large): {results['skipped_centralities']}")
    text = "\n".join(lines)
    print(text)
    return text


def report_corr(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_boot: int = 1000,
    ci: float = 0.95,
    seed: int = 0,
    label: str | None = None,
) -> str:
    """Spearman ρ with bootstrap CI, formatted like the reference's
    ``report_corr`` (``visualization.py:11-49``) — distributed Poisson
    bootstrap instead of 1000 driver resamples."""
    point, lo, hi = bootstrap_spearman_ci(df, col_a, col_b, n_boot, ci, seed)
    name = label or f"{col_a} vs {col_b}"
    pct = int(ci * 100)
    text = f"{name}: ρ = {point:.4f}  ({pct}% CI [{lo:.4f}, {hi:.4f}], {n_boot} bootstrap)"
    print(text)
    return text


def report_full_correlation_matrix(df: DataFrame, cols: list[str]) -> pd.DataFrame:
    """Pairwise Spearman matrix as a pandas DataFrame (reference
    ``report_full_correlation_matrix``, ``visualization.py:52-90``)."""
    mat = full_correlation_matrix(df, cols)
    out = pd.DataFrame(
        [[mat[(a, b)] for b in cols] for a in cols], index=cols, columns=cols
    )
    print(out.round(4).to_string())
    return out


def plot_radial_vs_centrality(
    radii: DataFrame,
    centralities: dict[str, DataFrame],
    max_points: int = 5000,
    seed: int = 0,
):
    """Scatter+trendline facets (reference ``plot_radial_vs_centrality``,
    ``visualization.py:93-127``). Collects a bounded sample (never the
    full table) and renders with plotly when available; otherwise
    raises ImportError — plotly is not a hard dependency."""
    try:
        import plotly.express as px
    except ImportError as exc:  # pragma: no cover - plotly absent here
        raise ImportError(
            "plotly is required for plot_radial_vs_centrality; "
            "install plotly or use report_corr for text output"
        ) from exc
    from pyspark.sql import functions as F

    wide = radii
    for name, df in centralities.items():
        wide = wide.join(df.select("id", F.col("value").alias(name)), "id", "left")
    n = wide.count()
    frac = min(1.0, max_points / max(n, 1))
    pdf = wide.sample(fraction=frac, seed=seed).toPandas()
    long = pdf.melt(
        id_vars=["id", "radius"],
        value_vars=list(centralities),
        var_name="measure",
        value_name="centrality",
    )
    return px.scatter(
        long, x="radius", y="centrality", facet_col="measure",
        facet_col_wrap=3, trendline="ols", opacity=0.5,
    )


def plot_embedding(positions: DataFrame, edges: DataFrame | None = None,
                   max_points: int = 20000, seed: int = 0):
    """2-D/3-D layout display (reference E15,
    ``embedder_pytorch.py:846-969``) — plotly-gated, bounded collect."""
    try:
        import plotly.graph_objects as go
    except ImportError as exc:  # pragma: no cover - plotly absent here
        raise ImportError("plotly is required for plot_embedding") from exc
    n = positions.count()
    frac = min(1.0, max_points / max(n, 1))
    pdf = positions.sample(fraction=frac, seed=seed).toPandas()
    xs = [p[0] for p in pdf["pos"]]
    ys = [p[1] for p in pdf["pos"]]
    dim = len(pdf["pos"].iloc[0]) if len(pdf) else 2
    if dim >= 3:
        zs = [p[2] for p in pdf["pos"]]
        return go.Figure(go.Scatter3d(x=xs, y=ys, z=zs, mode="markers",
                                      marker=dict(size=2)))
    return go.Figure(go.Scatter(x=xs, y=ys, mode="markers",
                                marker=dict(size=3)))

"""Examples as smoke tests — the reference's CI runs its quick-start
example (``.github/workflows/tests.yml:50-52``); same policy here.
Subprocess isolation: each example owns (and stops) its SparkSession,
which must not touch the suite's shared session."""

from __future__ import annotations

import subprocess
import sys


def _run(script: str, *args: str) -> str:
    out = subprocess.run(
        [sys.executable, script, *args],
        capture_output=True, text=True, timeout=600, cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return out.stdout


def test_quick_start_example():
    stdout = _run("examples/quick_start.py")
    assert "seeds:" in stdout
    assert "graphem influence:" in stdout


def test_data_pipeline_example():
    stdout = _run("examples/data_pipeline.py", "/root/testdata/sf0.001")
    assert "minhash near-dup pairs:" in stdout
    assert "pred_lang" in stdout
    assert "ivf-pq approximate neighbors:" in stdout
    assert "principal component 1 eigenvalue" in stdout
    assert "principal component 2 eigenvalue" in stdout


def test_curation_pipeline_example():
    stdout = _run("examples/curation_pipeline.py", "/root/testdata/sf0.001")
    assert "train docs sharing a 4-gram with eval:" in stdout
    assert "chunks:" in stdout
    assert "near-dup clusters resolved to a survivor:" in stdout
    assert "priority sample rel. err" in stdout


def test_graph_insights_example():
    stdout = _run("examples/graph_insights.py", "/root/testdata/sf0.001")
    assert "degree assortativity:" in stdout
    assert "core-number histogram:" in stdout
    assert "strongest part affinities:" in stdout
    assert "components (star contraction):" in stdout
    assert "weighted-layout radial seeds:" in stdout
    assert "label-propagation communities:" in stdout
    assert "4-truss core:" in stdout
    assert "sampled diameter lower bound:" in stdout
    assert "minimum spanning forest:" in stdout
    assert "node2vec most-visited parts:" in stdout


def test_tokenizer_and_sketches_example():
    stdout = _run("examples/tokenizer_and_sketches.py", "/root/testdata/sf0.001")
    assert "BPE merge table:" in stdout
    assert "90% effective diameter" in stdout
    assert "top load-centrality vertex:" in stdout


def test_eval_and_drift_example():
    stdout = _run("examples/eval_and_drift.py", "/root/testdata/sf0.001")
    assert "JL retrieval MRR@10:" in stdout
    assert "two-gate Cohen's kappa:" in stdout
    assert "conformal gate: tau=" in stdout
    assert "value drift: PSI=" in stdout
    assert "Markov stationary distribution:" in stdout
    assert "k-center coreset" in stdout
    assert "boilerplate segments dropped:" in stdout
    assert "A/B readout: naive=" in stdout
    assert "k-anonymity: min class" in stdout
    assert "skipping[date_clustered]:" in stdout


def test_forecasting_and_structure_example():
    stdout = _run(
        "examples/forecasting_and_structure.py", "/root/testdata/sf0.001"
    )
    assert "hourly ACF:" in stdout
    assert "Holt-Winters next-7-day forecasts:" in stdout
    assert "Kaplan-Meier: survival at the median gap" in stdout
    assert "optimal-partitioning segments:" in stdout
    assert "Louvain Q trajectory" in stdout
    assert "two-level k-center" in stdout
    assert "CCNet tiers per lang (histogram mode):" in stdout


def test_experiments_and_communities_example():
    stdout = _run(
        "examples/experiments_and_communities.py", "/root/testdata/sf0.001"
    )
    assert "SRM guardrail: chi2=" in stdout
    assert "CUPED: naive=" in stdout
    assert "RAKE top-5:" in stdout
    assert "refined Louvain" in stdout
    assert "Girvan-Newman trajectory:" in stdout
    assert "never silent" in stdout

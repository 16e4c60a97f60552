"""Driver-strict smoke slice: runs ``scripts/oracle_check.py`` in a
subprocess with ``GRAPHEM_ARROW=0`` (the driver's row-wise
``createDataFrame`` verifier that rejects numpy scalars — the round-1
flagship crash class) over ~10 queries chosen to cover every
canonicalization-drift class we have been bitten by:

- the three round-1 driver hash-FAILs (sessionize / JSON / caveman),
- numpy-scalar surfacing (layout flagship, rows-only),
- float sufficient-statistics (power-law fit, bootstrap CI),
- fixed-point iterative kernels (betweenness, k-core),
- degenerate-range guards (value histogram),
- the banded-LSH pipeline (minhash).

Opt-in via ``pytest -m driver_strict`` (excluded from the default run
because it boots its own Arrow-off Spark session, ~2 min)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

REPRESENTATIVE = [
    "events_sessionize",
    "events_json_extract",
    "gen_caveman_stats",
    "layout_seed_selection",
    "graph_degree_powerlaw_fit",
    "spearman_bootstrap_ci",
    "betweenness_copurchase",
    "kcore_copurchase",
    "events_value_histogram",
    "dedup_minhash_lsh",
    # round-6 canaries: string-state BPE (replace semantics), integer
    # rank-sum AUC, quantized-estimate sums (effective diameter)
    "tokenizer_bpe_train_rounds",
    "link_pred_auc",
    "graph_effective_diameter",
    # session-2 canaries: recursive-CTE seasonal ring (Holt-Winters),
    # fixed-point ln calibration sums (Brier), list-carrying Markov
    # recursion, integer CDF-gap argmax (KS)
    "events_forecast_hw",
    "quality_brier_calibration",
    "events_markov_stationary",
    "events_ks_test",
]


@pytest.mark.driver_strict
def test_driver_strict_smoke():
    env = dict(os.environ, GRAPHEM_ARROW="0")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "oracle_check.py"), SF_DIR]
        + REPRESENTATIVE,
        capture_output=True,
        text=True,
        env=env,
        cwd=REPO,
        timeout=900,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-15:])
    assert proc.returncode == 0, f"oracle_check failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert ", 0 fail" in proc.stdout, f"strict gate not clean:\n{tail}"

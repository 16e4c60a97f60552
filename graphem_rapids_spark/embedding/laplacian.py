"""Spectral (Laplacian) initialization — reference E1
(``embedder_pytorch.py:337-379``): normalized Laplacian, k+1 smallest
eigenvectors, drop the trivial first; random-init fallback on failure.

Two strategies, auto-selected by size (mirroring the reference's own
backend-selection ethos, ``utils/backend_selection.py:178-196``):

- **driver**: collect the (small) edge list, dense ``numpy.linalg.eigh``
  of the normalized Laplacian, parallelize the n×k result back.
  Exact; for n ≤ DRIVER_EIG_MAX_VERTICES.
- **distributed**: orthogonal (block power) iteration on
  ``M = D^{-1/2} A D^{-1/2}`` — the top-(k+1) eigenvectors of M are the
  bottom-(k+1) of L = I − M, and the trivial one (``D^{1/2}·1``) is
  deflated analytically. Each iteration is one edges⋈positions join +
  one groupBy-sum (the Pregel aggregateMessages pattern), so the whole
  solve is shuffle-bounded and scales to billions of edges. The k×k
  re-orthonormalization Gram matrix is a single aggregate (k ≤ 4).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, functions as F

from graphem_rapids_spark.checkpoint import eager_checkpoint

from graphem_rapids_spark.graph.canon import symmetrize_edges


def laplacian_embedding(
    edges: DataFrame,
    n_vertices: int,
    n_components: int = 2,
    seed: int = 0,
    max_driver_n: int | None = None,
    power_iters: int = 30,
    assume_canonical: bool = False,
) -> DataFrame:
    """positions(id, pos: array<double>) from the spectral embedding.

    ``assume_canonical=True`` promises src<dst distinct edges (the
    embedder's contract for ``self.edges``), letting the driver path
    skip its O(nnz log nnz) dedupe sort — the collect is ordered on
    the cluster instead, so the summation order (hence every float)
    stays deterministic across core counts."""
    if max_driver_n is None:
        from graphem_rapids_spark.session import DRIVER_EIG_MAX_VERTICES

        max_driver_n = DRIVER_EIG_MAX_VERTICES
    if n_vertices <= max_driver_n:
        return _driver_eigh(
            edges, n_vertices, n_components, seed, assume_canonical
        )
    return _distributed_orthogonal_iteration(
        edges, n_vertices, n_components, seed, power_iters
    )


def _driver_eigh(
    edges: DataFrame, n: int, k: int, seed: int, assume_canonical: bool = False
) -> DataFrame:
    """Driver-side eigensolve — the reference's own strategy
    (``embedder_pytorch.py:337-379`` collects to the driver regardless
    of size). Pure numpy (scipy is not a dependency): dense ``eigh``
    for small n, otherwise orthogonal iteration on the shifted
    normalized adjacency ``M' = D^{-1/2} A D^{-1/2} + I`` (bincount
    matvec, analytic deflation of the trivial eigenvector, final
    Rayleigh–Ritz rotation) — top-k of M' = bottom nontrivial of L."""
    spark = edges.sparkSession
    try:
        sel = edges.select("src", "dst")
        if assume_canonical:
            # caller guarantees src<dst distinct: no dedupe needed. A
            # cluster-side total order replaces the driver-side
            # O(nnz log nnz) unique sort (measured 1.1 s of the 3.2 s
            # eigensolve at nnz=2.4M), keeping the mirror-sum order —
            # hence every float — deterministic across core counts.
            sel = sel.orderBy("src", "dst")
        try:
            # Arrow collect → numpy; combine_chunks first so the
            # conversion is one C-level concat instead of a per-chunk
            # flatten (255 collect batches at bench scale)
            tbl = sel.toArrow().combine_chunks()
            src = tbl.column("src").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            dst = tbl.column("dst").to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
        except Exception:
            pdf = sel.toPandas()
            src = pdf["src"].to_numpy(np.int64)
            dst = pdf["dst"].to_numpy(np.int64)
        rows = np.concatenate([src, dst])
        cols = np.concatenate([dst, src])
        if not assume_canonical:
            # dedupe multi-edges via pair codes (n ≤ 1e6 → no overflow)
            code = np.unique(rows * np.int64(n) + cols)
            rows, cols = code // n, code % n
        deg = np.bincount(rows, minlength=n).astype(np.float64)
        if n <= 2000:
            A = np.zeros((n, n))
            A[rows, cols] = 1.0
            with np.errstate(divide="ignore"):
                dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-300)), 0.0)
            L = -A * dinv[:, None] * dinv[None, :]
            np.fill_diagonal(L, np.where(deg > 0, 1.0, 0.0))
            vals, vecs = np.linalg.eigh(L)
            emb = vecs[:, np.argsort(vals)[1 : k + 1]]
        else:
            emb = _numpy_orthogonal_iteration(rows, cols, deg, n, k, seed)
        if emb.shape[1] < k:  # degenerate tiny graphs: pad with zeros
            emb = np.hstack([emb, np.zeros((n, k - emb.shape[1]))])
        # sign canonicalization so the embedding is deterministic
        # (eig sign is arbitrary; layout is reflection-invariant anyway)
        signs = np.sign(emb[np.abs(emb).argmax(axis=0), np.arange(emb.shape[1])])
        signs[signs == 0] = 1.0
        emb = emb * signs
    except Exception:
        # reference fallback: 0.1 * randn (embedder_pytorch.py:366-369)
        rng = np.random.default_rng(seed)
        emb = rng.standard_normal((n, k)) * 0.1
    import pandas as pd

    # Plain Python ints/floats (not numpy scalars/arrays): the row-wise
    # createDataFrame verifier (taken when Arrow conversion is disabled)
    # rejects numpy.float64 inside array<double>. ``.tolist()`` converts
    # both the container and every element, so the same frame works with
    # Arrow on AND off.
    out = pd.DataFrame(
        {"id": list(range(n)), "pos": emb.tolist()}, dtype=object
    )
    return spark.createDataFrame(out, "id long, pos array<double>")


def _numpy_orthogonal_iteration(
    rows: np.ndarray,
    cols: np.ndarray,
    deg: np.ndarray,
    n: int,
    k: int,
    seed: int,
    iters: int = 24,
) -> np.ndarray:
    """Top-k nontrivial eigenvectors of M = D^{-1/2} A D^{-1/2} via
    block power iteration on M + I (spectrum [0,2] — keeps the
    negative end of M from winning, which ``which='SM'`` semantics
    require). One bincount per component per iteration.

    ``iters=24`` is a deliberate cap: real graphs have tiny eigengaps
    here, so exact convergence is unreachable by power iteration
    anyway, and the force layout only needs a good low-frequency
    subspace as its starting point (the reference itself falls back to
    *random* init when eigsh fails, ``embedder_pytorch.py:366-369``)."""
    with np.errstate(divide="ignore"):
        dinv = np.where(deg > 0, 1.0 / np.sqrt(np.maximum(deg, 1e-300)), 0.0)
    w = dinv[rows] * dinv[cols]
    two_m = deg.sum()
    v0 = np.sqrt(deg / max(two_m, 1.0))  # trivial eigenvector of M

    from concurrent.futures import ThreadPoolExecutor

    _bufs = [np.empty(rows.shape[0]) for _ in range(k)]
    _pool = ThreadPoolExecutor(max_workers=max(k, 1))

    def _col(args) -> None:
        # per-column gather+multiply into a preallocated buffer: the
        # broadcast form (w[:,None] * X[rows,:]) materializes an
        # (nnz, k) temporary per call — measured 147 -> 34 ms/matvec
        # at nnz=2.4M. Columns are independent, so running them on a
        # small thread pool (numpy's multiply/bincount release the GIL
        # for most of their work) is bit-identical per column.
        d, X, Y = args
        np.multiply(w, X[rows, d], out=_bufs[d])
        Y[:, d] = np.bincount(cols, weights=_bufs[d], minlength=n)

    def matvec(X: np.ndarray) -> np.ndarray:
        Y = np.empty_like(X)
        list(_pool.map(_col, [(d, X, Y) for d in range(X.shape[1])]))
        Y += X  # shift by +I
        return Y

    rng = np.random.default_rng(seed)
    X = rng.standard_normal((n, k))
    X -= v0[:, None] * (v0 @ X)
    X, _ = np.linalg.qr(X)
    prev_ritz = None
    for it in range(iters):
        Y = matvec(X)
        Y -= v0[:, None] * (v0 @ Y)  # deflate the trivial direction
        Q, R = np.linalg.qr(Y)
        sgn = np.sign(np.diag(R))
        sgn[sgn == 0] = 1.0
        X = Q * sgn
        # convergence check every 6 rounds, free of extra matvecs:
        # |diag(R)| → the eigenvalues as orthogonal iteration converges
        # (layout init needs a good subspace, not 1e-12 eigsh)
        if (it + 1) % 6 == 0:
            ritz = np.sort(np.abs(np.diag(R)))
            if prev_ritz is not None and np.max(np.abs(ritz - prev_ritz)) < 1e-5:
                break
            prev_ritz = ritz
    # Rayleigh–Ritz: rotate to eigenvector approximations, order by
    # eigenvalue of M' descending = eigenvalue of L ascending
    T = X.T @ matvec(X)
    _pool.shutdown(wait=False)
    tvals, tvecs = np.linalg.eigh((T + T.T) / 2.0)
    return X @ tvecs[:, np.argsort(-tvals)]


def _matvec_normalized_adjacency(sym_edges: DataFrame, deg: DataFrame, X: DataFrame, k: int) -> DataFrame:
    """Y = M·X with M = D^{-1/2} A D^{-1/2}; X is positions(id,pos).

    One join to gather neighbor values, one hash-agg to scatter-sum —
    per-component sums (k small) keep everything in whole-stage codegen.
    """
    xs = X.join(deg, "id").select(
        F.col("id"),
        F.transform("pos", lambda v: v * F.col("dinv")).alias("scaled"),
    )
    msgs = sym_edges.join(xs.withColumnRenamed("id", "src"), "src").select(
        F.col("dst").alias("id"), "scaled"
    )
    agg = msgs.groupBy("id").agg(
        *[F.sum(F.col("scaled").getItem(d)).alias(f"s{d}") for d in range(k)]
    )
    return (
        agg.join(deg, "id")
        .select(
            "id",
            F.array(*[F.col(f"s{d}") * F.col("dinv") for d in range(k)]).alias("pos"),
        )
    )


def _distributed_orthogonal_iteration(
    edges: DataFrame, n: int, n_components: int, seed: int, iters: int
) -> DataFrame:
    """Block power iteration with analytic deflation of the trivial
    eigenvector v0 ∝ D^{1/2}·1 of M = D^{-1/2} A D^{-1/2}."""
    spark = edges.sparkSession
    k = n_components
    sym = symmetrize_edges(edges)
    deg = (
        sym.groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("degree"))
        .select(
            "id",
            F.col("degree").cast("double").alias("degree"),
            (1.0 / F.sqrt(F.col("degree").cast("double"))).alias("dinv"),
        )
    )
    deg.persist()
    sym.persist()
    two_m = deg.agg(F.sum("degree")).first()[0] or 1.0

    # deterministic hash-random init
    X = spark.range(n).select(
        F.col("id").cast("long"),
        F.array(
            *[
                (
                    F.pmod(F.xxhash64("id", F.lit(seed * 100 + d)), F.lit(1 << 30)).cast("double")
                    / F.lit(float(1 << 29))
                    - 1.0
                )
                for d in range(k)
            ]
        ).alias("pos"),
    )
    # isolated vertices (deg null) contribute nothing; keep them at 0
    X = X.join(deg.select("id"), "id", "left_semi").persist()

    for it in range(iters):
        Y = _matvec_normalized_adjacency(sym, deg, X, k)
        # materialize each iteration: the two scalar aggregates below
        # would otherwise replay the whole lineage chain per action
        Y = Y.transform(eager_checkpoint)
        # deflate v0: y_d -= (v0·y_d) v0, v0_i = sqrt(d_i / 2m)
        yd = Y.join(deg, "id")
        dots = yd.agg(
            *[
                F.sum(F.sqrt(F.col("degree") / two_m) * F.col("pos").getItem(d)).alias(f"c{d}")
                for d in range(k)
            ]
        ).first()
        Y = (
            Y.join(deg, "id")
            .select(
                "id",
                F.array(
                    *[
                        F.col("pos").getItem(d)
                        - F.lit(float(dots[f"c{d}"])) * F.sqrt(F.col("degree") / two_m)
                        for d in range(k)
                    ]
                ).alias("pos"),
            )
        )
        # Gram matrix G = Y^T Y (k×k) in one aggregate, then driver-side
        # inverse Cholesky → Y := Y·R^{-1} (tall-skinny QR)
        gram_row = Y.agg(
            *[
                F.sum(F.col("pos").getItem(a) * F.col("pos").getItem(b)).alias(f"g{a}_{b}")
                for a in range(k)
                for b in range(a, k)
            ]
        ).first()
        G = np.zeros((k, k))
        for a in range(k):
            for b in range(a, k):
                G[a, b] = G[b, a] = float(gram_row[f"g{a}_{b}"])
        try:
            R = np.linalg.cholesky(G + 1e-12 * np.eye(k)).T
            Rinv = np.linalg.inv(R)
        except np.linalg.LinAlgError:
            Rinv = np.eye(k)
        newX = Y.select(
            "id",
            F.array(
                *[
                    sum(
                        (F.col("pos").getItem(a) * float(Rinv[a, d]) for a in range(k)),
                        F.lit(0.0),
                    )
                    for d in range(k)
                ]
            ).alias("pos"),
        )
        # newX is a cheap projection over the checkpointed Y; the next
        # iteration's checkpoint (or the caller's first action)
        # materializes it without lineage growth
        X = newX

    deg.unpersist()
    sym.unpersist()
    # parity with the driver path: isolated vertices (left-semi-dropped
    # before the matvecs — they contribute nothing) re-enter at the
    # origin, so the output always has exactly n rows
    full = spark.range(n).select(F.col("id").cast("long"))
    zero = F.array(*[F.lit(0.0) for _ in range(k)])
    return full.join(X, "id", "left").select(
        "id", F.coalesce("pos", zero).alias("pos")
    )

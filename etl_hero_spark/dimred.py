"""Dimensionality reduction over embedding columns: distributed PCA and
seeded random projection (extension mandate — the embedding-side
transforms between a 100 TB vector corpus and anything that has to fit
it: ANN indexes want fewer dims, dedup wants decorrelated ones; no
counterpart in the reference).

PCA at scale is ONE pass of bounded partial statistics: each Arrow
batch contributes (n, Σx, ΣxxT) — dim + dim² doubles regardless of row
count — the partials fold on the driver, and numpy eigendecomposes the
(dim × dim) covariance there. dim=64 → a 4 KB partial per batch; the
corpus never moves. The apply side re-enters the plan as UNROLLED
literal arithmetic (simsearch._dot_const_sql — whole-stage codegen, no
interpreted HOF, one py4j round trip), the same discipline as the ANN
encoders.

Random projection is the fit-free rung: a seeded ±1/√d Achlioptas
matrix (JL lemma — pairwise distances survive within ε with high
probability) generated deterministically on the driver, applied the
same unrolled way. No corpus statistics at all, so it composes with
streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vector_moment_partials(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[int, "object", "object"]:
    """RAW moment sums (n, Σx, ΣxxT) — the mergeable form: partials
    from disjoint shards/days ADD componentwise (Σ is Σ), so a PCA
    model refreshes from yesterday's saved partials + today's delta
    without rescanning history — the profile_stats_incremental
    contract applied to vectors. merge == full-rebuild pinned in
    tests/test_dimred.py."""
    n, mean, exx = vector_moments(df, vec_col, dim)
    return n, mean * n, exx * n


def merge_vector_moments(
    a: tuple, b: tuple
) -> tuple[int, "object", "object"]:
    """Fold two raw-partial triples (componentwise adds)."""
    return a[0] + b[0], a[1] + b[1], a[2] + b[2]


def pca_fit_from_partials(partials: tuple, k: int) -> dict:
    """pca_fit's eigen step over pre-accumulated raw partials — the
    incremental-refresh entry point (no corpus scan at all)."""
    n, s, g = partials
    if n == 0:
        raise ValueError("pca_fit: no valid vectors")
    mean = s / n
    exx = g / n
    return _eig_decompose(n, mean, exx, k)


def vector_moments(
    df: DataFrame, vec_col: str, dim: int
) -> tuple[int, "object", "object"]:
    """(n, mean vector, E[x xT] matrix) from one mapInPandas pass of
    per-batch partials — the sanctioned Arrow crossing: per batch one
    row of (count, Σx, flattened ΣxxT); a handful of partial rows fold
    driver-side with numpy. Rows with NULL or wrong-length vectors are
    skipped (and counted out)."""
    import numpy as np

    schema = "n long, s array<double>, g array<double>"

    def partials(batches):
        import numpy as _np
        import pandas as _pd

        for pdf in batches:
            vecs = [
                _np.asarray(v, dtype=_np.float64)
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            x = _np.vstack(vecs)
            yield _pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    rows = df.select(vec_col).mapInPandas(partials, schema).collect()
    n = sum(r["n"] for r in rows)
    if n == 0:
        return 0, np.zeros(dim), np.zeros((dim, dim))
    # fold in a deterministic order — collect order follows task
    # completion, and float addition isn't associative
    rows = sorted(rows, key=lambda r: (r["n"], r["s"][0]))
    s = np.zeros(dim)
    g = np.zeros((dim, dim))
    for r in rows:
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(dim, dim)
    return n, s / n, g / n


def pca_fit(
    df: DataFrame, vec_col: str, dim: int, k: int
) -> dict:
    """Fit top-k principal components. Returns {mean, components (k×dim,
    rows are unit eigenvectors, deterministic sign: largest-|coord|
    entry made positive), explained_variance, explained_variance_ratio,
    n}. Covariance = E[xxT] − mean·meanT from the one-pass moments;
    numpy eigh on the dim×dim matrix driver-side (dim is bounded — the
    corpus dimension, not the corpus)."""
    n, mean, exx = vector_moments(df, vec_col, dim)
    if n == 0:
        raise ValueError("pca_fit: no valid vectors")
    return _eig_decompose(n, mean, exx, k)


def _eig_decompose(n: int, mean, exx, k: int) -> dict:
    import numpy as np

    cov = exx - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:k]
    comps = v[:, order].T
    for i in range(comps.shape[0]):  # sign convention
        j = int(np.abs(comps[i]).argmax())
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    ev = w[order]
    total = float(w.sum())
    return {
        "mean": mean,
        "components": comps,
        "explained_variance": ev,
        "explained_variance_ratio": ev / total if total > 0 else ev * 0,
        "n": n,
    }


def pca_transform(
    df: DataFrame,
    vec_col: str,
    model: dict,
    out_col: str = "pc",
) -> DataFrame:
    """Project onto the fitted components: pc_i = (x − mean)·comp_i =
    x·comp_i − mean·comp_i — the mean term folds to a literal, so the
    apply is k unrolled dot products against the RAW vector attribute
    (codegen; see _dot_const_sql's CollapseProject constraint)."""
    from etl_hero_spark.simsearch import _dot_const_sql

    comps = model["components"]
    mean = model["mean"]
    terms = []
    for i in range(comps.shape[0]):
        c = comps[i]
        off = float(mean @ c)
        terms.append(
            f"(({_dot_const_sql(vec_col, c.tolist(), None)})"
            f" - cast({off!r} as double))"
        )
    return df.withColumn(
        out_col, F.expr("array(" + ", ".join(terms) + ")")
    )


def random_projection_matrix(
    dim: int, out_dim: int, seed: int = 7
) -> "object":
    """Achlioptas ±1/√out_dim matrix from a SEEDED numpy RandomState —
    deterministic across runs/partitions/engines by construction (the
    matrix is driver-generated, never sampled from data)."""
    import numpy as np

    rng = np.random.RandomState(seed)
    signs = rng.randint(0, 2, size=(out_dim, dim)) * 2 - 1
    return signs / np.sqrt(out_dim)


def random_project(
    df: DataFrame,
    vec_col: str,
    dim: int,
    out_dim: int,
    seed: int = 7,
    out_col: str = "proj",
) -> DataFrame:
    """JL random projection dim → out_dim: fit-free, seeded, applied as
    out_dim unrolled dot products (codegen). Distance preservation
    within the JL bound pinned statistically in tests/test_dimred.py."""
    from etl_hero_spark.simsearch import _dot_const_sql

    r = random_projection_matrix(dim, out_dim, seed)
    terms = [
        f"({_dot_const_sql(vec_col, r[i].tolist(), None)})"
        for i in range(out_dim)
    ]
    return df.withColumn(
        out_col, F.expr("array(" + ", ".join(terms) + ")")
    )

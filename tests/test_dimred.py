"""Distributed PCA / random projection / OLS pinned against numpy and
DuckDB regr_* aggregates."""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_hero_spark.dimred import (
    pca_fit,
    pca_transform,
    random_project,
    random_projection_matrix,
    vector_moments,
)
from etl_hero_spark.features import linreg_apply, linreg_fit


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def emb_np(emb):
    rows = emb.orderBy("vec_id").collect()
    return np.array([list(r["embedding"]) for r in rows], dtype=np.float64)


def test_vector_moments_match_numpy(emb, emb_np):
    n, mean, exx = vector_moments(emb, "embedding", 64)
    assert n == len(emb_np)
    assert np.allclose(mean, emb_np.mean(axis=0), atol=1e-9)
    assert np.allclose(exx, emb_np.T @ emb_np / n, atol=1e-9)


def test_pca_matches_numpy_eigh(emb, emb_np):
    m = pca_fit(emb, "embedding", 64, 4)
    xc = emb_np - emb_np.mean(axis=0)
    w, v = np.linalg.eigh(xc.T @ xc / len(emb_np))
    order = np.argsort(w)[::-1][:4]
    assert np.allclose(
        m["explained_variance"], w[order], atol=1e-8
    )
    assert np.allclose(
        m["explained_variance_ratio"], w[order] / w.sum(), atol=1e-8
    )
    # components equal up to sign; the convention fixes the sign
    for i, j in enumerate(order):
        c = v[:, j]
        if c[np.abs(c).argmax()] < 0:
            c = -c
        assert np.allclose(m["components"][i], c, atol=1e-7)


def test_pca_transform_is_the_projection(spark, emb, emb_np):
    m = pca_fit(emb, "embedding", 64, 3)
    got = {
        r["vec_id"]: np.array(r["pc"])
        for r in pca_transform(emb, "embedding", m).select(
            "vec_id", "pc"
        ).collect()
    }
    ids = [r["vec_id"] for r in emb.orderBy("vec_id").collect()]
    for k, i in zip(ids[:20], range(20)):
        want = m["components"] @ (emb_np[i] - m["mean"])
        assert np.allclose(got[k], want, atol=1e-8)
    # projected variance per component == the eigenvalue it claims
    pcs = np.vstack([got[k] for k in ids])
    assert np.allclose(
        pcs.var(axis=0, ddof=0), m["explained_variance"], rtol=1e-6
    )


def test_pca_fit_empty_raises(spark):
    df = spark.createDataFrame([], "embedding array<float>")
    with pytest.raises(ValueError, match="no valid vectors"):
        pca_fit(df, "embedding", 64, 2)


def test_random_projection_deterministic_and_jl(emb):
    r1 = random_projection_matrix(64, 32, seed=7)
    r2 = random_projection_matrix(64, 32, seed=7)
    assert np.array_equal(r1, r2)
    assert set(np.unique(np.abs(r1 * np.sqrt(32)))) == {1.0}
    rows = (
        random_project(emb, "embedding", 64, 32, seed=7)
        .orderBy("vec_id")
        .limit(30)
        .collect()
    )
    x = np.array([list(r["embedding"]) for r in rows])
    p = np.array([list(r["proj"]) for r in rows])
    # spark-side projection == numpy matmul with the same seeded matrix
    assert np.allclose(p, x @ r1.T, atol=1e-6)
    # JL: pairwise distance ratios concentrate around 1
    ratios = []
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d0 = np.linalg.norm(x[i] - x[j])
            if d0 > 0:
                ratios.append(np.linalg.norm(p[i] - p[j]) / d0)
    assert 0.85 < np.mean(ratios) < 1.15
    assert np.std(ratios) < 0.25


def test_linreg_matches_numpy_lstsq(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    m = linreg_fit(li, ["l_quantity", "l_discount"], "l_extendedprice")
    pdf = li.select(
        "l_quantity", "l_discount", "l_extendedprice"
    ).toPandas()
    a = np.column_stack(
        [pdf["l_quantity"], pdf["l_discount"], np.ones(len(pdf))]
    )
    beta, *_ = np.linalg.lstsq(a, pdf["l_extendedprice"], rcond=None)
    assert m["coef"]["l_quantity"] == pytest.approx(beta[0], rel=1e-9)
    assert m["coef"]["l_discount"] == pytest.approx(beta[1], rel=1e-9)
    assert m["intercept"] == pytest.approx(beta[2], rel=1e-9)
    resid = a @ beta - pdf["l_extendedprice"]
    sst = ((pdf["l_extendedprice"] - pdf["l_extendedprice"].mean()) ** 2).sum()
    assert m["r2"] == pytest.approx(1 - (resid**2).sum() / sst, abs=1e-9)


def test_linreg_simple_matches_duckdb_regr(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    m = linreg_fit(li, ["l_quantity"], "l_extendedprice")
    slope, icept, r2 = duckdb.sql(
        f"""
        SELECT regr_slope(l_extendedprice, l_quantity),
               regr_intercept(l_extendedprice, l_quantity),
               regr_r2(l_extendedprice, l_quantity)
        FROM read_parquet('{sf_dir}/lineitem.parquet')
        """
    ).fetchone()
    assert m["coef"]["l_quantity"] == pytest.approx(slope, rel=1e-9)
    assert m["intercept"] == pytest.approx(icept, rel=1e-9)
    assert m["r2"] == pytest.approx(r2, abs=1e-9)


def test_linreg_apply_and_perfect_fit(spark):
    df = spark.createDataFrame(
        [(float(i), float(2 * i + 3)) for i in range(50)],
        "x double, y double",
    )
    m = linreg_fit(df, ["x"], "y")
    assert m["coef"]["x"] == pytest.approx(2.0, abs=1e-9)
    assert m["intercept"] == pytest.approx(3.0, abs=1e-9)
    assert m["r2"] == pytest.approx(1.0, abs=1e-9)
    preds = linreg_apply(df, m).select("y", "prediction").collect()
    for r in preds:
        assert r["prediction"] == pytest.approx(r["y"], abs=1e-8)


def test_pca_incremental_merge_equals_full_rebuild(spark, emb):
    """Raw moment partials from disjoint halves merged == one-shot fit:
    the incremental-refresh contract (no history rescan) for PCA."""
    from etl_hero_spark.dimred import (
        merge_vector_moments,
        pca_fit,
        pca_fit_from_partials,
        vector_moment_partials,
    )

    lo = emb.filter(F.col("vec_id") % 2 == 0)
    hi = emb.filter(F.col("vec_id") % 2 == 1)
    merged = merge_vector_moments(
        vector_moment_partials(lo, "embedding", 64),
        vector_moment_partials(hi, "embedding", 64),
    )
    inc = pca_fit_from_partials(merged, 4)
    full = pca_fit(emb, "embedding", 64, 4)
    assert inc["n"] == full["n"]
    assert np.allclose(
        inc["explained_variance"], full["explained_variance"], atol=1e-9
    )
    assert np.allclose(inc["mean"], full["mean"], atol=1e-12)
    assert np.allclose(
        inc["components"], full["components"], atol=1e-7
    )

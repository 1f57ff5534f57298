"""The numpy fast-path ANN must agree with the exact-fold oracle twin."""

from __future__ import annotations

import math

from beam_pyspark_runner_spark.queries import REGISTRY

from tests.conftest import SF_CORRECT, SF_SMOKE


def test_vectorized_matches_exact_cosine_topk(spark):
    exact = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in REGISTRY["cosine_topk"].fn(spark, SF_CORRECT).collect()
    }
    fast = {
        (r["query_id"], r["neighbor_id"]): r["cosine"]
        for r in REGISTRY["cosine_topk_vectorized"].fn(spark, SF_CORRECT).collect()
    }
    # Scores agree to float-reduction tolerance on the common pairs...
    common = set(exact) & set(fast)
    for k in common:
        assert math.isclose(exact[k], fast[k], rel_tol=0, abs_tol=1e-9), k
    # ...and membership differs only where ulp ties could flip ranks.
    per_query_overlap = {}
    for q, _ in exact:
        e_n = {n for (qq, n) in exact if qq == q}
        f_n = {n for (qq, n) in fast if qq == q}
        per_query_overlap[q] = len(e_n & f_n) / len(e_n)
    assert all(v >= 0.9 for v in per_query_overlap.values()), per_query_overlap


def test_pca_power_iteration_is_near_eigenpair(spark):
    """pca_power_iteration returns a genuine near-eigenpair of the SAME
    covariance matrix numpy sees (built from the registered covariance
    query, so only the iteration is under test): unit norm, Rayleigh
    quotient inside the top of the spectrum (never above lambda_max —
    that inequality is exact math), and a small relative residual
    ||Av - lambda v||/lambda_max. NOTE the fixture embeddings are
    ISOTROPIC, so the top of the spectrum is a Marchenko-Pastur bulk
    (top 4 eigenvalues within ~10%): no 8-step iteration isolates ONE
    direction there, and the cross-engine ORACLE match is what
    certifies the arithmetic — this test certifies eigenpair-ness.
    Measured residuals: 0.068 (sf0.001) / 0.064 (sf0.01); bound 0.15
    catches a wrong matrix-vector product or normalization, which
    produces O(1) residuals."""
    import numpy as np

    from beam_pyspark_runner_spark.queries import REGISTRY
    from beam_pyspark_runner_spark.queries.similarity import EMB_DIM

    cov_rows = REGISTRY["embedding_covariance_matrix"].fn(
        spark, SF_SMOKE
    ).collect()
    A = np.zeros((EMB_DIM, EMB_DIM))
    for r in cov_rows:
        A[r.i, r.j] = r.cov
        A[r.j, r.i] = r.cov
    evals = np.linalg.eigvalsh(A)

    got = REGISTRY["pca_power_iteration"].fn(spark, SF_SMOKE).collect()
    assert len(got) == EMB_DIM
    lam = got[0].eigenvalue
    v = np.zeros(EMB_DIM)
    for r in got:
        v[r.i] = r.loading
    assert abs(np.linalg.norm(v) - 1.0) < 1e-6
    assert lam <= evals[-1] + 1e-9  # Rayleigh quotient upper bound
    assert lam >= evals[-5]  # converged into the top bulk
    resid = np.linalg.norm(A @ v - lam * v) / abs(evals[-1])
    assert resid < 0.15, resid

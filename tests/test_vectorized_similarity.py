"""The numpy fast-path ANN must agree with the exact-fold oracle twin."""

from __future__ import annotations

import math

from beam_pyspark_runner_spark.queries import REGISTRY

from tests.conftest import SF_CORRECT


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

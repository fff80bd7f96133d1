"""ANN operators: brute-force exactness vs numpy oracle; LSH recall sanity."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.RandomState(7)
    vecs = rng.randn(200, 16).astype("float32")
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(len(vecs))]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), vecs


def test_bruteforce_topk_matches_numpy(spark, vectors):
    from refined_spark.operators.ann import cosine_topk_bruteforce

    df, vecs = vectors
    queries = df.where("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    got = cosine_topk_bruteforce(df, queries, k=5).collect()
    norms = np.linalg.norm(vecs, axis=1)
    sims = (vecs @ vecs.T) / np.outer(norms, norms)
    for q in range(3):
        expect = np.argsort(np.round(-sims[q], 6), kind="stable")[:5]
        mine = [r.vec_id for r in sorted(
            (r for r in got if r.query_id == q), key=lambda r: r.rank)]
        # rank 1 must be the query itself (cos=1)
        assert mine[0] == q
        assert set(mine) == set(int(i) for i in expect)


def test_lsh_topk_subset_of_bucket(spark, vectors):
    from refined_spark.operators.ann import cosine_topk_lsh

    df, _ = vectors
    queries = df.where("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    got = cosine_topk_lsh(df, queries, dim=16, k=5, bits=4)
    rows = got.collect()
    # query always lands in its own bucket with cos 1.0 at rank 1
    for q in range(3):
        mine = sorted((r for r in rows if r.query_id == q), key=lambda r: r.rank)
        assert mine[0].vec_id == q and mine[0].cos == 1.0


def test_embedding_near_dups(spark):
    from refined_spark.operators.ann import embedding_near_dups

    base = [1.0] + [0.0] * 15
    near = [0.999] + [0.01] + [0.0] * 14
    far = [0.0] * 15 + [1.0]
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "vec_id long, embedding array<float>"
    )
    got = embedding_near_dups(df, dim=16, threshold=0.95, bits=2).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(1, 2)}

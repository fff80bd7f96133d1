"""Connected components: large-star/small-star vs known graphs (cc_goldens)."""

import pyspark.sql.functions as F

from refined_spark.operators.clustering import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r.component, set()).add(r.node)
    return sorted(sorted(v) for v in comp.values())


def test_chain(spark):
    assert _components(spark, [(1, 2), (2, 3), (3, 4), (4, 5)]) == [[1, 2, 3, 4, 5]]


def test_star(spark):
    assert _components(spark, [(10, i) for i in range(1, 8)]) == [[1, 2, 3, 4, 5, 6, 7, 10]]


def test_two_components(spark):
    assert _components(spark, [(1, 2), (2, 3), (10, 11)]) == [[1, 2, 3], [10, 11]]


def test_self_loop_and_dups(spark):
    assert _components(spark, [(1, 1), (1, 2), (2, 1), (1, 2)]) == [[1, 2]]


def test_long_path_log_rounds(spark):
    # a 64-node path converges within the round budget
    edges = [(i, i + 1) for i in range(64)]
    assert _components(spark, edges) == [list(range(65))]


def test_component_label_is_min_id(spark):
    df = spark.createDataFrame([(5, 9), (9, 3)], "src long, dst long")
    rows = connected_components(df).collect()
    assert {r.component for r in rows} == {3}

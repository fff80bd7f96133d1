"""Connected components: large-star/small-star vs known graphs (cc_goldens)."""

import pyspark.sql.functions as F

from refined_spark.operators.clustering import connected_components


def _components(spark, edges, check_every=2):
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, check_every=check_every).collect()
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


def test_multi_parent_round_output_not_accepted_as_converged(spark):
    """Regression: path 1-10-3-20-2 is ONE component, but after one
    large+small round the edge set is {(3,1),(3,2),(10,1),(20,2)} — node 3
    has TWO parents. That state passes the naive 'no node is both child and
    parent' test, and stopping there splits {2,20} from {1,3,10}. The
    convergence test must also require one parent per child.
    check_every=1 checks after EVERY round — the premature-stop shape the
    forest test must reject (the batched default would mask a broken test
    by happening to check only at even rounds)."""
    assert _components(
        spark, [(10, 1), (10, 3), (20, 3), (20, 2)], check_every=1
    ) == [[1, 2, 3, 10, 20]]


def test_bridge_between_two_stars(spark):
    # two hub stars joined by a bridge node — another multi-parent shape
    edges = [(100, i) for i in range(1, 5)] + [(200, i) for i in range(5, 9)]
    edges += [(100, 50), (200, 50)]
    assert _components(spark, edges) == [[1, 2, 3, 4, 5, 6, 7, 8, 50, 100, 200]]


def test_check_every_batching_is_invariant(spark):
    # batching rounds between convergence checks must never change the
    # result (a converged forest is a fixpoint, so overshooting is a no-op)
    edges = [(i, i + 1) for i in range(20)] + [(100, i) for i in range(30, 35)]
    expected = _components(spark, edges, check_every=1)
    assert _components(spark, edges, check_every=3) == expected


def test_proven_rounds_star_matches_tested_loop(spark):
    """proven_rounds=1 on bipartite stars (the cluster_assignments shape)
    returns exactly what the convergence-tested loop returns — the skipped
    forest test was a theorem check. Mixed component sizes, including a
    singleton edge and a large hub, exercise both star roles."""
    edges = [(100, i) for i in range(1, 9)] + [(200, 150)] + [(300, i) for i in (50, 60)]
    df = spark.createDataFrame(edges, "src long, dst long")
    tested = {(r.node, r.component)
              for r in connected_components(df, check_every=1).collect()}
    proven = {(r.node, r.component)
              for r in connected_components(df, proven_rounds=1).collect()}
    assert proven == tested


def test_proven_rounds_contract_is_caller_owned(spark):
    """The flip side of the contract: proven_rounds too small for the shape
    returns a NON-forest silently (here: a path needs >1 round). This
    documents why proven_rounds must only be passed for internally
    constructed shapes — the tested loop is the default for a reason."""
    edges = [(i, i + 1) for i in range(8)]
    df = spark.createDataFrame(edges, "src long, dst long")
    rows = connected_components(df, proven_rounds=1).collect()
    comp = {}
    for r in rows:
        comp.setdefault(r.component, set()).add(r.node)
    # one true component, but the premature stop leaves it split
    assert len(comp) > 1


def test_component_label_is_min_id(spark):
    df = spark.createDataFrame([(5, 9), (9, 3)], "src long, dst long")
    rows = connected_components(df).collect()
    assert {r.component for r in rows} == {3}


def test_cluster_assignments_sharded_matches_global(spark):
    """The concurrent per-shard CC driver is result-identical to one global
    CC over the union, when the edge space is shard-disjoint by
    construction (ids suffixed per shard — the bench amplification shape
    and the per-tenant/per-snapshot 100 TB shape)."""
    from pyspark.sql import functions as F

    from refined_spark.operators.clustering import (
        cluster_assignments,
        cluster_assignments_sharded,
    )

    base = [
        ("m1", "Q1"), ("m2", "Q1"), ("m3", "Q2"), ("m4", None), ("m5", "Q2"),
    ]
    rows = [
        (f"{m}#{s}", f"{q}#{s}" if q else None, s)
        for s in range(4)
        for m, q in base
    ]
    resolved = spark.createDataFrame(
        rows, "mention_id string, qcode string, shard int"
    )
    got = {
        r.mention_id: r.cluster_id
        for r in cluster_assignments_sharded(
            resolved, shard_col="shard", max_parallel=4
        ).collect()
    }
    want = {
        r.mention_id: r.cluster_id
        for r in cluster_assignments(resolved.drop("shard")).collect()
    }
    assert got == want
    # same-entity mentions co-cluster within a shard, never across shards
    assert got["m1#0"] == got["m2#0"]
    assert got["m1#0"] != got["m1#1"]
    # explicit shard list (the no-distinct-job path) gives the same answer
    got2 = {
        r.mention_id: r.cluster_id
        for r in cluster_assignments_sharded(
            resolved, shard_col="shard", shards=[0, 1, 2, 3]
        ).collect()
    }
    assert got2 == got

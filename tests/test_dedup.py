"""Dedup operators: exact, MinHash-LSH end-to-end, SimHash, n-gram Jaccard."""

import pyspark.sql.functions as F
import pytest


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


BASE = "the quick brown fox jumps over the lazy dog again and again today"
NEAR = "the quick brown fox jumps over the lazy dog again and again tonight"
OTHER = "completely different content about spark shuffles and parquet files"


def test_exact_duplicates(spark):
    from refined_spark.operators.dedup import exact_duplicates

    d = _docs(spark, [("a", BASE), ("b", "  THE quick   brown fox jumps over the lazy dog again and again today "),
                      ("c", OTHER), ("d", BASE)])
    groups = exact_duplicates(d).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_dups == 3 and g.keeper == "a" and g.doc_ids == ["a", "b", "d"]


def test_minhash_lsh_finds_near_dups(spark):
    from refined_spark.operators.dedup import (
        jaccard_verify,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = _docs(spark, [("a", BASE), ("b", NEAR), ("c", OTHER)])
    sigs = minhash_signatures(d, k=5, num_hashes=32)
    pairs = lsh_candidate_pairs(sigs, bands=8)
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert ("a", "b") in got
    verified = jaccard_verify(pairs, d, k=5, threshold=0.6).collect()
    assert {(r.doc_a, r.doc_b) for r in verified} == {("a", "b")}
    assert all(0.6 <= r.jaccard <= 1.0 for r in verified)


def test_minhash_signature_is_deterministic(spark):
    from refined_spark.operators.dedup import minhash_signatures

    d = _docs(spark, [("a", BASE)])
    s1 = minhash_signatures(d, num_hashes=8).collect()[0].sig
    s2 = minhash_signatures(d, num_hashes=8).collect()[0].sig
    assert s1 == s2 and len(s1) == 8


def test_near_dup_clusters(spark):
    from refined_spark.operators.dedup import near_dup_clusters

    d = _docs(
        spark,
        [("a", BASE), ("b", NEAR), ("c", OTHER),
         ("d", BASE + " extra"), ("e", "unrelated text about nothing at all here")],
    )
    cl = near_dup_clusters(d, threshold=0.6).collect()
    by_cluster = {}
    for r in cl:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    clusters = sorted(sorted(v) for v in by_cluster.values())
    assert ["a", "b", "d"] in clusters
    flat = {x for v in by_cluster.values() for x in v}
    assert "c" not in flat and "e" not in flat


def test_simhash_identical_docs_bucket(spark):
    from refined_spark.operators.dedup import simhash_near_dups

    d = _docs(spark, [("a", BASE), ("b", BASE), ("c", OTHER)])
    groups = simhash_near_dups(d).collect()
    assert len(groups) == 1 and groups[0].doc_ids == ["a", "b"]


def test_simhash_matches_python_kernel(spark):
    """The JVM single-pass plan is bit-exact with the pure-Python reference
    kernel at BOTH widths (16-bit low-bits subset and the full signed
    64-bit value, including the bit-63 sign handling)."""
    from refined_spark.functions.hashing import simhash64_py
    from refined_spark.operators.dedup import simhash_col

    rows = [("a", BASE), ("b", NEAR), ("c", OTHER),
            ("d", "Zz " * 40 + "qq")]  # repeated tokens: vote magnitudes > 1
    d = _docs(spark, rows)
    got = {
        r.doc_id: (r.h16, r.h64)
        for r in d.select(
            "doc_id",
            simhash_col(F.col("text"), num_bits=16).alias("h16"),
            simhash_col(F.col("text"), num_bits=64).alias("h64"),
        ).collect()
    }
    for doc_id, text in rows:
        toks = " ".join(text.lower().split()).split(" ")
        full = simhash64_py(toks)
        assert got[doc_id][1] == full
        assert got[doc_id][0] == full & ((1 << 16) - 1)


def test_simhash_64bit_resolves_16bit_collisions(spark):
    """At web scale a 16-bit simhash space (65,536 buckets) is
    collision-dominated: 100k distinct synthetic docs MUST collide
    (pigeonhole), turning 'same hash' into noise. The 64-bit default keeps
    every distinct doc distinct at the same corpus size — the reason
    num_bits=64 is the default for simhash_near_dups/simhash_pairs."""
    from refined_spark.operators.dedup import simhash_col

    n = 100_000
    # deterministic diverse docs: 8 md5-derived pseudo-words per doc
    tok = lambda j: F.substring(F.md5(F.concat_ws("_", F.col("id").cast("string"), F.lit(str(j)))), 1, 10)
    d = spark.range(n).select(
        F.concat_ws(" ", *[tok(j) for j in range(8)]).alias("text")
    )
    agg = d.select(
        simhash_col(F.col("text"), num_bits=16).alias("h16"),
        simhash_col(F.col("text"), num_bits=64).alias("h64"),
    ).agg(
        F.countDistinct("h16").alias("d16"),
        F.countDistinct("h64").alias("d64"),
    ).collect()[0]
    assert agg.d16 <= 1 << 16  # pigeonhole: massively collided
    assert agg.d16 < n
    assert agg.d64 == n  # 2^64 space: zero collisions among 10^5 docs


def test_ngram_jaccard_pairs(spark):
    from refined_spark.operators.dedup import ngram_jaccard_pairs

    d = _docs(spark, [("a", BASE), ("b", NEAR), ("c", OTHER)])
    pairs = ngram_jaccard_pairs(d, n=3, threshold=0.5).collect()
    assert {(r.doc_a, r.doc_b) for r in pairs} == {("a", "b")}


def test_lsh_hot_bucket_cap_bounds_degenerate_corpus(spark):
    """A boilerplate corpus (every doc identical) puts all docs in one
    bucket per band: uncapped that is O(n^2) pairs; with bucket_cap the
    job completes with ZERO pairs and the dropped volume is reported via
    the Observation — no silent caps."""
    from pyspark.sql import Observation

    from refined_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    n = 50
    docs = spark.createDataFrame(
        [(f"d{i:03d}", "the same boilerplate footer text " * 4) for i in range(n)],
        "doc_id string, text string",
    )
    sigs = minhash_signatures(docs, k=5, num_hashes=8)
    obs = Observation("lsh_cap_test")
    pairs = lsh_candidate_pairs(sigs, bands=4, num_hashes=8,
                                bucket_cap=10, observation=obs)
    assert pairs.count() == 0  # every bucket is hotter than the cap
    # 4 bands x 50 docs = 200 doc-slots, all dropped
    assert obs.get["lsh_dropped_bucket_rows"] == 4 * n

    # a mixed corpus: hot boilerplate plus one true near-dup pair in a
    # calm bucket — the cap must keep the calm pair
    uniq = spark.createDataFrame(
        [("u1", "completely different unique text about regional summits"),
         ("u2", "completely different unique text about regional summit")],
        "doc_id string, text string",
    )
    sigs2 = minhash_signatures(docs.unionByName(uniq), k=5, num_hashes=8)
    pairs2 = lsh_candidate_pairs(sigs2, bands=4, num_hashes=8, bucket_cap=10)
    got = {(r.doc_a, r.doc_b) for r in pairs2.collect()}
    assert got == {("u1", "u2")}

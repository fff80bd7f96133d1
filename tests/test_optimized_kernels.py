"""Round-6 optimization kernels: every rewritten fast path must equal its
original JVM formulation row-for-row — the engine-vs-oracle parity test
covers the catalog queries, these cover the operator internals directly
(including paths the catalog does not exercise, e.g. the string-id JVM
fallback vs the integral-id block kernel on the same corpus)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick brown fox jumps over the lazy cat",
    "pack my box with five dozen liquor jugs",
    "pack my box with five dozen liquor mugs",
    "sphinx of black quartz judge my vow",
    "the quick brown fox jumps over the lazy dog",
    "completely unrelated text about regional trade summits",
    "a b",
    "",
]


def _docs_int(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )


def _docs_str(spark):
    # zero-padded so string sort order == numeric order
    return spark.createDataFrame(
        [(f"d{i:03d}", t) for i, t in enumerate(TEXTS)],
        "doc_id string, text string",
    )


def test_minhash_kernel_equals_jvm_expression(spark):
    """The Arrow md5/permutation kernel must produce the exact longs of
    the conv(substr(md5...)) expression tree it replaced."""
    from refined_spark.functions.hashing import (
        char_shingles_col,
        minhash_base_col,
        minhash_sig_from_base_col,
    )
    from refined_spark.operators.dedup import (
        minhash_signatures,
        normalized_text_col,
    )

    d = _docs_int(spark)
    got = {r.doc_id: r.sig for r in minhash_signatures(d, k=5, num_hashes=8).collect()}
    base = d.select(
        "doc_id",
        minhash_base_col(
            char_shingles_col(normalized_text_col(F.col("text")), 5)
        ).alias("mh_base"),
    )
    want = {
        r.doc_id: r.sig
        for r in base.select(
            "doc_id", minhash_sig_from_base_col(F.col("mh_base"), 8).alias("sig")
        ).collect()
    }
    assert got == want


def test_simhash_table_equals_simhash_col(spark):
    from refined_spark.operators.dedup import simhash_col, simhash_table

    d = _docs_int(spark)
    for bits in (16, 64):
        got = {r.doc_id: r.simhash
               for r in simhash_table(d, num_bits=bits).collect()}
        want = {
            r.doc_id: r.sh
            for r in d.select(
                "doc_id", simhash_col(F.col("text"), num_bits=bits).alias("sh")
            ).collect()
        }
        assert got == want, bits


def test_lsh_pairs_block_kernel_equals_jvm_fallback(spark):
    """Integral doc ids take the block-pair numpy kernel; string ids take
    the original posting-list JVM plan — same corpus, same pair set."""
    from refined_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    fast = lsh_candidate_pairs(
        minhash_signatures(_docs_int(spark), k=5, num_hashes=8),
        bands=4, num_hashes=8,
    )
    assert "FlatMapGroupsInPandas" in fast._jdf.queryExecution().executedPlan().toString() or \
           "MapInPandas" in fast._jdf.queryExecution().executedPlan().toString()
    got = {(r.doc_a, r.doc_b) for r in fast.collect()}
    slow = lsh_candidate_pairs(
        minhash_signatures(_docs_str(spark), k=5, num_hashes=8),
        bands=4, num_hashes=8,
    )
    want = {(int(r.doc_a[1:]), int(r.doc_b[1:])) for r in slow.collect()}
    assert got == want and got  # non-vacuous: the duplicate text pairs up


def test_ngram_block_kernel_equals_jvm_fallback(spark):
    from refined_spark.operators.dedup import ngram_jaccard_pairs

    got = {
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ngram_jaccard_pairs(_docs_int(spark), n=3, threshold=0.3).collect()
    }
    want = {
        (int(r.doc_a[1:]), int(r.doc_b[1:]), r.jaccard)
        for r in ngram_jaccard_pairs(_docs_str(spark), n=3, threshold=0.3).collect()
    }
    assert got == want and got


def test_ngram_block_kernel_df_cap(spark):
    """df_cap semantics survive the block kernel: a gram above the cap
    drops out of every doc's set (numerator AND denominator)."""
    from refined_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, "shared boilerplate prefix unique%d tail" % i) for i in range(5)]
        + [(10, "shared boilerplate prefix unique0 tail")],
        "doc_id long, text string",
    )
    uncapped = {(r.doc_a, r.doc_b): r.jaccard
                for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0,
                                             df_cap=None).collect()}
    capped = {(r.doc_a, r.doc_b): r.jaccard
              for r in ngram_jaccard_pairs(docs, n=3, threshold=0.0,
                                           df_cap=5).collect()}
    # the boilerplate gram shared by 6 docs exceeds cap 5 and disappears;
    # the (0, 10) exact-duplicate pair must survive on its unique grams
    assert (0, 10) in capped
    assert capped != uncapped


def test_pair_accumulator_chunked_equals_single_flush():
    """The bounded-memory consolidation path (chunk smaller than the
    emission volume -> several flush+merge rounds) must produce the exact
    unique pair set / counts of one big lexsort."""
    from refined_spark.operators.dedup import _PairAccumulator

    rng = np.random.RandomState(3)
    a = rng.randint(0, 50, size=20_000).astype(np.int64)
    b = rng.randint(0, 50, size=20_000).astype(np.int64)
    for counts in (False, True):
        one = _PairAccumulator(counts=counts, chunk=10**9)
        one.add(a, b)
        many = _PairAccumulator(counts=counts, chunk=1_000)
        for i in range(0, len(a), 777):
            many.add(a[i:i + 777], b[i:i + 777])
        r1, r2 = one.result(), many.result()
        assert all(np.array_equal(x, y) for x, y in zip(r1, r2)), counts


def test_round6_half_up_matches_spark_round(spark):
    from refined_spark.functions.similarity import round6_half_up

    vals = [0.3499995, 0.34999949999, 0.1234565, 0.1234575, 1.0000005,
            -0.3499995, 0.35, 0.9999999999, 1e-7, 5e-7, -5e-7,
            float("nan"), 123.45678949999999]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    want = [r.y for r in df.select(F.round("x", 6).alias("y")).collect()]
    got = [round6_half_up(v) for v in vals]
    for g, w in zip(got, want):
        assert (g == w) or (np.isnan(g) and np.isnan(w)), (g, w)


def test_neardup_kernel_equals_join_formulation(spark):
    """The bucketed GEMM kernel must reproduce the old join plan's pairs
    and cosines exactly (threshold low enough to emit many pairs)."""
    from refined_spark.functions.similarity import dot_col, l2_norm_col
    from refined_spark.operators.ann import (
        embedding_near_dups,
        lsh_signature_col,
        rotation_planes,
    )

    rng = np.random.RandomState(7)
    dim, n = 16, 200
    vecs = rng.randn(n, dim).astype(np.float32)
    vecs[17] = vecs[3] + 0.01 * rng.randn(dim).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    got = {(r.id_a, r.id_b): r.cos
           for r in embedding_near_dups(df, dim=dim, threshold=0.2,
                                        bits=3).collect()}

    v = df.select(
        F.col("vec_id"), F.col("embedding").alias("emb"),
        lsh_signature_col(F.col("embedding"),
                          rotation_planes(dim, 3, 0)).alias("bucket"),
    )
    a = v.select(F.col("vec_id").alias("id_a"), F.col("emb").alias("emb_a"), "bucket")
    b = v.select(F.col("vec_id").alias("id_b"), F.col("emb").alias("emb_b"), "bucket")
    cos = F.round(
        dot_col(F.col("emb_a"), F.col("emb_b"))
        / (l2_norm_col(F.col("emb_a")) * l2_norm_col(F.col("emb_b"))),
        6,
    ).alias("cos")
    want = {
        (r.id_a, r.id_b): r.cos
        for r in a.join(b, "bucket").where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cos).where(F.col("cos") >= 0.2).collect()
    }
    assert got == want and len(got) > 20


def test_fingerprint_long_equals_decimal(spark):
    from refined_spark.functions.text import fingerprint_col, tokens_col

    d = _docs_int(spark).where(F.col("text") != "")

    def old_fingerprint(text):
        toks = tokens_col(text)
        idx = F.sequence(F.lit(0), F.size(toks) - 1)
        powers = F.array(*[F.lit(31**j).cast("decimal(38,0)") for j in range(8)])
        terms = F.zip_with(
            toks, idx,
            lambda t, i: (
                F.conv(F.substring(F.md5(t), 1, 14), 16, 10).cast("decimal(38,0)")
                * F.element_at(powers, (i % 8) + 1)
            ),
        )
        total = F.aggregate(terms, F.lit(0).cast("decimal(38,0)"),
                            lambda acc, v: acc + v)
        return (total % F.lit(1 << 60)).cast("long")

    got = {r.doc_id: r.fp
           for r in d.select("doc_id", fingerprint_col(F.col("text")).alias("fp")).collect()}
    want = {r.doc_id: r.fp
            for r in d.select("doc_id", old_fingerprint(F.col("text")).alias("fp")).collect()}
    assert got == want

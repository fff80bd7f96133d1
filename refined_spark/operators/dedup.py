"""Deduplication operators over a document corpus — first-class components
for training-data pipelines at 100 TB (exact, MinHash-LSH, SimHash, n-gram
Jaccard, embedding-cosine near-dup).

All hashing is the deterministic md5-based family from functions/hashing.py,
reproducible in ANSI SQL for the DuckDB oracle. Corpus shape:
documents(doc_id, text, ...).

Scale notes:
  - exact dedup: one hash aggregate on the content hash; at 100 TB prefer
    hashing first, then groupBy the 8-byte hash (tiny shuffle payload) —
    that is exactly what these plans do (never shuffle full text).
  - MinHash-LSH: signatures computed JVM-side (higher-order functions, one
    md5 per shingle); banding explodes to (band_id, band_hash) keys; the
    bucket self-join is an equi-join on the band key, and hot buckets
    (boilerplate docs) are bounded by banding width — salt or cap bucket
    size if a real corpus degenerates.
  - candidate pairs are verified with exact Jaccard before linking, then
    clustered with the CC job (transitive closure of near-dup edges).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from refined_spark.functions.hashing import (
    char_shingles_col,
    md5_hash64_col,
    minhash_sig_col,
)
from refined_spark.operators.clustering import connected_components


def normalized_text_col(text: Column) -> Column:
    """Canonical form for exact dedup: lowercase, collapse whitespace."""
    return F.regexp_replace(F.trim(F.lower(text)), r"\s+", " ")


def ordered_pairs_col(ds: Column) -> Column:
    """All (ds[i], ds[j]) i<j pairs of a sorted posting list, as an array
    of (doc_a, doc_b) structs — the JVM-side pair emitter shared by every
    posting-list blocking plan here (LSH band buckets, n-gram inverted
    index, SimHash pigeonhole blocks). transform+slice+flatten: no lateral
    self-join, no pair re-association by key."""
    return F.flatten(
        F.transform(
            ds,
            lambda x, i: F.transform(
                F.slice(ds, i + F.lit(2), F.size(ds)),
                lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
            ),
        )
    )


def _is_integral(dtype) -> bool:
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    return isinstance(dtype, (ByteType, ShortType, IntegerType, LongType))


# --------------------------------------------------------------------------
# Block-pair pair generation (the guide-§2 shape for all-pairs work):
# docs hash into B blocks; the unordered pair (a, b) is processed by exactly
# ONE task, the one owning (block(a), block(b)) — so candidate emission,
# deduplication/counting AND the similarity filter all happen task-locally
# in numpy, and nothing pair-shaped is ever shuffled. Replication cost is
# one copy of each doc's (small) key row per block — O(n·B) bytes for
# O(n^2/B^2)-per-task work; B grows as sqrt(cores).
#
# The old plan (posting-list explode -> global distinct/count) emitted the
# full O(sum d^2) pair multiset through an interpreted higher-order-function
# projection and shuffled it; AQE additionally coalesced the few-MB posting
# frame down to a handful of tasks, so the quadratic work ran nearly serial.
# --------------------------------------------------------------------------


def _n_blocks(spark) -> int:
    """Smallest B with enough (i<=j) block pairs to cover the cores."""
    par = max(spark.sparkContext.defaultParallelism, 2)
    b = 2
    while b * (b + 1) // 2 < 2 * par:
        b += 1
    return b


def _pid_explode(blk: Column, n_blocks: int) -> Column:
    """All B canonical block-pair ids {(min(blk,k), max(blk,k))} a doc's
    rows must reach, encoded i*B+j with i <= j."""
    ks = F.sequence(F.lit(0), F.lit(n_blocks - 1))
    return F.explode(
        F.transform(
            ks,
            lambda k: F.least(blk, k) * n_blocks + F.greatest(blk, k),
        )
    )


def _per_pid(process):
    """mapInPandas wrapper: concatenates the partition's batches (a hash
    partition may hold several pids, and one pid's rows may span Arrow
    batches), then runs `process` per pid group."""
    import pandas as pd

    def f(batches):
        chunks = list(batches)
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        for _, g in pdf.groupby("pid", sort=False):
            out = process(g)
            if out is not None and len(out):
                yield out

    return f


def _dedup_sorted_pairs(a, b, c=None):
    """lexsort-unique over two parallel id arrays; with `c`, sums the
    per-row counts of equal pairs. Returns (a, b[, cnt])."""
    import numpy as np

    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    idx = np.flatnonzero(new)
    if c is None:
        return a[idx], b[idx]
    starts = idx
    return a[idx], b[idx], np.add.reduceat(c[order], starts)


_ACC_CHUNK = 16_000_000


class _PairAccumulator:
    """Bounded-memory pair collector for one block-pair task: raw pair
    chunks consolidate into a sorted unique (pair[, count]) set every
    _ACC_CHUNK emissions, so the task never holds the full O(sum d^2)
    multiset — only its distinct pairs plus one chunk. At bench scale a
    task fits in one chunk and this is exactly the old single lexsort;
    the consolidation path exists for cap-sized buckets at 10-100x SFs,
    where the raw multiset (but not the distinct set) outgrows a Python
    worker."""

    def __init__(self, counts: bool, chunk: int = _ACC_CHUNK):
        self.counts = counts
        self.chunk = chunk
        self._bufs: list = []
        self._n = 0
        self._cons = None  # (a, b[, c]) sorted unique

    def add(self, a, b) -> None:
        if len(a) == 0:
            return
        self._bufs.append((a, b))
        self._n += len(a)
        if self._n >= self.chunk:
            self._flush()

    def _flush(self) -> None:
        import numpy as np

        if not self._bufs:
            return
        a = np.concatenate([x for x, _ in self._bufs])
        b = np.concatenate([y for _, y in self._bufs])
        self._bufs, self._n = [], 0
        if self.counts:
            u = _dedup_sorted_pairs(a, b, np.ones(len(a), dtype=np.int64))
        else:
            u = _dedup_sorted_pairs(a, b)
        if self._cons is None:
            self._cons = u
        elif self.counts:
            ca = np.concatenate((self._cons[0], u[0]))
            cb = np.concatenate((self._cons[1], u[1]))
            cc = np.concatenate((self._cons[2], u[2]))
            self._cons = _dedup_sorted_pairs(ca, cb, cc)
        else:
            ca = np.concatenate((self._cons[0], u[0]))
            cb = np.concatenate((self._cons[1], u[1]))
            self._cons = _dedup_sorted_pairs(ca, cb)

    def result(self):
        """(a, b[, cnt]) sorted unique, or None if nothing was added."""
        self._flush()
        return self._cons


def _segment_pairs(codes, vals, blk, i, j, acc: "_PairAccumulator") -> None:
    """Feed the cross-block (i != j) or within-block (i == j) pairs of
    every bucket segment into `acc`. `codes` must be the primary sort key
    and `vals` (doc ids) the secondary, pre-sorted ascending; emitted
    pairs have a < b element-wise."""
    import numpy as np

    bounds = np.flatnonzero(codes[1:] != codes[:-1]) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(codes)]))
    for s, e in zip(starts, ends):
        if e - s < 2:
            continue
        v = vals[s:e]
        if i == j:
            iu, ju = np.triu_indices(len(v), 1)
            acc.add(v[iu], v[ju])  # v ascending -> a < b
        else:
            side = blk[s:e]
            left = v[side == i]
            right = v[side == j]
            if len(left) == 0 or len(right) == 0:
                continue
            la = np.repeat(left, len(right))
            rb = np.tile(right, len(left))
            acc.add(np.minimum(la, rb), np.maximum(la, rb))


def exact_duplicates(documents: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text",
                     prefix_chars: int | None = None) -> DataFrame:
    """Groups of byte-identical (normalized) documents:
    (content_hash, n_dups, doc_ids sorted, keeper = min doc_id).
    Only hashes shuffle, never text.

    prefix_chars=N hashes only the first N normalized characters —
    prefix dedup, the standard variant for corpora whose duplicates share
    openings but diverge in trailing boilerplate (and the variant that
    actually fires on corpora with no byte-identical full documents)."""
    norm = normalized_text_col(F.col(text_col))
    if prefix_chars is not None:
        norm = F.substring(norm, 1, prefix_chars)
    h = documents.select(
        F.col(id_col).alias("doc_id"),
        md5_hash64_col(norm).alias("content_hash"),
    )
    return (
        h.groupBy("content_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
            F.min("doc_id").alias("keeper"),
        )
        .where(F.col("n_dups") > 1)
    )


def minhash_signatures(documents: DataFrame, k: int = 5, num_hashes: int = 32,
                       text_col: str = "text") -> DataFrame:
    """(doc_id, sig array<long>[num_hashes]) over char k-shingles.

    Text normalization stays a JVM builtin (so lower/trim/\\s+ semantics
    can never drift from the rest of the engine); the shingle loop, md5
    and the (h1 + i*h2) & MASK60 permutation family run in an Arrow
    kernel — hashlib.md5 over the raw digest bytes plus one vectorized
    min per permutation. Byte-for-byte the same signature longs as the
    previous conv(substr(md5...)) expression tree (md5 is md5; hex chars
    1-15 == digest bytes 0-7 >> 4, hex 16-29 == (bytes 7-14 >> 4) & 2^56-1,
    all integer math), which paid one interpreted higher-order-function
    transform per permutation plus Spark's notoriously slow conv()."""
    import numpy as np
    import pandas as pd

    from refined_spark.functions.hashing import MASK60

    mask56 = (1 << 56) - 1

    def kernel(batches):
        import hashlib

        md5 = hashlib.md5
        from_bytes = int.from_bytes

        for pdf in batches:
            sigs: list = []
            for s in pdf["__norm"]:
                if s is None:
                    sigs.append(None)
                    continue
                n = len(s)
                shingles = {s[:k]} if n <= k else {
                    s[i:i + k] for i in range(n - k + 1)
                }
                h1 = np.empty(len(shingles), dtype=np.int64)
                h2 = np.empty(len(shingles), dtype=np.int64)
                for idx, sh in enumerate(shingles):
                    dg = md5(sh.encode("utf-8")).digest()
                    h1[idx] = from_bytes(dg[:8], "big") >> 4
                    h2[idx] = (from_bytes(dg[7:15], "big") >> 4) & mask56
                sigs.append([int(np.min((h1 + i * h2) & MASK60))
                             for i in range(num_hashes)])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "sig": sigs})

    id_t = documents.schema["doc_id"].dataType.simpleString()
    return documents.select(
        "doc_id", normalized_text_col(F.col(text_col)).alias("__norm")
    ).mapInPandas(kernel, schema=f"doc_id {id_t}, sig array<bigint>")


def lsh_candidate_pairs(
    signatures: DataFrame, bands: int = 8, num_hashes: int = 32,
    bucket_cap: int | None = 2000, observation=None,
) -> DataFrame:
    """Band the signature into `bands` groups of rows; docs sharing a band
    hash become candidate pairs. Returns (doc_a, doc_b) distinct, a < b.

    Plan: posexplode signature -> band key = (band_id, hash of band slice);
    self-join per band key. The join key includes band_id so buckets from
    different bands never cross-join.

    `num_hashes` must match the signature length — threaded as a parameter
    (the caller always knows it) so building the plan never runs a Spark
    job: a probe like select(size('sig')).limit(1).collect() would compute
    signatures in the driver before the real job even starts.

    bucket_cap (hot-bucket guard): a band bucket holding d docs emits
    O(d^2) pairs, so ONE boilerplate template shared by 10^6 docs would
    emit 10^12 pairs from a single key — the classic LSH failure mode on
    web corpora. Buckets larger than the cap are dropped entirely (a
    bucket that hot is boilerplate, not near-dup signal; any true
    near-dup pair in it almost surely shares a calmer bucket in another
    band). The default is FINITE on purpose: the posting-list plan
    materializes a whole bucket's ids as one row and emits its O(d^2)
    pairs from one task, so an uncapped boilerplate bucket that the old
    distributed self-join merely made slow would OOM a single executor
    here; 2000 ids ~ 2M pairs is comfortably within a task. Pass None to
    disable (only with a corpus known boilerplate-free). NOT silent: the
    frame carries an `observe` metric `lsh_dropped_bucket_rows`
    (doc-slots discarded by the cap), surfaced by the caller's action via
    an Observation/QueryExecution listener (the A9 telemetry channel;
    tests read it directly).

    Plan (integral doc ids, round 6): global bucket-size aggregate (the
    cap and >=2 filters need global membership) -> surviving banded rows
    replicate to their B block-pair tasks -> each task emits and dedups
    its share of every bucket's pairs locally in numpy (see the
    block-pair header comment above) — nothing pair-shaped is shuffled
    and a near-cap bucket's O(d^2) splits across all tasks. Non-integral
    ids keep the posting-list plan: per-bucket sorted doc lists, pairs
    emitted JVM-side (ordered_pairs_col), then one distinct. bucket_cap
    bounds the per-bucket pair explosion on both paths."""
    from refined_spark.functions.hashing import band_hashes_col

    import numpy as np
    import pandas as pd

    banded = signatures.select(
        "doc_id",
        F.posexplode(
            band_hashes_col(F.col("sig"), bands, num_hashes)
        ).alias("band_id", "band_hash"),
    )
    elem = signatures.schema["doc_id"].dataType
    if _is_integral(elem):
        # Block-pair plan (header comment above): bucket sizes are
        # aggregated once globally (the cap and >=2 filters need GLOBAL
        # bucket membership), surviving banded rows replicate to their B
        # block-pair tasks, and each task emits + dedups its share of
        # every bucket's pairs locally — a hot near-cap bucket's O(d^2)
        # pairs split evenly across all B(B+1)/2 tasks instead of
        # exploding out of one posting-list row, and the global
        # `distinct` shuffle of the pair multiset disappears.
        bsizes = banded.groupBy("band_id", "band_hash").agg(
            F.count("*").alias("__bsz")
        )
        if bucket_cap is not None:
            bsizes = bsizes.observe(
                observation if observation is not None else "lsh_bucket_cap",
                F.sum(
                    F.when(F.col("__bsz") > bucket_cap, F.col("__bsz"))
                    .otherwise(0)
                ).alias("lsh_dropped_bucket_rows"),
            ).where(F.col("__bsz") <= bucket_cap)
        keep = bsizes.where(F.col("__bsz") >= 2).select("band_id", "band_hash")
        nb = _n_blocks(signatures.sparkSession)
        rep = (
            banded.join(keep, ["band_id", "band_hash"], "left_semi")
            .withColumn(
                "blk", F.pmod(F.xxhash64("doc_id"), F.lit(nb)).cast("int")
            )
            .withColumn("pid", _pid_explode(F.col("blk"), nb))
        )

        def process(g: pd.DataFrame):
            pid = int(g["pid"].iloc[0])
            i, j = divmod(pid, nb)
            vals = g["doc_id"].to_numpy()
            blk = g["blk"].to_numpy()
            codes = pd.factorize(
                g["band_id"].astype(str) + "|" + g["band_hash"]
            )[0]
            order = np.lexsort((vals, codes))
            acc = _PairAccumulator(counts=False)
            _segment_pairs(codes[order], vals[order], blk[order], i, j, acc)
            res = acc.result()
            if res is None:
                return None
            return pd.DataFrame({"doc_a": res[0], "doc_b": res[1]})

        t = elem.simpleString()
        return rep.repartition(2 * nb * nb, "pid").mapInPandas(
            _per_pid(process), schema=f"doc_a {t}, doc_b {t}"
        )

    posts = banded.groupBy("band_id", "band_hash").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    if bucket_cap is not None:
        posts = posts.observe(
            observation if observation is not None else "lsh_bucket_cap",
            F.sum(
                F.when(F.size("ds") > bucket_cap, F.size("ds")).otherwise(0)
            ).alias("lsh_dropped_bucket_rows"),
        ).where(F.size("ds") <= bucket_cap)
    return (
        posts.where(F.size("ds") >= 2)
        .select(F.explode(ordered_pairs_col(F.col("ds"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )


def jaccard_verify(
    pairs: DataFrame, documents: DataFrame, k: int = 5,
    threshold: float = 0.8, text_col: str = "text",
) -> DataFrame:
    """Exact shingle-set Jaccard on candidate pairs; keeps pairs >= threshold.
    Shingle sets are joined in (twice) rather than recomputed per pair."""
    sh = documents.select(
        "doc_id",
        F.array_distinct(
            char_shingles_col(normalized_text_col(F.col(text_col)), k)
        ).alias("sh"),
    )
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def near_dup_clusters(
    documents: DataFrame, k: int = 5, num_hashes: int = 32, bands: int = 8,
    threshold: float = 0.8,
) -> DataFrame:
    """Full MinHash-LSH dedup: signatures -> banded candidates -> exact
    Jaccard verify -> CC over surviving edges. Returns
    (doc_id, cluster_id) for docs in any near-dup cluster."""
    sigs = minhash_signatures(documents, k, num_hashes)
    cands = lsh_candidate_pairs(sigs, bands, num_hashes=num_hashes)
    verified = jaccard_verify(cands, documents, k, threshold)
    ids = documents.select("doc_id", F.xxhash64("doc_id").alias("nid"))
    e = (
        verified.join(ids.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("nid", "src"), "doc_a")
        .join(ids.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("nid", "dst"), "doc_b")
        .select("src", "dst")
    )
    comp = connected_components(e)
    return ids.join(comp, ids["nid"] == comp["node"]).select(
        "doc_id", F.col("component").alias("cluster_id")
    )


def simhash_col(text: Column, num_bits: int = 64) -> Column:
    """SimHash over word tokens, JVM-side, up to the full 64-bit width
    (default 64: a 16-bit space is collision-dominated past ~10^6 docs —
    birthday pairs at 65k buckets — so "same hash" stops meaning near-dup
    on any web-scale corpus; 2^64 pushes that past 10^9).

    Per-token 64-bit hash = md5 hex chars 1-15 (bits 0-59, the engine-wide
    60-bit base hash) + hex char 16 (bits 60-63) — both exact BIGINTs in
    Spark and DuckDB. Bit b of the output is the majority vote of bit b
    across the token hashes. Single pass over the token array: one
    `aggregate` carries the num_bits vote counters as an int array
    (zip_with accumulator), then one fold converts votes to bits. Measured
    4x faster than the per-bit-aggregate formulation at 64 bits (each
    per-bit aggregate re-traverses the token array) and on par with the old
    16-bit plan. Bit 63 is the long sign bit: adding -2^63 IS setting it in
    two's complement (no unsigned type in either engine), so hashes with
    bit 63 set are negative longs — xor/bit_count/shift+mask all behave
    identically on them in Spark and DuckDB.

    Bit-exact twin of functions/hashing.simhash64_py (the pure-Python
    kernel used by the property tests) and of queries._sql_simhash."""
    if not 1 <= num_bits <= 64:
        raise ValueError(f"num_bits={num_bits} outside [1, 64]")
    toks = F.split(normalized_text_col(text), " ")
    hs = F.transform(
        toks,
        lambda t: F.struct(
            F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long").alias("h1"),
            F.conv(F.substring(F.md5(t), 16, 1), 16, 10).cast("long").alias("h2"),
        ),
    )

    # Constant array of per-bit masks (m1 hits h1 for bits 0-59, m2 hits h2
    # for bits 60-63; exactly one is nonzero per entry). Constant-folded to
    # ONE literal, so the vote loop compiles to a single zip_with body —
    # the previous formulation unrolled num_bits shiftright/and/cast
    # expressions inside the aggregate lambda and at 64 bits the generated
    # Java method crossed janino's 64 KB ceiling, dropping the whole
    # projection out of whole-stage codegen into interpreted mode.
    masks = F.array(*[
        F.struct(
            F.lit((1 << b) if b < 60 else 0).cast("long").alias("m1"),
            F.lit(0 if b < 60 else (1 << (b - 60))).cast("long").alias("m2"),
        )
        for b in range(num_bits)
    ])
    votes = F.aggregate(
        hs,
        F.array_repeat(F.lit(0), num_bits),
        lambda acc, s: F.zip_with(
            acc,
            masks,
            lambda a, m: a + F.when(
                (s["h1"].bitwiseAND(m["m1"]) != 0)
                | (s["h2"].bitwiseAND(m["m2"]) != 0),
                1,
            ).otherwise(-1),
        ),
    )
    powers = [(1 << b) if b < 63 else -(1 << 63) for b in range(num_bits)]
    pw = F.array(*[F.lit(p).cast("long") for p in powers])
    return F.aggregate(
        F.zip_with(
            votes, pw, lambda v, p: F.when(v > 0, p).otherwise(F.lit(0).cast("long"))
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def simhash_table(documents: DataFrame, num_bits: int = 64,
                  text_col: str = "text") -> DataFrame:
    """(doc_id, simhash) via an Arrow kernel — bit-exact with simhash_col
    and hashing.simhash64_py (same md5, same majority vote, same signed
    bit-63 representation), without the interpreted zip_with vote loop
    that pays ~num_bits lambda evaluations per token. Normalization stays
    JVM-side like minhash_signatures; the kernel unpacks each token's
    64-bit hash (md5 hex 1-15 -> bits 0-59, hex 16 -> bits 60-63) with
    one np.unpackbits per doc and takes the per-bit majority."""
    import numpy as np
    import pandas as pd

    if not 1 <= num_bits <= 64:
        raise ValueError(f"num_bits={num_bits} outside [1, 64]")

    def kernel(batches):
        import hashlib

        md5 = hashlib.md5
        from_bytes = int.from_bytes

        for pdf in batches:
            out = []
            for s in pdf["__norm"]:
                if s is None:
                    out.append(None)
                    continue
                toks = s.split(" ")
                m = len(toks)
                h = np.empty(m, dtype=np.uint64)
                for idx, t in enumerate(toks):
                    dg = md5(t.encode("utf-8")).digest()
                    h1 = from_bytes(dg[:8], "big") >> 4   # hex 1-15
                    h2 = dg[7] & 0x0F                      # hex 16
                    h[idx] = h1 | (h2 << 60)
                bits = np.unpackbits(
                    h.view(np.uint8).reshape(m, 8), axis=1, bitorder="little"
                )
                ones = bits.sum(axis=0, dtype=np.int64)
                val = 0
                for b in range(num_bits):
                    if 2 * int(ones[b]) > m:
                        val |= 1 << b
                out.append(val - (1 << 64) if val >= (1 << 63) else val)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "simhash": out})

    id_t = documents.schema["doc_id"].dataType.simpleString()
    return documents.select(
        "doc_id", normalized_text_col(F.col(text_col)).alias("__norm")
    ).mapInPandas(kernel, schema=f"doc_id {id_t}, simhash bigint")


def simhash_near_dups(documents: DataFrame, num_bits: int = 64,
                      text_col: str = "text") -> DataFrame:
    """Docs whose SimHash is identical (bucket grouping — the scalable
    hamming-radius-0 variant; radius>0 would probe bit-flipped buckets)."""
    h = documents.select("doc_id", simhash_col(F.col(text_col), num_bits).alias("simhash"))
    return (
        h.groupBy("simhash")
        .agg(F.count("*").alias("n_docs"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .where(F.col("n_docs") > 1)
    )


def simhash_pairs(documents: DataFrame, num_bits: int = 64, radius: int = 3,
                  text_col: str = "text", bucket_cap: int | None = 10000,
                  observation=None) -> DataFrame:
    """All pairs within hamming distance <= radius of each other's SimHash
    — EXACT (recall 1, unlike probabilistic LSH banding): pigeonhole block
    partition. The b-bit hash splits into radius+1 contiguous blocks; two
    hashes differing in <= radius bits must agree on at least one whole
    block, so blocking on (block_id, block_value) misses nothing. Returns
    (doc_a, doc_b, hamming), doc_a < doc_b. Defaults are the canonical
    web-dedup parameters (Manku et al., WWW'07): 64-bit hash, radius 3,
    4 blocks of 16 bits.

    Plan: explode radius+1 block keys per doc (bit shift+mask, pure JVM),
    posting-list pair emission per block bucket (ordered_pairs_col — same
    shape as LSH/ngram, never a self-join), distinct (a pair can agree on
    several blocks), then one join back to the hashes for the
    bit_count(xor) verify.

    Scale honesty: the blow-up factor is radius+1 rows per doc (constant),
    but bucket granularity is bounded by the block VALUE space,
    2^(num_bits // (radius+1)) — at 64 bits / radius 3 that is 2^16 values
    per block (fine up to ~10^9 docs of diverse text), while at 16 bits /
    radius 3 it collapses to 16 values per block and every "bucket" holds
    ~n/16 of the corpus: expect posting lists O(n) and O(n^2) pair
    emission from single tasks. bucket_cap is the guard: buckets larger
    than the cap are dropped (identical-hash mass that hot is boilerplate;
    a true <=radius pair in a dropped bucket almost surely also agrees on
    a calmer block), and the dropped doc-slot count is surfaced through
    the non-silent `observe` metric `simhash_dropped_bucket_rows` (A9
    telemetry channel, same contract as lsh_candidate_pairs)."""
    nb = radius + 1
    if num_bits < nb:
        raise ValueError(f"num_bits={num_bits} < radius+1={nb}")
    h = simhash_table(documents, num_bits, text_col).withColumnRenamed(
        "simhash", "sh"
    )
    widths = [num_bits // nb + (1 if i < num_bits % nb else 0) for i in range(nb)]
    lows = [sum(widths[:i]) for i in range(nb)]
    keys = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("sh"), lo)
                .bitwiseAND(F.lit((1 << w) - 1))
                .alias("val"),
            )
            for i, (lo, w) in enumerate(zip(lows, widths))
        ]
    )
    posts = (
        h.select("doc_id", F.explode(keys).alias("k"))
        .groupBy("k.blk", "k.val")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
    )
    if bucket_cap is not None:
        posts = posts.observe(
            observation if observation is not None else "simhash_bucket_cap",
            F.sum(
                F.when(F.size("ds") > bucket_cap, F.size("ds")).otherwise(0)
            ).alias("simhash_dropped_bucket_rows"),
        ).where(F.size("ds") <= bucket_cap)
    pairs = (
        posts.where(F.size("ds") >= 2)
        .select(F.explode(ordered_pairs_col(F.col("ds"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .distinct()
    )
    ha = h.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    hb = h.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    ham = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return (
        pairs.join(ha, "doc_a")
        .join(hb, "doc_b")
        .select("doc_a", "doc_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= radius)
    )


def ngram_jaccard_pairs(documents: DataFrame, n: int = 3, threshold: float = 0.5,
                        text_col: str = "text", df_cap: int | None = 1000) -> DataFrame:
    """Word n-gram Jaccard near-dup over the frequent-gram-pruned sets.
    Returns (doc_a, doc_b, jaccard) above threshold, doc_a < doc_b.

    Grams with document frequency > df_cap are removed from every doc's
    gram set before similarity (standard frequent-shingle removal: a
    boilerplate phrase shared by d docs would otherwise force O(d^2) work
    AND dominate the similarity of unrelated docs). df_cap=None keeps all.

    Plan (integral doc ids, round 6): explode distinct grams,
    groupBy(gram) -> capped posting lists (one shuffle on the gram key),
    re-assemble per-doc CAPPED gram-id arrays, replicate them to their B
    block-pair tasks, and let each task build its local inverted index
    in numpy, count its share of the pair multiset (sum over tasks ==
    the global count) and apply the Jaccard filter task-locally —
    n_a/n_b are array lengths, so no size joins and no pair-shaped
    shuffle (block-pair header comment above). Non-integral ids keep the
    round-3 posting-list plan: JVM pair emission + global count + two
    size joins. Both superseded the round-2 inverted-index self-join
    (which re-ran array_intersect per pair; ~8x slower at sf0.1)."""
    from refined_spark.functions.hashing import (
        split_tokens_col,
        token_shingles_from_tokens_col,
    )

    # two selects: bind the token array to an attribute so the shingle
    # lambda does not re-evaluate the lower/trim/regexp/split chain per
    # gram (token_shingles_from_tokens_col docstring; measured ~10x on
    # this scan)
    toks = documents.select(
        "doc_id",
        split_tokens_col(normalized_text_col(F.col(text_col))).alias("__toks"),
    )
    grams = toks.select(
        "doc_id",
        F.array_distinct(
            token_shingles_from_tokens_col(F.col("__toks"), n)
        ).alias("grams"),
    )
    inv = grams.select("doc_id", F.explode("grams").alias("g"))
    posts = inv.groupBy("g").agg(
        F.sort_array(F.collect_list("doc_id")).alias("ds")
    )
    if df_cap is not None:
        posts = posts.where(F.size("ds") <= df_cap)
    elem = grams.schema["doc_id"].dataType
    if _is_integral(elem):
        # Block-pair plan (header comment above): per-doc CAPPED gram-id
        # arrays replicate to their B block-pair tasks; each task builds
        # its local inverted index in numpy, emits + counts its share of
        # the pair multiset (sum over tasks == the old global count(*)),
        # and applies the Jaccard filter locally — n_a/n_b are just the
        # array lengths, so the two size joins and the 10^8-row pair
        # shuffle of the old plan disappear entirely. n_common, n_a, n_b
        # are exact integers; jaccard is the identical single double
        # division, rounded with the engine-wide HALF_UP twin.
        import numpy as np
        import pandas as pd

        from refined_spark.functions.similarity import round6_half_up

        nb = _n_blocks(documents.sparkSession)
        docarr = (
            posts.select(F.monotonically_increasing_id().alias("gid"), "ds")
            .select("gid", F.explode("ds").alias("doc_id"))
            .groupBy("doc_id")
            .agg(F.collect_list("gid").alias("gids"))
        )
        rep = docarr.withColumn(
            "blk", F.pmod(F.xxhash64("doc_id"), F.lit(nb)).cast("int")
        ).withColumn("pid", _pid_explode(F.col("blk"), nb))

        def process(g: pd.DataFrame):
            pid = int(g["pid"].iloc[0])
            i, j = divmod(pid, nb)
            ids = g["doc_id"].to_numpy()
            blk_doc = g["blk"].to_numpy()
            lens = g["gids"].map(len).to_numpy()
            doc_pos = np.repeat(np.arange(len(g)), lens)
            gid = np.concatenate(list(g["gids"]))
            vals = ids[doc_pos]
            blk = blk_doc[doc_pos]
            order = np.lexsort((vals, gid))
            acc = _PairAccumulator(counts=True)
            _segment_pairs(gid[order], vals[order], blk[order], i, j, acc)
            res = acc.result()
            if res is None:
                return None
            a, b, c = res
            sid = np.argsort(ids)
            ids_sorted, n_sorted = ids[sid], lens[sid]
            n_a = n_sorted[np.searchsorted(ids_sorted, a)]
            n_b = n_sorted[np.searchsorted(ids_sorted, b)]
            jacc = c.astype(np.float64) / (n_a + n_b - c).astype(np.float64)
            keep = jacc >= threshold
            if not keep.any():
                return None
            return pd.DataFrame({
                "doc_a": a[keep], "doc_b": b[keep],
                "jaccard": np.array([round6_half_up(x) for x in jacc[keep]],
                                    dtype=np.float64),
            })

        t = elem.simpleString()
        return rep.repartition(2 * nb * nb, "pid").mapInPandas(
            _per_pid(process), schema=f"doc_a {t}, doc_b {t}, jaccard double"
        )

    sizes = (
        posts.select(F.explode("ds").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"))
    )
    common = (
        posts.select(F.explode(ordered_pairs_col(F.col("ds"))).alias("p"))
        .select("p.doc_a", "p.doc_b")
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_common"))
    )
    sz_a = sizes.select(
        F.col("doc_id").alias("doc_a"), F.col("n_grams").alias("n_a")
    )
    sz_b = sizes.select(
        F.col("doc_id").alias("doc_b"), F.col("n_grams").alias("n_b")
    )
    jacc = F.col("n_common").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("n_common")
    ).cast("double")
    return (
        common.join(sz_a, "doc_a")
        .join(sz_b, "doc_b")
        .where(jacc >= threshold)
        .select("doc_a", "doc_b", F.round(jacc, 6).alias("jaccard"))
    )

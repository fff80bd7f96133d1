"""String and vector similarity kernels (operators F11 / C2).

The reference's candidate scoring is a neural dot product over precomputed
description embeddings (/root/reference/src/refined/model_components/
ed_layer_2.py:61-132) plus the P(e|m) prior; the north rule replaces the
neural part with classical pairwise features: Jaro-Winkler + Levenshtein on
surface-vs-label, and embedding cosine. All three are batch-vectorized:

  - levenshtein: Spark builtin (JVM, codegen).
  - jaro_winkler: Arrow pandas UDF; pure-Python pair kernel executed once
    per Arrow batch row-pair, no driver-side loops (rapidfuzz is not in the
    container; the kernel below is the textbook Winkler variant and is the
    single source of truth for both engine and in-test oracle).
  - cosine: builtin higher-order functions (zip_with + aggregate), entirely
    JVM-side; a numpy einsum pandas-UDF variant exists for wide batches.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def jaro_py(a: str, b: str) -> float:
    if a == b:
        return 1.0
    la, lb = len(a), len(b)
    if la == 0 or lb == 0:
        return 0.0
    window = max(la, lb) // 2 - 1
    if window < 0:
        window = 0
    match_a = [False] * la
    match_b = [False] * lb
    matches = 0
    for i, ca in enumerate(a):
        lo = max(0, i - window)
        hi = min(lb, i + window + 1)
        for j in range(lo, hi):
            if not match_b[j] and b[j] == ca:
                match_a[i] = True
                match_b[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    # transpositions: compare matched characters in order
    bs = [b[j] for j in range(lb) if match_b[j]]
    t = sum(1 for ca, cb in zip((a[i] for i in range(la) if match_a[i]), bs) if ca != cb)
    t //= 2
    m = float(matches)
    return (m / la + m / lb + (m - t) / m) / 3.0


def jaro_winkler_py(a: str | None, b: str | None, p: float = 0.1, max_prefix: int = 4) -> float:
    """Winkler boost: common prefix up to 4 chars, scaling factor 0.1."""
    if a is None or b is None:
        return 0.0
    j = jaro_py(a, b)
    prefix = 0
    for ca, cb in zip(a[:max_prefix], b[:max_prefix]):
        if ca == cb:
            prefix += 1
        else:
            break
    return j + prefix * p * (1.0 - j)


@pandas_udf(DoubleType())
def jaro_winkler_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    av = a.to_numpy(dtype=object)
    bv = b.to_numpy(dtype=object)
    out = np.empty(len(av), dtype=np.float64)
    for i in range(len(av)):
        out[i] = jaro_winkler_py(av[i], bv[i])
    return pd.Series(out)


def levenshtein_py(a: str | None, b: str | None) -> int:
    """Pure-Python edit distance (oracle twin of Spark's builtin
    F.levenshtein). Classic two-row DP."""
    if a is None or b is None:
        return max(len(a or ""), len(b or ""))
    la, lb = len(a), len(b)
    if la == 0:
        return lb
    if lb == 0:
        return la
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (0 if ca == b[j - 1] else 1),
            )
        prev = cur
    return prev[lb]


def lev_sim_py(a: str | None, b: str | None) -> float:
    """Normalized Levenshtein similarity: 1 - dist / max(len). Empty-vs-
    empty is 1.0 (the max(...,1) guard — same as the column twin)."""
    a = a or ""
    b = b or ""
    return 1.0 - levenshtein_py(a, b) / max(len(a), len(b), 1)


def lev_sim_col(a: Column, b: Column) -> Column:
    """JVM/codegen twin of lev_sim_py: Spark's builtin levenshtein (F11's
    second kernel, north rule 'Jaro-Winkler/Levenshtein'). Integer distance
    and lengths -> the double division is bit-identical to Python's."""
    aa = F.coalesce(a, F.lit(""))
    bb = F.coalesce(b, F.lit(""))
    return F.lit(1.0) - F.levenshtein(aa, bb) / F.greatest(
        F.length(aa), F.length(bb), F.lit(1)
    )


def round6_half_up(x: float) -> float:
    """Kernel-side twin of Spark's round(_, 6): HALF_UP on the shortest
    decimal representation of the double (Java's BigDecimal.valueOf(double)
    parses Double.toString — the shortest round-trip repr, which Python's
    repr() reproduces); NaN/Infinity pass through like Spark's Round."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    if not math.isfinite(x):
        return x
    return float(Decimal(repr(x)).quantize(Decimal("0.000001"),
                                           rounding=ROUND_HALF_UP))


def dot_col(a: Column, b: Column) -> Column:
    """JVM-side dot product over two array<float|double> columns.
    Cast to double first so Spark and DuckDB accumulate identically."""
    return F.aggregate(
        F.zip_with(a.cast("array<double>"), b.cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm_col(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a.cast("array<double>"), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_sim_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (l2_norm_col(a) * l2_norm_col(b))


def _series_to_mat(s: pd.Series) -> np.ndarray | None:
    """pd.Series of array<double> (possibly with nulls) -> (n, dim) float64
    matrix; null/ragged rows become zero vectors (norm 0 -> cosine 0)."""
    lst = s.tolist()
    dim = 0
    for x in lst:
        if x is not None and len(x) > 0:
            dim = len(x)
            break
    if dim == 0:
        return None
    z = np.zeros(dim, dtype=np.float64)
    rows = [x if (x is not None and len(x) == dim) else z for x in lst]
    return np.asarray(rows, dtype=np.float64)


@pandas_udf(DoubleType())
def cosine_seq_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """C2 — the north rule's Arrow-vectorized embedding-cosine kernel
    (replaces the reference's description dot-product scorer,
    ed_layer_2.py:61-132). Bit-exact with the pure-Python oracle
    (oracle.seq_dot/seq_norm): partial sums accumulate dimension-by-
    dimension — vectorized across the Arrow batch, sequential across dims,
    i.e. exactly a left-to-right fold per row — and the final expression is
    dot / (sqrt(na2) * sqrt(nb2)). Null or zero-norm rows return 0.0."""
    am = _series_to_mat(a)
    bm = _series_to_mat(b)
    n = len(a)
    if am is None or bm is None or am.shape[1] != bm.shape[1]:
        return pd.Series(np.zeros(n))
    dot = np.zeros(n)
    na2 = np.zeros(n)
    nb2 = np.zeros(n)
    for j in range(am.shape[1]):
        x = am[:, j]
        y = bm[:, j]
        dot += x * y
        na2 += x * x
        nb2 += y * y
    den = np.sqrt(na2) * np.sqrt(nb2)
    safe = np.where(den > 0, den, 1.0)
    return pd.Series(np.where(den > 0, dot / safe, 0.0))


@pandas_udf(DoubleType())
def cosine_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Arrow-batched numpy cosine — the C2 analog (batched einsum over the
    stacked candidate-embedding matrix; reference pads + masks, we keep
    variable-length rows and let Arrow handle batching)."""
    am = np.stack(a.to_numpy())
    bm = np.stack(b.to_numpy())
    num = np.einsum("ij,ij->i", am, bm)
    den = np.linalg.norm(am, axis=1) * np.linalg.norm(bm, axis=1)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.where(den > 0, num / den, 0.0)
    return pd.Series(out)

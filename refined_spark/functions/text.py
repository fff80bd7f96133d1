"""Text-analysis column functions for training-data pipelines.

These operate on the `documents(doc_id, text, lang, source, n_chars)` corpus
shape. Everything is a builtin column expression (whole-stage codegen); no
Python in the hot path. Each has an ANSI-SQL twin for the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword inventories for n-gram/stopword-ratio language ID.
LANG_STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "por", "que"],
}

EN_STOPWORDS = LANG_STOPWORDS["en"]


def tokens_col(text: Column) -> Column:
    """Whitespace tokenization (lowercased)."""
    return F.split(F.trim(F.lower(text)), r"\s+")


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def bpe_ish_token_count_col(text: Column) -> Column:
    """BPE-ish token estimate: split on word boundaries / punctuation /
    digit runs, the common pre-tokenizer regex family."""
    return F.size(
        F.filter(
            F.split(text, r"(?=[\s\p{Punct}])|(?<=[\s\p{Punct}])"),
            lambda t: F.trim(t) != "",
        )
    )


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    toks = tokens_col(text)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def lang_id_struct_col(text: Column) -> Column:
    """Heuristic language ID: argmax of per-language stopword hit counts.
    Ties break by fixed language order (de < en < es < fr alphabetical via
    max_by on (count, -ord)); returns struct<lang:string, score:double>."""
    toks = tokens_col(text)
    n = F.greatest(F.size(toks), F.lit(1)).cast("double")
    scored = []
    for lang in sorted(LANG_STOPWORDS):
        sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
        cnt = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        scored.append(F.struct((cnt.cast("double") / n).alias("score"), F.lit(lang).alias("lang")))
    best = F.array_max(F.array(*scored))  # struct compare: score first, then lang
    return F.struct(best["lang"].alias("lang"), best["score"].alias("score"))


def quality_score_col(text: Column) -> Column:
    """Document quality in [0,1]: blend of length band, alpha ratio,
    punctuation sanity, and stopword presence — the classic C4/Gopher-style
    heuristic family, kept simple and SQL-expressible."""
    import string

    n_chars = F.length(text).cast("double")
    # counting via translate (char-set strip, no regex): len(text) minus
    # the length with the counted chars removed is exactly the old
    # len(regexp_replace(text, '[^...]', '')) — same integers, and the
    # regex engine's per-char match loop (measured 2.8 s alone on the
    # sf1.0 corpus for the alpha class) disappears
    alpha = (
        F.length(text)
        - F.length(F.translate(text, string.ascii_letters + " ", ""))
    ).cast("double")
    alpha_ratio = alpha / F.greatest(n_chars, F.lit(1.0))
    punct = (
        F.length(text) - F.length(F.translate(text, "!?.,;:", ""))
    ).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    len_score = F.least(n_chars / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio_col(text)
    sw_score = F.least(sw * F.lit(4.0), F.lit(1.0))
    return F.round(
        F.lit(0.3) * len_score
        + F.lit(0.3) * alpha_ratio
        + F.lit(0.3) * sw_score
        + F.lit(0.1) * (F.lit(1.0) - F.least(punct_ratio * F.lit(5.0), F.lit(1.0))),
        6,
    )


def fingerprint_col(text: Column, mod: int = 1 << 60) -> Column:
    """Order-sensitive document fingerprint: polynomial rolling hash over
    word-token md5s — fingerprint = sum(h(tok_i) * 31^(i mod 8)) mod 2^60.
    Cheap, deterministic, and reproducible in DuckDB.

    Arithmetic runs entirely in the long domain (the decimal(38,0)
    formulation this replaces paid BigDecimal allocation per token). With
    h < 2^56 and p = 31^j < 2^35, split h = hi*2^28 + lo; then
    (h*p) mod 2^60 = (((hi*p) mod 2^32) << 28 + (lo*p) mod 2^60) mod 2^60,
    and every intermediate fits a signed long: hi*p < 2^63, lo*p < 2^63,
    both addends < 2^60 after masking, their sum < 2^61. Folding
    (acc + term) & MASK60 at each step equals the big-integer total % 2^60
    by modular-addition associativity — bit-exact with the previous
    formulation and the DuckDB oracle."""
    if mod != 1 << 60:
        raise ValueError("long-domain fingerprint requires mod == 2^60")
    mask60 = F.lit((1 << 60) - 1).cast("long")
    mask32 = F.lit((1 << 32) - 1).cast("long")
    mask28 = F.lit((1 << 28) - 1).cast("long")
    toks = tokens_col(text)
    idx = F.sequence(F.lit(0), F.size(toks) - 1)
    powers = F.array(*[F.lit(31**j).cast("long") for j in range(8)])

    def term(t: Column, i: Column) -> Column:
        h = F.conv(F.substring(F.md5(t), 1, 14), 16, 10).cast("long")
        p = F.element_at(powers, (i % 8) + 1)
        hi = F.shiftright(h, 28)
        lo = h.bitwiseAND(mask28)
        return (
            F.shiftleft((hi * p).bitwiseAND(mask32), 28)
            + (lo * p).bitwiseAND(mask60)
        ).bitwiseAND(mask60)

    terms = F.zip_with(toks, idx, term)
    return F.aggregate(
        terms,
        F.lit(0).cast("long"),
        lambda acc, v: (acc + v).bitwiseAND(mask60),
    )

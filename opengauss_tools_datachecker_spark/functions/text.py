"""Text-analysis column expressions for training-data pipelines.

All shuffle-free, higher-order-function based (whole-stage codegen;
tokens/shingles/hashes never leave the JVM). These feed the dedup and
quality operators. No reference analog — this is the training-data
extension mandated by the build brief; expressed SQL-portably so every
operator has a DuckDB oracle twin.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Top-of-list English stopwords — enough for a ratio heuristic.
EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that", "from",
]


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (empty-token free)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def word_tokens(text: Column | str) -> Column:
    """BPE-ish alnum tokenization: split on any non-alphanumeric run."""
    c = F.col(text) if isinstance(text, str) else text
    toks = F.split(F.lower(c), r"[^a-zA-Z0-9]+")
    return F.filter(toks, lambda t: t != "")


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles — transform over an index sequence, no explode.

    Guarded for docs shorter than n (Spark's sequence(1,0) DESCENDS —
    it would index out of bounds)."""
    gen = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + k) for k in range(n)]),
    )
    return F.when(F.size(toks) >= n, gen).otherwise(F.array().cast("array<string>"))


def minhash_signature(shingle_arr: Column, n_hashes: int = 8) -> list[Column]:
    """MinHash signature: per seeded permutation, the lexicographic min of
    md5(seed || shingle). md5-as-permutation keeps it portable to any SQL
    oracle (string min over hex digests)."""
    def hasher(j: int):
        return lambda s: F.md5(F.concat(F.lit(f"mh{j}_"), s))

    return [
        F.array_min(F.transform(shingle_arr, hasher(j))) for j in range(n_hashes)
    ]


def simhash16(toks: Column) -> Column:
    """16-bit SimHash: bit k of each token from md5 nibble k's high bit;
    per-document majority vote per bit. Shuffle-free (aggregate HOF)."""
    def voter(k: int):
        return lambda acc, t: acc + F.when(
            F.substring(F.md5(t), k, 1).isin(*"89abcdef"), 1
        ).otherwise(-1)

    bits = []
    for k in range(1, 17):
        vote = F.aggregate(toks, F.lit(0), voter(k))
        bits.append(F.when(vote > 0, F.lit(2 ** (k - 1))).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def stopword_ratio(toks: Column) -> Column:
    hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*EN_STOPWORDS)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[A-Za-z0-9\s]", "")
    return F.length(stripped) / F.greatest(F.length(c), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length band + low punctuation
    + plausible mean word length. Deterministic, SQL-portable."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)
    n = F.size(toks)
    len_ok = F.when((n >= 10) & (n <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    mean_wl = F.length(c) / F.greatest(n, F.lit(1))
    wl_ok = F.when((mean_wl >= 2.0) & (mean_wl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    punct_ok = F.lit(1.0) - F.least(punct_ratio(c) * 5.0, F.lit(1.0))
    return F.round((len_ok + wl_ok + punct_ok) / 3.0, 6)


def doc_fingerprint(toks: Column, n: int = 5, keep: int = 3) -> Column:
    """Winnowing-style fingerprint: the `keep` smallest md5 digests of
    word n-gram shingles, concatenated. Rolling-hash analog with a
    portable hash; robust to small edits away from the minima."""
    sh = shingles(toks, n)
    hashed = F.transform(sh, lambda s: F.md5(s))
    return F.concat_ws("", F.slice(F.array_sort(hashed), 1, keep))


# PII patterns — the ASCII subset that Java regex (Spark) and RE2
# (DuckDB) interpret identically: no lookarounds, no unicode classes.
# Redaction applies in list order (emails first, so an IP-looking
# domain is consumed by the email pattern, never double-redacted).
PII_PATTERNS: list[tuple[str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
]


def pii_counts(text: Column | str) -> list[Column]:
    """Per-pattern match counts, aliased ``n_<name>`` — codegen
    ``regexp_count``, shuffle-free (NULL text ⇒ NULL counts)."""
    c = F.col(text) if isinstance(text, str) else text
    return [F.regexp_count(c, F.lit(pat)).alias(f"n_{name}") for name, pat in PII_PATTERNS]


def pii_redact(text: Column | str) -> Column:
    """Replace every PII match with ``<NAME>`` — chained codegen
    ``regexp_replace`` in PII_PATTERNS order. A training-data scrub
    pass is this projection plus a rewrite of the text column; at
    100 TB it is a pure map with zero shuffle."""
    c = F.col(text) if isinstance(text, str) else text
    for name, pat in PII_PATTERNS:
        c = F.regexp_replace(c, pat, f"<{name.upper()}>")
    return c


# Credential/secret patterns — fixed-prefix token shapes with near-zero
# false-positive rates (the gitleaks/trufflehog default family), in the
# same Java-regex/RE2-common ASCII subset as PII_PATTERNS.
SECRET_PATTERNS: list[tuple[str, str]] = [
    ("aws_key", r"AKIA[0-9A-Z]{16}"),
    ("private_key", r"-----BEGIN [A-Z ]*PRIVATE KEY-----"),
    ("gh_token", r"ghp_[A-Za-z0-9]{36}"),
    ("slack_token", r"xox[baprs]-[A-Za-z0-9-]{10,}"),
]


def secret_counts(text: Column | str) -> list[Column]:
    """Per-pattern secret match counts, aliased ``n_<name>`` — codegen
    ``regexp_count``, shuffle-free."""
    c = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(c, F.lit(pat)).alias(f"n_{name}") for name, pat in SECRET_PATTERNS
    ]

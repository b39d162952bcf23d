"""Text analysis scalar functions — pure Column expressions (no UDFs).

Covers the reference's tokenizer surface (pkg/searcher tokenize+stem usage at
pkg/index/indexer.go:804, pkg/searcher/searcher.go:158 — here a pluggable
analyzer: lowercase, strip non-alphanumerics, split) plus the
training-data-pipeline text ops: token counting, n-grams, quality scoring,
language-ID heuristic, document fingerprinting. Each function that backs an
oracle-checked query has a ``*_sql`` twin emitting the identical computation
as DuckDB-compatible ANSI SQL.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


# --- tokenizer (analyzer) --------------------------------------------------

def tokenize(text: Column | str) -> Column:
    """Lowercase, collapse non-alphanumerics to spaces, split, drop empties.

    Mirrors the reference's sastrawi tokenizer contract (lowercased word
    stream); stemming is a pluggable extra (Indonesian stemmer not bundled).
    """
    cleaned = F.trim(
        F.regexp_replace(F.lower(_col(text)), r"[^\p{L}\p{N}]+", " ")
    )
    return F.filter(F.split(cleaned, " "), lambda t: t != "")


def tokenize_simple(text: Column | str) -> Column:
    """Split on single spaces only — exact twin of tokenize_simple_sql, used
    for oracle-checked queries (testdata text is already space-normalized)."""
    return F.filter(F.split(F.lower(_col(text)), " "), lambda t: t != "")


def tokenize_simple_sql(text: str) -> str:
    return f"list_filter(string_split(lower({text}), ' '), t -> t <> '')"


# --- n-grams ---------------------------------------------------------------

def ngrams(tokens: Column | str, n: int, sep: str = " ") -> Column:
    """Array of n-grams (joined with sep) from a token array.

    `transform(sequence(...))` keeps this JVM-side; empty when fewer than n
    tokens. Reference analog: sliding n-gram counting loop
    pkg/searcher/ngram_lm.go:112-210.
    """
    toks = _col(tokens)
    count = F.size(toks) - (n - 1)
    # sequence(1, 0) yields the DESCENDING [1, 0] (and slice rejects the
    # 0), so the fewer-than-n-tokens case must short-circuit to empty
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(sep, F.slice(toks, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def ngrams_sql(tokens_sql: str, n: int, sep: str = " ") -> str:
    """DuckDB twin: list comprehension over generate_series (1-indexed)."""
    parts = f" || '{sep}' || ".join(f"({tokens_sql})[i + {j}]" for j in range(n))
    return (
        f"[{parts} for i in generate_series(1, len({tokens_sql}) - {n - 1})]"
    )


def char_shingles(text: Column | str, k: int) -> Column:
    """Array of k-character shingles of a string (for MinHash/Jaccard).
    Empty below k chars (sequence(1, 0) is the DESCENDING [1, 0] in Spark
    while the DuckDB twin's generate_series(1, 0) is empty — the
    short-string case must short-circuit to match)."""
    t = _col(text)
    count = F.length(t) - (k - 1)
    return F.when(
        count >= 1,
        F.transform(
            F.sequence(F.lit(1), count), lambda i: F.substring(t, i, k)
        ),
    ).otherwise(F.array().cast("array<string>"))


# --- quality / language heuristics ----------------------------------------

STOPWORDS = (
    "the a an and or of to in is are was were on at for with as by it this that",
)
_STOPWORD_LIST = STOPWORDS[0].split(" ")


def quality_features(text: Column | str) -> dict[str, Column]:
    """Length / punctuation / stopword-ratio features for quality scoring."""
    t = _col(text)
    toks = tokenize_simple(t)
    n_tokens = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*_STOPWORD_LIST)))
    return {
        "n_chars": F.length(t),
        "n_tokens": n_tokens,
        "avg_token_len": (F.length(t) - (n_tokens - 1)) / n_tokens,
        "stopword_ratio": stop_hits / n_tokens,
        "punct_ratio": (
            F.length(F.regexp_replace(t, r"[\p{L}\p{N}\s]", "")) / F.length(t)
        ),
    }


# GPT-2-style pre-tokenizer pieces: contractions, letter runs, digit runs,
# punctuation runs (each optionally space-prefixed). RE2- and Java-regex
# compatible (no lookarounds), so Spark and DuckDB split identically.
BPE_PIECE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+"


def bpe_pieces(text: Column | str) -> Column:
    """Array of BPE-ish pre-tokenizer pieces — the token-budget estimator a
    training pipeline runs over every document (piece count tracks BPE
    token count far better than whitespace words: punctuation, digit runs
    and contractions split out). Pure Column (regexp_extract_all)."""
    return F.regexp_extract_all(F.lower(_col(text)), F.lit(BPE_PIECE_RE), 0)


def bpe_pieces_sql(text: str) -> str:
    """DuckDB twin (RE2 accepts the same pattern)."""
    pat = BPE_PIECE_RE.replace("'", "''")
    return f"regexp_extract_all(lower({text}), '{pat}')"


def rolling_fingerprint(text: Column | str) -> Column:
    """Deterministic 64-bit document fingerprint: xxhash64 of the normalized
    token stream — stable under whitespace differences."""
    return F.xxhash64(F.concat_ws(" ", tokenize(_col(text))))

"""Text-analysis expressions for large-scale training-data pipelines:
language-ID, quality scoring, token counting, document fingerprinting.

All are pure column expressions (JVM-side, codegen'd, no Python UDFs) so
they run at full scan speed over 100 TB of documents. Where an operator
is oracle-checked, the hashing primitive is md5 (identical string output
in Spark and DuckDB); a production deployment would swap ``xxhash64``
for md5 — same plumbing, ~10× cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny per-language stopword lists for the n-gram/stopword heuristic —
#: deliberately small & fixed so the oracle SQL can embed the same lists
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "por", "con", "los"),
    "de": ("der", "die", "und", "das", "ist", "von", "mit", "den", "ein", "zu"),
    "fr": ("le", "la", "et", "les", "des", "en", "un", "du", "que", "pour"),
}

#: deterministic tie-break priority when scores are equal
LANG_PRIORITY = ("en", "es", "de", "fr")

#: BPE-ish token pattern: letter runs, single digits, single punctuation
BPE_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of lowercased text.

    KNOWN SEMANTIC (shared with every DuckDB oracle twin, so it cannot
    change on one side alone): empty / whitespace-only text yields
    ``['']`` — one empty token, count 1 — because ``split('')`` returns
    a single empty element in BOTH engines. Callers that must treat
    blank docs as zero-token (quality scoring, token budgeting) filter
    blanks first or use ``F.array_remove(tokens(c), '')`` — the
    codegen'd form the round-12 sweep standardized on; the
    ``F.filter(..., t -> t != '')`` lambda is semantically identical
    but evaluates interpreted (higher-order functions are
    CodegenFallback), which measurably slows full-corpus scans."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.lower(F.trim(c)), r"\s+")


def token_count(col: Column | str) -> Column:
    """Whitespace token count (blank text counts 1 — see ``tokens``)."""
    return F.size(tokens(col))


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count via the sub-word regex (the whitespace count
    underestimates tokenizer load; this tracks it closely enough for
    budgeting)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_PATTERN), F.lit(0)))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Number of DISTINCT stopwords of ``lang`` present in the text."""
    return F.size(
        F.array_intersect(tokens(col), F.array(*[F.lit(w) for w in STOPWORDS[lang]]))
    )


def lang_id(col: Column | str) -> Column:
    """Language-ID heuristic: most distinct stopword hits wins; ties go
    to LANG_PRIORITY order; zero hits everywhere ⇒ 'und' (undetermined)."""
    scores = {lang: stopword_hits(col, lang) for lang in LANG_PRIORITY}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the CASE back-to-front so earlier languages win ties
    for lang in reversed(LANG_PRIORITY):
        expr = F.when((scores[lang] == best) & (best > 0), lang).otherwise(expr)
    return expr


def punct_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(r"[^A-Za-z0-9\s]"), F.lit(0)))


def quality_score(col: Column | str) -> Column:
    """Document quality heuristic in [0,1]:
    0.4·min(tokens/64, 1) + 0.4·min(distinct-en-stopwords/10, 1)
    + 0.2·(1 − min(punct/tokens, 1)).
    Pure integer-count arithmetic → double division; engine-identical."""
    n_tok = token_count(col).cast("double")
    stop = stopword_hits(col, "en").cast("double")
    punct = punct_count(col).cast("double")
    length_part = F.least(n_tok / F.lit(64.0), F.lit(1.0))
    stop_part = F.least(stop / F.lit(10.0), F.lit(1.0))
    punct_part = F.lit(1.0) - F.least(punct / F.greatest(n_tok, F.lit(1.0)), F.lit(1.0))
    return F.lit(0.4) * length_part + F.lit(0.4) * stop_part + F.lit(0.2) * punct_part


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint: md5 of whitespace-normalized lowercase text.
    Exact-dedup key; identical in Spark and DuckDB."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def rolling_hash(col: Column | str, mod: int = 1_000_000_007, base: int = 31) -> Column:
    """Polynomial rolling hash over characters (classic Rabin-Karp form),
    folded left-to-right with ``aggregate`` — no UDF. Oracle-checked: the
    DuckDB twin folds the same char list with list_reduce
    (queries/scale_ops.py ``doc_fingerprints``)."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * F.lit(base) + F.ascii(ch)) % F.lit(mod),
    )

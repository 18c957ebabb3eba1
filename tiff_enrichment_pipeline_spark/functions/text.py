"""Text-analysis column functions for training-data pipelines.

All pure Catalyst expressions (regexp/array built-ins — JVM-side, no UDFs),
each with identical-arithmetic DuckDB SQL twins so the driver's oracle can
value-check them. Operators: language-ID (stopword-hit heuristic), quality
scoring (length/punct/stopword ratios), token counting, document
fingerprinting (md5-derived 60-bit), word-shingle construction for MinHash.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny per-language stopword lists for the n-gram/stopword language heuristic
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "et", "les", "des"],
}
PUNCT_RE = "[.,!?;:]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased).

    Leading/trailing whitespace is stripped with a REGEX, not trim():
    both Spark's trim and DuckDB's TRIM strip only ASCII spaces, so a
    doc starting with a tab/newline used to produce a phantom empty
    first token — which leaked into shingles as ``" a b"`` (r6 review
    finding: the old and new shingle formulations diverged on exactly
    those docs). Stripping all ``\\s`` in BOTH engines keeps the
    token/shingle oracles aligned and the empty token out."""
    stripped = F.regexp_replace(F.lower(text), r"^\s+|\s+$", "")
    return F.split(stripped, r"\s+")


def tokens_sql(text: str) -> str:
    return (
        f"regexp_split_to_array("
        f"regexp_replace(lower({text}), '^\\s+|\\s+$', '', 'g'), '\\s+')"
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def token_count_sql(text: str) -> str:
    return f"CAST(len({tokens_sql(text)}) AS INT)"


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_RE), 0))


def punct_count_sql(text: str) -> str:
    return f"CAST(len(regexp_extract_all({text}, '{PUNCT_RE}')) AS INT)"


def stopword_hits(text: Column, lang: str) -> Column:
    words = LANG_STOPWORDS[lang]
    arr = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(tokens(text), lambda t: F.array_contains(arr, t)))


def stopword_hits_sql(text: str, lang: str) -> str:
    lst = ",".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
    return (
        f"CAST(len(list_filter({tokens_sql(text)}, "
        f"t -> list_contains([{lst}], t))) AS INT)"
    )


def predicted_lang(text: Column) -> Column:
    """argmax of stopword hits; deterministic tie-break by list order
    en > es > de > fr; 'unknown' when zero hits everywhere."""
    hits = {lang: stopword_hits(text, lang) for lang in LANG_STOPWORDS}
    best = F.greatest(*hits.values())
    expr = F.lit("unknown")
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = F.when((hits[lang] == best) & (best > 0), lang).otherwise(expr)
    return expr


def predicted_lang_sql(text: str) -> str:
    hits = {lang: stopword_hits_sql(text, lang) for lang in LANG_STOPWORDS}
    best = "GREATEST(" + ",".join(hits.values()) + ")"
    expr = "'unknown'"
    for lang in reversed(list(LANG_STOPWORDS)):
        expr = (
            f"CASE WHEN {hits[lang]} = {best} AND {best} > 0 "
            f"THEN '{lang}' ELSE {expr} END"
        )
    return expr


def quality_score(text: Column, n_chars: Column) -> Column:
    """Composite document quality in [0,1]: length band + punctuation
    density + English-stopword density (the usual pretraining heuristics)."""
    tc = token_count(text).cast("double")
    len_score = F.least(n_chars.cast("double") / F.lit(400.0), F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / (tc + F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * 2.0, F.lit(1.0))
    stop_ratio = stopword_hits(text, "en").cast("double") / (tc + F.lit(1.0))
    stop_score = F.least(stop_ratio * 4.0, F.lit(1.0))
    return (len_score + punct_score + stop_score) / F.lit(3.0)


def quality_score_sql(text: str, n_chars: str) -> str:
    tc = f"CAST({token_count_sql(text)} AS DOUBLE)"
    len_s = f"LEAST(CAST({n_chars} AS DOUBLE)/400.0, 1.0)"
    punct_s = f"(1.0 - LEAST(CAST({punct_count_sql(text)} AS DOUBLE)/({tc}+1.0)*2.0, 1.0))"
    stop_s = f"LEAST(CAST({stopword_hits_sql(text, 'en')} AS DOUBLE)/({tc}+1.0)*4.0, 1.0)"
    return f"(({len_s} + {punct_s} + {stop_s})/3.0)"


def md5_prefix_long(s: Column, hex_digits: int = 8) -> Column:
    """First ``hex_digits`` of md5 → BIGINT — the engine's portable string
    hash (Spark's murmur ``hash()`` has no DuckDB twin)."""
    return F.conv(F.substring(F.md5(s), 1, hex_digits), 16, 10).cast("long")


def md5_prefix_long_sql(s: str, hex_digits: int = 8) -> str:
    return f"CAST(('0x' || substr(md5({s}), 1, {hex_digits})) AS BIGINT)"


def fingerprint(text: Column) -> Column:
    """60-bit content fingerprint (P11-style dedup key at scale)."""
    return md5_prefix_long(text, 15)


def fingerprint_sql(text: str) -> str:
    return md5_prefix_long_sql(text, 15)


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles joined by single spaces (MinHash input).

    Implementation (r6): overlapping shingles via a zero-width-lookahead
    ``regexp_extract_all`` over the whitespace-normalized text — the
    pattern anchors at each word start (``^`` or a preceding space) and
    the lookahead group captures that word plus the next n-1. Values are
    identical to the earlier ``transform(sequence, concat_ws(element_at
    ...))`` formulation (0 diffs over the full sf0.1 corpus, n∈{2,3,5}
    edge fixtures incl. null/empty/short/regex-special docs), but the
    regex is a codegen'd scalar function while higher-order-function
    lambdas are interpreted per element: measured 120.1 s → 3.7 s for
    52M shingles over 1M docs (32.5×; BENCH.md r6 profile) — shingle
    construction was 97% of the whole LSH candidate-pairs stage.

    Guarded for <n-token docs (and NULL text, where the regex would
    yield NULL instead of the empty array): short docs short-circuit to
    an empty array exactly as before."""
    t = tokens(text)
    # same all-whitespace strip as tokens() — trim()-only would leave a
    # leading "\t" to become a phantom empty token on the tokens side
    # while the regex side normalizes it away (r6 review finding)
    norm = F.regexp_replace(
        F.regexp_replace(F.lower(text), r"^\s+|\s+$", ""), r"\s+", " "
    )
    pat = r"(?:^|(?<= ))(?=(\S+(?: \S+){%d}))" % (n - 1)
    shingles = F.regexp_extract_all(norm, F.lit(pat), 1)
    return F.when(F.size(t) >= n, shingles).otherwise(
        F.array().cast("array<string>")
    )


def word_shingles_sql(text: str, n: int = 3) -> str:
    t = tokens_sql(text)
    parts = " || ' ' || ".join(f"{t}[i+{j}]" for j in range(n))
    return (
        f"list_transform(generate_series(1, GREATEST(len({t})-{n - 1}, 0)), "
        f"i -> {parts})"
    )

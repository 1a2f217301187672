"""Text analysis for large-scale training-data pipelines.

Operators (all JVM-side column expressions — zero Python in the hot
path, whole-stage-codegen friendly, safe at 100 TB):

  * token counting      — whitespace tokens + a BPE-ish regex token count
  * language ID         — marker-word n-gram heuristic, deterministic
  * quality scoring     — length / punctuation / stopword-ratio features
  * fingerprinting      — md5 content fingerprint + 60-bit integer form

Every operator has BOTH a Spark Column builder and a DuckDB SQL
fragment builder generated from the SAME Python constants, so the
driver's correctness gate (Spark vs DuckDB value-hash) exercises
identical semantics. The md5-derived 60-bit integer is the engine's
portable hash primitive (Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``('0x'||substr(md5(x),1,15))::bigint``) — used here and by the
MinHash / SimHash dedup operators.

No reference anchor: /root/reference/pagerank.py has no text layer
beyond URL substring search; these are the north-star training-data
operators layered on the same engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared constants (single source of truth for Spark AND SQL builders)
# ---------------------------------------------------------------------------

# ASCII-only classes so Spark (Java regex) and DuckDB (RE2) agree.
WORD_TOKEN_REGEX = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
PUNCT_CLASS_REGEX = r"[^A-Za-z0-9\s]"
WS_REGEX = r"\s+"

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that",
]

# marker vocabularies for the n-gram-free language-ID heuristic;
# deterministic tie-break = language code ascending.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht", "ein", "mit"],
    "en": ["the", "and", "of", "is", "to", "a", "in", "that"],
    "es": ["el", "la", "los", "las", "es", "un", "una", "que"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "que"],
    "zh": ["de", "shi", "le", "zai", "you", "he", "wo", "ni"],
}
LANG_ORDER = sorted(LANG_MARKERS)  # tie-break order
DEFAULT_LANG = "und"

HASH_PRIME = 2147483647  # 2^31 - 1 (Mersenne), modulus for portable hashing

# quality score weights: reward length & word-ness, punish punctuation
# soup; clamped to [0,1]; rounded to 6dp so Spark/DuckDB float noise
# cannot flip the hash compare.
QUALITY_ROUND = 6


# ---------------------------------------------------------------------------
# Spark column builders
# ---------------------------------------------------------------------------

def tokens_expr(text: Column) -> Column:
    """Whitespace tokens; empty/blank text -> empty array (Spark's split
    of '' yields [''] — guard it so both engines agree)."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, WS_REGEX)
    )


def token_count_expr(text: Column) -> Column:
    return F.size(tokens_expr(text)).cast("long")


def word_token_count_expr(text: Column) -> Column:
    """BPE-ish token estimate: alnum runs + individual punctuation marks."""
    return F.size(
        F.regexp_extract_all(text, F.lit(WORD_TOKEN_REGEX), F.lit(0))
    ).cast("long")


def punct_count_expr(text: Column) -> Column:
    return (
        F.length(text)
        - F.length(F.regexp_replace(text, PUNCT_CLASS_REGEX, ""))
    ).cast("long")


def stopword_count_expr(text: Column) -> Column:
    toks = tokens_expr(F.lower(text))
    return F.size(
        F.filter(toks, lambda t: t.isin(*STOPWORDS))
    ).cast("long")


def _marker_hits(text: Column, markers: list[str]) -> Column:
    toks = tokens_expr(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*markers)))


def lang_id_expr(text: Column) -> Column:
    """Deterministic marker-vote language ID.

    predicted = language with the most marker-token hits; ties broken by
    language code ascending; zero hits -> 'und'. Expressed as
    max(struct(hits, neg_rank)) so the whole thing partial-aggregates as
    a plain projection (no UDF, no shuffle).
    """
    best = None
    for rank, lang in enumerate(LANG_ORDER):
        hits = _marker_hits(text, LANG_MARKERS[lang])
        # higher hits win; on equal hits the EARLIER lang (lower rank)
        # must win => use negative rank inside the max-struct.
        cand = F.struct(
            hits.alias("h"), F.lit(-rank).alias("nr"), F.lit(lang).alias("lang")
        )
        best = cand if best is None else F.greatest(best, cand)
    return F.when(best["h"] > 0, best["lang"]).otherwise(F.lit(DEFAULT_LANG))


def quality_score_expr(text: Column) -> Column:
    """Composite quality in [0,1]: length signal * (1 - punct ratio)
    * stopword-presence signal. Rounded to QUALITY_ROUND dp."""
    n_chars = F.length(text).cast("double")
    n_tok = token_count_expr(text).cast("double")
    len_sig = F.least(n_chars / F.lit(200.0), F.lit(1.0))
    punct_ratio = F.when(
        n_chars > 0, punct_count_expr(text).cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tok > 0, stopword_count_expr(text).cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    stop_sig = F.least(stop_ratio * F.lit(4.0), F.lit(1.0))
    score = len_sig * (F.lit(1.0) - punct_ratio) * (
        F.lit(0.5) + F.lit(0.5) * stop_sig
    )
    return F.round(score, QUALITY_ROUND)


def fingerprint_expr(text: Column) -> Column:
    """Content fingerprint: md5 of lowercase+trimmed text (hex string)."""
    return F.md5(F.lower(F.trim(text)))


def hash60_expr(s: Column) -> Column:
    """Portable 60-bit integer hash (identical value in DuckDB — see
    module docstring). The primitive under MinHash/SimHash."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def analyze_documents(df, text_col: str = "text"):
    """Attach the full analysis column set to a documents DataFrame."""
    t = F.col(text_col)
    return df.withColumns(
        {
            "n_tokens": token_count_expr(t),
            "n_word_tokens": word_token_count_expr(t),
            "n_punct": punct_count_expr(t),
            "n_stopwords": stopword_count_expr(t),
            "lang_pred": lang_id_expr(t),
            "quality": quality_score_expr(t),
            "fingerprint": fingerprint_expr(t),
        }
    )


# ---------------------------------------------------------------------------
# DuckDB SQL fragment builders (same semantics, same constants)
# ---------------------------------------------------------------------------

def _sql_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def sql_tokens(text: str) -> str:
    return (
        f"case when trim({text}) = '' then []::varchar[] "
        f"else string_split_regex(trim({text}), '\\s+') end"
    )


def sql_token_count(text: str) -> str:
    return f"len({sql_tokens(text)})"


def sql_word_token_count(text: str) -> str:
    return f"len(regexp_extract_all({text}, '{WORD_TOKEN_REGEX}'))"


def sql_punct_count(text: str) -> str:
    return f"(length({text}) - length(regexp_replace({text}, '{PUNCT_CLASS_REGEX}', '', 'g')))"


def sql_stopword_count(text: str) -> str:
    return (
        f"len(list_filter({sql_tokens(f'lower({text})')}, "
        f"t -> list_contains({_sql_list(STOPWORDS)}, t)))"
    )


def _sql_marker_hits(text: str, markers: list[str]) -> str:
    return (
        f"len(list_filter({sql_tokens(f'lower({text})')}, "
        f"t -> list_contains({_sql_list(markers)}, t)))"
    )


def sql_lang_hit_columns(text: str) -> str:
    """SELECT-list fragment computing one `hits_<lang>` column per
    language (for a CTE; `sql_lang_id_case` then picks the winner)."""
    return ", ".join(
        f"{_sql_marker_hits(text, LANG_MARKERS[lang])} as hits_{lang}"
        for lang in LANG_ORDER
    )


def sql_lang_id_case() -> str:
    """CASE over hits_<lang> columns reproducing the Spark max-struct
    semantics: most hits wins, ties -> language code ascending, zero
    hits -> 'und'. Each WHEN is self-contained (strict > vs earlier
    languages which win ties, >= vs later ones)."""
    whens = []
    for i, lang in enumerate(LANG_ORDER):
        conds = [f"hits_{lang} > 0"]
        for j, other in enumerate(LANG_ORDER):
            if i == j:
                continue
            op = ">" if j < i else ">="
            conds.append(f"hits_{lang} {op} hits_{other}")
        whens.append(f"when {' and '.join(conds)} then '{lang}'")
    return "case " + " ".join(whens) + f" else '{DEFAULT_LANG}' end"


def sql_quality_score(text: str) -> str:
    n_chars = f"length({text})::double"
    n_tok = f"{sql_token_count(text)}::double"
    len_sig = f"least({n_chars} / 200.0, 1.0)"
    punct_ratio = (
        f"case when {n_chars} > 0 then {sql_punct_count(text)}::double / {n_chars} else 0.0 end"
    )
    stop_ratio = (
        f"case when {n_tok} > 0 then {sql_stopword_count(text)}::double / {n_tok} else 0.0 end"
    )
    stop_sig = f"least({stop_ratio} * 4.0, 1.0)"
    return (
        f"round({len_sig} * (1.0 - {punct_ratio}) * (0.5 + 0.5 * {stop_sig}), {QUALITY_ROUND})"
    )


def sql_fingerprint(text: str) -> str:
    return f"md5(lower(trim({text})))"


def sql_hash60(s: str) -> str:
    return f"('0x' || substr(md5({s}), 1, 15))::bigint"

"""Text-analysis column expressions, with DuckDB SQL twins.

Everything here is a JVM-side Catalyst expression (split / transform /
filter / regexp) — no Python UDFs in the hot path — and every builder
has a ``sql_*`` twin generating the byte-identical DuckDB expression so
the oracle gate can verify the operator.

Hashing across engines uses only ``md5(string)`` (identical lowercase
hex in Spark and DuckDB).
"""

from __future__ import annotations

# language marker words (tiny, deterministic n-gram-free language ID)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "und", "das", "ein", "ist"),
    "en": ("the", "and", "is", "to", "of", "a"),
    "es": ("el", "la", "los", "de", "y", "que"),
    "fr": ("le", "les", "et", "des", "un", "est"),
}

STOPWORDS: tuple[str, ...] = (
    "the", "and", "is", "to", "of", "a", "in", "that", "it", "on", "for",
)

PUNCT_CLASS = "[.,;:!?''\"()-]"
BPE_ISH = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"


def tokens_expr(col: str = "text") -> str:
    """Whitespace tokens of the lower-cased, trimmed text (Spark SQL)."""
    return f"split(lower(trim({col})), '\\\\s+')"


def sql_tokens(col: str = "text") -> str:
    """DuckDB twin of :func:`tokens_expr`."""
    return f"string_split_regex(lower(trim({col})), '\\s+')"


def top_freq_expr(toks: str = "toks") -> str:
    """Max multiplicity of any element of a non-empty string array:
    run-length max over the sorted array — O(n log n) and one lambda
    pass, vs the O(distinct x n) ``array_max(transform(array_distinct(
    a), t -> size(filter(a, x -> x = t))))`` form it replaces (r11;
    bit-identical on every non-empty array, and ``split`` never
    produces an empty one — NULL in, NULL out on both forms)."""
    return (
        f"aggregate(sort_array({toks}), "
        "named_struct('best', 0, 'cur', 0, 'prev', cast(null as string)), "
        "(acc, x) -> named_struct("
        "'best', greatest(acc.best, if(x <=> acc.prev, acc.cur + 1, 1)), "
        "'cur', if(x <=> acc.prev, acc.cur + 1, 1), "
        "'prev', x), "
        "acc -> acc.best)"
    )


def shingles_expr(toks: str = "toks", k: int = 3) -> str:
    """k-word shingles of a token array (Spark SQL). Empty when < k."""
    terms = ", ".join(f"element_at({toks}, i+{j + 1})" for j in range(k))
    return (
        f"case when size({toks}) >= {k} "
        f"then transform(sequence(0, size({toks})-{k}), i -> concat_ws(' ', {terms})) "
        f"else array() end"
    )


def sql_shingles(toks: str = "toks", k: int = 3) -> str:
    """DuckDB twin of :func:`shingles_expr` (1-based list indexing)."""
    terms = " || ' ' || ".join(f"{toks}[i+{j}]" for j in range(k))
    return f"list_transform(generate_series(1, len({toks})-{k - 1}), i -> {terms})"


def _in_list(items: tuple[str, ...]) -> str:
    return ", ".join(f"'{w}'" for w in items)


def marker_count_expr(toks: str, lang: str) -> str:
    """Count of tokens that are markers for ``lang`` (Spark SQL)."""
    return f"size(filter({toks}, t -> t IN ({_in_list(LANG_MARKERS[lang])})))"


def sql_marker_count(toks: str, lang: str) -> str:
    """DuckDB twin of :func:`marker_count_expr`."""
    return f"len(list_filter({toks}, t -> t IN ({_in_list(LANG_MARKERS[lang])})))"


def lang_pred_case(score: dict[str, str]) -> str:
    """Shared CASE choosing the max-scoring language, alphabetical
    tiebreak, 'und' when all zero. ``score`` maps lang → score column
    name; the generated SQL parses identically in Spark and DuckDB."""
    langs = sorted(LANG_MARKERS)
    total = " + ".join(score[lg] for lg in langs)
    clauses = [f"WHEN ({total}) = 0 THEN 'und'"]
    for i, lg in enumerate(langs):
        rest = langs[i + 1:]
        if rest:
            cond = " AND ".join(f"{score[lg]} >= {score[o]}" for o in rest)
            clauses.append(f"WHEN {cond} THEN '{lg}'")
        else:
            clauses.append(f"ELSE '{lg}'")
    return "CASE " + " ".join(clauses) + " END"


def stopword_count_expr(toks: str) -> str:
    return f"size(filter({toks}, t -> t IN ({_in_list(STOPWORDS)})))"


def sql_stopword_count(toks: str) -> str:
    return f"len(list_filter({toks}, t -> t IN ({_in_list(STOPWORDS)})))"


def token_len_sum_expr(toks: str) -> str:
    """Total characters across tokens (Spark SQL fold — exact ints)."""
    return f"aggregate(transform({toks}, t -> length(t)), 0, (acc, x) -> acc + x)"


def sql_token_len_sum(toks: str) -> str:
    return f"CAST(list_sum(list_transform({toks}, t -> len(t))) AS INT)"


def quality_score_expr(toks: str = "toks", text: str = "text") -> str:
    """The corpus quality-score formula (t_quality_score's scalar:
    stop_ratio − punct_ratio + capped-length bonus) as ONE Spark SQL
    expression — the single source of truth for every consumer
    (t_quality_score's column pipeline, p_curriculum_stages' ranking,
    d_dedup_keep_best's survivor pick). Identical double arithmetic to
    :func:`sql_quality_score`, so scores are bit-equal cross-engine."""
    # empty / whitespace-only documents (zero tokens or zero chars —
    # real at corpus scale) score NULL, not an ANSI divide crash;
    # guarded here at the single source of truth for every consumer
    return (
        f"CASE WHEN size({toks}) = 0 OR length({text}) = 0"
        " THEN CAST(NULL AS DOUBLE) ELSE"
        f" CAST({stopword_count_expr(toks)} AS DOUBLE) / size({toks})"
        f" - CAST(regexp_count({text}, '{PUNCT_CLASS}') AS DOUBLE)"
        f" / length({text})"
        f" + CAST(least(size({toks}), 100) AS DOUBLE) / 1000 END"
    )


def sql_quality_score(toks: str = "toks", text: str = "text") -> str:
    """DuckDB twin of :func:`quality_score_expr`."""
    return (
        f"CASE WHEN len({toks}) = 0 OR length({text}) = 0"
        " THEN CAST(NULL AS DOUBLE) ELSE"
        f" CAST({sql_stopword_count(toks)} AS DOUBLE) / len({toks})"
        f" - CAST(len(regexp_extract_all({text}, '{PUNCT_CLASS}')) AS DOUBLE)"
        f" / length({text})"
        f" + CAST(least(len({toks}), 100) AS DOUBLE) / 1000 END"
    )

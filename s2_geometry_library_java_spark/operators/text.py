"""Text-analysis operators over ``documents``: language-ID, quality scoring,
token counting, fingerprinting.

Everything is native Spark SQL (regexp/string/array functions — JVM-side,
codegen'd); each op has a DuckDB-expressible twin with identical arithmetic
so the driver oracle states ground truth independently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# BPE-ish token regex: letter runs | single digits | single punctuation.
BPE_REGEX = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

# Tiny stopword sets per language for the n-gram/stopword language heuristic.
LANG_MARKERS = {
    "en": ["the", "a", "and", "of", "to"],
    "fr": ["le", "la", "et", "des", "un"],
    "de": ["der", "die", "und", "ein", "zu"],
}
EN_STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it", "for", "on"]


def _count_word_spark(col: str, w: str) -> str:
    # Count whole-word occurrences by splitting on spaces.
    return f"size(filter(split({col}, ' '), t -> t = '{w}'))"


def _count_word_duck(col: str, w: str) -> str:
    return f"len(list_filter(string_split({col}, ' '), t -> t = '{w}'))"


def lang_score_spark(col: str, lang: str) -> str:
    return "(" + " + ".join(_count_word_spark(col, w) for w in LANG_MARKERS[lang]) + ")"


def lang_score_duck(col: str, lang: str) -> str:
    return "(" + " + ".join(_count_word_duck(col, w) for w in LANG_MARKERS[lang]) + ")"


def langid_case(dialect: str, col: str = "text") -> str:
    """Deterministic argmax over language scores, ties -> en > fr > de."""
    sc = lang_score_spark if dialect == "spark" else lang_score_duck
    en, fr, de = sc(col, "en"), sc(col, "fr"), sc(col, "de")
    return (
        f"(case when {en} >= {fr} and {en} >= {de} then 'en' "
        f"when {fr} >= {de} then 'fr' else 'de' end)"
    )


def token_count_exprs(dialect: str, col: str = "text") -> dict[str, str]:
    if dialect == "spark":
        return {
            "n_ws_tokens": f"size(split({col}, ' '))",
            "n_bpe_tokens": f"size(regexp_extract_all({col}, '{BPE_REGEX}', 0))",
            "n_chars": f"length({col})",
        }
    return {
        "n_ws_tokens": f"len(string_split({col}, ' '))",
        "n_bpe_tokens": f"len(regexp_extract_all({col}, '{BPE_REGEX}'))",
        "n_chars": f"length({col})",
    }


def quality_exprs(dialect: str, col: str = "text") -> dict[str, str]:
    """Quality heuristics: mean word length, stopword ratio, alpha ratio and
    a combined score — identical arithmetic in both dialects."""
    if dialect == "spark":
        n_tok = f"size(split({col}, ' '))"
        stop = "(" + " + ".join(_count_word_spark(col, w) for w in EN_STOPWORDS) + ")"
        alpha = f"length(regexp_replace({col}, '[^A-Za-z]', ''))"
    else:
        n_tok = f"len(string_split({col}, ' '))"
        stop = "(" + " + ".join(_count_word_duck(col, w) for w in EN_STOPWORDS) + ")"
        alpha = f"length(regexp_replace({col}, '[^A-Za-z]', '', 'g'))"
    n_chars = f"length({col})"
    mean_wl = f"(cast({n_chars} - ({n_tok} - 1) as double) / {n_tok})"
    stop_ratio = f"(cast({stop} as double) / {n_tok})"
    alpha_ratio = f"(cast({alpha} as double) / {n_chars})"
    score = f"(0.4 * {stop_ratio} + 0.4 * {alpha_ratio} + 0.2 * (case when {mean_wl} between 3.0 and 8.0 then 1.0 else 0.0 end))"
    return {
        "mean_word_len": mean_wl,
        "stopword_ratio": stop_ratio,
        "alpha_ratio": alpha_ratio,
        "quality_score": score,
    }


def fingerprint_exprs(dialect: str, col: str = "text") -> dict[str, str]:
    """Content fingerprint: md5 hex + a 60-bit integer prefix."""
    if dialect == "spark":
        return {
            "fp_md5": f"md5({col})",
            "fp_long": f"cast(conv(substr(md5({col}), 1, 15), 16, 10) as bigint)",
        }
    return {
        "fp_md5": f"md5({col})",
        "fp_long": f"cast('0x' || substr(md5({col}), 1, 15) as bigint)",
    }


def repetition_exprs(dialect: str, col: str = "text") -> dict[str, str]:
    """Gopher-style repetition-quality metrics at the word level:
    duplicate-word fraction, top-word fraction, duplicate-bigram fraction.

    Repetitious documents (boilerplate, scraper loops, keyword stuffing)
    score high on all three; the standard corpus filter drops docs above a
    per-metric threshold.  All-native array/list expressions — the Spark
    side stays inside WholeStageCodegen, the DuckDB side states ground
    truth with identical arithmetic.

    COST: ``frac_top_word`` is O(distinct-words x words) per doc (the
    argmax over per-word counts); linear-in-doc metrics surround it.  At
    corpus scale that bounds per-row work by the max document length —
    cap upstream (the documents fixture tops out at a few hundred words)
    or length-truncate before profiling."""
    if dialect == "spark":
        # Bind the split-word array ONCE via the single-element-transform
        # idiom (see word_ngrams_spark: a named projection would be inlined
        # by Catalyst, re-running split() per lambda element).
        def bound(expr: str) -> str:
            return f"transform(array(split({col}, ' ')), ws -> {expr})[0]"

        n = "size(ws)"
        nd = "size(array_distinct(ws))"
        top = "array_max(transform(array_distinct(ws), w -> size(filter(ws, x -> x = w))))"
        g2 = "transform(sequence(1, greatest(1, size(ws) - 1)), i -> concat_ws(' ', slice(ws, i, 2)))"
        dup2 = f"(cast(size({g2}) - size(array_distinct({g2})) as double) / size({g2}))"
        return {
            "n_words": bound(n),
            "frac_dup_words": bound(f"(cast({n} - {nd} as double) / {n})"),
            "frac_top_word": bound(f"(cast({top} as double) / {n})"),
            "frac_dup_2grams": bound(dup2),
        }

    def boundd(expr: str) -> str:
        return f"list_transform([string_split({col}, ' ')], ws -> {expr})[1]"

    n = "len(ws)"
    nd = "len(list_distinct(ws))"
    top = "list_aggregate(list_transform(list_distinct(ws), w -> len(list_filter(ws, x -> x = w))), 'max')"
    g2 = "list_transform(range(1, greatest(1, len(ws) - 1) + 1), i -> array_to_string(list_slice(ws, i, i + 1), ' '))"
    dup2 = f"(cast(len({g2}) - len(list_distinct({g2})) as double) / len({g2}))"
    return {
        "n_words": boundd(n),
        "frac_dup_words": boundd(f"(cast({n} - {nd} as double) / {n})"),
        "frac_top_word": boundd(f"(cast({top} as double) / {n})"),
        "frac_dup_2grams": boundd(dup2),
    }


# ---------------------------------------------------------------------------
# DataFrame operators
# ---------------------------------------------------------------------------
def text_profile(docs: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc with language guess, token counts, quality metrics."""
    from s2_geometry_library_java_spark.operators.dedup import spread

    docs = spread(docs)
    cols = [F.col(id_col)]
    cols.append(F.expr(langid_case("spark", content_col)).alias("lang_guess"))
    for name, e in token_count_exprs("spark", content_col).items():
        cols.append(F.expr(e).alias(name))
    for name, e in quality_exprs("spark", content_col).items():
        cols.append(F.round(F.expr(e), 9).alias(name))
    for name, e in fingerprint_exprs("spark", content_col).items():
        cols.append(F.expr(e).alias(name))
    return docs.select(*cols)


def text_repetition(docs: DataFrame, content_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc with the word-level repetition metrics
    (:func:`repetition_exprs`), rounded for cross-engine hash stability."""
    from s2_geometry_library_java_spark.operators.dedup import spread

    cols = [F.col(id_col)]
    for name, e in repetition_exprs("spark", content_col).items():
        c = F.expr(e)
        cols.append((F.round(c, 9) if name.startswith("frac_") else c).alias(name))
    return spread(docs).select(*cols)

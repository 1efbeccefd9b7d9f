"""Text-analysis operators for training-data curation — all built-in
pyspark.sql.functions (JVM-side, codegen), no Python in the hot path.

Every formula here is plain ANSI-SQL-expressible so the DuckDB oracle can
replay it exactly (driver correctness gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Java's \s spelled out as an explicit class: RE2 (the DuckDB oracle's
# regex engine) defines \s WITHOUT \x0B (vertical tab), Java WITH — a real
# divergence the adversarial sweep's ninth axis caught on injected
# \x0B-separated text. Every whitespace class in this module uses the
# explicit form so both engines scan the identical language.
WS_CLASS = r"[ \t\n\x0B\f\r]"

# tiny per-language marker lexicons for the n-gram/stopword heuristic language id
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "a"],
    "es": ["el", "la", "de", "que", "y"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "des"],
    "zh": ["的", "是", "在", "了", "和"],
}


def _count_word(text_col, word: str):
    # count of whole-word occurrences: pad with spaces, count ' word ' hits.
    # regexp_count form: identical to the replace-diff count (both are one
    # left-to-right non-overlapping scan; \Q..\E quotes the needle) and
    # measured ~2x faster — the replace-diff builds a stripped copy of the
    # whole string per marker word (25 copies/row in lang_id) just to take
    # its length. The SQL oracles keep the replace arithmetic: same value.
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    return F.regexp_count(padded, F.lit(f"\\Q {word} \\E")).cast("long")


def _field_count(text_col, sep_regex: str):
    """len(split(x, sep)) without materializing the full field array:
    Spark's split keeps every empty field (limit -1), so field count ==
    separator-run count + 1 for EVERY string. Spark rewrites regexp_count
    to size(regexp_extract_all(...)), so this form still allocates a match
    array — but its entries are the SEPARATOR runs (whitespace bytes,
    typically a few % of the document), where the split form's fields are
    the entire content — at 100 TB a single pathological multi-MB document
    (minified bundle, concatenated log) turns the split form into a
    content-sized per-row allocation spike for no information.
    Bit-identical by the field/separator identity; pinned by pytest.
    Measured cost: ~16% slower than size(split) on typical ~300-char rows
    (1.24 vs 1.06 µs/row for \\s+) — accepted for the O(1) memory bound; a
    length-gated hybrid was measured and buys nothing (branch overhead
    eats the split advantage). The punct/marker regexp_count conversions
    in this module are 2-3.6x WINS, so the text family nets faster."""
    return F.regexp_count(text_col, F.lit(sep_regex)) + F.lit(1)


def token_count(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Whitespace tokens + a BPE-ish proxy (words + punctuation marks)."""
    ws = _field_count(F.trim(F.col(text_col)), WS_CLASS + "+")
    words = _field_count(F.trim(F.col(text_col)), r"[^\w]+")
    # count of non-word non-space chars directly: each single-char match of
    # the negated class is one punct char, so this equals
    # length(regexp_replace(text, '[\\w\\s]', '')) without materializing the
    # stripped copy — measured 3.6x faster at ~300-char rows
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w \t\n\x0B\f\r]"))
    return df.select(
        F.col(id_col),
        ws.alias("ws_tokens"),
        (words + punct).alias("bpe_ish_tokens"),
        F.length(text_col).alias("n_chars_computed"),
    )


def quality_score(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, punctuation ratio, stopword ratio,
    mean word length, plus a composite score. Deterministic integer/ratio math."""
    n_chars = F.length(text_col)
    n_tokens = _field_count(F.trim(F.col(text_col)), WS_CLASS + "+")
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^a-zA-Z0-9 \t\n\x0B\f\r一-鿿]"))
    stop_hits = None
    for w in LANG_MARKERS["en"]:
        c = _count_word(text_col, w)
        stop_hits = c if stop_hits is None else stop_hits + c
    mean_word_len = (n_chars - n_tokens + 1) / F.greatest(n_tokens, F.lit(1))
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars_q"),
        n_tokens.alias("n_tokens"),
        (punct / F.greatest(n_chars, F.lit(1))).alias("punct_ratio"),
        (stop_hits / F.greatest(n_tokens, F.lit(1))).alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
    )


def lang_id(df: DataFrame, text_col: str = "text",
            id_col: str = "doc_id") -> DataFrame:
    """Marker-word language heuristic: argmax over per-language marker hits.

    Ties resolve to the alphabetically-first language (deterministic; same
    rule in the SQL oracle)."""
    score_cols = []
    for lang in sorted(LANG_MARKERS):
        s = None
        for w in LANG_MARKERS[lang]:
            c = _count_word(text_col, w)
            s = c if s is None else s + c
        score_cols.append(s.alias(f"score_{lang}"))
    scored = df.select(F.col(id_col), F.col(text_col), *score_cols)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = None
    for lg in reversed(langs):  # earlier langs win ties -> apply last
        cond = F.when(F.col(f"score_{lg}") == best, F.lit(lg))
        pred = cond.otherwise(pred) if pred is not None else cond
    return scored.select(F.col(id_col), pred.alias("pred_lang"),
                         *[f"score_{lg}" for lg in langs])


def fingerprint(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: full-content hash + length-64 prefix hash
    (cheap rolling-window stand-in, all JVM-side)."""
    return df.select(
        F.col(id_col),
        F.xxhash64(text_col).alias("fp_full"),
        F.xxhash64(F.substring(F.col(text_col), 1, 64)).alias("fp_prefix"),
        F.sha2(F.col(text_col), 256).alias("content_sha"),
    )

"""Training-data curation operators: repetition quality signals,
corpus-statistics scoring, temperature-based corpus mixing, PII
scrubbing, and sequence packing.

These are the curation stages a large-scale LLM data pipeline runs
between dedup and training that the rest of the operator set did not yet
cover (reference scope: the t-digest repo has no analog — these extend the
engine's pipeline surface, same tier as dedup.py/text.py/sample.py):

  * ``repetition_signals`` — Gopher/C4-style within-document repetition
    features (duplicate-line fraction, top-token fraction) used to drop
    boilerplate and looping generations;
  * ``token_df_signals`` — corpus-statistics scoring (per-token document
    frequency summed per doc, hapax mass): the integer-exact perplexity
    proxy for rare/gibberish-vs-stereotypical ranking;
  * ``temperature_sample`` — per-group sampling probabilities
    p_g = min(1, f·N·c_g^tau / (sum_h c_h^tau · c_g)) that flatten a skewed
    group (language/source/domain) distribution toward uniform as tau -> 0,
    realized as a DETERMINISTIC md5 keep-predicate (sample.py's technique)
    so the mix is reproducible engine-to-engine and run-to-run;
  * ``pii_scrub`` — regex redaction (emails, IPv4) with per-document
    redaction counts, all JVM-side regexp_replace/regexp_count;
  * ``pack_chunks`` — GPT-style concat-and-chunk sequence packing: lay the
    corpus out in deterministic ``order_col`` order, cut fixed
    ``budget``-token chunk boundaries, and report each document's
    first-chunk index and chunk span. The global running-token-count uses
    refine.py's range-partitioned two-pass cumulative sum, NOT a
    single-task Window.orderBy — the one-reducer funnel would serialize
    the whole corpus at 100 TB.
  * ``pack_greedy`` — whole-document first-fit packing (no splitting)
    within each group, as an applyInPandas stage for when document
    integrity matters more than zero padding.

Every aggregate a gate consumes keeps integer arithmetic until one final
division (the engine-exact convention from text.py): ratios are
sum(int)/sum(int), never avg(double-ratio), so the DuckDB oracle matches
bit-for-bit regardless of partial-aggregation order.

Scale notes (100 TB):
  * repetition token counts explode to one row per token occurrence of the
    CONTENT_PREFIX_CAP-capped prefix — rows bounded per document, keys
    (doc_id, token) are high-cardinality and skew-free, and both groupBys
    are map-side-combinable;
  * temperature_sample's per-group count frame is group-cardinality-sized
    and broadcast back; the keep predicate is a codegen filter (md5 +
    string compare), no shuffle, no state;
  * pii_scrub is a pure per-row projection — scan-pipelined, zero shuffle;
  * pack_chunks shuffles only by range chunk (two passes over a 2-column
    projection), never funnels the corpus into one task.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from t_digest_spark.operators.dedup import CONTENT_PREFIX_CAP, _cap_text
from t_digest_spark.operators.refine import range_partitioned_cumsum
from t_digest_spark.operators.text import WS_CLASS

# ONE whitespace definition repo-wide: text.py's WS_CLASS — Java's \s
# spelled out explicitly ([ \t\n\x0B\f\r]) because RE2 (the DuckDB
# oracle's engine) excludes \x0B from \s. The explicit class keeps the
# Spark expression and the SQL oracle scanning the identical language on
# exotic whitespace, and keeps curation token counts consistent with the
# text.py token/quality family.
TOKEN_SEP = WS_CLASS + "+"

# Redaction patterns restricted to the Java-regex/RE2 common dialect
# (explicit classes, \b with ASCII \w, no lookaround).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _tokens(text: Column) -> Column:
    """Non-empty tokens of the trimmed text (empty/whitespace-only -> [])."""
    return F.filter(F.split(F.trim(text), TOKEN_SEP, -1), lambda t: t != "")


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id",
                       max_chars: Optional[int] = CONTENT_PREFIX_CAP,
                       keep_cols: tuple = ()) -> DataFrame:
    """Per-document repetition features over the first ``max_chars`` chars
    (repetition SIGNALS saturate long before the cap, same rationale as the
    dedup signature cap):

      n_lines / n_dup_lines   duplicate-line counts ('\\n'-split; a line
                              repeating an earlier line counts once per
                              repeat — Gopher's duplicate-line fraction
                              numerator/denominator, kept integral);
      n_tokens / max_token    total token occurrences and the count of the
                              single most frequent token (C4's top-token
                              fraction numerator, integral).

    EVERY feature here is row-local, and the plan is kept row-local too:
    lines via size/array_distinct, the token mode via sort + run-length
    fold (array_sort then one Catalyst `aggregate` pass tracking the
    longest equal run) — ZERO shuffle, no Python, no join. The first cut
    of this operator used explode -> two groupBys -> join back; that
    ships every token occurrence through two exchanges to compute numbers
    each row already determines (measured 1.8x slower at 1M docs,
    min-of-2 same session — and its exchanges scale with token count
    where this form scales with rows). The
    O(n log n) per-row sort is bounded by the content cap. Distributed
    token statistics that genuinely need cross-document state live in
    ``token_df_signals``.
    """
    capped = _cap_text(df.select(id_col, text_col, *keep_cols),
                       text_col, max_chars)
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n", -1)
    toks = _tokens(F.col(text_col))
    srt = F.array_sort(toks)
    zero = F.lit(0).cast("long")
    init = F.struct(F.lit("").alias("prev"), zero.alias("run"),
                    zero.alias("best"))

    def step(acc, x):
        run = (F.when(x == acc["prev"], acc["run"] + F.lit(1))
               .otherwise(F.lit(1)).cast("long"))
        return F.struct(x.alias("prev"), run.alias("run"),
                        F.greatest(acc["best"], run).alias("best"))

    max_tok = F.aggregate(srt, init, step, lambda acc: acc["best"])
    return capped.select(
        id_col, *keep_cols,
        F.size(lines).alias("n_lines"),
        (F.size(lines) - F.size(F.array_distinct(lines))).alias("n_dup_lines"),
        F.coalesce(max_tok, zero).alias("max_token"),
        F.coalesce(F.size(toks).cast("long"), zero).alias("n_tokens"),
    )


def token_df_signals(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     max_chars: Optional[int] = CONTENT_PREFIX_CAP,
                     keep_cols: tuple = ()) -> DataFrame:
    """Corpus-statistics quality signals: score each document by how
    COMMON its tokens are across the whole corpus — a perplexity proxy
    with exact integer arithmetic (a real n-gram LM's log-prob sums are
    float-order-dependent and would never hash-match an oracle; document
    frequency ranks documents the same way for the filtering use case).
    Per document:

      n_tokens      token occurrences (capped prefix, as repetition_signals);
      sum_tok_df    sum over occurrences of the token's corpus DOCUMENT
                    frequency (#docs containing it) — high = stereotypical
                    text, low = rare/gibberish;
      n_hapax       occurrences of corpus-hapax tokens (document frequency
                    1 — OOV-ish mass).

    Shape: one explode -> per-(doc, token) counts (map-side combinable,
    skew-free keys) -> the VOCABULARY aggregates from that same frame
    (token document frequency) -> join back on token. The join's build
    side is vocabulary-sized; hot tokens ('the') skew the probe side and
    are exactly what AQE skew-join splitting handles — leave AQE on (the
    session default here) at scale. Headroom: sum_tok_df <= n_tokens_cap x
    corpus docs per document (~1e15 at 2e4 x 5e10) — fits bigint per doc;
    EXACT corpus-wide sums of sum_tok_df overflow bigint around 1e19, so
    at production scale aggregate per-doc ratios (digest/mean), not raw
    corpus totals. The gate query's per-lang sums sit far below that.
    """
    capped = _cap_text(df.select(id_col, text_col, *keep_cols),
                       text_col, max_chars)
    # group/join ONLY on id_col: keep_cols ride on the base side (a NULL
    # keep column — a real group — would silently drop from an equality
    # join key and zero the doc's counts)
    toks = capped.select(id_col,
                         F.explode(_tokens(F.col(text_col))).alias("tok"))
    per_tok = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = per_tok.groupBy("tok").agg(
        F.count(F.lit(1)).cast("bigint").alias("df_docs"))
    per_doc = (per_tok.join(vocab, "tok")
               .groupBy(id_col).agg(
                   F.sum("c").cast("bigint").alias("n_tokens"),
                   F.sum(F.col("c") * F.col("df_docs")).cast("bigint")
                   .alias("sum_tok_df"),
                   F.sum(F.when(F.col("df_docs") == 1, F.col("c"))
                         .otherwise(0)).cast("bigint").alias("n_hapax")))
    out = (capped.select(id_col, *keep_cols)
           .join(per_doc, on=id_col, how="left"))
    for c in ("n_tokens", "sum_tok_df", "n_hapax"):
        out = out.withColumn(c, F.coalesce(c, F.lit(0)).cast("bigint"))
    return out


def strip_boilerplate(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", min_df: int = 2,
                      keep_cols: tuple = ()) -> DataFrame:
    """Cross-document boilerplate removal (the C4/CCNet line rule): drop
    every line that appears verbatim in >= ``min_df`` documents (cookie
    banners, footers, license headers), keep the rest in original order.

    Shape: posexplode lines -> line document-frequency from the distinct
    (doc, line) pairs (two map-side-combinable aggregates) -> join back
    on line (frequent lines are a probe-side hot key — AQE skew-join
    territory, exactly like token_df_signals' vocabulary join) -> filter
    -> reassemble per doc with an order-pinned collect
    (array_sort(collect_list(struct(pos, line)))). Reassembly is exact
    line surgery, so this stays FULL-content like dedup_exact, not
    prefix-capped. Documents whose every line is boilerplate come back
    as empty text, not dropped rows (left join on id alone; keep_cols
    ride the base side so NULL group values survive).

    Output: id, keep_cols, clean_text, n_lines_in, n_lines_kept,
    chars_in, chars_out — integer surgery accounting for the gate.
    """
    txt = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(txt, "\n", -1)
    base = df.select(id_col, *keep_cols,
                     F.size(lines).alias("n_lines_in"),
                     F.length(txt).cast("long").alias("chars_in"))
    ex = df.select(id_col, F.posexplode(lines).alias("pos", "line"))
    linedf = (ex.select(id_col, "line").distinct()
              .groupBy("line").agg(F.count(F.lit(1)).alias("__ldf__")))
    kept = (ex.join(linedf, "line")
            .where(F.col("__ldf__") < min_df))
    re_doc = kept.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"]),
            "\n").alias("clean_text"),
        F.count(F.lit(1)).cast("long").alias("n_lines_kept"))
    out = (base.join(re_doc, on=id_col, how="left")
           .withColumn("clean_text", F.coalesce("clean_text", F.lit("")))
           .withColumn("n_lines_kept",
                       F.coalesce("n_lines_kept", F.lit(0)).cast("long")))
    return out.withColumn("chars_out",
                          F.length("clean_text").cast("long"))


def temperature_probabilities(df: DataFrame, group_col: str,
                              target_fraction: float,
                              tau: float = 0.5) -> DataFrame:
    """Per-group keep probabilities for temperature-``tau`` mixing.

    With c_g the group's row count and N the total, the sampled corpus
    targets ``target_fraction * N`` rows allocated proportionally to
    c_g^tau (tau=1 keeps the natural mix, tau -> 0 flattens toward
    uniform), so the per-row keep probability is

        p_g = min(1, target_fraction * N * c_g^tau / (sum_h c_h^tau * c_g))

    Computed entirely in-plan (one tiny aggregate over group_col — NULL is
    a real group). The group weights are QUANTIZED to integer nano-units
    (floor(c^tau * 1e9) as bigint) before the cross-group reduction: a
    float sum's value depends on partial-aggregation order, so summing
    c_g^tau as doubles would make p_g differ in the last ulp run-to-run
    and engine-to-engine; the bigint sum is exact and order-free, and the
    final per-group p_g is then one fixed-order float expression over
    exact inputs — bit-identical in Spark and the DuckDB oracle. The 1e-9
    relative weight quantization is statistically irrelevant. tau=0.5 uses
    sqrt (correctly rounded everywhere); other taus use pow (engine-side
    parity only). Weight headroom: c^tau*1e9 <= 1e15 per group at c=1e12,
    tau=0.5 — thousands of such groups fit the bigint sum.
    Returns one row per group: (group_col, n_in, p_keep).
    """
    c = F.col("n_in").cast("double")
    w = F.sqrt(c) if tau == 0.5 else F.pow(c, F.lit(float(tau)))
    wq = F.floor(w * F.lit(1e9)).cast("bigint")
    counts = (df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_in"))
              .withColumn("__wq__", wq))
    tot = counts.agg(F.sum("n_in").alias("__n__"),
                     F.sum("__wq__").alias("__swq__"))
    return (counts.crossJoin(F.broadcast(tot))
            .select(group_col, "n_in",
                    F.least(F.lit(1.0),
                            (F.lit(float(target_fraction))
                             * F.col("__n__").cast("double")
                             * F.col("__wq__").cast("double"))
                            / (F.col("__swq__").cast("double")
                               * F.col("n_in").cast("double")))
                    .alias("p_keep")))


def _md5_key(key_col: str) -> Column:
    # sample.py's injective NULL-safe key encoding
    return F.md5(F.when(F.col(key_col).isNull(), F.lit("null:"))
                 .otherwise(F.concat(F.lit("k:"),
                                     F.col(key_col).cast("string"))))


def keep_by_probability(p: Column, key_col: str) -> Column:
    """Deterministic Bernoulli(p) on a key: keep iff the first 15 hex chars
    of md5(key) sort below p scaled into the 60-bit hex space. Pure
    codegen (md5 + string compare), reproducible engine-to-engine; p >= 1
    short-circuits (the 2^60 threshold would need 16 hex chars)."""
    thr = F.lower(F.lpad(
        F.hex(F.floor(p * F.lit(float(1 << 60))).cast("bigint")), 15, "0"))
    return (p >= 1.0) | (F.substring(_md5_key(key_col), 1, 15) < thr)


def temperature_sample(df: DataFrame, group_col: str, key_col: str,
                       target_fraction: float, tau: float = 0.5,
                       probs: Optional[DataFrame] = None) -> DataFrame:
    """Temperature-mixed deterministic sample: ``df`` filtered to the rows
    whose md5 draw clears their group's ``p_keep``. The probability frame
    is group-cardinality-sized and broadcast; the join is NULL-safe so a
    NULL group samples like any other. Pass a precomputed
    ``temperature_probabilities`` frame via ``probs`` when the caller also
    consumes it — otherwise the count aggregate's corpus scan runs twice
    (once here, once for the caller's copy)."""
    if probs is None:
        probs = temperature_probabilities(df, group_col, target_fraction, tau)
    probs = probs.select(F.col(group_col).alias("__grp__"), "p_keep")
    cond = df[group_col].eqNullSafe(F.col("__grp__"))
    return (df.join(F.broadcast(probs), cond)
            .where(keep_by_probability(F.col("p_keep"), key_col))
            .drop("__grp__", "p_keep"))


def pii_scrub(df: DataFrame, text_col: str = "text",
              id_col: str = "doc_id", keep_cols: tuple = ()) -> DataFrame:
    """Redact emails and IPv4 addresses; emit the scrubbed text plus
    per-document counts and the redacted character delta. One per-row
    projection, whole-stage codegen, no Python."""
    txt = F.coalesce(F.col(text_col), F.lit(""))
    scrubbed = F.regexp_replace(
        F.regexp_replace(txt, EMAIL_RE, "<EMAIL>"), IPV4_RE, "<IP>")
    return df.select(
        id_col, *keep_cols,
        scrubbed.alias("scrubbed_text"),
        F.regexp_count(txt, F.lit(EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(txt, F.lit(IPV4_RE)).cast("long").alias("n_ipv4"),
        F.length(txt).cast("long").alias("n_chars_in"),
        F.length(scrubbed).cast("long").alias("n_chars_out"),
    )


def pack_chunks(df: DataFrame, token_col: str, order_col: str,
                budget: int, num_chunks: int = 64,
                part_cols: tuple = ()) -> DataFrame:
    """Concat-and-chunk packing: documents laid end-to-end in ``order_col``
    order are cut into fixed ``budget``-token chunks (the GPT-style packing
    that splits documents at chunk boundaries). Adds

      first_chunk   = floor(tokens_before / budget)
      chunks_spanned = 0 for empty docs, else
                       floor((tokens_before + tokens - 1)/budget)
                       - first_chunk + 1

    ``tokens_before`` is an EXCLUSIVE running sum computed with the
    range-partitioned two-pass cumulative sum (refine.py) — a plain
    ``Window.orderBy(order_col)`` would funnel the whole corpus through
    one task. All integer arithmetic; ``order_col`` must be unique within
    a partition group for a deterministic layout (ties would make
    tokens_before order-dependent).

    ``part_cols`` packs each group into its OWN chunk sequence (chunk
    indices restart per group — per-shard/per-date packing, the realistic
    deployment shape: a 100 TB run packs within ingest shards so layout
    is insensitive to which shards exist). Empty = one global sequence.
    """
    cum = range_partitioned_cumsum(df, order_col, [token_col],
                                   part_cols=list(part_cols),
                                   num_chunks=num_chunks)
    before = (F.col(f"{token_col}_cum") - F.col(token_col)).cast("bigint")
    t = F.col(token_col).cast("bigint")
    first = F.floor(before / budget).cast("bigint")
    last = F.floor((before + t - F.lit(1)) / budget).cast("bigint")
    return (cum.withColumn("first_chunk", first)
            .withColumn("chunks_spanned",
                        F.when(t <= 0, F.lit(0)).otherwise(last - first + 1)
                        .cast("bigint"))
            .drop(f"{token_col}_cum"))


def pack_greedy(df: DataFrame, token_col: str, order_col: str,
                budget: int, group_col: Optional[str] = None) -> DataFrame:
    """Whole-document first-fit packing: walk each group in ``order_col``
    order, open a new bin whenever the next document does not fit, never
    split a document (documents longer than ``budget`` get a bin alone).
    Adds ``bin_id`` (unique across groups: an md5-derived salt of the
    group value offsets each group's id space — deterministic across
    runs, engines, and library versions) — an applyInPandas stage because
    the running reset-on-overflow accumulator has no closed window form.
    Per-group sequential by construction; parallelism comes from the
    group count, so group by shard/date at scale, not by a constant."""
    import hashlib

    import pandas as pd
    from pyspark.sql.types import LongType, StructField, StructType

    gcol = group_col or "__g__"
    src = df if group_col else df.withColumn(gcol, F.lit(0))
    # copy, don't .add(): StructType.add mutates the DataFrame's cached schema
    schema = StructType(list(src.schema.fields)
                        + [StructField("bin_id", LongType()),
                           StructField("bin_fill", LongType())])

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        g = pdf[gcol].iloc[0]
        base = 0 if group_col is None else (
            int(hashlib.md5(repr(g).encode()).hexdigest()[:10], 16) << 20)
        bins, fills = [], []
        bin_id, fill = base, 0
        for t in pdf[token_col].fillna(0).astype("int64"):
            if fill > 0 and fill + t > budget:
                bin_id, fill = bin_id + 1, 0
            fill += int(t)
            bins.append(bin_id)
            fills.append(fill)
            if fill >= budget:
                bin_id, fill = bin_id + 1, 0
        pdf["bin_id"] = pd.Series(bins, dtype="int64")
        pdf["bin_fill"] = pd.Series(fills, dtype="int64")
        return pdf

    out = src.groupBy(gcol).applyInPandas(pack, schema=schema)
    return out.drop("__g__") if not group_col else out

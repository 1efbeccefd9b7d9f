"""Adversarial-data correctness sweep: the standard oracle gate on a
PERTURBED copy of the smallest SF.

The driver's gate (scripts/check_oracle.py) certifies every query against
its DuckDB oracle on the well-formed synthetic tables — which contain no
NULLs, no empty strings, no zero vectors, no exact-duplicate rows, and no
pathological skew. That leaves a latent-divergence class the full-diff
review actually hit once (the hll gate's ALL-row NULL scope): query and
oracle can agree on clean data while disagreeing on shapes a 100 TB
production table WILL contain. This script sweeps that class across all
62 gates for every shape it injects (the class is open-ended — each new
divergence found should become a new injected shape here):

  1. copy sf0.001 to a temp dir;
  2. inject, deterministically (fixed arrays, no RNG):
     - events: NULL event_type / user_id / value / props rows, an exact
       duplicate burst (ties in every column but event_id), a hot user
       with 200 extra events (skew), +/-1e12 value outliers, a NaN value,
       and +/-inf values (overflow telemetry — sketches must carry
       infinite extremes without NaN-poisoning or Arrow-null crashes);
     - documents: empty text, whitespace-only text, NULL lang, NULL
       source, exact-duplicate text pairs (dedup fodder), a 1-char doc,
       multibyte/non-ASCII docs (CJK, accents, NFD combining marks,
       astral-plane emoji, RTL Arabic, exotic whitespace) probing every
       byte-vs-codepoint seam between Spark and the DuckDB oracles, and
       two ~115k-char giant docs sharing an identical first-100k prefix
       (beyond CONTENT_PREFIX_CAP: capped signatures collapse them,
       exact dedup separates them, text expressions stay oracle-equal
       on giant strings), and curation-hostile PII/repetition shapes
       (boundary IPs, 1-letter TLDs, edge-flush emails, vertical-tab
       separators, saturated duplicate lines, a 30k-char single token);
     - embeddings: an all-zero vector (cosine division hazard), exact
       clone pairs, a NULL label;
     - orders: tie-priced orders, a NULL o_orderpriority;
     - lineitem: tie-priced rows under one returnflag.
  3. run every queries() entry on Spark and its oracle_sql() on DuckDB
     over the perturbed tables, with check_oracle's exact compare.

A mismatch here is a latent query/oracle semantic divergence; a crash is
an operator that a production NULL would kill. Both are findings even
while the clean-data gate stays green.

Usage: python scripts/check_oracle_adversarial.py [query_name ...]
Env:   ADVERSARIAL_BASE_SF (default /root/testdata/sf0.001)
       ADVERSARIAL_KEEP=1 to keep the perturbed dir for inspection
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from scripts.check_oracle import compare

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def _append(path: str, extra: pd.DataFrame) -> None:
    """Append rows to a parquet file, preserving the original schema."""
    orig = pq.read_table(path)
    extra_tb = pa.Table.from_pandas(extra, preserve_index=False)
    extra_tb = extra_tb.select(orig.column_names).cast(orig.schema)
    pq.write_table(pa.concat_tables([orig, extra_tb]), path)


def perturb_events(path: str) -> None:
    base = pq.read_table(path).to_pandas()
    t0 = base["ts"].iloc[0]
    nid = int(base["event_id"].max()) + 1
    rows = []
    # NULL singletons, one per nullable column
    rows.append(dict(event_id=nid, ts=t0, user_id=7, event_type=None,
                     value=1.5, props='{"k":1}'))
    rows.append(dict(event_id=nid + 1, ts=t0, user_id=None,
                     event_type="click", value=2.5, props='{"k":2}'))
    rows.append(dict(event_id=nid + 2, ts=t0, user_id=8,
                     event_type="view", value=None, props='{"k":3}'))
    rows.append(dict(event_id=nid + 3, ts=t0, user_id=9,
                     event_type="click", value=3.5, props=None))
    # exact-tie burst: 6 rows identical in every column but event_id
    for i in range(6):
        rows.append(dict(event_id=nid + 10 + i, ts=t0, user_id=11,
                         event_type="purchase", value=42.0, props='{"t":1}'))
    # hot user: 200 extra events on one key (skew)
    hot_ts = base["ts"].iloc[:200].tolist()
    for i in range(200):
        rows.append(dict(event_id=nid + 100 + i, ts=hot_ts[i], user_id=13,
                         event_type="view", value=float(i % 7),
                         props='{"hot":true}'))
    # extreme-magnitude values
    rows.append(dict(event_id=nid + 500, ts=t0, user_id=14,
                     event_type="error", value=1e12, props="{}"))
    rows.append(dict(event_id=nid + 501, ts=t0, user_id=14,
                     event_type="error", value=-1e12, props="{}"))
    # NaN value (distinct failure mode from NULL: compares false, not
    # NULL, and poisons max/avg if it reaches them)
    rows.append(dict(event_id=nid + 502, ts=t0, user_id=15,
                     event_type="error", value=float("nan"), props="{}"))
    # NULL-heavy value cohort: ~14% of one type's values NULL, so a
    # count(*)-denominator rank fraction deflates past every bound
    # (a single NULL row would hide inside the bounds)
    for i in range(30):
        rows.append(dict(event_id=nid + 600 + i, ts=hot_ts[i], user_id=16,
                         event_type="signup", value=None, props="{}"))
    # +/-inf values (fourth axis): production telemetry emits inf from
    # overflow/div-by-zero upstream. Distinct failure mode from both NULL
    # (inf aggregates) and NaN (inf compares normally): sum/avg go inf on
    # BOTH engines (must hash equal), quantile sketches must keep +/-inf
    # as the forced min/max endpoint singletons without NaN-poisoning
    # interior centroids (inf*w stays inf; the merge sweep never merges
    # the two ends together), and rank contracts must treat inf as just
    # the extreme order statistic.
    rows.append(dict(event_id=nid + 700, ts=t0, user_id=17,
                     event_type="error", value=float("inf"), props="{}"))
    rows.append(dict(event_id=nid + 701, ts=t0, user_id=17,
                     event_type="error", value=float("-inf"), props="{}"))
    # timestamp axis (fifth): production event time is not confined to the
    # generator's tidy window. Pre-1970 (negative epoch — calendar-based
    # date_trunc must not suffer integer-division truncation-toward-zero),
    # epoch 0 and epoch -1us (the sign boundary), day-boundary microsecond
    # ties (23:59:59.999999 vs 00:00:00.000000 must truncate to DIFFERENT
    # days on both engines), and far past/future (1950/2200, inside the
    # pandas ns range so Arrow round-trips). The streaming gates replay
    # time-ordered chunks, so the extremes also pin watermark behavior:
    # Spark's watermark initializes at epoch 0, so the 1950 and
    # 1969-12-31 rows (day windows ending <= 1970-01-01) are dropped as
    # late in their FIRST micro-batch — this sweep caught that, and the
    # gates + oracles now state the epoch floor explicitly; the 2200 row
    # lands in the last batch (nothing after it to drop).
    ts_probes = [
        pd.Timestamp("1950-06-15 12:00:00"),
        pd.Timestamp("1970-01-01 00:00:00"),
        pd.Timestamp("1969-12-31 23:59:59.999999"),
        pd.Timestamp("2024-02-29 23:59:59.999999"),   # leap-day boundary
        pd.Timestamp("2024-03-01 00:00:00"),
        pd.Timestamp("2200-01-01 00:00:00"),
    ]
    for i, tp in enumerate(ts_probes):
        rows.append(dict(event_id=nid + 800 + i, ts=tp, user_id=18,
                         event_type="click", value=5.0 + i, props="{}"))
    # JSON axis (sixth): sidecar JSON columns in production carry
    # truncated writes, non-JSON garbage, and every scalar shape a
    # permissive producer emits. Spark's get_json_object returns NULL on
    # malformed input and the legacy cast NULLs non-integral strings;
    # DuckDB's json functions RAISE on malformed JSON and strict casts
    # raise on 'abc' — the oracle must restate Spark's null-on-dirt
    # semantics (json_valid guard + TRY_CAST) or the first garbage row
    # kills the backfill query that validates the pipeline.
    json_probes = [
        '{"k":1',                     # truncated write
        'not json at all',            # garbage
        '',                           # empty string (not valid JSON)
        '{}',                         # valid, key missing
        '{"k":"abc"}',                # non-numeric string
        '{"k":" 7 "}',                # numeric string w/ spaces (cast trims)
        '{"k":1.7}',                  # float (legacy long cast -> NULL)
        '{"k":1e2}',                  # scientific notation
        '{"k":true}',                 # boolean
        '{"k":null}',                 # JSON null
        '{"k":[1,2]}',                # array
        '{"k":{"a":1}}',              # nested object
        '{"k":12345678901234567890}', # > int64 max
        '{"k":1,"k":2}',              # duplicate key
    ]
    for i, jp in enumerate(json_probes):
        rows.append(dict(event_id=nid + 900 + i, ts=t0, user_id=19,
                         event_type="view", value=1.0, props=jp))
    # grouping-key shapes: empty string is NOT NULL (its own group on
    # both engines), whitespace-only and non-ASCII keys survive the
    # shuffle hash, and case variants stay DISTINCT groups (no engine
    # may case-fold a group key)
    for i, et in enumerate(["", " ", "café☕", "Click"]):
        rows.append(dict(event_id=nid + 950 + i, ts=t0, user_id=20,
                         event_type=et, value=2.0 + i, props="{}"))
    # extreme int64 user ids: the full i64 domain must survive every
    # hash path (xxhash64/murmur bucketing, theta/HLL/count-min,
    # bottom-k) — abs(hash) patterns overflow at INT64_MIN, pmod must
    # stay non-negative, and DISTINCT must agree with the oracle
    for i, uid in enumerate([-(2**63), 2**63 - 1, -1, 0]):
        rows.append(dict(event_id=nid + 960 + i, ts=t0, user_id=uid,
                         event_type="click", value=3.0 + i, props="{}"))
    df = pd.DataFrame(rows)
    # pandas coerces a mixed int/None column to float64, which cannot
    # represent the INT64_MIN/MAX probes; nullable Int64 keeps them exact
    df["user_id"] = pd.array([r.get("user_id") for r in rows], dtype="Int64")
    _append(path, df)


def perturb_documents(path: str) -> None:
    base = pq.read_table(path).to_pandas()
    nid = int(base["doc_id"].max()) + 1
    dup_text = str(base["text"].iloc[0])
    rows = [
        dict(doc_id=nid, text="", lang="en", source="web", n_chars=0),
        dict(doc_id=nid + 1, text="   \n\t  ", lang="en", source="web",
             n_chars=7),
        dict(doc_id=nid + 2, text="hello world", lang=None, source="web",
             n_chars=11),
        dict(doc_id=nid + 3, text="bonjour", lang="fr", source=None,
             n_chars=7),
        # exact duplicate pair of an existing doc (dedup fodder)
        dict(doc_id=nid + 4, text=dup_text, lang=str(base["lang"].iloc[0]),
             source="mirror", n_chars=int(base["n_chars"].iloc[0])),
        dict(doc_id=nid + 5, text=dup_text, lang=str(base["lang"].iloc[0]),
             source="mirror", n_chars=int(base["n_chars"].iloc[0])),
        dict(doc_id=nid + 6, text="x", lang="zh", source="web", n_chars=1),
    ]
    # Multibyte / non-ASCII shapes (fourth axis): a web-scale corpus is
    # mostly NOT ASCII. These probe every byte-vs-codepoint seam between
    # Spark (UTF8String code points, Java regex) and the DuckDB oracles
    # (UTF-8, RE2): length(), substr/shingles, token regexes, sha2 over
    # UTF-8 bytes, and the astral plane (surrogate pairs in UTF-16 — a
    # Java-side length() that counted UTF-16 units would diverge here).
    uni = [
        "中文文档测试 数据 去重 索引 分析 中文文档测试 数据",   # CJK, no ASCII spaces inside tokens
        "café résumé naïve élève café",  # Latin-1 accents
        "café resumé naive",                       # combining marks (NFD)
        "\U0001F600 \U0001F680 emoji doc \U0001F600 \U0001D11E",  # astral plane
        "مرحبا بالعالم rtl text",  # Arabic RTL
        "tab\tsep nbsp emspace mixed​zwsp",     # exotic whitespace
    ]
    for i, tx in enumerate(uni):
        rows.append(dict(doc_id=nid + 10 + i, text=tx,
                         lang=("zh" if i == 0 else "en"), source="web",
                         n_chars=len(tx)))
    # Giant-document axis (eighth): a production code corpus carries
    # multi-MB minified bundles / concatenated logs among sub-kB files.
    # Two ~115k-char docs share an identical first-100k prefix (longer
    # than dedup.CONTENT_PREFIX_CAP) and diverge after it. They exercise:
    # the capped MinHash kernel inside the full-table minhash gate (the
    # planted-clone recall contract must hold with giants in the corpus),
    # exact dedup separating them (full-content sha — tails differ), and
    # every full-content text expression (regexp_count field/punct/marker
    # counts, fingerprints, length histograms) against the DuckDB oracle
    # on 115k-char strings. Deterministic: fixed multiplicative-hash word
    # streams, no RNG.
    prefix = " ".join(f"w{(i * 2654435761) % 1000003}"
                      for i in range(14000))           # ~118k chars
    assert len(prefix) > 100_000
    for j, tailseed in enumerate((97, 193)):
        tail = " ".join(f"t{(i * tailseed + 3) % 9973}"
                        for i in range(1500))          # ~10k chars, differs
        tx = prefix + " " + tail
        rows.append(dict(doc_id=nid + 20 + j, text=tx, lang="en",
                         source="bundle", n_chars=len(tx)))
    # Curation-hostile shapes (ninth axis): organic PII-ish strings that
    # probe the Java-regex-vs-RE2 seam the pii/repetition/packing gates
    # ride on — boundary IPs (the \b..\b pattern intentionally accepts
    # 999.999.999.999; both engines must agree), 1-letter TLDs ({2,} must
    # reject), emails flush at string edges, dotted-quad runs longer than
    # 4 octets, an IP glued inside an email's domain, vertical-tab
    # "whitespace" (\x0B splits under \s but NOT under the ASCII-explicit
    # token class — pinned), massively repeated lines/tokens (the Gopher
    # signals' saturation case), and a doc that is ONE 30k-char token
    # (packing/token-count work bound).
    pii = [
        "a@b.co",                                       # email IS the doc
        "no-match a@b.c trailing",                      # 1-letter TLD: no hit
        "edge 999.999.999.999 case",                    # out-of-range octets
        "run 1.2.3.4.5.6 over",                         # 6-octet dotted run
        "x@10.1.2.3.com and bare 10.1.2.3",             # IP inside email domain
        "end with mail user.name+tag@sub.domain.org",   # match at string end
        "a\x0bb 1.2.3.4\x0bc@d.ee",                     # vertical-tab seams
        ("dup line\n" * 40) + ("tok " * 200),           # repetition saturation
        "K" * 30_000,                                   # one giant token
        "win line\r\nwin line\r\nlast",                 # CRLF endings: lines
                                                        # keep their \r, dup
                                                        # detection sees
                                                        # 'win line\r' twice
        "mixed\nunix\r\nwin\rbare-cr",                  # mixed EOL conventions
    ]
    for i, tx in enumerate(pii):
        rows.append(dict(doc_id=nid + 30 + i, text=tx, lang="en",
                         source="pii", n_chars=len(tx)))
    _append(path, pd.DataFrame(rows))


def perturb_embeddings(path: str) -> None:
    base = pq.read_table(path).to_pandas()
    nid = int(base["vec_id"].max()) + 1
    dim = len(base["embedding"].iloc[0])
    clone = [float(x) for x in base["embedding"].iloc[0]]
    rows = [
        # all-zero vector: cosine denominators must not divide by zero
        dict(vec_id=nid, embedding=[0.0] * dim, label=0),
        # exact clone pair of an existing vector
        dict(vec_id=nid + 1, embedding=clone, label=int(base["label"].iloc[0])),
        dict(vec_id=nid + 2, embedding=clone, label=int(base["label"].iloc[0])),
        # NULL label
        dict(vec_id=nid + 3, embedding=clone, label=None),
        # corrupted-vector axis (seventh): production embedding corpora
        # carry encoder failures. A NaN component poisons dot products
        # and norms (NaN cosine must rank LAST everywhere, like the
        # zero-norm guard, not propagate into top-k results); an inf
        # component makes norm inf (cosine 0/inf or inf/inf); a
        # huge-magnitude component (1e200) overflows norm*norm to inf
        # even though each value is finite; a WRONG-dimension vector
        # (truncated write) must not crash zip_with folds or numpy
        # stacking — engines treat missing positions as absent/null,
        # and fixed-dim kernels (IVF) must reject or skip it, not die.
        dict(vec_id=nid + 4,
             embedding=[float("nan")] + [0.1] * (dim - 1), label=1),
        dict(vec_id=nid + 5,
             embedding=[float("inf")] + [0.1] * (dim - 1), label=1),
        dict(vec_id=nid + 6,
             embedding=[1e200] + [0.1] * (dim - 1), label=1),
        dict(vec_id=nid + 7, embedding=[0.5] * (dim // 2), label=1),
        dict(vec_id=nid + 8, embedding=[], label=1),
        # NULL element, distinct from NaN: pandas->Arrow converts NaN
        # list elements to null, so the nid+4 row lands on disk as a
        # null-element row too — this one makes the shape explicit, and
        # the arrow-native append below preserves nid+4's TRUE NaN.
        dict(vec_id=nid + 9,
             embedding=[None] + [0.1] * (dim - 1), label=1),
    ]
    # Build the embedding column with pyarrow directly: from_pandas would
    # silently rewrite the NaN component as null (pandas' null sentinel),
    # collapsing the NaN and null probes into one shape.
    orig = pq.read_table(path)
    etype = orig.schema.field("embedding").type
    extra_tb = pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        "embedding": pa.array([r["embedding"] for r in rows],
                              pa.list_(pa.float64())).cast(etype),
        "label": pa.array([r["label"] for r in rows], pa.int32()),
    }).select(orig.column_names).cast(orig.schema)
    pq.write_table(pa.concat_tables([orig, extra_tb]), path)


def perturb_orders(path: str) -> None:
    base = pq.read_table(path).to_pandas()
    nid = int(base["o_orderkey"].max()) + 1
    t0 = base["o_orderdate"].iloc[0]
    rows = [
        dict(o_orderkey=nid + i, o_custkey=int(base["o_custkey"].iloc[0]),
             o_orderstatus="F", o_totalprice=55555.55, o_orderdate=t0,
             o_orderpriority="3-MEDIUM")
        for i in range(4)                     # tie-priced burst
    ]
    rows.append(dict(o_orderkey=nid + 10,
                     o_custkey=int(base["o_custkey"].iloc[1]),
                     o_orderstatus="O", o_totalprice=77.77, o_orderdate=t0,
                     o_orderpriority=None))   # NULL group key
    _append(path, pd.DataFrame(rows))


def perturb_lineitem(path: str) -> None:
    base = pq.read_table(path).to_pandas()
    nkey = int(base["l_orderkey"].max()) + 1
    t0 = base["l_shipdate"].iloc[0]
    rows = [
        dict(l_orderkey=nkey, l_partkey=1, l_suppkey=1, l_linenumber=i + 1,
             l_quantity=25.0, l_extendedprice=1234.56, l_discount=0.05,
             l_tax=0.02, l_returnflag="N", l_linestatus="O", l_shipdate=t0)
        for i in range(5)                     # tie-priced burst, one flag
    ]
    # +/-inf prices, under DIFFERENT returnflags so no single group sums
    # +inf with -inf into NaN (both engines would agree on the NaN, but
    # per-flag +/-inf extremes are the sharper probe: the AVL/merging
    # digest gates must carry an infinite min or max without NaN-poisoning
    # interior centroids, and band/range predicates must exclude inf
    # identically on both engines).
    rows.append(dict(l_orderkey=nkey + 20, l_partkey=3, l_suppkey=3,
                     l_linenumber=1, l_quantity=1.0,
                     l_extendedprice=float("inf"), l_discount=0.0,
                     l_tax=0.0, l_returnflag="A", l_linestatus="F",
                     l_shipdate=t0))
    rows.append(dict(l_orderkey=nkey + 21, l_partkey=3, l_suppkey=3,
                     l_linenumber=1, l_quantity=1.0,
                     l_extendedprice=float("-inf"), l_discount=0.0,
                     l_tax=0.0, l_returnflag="R", l_linestatus="F",
                     l_shipdate=t0))
    # NULL group key: SQL GROUP BY keeps a NULL l_returnflag group — the
    # contract joins and the exact-quantile refinement must too. Ten rows
    # (orderkeys nkey+1..): enough that the group survives the 1-in-10
    # orderkey slice some gates apply.
    for i in range(10):
        rows.append(dict(
            l_orderkey=nkey + 1 + i, l_partkey=2, l_suppkey=2,
            l_linenumber=1, l_quantity=1.0,
            l_extendedprice=100.0 + 7.0 * i, l_discount=0.0, l_tax=0.0,
            l_returnflag=None, l_linestatus="O", l_shipdate=t0))
    _append(path, pd.DataFrame(rows))


def build_adversarial_dir(base_sf: str, dest: str) -> None:
    for t in TABLES:
        shutil.copy(os.path.join(base_sf, f"{t}.parquet"),
                    os.path.join(dest, f"{t}.parquet"))
    perturb_events(os.path.join(dest, "events.parquet"))
    perturb_documents(os.path.join(dest, "documents.parquet"))
    perturb_embeddings(os.path.join(dest, "embeddings.parquet"))
    perturb_orders(os.path.join(dest, "orders.parquet"))
    perturb_lineitem(os.path.join(dest, "lineitem.parquet"))


def build_empty_dir(base_sf: str, dest: str) -> None:
    """ADVERSARIAL_EMPTY=1 variant: every table schema-identical but
    0 rows — a 100 TB pipeline hits empty filters/partitions routinely,
    and empty inputs flush out driver-side collect()[0] patterns,
    divide-by-zero contract arithmetic, and empty streaming staging."""
    for t in TABLES:
        src = os.path.join(base_sf, f"{t}.parquet")
        tb = pq.read_table(src)
        pq.write_table(tb.slice(0, 0), os.path.join(dest, f"{t}.parquet"))


def main():
    base_sf = os.environ.get("ADVERSARIAL_BASE_SF", "/root/testdata/sf0.001")
    only = set(sys.argv[1:])
    dest = tempfile.mkdtemp(prefix="tdigest_adversarial_")
    if os.environ.get("ADVERSARIAL_EMPTY") == "1":
        build_empty_dir(base_sf, dest)
        print(f"EMPTY tables in {dest}")
    else:
        build_adversarial_dir(base_sf, dest)
        print(f"perturbed tables in {dest}")

    import __spark_entry__ as entrymod
    from t_digest_spark.plans import get_spark
    spark = get_spark("oracle-check-adversarial", master="local[8]",
                      shuffle_partitions=8)

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE OR REPLACE VIEW {t} AS "
                    f"SELECT * FROM read_parquet('{dest}/{t}.parquet')")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    n_pass = n_fail = n_err = n_rows_only = 0
    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        print(f"== {name}")
        try:
            spark_pdf = fn(spark, dest).toPandas()
        except Exception as e:
            print(f"  SPARK ERROR: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            failures.append((name, "spark_error"))
            continue
        if name not in oracles:
            print(f"  rows-only: {len(spark_pdf)} rows")
            n_rows_only += 1
            continue
        try:
            oracle_pdf = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  ORACLE ERROR: {type(e).__name__}: {str(e)[:300]}")
            n_err += 1
            failures.append((name, "oracle_error"))
            continue
        if compare(name, spark_pdf, oracle_pdf):
            print(f"  OK ({len(spark_pdf)} rows)")
            n_pass += 1
        else:
            n_fail += 1
            failures.append((name, "mismatch"))
    print(f"\npass={n_pass} fail={n_fail} err={n_err} rows_only={n_rows_only}")
    if failures:
        print("failures:", failures)
    spark.stop()
    if os.environ.get("ADVERSARIAL_KEEP") != "1":
        shutil.rmtree(dest, ignore_errors=True)
    else:
        print(f"kept: {dest}")
    sys.exit(1 if (n_fail or n_err) else 0)


if __name__ == "__main__":
    main()

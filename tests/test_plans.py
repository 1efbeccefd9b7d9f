"""Physical-plan regression guards: the plan properties PLANS.md documents
must survive future changes — pushdown, pruning, zero raw-row shuffle,
broadcast joins, map-side combine."""

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("plan-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().toString()


def test_raw_partial_build_has_no_shuffle(spark, lineitem):
    """The digest partial build must run on the input partitioning — an
    Exchange here would shuffle raw rows (the 100 TB anti-pattern)."""
    from t_digest_spark.operators import tdigest_partial_build
    plan = _plan(tdigest_partial_build(lineitem, "l_extendedprice", ["l_returnflag"]))
    assert "MapInPandas" in plan
    assert "Exchange" not in plan
    assert "ReadSchema: struct<l_extendedprice:double,l_returnflag:string>" in plan


def test_scan_pushdown_and_pruning(spark, lineitem):
    from t_digest_spark.operators import tdigest_partial_build
    filtered = lineitem.where(F.col("l_shipdate") >= "1995-01-01")
    plan = _plan(tdigest_partial_build(filtered, "l_extendedprice", ["l_returnflag"]))
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate," in plan
    # only the three needed columns reach the scan
    assert "l_extendedprice:double,l_returnflag:string,l_shipdate" in plan


def test_pre_aggregate_hash_agg_before_python(spark, lineitem):
    """pre_aggregate plan: HashAggregate (map-side combine) must sit BELOW
    MapInPandas so duplicates collapse before the Arrow boundary."""
    from t_digest_spark.operators import tdigest_partial_build
    plan = _plan(tdigest_partial_build(lineitem, "l_extendedprice",
                                       ["l_returnflag"], pre_aggregate=True))
    i_map = plan.index("MapInPandas")
    i_agg = plan.index("HashAggregate")
    assert i_agg > i_map  # toString prints top-down: aggregate below = after index
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_dimension_joins_broadcast(spark):
    import __spark_entry__ as em
    df = em.queries()["top_revenue_nations"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan


def test_histogram_single_aggregate_no_udf(spark):
    from t_digest_spark.operators.histogram import (HistogramSpec,
                                                    histogram_aggregate)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    spec = HistogramSpec(0.0, 8192.0, n_bins=16, kind="linear")
    plan = _plan(histogram_aggregate(
        docs.select("lang", F.length("text").alias("len")), "len", ["lang"], spec))
    assert "HashAggregate" in plan
    for marker in ("MapInPandas", "FlatMapGroupsInPandas", "BatchEvalPython",
                   "ArrowEvalPython"):
        assert marker not in plan, marker


def test_exact_dedup_no_window(spark):
    from t_digest_spark.operators.dedup import dedup_exact
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(dedup_exact(docs))
    assert "Window" not in plan           # min() aggregate, not row_number
    assert plan.count("HashAggregate") >= 2  # partial+final combine


def test_topk_no_window_funnel(spark):
    """Top-k per key must not contain a Window node (a Window partitioned by
    a #groups-cardinality key funnels each key through one task); the
    per-partition maxima aggregate must have map-side combine and the
    threshold join must broadcast."""
    import __spark_entry__ as em
    df = em.queries()["events_top3_per_type"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "Window" not in plan
    assert plan.count("HashAggregate") >= 4   # pmax partial+final, merge partial+final
    assert "BroadcastHashJoin" in plan        # threshold table joins broadcast


def test_dedup_pipeline_candidate_driven_join_order(spark):
    """Candidate-restricted Jaccard: the candidate pairs must DRIVE the
    shingle joins (restriction before aggregation), not filter the
    quadratic all-pairs shingle self-join afterwards. Guard: the plan's
    first aggregate above the shingle join already groups (id_a, id_b) —
    i.e., there is exactly one common-count aggregate and no aggregate on
    the unrestricted pair space."""
    from t_digest_spark.operators.dedup import (minhash_lsh_candidates,
                                                ngram_jaccard_pairs)
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    cands = minhash_lsh_candidates(docs, num_hashes=64, bands=16, n=5)
    out = ngram_jaccard_pairs(docs, n=5, threshold=0.9, candidates=cands)
    opt = out._jdf.queryExecution().optimizedPlan().toString()
    # the optimized plan joins shingles onto the candidate set; the
    # all-pairs form instead contains a join keyed ONLY on shingle equality
    import re
    assert "id_a" in opt and "id_b" in opt
    shingle_only_join = re.search(r"Join Inner, \(shingle#\d+ = shingle#\d+\)\s*$",
                                  opt, re.MULTILINE)
    assert shingle_only_join is None


def test_ivf_no_corpus_crossjoin(spark):
    """IVF probe path: the candidate join must be keyed on the cell column —
    no cartesian/broadcast-nested-loop over the corpus."""
    import numpy as np
    from t_digest_spark.operators.ivf import ivf_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = np.random.default_rng(1).standard_normal((8, 64))
    plan = _plan(ivf_topk(emb, cents, k=3, nprobe=2))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_rerank_jvm_side_and_spread(spark):
    """Round-4 plan contract for the IVF re-rank (BENCH.md §10): the
    pair-scale cosine is pure Catalyst — the ONLY Python evals in the plan
    are the two probe/assign UDFs over corpus-row-scale inputs — and the
    candidate pairs hash-repartition on query_id before the re-rank so the
    explosion never runs inside the probe task; the top-k window reuses
    that partitioning instead of adding its own exchange."""
    import numpy as np
    from t_digest_spark.operators.ivf import ivf_topk
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = np.random.default_rng(1).standard_normal((8, 64))
    plan = _plan(ivf_topk(emb, cents, k=3, nprobe=2))
    # the only Python-eval sites are the corpus-row-scale assign/probe UDFs
    # (the assign subtree prints twice under the join); none at pair scale
    assert 0 < plan.count("ArrowEvalPython") <= 3
    # the window's input partitioning comes from our explicit repartition —
    # exactly one hash exchange on query_id in the whole plan, and nothing
    # ABOVE it (the re-rank cosine + top-k window) evaluates Python
    assert plan.count("Exchange hashpartitioning(query_id") == 1
    above = plan[:plan.index("Exchange hashpartitioning(query_id")]
    assert "ArrowEvalPython" not in above and "pythonUDF" not in above
    # pair spread survives AQE: the repartition is by-number, not advisory
    assert "REPARTITION_BY_NUM" in plan


def test_no_driver_side_data_materialization_in_queries():
    """Source guard (VERDICT r2 #2): no gate-query path may collect a
    data-scale DataFrame on the driver. `.toPandas(` is banned outright in
    __spark_entry__.py; `.collect(` is allowed only in the documented
    few-row patterns (single-value aggregates and _materialize_small)."""
    import pathlib
    src = (pathlib.Path(__file__).parent.parent / "__spark_entry__.py").read_text()
    assert ".toPandas(" not in src, \
        "driver-side toPandas() found in __spark_entry__.py gate queries"
    allowed_collect_markers = ("F.max(\"count\")).collect()[0][0]",
                               "spark.createDataFrame(df.collect(), df.schema)",
                               "# group-count digest rows")
    lines = [ln for ln in src.splitlines() if ".collect()" in ln]
    for ln in lines:
        assert any(m in ln for m in allowed_collect_markers), \
            f"unreviewed .collect() in __spark_entry__.py: {ln.strip()}"


def test_ivf_cell_partition_pruning(spark, tmp_path):
    """The IVF docstring claims the cell column is a write-once partition
    column at scale so probes prune at the scan — prove it: write the index
    partitioned by cell, read back with a cell filter, and assert the scan
    carries partition filters (full pruning, no post-scan cell filter)."""
    import numpy as np
    from t_digest_spark.operators.ivf import ivf_index
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = np.random.default_rng(1).standard_normal((8, 64))
    out = str(tmp_path / "ivf_cells")
    ivf_index(emb, cents).write.partitionBy("cell").parquet(out)
    probed = spark.read.parquet(out).where(F.col("cell").isin(1, 3))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    assert "cell" in plan.split("PartitionFilters:")[1].split("]")[0]
    assert probed.count() > 0


def test_theta_partial_build_no_shuffle_and_jvm_hash(spark):
    """Theta partial build: the key hashes in codegen (xxhash64 visible in
    the plan, no Python eval below MapInPandas) and no Exchange touches raw
    rows — partials of <= k+1 longs are all that shuffles."""
    from t_digest_spark.sketches.spark import theta_aggregate
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sk = theta_aggregate(ev, "user_id", ["event_type"], k=1024)
    plan = _plan(sk)
    pre_merge = plan[plan.index("MapInPandas"):]
    assert "xxhash64" in pre_merge                 # JVM-side hashing
    assert "Exchange" not in pre_merge             # no raw-row shuffle
    # column pruning reaches the scan: only the two needed columns
    assert "ReadSchema: struct<user_id:bigint" in plan or \
        "ReadSchema: struct<event_type:string,user_id:bigint>" in plan


def test_frequent_partial_build_no_shuffle(spark):
    from t_digest_spark.sketches.spark import frequent_aggregate
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = _plan(frequent_aggregate(ev, "user_id", ["event_type"], k=64))
    pre_merge = plan[plan.index("MapInPandas"):]
    assert "Exchange" not in pre_merge


def test_bottomk_sample_partial_no_shuffle(spark):
    """The distinct-sample partial keeps <= k pairs per partition; the only
    Exchange in the plan must sit ABOVE MapInPandas (merging partials), so
    the full distinct set never shuffles."""
    from t_digest_spark.sketches.spark import bottomk_distinct_sample
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plan = _plan(bottomk_distinct_sample(ev, "user_id", ["event_type"], k=5))
    pre_merge = plan[plan.index("MapInPandas"):]
    assert "Exchange" not in pre_merge
    assert "md5" in pre_merge                      # hash computed JVM-side


def test_theta_binary_op_broadcasts_sketch_rows(spark):
    """Set-algebra joins move sketch rows (<= k longs), never raw keys —
    the plan must broadcast the second operand."""
    from t_digest_spark.sketches.spark import theta_aggregate, theta_binary_op
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    sk = theta_aggregate(ev, "user_id", ["event_type"], k=256)
    a = sk.where("event_type = 'click'").drop("event_type")
    b = sk.where("event_type = 'view'").drop("event_type")
    plan = _plan(theta_binary_op(a, b, "intersect"))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_theta_rollup_reuses_fine_sketches(spark):
    """Coarser rollup levels merge the tiny fine-grained sketch rows; no
    second scan of the raw table appears in the day-level plan."""
    from t_digest_spark.sketches.spark import theta_aggregate, theta_merge
    import pyspark.sql.functions as F
    ev = (spark.read.parquet("/root/testdata/sf0.001/events.parquet")
          .select(F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                  .alias("day"), "event_type", "user_id"))
    fine = theta_aggregate(ev, "user_id", ["day", "event_type"], k=256).cache()
    fine.count()   # materialize the cache
    plan = _plan(theta_merge(fine, ["day"], k=256))
    # InMemoryTableScan = the merge reads cached sketch rows. (The cached
    # relation's DEFINITION still prints its parquet scan inside the plan
    # string, but it does not re-execute once materialized.)
    assert "InMemoryTableScan" in plan
    fine.unpersist()


def test_compare_flags_exact_ks_no_full_domain_sort(spark):
    """The exact-KS side of digest_compare_flags must use the
    range-partitioned cumsum: any window ordering by the value domain must
    also partition by the chunk column (one task per (cmp, chunk), ~1/32 of
    a flag's domain), and the old full-domain form — partition by cmp
    alone, order by x — must not reappear (VERDICT r4 #5)."""
    import re
    import __spark_entry__ as em
    df = em.queries()["digest_compare_flags"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "__chunk__" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    domain_specs = [s for s in specs if re.search(r"\bx#\d+ ASC", s)]
    assert domain_specs, "expected a window ordered by the value domain"
    for s in domain_specs:
        assert "__chunk__" in s, f"full-domain sort window found: {s}"


def test_nullsafe_contract_join_is_broadcast_hash(spark):
    """The null-safe contract joins (_join_est_nullsafe) must still plan
    as BroadcastHashJoin: Spark lowers eqNullSafe to (coalesce, isnull)
    composite hash keys, NOT a nested-loop — the property that keeps the
    join-back O(rows) at 100 TB. Guards against a regression to
    BroadcastNestedLoopJoin if the join condition is ever rewritten in a
    form Catalyst can't hash."""
    import __spark_entry__ as em
    df = em.queries()["digest_rollup"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "NestedLoop" not in plan


def test_pack_chunks_no_full_corpus_sort(spark):
    """pack_chunks' running token sum must keep the range-partitioned
    two-pass shape: every window ordered by the layout key (doc_id) must
    also partition by the chunk column (one task per chunk, ~1/num_chunks
    of the corpus), never a single-task global orderBy."""
    import re
    import __spark_entry__ as em
    df = em.queries()["pack_chunks"](spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "__chunk__" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    doc_specs = [s for s in specs if re.search(r"\bdoc_id#\d+L? ASC", s)]
    assert doc_specs, "expected a window ordered by doc_id"
    for s in doc_specs:
        assert "__chunk__" in s, f"global-sort window found: {s}"


def test_temperature_sample_is_broadcast_filter(spark):
    """temperature_sample's probability join must broadcast the tiny
    per-group frame (BroadcastHashJoin on the null-safe composite keys) so
    the corpus-side scan stays a pipelined filter — no shuffle of the data
    rows, no nested loop against the corpus."""
    import __spark_entry__ as em
    from t_digest_spark.operators.curation import temperature_sample
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(temperature_sample(docs, "lang", "doc_id", 0.4))
    # the only join touching the corpus-sized side must be broadcast-hash;
    # the IdentityBroadcast cross of the two 1-row/5-row aggregate frames
    # inside temperature_probabilities is constant-sized and fine
    assert "BroadcastHashJoin" in plan
    corpus_joins = [ln for ln in plan.splitlines()
                    if "NestedLoopJoin" in ln and "BuildRight" in ln
                    and "Cross" not in ln]
    assert not corpus_joins, corpus_joins
    # md5 keep-predicate evaluates in the join/filter, not a Python UDF
    assert "pythonUDF" not in plan.lower()


def test_repetition_signals_shuffle_free_and_pruned(spark):
    """repetition_signals is row-local end to end: the sort+run-length
    fold replaced the explode->groupBy->join form, so the plan must have
    NO exchange, no join, no Python — one pruned scan and a projection."""
    from t_digest_spark.operators.curation import repetition_signals
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(repetition_signals(docs, keep_cols=("lang",)))
    assert "Exchange" not in plan and "Join" not in plan
    assert "pythonUDF" not in plan.lower()
    assert "ReadSchema: struct<doc_id:bigint,text:string,lang:string>" in plan


def test_pii_scrub_is_single_projection(spark):
    """pii_scrub must stay a shuffle-free per-row projection."""
    from t_digest_spark.operators.curation import pii_scrub
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(pii_scrub(docs))
    assert "Exchange" not in plan
    assert "Scan parquet" in plan


def test_strip_boilerplate_plan_shape(spark):
    """strip_boilerplate: line-DF aggregates partially combine map-side,
    the reassembly is an aggregate (no window funnel), and no Python."""
    from t_digest_spark.operators.curation import strip_boilerplate
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    plan = _plan(strip_boilerplate(docs, keep_cols=("lang",)))
    assert "partial_count" in plan
    assert "Window" not in plan
    assert "pythonUDF" not in plan.lower()

"""Connected components (large-star/small-star) vs a NumPy union-find oracle,
plus the transitive dedup-survivor integration the pair-level pipeline needs."""

import numpy as np
import pandas as pd
import pytest

import pyspark.sql.functions as F

from t_digest_spark.operators.components import (connected_components,
                                                 dedup_survivors)


@pytest.fixture(scope="module")
def spark():
    from t_digest_spark.plans import get_spark
    s = get_spark("components-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


# ----------------------------------------------------------------- oracle

def _union_find(n_ids, edges):
    """Min-label components by union-find — the exact oracle."""
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {i: find(i) for i in n_ids}


def _edges_df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame({"src": [int(a) for a, _ in edges],
                      "dst": [int(b) for _, b in edges]}),
        schema="src long, dst long")


def _labels(df):
    return {r["id"]: r["component"] for r in df.collect()}


def _assert_matches_oracle(spark, edges, vertices=None):
    ids = sorted({v for e in edges for v in e}
                 | (set(vertices) if vertices else set()))
    oracle = _union_find(ids, edges)
    vdf = (spark.createDataFrame(pd.DataFrame({"id": ids}), "id long")
           if vertices is not None else None)
    got = _labels(connected_components(_edges_df(spark, edges), vertices=vdf))
    want = oracle if vertices is not None else \
        {i: c for i, c in oracle.items()
         if any(i in e for e in edges)}
    assert got == want


# ------------------------------------------------------------------ tests

def test_chain_needs_iterations(spark):
    # a path graph of 33 vertices: diameter 32, the worst case for naive
    # propagation — star contraction must still converge (O(log n) rounds)
    edges = [(i, i + 1) for i in range(32)]
    got = _labels(connected_components(_edges_df(spark, edges)))
    assert got == {i: 0 for i in range(33)}


def test_random_graphs_match_union_find(spark):
    rng = np.random.default_rng(7)
    for trial in range(4):
        n = 60
        m = int(rng.integers(20, 80))
        edges = [tuple(sorted(map(int, rng.integers(0, n, 2))))
                 for _ in range(m)]
        edges = [(a, b) for a, b in edges if a != b]
        _assert_matches_oracle(spark, edges, vertices=range(n))


def test_giant_star_no_collect_list(spark):
    # one hub connected to 5000 spokes — the giant-component dedup pathology.
    # groupBy-min handles it; a collect_list formulation would OOM-shape here.
    edges = [(0, i) for i in range(1, 5001)]
    labels = connected_components(_edges_df(spark, edges))
    assert labels.where(F.col("component") != 0).count() == 0
    assert labels.count() == 5001


def test_two_components_and_isolated_vertices(spark):
    edges = [(10, 11), (11, 12), (20, 21)]
    vdf = spark.createDataFrame(
        pd.DataFrame({"id": [10, 11, 12, 20, 21, 99]}), "id long")
    got = _labels(connected_components(_edges_df(spark, edges), vertices=vdf))
    assert got == {10: 10, 11: 10, 12: 10, 20: 20, 21: 20, 99: 99}


def test_empty_edges(spark):
    vdf = spark.createDataFrame(pd.DataFrame({"id": [1, 2]}), "id long")
    e = _edges_df(spark, []).where(F.lit(False))
    got = _labels(connected_components(e, vertices=vdf))
    assert got == {1: 1, 2: 2}


def test_duplicate_and_reversed_edges_canonicalize(spark):
    edges = [(3, 1), (1, 3), (3, 1), (5, 3)]
    got = _labels(connected_components(_edges_df(spark, edges)))
    assert got == {1: 1, 3: 1, 5: 1}


def test_survivors_transitive_chain(spark):
    # a~b, b~c but (a,c) never verified as a pair: min-per-pair would keep
    # two survivors of {a,b,c}; components keep exactly one
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": [100, 101, 200], "id_b": [101, 102, 201]}),
        "id_a long, id_b long")
    vdf = spark.createDataFrame(
        pd.DataFrame({"doc_id": [100, 101, 102, 200, 201, 300]}),
        "doc_id long")
    out = dedup_survivors(pairs, vertices=vdf).toPandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert list(out["component"]) == [100, 100, 100, 200, 200, 300]
    assert list(out["is_survivor"]) == [True, False, False, True, False, True]
    assert out.groupby("component")["is_survivor"].sum().eq(1).all()


def test_survivors_from_real_jaccard_chain(spark):
    # end-to-end: progressively mutated texts form a similarity CHAIN under
    # 3-gram Jaccard at threshold 0.5 — adjacent versions match, the ends
    # don't — and dedup_survivors still collapses the chain to one cluster.
    from t_digest_spark.operators.dedup import ngram_jaccard_pairs
    base = "the quick brown fox jumps over the lazy dog " * 4
    texts = [base,
             base[: len(base) // 2] + "zebra lion tiger bear wolf " * 2,
             "zebra lion tiger bear wolf " * 2 + "red green blue cyan " * 3,
             "completely different content about spark and parquet " * 3]
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(4), "text": texts}))
    pairs = ngram_jaccard_pairs(docs, n=3, threshold=0.2)
    got_pairs = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got_pairs and (1, 2) in got_pairs
    assert (0, 2) not in got_pairs            # the chain is genuinely a chain
    out = dedup_survivors(pairs, vertices=docs.select("doc_id")).toPandas()
    comp = dict(zip(out["doc_id"], out["component"]))
    assert comp[0] == comp[1] == comp[2] == 0  # transitive closure
    assert comp[3] == 3
    assert int(out["is_survivor"].sum()) == 2  # one per cluster

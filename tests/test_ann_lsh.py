"""LSH cosine ANN: recall vs the exact brute-force top-k."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.ann import cosine_topk, cosine_topk_lsh

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def test_lsh_recall_against_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vec")
    ).persist()
    exact = cosine_topk(emb, emb, k=5).toPandas()
    approx = cosine_topk_lsh(emb, emb, k=5, n_bits=16, bands=8).toPandas()
    want = {
        (q, n) for q, n in zip(exact["query_id"], exact["neighbor_id"])
    }
    got = {(q, n) for q, n in zip(approx["query_id"], approx["neighbor_id"])}
    recall = len(want & got) / len(want)
    # 8 bands of 2 bits give high collision probability for near neighbors
    assert recall >= 0.8, recall
    # every reported similarity must be exact (re-ranking is exact cosine)
    merged = approx.merge(
        exact, on=["query_id", "neighbor_id"], suffixes=("_a", "_e")
    )
    np.testing.assert_allclose(merged["score_a"], merged["score_e"], atol=1e-12)


def test_ivf_recall_and_exactness(spark):
    from metric_search_spark.operators.ann import ivf_topk, l2_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    ).persist()
    exact = l2_topk(emb, emb, k=5).toPandas()
    want = {(q, n) for q, n in zip(exact["query_id"], exact["neighbor_id"])}
    # full-probe IVF (n_probe == n_lists) must be EXACT
    full = ivf_topk(emb, emb, k=5, n_lists=8, n_probe=8).toPandas()
    got_full = {(q, n) for q, n in zip(full["query_id"], full["neighbor_id"])}
    assert got_full == want
    # partial-probe IVF is the approximate tier: decent recall, deterministic
    part = ivf_topk(emb, emb, k=5, n_lists=8, n_probe=3, seed=11).toPandas()
    got_part = {(q, n) for q, n in zip(part["query_id"], part["neighbor_id"])}
    recall = len(want & got_part) / len(want)
    assert recall >= 0.6, recall
    part2 = ivf_topk(emb, emb, k=5, n_lists=8, n_probe=3, seed=11).toPandas()
    got_part2 = {(q, n) for q, n in zip(part2["query_id"], part2["neighbor_id"])}
    assert got_part == got_part2  # deterministic per seed


def test_lsh_candidate_dedup_carries_ids_only(spark):
    """VERDICT r2 item 4: the candidate-dedup exchange must shuffle
    (query_id, neighbor_id) pairs only — vectors re-join AFTER the distinct,
    so no HashAggregate/Exchange group key includes a _v_* column."""
    import re

    from metric_search_spark.plans.inspect import explain_text

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    from metric_search_spark.plans.inspect import exchange_partition_keys

    out = cosine_topk_lsh(emb, emb, k=5, n_bits=16, bands=8)
    txt = explain_text(out)
    # every aggregate key list in the plan (the distinct) must be id-only
    keysets = re.findall(r"Keys \[\d+\]: \[([^\]]*)\]", txt)
    assert keysets, "no aggregate in plan — pin would be vacuous"
    for ks in keysets:
        assert "_v_" not in ks, ks
    # and no hash exchange partitions on a vector column (simple-mode
    # parse: formatted mode splits 'Exchange'/'hashpartitioning' across
    # lines and silently matched nothing)
    ex = exchange_partition_keys(out)
    assert ex, "no shuffle exchanges found — pin would be vacuous"
    for ks in ex:
        assert "_v_" not in ks, ks

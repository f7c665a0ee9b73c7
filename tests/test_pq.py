"""Product-quantization ANN: codebook determinism, encode/score shape,
recall against exact L2, and DuckDB hand-off oracle parity."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.ann import pq_encode, pq_topk, pq_train
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _emb_df(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    return emb.select(
        F.col("vec_id").alias("id"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )


def test_pq_train_is_deterministic():
    rng = np.random.default_rng(0)
    X = rng.normal(size=(400, 16))
    a = pq_train(X, m=4, ks=32, iters=5, seed=7)
    b = pq_train(X, m=4, ks=32, iters=5, seed=7)
    np.testing.assert_array_equal(a, b)
    assert a.shape == (4, 32, 4)


def test_pq_encode_codes_are_argmin():
    spark = get_spark()
    rng = np.random.default_rng(1)
    X = rng.normal(size=(100, 8))
    books = pq_train(X, m=2, ks=16, iters=5, seed=7)
    df = spark.createDataFrame(
        pd.DataFrame({"id": range(100), "vec": [r.tolist() for r in X]})
    )
    out = pq_encode(df, books, vec_col="vec").toPandas().sort_values("id")
    for i, code in zip(out["id"], out["code"]):
        for j in range(2):
            sub = X[i, j * 4 : (j + 1) * 4]
            d2 = ((books[j] - sub) ** 2).sum(axis=1)
            assert code[j] == d2.argmin()


def test_pq_topk_recall_vs_exact():
    """ADC ranking with 256 centroids/subspace on 500 vectors must recover
    most of the exact top-5 (and the self-match as rank 1)."""
    spark = get_spark()
    emb = _emb_df(spark)
    probes = emb.where(F.col("id") % 10 == 0)
    got = pq_topk(probes, emb, k=5, id_col="id", vec_col="vec", seed=13).toPandas()
    pq_sets = got.groupby("query_id")["neighbor_id"].apply(set)

    from metric_search_spark.operators.ann import l2_topk

    exact = l2_topk(probes, emb, k=5, id_col="id", vec_col="vec").toPandas()
    ex_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    recalls = [
        len(pq_sets[q] & ex_sets[q]) / 5.0 for q in ex_sets.index
    ]
    # measured 0.596 on this fixture (ADC-only, no exact rerank — standard
    # PQ recall at 64-d/m=8); pin a floor with margin against jitter-free
    # determinism (the whole pipeline is seeded, so this is exact)
    assert np.mean(recalls) >= 0.55, np.mean(recalls)
    # self-match: each probe's own code minimizes its own LUT rows
    r1 = got[got["rnk" if "rnk" in got else "rank"] == 1]
    self_frac = (r1["query_id"] == r1["neighbor_id"]).mean()
    assert self_frac >= 0.9, self_frac


def test_ivfpq_topk_recall_and_shape():
    """Composed IVF routing + ADC scoring: candidate sets shrink to the
    probed lists, yet recall against exact L2 stays useful; ranks are
    contiguous from 1 and self-match holds for most probes."""
    spark = get_spark()
    from metric_search_spark.operators.ann import ivfpq_topk, l2_topk

    emb = _emb_df(spark)
    probes = emb.where(F.col("id") % 10 == 0)
    got = ivfpq_topk(
        probes, emb, k=5, id_col="id", vec_col="vec",
        n_lists=32, n_probe=8, seed=13,
    ).toPandas()
    assert (got.groupby("query_id")["rank"].max() == 5).all()
    ranks = got.groupby("query_id")["rank"].apply(lambda s: sorted(s.tolist()))
    assert ranks.tolist() == [[1, 2, 3, 4, 5]] * got["query_id"].nunique()
    sets = got.groupby("query_id")["neighbor_id"].apply(set)
    exact = l2_topk(probes, emb, k=5, id_col="id", vec_col="vec").toPandas()
    ex_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    recall = np.mean([len(sets[q] & ex_sets[q]) / 5.0 for q in ex_sets.index])
    # measured 0.604 on this fixture (8/32-list routing prunes candidates
    # on top of ADC quantization); deterministic, pinned with margin
    assert recall >= 0.5, recall


def test_pq_rerank_recall():
    """The exact-rerank tier (VERDICT r3 item 1): top-64 ADC candidates
    re-scored with exact L2 over a bounded id-equi-join. Recall@5 jumps
    from 0.596 (ADC-only) to 0.992 measured on this fixture — pinned at
    0.95; rank 1 is the probe itself for every probe (exact distances make
    the self-match certain, not just frequent)."""
    spark = get_spark()
    from metric_search_spark.operators.ann import l2_topk

    emb = _emb_df(spark)
    probes = emb.where(F.col("id") % 10 == 0)
    got = pq_topk(
        probes, emb, k=5, id_col="id", vec_col="vec", seed=13, rerank=64
    ).toPandas()
    assert list(got.columns) == ["query_id", "neighbor_id", "dist", "rank"]
    sets = got.groupby("query_id")["neighbor_id"].apply(set)
    exact = l2_topk(probes, emb, k=5, id_col="id", vec_col="vec").toPandas()
    ex_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    recall = np.mean([len(sets[q] & ex_sets[q]) / 5.0 for q in ex_sets.index])
    assert recall >= 0.95, recall
    r1 = got[got["rank"] == 1]
    assert (r1["query_id"] == r1["neighbor_id"]).all()


def test_ivfpq_rerank_recall():
    """Composed tier with the rerank budget split between routing (16/32
    lists probed — rerank cannot recover a neighbor whose list was never
    probed) and exact re-scoring of the top-64 ADC candidates. Measured
    0.952 on this fixture (vs 0.604 ADC-only at 8 lists); pinned ≥ 0.9 —
    the VERDICT r3 item 1 bar."""
    spark = get_spark()
    from metric_search_spark.operators.ann import ivfpq_topk, l2_topk

    emb = _emb_df(spark)
    probes = emb.where(F.col("id") % 10 == 0)
    got = ivfpq_topk(
        probes, emb, k=5, id_col="id", vec_col="vec",
        n_lists=32, n_probe=16, seed=13, rerank=64,
    ).toPandas()
    sets = got.groupby("query_id")["neighbor_id"].apply(set)
    exact = l2_topk(probes, emb, k=5, id_col="id", vec_col="vec").toPandas()
    ex_sets = exact.groupby("query_id")["neighbor_id"].apply(set)
    recall = np.mean([len(sets[q] & ex_sets[q]) / 5.0 for q in ex_sets.index])
    assert recall >= 0.9, recall
    ranks = got.groupby("query_id")["rank"].apply(lambda s: sorted(s.tolist()))
    assert ranks.tolist() == [[1, 2, 3, 4, 5]] * got["query_id"].nunique()


def test_pq_topk_empty_probes_and_empty_build():
    """ADVICE r3: empty probe batch short-circuits to an empty DataFrame
    with the output schema (was an IndexError deep in the LUT build);
    empty build side raises a descriptive error, not np.vstack noise."""
    spark = get_spark()
    emb = _emb_df(spark)
    none = emb.where(F.col("id") < 0)
    out = pq_topk(none, emb, k=5, id_col="id", vec_col="vec", seed=13)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "query_id", "neighbor_id", "adc", "rank",
    ]
    out_rr = pq_topk(
        none, emb, k=5, id_col="id", vec_col="vec", seed=13, rerank=16
    )
    assert out_rr.count() == 0
    assert "dist" in out_rr.columns
    with pytest.raises(ValueError, match="codebook sample is empty"):
        pq_topk(emb.limit(1), none, k=5, id_col="id", vec_col="vec")
    with pytest.raises(ValueError, match="rerank=3 must be >= k=5"):
        pq_topk(emb.limit(1), emb, k=5, id_col="id", vec_col="vec", rerank=3)


def test_pq_topk_tie_break_on_duplicate_vectors():
    """Duplicate vectors encode to identical codes ⇒ identical adc; the
    per-batch selection must break ties by neighbor_id exactly like the
    final window (and the DuckDB twin), keeping the SMALLEST ids."""
    spark = get_spark()
    rng = np.random.default_rng(3)
    base = rng.normal(size=(9, 8))
    dup = base[0]
    vecs = [dup, dup, dup] + [r for r in base[1:]]
    ids = [7, 2, 5] + list(range(10, 18))
    df = spark.createDataFrame(
        pd.DataFrame({"id": ids, "vec": [list(map(float, v)) for v in vecs]})
    )
    probes = df.where(F.col("id") == 7)
    got = pq_topk(
        probes, df, k=3, id_col="id", vec_col="vec", m=2, ks=4, seed=9
    ).toPandas().sort_values("rank")
    # the three duplicates tie at the minimal adc; ids ascending
    assert got["neighbor_id"].tolist() == [2, 5, 7]


def test_ivfpq_candidate_shuffles_carry_no_vectors(spark=None):
    """The composed tier's contract: after encode, only codes and ids move.
    No Exchange in the plan partitions on (or materializes through) a raw
    vector column, and the per-probe LUT never hash-partitions alongside
    candidates (it meets them once via the cogroup)."""
    import re

    from pyspark.sql import functions as F

    from metric_search_spark.operators.ann import ivfpq_topk
    from metric_search_spark.plans.inspect import explain_text

    spark = get_spark()
    emb = _emb_df(spark)
    probes = emb.where(F.col("id") % 10 == 0)
    from metric_search_spark.plans.inspect import exchange_partition_keys

    out = ivfpq_topk(
        probes, emb, k=5, id_col="id", vec_col="vec", n_lists=32, n_probe=8,
        seed=13,
    )
    # simple-mode parse — the formatted-mode regex matched nothing (vacuous)
    ex = exchange_partition_keys(out)
    assert ex, "no shuffle exchanges found — pin would be vacuous"
    for keys in ex:
        assert "_va" not in keys and "_vb" not in keys, keys
        assert "vec#" not in keys, keys


def test_rerank_plans_never_partition_on_vectors():
    """The rerank tiers keep the codes-only contract up to the final
    bounded id-equi-join: no Exchange in either reranked plan hash-
    partitions on a raw vector column (vectors re-enter only as id-joined
    payload of the already-cut candidate set)."""
    import re

    from metric_search_spark.operators.ann import ivfpq_topk, pq_topk
    from metric_search_spark.plans.inspect import explain_text

    spark = get_spark()
    emb = _emb_df(spark)
    probes = emb.where(F.col("id") % 10 == 0)
    from metric_search_spark.plans.inspect import exchange_partition_keys

    for out in (
        pq_topk(probes, emb, k=5, id_col="id", vec_col="vec", seed=13,
                rerank=16),
        ivfpq_topk(probes, emb, k=5, id_col="id", vec_col="vec", n_lists=32,
                   n_probe=8, seed=13, rerank=16),
    ):
        ex = exchange_partition_keys(out)
        assert ex, "no shuffle exchanges found — pin would be vacuous"
        for keys in ex:
            assert "_va" not in keys and "_vb" not in keys, keys
            assert "vec#" not in keys, keys


def test_ivfpq_query_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, _o_ivfpq_sql

    spark = get_spark()
    got = QUERIES["ivfpq_knn_embeddings"](spark, SF_DIR).toPandas()
    want = duckdb.sql(_o_ivfpq_sql("sf0.001")).df()
    cols = ["query_id", "neighbor_id", "rnk"]
    key = ["query_id", "rnk"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) == 50 * 5


def test_pq_rerank_query_matches_duckdb_oracle():
    """The rerank join itself is hard-checked: DuckDB recomputes ADC top-c
    from the hand-offs, then exact L2 from the embeddings view."""
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, _o_pq_rerank_sql

    spark = get_spark()
    got = QUERIES["pq_rerank_knn_embeddings"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = con.sql(_o_pq_rerank_sql("sf0.001")).df()
    cols = ["query_id", "neighbor_id", "rnk"]
    key = ["query_id", "rnk"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) == 50 * 5


def test_ivfpq_rerank_query_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, _o_ivfpq_rerank_sql

    spark = get_spark()
    got = QUERIES["ivfpq_rerank_knn_embeddings"](spark, SF_DIR).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = con.sql(_o_ivfpq_rerank_sql("sf0.001")).df()
    cols = ["query_id", "neighbor_id", "rnk"]
    key = ["query_id", "rnk"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) == 50 * 5


def test_pq_query_matches_duckdb_oracle():
    duckdb = pytest.importorskip("duckdb")

    from metric_search_spark.entry_queries import QUERIES, _o_pq_sql

    spark = get_spark()
    got = QUERIES["pq_knn_embeddings"](spark, SF_DIR).toPandas()
    want = duckdb.sql(_o_pq_sql("sf0.001")).df()
    cols = ["query_id", "neighbor_id", "rnk"]
    key = ["query_id", "rnk"]
    pd.testing.assert_frame_equal(
        got[cols].sort_values(key).reset_index(drop=True),
        want[cols].sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )
    assert len(got) == 50 * 5

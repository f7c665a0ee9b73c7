"""LSM delta/compaction over the checkpointed index + Structured Streaming
ingestion (resumable micro-batch appends)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from metric_search_spark.sources.index import build_index, load_nodes, verify_index
from metric_search_spark.streaming.incremental import (
    append_delta,
    compact_index,
    delete_ids,
    knn_probe_live,
    read_delta,
    stream_into_index,
)

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _base(spark, tmp_path, n=300):
    rng = np.random.default_rng(21)
    pdf = pd.DataFrame({"id": np.arange(n), "x": rng.random(n), "y": rng.random(n)})
    path = str(tmp_path / "idx")
    build_index(spark.createDataFrame(pdf), path, res=2, batches=2)
    return pdf, path


def _brute(pdf, probes, k):
    P = pdf[["x", "y"]].to_numpy()
    ids = pdf["id"].to_numpy()
    out = {}
    for _, q in probes.iterrows():
        d = np.sqrt((P[:, 0] - q.x) ** 2 + (P[:, 1] - q.y) ** 2)
        order = sorted(range(len(ids)), key=lambda j: (d[j], ids[j]))[:k]
        out[int(q.id)] = [int(ids[j]) for j in order]
    return out


def test_delta_insert_delete_probe_compact(spark, tmp_path):
    pdf, path = _base(spark, tmp_path)
    rng = np.random.default_rng(22)
    new = pd.DataFrame(
        {"id": np.arange(1000, 1050), "x": rng.random(50), "y": rng.random(50)}
    )
    append_delta(spark.createDataFrame(new), path)
    dead_ids = pdf["id"].iloc[:20]
    delete_ids(spark.createDataFrame(pd.DataFrame({"id": dead_ids})), path)

    effective = pd.concat([pdf.iloc[20:], new]).reset_index(drop=True)
    probes = effective.sample(30, random_state=3)
    want = _brute(effective, probes, 5)

    live = knn_probe_live(
        spark.createDataFrame(probes), path, k=5
    ).toPandas()
    for qid, grp in live.sort_values(["query_id", "rank"]).groupby("query_id"):
        assert list(grp["neighbor_id"]) == want[int(qid)], qid

    # compaction applies the delta and preserves answers + invariants
    n_cells = compact_index(spark, path)
    assert n_cells > 0
    assert read_delta(spark, path) is None
    assert load_nodes(spark, path).count() == len(effective)
    health = verify_index(spark, path).toPandas()
    assert health["covering_ok"].all()
    after = knn_probe_live(spark.createDataFrame(probes), path, k=5).toPandas()
    for qid, grp in after.sort_values(["query_id", "rank"]).groupby("query_id"):
        assert list(grp["neighbor_id"]) == want[int(qid)], qid


def test_compaction_commit_point_and_idempotent_reapply(spark, tmp_path):
    """Crash-atomicity contract (ADVICE r1, medium): after the
    manifest_compact append (the commit point) the index must already be
    consistent — BEFORE old generations are GC'd (shadowing) and even if the
    delta log survives and is re-applied (idempotence)."""
    pdf, path = _base(spark, tmp_path, n=150)
    rng = np.random.default_rng(31)
    new = pd.DataFrame(
        {"id": np.arange(500, 520), "x": rng.random(20), "y": rng.random(20)}
    )
    append_delta(spark.createDataFrame(new), path)
    delete_ids(
        spark.createDataFrame(pd.DataFrame({"id": pdf["id"].iloc[:10]})), path
    )
    compact_index(spark, path)
    effective = pd.concat([pdf.iloc[10:], new]).reset_index(drop=True)
    assert load_nodes(spark, path).count() == len(effective)

    # simulate the crash window: delta survives the commit → re-append the
    # SAME delta and recompact; content must not duplicate
    append_delta(spark.createDataFrame(new), path)
    delete_ids(
        spark.createDataFrame(pd.DataFrame({"id": pdf["id"].iloc[:10]})), path
    )
    compact_index(spark, path)
    nodes = load_nodes(spark, path).toPandas()
    assert len(nodes) == len(effective)
    assert nodes["id"].is_unique
    assert set(nodes["id"]) == set(effective["id"])
    health = verify_index(spark, path).toPandas()
    assert health["covering_ok"].all()

    # shadowing: a new generation with a stale older copy still un-GC'd —
    # emulate by appending another insert batch and compacting; answers must
    # equal brute force on the final effective set
    more = pd.DataFrame(
        {"id": np.arange(600, 610), "x": rng.random(10), "y": rng.random(10)}
    )
    append_delta(spark.createDataFrame(more), path)
    compact_index(spark, path)
    effective = pd.concat([effective, more]).reset_index(drop=True)
    probes = effective.sample(20, random_state=5)
    want = _brute(effective, probes, 4)
    got = knn_probe_live(spark.createDataFrame(probes), path, k=4).toPandas()
    for qid, grp in got.sort_values(["query_id", "rank"]).groupby("query_id"):
        assert list(grp["neighbor_id"]) == want[int(qid)], qid


def test_probe_rejects_non_l2_metric_index(spark, tmp_path):
    """ADVICE r1 (low): the stored-index probe must refuse an index whose
    metric can't back the L2 ring guarantee instead of silently returning
    inexact results."""
    from metric_search_spark.sources.index import knn_probe_index

    rng = np.random.default_rng(33)
    pdf = pd.DataFrame({"id": np.arange(40), "x": rng.random(40), "y": rng.random(40)})
    path = str(tmp_path / "idx_l1")
    build_index(spark.createDataFrame(pdf), path, res=1, batches=1, metric="manhattan")
    with pytest.raises(ValueError, match="L2-dominating"):
        knn_probe_index(spark.createDataFrame(pdf.iloc[:5]), path, k=3)


def test_stream_ingestion_available_now(spark, tmp_path):
    pdf, path = _base(spark, tmp_path, n=200)
    src = tmp_path / "stream_src"
    src.mkdir()
    rng = np.random.default_rng(23)
    for chunk in range(2):
        rows = pd.DataFrame(
            {
                "id": np.arange(2000 + 25 * chunk, 2000 + 25 * (chunk + 1)),
                "x": rng.random(25),
                "y": rng.random(25),
            }
        )
        rows.to_parquet(src / f"chunk{chunk}.parquet")
    stream = spark.readStream.schema("id long, x double, y double").parquet(str(src))
    q = stream_into_index(stream, path, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    delta = read_delta(spark, path)
    assert delta is not None and delta.count() == 50
    # restart with no new files: checkpoint prevents reprocessing
    stream2 = spark.readStream.schema("id long, x double, y double").parquet(str(src))
    q2 = stream_into_index(stream2, path, str(tmp_path / "ckpt"))
    q2.awaitTermination(120)
    assert read_delta(spark, path).count() == 50

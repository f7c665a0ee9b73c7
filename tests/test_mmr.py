"""MMR diversification: redundancy-skip behavior on crafted vectors,
rank-1 = relevance rank-1, brute-force greedy parity on random data,
candidate-exhaustion truncation, and lam=1 degeneracy to plain top-k."""

from __future__ import annotations

import numpy as np
import pytest

from metric_search_spark.operators.ann import cosine_topk, mmr_topk

from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _df(spark, vecs, start_id=0):
    rows = [(start_id + i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_skips_near_duplicate(spark):
    # probe q = e0. Candidates: an EXACT duplicate pair (ids 1, 2 — same
    # vector, sim(1,2) = 1) and a diverse vector (id 3). Plain top-2
    # returns the duplicate pair; MMR's second pick scores the duplicate
    # ½(0.8 − 1) = −0.1 vs the diverse ½(0.750 − 0.600) ≈ +0.075 and must
    # skip it. (A merely NEAR-duplicate with sim ≈ simq scores ≈ 0 and
    # still beats any diverse candidate at λ = ½ — MMR only skips
    # redundancy that exceeds the relevance gap.)
    q = [1.0, 0.0, 0.0]
    build = [
        q,                   # id 0 == probe (excluded as self)
        [0.8, 0.6, 0.0],     # id 1: simq = 0.8
        [0.8, 0.6, 0.0],     # id 2: exact duplicate of id 1
        [0.75, 0.0, 0.66],   # id 3: diverse (sim to id 1 ≈ 0.600)
    ]
    probes = _df(spark, [q])
    got = (
        mmr_topk(probes, _df(spark, build), k=2, c=3)
        .orderBy("mmr_rank")
        .collect()
    )
    assert [r["neighbor_id"] for r in got] == [1, 3]
    top2 = (
        cosine_topk(probes.where("id = 0"), _df(spark, build[1:], 1), k=2)
        .orderBy("rank")
        .collect()
    )
    assert [r["neighbor_id"] for r in top2] == [1, 2]  # the redundant list


def test_rank1_is_relevance_rank1_and_truncation(spark):
    rng = np.random.default_rng(3)
    build = rng.normal(size=(8, 4))
    probes = _df(spark, [build[0]], start_id=100)
    got = (
        mmr_topk(probes, _df(spark, build), k=6, c=3, exclude_self=False)
        .orderBy("mmr_rank")
        .collect()
    )
    # only c=3 candidates exist -> truncated to 3 picks
    assert len(got) == 3
    top1 = cosine_topk(probes, _df(spark, build), k=1).collect()[0]
    assert got[0]["neighbor_id"] == top1["neighbor_id"]


def _brute_mmr(q, build, ids, k, c, lam):
    q = np.asarray(q, dtype=np.float64)
    V = np.asarray(build, dtype=np.float64)
    simq = V @ q / (np.linalg.norm(V, axis=1) * np.linalg.norm(q))
    order = np.lexsort((ids, -simq))[:c]
    V, ids, simq = V[order], np.asarray(ids)[order], simq[order]
    S = (V @ V.T) / np.outer(
        np.linalg.norm(V, axis=1), np.linalg.norm(V, axis=1)
    )
    sel = [0]
    for _ in range(1, min(k, len(ids))):
        ms = S[:, sel].max(axis=1)
        sc = lam * simq - (1 - lam) * ms
        for j in np.lexsort((ids, -sc)):
            if j not in sel:
                sel.append(int(j))
                break
    return list(ids[sel])


def test_brute_force_parity_random(spark):
    rng = np.random.default_rng(11)
    build = rng.normal(size=(30, 6))
    ids = list(range(30))
    # probes NOT in the build set: a probe equal to a build vector makes
    # every step-2 score an exact 0.5·(sim(q,j) − max(...)) tie at 0, and
    # tie resolution then sits on summation-order float noise between this
    # brute harness and the engine (the engine itself is deterministic —
    # its SQL twin replays the same sequential sums).
    probe_vecs = rng.normal(size=(3, 6))
    probes = _df(spark, probe_vecs, start_id=500)
    got = {
        (r["query_id"], r["mmr_rank"]): r["neighbor_id"]
        for r in mmr_topk(
            probes, _df(spark, build), k=5, c=12, exclude_self=False
        ).collect()
    }
    for p, q in enumerate(probe_vecs):
        want = _brute_mmr(q, build, ids, k=5, c=12, lam=0.5)
        for t, nid in enumerate(want, start=1):
            assert got[(500 + p, t)] == nid, (p, t)


def test_lam_one_degenerates_to_topk(spark):
    rng = np.random.default_rng(5)
    build = rng.normal(size=(12, 4))
    probes = _df(spark, [build[1]], start_id=200)
    got = (
        mmr_topk(probes, _df(spark, build), k=4, c=8, lam=1.0,
                 exclude_self=False)
        .orderBy("mmr_rank")
        .collect()
    )
    top = (
        cosine_topk(probes, _df(spark, build), k=4)
        .orderBy("rank")
        .collect()
    )
    assert [r["neighbor_id"] for r in got] == [r["neighbor_id"] for r in top]

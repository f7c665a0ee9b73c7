"""operators/rtree.str_pack: geometry goldens, python brute-twin parity
(incl. duplicate coordinates), capacity/partition invariants, and the
str_pack_embeddings driver query vs its DuckDB window twin."""

from __future__ import annotations

import random

import duckdb
import pytest

from metric_search_spark.operators.rtree import str_geometry, str_pack
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _brute_str(pts, capacity):
    """Textbook STR: sort by (x, id), cut ⌈n/S⌉-row slabs, sort each by
    (y, id), cut runs of B — an independent list-slicing formulation."""
    n = len(pts)
    s, slab_rows = str_geometry(n, capacity)
    by_x = sorted(pts, key=lambda p: (p[1], p[0]))
    pages = {}
    for i0 in range(0, n, slab_rows):
        slab = i0 // slab_rows
        rows = sorted(by_x[i0 : i0 + slab_rows], key=lambda p: (p[2], p[0]))
        for j0 in range(0, len(rows), capacity):
            grp = rows[j0 : j0 + capacity]
            xs = [p[1] for p in grp]
            ys = [p[2] for p in grp]
            pages[(slab, j0 // capacity)] = (
                len(grp), min(xs), max(xs), min(ys), max(ys),
            )
    return pages


def test_geometry():
    assert str_geometry(0, 64) == (0, 0)
    assert str_geometry(1, 64) == (1, 1)
    assert str_geometry(100, 10) == (4, 25)   # P=10, S=ceil(sqrt(10))=4
    assert str_geometry(64, 64) == (1, 64)
    assert str_geometry(65, 64) == (2, 33)
    with pytest.raises(ValueError):
        str_geometry(10, 0)


@pytest.mark.parametrize("n,cap,seed", [(137, 8, 1), (64, 64, 2), (500, 16, 3)])
def test_brute_parity(n, cap, seed):
    rng = random.Random(seed)
    # coarse grid -> plenty of duplicate x and y values exercise tie-break
    pts = [
        (i, rng.randrange(20) / 10.0, rng.randrange(20) / 10.0)
        for i in range(n)
    ]
    spark = get_spark()
    df = spark.createDataFrame(pts, "id long, x double, y double")
    got = {
        (r["slab"], r["page"]): (
            r["n"], r["min_x"], r["max_x"], r["min_y"], r["max_y"],
        )
        for r in str_pack(df, capacity=cap).collect()
    }
    assert got == _brute_str(pts, cap)
    # invariants: capacity respected, counts conserve
    assert all(v[0] <= cap for v in got.values())
    assert sum(v[0] for v in got.values()) == n


def test_driver_query_matches_duckdb_oracle():
    from metric_search_spark.entry_queries import QUERIES, oracles_for

    spark = get_spark()
    got = (
        QUERIES["str_pack_embeddings"](spark, SF_DIR)
        .toPandas()
        .sort_values(["slab", "page"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF_DIR}/embeddings.parquet'"
    )
    want = (
        con.sql(oracles_for(SF_DIR)["str_pack_embeddings"])
        .df()
        .sort_values(["slab", "page"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 0
    for c in ("slab", "page", "n"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c
    for c in ("min_x", "max_x", "min_y", "max_y"):
        assert (got[c].to_numpy() == want[c].to_numpy()).all(), c

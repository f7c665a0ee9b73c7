"""Robust polygon relate pins: the exact rational kernel classifies every
handcrafted degenerate configuration correctly (and symmetrically), the
Spark candidate+refine join reproduces the brute-force DuckDB twin
bit-for-bit on the lattice fixture, the fixture actually plants the
degenerate regimes, and the plan carries no cartesian product."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from metric_search_spark.operators.relate import (
    polygon_relate_join,
    polygon_relate_sql,
    relate_rings,
    synth_lattice_polys,
    synth_lattice_polys_sql,
)
from tests.sparkutil import get_spark


@pytest.fixture(scope="module")
def spark():
    return get_spark()


def _sq(x, y, s):
    return [(x, y), (x + s, y), (x + s, y + s), (x, y + s)]


DEGENERATE_CASES = [
    (_sq(0, 0, 10), _sq(0, 0, 10), "overlaps"),      # identical rings
    (_sq(0, 0, 10), _sq(10, 0, 10), "touches"),      # shared full edge
    (_sq(0, 0, 10), [(10, 5), (20, 5), (20, 15), (10, 15)], "touches"),
    (_sq(0, 0, 10), _sq(10, 10, 10), "touches"),     # vertex-vertex
    (_sq(0, 0, 10), _sq(2, 2, 3), "overlaps"),       # strict containment
    (_sq(0, 0, 10), [(0, 2), (5, 2), (5, 7), (0, 7)], "overlaps"),  # contained, shares edge
    (_sq(0, 0, 10), _sq(5, 5, 10), "overlaps"),      # proper crossing
    (_sq(0, 0, 10), _sq(20, 20, 5), "disjoint"),
    # B's vertex ON A's edge, B dips inside (no proper crossing at contact)
    (_sq(0, 0, 10), [(5, 10), (8, 14), (5, 6), (2, 14)], "overlaps"),
    # B's vertex ON A's edge, B stays outside
    (_sq(0, 0, 10), [(5, 10), (9, 14), (1, 14)], "touches"),
    # collinear run along A's top edge, B above
    (_sq(0, 0, 10), [(3, 10), (7, 10), (7, 14), (3, 14)], "touches"),
    # plus-sign cross: no vertex of either inside the other
    ([(4, 0), (6, 0), (6, 10), (4, 10)],
     [(0, 4), (10, 4), (10, 6), (0, 6)], "overlaps"),
    # triangles sharing the full hypotenuse, opposite sides
    ([(0, 0), (10, 0), (0, 10)], [(10, 0), (10, 10), (0, 10)], "touches"),
    # containment sharing two edges (corner-nested)
    (_sq(0, 0, 10), _sq(0, 0, 5), "overlaps"),
]


@pytest.mark.parametrize("a,b,want", DEGENERATE_CASES)
def test_kernel_degenerate_cases(a, b, want):
    assert relate_rings(a, b) == want
    assert relate_rings(b, a) == want  # symmetric


def test_kernel_orientation_agnostic():
    a, b = _sq(0, 0, 10), _sq(10, 0, 10)
    assert relate_rings(a[::-1], b) == "touches"
    assert relate_rings(a, b[::-1]) == "touches"
    assert relate_rings(a[::-1], b[::-1]) == "touches"


N, SEED = 160, 11


def test_join_matches_brute_force_twin(spark):
    """Candidate-cover + exact Arrow refine == brute-force HUGEINT twin,
    pair set AND classification, on the degeneracy-dense lattice."""
    polys = synth_lattice_polys(spark, N, seed=SEED)
    got = (
        polygon_relate_join(
            polys.where(F.col("gid") % 2 == 0),
            polys.where(F.col("gid") % 2 == 1),
        )
        .toPandas()
        .sort_values(["a_gid", "b_gid"])
        .reset_index(drop=True)
    )
    ora = (
        duckdb.sql(polygon_relate_sql(synth_lattice_polys_sql(N, seed=SEED)))
        .df()
        .sort_values(["a_gid", "b_gid"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ora) > 0
    assert (got.a_gid.values == ora.a_gid.values).all()
    assert (got.b_gid.values == ora.b_gid.values).all()
    assert (got.relate.values == ora.relate.values).all()
    # both classes genuinely occur
    assert set(got.relate) == {"overlaps", "touches"}


def test_fixture_plants_identical_cross_pairs(spark):
    """gid % 6 == 5 copies the geometry of gid-3 (other half): the join
    must report those pairs as overlaps (identical regions)."""
    polys = synth_lattice_polys(spark, N, seed=SEED)
    rows = {r.gid: (tuple(r.xs), tuple(r.ys)) for r in polys.collect()}
    planted = [(g - 3, g) for g in range(5, N, 6)]
    assert all(rows[a] == rows[b] for a, b in planted)
    got = polygon_relate_join(
        polys.where(F.col("gid") % 2 == 0), polys.where(F.col("gid") % 2 == 1)
    ).toPandas()
    pairs = {(r.a_gid, r.b_gid): r.relate for r in got.itertuples()}
    for a, b in planted:
        assert pairs.get((a, b)) == "overlaps", (a, b)


def test_plan_no_cartesian(spark):
    polys = synth_lattice_polys(spark, 40, seed=SEED)
    plan = (
        polygon_relate_join(
            polys.where(F.col("gid") % 2 == 0),
            polys.where(F.col("gid") % 2 == 1),
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ------------------------------------------------- intersection area


def test_area_known_answers():
    from metric_search_spark.operators.relate import intersection_area2

    assert intersection_area2(_sq(0, 0, 10), _sq(0, 0, 10)) == 200.0
    assert intersection_area2(_sq(0, 0, 10), _sq(10, 0, 10)) == 0.0
    assert intersection_area2(_sq(0, 0, 10), _sq(5, 5, 10)) == 50.0
    assert intersection_area2(_sq(0, 0, 10), _sq(2, 2, 3)) == 18.0
    assert intersection_area2(_sq(0, 0, 10), _sq(0, 0, 5)) == 50.0
    assert (
        intersection_area2(
            [(4, 0), (6, 0), (6, 10), (4, 10)],
            [(0, 4), (10, 4), (10, 6), (0, 6)],
        )
        == 8.0
    )
    # orientation-agnostic (normalized CCW internally)
    assert intersection_area2(_sq(0, 0, 10)[::-1], _sq(5, 5, 10)) == 50.0


def test_area_join_matches_twin_and_relate(spark):
    """Spark area join == brute-force twin bit-for-bit, and its pair set
    equals the relate join's 'overlaps' rows (touch-only pairs are exact
    zero)."""
    from metric_search_spark.operators.relate import (
        polygon_area_join,
        polygon_area_sql,
    )

    polys = synth_lattice_polys(spark, N, seed=SEED)
    left = polys.where(F.col("gid") % 2 == 0)
    right = polys.where(F.col("gid") % 2 == 1)
    got = (
        polygon_area_join(left, right)
        .toPandas()
        .sort_values(["a_gid", "b_gid"])
        .reset_index(drop=True)
    )
    ora = (
        duckdb.sql(polygon_area_sql(synth_lattice_polys_sql(N, seed=SEED)))
        .df()
        .sort_values(["a_gid", "b_gid"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ora) > 0
    for c in ("a_gid", "b_gid", "area2_q"):
        assert (
            got[c].astype("int64").values == ora[c].astype("int64").values
        ).all(), c
    rel = polygon_relate_join(left, right).toPandas()
    overlaps = {
        (r.a_gid, r.b_gid) for r in rel.itertuples() if r.relate == "overlaps"
    }
    assert {(r.a_gid, r.b_gid) for r in got.itertuples()} == overlaps


# ------------------------------------------------ multipolygon relate


def test_multipolygon_union_semantics(spark):
    """Multipolygon fold == per-ring-pair python ground truth (overlaps
    if any island pair overlaps, touches if only touches), and == the
    ring-level DuckDB twin's aggregated output."""
    from metric_search_spark.operators.relate import (
        _lat_hash,
        _lattice_ring,
        multipolygon_relate_join,
        multipolygon_relate_sql,
        synth_lattice_multipolys,
        synth_lattice_multipolys_sql,
    )

    n = 80
    mp = synth_lattice_multipolys(spark, n, seed=SEED)
    got = (
        multipolygon_relate_join(
            mp.where(F.col("gid") % 2 == 0), mp.where(F.col("gid") % 2 == 1)
        )
        .toPandas()
        .sort_values(["a_gid", "b_gid"])
        .reset_index(drop=True)
    )
    ora = (
        duckdb.sql(
            multipolygon_relate_sql(synth_lattice_multipolys_sql(n, seed=SEED))
        )
        .df()
        .sort_values(["a_gid", "b_gid"])
        .reset_index(drop=True)
    )
    assert len(got) == len(ora) > 0
    assert (got.relate.values == ora.relate.values).all()
    rings = {
        g: [
            list(zip(*_lattice_ring(g * 4 + r, SEED)))
            for r in range(1 + _lat_hash(g, SEED + 9) % 3)
        ]
        for g in range(n)
    }
    truth = {}
    for a in range(0, n, 2):
        for b in range(1, n, 2):
            rels = {
                relate_rings(ra, rb)
                for ra in rings[a]
                for rb in rings[b]
            }
            if "overlaps" in rels:
                truth[(a, b)] = "overlaps"
            elif "touches" in rels:
                truth[(a, b)] = "touches"
    assert {(r.a_gid, r.b_gid): r.relate for r in got.itertuples()} == truth
    assert set(got.relate) == {"overlaps", "touches"}


def test_multipolygon_ring_idx_guard(spark):
    from metric_search_spark.operators.relate import (
        multipolygon_relate_join,
    )

    bad = spark.createDataFrame(
        [(0, 9, [0, 10, 0], [0, 0, 10])],
        "gid long, ring_idx long, xs array<long>, ys array<long>",
    )
    ok = spark.createDataFrame(
        [(1, 0, [0, 10, 0], [0, 0, 10])],
        "gid long, ring_idx long, xs array<long>, ys array<long>",
    )
    with pytest.raises(Exception, match="ring_idx"):
        multipolygon_relate_join(bad, ok).collect()


def test_lat_hash_matches_sampling_hash_col():
    """ADVICE r4: _lat_hash re-expresses sampling.hash_col's MINSTD+xorshift
    stream driver-side for fixture building. Pin the two implementations
    against each other (Spark Column vs pure int) so silent drift between
    them cannot change fixtures without a test going red."""
    from pyspark.sql import functions as F

    from metric_search_spark.operators.relate import _lat_hash
    from metric_search_spark.operators.sampling import hash_col
    from tests.sparkutil import get_spark

    spark = get_spark()
    ids = list(range(0, 500)) + [10**9, 2147483646]
    df = spark.createDataFrame([(i,) for i in ids], "x long")
    for seed in (0, 1, 7, 131):
        got = {
            r.x: r.h
            for r in df.select(
                "x", hash_col(F.col("x"), seed).alias("h")
            ).collect()
        }
        for i in ids:
            assert got[i] == _lat_hash(i, seed), (i, seed)

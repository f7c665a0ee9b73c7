"""operators/fuzzy: Jaro–Winkler scalar goldens, randomized parity against
DuckDB's NATIVE jaro_winkler_similarity (independent C++ twin), empirically
pinned boundary semantics (boost threshold, empty strings), the blocked
join contract, and the fuzzy_pairs_documents driver query vs its oracle."""

from __future__ import annotations

import random

import duckdb
import pytest

from metric_search_spark.operators.fuzzy import (
    fuzzy_join,
    jaro_similarity,
    jaro_winkler,
)

SF_DIR = "/root/testdata/sf0.001"


def test_textbook_goldens():
    assert jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611111111111111)
    assert jaro_winkler("DIXON", "DICKSONX") == pytest.approx(0.8133333333333332)
    assert jaro_winkler("DUANE", "DWAYNE") == pytest.approx(0.84)
    assert jaro_similarity("CRATE", "TRACE") == pytest.approx(0.7333333333333334)
    assert jaro_similarity("JELLYFISH", "SMELLYFISH") == pytest.approx(
        0.8962962962962964
    )


def test_boundary_semantics_match_duckdb():
    """Empirically pinned against the native function: empty strings score
    0 (even '' vs ''), identical strings 1, no prefix boost when jaro <=
    0.7 (common-prefix low-similarity pairs keep jw == jaro)."""
    con = duckdb.connect()
    cases = [
        ("", "ABC"),
        ("", ""),
        ("AB", "AB"),
        ("A", "B"),
        ("ABCDEF", "ABZXYW"),          # prefix 2 but jaro 0.556 -> no boost
        ("AAAAAAAAAA", "AAZZZZZZZZZZZZZ"),
    ]
    for a, b in cases:
        want = con.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert jaro_winkler(a, b) == pytest.approx(want, abs=1e-12), (a, b)


def test_random_parity_with_duckdb_native():
    rng = random.Random(99)
    vocab = "abcdefgh"
    con = duckdb.connect()
    pairs = []
    for _ in range(400):
        la, lb = rng.randint(0, 14), rng.randint(0, 14)
        a = "".join(rng.choice(vocab) for _ in range(la))
        b = "".join(rng.choice(vocab) for _ in range(lb))
        pairs.append((a, b))
    for a, b in pairs:
        want = con.sql(
            "SELECT jaro_winkler_similarity(?, ?)", params=[a, b]
        ).fetchone()[0]
        got = jaro_winkler(a, b)
        assert got == pytest.approx(want, abs=1e-12), (a, b, got, want)


def test_fuzzy_join_contract():
    """Every emitted pair shares the block key, ids are strictly ordered,
    no pair repeats, and scores match the scalar twin."""
    from tests.sparkutil import get_spark

    spark = get_spark()
    rows = [
        (1, "martha stewart", "m"),
        (2, "marhta stewart", "m"),
        (3, "marcus aurelius", "m"),
        (4, "dwayne johnson", "d"),
        (5, "duane johnson", "d"),
        (6, "zelda fitzgerald", "z"),
    ]
    names = spark.createDataFrame(rows, "id long, name string, blk string")
    out = fuzzy_join(names).collect()
    by_id = {r[0]: (r[1], r[2]) for r in rows}
    seen = set()
    for r in out:
        assert r["id_a"] < r["id_b"]
        assert by_id[r["id_a"]][1] == by_id[r["id_b"]][1]
        assert (r["id_a"], r["id_b"]) not in seen
        seen.add((r["id_a"], r["id_b"]))
        want = jaro_winkler(by_id[r["id_a"]][0], by_id[r["id_b"]][0])
        assert r["jw"] == pytest.approx(want, abs=1e-12)
    # the m-block has 3 pairs, the d-block 1, z none
    assert len(out) == 4
    thr = fuzzy_join(names, threshold=0.9).collect()
    assert {(r["id_a"], r["id_b"]) for r in thr} == {(1, 2), (4, 5)}


def test_driver_query_matches_duckdb_oracle():
    from metric_search_spark.entry_queries import (
        O_FUZZY_PAIRS_DOCUMENTS,
        QUERIES,
    )
    from tests.sparkutil import get_spark

    spark = get_spark()
    got = (
        QUERIES["fuzzy_pairs_documents"](spark, SF_DIR)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = (
        con.sql(O_FUZZY_PAIRS_DOCUMENTS)
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 100
    assert (got["id_a"] == want["id_a"]).all()
    assert (got["id_b"] == want["id_b"]).all()
    assert (got["jw"] == want["jw"]).all()  # round-6, exact equality


def test_damerau_levenshtein_goldens_and_native_parity():
    from metric_search_spark.operators.fuzzy import damerau_levenshtein

    # the full-variant discriminator: OSA would give 3
    assert damerau_levenshtein("CA", "ABC") == 2
    assert damerau_levenshtein("ab", "ba") == 1
    assert damerau_levenshtein("", "abc") == 3
    assert damerau_levenshtein("", "") == 0
    assert damerau_levenshtein("kitten", "sitting") == 3
    con = duckdb.connect()
    rng = random.Random(7)
    vocab = "abcde"
    for _ in range(300):
        a = "".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        b = "".join(rng.choice(vocab) for _ in range(rng.randint(0, 12)))
        want = con.sql(
            "SELECT damerau_levenshtein(?, ?)", params=[a, b]
        ).fetchone()[0]
        assert damerau_levenshtein(a, b) == want, (a, b)


def test_dl_driver_query_matches_duckdb_oracle():
    from metric_search_spark.entry_queries import O_DL_PAIRS_DOCUMENTS, QUERIES
    from tests.sparkutil import get_spark

    spark = get_spark()
    got = (
        QUERIES["dl_pairs_documents"](spark, SF_DIR)
        .toPandas()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'"
    )
    want = (
        con.sql(O_DL_PAIRS_DOCUMENTS)
        .df()
        .sort_values(["id_a", "id_b"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 100
    assert (got["dl"].to_numpy() == want["dl"].to_numpy()).all()

"""operators/itemsets.apriori: hand-built basket goldens, python
brute-enumeration parity, downward-closure property, and the
apriori_events driver query vs its bitmask DuckDB twin."""

from __future__ import annotations

import itertools
import random

import duckdb

from metric_search_spark.operators.itemsets import apriori
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"


def _brute(baskets, num, den, max_size):
    vocab = sorted({i for b in baskets for i in b})
    n = len(baskets)
    out = {}
    for k in range(1, max_size + 1):
        for c in itertools.combinations(vocab, k):
            sup = sum(1 for b in baskets if set(c) <= set(b))
            if sup * den >= n * num:
                out[",".join(c)] = (k, sup)
    return out


def _run(spark, baskets, num, den, max_size=3):
    rows = [(i, it) for i, b in enumerate(baskets) for it in b]
    df = spark.createDataFrame(rows, "bid long, item string")
    got = apriori(
        df,
        basket_cols=["bid"],
        item_col="item",
        min_support_num=num,
        min_support_den=den,
        max_size=max_size,
    ).collect()
    return {r["itemset"]: (r["k"], r["support"]) for r in got}


def test_golden_baskets():
    spark = get_spark()
    baskets = [
        ["milk", "bread"],
        ["milk", "bread", "eggs"],
        ["milk", "eggs"],
        ["bread"],
        ["milk", "bread", "eggs", "jam"],
    ]
    got = _run(spark, baskets, 2, 5)  # support >= 2 of 5
    assert got == _brute(baskets, 2, 5, 3)
    # sorted rendering: 'bread,milk' not 'milk,bread'
    assert "milk,bread" not in got
    assert "bread,milk" in got and got["bread,milk"] == (2, 3)
    assert "bread,eggs,milk" in got and got["bread,eggs,milk"] == (3, 2)
    assert "jam" not in got  # support 1 < 2


def test_random_parity_and_downward_closure():
    spark = get_spark()
    rng = random.Random(4)
    vocab = list("abcdef")
    baskets = [
        rng.sample(vocab, rng.randint(1, 5)) for _ in range(80)
    ]
    got = _run(spark, baskets, 1, 10)
    assert got == _brute(baskets, 1, 10, 3)
    # downward closure: every subset of a frequent itemset is frequent
    for s in got:
        items = s.split(",")
        for k in range(1, len(items)):
            for sub in itertools.combinations(items, k):
                assert ",".join(sub) in got, (s, sub)


def test_driver_query_matches_duckdb_oracle():
    from metric_search_spark.entry_queries import O_APRIORI_EVENTS, QUERIES

    spark = get_spark()
    got = (
        QUERIES["apriori_events"](spark, SF_DIR)
        .toPandas()
        .sort_values(["k", "itemset"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{SF_DIR}/events.parquet'")
    want = (
        con.sql(O_APRIORI_EVENTS)
        .df()
        .sort_values(["k", "itemset"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want) and len(got) > 10
    assert (got["itemset"].to_numpy() == want["itemset"].to_numpy()).all()
    assert (got["support"].to_numpy() == want["support"].to_numpy()).all()
    # the 5% threshold discriminates: some triples in, not all
    k3 = got[got["k"] == 3]
    assert 0 < len(k3) < 10

"""chi2_tokens: hand-computed 2x2 tables, everywhere-token exclusion,
min_df pruning, rank determinism."""

from __future__ import annotations

from metric_search_spark.operators.cooccur import chi2_tokens
from tests.sparkutil import get_spark


def _run(rows, min_df=1, k=10):
    spark = get_spark()
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = chi2_tokens(df, min_df=min_df, k=k).collect()
    return {(r.label, r.token): r for r in out}


def test_hand_table_and_exclusions():
    # 4 docs: 'cat' only in A-docs, 'dog' only in B, 'the' in all
    rows = [
        (1, "the cat purrs", "A"),
        (2, "the cat naps", "A"),
        (3, "the dog barks", "B"),
        (4, "the dog runs", "B"),
    ]
    got = _run(rows)
    r = got[("A", "cat")]
    # a=2, b=0, c=0, d=2 -> chi2 = 4*(4-0)^2/(2*2*2*2) = 4.0
    assert (r.a, r.b, r.c, r.d) == (2, 0, 0, 2)
    assert r.chi2 == 4.0
    assert ("A", "the") not in got  # everywhere-token excluded
    assert ("B", "dog") in got and got[("B", "dog")].chi2 == 4.0


def test_min_df_prunes_and_rank_is_dense():
    rows = [
        (1, "x common rare", "A"),
        (2, "x common", "A"),
        (3, "x common", "B"),
        (4, "x other", "B"),
    ]
    got = _run(rows, min_df=2)
    assert all(t != "rare" for (_, t) in got)  # df=1 < 2 pruned
    for lab in ("A", "B"):
        rnks = sorted(r.rnk for (la, _), r in got.items() if la == lab)
        assert rnks == list(range(1, len(rnks) + 1))

"""operators/dedupe.ngram_contamination — train/test n-gram overlap.

Pins: exact distinct-gram counting on a hand-built corpus (incl. the
duplicate-gram-within-one-doc case and the shorter-than-n guard), and the
inverted-index plan shape (no doc×doc product).
"""

from __future__ import annotations

from metric_search_spark.operators.dedupe import ngram_contamination
from tests.sparkutil import get_spark


def _dfs():
    spark = get_spark()
    test = spark.createDataFrame(
        [
            # shares exactly the trigram "a b c" and "b c d" with train doc 10
            (0, "a b c d x y z"),
            # repeats "p q r" twice — must count ONCE (distinct grams)
            (1, "p q r p q r"),
            # shorter than n=3 tokens: no grams, can't be contaminated
            (2, "a b"),
            # clean
            (3, "m n o m o n"),
        ],
        "doc_id long, text string",
    )
    train = spark.createDataFrame(
        [(10, "q a b c d q"), (11, "z p q r z")],
        "doc_id long, text string",
    )
    return test, train


def test_exact_counts_and_guards():
    test, train = _dfs()
    got = {
        r["doc_id"]: r["shared_grams"]
        for r in ngram_contamination(test, train, n=3).collect()
    }
    assert got == {0: 2, 1: 1}  # doc 2 (too short) and doc 3 (clean) absent


def test_no_cartesian_in_plan():
    test, train = _dfs()
    plan = (
        ngram_contamination(test, train, n=3)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

"""MSK_SKIP_ORACLE_HANDOFF gates EVERY oracle hand-off writer (VERDICT r3
item 3): with the var set, no query materializes driver-side state or writes
a /tmp parquet — it computes from its own distributed plan — and the results
are identical to the ungated run. The file-absence check is the hard proxy
for "no hand-off work executed": every writer goes through _write_handoff,
whose only observable effect is the file.

Concurrency note: hand-off paths are shared per-(name, sf) by design (the
driver contract — see entry_queries SINGLE-RUNNER ASSUMPTION), so globbing
the real /tmp paths races with any concurrent runner (e.g. an interactive
tools/check_correctness.py sweep), in BOTH directions: the other runner's
writes would trip our absence check, and our cleanup would delete a file
between its write and its oracle read. The tests therefore monkeypatch
_HANDOFF_PATH_TMPL to a test-private tmpdir: every writer in THIS process
lands there, other processes are untouched, and the absence check is
race-free."""

from __future__ import annotations

import glob
import os

import pytest

import metric_search_spark.entry_queries as eq
from metric_search_spark.entry_queries import QUERIES
from tests.sparkutil import get_spark

SF_DIR = "/root/testdata/sf0.001"

# the three queries whose gated path restructures a parquet round-trip into
# a live self-join (the risky rewrites); the others only skip a write
_PARITY_QUERIES = ["minhash_lsh_documents", "simhash_documents",
                   "ann_lsh_embeddings"]


@pytest.fixture
def private_handoffs(tmp_path, monkeypatch):
    """Redirect every hand-off write in this process to a private dir."""
    tmpl = str(tmp_path) + "/msk_{name}_handoff_{key}.parquet"
    monkeypatch.setattr(eq, "_HANDOFF_PATH_TMPL", tmpl)

    def written() -> list[str]:
        return sorted(glob.glob(str(tmp_path) + "/msk_*_handoff_*.parquet"))

    return written


@pytest.mark.parametrize("name", _PARITY_QUERIES)
def test_gated_query_matches_ungated_and_writes_nothing(
    name, monkeypatch, private_handoffs
):
    spark = get_spark()
    monkeypatch.delenv("MSK_SKIP_ORACLE_HANDOFF", raising=False)
    want = QUERIES[name](spark, SF_DIR).toPandas()
    assert private_handoffs() != [], "ungated run should write its hand-off"
    for p in private_handoffs():
        os.remove(p)
    monkeypatch.setenv("MSK_SKIP_ORACLE_HANDOFF", "1")
    got = QUERIES[name](spark, SF_DIR).toPandas()
    assert private_handoffs() == [], "gated run wrote a hand-off"
    cols = list(want.columns)
    import pandas as pd

    pd.testing.assert_frame_equal(
        got[cols].sort_values(cols).reset_index(drop=True),
        want[cols].sort_values(cols).reset_index(drop=True),
        check_dtype=False,
    )


def test_every_handoff_writer_is_gated_source_lint():
    """Structural guarantee that item 3 can't silently regress: every
    `_write_handoff(...)` call site in entry_queries.py must sit inside an
    `if` whose condition mentions `_handoff_enabled` or the gated-dict
    pattern (`ho is not None`). A new ungated writer fails here in
    milliseconds instead of waiting for a scale run to pay a surprise
    driver collect."""
    import ast
    import inspect

    tree = ast.parse(inspect.getsource(eq))

    def guards(node):  # all `if` conditions on the path to `node`
        out = []
        for parent in ancestors[node]:
            if isinstance(parent, ast.If):
                out.append(ast.unparse(parent.test))
        return out

    ancestors: dict = {}

    def walk(node, chain):
        ancestors[node] = chain
        for child in ast.iter_child_nodes(node):
            walk(child, chain + [node])

    walk(tree, [])

    def is_gated(node) -> bool:
        return any(
            "_handoff_enabled" in g or "ho is not None" in g
            for g in guards(node)
        )

    def calls_of(fname: str):
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Name)
                and node.func.id == fname
            ):
                yield node

    ungated = []
    for node in calls_of("_write_handoff"):
        if is_gated(node):
            continue
        # one level of helper indirection: a private helper may hold the
        # write if EVERY call site of that helper is itself gated
        fn = next(
            (
                p
                for p in reversed(ancestors[node])
                if isinstance(p, ast.FunctionDef)
            ),
            None,
        )
        if (
            fn is not None
            and fn.name.startswith("_")
            and list(calls_of(fn.name))
            and all(is_gated(c) for c in calls_of(fn.name))
        ):
            continue
        ungated.append(node.lineno)
    assert ungated == [], f"_write_handoff calls without a gate: {ungated}"


def test_run_token_isolates_concurrent_sweeps(monkeypatch):
    """ADVICE r3 item 5 / VERDICT r4 item 4: a runner that sets MSK_RUN_TOKEN
    gets its own hand-off namespace — two concurrent sweeps with distinct
    tokens can never cross-read — while the tokenless default reproduces the
    exact legacy path, so the driver contract (oracle SQL possibly generated
    in a different process) is unchanged. The token is read lazily: setting
    it after import must take effect."""
    monkeypatch.delenv("MSK_RUN_TOKEN", raising=False)
    legacy = eq._handoff_path("minhash", "sf0.01")
    assert "_r" not in legacy.rsplit("/", 1)[1].replace("_handoff", "")
    monkeypatch.setenv("MSK_RUN_TOKEN", "111")
    p1 = eq._handoff_path("minhash", "sf0.01")
    monkeypatch.setenv("MSK_RUN_TOKEN", "222")
    p2 = eq._handoff_path("minhash", "sf0.01")
    assert p1 != p2 != legacy and p1 != legacy
    assert p1 == legacy.replace(".parquet", "_r111.parquet")
    # writer and oracle-SQL builder in the same process agree on the path:
    # the minhash oracle embeds the read path via the same helper
    assert eq._handoff_path("minhash", "sf0.01") == p2


def test_gate_skips_pq_and_ivfpq_handoffs(monkeypatch, private_handoffs):
    """The pq/ivfpq hand-off dict is None when gated, so no codes/LUT
    collect happens; the ranked output is unchanged (same seeded
    pipeline)."""
    spark = get_spark()
    monkeypatch.delenv("MSK_SKIP_ORACLE_HANDOFF", raising=False)
    want = QUERIES["pq_knn_embeddings"](spark, SF_DIR).toPandas()
    for p in private_handoffs():
        os.remove(p)
    monkeypatch.setenv("MSK_SKIP_ORACLE_HANDOFF", "1")
    got = QUERIES["pq_knn_embeddings"](spark, SF_DIR).toPandas()
    assert private_handoffs() == []
    import pandas as pd

    key = ["query_id", "rnk"]
    pd.testing.assert_frame_equal(
        got.sort_values(key).reset_index(drop=True),
        want.sort_values(key).reset_index(drop=True),
        check_dtype=False,
    )

"""Physical-plan introspection: the engine's "is this the plan I'd want at
100 TB" checks, used by tests to pin plan properties (filter pushdown reaches
the parquet scan, projections prune columns, narrow ops add no Exchange,
relational glue stays inside WholeStageCodegen).

These parse ``df.explain('formatted')`` output — the same text a human reads —
so the assertions match exactly what an operator of the engine would check by
hand.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_text(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan (broadcast
    exchanges excluded — they are the cheap kind).

    Parses SIMPLE mode: the formatted tree prints ``(n) Exchange`` with the
    partitioning on a separate Arguments line, so a contiguous
    ``Exchange hashpartitioning(...)`` match finds NOTHING there — a bug
    that silently made every plan pin vacuous until a one-shuffle assertion
    (which can't pass vacuously) caught it. Simple mode inlines the
    arguments, making the contiguous match real. RoundRobinPartitioning
    (``df.repartition(n)``) counts too — a shuffle is a shuffle."""
    txt = explain_text(df, mode="simple")
    return len(
        re.findall(
            r"\bExchange (?:hashpartitioning|rangepartitioning"
            r"|RoundRobinPartitioning|SinglePartition)",
            txt,
        )
    )


def exchange_partition_keys(df: DataFrame) -> list[str]:
    """The argument list of every shuffle Exchange in the plan (simple mode
    — see count_exchanges), for pins like 'no Exchange partitions on a raw
    vector column'. An empty result means NO shuffle exchanges — callers
    that expect shuffles should assert non-empty first, or the pin is
    vacuous."""
    txt = explain_text(df, mode="simple")
    out = []
    for m in re.finditer(r"\bExchange (?:hash|range)partitioning\(", txt):
        # balanced-paren capture: a [^)]* match truncates at the first ')'
        # inside a nested key expression (e.g. cast(x#3 as int)), silently
        # dropping the rest of the key list and making key pins vacuous
        depth, i = 1, m.end()
        while i < len(txt) and depth:
            if txt[i] == "(":
                depth += 1
            elif txt[i] == ")":
                depth -= 1
            i += 1
        out.append(txt[m.end() : i - 1])
    return out


def has_whole_stage_codegen(df: DataFrame) -> bool:
    txt = explain_text(df)
    # 'formatted' mode marks codegen stages with '[codegen id : N]';
    # 'simple' mode uses the WholeStageCodegen wrapper name
    return "codegen id" in txt or "WholeStageCodegen" in txt


def has_single_partition_exchange(df: DataFrame) -> bool:
    """True if the plan funnels data through Exchange SinglePartition — the
    global-sort anti-pattern that serializes at scale.

    SIMPLE mode, for the same reason as count_exchanges: formatted mode
    puts ``SinglePartition`` on a separate Arguments line, so the
    contiguous match never fired and this check was vacuously False."""
    return "Exchange SinglePartition" in explain_text(df, mode="simple")


def has_nested_loop_join(df: DataFrame) -> bool:
    """True if the plan contains a BroadcastNestedLoopJoin or
    CartesianProduct — the O(n²)-pairs join shapes."""
    txt = explain_text(df)
    return "BroadcastNestedLoopJoin" in txt or "CartesianProduct" in txt


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters lists from every parquet scan in the plan."""
    txt = explain_text(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", txt):
        if m.group(1).strip():
            out.extend(p.strip() for p in m.group(1).split(","))
    return out


def read_schema_columns(df: DataFrame) -> list[list[str]]:
    """ReadSchema column lists of every parquet scan (column-pruning check)."""
    txt = explain_text(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<", txt):
        # balanced-bracket capture: [^>]* stops at the first '>' of a NESTED
        # type (array<double>, map<...>), silently dropping every column
        # after it — pruning pins on vector-bearing scans were vacuous
        depth, i = 1, m.end()
        while i < len(txt) and depth:
            if txt[i] == "<":
                depth += 1
            elif txt[i] == ">":
                depth -= 1
            i += 1
        body = txt[m.end() : i - 1]
        cols, level, start = [], 0, 0
        for j, ch in enumerate(body + ","):
            if ch in "<(":
                level += 1
            elif ch in ">)":
                level -= 1
            elif ch == "," and level == 0:
                part = body[start:j].strip()
                if part:
                    cols.append(part.split(":")[0].strip())
                start = j + 1
        out.append(cols)
    return out

"""Physical-plan assertions (SURVEY.md §4.2): the optimizer behaviors the
engine relies on at 100 TB, checked as tests so a regression in query
shape (a filter that stops pushing down, a broadcast that silently
becomes a shuffle join) fails CI rather than a future cluster bill."""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def executed_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    plan = formatted_plan(df)
    assert "PushedFilters" in plan, plan
    pushed = [ln for ln in plan.splitlines() if "PushedFilters" in ln]
    joined = " ".join(pushed)
    for frag in fragments:
        assert frag in joined, f"{frag!r} not pushed; got {joined}\n{plan}"


def assert_read_schema_only(df: DataFrame, table_fragment: str, *cols: str) -> None:
    """The parquet scan for table_fragment must read exactly cols."""
    plan = formatted_plan(df)
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Location" in ln and table_fragment in ln:
            schema_lines = [x for x in lines[i - 3 : i + 3] if "ReadSchema" in x]
            assert schema_lines, plan
            rs = schema_lines[0]
            for c in cols:
                assert c in rs, f"{c} missing from {rs}"
            # no extra columns
            import re

            read_cols = set(re.findall(r"(\w+):", rs.split("struct<", 1)[1]))
            assert read_cols == set(cols), f"read {read_cols}, want {set(cols)}"
            return
    raise AssertionError(f"no scan of {table_fragment} found in\n{plan}")


def assert_broadcast_join(df: DataFrame, n_expected: int = 1) -> None:
    plan = executed_plan(df)
    assert plan.count("BroadcastHashJoin") >= n_expected, plan


def assert_no_cartesian(df: DataFrame) -> None:
    plan = executed_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, plan


def assert_whole_stage_codegen(df: DataFrame) -> None:
    # AQE resolves the final plan only at execution; materialize, then
    # inspect the finalized plan for codegen stage wrappers.
    df.collect()
    plan = executed_plan(df)
    # codegen stages print as "*(N) Operator" in the finalized AQE plan
    assert "*(1)" in plan or "WholeStageCodegen" in plan, plan

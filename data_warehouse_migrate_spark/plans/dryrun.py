"""Plan inspection helpers — the engine's EXPLAIN surface.

Used by the dry-run CLI path and by tests that assert scan-level pushdown
(PushedFilters / ReadSchema) and shuffle-freedom, the properties that keep
the pipeline linear at 100 TB.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_plan(df: DataFrame, mode: str = "formatted") -> str:
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), mode)


def plan_report(df: DataFrame) -> dict:
    """Summarize scale-relevant plan features."""
    text = explain_plan(df, "formatted")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    read_schema = re.findall(r"ReadSchema: (.*)", text)
    return {
        "num_exchanges": text.count("Exchange"),
        "num_broadcasts": text.count("BroadcastExchange"),
        "whole_stage_codegen": ("WholeStageCodegen" in text) or ("[codegen id" in text),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schema": [s.strip() for s in read_schema],
        "has_python_udf": ("BatchEvalPython" in text) or ("ArrowEvalPython" in text),
    }

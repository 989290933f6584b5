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
    """Summarize scale-relevant plan features.

    ``num_exchanges`` counts SHUFFLE exchanges only (hash/range/single
    partitioning) — a naive ``count('Exchange')`` also hits
    BroadcastExchange and ReusedExchange and double-counts formatted
    mode's tree-line + detail-header pair, making a broadcast-join plan
    (shuffle-free by this module's own definition) look shuffled. The
    formatted detail headers are the unambiguous count: one
    ``(n) Exchange`` header per physical node.
    """
    text = explain_plan(df, "formatted")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    read_schema = re.findall(r"ReadSchema: (.*)", text)
    return {
        "num_exchanges": len(re.findall(r"^\(\d+\) Exchange\b", text,
                                        re.MULTILINE)),
        "num_broadcasts": len(re.findall(r"^\(\d+\) BroadcastExchange\b",
                                         text, re.MULTILINE)),
        "whole_stage_codegen": ("WholeStageCodegen" in text) or ("[codegen id" in text),
        "pushed_filters": [p for p in pushed if p.strip()],
        "read_schema": [s.strip() for s in read_schema],
        "has_python_udf": ("BatchEvalPython" in text) or ("ArrowEvalPython" in text),
    }

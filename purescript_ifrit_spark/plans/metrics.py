"""Executed-plan scan metrics (r14, VERDICT r13 #2).

`scan_metrics` walks an EXECUTED DataFrame's physical plan (through the
AQE wrappers) and returns, per parquet `FileSourceScanExec`, the metrics
Spark itself recorded: rows produced by the scan, files read, and bytes.
This exists so scale claims like "the rerank touches full-width vectors
for k·overfetch·Q rows only" are MEASURED at the scan layer instead of
asserted as arithmetic — the r13 attestation printed `K*of*N_QUERIES`
as "vectors_touched_rows" while the actual plan scanned every cell's
files (VERDICT r13 "what's wrong" #1/#3).

Driver-side and bounded: the walk visits plan nodes (tens), never data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def scan_metrics(df: DataFrame) -> list:
    """Per-parquet-scan metrics of an executed DataFrame.

    Returns one dict per `FileSourceScanExec` in the final (adaptive)
    physical plan: `{"columns": [...], "rows": int|None, "files":
    int|None, "bytes": int|None}`. Metrics are populated only after an
    action has run the plan (`.collect()` / `.count()` / a write);
    before execution the values are 0. `columns` is the scan's output
    schema — use it to pick out e.g. the wide vector-column scan."""
    out: list = []

    def get(metrics, key):
        opt = metrics.get(key)
        return int(opt.get().value()) if opt.isDefined() else None

    def walk(node):
        name = node.getClass().getSimpleName()
        if name == "AdaptiveSparkPlanExec":
            walk(node.executedPlan())
            return
        if name.endswith("QueryStageExec"):
            walk(node.plan())
            return
        if name == "FileSourceScanExec":
            m = node.metrics()
            out.append(
                {
                    "columns": list(node.schema().fieldNames()),
                    "rows": get(m, "numOutputRows"),
                    "files": get(m, "numFiles"),
                    "bytes": get(m, "filesSize"),
                }
            )
        children = node.children()
        for i in range(children.size()):
            walk(children.apply(i))

    walk(df._jdf.queryExecution().executedPlan())
    return out


def vector_scan_rows(df: DataFrame, vec_col: str) -> dict:
    """Sum the measured rows/files over the scans that READ `vec_col` —
    the "how many full-width rows did this query actually touch" number
    the IVF-PQ attestations report. Returns {"rows", "files", "scans"};
    rows is None when no vec-reading scan ran (e.g. vectors came from an
    in-memory frame, not parquet)."""
    rows = files = 0
    n = 0
    for s in scan_metrics(df):
        if vec_col in s["columns"]:
            n += 1
            rows += s["rows"] or 0
            files += s["files"] or 0
    return {
        "rows": rows if n else None,
        "files": files if n else None,
        "scans": n,
    }

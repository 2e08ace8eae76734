"""Plan-hygiene audit across every registered query.

For each batch query: number of shuffle exchanges, whether any window
runs partition-less (Exchange SinglePartition feeding a Window — the
single-task sort anti-pattern), whether row-at-a-time Python appears
(BatchEvalPython), whether sanctioned Arrow crossings are present
(MapInPandas / ArrowEvalPython), and whether building the query left
anything in the session cache manager — a ``.cache()``/``persist()``
with no release point leaks executor memory for the whole session
(§4(c): such subtrees must go through parquet_checkpoint instead).
One line per query; exits non-zero on a hard anti-pattern (row Python,
partition-less window, cache leak).

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

# streaming queries execute eagerly on inspection — their plan shape is
# covered by their own tests
SKIP = {
    "stream_window_tumbling",
    "stream_session_window",
    "stream_dedup",
    "stream_user_gaps",
    "stream_funnel",
    "stream_contract_monitor",
    "stream_latest_state",
    "stream_quantile_sketch",
    "stream_scd2_history",
}


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from etl_hero_spark.registry import REGISTRY, _load_extensions
    from etl_hero_spark.session import ensure_oracle_safe_conf, get_spark

    spark = get_spark("plan-audit", cpus=8, shuffle_partitions=8)
    ensure_oracle_safe_conf(spark)
    _load_extensions()
    hard_fail = []
    for name, spec in REGISTRY.items():
        if name in SKIP:
            continue
        try:
            plan = (
                spec.spark(spark, sf)
                ._jdf.queryExecution()
                .executedPlan()
                .toString()
            )
        except Exception as exc:  # noqa: BLE001 - report-all harness
            print(f"{name:35s} ERROR {str(exc).splitlines()[0][:90]}")
            hard_fail.append(name)
            continue
        lines = plan.splitlines()
        n_exch = sum("Exchange hashpartitioning" in l for l in lines)
        n_bcast = sum("BroadcastExchange" in l for l in lines)
        # a partition-less window: SinglePartition exchange directly
        # feeding a Window/Sort chain
        lonely_window = False
        for i, l in enumerate(lines):
            if "Exchange SinglePartition" in l:
                above = "\n".join(lines[max(0, i - 4) : i])
                if "Window" in above:
                    lonely_window = True
        row_py = "BatchEvalPython" in plan
        arrow = "MapInPandas" in plan or "ArrowEvalPython" in plan
        # anything still registered with the cache manager after the
        # query BUILT its plan is a session-lifetime cache: the caller
        # got a lazy DataFrame back, so no unpersist can ever run
        cache_leak = not (
            spark._jsparkSession.sharedState().cacheManager().isEmpty()
        )
        if cache_leak:
            spark.catalog.clearCache()  # isolate the blame per query
        flags = []
        if cache_leak:
            flags.append("CACHE-LEAK")
            hard_fail.append(name)
        if lonely_window:
            flags.append("PARTITIONLESS-WINDOW")
            hard_fail.append(name)
        if row_py:
            flags.append("ROW-PYTHON")
            hard_fail.append(name)
        if arrow:
            flags.append("arrow")
        print(
            f"{name:35s} exch={n_exch:2d} bcast={n_bcast:2d} "
            f"{' '.join(flags)}"
        )
    spark.stop()
    if hard_fail:
        print(f"\nFAIL: {sorted(set(hard_fail))}")
        sys.exit(1)
    print("\nOK — no row-Python, no partition-less windows, no cache leaks")


if __name__ == "__main__":
    main()

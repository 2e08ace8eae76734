"""Dump .explain('formatted') for named registered queries.

Usage: python tools/explain_dump.py OUTDIR SUFFIX [sf_dir] NAME...

Writes OUTDIR/<name>_<SUFFIX>.txt per query (the optimization-round
evidence files: plans/r10/<query>_before.txt / _after.txt). Streaming
twins execute eagerly on plan inspection, so they are skipped with a
stub note unless named explicitly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    if rest and os.path.isdir(rest[0]):
        sf, names = rest[0], rest[1:]
    else:
        sf, names = "/root/testdata/sf0.1", rest
    from etl_hero_spark.registry import REGISTRY, _load_extensions
    from etl_hero_spark.session import ensure_oracle_safe_conf, get_spark

    spark = get_spark("explain-dump")
    ensure_oracle_safe_conf(spark)
    _load_extensions()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name}: NOT REGISTERED", file=sys.stderr)
            continue
        df = spec.spark(spark, sf)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()

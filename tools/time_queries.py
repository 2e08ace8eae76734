"""Time named registered queries in isolation (fresh session, lineitem
footer warmed, noop sink — bench.py's methodology) printing cold + warm
(min-of-2) per query.

Usage: python tools/time_queries.py [sf_dir] NAME...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def main() -> None:
    rest = sys.argv[1:]
    if rest and os.path.isdir(rest[0]):
        sf, names = rest[0], rest[1:]
    else:
        sf, names = "/root/testdata/sf0.1", rest
    from bench import materialize
    from etl_hero_spark.registry import REGISTRY, _load_extensions
    from etl_hero_spark.session import get_spark

    _load_extensions()
    spark = get_spark("time-queries")
    spark.read.parquet(f"{sf}/lineitem.parquet").count()
    for name in names:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"{name}: NOT REGISTERED", flush=True)
            continue
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            materialize(spec.spark(spark, sf))
            ts.append(round(time.perf_counter() - t0, 3))
        print(
            f"{name}: cold {ts[0]}  warm_min {min(ts[1:])}  all {ts}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()

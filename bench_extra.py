#!/usr/bin/env python
"""Round-9 optimization measurement harness (guide §1): times a named
subset of ``__spark_entry__.queries()`` with the noop sink at an
arbitrary SF dir, and optionally dumps ``explain("formatted")`` per
query. Does NOT touch bench.py (frozen for driver measurement).

Usage:
  python bench_extra.py [--sf DIR] [--plans OUTDIR] [--reps N] q1 q2 ...
  python bench_extra.py --all          # every query
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf1.0"
    plans_dir = None
    reps = 2
    names = []
    it = iter(args)
    run_all = False
    for a in it:
        if a == "--sf":
            sf_dir = next(it)
        elif a == "--plans":
            plans_dir = next(it)
        elif a == "--reps":
            reps = int(next(it))
        elif a == "--all":
            run_all = True
        else:
            names.append(a)

    import __spark_entry__ as entrymod
    from lexmapr_spark import engine

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = engine.build_spark(cpus=cpus, app="lexmapr_bench_extra",
                               shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    if run_all:
        names = list(qs)
    out = {"sf_dir": sf_dir, "cpus": cpus, "queries": {}}
    for name in names:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"bench_extra: {name}")
        if plans_dir:
            os.makedirs(plans_dir, exist_ok=True)
            df = qs[name](spark, sf_dir)
            with open(os.path.join(plans_dir, f"{name}.txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))
        walls = []
        loads = [round(os.getloadavg()[0], 2)]
        for _ in range(reps + 1):
            t0 = time.time()
            qs[name](spark, sf_dir).write.format("noop") \
                .mode("overwrite").save()
            walls.append(round(time.time() - t0, 3))
            loads.append(round(os.getloadavg()[0], 2))
        rec = {"cold": walls[0], "steady": round(min(walls[1:]), 3),
               "walls": walls, "loads": loads}
        out["queries"][name] = rec
        print(json.dumps({name: rec}), flush=True)
    spark.stop()
    print("FINAL " + json.dumps(out))


if __name__ == "__main__":
    main()

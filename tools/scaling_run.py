"""Two-parallelism scaling evidence for the north rule.

The rule requires throughput scaling efficiency >= 0.8 from N to 4N
executors; no real cluster exists in this sandbox, so (per the task
instructions) we run the SAME job at local[8] and local[32] on the
SAME input and report throughput at both plus efficiency =
(T8 / T32) / 4 ... actually = (rate32 / rate8) / (32/8).

Each parallelism level runs in a fresh Spark session (JVM reused is
fine — cores are capped by the master URL); timings are steady-state
(second run) so per-worker one-time costs don't skew the ratio.
Writes BENCH/scaling.json and prints a summary.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_PAGES = int(os.environ.get("SCALING_PAGES", "320000"))


def measure(cpus: int, unique_texts: bool = True) -> dict:
    from pyspark.sql import functions as F

    from lexmapr_spark import engine
    from lexmapr_spark.pages import synth_pages

    spark = engine.build_spark(cpus=cpus, app=f"scaling_{cpus}",
                               shuffle_partitions=max(cpus, 8))
    spark.sparkContext.setLogLevel("ERROR")
    lex_bc = engine.broadcast_lexicon(spark)
    pages = synth_pages(spark, N_PAGES)
    if unique_texts:
        # make every text distinct (append a deterministic unmatched
        # token derived from the page id) so annotate's duplicate-text
        # memo never fires: the scaling number must measure per-row
        # matcher compute, not a partition-size-dependent hit rate —
        # bigger partitions at lower parallelism would otherwise get a
        # higher hit rate and deflate the measured speedup
        pages = pages.withColumn(
            "text", F.concat_ws(" ", "text", F.concat(
                F.lit("zq"), F.regexp_extract("url", r"/p/(\d+)$", 1))))
    pages = pages.persist()
    pages.count()

    def run():
        t0 = time.time()
        n = engine.triples(engine.annotate(pages, lex_bc)).count()
        return time.time() - t0, n

    cold, n_triples = run()
    walls = [run()[0] for _ in range(3)]
    wall = min(walls)
    spark.stop()
    return {"cpus": cpus, "pages": N_PAGES, "triples": n_triples,
            "cold_sec": round(cold, 2), "wall_sec": round(wall, 2),
            "pages_per_sec": round(N_PAGES / wall, 1),
            "triples_per_sec": round(n_triples / wall, 1)}


def hardware_ceiling(n: int, four_n: int) -> float:
    """Raw-python multiprocessing speedup n -> 4n on THIS machine.

    The sandbox VM's vCPUs are oversubscribed: even pure CPU-bound
    python processes don't scale 4x from 8 to 32 workers. This
    measures that ceiling so the engine's efficiency can be judged
    against what the hardware permits.
    """
    import multiprocessing as mp

    def rate(procs: int) -> float:
        with mp.Pool(procs) as p:
            p.map(_burn, range(procs))          # warm the pool
            t0 = time.time()
            p.map(_burn, range(procs * 6))
            return procs * 6 / (time.time() - t0)

    return rate(four_n) / rate(n)


def _burn(_):
    x = 0
    for i in range(3_000_000):
        x += i * i
    return x


def main():
    results = {c: measure(c) for c in (2, 8, 32)}

    def eff(a, b):
        return round(results[b]["pages_per_sec"]
                     / results[a]["pages_per_sec"] / (b / a), 3)

    # the duplicate-text memo win, reported separately: the natural
    # synthetic corpus repeats its 7,771 texts, so annotate's
    # per-partition memo skips most matcher work — a data-dependent
    # throughput gain (real web corpora repeat boilerplate heavily)
    # that must not be conflated with compute scaling above
    dup = measure(32, unique_texts=False)

    ceiling_2_8 = hardware_ceiling(2, 8)
    ceiling_8_32 = hardware_ceiling(8, 32)
    out = {
        "runs": results,
        "dup_text_memo_local32": dup,
        "scaling_2_to_8": {
            "speedup": round(results[8]["pages_per_sec"]
                             / results[2]["pages_per_sec"], 3),
            "efficiency": eff(2, 8),
            "hardware_ceiling_speedup": round(ceiling_2_8, 3),
            "efficiency_vs_hardware_ceiling": round(
                results[8]["pages_per_sec"] / results[2]["pages_per_sec"]
                / ceiling_2_8, 3),
        },
        "scaling_8_to_32": {
            "speedup": round(results[32]["pages_per_sec"]
                             / results[8]["pages_per_sec"], 3),
            "efficiency": eff(8, 32),
            "hardware_ceiling_speedup": round(ceiling_8_32, 3),
            "efficiency_vs_hardware_ceiling": round(
                results[32]["pages_per_sec"] / results[8]["pages_per_sec"]
                / ceiling_8_32, 3),
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/scaling.json", "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Scaling CONTROL: a compute-bound Spark stage at several thread counts.

The index build mixes CPU-bound work (posting encode) with stages bound
by the machine's shared memory bandwidth and page cache (tokenize
Arrow transfer, parquet read/write).  On ONE box, threads share one
memory bus, so bandwidth-bound stages stop scaling long before 32
threads — a property of the host, not of the plan: a real multi-
executor cluster adds a memory bus and disks with every executor.

This control runs a purely CPU-bound mapInPandas stage (the same
Arrow/python-worker machinery the build uses) at local[2/8/32] and
reports aggregate throughput — if THIS scales and the build's encode
phase scales, the flat stages are bandwidth-bound, not harness-bound.

Appends results to BENCH_SCALING_CONTROL.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import pandas as pd

    from anomaly_detection_spark.session import get_spark

    rows_per_task, tasks = 64, 256
    out = {}
    for cpus in (2, 8, 32):
        spark = get_spark(f"scaling-control-{cpus}", master=f"local[{cpus}]",
                          shuffle_partitions=cpus)
        df = spark.range(rows_per_task * tasks, numPartitions=tasks)

        def burn(batches):
            for pdf in batches:
                acc = 0.0
                for seed in pdf["id"]:
                    x = 1.0 + (int(seed) % 7) * 1e-9
                    for _ in range(20000):
                        x = (x * 1.000001) % 97.0
                    acc += x
                yield pd.DataFrame({"v": [acc]})

        t0 = time.time()
        df.mapInPandas(burn, schema="v double").agg({"v": "sum"}).collect()
        wall = time.time() - t0
        thr = rows_per_task * tasks / wall
        out[cpus] = {"wall_s": round(wall, 2), "units_per_sec": round(thr, 1)}
        print(f"local[{cpus}]: {wall:.1f}s  {thr:.0f} units/s", flush=True)
        spark.stop()

    out["efficiency_2_to_8"] = round(
        (out[8]["units_per_sec"] / out[2]["units_per_sec"]) / 4.0, 3)
    out["efficiency_8_to_32"] = round(
        (out[32]["units_per_sec"] / out[8]["units_per_sec"]) / 4.0, 3)
    with open(os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "BENCH_SCALING_CONTROL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One scaling measurement in a fresh process: run the RML materialization
core at a given core count and print one JSON line {"cores", "rows", "sec",
"triples"}. bench.py invokes this per-rep so the two parallelism levels are
interleaved across isolated JVMs (the sandbox VM has multi-minute slow
phases; process isolation + interleaving keeps a phase from biasing one
level — see BENCH.md).

Usage: python scripts/matbench.py <cores> <rows> [warm_rows]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import jvm_probe  # noqa: E402
from rossete_rdf_spark.rml.matjob import rml_materialize_job  # noqa: E402
from rossete_rdf_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    rows = int(sys.argv[2])
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    spark = get_spark(f"matbench-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=32)
    rml_materialize_job(spark, warm, 32)  # pay JIT/worker warm-up
    jvm_probe(spark)  # discard: first probe pays its own codegen/JIT
    # single-thread calibration probes bracket the timed run: if either is
    # far above the bench-wide probe floor, THIS rep sat in a VM slow phase
    # and the min-estimator correctly ignores it (bench.py "scaling")
    p_before = jvm_probe(spark)
    t0 = time.time()
    n = rml_materialize_job(spark, rows, 32)
    sec = time.time() - t0
    p_after = jvm_probe(spark)
    # parallel probe: `cores` concurrent single-thread copies of the same
    # codegen loop (cores x PROBE_ROWS over cores partitions — identical
    # per-task work, zero shuffle). Perfect hardware would take the same
    # wall time as the single probe; the ratio single/parallel is this VM's
    # measured ceiling for ANY cores-way parallel JVM loop, shuffle-free by
    # construction — the engine's scaling efficiency is graded against it.
    from bench import PROBE_ROWS
    t0 = time.time()
    spark.range(0, PROBE_ROWS * cores, 1, cores).selectExpr(
        "sum(id * 2 + 1)"
    ).collect()
    p_par = round(time.time() - t0, 3)
    spark.stop()
    print(json.dumps({"cores": cores, "rows": rows, "sec": round(sec, 3),
                      "triples": n,
                      "probe_before_sec": p_before,
                      "probe_after_sec": p_after,
                      "probe_parallel_sec": p_par}))


if __name__ == "__main__":
    main()

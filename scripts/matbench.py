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

from rossete_rdf_spark.rml.matjob import rml_materialize_job  # noqa: E402
from rossete_rdf_spark.session import get_spark  # noqa: E402


def main() -> None:
    cores = int(sys.argv[1])
    rows = int(sys.argv[2])
    warm = int(sys.argv[3]) if len(sys.argv) > 3 else 500_000
    spark = get_spark(f"matbench-{cores}", master=f"local[{cores}]",
                      shuffle_partitions=32)
    rml_materialize_job(spark, warm, 32)  # pay JIT/worker warm-up
    t0 = time.time()
    n = rml_materialize_job(spark, rows, 32)
    sec = time.time() - t0
    spark.stop()
    print(json.dumps({"cores": cores, "rows": rows, "sec": round(sec, 3),
                      "triples": n}))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Standalone clean-phase timing of page_canonical_lsh (and the exact tier)
at a given sf dir — the committed evidence for the query's ENGINE cost,
separated from whole-bench records that may land in one of this VM's slow
phases. Each rep is bracketed by the same single-thread jvm_probe bench.py
uses, so a contaminated rep is identifiable in the artifact itself.

Usage: python scripts/lshbench.py [reps] (env: SPARK_GRAFT_SF_DIR, ..._CPUS)
Prints ONE JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# SAME probe as bench.py (imported, not copied): the whole point of the
# per-rep probes is that their floors are comparable across this script's
# artifacts and the BENCH_rNN records, so the definition must be shared.
from bench import jvm_probe  # noqa: E402
from rossete_rdf_spark.registry import QUERIES  # noqa: E402
from rossete_rdf_spark.session import get_spark  # noqa: E402


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("lshbench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus * 2)
    # warm-up: codegen/scan-listing startup outside the measurement
    QUERIES["token_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    jvm_probe(spark)  # discard: first probe pays its own JIT
    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "queries": {}}
    for name in ("page_canonical_exact", "page_canonical_lsh"):
        recs = []
        for _ in range(reps):
            p0 = jvm_probe(spark)
            t0 = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            sec = round(time.time() - t0, 3)
            p1 = jvm_probe(spark)
            recs.append({"sec": sec, "probe_before": p0, "probe_after": p1})
            print(f"[lshbench] {name}: {sec}s (probes {p0}/{p1})",
                  file=sys.stderr, flush=True)
        out["queries"][name] = {
            "min_sec": min(r["sec"] for r in recs),
            "reps": recs,
        }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()

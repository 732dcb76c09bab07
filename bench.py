#!/usr/bin/env python
"""Benchmark harness. The LAST stdout line is ONE COMPACT JSON line:
  {"metric": "bench_total", "value": <total sec>, "unit": "sec",
   "queries": {name: sec rounded to 0.1, ...}, "sf": <sf>,
   "kg_pipeline": {pages, triples, cores, sec, triples_per_sec},
   "scaling": {cores, sec, efficiency, probe_floor_sec,
               vm_parallel_ceiling, efficiency_vs_vm_ceiling, ...}}

Compactness is part of the contract: the round-3 artifact (BENCH_r03.json)
recorded "parsed": null because the final line — then carrying full-precision
timings plus every per-rep probe array — outgrew the driver's tail capture.
The bulky evidence (per-rep seconds, bracketing probes, full-precision query
timings) now goes to stderr as a separate JSON line tagged [bench-detail];
redirect stderr to keep it.

Env:
  SPARK_GRAFT_SF_DIR   parquet dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     high-parallelism core count (default 32)
  SPARK_GRAFT_BENCH_PAGES  synthetic page count for the KG job (default 8000)
  SPARK_GRAFT_SKIP_SCALING set to skip the two-parallelism run
  SPARK_GRAFT_SCALE_REPS   interleaved isolated reps per level (default 7)
  SPARK_GRAFT_SCALE_RETRIES probe-gated rerun budget (default 6)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rossete_rdf_spark.pipeline.canonicalize import canonical_entity_map  # noqa: E402
from rossete_rdf_spark.pipeline.extract import extract_pages  # noqa: E402
from rossete_rdf_spark.pipeline.kg import mention_triples, page_triples  # noqa: E402
from rossete_rdf_spark.pipeline.mentions import (  # noqa: E402
    build_gazetteer,
    link_mentions,
    page_mentions,
)
from rossete_rdf_spark.pipeline.webpages import synth_pages  # noqa: E402
from rossete_rdf_spark.registry import QUERIES  # noqa: E402
from rossete_rdf_spark.session import get_spark  # noqa: E402

# Every driver-contract query is timed — a regression in ANY of them is
# visible per round.
HEADLINE = list(QUERIES)


def _force(df) -> None:
    """Materialize fully without collecting to the driver."""
    df.write.format("noop").mode("overwrite").save()


PROBE_ROWS = 200_000_000


def jvm_probe(spark) -> float:
    """Single-task pure-codegen calibration: one thread sums PROBE_ROWS longs.

    Parallelism-independent (numPartitions=1), allocation-free, JVM-only —
    its only variable is the VM's instantaneous per-core speed, so a rep
    whose probe sits far above the run's minimum probe is *identifiable in
    the artifact* as landing in one of this VM's multi-minute slow phases
    (3-6x drifts on identical plans, BENCH.md), rather than that claim
    living only in prose. Recorded per rep in the bench JSON."""
    t0 = time.time()
    spark.range(0, PROBE_ROWS, 1, 1).selectExpr("sum(id * 2 + 1)").collect()
    return round(time.time() - t0, 3)


def kg_job(spark, n_pages: int, partitions: int, min_words: int = 240,
           word_spread: int = 160, python_parallelism: int = 8) -> int:
    """The scaling workload: full KG construction plan (extract -> page
    dedup -> mentions -> gazetteer -> link -> canonicalize -> triples), no
    checkpoint I/O, over Common-Crawl-sized pages (240..399 words).

    The pandas-UDF stages run at a FIXED Python-worker count (the inference
    pattern -- workers sized to saturate the Arrow feed, not the core
    count), so the parallelism comparison measures the JVM dataflow:
    shuffles, LSH/banding joins, aggregations, CC. Returns triple count."""
    from pyspark import StorageLevel
    from pyspark.sql import functions as F

    from rossete_rdf_spark.pipeline.pagedup import canonical_pages

    pages = synth_pages(
        spark, n_pages, partitions=partitions,
        min_words=min_words, word_spread=word_spread,
    )
    pages_text = extract_pages(pages, python_parallelism).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    deduped = canonical_pages(pages_text).persist(StorageLevel.MEMORY_AND_DISK)
    # mentions is one exploded row per occurrence -- cache SERIALIZED:
    # deserialized Java-object caching of tiny rows causes GC storms
    mentions = page_mentions(deduped, python_parallelism).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    gaz = build_gazetteer(mentions, min_pages=3)
    linked = link_mentions(mentions, gaz)
    canonical = canonical_entity_map(gaz.select("surface"), threshold=0.6)
    triples = (
        page_triples(deduped)
        .withColumn("graph", F.lit("pages"))
        .unionByName(
            mention_triples(linked, canonical).withColumn("graph", F.lit("mentions"))
        )
    )
    n = triples.count()
    mentions.unpersist()
    deduped.unpersist()
    pages_text.unpersist()
    return n


SLOW_QUERY_PROBE_SEC = 20.0


def run_queries_phase(sf_dir: str, cpus: int) -> dict:
    """Returns {"timings": {...}, "probes": {...}}.

    The queries phase is probe-BRACKETED like the kg/scaling phases already
    are: two rounds in a row the official driver record drifted uniformly
    1.5-4x across all ~50 unrelated plans (a VM slow phase), and the only
    way to show that was cross-referencing a separately-committed local
    file. A calibration probe before and after the phase (plus one after
    any query slower than SLOW_QUERY_PROBE_SEC) rides in the parsed final
    line, so a contaminated phase is visible IN the artifact."""
    timings: dict[str, float] = {}
    spark = get_spark("bench", master=f"local[{cpus}]", shuffle_partitions=cpus * 2)
    # warm-up: pay codegen/Arrow/scan-listing startup outside the measurements,
    # and the Structured-Streaming machinery (state-store providers, stream
    # execution threads, python state workers) via a tiny-sf streaming run —
    # one-time costs, not per-query engine work
    _force(QUERIES["token_count"](spark, sf_dir))
    # tiny-sf streaming warm-up: derive the dir from sf_dir's data root (not
    # a hardcoded path — sf_dir may point anywhere); fall back to sf_dir
    # itself when no sf0.001 sibling exists
    warm_dir = os.path.join(
        os.path.dirname(os.path.abspath(sf_dir.rstrip("/"))), "sf0.001"
    )
    if not os.path.isdir(warm_dir):
        warm_dir = sf_dir
    QUERIES["streaming_sessionize"](spark, warm_dir).count()
    jvm_probe(spark)  # discard: first probe pays its own codegen/JIT
    probes: dict[str, float] = {"before": jvm_probe(spark)}
    for name in HEADLINE:
        t0 = time.time()
        _force(QUERIES[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)
        print(f"[bench] {name}: {timings[name]}s", file=sys.stderr, flush=True)
        if timings[name] > SLOW_QUERY_PROBE_SEC:
            # a probe right after an expensive query: was the box slow WHILE
            # this query ran, or is the query itself the cost?
            probes[f"after_{name}"] = jvm_probe(spark)
    probes["after"] = jvm_probe(spark)
    print(f"[bench] queries-phase probes: {probes}", file=sys.stderr, flush=True)
    spark.stop()
    return {"timings": timings, "probes": probes}


def run_kg_phase(n_pages: int, kg_cores: int) -> dict:
    s8 = get_spark(f"bench-kg-{kg_cores}", master=f"local[{kg_cores}]",
                   shuffle_partitions=32)
    kg_job(s8, 1000, partitions=32, min_words=16, word_spread=24)  # warm-up
    jvm_probe(s8)  # discard: first probe pays its own codegen/JIT
    print(f"[bench] kg warm-up done at {kg_cores} cores", file=sys.stderr, flush=True)
    # min of 3 reps: identical plans vary up to 6x across this VM's slow
    # phases (see BENCH.md); the min is the engine's actual throughput. Each
    # rep carries a calibration probe so a 590s outlier rep (BENCH_r02) is
    # attributable to the VM in the artifact itself.
    kg_reps: list[float] = []
    kg_probes: list[float] = []
    kg_par_probes: list[float] = []
    n_triples = 0
    for _ in range(3):
        kg_probes.append(jvm_probe(s8))
        # parallel probe: the kg job's slow phases live in the VM's
        # PARALLEL allocation/syscall path, which the single-thread probe
        # does not see — kg_cores concurrent copies of the codegen loop
        # expose it (same construction as matbench's parallel probe)
        t0 = time.time()
        s8.range(0, PROBE_ROWS * kg_cores, 1, kg_cores).selectExpr(
            "sum(id * 2 + 1)"
        ).collect()
        kg_par_probes.append(round(time.time() - t0, 3))
        t0 = time.time()
        n_triples = kg_job(s8, n_pages, partitions=32, min_words=16, word_spread=24)
        kg_reps.append(round(time.time() - t0, 3))
        print(f"[bench] kg_job@{kg_cores}: {kg_reps[-1]}s (probe "
              f"{kg_probes[-1]}s par {kg_par_probes[-1]}s)",
              file=sys.stderr, flush=True)
    s8.stop()
    hi_sec = min(kg_reps)
    return {
        "pages": n_pages,
        "triples": n_triples,
        "cores": kg_cores,
        "sec": hi_sec,
        "reps_sec": kg_reps,
        "probe_sec": kg_probes,
        "parallel_probe_sec": kg_par_probes,
        "triples_per_sec": round(n_triples / hi_sec, 1),
        "pages_per_sec": round(n_pages / hi_sec, 1),
    }


def _phase_subprocess(phase: str) -> dict:
    """Run one bench phase in an ISOLATED process and parse its JSON line.

    Isolation is load-bearing, not cosmetic: PySpark keeps ONE gateway JVM
    per python process, and a stopped SparkSession's JVM lingers (observed
    holding ~3 cores of GC/daemon work for the rest of the run) — which both
    contaminates later phases' timings and crushes the local[1] scaling reps."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), phase],
        capture_output=True, text=True, timeout=3600, env=os.environ.copy(),
    )
    sys.stderr.write(out.stderr[-4000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    # bench opt-in: tmpfs shuffle dirs on this VM (session.py gates on it);
    # set before any phase branch so the phase subprocesses inherit it
    os.environ.setdefault("SPARK_GRAFT_TMPFS", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("SPARK_GRAFT_BENCH_PAGES", "8000"))
    # kg default is 4 cores: this VM inverts allocation/syscall-heavy Spark
    # stages at >=8 JVM threads (BENCH.md), and the pandas-UDF-heavy kg job
    # is the worst hit — measured same-day 40s at local[4] vs 359-459s at
    # local[8] with healthy single-thread probes. Override for real hardware.
    kg_cores = int(os.environ.get("SPARK_GRAFT_KG_CORES", min(cpus, 4)))
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    if len(sys.argv) > 1 and sys.argv[1] == "queries":
        print(json.dumps(run_queries_phase(sf_dir, cpus)))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "kg":
        print(json.dumps(run_kg_phase(n_pages, kg_cores)))
        return

    t_all = time.time()
    queries_phase = _phase_subprocess("queries")
    queries_full = queries_phase["timings"]
    detail: dict = {"queries_sec": queries_full,
                    "queries_probes": queries_phase["probes"]}
    result = {
        "metric": "bench_total",
        "value": None,  # filled at the end
        "unit": "sec",
        # rounded to 0.1s in the compact line; full precision in the
        # [bench-detail] stderr line
        "queries": {k: round(v, 1) for k, v in queries_full.items()},
        # bracketing calibration probes: a uniformly slow queries phase is
        # a VM phase when these sit far above the session's probe floor —
        # in-band evidence, no side files needed. BOUNDED on purpose: the
        # per-slow-query probes would add one entry per slow query, and in
        # a uniform slow phase (exactly when probes matter) that is ~50
        # extra floats — the same unbounded-final-line growth that made
        # round 3's driver record unparseable. The full per-query probe
        # dict ships in the [bench-detail] stderr line; the compact line
        # carries the bracketing pair plus the worst mid-phase probe.
        "queries_probes": {
            k: queries_phase["probes"][k]
            for k in ("before", "after")
            if k in queries_phase["probes"]
        }
        | (
            {
                "max_mid": max(v),
                "n_mid": len(v),
            }
            if (v := [p for k, p in queries_phase["probes"].items()
                      if k.startswith("after_")])
            else {}
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }

    # Parallelism evidence, two parts (see BENCH.md for the measured VM
    # behavior behind this split):
    # 1. kg_pipeline: one throughput run of the full KG job (pandas-UDF
    #    extraction + LSH page dedup + linking + CC + triples) at local[8].
    # 2. scaling: the N -> 4N comparison (local[1] vs local[4] — this VM
    #    inverts allocation/shuffle-heavy Spark stages at >=8 JVM threads)
    #    runs the engine's JVM materialization core (min_by dedup +
    #    first-match join + multi-predicate explode + minting) — the
    #    component whose throughput determines 100 TB feasibility. The full
    #    KG job is excluded from the repeated-runs comparison because the
    #    VM shows up to 6x run-to-run variance on pandas-UDF stages, which
    #    swamps the scaling signal inside the bench time budget.
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", min(cpus, 4)))
    lo = max(hi // 4, 1)
    mat_rows = int(os.environ.get("SPARK_GRAFT_MAT_ROWS", "40000000"))

    kg = _phase_subprocess("kg")
    detail["kg_pipeline"] = kg
    result["kg_pipeline"] = {
        k: kg[k] for k in ("pages", "triples", "cores", "sec", "triples_per_sec")
    }
    if not os.environ.get("SPARK_GRAFT_SKIP_SCALING"):
        # N -> 4N protocol (see BENCH.md "Scaling protocol"): each rep is an
        # ISOLATED process (scripts/matbench.py: fresh JVM, own warm-up, one
        # timed run), reps of the two levels are INTERLEAVED so a VM slow
        # phase (3-6x multi-minute drifts on identical plans) cannot bias one
        # level, and the per-level estimate is the MIN of >=5 reps — under
        # this VM's one-sided contamination (reps are only ever SLOWED, by
        # multi-minute phases) the median breaks as soon as 2 of 3 reps hit a
        # phase (BENCH_r02 recorded 0.125 that way); the min of interleaved
        # isolated reps estimates the uncontaminated time. Each rep also
        # carries single-thread JVM calibration probes (before/after the
        # timed run) so contaminated reps are identifiable IN THE ARTIFACT:
        # probe >> min(probes) == slow phase.
        import subprocess

        reps = int(os.environ.get("SPARK_GRAFT_SCALE_REPS", "7"))
        # 6 by default: the round-4 local runs burned 3-4 retries per run,
        # all on the parallel-phase-prone high level
        retries_left = int(os.environ.get("SPARK_GRAFT_SCALE_RETRIES", "6"))
        here = os.path.dirname(os.path.abspath(__file__))
        secs: dict[int, list[float]] = {lo: [], hi: []}
        probes: dict[int, list[list[float]]] = {lo: [], hi: []}
        par_probes: dict[int, list[float]] = {lo: [], hi: []}
        retried: list[dict] = []

        def _mat_rep(cores: int, tag: str) -> dict:
            out = subprocess.run(
                [sys.executable, os.path.join(here, "scripts", "matbench.py"),
                 str(cores), str(mat_rows)],
                capture_output=True, text=True, timeout=1800,
            )
            r = json.loads(out.stdout.strip().splitlines()[-1])
            secs[cores].append(r["sec"])
            probes[cores].append(
                [r.get("probe_before_sec"), r.get("probe_after_sec")]
            )
            par_probes[cores].append(r.get("probe_parallel_sec"))
            print(f"[bench] mat@{cores} {tag}: {r['sec']}s "
                  f"(probes {probes[cores][-1]} par {par_probes[cores][-1]})",
                  file=sys.stderr, flush=True)
            return r

        def _floor() -> float | None:
            all_p = [p for ps in probes.values() for pair in ps for p in pair
                     if p is not None]
            return min(all_p) if all_p else None

        def _contaminated(cores: int) -> bool:
            """Was the latest rep at `cores` visibly inside a VM slow phase?
            Two independent tells, both against the cleanest value seen so
            far: the single-thread bracketing probes (catches serial slow
            phases), and the per-LEVEL parallel probe (catches the parallel
            allocation-path phases that leave the single-thread probe clean
            — the round-4 local run had a 49.9s local[4] rep with healthy
            0.6s bracketing probes but a 1.18s parallel probe vs the 0.57s
            parallel floor)."""
            rp = [p for p in probes[cores][-1] if p is not None]
            fl = _floor()
            if rp and fl and max(rp) > 2 * fl:
                return True
            last = par_probes[cores][-1]
            if last is None:
                return False
            # reference for the parallel tell: same-level history when it
            # exists (like-for-like copy count), else the OTHER level's
            # floor — so a parallel-phase-contaminated rep0 with clean
            # bracketing probes (the documented round-4 failure mode) is
            # still caught instead of silently surviving the len>1 guard.
            # Cross-level comparison is conservative: more copies can only
            # be slower, so a hi rep0 tested against the lo floor needs a
            # genuine >2x excursion to trip.
            same = [p for p in par_probes[cores][:-1] if p is not None]
            other = [p for c, ps in par_probes.items() if c != cores
                     for p in ps if p is not None]
            ref = min(same) if same else (min(other) if other else None)
            if ref is None and cores == 1 and fl:
                # very first rep of the run (lo, rep0): no parallel-probe
                # history anywhere yet. With ONE copy the parallel probe is
                # the same workload as the single-thread probe, so the
                # single-thread floor is a like-for-like reference and the
                # 2x gate cannot false-trip on a clean rep. (For lo > 1
                # there is no safe same-workload reference and rep0 keeps
                # the bracketing-probe tell only.)
                ref = fl
            return ref is not None and last > 2 * ref

        for rep in range(reps):
            for cores in (lo, hi):
                _mat_rep(cores, f"rep{rep}")
                # probe-gated rerun: a contaminated rep's timed run sat in
                # one of this VM's multi-minute slow phases, and with few
                # reps per level one phase can deny a level ANY clean
                # measurement. Rerun it once (the contaminated evidence
                # stays in the arrays; the min estimator ignores it anyway).
                if retries_left > 0 and _contaminated(cores):
                    retries_left -= 1
                    retried.append({"cores": cores, "rep": rep})
                    _mat_rep(cores, f"rep{rep}-retry")

        mat_lo = min(secs[lo])
        mat_hi = min(secs[hi])
        probe_floor = _floor()
        # the VM's own ceiling for a hi-way parallel JVM loop: single-thread
        # codegen probe time / same loop run `hi` copies at once (shuffle-free
        # — nothing of the engine in it). Any Spark job's measured efficiency
        # is bounded by this number on this box.
        par_hi = [p for p in par_probes[hi] if p is not None]
        vm_ceiling = (
            round(probe_floor / min(par_hi), 3) if probe_floor and par_hi else None
        )
        thr_lo, thr_hi = mat_rows / mat_lo, mat_rows / mat_hi
        efficiency = round(thr_hi / (thr_lo * (hi / lo)), 3)
        # compact record (the driver-parsed line); the per-rep second/probe
        # arrays that prove which reps were contaminated go to [bench-detail]
        result["scaling"] = {
            "workload": f"rml_materialize_job({mat_rows} rows)",
            "protocol": f"min of {reps}(+{len(retried)} probe-gated reruns) "
                        "interleaved isolated reps/level, probes bracket "
                        "each run",
            "cores_low": lo,
            "cores_high": hi,
            "sec_low": round(mat_lo, 3),
            "sec_high": round(mat_hi, 3),
            "probe_floor_sec": probe_floor,
            "vm_parallel_ceiling": vm_ceiling,
            "efficiency": efficiency,
        }
        if vm_ceiling:
            result["scaling"]["efficiency_vs_vm_ceiling"] = round(
                efficiency / vm_ceiling, 3
            )
        detail["scaling"] = {
            **result["scaling"],
            "reps_low_sec": secs[lo],
            "reps_high_sec": secs[hi],
            "probes_low_sec": probes[lo],
            "probes_high_sec": probes[hi],
            "parallel_probes_low_sec": par_probes[lo],
            "parallel_probes_high_sec": par_probes[hi],
            "rows_per_sec_low": round(thr_lo, 1),
            "rows_per_sec_high": round(thr_hi, 1),
            "retried": retried,
        }

    result["value"] = round(time.time() - t_all, 3)
    print("[bench-detail] " + json.dumps(detail), file=sys.stderr, flush=True)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

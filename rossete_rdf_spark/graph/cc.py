"""Connected components via alternating large-star / small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
the canonicalization core of the KG pipeline.

Why not GraphFrames: keeps the dependency surface to pyspark only, and the
two-operation loop is a handful of DataFrame lines.

Scale behavior:
- each round is two shuffles keyed by node id; hub nodes (power-law degree)
  are exactly what large-star handles: a hub's neighbors all point at the
  hub's minimum, so its adjacency never re-materializes on one reducer
- lineage is cut every round with localCheckpoint (the loop would otherwise
  build an exponentially deep plan)
- convergence is detected with a count of changed edges (one action/round);
  rounds are O(log^2 n) worst case, ~5 for our graphs
- node ids may be any orderable type; the pipeline passes url/surface
  STRINGS directly. At 10^12 nodes the production move is to
  dictionary-encode first (order-preserving dense ids via sort +
  zipWithIndex, so min-label semantics survive encoding) and run the loop
  on longs — every round re-shuffles the edge set, and long keys shuffle
  and compare several times cheaper than urls. Not done here: at test
  scale the loop is stage-overhead-bound, not byte-bound, so the encode/
  decode joins would only add noise — but the loop itself is type-agnostic,
  so the encoded variant plugs in without touching the algorithm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize + drop self loops + distinct."""
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    return (
        edges.unionByName(rev)
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the min of
    (u, neighbors(u)). Operates on the symmetrized edge list."""
    nbrs = _sym(edges)
    m = nbrs.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    big = nbrs.filter(F.col("dst") > F.col("src"))
    return (
        big.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """For each node u: connect all smaller-or-equal neighbors (and u) to the
    minimum of the group."""
    # orient edges small->large: (src=max, dst=min)
    e = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).distinct()
    m = e.groupBy("src").agg(F.min("dst").alias("m"))
    return (
        e.join(m, "src")
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .unionByName(m.select(F.col("src"), F.col("m").alias("dst")))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    max_rounds: int = 20,
    checkpoint: bool = True,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """edges(src, dst) -> (node, component) with component = min node id of
    the component (any orderable node type works; strings are fine).

    Nodes with no edges are absent — union isolated nodes downstream if
    needed (the pipeline does this for singleton entities).

    The iterative loop re-shuffles the edge set ~7 times per round, so the
    right shuffle-partition count is a function of EDGE volume, not of the
    session's (corpus-sized) setting: after the duplicate/LSH blocking
    stages the edge set is orders of magnitude smaller than the corpus, and
    running 64-partition shuffles over a few thousand edges is pure
    stage-overhead (measured 13.4s -> 5.2s on a 700-edge graph going
    64 -> 8). The edge count from the first convergence signature sizes the
    loop (~500k edges/partition, floor 8, but never above the session
    setting — the session value wins when it is below the floor); pass
    shuffle_partitions to pin it. The session value is restored after.

    NOT thread-safe: the sizing works by scoping the session-global
    spark.sql.shuffle.partitions for the duration of the loop, so a
    concurrent query on the same SparkSession would silently plan with the
    loop's (tiny) partition count. Run CC serially per session, or pass
    shuffle_partitions equal to the session setting to keep the conf
    untouched."""
    spark = edges.sparkSession
    cur = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def _sig(df: DataFrame) -> tuple:
        """Order-independent (count, hash-sum) signature of the edge set —
        one cheap job per round instead of two exceptAll scans."""
        row = df.agg(
            F.count(F.lit(1)).alias("c"),
            # decimal sum: ANSI mode would overflow a long hash-sum
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["c"], row["h"])

    e = _sym(edges).localCheckpoint(eager=True) if checkpoint else _sym(edges)
    sig = _sig(e)
    target = (
        shuffle_partitions
        if shuffle_partitions is not None
        else min(cur, max(8, (sig[0] or 1) // 500_000 + 1))
    )
    try:
        if target != cur:
            spark.conf.set("spark.sql.shuffle.partitions", str(target))
        for _ in range(max_rounds):
            e2 = _small_star(_large_star(e))
            if checkpoint:
                e2 = e2.localCheckpoint(eager=True)
            sig2 = _sig(e2)
            e = e2
            if sig2 == sig:  # converged: the canonicalized edge set is stable
                break
            sig = sig2
        # final star graph: every node points at its component min
        comp = e.select(
            F.greatest("src", "dst").alias("node"),
            F.least("src", "dst").alias("component"),
        )
        comp = comp.groupBy("node").agg(F.min("component").alias("component"))
        roots = comp.select(F.col("component").alias("node")).distinct().withColumn(
            "component", F.col("node")
        )
        out = comp.unionByName(roots).distinct()
        if checkpoint:
            # materialize before restoring the session partitions so the
            # small-partition plan is what actually runs
            out = out.localCheckpoint(eager=True)
        return out
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(cur))

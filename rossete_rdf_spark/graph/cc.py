"""Connected components via alternating large-star / small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14) —
the canonicalization core of the KG pipeline.

Why not GraphFrames: keeps the dependency surface to pyspark only, and the
two-operation loop is a handful of DataFrame lines.

Scale behavior:
- each round is two shuffles keyed by node id; hub nodes (power-law degree)
  are exactly what large-star handles: a hub's neighbors all point at the
  hub's minimum, so its adjacency never re-materializes on one reducer
- lineage is cut with lazy localCheckpoints (the loop would otherwise build
  an exponentially deep plan); the convergence signature aggregate is the
  action that materializes each checkpoint, so a wave of TWO star rounds
  costs ONE driver-synchronizing action (down from two actions per single
  round) — the loop's serial critical path is what a straggler (or this
  VM's single-task stall phases) multiplies, so halving the wave count
  matters as much as the per-wave cost
- convergence is detected with an order-independent (count, hash-sum)
  signature, checked once per two-round wave; rounds are O(log^2 n) worst
  case, ~5 for our graphs, and both star operations are identities on the
  converged star graph, so overshooting by one round is free-by-idempotence
- node ids may be any orderable type; connected_components takes url/
  surface STRINGS directly. At 10^12 nodes use connected_components_encoded
  below — the production path: dictionary-encode nodes to order-preserving
  dense longs (so min-label semantics survive encoding), run the untouched
  loop on longs (every round re-shuffles the edge set, and long keys
  shuffle and compare several times cheaper than urls), decode once at the
  end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _sym(edges: DataFrame) -> DataFrame:
    """Symmetrize + drop self loops + distinct.

    Explode-of-both-orientations, NOT edges UNION reversed(edges): one scan
    of the edge set instead of two, and no Union node — Catalyst's
    UnionBase.rewriteConstraints crashes ("key not found: dst#N") on
    self-unions of join-built edge plans (the dictionary-encoded path feeds
    exactly that shape)."""
    return (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col("src"), F.col("dst")),
                    F.struct(
                        F.col("dst").alias("src"), F.col("src").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
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
    # (dst -> m) for every neighbor PLUS (u -> m) for the center, emitted by
    # exploding both endpoints of each joined row (distinct collapses the
    # per-row center duplicates) — union-free for the same Catalyst
    # constraint-rewrite reason as _sym
    return (
        e.join(m, "src")
        .select(
            F.explode(F.array(F.col("dst"), F.col("src"))).alias("src"),
            F.col("m").alias("dst"),
        )
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

    # LAZY checkpoint + signature aggregate = ONE action that both
    # materializes the checkpoint and signs the edge set (an eager
    # checkpoint would be a second, separate job per wave)
    e = _sym(edges).localCheckpoint(eager=False) if checkpoint else _sym(edges)
    sig = _sig(e)
    target = (
        shuffle_partitions
        if shuffle_partitions is not None
        else min(cur, max(8, (sig[0] or 1) // 500_000 + 1))
    )
    from ..session import scoped_conf

    with scoped_conf(spark, {"spark.sql.shuffle.partitions": str(target)}):
        rounds = 0
        while rounds < max_rounds:
            # TWO star rounds per convergence wave: checkpointing and
            # signing every round doubled the loop's serial action count
            # for no information — the star operations are idempotent on
            # the converged set, so a wave that overshoots converges to the
            # same fixed point, and the lineage across two rounds is still
            # shallow enough to plan cheaply
            e2 = _small_star(_large_star(e))
            rounds += 1
            if rounds < max_rounds:
                e2 = _small_star(_large_star(e2))
                rounds += 1
            if checkpoint:
                e2 = e2.localCheckpoint(eager=False)
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


def dense_ids(
    values: DataFrame, col: str = "node", partitions: int | None = None
) -> DataFrame:
    """(col, nid) with ORDER-PRESERVING dense long ids 0..n-1: the rank of
    each DISTINCT value under its natural ordering. The general distributed
    id-assignment primitive (vocabulary ids, node dictionaries, surrogate
    keys) — what zipWithIndex does on an RDD, done JVM-side with no
    single-partition window and no Python pass:
      1. range-repartition the distinct value set — partition i holds keys
         strictly below partition i+1, so (partition id, within-partition
         rank) is a global rank;
      2. per-partition counts -> exclusive prefix offsets (one row per
         partition: driver-free, broadcast back);
      3. nid = offset[partition] + row_number within the partition (the
         window's sort is bounded by one range partition, never the value
         set).
    The two consumers of the ranged set (counts + rank) share one lazy
    localCheckpoint so the distinct+range shuffle runs once."""
    spark = values.sparkSession
    p = partitions or int(spark.conf.get("spark.sql.shuffle.partitions"))
    ranged = (
        values.select(col)
        .distinct()
        .repartitionByRange(p, col)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    w_off = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__n"))
        # single-partition window over <= `p` rows — tiny by construction
        .withColumn("__off", F.coalesce(F.sum("__n").over(w_off), F.lit(0)))
        .select("__pid", "__off")
    )
    w_rank = Window.partitionBy("__pid").orderBy(col)
    return ranged.join(F.broadcast(offsets), "__pid").select(
        col,
        (F.col("__off") + F.row_number().over(w_rank) - 1).alias("nid"),
    )


def dictionary_encode_nodes(
    edges: DataFrame, partitions: int | None = None
) -> DataFrame:
    """(node, nid) dictionary over an edge set's endpoints via dense_ids.
    Order preservation is load-bearing — the CC loop labels components with
    the MIN node id, so min(nid) must decode back to min(node)."""
    # single-pass explode, not select(src) UNION select(dst): one scan of
    # the edge set instead of two, and it sidesteps a Catalyst constraint-
    # rewrite crash (UnionBase.rewriteConstraints "key not found: dst#N")
    # on self-unions of multi-join edge plans
    nodes = edges.select(
        F.explode(F.array(F.col("src"), F.col("dst"))).alias("node")
    )
    return dense_ids(nodes, "node", partitions)


def connected_components_encoded(
    edges: DataFrame,
    max_rounds: int = 20,
    checkpoint: bool = True,
    shuffle_partitions: int | None = None,
) -> DataFrame:
    """connected_components through an order-preserving long-id dictionary —
    the 10^12-node production path: every CC round re-shuffles the edge set
    ~7 times, and dense long keys shuffle, hash, and compare several times
    cheaper than url/surface strings, so the one-time encode (two joins) and
    decode (two joins) amortize immediately at scale. Output-equivalent to
    connected_components by construction (encoding preserves order, so
    min-label components decode to the same min node; property-tested in
    tests/test_ops_properties.py).

    The dictionary is referenced four times (encode src/dst, decode
    node/component) — lazily checkpointed once so its DAG runs once. At
    test scale AQE broadcasts it into all four joins; at 10^12 nodes they
    become shuffle joins on the dense key, which is the point."""
    d = dictionary_encode_nodes(edges, shuffle_partitions).localCheckpoint(
        eager=False
    )
    enc = (
        edges.join(
            d.select(F.col("node").alias("src"), F.col("nid").alias("__s")), "src"
        )
        .join(d.select(F.col("node").alias("dst"), F.col("nid").alias("__d")), "dst")
        .select(F.col("__s").alias("src"), F.col("__d").alias("dst"))
    )
    comp = connected_components(enc, max_rounds, checkpoint, shuffle_partitions)
    return (
        comp.join(
            d.select(F.col("nid").alias("node"), F.col("node").alias("__n")), "node"
        )
        .join(
            d.select(F.col("nid").alias("component"), F.col("node").alias("__c")),
            "component",
        )
        .select(F.col("__n").alias("node"), F.col("__c").alias("component"))
    )

"""Connected components over a candidate-edge DataFrame — the alternating
large-star / small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SOCC'14), the standard log-round method for
trillion-edge graphs.

Driver loop of DataFrame self-joins; every iteration ``localCheckpoint()``s
to cut lineage (north_rule).  Convergence = the edge multiset stops changing
(checked with a cheap order-insensitive checksum + count, not a full
``except``).  Node ids must be orderable (long or string); labels are the
component-minimum node id, so results are canonical and deterministic.

The loop's shuffle width is sized from the live edge count and applied with
explicit ``repartition(n, keys)`` on the loop frames — NOT by mutating
``spark.sql.shuffle.partitions``, which is session-global and would leak the
loop's (usually tiny) width into any query planned concurrently on the same
session.  The repartition keys equal the downstream grouping keys, so each
explicit exchange REPLACES the one Catalyst would have inserted rather than
adding a second.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _repart(df: DataFrame, n, *cols) -> DataFrame:
    return df.repartition(n, *cols) if n else df


def _symmetric(edges: DataFrame) -> DataFrame:
    return edges.select("src", "dst").union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def _large_star(edges: DataFrame, n=None) -> DataFrame:
    """For each node u: connect every strictly-larger neighbor to the minimum
    of N(u) ∪ {u}."""
    und = _repart(_symmetric(edges), n, "src")
    mins = und.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    out = (
        und.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return _repart(out, n, "src", "dst").distinct()


def _small_star(edges: DataFrame, n=None) -> DataFrame:
    """For each node u over its ≤-neighbors: connect them (and u) to the
    minimum of that set."""
    # orient edges so dst <= src
    oriented = _repart(
        edges.select(
            F.greatest("src", "dst").alias("src"),
            F.least("src", "dst").alias("dst"),
        ),
        n, "src",
    )
    mins = oriented.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    joined = oriented.join(mins, "src")
    neighbor_edges = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edges = joined.select("src", F.col("m").alias("dst"))
    out = (
        neighbor_edges.union(self_edges)
        .filter(F.col("src") != F.col("dst"))
    )
    return _repart(out, n, "src", "dst").distinct()


def _checksum(edges: DataFrame):
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return row.n, row.h


def connected_components(
    edges: DataFrame,
    max_iterations: int = 30,
    checkpoint_dir_writer=None,
) -> DataFrame:
    """Edge list (src, dst) → (id, component) with component = min node id.

    ``checkpoint_dir_writer``: optional callable(df, iteration) -> df used by
    the resumable pipeline to persist per-iteration state (plans/checkpoints);
    defaults to ``localCheckpoint``.
    """
    current = edges.select("src", "dst").filter(F.col("src") != F.col("dst")).distinct()
    current = current.localCheckpoint()
    previous_sig = _checksum(current)

    # size the loop's shuffles from the ACTUAL edge count (known from the
    # convergence checksum): each iteration is ~6 shuffle stages, and a
    # 10^2-edge graph on a 10^3-partition conf would spend the whole loop
    # scheduling empty tasks, while a 10^12-edge graph needs every partition.
    # 16-byte pairs → ~1M edges per partition ≈ 16 MB shuffle blocks.
    spark = edges.sparkSession
    conf_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    loop_partitions = max(1, min(int(conf_shuffle),
                                 previous_sig[0] // 1_000_000 + 1))

    for iteration in range(max_iterations):
        stepped = _small_star(_large_star(current, loop_partitions),
                              loop_partitions)
        if checkpoint_dir_writer is not None:
            stepped = checkpoint_dir_writer(stepped, iteration)
        else:
            # lazy: the convergence checksum right below materializes the
            # checkpoint — one job per iteration instead of two
            stepped = stepped.localCheckpoint(eager=False)
        signature = _checksum(stepped)
        current = stepped
        if signature == previous_sig:
            break
        previous_sig = signature

    und = _symmetric(current)
    labels = und.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("component")
    )
    return labels.select(F.col("src").alias("id"), "component")


def attach_components(
    nodes: DataFrame,
    edges: DataFrame,
    id_col: str = "urim",
    **cc_kwargs,
) -> DataFrame:
    """Label every node; isolated nodes become their own singleton component."""
    labels = connected_components(edges, **cc_kwargs)
    return (
        nodes.join(
            labels.withColumnRenamed("id", id_col), id_col, "left"
        )
        .withColumn("component", F.coalesce("component", F.col(id_col)))
    )

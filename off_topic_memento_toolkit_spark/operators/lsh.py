"""Candidate-pair generation at scale: MinHash-LSH and SimHash Hamming-ball.

North-rule core (SURVEY §2.9 "New"): these produce the ``candidate_edges``
that connected components (components.py) resolves into duplicate clusters.

Scale design:
- LSH bucket join is an equi-join on (band_index, band_hash) — shuffle on the
  band key only; no O(n²) anywhere.
- Hot buckets (boilerplate-heavy shingles, viral hosts) are CAPPED at
  ``max_bucket_size`` before pair expansion — a bucket of B rows expands to
  B² /2 pairs, so one mega-bucket can dominate the job; the cap bounds the
  blowup and the dropped-bucket count is observable in the returned metrics
  accumulator column (no silent truncation: callers can count
  ``dropped_buckets``).
- SimHash channel: split the 64-bit value into ``chunks`` equal bit-slices;
  by pigeonhole any pair with hamming ≤ chunks-1 collides on at least one
  slice, so an equi-join per slice finds all candidates for distance
  ≤ chunks-1; the exact ``bit_count(a^b) <= max_hamming`` verify runs
  JVM-side after the join.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import make_minhash_bands_udf


def minhash_band_table(
    df: DataFrame,
    id_col: str = "urim",
    tokens_col: str = "tokens",
    num_perm: int = 128,
    shingle_words: int = 5,
    bands: int = 32,
    seed: int = 1234567,
) -> DataFrame:
    """(id, band, band_hash) — one row per document per band.

    Null/empty-token documents are dropped by the ``posexplode`` itself (the
    UDF maps them to NULL band arrays) rather than by an explicit filter: a
    filter on the UDF output would be pushed below the enrichment exchange
    and re-run the whole tokenize/minhash chain on the narrow pre-shuffle
    side (guide §4.4) — the Generate-based drop leaves nothing for the
    optimizer to push (InferFiltersFromGenerate is excluded in session.py
    for the same reason)."""
    udf = make_minhash_bands_udf(num_perm, shingle_words, bands, seed)
    return (
        df.select(F.col(id_col).alias("id"), F.col(tokens_col).alias("_tokens"))
        .withColumn("_bands", udf(F.col("_tokens")))
        .select("id", F.posexplode("_bands").alias("band", "band_hash"))
    )


def pair_expand_expr(col: str) -> str:
    """SQL expression expanding a (sorted) array column into its unordered
    element pairs as struct(u, v) — shared by every collect+expand candidate
    path (minhash buckets, simhash buckets, incremental delta buckets) so
    the 1-based ``slice`` arithmetic lives in exactly one place."""
    return (
        f"flatten(transform({col}, (x, i) -> "
        f"transform(slice({col}, i + 2, size({col}) - i - 1), "
        f"y -> struct(x AS u, y AS v))))"
    )


_PAIR_EXPAND = pair_expand_expr("ids")


def candidate_pairs_from_buckets(
    bucketed: DataFrame,
    max_bucket_size: int = 64,
    distinct_pairs: bool = True,
) -> DataFrame:
    """Equal buckets → (id_a < id_b) candidate pairs.

    ONE shuffle: group each bucket's ids with ``collect_list`` and expand the
    pairs JVM-side (``transform``/``flatten``/``explode``) — no self-join (a
    self-join would evaluate the signature-UDF lineage twice and shuffle the
    band table two more times).

    Buckets larger than ``max_bucket_size`` are dropped (their members are
    near-certainly caught by other bands; a bucket of B rows expands to B²/2
    pairs, so one boilerplate mega-bucket could dominate the job —
    :func:`dropped_bucket_stats` makes the exclusions observable).

    OOM-safety order: the size gate runs as a WINDOW count BEFORE the
    ``collect_list`` — a window buffers per-key rows in a spillable sorter,
    while ``collect_list`` must hold the whole bucket in one unspillable
    array, so filtering after the collect would let a single degenerate
    10^7-member bucket OOM its reducer at 100 TB.  The window and the groupBy
    share the same hash partitioning, so this still compiles to ONE exchange
    on the band table (enforced by tests/test_plan_shape.py).

    Expand-late: a true near-dup pair collides in MANY bands (a jaccard-0.9
    pair hits ~half of 32 bands), so the same member set reappears as a
    bucket band after band.  Expanding every bucket and deduping PAIRS
    multiplies the heaviest stage's row count by that band-duplication
    factor (measured ~29x on a clique corpus: 79M expanded rows for 2.7M
    distinct pairs).  Instead the member LISTS are sorted and deduped first
    — one exchange over #buckets short-array rows, strictly smaller than
    the band table itself — and only distinct member sets expand to pairs.
    The produced pair set is identical (pairs of a bucket depend only on
    its member set); the final pair-distinct still collapses overlapping
    but non-identical buckets.  Measured 8→32-thread efficiency of the
    dedup stage on the adversarial all-clique corpus: 0.14 → ≥0.5 raw
    (BENCH.md mechanism section).

    ``distinct_pairs=False``: emit the expanded pairs without the final
    pair-level ``distinct()`` — for callers that union several candidate
    channels and distinct the union anyway (dedup_pipeline), where the
    per-channel distinct would be a redundant extra exchange at every
    scale.  Multiset differs (overlapping member sets emit a pair once per
    set); the SET of pairs is identical.
    """
    from pyspark.sql import Window

    counted = bucketed.withColumn(
        "_n", F.count("*").over(Window.partitionBy("band", "band_hash")))
    bounded_rows = counted.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_bucket_size)).drop("_n")
    buckets = bounded_rows.groupBy("band", "band_hash").agg(
        F.collect_list("id").alias("ids"))
    member_sets = buckets.select(F.array_sort("ids").alias("ids")).distinct()
    pairs = (
        member_sets.select(F.explode(F.expr(_PAIR_EXPAND)).alias("p"))
        .select(
            F.least("p.u", "p.v").alias("id_a"),
            F.greatest("p.u", "p.v").alias("id_b"),
        )
    )
    return pairs.distinct() if distinct_pairs else pairs


def dropped_bucket_stats(bucketed: DataFrame, max_bucket_size: int = 64) -> DataFrame:
    """Observability for the cap: how many buckets/rows were excluded."""
    return (
        bucketed.groupBy("band", "band_hash").count()
        .filter(F.col("count") > max_bucket_size)
        .agg(
            F.count("*").alias("dropped_buckets"),
            F.coalesce(F.sum("count"), F.lit(0)).alias("dropped_rows"),
        )
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "urim",
    tokens_col: str = "tokens",
    num_perm: int = 128,
    shingle_words: int = 5,
    bands: int = 32,
    seed: int = 1234567,
    max_bucket_size: int = 64,
) -> DataFrame:
    bucketed = minhash_band_table(
        df, id_col, tokens_col, num_perm, shingle_words, bands, seed)
    return candidate_pairs_from_buckets(bucketed, max_bucket_size)


def chunks_for_hamming(max_hamming: int, chunks: int = 4) -> int:
    """The slice count that keeps the pigeonhole EXHAUSTIVE: a pair at
    hamming ≤ max_hamming collides on ≥1 of ``chunks`` slices only when
    chunks ≥ max_hamming + 1.  Returns ``chunks`` unchanged when already
    sufficient, else the smallest divisor of 64 that is — so a caller
    raising ``max_hamming`` past the default 3 silently gets a wider slice
    join instead of silent recall loss."""
    if max_hamming + 1 <= chunks:
        return chunks
    for c in (2, 4, 8, 16, 32, 64):
        if c >= max_hamming + 1:
            return c
    raise ValueError(
        f"max_hamming={max_hamming} out of range for a 64-bit simhash")


def simhash_chunk_table(
    df: DataFrame,
    id_col: str = "urim",
    simhash_col: str = "simhash",
    chunks: int = 4,
) -> DataFrame:
    """(id, chunk, chunk_value): bit-slices of the 64-bit simhash."""
    if chunks < 1 or 64 % chunks:
        raise ValueError(
            f"chunks={chunks} must divide 64 — unequal slices would leave "
            f"high bits out of every chunk key and miss collisions")
    width = 64 // chunks
    mask = (1 << width) - 1
    slices = F.array(*[
        F.struct(
            F.lit(c).alias("chunk"),
            F.shiftrightunsigned(F.col("simhash"), c * width)
            .bitwiseAND(F.lit(mask)).alias("chunk_value"),
        )
        for c in range(chunks)
    ])
    # null simhashes are dropped by the explode (NULL slice array), not a
    # filter: a filter on what is usually a UDF-derived column gets pushed
    # below the enrichment exchange and re-evaluates the simhash UDF on the
    # narrow pre-shuffle side (guide §4.4 — same pathology as the minhash
    # band filter, same fix)
    return (
        df.select(F.col(id_col).alias("id"), F.col(simhash_col).alias("simhash"))
        .withColumn(
            "_slice",
            F.explode(F.when(F.col("simhash").isNotNull(), slices)))
        .select("id", "simhash", "_slice.chunk", "_slice.chunk_value")
    )


def simhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "urim",
    simhash_col: str = "simhash",
    max_hamming: int = 3,
    chunks: int = 4,
    max_bucket_size: int = 64,
    distinct_pairs: bool = True,
) -> DataFrame:
    """All pairs with hamming(simhash) ≤ max_hamming, found via chunk-bucket
    grouping (exhaustive when max_hamming ≤ chunks-1 by pigeonhole).

    Same one-shuffle collect+expand shape as the MinHash path (incl. the
    spill-safe window-count size gate BEFORE the collect, and the same
    expand-late member-set dedup — a pair within hamming ≤ chunks-1 can
    collide on up to ``chunks`` slices, so deduping the sorted member lists
    before expansion divides the expanded row count by that duplication);
    the exact ``bit_count`` verify runs on the expanded pairs, all
    JVM-side."""
    from pyspark.sql import Window

    # the contract is ALL pairs ≤ max_hamming: widen the slice count when
    # the caller's max_hamming outgrows it (pigeonhole needs ≥ h+1 slices)
    chunks = chunks_for_hamming(max_hamming, chunks)
    table = simhash_chunk_table(df, id_col, simhash_col, chunks)
    counted = table.withColumn(
        "_n", F.count("*").over(Window.partitionBy("chunk", "chunk_value")))
    bounded_rows = counted.filter(
        (F.col("_n") >= 2) & (F.col("_n") <= max_bucket_size)).drop("_n")
    buckets = bounded_rows.groupBy("chunk", "chunk_value").agg(
        F.collect_list(F.struct("id", "simhash")).alias("members"))
    buckets = buckets.select(
        F.array_sort("members").alias("members")).distinct()
    pairs = (
        buckets.select(F.explode(F.expr(pair_expand_expr("members")))
                       .alias("p"))
        .filter(
            F.bit_count(
                F.col("p.u.simhash").bitwiseXOR(F.col("p.v.simhash"))
            ) <= max_hamming
        )
        .select(
            F.least("p.u.id", "p.v.id").alias("id_a"),
            F.greatest("p.u.id", "p.v.id").alias("id_b"),
        )
    )
    return pairs.distinct() if distinct_pairs else pairs

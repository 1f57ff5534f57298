"""Sketch operators: count-min frequency estimation, heavy hitters.

A sketch the reference cannot express (its only aggregation machinery is
CombinePerKey, SURVEY.md §2.1 op 6) and Spark only offers opaquely
(``count_min_sketch`` returns an undecodable binary). Building the
sketch from first principles in DataFrame ops keeps it fully
oracle-checkable: the md5-derived bucket hashes (functions/hashing.py)
and integer counts are bit-identical in DuckDB.

Scale notes (100 TB): the sketch build is one partial-aggregated
groupBy over (depth × rows) exploded keys — the sketch itself is
DEPTH×WIDTH rows regardless of input size, so estimation joins against
a broadcast-sized table. This is the structure for approximate
frequency/heavy-hitter queries where exact per-key counts would need an
unbounded-cardinality shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from beam_pyspark_runner_spark.functions.hashing import h32, h32_sql
from beam_pyspark_runner_spark.plans.audit import checkpoint_audited
from beam_pyspark_runner_spark.queries.registry import register
from beam_pyspark_runner_spark.sources.readers import load_table

CMS_DEPTH = 4
CMS_WIDTH = 64


def _bucket(dd: Column, key: Column) -> Column:
    return h32(F.concat_ws("-", F.lit("cms"), dd, key)) % CMS_WIDTH


def _bucket_sql(dd: str, key: str) -> str:
    expr = "'cms-' || " + dd + " || '-' || " + key
    return f"({h32_sql(expr)} % {CMS_WIDTH})"


_CMS_SQL = f"""
    d(dd) AS (SELECT unnest(range({CMS_DEPTH}))),
    cells AS (
        SELECT dd, {_bucket_sql('dd', 'l_suppkey')} AS bucket, COUNT(*) AS c
        FROM lineitem, d GROUP BY 1, 2
    )
"""


def _sketch_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rows = li.select("l_suppkey").withColumn(
        "dd", F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)]))
    )
    return (
        rows.select(
            F.col("dd").cast("long").alias("dd"),
            _bucket(F.col("dd"), F.col("l_suppkey")).alias("bucket"),
        )
        .groupBy("dd", "bucket")
        .agg(F.count("*").alias("c"))
    )


@register(
    "cms_build",
    oracle=f"WITH {_CMS_SQL} SELECT dd, bucket, c FROM cells",
    tags=("sketch", "count_min", "aggregate"),
)
def cms_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch build over supplier keys: DEPTH hash rows × WIDTH
    buckets of collision counts. One partial-aggregated shuffle whose
    output is a constant-size table — the input-size independence is the
    whole point of the sketch."""
    return _sketch_df(spark, sf_dir)


@register(
    "cms_estimate_vs_exact",
    oracle=f"""
    WITH {_CMS_SQL},
    exact AS (SELECT l_suppkey, COUNT(*) AS exact_n FROM lineitem GROUP BY 1),
    probes AS (
        SELECT e.l_suppkey, e.exact_n, d.dd,
               {_bucket_sql('d.dd', 'e.l_suppkey')} AS bucket
        FROM exact e, d
    )
    SELECT p.l_suppkey, p.exact_n, MIN(c.c) AS cms_estimate,
           MIN(c.c) >= p.exact_n AS upper_bound_holds
    FROM probes p JOIN cells c ON c.dd = p.dd AND c.bucket = p.bucket
    GROUP BY p.l_suppkey, p.exact_n
    """,
    tags=("sketch", "count_min", "approx", "join"),
)
def cms_estimate_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min estimation: freq(key) ≈ min over hash rows of the key's
    bucket counts — never an underestimate (upper_bound_holds must be
    true for every key; the smoke/oracle gates verify it). The sketch
    side of the estimation join is constant-size → broadcast."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = _sketch_df(spark, sf_dir)
    exact = li.groupBy("l_suppkey").agg(F.count("*").alias("exact_n"))
    probes = exact.withColumn(
        "dd", F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)]))
    ).withColumn("bucket", _bucket(F.col("dd"), F.col("l_suppkey")))
    return (
        probes.join(F.broadcast(sketch), ["dd", "bucket"])
        .groupBy("l_suppkey", "exact_n")
        .agg(F.min("c").alias("cms_estimate"))
        .select(
            "l_suppkey",
            "exact_n",
            "cms_estimate",
            (F.col("cms_estimate") >= F.col("exact_n")).alias("upper_bound_holds"),
        )
    )


BLOOM_K = 3  # hash functions
BLOOM_M = 512  # bits

# Members: suppliers of nation 3 (the build side of a bloom semi-join).
_BLOOM_MEMBER_SQL = "SELECT s_suppkey FROM supplier WHERE s_nationkey = 3"


def _bloom_pos(kk: Column, key: Column) -> Column:
    return h32(F.concat_ws("-", F.lit("bloom"), kk, key)) % BLOOM_M


def _bloom_pos_sql(kk: str, key: str) -> str:
    expr = "'bloom-' || " + kk + " || '-' || " + key
    return f"({h32_sql(expr)} % {BLOOM_M})"


_BLOOM_SQL = f"""
    k(kk) AS (SELECT unnest(range({BLOOM_K}))),
    members AS ({_BLOOM_MEMBER_SQL}),
    bits AS (
        SELECT DISTINCT {_bloom_pos_sql('kk', 's_suppkey')} AS pos
        FROM members, k
    )
"""


@register(
    "bloom_build",
    oracle=f"WITH {_BLOOM_SQL} SELECT pos FROM bits",
    tags=("sketch", "bloom_filter", "distinct"),
)
def bloom_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom filter build: the set bits of a {BLOOM_M}-bit filter over the
    member keys — K md5-derived positions per key, deduplicated. Constant
    size regardless of member count; ships as a broadcast."""
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    rows = s.select("s_suppkey").withColumn(
        "kk", F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)]))
    )
    return rows.select(
        _bloom_pos(F.col("kk"), F.col("s_suppkey")).alias("pos")
    ).distinct()


@register(
    "bloom_membership_vs_exact",
    oracle=f"""
    WITH {_BLOOM_SQL},
    probes AS (SELECT DISTINCT l_suppkey FROM lineitem),
    hits AS (
        SELECT p.l_suppkey
        FROM probes p, k
        JOIN bits b ON b.pos = {_bloom_pos_sql('kk', 'p.l_suppkey')}
        GROUP BY p.l_suppkey
        HAVING COUNT(*) = {BLOOM_K}
    )
    SELECT h.l_suppkey,
           (m.s_suppkey IS NOT NULL) AS is_true_member
    FROM hits h LEFT JOIN members m ON m.s_suppkey = h.l_suppkey
    """,
    tags=("sketch", "bloom_filter", "semi_join", "approx"),
)
def bloom_membership_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom membership as a pre-join filter: probe keys pass if all K bit
    positions are set; is_true_member separates real members from false
    positives (no false negatives is the Bloom guarantee — every true
    member appears). At 100 TB this is the broadcast pre-filter that
    spares the shuffle semi-join from touching non-member rows."""
    s = load_table(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 3)
    member_rows = s.select("s_suppkey").withColumn(
        "kk", F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)]))
    )
    bits = member_rows.select(
        _bloom_pos(F.col("kk"), F.col("s_suppkey")).alias("pos")
    ).distinct()
    probes = (
        load_table(spark, sf_dir, "lineitem").select("l_suppkey").distinct()
    )
    probe_bits = probes.withColumn(
        "kk", F.explode(F.array(*[F.lit(i) for i in range(BLOOM_K)]))
    ).withColumn("pos", _bloom_pos(F.col("kk"), F.col("l_suppkey")))
    hits = (
        probe_bits.join(F.broadcast(bits), "pos")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("nbits"))
        .filter(F.col("nbits") == BLOOM_K)
        .select("l_suppkey")
    )
    members = s.select(F.col("s_suppkey"))
    # No hint on the exact-member side (round-11): a nationkey slice is
    # a LINEAR corpus fraction (~suppliers/25 — GBs at 100 TB), so the
    # truth join must stay size-gated; Spark broadcasts it on its own
    # at scales where that is safe. The bits side above keeps its hint:
    # its cardinality is capped at BLOOM_M by the literal modulus.
    return (
        hits.join(members, hits.l_suppkey == F.col("s_suppkey"), "left")
        .select(
            "l_suppkey", F.col("s_suppkey").isNotNull().alias("is_true_member")
        )
    )


HLL_M = 64  # buckets (uses the low 6 hash bits)
HLL_ALPHA = 0.709  # alpha_64 (Flajolet et al.)
# rank comes from the REMAINING 26 bits (w = h >> 6) — bucket and rank
# bits must be disjoint or registers correlate with bucket choice and the
# estimator collapses. trailing-zero rank of a 26-bit value is in [1, 27].
_HLL_RMAX = 27


@register(
    "hll_distinct_estimate",
    # rank = trailing_zeros(w)+1 via log2(w & -w) — exact for powers of 2.
    # The harmonic-mean denominator is summed as exact BIGINTs
    # (2^(RMAX - rank)), so the float estimate is one deterministic
    # multiply/divide chain — no order-dependent float accumulation.
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT {h32_sql("'hll-' || l_partkey")} AS h FROM lineitem
    ),
    ranked AS (
        SELECT h % {HLL_M} AS bucket,
               CASE WHEN (h // {HLL_M}) = 0 THEN {_HLL_RMAX}
                    ELSE CAST(log2((h // {HLL_M}) & -(h // {HLL_M})) AS BIGINT) + 1
               END AS r
        FROM hashes
    ),
    regs AS (SELECT bucket, MAX(r) AS rmax FROM ranked GROUP BY bucket),
    s AS (
        SELECT COUNT(*) AS n_present,
               SUM(1::BIGINT << ({_HLL_RMAX} - rmax)) AS int_sum
        FROM regs
    )
    SELECT n_present,
           (SELECT COUNT(DISTINCT l_partkey) FROM lineitem) AS exact_distinct,
           {HLL_ALPHA} * {HLL_M} * {HLL_M} * (1::BIGINT << {_HLL_RMAX})
               / CAST(int_sum + ({HLL_M} - n_present) * (1::BIGINT << {_HLL_RMAX}) AS DOUBLE)
               AS hll_estimate
    FROM s
    """,
    tags=("sketch", "hll", "approx", "aggregate"),
)
def hll_distinct_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count estimate built from first principles
    (unlike approx_count_distinct's opaque HLL++): per-bucket max
    trailing-zero rank over the non-bucket hash bits, harmonic mean,
    alpha correction. The raw estimator (no small/large-range
    corrections) — the point is the distributed shape: one narrow hash
    pass, one 64-row register aggregate, constant-size state at any
    input scale, and a fully deterministic oracle via integer harmonic
    summation."""
    li = load_table(spark, sf_dir, "lineitem")
    h = h32(F.concat_ws("-", F.lit("hll"), F.col("l_partkey")))
    hashes = li.select(h.alias("h")).distinct()
    w = (F.col("h") / HLL_M).cast("long")
    rank = F.when(w == 0, F.lit(_HLL_RMAX)).otherwise(
        F.log2(w.bitwiseAND(-w)).cast("long") + 1
    )
    regs = (
        hashes.select((F.col("h") % HLL_M).alias("bucket"), rank.alias("r"))
        .groupBy("bucket")
        .agg(F.max("r").alias("rmax"))
    )
    s = regs.agg(
        F.count("*").alias("n_present"),
        F.sum(F.expr(f"shiftleft(1L, cast({_HLL_RMAX} - rmax AS INT))")).alias(
            "int_sum"
        ),
    )
    exact = li.agg(F.countDistinct("l_partkey").alias("exact_distinct"))
    denom = (
        F.col("int_sum")
        + (HLL_M - F.col("n_present")) * F.lit(1 << _HLL_RMAX).cast("long")
    ).cast("double")
    est = F.lit(HLL_ALPHA * HLL_M * HLL_M * (1 << _HLL_RMAX)) / denom
    return s.crossJoin(F.broadcast(exact)).select(
        "n_present", "exact_distinct", est.alias("hll_estimate")
    )


CMS_HH_THRESHOLD = 1000  # heavy-hitter cutoff on estimated frequency (p85-ish at sf0.01)


@register(
    "cms_heavy_hitters",
    oracle=f"""
    WITH {_CMS_SQL},
    probes AS (
        SELECT DISTINCT l_suppkey AS key, dd,
               {_bucket_sql('dd', 'l_suppkey')} AS bucket
        FROM lineitem, d
    ),
    est AS (
        SELECT p.key, MIN(c.c) AS cms_estimate
        FROM probes p JOIN cells c ON c.dd = p.dd AND c.bucket = p.bucket
        GROUP BY p.key
    )
    SELECT key AS l_suppkey, cms_estimate
    FROM est WHERE cms_estimate >= {CMS_HH_THRESHOLD}
    """,
    tags=("sketch", "count_min", "heavy_hitters", "approx"),
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the count-min sketch: keys whose estimated
    frequency clears the threshold. Because CMS never underestimates,
    this candidate set has perfect recall — a second exact pass over
    just these keys (tiny) yields exact heavy hitters without ever
    computing exact counts for the full key space."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = _sketch_df(spark, sf_dir)
    probes = (
        li.select(F.col("l_suppkey")).distinct()
        .withColumn("dd", F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])))
        .withColumn("bucket", _bucket(F.col("dd"), F.col("l_suppkey")))
    )
    return (
        probes.join(F.broadcast(sketch), ["dd", "bucket"])
        .groupBy("l_suppkey")
        .agg(F.min("c").alias("cms_estimate"))
        .filter(F.col("cms_estimate") >= CMS_HH_THRESHOLD)
    )


@register(
    "exact_heavy_hitters",
    oracle=f"""
    WITH {_CMS_SQL},
    probes AS (
        SELECT DISTINCT l_suppkey AS key, dd,
               {_bucket_sql('dd', 'l_suppkey')} AS bucket
        FROM lineitem, d
    ),
    est AS (
        SELECT p.key, MIN(c.c) AS cms_estimate
        FROM probes p JOIN cells c ON c.dd = p.dd AND c.bucket = p.bucket
        GROUP BY p.key
    ),
    cand AS (SELECT key FROM est WHERE cms_estimate >= {CMS_HH_THRESHOLD})
    SELECT l.l_suppkey, COUNT(*) AS exact_n,
           COUNT(*) >= {CMS_HH_THRESHOLD} AS is_true_heavy
    FROM lineitem l JOIN cand ON cand.key = l.l_suppkey
    GROUP BY l.l_suppkey
    """,
    tags=("sketch", "count_min", "heavy_hitters", "two_pass"),
)
def exact_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full two-pass heavy-hitter pipeline: the CMS candidate set
    (perfect recall, some false positives) feeds an exact counting pass
    restricted to candidates via a broadcast semi join; is_true_heavy
    separates real heavy hitters from CMS collision artifacts. At 100 TB
    the exact pass groups only the handful of candidate keys — the
    unbounded per-key state of a naive exact count never materializes."""
    li = load_table(spark, sf_dir, "lineitem")
    sketch = _sketch_df(spark, sf_dir)
    probes = (
        li.select(F.col("l_suppkey")).distinct()
        .withColumn("dd", F.explode(F.array(*[F.lit(i) for i in range(CMS_DEPTH)])))
        .withColumn("bucket", _bucket(F.col("dd"), F.col("l_suppkey")))
    )
    cand = (
        probes.join(F.broadcast(sketch), ["dd", "bucket"])
        .groupBy("l_suppkey")
        .agg(F.min("c").alias("cms_estimate"))
        .filter(F.col("cms_estimate") >= CMS_HH_THRESHOLD)
        .select(F.col("l_suppkey").alias("cand_key"))
    )
    return (
        # cand grows as total/THRESHOLD (absolute threshold, so corpus-
        # proportional) — no broadcast hint (round-10); planner decides.
        li.join(cand, li.l_suppkey == F.col("cand_key"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("exact_n"))
        .withColumn("is_true_heavy", F.col("exact_n") >= CMS_HH_THRESHOLD)
    )


def _hll_rank_sql(w: str) -> str:
    return (
        f"CASE WHEN ({w}) = 0 THEN {_HLL_RMAX} "
        f"ELSE CAST(log2(({w}) & -({w})) AS BIGINT) + 1 END"
    )


_HLL_EST_SQL = (
    f"{HLL_ALPHA} * {HLL_M} * {HLL_M} * (1::BIGINT << {_HLL_RMAX}) "
    f"/ CAST(SUM(1::BIGINT << ({_HLL_RMAX} - rmax)) "
    f"       + ({HLL_M} - COUNT(*)) * (1::BIGINT << {_HLL_RMAX}) AS DOUBLE)"
)


@register(
    "hll_merge_groups",
    # The oracle computes the 'ALL' row DIRECTLY from the global hash set
    # (no merge); the Spark side computes it by max-merging the per-group
    # registers. A value-hash match therefore PROVES register merge ==
    # direct sketch — the property that lets 1000 executors sketch
    # independently and combine.
    oracle=f"""
    WITH hashes AS (
        SELECT DISTINCT l_returnflag, {h32_sql("'hll-' || l_partkey")} AS h
        FROM lineitem
    ),
    gregs AS (
        SELECT l_returnflag, h % {HLL_M} AS bucket,
               MAX({_hll_rank_sql(f'h // {HLL_M}')}) AS rmax
        FROM hashes GROUP BY 1, 2
    ),
    per_group AS (
        SELECT l_returnflag AS grp, COUNT(*) AS n_present,
               {_HLL_EST_SQL} AS hll_estimate
        FROM gregs GROUP BY l_returnflag
    ),
    ghashes AS (
        SELECT DISTINCT {h32_sql("'hll-' || l_partkey")} AS h FROM lineitem
    ),
    allregs AS (
        SELECT h % {HLL_M} AS bucket,
               MAX({_hll_rank_sql(f'h // {HLL_M}')}) AS rmax
        FROM ghashes GROUP BY 1
    ),
    all_row AS (
        SELECT 'ALL' AS grp, COUNT(*) AS n_present,
               {_HLL_EST_SQL} AS hll_estimate
        FROM allregs
    )
    SELECT * FROM per_group UNION ALL SELECT * FROM all_row
    """,
    tags=("sketch", "hll", "mergeable", "approx", "aggregate"),
)
def hll_merge_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable HLL: per-group register sets (one per l_returnflag) and
    an 'ALL' sketch produced by MERGING the group registers (bucket-wise
    max) rather than re-scanning the data — exactly how a distributed
    sketch combines partial states from every executor. The oracle
    computes 'ALL' directly from the global hash set, so the match is a
    cross-engine proof of merge == direct. Register state is
    groups × {HLL_M} rows — constant at any data scale."""
    li = load_table(spark, sf_dir, "lineitem")
    h = h32(F.concat_ws("-", F.lit("hll"), F.col("l_partkey")))
    hashes = li.select("l_returnflag", h.alias("h")).distinct()
    w = (F.col("h") / HLL_M).cast("long")
    rank = F.when(w == 0, F.lit(_HLL_RMAX)).otherwise(
        F.log2(w.bitwiseAND(-w)).cast("long") + 1
    )
    gregs = (
        hashes.select(
            "l_returnflag", (F.col("h") % HLL_M).alias("bucket"), rank.alias("r")
        )
        .groupBy("l_returnflag", "bucket")
        .agg(F.max("r").alias("rmax"))
    )
    merged = gregs.groupBy("bucket").agg(F.max("rmax").alias("rmax"))

    def _estimate(regs: DataFrame, grp: Column) -> DataFrame:
        s = regs.agg(
            F.count("*").alias("n_present"),
            F.sum(
                F.expr(f"shiftleft(1L, cast({_HLL_RMAX} - rmax AS INT))")
            ).alias("int_sum"),
        )
        denom = (
            F.col("int_sum")
            + (HLL_M - F.col("n_present")) * F.lit(1 << _HLL_RMAX).cast("long")
        ).cast("double")
        est = F.lit(HLL_ALPHA * HLL_M * HLL_M * (1 << _HLL_RMAX)) / denom
        return s.select(grp.alias("grp"), "n_present", est.alias("hll_estimate"))

    per_group = (
        gregs.groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n_present"),
            F.sum(
                F.expr(f"shiftleft(1L, cast({_HLL_RMAX} - rmax AS INT))")
            ).alias("int_sum"),
        )
        .select(
            F.col("l_returnflag").alias("grp"),
            "n_present",
            (
                F.lit(HLL_ALPHA * HLL_M * HLL_M * (1 << _HLL_RMAX))
                / (
                    F.col("int_sum")
                    + (HLL_M - F.col("n_present"))
                    * F.lit(1 << _HLL_RMAX).cast("long")
                ).cast("double")
            ).alias("hll_estimate"),
        )
    )
    return per_group.unionByName(_estimate(merged, F.lit("ALL")))


# --- Mergeable fixed-bin quantile sketch ------------------------------------
# Bin geometry shared verbatim with the oracle: o_totalprice in
# [0, 600k) → 24 bins of 25k. Literal (data-independent) edges make the
# histogram a pure partial aggregate.
QB_WIDTH = 25000.0


@register(
    "quantile_bin_sketch",
    oracle=f"""
    WITH h AS (
        SELECT CAST(floor(o_totalprice / {QB_WIDTH}) AS BIGINT) AS bin,
               COUNT(*) AS c
        FROM orders GROUP BY 1
    ),
    cum AS (
        SELECT bin, c,
               CAST(COALESCE(SUM(c) OVER (ORDER BY bin
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS below,
               CAST(SUM(c) OVER () AS BIGINT) AS total
        FROM h
    )
    SELECT total AS n_rows,
           bin AS p50_bin,
           (CAST(bin AS DOUBLE) * {QB_WIDTH}
               + {QB_WIDTH} * ((0.5 * CAST(total AS DOUBLE) - CAST(below AS DOUBLE))
                               / CAST(c AS DOUBLE))) AS p50_estimate
    FROM cum
    WHERE CAST(below AS DOUBLE) < 0.5 * CAST(total AS DOUBLE)
      AND 0.5 * CAST(total AS DOUBLE) <= CAST(below + c AS DOUBLE)
    """,
    tags=("bounded_window", "sketch", "quantile", "histogram", "mergeable"),
)
def quantile_bin_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable quantile estimation from a fixed-bin histogram — the
    KLL/t-digest role with a deterministic, oracle-checkable core. Bin
    edges are literals, so the histogram is one partial-aggregated
    groupBy producing <=24 rows regardless of input size; merging
    sketches from different partitions/datasets is integer addition.
    The p50 interpolation runs on the tiny histogram (single-partition
    window over <=24 rows). Every arithmetic step (0.5*N, bigint
    subtraction under 2^53, one double divide, one multiply-add chain)
    is IEEE-deterministic, written identically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    h = (
        o.groupBy(
            F.floor(F.col("o_totalprice") / F.lit(QB_WIDTH)).cast("long").alias("bin")
        )
        .agg(F.count("*").alias("c"))
    )
    w_cum = W.orderBy("bin").rowsBetween(W.unboundedPreceding, -1)
    cum = h.select(
        "bin",
        "c",
        F.coalesce(F.sum("c").over(w_cum), F.lit(0)).cast("long").alias("below"),
        F.sum("c").over(W.orderBy("bin").rangeBetween(W.unboundedPreceding, W.unboundedFollowing)).cast("long").alias("total"),
    )
    half = 0.5 * F.col("total").cast("double")
    return cum.filter(
        (F.col("below").cast("double") < half)
        & (half <= (F.col("below") + F.col("c")).cast("double"))
    ).select(
        F.col("total").alias("n_rows"),
        F.col("bin").alias("p50_bin"),
        (
            F.col("bin").cast("double") * F.lit(QB_WIDTH)
            + F.lit(QB_WIDTH)
            * (
                (0.5 * F.col("total").cast("double") - F.col("below").cast("double"))
                / F.col("c").cast("double")
            )
        ).alias("p50_estimate"),
    )


@register(
    "bitmap_distinct_exact",
    oracle="""
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
    """,
    tags=("sketch", "bitmap", "distinct", "mergeable"),
)
def bitmap_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct-count via Spark's bitmap aggregates: ids
    map to (bucket, bit-position), each (group, bucket) folds into one
    fixed-size bitmap map-side, and the final count is a sum of per-
    bucket popcounts. Same partial-agg shape as the HLL/CMS sketches but
    with zero error — the right tool when ids are dense integers (user
    ids here) and 100 TB of raw rows must reduce to per-group bitmaps
    without ever shuffling raw ids. Oracle is plain COUNT(DISTINCT)."""
    e = load_table(spark, sf_dir, "events")
    per_bucket = (
        e.groupBy("event_type", F.bitmap_bucket_number("user_id").alias("bucket"))
        .agg(
            F.bitmap_count(
                F.bitmap_construct_agg(F.bitmap_bit_position("user_id"))
            ).alias("cnt")
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").alias("n_users")
    )


@register(
    "bitmap_intersect_exact",
    oracle="""
    WITH a AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
         b AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'),
         i AS (SELECT COUNT(*) AS n_both FROM (SELECT * FROM a INTERSECT SELECT * FROM b)),
         u AS (SELECT COUNT(*) AS n_either FROM (SELECT * FROM a UNION SELECT * FROM b))
    SELECT (SELECT COUNT(*) FROM a) AS n_click,
           (SELECT COUNT(*) FROM b) AS n_purchase,
           i.n_both,
           u.n_either,
           CASE WHEN u.n_either > 0
                THEN CAST(i.n_both AS DOUBLE) / CAST(u.n_either AS DOUBLE)
           END AS jaccard
    FROM i, u
    """,
    tags=("sketch", "bitmap", "set_intersection", "mergeable", "audience_overlap"),
    bench=True,  # the sketch family's headline representative
)
def bitmap_intersect_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience-overlap (|A∩B|, |A∪B|, Jaccard) between the
    'click' and 'purchase' user sets via mergeable bitmaps — the
    set-expression counterpart of ``bitmap_distinct_exact``. Spark has
    no bitmap_and, so the intersection comes from inclusion–exclusion
    with union only: |A∩B| = |A| + |B| − |A∪B|, where each term is a
    per-bucket popcount of a filtered ``bitmap_construct_agg``.

    Scale shape: ONE pass over the fact table, one shuffle keyed by
    bitmap bucket (fixed-width state per bucket regardless of row
    count), then a scalar combine — the same reduce-to-bitmaps-first
    discipline that makes audience overlap tractable when A and B are
    billions of rows. The oracle is the plain INTERSECT/UNION they
    stand in for."""
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    is_a = F.col("event_type") == "click"
    per_bucket = (
        e.groupBy(F.bitmap_bucket_number("user_id").alias("bucket"))
        .agg(
            F.bitmap_count(
                F.bitmap_construct_agg(
                    F.when(is_a, F.bitmap_bit_position("user_id"))
                )
            ).alias("ca"),
            F.bitmap_count(
                F.bitmap_construct_agg(
                    F.when(~is_a, F.bitmap_bit_position("user_id"))
                )
            ).alias("cb"),
            F.bitmap_count(
                F.bitmap_construct_agg(F.bitmap_bit_position("user_id"))
            ).alias("cu"),
        )
    )
    tot = per_bucket.agg(
        F.sum("ca").alias("n_click"),
        F.sum("cb").alias("n_purchase"),
        F.sum("cu").alias("n_either"),
    )
    return tot.select(
        "n_click",
        "n_purchase",
        (F.col("n_click") + F.col("n_purchase") - F.col("n_either")).alias("n_both"),
        "n_either",
        # Explicit NULL contract on an empty universe (n_either = 0):
        # 0/0 would otherwise degrade the single-row result to NaN.
        F.when(
            F.col("n_either") > 0,
            (F.col("n_click") + F.col("n_purchase") - F.col("n_either")).cast(
                "double"
            )
            / F.col("n_either").cast("double"),
        ).alias("jaccard"),
    )


@register(
    "approx_top_k_events",
    oracle="""
    SELECT event_type, COUNT(*) AS est_count
    FROM events
    GROUP BY event_type
    ORDER BY est_count DESC, event_type
    LIMIT 3
    """,
    tags=("sketch", "approx_top_k", "heavy_hitters", "spark4"),
)
def approx_top_k_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's built-in ``approx_top_k`` aggregate — the engine-native
    heavy-hitters sketch next to the first-principles count-min pair
    (cms_heavy_hitters): one pass, mergeable bounded state, items with
    estimated counts. At the fixture's type cardinality the sketch's
    internal map holds every key, so estimates are EXACT and the plain
    GROUP BY top-3 is a value-hash oracle — same bounded-error
    adjudication style as approx_distinct, in the regime where the
    bound is zero. (Ranking ties would be sketch-order-dependent; the
    fixture's counts are distinct, and a production caller breaks ties
    downstream.)"""
    e = load_table(spark, sf_dir, "events")
    return (
        e.agg(F.expr("approx_top_k(event_type, 3)").alias("tk"))
        .select(F.explode("tk").alias("t"))
        .select(
            F.col("t.item").alias("event_type"),
            F.col("t.count").alias("est_count"),
        )
    )


@register(
    "hll_datasketch_union",
    oracle="""
    WITH per_type AS (
        SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
        FROM events GROUP BY event_type
    ),
    overall AS (SELECT COUNT(DISTINCT user_id) AS total FROM events)
    SELECT p.event_type,
           p.exact_distinct,
           TRUE AS per_type_within_3pct,
           TRUE AS union_within_3pct
    FROM per_type p CROSS JOIN overall o
    """,
    tags=("sketch", "hll", "datasketches", "mergeable", "union", "spark4"),
)
def hll_datasketch_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apache DataSketches HLL via Spark 4's native ``hll_sketch_agg`` /
    ``hll_union_agg`` — the production mergeable-sketch surface beside
    the first-principles twin (hll_merge_groups): per-group BINARY
    sketches that union across groups without touching raw ids, which
    is how a 100 TB pipeline stores per-partition distinct state and
    answers arbitrary roll-ups later. Adjudicated like approx_distinct:
    exact distincts are value-checked, the estimates are pinned inside
    the published ±3% (lgK=12) envelope as booleans — deterministic on
    both engines."""
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    per_type = e.groupBy("event_type").agg(
        F.expr("hll_sketch_agg(user_id)").alias("sk"),
        F.countDistinct("user_id").alias("exact_distinct"),
    )
    unioned = per_type.agg(F.expr("hll_union_agg(sk)").alias("u")).select(
        F.expr("hll_sketch_estimate(u)").alias("union_est")
    )
    total_exact = e.agg(F.countDistinct("user_id").alias("total")).select("total")
    per_rows = per_type.select(
        "event_type",
        "exact_distinct",
        (
            F.abs(
                F.expr("hll_sketch_estimate(sk)").cast("double")
                - F.col("exact_distinct").cast("double")
            )
            <= 0.03 * F.col("exact_distinct").cast("double")
        ).alias("per_type_within_3pct"),
    )
    return (
        per_rows.crossJoin(F.broadcast(unioned))
        .crossJoin(F.broadcast(total_exact))
        .select(
            "event_type",
            "exact_distinct",
            "per_type_within_3pct",
            (
                F.abs(F.col("union_est").cast("double") - F.col("total").cast("double"))
                <= 0.03 * F.col("total").cast("double")
            ).alias("union_within_3pct"),
        )
    )


@register(
    "sliding_distinct_bitmap",
    oracle="""
    WITH ud AS (
        SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
        FROM events
    ),
    days AS (SELECT DISTINCT day FROM ud),
    daily AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_users_1d
              FROM ud GROUP BY day)
    SELECT d.day,
           CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS n_users_7d,
           MAX(daily.n_users_1d) AS n_users_1d
    FROM days d
    JOIN ud u ON u.day BETWEEN d.day - 6 AND d.day
    JOIN daily ON daily.day = d.day
    GROUP BY d.day
    """,
    tags=("sketch", "bitmap", "sliding_distinct", "mergeable"),
    bench=True,
)
def sliding_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT trailing-7-day distinct users per day ("weekly active
    users") with constant-size per-day state — the sliding-distinct
    problem that COUNT(DISTINCT) over a sliding window cannot do
    incrementally (distinct doesn't subtract). The scalable shape:
    (1) ONE pass over raw events reduces each (day, bitmap-bucket) to a
    fixed-width user bitmap — after this, raw rows are never touched
    again; (2) the 7-day merge is bitmap_or_agg over STATE rows
    (days × buckets × 7 of them, independent of event count);
    (3) popcount + sum per day. Day N+1's window reuses day N's daily
    bitmaps — in an incremental pipeline the daily state table is the
    materialization, and each new day costs one day of events plus a
    7-row merge. The oracle is the quadratic-ish day×user range join
    the bitmaps replace (affordable only at fixture scale).
    """
    e = load_table(spark, sf_dir, "events")
    # Every leg (daily counts, day spine, 7-day merge join) reads the
    # state, so pin it once instead of re-deriving the raw-event scan
    # per leg (lazy: computed at first action). On a cluster this is
    # the persisted daily-bitmap table an incremental pipeline
    # maintains.
    state = checkpoint_audited(
        e.select(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            F.col("user_id"),
        )
        .groupBy("day", F.bitmap_bucket_number("user_id").alias("bucket"))
        .agg(
            F.bitmap_construct_agg(F.bitmap_bit_position("user_id")).alias("bm")
        ),
        eager=False,
    )
    daily = (
        state.groupBy("day")
        .agg(F.sum(F.bitmap_count("bm")).alias("n_users_1d"))
    )
    days = state.select("day").distinct().select(F.col("day").alias("d"))
    merged = (
        days.join(
            state,
            (F.col("day") <= F.col("d"))
            & (F.col("day") >= F.date_sub(F.col("d"), 6)),
        )
        .groupBy("d", "bucket")
        .agg(F.bitmap_count(F.bitmap_or_agg("bm")).alias("c"))
        .groupBy("d")
        .agg(F.sum("c").alias("n_users_7d"))
    )
    return merged.join(daily, merged.d == daily.day).select(
        F.col("d").alias("day"), "n_users_7d", "n_users_1d"
    )



# --- KMV / theta sketch set operations (round 7) ---------------------------------
KMV_K = 64
KMV_HMAX = 1 << 60  # h60 hashes are uniform on [0, 2^60)


@register(
    "kmv_theta_sketch_ops",
    oracle="""
    WITH ev AS (
        SELECT DISTINCT CASE WHEN event_type = 'view' THEN 'A' ELSE 'B' END
                   AS s,
               CAST(user_id AS VARCHAR) || ':'
                   || strftime(CAST(ts AS DATE), '%Y-%m-%d') AS elem
        FROM events WHERE event_type IN ('view', 'purchase')
    ),
    uflags AS (
        SELECT elem,
               MAX(CASE WHEN s = 'A' THEN 1 ELSE 0 END) AS fa,
               MAX(CASE WHEN s = 'B' THEN 1 ELSE 0 END) AS fb
        FROM ev GROUP BY elem
    ),
    exact AS (
        SELECT CAST(SUM(fa) AS BIGINT) AS exact_a,
               CAST(SUM(fb) AS BIGINT) AS exact_b,
               CAST(COUNT(*) AS BIGINT) AS exact_union,
               CAST(SUM(fa * fb) AS BIGINT) AS exact_inter,
               CAST(SUM(fa * (1 - fb)) AS BIGINT) AS exact_diff
        FROM uflags
    ),
    hashes AS (
        SELECT s, (('0x' || substr(md5(elem), 1, 15))::BIGINT) AS h FROM ev
    ),
    ranked AS (
        SELECT s, h, ROW_NUMBER() OVER (PARTITION BY s ORDER BY h) AS rn
        FROM hashes
    ),
    st AS (
        SELECT
            MAX(CASE WHEN s = 'A' AND rn = 64 THEN h END) AS theta_a,
            MAX(CASE WHEN s = 'B' AND rn = 64 THEN h END) AS theta_b,
            CAST(SUM(CASE WHEN s = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
            CAST(SUM(CASE WHEN s = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b
        FROM ranked
    ),
    uh AS (SELECT DISTINCT h FROM hashes),
    uranked AS (
        SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM uh
    ),
    ust AS (
        SELECT MAX(CASE WHEN rn = 64 THEN h END) AS theta_u,
               CAST(COUNT(*) AS BIGINT) AS n_u
        FROM uranked
    ),
    pairs AS (
        SELECT COALESCE(a.h, b.h) AS h,
               a.h IS NOT NULL AS in_a, b.h IS NOT NULL AS in_b
        FROM (SELECT h FROM ranked WHERE s = 'A' AND rn <= 64) a
        FULL JOIN (SELECT h FROM ranked WHERE s = 'B' AND rn <= 64) b
          ON a.h = b.h
    ),
    cnts AS (
        SELECT
            CAST(SUM(CASE WHEN in_a AND in_b
                       AND h < LEAST(COALESCE(st.theta_a, 1152921504606846976),
                                     COALESCE(st.theta_b, 1152921504606846976))
                     THEN 1 ELSE 0 END) AS BIGINT) AS c_inter,
            CAST(SUM(CASE WHEN in_a AND NOT in_b
                       AND h < LEAST(COALESCE(st.theta_a, 1152921504606846976),
                                     COALESCE(st.theta_b, 1152921504606846976))
                     THEN 1 ELSE 0 END) AS BIGINT) AS c_diff
        FROM pairs, st
    ),
    est AS (
        SELECT
            CASE WHEN st.n_a < 64 THEN CAST(st.n_a AS DOUBLE)
                 ELSE (64 - 1) * CAST(1152921504606846976 AS DOUBLE) / st.theta_a
            END AS est_a,
            CASE WHEN st.n_b < 64 THEN CAST(st.n_b AS DOUBLE)
                 ELSE (64 - 1) * CAST(1152921504606846976 AS DOUBLE) / st.theta_b
            END AS est_b,
            CASE WHEN ust.n_u < 64 THEN CAST(ust.n_u AS DOUBLE)
                 ELSE (64 - 1) * CAST(1152921504606846976 AS DOUBLE) / ust.theta_u
            END AS est_union,
            cnts.c_inter * CAST(1152921504606846976 AS DOUBLE)
                / LEAST(COALESCE(st.theta_a, 1152921504606846976),
                        COALESCE(st.theta_b, 1152921504606846976)) AS est_inter,
            cnts.c_diff * CAST(1152921504606846976 AS DOUBLE)
                / LEAST(COALESCE(st.theta_a, 1152921504606846976),
                        COALESCE(st.theta_b, 1152921504606846976)) AS est_diff
        FROM st, ust, cnts
    )
    SELECT CAST(64 AS BIGINT) AS k,
           exact_a, est_a, ABS(est_a - exact_a)
               <= 3.0 * exact_a / sqrt(64 - 2) AS ok_a,
           exact_b, est_b, ABS(est_b - exact_b)
               <= 3.0 * exact_b / sqrt(64 - 2) AS ok_b,
           exact_union, est_union, ABS(est_union - exact_union)
               <= 3.0 * exact_union / sqrt(64 - 2) AS ok_union,
           exact_inter, est_inter, ABS(est_inter - exact_inter)
               <= 3.0 * exact_union / sqrt(64 - 2) AS ok_inter,
           exact_diff, est_diff, ABS(est_diff - exact_diff)
               <= 3.0 * exact_union / sqrt(64 - 2) AS ok_diff
    FROM exact, est
    """,
    tags=("sketches", "kmv", "theta_sketch", "set_operations",
          "adjudication"),
)
def kmv_theta_sketch_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV / THETA sketch (Beyer et al. SIGMOD'07; Dasgupta et al., the
    DataSketches theta family): keep the k smallest md5-60bit hashes
    per set; theta = k-th smallest. Beyond the distinct estimate
    ((k-1)/theta), theta sketches support set algebra HLL cannot:
    intersection AND DIFFERENCE — every retained hash below
    min(theta_a, theta_b) is a uniform sample of the union, so
    |A∩B| ~= |retained_a ∩ retained_b < theta|/p with p = theta/2^60
    (and A\\B the same with NOT-in-B — exact below theta because a
    B-hash under theta_b ≥ theta is always retained). Viewers vs
    purchasers here at USER-DAY granularity (view-days vs purchase-
    days — sets that genuinely diverge): activity overlap and the
    view-only audience-days from two 64-hash sketches. Adjudication (the cms/minhash/hll pattern):
    exact distinct counts ride along, estimates must sit inside the
    3/sqrt(k-2) envelope (union-relative for the derived inter/diff
    estimates) as value-hashed booleans; when a set is smaller than k
    the sketch IS exact and the estimate equals the count.

    Scale notes (100 TB): bottom-k per set IS a size-k TakeOrdered
    heap here (orderBy+limit → per-partition heaps merged on the
    driver) — constant memory, mergeable, the shape hll_merge_groups
    pins; no rank window anywhere. The
    set algebra runs on ≤2k retained hashes — driver-free and
    constant-cost."""
    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .select(
            F.when(F.col("event_type") == "view", "A")
            .otherwise("B")
            .alias("s"),
            F.concat(
                F.col("user_id").cast("string"),
                F.lit(":"),
                F.date_format(F.col("ts").cast("date"), "yyyy-MM-dd"),
            ).alias("elem"),
        )
        .distinct()
    )
    uflags = ev.groupBy("elem").agg(
        F.max(F.when(F.col("s") == "A", 1).otherwise(0)).alias("fa"),
        F.max(F.when(F.col("s") == "B", 1).otherwise(0)).alias("fb"),
    )
    exact = uflags.agg(
        F.sum("fa").cast("long").alias("exact_a"),
        F.sum("fb").cast("long").alias("exact_b"),
        F.count("*").cast("long").alias("exact_union"),
        F.sum(F.col("fa") * F.col("fb")).cast("long").alias("exact_inter"),
        F.sum(F.col("fa") * (1 - F.col("fb")))
        .cast("long")
        .alias("exact_diff"),
    )
    from beam_pyspark_runner_spark.functions.hashing import h60

    hashes = ev.select("s", h60(F.col("elem")).alias("h"))
    # Bottom-k per side via TakeOrdered heaps (orderBy+limit compiles
    # to TakeOrderedAndProject: per-partition size-k heaps merged on
    # the driver) — exactly the constant-memory mergeable shape the
    # docstring promises, never a per-side rank window funneling each
    # set through one task. theta = max of the heap iff the heap is
    # full (|set| >= k), else NULL (the sketch is exact below k).
    bot_a = hashes.filter(F.col("s") == "A").select("h").orderBy("h").limit(
        KMV_K
    )
    bot_b = hashes.filter(F.col("s") == "B").select("h").orderBy("h").limit(
        KMV_K
    )
    st = (
        bot_a.agg(F.max("h").alias("mxa"), F.count("*").alias("ca"))
        .crossJoin(
            F.broadcast(
                bot_b.agg(F.max("h").alias("mxb"), F.count("*").alias("cb"))
            )
        )
        .crossJoin(
            F.broadcast(
                hashes.agg(
                    F.sum(F.when(F.col("s") == "A", 1).otherwise(0))
                    .cast("long")
                    .alias("n_a"),
                    F.sum(F.when(F.col("s") == "B", 1).otherwise(0))
                    .cast("long")
                    .alias("n_b"),
                )
            )
        )
        .select(
            F.when(F.col("ca") == KMV_K, F.col("mxa")).alias("theta_a"),
            F.when(F.col("cb") == KMV_K, F.col("mxb")).alias("theta_b"),
            "n_a",
            "n_b",
        )
    )
    u = hashes.select("h").distinct()
    bot_u = u.orderBy("h").limit(KMV_K)
    ust = (
        bot_u.agg(F.max("h").alias("mxu"), F.count("*").alias("cu"))
        .crossJoin(F.broadcast(u.agg(F.count("*").cast("long").alias("n_u"))))
        .select(
            F.when(F.col("cu") == KMV_K, F.col("mxu")).alias("theta_u"),
            "n_u",
        )
    )
    ra = bot_a.select(F.col("h").alias("ha"))
    rb = bot_b.select(F.col("h").alias("hb"))
    pairs = ra.join(rb, ra["ha"] == rb["hb"], "full_outer").select(
        F.coalesce(F.col("ha"), F.col("hb")).alias("h"),
        F.col("ha").isNotNull().alias("in_a"),
        F.col("hb").isNotNull().alias("in_b"),
    )
    theta_min = F.least(
        F.coalesce(F.col("theta_a"), F.lit(KMV_HMAX)),
        F.coalesce(F.col("theta_b"), F.lit(KMV_HMAX)),
    )
    cnts = (
        pairs.crossJoin(F.broadcast(st))
        .agg(
            F.sum(
                F.when(
                    F.col("in_a") & F.col("in_b") & (F.col("h") < theta_min),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("c_inter"),
            F.sum(
                F.when(
                    F.col("in_a")
                    & ~F.col("in_b")
                    & (F.col("h") < theta_min),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("c_diff"),
        )
    )
    hmax_d = F.lit(float(KMV_HMAX))
    all1 = (
        exact.crossJoin(F.broadcast(st))
        .crossJoin(F.broadcast(ust))
        .crossJoin(F.broadcast(cnts))
    )
    est_a = F.when(
        F.col("n_a") < KMV_K, F.col("n_a").cast("double")
    ).otherwise((KMV_K - 1) * hmax_d / F.col("theta_a"))
    est_b = F.when(
        F.col("n_b") < KMV_K, F.col("n_b").cast("double")
    ).otherwise((KMV_K - 1) * hmax_d / F.col("theta_b"))
    est_u = F.when(
        F.col("n_u") < KMV_K, F.col("n_u").cast("double")
    ).otherwise((KMV_K - 1) * hmax_d / F.col("theta_u"))
    est_i = F.col("c_inter") * hmax_d / theta_min
    est_d = F.col("c_diff") * hmax_d / theta_min
    bound = 3.0 / F.sqrt(F.lit(float(KMV_K - 2)))

    def ok(est, rel_to):
        return F.abs(est - F.col(rel_to)) <= bound * F.col(rel_to)

    return all1.select(
        F.lit(KMV_K).cast("long").alias("k"),
        "exact_a",
        est_a.alias("est_a"),
        ok(est_a, "exact_a").alias("ok_a"),
        "exact_b",
        est_b.alias("est_b"),
        ok(est_b, "exact_b").alias("ok_b"),
        "exact_union",
        est_u.alias("est_union"),
        ok(est_u, "exact_union").alias("ok_union"),
        "exact_inter",
        est_i.alias("est_inter"),
        (F.abs(est_i - F.col("exact_inter"))
         <= bound * F.col("exact_union")).alias("ok_inter"),
        "exact_diff",
        est_d.alias("est_diff"),
        (F.abs(est_d - F.col("exact_diff"))
         <= bound * F.col("exact_union")).alias("ok_diff"),
    )


# --- AMS tug-of-war second-moment sketch (round 7, session 4) ---------------
AMS_R = 16  # independent ±1 replicates averaged for the F2 estimate


@register(
    "ams_f2_moment",
    oracle=f"""
    WITH c AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY user_id
    ),
    exact AS (SELECT CAST(SUM(c * c) AS BIGINT) AS f2_exact FROM c),
    reps AS (SELECT unnest(range(0, {AMS_R})) AS rep),
    x AS (
        SELECT r.rep,
               CAST(SUM((1 - 2 * ({h32_sql("'ams-' || r.rep || '-' || c.user_id")} % 2))
                        * c.c) AS BIGINT) AS x
        FROM c, reps r GROUP BY r.rep
    ),
    m AS (SELECT CAST(SUM(x * x) AS DOUBLE) / {AMS_R} AS est_mean FROM x)
    SELECT x.rep AS rep, x.x AS x, CAST(x.x * x.x AS BIGINT) AS est,
           e.f2_exact AS f2_exact, m.est_mean AS est_mean,
           abs(m.est_mean - CAST(e.f2_exact AS DOUBLE))
               <= 3.0 * sqrt(2.0 / {AMS_R}) * CAST(e.f2_exact AS DOUBLE)
               AS within_bound
    FROM x, exact e, m
    """,
    tags=("sketch", "ams", "second_moment", "join_size_estimate"),
)
def ams_f2_moment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Alon–Matias–Szegedy tug-of-war sketch for the second frequency
    moment F2 = Σ_v c_v² of events.user_id — exactly the self-join size
    that join_cardinality_estimate needs as its input, here estimated
    from {AMS_R} signed counters instead of the full per-key count
    table. Each replicate keeps ONE integer X_i = Σ_rows sign_i(key)
    (sign_i = ±1 from the shared md5 family, functions/hashing.py), and
    E[X_i²] = F2 with Var ≤ 2·F2², so the {AMS_R}-replicate mean lands
    within 3·sqrt(2/{AMS_R})·F2 at 3σ — the bound the within_bound
    column certifies against the exact F2 the oracle also computes.
    All sketch arithmetic is integer (|X| ≤ n_rows, X² < 2^63 up to
    3e9 rows per replicate — beyond that, shard X into per-range
    partial sketches first). Scale: the sketch side is ONE map-side
    partial aggregate into {AMS_R} groups — constant state regardless
    of key cardinality, the whole point vs the exact Σc² whose groupBy
    must shuffle every distinct key; the exact leg here exists only to
    adjudicate the estimator (cf. cms_estimate_vs_exact,
    minhash_estimate_vs_exact — same certify-the-sketch pattern).
    Reference parity: beyond CombinePerKey (transform_evaluators.py:
    15-100); registered as a first-class sketch query."""
    c = (
        load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    exact = c.agg(F.sum(F.col("c") * F.col("c")).cast("long").alias("f2_exact"))
    reps = spark.range(AMS_R).select(F.col("id").alias("rep"))
    sign = 1 - 2 * (
        h32(F.concat_ws("-", F.lit("ams"), F.col("rep"), F.col("user_id")))
        % 2
    )
    x = (
        c.crossJoin(F.broadcast(reps))
        .groupBy("rep")
        .agg(F.sum(sign * F.col("c")).cast("long").alias("x"))
    )
    m = x.agg(
        (F.sum(F.col("x") * F.col("x")).cast("double") / AMS_R).alias(
            "est_mean"
        )
    )
    return (
        x.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(m))
        .select(
            "rep",
            "x",
            (F.col("x") * F.col("x")).cast("long").alias("est"),
            "f2_exact",
            "est_mean",
            (
                F.abs(F.col("est_mean") - F.col("f2_exact").cast("double"))
                <= 3.0
                * F.sqrt(F.lit(2.0 / AMS_R))
                * F.col("f2_exact").cast("double")
            ).alias("within_bound"),
        )
    )


# --- AMS inner-product join-size estimate (round 7, session 4) --------------
@register(
    "ams_join_size_estimate",
    oracle=f"""
    WITH a AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    b AS (
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase' GROUP BY user_id
    ),
    exact AS (
        SELECT CAST(SUM(a.c * b.c) AS BIGINT) AS join_size_exact
        FROM a JOIN b USING (user_id)
    ),
    reps AS (SELECT unnest(range(0, {AMS_R})) AS rep),
    xa AS (
        SELECT r.rep,
               CAST(SUM((1 - 2 * ({h32_sql("'ams-' || r.rep || '-' || a.user_id")} % 2))
                        * a.c) AS BIGINT) AS x
        FROM a, reps r GROUP BY r.rep
    ),
    xb AS (
        SELECT r.rep,
               CAST(SUM((1 - 2 * ({h32_sql("'ams-' || r.rep || '-' || b.user_id")} % 2))
                        * b.c) AS BIGINT) AS x
        FROM b, reps r GROUP BY r.rep
    ),
    f2 AS (
        SELECT (SELECT SUM(c * c) FROM a) AS f2a,
               (SELECT SUM(c * c) FROM b) AS f2b
    ),
    m AS (
        SELECT CAST(SUM(xa.x * xb.x) AS DOUBLE) / {AMS_R} AS est_mean
        FROM xa JOIN xb USING (rep)
    )
    SELECT xa.rep AS rep, CAST(xa.x * xb.x AS BIGINT) AS est,
           e.join_size_exact, m.est_mean,
           abs(m.est_mean - CAST(e.join_size_exact AS DOUBLE))
               <= 3.0 * sqrt(2.0 / {AMS_R})
                      * sqrt(CAST(f2.f2a AS DOUBLE) * CAST(f2.f2b AS DOUBLE))
               AS within_bound
    FROM xa JOIN xb USING (rep), exact e, m, f2
    """,
    tags=("sketch", "ams", "join_size_estimate", "inner_product"),
)
def ams_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AMS inner-product estimation of a JOIN SIZE between two
    relations — the general form of ams_f2_moment (F2 is the self-join
    special case) and the statistic a cost-based planner actually
    wants before choosing a join strategy: |A ⋈_k B| = Σ_v a_v·b_v is
    estimated by E[X_A·X_B] over the SAME signed-hash family applied
    independently to each side (Alon–Gilbert–Matias–Szegedy 1999/2002),
    within 3·sqrt(2/{AMS_R})·sqrt(F2(A)·F2(B)) at 3σ — the Cauchy–
    Schwarz-shaped bound the within_bound column certifies against
    the exact join size. The two sketch legs here are view-events vs
    purchase-events keyed on user_id; each is one map-side partial
    aggregate into {AMS_R} signed counters, mergeable across
    partitions/machines by addition — so two 100 TB tables can be
    compared by shipping 2×{AMS_R} longs, never co-shuffling either.
    Exact leg (per-key counts + key join) exists only to adjudicate,
    the cms/minhash/kmv estimator-audit discipline."""
    ev = load_table(spark, sf_dir, "events")
    a = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    b = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count("*").cast("long").alias("c"))
    )
    exact = (
        a.join(b, "user_id")
        .agg(
            F.sum(a["c"] * b["c"]).cast("long").alias("join_size_exact")
        )
    )
    reps = spark.range(AMS_R).select(F.col("id").alias("rep"))

    def sketch(df: DataFrame) -> DataFrame:
        sign = 1 - 2 * (
            h32(
                F.concat_ws("-", F.lit("ams"), F.col("rep"), F.col("user_id"))
            )
            % 2
        )
        return (
            df.crossJoin(F.broadcast(reps))
            .groupBy("rep")
            .agg(F.sum(sign * F.col("c")).cast("long").alias("x"))
        )

    xa = sketch(a).select(F.col("rep"), F.col("x").alias("xa"))
    xb = sketch(b).select(F.col("rep"), F.col("x").alias("xb"))
    f2 = a.agg(F.sum(F.col("c") * F.col("c")).alias("f2a")).crossJoin(
        b.agg(F.sum(F.col("c") * F.col("c")).alias("f2b"))
    )
    xx = xa.join(xb, "rep")
    m = xx.agg(
        (F.sum(F.col("xa") * F.col("xb")).cast("double") / AMS_R).alias(
            "est_mean"
        )
    )
    return (
        xx.crossJoin(F.broadcast(exact))
        .crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(f2))
        .select(
            "rep",
            (F.col("xa") * F.col("xb")).cast("long").alias("est"),
            "join_size_exact",
            "est_mean",
            (
                F.abs(
                    F.col("est_mean")
                    - F.col("join_size_exact").cast("double")
                )
                <= 3.0
                * F.sqrt(F.lit(2.0 / AMS_R))
                * F.sqrt(
                    F.col("f2a").cast("double") * F.col("f2b").cast("double")
                )
            ).alias("within_bound"),
        )
    )

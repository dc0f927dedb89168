"""Range joins: interval-overlap and tolerance-bounded as-of matching.

Spark has no native range-join operator (Databricks' range-join hints are
not in OSS Spark): a naive interval join compiles to
BroadcastNestedLoopJoin or a cartesian product — quadratic per entity.
The distributed pattern is BINNING: explode each interval into the
fixed-width time bins it spans, equi-join on (entity, bin) — which hash-
partitions and shuffles like any other join — keep each pair only in the
FIRST bin its overlap spans (a filter, so no dedup shuffle), and apply the
exact overlap predicate. Cost is O(sum of interval_length / bin_width)
rows instead of |L|x|R| per entity, and the whole operator is ONE exchange
pair (the join's), same as a plain equi-join.

Reference analog: none (single-node pandas never needs this); the operator
exists for the feature-store workloads the north rule targets — joining
conversation sessions to deployment/incident/experiment windows, and
bounding feature staleness in as-of backfills.

Bin-width tuning: bins far smaller than typical interval length multiply
the explode factor; bins far larger multiply false candidate pairs. Set it
near the median interval length. A degenerate interval spanning the whole
corpus explodes into corpus_span/bin_width rows — ``max_bins_per_row``
fails fast with guidance rather than silently producing a hot key.

Skew: a popular bin (a deploy window overlapped by 10^6 sessions of one
entity) is a classic hot join key — every candidate for that (entity, bin)
lands in one shuffle partition. ``salt_buckets`` splits it: the LEFT
(high-cardinality) side salts on a hash of its interval identity, the RIGHT
side replicates each binned row across all salt values, and the equi-join
adds the salt to its keys — the hot bucket's rows spread over
``salt_buckets`` tasks at the cost of replicating the (small) right side.
Deterministic (key-hash salt, not rand()), so results are partitioning-
invariant. On AQE clusters the unsalted path also self-heals post-shuffle
(skew-join splitting applies to the sort-merge join this compiles to), but
salting works on any runtime and at any threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    entity_col: str,
    left_keys: list[str],
    right_keys: list[str],
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bin_width_s: int = 86400,
    left_prefix: str = "l_",
    right_prefix: str = "r_",
    max_bins_per_row: int | None = 10_000,
    salt_buckets: int | None = None,
) -> DataFrame:
    """All (left, right) interval pairs of the same entity that overlap
    (closed intervals: ``l.start <= r.end AND r.start <= l.end``), plus
    ``overlap_secs`` — via the binned equi-join pattern above.

    ``left_keys``/``right_keys``: columns that uniquely identify an interval
    within its side (used to de-duplicate pairs that share several bins).
    All non-entity columns come back prefixed ``l_``/``r_``.

    Interval validation (execution-time, zero extra jobs): a NULL start/end
    or an inverted interval (end < start) raises a dedicated error naming
    the offending side — NULLs would otherwise be silently dropped by
    ``explode(sequence(NULL, ...))`` and inverted intervals would generate a
    descending (empty-overlap) bin sequence; both are almost always data
    bugs upstream. Filter them out explicitly before joining if they are
    expected.

    ``salt_buckets``: split hot (entity, bin) join keys — see module
    docstring. Output is identical with or without salting (pytest-pinned).
    """

    def _binned(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.select(
            F.col(entity_col),
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns if c != entity_col],
        )
        side = "left" if prefix == left_prefix else "right"
        s_raw = F.col(f"{prefix}{start_col}")
        e_raw = F.col(f"{prefix}{end_col}")
        null_guard = F.assert_true(
            s_raw.isNotNull() & e_raw.isNotNull(),
            F.lit(
                f"interval_overlap_join: NULL {start_col}/{end_col} on the {side} "
                f"side; filter or fill NULL intervals before joining"
            ),
        )
        # NULL-tolerant: Catalyst may evaluate both guards in either order, so
        # a NULL interval must pass THIS guard (NULL comparisons are NULL ->
        # assert would throw the wrong message) and trip null_guard instead
        order_guard = F.assert_true(
            s_raw.isNull()
            | e_raw.isNull()
            | (e_raw.cast("timestamp") >= s_raw.cast("timestamp")),
            F.lit(
                f"interval_overlap_join: inverted interval ({end_col} < {start_col}) "
                f"on the {side} side; fix or filter before joining"
            ),
        )
        renamed = renamed.filter(null_guard.isNull() & order_guard.isNull())
        lo = F.floor(
            F.unix_seconds(F.col(f"{prefix}{start_col}").cast("timestamp")) / bin_width_s
        )
        hi = F.floor(
            F.unix_seconds(F.col(f"{prefix}{end_col}").cast("timestamp")) / bin_width_s
        )
        if max_bins_per_row is not None:
            guard = F.assert_true(
                hi - lo + 1 <= max_bins_per_row,
                F.lit(
                    f"interval_overlap_join: an interval spans > {max_bins_per_row} "
                    f"bins of {bin_width_s}s; raise bin_width_s or split the interval"
                ),
            )
            renamed = renamed.filter(guard.isNull())
        return renamed.withColumn("__bin", F.explode(F.sequence(lo, hi)))

    lb = _binned(left, left_prefix)
    rb = _binned(right, right_prefix)
    if salt_buckets:
        # deterministic salt from the left interval's identity: the hot
        # (entity, bin) bucket's left rows spread across salt_buckets
        # sub-keys; the (small) right side replicates to meet every sub-key
        lb = lb.withColumn(
            "__salt",
            F.pmod(F.xxhash64(*[F.col(f"{left_prefix}{k}") for k in left_keys]), F.lit(salt_buckets)).cast("int"),
        )
        rb = rb.withColumn(
            "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<int>"))
        )
        cand = lb.join(rb, [entity_col, "__bin", "__salt"]).drop("__salt")
    else:
        cand = lb.join(rb, [entity_col, "__bin"])
    ls = F.col(f"{left_prefix}{start_col}").cast("timestamp")
    le = F.col(f"{left_prefix}{end_col}").cast("timestamp")
    rs = F.col(f"{right_prefix}{start_col}").cast("timestamp")
    re = F.col(f"{right_prefix}{end_col}").cast("timestamp")
    # an overlapping pair shares every bin their overlap spans; instead of a
    # dropDuplicates on pair keys — a SECOND shuffle — keep only the FIRST
    # shared bin: the overlap starts at max(l.start, r.start), so its first
    # bin is max(lo_l, lo_r), a pure filter on columns already in the row.
    # The salted path stays exact: each left row carries ONE salt, so a pair
    # still appears once per shared bin, in a single salt partition.
    first_shared = F.greatest(
        F.floor(F.unix_seconds(ls) / bin_width_s), F.floor(F.unix_seconds(rs) / bin_width_s)
    )
    cand = cand.filter(F.col("__bin") == first_shared).drop("__bin")
    out = cand.filter((ls <= re) & (rs <= le))
    overlap = F.unix_seconds(F.least(le, re)) - F.unix_seconds(F.greatest(ls, rs))
    return out.withColumn("overlap_secs", overlap)

"""Range joins: interval-overlap and tolerance-bounded as-of matching.

Spark has no native range-join operator (Databricks' range-join hints are
not in OSS Spark): a naive interval join compiles to
BroadcastNestedLoopJoin or a cartesian product — quadratic per entity.
The distributed pattern is BINNING: explode each interval into the
fixed-width time bins it spans, equi-join on (entity, bin) — which hash-
partitions and shuffles like any other join — then de-duplicate candidate
pairs and apply the exact overlap predicate. Cost is
O(sum of interval_length / bin_width) rows instead of |L|x|R| per entity.

Reference analog: none (single-node pandas never needs this); the operator
exists for the feature-store workloads the north rule targets — joining
conversation sessions to deployment/incident/experiment windows, and
bounding feature staleness in as-of backfills.

Bin-width tuning: bins far smaller than typical interval length multiply
the explode factor; bins far larger multiply false candidate pairs. Set it
near the median interval length. A degenerate interval spanning the whole
corpus explodes into corpus_span/bin_width rows — ``max_bins_per_row``
fails fast with guidance rather than silently producing a hot key.
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
) -> DataFrame:
    """All (left, right) interval pairs of the same entity that overlap
    (closed intervals: ``l.start <= r.end AND r.start <= l.end``), plus
    ``overlap_secs`` — via the binned equi-join pattern above.

    ``left_keys``/``right_keys``: columns that uniquely identify an interval
    within its side (used to de-duplicate pairs that share several bins).
    All non-entity columns come back prefixed ``l_``/``r_``.
    """

    def _binned(df: DataFrame, prefix: str) -> DataFrame:
        renamed = df.select(
            F.col(entity_col),
            *[F.col(c).alias(f"{prefix}{c}") for c in df.columns if c != entity_col],
        )
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
    cand = lb.join(rb, [entity_col, "__bin"]).drop("__bin")
    # an overlapping pair shares every bin their overlap spans — keep one
    pair_keys = [entity_col] + [f"{left_prefix}{k}" for k in left_keys] + [
        f"{right_prefix}{k}" for k in right_keys
    ]
    cand = cand.dropDuplicates(pair_keys)
    ls = F.col(f"{left_prefix}{start_col}").cast("timestamp")
    le = F.col(f"{left_prefix}{end_col}").cast("timestamp")
    rs = F.col(f"{right_prefix}{start_col}").cast("timestamp")
    re = F.col(f"{right_prefix}{end_col}").cast("timestamp")
    out = cand.filter((ls <= re) & (rs <= le))
    overlap = F.unix_seconds(F.least(le, re)) - F.unix_seconds(F.greatest(ls, rs))
    return out.withColumn("overlap_secs", overlap)

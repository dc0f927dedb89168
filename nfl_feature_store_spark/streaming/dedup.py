"""Streaming exact dedup for live transcript ingest.

Two layers, both bounded-state:

1. **Against the historical corpus** — a stream-static LEFT ANTI join on the
   normalized-text fingerprint (`functions.text.doc_fingerprint`, the same
   fingerprint the batch `exact_dedup` tier groups on). Stream-static joins
   are stateless: each micro-batch probes the static side, so no streaming
   state accrues. At cluster scale the reference side is the bucketed
   fingerprint table (bucket on `fingerprint`) so the per-batch probe is a
   co-located join, or — when the corpus fingerprint set fits executor
   memory — a broadcast.
2. **Within the stream** — `dropDuplicatesWithinWatermark` on the
   fingerprint: state holds one entry per distinct fingerprint seen inside
   the watermark horizon and is evicted beyond it (unlike plain
   `dropDuplicates`, which would grow state forever — the same unbounded-
   state trap the round-4 verdict flagged for NoTimeout kernels).

First-arrival-wins within the stream; the historical side always wins
across layers (a replayed historical document never re-enters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def streaming_dedup_against_reference(
    stream: DataFrame,
    reference_fingerprints: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
    broadcast_reference: bool = True,
) -> DataFrame:
    """Rows of ``stream`` whose text is new vs BOTH the static reference
    corpus and the stream's own watermark horizon.

    ``reference_fingerprints`` must expose a ``fingerprint`` column (build it
    once with ``reference_corpus_fingerprints``). Output keeps the input
    schema plus the ``fingerprint`` column (downstream sinks typically
    persist it — appending today's accepted fingerprints back to the
    reference table closes the loop for tomorrow's run).
    """
    from nfl_feature_store_spark.functions.text import doc_fingerprint

    if "fingerprint" not in reference_fingerprints.columns:
        raise ValueError("reference_fingerprints must have a 'fingerprint' column")
    ref = reference_fingerprints.select("fingerprint").distinct()
    if broadcast_reference:
        ref = F.broadcast(ref)
    out = (
        stream.withColumn("fingerprint", doc_fingerprint(text_col))
        .withWatermark(ts_col, watermark)
        .join(ref, "fingerprint", "left_anti")
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )
    return out


def reference_corpus_fingerprints(
    corpus: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Distinct normalized-text fingerprints of a historical corpus — the
    static side of ``streaming_dedup_against_reference``. Persist bucketed
    on ``fingerprint`` so each micro-batch's anti-join is co-located."""
    from nfl_feature_store_spark.functions.text import doc_fingerprint

    return corpus.select(doc_fingerprint(text_col).alias("fingerprint")).distinct()

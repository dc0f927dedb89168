from nfl_feature_store_spark.streaming.dedup import (
    reference_corpus_fingerprints,
    streaming_dedup_against_reference,
)
from nfl_feature_store_spark.streaming.sessions import streaming_session_aggregates
from nfl_feature_store_spark.streaming.stateful import (
    streaming_elo,
    streaming_ewma,
    streaming_window_features,
)

__all__ = [
    "streaming_session_aggregates",
    "streaming_ewma",
    "streaming_elo",
    "streaming_window_features",
    "streaming_dedup_against_reference",
    "reference_corpus_fingerprints",
]

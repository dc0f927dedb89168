from nfl_feature_store_spark.streaming.sessions import streaming_session_aggregates

__all__ = ["streaming_session_aggregates"]

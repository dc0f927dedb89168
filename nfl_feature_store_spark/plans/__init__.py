from nfl_feature_store_spark.plans.pipeline import backfill_features
from nfl_feature_store_spark.plans.checkpoint import PartitionManifest
from nfl_feature_store_spark.plans.skew import skew_report

__all__ = ["backfill_features", "PartitionManifest", "skew_report"]

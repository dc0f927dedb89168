from nfl_feature_store_spark.plans.pipeline import backfill_features
from nfl_feature_store_spark.plans.checkpoint import PartitionManifest

__all__ = ["backfill_features", "PartitionManifest"]

from nfl_feature_store_spark.functions.turn_metrics import METRIC_COLS, with_turn_metrics
from nfl_feature_store_spark.functions.text import (
    doc_fingerprint,
    lang_id_expr,
    quality_score_exprs,
    token_count_expr,
)

__all__ = [
    "METRIC_COLS",
    "with_turn_metrics",
    "doc_fingerprint",
    "lang_id_expr",
    "quality_score_exprs",
    "token_count_expr",
]

"""Exponentially-weighted means (SURVEY.md §2.5 W5).

Verified reference semantics (reverse-engineered from
/root/reference/data/feature_store/event/** consecutive rows): EWMA with
span=10 => alpha = 2/11, ``adjust=False`` recursion over LAG-1 values —
``e_t = e_{t-1} + alpha * (x_{t-1} - e_{t-1})``. The recursion has unbounded
memory, so no frame-bounded Spark window expresses it; the closed form
``sum(alpha*(1-alpha)^{-j} x_j) * (1-alpha)^k`` overflows float64 beyond a
few thousand rows, so column algebra is out too.

Implementation: ``applyInPandas`` per entity — vectorized
``pdf[m].shift(1).ewm(span, adjust=False).mean()`` inside the Arrow batch, no
per-row Python. One shuffle on hash(entity); group sizes are conversation
sizes (bounded), so no skew risk.

Deviation (documented, FIXTURES.md F3): the reference re-seeds EWMA at season
boundaries with a formula internal to its unvendored ``nfl_data_loader``
package; we keep the EWMA continuous across sessions. Optional
``reset_col`` restarts the recursion per period for callers who want the
reference-style reseed-from-scratch behavior.

Salted/split-stream merge identity (for a future single-entity-stream case):
``e_merged = e_left * (1-alpha)^{n_right} + e_right_partial`` where
``e_right_partial`` is the right chunk's EWM seeded from 0 — used to stitch
chunked recursions without replaying history.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def with_ewma(
    df: DataFrame,
    metrics: tuple[str, ...] = ("chars", "words", "is_tool"),
    span: int = 10,
    entity_col: str = "conv_id",
    order_cols: tuple[str, ...] = ("ts", "turn_idx"),
    reset_col: str | None = None,
    prefix: str = "ewma_",
) -> DataFrame:
    """Attach ``ewma_{m}`` per metric: span-EWM of the lag-1 series per entity."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(f"{prefix}{m}", T.DoubleType(), True) for m in metrics]
    )
    order = list(order_cols)
    reset = reset_col

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        groups = pdf[reset] if reset else None
        for m in metrics:
            shifted = pdf[m].astype("float64").shift(1)
            if groups is not None:
                pdf[f"{prefix}{m}"] = shifted.groupby(groups.values).transform(
                    lambda s: s.ewm(span=span, adjust=False).mean()
                )
            else:
                pdf[f"{prefix}{m}"] = shifted.ewm(span=span, adjust=False).mean()
        return pdf

    return df.groupBy(entity_col).applyInPandas(kernel, schema=out_schema)

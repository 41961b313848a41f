"""Venn / set-agreement analysis (R4, R5).

Reference: ``make_venn_diagram`` (plotting.py:9-54) computes 2/3-way set
algebra with Python sets and a Counter, then renders with matplotlib.

Engine: ONE pass instead of 7 set expressions — full-outer join the (distinct)
label sets into presence flags, then a single groupBy over the flag
combination (a grouping-sets-shaped aggregation). At scale this is one
shuffle on the label key + one tiny shuffle on 7 groups, versus the
reference's 7 materialized intersections/differences. The plot stays
driver-side by design (collect 7 scalars).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def venn_regions(
    a: DataFrame,
    b: DataFrame,
    c: DataFrame | None = None,
    label_col: str = "label",
) -> DataFrame:
    """Region cardinalities keyed by the venn bitmask ('100', '110', ...)
    matching the reference's Counter keys (plotting.py:42-53): position 1 =
    membership in A, 2 = B, 3 = C. For the 2-set flavor the mask has two
    positions ('10','01','11')."""
    sets = [("a", a), ("b", b)] + ([("c", c)] if c is not None else [])
    flagged = None
    for name, df in sets:
        one = df.select(F.col(label_col).alias("label")).distinct().withColumn(
            f"in_{name}", F.lit(1)
        )
        flagged = one if flagged is None else flagged.join(one, "label", "full")
    flags = [F.coalesce(F.col(f"in_{name}"), F.lit(0)) for name, _ in sets]
    mask = F.concat(*[f.cast("string") for f in flags])
    return (
        flagged.select(mask.alias("region"))
        .groupBy("region")
        .agg(F.count(F.lit(1)).alias("n_labels"))
    )

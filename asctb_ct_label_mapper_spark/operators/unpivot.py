"""Wide ASCT+B sheet -> long CT table (R1-R3, P1-P5).

Reference: ``fetch_ct_info_from_asctb_google_sheet``
(asctb_data_wrangling.py:94-111) — regex column prune, per-triplet rename +
dropna(how='all') + concat, drop_duplicates, reorder, null sentinel.

Column-set manipulation is driver-side in Spark too (schemas are metadata),
so the regex prune is plain Python over ``df.columns``; the data path is
per-triplet ``select`` + ``unionByName`` (UNION ALL, one shuffle-free scan
each) -> ``dropDuplicates`` (one shuffle) -> sentinel ``coalesce``.

R6 (the reference's ``reset_index(drop=True)``,
asctb_data_wrangling.py:208) is a no-op here: Spark rows carry no
positional index, and the downstream positional ``.loc`` gathers are
replaced by explicit join keys (SURVEY §2.3 R6, §2.4 J3/J4).

The reference's LABEL regex is single-digit only (``^CT/[0-9]/LABEL$``,
asctb_data_wrangling.py:96) — levels >= 10 lose their LABEL column. We
preserve that quirk behind ``strict_label_regex`` (default True for parity;
False fixes it). We do NOT reproduce the triplet misalignment the reference
exhibits when a pruned LABEL column shifts its ``sorted()[i:i+3]`` window
(same file :97,101-102): the engine groups columns by hierarchy level, which
is the computation the reference intends.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CT_ID_RE = re.compile(r"^CT/([0-9]+)/ID$")
CT_NAME_RE = re.compile(r"^CT/([0-9]+)$")
CT_LABEL_STRICT_RE = re.compile(r"^CT/([0-9])/LABEL$")  # reference quirk
CT_LABEL_FIXED_RE = re.compile(r"^CT/([0-9]+)/LABEL$")

UNKNOWN_CT_ID = "ASCTB CT_ID UNK"


def ct_triplet_unpivot(raw_sheet: DataFrame, strict_label_regex: bool = True) -> DataFrame:
    """P1 regex prune -> R1 unpivot -> R2 union -> P3 drop-all-null ->
    R3 distinct -> P4 reorder -> P5 null sentinel.

    Returns the 3-column ``(CT_ID, CT_NAME, CT_LABEL)`` table, one row per
    distinct cell type.
    """
    label_re = CT_LABEL_STRICT_RE if strict_label_regex else CT_LABEL_FIXED_RE
    levels: dict[int, dict[str, str]] = {}
    for col in raw_sheet.columns:
        for regex, role in ((CT_ID_RE, "id"), (CT_NAME_RE, "name"), (label_re, "label")):
            m = regex.match(col)
            if m:
                levels.setdefault(int(m.group(1)), {})[role] = col

    pieces = []
    for level in sorted(levels):
        cols = levels[level]
        if "name" not in cols:
            continue
        piece = raw_sheet.select(
            F.col(cols["name"]).alias("CT_NAME"),
            (F.col(cols["id"]) if "id" in cols else F.lit(None).cast("string")).alias("CT_ID"),
            (F.col(cols["label"]) if "label" in cols else F.lit(None).cast("string")).alias(
                "CT_LABEL"
            ),
        )
        pieces.append(piece.na.drop(how="all"))
    if not pieces:
        raise ValueError("no CT/<n> triplet columns found in the sheet")

    out = pieces[0]
    for piece in pieces[1:]:
        out = out.unionByName(piece)
    return (
        out.dropDuplicates()
        .select("CT_ID", "CT_NAME", "CT_LABEL")
        .withColumn("CT_ID", F.coalesce(F.col("CT_ID"), F.lit(UNKNOWN_CT_ID)))
    )

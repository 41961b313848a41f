"""R1-R3/P1-P5 unpivot over a synthetic wide sheet (FIXTURES §1.1),
including the single-digit LABEL regex quirk and the null sentinel."""

from __future__ import annotations

import pytest

from asctb_ct_label_mapper_spark.operators.unpivot import (
    UNKNOWN_CT_ID,
    ct_triplet_unpivot,
)


@pytest.fixture(scope="module")
def wide(spark):
    cols = [
        "AS/1",          # noise column -> pruned
        "CT/1", "CT/1/ID", "CT/1/LABEL",
        "CT/2", "CT/2/ID", "CT/2/LABEL",
        "CT/10", "CT/10/ID", "CT/10/LABEL",  # LABEL pruned under strict regex
    ]
    rows = [
        ("x", "alpha", "CL:1", "lbl-a", "beta", "CL:2", "lbl-b", "kappa", "CL:10", "lbl-k"),
        ("x", "alpha", "CL:1", "lbl-a", None, None, None, None, None, None),  # dup + all-null
        ("x", "gamma", None, "lbl-g", "beta", "CL:2", "lbl-b", None, None, None),  # null id
    ]
    return spark.createDataFrame(rows, ", ".join(f"`{c}` string" for c in cols))


def test_unpivot_strict_quirk(wide):
    out = ct_triplet_unpivot(wide, strict_label_regex=True)
    rows = {(r["CT_ID"], r["CT_NAME"], r["CT_LABEL"]) for r in out.collect()}
    assert ("CL:1", "alpha", "lbl-a") in rows
    assert ("CL:2", "beta", "lbl-b") in rows
    # level 10's LABEL column is dropped by the reference's single-digit regex
    assert ("CL:10", "kappa", None) in rows
    # noise column pruned, duplicates collapsed, all-null triplets dropped
    assert len(rows) == 4


def test_unpivot_fixed_regex_keeps_level10_label(wide):
    out = ct_triplet_unpivot(wide, strict_label_regex=False)
    rows = {(r["CT_ID"], r["CT_NAME"], r["CT_LABEL"]) for r in out.collect()}
    assert ("CL:10", "kappa", "lbl-k") in rows


def test_null_ct_id_gets_sentinel(wide):
    out = ct_triplet_unpivot(wide)
    rows = {(r["CT_ID"], r["CT_NAME"]) for r in out.collect()}
    assert (UNKNOWN_CT_ID, "gamma") in rows


def test_output_column_order(wide):
    assert ct_triplet_unpivot(wide).columns == ["CT_ID", "CT_NAME", "CT_LABEL"]


def test_no_triplets_raises(spark):
    df = spark.createDataFrame([("a",)], "`AS/1` string")
    with pytest.raises(ValueError):
        ct_triplet_unpivot(df)

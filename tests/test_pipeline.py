"""End-to-end pipeline goldens (SURVEY §5 layer 2): wide sheet -> reference
table (with S5 cache) -> mapping report, all offline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.pipeline import build_reference_embeddings, map_raw_labels


@pytest.fixture(scope="module")
def raw_sheet(spark):
    cols = ["CT/1", "CT/1/ID", "CT/1/LABEL", "CT/2", "CT/2/ID", "CT/2/LABEL"]
    rows = [
        ("basal cell", "CL:1000348", "basal", "club cell", "CL:0000158", "club"),
        ("tuft cell", "CL:0002204", "tuft", None, None, None),
        ("ionocyte", None, "iono", "basal cell", "CL:1000348", "basal"),
    ]
    return spark.createDataFrame(rows, ", ".join(f"`{c}` string" for c in cols))


@pytest.fixture(scope="module")
def ontology_fixture(spark):
    return spark.createDataFrame(
        [
            ("CL_1000348", "basal lbl", "a basal epithelial cell"),
            ("CL_0000158", "club lbl", "a club cell of the airway"),
        ],
        "ct_id_normalized string, label string, definition string",
    )


def test_build_reference_end_to_end(spark, raw_sheet, ontology_fixture):
    ref = build_reference_embeddings(spark, raw_sheet, ontology_fixture=ontology_fixture)
    rows = {r["CT_NAME"]: r for r in ref.collect()}
    assert set(rows) == {"basal cell", "club cell", "tuft cell", "ionocyte"}
    # enrichment hit
    assert rows["basal cell"]["definition"] == "a basal epithelial cell"
    # enrichment miss -> sentinel; all_text falls back through F11/P6
    assert rows["tuft cell"]["definition"] == "NaN"
    # every row carries a cleaned name and a unit embedding
    assert all(r["ct_name_cleaned"] for r in rows.values())
    assert all(r["embedding"] is not None and len(r["embedding"]) == 16 for r in rows.values())


def test_cache_probe_roundtrip(spark, raw_sheet, ontology_fixture, tmp_path):
    cache = str(tmp_path / "ref_cache.parquet")
    first = build_reference_embeddings(
        spark, raw_sheet, cache_path=cache, ontology_fixture=ontology_fixture
    )
    n = first.count()
    # second call must hit the cache (raw_sheet no longer needed: pass an
    # empty frame to prove the probe short-circuits)
    empty = spark.createDataFrame([], raw_sheet.schema)
    second = build_reference_embeddings(spark, empty, cache_path=cache)
    assert second.count() == n
    assert sorted(second.columns) == sorted(first.columns)


def test_map_raw_labels_iterable_api(spark, raw_sheet, ontology_fixture):
    ref = build_reference_embeddings(spark, raw_sheet, ontology_fixture=ontology_fixture)
    report = map_raw_labels(spark, ["Basal Cell", "weird thing"], ref, source_name="t", k=2)
    rows = {r["raw_input_label"]: r for r in report.collect()}
    assert rows["Basal Cell"]["match_score_1"] == 1.0  # exact after cleaning
    assert rows["Basal Cell"]["matched_asctb_id_1"] == "CL:1000348"
    assert rows["weird thing"]["match_score_1"] < 1.0
    assert rows["weird thing"]["match_score_2"] is not None


def test_csv_export_edge(spark, raw_sheet, ontology_fixture, tmp_path):
    ref = build_reference_embeddings(spark, raw_sheet, ontology_fixture=ontology_fixture)
    out = str(tmp_path / "report_csv")
    map_raw_labels(spark, ["basal cell"], ref, csv_export_path=out)
    import glob

    parts = glob.glob(f"{out}/part-*.csv")
    assert parts and open(parts[0], "rb").read().startswith(b"\xef\xbb\xbf")

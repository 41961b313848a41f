"""S1/S2: sheet-config JSON source + organ/version lookup.

Reference: ``get_ccf_reporter_sheet_config`` GETs the ccf-asct-reporter
``sheet-config.json`` via the GitHub contents API, base64-decodes the
payload and parses JSON (asctb_data_wrangling.py:9-34);
``get_asctb_data_url`` then scans the descriptor list for
``name == organ`` (case-insensitive) and ``version.viewValue == version``
returning (sheetUrl, sheetId, gid) (asctb_data_wrangling.py:39-66).

Engine: the fetch is a driver-side single GET (one small JSON — not a
distributed concern); decode + parse + lookup are expressed relationally so
the lookup composes with plans: ``unbase64`` -> ``from_json`` (explicit
schema) -> ``explode(version)`` -> filter -> first. Tests inject the JSON
bytes directly (no live HTTP, FIXTURES preamble).
"""

from __future__ import annotations

import base64
import json
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

SHEET_CONFIG_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("name", T.StringType()),
            T.StructField("display", T.StringType()),
            T.StructField(
                "version",
                T.ArrayType(
                    T.StructType(
                        [
                            T.StructField("value", T.StringType()),
                            T.StructField("viewValue", T.StringType()),
                            T.StructField("sheetId", T.StringType()),
                            T.StructField("gid", T.StringType()),
                            T.StructField("csvUrl", T.StringType()),
                        ]
                    )
                ),
            ),
        ]
    )
)


class SheetRef(NamedTuple):
    sheet_id: str
    gid: str
    csv_url: str


def sheet_config_df(spark: SparkSession, payload_b64: str) -> DataFrame:
    """Decode a base64 GitHub-contents payload into one organ-descriptor row
    per element (S1 + F17). ``payload_b64`` is the API's ``content`` field;
    in production it comes from one driver-side GET, in tests from a file."""
    df = spark.createDataFrame([(payload_b64,)], "content_b64 string")
    return (
        df.select(
            F.from_json(
                F.unbase64(F.regexp_replace("content_b64", "\\s", "")).cast("string"),
                SHEET_CONFIG_SCHEMA,
            ).alias("organs")
        )
        .select(F.explode("organs").alias("organ"))
        .select("organ.*")
    )


def lookup_sheet_ref(config: DataFrame, organ: str, version: str) -> SheetRef | None:
    """S2 scalar-subquery lookup: explode versions, case-insensitive organ
    match, exact viewValue match (asctb_data_wrangling.py:57-65)."""
    row = (
        config.select(F.col("name"), F.explode("version").alias("v"))
        .filter(
            (F.lower(F.col("name")) == organ.lower()) & (F.col("v.viewValue") == version)
        )
        .select("v.sheetId", "v.gid", "v.csvUrl")
        .first()
    )
    if row is None:
        return None
    return SheetRef(row["sheetId"], row["gid"], row["csvUrl"])


def encode_config_fixture(organs: list[dict]) -> str:
    """Test helper: JSON -> base64 payload shaped like the GitHub API."""
    return base64.b64encode(json.dumps(organs).encode()).decode()

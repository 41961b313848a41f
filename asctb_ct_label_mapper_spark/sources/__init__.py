from asctb_ct_label_mapper_spark.sources.config import (
    SHEET_CONFIG_SCHEMA,
    SheetRef,
    encode_config_fixture,
    lookup_sheet_ref,
    sheet_config_df,
)
from asctb_ct_label_mapper_spark.sources.csv_skip import read_csv_skiprows
from asctb_ct_label_mapper_spark.sources.sinks import write_csv_utf8_sig, write_parquet

__all__ = [
    "SHEET_CONFIG_SCHEMA",
    "SheetRef",
    "encode_config_fixture",
    "lookup_sheet_ref",
    "read_csv_skiprows",
    "sheet_config_df",
    "write_csv_utf8_sig",
    "write_parquet",
]

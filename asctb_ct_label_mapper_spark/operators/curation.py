"""Corpus-curation operators for the training-data pipeline: deterministic
dataset splits, PII scrubbing, and stratified sampling.

Not in the reference (it never curates a corpus) — required by the engine
brief as first-class training-data components, alongside dedup.py and
textstats.py.

Every operator here is NARROW (per-row expressions, zero shuffle): at
100 TB they stream through the scan at full parallelism, and every
function is whole-stage-codegen native — no Python anywhere.

Determinism contracts:
- ``hash_split`` buckets on the first 8 hex chars of ``md5(id)`` — the
  same integerization DuckDB replays byte-identically (the md5_token_hash
  pattern proven by dedup_simhash_md5 / winnowing_md5), so a row's split
  never depends on partitioning, row order, cluster size, or engine. A
  re-run, a backfill, or a different engine assigns every document the
  same split — the property that matters when train/test leakage is a
  launch blocker.
- ``pii_scrub`` is a fixed chain of ``regexp_replace`` passes whose
  patterns are written in the RE2-compatible subset shared by Spark (Java
  regex) and DuckDB (RE2), so the scrubbed text is engine-reproducible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- deterministic hash split ------------------------------------------------

N_BUCKETS = 100


def hash_bucket(id_col: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable [0, n_buckets) bucket: int of the first 8 md5 hex chars of the
    id rendered as a string, mod n_buckets. DuckDB replay:
    ``CAST(concat('0x', substr(md5(CAST(id AS VARCHAR)), 1, 8)) AS BIGINT)
    % n``."""
    h = F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
    return (h % n_buckets).cast("int")


def hash_split(
    df: DataFrame,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> DataFrame:
    """Assign every row a deterministic train/val/test split by id hash.

    Buckets [0, train) -> 'train', [train, train+val) -> 'val', the rest
    'test'. Adds ``bucket`` and ``split`` columns; keeps all input columns.
    """
    b = hash_bucket(F.col(id_col))
    return df.withColumn("bucket", b).withColumn(
        "split",
        F.when(F.col("bucket") < train_pct, F.lit("train"))
        .when(F.col("bucket") < train_pct + val_pct, F.lit("val"))
        .otherwise(F.lit("test")),
    )


def sql_hash_split(
    table: str,
    id_col: str,
    train_pct: int = 80,
    val_pct: int = 10,
) -> str:
    """DuckDB replay of ``hash_split`` (same md5 integerization)."""
    return f"""
    SELECT *,
        CAST(CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)) AS BIGINT)
             % {N_BUCKETS} AS INT) AS bucket,
        CASE
            WHEN CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)) AS BIGINT)
                 % {N_BUCKETS} < {train_pct} THEN 'train'
            WHEN CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)) AS BIGINT)
                 % {N_BUCKETS} < {train_pct + val_pct} THEN 'val'
            ELSE 'test'
        END AS split
    FROM {table}
    """


# --- PII scrubbing -----------------------------------------------------------

# Patterns restricted to the syntax Java regex and RE2 share: no lookaround,
# no backreferences. Order matters: emails before phone-ish digit runs so an
# address's local part is not half-eaten by the phone pass.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d()\. -]{7,}\d", "<PHONE>"),
)


def pii_scrub(df: DataFrame, text_col: str, out_col: str = "scrubbed") -> DataFrame:
    """Redact emails / IPv4s / phone-shaped digit runs from ``text_col``.

    Adds ``out_col`` (scrubbed text) and one ``n_<kind>`` count column per
    pattern (matches in the ORIGINAL text, counted before any replacement
    so counts are pattern-independent facts about the input).
    """
    out = df
    for kind, pat, _ in PII_PATTERNS:
        out = out.withColumn(f"n_{kind}", F.regexp_count(F.col(text_col), F.lit(pat)))
    scrubbed = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn(out_col, scrubbed)


def sql_pii_scrub(table: str, text_col: str, out_col: str = "scrubbed") -> str:
    """DuckDB replay of ``pii_scrub`` (regexp_replace with the 'g' flag
    matches Spark's replace-all semantics)."""
    counts = ",\n        ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) AS n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    scrub = text_col
    for _, pat, repl in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{repl}', 'g')"
    return f"""
    SELECT *,
        {counts},
        {scrub} AS {out_col}
    FROM {table}
    """


# --- deterministic stratified sampling ---------------------------------------


def stratified_sample(
    df: DataFrame,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum downsampling that is a pure function of md5(id): row kept
    iff its hash bucket falls under the stratum's percentage. Unlike
    ``DataFrame.sampleBy`` (seeded Bernoulli per partition — resample on
    every re-run/repartition), membership here is reproducible across
    engines, partitionings, and re-runs — rebalancing a skewed corpus
    (e.g. downsampling the dominant language) yields the same corpus every
    time, which is what makes ablations comparable.

    ``fractions`` maps stratum value -> keep fraction in [0, 1] (resolved
    at whole-percent granularity — the md5 bucket space is 100 wide).
    Narrow plan: zero shuffle, fully codegen.
    """
    frac = F.lit(int(round(default_fraction * 100)))
    for value, p in sorted(fractions.items()):
        frac = F.when(F.col(stratum_col) == value, int(round(p * 100))).otherwise(frac)
    return df.withColumn("bucket", hash_bucket(F.col(id_col))).filter(
        F.col("bucket") < frac
    )


def sql_stratified_sample(
    table: str,
    id_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
) -> str:
    """DuckDB replay of ``stratified_sample``."""
    cases = " ".join(
        f"WHEN {stratum_col} = '{v}' THEN {int(round(p * 100))}"
        for v, p in sorted(fractions.items())
    )
    bucket = (
        f"CAST(CAST(concat('0x', substr(md5(CAST({id_col} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" % {N_BUCKETS} AS INT)"
    )
    return f"""
    SELECT *, {bucket} AS bucket
    FROM {table}
    WHERE {bucket} < (CASE {cases} ELSE {int(round(default_fraction * 100))} END)
    """

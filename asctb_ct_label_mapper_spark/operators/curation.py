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

from pyspark.sql import Column, DataFrame, Window
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


# --- sequence packing --------------------------------------------------------


def pack_sequences(
    df: DataFrame,
    budget: int = 512,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concatenate-and-chunk sequence packing: lay documents end-to-end in
    deterministic (group, id) order and cut fixed ``budget``-token training
    rows — the standard LLM pretraining packing layout. A document's pack
    is ``floor(start_offset / budget)`` of its token start within its
    group's stream (documents spanning a boundary belong to the pack they
    START in; the trainer's loader splits residuals).

    Scale shape: the running offset is a window cumsum partitioned by
    ``group_col`` — NOT a global window (a global cumsum funnels 100 TB
    through one task; per-group streams are how packing parallelizes, with
    groups = shards/sources sized by the writer). Zero joins, one shuffle
    on the group key.

    Returns (id_col, group_col, n_tokens, start_offset, pack_id,
    offset_in_pack).
    """
    n_tokens = F.size(F.split(F.col(text_col), " "))
    w = (
        Window.partitionBy(group_col)
        .orderBy(F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_offsets = df.select(
        F.col(id_col),
        F.col(group_col),
        n_tokens.alias("n_tokens"),
        (F.sum(n_tokens).over(w) - n_tokens).alias("start_offset"),
    )
    return with_offsets.select(
        F.col(id_col),
        F.col(group_col),
        "n_tokens",
        "start_offset",
        F.floor(F.col("start_offset") / budget).cast("long").alias("pack_id"),
        (F.col("start_offset") % budget).cast("long").alias("offset_in_pack"),
    )


def sql_pack_sequences(
    table: str = "documents",
    budget: int = 512,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB replay of ``pack_sequences`` (same window frame)."""
    return f"""
    SELECT {id_col}, {group_col}, n_tokens, start_offset,
        CAST(floor(start_offset / {budget}) AS BIGINT) AS pack_id,
        CAST(start_offset % {budget} AS BIGINT) AS offset_in_pack
    FROM (
        SELECT {id_col}, {group_col},
            len(string_split({text_col}, ' ')) AS n_tokens,
            sum(len(string_split({text_col}, ' ')))
                OVER (PARTITION BY {group_col} ORDER BY {id_col}
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - len(string_split({text_col}, ' ')) AS start_offset
        FROM {table}
    )
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

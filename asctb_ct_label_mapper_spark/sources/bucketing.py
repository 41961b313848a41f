"""Bucketed-layout session helper (VERDICT r6 #5) — the storage-side half
of "co-locate joins via bucketing".

The order-grain TPC-H shapes (q4/q18/q21) all pay one dominant exchange:
the lineitem/orders fact-fact join and the per-order aggregates that
follow it, every run, on every query. Writing both facts ONCE as
bucketed + sorted managed tables on the order key moves that shuffle
from query time to ingest time: Catalyst reads the bucket spec from the
catalog and plans SortMergeJoin / per-key aggregation with NO Exchange
on the bucketed key (asserted in tests/test_bucketing.py; priced at
2.4-2.7x on the rel10x cores by tools/bench_bucketing.py).

At 100 TB this is the difference between re-shuffling the fact tables on
every analytical query and shuffling them exactly once at ingest — the
same contract as the MinHash signature table: pay the layout cost where
the data lands, query against the layout forever after.

Tables are MANAGED (they land in spark.sql.warehouse.dir) and keyed by
source directory + bucket count, so different scale tiers coexist;
``ensure_bucketed_tables`` is write-once per key (``force=True``
rebuilds). Test data here is immutable per round; a production ingest
would own invalidation the way it owns the signature table.
"""

from __future__ import annotations

import hashlib
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FACTS: tuple[tuple[str, str], ...] = (
    ("orders", "o_orderkey"),
    ("lineitem", "l_orderkey"),
)


def bucket_table_name(sf_dir: str, table: str, n_buckets: int) -> str:
    """Deterministic catalog name for the bucketed copy of ``table`` from
    ``sf_dir`` — a sanitized tag plus a path hash so tiers never collide,
    plus the pid: the in-memory catalog dies with the process so the
    layout is rebuilt per process regardless, but the WAREHOUSE directory
    is shared — without the pid, two concurrent sessions (bench +
    correctness run) rmtree/rewrite the same location while the other is
    reading it (the orc_roundtrip flaky-failure class, r12 ADVICE)."""
    tag = re.sub(r"[^a-z0-9]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1].lower())
    h = hashlib.md5(sf_dir.rstrip("/").encode()).hexdigest()[:6]
    return f"bkt{n_buckets}_{tag}_{h}_p{os.getpid()}_{table}"


def sweep_stale_pid_dirs(
    root: str, pid_pattern: str, entry_re: str | None = None
) -> int:
    """Remove sibling per-process artifact directories whose owning
    process is DEAD — the pid suffix fixes concurrent clobbering
    (bucket_table_name / queries._fixture_dir), but without a sweep
    every crashed or finished bench/correctness process leaks one full
    bucketed-fact copy into the shared directory forever (r12 second
    review pass: gigabytes per run at the 100x tiers).  Called at
    ingest time — the moment a new copy is about to be paid for is the
    cheap moment to reclaim the dead ones.  Liveness = kill(pid, 0);
    the CURRENT process's own dirs are never touched.  Returns the
    number of directories removed.

    ``entry_re``: optional anchor the FULL entry name must match before
    the pid probe runs.  The warehouse directory is shared with every
    other managed table — without the anchor, an unrelated table whose
    name coincidentally contains ``_p<digits>_`` would be swept when
    that number is a dead pid (r13 ADVICE, medium).  Callers sweeping a
    shared directory must pass the template of THEIR OWN artifacts
    (bucketed facts pass ``^bkt\\d+_``)."""
    if not os.path.isdir(root):
        return 0
    me = os.getpid()
    removed = 0
    for entry in os.listdir(root):
        if entry_re is not None and re.match(entry_re, entry) is None:
            continue
        # LAST match: the sf_dir-derived tag may itself contain a
        # `_p<digits>_` token (an sf_dir named "data_p100_v2"); the
        # real pid suffix is structurally the final occurrence
        # (r12 second review pass — a first-match probe could check
        # liveness of the WRONG number and rmtree a live session's
        # bucket tables)
        matches = list(re.finditer(pid_pattern, entry))
        if not matches:
            continue
        pid = int(matches[-1].group(1))
        if pid == me:
            continue
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            shutil.rmtree(os.path.join(root, entry), ignore_errors=True)
            removed += 1
        except PermissionError:
            continue  # pid alive under another uid — leave it
    return removed


def bucketed_tables_ready(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[tuple[str, str], ...] = DEFAULT_FACTS,
    n_buckets: int = 32,
) -> bool:
    """True iff EVERY bucketed fact for ``sf_dir`` is already in this
    session's catalog — the zero-job probe behind ``impl='auto'`` seams
    (q21_plan): a steady-state session that already paid the ingest
    should read the layout; a cold session should not charge a full
    bucketing ingest to one ad-hoc query."""
    return all(
        spark.catalog.tableExists(bucket_table_name(sf_dir, t, n_buckets))
        for t, _ in tables
    )


def ensure_bucketed_tables(
    spark: SparkSession,
    sf_dir: str,
    tables: tuple[tuple[str, str], ...] = DEFAULT_FACTS,
    n_buckets: int = 32,
    force: bool = False,
) -> dict[str, DataFrame]:
    """Materialize (once) and return the bucketed fact tables for
    ``sf_dir`` as ``{table_name: DataFrame}``. Each table is bucketed AND
    sorted on its join key, so downstream equi-joins and aggregations on
    that key elide their Exchange (and the sort, for sort-merge)."""
    from asctb_ct_label_mapper_spark.schemas import load_table

    out: dict[str, DataFrame] = {}
    for table, key in tables:
        name = bucket_table_name(sf_dir, table, n_buckets)
        if force or not spark.catalog.tableExists(name):
            # the in-memory catalog dies with the session but the warehouse
            # directory does not: a stale location from a previous process
            # fails saveAsTable with LOCATION_ALREADY_EXISTS. The bucket
            # spec lives in the CATALOG, not the parquet footers, so the
            # leftover files cannot be reused as a bucketed table — clear
            # and rebuild (per-process ingest cost, measured once).
            wh = spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            ).removeprefix("file:")
            # anchored to the bucket-table template: the warehouse dir
            # holds OTHER managed tables too (r13 ADVICE, medium)
            sweep_stale_pid_dirs(wh, r"_p(\d+)_", entry_re=r"bkt\d+_")
            loc = os.path.join(wh, name.lower())
            if os.path.isdir(loc):
                shutil.rmtree(loc, ignore_errors=True)
            (
                load_table(spark, sf_dir, table)
                .write.bucketBy(n_buckets, key)
                .sortBy(key)
                .mode("overwrite")
                .saveAsTable(name)
            )
        out[table] = spark.table(name)
    return out


def clustered_copy_path(sf_dir: str, table: str, cluster_cols: list[str]) -> str:
    """Deterministic on-disk location for the range-clustered copy of
    ``table`` from ``sf_dir`` (same keying idea as bucket_table_name —
    tiers never collide)."""
    import tempfile

    tag = re.sub(r"[^a-z0-9]+", "_", sf_dir.rstrip("/").rsplit("/", 1)[-1].lower())
    h = hashlib.md5(
        (sf_dir.rstrip("/") + "|" + ",".join(cluster_cols)).encode()
    ).hexdigest()[:6]
    return os.path.join(
        tempfile.gettempdir(), "graft_clustered", f"{tag}_{h}_{table}"
    )


def ensure_clustered_copy(
    spark: SparkSession,
    sf_dir: str,
    table: str = "lineitem",
    cluster_cols: list[str] | None = None,
    n_files: int = 16,
    rows_per_rowgroup: int = 65536,
    force: bool = False,
) -> str:
    """Materialize (once per tier) the range-clustered parquet copy of
    ``table`` via ``sinks.write_clustered`` and return its path — the
    data-skipping counterpart of ``ensure_bucketed_tables``: bucketing
    pre-pays the JOIN shuffle, clustering pre-pays the SELECTIVE-SCAN
    read (tight row-group min/max stats make predicate pushdown skip
    row groups that cannot match). Same ingest-owns-the-layout contract;
    write-once, keyed by tier + cluster key."""
    from asctb_ct_label_mapper_spark.schemas import load_table
    from asctb_ct_label_mapper_spark.sources.sinks import write_clustered

    cluster_cols = cluster_cols or ["l_shipdate"]
    path = clustered_copy_path(sf_dir, table, cluster_cols)
    marker = os.path.join(path, "_SUCCESS")
    if force or not os.path.exists(marker):
        write_clustered(
            load_table(spark, sf_dir, table),
            path,
            cluster_cols,
            n_files=n_files,
            rows_per_rowgroup=rows_per_rowgroup,
        )
    return path

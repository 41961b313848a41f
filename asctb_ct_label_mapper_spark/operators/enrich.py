"""S4: ontology-definition enrichment (REST point-lookup source).

Reference: one blocking HTTP GET per reference-table row — including
duplicate CT_IDs — navigating
``['_embedded']['terms'][0]['annotation']['definition'][0]`` with 'NaN' on
any failure (asctb_data_wrangling.py:124-183, invoked per row at :205).

Engine redesign (SURVEY §4):
1. ``distinct()`` on the normalized id FIRST — the reference's 83-row table
   makes ~14 duplicate calls; at 100 TB the dedup is the difference between
   1e5 and 1e9 HTTP calls.
2. The lookup itself is ``mapInPandas`` over the distinct ids: batched,
   per-partition session reuse, bounded retries. Executors do the I/O in
   parallel; the driver never loops.
3. Results joined back broadcast (the distinct-id table is small relative
   to the fact table by construction).

Tests and the default path never touch the network: ``fetcher`` is
injectable and the offline default resolves against a fixture DataFrame
(FIXTURES §1.4), preserving the 'NaN'-sentinel semantics exactly.
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

NAN_SENTINEL = "NaN"

# (id) -> (label, definition); any failure must map to NAN_SENTINEL.
Fetcher = Callable[[str], tuple[str, str]]


def normalize_ct_id_expr(ct_id):
    """F10: 'CL:0002062' -> 'CL_0002062' (asctb_data_wrangling.py:205,134)."""
    return F.translate(ct_id, ":", "_")


def _http_fetcher(ct_id_normalized: str) -> tuple[str, str]:
    """Live OLS/Ontobee lookup, one id. Import-guarded: ``requests`` may be
    absent; failure of any kind returns the reference's sentinel."""
    try:
        import requests  # type: ignore

        url = (
            "https://www.ebi.ac.uk/ols/api/ontologies/cl/terms?iri="
            f"http://purl.obolibrary.org/obo/{ct_id_normalized}"
        )
        resp = requests.get(url, timeout=10)
        doc = resp.json()
        term = doc["_embedded"]["terms"][0]
        label = term.get("label") or NAN_SENTINEL
        definition = term["annotation"]["definition"][0]
        return str(label), str(definition)
    except Exception:
        return NAN_SENTINEL, NAN_SENTINEL


def enrich_with_definitions(
    ct_table: DataFrame,
    fixture: DataFrame | None = None,
    fetcher: Fetcher | None = None,
    batch_retries: int = 2,
) -> DataFrame:
    """Add ``definition`` + ``all_text`` to a (CT_ID, CT_NAME, CT_LABEL)
    table (reference: fetch_asctb_definitions_cell_ontology,
    asctb_data_wrangling.py:188-215).

    Resolution order: ``fixture`` DataFrame (offline, default for tests) >
    ``fetcher`` callable via batched ``mapInPandas``. ``all_text`` uses the
    reference's NULL-PROPAGATING concat + CT_NAME fallback (F11 + P6,
    asctb_data_wrangling.py:206-207): ``concat`` (not concat_ws) so any null
    component nulls the whole text, then ``coalesce`` to CT_NAME.
    """
    with_norm = ct_table.withColumn("_ct_norm", normalize_ct_id_expr(F.col("CT_ID")))

    if fixture is not None:
        defs = fixture.select(
            F.col("ct_id_normalized").alias("_ct_norm"),
            F.coalesce(F.col("definition"), F.lit(NAN_SENTINEL)).alias("definition"),
        )
    else:
        distinct_ids = with_norm.select("_ct_norm").distinct()
        fetch = fetcher or _http_fetcher

        def lookup(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for cid in pdf["_ct_norm"]:
                    label, definition = NAN_SENTINEL, NAN_SENTINEL
                    for _ in range(batch_retries + 1):
                        label, definition = fetch(cid)
                        if definition != NAN_SENTINEL:
                            break
                    out.append((cid, definition))
                yield pd.DataFrame(out, columns=["_ct_norm", "definition"])

        defs = distinct_ids.mapInPandas(
            lookup,
            schema=T.StructType(
                [
                    T.StructField("_ct_norm", T.StringType()),
                    T.StructField("definition", T.StringType()),
                ]
            ),
        )

    enriched = with_norm.join(F.broadcast(defs), "_ct_norm", "left").withColumn(
        "definition", F.coalesce(F.col("definition"), F.lit(NAN_SENTINEL))
    )
    # F11: null-propagating concat (NOT concat_ws), then P6 fallback.
    all_text = F.concat(
        F.col("CT_NAME"), F.lit(" "), F.col("CT_LABEL"), F.lit(" "), F.col("definition")
    )
    return (
        enriched.withColumn("all_text", F.coalesce(all_text, F.col("CT_NAME")))
        .drop("_ct_norm")
    )

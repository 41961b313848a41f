"""Registry hygiene (VERDICT r9 #7): the r9 round found a
same-name @query registration silently shadowing an earlier operator
(later def wins). These checks fail on drift instead:

- the decorator now raises on a duplicate name from a different
  function (re-registration by the SAME function, i.e. module
  re-import, stays legal);
- every row of the committed LOCAL_CORRECTNESS sweep still resolves in
  the registry (a rename/deletion without regenerating the sweep
  fails loudly);
- every oracle key has a query, and the documented rows-only set is
  exactly the queries without oracles.
"""

from __future__ import annotations

import re
from pathlib import Path

from asctb_ct_label_mapper_spark.queries import (
    all_oracles,
    all_queries,
    query,
)

REPO = Path(__file__).resolve().parent.parent

# the two registrations that are rows-only BY DESIGN (non-replayable in
# ANSI SQL: live projection layout; JVM-private HLL sketch binaries)
ROWS_ONLY = {"viz_projection", "distinct_users_sketch"}


def test_duplicate_registration_raises():
    import pytest

    @query("__registry_hygiene_probe__")
    def probe_a(spark, sf_dir):  # pragma: no cover - never executed
        raise AssertionError

    # same function again: legal (module re-import shape)
    query("__registry_hygiene_probe__")(probe_a)

    with pytest.raises(ValueError, match="already registered"):
        @query("__registry_hygiene_probe__")
        def probe_b(spark, sf_dir):  # pragma: no cover - never executed
            raise AssertionError

    # cleanup so other tests see the real registry
    from asctb_ct_label_mapper_spark import queries as qmod

    del qmod.QUERIES["__registry_hygiene_probe__"]


def test_local_correctness_rows_resolve_in_registry():
    qs = set(all_queries())
    text = (REPO / "LOCAL_CORRECTNESS.md").read_text()
    rows = set(re.findall(r"^\| `([a-z0-9_]+)` \|", text, re.M))
    assert rows, "LOCAL_CORRECTNESS.md rows not parseable"
    missing = rows - qs
    assert not missing, (
        f"LOCAL_CORRECTNESS rows no longer in registry: {sorted(missing)}"
    )


def test_oracle_keys_subset_and_rows_only_documented():
    qs = set(all_queries())
    os_ = set(all_oracles())
    assert os_ <= qs, f"oracles without queries: {sorted(os_ - qs)}"
    assert qs - os_ == ROWS_ONLY, (
        "rows-only set drifted — document the change here AND in "
        f"README/LOCAL_CORRECTNESS: {sorted(qs - os_)}"
    )

"""Row-count witnesses for the rows-only entry queries at sf0.001.

These eight queries have no DuckDB twin (non-SQL-expressible: fused
Arrow pipelines, model scoring, MinHash banding), so the driver only
ever records a weak rows-only check for them — and only in rounds where
the rotation puts them in the 50-slot window. A regression to zero rows
(or a crash) must not be able to hide behind ledger absence, so each
one is pinned here to return > 0 rows on the committed sf0.001 tables.
"""

from __future__ import annotations

import os

import pytest

from tests.test_driver_contract import ROWS_ONLY, _entry

SF_DIR = "/root/testdata/sf0.001"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF_DIR), reason="driver testdata not present"
)


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_query_returns_rows(spark, name):
    e = _entry()
    df = e.queries()[name](spark, SF_DIR)
    assert df.count() > 0, f"{name} returned 0 rows at sf0.001"

"""Driver-t2 mirror: every Tier-A key (has an oracle) is run on Spark and
DuckDB and compared (row count + schema + order-insensitive values).

Runs at sf0.001 by default for speed; set PYETL_TEST_SF_DIR=/root/testdata/sf0.01
to reproduce the driver's exact scale.
"""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.medium

from pyetl_spark import registry
from tests.conftest import assert_parity

registry.load_all()
TIER_A_KEYS = sorted(registry.ORACLE)
TIER_B_KEYS = sorted(set(registry.QUERIES) - set(registry.ORACLE))


@pytest.mark.parametrize("key", TIER_A_KEYS)
def test_tier_a_parity(spark, duck, key):
    assert_parity(spark, duck, key)


@pytest.mark.parametrize("key", TIER_B_KEYS)
def test_tier_b_rows(spark, key):
    """Rows-only check for Tier-B keys (driver's weaker gate)."""
    from tests.conftest import SF_ORACLE

    df = registry.QUERIES[key](spark, SF_ORACLE)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0

"""Matryoshka truncation-eval gates."""

from __future__ import annotations

from pyetl_spark import registry

registry.load_all()
SF = "/root/testdata/sf0.01"


def test_recall_monotone_and_self_consistent(spark):
    rows = {
        r["dim"]: r["mean_recall_at_10"]
        for r in registry.QUERIES["vec_matryoshka_eval"](
            spark, SF
        ).collect()
    }
    assert set(rows) == {8, 16, 32, 64}
    assert rows[64] == 1.0  # truth vs itself
    # longer prefixes cannot lose recall on average by more than noise;
    # require weak monotonicity across the doubling ladder
    assert rows[8] <= rows[16] + 1e-9
    assert rows[16] <= rows[32] + 1e-9
    assert rows[32] <= rows[64] + 1e-9
    assert rows[8] > 0.0

"""Round-4 operator tests: ANN recall report floors and shape."""

from __future__ import annotations

import pytest

from etl_s3_to_redshift_spark.queries import REGISTRY, _load_extensions
from tests.conftest import SF_SMOKE

_load_extensions()

# per-method recall@10 minimums at sf0.001 — the floors the rows-only
# driver check makes externally visible as row values
RECALL_FLOORS = {"lsh": 0.5, "ivf": 0.5, "pq": 0.5, "ivfpq": 0.3}


def test_recall_report_shape_and_floors(spark):
    rows = {
        r["method"]: r
        for r in REGISTRY["sim_ann_recall_report"].spark(spark, SF_SMOKE).collect()
    }
    assert set(rows) == set(RECALL_FLOORS)
    for m, r in rows.items():
        assert r["k"] == 10 and r["n_queries"] == 5
        assert 0 <= r["n_hits"] <= 50
        assert r["recall"] == pytest.approx(r["n_hits"] / 50.0, abs=1e-4)
        assert r["recall"] >= RECALL_FLOORS[m], (m, r["recall"])

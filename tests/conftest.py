from __future__ import annotations

import json

import pytest

from mongo_iceberg_lakehouse_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="lakehouse-tests",
        master="local[8]",
        warehouse_dir=str(wh),
    )
    s.conf.set("spark.sql.shuffle.partitions", "8")  # small data, fast tests
    yield s
    s.stop()


# The re-created reference seed lives in the package (fixtures.py) so the
# declared query set can run the full pipeline too.
from mongo_iceberg_lakehouse_spark.fixtures import SEED_ORDERS  # noqa: E402,F401


@pytest.fixture(scope="session")
def orders_json_path(tmp_path_factory) -> str:
    p = tmp_path_factory.mktemp("seed") / "orders.json"
    p.write_text(json.dumps(SEED_ORDERS, indent=2))
    return str(p)

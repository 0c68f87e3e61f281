from __future__ import annotations

import pytest

from hops_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # 8 shuffle partitions for the TEST session only: sf0.001 stages
    # are overhead-bound (32 near-empty tasks per exchange dominated
    # the suite's 36-minute wall — guide §1.2 step 4), and every
    # registered query's output is partition-count independent by the
    # determinism contract (tools/determinism_check.py verifies value
    # hashes at 3 vs 37 partitions). Bench/driver configs untouched.
    s = get_spark("hops-spark-tests",
                  **{"spark.sql.shuffle.partitions": "8"})
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR

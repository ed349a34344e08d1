from __future__ import annotations

import os
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_SMOKE = os.environ.get("SPARK_GRAFT_SMOKE_SF", "/root/testdata/sf0.001")
SF_CORRECT = os.environ.get("SPARK_GRAFT_CORRECT_SF", "/root/testdata/sf0.01")


@pytest.fixture(scope="session")
def spark():
    from ibd_pipeline_spark.session import get_spark

    # Small core count for tests: fixture data is tiny and task-launch
    # overhead dominates with 32 threads. Overridable so the
    # partition-invariance shakeout can re-run the same suite under a
    # different (odd/prime) parallelism — results must not change.
    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "4")
    parts = int(os.environ.get("SPARK_GRAFT_TEST_PARTS", "4"))
    s = get_spark(
        app_name="ibd-pipeline-tests",
        master=f"local[{cpus}]",
        shuffle_partitions=parts,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return SF_SMOKE


@pytest.fixture(scope="session")
def duck():
    import duckdb

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_SMOKE}/{name}.parquet'"
        )
    yield con
    con.close()

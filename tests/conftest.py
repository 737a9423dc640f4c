import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA_DIR = os.path.join(REPO, "_data")


@pytest.fixture(scope="session")
def spark():
    from pii_detection_redaction_spark.plans.session import build_session

    s = build_session(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


def _pages_parquet(n: int, name: str) -> str:
    from pii_detection_redaction_spark.testing.corpus import (
        CORPUS_VERSION,
        write_pages_parquet,
    )

    os.makedirs(DATA_DIR, exist_ok=True)
    path = os.path.join(DATA_DIR, f"v{CORPUS_VERSION}-{name}")
    if not os.path.exists(path):
        write_pages_parquet(path, n)
    return path


@pytest.fixture(scope="session")
def pages_small():
    """500-row synthetic pages corpus (sf0.001 analog), cached under _data/."""
    return _pages_parquet(500, "pages_sf0.001.parquet")


@pytest.fixture(scope="session")
def sf001_dir():
    # override (e.g. PII_TEST_SF_DIR=/root/testdata/sf0.01) to run the
    # differential suite at the driver's correctness scale
    return os.environ.get("PII_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def sf01_dir():
    return "/root/testdata/sf0.01"

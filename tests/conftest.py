from __future__ import annotations

import pytest

from transcript_dedup.config import DedupConfig
from transcript_dedup.generate import generate_corpus
from transcript_dedup.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark("transcript-dedup-tests", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def cfg():
    return DedupConfig()


@pytest.fixture(scope="session")
def corpus200():
    """Deterministic 200-conversation corpus (FIXTURES.md sizes: unit tests)."""
    return generate_corpus(200, seed=42)


@pytest.fixture(scope="session")
def turns200(spark, corpus200):
    from transcript_dedup.generate import corpus_to_spark

    return corpus_to_spark(spark, corpus200[0])

from __future__ import annotations

import pytest

from nfl_feature_store_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", master="local[8]", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def transcripts_pdf():
    from nfl_feature_store_spark.sources.transcripts import gen_transcripts_pdf

    return gen_transcripts_pdf(n_convs=120, seed=42, max_turns=300, hot_conv_turns=900)


@pytest.fixture(scope="session")
def transcripts_sdf(spark, transcripts_pdf):
    from nfl_feature_store_spark.sources.transcripts import transcripts_from_pandas

    return transcripts_from_pandas(spark, transcripts_pdf).cache()

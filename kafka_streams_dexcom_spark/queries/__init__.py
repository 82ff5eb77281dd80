"""Named query registry: every operator from SURVEY.md §2 (+ extensions)
bound to the driver testdata, each with a DuckDB oracle where expressible.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (ANSI SQL over the pre-registered views).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from kafka_streams_dexcom_spark.queries import (
        core,
        dedup,
        joinshapes,
        multimodal,
        relational,
        similarity,
        temporal,
        text,
    )

    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in (core, relational, joinshapes, temporal, dedup, similarity, text, multimodal):
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    from kafka_streams_dexcom_spark.queries import (
        core,
        dedup,
        joinshapes,
        multimodal,
        relational,
        similarity,
        temporal,
        text,
    )

    out: dict[str, str] = {}
    for mod in (core, relational, joinshapes, temporal, dedup, similarity, text, multimodal):
        out.update(mod.ORACLES)
    return out

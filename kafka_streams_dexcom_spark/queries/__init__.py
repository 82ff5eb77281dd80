"""Named query registry: every operator from SURVEY.md §2 (+ extensions)
bound to the driver testdata, each with a DuckDB oracle where expressible.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (ANSI SQL over the pre-registered views).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from kafka_streams_dexcom_spark.queries import (
        core,
        corpus,
        dedup,
        joinshapes,
        multimodal,
        relational,
        similarity,
        temporal,
        text,
    )

    # ONE module list for queries and oracles — two copies would let
    # them drift (a query registered without its oracle or vice versa)
    return (core, relational, joinshapes, temporal, dedup, similarity,
            text, multimodal, corpus)


def _merged(attr: str) -> dict:
    out: dict = {}
    for mod in _modules():
        d = getattr(mod, attr)
        clash = set(out) & set(d)
        if clash:
            raise ValueError(
                f"duplicate {attr} names across query modules: "
                f"{sorted(clash)} (latest would silently shadow)"
            )
        out.update(d)
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _merged("QUERIES")


def all_oracles() -> dict[str, str]:
    return _merged("ORACLES")

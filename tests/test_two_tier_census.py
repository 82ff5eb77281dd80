"""Two-tier chrome census — the 100 TB composition SCALE.md documents
for the per-domain line pass: a width-bounded Bloom filter screens the
line stream so only lines PROBABLY SEEN BEFORE enter the exact census,
keeping the nd=1 singleton tail (which dominates exact state on real
crawls) inside the bounded filter.

Wiring (all existing pieces, no new package surface):
  line rows -> BloomFilterMaintainer keyed on (host, line text)
            -> probably_seen lines -> HostLineCensusMaintainer state

Correctness frame: any line reaching the chrome threshold (count of
distinct docs >= 2) was by definition seen before its second
occurrence, so that second occurrence IS flagged probable and enters
the census with count >= threshold-1. Therefore two-tier chrome (at
the -1 adjusted threshold) is a SUPERSET of exact chrome — misses are
structurally impossible; the price is Bloom-FP-promoted singletons,
measured here against the filter's fill ratio."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions import url as ux
from kafka_streams_dexcom_spark.operators.text import (
    HOST_LINE_MIN_DOCS,
    host_lines,
)
from kafka_streams_dexcom_spark.sources.files import load_table
from kafka_streams_dexcom_spark.streaming.bloom_ingest import (
    BloomFilterMaintainer,
)
from kafka_streams_dexcom_spark.streaming.line_census import (
    HostLineCensusMaintainer,
)
from tests.conftest import SF_DIR

N_BATCHES = 4


@pytest.fixture(scope="module")
def docs(spark):
    d = load_table(spark, SF_DIR, "documents").select(
        "doc_id",
        F.expr(
            ux.host_sql(ux.canonical_url_sql(ux.messy_url_sql()))
        ).alias("host"),
        F.expr(ux.page_text_sql()).alias("text"),
    )
    return d.localCheckpoint()


def _line_rows(docs):
    """(doc_id, host, text=line) rows — the Bloom tier keys on the
    (host, line) pair so identical lines on different hosts stay
    independent, matching the census's host scoping."""
    return host_lines(docs).select(
        "doc_id",
        "host",
        F.concat_ws("\x1f", "host", "line").alias("text"),
        F.col("line"),
        F.col("lh"),
    )


def test_two_tier_census_bounds_state_without_missing_chrome(
    spark, tmp_path, docs
):
    lines = _line_rows(docs).localCheckpoint()
    n_distinct = lines.select("host", "lh").distinct().count()

    bloom = BloomFilterMaintainer(
        spark,
        str(tmp_path / "bloom"),
        m_bits=8 * lines.count(),
        id_col="lh",
        text_col="text",
        lineage_id="tt",
    )
    census = HostLineCensusMaintainer(
        spark, str(tmp_path / "census"), lineage_id="tt"
    )

    # drive both tiers batch-by-batch: screen the batch's lines against
    # the PRE-batch filter; the census receives (a) lines the filter
    # flags as probably seen in a PRIOR batch, plus (b) lines repeated
    # across >= 2 docs WITHIN this batch — the screen is prior-state
    # only by contract (bloom_ingest docstring: within-batch duplicates
    # are the batch operator's job), so (b) is not optional
    for b in range(N_BATCHES):
        batch = lines.filter(
            F.col("doc_id") % N_BATCHES == b
        ).localCheckpoint()
        seen_flags = {}

        def screened(df, bid, sink=seen_flags):
            for r in df.collect():
                sink[r["lh"]] = max(
                    sink.get(r["lh"], 0), r["probably_seen"]
                )

        bloom.screened = screened
        bloom(batch.select("lh", "text").distinct(), b)
        probable = [h for h, s in seen_flags.items() if s == 1]
        within = (
            batch.groupBy("host", "lh")
            .agg(F.count_distinct("doc_id").alias("nd"))
            .filter(F.col("nd") >= 2)
            .select("host", "lh")
        )
        feed = (
            batch.filter(F.col("lh").isin(probable or [-1]))
            .unionByName(
                batch.join(F.broadcast(within), ["host", "lh"],
                           "leftsemi")
            )
            .dropDuplicates(["doc_id", "host", "lh"])
        )
        census(
            feed.select("doc_id", "host", F.col("line").alias("text")),
            b,
        )

    # 1. bounded state: the singleton tail stayed out of the exact tier
    census_lines = (
        census.census().select("host", "lh").distinct().count()
    )
    assert census_lines < n_distinct / 2, (
        f"exact tier holds {census_lines} of {n_distinct} distinct "
        "lines — the Bloom front did not absorb the singleton tail"
    )

    # 2. no missed chrome: every exact-chrome line appears in the
    # two-tier census at count >= threshold-1 (its first occurrence is
    # the only one the Bloom front can hide)
    exact_chrome = {
        (r["host"], r["lh"])
        for r in (
            host_lines(docs)
            .select("host", "lh", "doc_id")
            .distinct()
            .groupBy("host", "lh")
            .agg(F.count(F.lit(1)).alias("nd"))
            .filter(F.col("nd") >= HOST_LINE_MIN_DOCS)
            .collect()
        )
    }
    two_tier_chrome = {
        (r["host"], r["lh"])
        for r in (
            census.census()
            .groupBy("host", "lh")
            .agg(F.sum("nd").alias("nd"))
            .filter(F.col("nd") >= HOST_LINE_MIN_DOCS - 1)
            .collect()
        )
    }
    missed = exact_chrome - two_tier_chrome
    assert not missed, f"two-tier census missed chrome: {missed}"

    # 3. the price is measured, not hidden: FP-promoted singletons are
    # bounded by the filter's fill-derived FP rate (generous 5x slack
    # over fill^k for the small-sample regime)
    extras = two_tier_chrome - exact_chrome
    fp_budget = max(10, int(5 * (bloom.fill_ratio() ** bloom.k)
                            * n_distinct))
    assert len(extras) <= fp_budget, (
        f"{len(extras)} FP-promoted lines exceeds budget {fp_budget} "
        f"at fill {bloom.fill_ratio():.3f}"
    )

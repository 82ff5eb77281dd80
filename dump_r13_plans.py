#!/usr/bin/env python
"""Dump .explain('formatted') for the round-13 optimization candidates
into plans/r13/<query>_<when>.txt (judge-checkable plan evidence).

Usage: python dump_r13_plans.py before|after [query ...]

`er_fuzzy_pipeline` is a pseudo-name: the er_fuzzy_customers query plan
is a flat artifact-parquet scan by design, so the candidate-generation
pipeline (what round 13 would optimize) is dumped directly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_dexcom_spark.plans import explain_str  # noqa: E402
from kafka_streams_dexcom_spark.queries import all_queries  # noqa: E402
from kafka_streams_dexcom_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"

DEFAULT = [
    # bm25 family (VERDICT item 2 + 4)
    "bm25_search",
    "bm25_freetext",
    "bm25_rerank",
    "hybrid_search_rrf",
    # span family (VERDICT item 3)
    "span_dedup_rewrite",
    "span_dedup_maximal",
    "dup_span_fraction",
    "boilerplate_rewrite",
    "eval_span_scrub",
    "host_line_dedup",
    # two-level top-k consumers (WindowGroupLimit redundancy)
    "sim_search_bruteforce",
    "sim_search_lsh",
    "sim_search_multiprobe",
    "sim_search_pq",
    "sim_search_ivfpq",
    "sim_search_ivf",
    "matryoshka_recall",
    "weighted_sample",
    "zipf_slope",
    "tfidf_top_terms",
    "heavy_hitters",
    # semdedup/d4 shared base (VERDICT item 5)
    "semdedup",
    "d4_selection",
    # er pair generation (VERDICT item 6)
    "er_fuzzy_pipeline",
]


def main() -> None:
    when = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(os.path.dirname(__file__), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump_r13_plans_{when}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        if name == "er_fuzzy_pipeline":
            from kafka_streams_dexcom_spark.queries.dedup import (
                er_fuzzy_pairs_pipeline,
            )

            df = er_fuzzy_pairs_pipeline(spark, SF_DIR)
        else:
            df = qs[name](spark, SF_DIR)
        plan = explain_str(df).strip()
        if len(plan) > 120_000:
            plan = plan[:120_000] + f"\n... [truncated of {len(plan)}]"
        p = os.path.join(out_dir, f"{name}_{when}.txt")
        with open(p, "w") as f:
            f.write(plan + "\n")
        print(f"wrote {p} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Dump .explain('formatted') for the round-12 optimization candidates
into plans/r12/<query>_<when>.txt (judge-checkable plan evidence).

Usage: python dump_r12_plans.py before|after [query ...]
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
    "crawl_manifest",
    "stateful_debounce",
    "approx_sketches",
    "ann_recall_matrix",
    "phash_survivors",
    "host_line_dedup",
    "d4_selection",
    "semdedup",
    "source_minhash_jaccard",
    "dominant_suppliers",
    "bm25_rerank",
    "dedup_incremental",
    "numeric_corr",
    "hybrid_search_rrf",
    "matryoshka_recall",
    "multimodal_phash_dct",
    "multimodal_phash_dct_dedup",
    "contamination_semantic",
    "robots_filter",
    "compliance_report",
    "domain_mix",
    "dedup_simhash_pairs",
    "metrics_unpivot",
    "pagerank_centrality",
    "sales_rollup",
    "boilerplate_rewrite",
    "eval_span_scrub",
    "dedup_minhash_lsh",
]


def main() -> None:
    when = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    out_dir = os.path.join(os.path.dirname(__file__), "plans", "r12")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name=f"dump_r12_plans_{when}")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        plan = explain_str(qs[name](spark, SF_DIR)).strip()
        # cap the raw expression spam like dump_plans.py; structure fits
        if len(plan) > 120_000:
            plan = plan[:120_000] + f"\n... [truncated of {len(plan)}]"
        p = os.path.join(out_dir, f"{name}_{when}.txt")
        with open(p, "w") as f:
            f.write(plan + "\n")
        print(f"wrote {p} ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()

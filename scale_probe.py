#!/usr/bin/env python
"""Scaling-linearity probe: run shuffle-bounded queries on sf0.1 and on
a ×10 self-union of it, and report the wall-clock ratio.

A ratio well under 10× on a fixed-size machine means the plan is
fixed-overhead- or throughput-dominated (no super-linear shuffle or
pair blowup) — the profile that scales out linearly when executors grow
with the data. Pair-quadratic operators (dedup_*, sim_*) are excluded
on purpose: a self-union duplicates every row, which inflates their
within-block pair counts ×100 and says nothing about real-data scaling.

Usage: python scale_probe.py [out_dir]  (writes the ×10 copy once,
reuses it on re-runs).
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kafka_streams_dexcom_spark.queries import all_queries  # noqa: E402
from kafka_streams_dexcom_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
PROBE_QUERIES = [
    "filter_high",
    "events_hourly",
    "pricing_summary",
    "interval_join_categorize",
    "funnel_steps",
    "retention_cohorts",
    "value_anomalies",
    "value_histogram",
    "bm25_search",
    "zipf_slope",
    "sequence_packing",
    "corpus_rollup",
    "lang_confusion",
    # round-3 additions, all linear-profile under self-union
    "bm25_freetext",
    "doc_perplexity",
    "late_order_priorities",
    "big_orders",
    "part_value_share",
    "salted_user_stats",
    # round-3 additions with a valid self-union profile. Excluded for the
    # same reason as dedup_*: er_fuzzy_customers (10 copies of every name
    # per pigeonhole bucket → quadratic dist-0 pairs) and every query that
    # JOINS two facts on a shared key (nation_trade_flows, market_share,
    # delay_buckets, customer_order_distribution) — a self-union gives 10
    # copies of each key on BOTH sides, so the join output grows 100×,
    # which real 10× data (10× distinct keys) does not do.
    "product_type_profit",
    "supplier_part_counts",
    "top_supplier_revenue",
    "dominant_suppliers",
    "dup_span_fraction",
    "bpe_pair_stats",
    "bpe_train",
    "forecast_revenue",
    "bm25_rerank",
    "dq_report",
    "cdc_user_state",
    # late-r3 corpus ops: token-linear plans (the self-union makes every
    # doc a 10-way duplicate, which changes span_dedup_rewrite's OUTPUT
    # but not its cost shape — gram rows grow 10×, never quadratically)
    "span_dedup_rewrite",
    "heavy_hitters",
    "source_divergence",
    "gap_fill",
    "gap_fill_linear",
    "token_budget_pack",
    "metrics_unpivot",
    # round-4: dsir_weights is token-linear (doc,feat counts + a
    # bucket-bounded window). The other round-4 queries are excluded as
    # pair-generating shapes (semdedup / dedup_cross_source /
    # cluster_size_histogram / survivor_token_savings /
    # er_customer_golden / cc_incremental_replay all sit on near-dup or
    # fuzzy pair graphs, which a self-union inflates ×100);
    # cc_incremental has its own synthetic corpus-scale probe below.
    "dsir_weights",
    "quality_classifier",
    "scd2_user_state",
    "event_transitions",
    # round-6: bpe_encode is token-linear (the self-union leaves the
    # DISTINCT-word vocab unchanged, so the merge folds cost the same
    # and only the word-count shuffle and doc join grow 10×);
    # value_drift_psi is one binning pass + calendar-bounded joins.
    # dedup_cluster_stats is excluded with the rest of the pair-graph
    # family.
    "bpe_encode",
    "value_drift_psi",
    # round-6 corpus sources: both token-linear over documents — JSONL
    # is one splittable scan + agg; WARC parses one archive per task
    # (×10 docs → ×10 fixture bytes across the same 8 archives, so the
    # probe also exercises the bigger-archive-per-task profile). The
    # min-of-2 timing amortizes the one-time fixture build, mirroring
    # the bench's published-artifact discipline.
    "jsonl_corpus_stats",
    "csv_corpus_stats",
    "gopher_rules",
    "unimax_mix",
    "kneser_ney_lm",
    "kneser_ney_modified",
    "perplexity_buckets",
    "char_entropy",
    "shard_balance",
    "embedding_outliers",
    "audio_wav_stats",
    "video_avi_frames",
    "warc_corpus_stats",
    "warc_optout_filter",
    "webdataset_stats",
    "format_matrix_consistency",
    "time_in_range",
    # round-7: kneser_ney_trigram folds on the trigram TYPE table —
    # the self-union leaves the type vocabulary unchanged, so only the
    # one token-scale count shuffle grows 10×; quarantine_rate is one
    # bounded agg over the epoch-partitioned fixture.
    "kneser_ney_trigram",
    "quarantine_rate",
    # round-8: the unigram-LM family is vocab-bounded like bpe — the
    # self-union leaves the DISTINCT-word table unchanged, so seeding,
    # every EM round, and the Viterbi folds cost the same; only the
    # word-count shuffle (train) and the (doc, word) join (encode)
    # grow 10×.
    "unigram_train",
    "unigram_encode",
    "unigram_fertility",
    # round-9: wordpiece is vocab-bounded like bpe/unigram (training and
    # the greedy walks run on the unchanged DISTINCT-word table; only
    # the word-count shuffle and (doc, word) join grow 10×).
    # boilerplate_rewrite is token-linear like span_dedup_rewrite (the
    # self-union pushes every gram over the doc-frequency floor, which
    # changes the OUTPUT — everything stripped — but gram rows grow 10×,
    # never quadratically). bloom_dedup_screen is row-linear: positions
    # grow 10×, the bit-set distinct is width-bounded, and the audit
    # leg is a semi join (≤1 match per probe row by construction).
    "wordpiece_train",
    "wordpiece_encode",
    "wordpiece_fertility",
    "boilerplate_rewrite",
    "bloom_dedup_screen",
    # round-10: bytebpe is vocab-bounded like the other three tokenizer
    # families. html_quality_gate and dedup_url are token/row-linear
    # (per-doc extraction / canonicalization + a groupBy; no fact-fact
    # join). warc_text_extract and paired_media_audit are EXCLUDED:
    # both join the fixture back to documents on doc_id, and a
    # self-union puts 10 copies of every key on both sides (the
    # nation_trade_flows exclusion class) — their 100x growth would be
    # a probe artifact, not a scaling property.
    "bytebpe_train",
    "bytebpe_encode",
    "bytebpe_fertility",
    "html_quality_gate",
    "dedup_url",
    # round-10 (cont.): host_line_dedup is line-linear like
    # boilerplate_rewrite (a self-union pushes every line over the
    # per-host distinct-doc floor — output changes, but line rows and
    # the census shuffle grow 10×, never quadratically). domain_mix is
    # one row-linear groupBy; epoch_shuffle is row-linear with sorts
    # confined to (epoch, shard) partitions.
    "host_line_dedup",
    "domain_mix",
    "epoch_shuffle",
    # robots_filter joins facts to a |hosts|-bounded broadcast rule
    # table (dim-shaped, stays 1x under self-union); cdc_chunk_dedup
    # is chunk-linear — the census window's per-hash groups grow 10x
    # but total chunk rows grow 10x, never quadratically.
    "robots_filter",
    "cdc_chunk_dedup",
    # eval_span_scrub: the eval gram set is DISTINCT (a x10 self-union
    # leaves it unchanged); train grams and the coverage join grow 10x
    # — token-linear like the other rewrite ops.
    "eval_span_scrub",
    # round-11: compliance_report is the robots broadcast fold + one
    # doc_id hash join of lifted headers — dim-shaped + row-linear.
    # multimodal_phash / video_phash are one Arrow decode pass each,
    # row-linear.
    # (multimodal_phash_dedup / video_phash_dedup / phash_survivors
    # and crawl_manifest are pair-family: a self-union doubles every
    # fingerprint's bucket population / feeds the pair graph — the
    # excluded probe class.)
    "compliance_report",
    "multimodal_phash",
    "audio_phash",
    "video_phash",
]
# Only FACTS are self-unioned ×10. Dimensions stay 1×: real 10× corpora
# grow the fact volume, not the part catalog — and a ×10'd dim puts 10
# copies of every join key in the broadcast side, multiplying join
# output 10× per dim lineage (measured: product_type_profit went ×166
# under a ×10 part+supplier dim — pure self-union artifact).
FACTS = ["orders", "lineitem", "events", "documents", "embeddings"]
DIMS = ["region", "nation", "customer", "supplier", "part"]


def build_x10(spark, out_dir: str) -> None:
    for t in FACTS + DIMS:
        dst = f"{out_dir}/{t}.parquet"
        # require the _SUCCESS marker, not bare dir existence: a
        # partial copy from an interrupted run would otherwise be
        # silently benchmarked forever
        if os.path.exists(f"{dst}/_SUCCESS"):
            continue
        df = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = 10 if t in FACTS else 1
        u = functools.reduce(lambda a, b: a.union(b), [df] * copies)
        u.write.mode("overwrite").parquet(dst)


def timed(fn, spark, sf_dir: str) -> float:
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.time() - t0)
    return round(best, 3)


def main() -> None:
    # usage: scale_probe.py [out_dir [name ...]] — trailing names probe a
    # subset (new-query spot checks without re-timing the whole list)
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/spark_graft_x10"
    subset = sys.argv[2:]
    unknown = set(subset) - set(PROBE_QUERIES)
    if unknown:
        raise SystemExit(f"not in PROBE_QUERIES: {sorted(unknown)}")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    build_x10(spark, out_dir)
    qs = all_queries()
    rows = {}
    for name in subset or PROBE_QUERIES:
        base = timed(qs[name], spark, SRC)
        x10 = timed(qs[name], spark, out_dir)
        ratio = round(x10 / base, 2) if base > 0 else None
        rows[name] = {"sf0.1_s": base, "x10_s": x10, "ratio": ratio}
        print(f"{name:28s} {base:6.2f}s -> {x10:6.2f}s  x{ratio}")
    special = (
        {} if subset else {"cc_incremental": probe_cc_incremental(spark)}
    )
    print(json.dumps({"probe": rows, "special": special}))
    spark.stop()


def probe_cc_incremental(spark) -> dict:
    """Cost ∝ batch, measured: with the old labeling pre-materialized (a
    shared published artifact, not the thing under test), labeling a
    daily batch with cc_incremental must be decisively cheaper than
    re-running connected components over the whole graph — the CC under
    test runs on the CONTRACTED batch-sized graph only, plus one
    broadcast relabel join over the label table.

    The sf0.1 document near-dup graph is only a few hundred edges (both
    paths are fixed-overhead-bound there), so the probe uses a synthetic
    corpus-scale graph: ~1.75M chain edges (chains of 8 → a few CC
    rounds, like real near-dup blobs) plus a 20k-edge daily batch that
    hooks new nodes onto random old ones — deterministic (Knuth-hash
    targets), no data files needed."""
    from pyspark.sql import functions as F

    from kafka_streams_dexcom_spark.operators.graph import (
        cc_incremental,
        connected_components,
    )

    n_nodes, chain, n_batch = 2_000_000, 8, 20_000
    old_pairs = (
        spark.range(n_nodes - 1)
        .where((F.col("id") % chain) != chain - 1)
        .select(
            F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
        )
        .repartition(32)
        .localCheckpoint()
    )
    new_pairs = (
        spark.range(n_batch)
        .select(
            (F.col("id") + n_nodes).alias("doc_a"),
            ((F.col("id") * 2654435761) % n_nodes).alias("doc_b"),
        )
        .localCheckpoint()
    )
    pairs = old_pairs.union(new_pairs).localCheckpoint()
    old_labels = connected_components(old_pairs).localCheckpoint()

    def run(fn):
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            fn().write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
        return round(best, 3)

    full_s = run(lambda: connected_components(pairs))
    incr_s = run(lambda: cc_incremental(new_pairs, old_labels))
    out = {
        "full_cc_s": full_s,
        "incremental_s": incr_s,
        "ratio": round(incr_s / full_s, 2) if full_s else None,
        "edges_total": pairs.count(),
        "edges_batch": new_pairs.count(),
    }
    print(
        f"cc_incremental: full CC {full_s}s vs incremental {incr_s}s "
        f"(batch {out['edges_batch']}/{out['edges_total']} edges)"
    )
    return out


if __name__ == "__main__":
    main()

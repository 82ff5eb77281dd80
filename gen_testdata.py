"""Generate TPC-H-ish synthetic testdata above the driver-provided
scales, schema- and domain-compatible with /root/testdata/sf* (see
TESTDATA.md). The driver ships sf0.001/0.01/0.1 read-only; scale-up
evidence (the 100-TB question asked at 10x bench scale) needs sf1+,
which this script builds under ./testdata/ (gitignored).

Faithful to the driver tables in everything queries depend on:
  - identical column names and Arrow types (incl. list<float32>
    embeddings, timestamp[us] dates),
  - identical value domains (region/nation names, mktsegments, order
    status/priority strings, p_type/p_brand sets, 1995-2001 date
    ranges, events Jan-2024 window, props='{"k": 0..99}', 20 sources,
    5 langs, unit-norm 64-dim embeddings with cluster labels),
  - REALISTIC shape growth above sf0.1 (round 12): embedding cluster
    count scales linearly with sf (per-cluster population constant)
    and the document vocabulary grows as sqrt(sf) per Heaps' law with
    the stopword-marker mass preserved — holding both constant packed
    100x rows into the same blocks and exploded pair volume ~10,000x,
    which excluded the whole near-dup/CC family from the sf10 gate
    (SF10_PARITY.json r11). At sf <= 0.1 the shape is exactly the
    driver's (10 clusters, uniform 30-word vocab),
  - the planted structure the curation queries exercise: exact +
    near-duplicate documents (the near-dups perturb a few words to
    'dup', matching the sf0.1 marker token) and clusterable
    embeddings.

Row counts scale linearly from sf0.1 (customer 15k, supplier 1k, part
20k, orders 150k, lineitem ~600k, events 100k, documents 5k,
embeddings 2k per 0.1 sf).

Usage: python gen_testdata.py [sf] [outdir]   (defaults: 1 ./testdata/sf1)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

VOCAB = (
    "spark window merge table column vector stream value data small "
    "join filter big group hash customer sort order slow line part "
    "fast the row agg key query a scan batch"
).split()
# The two Gopher stopword markers in the driver vocab (LANG_MARKERS
# overlap) — their per-position probability (1/30 each) is preserved at
# EVERY sf so quality-gate behavior matches the driver corpus, while
# the non-marker vocabulary grows with corpus size (below).
MARKERS = ("the", "a")
REST_BASE = [w for w in VOCAB if w not in MARKERS]  # 28 words
# syllables for deterministic synthetic vocabulary growth (word shapes
# stay 4-6 chars so the Gopher mean-word-length rule keeps its profile)
_SYL = (
    "ba de fi go hu ka le mi no pu ra se ti vo wu za ce dy fo gi "
    "he ju ko lu"
).split()


def rest_vocab(n: int) -> list[str]:
    """The non-marker vocabulary at size ``n``: the 28 driver words
    first, then deterministic 2- and 3-syllable pseudo-words. Growing
    the vocab with corpus size is Heaps' law (V ∝ N^0.5) — the r11
    sf10 corpus held V at 30, which packed 100x the documents into the
    same shingle space and exploded within-bucket pair volume ~10,000x
    (SF10_PARITY.json exclusion class); real 100x corpora add vocab."""
    out = list(REST_BASE)
    i = 0
    while len(out) < n:
        a, b, c = i % 24, (i // 24) % 24, i // 576
        w = _SYL[a] + _SYL[b] + (_SYL[c % 24] if c else "")
        if w not in out:
            out.append(w)
        i += 1
    return out[:n]


def scaled_shape(sf: float) -> tuple[int, int]:
    """(embedding clusters, non-marker vocab size) at scale ``sf``.
    At sf <= 0.1 (driver scales) both match the driver corpus exactly
    (10 clusters, 28 non-marker words -> the uniform-30 draw). Above
    that, clusters grow LINEARLY (real corpus growth adds topics, so
    per-cluster population stays ~200 vectors) and vocabulary grows as
    sqrt (Heaps' law), keeping docs-per-shingle roughly constant."""
    rel = max(1.0, sf / 0.1)
    return int(round(10 * rel)), int(round(28 * rel ** 0.5))
REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
P_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
P_ADJ = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
P_NOUN = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
LANGS = ["en", "de", "fr", "es", "zh"]
DAY_US = 86_400_000_000


def _ts_array(us: np.ndarray) -> pa.Array:
    return pa.Array.from_pandas(us.astype("datetime64[us]"))


def _write(out: str, name: str, table: pa.Table) -> None:
    pq.write_table(table, os.path.join(out, f"{name}.parquet"))
    print(f"  {name}: {table.num_rows} rows")


def generate(sf: float, out: str, seed: int = 42) -> None:
    os.makedirs(out, exist_ok=True)
    rng = np.random.default_rng(seed)
    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_evt = int(1_000_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(20_000 * sf)

    _write(out, "region", pa.table({
        "r_regionkey": pa.array(range(5), pa.int32()),
        "r_name": REGIONS,
    }))
    _write(out, "nation", pa.table({
        "n_nationkey": pa.array(range(25), pa.int32()),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
    }))
    _write(out, "customer", pa.table({
        "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
        "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
        "c_mktsegment": pa.array(
            np.array(SEGMENTS)[rng.integers(0, 5, n_cust)]
        ),
    }))
    _write(out, "supplier", pa.table({
        "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
        "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
    }))
    _write(out, "part", pa.table({
        "p_partkey": pa.array(np.arange(n_part), pa.int64()),
        "p_name": [
            f"{P_ADJ[a]} {P_NOUN[b]}"
            for a, b in zip(
                rng.integers(0, 8, n_part), rng.integers(0, 8, n_part)
            )
        ],
        "p_brand": pa.array(
            [f"Brand#{int(b)}" for b in rng.integers(1, 26, n_part)]
        ),
        "p_type": pa.array(np.array(P_TYPES)[rng.integers(0, 6, n_part)]),
        "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
        "p_retailprice": np.round(
            900.0 + (np.arange(n_part) % 1000) * 0.1, 2
        ),
    }))

    # orders: 1995-01-01 .. 2001-08-01 (the driver's observed window)
    o_base = np.datetime64("1995-01-01", "us").astype(np.int64)
    o_span = (np.datetime64("2001-08-01", "us").astype(np.int64) - o_base)
    o_date_us = o_base + (rng.random(n_ord) * o_span).astype(np.int64)
    o_date_us = (o_date_us // DAY_US) * DAY_US  # midnight-aligned
    _write(out, "orders", pa.table({
        "o_orderkey": pa.array(np.arange(n_ord), pa.int64()),
        "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
        "o_orderstatus": pa.array(
            np.array(["O", "F", "P"])[
                rng.choice(3, n_ord, p=[0.49, 0.49, 0.02])
            ]
        ),
        "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
        "o_orderdate": _ts_array(o_date_us),
        "o_orderpriority": pa.array(
            np.array(PRIORITIES)[rng.integers(0, 5, n_ord)]
        ),
    }))

    # lineitem: 1..7 lines per order, avg ~4 — draw counts then expand
    lines_per = rng.integers(1, 8, n_ord)
    l_orderkey = np.repeat(np.arange(n_ord), lines_per)
    n_li = len(l_orderkey)
    l_linenumber = (
        np.arange(n_li) - np.repeat(np.cumsum(lines_per) - lines_per,
                                    lines_per) + 1
    )
    # l_shipdate is INDEPENDENT of the order date (driver property:
    # observed lag spans -2399..+2496 days, median ~47) — a lag-coupled
    # shipdate would zero out the late-order query family (Q4 shapes
    # filter on lag > 365 days)
    s_base = np.datetime64("1995-01-02", "us").astype(np.int64)
    s_span = np.datetime64("2001-11-04", "us").astype(np.int64) - s_base
    l_ship_us = s_base + (rng.random(n_li) * s_span).astype(np.int64)
    l_ship_us = (l_ship_us // DAY_US) * DAY_US
    qty = rng.integers(1, 51, n_li).astype(np.float64)
    price = np.round(
        qty * (900.0 + (rng.integers(0, n_part, n_li) % 1000) * 0.1 + 1)
        * rng.uniform(0.9, 1.1, n_li),
        2,
    )
    _write(out, "lineitem", pa.table({
        "l_orderkey": pa.array(l_orderkey, pa.int64()),
        "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
        "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
        "l_linenumber": pa.array(l_linenumber, pa.int32()),
        "l_quantity": qty,
        "l_extendedprice": np.clip(price, 900.0, 105_000.0),
        "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
        "l_returnflag": pa.array(
            np.array(["A", "N", "R"])[rng.integers(0, 3, n_li)]
        ),
        "l_linestatus": pa.array(
            np.array(["O", "F"])[rng.integers(0, 2, n_li)]
        ),
        "l_shipdate": _ts_array(l_ship_us),
    }))

    # events: Jan 2024, ts-sorted, sequential ids, exponential values
    e_base = np.datetime64("2024-01-01", "us").astype(np.int64)
    e_us = np.sort(
        e_base + (rng.random(n_evt) * 30 * DAY_US).astype(np.int64)
    )
    _write(out, "events", pa.table({
        "event_id": pa.array(np.arange(n_evt), pa.int64()),
        "ts": _ts_array(e_us),
        "user_id": pa.array(
            rng.integers(0, max(int(n_evt * 0.015), 10), n_evt), pa.int64()
        ),
        "event_type": pa.array(
            np.array(EVENT_TYPES)[rng.integers(0, 5, n_evt)]
        ),
        "value": np.round(rng.exponential(50.0, n_evt), 2),
        "props": [
            json.dumps({"k": int(k)}) for k in rng.integers(0, 100, n_evt)
        ],
    }))

    # documents: scaled vocab (see scaled_shape), 8..100 words, ~1%
    # exact dups, ~4% near-dups (a few words flipped to the 'dup'
    # marker token). Each position: 2/30 marker ('the'/'a', matching
    # the driver corpus at every sf), else uniform over the scaled
    # non-marker vocab.
    n_clusters, v_rest = scaled_shape(sf)
    rest = np.array(rest_vocab(v_rest))
    markers = np.array(MARKERS)
    n_base = int(n_doc * 0.95)
    lens = rng.integers(8, 101, n_base)

    def _doc_words(ln: int) -> np.ndarray:
        base_idx = rng.integers(0, 30, ln)
        rest_idx = rng.integers(0, v_rest, ln)
        return np.where(
            base_idx < 2, markers[np.minimum(base_idx, 1)], rest[rest_idx]
        )

    texts = [" ".join(_doc_words(ln)) for ln in lens]
    for _ in range(n_doc - n_base):
        src = int(rng.integers(0, n_base))
        if rng.random() < 0.25:  # exact duplicate
            texts.append(texts[src])
        else:  # near duplicate: perturb ~2 words
            words = texts[src].split()
            for _k in range(min(2, len(words))):
                words[int(rng.integers(0, len(words)))] = "dup"
            texts.append(" ".join(words))
    order = rng.permutation(n_doc)
    texts = [texts[i] for i in order]
    _write(out, "documents", pa.table({
        "doc_id": pa.array(np.arange(n_doc), pa.int64()),
        "text": texts,
        "lang": pa.array(
            np.array(LANGS)[
                rng.choice(5, n_doc, p=[0.41, 0.1475, 0.1475, 0.1475, 0.1475])
            ]
        ),
        "source": [f"src{i % 20}" for i in range(n_doc)],
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    }))

    # embeddings: gaussian clusters on the unit sphere, dim 64; the
    # cluster count scales linearly with sf (scaled_shape) so
    # per-cluster population stays ~200 vectors at every scale — real
    # corpus growth adds topics, it does not multiply each topic's
    # population 100x
    dim, k = 64, n_clusters
    centers = rng.normal(0, 1, (k, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    label = rng.integers(0, k, n_emb)
    vec = centers[label] * 2.0 + rng.normal(0, 0.6, (n_emb, dim))
    vec /= np.linalg.norm(vec, axis=1, keepdims=True)
    flat = pa.array(vec.astype(np.float32).ravel(), pa.float32())
    _write(out, "embeddings", pa.Table.from_arrays(
        [
            pa.array(np.arange(n_emb), pa.int64()),
            pa.FixedSizeListArray.from_arrays(flat, dim).cast(
                pa.list_(pa.float32())
            ),
            pa.array(label, pa.int32()),
        ],
        names=["vec_id", "embedding", "label"],
    ))


if __name__ == "__main__":
    sf = float(sys.argv[1]) if len(sys.argv) > 1 else 1.0
    out = sys.argv[2] if len(sys.argv) > 2 else f"testdata/sf{sys.argv[1] if len(sys.argv) > 1 else '1'}"
    print(f"generating sf={sf} under {out}")
    generate(sf, out)

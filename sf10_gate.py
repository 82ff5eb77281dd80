#!/usr/bin/env python
"""The 100x parity gate: every registered query whose shape survives the
synthetic sf10 corpus runs against its DuckDB oracle at 100x the
driver's bench scale (60M lineitem / 10M events / 500k docs / 200k
embeddings), extending r7's 12-query spot check to the full fact-bound
registry.

Round 12 removed the r7-r11 pair-graph exclusion class: gen_testdata
now grows embedding clusters linearly and vocabulary as sqrt(sf)
(Heaps' law) above sf0.1, and the trained quantizer sizes nlist with
the corpus, so the near-dup/CC family's candidate volume scales
linearly like a real corpus and gates here. Remaining exclusions (the
ER pair family's name-format artifact + the deliberate Python
slow-path twin) carry measured reasons below.

Results append to SF10_PARITY.jsonl as they land (a crash preserves
progress; pass remaining names as argv to resume) and aggregate into
SF10_PARITY.json. Usage:

    SPARK_GRAFT_DRIVER_MEM=48g python sf10_gate.py [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from __spark_entry__ import oracle_sql, queries  # noqa: E402
from check_parity import vanilla_spark  # noqa: E402
from tests.compare import compare, duckdb_con  # noqa: E402

SF10 = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                    "testdata", "sf10")
JSONL = "SF10_PARITY.jsonl"
OUT = "SF10_PARITY.json"

# Round 12: the r11 pair-graph exclusion class is GONE — gen_testdata
# now scales embedding cluster count linearly and document vocabulary
# as sqrt(sf) (Heaps' law), and the trained quantizer sizes nlist with
# the corpus (queries/similarity.kmeans_k_for), so within-block pair
# volume grows linearly with sf like a real corpus. The whole near-dup/
# CC family gates here now. Only the ER pair family keeps a measured
# exclusion:
_ER = (
    "TPC-H name-format artifact, measured: c_name is 'Customer#%09d' "
    "over sequential ids, so at sf10 the corpus contains EXACTLY "
    "39,750,000 Levenshtein<=1 name pairs (53 neighbors per record on "
    "average — every one-digit substitution of a live id is another "
    "live id). The engine's pigeonhole blocking handles it, but the "
    "declared oracle is the EXHAUSTIVE within-block self-join "
    "(25 blocks x 60k^2 = 4.5e10 levenshtein evals, deliberately "
    "quadratic to prove the blocking lossless) and the compare harness "
    "would hash 2 x 39.75M result rows; real registries do not have "
    "53-fold dist-1 ambiguity per record. Gated at sf1 "
    "(3.3M pairs at 150k records)."
)
EXCLUDED: dict[str, str] = {
    "er_fuzzy_customers": _ER,
    "er_customer_golden": _ER,
    "doc_chunks_udtf": (
        "deliberate row-at-a-time Python slow-path twin (API-surface "
        "demonstrator); the codegen doc_chunks IS gated here"
    ),
}

# Oracle-less queries that LEGITIMATELY return zero rows at sf10 (the
# rows-only smoke check would otherwise flag them): name -> reason.
# Currently empty — every registered query has an oracle — but the
# annotation exists so a future zero-row smoke query is declared, not
# special-cased (ADVICE r8).
EXPECTED_EMPTY: dict[str, str] = {}


def main() -> int:
    only = sys.argv[1:]
    qs, oracles = queries(), oracle_sql()
    # Reconciliation (r8 lesson: warc_optout_filter silently ungated):
    # every exclusion must name a live query, and eligible + excluded
    # must account for the whole registry — fail loudly on drift.
    stale = sorted(n for n in EXCLUDED if n not in qs)
    if stale:
        print(f"EXCLUDED names not in the registry: {stale}")
        return 2
    names = [n for n in qs if n not in EXCLUDED]
    assert len(names) + len(EXCLUDED) == len(qs), (
        f"gate accounting drift: {len(names)} eligible + "
        f"{len(EXCLUDED)} excluded != {len(qs)} registered"
    )
    if only:
        unknown = sorted(set(only) - set(names))
        if unknown:
            print(f"argv names not gate-eligible: {unknown}")
            return 2
        names = [n for n in names if n in only]
    print(f"{len(names)} queries to gate at sf10 "
          f"({len(EXCLUDED)} excluded by data shape)")
    spark = vanilla_spark()
    failed = []
    with open(JSONL, "a") as log:
        for i, name in enumerate(names, 1):
            t0 = time.time()
            try:
                if name in oracles:
                    # FRESH connection per query (round 12): DuckDB
                    # retains its buffer pool up to memory_limit across
                    # queries and lambda-heavy replays carry untracked
                    # vector memory on top — the accumulated footprint
                    # plus the resident Spark JVM OOM-killed the r12
                    # first run at query 2; a per-query connection
                    # returns the pool between replays for the cost of
                    # re-registering ten views
                    con = duckdb_con(SF10)
                    res = compare(qs[name](spark, SF10), con, oracles[name])
                    con.close()
                    ok = res["values_match"] and res["types_match"]
                    row = {"name": name, "ok": ok,
                           "rows": res["spark_rows"],
                           "secs": round(time.time() - t0, 2)}
                    if not ok:
                        row["detail"] = {
                            k: v for k, v in res.items()
                            if k != "first_mismatches"
                        }
                else:
                    n = qs[name](spark, SF10).count()
                    ok = n > 0 or name in EXPECTED_EMPTY
                    row = {"name": name, "ok": ok, "rows": n,
                           "rows_only": True,
                           "secs": round(time.time() - t0, 2)}
                    if name in EXPECTED_EMPTY:
                        row["expected_empty"] = EXPECTED_EMPTY[name]
            except Exception as exc:  # noqa: BLE001
                ok = False
                row = {"name": name, "ok": False,
                       "error": f"{type(exc).__name__}: {exc}"[:500],
                       "secs": round(time.time() - t0, 2)}
            log.write(json.dumps(row) + "\n")
            log.flush()
            print(f"[{i}/{len(names)}] {'PASS' if ok else 'FAIL'} "
                  f"{name:32s} {row['secs']:8.2f}s", flush=True)
            if not ok:
                failed.append(name)
    # aggregate: start from the committed aggregate's rows (the jsonl
    # is gitignored scratch, so a fresh workspace otherwise forgets
    # every prior round's gate evidence — the r9 lesson, where a
    # 7-query resume run silently shrank the 147-row record to 7),
    # then overlay this workspace's jsonl (last wins).
    rows: dict[str, dict] = {}
    if os.path.exists(OUT):
        with open(OUT) as f:
            rows.update(json.load(f).get("results", {}))
    with open(JSONL) as f:
        for line in f:
            r = json.loads(line)
            rows[r["name"]] = r
    # drop rows for queries no longer registered (renames) — stale
    # evidence must not pad the denominator
    rows = {n: r for n, r in rows.items() if n in qs}
    eligible = [n for n in qs if n not in EXCLUDED]
    missing = sorted(set(eligible) - set(rows))
    parity = [r for r in rows.values() if not r.get("rows_only")]
    smoke = [r for r in rows.values() if r.get("rows_only")]
    summary = {
        "sf_dir": SF10,
        "registered": len(qs),
        "eligible": len(eligible),
        "gated": len(rows),
        # value-parity (oracle compare) vs rows-only smoke reported
        # SEPARATELY — the two checks are not equivalent (ADVICE r8)
        "parity_pass": sum(1 for r in parity if r["ok"]),
        "parity_gated": len(parity),
        "smoke_pass": sum(1 for r in smoke if r["ok"]),
        "smoke_gated": len(smoke),
        "pass": sum(1 for r in rows.values() if r["ok"]),
        # eligible queries with NO recorded row: a non-empty list means
        # the gate is INCOMPLETE and the top-line claim must say so
        "missing": missing,
        "excluded": EXCLUDED,
        "results": rows,
    }
    with open(OUT, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"\n{summary['parity_pass']}/{summary['parity_gated']} parity + "
        f"{summary['smoke_pass']}/{summary['smoke_gated']} rows-only pass "
        f"of {summary['eligible']} eligible -> {OUT}"
    )
    if missing:
        print(f"INCOMPLETE: {len(missing)} eligible queries ungated: "
              f"{missing}")
    return 1 if failed or missing else 0


if __name__ == "__main__":
    raise SystemExit(main())

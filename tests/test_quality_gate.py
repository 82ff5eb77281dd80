"""Streaming curation gate (streaming/quality_gate.py): the three-way
corrupt/rejected/accepted routing must land EXACTLY the batch
partition of the same files — corrupt split by the PERMISSIVE parse,
valid rows gated by gopher_rules."""

from __future__ import annotations

from pyspark.sql import types as T

from kafka_streams_dexcom_spark.operators.text import gopher_rules
from kafka_streams_dexcom_spark.sources import corpus as cs
from kafka_streams_dexcom_spark.streaming.quality_gate import (
    curation_gate_writer,
)

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _passing_text() -> str:
    return "the a of and is " + " ".join(f"word{i}" for i in range(50))


def test_stream_gate_matches_batch_partition(spark, tmp_path):
    import json

    src = tmp_path / "in"
    src.mkdir()
    good = _passing_text()
    (src / "a.jsonl").write_text(
        json.dumps({"doc_id": 1, "text": good})
        + "\n{not json at all\n"
        + json.dumps({"doc_id": 2, "text": "too short to keep"})
        + "\n"
    )
    (src / "b.jsonl").write_text(
        json.dumps({"doc_id": 3, "text": good + " extra"})
        + "\n"
        + json.dumps({"doc_id": "bad-type", "text": "x"})
        + "\n"
    )

    # batch expectation: same reader, same split, same gate
    raw = cs.read_jsonl(spark, str(src), DOC_SCHEMA)
    valid, quar = cs.split_quarantine(raw)
    flags = {r.doc_id: r.keep for r in gopher_rules(valid).collect()}
    want_accept = sorted(d for d, k in flags.items() if k == 1)
    want_reject = sorted(d for d, k in flags.items() if k == 0)
    want_quar = sorted(r.raw_line for r in quar.collect())
    assert want_accept == [1, 3] and want_reject == [2]
    assert len(want_quar) == 2

    got_accept: list = []
    got_reject: list = []
    got_quar: list = []
    schemas: list = []
    sink = curation_gate_writer(
        lambda df, bid: (
            schemas.append(tuple(df.columns)),
            got_accept.extend(r.doc_id for r in df.collect()),
        ),
        lambda df, bid: got_reject.extend(r.doc_id for r in df.collect()),
        lambda df, bid: got_quar.extend(r.raw_line for r in df.collect()),
    )
    q = (
        cs.read_jsonl_stream(
            spark, str(src), DOC_SCHEMA, max_files_per_trigger=1
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert sorted(got_accept) == want_accept
    assert sorted(got_reject) == want_reject
    assert sorted(got_quar) == want_quar
    # accepted rows come back in the SOURCE schema (flags dropped)
    assert set(schemas) == {("doc_id", "text")}


def test_quarantine_burst_fires_rate_alarm(spark, tmp_path):
    """The gate's quarantine sink, accumulated per batch-epoch, must
    trip operators/dq.quarantine_rate_alarm exactly on a planted
    corrupt BURST epoch — a format break upstream — while epochs with
    the baseline trickle stay quiet."""
    import json

    from pyspark.sql import functions as F

    from kafka_streams_dexcom_spark.operators.dq import (
        quarantine_rate_alarm,
    )

    src = tmp_path / "in"
    src.mkdir()
    good = _passing_text()
    # 4 single-file epochs x 40 docs; epoch 2 is the incident: 10
    # corrupt lines (producer format break) vs <=1 elsewhere
    for epoch in range(4):
        lines = [
            json.dumps({"doc_id": epoch * 100 + i, "text": good})
            for i in range(40)
        ]
        if epoch == 2:
            lines += ["{broken" for _ in range(10)]
        elif epoch == 0:
            lines += ["{broken"]
        (src / f"e{epoch}.jsonl").write_text("\n".join(lines) + "\n")

    rows: list = []
    sink = curation_gate_writer(
        lambda df, bid: rows.extend(
            {"epoch": bid, "corrupt": None} for _ in range(df.count())
        ),
        lambda df, bid: rows.extend(
            {"epoch": bid, "corrupt": None} for _ in range(df.count())
        ),
        lambda df, bid: rows.extend(
            {"epoch": bid, "corrupt": r.raw_line} for r in df.collect()
        ),
    )
    q = (
        cs.read_jsonl_stream(
            spark, str(src), DOC_SCHEMA, max_files_per_trigger=1
        )
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    ledger = spark.createDataFrame(
        [(r["epoch"], r["corrupt"]) for r in rows],
        "epoch int, _corrupt_record string",
    )
    got = {
        r.epoch: (r.n_rows, r.n_quarantined, r.alarm)
        for r in quarantine_rate_alarm(ledger).collect()
    }
    assert len(got) == 4
    burst_epochs = [e for e, (_n, _q, a) in got.items() if a == 1]
    assert len(burst_epochs) == 1
    n, nq, _ = got[burst_epochs[0]]
    assert (n, nq) == (50, 10)
    # the baseline-trickle epoch counted its line but stayed quiet
    assert sorted(v[1] for v in got.values()) == [0, 0, 1, 10]


def test_quarantine_alarm_from_counts_matches_raw_path(spark):
    """quarantine_alarm_from_counts over pre-aggregated per-epoch
    counts must reproduce quarantine_rate_alarm over the raw rows
    row-for-row — the streaming monitor and the batch query share one
    alarm rule by construction."""
    from kafka_streams_dexcom_spark.operators.dq import (
        quarantine_alarm_from_counts,
        quarantine_rate_alarm,
    )

    raw_rows = []
    counts = []
    for epoch, (n, nq) in enumerate([(40, 1), (40, 0), (50, 10), (40, 0)]):
        raw_rows += [(epoch, "bad") for _ in range(nq)]
        raw_rows += [(epoch, None) for _ in range(n - nq)]
        counts.append((epoch, n, nq))
    raw = spark.createDataFrame(
        raw_rows, "epoch int, _corrupt_record string"
    )
    per = spark.createDataFrame(
        counts, "epoch int, n_rows bigint, n_quarantined bigint"
    )
    want = sorted(map(tuple, quarantine_rate_alarm(raw).collect()))
    got = sorted(map(tuple, quarantine_alarm_from_counts(per).collect()))
    assert got == want
    assert [r[4] for r in got] == [0, 0, 1, 0]

"""Corpus file-format sources (sources/corpus.py): the vendored WARC
codec's golden bytes and edge cases, the gzip multi-member path, the
JSONL quarantine split, and both Spark readers end-to-end."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_streams_dexcom_spark.sources import corpus as cs


def _resp_record(doc_id: int, body: bytes, status: int = 200) -> bytes:
    return cs.warc_record_bytes(
        "response",
        {
            "WARC-Record-ID": f"<urn:resp:{doc_id}>",
            "WARC-Date": "2026-01-01T00:00:00Z",
            "WARC-Target-URI": f"https://ex.example/doc/{doc_id}",
            "Content-Type": "application/http;msgtype=response",
        },
        cs.http_response_bytes(body, status=status),
    )


class TestWarcCodec:
    def test_golden_record_bytes(self):
        # hand-derived golden: header block CRLF-framed, exact
        # Content-Length, double-CRLF terminator
        rec = cs.warc_record_bytes(
            "warcinfo",
            {"WARC-Record-ID": "<urn:x:1>"},
            b"hi",
        )
        assert rec == (
            b"WARC/1.0\r\n"
            b"WARC-Type: warcinfo\r\n"
            b"WARC-Record-ID: <urn:x:1>\r\n"
            b"Content-Length: 2\r\n"
            b"\r\n"
            b"hi\r\n\r\n"
        )

    def test_roundtrip_fields(self):
        data = _resp_record(7, b"hello world") + cs.warc_record_bytes(
            "request",
            {"WARC-Target-URI": "https://ex.example/doc/7"},
            b"GET / HTTP/1.1\r\n\r\n",
        )
        recs = list(cs.iter_warc_records(data))
        assert [h["warc-type"] for h, _ in recs] == ["response", "request"]
        h, payload = recs[0]
        assert h["warc-target-uri"] == "https://ex.example/doc/7"
        status, ctype, body = cs.parse_http_response(payload)
        assert (status, body) == (200, b"hello world")
        assert ctype.startswith("text/plain")

    def test_payload_containing_crlf_separators(self):
        # Content-Length framing must win over separator scanning: a
        # body embedding the record separator parses intact
        body = b"a\r\n\r\nWARC/1.0\r\n\r\nb"
        recs = list(cs.iter_warc_records(_resp_record(1, body)))
        assert len(recs) == 1
        _, _, got = cs.parse_http_response(recs[0][1])
        assert got == body

    def test_truncated_stream_raises(self):
        rec = _resp_record(1, b"hello")
        with pytest.raises(ValueError, match="truncated"):
            list(cs.iter_warc_records(rec[: len(rec) - 12]))

    def test_bad_version_line_raises(self):
        with pytest.raises(ValueError, match="version"):
            list(cs.iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))

    def test_http_parse_non_200_and_headerless(self):
        status, _, body = cs.parse_http_response(
            cs.http_response_bytes(b"gone", status=404)
        )
        assert (status, body) == (404, b"gone")
        # payload with no header separator falls through raw
        status, ctype, body = cs.parse_http_response(b"rawbytes")
        assert (status, ctype, body) == (0, None, b"rawbytes")


class TestWarcSparkReader:
    def test_gzip_members_and_type_lifting(self, spark, tmp_path):
        # Common Crawl layout: one gzip member per record
        recs = [
            cs.warc_record_bytes("warcinfo", {}, b"fixture\r\n"),
            _resp_record(1, "héllo".encode("utf-8")),
            _resp_record(2, b"plain", status=404),
        ]
        gz = b"".join(gzip.compress(r, mtime=0) for r in recs)
        (tmp_path / "a.warc.gz").write_bytes(gz)
        # plain (uncompressed) twin in the same directory
        (tmp_path / "b.warc").write_bytes(b"".join(recs))

        df = cs.read_warc(spark, str(tmp_path / "*.warc*"))
        rows = df.orderBy("warc_file", "target_uri").collect()
        assert [r.warc_type for r in rows].count("response") == 4
        resp = [r for r in rows if r.warc_type == "response"]
        # HTTP head split off: payload is the BODY, status/ctype lifted
        assert {bytes(r.payload) for r in resp} == {
            "héllo".encode("utf-8"),
            b"plain",
        }
        assert {r.http_status for r in resp} == {200, 404}
        info = [r for r in rows if r.warc_type == "warcinfo"]
        assert all(r.http_status is None for r in info)
        assert all(bytes(r.payload) == b"fixture\r\n" for r in info)


JSONL_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("s", T.StringType()),
    ]
)


class TestJsonlQuarantine:
    def test_split_and_value_fidelity(self, spark, tmp_path):
        lines = [
            '{"id": 9007199254740993, "s": "big int64 stays exact"}',
            '{"id": 2, "s": "ünïcode"}',
            '{"id": 3}',
            '{"id": "oops", "s": "bad type"}',
            "not json at all",
        ]
        (tmp_path / "part-0.jsonl").write_text("\n".join(lines) + "\n")
        raw = cs.read_jsonl(spark, str(tmp_path), JSONL_SCHEMA)
        valid, quarantine = cs.split_quarantine(raw)
        got = {r.id: r.s for r in valid.collect()}
        # int64 beyond double precision round-trips exactly; missing
        # field is NULL, not corrupt
        assert got == {
            9007199254740993: "big int64 stays exact",
            2: "ünïcode",
            3: None,
        }
        bad = sorted(r.raw_line for r in quarantine.collect())
        assert bad == ["not json at all", '{"id": "oops", "s": "bad type"}']

    def test_schema_clash_raises(self, spark, tmp_path):
        clash = T.StructType([T.StructField(cs.CORRUPT_COL, T.StringType())])
        with pytest.raises(ValueError, match="_corrupt_record"):
            cs.read_jsonl(spark, str(tmp_path), clash)


class TestCsvQuarantine:
    def test_quoting_nulls_and_malformed(self, spark, tmp_path):
        lines = [
            '1,"has, comma and ""quote"""',
            "2,",  # unquoted empty → NULL
            '3,""',  # quoted empty → empty string
            "4,\\N",  # null sentinel → NULL
            '5,"\\N"',  # sentinel matches even quoted (documented)
            "not_a_number,oops",  # bad type → quarantine
            "6,too,many,cols",  # wrong arity → quarantine
        ]
        (tmp_path / "part-0.csv").write_text("\n".join(lines) + "\n")
        raw = cs.read_csv(spark, str(tmp_path), JSONL_SCHEMA)
        valid, quarantine = cs.split_quarantine(raw)
        got = {r.id: r.s for r in valid.collect()}
        assert got == {
            1: 'has, comma and "quote"',
            2: None,
            3: "",
            4: None,
            5: None,
        }
        bad = sorted(r.raw_line for r in quarantine.collect())
        assert bad == ["6,too,many,cols", "not_a_number,oops"]

    def test_write_read_round_trip_preserves_null_vs_empty(
        self, spark, tmp_path
    ):
        src = spark.createDataFrame(
            [(1, 'a "quoted", str'), (2, None), (3, "")],
            schema=JSONL_SCHEMA,
        )
        out = str(tmp_path / "rt")
        cs.write_csv(src, out)
        back = cs.read_csv(spark, out, JSONL_SCHEMA)
        valid, quarantine = cs.split_quarantine(back)
        assert quarantine.count() == 0
        got = {r.id: r.s for r in valid.collect()}
        assert got == {1: 'a "quoted", str', 2: None, 3: ""}

    def test_csv_corpus_stats_counts(self, spark, sf_dir):
        from kafka_streams_dexcom_spark.queries.corpus import (
            N_CSV_CORRUPT_LINES,
            q_csv_corpus_stats,
        )

        out = q_csv_corpus_stats(spark, sf_dir)
        rows = out.collect()
        exact = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .count()
        )
        assert sum(r.n_docs for r in rows) == exact
        assert {r.n_quarantined for r in rows} == {N_CSV_CORRUPT_LINES}


class TestJsonlStream:
    def test_batch_stream_equivalence_with_quarantine(self, spark, tmp_path):
        """The streaming reader + per-epoch quarantine split must land
        EXACTLY the batch reader's valid/quarantine partition of the
        same files (the engine's batch≡stream discipline)."""
        src = tmp_path / "in"
        src.mkdir()
        (src / "a.jsonl").write_text(
            '{"id": 1, "s": "x"}\nnot json\n{"id": 2, "s": "y"}\n'
        )
        (src / "b.jsonl").write_text('{"id": "bad"}\n{"id": 3, "s": "z"}\n')

        raw = cs.read_jsonl(spark, str(src), JSONL_SCHEMA)
        bvalid, bquar = cs.split_quarantine(raw)
        want_valid = sorted((r.id, r.s) for r in bvalid.collect())
        want_quar = sorted(r.raw_line for r in bquar.collect())

        got_valid: list = []
        got_quar: list = []
        stream = cs.read_jsonl_stream(
            spark, str(src), JSONL_SCHEMA, max_files_per_trigger=1
        )
        sink = cs.jsonl_quarantine_writer(
            lambda df, bid: got_valid.extend(
                (r.id, r.s) for r in df.collect()
            ),
            lambda df, bid: got_quar.extend(
                r.raw_line for r in df.collect()
            ),
        )
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert sorted(got_valid) == want_valid == [(1, "x"), (2, "y"), (3, "z")]
        assert sorted(got_quar) == want_quar
        assert len(want_quar) == 2


class TestRegisteredQueries:
    def test_jsonl_corpus_stats_counts(self, spark, sf_dir):
        from kafka_streams_dexcom_spark.queries.corpus import (
            N_CORRUPT_LINES,
            q_jsonl_corpus_stats,
        )

        out = q_jsonl_corpus_stats(spark, sf_dir)
        rows = out.collect()
        n_docs = sum(r.n_docs for r in rows)
        exact = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .count()
        )
        assert n_docs == exact
        assert {r.n_quarantined for r in rows} == {N_CORRUPT_LINES}

    def test_warc_corpus_stats_matches_documents(self, spark, sf_dir):
        from kafka_streams_dexcom_spark.queries.corpus import (
            q_warc_corpus_stats,
        )

        out = q_warc_corpus_stats(spark, sf_dir)
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        ).groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("sum_chars"),
        )
        got = {r.source: (r.n_docs, r.sum_chars, r.n_http_200)
               for r in out.collect()}
        want = {r.source: (r.n_docs, r.sum_chars, r.n_docs)
                for r in docs.collect()}
        assert got == want


class TestWebdataset:
    def test_reader_groups_keys_and_exts(self, spark, tmp_path):
        blob = (
            cs.tar_member_bytes("00000007.txt", b"seven")
            + cs.tar_member_bytes("00000007.seg.png", b"\x89PNGfake")
            + cs.tar_member_bytes("sub/dir/00000008.txt", b"eight")
            + cs.tar_end_bytes()
        )
        (tmp_path / "shard-0.tar").write_bytes(blob)
        rows = {
            (r.key, r.ext): (r.n_bytes, bytes(r.payload))
            for r in cs.read_webdataset(
                spark, str(tmp_path / "*.tar")
            ).collect()
        }
        # first-dot split and basename handling per the WebDataset spec
        assert rows[("00000007", "txt")] == (5, b"seven")
        assert rows[("00000007", "seg.png")] == (8, b"\x89PNGfake")
        assert rows[("00000008", "txt")] == (5, b"eight")

    def test_webdataset_stats_completeness(self, spark, sf_dir):
        from kafka_streams_dexcom_spark.queries.corpus import (
            WDS_GAP,
            q_webdataset_stats,
        )

        out = {r.ext: r for r in q_webdataset_stats(spark, sf_dir).collect()}
        docs = spark.read.parquet(
            os.path.join(sf_dir, "documents.parquet")
        )
        n = docs.count()
        n_gap = docs.filter(f"doc_id % {WDS_GAP} = 0").count()
        assert out["txt"].n_members == n
        assert out["cls"].n_members == n - n_gap
        assert {r.n_complete for r in out.values()} == {n - n_gap}


class TestWebdatasetWriter:
    def test_round_trip_and_consecutive_keys(self, spark, tmp_path):
        """write_webdataset -> read_webdataset must return the exact
        member set, and each shard must hold same-key members
        CONSECUTIVELY (the WebDataset streaming contract) with every
        sample's members in ONE shard."""
        rows = []
        for k in range(40):
            rows.append((f"{k:08d}", "txt", f"text-{k}".encode()))
            rows.append((f"{k:08d}", "cls", f"c{k % 3}".encode()))
        src = spark.createDataFrame(
            rows, "key string, ext string, payload binary"
        )
        out = str(tmp_path / "wds_out")
        manifest = cs.write_webdataset(src, out, n_shards=4)
        assert sum(m.n_members for m in manifest) == 80
        assert sum(m.n_samples for m in manifest) == 40

        back = cs.read_webdataset(spark, out + "/*.tar")
        got = {
            (r.key, r.ext): bytes(r.payload) for r in back.collect()
        }
        want = {(k, e): p for k, e, p in rows}
        assert got == want

        # per-shard: consecutive keys, one shard per sample
        seen_shard: dict = {}
        for m in manifest:
            blob = (tmp_path / "wds_out" / f"shard-{m.shard:05d}.tar").read_bytes()
            names = [n for n, _ in cs.iter_tar_members(blob)]
            keys = [n.split(".")[0] for n in names]
            # consecutive: each key appears in exactly one run
            runs = [k for i, k in enumerate(keys) if i == 0 or keys[i - 1] != k]
            assert len(runs) == len(set(keys))
            for k in set(keys):
                assert seen_shard.setdefault(k, m.shard) == m.shard

    def test_writer_is_deterministic(self, spark, tmp_path):
        rows = [(f"{k:08d}", "txt", bytes([k])) for k in range(16)]
        src = spark.createDataFrame(
            rows, "key string, ext string, payload binary"
        )
        a, b = str(tmp_path / "a"), str(tmp_path / "b")
        cs.write_webdataset(src.repartition(7), a, n_shards=3)
        cs.write_webdataset(src.repartition(2), b, n_shards=3)
        for i in range(3):
            fa = tmp_path / "a" / f"shard-{i:05d}.tar"
            fb = tmp_path / "b" / f"shard-{i:05d}.tar"
            assert fa.exists() == fb.exists()
            if fa.exists():
                assert fa.read_bytes() == fb.read_bytes()


class TestWebdatasetStream:
    def test_batch_stream_member_equivalence(self, spark, tmp_path):
        """The streaming shard reader must surface EXACTLY the batch
        reader's member set across micro-batches (one shard per
        trigger), with per-epoch isolation: each batch holds only its
        own shard's members."""
        rows = []
        for k in range(30):
            rows.append((f"{k:08d}", "txt", f"t{k}".encode()))
            rows.append((f"{k:08d}", "cls", b"c"))
        src = spark.createDataFrame(
            rows, "key string, ext string, payload binary"
        )
        out = str(tmp_path / "shards")
        cs.write_webdataset(src, out, n_shards=3)

        want = {
            (r.key, r.ext): bytes(r.payload)
            for r in cs.read_webdataset(spark, out + "/*.tar").collect()
        }
        got: dict = {}
        batch_shards: list = []
        def sink(df, bid):
            rows = df.collect()
            batch_shards.append({r.shard for r in rows})
            got.update(
                {(r.key, r.ext): bytes(r.payload) for r in rows}
            )

        q = (
            cs.read_webdataset_stream(
                spark, out, max_files_per_trigger=1
            )
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert got == want and len(want) == 60
        assert len(batch_shards) == 3
        assert all(len(s) == 1 for s in batch_shards)

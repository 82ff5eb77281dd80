"""Multimodal-column queries: metadata-only access (column pruning keeps
the payload bytes unread), the Arrow-batched decode stub, and the
perceptual near-dup family (image dHash + audio energy contour over
REAL codec decode — the duplicate class byte-exact dedup can't see).
The decode
features are deterministic functions of the payload bytes, so the oracle
can replay them in SQL even though Spark runs them through mapInPandas —
this checks the full binary-column plumbing end-to-end. Oracle string
ops are BYTE-exact (encode(text) + hex slicing), matching Spark's
byte-based payload arithmetic even on multi-byte/non-ASCII text —
char-based ascii()/substring() would diverge on e.g. 'Ärzte…'."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.operators import multimodal as mm
from kafka_streams_dexcom_spark.sources.files import load_table


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return media.select(
        "doc_id",
        "media_type",
        F.col("meta.byte_len").cast("bigint").alias("byte_len"),
        F.col("meta.source").alias("source"),
        F.upper(F.expr("hex(substring(payload, 1, 4))")).alias("header_hex"),
    )


def q_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.decode_features(media, use_real_codecs=False)


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return mm.frame_sample(media, every_n=2, use_real_codecs=False)


def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-identical media dedup: group payloads by md5 content hash
    (per media type), keep the min doc_id — the first pass of any media
    corpus pipeline (identical files recrawled under different URLs).
    Scale: the shuffle moves 16-byte hashes + tiny aggregates, never the
    payload bytes; the hash itself is scan-side."""
    media = mm.attach_payload(load_table(spark, sf_dir, "documents"))
    return (
        media.select(
            "doc_id",
            "media_type",
            F.md5("payload").alias("content_hash"),
            F.col("meta.byte_len").alias("byte_len"),
        )
        .groupBy("content_hash", "media_type")
        .agg(
            F.min("doc_id").alias("keeper"),
            F.count(F.lit(1)).alias("n_copies"),
            F.sum("byte_len").cast("bigint").alias("total_bytes"),
        )
    )


def q_audio_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode end-to-end: synthesize genuine RIFF/WAVE PCM
    payloads from the text bytes (operators/multimodal.py:
    attach_wav_payload — Arrow-batched, deterministic byte-for-byte),
    then run the production audio feature extractor (audio_features →
    functions/wav.py vendored codec: chunk walk, pad bytes, 8/16-bit
    PCM). The oracle recomputes every integer feature from the text
    bytes directly, so a codec that mis-framed channels, dropped the
    trailing partial frame wrong, or mixed up the 8-bit offset would
    hash-mismatch. Completes the multimodal matrix: PNG/JPEG real
    (images), WAV real (audio), frame plumbing (video)."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.audio_features(mm.attach_wav_payload(docs))


def q_video_avi_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real video decode end-to-end: synthesize genuine uncompressed
    AVI payloads (1+n%5 frames of 8×8 gray built cyclically from the
    text bytes), decode with the vendored RIFF/AVI codec, and emit one
    row per frame with its exact integer pixel mean. With PNG/JPEG
    (image), WAV (audio), and this (video), every media_type in the
    multimodal family now has a REAL decoder behind it — the stub path
    remains only as the oracle twin for the legacy decode queries."""
    docs = load_table(spark, sf_dir, "documents")
    return mm.video_features(mm.attach_avi_payload(docs))


PAIR_BREAK = 101  # every PAIR_BREAK-th doc's media payload is planted
# TRUNCATED to half its bytes — a broken caption↔media pairing the
# audit must surface (captions come from the WebDataset .txt members,
# media bytes from the payload column; a release with silent pairing
# breaks trains on captions describing the wrong content)


def q_paired_media_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal paired-sample audit — the dataset-card table for a
    multimodal release: per language, sample/label completeness from
    the WebDataset shard MEMBERS (file side: .txt caption present,
    .cls label present — WDS_GAP keys planted incomplete), pairing
    consistency between the caption bytes and the media payload bytes
    (PAIR_BREAK docs planted broken), a decode-consistency count that
    pins the Arrow mapInPandas decode path against a scan-side replay
    of the same stub arithmetic, and the byte masses both modalities
    contribute.

    This is the content-level join the membership-only WebDataset
    completeness check can't see: every column is an exact integer, so
    the oracle replays the planted rules from the documents view and
    any member loss, size mis-parse, payload corruption, or decode
    drift fails the hash.

    Scale: members parse one-task-per-shard (the format's own
    parallelism); joins are doc_id-keyed hash joins of narrow lifted
    columns (payload bytes never move — only octet lengths); the
    report is |langs| rows."""
    import os

    from kafka_streams_dexcom_spark.queries.corpus import _wds_fixture
    from kafka_streams_dexcom_spark.sources import corpus as cs

    path = _wds_fixture(spark, sf_dir)
    members = cs.read_webdataset(spark, os.path.join(path, "*.tar"))
    txt = members.filter(F.col("ext") == "txt").select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.col("n_bytes").cast("bigint").alias("caption_bytes"),
    )
    cls = members.filter(F.col("ext") == "cls").select(
        F.col("key").cast("bigint").alias("doc_id"),
        F.lit(1).alias("has_label"),
    )
    docs = load_table(spark, sf_dir, "documents")
    media = docs.select(
        "doc_id",
        "lang",
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        F.when(
            F.col("doc_id") % PAIR_BREAK == 0,
            F.expr(
                "substring(CAST(text AS BINARY), 1, "
                "octet_length(text) div 2)"
            ),
        )
        .otherwise(F.col("text").cast("binary"))
        .alias("payload"),
    )
    feats = mm.decode_features(
        media.select("doc_id", "media_type", "payload"),
        use_real_codecs=False,
    ).select("doc_id", "width", "height", "n_frames")
    expected = media.select(
        "doc_id",
        "lang",
        F.octet_length("payload").cast("bigint").alias("media_bytes"),
    )
    j = (
        expected.join(feats, "doc_id")
        .join(txt, "doc_id")
        .join(cls, "doc_id", "left")
    )
    n = F.col("media_bytes")
    decode_ok = (
        (F.col("width") == F.lit(64) + n % 256)
        & (F.col("height") == F.lit(64) + (n * 7) % 256)
        & (F.col("n_frames") == F.lit(1) + n % 7)
    )
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.sum(F.coalesce("has_label", F.lit(0))).alias("n_with_label"),
        F.sum(
            (F.coalesce("has_label", F.lit(0)) == 0).cast("int")
        ).alias("n_missing_label"),
        F.sum(
            (F.col("caption_bytes") == F.col("media_bytes")).cast("int")
        ).alias("n_pairing_ok"),
        F.sum(
            (F.col("caption_bytes") != F.col("media_bytes")).cast("int")
        ).alias("n_pairing_broken"),
        F.sum(decode_ok.cast("int")).alias("n_decode_consistent"),
        F.sum("caption_bytes").alias("caption_bytes_sum"),
        F.sum("media_bytes").alias("media_bytes_sum"),
    )


PHASH_MAX_HAMMING = 4


def q_multimodal_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-image perceptual fingerprint (dHash) over REAL PNG bytes —
    the decode->luma->downsample->difference-hash path end to end
    (operators/multimodal.py:phash_features over the vendored codec).
    The planted corpus (attach_phash_payload) re-encodes each pixel
    group three ways (gray PNG / RGB PNG / perturbed gray PNG), so the
    gray and RGB variants of a group MUST emit the identical
    fingerprint: the oracle replays the pixel arithmetic per (group,
    perturbed) key and any codec, luma, downsample, or bit-order drift
    fails the hash."""
    media = mm.attach_phash_payload(load_table(spark, sf_dir, "documents"))
    return mm.phash_features(media).select(
        "doc_id", "variant", "phash_hex"
    )


def q_multimodal_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup media dedup — the duplicate class byte-exact
    multimodal_dedup can NEVER see: re-encoded/recompressed images
    share zero payload bytes but identical pixels. dHash fingerprints
    (REAL decode of real PNG bytes) -> Hamming-banded candidate pairs
    (4 x 16-bit bands, the simhash band machinery with the same
    hot-bucket cap) -> exact popcount verify <= PHASH_MAX_HAMMING.
    The planted geometry guarantees every pixel-group's three
    encodings pair up (gray vs RGB at hamming 0, the perturbed
    variant at <= 2) while cross-group pairs stay ~32 bits apart.

    Scale shape: fingerprints come from the per-session published
    artifact (_fp_artifact: ONE Arrow decode pass per modality per
    corpus, shared by every pair/survivor consumer — the cluster_map
    discipline; payloads never shuffle); candidate generation is one
    groupBy on (band_idx,
    band_val) — 65536 buckets per band — with pairs emitted only
    inside buckets; the exact Hamming check is integer XOR popcounts
    on the 8-byte fingerprint halves. No all-pairs anywhere; the
    SIMHASH_MAX_BUCKET cap bounds degenerate buckets (e.g. flat-color
    frames) at 100 TB."""
    return _banded_pairs(_fp_artifact(spark, sf_dir, "image"))


def _banded_pairs(fp: DataFrame) -> DataFrame:
    """4×16-bit Hamming-banded candidate pairs + exact popcount verify
    over a (doc_id, b0..b3) fingerprint frame — one blocking plan for
    every 64-bit perceptual hash family (image dHash, audio contour)."""
    from kafka_streams_dexcom_spark.operators.dedup import (
        SIMHASH_MAX_BUCKET,
        pairs_within_buckets,
    )

    bands_df = fp.select(
        "doc_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.posexplode(
            F.array(F.col("b0"), F.col("b1"), F.col("b2"), F.col("b3"))
        ).alias("band_idx", "band_val"),
    )
    pairs = pairs_within_buckets(
        bands_df,
        ["band_idx", "band_val"],
        F.struct(
            F.col("doc_id").alias("id"), "b0", "b1", "b2", "b3"
        ),
        max_bucket=SIMHASH_MAX_BUCKET,
    )
    ham = F.expr(
        "CAST(bit_count(pair_a.b0 ^ pair_b.b0)"
        " + bit_count(pair_a.b1 ^ pair_b.b1)"
        " + bit_count(pair_a.b2 ^ pair_b.b2)"
        " + bit_count(pair_a.b3 ^ pair_b.b3) AS BIGINT)"
    )
    return (
        pairs.select(
            F.col("pair_a.id").alias("id_a"),
            F.col("pair_b.id").alias("id_b"),
            ham.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
    )


def q_multimodal_phash_dct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rotation-invariant DCT perceptual fingerprint SET over REAL PNG
    bytes (functions/dct.py): 8 rows per image — one per dihedral
    orientation of the integer 8x8 DCT low-frequency block, each a
    64-bit lower-median sign hash. The planted corpus
    (attach_dct_phash_payload) re-encodes each group as base gray /
    90-degree-ROTATED / dithered+brightened PNGs: the rotated re-post
    shares zero payload bytes yet produces the IDENTICAL fingerprint
    set (the D4 orbit of the coefficient matrix is closed — exact
    integer algebra, no canonicalization boundary), while the image
    dHash lands ~32/64 bits away on it (the miss pinned in
    tests/test_multimodal_dct.py). The oracle replays pixels, integer
    DCT, orientation remaps, and median thresholds from the md5 rule."""
    media = mm.attach_dct_phash_payload(
        load_table(spark, sf_dir, "documents")
    )
    return mm.dct_phash_features(media).select(
        "doc_id", "variant", "orient", "phash_hex"
    )


def q_multimodal_phash_dct_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup dedup over the DCT fingerprint SETS — the
    duplicate class the dHash family provably misses: dihedral
    re-posts (rotations/mirrors) pair at EXACT Hamming 0 here, and the
    dithered re-encode within PHASH_MAX_HAMMING. Pairing is min-over-
    orientations Hamming: side L contributes each doc's orientation-0
    fingerprint, side R all 8, candidates collide on any 16-bit band
    (the _banded_pairs machinery with the same hot-bucket cap), and
    the pair keeps min Hamming over every matched orientation — exact
    on rotations because the re-post's SET equals the original's.

    Scale shape: fingerprints from the per-session artifact (ONE
    decode pass; payloads never shuffle); the R side is 8 narrow rows
    per doc (a documented constant factor, not a growth term); one
    groupBy on (band_idx, band_val); XOR popcount verify; min-agg per
    pair."""
    return _banded_pairs_oriented(_fp_artifact(spark, sf_dir, "image_dct"))


def _banded_pairs_oriented(fp: DataFrame) -> DataFrame:
    """Min-over-orientations Hamming-banded pairs over a (doc_id,
    orient, b0..b3) fingerprint-set frame. L = orientation-0 rows,
    R = all rows; ham(L_a(0), R_b(k)) ranges over the full relative
    orbit (ham(a(j), b(0)) = ham(a(0), b(j^-1)) — the group acts by
    permutation), so min per unordered pair is orientation-complete
    without an 8x8 cross."""
    from kafka_streams_dexcom_spark.operators.dedup import (
        SIMHASH_MAX_BUCKET,
    )

    def explode_bands(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(f"{tag}_id"),
            *[F.col(c).alias(f"{tag}_{c}") for c in ("b0", "b1", "b2", "b3")],
            F.posexplode(
                F.array(F.col("b0"), F.col("b1"), F.col("b2"), F.col("b3"))
            ).alias("band_idx", "band_val"),
        )

    left = explode_bands(fp.filter(F.col("orient") == 0), "l")
    right = explode_bands(fp, "r")
    bsz = right.groupBy("band_idx", "band_val").agg(
        F.count(F.lit(1)).alias("c")
    )
    ham = F.expr(
        "CAST(bit_count(l_b0 ^ r_b0) + bit_count(l_b1 ^ r_b1)"
        " + bit_count(l_b2 ^ r_b2) + bit_count(l_b3 ^ r_b3) AS BIGINT)"
    )
    return (
        left.join(right, ["band_idx", "band_val"])
        .filter(F.col("l_id") != F.col("r_id"))
        .join(
            bsz.filter(F.col("c") <= SIMHASH_MAX_BUCKET),
            ["band_idx", "band_val"],
        )
        .select(
            F.least("l_id", "r_id").alias("id_a"),
            F.greatest("l_id", "r_id").alias("id_b"),
            ham.alias("h"),
        )
        .groupBy("id_a", "id_b")
        .agg(F.min("h").alias("hamming"))
        .filter(F.col("hamming") <= PHASH_MAX_HAMMING)
    )


def q_audio_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip perceptual fingerprint over REAL WAV bytes — the audio
    twin of multimodal_phash: vendored RIFF/PCM decode -> per-frame
    integer mean-abs energy -> 64 derivative-sign contour bits (the
    chromaprint family's simplest honest member). The planted corpus
    re-encodes each sample group as mono 16-bit, L=R STEREO (twice the
    bytes, identical contour), and a one-sample perturbation: mono and
    stereo MUST fingerprint identically, and the oracle replays every
    energy integer from the md5 sample rule."""
    media = mm.attach_audio_phash_payload(
        load_table(spark, sf_dir, "documents")
    )
    return mm.audio_phash_features(media).select(
        "doc_id", "variant", "phash_hex"
    )


def q_audio_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup AUDIO dedup: a re-encoded clip (mono→stereo,
    container rewrite) shares zero payload bytes with its original but
    the identical energy contour — banded pairing catches what
    byte-exact dedup can't, the multimodal_phash_dedup contract on the
    second modality. Same blocking plan (_banded_pairs), same scale
    shape: fingerprints from the shared per-session artifact, (band_idx,
    band_val) groupBy, XOR popcount verify, hot-bucket cap."""
    return _banded_pairs(_fp_artifact(spark, sf_dir, "audio"))


def q_video_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-clip perceptual fingerprint over REAL AVI bytes — the video
    twin of multimodal_phash/audio_phash: vendored RIFF/AVI decode ->
    per-frame integer brightness floor(sum/area) -> 64 derivative-sign
    contour bits. The planted corpus re-encodes each 65-frame clip as
    4x4 gray, 2x-UPSCALED 8x8 (four times the frame bytes, identical
    floor-mean contour — exact because 4S // 4A == S // A), and a
    one-pixel perturbation: original and upscale MUST fingerprint
    identically, and the oracle replays every brightness integer from
    the md5 frame rule."""
    media = mm.attach_video_phash_payload(
        load_table(spark, sf_dir, "documents")
    )
    return mm.video_phash_features(media).select(
        "doc_id", "variant", "phash_hex"
    )


def q_video_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual near-dup VIDEO dedup: an upscaled re-encode (the
    dominant duplicate class in scraped video — same clip reposted at
    a different resolution) shares zero frame bytes with its original
    but the identical brightness contour. Same blocking plan
    (_banded_pairs), same scale shape as the image/audio twins:
    fingerprints from the shared per-session artifact, (band_idx,
    band_val) groupBy, XOR popcount verify, hot-bucket cap. Completes
    the perceptual-dedup modality triptych."""
    return _banded_pairs(_fp_artifact(spark, sf_dir, "video"))


def _fp_artifact(spark: SparkSession, sf_dir: str, modality: str) -> DataFrame:
    """Per-modality perceptual fingerprint table, MATERIALIZED once per
    (Spark application, corpus) and shared — the cluster_map discipline:
    at 100 TB the fingerprints of a media corpus are a published
    artifact every downstream consumer (pairing, survivor election,
    incremental screens) reads, never a decode pass each query re-runs.
    The parquet round-trip also cuts the mapInPandas lineage, so
    consumers plan against a flat (doc_id, b0..b3) scan."""
    import os

    from kafka_streams_dexcom_spark.sources.files import (
        corpus_fingerprint,
        session_artifact,
    )

    builders = {
        "image": lambda d: mm.phash_features(mm.attach_phash_payload(d)),
        "audio": lambda d: mm.audio_phash_features(
            mm.attach_audio_phash_payload(d)
        ),
        "video": lambda d: mm.video_phash_features(
            mm.attach_video_phash_payload(d)
        ),
        "image_dct": lambda d: mm.dct_phash_features(
            mm.attach_dct_phash_payload(d)
        ),
    }
    return session_artifact(
        spark,
        f"phash_fp_{modality}",
        (
            os.path.abspath(sf_dir),
            corpus_fingerprint(os.path.join(sf_dir, "documents.parquet")),
        ),
        lambda: builders[modality](load_table(spark, sf_dir, "documents")),
    )


def q_phash_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The perceptual dedup pipeline's final materialization, across
    ALL FOUR perceptual legs: every (modality, doc) mapped to its
    near-dup cluster canonical (min doc_id of its perceptual component
    via exact connected components; its own id when it has no
    near-dup) and the keep/drop decision — the media twin of
    dedup_survivors, the row a 100 TB media dedup job actually writes
    back out. Round 12 adds the rotation-invariant image_dct leg
    (oriented min-Hamming pairs), so a rotated re-post now loses its
    survivor election too.

    Scale shape: fingerprints come from the per-session published
    artifact (_fp_artifact — ONE Arrow decode pass per modality per
    corpus, shared with every other consumer; payload bytes never
    shuffle), then four banded pair plans (the _banded_pairs blocking
    with the hot-bucket cap), four pointer-doubling CCs over pair
    graphs that are linear in docs (each connects a handful of
    re-encodes), and doc_id-keyed hash joins of the narrow label
    tables. No leg's work gates another's — at cluster scale the
    legs schedule concurrently."""
    from kafka_streams_dexcom_spark.operators.graph import (
        CC_SINGLE_TASK_EDGES,
        connected_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    ids = docs.select("doc_id")
    names = ("image", "audio", "video", "image_dct")
    # Round-12 (guide §2.4/§2.6): ONE connected-components invocation
    # over the union of the four per-leg pair graphs instead of four.
    # The legs are disjoint by construction, so prefixing node ids with
    # the leg index (doc_id·4 + leg) yields the identical labels — a
    # component's min composite id decodes to the leg's min doc_id —
    # while paying the CC machinery (edge materialization + count +
    # label loop / single-task dispatch + survivor join) once instead
    # of four times. The single-task dispatch bound scales by the
    # number of merged legs, keeping the PER-LEG work bound the
    # measured constant.
    allp = None
    for idx, name in enumerate(names):
        fp = _fp_artifact(spark, sf_dir, name)
        pairs = (
            _banded_pairs_oriented(fp)
            if name == "image_dct"
            else _banded_pairs(fp)
        )
        tagged = pairs.select(
            (F.col("id_a") * 4 + idx).alias("id_a"),
            (F.col("id_b") * 4 + idx).alias("id_b"),
        )
        allp = tagged if allp is None else allp.unionByName(tagged)
    comp = connected_components(
        allp,
        a_col="id_a",
        b_col="id_b",
        single_task_edges=len(names) * CC_SINGLE_TASK_EDGES,
    )
    mods = F.broadcast(
        docs.sparkSession.createDataFrame(
            [(i, n) for i, n in enumerate(names)],
            "leg int, modality string",
        )
    )
    base = ids.crossJoin(mods).select(
        "modality",
        "doc_id",
        (F.col("doc_id") * 4 + F.col("leg")).alias("cnode"),
    )
    return base.join(comp, base.cnode == comp.node, "left").select(
        "modality",
        "doc_id",
        F.coalesce(
            F.expr("component div 4"), F.col("doc_id")
        )
        .cast("bigint")
        .alias("canonical_id"),
    ).select(
        "modality",
        "doc_id",
        "canonical_id",
        (F.col("doc_id") == F.col("canonical_id")).alias("is_survivor"),
    )


def _phash_duck_cte() -> str:
    """DuckDB replay of the planted pixel rule + dHash, per (group,
    perturbed) key: the same md5-derived source bytes the Spark synth
    encodes into PNGs, the same integer 2x2 box downsample, the same
    bit order, as four 16-bit band ints."""
    w, h = mm.PHASH_SRC_W, mm.PHASH_SRC_H
    n = w * h
    base = (
        "CAST('0x' || substr(md5('ph:' || CAST(g AS VARCHAR) || ':' || "
        "CAST(p // 16 AS VARCHAR)), CAST(2 * (p % 16) + 1 AS INT), 2) "
        "AS INT)"
    )
    src = (
        f"list_transform(range(0, {n}), p -> "
        f"CASE WHEN pert = 1 AND p = 0 "
        f"THEN ({base} + {mm.PHASH_PERTURB}) % 256 "
        f"ELSE {base} END)"
    )
    x = f"(({w} * 2) * (q // 9) + 2 * (q % 9) + 1)"
    d72 = (
        f"list_transform(range(0, 72), q -> "
        f"(s[{x}] + s[{x} + 1] + s[{x} + {w}] + s[{x} + {w + 1}]) // 4)"
    )
    band_exprs = []
    for b in range(4):
        terms = []
        for t in range(16):
            k = 16 * b + t
            r, c = k // 8, k % 8
            terms.append(
                f"CASE WHEN d[{r * 9 + c + 1}] > d[{r * 9 + c + 2}] "
                f"THEN {1 << t} ELSE 0 END"
            )
        band_exprs.append("(" + " + ".join(terms) + f") AS b{b}")
    return f"""
        ph_docs AS (
            SELECT doc_id, doc_id // {mm.PHASH_GROUP} AS g,
                   CASE WHEN doc_id % {mm.PHASH_GROUP} = 2
                        THEN 1 ELSE 0 END AS pert,
                   CAST(doc_id % {mm.PHASH_GROUP} AS BIGINT) AS variant
            FROM documents
        ),
        ph_keys AS (SELECT DISTINCT g, pert FROM ph_docs),
        ph_src AS (SELECT g, pert, {src} AS s FROM ph_keys),
        ph_d AS (SELECT g, pert, {d72} AS d FROM ph_src),
        ph_fp AS (
            SELECT g, pert, {", ".join(band_exprs)} FROM ph_d
        )
    """


def _phash_oracle() -> str:
    return f"""
        WITH {_phash_duck_cte()}
        SELECT pd.doc_id, pd.variant,
               lpad(hex(f.b3), 4, '0') || lpad(hex(f.b2), 4, '0') ||
               lpad(hex(f.b1), 4, '0') || lpad(hex(f.b0), 4, '0')
                   AS phash_hex
        FROM ph_docs pd
        JOIN ph_fp f ON f.g = pd.g AND f.pert = pd.pert
    """


def _banded_pairs_duck() -> str:
    """The banded-pair replay tail over a CTE named ``fp_docs``
    (doc_id, b0..b3) — band explode, hot-bucket cap, XOR popcount,
    threshold. Shared by the image and audio pair oracles."""
    from kafka_streams_dexcom_spark.operators.dedup import (
        SIMHASH_MAX_BUCKET,
    )

    return f"""
        bands_cte AS (
            SELECT doc_id, b0, b1, b2, b3, bi AS band_idx,
                   CASE bi WHEN 0 THEN b0 WHEN 1 THEN b1
                        WHEN 2 THEN b2 ELSE b3 END AS band_val
            FROM fp_docs, generate_series(0, 3) gs(bi)
        ),
        bsz AS (
            SELECT band_idx, band_val, count(*) AS c
            FROM bands_cte GROUP BY 1, 2
        ),
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.b0, b.b0))
                        + bit_count(xor(a.b1, b.b1))
                        + bit_count(xor(a.b2, b.b2))
                        + bit_count(xor(a.b3, b.b3)) AS BIGINT)
                       AS hamming
            FROM bands_cte a JOIN bands_cte b
              ON a.band_idx = b.band_idx AND a.band_val = b.band_val
             AND a.doc_id < b.doc_id
            JOIN bsz s
              ON s.band_idx = a.band_idx AND s.band_val = a.band_val
            WHERE s.c <= {SIMHASH_MAX_BUCKET}
        )
        SELECT id_a, id_b, hamming FROM cand
        WHERE hamming <= {PHASH_MAX_HAMMING}
    """


def _phash_dedup_oracle() -> str:
    return f"""
        WITH {_phash_duck_cte()},
        fp_docs AS (
            SELECT pd.doc_id, f.b0, f.b1, f.b2, f.b3
            FROM ph_docs pd
            JOIN ph_fp f ON f.g = pd.g AND f.pert = pd.pert
        ),
        {_banded_pairs_duck()}
    """


def _dctp_duck_cte() -> str:
    """DuckDB replay of the DCT phash corpus: the md5 pixel rules for
    all three variants (base / rot90 index remap / dither+brighten
    clip), the separable integer DCT (functions/dct.py SQL twins, CTE-
    staged so the row pass runs once per image), the 8 orientation
    remaps, and the lower-median band ints — ends in
    ``dctp_fp(g, v, o, b0, b1, b2, b3)``."""
    from kafka_streams_dexcom_spark.functions import dct as dx

    n = dx.DCTP_N * dx.DCTP_N
    base = (
        "CAST('0x' || substr(md5('phd:' || CAST(g AS VARCHAR) || ':' || "
        "CAST(i // 16 AS VARCHAR)), CAST(2 * (i % 16) + 1 AS INT), 2) "
        "AS BIGINT)"
    )
    dith = (
        "CAST('0x' || substr(md5('phdn:' || CAST(g AS VARCHAR) || ':' || "
        "CAST(i // 16 AS VARCHAR)), CAST(2 * (i % 16) + 1 AS INT), 2) "
        "AS BIGINT)"
    )
    src = f"list_transform(range(0, {n}), i -> {base})"
    # np.rot90: out[r][c] = in[c][15 - r]; flat i: r=i//16, c=i%16
    rot = (
        f"list_transform(range(0, {n}), i -> "
        f"s[(i % 16) * 16 + (15 - i // 16) + 1])"
    )
    redo = (
        f"list_transform(range(0, {n}), i -> "
        f"greatest(0, least(255, s[i + 1] "
        f"+ CASE WHEN {dith} % 2 = 1 THEN {mm.DCTP_DITHER} "
        f"ELSE -{mm.DCTP_DITHER} END + {mm.DCTP_BRIGHT})))"
    )
    orient_case = " ".join(
        f"WHEN {o} THEN {dx.orient_flat_sql('c', o)}"
        for o in range(8)
    )
    bands = ", ".join(
        f"{dx.band_sql('fl', 'th', b)} AS b{b}" for b in range(4)
    )
    return f"""
        dctp_keys AS (
            SELECT DISTINCT doc_id // {mm.DCTP_GROUP} AS g FROM documents
        ),
        {dx.dct_table_cte()},
        dctp_base AS (SELECT g, {src} AS s FROM dctp_keys),
        dctp_px AS MATERIALIZED (
            SELECT g, 0 AS v, s AS p FROM dctp_base
            UNION ALL SELECT g, 1, {rot} FROM dctp_base
            UNION ALL SELECT g, 2, {redo} FROM dctp_base
        ),
        dctp_r AS MATERIALIZED (
            SELECT g, v, {dx.row_pass_sql('p')} AS r
            FROM dctp_px CROSS JOIN dct_ct
        ),
        dctp_co AS MATERIALIZED (
            SELECT g, v, {dx.col_pass_sql('r')} AS c
            FROM dctp_r CROSS JOIN dct_ct
        ),
        dctp_fl AS (
            SELECT g, v, o, CASE o {orient_case} END AS fl
            FROM dctp_co, generate_series(0, 7) gs(o)
        ),
        dctp_th AS (
            SELECT g, v, o, fl, {dx.threshold_sql('fl')} AS th
            FROM dctp_fl
        ),
        dctp_fp AS MATERIALIZED (
            SELECT g, v, o, {bands} FROM dctp_th
        )
    """


def _dctp_oracle() -> str:
    return f"""
        WITH {_dctp_duck_cte()}
        SELECT d.doc_id,
               CAST(d.doc_id % {mm.DCTP_GROUP} AS BIGINT) AS variant,
               CAST(f.o AS BIGINT) AS orient,
               lpad(hex(f.b3), 4, '0') || lpad(hex(f.b2), 4, '0') ||
               lpad(hex(f.b1), 4, '0') || lpad(hex(f.b0), 4, '0')
                   AS phash_hex
        FROM documents d
        JOIN dctp_fp f ON f.g = d.doc_id // {mm.DCTP_GROUP}
                      AND f.v = d.doc_id % {mm.DCTP_GROUP}
    """


def _dctp_dedup_oracle() -> str:
    """Oriented banded-pair replay: L = orientation-0 rows, R = all 8,
    band collide, hot-bucket cap on the R side, min XOR-popcount over
    matched orientations per unordered pair."""
    from kafka_streams_dexcom_spark.operators.dedup import (
        SIMHASH_MAX_BUCKET,
    )

    return f"""
        WITH {_dctp_duck_cte()},
        fp_docs AS (
            SELECT d.doc_id, f.o AS orient, f.b0, f.b1, f.b2, f.b3
            FROM documents d
            JOIN dctp_fp f ON f.g = d.doc_id // {mm.DCTP_GROUP}
                          AND f.v = d.doc_id % {mm.DCTP_GROUP}
        ),
        l_bands AS (
            SELECT doc_id, b0, b1, b2, b3, bi AS band_idx,
                   CASE bi WHEN 0 THEN b0 WHEN 1 THEN b1
                        WHEN 2 THEN b2 ELSE b3 END AS band_val
            FROM fp_docs, generate_series(0, 3) gs(bi)
            WHERE orient = 0
        ),
        r_bands AS (
            SELECT doc_id, b0, b1, b2, b3, bi AS band_idx,
                   CASE bi WHEN 0 THEN b0 WHEN 1 THEN b1
                        WHEN 2 THEN b2 ELSE b3 END AS band_val
            FROM fp_docs, generate_series(0, 3) gs(bi)
        ),
        bsz AS (
            SELECT band_idx, band_val, count(*) AS c
            FROM r_bands GROUP BY 1, 2
        ),
        cand AS (
            SELECT least(l.doc_id, r.doc_id) AS id_a,
                   greatest(l.doc_id, r.doc_id) AS id_b,
                   CAST(bit_count(xor(l.b0, r.b0))
                        + bit_count(xor(l.b1, r.b1))
                        + bit_count(xor(l.b2, r.b2))
                        + bit_count(xor(l.b3, r.b3)) AS BIGINT) AS h
            FROM l_bands l JOIN r_bands r
              ON l.band_idx = r.band_idx AND l.band_val = r.band_val
             AND l.doc_id <> r.doc_id
            JOIN bsz s
              ON s.band_idx = l.band_idx AND s.band_val = l.band_val
            WHERE s.c <= {SIMHASH_MAX_BUCKET}
        )
        SELECT id_a, id_b, min(h) AS hamming
        FROM cand GROUP BY id_a, id_b
        HAVING min(h) <= {PHASH_MAX_HAMMING}
    """


def _aph_duck_cte() -> str:
    """DuckDB replay of the planted audio sample rule + energy contour,
    per (group, perturbed) key: byte i of md5('aph:<g>:<i//16>'),
    sample = (byte−128)·256, frame energy = 16·Σ|byte−128| (exact:
    256/APH_FRAME), bit k = e[k+1] > e[k]."""
    n_frames, frame = mm.APH_FRAMES, mm.APH_FRAME
    base_j = (
        "CAST('0x' || substr(md5('aph:' || CAST(g AS VARCHAR) || ':' || "
        "CAST((f * 16 + j) // 16 AS VARCHAR)), "
        "CAST(2 * ((f * 16 + j) % 16) + 1 AS INT), 2) AS INT)"
    )
    byte_j = (
        f"CASE WHEN pert = 1 AND f * {frame} + j = 0 "
        f"THEN ({base_j} + {mm.APH_PERTURB}) % 256 ELSE {base_j} END"
    )
    e = (
        f"list_transform(range(0, {n_frames}), f -> "
        f"CAST(list_sum(list_transform(range(0, {frame}), "
        f"j -> abs({byte_j} - 128))) * {256 // frame} AS BIGINT))"
    )
    band_exprs = []
    for b in range(4):
        terms = []
        for t in range(16):
            k = 16 * b + t
            terms.append(
                f"CASE WHEN e[{k + 2}] > e[{k + 1}] "
                f"THEN {1 << t} ELSE 0 END"
            )
        band_exprs.append("(" + " + ".join(terms) + f") AS b{b}")
    return f"""
        ph_docs AS (
            SELECT doc_id, doc_id // {mm.PHASH_GROUP} AS g,
                   CASE WHEN doc_id % {mm.PHASH_GROUP} = 2
                        THEN 1 ELSE 0 END AS pert,
                   CAST(doc_id % {mm.PHASH_GROUP} AS BIGINT) AS variant
            FROM documents
        ),
        ph_keys AS (SELECT DISTINCT g, pert FROM ph_docs),
        ph_e AS (SELECT g, pert, {e} AS e FROM ph_keys),
        ph_fp AS (
            SELECT g, pert, {", ".join(band_exprs)} FROM ph_e
        )
    """


def _audio_phash_oracle() -> str:
    return f"""
        WITH {_aph_duck_cte()}
        SELECT pd.doc_id, pd.variant,
               lpad(hex(f.b3), 4, '0') || lpad(hex(f.b2), 4, '0') ||
               lpad(hex(f.b1), 4, '0') || lpad(hex(f.b0), 4, '0')
                   AS phash_hex
        FROM ph_docs pd
        JOIN ph_fp f ON f.g = pd.g AND f.pert = pd.pert
    """


def _audio_phash_dedup_oracle() -> str:
    return f"""
        WITH {_aph_duck_cte()},
        fp_docs AS (
            SELECT pd.doc_id, f.b0, f.b1, f.b2, f.b3
            FROM ph_docs pd
            JOIN ph_fp f ON f.g = pd.g AND f.pert = pd.pert
        ),
        {_banded_pairs_duck()}
    """


def _vph_duck_cte() -> str:
    """DuckDB replay of the planted video frame rule + brightness
    contour, per (group, perturbed) key: pixel j of frame f is byte j
    of md5('vph:<g>:<f>'), frame energy = Σpixels // 16 (the 4x4
    area — the SAME integer the 8x8 upscale floor-means to), bit k =
    e[k+1] > e[k]."""
    n_frames, area = mm.VPH_FRAMES, mm.VPH_W * mm.VPH_H
    base_j = (
        "CAST('0x' || substr(md5('vph:' || CAST(g AS VARCHAR) || ':' || "
        "CAST(f AS VARCHAR)), CAST(2 * j + 1 AS INT), 2) AS INT)"
    )
    byte_j = (
        f"CASE WHEN pert = 1 AND f * {area} + j = 0 "
        f"THEN ({base_j} + {mm.VPH_PERTURB}) % 256 ELSE {base_j} END"
    )
    e = (
        f"list_transform(range(0, {n_frames}), f -> "
        f"CAST(list_sum(list_transform(range(0, {area}), "
        f"j -> {byte_j})) // {area} AS BIGINT))"
    )
    band_exprs = []
    for b in range(4):
        terms = []
        for t in range(16):
            k = 16 * b + t
            terms.append(
                f"CASE WHEN e[{k + 2}] > e[{k + 1}] "
                f"THEN {1 << t} ELSE 0 END"
            )
        band_exprs.append("(" + " + ".join(terms) + f") AS b{b}")
    return f"""
        ph_docs AS (
            SELECT doc_id, doc_id // {mm.PHASH_GROUP} AS g,
                   CASE WHEN doc_id % {mm.PHASH_GROUP} = 2
                        THEN 1 ELSE 0 END AS pert,
                   CAST(doc_id % {mm.PHASH_GROUP} AS BIGINT) AS variant
            FROM documents
        ),
        ph_keys AS (SELECT DISTINCT g, pert FROM ph_docs),
        ph_e AS (SELECT g, pert, {e} AS e FROM ph_keys),
        ph_fp AS (
            SELECT g, pert, {", ".join(band_exprs)} FROM ph_e
        )
    """


def _video_phash_oracle() -> str:
    return f"""
        WITH {_vph_duck_cte()}
        SELECT pd.doc_id, pd.variant,
               lpad(hex(f.b3), 4, '0') || lpad(hex(f.b2), 4, '0') ||
               lpad(hex(f.b1), 4, '0') || lpad(hex(f.b0), 4, '0')
                   AS phash_hex
        FROM ph_docs pd
        JOIN ph_fp f ON f.g = pd.g AND f.pert = pd.pert
    """


def _video_phash_dedup_oracle() -> str:
    return f"""
        WITH {_vph_duck_cte()},
        fp_docs AS (
            SELECT pd.doc_id, f.b0, f.b1, f.b2, f.b3
            FROM ph_docs pd
            JOIN ph_fp f ON f.g = pd.g AND f.pert = pd.pert
        ),
        {_banded_pairs_duck()}
    """


def _phash_survivors_oracle() -> str:
    """Composes the three modality pair oracles zero-glue (each full
    pair query nests as a derived-table CTE, so their internal CTE
    names never collide), then runs the pointer-doubling CC chain once
    per modality. rounds=16 covers min-label paths of 2^16 hops — far
    beyond any component a banded pair graph over per-group re-encodes
    can produce — and the cc_bad guards keep non-convergence LOUD: any
    unconverged leg zeroes the whole result (rows mismatch) instead of
    silently labeling singletons."""
    from kafka_streams_dexcom_spark.queries.dedup import cc_doubling_sql

    legs = {
        "img": _phash_dedup_oracle(),
        "aud": _audio_phash_dedup_oracle(),
        "vid": _video_phash_dedup_oracle(),
        "dct": _dctp_dedup_oracle(),
    }
    parts = []
    for tag, pair_q in legs.items():
        # MATERIALIZED is load-bearing: DuckDB inlines plain CTEs, and
        # every CC layer references the edge list twice — inlined, the
        # 16 layers would re-run the whole pair oracle ~32x per leg
        # (measured 274s -> the materialized form is seconds)
        parts.append(f"{tag}_pairs AS MATERIALIZED ({pair_q})")
        parts.append(
            f"""{tag}_edges AS MATERIALIZED (
                SELECT id_a AS u, id_b AS v FROM {tag}_pairs
                UNION ALL
                SELECT id_b AS u, id_a AS v FROM {tag}_pairs
            )"""
        )
        parts.append(
            f"""{tag}_comp AS (
                WITH {cc_doubling_sql(f"{tag}_edges", rounds=16)}
                SELECT node, component,
                       (SELECT n FROM cc_bad) AS bad
                FROM comp
            )"""
        )
    leg_selects = []
    for tag, modality in (
        ("img", "image"), ("aud", "audio"), ("vid", "video"),
        ("dct", "image_dct"),
    ):
        leg_selects.append(
            f"""SELECT '{modality}' AS modality, d.doc_id,
                   COALESCE(c.component, d.doc_id) AS canonical_id
            FROM documents d
            LEFT JOIN {tag}_comp c ON c.node = d.doc_id"""
        )
    guards = " AND ".join(
        f"(SELECT COALESCE(MAX(bad), 0) FROM {tag}_comp) = 0"
        for tag in legs
    )
    return f"""
        WITH {", ".join(parts)},
        legs AS ({" UNION ALL ".join(leg_selects)})
        SELECT modality, doc_id, canonical_id,
               doc_id = canonical_id AS is_survivor
        FROM legs
        WHERE {guards}
    """


_MEDIA_TYPE = "['image', 'audio', 'video'][(doc_id % 3) + 1]"

QUERIES = {
    "multimodal_meta": q_multimodal_meta,
    "multimodal_decode": q_multimodal_decode,
    "multimodal_frame_sample": q_multimodal_frame_sample,
    "multimodal_dedup": q_multimodal_dedup,
    "audio_wav_stats": q_audio_wav_stats,
    "video_avi_frames": q_video_avi_frames,
    "paired_media_audit": q_paired_media_audit,
    "multimodal_phash": q_multimodal_phash,
    "multimodal_phash_dedup": q_multimodal_phash_dedup,
    "multimodal_phash_dct": q_multimodal_phash_dct,
    "multimodal_phash_dct_dedup": q_multimodal_phash_dct_dedup,
    "audio_phash": q_audio_phash,
    "audio_phash_dedup": q_audio_phash_dedup,
    "video_phash": q_video_phash,
    "video_phash_dedup": q_video_phash_dedup,
    "phash_survivors": q_phash_survivors,
}

def _paired_media_audit_oracle() -> str:
    """Replay from the documents view: the WDS_GAP incomplete-label
    plant, the PAIR_BREAK half-truncation plant, and the stub decode's
    scan-side consistency (always consistent — the count pins the
    Arrow path against drift, like the WebDataset completeness
    count)."""
    from kafka_streams_dexcom_spark.queries.corpus import WDS_GAP

    return f"""
        WITH m AS (
            SELECT doc_id, lang,
                   CAST(octet_length(encode(text)) AS BIGINT) AS cap_b,
                   CAST(CASE WHEN doc_id % {PAIR_BREAK} = 0
                        THEN octet_length(encode(text)) // 2
                        ELSE octet_length(encode(text)) END
                        AS BIGINT) AS med_b
            FROM documents
        )
        SELECT lang,
               count(*) AS n_samples,
               CAST(sum(CASE WHEN doc_id % {WDS_GAP} != 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_with_label,
               CAST(sum(CASE WHEN doc_id % {WDS_GAP} = 0
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_label,
               CAST(sum(CASE WHEN cap_b = med_b THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_pairing_ok,
               CAST(sum(CASE WHEN cap_b != med_b THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_pairing_broken,
               count(*) AS n_decode_consistent,
               CAST(sum(cap_b) AS BIGINT) AS caption_bytes_sum,
               CAST(sum(med_b) AS BIGINT) AS media_bytes_sum
        FROM m
        GROUP BY lang
    """


ORACLES = {
    "paired_media_audit": _paired_media_audit_oracle(),
    "multimodal_phash": _phash_oracle(),
    "multimodal_phash_dedup": _phash_dedup_oracle(),
    "multimodal_phash_dct": _dctp_oracle(),
    "multimodal_phash_dct_dedup": _dctp_dedup_oracle(),
    "audio_phash": _audio_phash_oracle(),
    "audio_phash_dedup": _audio_phash_dedup_oracle(),
    "video_phash": _video_phash_oracle(),
    "video_phash_dedup": _video_phash_dedup_oracle(),
    "phash_survivors": _phash_survivors_oracle(),
    "video_avi_frames": """
        WITH b AS (
            SELECT doc_id, octet_length(encode(text)) AS n,
                   hex(encode(text)) AS hx
            FROM documents
        ),
        f AS (
            SELECT doc_id, n, hx,
                   CAST(1 + n % 5 AS BIGINT) AS n_frames
            FROM b WHERE n > 0
        ),
        fr AS (
            SELECT doc_id, n, hx, n_frames,
                   CAST(unnest(range(0, n_frames)) AS BIGINT)
                       AS frame_idx
            FROM f
        )
        SELECT doc_id,
               CAST(8 AS BIGINT) AS width,
               CAST(8 AS BIGINT) AS height,
               n_frames, frame_idx,
               CAST(list_reduce(list_transform(range(0, 64),
                       p -> CAST('0x' || substr(hx,
                            CAST(2 * ((frame_idx * 64 + p) % n) + 1
                                 AS INT), 2) AS BIGINT)),
                    (a, v) -> a + v) * 1000 // 64 AS BIGINT)
                   AS mean_milli
        FROM fr
    """,
    "audio_wav_stats": """
        WITH b AS (
            SELECT doc_id, octet_length(encode(text)) AS nb,
                   hex(encode(text)) AS hx
            FROM documents
        ),
        p AS (
            SELECT doc_id,
                   CAST(8000 + (doc_id % 3) * 4000 AS BIGINT)
                       AS sample_rate,
                   CAST(1 + doc_id % 2 AS BIGINT) AS n_channels,
                   hx,
                   CAST(nb // (1 + doc_id % 2) AS BIGINT) AS n_frames
            FROM b
        ),
        s AS (
            SELECT doc_id, sample_rate, n_channels, n_frames,
                   list_transform(
                       range(1, n_frames * n_channels + 1),
                       i -> abs((CAST('0x' || substr(hx,
                                CAST(2 * i - 1 AS INT), 2) AS INT)
                                - 128) * 256)) AS a
            FROM p
        )
        SELECT doc_id, sample_rate, n_channels, n_frames,
               CAST(coalesce(list_aggregate(a, 'max'), 0) AS BIGINT)
                   AS peak_abs,
               CAST(CASE WHEN len(a) = 0 THEN 0 ELSE
                   CAST(list_aggregate(a, 'sum') AS BIGINT) * 1000
                       // len(a)
               END AS BIGINT) AS mean_abs_milli
        FROM s
    """,
    "multimodal_meta": f"""
        SELECT doc_id,
               {_MEDIA_TYPE} AS media_type,
               CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
               source,
               upper(substr(hex(encode(text)), 1, 8)) AS header_hex
        FROM documents
    """,
    "multimodal_decode": f"""
        SELECT doc_id,
               {_MEDIA_TYPE} AS media_type,
               CAST(64 + octet_length(encode(text)) % 256 AS BIGINT) AS width,
               CAST(64 + (octet_length(encode(text)) * 7) % 256 AS BIGINT)
                   AS height,
               CAST(1 + octet_length(encode(text)) % 7 AS BIGINT) AS n_frames,
               round(((CASE WHEN octet_length(encode(text)) = 0 THEN 0 ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) END + octet_length(encode(text))) % 1000)
                     / 1000.0, 6) AS feature_mean
        FROM documents
    """,
    "multimodal_frame_sample": f"""
        WITH frames AS (
            SELECT doc_id,
                   CAST(1 + octet_length(encode(text)) % 7 AS BIGINT)
                       AS n_frames,
                   round(((CASE WHEN octet_length(encode(text)) = 0 THEN 0 ELSE CAST('0x' || substr(hex(encode(text)), 1, 2) AS INT) END + octet_length(encode(text))) % 1000)
                         / 1000.0, 6) AS feature_mean
            FROM documents
            WHERE {_MEDIA_TYPE} = 'video'
        )
        SELECT doc_id, frame_idx, feature_mean FROM (
            SELECT doc_id,
                   CAST(unnest(range(0, n_frames)) AS BIGINT) AS frame_idx,
                   feature_mean
            FROM frames
        )
        WHERE frame_idx % 2 = 0
    """,
    "multimodal_dedup": f"""
        SELECT md5(text) AS content_hash,
               {_MEDIA_TYPE} AS media_type,
               min(doc_id) AS keeper,
               count(*) AS n_copies,
               CAST(sum(octet_length(encode(text))) AS BIGINT)
                   AS total_bytes
        FROM documents
        GROUP BY content_hash, media_type
    """,
}

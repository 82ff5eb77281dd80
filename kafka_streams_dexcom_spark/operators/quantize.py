"""Embedding compression operators.

Scalar (int8-range) quantization is the standard first move for serving
and storing billion-scale embedding corpora (4x smaller than float32
before codec compression, and the dequantization error bound is known
per dimension). The Spark shape is a two-pass pipeline:

1. one global aggregation for per-dimension min/max (posexplode →
   groupBy(dim) — a shuffle of n_vectors × dims scalar rows with
   map-side partial min/max, so the exchange itself carries only
   dims × n_partitions rows);
2. a broadcast of the (dims)-sized stats arrays back onto the corpus
   scan, where quantization is a narrow codegen `transform`.

At 100 TB the stats pass is the only wide stage and its output is a few
KB — the classic "tiny global state, huge narrow map" profile that
scales linearly with executors.

All arithmetic is double with floor cuts (no rounding ties), and error
folds are sequential left folds, so the DuckDB oracle replays
bit-identically (see functions/rounding.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kafka_streams_dexcom_spark.functions.rounding import trunc6
from kafka_streams_dexcom_spark.operators.clustering import DIST2_TPL
from kafka_streams_dexcom_spark.operators.dedup import with_embedding_norm
from kafka_streams_dexcom_spark.sources.files import fan_out_small

QLEVELS = 255  # quantized codes span [0, 255] — one unsigned byte

# Product-quantization geometry: m subspaces × ksub codewords means each
# 64-dim float vector compresses to m log2(ksub)-bit codes (here 4 × 4
# bits = 2 bytes, a 128x reduction) while ADC distances stay a table
# lookup — the FAISS-style memory budget that makes billion-scale ANN
# fit on a cluster at all.
PQ_M = 4
PQ_KSUB = 16
PQ_ITERS = 2


def dimension_stats(emb: DataFrame, vec_col: str = "vec") -> DataFrame:
    """Single-row DataFrame of per-dimension min/max arrays (0-indexed,
    aligned with Spark's 0-based array subscripts)."""
    dims = emb.select(F.posexplode(vec_col).alias("dim", "x"))
    stats = dims.groupBy("dim").agg(
        F.min("x").alias("mn"), F.max("x").alias("mx")
    )
    return stats.agg(
        F.array_sort(F.collect_list(F.struct("dim", "mn"))).alias("mns"),
        F.array_sort(F.collect_list(F.struct("dim", "mx"))).alias("mxs"),
    ).select(
        F.expr("transform(mns, s -> s.mn)").alias("mn"),
        F.expr("transform(mxs, s -> s.mx)").alias("mx"),
    )


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Min-max scalar quantization of an embedding column to byte codes,
    with the per-vector reconstruction MSE.

    Returns (id, q_codes as a comma-joined string for engine-portable
    comparison, mse). Degenerate dimensions (mn == mx) quantize to 0 and
    contribute zero error."""
    base = fan_out_small(emb).select(
        id_col,
        F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))").alias("vec"),
    )
    stats = dimension_stats(base)
    q_expr = (
        "transform(vec, (x, i) -> CASE WHEN mx[i] = mn[i] THEN 0 "
        f"ELSE CAST(floor((x - mn[i]) / (mx[i] - mn[i]) * {QLEVELS}.0D) "
        "AS INT) END)"
    )
    with_q = base.crossJoin(F.broadcast(stats)).withColumn(
        "q", F.expr(q_expr)
    )
    err2 = (
        "transform(vec, (x, i) -> CASE WHEN mx[i] = mn[i] THEN 0.0D "
        "ELSE pow(x - (mn[i] + CAST(q[i] AS DOUBLE) * (mx[i] - mn[i]) "
        f"/ {QLEVELS}.0D), 2.0D) END)"
    )
    mse = F.expr(
        f"aggregate({err2}, 0.0D, (acc, v) -> acc + v)"
    ) / F.size("vec").cast("double")
    return with_q.select(
        id_col,
        F.concat_ws(
            ",", F.expr("transform(q, v -> CAST(v AS STRING))")
        ).alias("q_codes"),
        trunc6(mse).alias("mse"),
    )


def _subvectors(base: DataFrame, m: int, dsub: int) -> DataFrame:
    """One row per (vid, subspace): the length-``dsub`` slice. A single
    generate over an inline struct array — the corpus is read once and
    the explode multiplies rows by m (4), not by dimensionality."""
    structs = ", ".join(
        f"struct({s} AS s, slice(vec, {s * dsub + 1}, {dsub}) AS sv)"
        for s in range(m)
    )
    return base.select(
        "vid", F.explode(F.expr(f"array({structs})")).alias("t")
    ).select(
        "vid", F.col("t.s").alias("s"), F.col("t.sv").alias("sv")
    )


def pq_train_encode(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    iterations: int = PQ_ITERS,
    dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """Train per-subspace codebooks (Lloyd rounds, all subspaces in ONE
    pipeline keyed by ``s``) and encode the corpus.

    Returns (codebooks(s, cid, cvec), codes(vid, s, cid)). Same
    determinism discipline as operators/clustering.kmeans_assign: first-
    ksub init, lowest-cid tie-break, round(avg, 6) centroid components —
    which is what lets the DuckDB oracle replay training exactly.

    Scale: centroids are m·ksub tiny rows (broadcast every round,
    lineage cut); assignment is a broadcast join + min_by hash agg, so
    each round is one narrow pass over the corpus plus a dims-sized
    shuffle for the update."""
    base = with_embedding_norm(emb.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("vid"), "vec"
    )
    # dim is a declared constant, not probed with first(): no driver-side
    # action in the plan-construction path
    dsub = dim // m
    sv = _subvectors(base, m, dsub)
    # init = the ksub LOWEST ids per subspace (window top-k), not
    # filter(vid < ksub): the filter silently yields fewer/zero
    # codewords when ids are not dense 0-based
    w_init = Window.partitionBy("s").orderBy(F.col("vid").asc())
    cents = (
        sv.withColumn("__rn", F.row_number().over(w_init))
        .filter(F.col("__rn") <= ksub)
        .select(
            "s", F.col("vid").alias("cid"), F.col("sv").alias("cvec")
        )
    )

    def assign(c: DataFrame) -> DataFrame:
        scored = sv.join(F.broadcast(c), "s").withColumn(
            "d2", F.expr(DIST2_TPL.format(a="sv", b="cvec"))
        )
        return (
            scored.groupBy("vid", "s")
            .agg(
                F.min_by(
                    F.struct("sv", "cid"), F.struct("d2", "cid")
                ).alias("__m")
            )
            .select(
                "vid",
                "s",
                F.col("__m.sv").alias("sv"),
                F.col("__m.cid").alias("cid"),
            )
        )

    assigned = assign(cents)
    for _ in range(iterations - 1):
        per_dim = (
            assigned.select("s", "cid", F.posexplode("sv").alias("pos", "x"))
            .groupBy("s", "cid", "pos")
            .agg(F.round(F.avg("x"), 6).alias("cx"))
        )
        cents = (
            per_dim.groupBy("s", "cid")
            .agg(
                F.expr(
                    "transform(array_sort(collect_list(struct(pos, cx))), "
                    "t -> t.cx)"
                ).alias("cvec")
            )
            .localCheckpoint()
        )
        assigned = assign(cents)
    return cents, assigned.select("vid", "s", "cid")


# memo value is a weakref to the validated codebook frame: keying on a
# bare id() would let a GC'd frame's address be reused by a DIFFERENT
# codebook and silently skip (or stale-pass) the guard — the weakref
# pins the entry to the object's lifetime, so a recycled id() misses
# (ref() is None or a different object) and re-validates.
_TRAINED_GEOMETRY_OK: dict = {}


def _validate_trained(
    cents: DataFrame, m: int, dim: int, caller: str
) -> None:
    """Geometry guard for a pre-trained (codebooks, codes) pair: after
    training, ``ksub`` is irrelevant (the ADC table joins whatever
    codewords exist) but ``m`` and ``dim`` shape the QUERY subvector
    slices — a mismatch (artifact trained with defaults, caller passing
    m=8) silently misaligns every slice against the codebook subspaces
    and produces wrong distance tables, not an error. One tiny aggregate
    over the m·ksub-row codebook frame (already a materialized
    artifact) turns that into a loud ValueError. Validation is memoized
    per (codebook frame object, m, dim): session artifacts hand every
    consumer the same cached DataFrame, so the guard costs one tiny
    aggregate per (artifact, geometry), not per query call."""
    import weakref

    memo_key = (id(cents), m, dim)
    ref = _TRAINED_GEOMETRY_OK.get(memo_key)
    if ref is not None and ref() is cents:
        return
    row = cents.agg(
        F.countDistinct("s").alias("n_s"),
        F.max(F.size("cvec")).alias("dsub_max"),
        F.min(F.size("cvec")).alias("dsub_min"),
    ).collect()[0]
    dsub = dim // m
    if row.n_s != m or row.dsub_max != dsub or row.dsub_min != dsub:
        raise ValueError(
            f"{caller}: trained codebooks have {row.n_s} subspaces of "
            f"width [{row.dsub_min},{row.dsub_max}] but the call asks "
            f"for m={m}, dim={dim} (subvector width {dsub}) — the ADC "
            "distance tables would be silently wrong. Re-train the "
            "artifact with matching geometry or drop the overrides."
        )
    # drop entries whose frames died — bounds the memo and evicts any
    # reused-id key before it can alias a new frame
    dead = [k for k, r in _TRAINED_GEOMETRY_OK.items() if r() is None]
    for k in dead:
        del _TRAINED_GEOMETRY_OK[k]
    _TRAINED_GEOMETRY_OK[memo_key] = weakref.ref(cents)


def pq_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """PQ ADC top-k: approximate L2 via per-subspace distance tables.

    Each query precomputes d²(query_sub, codeword) for all m·ksub
    codewords (the ADC table — |Q|·m·ksub rows, broadcast); a candidate's
    approximate distance is the sum of m table lookups on its codes.
    Sub-distances are truncated to integer micro-units before the sum so
    the total is order-independent (exact bigint addition) and replays
    identically in SQL — float summation order across the m rows would
    otherwise leak engine internals into the ranking.

    Scale: the corpus is touched as (vid, s, cid) code rows — 2 bytes of
    payload per vector in a real layout — and never re-reads the float
    vectors after encoding; this is the memory shape that lets a
    1000-executor cluster hold a trillion codes. Compose with IVF cell
    pruning (sim_search_ivf) to avoid the full code scan per query.

    ``trained``: a pre-built (codebooks, codes) pair — e.g. the shared
    session artifact (queries/similarity.pq_artifacts) — skips training;
    None trains in-query."""
    if trained is not None:
        cents, codes = trained
        _validate_trained(cents, m, dim, "pq_topk")
    else:
        cents, codes = pq_train_encode(
            emb, id_col, vec_col, m, ksub, dim=dim
        )
    base = with_embedding_norm(emb.select(id_col, vec_col), vec_col).select(
        F.col(id_col).alias("vid"), "vec"
    )
    qsv = _subvectors(
        base.filter(F.col("vid").isin(list(query_ids))), m, dim // m
    )
    dtab = (
        qsv.join(F.broadcast(cents), "s")
        .withColumn("d2", F.expr(DIST2_TPL.format(a="sv", b="cvec")))
        .select(
            F.col("vid").alias("query_id"),
            "s",
            "cid",
            F.floor(F.col("d2") * 1_000_000).cast("long").alias("d2u"),
        )
    )
    scored = (
        codes.join(F.broadcast(dtab), ["s", "cid"])
        .filter(F.col("vid") != F.col("query_id"))
        .groupBy("query_id", "vid")
        .agg(F.sum("d2u").alias("adist_u"))
    )
    return _adc_topk(scored, k)


def _adc_topk(scored: DataFrame, k: int) -> DataFrame:
    """Top-k over (query_id, vid, adist_u) as one rank window —
    WindowGroupLimit prunes per-partition heads below the exchange, so
    no reducer sees the full candidate list and the handwritten
    spark_partition_id() local pass (an extra exchange + sorts per
    query, round 13) is gone."""
    global_w = Window.partitionBy("query_id").orderBy(
        F.col("adist_u").asc(), F.col("vid").asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(global_w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            F.col("vid").alias("vec_id"),
            (F.col("adist_u").cast("double") / F.lit(1_000_000.0)).alias(
                "adist"
            ),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def ivfpq_topk(
    emb: DataFrame,
    query_ids,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "label",
    m: int = PQ_M,
    ksub: int = PQ_KSUB,
    dim: int = 64,
    nprobe: int = 1,
    trained: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-PQ: coarse cell pruning composed with PQ ADC ranking — the
    FAISS IVFPQ shape, and the configuration that actually runs at
    billion-vector scale: each query touches only its ``nprobe`` cells'
    code lists, and each candidate costs m table lookups, never a float
    vector read.

    This variant encodes raw vectors (not cell residuals) so the ADC
    table is query-global and the DuckDB oracle composes the PQ and IVF
    replays directly. Production note: store the cell id WITH the codes
    (one layout, partitioned by cell) — here the cell joins in by id
    because the testdata keeps it as a column."""
    from kafka_streams_dexcom_spark.operators.similarity import (
        ivf_centroids,
    )
    from kafka_streams_dexcom_spark.operators.dedup import DOT_EXPR_TPL

    if trained is not None:
        cents, codes = trained
        _validate_trained(cents, m, dim, "ivfpq_topk")
    else:
        cents, codes = pq_train_encode(
            emb, id_col, vec_col, m, ksub, dim=dim
        )
    base = with_embedding_norm(
        emb.select(id_col, vec_col, cell_col), vec_col
    ).select(F.col(id_col).alias("vid"), "vec", cell_col)
    ivf_cents = ivf_centroids(base, cell_col)
    queries = base.filter(F.col("vid").isin(list(query_ids))).select(
        F.col("vid").alias("query_id"), F.col("vec").alias("qvec")
    )
    # probe by MIN L2 distance to the centroid — the same metric the
    # ADC ranking uses. A max-dot probe diverges on unnormalized
    # embeddings (||q-c||² = ||q||² - 2q·c + ||c||², so centroid norms
    # shift the argmax) and can skip the true nearest cell entirely.
    qc = queries.crossJoin(F.broadcast(ivf_cents)).withColumn(
        "cd2", F.expr(DIST2_TPL.format(a="qvec", b="centroid"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cd2").asc(), F.col(cell_col).asc()
    )
    probe = (
        qc.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= nprobe)
        .select("query_id", F.col(cell_col).alias("cell"))
    )
    qsv = _subvectors(
        base.filter(F.col("vid").isin(list(query_ids))).select("vid", "vec"),
        m,
        dim // m,
    )
    dtab = (
        qsv.join(F.broadcast(cents), "s")
        .withColumn("d2", F.expr(DIST2_TPL.format(a="sv", b="cvec")))
        .select(
            F.col("vid").alias("query_id"),
            "s",
            "cid",
            F.floor(F.col("d2") * 1_000_000).cast("long").alias("d2u"),
        )
    )
    cell_of = base.select("vid", F.col(cell_col).alias("cell"))
    scored = (
        codes.join(cell_of, "vid")
        .join(F.broadcast(probe), "cell")
        .join(F.broadcast(dtab), ["query_id", "s", "cid"])
        .filter(F.col("vid") != F.col("query_id"))
        .groupBy("query_id", "vid")
        .agg(F.sum("d2u").alias("adist_u"))
    )
    return _adc_topk(scored, k)

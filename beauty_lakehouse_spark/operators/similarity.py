"""Similarity search over the embeddings table (north-star extension).

Three paths:

- ``q_knn_brute``  — exact cosine top-k, pure column expressions
  (``zip_with`` dot product folded in doubles). The correctness
  baseline; O(Q·N·d). Used with a bounded query set.
- ``ann_lsh_topk`` — random-hyperplane LSH with multi-table
  OR-construction and multi-probe. Hyperplanes are derived
  deterministically from portable hashes (no RNG, no state to ship);
  search only touches colliding buckets. Best for streaming/append
  corpora (signatures are per-row, no global fit step).
- ``ivf_topk``     — inverted-file index: deterministic k-means coarse
  quantizer, nprobe nearest lists per query, exact rerank of candidates
  only. Best recall/cost on clustered corpora; the Lloyd rounds run on
  a sample at scale.

All approximate paths are registered rows-only; recall on planted
near-duplicates is asserted in tests (the fixture vectors are
near-random, where no sublinear ANN can be high-recall).

Scale notes (100 TB of vectors):
- Brute force is a cross join — never run it unbounded; it exists as
  the oracle for the ANN path and for small query batches.
- The LSH path shuffles each vector once (to its bucket) and each query
  ``C(radius)`` times — no cross join anywhere; bucket sizes are the
  knob (more bits → smaller buckets → lower recall per probe).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load

EMB_DIM = 64


def _dot(a: Column, b: Column) -> Column:
    """Exact dot product in double precision, deterministic fold order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine_topk(
    queries: DataFrame, corpus: DataFrame, k: int = 5
) -> DataFrame:
    """Exact cosine top-k of ``queries`` against ``corpus``.

    Ranking is done on the 4-dp-rounded score with vec_id tiebreak so
    the result is deterministic (and engine-portable)."""
    from pyspark.sql import Window

    # norms precomputed per vector (not per pair): the Q·N scoring loop
    # then does one dot product instead of three
    q = queries.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        _norm(F.col("embedding")).alias("qn"),
    )
    c = corpus.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("cv"),
        _norm(F.col("embedding")).alias("cn"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def q_knn_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 20 vectors."""
    t = load(spark, sf_dir)
    return cosine_topk(
        t.embeddings.filter(F.col("vec_id") < 20), t.embeddings, k=5
    )


# ----- approximate path ------------------------------------------------------


def _hyperplanes(
    spark: SparkSession, n_planes: int, dim: int = EMB_DIM
) -> DataFrame:
    """Deterministic pseudo-random hyperplanes: component (p, j) is a
    ±-uniform value derived from md5(p:j). No RNG state, reproducible on
    any cluster — the property streaming/backfill pipelines need.

    ``n_planes`` is the TOTAL plane count across all hash tables; callers
    slice it into per-table groups."""
    return (
        spark.range(n_planes)
        .select(F.col("id").cast("int").alias("plane"))
        .select(
            "plane",
            F.transform(
                F.sequence(F.lit(0), F.lit(dim - 1)),
                lambda j: (
                    F.conv(
                        F.substring(
                            F.md5(
                            F.concat_ws(
                                ":", F.col("plane").cast("string"), j.cast("string")
                            )
                        ),
                        1,
                        15,
                        ),
                        16,
                        10,
                    ).cast("double")
                    / F.lit(float(2**60))
                    - 0.5
                ),
            ).alias("pv"),
        )
    )


def lsh_signatures(
    vectors: DataFrame, planes: DataFrame, rows_per_table: int
) -> DataFrame:
    """vec_id, table, sig — per-table sign-bit signature of each vector.

    Planes are sliced into consecutive groups of ``rows_per_table``; each
    group is an independent hash table (the OR-construction: a pair is a
    candidate if it collides in ANY table, which is what keeps recall
    high when per-bit agreement is weak)."""
    joined = vectors.crossJoin(F.broadcast(planes))
    bit = F.when(_dot(F.col("embedding"), F.col("pv")) >= 0, 1).otherwise(0)
    return (
        joined.select(
            "vec_id",
            (F.col("plane") / rows_per_table).cast("int").alias("table"),
            (F.col("plane") % rows_per_table).alias("bit_idx"),
            bit.alias("b"),
        )
        .groupBy("vec_id", "table")
        .agg(
            F.sum(
                F.when(
                    F.col("b") == 1,
                    F.expr("shiftleft(CAST(1 AS BIGINT), bit_idx)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("sig")
        )
    )


def lsh_build(
    spark: SparkSession,
    corpus: DataFrame,
    n_planes: int = 8,
    n_tables: int = 6,
    materialize: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Build the LSH index: the hyperplane table and the corpus'
    per-table sign-bit signatures. Returned as (planes, corpus_sig),
    the ``index`` argument of :func:`ann_lsh_topk`.

    Split out (r7) so index CONSTRUCTION — one pass over the corpus,
    amortized over every query batch served from the index — can be
    timed and charged separately from query serving; bench.py records
    ``ann_build_sec`` vs ``ann_serve_sec`` per family. With
    ``materialize`` the components are eagerly checkpointed so serve
    calls never silently re-run the build."""
    planes = _hyperplanes(spark, n_planes * n_tables)
    sig = lsh_signatures(corpus, planes, n_planes)
    if materialize:
        planes = planes.localCheckpoint(eager=True)
        sig = sig.localCheckpoint(eager=True)
    return planes, sig


def ann_lsh_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 8,
    n_tables: int = 6,
    hamming_radius: int = 1,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """Approximate cosine top-k: ``n_tables`` independent sign-bit hash
    tables of ``n_planes`` bits each; probe every bucket within
    ``hamming_radius`` of the query's signature in each table; score the
    deduplicated candidate union exactly.

    Multi-table OR-construction + multi-probe is the standard recall
    lever: cost grows linearly in tables·probes while the corpus is
    touched only where buckets collide — no cross join anywhere."""
    from pyspark.sql import Window

    if index is None:
        index = lsh_build(spark, corpus, n_planes, n_tables, materialize=False)
    planes, csig = index
    qsig = lsh_signatures(queries, planes, n_planes)
    # Probe set per table: own bucket plus every bucket ≤ radius bits
    # away (radius 1 = n_planes 1-bit flips; radius 2 adds the
    # C(n_planes, 2) 2-bit flips — probe count grows combinatorially,
    # which is exactly the multi-probe recall/cost dial).
    if hamming_radius > 2:
        raise ValueError("hamming_radius > 2 not supported (probe blowup)")
    probes = [F.col("sig")]
    if hamming_radius >= 1:
        probes += [
            F.expr(f"sig ^ shiftleft(CAST(1 AS BIGINT), {b})")
            for b in range(n_planes)
        ]
    if hamming_radius >= 2:
        probes += [
            F.expr(
                f"sig ^ shiftleft(CAST(1 AS BIGINT), {a})"
                f" ^ shiftleft(CAST(1 AS BIGINT), {b})"
            )
            for a in range(n_planes)
            for b in range(a + 1, n_planes)
        ]
    qprobe = qsig.select(
        F.col("vec_id").alias("query_id"),
        "table",
        F.explode(F.array(*probes)).alias("bucket"),
    )
    cand = (
        qprobe.join(
            csig.select(
                "table",
                F.col("sig").alias("bucket"),
                F.col("vec_id").alias("neighbor_id"),
            ),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        # dedupe BEFORE scoring: a pair colliding in several tables/probes
        # is scored once
        .distinct()
    )
    scored = (
        cand.join(
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
                _norm(F.col("embedding")).alias("qn"),
            ),
            "query_id",
        )
        .join(
            corpus.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("embedding").alias("cv"),
                _norm(F.col("embedding")).alias("cn"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                _dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")),
                4,
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def q_knn_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN top-5 for the first 20 vectors (approximate — registered
    rows-only; recall vs brute force is asserted in tests)."""
    t = load(spark, sf_dir)
    return ann_lsh_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
    )


def q_knn_lsh_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGH-RECALL LSH configuration (the regime a production
    retrieval pipeline runs at): 16 tables × radius-2 multi-probe vs
    the cheap default's 6 × radius-1 — measured recall@5 ≥ 0.9 on the
    structureless sf0.1 hard case, at ~3x the candidate traffic. Both
    points are recorded by bench.py so the cost/recall curve is a
    regression-guarded artifact, not a claim."""
    t = load(spark, sf_dir)
    return ann_lsh_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
        n_tables=16,
        hamming_radius=2,
    )


# ----- IVF (inverted-file) path ---------------------------------------------


def _normalized(vectors: DataFrame, out: str = "nv") -> DataFrame:
    """vec_id, nv — unit-normalized double vectors (cosine == dot)."""
    return vectors.select(
        "vec_id",
        F.transform(
            "embedding", lambda x: x.cast("double") / F.sqrt(_dot(F.col("embedding"), F.col("embedding")))
        ).alias(out),
    )


def ivf_build(
    corpus: DataFrame, n_centroids: int = 16, iters: int = 3,
    normalized: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Build an IVF index: k-means coarse quantizer over unit vectors.

    Deterministic seeding (the ``n_centroids`` vectors with the smallest
    ``xxhash64(vec_id)`` — no RNG state), then ``iters`` Lloyd rounds as
    DataFrame ops: assignment is a broadcast join against the k-row
    centroid table (linear in corpus, never corpus×corpus), centroid
    update is a posexplode/groupBy element-wise mean. Returns
    (centroids[centroid_id, cv], assignment[vec_id, centroid_id]).

    Scale: at 100 TB you run the Lloyd rounds on a sample and only the
    final assignment over the full corpus — same code, sampled input.

    Lineage: ``v`` is materialized once (it feeds every round) and the
    k-row centroid table is checkpointed per round, so round k's plan
    never embeds rounds 1..k-1 (uncheckpointed, Catalyst re-analysis and
    recomputation grow superlinearly with ``iters``). The returned
    assignment is recomputed against the FINAL centroids — assignments
    and quantizer always agree, so ``ivf_topk``'s inverted lists match
    the centroid table it probes."""
    v = (
        normalized
        if normalized is not None
        else _normalized(corpus).localCheckpoint(eager=True)
    )
    cent = (
        v.orderBy(F.xxhash64(F.lit("ivf-seed"), F.col("vec_id")))
        .limit(n_centroids)
        .select(
            F.row_number()
            .over(Window.orderBy("vec_id"))
            .alias("centroid_id"),
            F.col("nv").alias("cv"),
        )
        .localCheckpoint(eager=True)
    )

    def assign(cent_df: DataFrame) -> DataFrame:
        scored = v.crossJoin(F.broadcast(cent_df)).select(
            "vec_id", "nv", "centroid_id",
            _dot(F.col("nv"), F.col("cv")).alias("sim"),
        )
        return scored.groupBy("vec_id").agg(
            F.max_by(
                "centroid_id",
                F.struct("sim", (-F.col("centroid_id")).alias("tb")),
            ).alias("centroid_id")
        )

    for _ in range(iters):
        assigned = v.join(assign(cent), "vec_id")
        means = (
            assigned.select("centroid_id", F.posexplode("nv").alias("pos", "x"))
            .groupBy("centroid_id", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("centroid_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda s: s["mx"],
                ).alias("mv")
            )
        )
        cent = means.select(
            "centroid_id",
            F.transform(
                "mv", lambda x: x / F.sqrt(_dot(F.col("mv"), F.col("mv")))
            ).alias("cv"),
            # lazy checkpoint: plan truncated per round (bounded
            # re-analysis); the k-row table is materialized once on first
            # use (the next round's broadcast) without a per-round job
        ).localCheckpoint(eager=False)
    return cent, assign(cent)


def ivf_index(
    corpus: DataFrame, n_centroids: int = 16, iters: int = 3
) -> tuple[DataFrame, DataFrame]:
    """Materialized IVF index (centroids, assignment) for serving —
    both components eagerly checkpointed so :func:`ivf_topk` calls
    with ``index=`` pay zero build cost (bench.py times build and
    serve separately since r7)."""
    cent, assign = ivf_build(corpus, n_centroids, iters)
    return (
        cent.localCheckpoint(eager=True),
        assign.localCheckpoint(eager=True),
    )


def ivf_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 3,
    index: tuple[DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF approximate top-k: probe the ``nprobe`` nearest inverted
    lists per query, exact-rerank only those candidates. Touches
    ~nprobe/n_centroids of the corpus per query — the classic
    recall/cost dial (nprobe=n_centroids degrades to exact search).
    ``index`` accepts a prebuilt (centroids, assignment) pair (see
    :func:`ivf_index`) — nprobe is a query-time dial, so one index
    serves every recall configuration."""
    cent, assign = (
        index if index is not None else ivf_build(corpus, n_centroids, iters)
    )
    qn = _normalized(queries, out="qv")
    probes = (
        qn.crossJoin(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            "qv",
            "centroid_id",
            _dot(F.col("qv"), F.col("cv")).alias("csim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("csim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    cand = (
        probes.join(assign, "centroid_id")
        .filter(F.col("query_id") != F.col("vec_id"))
        .join(_normalized(corpus, out="cv2"), "vec_id")
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round(_dot(F.col("qv"), F.col("cv2")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-5 for the first 20 vectors (approximate — registered
    rows-only; recall vs brute force asserted in tests)."""
    t = load(spark, sf_dir)
    return ivf_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
    )


def q_knn_ivf_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGH-RECALL IVF configuration: nprobe=12 of 16 lists (~75% of
    the corpus scanned vs the cheap default's 25%) — measured recall@5
    ≥ 0.9 on the structureless sf0.1 hard case. The nprobe dial is the
    production cost/recall lever; both points are bench-recorded."""
    t = load(spark, sf_dir)
    return ivf_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
        nprobe=12,
    )


#: Centroid fixed-point scale: embeddings are quantized to integer
#: millionths before summation so the aggregate is order-independent
#: and cross-engine exact (float sums are neither).
CENTROID_SCALE = 1_000_000


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the embedding column at fixed precision —
    the class-prototype / cluster-summary aggregate of a vector corpus.

    Exactness: each float is widened to double (lossless), scaled to
    integer millionths with half-up rounding (floor(x·1e6 + 0.5) —
    IEEE-identical in any engine), summed as BIGINT (associative,
    order-independent). The centroid is then ONE IEEE division of two
    exactly-representable integers — bit-deterministic in any engine.
    A naive avg(float) sum depends on partition order and would never
    hash-match an oracle.

    Scale shape: posexplode → groupBy(label, dim) is one shuffle of
    n·d narrow rows with full map-side combine; output is
    |labels|·d rows. No collect_list, no per-group arrays."""
    t = load(spark, sf_dir)
    exploded = t.embeddings.select(
        "label", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "label",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * CENTROID_SCALE + F.lit(0.5))
        .alias("q"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.sum("q").alias("sum_q"),
        (
            F.sum("q").cast("double")
            / (F.count(F.lit(1)) * CENTROID_SCALE).cast("double")
        ).alias("centroid"),
    )


_SCATTER_SCHEMA = "label int, n_vectors long, scatter_q long"


def q_label_embedding_scatter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding scatter (total squared deviation around the
    class centroid, fixed-point): the groupwise-Arrow-UDF demonstrator
    — ``groupBy().applyInPandas`` ships each label's vectors to ONE
    Python worker as an Arrow batch and runs a vectorized numpy kernel.

    STILL oracle-exact: the kernel quantizes to integer millionths and
    computes scatter = Σ_dims (n·Σq² − (Σq)²) — pure int64 arithmetic,
    no division, no float accumulation — so the Arrow path hash-matches
    the DuckDB SQL twin exactly. The pattern to copy when per-group
    logic genuinely needs Python (model scoring, scipy): quantize at
    the boundary, keep the aggregate integer.

    Scale: one shuffle on label; each group must fit a worker's memory
    (fine for class-grain groups; for huge groups, pre-aggregate per
    partition first)."""
    import pandas as pd

    t = load(spark, sf_dir)

    def kernel(pdf: "pd.DataFrame") -> "pd.DataFrame":
        import numpy as np

        q = np.floor(
            np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
            * 1_000_000
            + 0.5
        ).astype(np.int64)
        n = np.int64(q.shape[0])
        s = q.sum(axis=0, dtype=np.int64)
        ss = (q * q).sum(axis=0, dtype=np.int64)
        scatter = int((n * ss - s * s).sum(dtype=np.int64))
        return pd.DataFrame(
            {
                "label": [int(pdf["label"].iloc[0])],
                "n_vectors": [int(n)],
                "scatter_q": [scatter],
            }
        )

    return (
        t.embeddings.select("label", "embedding")
        .groupBy("label")
        .applyInPandas(kernel, schema=_SCATTER_SCHEMA)
    )


#: q_semantic_neardup threshold: cosine ≥ SEM_COS_NUM / SEM_COS_DEN.
SEM_COS_NUM = 4
SEM_COS_DEN = 5
#: Fixed-point quantization scale for the exact cosine test (millionths).
SEM_SCALE = 1_000_000
#: Runtime magnitude guard: |component| ≤ 80 ⇔ |q| ≤ 8·10⁷ keeps every
#: staging of the DECIMAL(38,0) cross-multiplied cosine test in range
#: (see semantic_neardup_pairs docstring). Beyond it the filter would
#: silently null out (pair dropped), so we raise instead.
SEM_MAX_ABS_Q = 80 * SEM_SCALE


def semantic_neardup_pairs(embeddings: DataFrame) -> DataFrame:
    """Core of q_semantic_neardup over any (vec_id, label, embedding)
    DataFrame — separated so tests can drive it with planted
    near-duplicate vectors.

    Magnitude contract: components must satisfy |x| ≲ 80 (unit-norm
    or near-unit vectors — the fixture's regime). The binding limit is
    NOT the int64 dot accumulation (that holds to |x| ≈ 360) but the
    DECIMAL(38,0) cross-multiplied test below: ``dot_q²·25`` must stay
    inside 38 digits, and Spark stages the product, so dot_q beyond
    ~6×10¹⁷ silently nulls the filter (pair dropped) while the DuckDB
    HUGEINT twin still evaluates. |x| ≤ 80 ⇒ q ≤ 8·10⁷ ⇒
    dot_q ≤ 64·(8·10⁷)² ≈ 4.1·10¹⁷ and na·nb·16 ≤ 2.7·10³⁶ — both
    inside DECIMAL(38,0) at every staging. Normalize upstream
    (``_normalized``) before calling this on raw feature vectors.
    Cosine is scale-invariant, so normalizing first never changes
    which pairs clear the threshold (up to quantization).

    The contract is ENFORCED at runtime: any component with
    |q| > ``SEM_MAX_ABS_Q`` raises (``F.raise_error`` folded into the
    norm column, so Catalyst cannot prune the check) instead of
    silently dropping pairs via DECIMAL overflow nulls."""
    nq_raw = F.aggregate(
        F.zip_with(F.col("q"), F.col("q"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    max_abs_q = F.aggregate(
        F.col("q"),
        F.lit(0).cast("long"),
        lambda acc, x: F.greatest(acc, F.abs(x)),
    )
    q = embeddings.select(
        "vec_id",
        "label",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * SEM_SCALE + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("q"),
    ).withColumn(
        "nq",
        F.when(
            max_abs_q > F.lit(SEM_MAX_ABS_Q),
            F.raise_error(
                F.concat(
                    F.lit(
                        "semantic_neardup magnitude contract violated: "
                        "max |component| = "
                    ),
                    (max_abs_q / F.lit(SEM_SCALE)).cast("string"),
                    F.lit(
                        " exceeds 80 (DECIMAL(38,0)-safe bound); "
                        "normalize vectors upstream"
                    ),
                )
            ).cast("long"),
        ).otherwise(nq_raw),
    )
    a = q.select(
        F.col("label"),
        F.col("vec_id").alias("vec_a"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    )
    b = q.select(
        F.col("label"),
        F.col("vec_id").alias("vec_b"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
    )
    pairs = a.join(b, "label").filter(F.col("vec_a") < F.col("vec_b"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    d38 = "decimal(38,0)"
    return (
        pairs.withColumn("dot_q", dot)
        .filter(F.col("dot_q") > 0)
        .filter(
            F.col("dot_q").cast(d38) * F.col("dot_q").cast(d38)
            * F.lit(SEM_COS_DEN * SEM_COS_DEN)
            >= F.lit(SEM_COS_NUM * SEM_COS_NUM)
            * F.col("na").cast(d38) * F.col("nb").cast(d38)
        )
        .select("label", "vec_a", "vec_b", "dot_q", "na", "nb")
    )


#: q_semantic_neardup gate planting: the first SEM_PLANT corpus vectors
#: get a scaled near-copy (vec_id + SEM_PLANT_OFFSET, components ×
#: SEM_PLANT_SCALE) unioned into the corpus, so the gate query proves
#: POSITIVE detection (cosine(x, c·x) ≈ 1 clears the 0.8 threshold)
#: instead of passing vacuously on the near-random fixture's 0 pairs.
SEM_PLANT = 3
SEM_PLANT_OFFSET = 1_000_000
SEM_PLANT_SCALE = 1.001


def q_semantic_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs: within each
    cluster, vector pairs whose cosine similarity clears the threshold.
    Clusters here are the fixture's ``label`` partitions; at scale the
    label column is produced by the IVF k-means assignment
    (``ivf_build``) — same downstream shape, cluster-local pair
    generation only, never corpus × corpus.

    Oracle-exact: floats are quantized to integer millionths
    (floor(x·1e6 + 0.5), IEEE-identical everywhere); the cosine test
    ``dot/√(na·nb) ≥ t`` is evaluated as the integer cross-multiplied
    square ``dot² · t_den² ≥ t_num² · na · nb`` (with dot > 0) in
    DECIMAL(38,0)/HUGEINT — no sqrt, no float comparison, so the
    DuckDB twin hash-matches exactly. The fixture's near-random
    embeddings contain no true pairs, so the gate corpus is the
    fixture UNION ``SEM_PLANT`` deterministic scaled near-copies —
    the oracle plants the same rows, and the result must contain the
    planted pairs (positive detection) and nothing spurious.

    Scale: pairs are generated per cluster (quadratic ONLY within a
    cluster — the IVF cluster size is the knob bounding it); the dot
    products are JVM-side zip_with/aggregate over the two arrays."""
    t = load(spark, sf_dir)
    base = t.embeddings.select("vec_id", "label", "embedding")
    planted = base.filter(F.col("vec_id") < SEM_PLANT).select(
        (F.col("vec_id") + F.lit(SEM_PLANT_OFFSET)).alias("vec_id"),
        "label",
        F.transform(
            "embedding",
            lambda x: x.cast("double") * F.lit(SEM_PLANT_SCALE),
        ).alias("embedding"),
    )
    return semantic_neardup_pairs(base.unionByName(planted))


#: Product-quantization geometry: EMB_DIM is split into PQ_SUBSPACES
#: sub-vectors, each quantized to one of PQ_CODES codebook entries —
#: a 64-dim float vector compresses to PQ_SUBSPACES bytes.
PQ_SUBSPACES = 8
PQ_CODES = 16
PQ_ITERS = 2


def _l2sq(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_train(
    corpus: DataFrame,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODES,
    iters: int = PQ_ITERS,
    normalized: DataFrame | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Product-quantization training: per-subspace k-means codebooks
    (hash-seeded, deterministic — same policy as ``ivf_build``) and the
    encoded corpus. Returns (codebook[s, code, cv], codes[vec_id, s,
    code]).

    PQ is the memory side of large-scale ANN: the corpus compresses
    from EMB_DIM floats to ``m`` bytes per vector (64x here), which is
    what lets a 10⁹-vector index live in RAM. Same lineage policy as
    the other iterative ops: sub-vector table checkpointed eagerly
    (feeds every round), codebook lazily per round; the returned codes
    are assigned against the FINAL codebook."""
    d = EMB_DIM // m
    v = (
        normalized
        if normalized is not None
        else _normalized(corpus).localCheckpoint(eager=True)
    )
    sub = (
        v.select(
            "vec_id",
            F.explode(
                F.expr(
                    f"transform(sequence(0, {m - 1}), s -> "
                    f"named_struct('s', s, 'sv', slice(nv, s * {d} + 1, {d})))"
                )
            ).alias("x"),
        )
        .select("vec_id", F.col("x.s").alias("s"), F.col("x.sv").alias("sv"))
        .localCheckpoint(eager=True)
    )
    seed_order = Window.partitionBy("s").orderBy(
        F.xxhash64(F.lit("pq-seed"), F.col("s"), F.col("vec_id"))
    )
    cb = (
        sub.withColumn("code", F.row_number().over(seed_order))
        .filter(F.col("code") <= k)
        .select("s", "code", F.col("sv").alias("cv"))
        .localCheckpoint(eager=True)
    )

    def assign(cb_df: DataFrame) -> DataFrame:
        return (
            sub.join(F.broadcast(cb_df), "s")
            .select(
                "vec_id", "s", "code",
                _l2sq(F.col("sv"), F.col("cv")).alias("d2"),
            )
            .groupBy("vec_id", "s")
            .agg(
                F.min_by("code", F.struct("d2", "code")).alias("code")
            )
        )

    for _ in range(iters):
        a = assign(cb)
        recomputed = (
            sub.join(a, ["vec_id", "s"])
            .select("s", "code", F.posexplode("sv").alias("pos", "x"))
            .groupBy("s", "code", "pos")
            .agg(F.avg("x").alias("mx"))
            .groupBy("s", "code")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mx"))),
                    lambda t: t["mx"],
                ).alias("cv")
            )
        )
        # Empty-cluster fallback: a code that lost every member would
        # vanish from the recomputed table and silently shrink k for all
        # later rounds; keep its previous centroid instead (standard
        # k-means practice), so the codebook always has m·k rows.
        cb = (
            cb.select("s", "code", F.col("cv").alias("prev_cv"))
            .join(
                recomputed.select("s", "code", F.col("cv").alias("new_cv")),
                ["s", "code"],
                "left",
            )
            .select("s", "code", F.coalesce("new_cv", "prev_cv").alias("cv"))
            .localCheckpoint(eager=False)
        )
    return cb, assign(cb)


def _query_subvectors(qn: DataFrame) -> DataFrame:
    """(query_id, s, qsv) — per-subspace query sub-vectors from a
    ``_normalized(..., out="qv")`` table. Shared by pq_topk/ivfpq_topk."""
    d = EMB_DIM // PQ_SUBSPACES
    return qn.select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {PQ_SUBSPACES - 1}), s -> "
                f"named_struct('s', s, 'qsv', slice(qv, s * {d} + 1, {d})))"
            )
        ).alias("x"),
    ).select("query_id", F.col("x.s").alias("s"), F.col("x.qsv").alias("qsv"))


#: ADC rerank pool multiplier: the exact rerank scores the ADC top
#: (k · PQ_RERANK_FACTOR) candidates, returning the true-cosine top-k.
#: Quantized distances are noisy (m·k codebook resolution), so an
#: exactly-k pool makes every ADC miss unrecoverable. Measured
#: recall@5 at sf0.1 on the near-random fixture (the hard case — no
#: planted structure): factor 1 → 0.09, 4 → 0.23, 8 → 0.41, 16 → 0.54
#: for knn_pq; the cost is factor·k full-vector reads per query —
#: negligible against any corpus scan at every scale. Round 5 runs
#: at 16: the extra 2x of rerank traffic is still ~k·16 row reads per
#: query (nothing at any scale), and it buys +0.13 recall on the
#: hardest (structureless) input; drop back toward 8 only if the
#: rerank read path ever becomes the measured bottleneck.
PQ_RERANK_FACTOR = 16


def _adc_rerank(
    scored: DataFrame,
    qn: DataFrame,
    cn: DataFrame,
    k: int,
    factor: int = PQ_RERANK_FACTOR,
) -> DataFrame:
    """Common PQ tail: keep each query's (k · PQ_RERANK_FACTOR) best
    candidates by ADC distance, EXACT-rerank those survivors, and
    return the top-k — ``rk`` orders by true cosine (ties by neighbor
    id), matching ivf_topk's contract; ``adc_d2`` stays in the row for
    diagnostics.

    ``qn``/``cn`` are ALREADY-normalized (vec_id, <vector>) tables —
    callers hold a (often checkpointed) normalization of both sides, so
    the rerank reuses it instead of re-deriving the normalization scan."""
    qcol = [c for c in qn.columns if c != "vec_id"][0]
    ccol = [c for c in cn.columns if c != "vec_id"][0]
    w_adc = Window.partitionBy("query_id").orderBy(
        F.asc("adc_d2"), F.asc("vec_id")
    )
    top = (
        scored.withColumn("adc_rk", F.row_number().over(w_adc))
        .filter(F.col("adc_rk") <= k * factor)
    )
    exact = (
        top.join(cn.select("vec_id", F.col(ccol).alias("cv2")), "vec_id")
        .join(
            qn.select(F.col("vec_id").alias("query_id"), F.col(qcol).alias("qv2")),
            "query_id",
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.round("adc_d2", 4).alias("adc_d2"),
            F.round(_dot(F.col("qv2"), F.col("cv2")), 4).alias("cos_sim"),
        )
    )
    w_exact = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return exact.withColumn(
        "rk", F.row_number().over(w_exact).cast("int")
    ).filter(F.col("rk") <= k)


def pq_build(
    corpus: DataFrame,
    m: int = PQ_SUBSPACES,
    k: int = PQ_CODES,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Materialized PQ index (normalized-corpus, codebook, codes) for
    serving — eagerly checkpointed; the ``index=`` argument of
    :func:`pq_topk`."""
    v = _normalized(corpus).localCheckpoint(eager=True)
    cb, codes = pq_train(corpus, m=m, k=k, normalized=v)
    return (
        v,
        cb.localCheckpoint(eager=True),
        codes.localCheckpoint(eager=True),
    )


def ivfpq_build(
    corpus: DataFrame, n_centroids: int = 16
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame]:
    """Materialized IVF-PQ index (normalized-corpus, centroids,
    assignment, codebook, codes) — eagerly checkpointed; the
    ``index=`` argument of :func:`ivfpq_topk`. The normalized corpus
    is shared by both quantizers, exactly as the inline build does."""
    v = _normalized(corpus).localCheckpoint(eager=True)
    cent, assign = ivf_build(corpus, n_centroids, iters=3, normalized=v)
    cb, codes = pq_train(corpus, normalized=v)
    return (
        v,
        cent.localCheckpoint(eager=True),
        assign.localCheckpoint(eager=True),
        cb.localCheckpoint(eager=True),
        codes.localCheckpoint(eager=True),
    )


def pq_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    rerank_factor: int = PQ_RERANK_FACTOR,
    index: tuple[DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """PQ/ADC approximate top-k: score every corpus vector against a
    query using only its ``m`` codes and the query's per-subspace
    distance table (asymmetric distance computation), then exact-rerank
    the top k·PQ_RERANK_FACTOR survivors down to k.

    The scan is linear but touches 8 BYTES per corpus vector instead
    of 256 float bytes — at 10⁹ vectors the whole index is ~8 GB and
    the distance tables (m·k doubles per query) broadcast for free.
    Composes with IVF (probe lists first, ADC inside lists) for the
    standard IVF-PQ index; kept separate here so each dial is
    testable alone. ``index`` accepts a prebuilt (normalized-corpus,
    codebook, codes) triple (see :func:`pq_build`) — rerank_factor is
    query-time, one index serves every configuration."""
    if index is not None:
        v, cb, codes = index
    else:
        v = _normalized(corpus).localCheckpoint(eager=True)
        cb, codes = pq_train(corpus, normalized=v)
    qn = _normalized(queries, out="qv")
    qsub = _query_subvectors(qn)
    dt = qsub.join(F.broadcast(cb), "s").select(
        "query_id", "s", "code", _l2sq(F.col("qsv"), F.col("cv")).alias("d2")
    )
    scored = (
        codes.join(F.broadcast(dt), ["s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc_d2"))
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    return _adc_rerank(scored, qn, v, k, rerank_factor)


def q_knn_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ/ADC ANN top-5 for the first 20 vectors (approximate —
    registered rows-only; recall vs brute force asserted in tests)."""
    t = load(spark, sf_dir)
    return pq_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
    )


def ivfpq_topk(
    spark: SparkSession,
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 6,
    rerank_factor: int = PQ_RERANK_FACTOR,
    index: tuple[
        DataFrame, DataFrame, DataFrame, DataFrame, DataFrame
    ] | None = None,
) -> DataFrame:
    """IVF-PQ: the standard billion-scale index — IVF inverted lists
    bound WHICH vectors are scored (nprobe/n_centroids of the corpus),
    PQ codes bound WHAT is read per scored vector (m bytes instead of
    the full float vector), ADC does the scoring, and only the top-k
    survivors touch their original vectors for the exact rerank.

    Composition of the two audited dials: coarse quantizer =
    ``ivf_build`` (recall/cost via nprobe), fine quantizer =
    ``pq_train`` (memory via m·k). At 10⁹ vectors: inverted lists
    partition the corpus, codes are ~8 GB, distance tables broadcast,
    and the rerank reads ~k·PQ_RERANK_FACTOR·queries full vectors
    total. ``index`` accepts a prebuilt (normalized-corpus, centroids,
    assignment, codebook, codes) tuple (see :func:`ivfpq_build`) —
    nprobe and rerank_factor are query-time dials."""
    if index is not None:
        v, cent, assign, cb, codes = index
    else:
        v = _normalized(corpus).localCheckpoint(eager=True)
        cent, assign = ivf_build(corpus, n_centroids, iters=3, normalized=v)
        cb, codes = pq_train(corpus, normalized=v)
    qn = _normalized(queries, out="qv")
    probes = (
        qn.crossJoin(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            "qv",
            "centroid_id",
            _dot(F.col("qv"), F.col("cv")).alias("csim"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("csim"), F.asc("centroid_id")
                )
            ),
        )
        .filter(F.col("rk") <= nprobe)
        .select("query_id", "qv", "centroid_id")
    )
    qsub = _query_subvectors(qn)
    dt = qsub.join(F.broadcast(cb), "s").select(
        "query_id", "s", "code", _l2sq(F.col("qsv"), F.col("cv")).alias("d2")
    )
    in_lists = probes.join(assign, "centroid_id").select(
        "query_id", "vec_id"
    )
    scored = (
        in_lists.join(codes, "vec_id")
        .join(F.broadcast(dt), ["query_id", "s", "code"])
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d2").alias("adc_d2"))
        .filter(F.col("query_id") != F.col("vec_id"))
    )
    return _adc_rerank(scored, qn, v, k, rerank_factor)


def q_knn_pq_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGH-RECALL PQ configuration: rerank pool k·128 (vs the cheap
    default's k·16) — measured recall@5 0.97 at sf0.1. The rerank pool
    is PQ's recall dial on structureless data (the 8-byte codes bound
    what ADC alone can rank); pool reads are k·factor full vectors per
    query — still negligible traffic at corpus scale."""
    t = load(spark, sf_dir)
    return pq_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
        rerank_factor=128,
    )


def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-5 for the first 20 vectors (approximate —
    registered rows-only; recall vs brute force asserted in tests)."""
    t = load(spark, sf_dir)
    return ivfpq_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
    )


#: q_embedding_quantize_int8 fixed-point input scale (micro-units, the
#: same lossless pre-quantization the centroid aggregate uses).
INT8_IN_SCALE = 1_000_000


def q_embedding_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension affine int8 scalar quantization of the embedding
    corpus — the standard 4× vector-compression step before ANN
    serving — with exact reconstruction-error accounting.

    Each float is first widened to integer micro-units (floor(x·1e6 +
    0.5), IEEE-identical in any engine); per-dimension min/max are then
    exact integer aggregates, and the code is the half-up integer
    ``round((q − min)·255 / (max − min)) − 128`` (``functions.
    halfup_div`` — DECIMAL(38,0) on Spark, HUGEINT on DuckDB).
    Constant dimensions (max = min) code to −128. De-quantization
    ``min + round(code·range/255)`` is the same exact integer form, so
    the per-vector L1/max reconstruction error in micro-units — and the
    md5 over the dim-ordered code string — hash-match the oracle
    bit-for-bit. No float arithmetic anywhere between input widening
    and the final report.

    Scale shape: posexplode → d-row min/max dim profile (map-side
    combinable) → broadcast back into the exploded scan → one groupBy
    (vec_id) re-collapse. Two narrow shuffles, rows = n·d, output = n
    rows; the dim profile is d rows regardless of corpus size."""
    from ..functions import halfup_div

    t = load(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * INT8_IN_SCALE + F.lit(0.5))
        .alias("q"),
    )
    prof = ex.groupBy("dim").agg(
        F.min("q").alias("minq"), F.max("q").alias("maxq")
    )
    rng = F.col("maxq") - F.col("minq")
    coded = ex.join(F.broadcast(prof), "dim").select(
        "vec_id",
        "dim",
        "q",
        "minq",
        "maxq",
        F.when(rng == 0, F.lit(0))
        .otherwise(halfup_div((F.col("q") - F.col("minq")) * 255, rng, 0))
        .cast("long")
        .alias("code0"),
    )
    recon = F.col("minq") + F.when(
        F.col("maxq") == F.col("minq"), F.lit(0)
    ).otherwise(
        halfup_div(F.col("code0") * (F.col("maxq") - F.col("minq")), F.lit(255), 0)
    ).cast("long")
    scored = coded.select(
        "vec_id",
        "dim",
        (F.col("code0") - 128).alias("code"),
        F.abs(F.col("q") - recon).alias("err"),
    )
    return (
        scored.groupBy("vec_id")
        .agg(
            F.count(F.lit(1)).alias("n_dims"),
            F.sum("err").alias("l1_err_micro"),
            F.max("err").alias("max_err_micro"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("dim", "code"))
                        ),
                        lambda s: s["code"].cast("string"),
                    ),
                    ",",
                )
            ).alias("codes_md5"),
        )
        .select(
            "vec_id",
            F.col("n_dims").cast("int").alias("n_dims"),
            "l1_err_micro",
            "max_err_micro",
            "codes_md5",
        )
    )


#: q_kmeans_round geometry: cluster count, and the non-negativity shift
#: for the half-up centroid division (|q| provably < KMEANS_OFFSET for
#: any input with |x| < 4 — the fixtures are unit-scale).
KMEANS_K = 8
KMEANS_OFFSET = 4_000_000


def q_kmeans_round(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration of k-means over the embedding corpus —
    the verifiable building block behind the (rows-only, multi-round)
    ``ivf_build`` trainer: hash-seeded init, integer-L2 assignment,
    exact integer centroid update, all oracle-matched.

    Determinism: seeds are the ``KMEANS_K`` vectors with the smallest
    md5-derived ``portable_hash64('km:' || vec_id)`` (tie: vec_id) —
    no RNG, identical in SQL. Vectors are widened to integer
    micro-units; squared L2 distance is then an exact int64 sum
    (|diff| ≤ 2e6, d = 64 → ≤ 2.6e14), argmin ties break to the
    smallest cluster id. The centroid update emits (n, Σq) exactly,
    plus the half-up integer mean via the shifted ``halfup_div``
    (q + OFFSET ≥ 0 keeps the half-up contract; both engines shift
    identically, so the round-trip is bit-equal).

    Scale shape: the k·d seed table broadcasts; assignment is the
    exploded scan joined per-dim against it — n·d·k narrow rows with
    full map-side combine into (vec, cluster) partials, the same dense
    assign every distributed k-means runs. Update is one more
    map-side-combinable groupBy. To train for real: run this round's
    plan ``iters`` times on a sample (see ``ivf_build``), full corpus
    only for the final assignment."""
    from ..functions import halfup_div, portable_hash64

    t = load(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * INT8_IN_SCALE + F.lit(0.5))
        .alias("q"),
    ).cache()  # feeds seeds, distances and update
    seeds = (
        t.embeddings.select("vec_id")
        .orderBy(
            portable_hash64(
                F.concat(F.lit("km:"), F.col("vec_id").cast("string"))
            ),
            "vec_id",
        )
        .limit(KMEANS_K)
        .select(
            F.row_number()
            .over(
                Window.orderBy(
                    portable_hash64(
                        F.concat(F.lit("km:"), F.col("vec_id").cast("string"))
                    ),
                    "vec_id",
                )
            )
            .alias("cluster_id"),
            "vec_id",
        )
    )
    seed_ex = seeds.join(ex, "vec_id").select(
        "cluster_id", "dim", F.col("q").alias("c")
    )
    dist = (
        ex.join(F.broadcast(seed_ex), "dim")
        .groupBy("vec_id", "cluster_id")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
             .alias("dist"))
    )
    assign = dist.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cluster_id")).alias("m")
    ).select("vec_id", F.col("m.cluster_id").alias("cluster_id"))
    return (
        ex.join(assign, "vec_id")
        .groupBy("cluster_id", "dim")
        .agg(F.count(F.lit(1)).alias("n_members"), F.sum("q").alias("sum_q"))
        .select(
            "cluster_id",
            "dim",
            "n_members",
            "sum_q",
            (
                halfup_div(
                    F.col("sum_q") + F.col("n_members") * KMEANS_OFFSET,
                    F.col("n_members"),
                    0,
                ).cast("long")
                - KMEANS_OFFSET
            ).alias("centroid_micro"),
        )
    )


def q_knn_ivfpq_hi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HIGH-RECALL IVF-PQ configuration: nprobe 12/16 + rerank pool
    k·128 — measured recall@5 0.93 at sf0.1. Both dials of the
    composed index opened together (lists visited x rerank pool)."""
    t = load(spark, sf_dir)
    return ivfpq_topk(
        spark,
        t.embeddings.filter(F.col("vec_id") < 20),
        t.embeddings,
        k=5,
        nprobe=12,
        rerank_factor=128,
    )


#: q_pca_power_iteration geometry: fixed round count and the L-inf
#: normalization scale (max-|component| maps to exactly 2^20).
PCA_ROUNDS = 5
PCA_VSCALE = 1 << 20


def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the embedding corpus by POWER
    ITERATION — distributed iterative linear algebra made bit-exact:
    centered Gram matrix in exact integers, five matrix–vector rounds,
    deterministic L∞ normalization, canonical sign — every number
    hash-matches the DuckDB twin (which unrolls the same five rounds
    as CTEs).

    Exactness ingredients: micro-unit quantization (as everywhere);
    centering as c = n·q − Σq (scale-by-n keeps integers; direction is
    unchanged); Gram entries Σ cᵢ·c_j in DECIMAL(38,0)/HUGEINT;
    per-round renormalization v ← sign(w)·⌊|w|·2^20 / max|w|⌋ (the max
    component is exactly ±2^20, truncation toward zero on both
    engines); final sign flipped so the largest-|v| (smallest-dim on
    ties) component is positive. 38-digit budget (the binding term is
    |w|·2^20 with |w| ≤ d·gram·2^20 and gram ≤ 4n³·10¹²): holds to
    n ≈ 1.5e4 vectors as written; for larger corpora downshift the
    centered values by a power of two first (same deterministic policy
    as the drift PSI) — the direction is unchanged.

    Scale: the Gram build is the n·d² explode-join — d² = 4096 rows
    per vector, the standard dense-covariance shuffle, map-side
    combinable to the d×d grid; each round then runs on d² + d rows
    regardless of corpus size (broadcast the d-row vector). Rounds are
    lazily checkpointed so round k's plan does not embed rounds
    1..k−1."""
    from ..functions import _idiv

    d38 = "decimal(38,0)"
    t = load(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1_000_000 + F.lit(0.5)).alias("q"),
    )
    nn = t.embeddings.agg(F.count(F.lit(1)).alias("n"))
    msum = ex.groupBy("dim").agg(F.sum("q").alias("m"))
    # r14 (§2.5 exploding join): the Gram self-join multiplies each
    # vector's d rows into d² pairs — its OUTPUT is n·d² rows while
    # its input is only n·d, so sizing the stage by input bytes (what
    # AQE's coalescing and the single-file scan both do) ran the whole
    # n·d² multiply-aggregate as ONE task (measured: one 3.2 s stage
    # holding ~100% of the query's CPU at sf0.1). Partition the
    # centered matrix by vec_id at a width derived from the OUTPUT
    # volume (~4M pair-rows per task, capped at the session
    # parallelism); the vec_id-keyed repartition keeps both join sides
    # co-partitioned. n_vecs is a parquet metadata count (no scan).
    n_vecs = t.embeddings.count()
    gram_goal = int(
        max(
            1,
            min(
                spark.sparkContext.defaultParallelism,
                n_vecs * EMB_DIM * EMB_DIM // 4_000_000 + 1,
            ),
        )
    )
    cx = (
        ex.join(F.broadcast(msum), "dim")
        .crossJoin(F.broadcast(nn))
        .select(
            "vec_id",
            "dim",
            (
                F.col("n").cast(d38) * F.col("q").cast(d38)
                - F.col("m").cast(d38)
            ).alias("c"),
        )
        .repartition(gram_goal, "vec_id")
        .localCheckpoint(eager=False)
    )
    gram = (
        cx.alias("a")
        .join(cx.alias("b"), "vec_id")
        .groupBy(F.col("a.dim").alias("di"), F.col("b.dim").alias("dj"))
        .agg(F.sum(F.col("a.c") * F.col("b.c")).alias("val"))
        .localCheckpoint(eager=False)
    )
    v = msum.select("dim", F.lit(1).cast("long").alias("v"))
    for i in range(PCA_ROUNDS):
        w = (
            gram.join(F.broadcast(v.withColumnRenamed("dim", "di")), "di")
            .groupBy(F.col("dj").alias("dim"))
            .agg(F.sum(F.col("val") * F.col("v").cast(d38)).alias("w"))
        )
        mx = w.agg(
            F.greatest(F.max(F.abs(F.col("w"))), F.lit(1).cast(d38)).alias("mx")
        )
        v = (
            w.crossJoin(F.broadcast(mx))
            .select(
                "dim",
                (
                    F.when(F.col("w") < 0, F.lit(-1)).otherwise(F.lit(1))
                    * _idiv(F.abs(F.col("w")) * F.lit(PCA_VSCALE), F.col("mx"))
                ).cast("long").alias("v"),
            )
        )
        # checkpoint every 2nd round (§2.2): the vector is D rows and
        # referenced once per round (the gram broadcast join), so the
        # odd round's plan recomputes nothing — half the per-round
        # materialization round-trips, lineage bounded at two rounds
        if (i + 1) % 2 == 0 or i == PCA_ROUNDS - 1:
            v = v.localCheckpoint(eager=False)
    pick = v.select(
        F.max(F.struct(F.abs(F.col("v")).alias("a"), (-F.col("dim")).alias("nd"), F.col("v").alias("v"))).alias("p")
    ).select(
        F.when(F.col("p.v") < 0, F.lit(-1)).otherwise(F.lit(1)).alias("s")
    )
    return v.crossJoin(F.broadcast(pick)).select(
        "dim", (F.col("v") * F.col("s")).cast("long").alias("v")
    )


#: q_embedding_random_projection output dimensionality.
RP_DIMS = 16


def q_embedding_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson–Lindenstrauss sketch: project every embedding from 64 to
    ``RP_DIMS`` dimensions with a deterministic ±1 sign matrix
    (Achlioptas construction) — the standard cheap dimensionality
    reduction in front of ANN / clustering, in exact integers.

    The sign s(k, j) is the parity of ``portable_hash64('jl:k:j')`` —
    no RNG state, identical in SQL — and the output component is the
    exact integer Σⱼ s(k,j)·qⱼ over micro-unit values, so the sketch
    hash-matches the oracle bit-for-bit. E‖Px‖² = k·‖x‖² under this
    construction; the pytest checks the norm-concentration ratio on
    the fixture.

    Scale: the k·d sign matrix (1024 rows) broadcasts; the projection
    is one map-side-combinable groupBy of n·d·k narrow rows — same
    shape as the k-means assign, no UDFs, no shuffle beyond the
    (vec, out_dim) combine."""
    from ..functions import portable_hash64

    t = load(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * 1_000_000 + F.lit(0.5)).alias("q"),
    )
    signs = (
        spark.range(RP_DIMS)
        .select((F.col("id") + 1).cast("int").alias("k"))
        .crossJoin(
            spark.range(EMB_DIM).select((F.col("id") + 1).cast("int").alias("dim"))
        )
        .select(
            "k",
            "dim",
            (
                F.pmod(
                    portable_hash64(
                        F.concat_ws(
                            ":", F.lit("jl"), F.col("k").cast("string"),
                            F.col("dim").cast("string"),
                        )
                    ),
                    F.lit(2),
                )
                * 2
                - 1
            ).cast("long").alias("s"),
        )
    )
    return (
        ex.join(F.broadcast(signs), "dim")
        .groupBy("vec_id", F.col("k").alias("out_dim"))
        .agg(F.sum(F.col("s") * F.col("q")).alias("value"))
    )


# ---------------------------------------------------------------------------
# Embedding outlier detection (distance-to-centroid 3-sigma, exact)
# ---------------------------------------------------------------------------


def embedding_outlier_flags(embeddings: DataFrame) -> DataFrame:
    """Core of q_embedding_outliers over any (vec_id, label, embedding)
    DataFrame — separated so tests can drive it with planted far
    vectors. See the registered query's docstring for the exactness
    and magnitude contracts."""
    from ..functions import halfup_div

    ex = embeddings.select(
        "vec_id",
        "label",
        F.posexplode("embedding").alias("dim", "x"),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("x").cast("double") * CENTROID_SCALE + F.lit(0.5))
        .cast("long")
        .alias("q"),
    ).cache()  # feeds centroid build AND distance scan
    cent = ex.groupBy("label", "dim").agg(
        (
            halfup_div(
                F.sum("q") + F.count(F.lit(1)) * KMEANS_OFFSET,
                F.count(F.lit(1)),
                0,
            ).cast("long")
            - KMEANS_OFFSET
        ).alias("c")
    )
    d2 = (
        ex.join(F.broadcast(cent), ["label", "dim"])
        .groupBy("vec_id", "label")
        .agg(
            F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
            .alias("dist2_q")
        )
    )
    d38 = "decimal(38,0)"
    stats = d2.groupBy("label").agg(
        F.count(F.lit(1)).cast(d38).alias("m"),
        F.sum(F.col("dist2_q").cast(d38)).alias("s"),
        F.sum(F.col("dist2_q").cast(d38) * F.col("dist2_q").cast(d38)).alias(
            "qq"
        ),
        F.max("dist2_q").alias("mx"),
    )
    dev = F.col("m") * F.col("dist2_q").cast(d38) - F.col("s")
    # Runtime magnitude guard (r7, same policy as semantic_neardup):
    # the binding term is the RHS 9·(m·qq − s²) — since qq ≤ m·mx²,
    # 9·m·qq ≤ 9·(m·mx)², so DECIMAL(38,0) safety needs
    # m·max(dist²) < √(10³⁸/9) ≈ 3.33·10¹⁸ (dev² ≤ (m·mx)² is then
    # ≤ 1.1·10³⁷, also safe). Beyond that Spark silently nulls
    # is_outlier while the HUGEINT oracle (max ~1.7·10³⁸) still
    # computes — a cross-engine divergence. The guard compares in
    # double with a safety margin and RAISES instead of relying on
    # the docstring's downshift lever.
    overflow = (
        F.col("m").cast("double") * F.col("mx").cast("double")
        > F.lit(3.3e18)
    )
    flag = (dev > 0) & (
        dev * dev
        > F.lit(9) * (F.col("m") * F.col("qq") - F.col("s") * F.col("s"))
    )
    return (
        d2.join(F.broadcast(stats), "label")
        .select(
            "vec_id",
            "label",
            "dist2_q",
            F.when(
                overflow,
                F.raise_error(
                    F.lit(
                        "embedding_outlier_flags magnitude contract "
                        "violated: m * max(dist2) approaches the "
                        "DECIMAL(38,0) bound; downshift dist2 by a power "
                        "of two upstream"
                    )
                ).cast("boolean"),
            )
            .otherwise(flag)
            .alias("is_outlier"),
        )
    )


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space data quality: flag vectors whose squared
    distance to their label's centroid sits more than 3 population
    standard deviations above the label mean — the mislabeled-example
    / corrupt-embedding detector every vector corpus audit runs.

    Exactness: components quantize to integer millionths, the centroid
    is the HALF-UP integer mean per (label, dim) (the kmeans_round
    offset trick for negatives), dist² = Σ(q−c)² stays in int64
    independent of corpus size (bounded by dimension × component
    range, not by n), and the 3σ flag is the integer cross-multiply
    ``(m·d − S)² > 9·(m·Q − S²)`` with m·d > S, in DECIMAL(38,0) —
    no float mean/variance/sqrt anywhere, bit-identical cross-engine.

    Scale: one posexplode shuffle to (label, dim) grain, centroids
    broadcast back, label stats are a |labels|-row broadcast — the
    same two-aggregate shape as customer_spend_outliers. Magnitude
    bound: with unit-norm 64-dim vectors dist² ≤ ~2.6·10¹⁴, so the
    cross-multiplied test stays inside DECIMAL(38,0) up to ~4·10⁴
    vectors per label; beyond that, downshift dist² by a power of two
    before the moment stage (deterministic quantization — same flag
    both engines) — the documented lever, not silently applied."""
    t = load(spark, sf_dir)
    return embedding_outlier_flags(
        t.embeddings.select("vec_id", "label", "embedding")
    )


# ---------------------------------------------------------------------------
# Maintained LSH index (integer-portable signatures + versioned-table MERGE)
# ---------------------------------------------------------------------------

#: Integer-portable signature geometry: LSH_IDX_PLANES sign bits split
#: into tables of LSH_IDX_BITS bits each (6 tables x 8 bits — the same
#: shape the float ann_lsh_topk default serves).
LSH_IDX_PLANES = 48
LSH_IDX_BITS = 8
#: Incremental-maintenance split: vectors below are the "existing
#: index", at/above are the "incoming batch" (mirrors the documents
#: table's INCREMENTAL_SPLIT_ID convention).
LSH_IDX_SPLIT = 400

#: Session-scoped cache of the maintained index table path, keyed by
#: (applicationId, sf_dir, fixture fingerprint) — the index is a
#: persistent artifact; one session never re-runs the build+merge for
#: the same corpus. The fingerprint (embeddings parquet mtime+size,
#: see `_fixture_fingerprint`) invalidates the cache if the fixture at
#: the same path is regenerated within one application (ADVICE r7).
_LSH_INDEX_CACHE: dict[tuple[str, str, str], str] = {}

#: Temp dirs created for maintained-index tables, removed at
#: interpreter exit (they are per-process scratch, not durable tables).
_LSH_INDEX_TMPDIRS: list[str] = []


def _fixture_fingerprint(sf_dir: str) -> str:
    """Cheap content fingerprint of the embeddings fixture: the
    (mtime_ns, size) of every file under embeddings.parquet,
    RECURSIVELY (partitioned fixtures nest files in subdirectories;
    a flat listdir would miss an in-place regeneration — ADVICE r8).
    Changes whenever the fixture is rewritten, without reading data."""
    root = os.path.join(sf_dir, "embeddings.parquet")
    parts: list[str] = []
    if os.path.isdir(root):
        for dirpath, dirnames, filenames in os.walk(root):
            dirnames.sort()
            rel = os.path.relpath(dirpath, root)
            for name in sorted(filenames):
                st = os.stat(os.path.join(dirpath, name))
                parts.append(f"{rel}/{name}:{st.st_mtime_ns}:{st.st_size}")
    elif os.path.exists(root):
        st = os.stat(root)
        parts.append(f"{st.st_mtime_ns}:{st.st_size}")
    return "|".join(parts)


def _cleanup_lsh_tmpdirs() -> None:
    import shutil

    for d in _LSH_INDEX_TMPDIRS:
        shutil.rmtree(d, ignore_errors=True)


import atexit as _atexit

_atexit.register(_cleanup_lsh_tmpdirs)


def lsh_int_signatures(spark: SparkSession, vectors: DataFrame) -> DataFrame:
    """Integer-exact LSH sign-bit signatures: (vec_id, table, sig).

    Unlike the float serving path (`lsh_signatures`), every quantity
    here is integer so the signature is bit-identical in any engine:
    plane component (p, j) = portable_hash64("lshidx:p:j") − 2⁵⁹
    (±-uniform int), embedding components quantized to millionths,
    bit p set iff Σⱼ eq·pc ≥ 0 evaluated in DECIMAL(38,0) (terms ≤
    ~5·10²⁵, 64-term sums ≤ ~3·10²⁷ — comfortably exact). A
    deterministic-integer index is what makes INCREMENTAL maintenance
    sound: a vector's signature never depends on the rest of the
    corpus, so the maintained table equals a rebuild row-for-row.

    Scale: the plane grid is a constant 48×64-row broadcast; the
    vector side explodes to (vec, dim) grain and two map-side-
    combinable groupBys produce dots then packed signature words.

    Arithmetic (r14 §2.3, narrower types on the hot aggregate): the
    sign of Σⱼ eq·pc is decided in pure int64 by splitting the plane
    component at bit 30 (pc = pc_hi·2³⁰ + pc_lo, pc_lo ∈ [0, 2³⁰)) —
    the r13 form multiplied DECIMAL(38,0) per (vec, dim, plane) term.
    Exactness: |pc| < 2⁵⁹ ⇒ |pc_hi| < 2²⁹; the quantized components
    satisfy |eq| ≤ 10⁸ (the kernel's documented 5·10²⁵ term bound ÷
    2⁵⁹), so |Σ₆₄ eq·pc_hi| < 2⁶² and |Σ₆₄ eq·pc_lo| < 64·10⁸·2³⁰ ≈
    6.9·10¹⁸ < 2⁶³ — both sums exact in int64. Recombining,
    d = s_hi·2³⁰ + s_lo = t·2³⁰ + r with r = pmod(s_lo, 2³⁰) ∈ [0, 2³⁰)
    and t = s_hi + (s_lo − r) div 2³⁰ (exact division, so truncation
    ≡ floor), hence d ≥ 0 ⟺ t ≥ 0 — the same bit DECIMAL produced."""
    from ..functions import portable_hash64

    planes = (
        spark.range(LSH_IDX_PLANES)
        .select(F.col("id").cast("int").alias("p"))
        .crossJoin(
            spark.range(EMB_DIM).select(F.col("id").cast("int").alias("j"))
        )
        .select(
            "p",
            "j",
            (
                portable_hash64(
                    F.concat_ws(
                        ":",
                        F.lit("lshidx"),
                        F.col("p").cast("string"),
                        F.col("j").cast("string"),
                    )
                )
                - F.lit(1 << 59).cast("long")
            ).alias("pc"),
        )
        .select(
            "p",
            "j",
            # arithmetic shift = floor division; pc_lo = pmod ∈ [0, 2³⁰)
            F.shiftright(F.col("pc"), 30).alias("pc_hi"),
            F.pmod("pc", F.lit((1 << 30)).cast("long")).alias("pc_lo"),
        )
    )
    ex = vectors.select(
        "vec_id", F.posexplode("embedding").alias("j", "x")
    ).select(
        "vec_id",
        "j",
        F.floor(F.col("x").cast("double") * F.lit(1_000_000) + F.lit(0.5))
        .cast("long")
        .alias("eq"),
    )
    dots = (
        ex.join(F.broadcast(planes), "j")
        .groupBy("vec_id", "p")
        .agg(
            F.sum(F.col("eq") * F.col("pc_hi")).alias("s_hi"),
            F.sum(F.col("eq") * F.col("pc_lo")).alias("s_lo"),
        )
    )
    # d = s_hi·2³⁰ + s_lo ≥ 0 ⟺ t ≥ 0 (see docstring); the arithmetic
    # shift IS the floor-division carry, remainder pmod(s_lo, 2³⁰) ≥ 0
    t_sign = F.col("s_hi") + F.shiftright(F.col("s_lo"), 30)
    return (
        dots.select(
            "vec_id",
            F.expr(f"p div {LSH_IDX_BITS}").cast("int").alias("table"),
            F.when(
                t_sign >= 0,
                F.expr(
                    f"shiftleft(CAST(1 AS BIGINT), p % {LSH_IDX_BITS})"
                ),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("bv"),
        )
        .groupBy("vec_id", "table")
        .agg(F.sum("bv").cast("long").alias("sig"))
    )


def q_lsh_index_maintained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: MAINTAINED ANN index — the production serving
    concern the build/serve cost split exposes (an index is built once
    and then kept fresh, not rebuilt per batch). The signature table
    for the existing corpus (vec_id < LSH_IDX_SPLIT) is written as a
    versioned table (v1); the incoming batch's signatures are then
    MERGEd through the copy-on-write upsert path keyed on
    (vec_id, table) — v2 — and the maintained snapshot is returned.

    The DuckDB oracle computes the FULL corpus' signatures from
    scratch, so the hash match proves maintained-index ≡ rebuild
    cross-engine (the same IVM law as incremental_agg_state), which
    only holds because the signatures are integer-deterministic and
    per-vector independent — see `lsh_int_signatures`.

    Scale: maintenance costs O(batch × planes); the merge rewrites
    only the CoW snapshot (partition-pruned when the index table is
    partitioned, e.g. by table id at production scale); rebuild costs
    O(corpus × planes). Composes with `ann_lsh_topk`: the maintained
    (vec_id, table, sig) table IS the corpus_sig half of its
    ``index`` argument."""
    import tempfile

    from .. import tables

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        _fixture_fingerprint(sf_dir),
    )
    path = _LSH_INDEX_CACHE.get(key)
    if path is None:
        emb = load(spark, sf_dir).embeddings.select("vec_id", "embedding")
        tmpdir = tempfile.mkdtemp(prefix="bl_lshidx_")
        _LSH_INDEX_TMPDIRS.append(tmpdir)
        path = os.path.join(tmpdir, "lsh_index")
        v1 = emb.filter(F.col("vec_id") < LSH_IDX_SPLIT)
        tables.write_versioned(lsh_int_signatures(spark, v1), path)
        delta = emb.filter(F.col("vec_id") >= LSH_IDX_SPLIT)
        tables.merge_upsert(
            spark,
            path,
            lsh_int_signatures(spark, delta),
            keys=["vec_id", "table"],
        )
        _LSH_INDEX_CACHE[key] = path
    return tables.read_versioned(spark, path)


#: q_ann_topk_exactint geometry: top-k, query batch bound, and the
#: isqrt-contract norm guard (isqrt is exact only below 2^52 — with
#: millionth-quantized components that admits vector norms up to ~67;
#: the fixture is near-unit).
ANN_EXACT_K = 5
ANN_EXACT_QUERIES = 20
ANN_EXACT_MAX_NQ = 1 << 52


def q_ann_topk_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN SERVING, ORACLE-MATCHED end to end — the hash-verifiable
    counterpart to the float `knn_*` family (which stays bench-scored
    for recall): integer LSH signatures (the SAME portable plane grid
    the maintained index uses — `lsh_int_signatures`), radius-1
    multi-probe candidate generation, and a fixed-point rerank whose
    score is deterministic in both engines:

        cos_micro = halfup_div(dot_q, isqrt(na)·isqrt(nb), 6)

    — quantized-integer dot over exact integer square roots, rounded
    half-up at 6 decimals, ranked (score desc, neighbor_id asc),
    top-ANN_EXACT_K per query, positive-dot candidates only. Every
    stage is integer or exact-rational, so the DuckDB twin reproduces
    candidates, scores, and ranks bit-for-bit — an ANN query path a
    driver gate can hash-check, not just recall-score.

    The guard: `isqrt` is exact below 2^52, so na beyond that RAISES
    (same policy as the other magnitude contracts) instead of
    silently mis-ranking.

    Scale: candidates are bucket-equi-joins against the signature
    table (servable straight from `lsh_index_maintained`'s output);
    probes grow the query side ×9, never the corpus side.

    Served through the session memo `ann_exact_serving` — one serving
    index feeds every downstream stage (NDCG, RRF, MMR)."""
    return ann_exact_serving(spark, sf_dir, "grid")


def _ann_grid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding")
    sig = lsh_int_signatures(spark, emb).localCheckpoint(eager=False)
    qsig = sig.filter(F.col("vec_id") < ANN_EXACT_QUERIES)
    probes = [F.col("sig")] + [
        F.expr(f"sig ^ shiftleft(CAST(1 AS BIGINT), {b})")
        for b in range(LSH_IDX_BITS)
    ]
    qprobe = qsig.select(
        F.col("vec_id").alias("query_id"),
        "table",
        F.explode(F.array(*probes)).alias("bucket"),
    )
    cand = (
        qprobe.join(
            sig.select(
                "table",
                F.col("sig").alias("bucket"),
                F.col("vec_id").alias("neighbor_id"),
            ),
            ["table", "bucket"],
        )
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    return _exactint_rerank(emb, cand)


def _quantized_norms(emb: DataFrame) -> DataFrame:
    """(vec_id, q, nq): millionth-quantized integer components and the
    exact squared norm, with the isqrt magnitude contract enforced
    (nq ≤ 2^52 — beyond it the exact integer square root breaks, so
    RAISE instead of silently mis-ranking)."""
    nq_raw = F.aggregate(
        F.zip_with(F.col("q"), F.col("q"), lambda a, b: a * b),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * SEM_SCALE + F.lit(0.5)).cast(
                "long"
            ),
        ).alias("q"),
    ).withColumn(
        "nq",
        F.when(
            nq_raw > F.lit(ANN_EXACT_MAX_NQ),
            F.raise_error(
                F.lit(
                    "exactint rerank norm contract violated: "
                    "nq > 2^52 breaks the exact isqrt; normalize "
                    "vectors upstream"
                )
            ).cast("long"),
        ).otherwise(nq_raw),
    )


def _exactint_rerank(emb: DataFrame, cand: DataFrame) -> DataFrame:
    """Shared fixed-point rerank of (query_id, neighbor_id) candidate
    pairs: cos_micro = halfup_div(dot_q, isqrt(na)·isqrt(nb), 6) over
    millionth-quantized components, positive-dot candidates only,
    (score desc, neighbor_id asc) row_number, top-ANN_EXACT_K. Every
    step is integer/exact-rational, so any candidate generator that is
    itself deterministic (LSH grid, IVF cells) becomes hash-checkable
    end to end. The isqrt contract (nq ≤ 2^52) RAISES when violated."""
    from ..functions import halfup_div, isqrt

    qz = _quantized_norms(emb)
    qa = qz.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    )
    qb = qz.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = (
        cand.join(qa, "query_id")
        .join(qb, "neighbor_id")
        .withColumn("dot_q", dot)
        .filter(F.col("dot_q") > 0)
        .select(
            "query_id",
            "neighbor_id",
            halfup_div(
                F.col("dot_q"),
                isqrt(F.col("na")) * isqrt(F.col("nb")),
                6,
            ).alias("cos_micro"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_micro"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_EXACT_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("int").alias("rank"),
            "cos_micro",
        )
    )


#: q_ivf_topk_exactint geometry: cells probed per query. 2 of the
#: KMEANS_K=8 one-round cells keeps the scored fraction ~1/4 while the
#: planted/query structure still lands its true neighbors in-probe.
IVF_EXACT_NPROBE = 2


def q_ivf_topk_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN SERVING, ORACLE-MATCHED end to end — the cell-probed
    counterpart to `q_ann_topk_exactint`'s hash-grid serving (and the
    hash-verifiable twin of the float `knn_ivf` family, which stays
    bench-scored for recall):

    1. **Cells** are the one-exact-Lloyd-round k-means centroids the
       gate already verifies (`q_kmeans_round`: md5-hash-seeded init,
       integer-L2 argmin, shifted half-up integer mean) — the trained
       coarse quantizer every IVF index starts from.
    2. **Assignment**: every corpus vector to its nearest updated
       centroid by exact integer squared L2 (|diff| ≤ 2e6, d = 64 →
       sums ≤ 2.6e14, no overflow), ties to the smallest cell id.
    3. **Probing**: each query (vec_id < ANN_EXACT_QUERIES) visits its
       IVF_EXACT_NPROBE nearest cells by the same integer distance —
       candidates are the vectors assigned there, never the corpus.
    4. **Rerank**: the shared `_exactint_rerank` fixed-point cosine —
       candidates, scores, AND ranks bit-identical cross-engine.

    Scale: the k·d centroid table broadcasts; assignment is one
    map-side-combinable aggregate per vector; serving scans only the
    probed cells' posting lists (nprobe/k of the corpus on average) —
    the standard IVF serving shape, here with every arithmetic step
    hash-checkable.

    Output: (query_id, neighbor_id, rank, cos_micro).

    Served through the session memo `ann_exact_serving` — one serving
    index feeds every downstream stage (NDCG, RRF, MMR)."""
    return ann_exact_serving(spark, sf_dir, "cells")


def _ivf_cells_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load(spark, sf_dir)
    assign, probes = _ivf_assign_and_probes(spark, sf_dir)
    cand = (
        probes.join(assign, "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    return _exactint_rerank(
        t.embeddings.select("vec_id", "embedding"), cand
    )


#: Session-scoped memo of the two hash-verifiable ANN serving results
#: (VERDICT r10 ask #1): in a production stack the serving index is
#: materialized ONCE and every downstream consumer — graded-relevance
#: eval (NDCG), hybrid fusion (RRF), diversity re-ranking (MMR) —
#: reads the same result table instead of re-running candidate
#: generation + rerank. Keyed by (applicationId, sf_dir, family) so a
#: new session (whose localCheckpoint blocks are gone) recomputes —
#: the `_COMPONENTS_MEMO` pattern (dedup.py).
_ANN_SERVE_MEMO: dict[tuple[str, str, str], DataFrame] = {}


def ann_exact_serving(
    spark: SparkSession, sf_dir: str, family: str
) -> DataFrame:
    """The memoized exact-int ANN serving result for ``family`` —
    ``"grid"`` (LSH multi-probe, `_ann_grid_topk`) or ``"cells"``
    (IVF probed posting lists, `_ivf_cells_topk`) — computed once per
    (session, sf_dir) and localCheckpointed so NDCG/RRF/MMR consume a
    materialized serving table, not a recomputation."""
    key = (spark.sparkContext.applicationId, sf_dir, family)
    df = _ANN_SERVE_MEMO.get(key)
    if df is None:
        compute = {"grid": _ann_grid_topk, "cells": _ivf_cells_topk}[family]
        df = compute(spark, sf_dir).localCheckpoint(eager=False)
        _ANN_SERVE_MEMO[key] = df
    return df


def _ivf_assign_and_probes(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """IVF structure shared by q_ivf_topk_exactint and the IVF-PQ
    composition: ``assign`` (vec_id, cluster_id) — every corpus vector
    to its nearest one-round k-means centroid by exact integer L2 —
    and ``probes`` (query_id, cluster_id) — each query's
    IVF_EXACT_NPROBE nearest cells.

    Assignment is MAP-SIDE (VERDICT r8 ask #4): the k centroids
    collapse to ONE row holding a sorted ``array<struct<cluster_id,
    c: array<long>>>``, broadcast-attached to every corpus row (the
    whitelisted 1-row nested-loop class), and the argmin runs as a
    pure ``zip_with``/``aggregate``/``array_min`` expression — the old
    explode→join→groupBy shape shuffled N×k partial-agg rows where
    this shuffles NOTHING for assignment (at 100 TB with k in the
    thousands that was k× corpus amplification). Tie-breaking is
    identical: ``array_min`` over ``struct(dist, cluster_id)`` is the
    same lexicographic min as ``F.min(struct(dist, cluster_id))``, so
    the oracle rows stay bit-identical."""
    t = load(spark, sf_dir)
    # k centroids -> 1-row array<struct<cluster_id, c>>, c ordered by dim
    cent_arr = (
        q_kmeans_round(spark, sf_dir)
        .groupBy("cluster_id")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct("dim", F.col("centroid_micro").alias("c"))
                    )
                ),
                lambda s: s["c"],
            ).alias("c")
        )
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("cluster_id", "c"))).alias(
                "cents"
            )
        )
        .cache()  # 1 row; feeds corpus assignment AND query probing
    )
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * INT8_IN_SCALE + F.lit(0.5)).cast(
            "long"
        ),
    )
    dists = F.transform(
        F.col("cents"),
        lambda ct: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("qv"), ct["c"], lambda a, b: (a - b) * (a - b)
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("dist"),
            ct["cluster_id"].alias("cluster_id"),
        ),
    )
    vecs = (
        t.embeddings.select("vec_id", qv.alias("qv"))
        .join(F.broadcast(cent_arr))
        .withColumn("dists", dists)
    )
    assign = vecs.select(
        "vec_id", F.array_min("dists")["cluster_id"].alias("cluster_id")
    )
    probes = (
        vecs.filter(F.col("vec_id") < ANN_EXACT_QUERIES)
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(
                F.slice(F.array_sort("dists"), 1, IVF_EXACT_NPROBE)
            ).alias("p"),
        )
        .select("query_id", F.col("p.cluster_id").alias("cluster_id"))
    )
    return assign, probes


#: q_pq_topk_exactint geometry: 8 subspaces x 8 dims on the d=64
#: fixture, 8 codes per subspace (the same md5 'km:' seed vectors
#: donate their sub-vectors as initial codes), and an ADC survivor
#: pool of k·8 per query before the exact rerank (recall@5 vs brute
#: 0.33 at k·4 -> measured at k·8 below; the float knn_pq family's
#: recall curve remains the bench-scored reference).
PQ_EXACT_M = 8
PQ_EXACT_SUBDIM = 8
PQ_EXACT_POOL = ANN_EXACT_K * 8


def q_pq_topk_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRODUCT-QUANTIZATION ANN SERVING, ORACLE-MATCHED end to end —
    the code-book member of the hash-verifiable serving family
    (grid = `ann_topk_exactint`, cells = `ivf_topk_exactint`, codes =
    this):

    1. **Codebooks**: per subspace (8 × 8 dims), one exact Lloyd round
       over the corpus' sub-vectors — initial codes are the SAME
       md5-'km:'-seeded vectors kmeans_round uses (their sub-vectors),
       assignment by integer L2 (tie → smallest code), update by the
       shifted half-up integer mean. Empty cells simply vanish (both
       engines argmin over the surviving codes).
    2. **Encode**: every corpus vector → its per-subspace nearest
       updated code (integer L2, deterministic ties).
    3. **ADC**: a query's distance table to every (subspace, code) is
       the same integer d² the encoder used; the asymmetric distance
       of candidate v is the 8-term table sum at v's codes. Survivor
       pool = PQ_EXACT_POOL smallest (adc, vec_id) per query.
    4. **Rerank**: the shared `_exactint_rerank` fixed-point cosine
       over the pool — candidates, scores AND ranks bit-identical.

    Scale: codebooks are k·d rows (broadcast); encoding is one
    map-side-combinable aggregate per vector; serving reads 8 small
    table lookups per candidate instead of d multiplies — the
    classical PQ memory/compute shape, every step hash-checkable.

    Output: (query_id, neighbor_id, rank, cos_micro)."""
    t = load(spark, sf_dir)
    codes, dtab = _pq_codes_and_dtab(spark, sf_dir)
    adc = (
        codes.join(dtab, ["sub", "code_id"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dist").alias("adc"))
    )
    wp = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    pool = (
        adc.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= PQ_EXACT_POOL)
        .select("query_id", "neighbor_id")
    )
    return _exactint_rerank(
        t.embeddings.select("vec_id", "embedding"), pool
    )


def _pq_codes_and_dtab(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """PQ structure shared by q_pq_topk_exactint and the IVF-PQ
    composition: ``codes`` (vec_id, sub, code_id) — every corpus
    vector's per-subspace nearest updated code — and ``dtab``
    (query_id, sub, code_id, dist) — each query's integer ADC
    distance table over the surviving codes.

    Both assignment rounds are MAP-SIDE (VERDICT r8 ask #4): each
    codebook collapses to ONE row holding ``array<struct<sub,
    codes: array<struct<code_id, c>>>>`` (M·k·SD ints), broadcast
    onto every corpus row, and the per-subspace argmin runs as pure
    ``slice``/``zip_with``/``aggregate``/``array_min`` expressions —
    the old shape shuffled N×M×k partial-agg rows per round (N×64
    here) where this shuffles nothing for assignment. The one
    remaining shuffle is the codebook UPDATE (a genuine reduction):
    map-side combinable to M·k·SD = 512 cells. Tie-breaking is the
    same lexicographic min over ``struct(dist, code_id)``, so the
    oracle rows stay bit-identical."""
    from ..functions import halfup_div, portable_hash64

    t = load(spark, sf_dir)
    M, SD = PQ_EXACT_M, PQ_EXACT_SUBDIM
    qv = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * INT8_IN_SCALE + F.lit(0.5)).cast(
            "long"
        ),
    )
    vecs = t.embeddings.select("vec_id", qv.alias("qv"))
    seed_key = portable_hash64(
        F.concat(F.lit("km:"), F.col("vec_id").cast("string"))
    )
    # limit FIRST (TakeOrdered, no global window over the corpus), then
    # number the k-row result — same shape as kmeans_round's seeds
    seeds = (
        t.embeddings.select("vec_id")
        .orderBy(seed_key, "vec_id")
        .limit(KMEANS_K)
        .select(
            F.row_number()
            .over(Window.orderBy(seed_key, "vec_id"))
            .alias("code_id"),
            "vec_id",
        )
    )
    # seed donors' per-subspace sub-vectors -> (sub, code_id, c[SD])
    subsplit = F.expr(
        f"transform(sequence(0, {M - 1}), "
        f"s -> struct(s AS sub, slice(qv, s*{SD}+1, {SD}) AS c))"
    )
    seed_cb = (
        seeds.join(vecs, "vec_id")
        .select("code_id", F.explode(subsplit).alias("sc"))
        .select(
            F.col("sc.sub").alias("sub"), "code_id", F.col("sc.c").alias("c")
        )
    )

    def onerow(cb: DataFrame) -> DataFrame:
        """(sub, code_id, c) -> one row: array over sub (sorted, sub
        values are contiguous 0..M-1 so position == sub) of that
        subspace's surviving codes."""
        return (
            cb.groupBy("sub")
            .agg(
                F.array_sort(F.collect_list(F.struct("code_id", "c"))).alias(
                    "codes"
                )
            )
            .groupBy()
            .agg(
                F.array_sort(F.collect_list(F.struct("sub", "codes"))).alias(
                    "cbs"
                )
            )
            .cache()  # 1 row; feeds assignment + update / encode + ADC
        )

    def argmin_codes(cbs):
        """Per-subspace nearest-code ids for this row's qv (array
        position == sub); min over struct(dist, code_id) keeps the
        original tie-break to the smallest code id."""
        return F.transform(
            cbs,
            lambda cb: F.array_min(
                F.transform(
                    cb["codes"],
                    lambda cd: F.struct(
                        F.aggregate(
                            F.zip_with(
                                F.slice(F.col("qv"), cb["sub"] * SD + 1, SD),
                                cd["c"],
                                lambda a, b: (a - b) * (a - b),
                            ),
                            F.lit(0).cast("long"),
                            lambda acc, v: acc + v,
                        ).alias("dist"),
                        cd["code_id"].alias("code_id"),
                    ),
                )
            )["code_id"],
        )

    # round 0: map-side assignment to the seed codes, then the exact
    # integer centroid update (the genuine reduction: 512 cells)
    a0_triples = F.expr(
        f"transform(sequence(0, {M - 1}), "
        f"s -> struct(s AS sub, a0[s] AS code_id, "
        f"slice(qv, s*{SD}+1, {SD}) AS sq))"
    )
    upd = (
        vecs.join(F.broadcast(onerow(seed_cb)))
        .withColumn("a0", argmin_codes(F.col("cbs")))
        .select(F.explode(a0_triples).alias("t"))
        .select(
            F.col("t.sub").alias("sub"),
            F.col("t.code_id").alias("code_id"),
            F.posexplode(F.col("t.sq")).alias("pos", "q"),
        )
        .groupBy("sub", "code_id", "pos")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("s"))
        .select(
            "sub",
            "code_id",
            "pos",
            (
                halfup_div(
                    F.col("s") + F.col("n") * KMEANS_OFFSET, F.col("n"), 0
                ).cast("long")
                - KMEANS_OFFSET
            ).alias("cq"),
        )
    )
    cb1 = upd.groupBy("sub", "code_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("pos", F.col("cq").alias("c")))
            ),
            lambda s: s["c"],
        ).alias("c")
    )
    cbs1 = onerow(cb1)

    # round 1: map-side encode (codes) + query ADC tables (dtab) —
    # identical integer distances, just computed per-row
    codes = (
        vecs.join(F.broadcast(cbs1))
        .select(
            "vec_id",
            F.posexplode(argmin_codes(F.col("cbs"))).alias("sub", "code_id"),
        )
        .select("vec_id", F.col("sub").cast("int").alias("sub"), "code_id")
    )
    dist_structs = F.transform(
        F.col("cbs"),
        lambda cb: F.transform(
            cb["codes"],
            lambda cd: F.struct(
                cb["sub"].alias("sub"),
                cd["code_id"].alias("code_id"),
                F.aggregate(
                    F.zip_with(
                        F.slice(F.col("qv"), cb["sub"] * SD + 1, SD),
                        cd["c"],
                        lambda a, b: (a - b) * (a - b),
                    ),
                    F.lit(0).cast("long"),
                    lambda acc, v: acc + v,
                ).alias("dist"),
            ),
        ),
    )
    dtab = (
        vecs.filter(F.col("vec_id") < ANN_EXACT_QUERIES)
        .join(F.broadcast(cbs1))
        .select(
            F.col("vec_id").alias("query_id"),
            F.explode(F.flatten(dist_structs)).alias("d"),
        )
        .select(
            "query_id",
            F.col("d.sub").alias("sub"),
            F.col("d.code_id").alias("code_id"),
            F.col("d.dist").alias("dist"),
        )
    )
    return codes, dtab


def q_ivfpq_topk_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN SERVING, ORACLE-MATCHED end to end — the composed
    capstone of the hash-verifiable serving family (grid / cells /
    codes / cells×codes), and the exact-int twin of the float
    `knn_ivfpq` family: the IVF coarse quantizer restricts WHICH
    vectors are scored (the query's IVF_EXACT_NPROBE nearest one-round
    k-means cells), the PQ codebooks decide HOW they are scored
    (integer ADC table lookups instead of d-dim arithmetic), and the
    shared fixed-point rerank scores the PQ_EXACT_POOL ADC survivors
    exactly. Every stage reuses the already-gate-verified structures
    (`_ivf_assign_and_probes`, `_pq_codes_and_dtab`), so candidates,
    scores AND ranks stay bit-identical cross-engine.

    Scale: the classical IVF-PQ serving shape — posting lists bound
    the scored set to ~nprobe/k of the corpus, ADC bounds per-candidate
    cost to M table lookups; both index structures broadcast.

    Output: (query_id, neighbor_id, rank, cos_micro)."""
    t = load(spark, sf_dir)
    assign, probes = _ivf_assign_and_probes(spark, sf_dir)
    codes, dtab = _pq_codes_and_dtab(spark, sf_dir)
    in_cell = (
        probes.join(assign, "cluster_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id")
    )
    adc = (
        in_cell.join(codes, "vec_id")
        .join(dtab, ["query_id", "sub", "code_id"])
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(F.sum("dist").alias("adc"))
    )
    wp = Window.partitionBy("query_id").orderBy("adc", "neighbor_id")
    pool = (
        adc.withColumn("pr", F.row_number().over(wp))
        .filter(F.col("pr") <= PQ_EXACT_POOL)
        .select("query_id", "neighbor_id")
    )
    return _exactint_rerank(
        t.embeddings.select("vec_id", "embedding"), pool
    )


#: kNN-classifier evaluation batch: label accuracy is measured over
#: this many held-as-query vectors (bounded — the brute pass is an
#: audit, like knn_brute itself).
KNN_EVAL_QUERIES = 100


def q_knn_label_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN classifier evaluation over the embedding space — the
    LABEL-level answer to "are these embeddings any good?" that recall
    curves can't give (``knn_*`` measure index fidelity against brute
    force; this measures whether neighborhoods agree with labels at
    all — the standard embedding-quality probe before committing to a
    semantic-dedup threshold).

    For each of the first ``KNN_EVAL_QUERIES`` vectors: exact top-5
    cosine neighbors (the ``knn_brute`` scorer — 4-dp-rounded floats,
    id tie-breaks, engine-portable), predicted label = the neighbor
    majority via the sort-free min(struct(−votes, label)) aggregate
    (the ``user_modal_event`` idiom), scored against the vector's own
    label. Report per true label so class-level confusion is visible.

    On THIS fixture the labels are drawn independently of the
    embedding geometry (measured: intra-label cosine == inter-label),
    so the correct reading is accuracy ≈ the 1/|classes| random floor
    — the probe's job is to DETECT absent signal as much as present
    signal (the ``heaps_law_fit`` β = 0 convention); the pytest pins
    exactly that.

    Scale: bounded query batch × corpus, the documented brute-force
    audit shape (the scalable serving paths are the lsh/ivf/pq
    families).

    Output: (label, n_queries, n_correct, accuracy)."""
    from ..functions import halfup_div

    t = load(spark, sf_dir)
    knn = cosine_topk(
        t.embeddings.filter(F.col("vec_id") < KNN_EVAL_QUERIES),
        t.embeddings,
        k=5,
    )
    lab = t.embeddings.select("vec_id", "label")
    votes = (
        knn.join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nb_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    pred = votes.groupBy("query_id").agg(
        F.min(
            F.struct(
                (-F.col("votes")).alias("nv"),
                F.col("nb_label").alias("lb"),
            )
        )["lb"].alias("pred_label")
    )
    scored = pred.join(
        lab.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
        ),
        "query_id",
    )
    return (
        scored.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).alias("n_queries"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("long")
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n_queries",
            "n_correct",
            halfup_div(F.col("n_correct"), F.col("n_queries"), 6).alias(
                "accuracy"
            ),
        )
        .orderBy("label")
    )


def q_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CLASSIFIER CALIBRATION AUDIT — reliability table + Expected
    Calibration Error (Guo et al. 2017) for the kNN label classifier
    (`knn_label_accuracy`'s majority vote, the one classifier in the
    pipeline with a natural graded confidence): a filter that says
    "80% confident" should be right 80% of the time, and a
    miscalibrated quality classifier silently skews every downstream
    threshold — the reason eval stacks report ECE next to accuracy.

    Confidence = the winning label's vote share of the top-5 neighbor
    votes (votes/5 → permille = votes·200), which bins queries into
    the five natural reliability buckets. Per bucket the table reports
    count, accuracy, stated confidence, and the |acc − conf| gap; ECE
    = the count-weighted mean gap in micro units, broadcast onto every
    row (the audit's headline scalar, hash-verified like the rest).

    On THIS fixture labels are independent of the geometry (the
    `knn_label_accuracy` negative control), so the expected read is
    OVERCONFIDENCE: acc ≈ the 1/|classes| floor at every stated
    confidence — a large ECE is the correct detection, pinned by the
    pytest.

    Scale: the bounded query batch × corpus brute scorer (documented
    audit shape), then a ≤5-row aggregate and a 1-row ECE broadcast.

    Output per occupied bucket: (votes, n, n_correct, conf_permille,
    acc_permille, gap_permille, ece_micro)."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    knn = cosine_topk(
        t.embeddings.filter(F.col("vec_id") < KNN_EVAL_QUERIES),
        t.embeddings,
        k=5,
    )
    lab = t.embeddings.select("vec_id", "label")
    votes = (
        knn.join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nb_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    pick = F.min(
        F.struct((-F.col("votes")).alias("nv"), F.col("nb_label").alias("lb"))
    )
    pred = votes.groupBy("query_id").agg(
        pick["lb"].alias("pred_label"),
        (-pick["nv"]).cast("long").alias("votes"),
    )
    scored = pred.join(
        lab.select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("true_label"),
        ),
        "query_id",
    )
    b = scored.groupBy(F.col("votes").cast("int").alias("votes")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("pred_label") == F.col("true_label")).cast("long"))
        .alias("n_correct"),
    )
    g = b.select(
        "votes",
        "n",
        "n_correct",
        (F.col("votes") * F.lit(200)).cast("long").alias("conf_permille"),
        _idiv(F.col("n_correct") * F.lit(1000), F.col("n")).alias(
            "acc_permille"
        ),
    ).withColumn(
        "gap_permille", F.abs(F.col("acc_permille") - F.col("conf_permille"))
    )
    e = g.agg(
        _idiv(
            F.sum(F.col("n") * F.col("gap_permille")) * F.lit(1000),
            F.sum("n"),
        ).alias("ece_micro")
    )
    return g.crossJoin(F.broadcast(e)).orderBy("votes")


#: NDCG@5 discount ladder: floor(1e6 / log2(rank+1)) as LITERAL
#: integers so both engines share them bit-for-bit (the pytest float-
#: witnesses each against math.log2); ideal DCG = a perfect top-5
#: (relevance 5..1 in brute order).
ANN_NDCG_DISC = [1_000_000, 630_929, 500_000, 430_676, 386_852]
ANN_NDCG_IDCG = sum(
    (5 - i) * d for i, d in enumerate(ANN_NDCG_DISC)
)  # = 10_271_920


def q_ann_ndcg_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the hash-verifiable grid-ANN serving path — the
    GRADED retrieval-quality metric next to the binary recall curve
    (`knn_*` recall@5) and label probes (`knn_label_accuracy`): a
    wrong neighbor at rank 1 costs more than one at rank 5
    (Järvelin & Kekäläinen 2002). Relevance of a served neighbor =
    6 − its rank in the EXACT-INT brute top-5 (0 if absent);
    DCG discounts by the literal micro ladder floor(1e6/log2(r+1));
    NDCG normalizes by the perfect-ordering IDCG constant.

    The whole metric is integer arithmetic over two deterministic
    inputs — the served list (`q_ann_topk_exactint`) and the bounded
    20-query brute ground truth (the documented knn_brute audit
    shape) — so it is hash-verifiable end to end, unlike float-recall
    scoring.

    Output (one row per query): (query_id, n_hits, dcg_micro,
    ndcg_micro)."""
    from ..catalog import load

    t = load(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding")
    got = q_ann_topk_exactint(spark, sf_dir)
    qs = emb.filter(F.col("vec_id") < ANN_EXACT_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    cand = (
        qs.crossJoin(emb.select(F.col("vec_id").alias("neighbor_id")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    truth = _exactint_rerank(emb, cand).select(
        "query_id",
        "neighbor_id",
        F.col("rank").alias("brute_rank"),
    )
    rel = F.coalesce(F.lit(6) - F.col("brute_rank"), F.lit(0)).cast(
        "long"
    )
    disc = F.col("rank").cast("long")
    disc_expr = (
        F.when(disc == 1, F.lit(ANN_NDCG_DISC[0]))
        .when(disc == 2, F.lit(ANN_NDCG_DISC[1]))
        .when(disc == 3, F.lit(ANN_NDCG_DISC[2]))
        .when(disc == 4, F.lit(ANN_NDCG_DISC[3]))
        .otherwise(F.lit(ANN_NDCG_DISC[4]))
        .cast("long")
    )
    return (
        got.join(truth, ["query_id", "neighbor_id"], "left")
        .select(
            "query_id",
            rel.alias("rel"),
            (rel * disc_expr).alias("gain"),
        )
        .groupBy("query_id")
        .agg(
            F.sum((F.col("rel") > 0).cast("long")).alias("n_hits"),
            F.sum("gain").alias("dcg_micro"),
        )
        .select(
            "query_id",
            "n_hits",
            "dcg_micro",
            F.expr(
                f"CAST((dcg_micro * 1000000) div {ANN_NDCG_IDCG} "
                "AS BIGINT)"
            ).alias("ndcg_micro"),
        )
        .orderBy("query_id")
    )


#: Matryoshka prefix dims audited (MRL, Kusupati et al. 2022): nested
#: prefixes of the 64-dim embedding; 64 is the full-dim reference.
MATRYOSHKA_DIMS = [8, 16, 32, 64]


def q_matryoshka_prefix_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MATRYOSHKA PREFIX-DIMENSION RECALL — the measured trade-off
    table for serving truncated embeddings (Matryoshka Representation
    Learning): for each nested prefix width D, the exact-integer
    cosine top-5 per query over only the first D dimensions, scored
    against the full-dimension top-5. The table answers the storage/
    recall question directly: how much of the 64-dim answer does a
    D-dim index keep? (The fixture embeddings are NOT MRL-trained, so
    the curve doubles as a negative control — the pytest asserts
    monotone-ish recall growth and the exact D=64 fixpoint.)

    Same hash-verifiable machinery as the exact-int ANN family: the
    shared `_exactint_rerank` over prefix-sliced vectors, a bounded
    20-query brute candidate set per dim (the documented knn_brute
    audit shape — the scalable serving paths are the LSH/IVF/PQ
    families; this is their evaluation instrument).

    Output (one row per D): (dim, n_truth_pairs, n_hits,
    recall_micro)."""
    from ..catalog import load

    t = load(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding")
    qs = emb.filter(F.col("vec_id") < ANN_EXACT_QUERIES).select(
        F.col("vec_id").alias("query_id")
    )
    cand = (
        qs.crossJoin(emb.select(F.col("vec_id").alias("neighbor_id")))
        .filter(F.col("query_id") != F.col("neighbor_id"))
    )
    tops = {}
    for d in MATRYOSHKA_DIMS:
        embp = emb.select(
            "vec_id", F.slice("embedding", 1, d).alias("embedding")
        )
        tops[d] = _exactint_rerank(embp, cand).select(
            "query_id", "neighbor_id"
        )
    # the full-dim truth table is read by EVERY per-dim branch (join +
    # denominator): materialize its rerank once (§1.2 duplicate
    # subtrees — the r13 plan re-ran the 64-dim rerank per branch)
    truth = tops[MATRYOSHKA_DIMS[-1]].localCheckpoint(eager=False)
    tops[MATRYOSHKA_DIMS[-1]] = truth
    n_truth = truth.agg(F.count(F.lit(1)).alias("n_truth_pairs"))
    rows = []
    for d in MATRYOSHKA_DIMS:
        hit = tops[d].join(truth, ["query_id", "neighbor_id"])
        rows.append(
            hit.agg(F.count(F.lit(1)).alias("n_hits"))
            .crossJoin(F.broadcast(n_truth))
            .select(
                F.lit(d).cast("long").alias("dim"),
                "n_truth_pairs",
                "n_hits",
                F.expr(
                    "CAST((n_hits * 1000000) div n_truth_pairs "
                    "AS BIGINT)"
                ).alias("recall_micro"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("dim")


#: Reciprocal-rank-fusion constant (Cormack et al. 2009: k=60).
RRF_K = 60


def q_rrf_fusion_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RECIPROCAL RANK FUSION (Cormack, Clarke & Buettcher 2009) of
    the two hash-verifiable ANN serving paths — the rank-aggregation
    operator every hybrid-retrieval stack runs (dense + sparse, or two
    index families, fused without score calibration): each candidate
    scores Σ over lists of 1e6 div (60 + rank), absent-from-list
    contributes 0; the fused top-5 per query re-ranks by
    (fused desc, id).

    Fuses `q_ann_topk_exactint` (LSH grid) with `q_ivf_topk_exactint`
    (k-means cells) — two genuinely different candidate generators
    over the same corpus, which is exactly where RRF earns its keep.
    Pure integer arithmetic end to end (the div constants are exact
    in both engines), so the fusion is hash-verifiable like its
    inputs.

    Output: (query_id, neighbor_id, fused_micro, rank) — top-5 fused
    per query."""
    from pyspark.sql import Window

    grid = q_ann_topk_exactint(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("r")
    )
    cells = q_ivf_topk_exactint(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("rank").alias("r")
    )
    both = grid.unionByName(cells)
    fused = both.groupBy("query_id", "neighbor_id").agg(
        F.sum(
            F.expr(f"CAST(1000000 div ({RRF_K} + r) AS BIGINT)")
        ).alias("fused_micro")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("fused_micro"), F.asc("neighbor_id")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= ANN_EXACT_K)
        .select("query_id", "neighbor_id", "fused_micro", "rank")
        .orderBy("query_id", "rank")
    )


#: MMR geometry: picks per query and the λ = 0.7 trade-off carried as
#: the exact integer pair (7, 3) — scores stay in "deci-micro" units
#: (rel and sim are micro-cosines ×10), no division anywhere.
MMR_SELECT = 3
MMR_REL_W = 7
MMR_DIV_W = 3


def _cos_micro_int(dot: Column, na: Column, nb: Column) -> Column:
    """Integer micro-cosine, HALF_UP at 6 decimals, clamped at 0 for
    non-positive dots (MMR's diversity penalty floors at "unrelated";
    the clamp also keeps every division non-negative for the exact
    DECIMAL(38,0)/HUGEINT half-up formula). Same arithmetic as
    `_exactint_rerank`'s score but returned as BIGINT micro units so
    downstream MMR algebra stays integral."""
    from ..functions import _idiv, isqrt

    den = isqrt(na) * isqrt(nb)
    q = _idiv(
        dot.cast("decimal(38,0)") * F.lit(2 * 10**6) + den,
        den.cast("decimal(38,0)") * F.lit(2),
    )
    return F.when(dot <= 0, F.lit(0).cast("long")).otherwise(q)


def q_mmr_rerank_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MAXIMAL MARGINAL RELEVANCE re-ranking (Carbonell & Goldstein
    1998) over the fused exact-int ANN pool — the diversity-aware
    final stage of a retrieval stack: greedily pick MMR_SELECT items
    per query maximizing ``λ·rel − (1−λ)·max_sim_to_selected``, so
    near-duplicate neighbors don't crowd the slate.

    Pool = the union of the grid (`q_ann_topk_exactint`) and cells
    (`q_ivf_topk_exactint`) top-5 lists; relevance and all pairwise
    candidate-candidate similarities are recomputed as integer
    micro-cosines (`_cos_micro_int`), so the greedy argmax compares
    exact integers: score = 7·rel_micro − 3·max_sim_micro (λ = 0.7,
    ×10 "deci-micro" units), ties broken by neighbor_id. Round 1 has
    an empty selected set (penalty 0) — the pure-relevance pick.

    The greedy loop is UNROLLED into MMR_SELECT DataFrame rounds
    (selection is inherently sequential — k is a constant, the data
    parallelism is across queries): each round anti-joins the picks,
    re-aggregates max-sim against the selected set, and takes
    row_number = 1 per query. Pool and sims are localCheckpointed
    once, so the ANN candidate generation runs once, not per round.

    Scale: pool ≤ 2k rows and sims ≤ pool² rows PER QUERY (k is a
    small constant) — linear in queries, never corpus×corpus; every
    round is a keyed groupBy/window over those bounded frames."""
    pool0 = (
        q_ann_topk_exactint(spark, sf_dir)
        .select("query_id", "neighbor_id")
        .unionByName(
            q_ivf_topk_exactint(spark, sf_dir).select(
                "query_id", "neighbor_id"
            )
        )
        .distinct()
    )
    t = load(spark, sf_dir)
    qn = _quantized_norms(
        t.embeddings.select("vec_id", "embedding")
    )
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    qa = qn.select(
        F.col("vec_id").alias("query_id"),
        F.col("q").alias("qa"),
        F.col("nq").alias("na"),
    )
    qb = qn.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("q").alias("qb"),
        F.col("nq").alias("nb"),
    )
    pool = (
        pool0.join(qa, "query_id")
        .join(qb, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            _cos_micro_int(dot, F.col("na"), F.col("nb")).alias("rel_micro"),
        )
        .localCheckpoint(eager=False)
    )
    pa = pool0.select("query_id", F.col("neighbor_id").alias("a"))
    pb = pool0.select("query_id", F.col("neighbor_id").alias("b"))
    xa = qn.select(
        F.col("vec_id").alias("a"), F.col("q").alias("qa"), F.col("nq").alias("na")
    )
    xb = qn.select(
        F.col("vec_id").alias("b"), F.col("q").alias("qb"), F.col("nq").alias("nb")
    )
    sims = (
        pa.join(pb, "query_id")
        .filter(F.col("a") != F.col("b"))
        .join(xa, "a")
        .join(xb, "b")
        .select(
            "query_id",
            "a",
            "b",
            _cos_micro_int(dot, F.col("na"), F.col("nb")).alias("sim_micro"),
        )
        .localCheckpoint(eager=False)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("mmr_deci"), F.asc("neighbor_id")
    )
    remaining = pool
    selected = None
    picks = None
    for r in range(1, MMR_SELECT + 1):
        if selected is None:
            scored = remaining.withColumn(
                "mmr_deci", F.lit(MMR_REL_W) * F.col("rel_micro")
            )
        else:
            ms = (
                sims.join(
                    selected.select(
                        "query_id", F.col("neighbor_id").alias("b")
                    ),
                    ["query_id", "b"],
                )
                .groupBy("query_id", "a")
                .agg(F.max("sim_micro").alias("max_sim"))
            )
            scored = (
                remaining.join(
                    ms.select(
                        "query_id",
                        F.col("a").alias("neighbor_id"),
                        "max_sim",
                    ),
                    ["query_id", "neighbor_id"],
                    "left",
                )
                .withColumn(
                    "mmr_deci",
                    F.lit(MMR_REL_W) * F.col("rel_micro")
                    - F.lit(MMR_DIV_W)
                    * F.coalesce("max_sim", F.lit(0).cast("long")),
                )
                .drop("max_sim")
            )
        pick = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                "query_id",
                "neighbor_id",
                F.lit(r).cast("int").alias("pick_rank"),
                "rel_micro",
                "mmr_deci",
            )
            .localCheckpoint(eager=False)
        )
        picks = pick if picks is None else picks.unionByName(pick)
        selected = picks
        remaining = remaining.join(
            pick.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
            "left_anti",
        )
    return picks.orderBy("query_id", "pick_rank")


#: Sign-bit signature width: dims 1..63 → bits 0..62. Bit 63 is left
#: unused on purpose — setting it would make the int64 accumulation
#: overflow-sensitive under ANSI mode; 63 of 64 dims loses nothing
#: measurable as a CANDIDATE filter (the rerank is exact over all 64).
SIGNBIT_DIMS = 63
#: Hamming candidate pool per query fed to the exact rerank.
SIGNBIT_POOL = 40


def signbit_signatures(emb: DataFrame) -> DataFrame:
    """(vec_id, sig): 63-bit sign signature — bit i−1 set when
    embedding[i] ≥ 0. One integer per vector; Hamming distance between
    signatures estimates angle (Goemans–Williamson / Charikar 2002 —
    the same hyperplane-rounding fact SimHash uses, here with the
    COORDINATE planes, so no projection matrix is needed at all)."""
    sig = F.aggregate(
        F.sequence(F.lit(0), F.lit(SIGNBIT_DIMS - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + F.when(
            F.element_at("embedding", i + 1).cast("double") >= 0,
            F.call_function("shiftleft", F.lit(1).cast("long"), i),
        ).otherwise(F.lit(0).cast("long")),
    )
    return emb.select("vec_id", sig.alias("sig"))


def q_signbit_topk_exactint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BINARY-EMBEDDING ANN SERVING, ORACLE-MATCHED end to end — the
    1-bit-per-dimension member of the exact-int serving family (grid
    `q_ann_topk_exactint`, cells `q_ivf_topk_exactint`, codebooks
    `q_pq_topk_exactint`): vectors compress 256× into one 63-bit sign
    signature, candidates come from exact integer HAMMING distance
    (bit_count over XOR — the cheapest distance a CPU can compute),
    and the shared `_exactint_rerank` fixed-point cosine re-scores the
    top-``SIGNBIT_POOL`` Hamming pool. This is the binary-quantization
    serving shape production vector stores ship (compact index in RAM,
    exact rerank on the short list) — and because every stage is
    integer, the DuckDB twin reproduces candidates, scores and ranks
    bit-for-bit.

    Scale: signatures are a narrow expression scan (no shuffle); the
    query side is the bounded ``ANN_EXACT_QUERIES`` set, so the
    Hamming scan is a broadcast join LINEAR in the corpus with 8 bytes
    per vector moved — the one ANN family member whose candidate
    stage needs NO index build at all. The pool cut is a per-query
    window over ≤ corpus rows (TakeOrdered shape).

    Output: (query_id, neighbor_id, rank, cos_micro) — top-ANN_EXACT_K
    per query, positive-dot candidates only."""
    t = load(spark, sf_dir)
    emb = t.embeddings.select("vec_id", "embedding")
    sig = signbit_signatures(emb)
    qs = sig.filter(F.col("vec_id") < ANN_EXACT_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("sig").alias("qsig")
    )
    ham = (
        F.broadcast(qs)
        .join(
            sig.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("sig").alias("nsig"),
            ),
            F.col("query_id") != F.col("neighbor_id"),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.bit_count(
                F.col("qsig").bitwiseXOR(F.col("nsig"))
            ).alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("hamming"), F.asc("neighbor_id")
    )
    cand = (
        ham.withColumn("hrank", F.row_number().over(w))
        .filter(F.col("hrank") <= SIGNBIT_POOL)
        .select("query_id", "neighbor_id")
    )
    return _exactint_rerank(emb, cand)


def q_silhouette_simplified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SIMPLIFIED SILHOUETTE over the one-round k-means clustering —
    the O(n·k) clustering-quality score (Hruschka 2004: distances to
    CENTROIDS, not the O(n²) all-pairs classic) every embedding
    pipeline checks before trusting cluster-derived curation decisions
    (SemDeDup prototypes, IVF cell balance). s = (b − a) / max(a, b)
    with a = distance to own centroid, b = distance to the nearest
    OTHER centroid; assignment is argmin so a ≤ b and s ∈ [0, 1] —
    near 0 means the vector sits on a cell boundary.

    Exact fixed point: the centroid state is ``q_kmeans_round``'s
    bit-identical integer chain (hash-seeded init, integer-L2 argmin,
    shifted half-up centroid mean); distances take isqrt of the exact
    integer squared-L2, s in ppm via one trunc division. Ties in the
    argmin break to the smallest cluster id, as everywhere.

    Scale: k·d centroid table broadcasts; the n·k·d assignment scan is
    the same dense map-side-combinable shape as the kmeans round; the
    cluster collapse is k rows. No all-pairs anything.

    Output: KMEANS_K rows (cluster_id, n_members, mean_s_ppm,
    min_s_ppm, max_s_ppm) + global silhouette_ppm on every row."""
    from ..functions import _idiv, isqrt, portable_hash64

    t = load(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        (F.col("dim0") + 1).alias("dim"),
        F.floor(F.col("x").cast("double") * INT8_IN_SCALE + F.lit(0.5))
        .alias("q"),
    ).cache()
    seeds = (
        t.embeddings.select("vec_id")
        .orderBy(
            portable_hash64(
                F.concat(F.lit("km:"), F.col("vec_id").cast("string"))
            ),
            "vec_id",
        )
        .limit(KMEANS_K)
        .select(
            F.row_number()
            .over(
                Window.orderBy(
                    portable_hash64(
                        F.concat(F.lit("km:"), F.col("vec_id").cast("string"))
                    ),
                    "vec_id",
                )
            )
            .alias("cluster_id"),
            "vec_id",
        )
    )
    seed_ex = seeds.join(ex, "vec_id").select(
        "cluster_id", "dim", F.col("q").alias("c")
    )
    d0 = (
        ex.join(F.broadcast(seed_ex), "dim")
        .groupBy("vec_id", "cluster_id")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
             .alias("dist"))
    )
    a0 = d0.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cluster_id")).alias("m")
    ).select("vec_id", F.col("m.cluster_id").alias("cluster_id"))
    from ..functions import halfup_div

    cent = (
        ex.join(a0, "vec_id")
        .groupBy("cluster_id", "dim")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("q").alias("s"))
        .select(
            "cluster_id",
            "dim",
            (
                halfup_div(
                    F.col("s") + F.col("n") * KMEANS_OFFSET, F.col("n"), 0
                ).cast("long")
                - KMEANS_OFFSET
            ).alias("c"),
        )
    )
    d1 = (
        ex.join(F.broadcast(cent), "dim")
        .groupBy("vec_id", "cluster_id")
        .agg(F.sum((F.col("q") - F.col("c")) * (F.col("q") - F.col("c")))
             .alias("dist"))
    )
    own = d1.groupBy("vec_id").agg(
        F.min(F.struct("dist", "cluster_id")).alias("m")
    ).select(
        "vec_id",
        F.col("m.cluster_id").alias("own_cluster"),
        F.col("m.dist").alias("d_own"),
    )
    other = (
        d1.join(own, "vec_id")
        .filter(F.col("cluster_id") != F.col("own_cluster"))
        .groupBy("vec_id")
        .agg(F.min("dist").alias("d_other"))
    )
    s = own.join(other, "vec_id").select(
        "vec_id",
        "own_cluster",
        _idiv(
            (isqrt(F.col("d_other")) - isqrt(F.col("d_own")))
            * F.lit(1_000_000),
            F.greatest(isqrt(F.col("d_other")), F.lit(1).cast("long")),
        ).alias("s_ppm"),
    )
    per = s.groupBy("own_cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.sum("s_ppm").cast("long").alias("sum_s"),
        F.min("s_ppm").cast("long").alias("min_s_ppm"),
        F.max("s_ppm").cast("long").alias("max_s_ppm"),
    )
    glob = per.agg(
        _idiv(F.sum("sum_s"), F.sum("n_members")).alias("silhouette_ppm")
    )
    return (
        per.crossJoin(F.broadcast(glob))
        .select(
            F.col("own_cluster").cast("int").alias("cluster_id"),
            "n_members",
            _idiv(F.col("sum_s"), F.col("n_members")).alias("mean_s_ppm"),
            "min_s_ppm",
            "max_s_ppm",
            "silhouette_ppm",
        )
        .orderBy("cluster_id")
    )


#: Two-NN geometry: bounded query panel (the knn_brute convention) —
#: the estimator needs only a sample of exact 1st/2nd neighbors.
TWONN_QUERIES = 50


def q_twonn_intrinsic_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-NN INTRINSIC DIMENSION of the embedding corpus (Facco et
    al. 2017): for each query the ratio µ = d₂/d₁ of its two exact
    nearest-neighbor distances follows Pareto(id), so the MLE is
    id = n / Σ ln µ — the curse-of-dimensionality dial an ANN tuner
    reads before picking nlist/nbits (intrinsic dim ≪ ambient 64
    means IVF/PQ will work far better than the raw dimension
    suggests).

    Exact fixed point: integer squared-L2 on micro-quantized vectors;
    ln µ = ln_micro(d₂², d₁²)/2 with both arguments pre-shifted right
    by max(0, bitlen(d₂²) − 30) to honor ln_micro's < 2³¹ contract —
    a deterministic quantization (≤ 2⁻²⁹ relative) both engines apply
    identically. Queries whose d₁² = 0 (exact duplicate vectors) are
    excluded from the panel — µ is undefined there — and surfaced in
    ``n_excluded``. id_milli = n·10⁹ // Σ ln_micro.

    Scale: the panel is ``TWONN_QUERIES``-bounded (the knn_brute
    convention) — panel×corpus×dim narrow rows with full map-side
    combine; the estimator itself is a 1-row collapse. Estimating on
    a fixed panel is the algorithm (the MLE needs a sample, not the
    corpus); at 100 TB the panel stays constant and only the
    candidate scan grows, which the ANN indexes already bound.

    Output: per-query rows (query_id, d1_sq, d2_sq, ln_ratio_micro)
    with global (n_queries, n_excluded, sum_ln_micro, id_milli)
    attached."""
    from ..functions import _idiv, ln_micro

    t = load(spark, sf_dir)
    ex = t.embeddings.select(
        "vec_id", F.posexplode("embedding").alias("dim0", "x")
    ).select(
        "vec_id",
        F.col("dim0").alias("dim"),
        F.floor(F.col("x").cast("double") * INT8_IN_SCALE + F.lit(0.5))
        .alias("q"),
    )
    qex = ex.filter(F.col("vec_id") < TWONN_QUERIES).select(
        F.col("vec_id").alias("query_id"), "dim", F.col("q").alias("qq")
    )
    dist = (
        ex.join(F.broadcast(qex), "dim")
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", F.col("vec_id").alias("neighbor_id"))
        .agg(
            F.sum((F.col("q") - F.col("qq")) * (F.col("q") - F.col("qq")))
            .cast("long")
            .alias("dist")
        )
    )
    w = Window.partitionBy("query_id").orderBy("dist", "neighbor_id")
    two = (
        dist.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("query_id")
        .agg(
            F.min(F.when(F.col("rn") == 1, F.col("dist"))).alias("d1_sq"),
            F.min(F.when(F.col("rn") == 2, F.col("dist"))).alias("d2_sq"),
        )
    )
    sh = F.greatest(
        (F.length(F.bin(F.col("d2_sq"))) - F.lit(30)).cast("int"), F.lit(0)
    )
    kept = two.filter(F.col("d1_sq") > 0).withColumn(
        "ln_ratio_micro",
        _idiv(
            ln_micro(
                F.call_function("shiftright", F.col("d2_sq"), sh),
                F.greatest(
                    F.call_function("shiftright", F.col("d1_sq"), sh),
                    F.lit(1).cast("long"),
                ),
            ),
            F.lit(2),
        ),
    )
    n_exc = two.filter(F.col("d1_sq") <= 0).agg(
        F.count(F.lit(1)).cast("long").alias("n_excluded")
    )
    glob = (
        kept.agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum("ln_ratio_micro").cast("long").alias("sum_ln_micro"),
        )
        .crossJoin(F.broadcast(n_exc))
        .select(
            "n_queries",
            "n_excluded",
            "sum_ln_micro",
            _idiv(
                F.col("n_queries") * F.lit(1_000_000_000),
                F.greatest(F.col("sum_ln_micro"), F.lit(1).cast("long")),
            ).alias("id_milli"),
        )
    )
    return (
        kept.crossJoin(F.broadcast(glob))
        .select(
            "query_id",
            "d1_sq",
            "d2_sq",
            "ln_ratio_micro",
            "n_queries",
            "n_excluded",
            "sum_ln_micro",
            "id_milli",
        )
        .orderBy("query_id")
    )


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ISOTONIC CALIBRATION (pool-adjacent-violators fit) of the kNN
    confidence→accuracy curve — the remediation step after
    `calibration_report` DETECTS miscalibration: the best monotone
    non-decreasing accuracy curve in weighted least squares, the
    standard post-hoc calibrator (Zadrozny & Elkan 2002) a serving
    stack applies before thresholding confidences.

    Exact fixed point via the MINIMAX characterization of PAVA
    (Robertson et al. 1988): iso(t) = max_{i≤t} min_{j≥t} mean(i..j),
    where mean(i..j) = (Σ n_correct)/(Σ n) over the conf-ordered bin
    interval — every candidate is an integer rational; intervals are
    compared on the pico-floored key C·10¹² // N (exact while
    N² < 10¹², i.e. eval panels under 10⁶ queries — documented
    contract, trivially true for the bounded audit batch), and the
    emitted value is the same key floored to micro.

    Scale: everything runs on the ≤5-row reliability table —
    intervals are explode-generated (equi-joins only, no non-equi
    nested loop), windows are bounded-table. The 100 TB cost is the
    underlying audit scorer's, shared with `calibration_report`.

    Output: one row per occupied bin (votes, n, n_correct,
    conf_permille, acc_permille, iso_micro) + attached n_inversions
    (adjacent accuracy decreases before the fit — 0 means the raw
    curve was already monotone and iso == acc up to flooring)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    rep = q_calibration_report(spark, sf_dir).select(
        "votes", "n", "n_correct", "conf_permille", "acc_permille"
    )
    w = Window.orderBy("votes")
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bins = (
        rep.withColumn("t", F.row_number().over(w))
        .withColumn("pn", F.sum("n").over(wc))
        .withColumn("pc", F.sum("n_correct").over(wc))
    )
    iv = (
        bins.select(
            F.col("t").alias("j"),
            F.col("pn").alias("pn_j"),
            F.col("pc").alias("pc_j"),
            F.explode(F.sequence(F.lit(1), F.col("t"))).alias("i"),
        )
        .join(
            bins.select(
                F.col("t").alias("i"),
                (F.col("pn") - F.col("n")).alias("pn_i1"),
                (F.col("pc") - F.col("n_correct")).alias("pc_i1"),
            ),
            "i",
        )
        .select(
            "i",
            "j",
            _idiv(
                (F.col("pc_j") - F.col("pc_i1")).cast("decimal(38,0)")
                * F.lit(10**12),
                F.col("pn_j") - F.col("pn_i1"),
            ).alias("m_pico"),
        )
    )
    covered = iv.select(
        "i", "m_pico", F.explode(F.sequence("i", "j")).alias("t")
    )
    iso = (
        covered.groupBy("t", "i")
        .agg(F.min("m_pico").alias("inner_min"))
        .groupBy("t")
        .agg(F.max("inner_min").alias("iso_pico"))
        .select("t", _idiv(F.col("iso_pico"), F.lit(10**6)).alias("iso_micro"))
    )
    inv = bins.select(
        (
            F.col("acc_permille") < F.lag("acc_permille").over(w)
        ).cast("int").alias("bad")
    ).agg(F.sum("bad").cast("int").alias("n_inversions"))
    return (
        bins.join(iso, "t")
        .crossJoin(F.broadcast(inv))
        .select(
            "votes",
            "n",
            "n_correct",
            "conf_permille",
            "acc_permille",
            "iso_micro",
            "n_inversions",
        )
        .orderBy("votes")
    )


#: Hard negatives emitted per query.
HARDNEG_K = 3


def q_hard_negative_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HARD-NEGATIVE MINING from the ANN serving index — the
    training-data side of the retrieval stack (the eval side is
    NDCG/RRF/MMR): for contrastive training (DPR, Karpukhin et al.
    2020; SimCSE) the negatives that teach the most are the
    HIGHEST-SCORING wrong-label items the serving index returns —
    random negatives are trivially separable, in-batch negatives are
    lukewarm; ANN-mined hard negatives are the standard third tier.

    Per query of the exact-int serving panel: wrong-label served
    neighbors ranked by served score (top ``HARDNEG_K``), each with
    the query's best SAME-label served score and the margin
    best_pos − neg in micro units — margin ≤ 0 flags a negative that
    OUTRANKS every positive (the gold-dust examples; NULL margin =
    no positive was served at all). Scores are re-integerized by
    round(cos·10⁶) (exact: the serving score IS k/10⁶ for integer k),
    so margins are integer-exact.

    Reads the session-memoized serving table (`ann_exact_serving`) —
    the mining pass adds two label joins and a bounded per-query
    window on top of a result that is already materialized for
    NDCG/RRF/MMR; at 100 TB the candidate generation cost is paid
    once for all four consumers.

    Output: ≤ ``HARDNEG_K``·|panel| rows (query_id, neighbor_id,
    neg_rank, serve_rank, cos_micro, q_label, n_label,
    best_pos_micro, margin_micro)."""
    from pyspark.sql import Window

    t = load(spark, sf_dir)
    lab = t.embeddings.select("vec_id", "label")
    serve = q_ann_topk_exactint(spark, sf_dir)
    j = (
        serve.join(
            lab.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("q_label"),
            ),
            "query_id",
        )
        .join(
            lab.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("n_label"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").alias("serve_rank"),
            "cos_micro",
            F.round(F.col("cos_micro") * 1_000_000)
            .cast("long")
            .alias("s_micro"),
            "q_label",
            "n_label",
        )
    )
    pos = (
        j.filter(F.col("q_label") == F.col("n_label"))
        .groupBy("query_id")
        .agg(F.max("s_micro").alias("best_pos_micro"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("s_micro"), F.asc("neighbor_id")
    )
    return (
        j.filter(F.col("q_label") != F.col("n_label"))
        .withColumn("neg_rank", F.row_number().over(w))
        .filter(F.col("neg_rank") <= HARDNEG_K)
        .join(pos, "query_id", "left")
        .select(
            "query_id",
            "neighbor_id",
            F.col("neg_rank").cast("int").alias("neg_rank"),
            "serve_rank",
            "cos_micro",
            "q_label",
            "n_label",
            "best_pos_micro",
            (F.col("best_pos_micro") - F.col("s_micro")).alias(
                "margin_micro"
            ),
        )
        .orderBy("query_id", "neg_rank")
    )

"""Corpus-curation operators: deterministic sampling, split assignment,
token-budget selection, and the composed cleaning pipeline — the
dataset-construction half of a training-data pipeline (the reference has
no analogue; north-star extension like dedup/text/similarity).

Everything is deterministic and cross-engine exact: selection decisions
are integer arithmetic over md5-derived hashes (``portable_hash64``) or
integer cross-multiplication in place of float ratio thresholds, so
every query here carries a DuckDB oracle. No RNG state anywhere — a
re-run, a backfill, or another engine reproduces the same sample, the
same splits, the same selection, which is the property that makes
dataset builds auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load, spread_scan
from ..functions import halfup_div, normalized_text_hash, portable_hash64
from .text import pred_lang_expr, stopword_scores

#: Per-language sampling rates (percent kept), defaulting for labels
#: outside the map (e.g. 'zh' in the fixtures).
SAMPLE_RATES = {"en": 10, "de": 25, "fr": 25, "es": 25}
SAMPLE_DEFAULT_RATE = 50

#: Train/val/test boundaries over a 0-99 hash bucket.
SPLIT_TRAIN_END = 80  # buckets [0, 80) -> train
SPLIT_VAL_END = 90    # buckets [80, 90) -> val; [90, 100) -> test

#: Whitespace-token budget per source for q_token_budget_selection.
TOKEN_BUDGET_PER_SOURCE = 600


def _bucket(col, tag: str, n: int = 100):
    """Deterministic [0, n) bucket from an id column: md5-derived 60-bit
    hash mod n. Identical in DuckDB (same md5-substring arithmetic)."""
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"{tag}:"), col.cast("string"))),
        F.lit(n),
    ).cast("int")


def q_doc_sample_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: each document keeps/drops by its
    own hash bucket against a per-language rate — no RNG, no
    ``sample()`` (whose output depends on partitioning and seed
    plumbing). At 100 TB this is a narrow scan + filter: fully
    parallel, reproducible, and pushdown-friendly."""
    t = load(spark, sf_dir)
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r))
            for lang, r in SAMPLE_RATES.items()
        ],
        F.lit(SAMPLE_DEFAULT_RATE),
    )
    return (
        t.documents.select(
            "doc_id",
            "lang",
            "source",
            _bucket(F.col("doc_id"), "sample").alias("bucket"),
            rate.alias("rate"),
        )
        .filter(F.col("bucket") < F.col("rate"))
    )


def q_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-assigned train/val/test splits with per-(source, split)
    accounting. The assignment is a pure function of doc_id — adding
    documents later never reshuffles existing assignments (the property
    that keeps eval sets stable across dataset versions)."""
    t = load(spark, sf_dir)
    b = _bucket(F.col("doc_id"), "split")
    split = (
        F.when(b < SPLIT_TRAIN_END, F.lit("train"))
        .when(b < SPLIT_VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    per_doc = t.documents.select(
        "source",
        split.alias("split"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return per_doc.groupBy("source", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


def q_token_budget_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Select documents per source, longest-first (n_chars desc, doc_id
    asc), until the running whitespace-token total would exceed the
    per-source budget — the "fill the mixture bucket" step of corpus
    construction.

    Scale shape: the naive form is a running-sum window partitioned by
    ``source`` (low cardinality — each reducer would sort one source's
    entire corpus; the same killer q_order_value_percentiles avoids).
    This form never window-sorts raw rows per source:

    1. aggregate (source, n_chars) bucket token totals (map-side
       combinable; output bounded by the n_chars value range);
    2. cumulative totals over buckets locate each source's boundary
       bucket — buckets strictly before it are kept WHOLE, buckets
       after are dropped whole;
    3. only the single boundary bucket per source is re-scanned and
       window-summed doc-by-doc (broadcast semi-join filter).
    """
    t = load(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        "source",
        "n_chars",
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    buckets = docs.groupBy("source", "n_chars").agg(
        F.sum("n_tokens").alias("btok")
    )
    wsrc = Window.partitionBy("source").orderBy(F.desc("n_chars"))
    cum = buckets.select(
        "source",
        "n_chars",
        "btok",
        F.sum("btok").over(wsrc).alias("cum_end"),
    ).withColumn("cum_before", F.col("cum_end") - F.col("btok"))
    budget = F.lit(TOKEN_BUDGET_PER_SOURCE)
    whole = cum.filter(F.col("cum_end") <= budget).select("source", "n_chars")
    boundary = cum.filter(
        (F.col("cum_before") < budget) & (F.col("cum_end") > budget)
    ).select("source", "n_chars", "cum_before")

    kept_whole = docs.join(F.broadcast(whole), ["source", "n_chars"]).select(
        "source", "doc_id", "n_tokens"
    )
    wdoc = Window.partitionBy("source", "n_chars").orderBy(F.asc("doc_id"))
    kept_boundary = (
        docs.join(F.broadcast(boundary), ["source", "n_chars"])
        .withColumn("run", F.sum("n_tokens").over(wdoc) + F.col("cum_before"))
        .filter(F.col("run") <= budget)
        .select("source", "doc_id", "n_tokens")
    )
    return kept_whole.unionByName(kept_boundary)


def q_corpus_cleaning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed cleaning pipeline — per-document keep/drop decision
    with the FIRST failing rule as the reason, C4-style:

    1. ``duplicate`` — not the canonical copy of its exact-dedup group
       (md5 of normalized text; canonical = min doc_id);
    2. ``lang``      — lexicon language-ID doesn't predict English;
    3. ``quality``   — too short (< 5 tokens) or alphanumeric ratio
       below 4/5 (integer cross-multiplication, no float thresholds);
    4. ``kept``      — survives everything.

    One narrow scan + one md5-groupBy join; every signal is reused from
    the oracle-exact text operators, so the whole composition carries a
    DuckDB oracle too."""
    t = load(spark, sf_dir)
    toks = F.split("text", " ")
    pred = pred_lang_expr(stopword_scores(toks))
    alnum = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9 ]", ""))
    hashed = t.documents.select(
        "doc_id",
        normalized_text_hash("text").alias("text_hash"),
        pred.alias("pred_lang"),
        F.size(toks).alias("n_tokens"),
        alnum.alias("alnum"),
        F.length("text").alias("len_chars"),
    )
    canon = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("keep_id"))
    reason = (
        F.when(F.col("doc_id") != F.col("keep_id"), F.lit("duplicate"))
        .when(F.col("pred_lang") != "en", F.lit("lang"))
        .when(
            (F.col("n_tokens") < 5)
            | (F.col("alnum") * 5 < F.col("len_chars") * 4),
            F.lit("quality"),
        )
        .otherwise(F.lit("kept"))
    )
    return (
        hashed.join(canon, "text_hash")
        .select("doc_id", reason.alias("reason"))
        .withColumn("keep", F.col("reason") == "kept")
    )



#: Posting-list cap for decontamination grams: a gram present in more
#: than this many documents is boilerplate, not leakage.
DECON_MAX_DOC_FREQ = 100


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination scan: for every non-test (train or val)
    document sharing
    at least one word-3-gram with any TEST document (splits assigned by
    the same hash buckets as q_train_val_test_split), report how many
    distinct grams leak and how many test documents they touch — the
    eval-decontamination step of a training-data build (real pipelines
    use 8-13-grams; n is a knob, 3 fits the fixtures).

    Scale shape: inverted-index (posting-list) join on the gram, the
    same skeleton as n-gram Jaccard — never doc×doc. The df cap bounds
    per-gram fanout (a gram in >cap docs is boilerplate, not leakage),
    so join work is Σ df_train(g)·df_test(g) over rare grams — linear
    in corpus size for natural gram distributions. Two aggregates after
    the join, both map-side combinable on high-cardinality keys."""
    from .dedup import shingles

    t = load(spark, sf_dir)
    # consumed by both the train and test branches — lazy localCheckpoint
    # so the tokenize/explode/df-cap pipeline runs once, not per branch
    # (cache() reverted in d5c0b11: recompute beats the memory pin here)
    sh = shingles(
        t.documents, n=3, max_doc_freq=DECON_MAX_DOC_FREQ
    ).localCheckpoint(eager=False)
    # split bucket is a pure function of doc_id — derive it post-shingle
    # rather than carrying a column through the explode.
    is_test = _bucket(F.col("doc_id"), "split") >= SPLIT_VAL_END
    test_grams = sh.filter(is_test).select(
        F.col("doc_id").alias("test_doc_id"), "shingle"
    )
    train_grams = sh.filter(~is_test).select("doc_id", "shingle")
    return (
        train_grams.join(test_grams, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_hit_grams"),
            F.countDistinct("test_doc_id").alias("n_test_docs"),
        )
    )


#: Tokens per packed training sequence; docs-per-bucket width for the
#: two-level prefix sum (at 100 TB set ~1e6 docs/bucket so the bucket
#: table stays small).
SEQ_LEN = 256
PACK_BUCKET_WIDTH = 64


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing: lay all documents end-to-end
    in doc_id order and cut every SEQ_LEN tokens; report each doc's
    starting sequence, its token offset inside it, and how many
    sequences it spans — the final "make training batches" step of an
    LLM data build.

    The global running token sum is computed as a two-level prefix sum,
    never a global window over raw rows: (1) per-doc_id-range-bucket
    token totals (map-side combinable), (2) an unpartitioned cumsum
    over the BUCKET table only (N / bucket_width rows — with 1e6
    docs/bucket, 100B docs is 100k rows on one reducer, trivial),
    (3) a within-bucket cumsum partitioned by bucket (high cardinality)
    plus the broadcast bucket offset. Same skeleton as
    q_token_budget_selection, generalized to an exact global order."""
    t = load(spark, sf_dir)
    docs = (
        t.documents.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .withColumn("bucket", F.expr(f"doc_id div {PACK_BUCKET_WIDTH}"))
        # feeds both the bucket-total branch and the final join —
        # cache so the text scan + tokenization runs once
        .cache()
    )
    bsums = docs.groupBy("bucket").agg(F.sum("n_tokens").alias("btok"))
    wb = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boff = bsums.select(
        "bucket",
        F.coalesce(F.sum("btok").over(wb), F.lit(0)).alias("b_before"),
    )
    wd = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = (
        docs.join(F.broadcast(boff), "bucket")
        .withColumn(
            "cb",
            F.coalesce(F.sum("n_tokens").over(wd), F.lit(0)) + F.col("b_before"),
        )
    )
    seq_start = F.expr(f"cb div {SEQ_LEN}")
    seq_end = F.expr(f"(cb + n_tokens - 1) div {SEQ_LEN}")
    return cum.select(
        "doc_id",
        "n_tokens",
        seq_start.alias("seq_id"),
        F.pmod(F.col("cb"), F.lit(SEQ_LEN)).cast("long").alias("seq_offset"),
        (seq_end - seq_start + 1).alias("n_seqs"),
    )


#: Per-source token cap for q_mixture_rebalance (rates derived FROM the
#: data, unlike SAMPLE_RATES' fixed config). Rates resolve in parts per
#: million so a source up to ~1e6x over the cap is downsampled toward
#: the cap rather than floored to zero (an integer percent would drop
#: any source >100x the cap entirely).
MIXTURE_TOKEN_CAP = 600
MIXTURE_RATE_RESOLUTION = 1_000_000


def q_mixture_rebalance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-derived mixture rebalancing: compute each source's keep-rate
    so its EXPECTED token contribution is capped at MIXTURE_TOKEN_CAP
    (rate_pct = min(100, cap*100 div source_tokens) — pure integer
    arithmetic), then select documents by hash bucket against that
    rate. The "flatten the mixture" step of corpus construction, with
    rates that adapt to the corpus instead of hand-set config. Rates
    are parts-per-million (floored to >= 1), so even a source many
    orders of magnitude over the cap is thinned, never silently
    dropped.

    Scale: one aggregate pass for the per-source token totals (map-side
    combinable, |sources| rows), broadcast back, then a narrow
    scan + filter. The selection stays a pure function of (doc_id,
    corpus aggregate) — rerunnable, auditable, no RNG."""
    t = load(spark, sf_dir)
    docs = t.documents.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    res = MIXTURE_RATE_RESOLUTION
    rates = (
        docs.groupBy("source")
        .agg(F.sum("n_tokens").alias("tok"))
        .select(
            "source",
            F.least(
                F.lit(res).cast("long"),
                F.greatest(
                    F.lit(1).cast("long"),
                    F.expr(f"({MIXTURE_TOKEN_CAP} * {res}) div tok"),
                ),
            ).alias("rate"),
        )
    )
    return (
        docs.join(F.broadcast(rates), "source")
        .withColumn("bucket", _bucket(F.col("doc_id"), "mix", res))
        .filter(F.col("bucket") < F.col("rate"))
        .select("doc_id", "source", "n_tokens", "rate", "bucket")
    )


def q_cluster_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the hash bucket is computed on
    the document's DEDUP CLUSTER id, not its own id, so every member of
    a near-duplicate cluster lands in the SAME split — the property a
    naive per-doc split violates (train/test leakage through paraphrase
    duplicates is the classic eval-contamination failure).

    Composes connected-components clustering (operators.dedup) with the
    same md5 bucket arithmetic as q_train_val_test_split; adding new
    docs never moves an existing cluster's split unless the new doc
    BRIDGES two clusters (inherent to dedup-aware splitting)."""
    from .dedup import corpus_components

    comp = corpus_components(spark, sf_dir)
    b = _bucket(F.col("comp"), "csplit")
    split = (
        F.when(b < SPLIT_TRAIN_END, F.lit("train"))
        .when(b < SPLIT_VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return comp.select(
        F.col("id").alias("doc_id"),
        F.col("comp").alias("cluster_id"),
        split.alias("split"),
    )


#: q_doc_chunking window geometry (tokens).
CHUNK_SIZE = 64
CHUNK_STRIDE = 32


def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the step that
    turns variable-length documents into training examples (context
    windows). Windows start every CHUNK_STRIDE tokens and span up to
    CHUNK_SIZE; the tail window is short rather than dropped, so every
    token is covered by ≥1 chunk. Emits the chunk's md5 (content
    receipt), not the chunk text, keeping the output narrow.

    Scale: pure array-side row expansion — sequence/slice/md5 inside
    whole-stage codegen, no shuffle at all; output rows ≈
    total_tokens / stride. At 100 TB this is the shape you want: the
    expansion is local to each scan task and writes straight to the
    sink."""
    t = load(spark, sf_dir)
    return chunk_documents(t.documents)


def chunk_documents(documents: DataFrame) -> DataFrame:
    """Core of q_doc_chunking over any (doc_id, text) DataFrame —
    reused by the corpus pipeline on the post-cleaning document set."""
    toks = F.split("text", " ")
    starts = F.sequence(F.lit(0), F.size(toks) - 1, F.lit(CHUNK_STRIDE))
    d = documents.select("doc_id", toks.alias("t"), starts.alias("starts"))
    return d.select(
        "doc_id",
        F.posexplode("starts").alias("chunk_idx", "st"),
        F.col("t"),
    ).select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.col("st").cast("int").alias("start_tok"),
        F.least(F.lit(CHUNK_SIZE), F.size("t") - F.col("st"))
        .cast("int")
        .alias("n_chunk_tokens"),
        F.md5(
            F.concat_ws(
                " ", F.expr(f"slice(t, st + 1, {CHUNK_SIZE})")
            )
        ).alias("chunk_hash"),
    )


def q_training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a pseudorandom 60-bit sort key (md5-derived — reproducible across
    runs and engines, no RNG state), and its global position in that
    order. The property a training pipeline needs: the order is a pure
    function of the doc ids, so a resumed/replayed epoch sees the same
    sequence.

    Scale: a global row_number would single-partition the sort. This
    computes positions in two levels: (1) coarse bucket from the key's
    top bits, (2) per-bucket counts → cumulative offsets (a window
    over ≤4096 bucket rows — driver-scale), (3) row_number WITHIN each
    bucket + the bucket's offset. Each reducer sorts only its bucket
    (~n/4096 rows), which is the standard distributed total-order
    (range-partition + local sort) expressed declaratively."""
    t = load(spark, sf_dir)
    key = portable_hash64(
        F.concat(F.lit("shuffle0:"), F.col("doc_id").cast("string"))
    )
    d = t.documents.select(
        "doc_id", "source", key.alias("shuffle_key")
    ).withColumn("bucket", F.shiftright("shuffle_key", 48))
    offsets = (
        d.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "offset",
            F.coalesce(
                F.sum("n").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ),
        )
        .select("bucket", "offset")
    )
    wb = Window.partitionBy("bucket").orderBy("shuffle_key", "doc_id")
    return (
        d.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "position", F.row_number().over(wb) + F.col("offset") - 1
        )
        .select("position", "doc_id", "source", "shuffle_key")
    )


#: Per-source epoch counts are rule-derived (sources are synthetic
#: srcN labels): 1 + (md5-hash of the source) mod 3 ∈ {1,2,3} epochs.
EPOCH_MOD = 3


def q_epoch_mixture_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-expansion of a weighted mixture: each source is assigned
    an epoch count (how many times its documents repeat in the
    training set — the "4 epochs of wikipedia, 1 of web" pattern), and
    every document is materialized once per epoch with a per-epoch
    deterministic shuffle key (so repeats don't sit adjacent in the
    training order).

    Scale: explode(sequence(...)) is a local row expansion — no
    shuffle, output = Σ epochs(source) × docs. The per-source epoch
    table stays a broadcast-size dimension at any corpus size."""
    t = load(spark, sf_dir)
    epochs = (
        F.pmod(
            portable_hash64(F.concat(F.lit("epochs:"), F.col("source"))),
            F.lit(EPOCH_MOD),
        )
        + 1
    ).cast("int")
    d = t.documents.select("doc_id", "source", epochs.alias("n_epochs"))
    return d.select(
        "doc_id",
        "source",
        "n_epochs",
        F.explode(F.sequence(F.lit(0), F.col("n_epochs") - 1)).alias("epoch"),
    ).withColumn(
        "epoch", F.col("epoch").cast("int")
    ).withColumn(
        "example_key",
        portable_hash64(
            F.concat_ws(":", F.lit("ex"), F.col("epoch"), F.col("doc_id"))
        ),
    )


def q_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeated-window (substring-style) dedup: full-size token chunks
    whose content recurs anywhere in the corpus — the practical
    distributed stand-in for suffix-array substring dedup (Lee et al.'s
    "Deduplicating Training Data Makes Language Models Better" removes
    repeated spans; fixed windows approximate spans at 1/stride
    resolution). Emits every occurrence of a duplicated window with its
    group stats; the canonical occurrence is the (min doc_id, min
    chunk_idx) one — a curation pass drops the rest.

    Scale: chunk expansion is shuffle-free (see q_doc_chunking); the
    only shuffles are the hash groupBy (|distinct windows| output,
    map-side combined) and the join back — posting-list economics,
    same as exact dedup. Partial tail windows are excluded: equal
    hashes there would compare different-length texts."""
    chunks = q_doc_chunking(spark, sf_dir).filter(
        F.col("n_chunk_tokens") == CHUNK_SIZE
    )
    # composite occurrence key: doc_id * 2^20 + chunk_idx (chunk_idx
    # is bounded far below 2^20 by doc length); integer min over it
    # picks the first occurrence portably in both engines
    occ_key = F.col("doc_id") * F.lit(1 << 20) + F.col("chunk_idx")
    groups = (
        chunks.select("chunk_hash", occ_key.alias("okey"), "doc_id")
        .groupBy("chunk_hash")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("okey").alias("first_okey"),
        )
        .filter(F.col("n_occurrences") >= 2)
    )
    return (
        chunks.join(groups, "chunk_hash")
        .select(
            "chunk_hash",
            "doc_id",
            "chunk_idx",
            "n_occurrences",
            "n_docs",
            (occ_key == F.col("first_okey")).alias("is_canonical"),
        )
    )


#: q_group_sample docs kept per source.
GROUP_SAMPLE_K = 5


def q_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic k-per-group sample: each source contributes its
    ``GROUP_SAMPLE_K`` docs with the smallest md5-derived sample keys —
    the inspect-a-few-per-slice query every curation review needs,
    reproducible across runs/engines (no RNG, no ``sample()``).

    Scale: rank within source over the hash order — partitioned
    window, per-reducer work is one source's docs; with heavily
    skewed sources swap in the bucket-offset decomposition (the
    pattern is already in training_order_shuffle)."""
    t = load(spark, sf_dir)
    key = portable_hash64(
        F.concat(F.lit("gsample:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy("sample_key", "doc_id")
    return (
        t.documents.select(
            "doc_id", "source", "lang", key.alias("sample_key")
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= GROUP_SAMPLE_K)
        .select("source", "doc_id", "lang", "sample_key", F.col("rk").cast("int").alias("rk"))
    )


#: q_length_histogram bucket width (whitespace tokens).
LENGTH_BUCKET = 16


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-length distribution per source: token counts bucketed
    at LENGTH_BUCKET granularity — the length-profile report that
    drives truncation/packing decisions. Map-side-combinable groupBy;
    output is |sources| x |buckets| rows at any corpus size."""
    t = load(spark, sf_dir)
    n_tok = F.size(F.split("text", " "))
    bucket = (n_tok - n_tok % LENGTH_BUCKET).cast("int")
    return (
        t.documents.select("source", bucket.alias("bucket_lo"))
        .groupBy("source", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


def q_corpus_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus pipeline's survivor selection as a pure query —
    (doc_id, cluster_id, split) for every published document: cleaning
    keep/drop, near-dup clustering, canonical-among-cleaned promotion,
    and the leakage-safe cluster-keyed split, hash-checked end to end
    against a single DuckDB oracle (recursive-CTE closure + the same
    cleaning CASE + md5 bucket arithmetic). ``run_corpus_pipeline``
    publishes exactly these rows' documents."""
    from .dedup import corpus_components

    kept = (
        q_corpus_cleaning_report(spark, sf_dir)
        .filter(F.col("reason") == "kept")
        .select("doc_id")
    )
    comp = corpus_components(spark, sf_dir)
    surv = (
        kept.join(comp, kept.doc_id == comp.id)
        .groupBy("comp")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    b = _bucket(F.col("comp"), "csplit")
    split = (
        F.when(b < SPLIT_TRAIN_END, F.lit("train"))
        .when(b < SPLIT_VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return surv.select(
        "doc_id", F.col("comp").alias("cluster_id"), split.alias("split")
    )


def q_mixture_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened mixture weights — the n^(1/2) (T=2)
    sampling rule real LM data recipes use to upweight small sources
    without letting the largest dominate: each source's target share
    is isqrt(n_tokens) / Σ isqrt(n_tokens), computed entirely in
    exact integers (``functions.isqrt`` + half-up ppm division), so
    the DuckDB twin hash-matches. Reports, per source, the raw token
    share vs the flattened share and the implied per-document sampling
    weight (flattened/raw in ppm — >1e6 means upsample).

    Scale: one aggregate pass (map-side combinable, |sources| rows)
    and a 1-row broadcast total — the output is dictionary-sized; the
    actual selection against these shares is ``q_mixture_rebalance``'s
    hash-bucket filter shape."""
    from ..functions import isqrt

    t = load(spark, sf_dir)
    per_src = (
        t.documents.select(
            "source",
            F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tok"),
        )
        .withColumn("w", isqrt(F.col("tok")))
    )
    totals = per_src.agg(
        F.sum("tok").alias("tok_total"), F.sum("w").alias("w_total")
    )
    # products lift to DECIMAL(38,0) BEFORE multiplying: tok·1e6 alone
    # overflows int64 at ~9.2e12 corpus tokens (well inside 100 TB
    # scale), and w·tok_total·1e6 at ~4e8 — the decimal lift keeps
    # every staging exact (oracle twin pre-casts to HUGEINT likewise)
    d38 = "decimal(38,0)"
    tok_d = F.col("tok").cast(d38)
    w_d = F.col("w").cast(d38)
    tok_total_d = F.col("tok_total").cast(d38)
    w_total_d = F.col("w_total").cast(d38)
    return (
        per_src.crossJoin(F.broadcast(totals))
        .select(
            "source",
            "n_docs",
            "tok",
            "w",
            halfup_div(tok_d * 1_000_000, tok_total_d, 0).alias(
                "raw_share_ppm"
            ),
            halfup_div(w_d * 1_000_000, w_total_d, 0).alias(
                "temp_share_ppm"
            ),
            # implied resample weight: flattened share / raw share
            halfup_div(
                w_d * tok_total_d * 1_000_000,
                w_total_d * tok_d,
                0,
            ).alias("resample_ppm"),
        )
    )


def q_corpus_datacard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataset card in one query: corpus-level numbers a model/data
    card reports — size, duplication, language mix, tokenizer
    coverage, LM cross-entropy — each COMPOSED from the already-
    oracle-exact operators (same expressions, so the card cannot
    drift from the per-doc queries it summarizes). One row per metric;
    values are exact integers/ppm carried as double (all < 2^53, so
    the double carry is lossless and engine-identical).

    Scale: every constituent is an aggregate the constituent queries
    already bound (dictionary-sized or 1-row outputs); the union is 7
    scalar rows."""
    from .text import (
        pred_lang_expr,
        q_bigram_cross_entropy,
        q_vocab_coverage,
        stopword_scores,
    )

    t = load(spark, sf_dir)
    toks = F.split("text", " ")
    pred = pred_lang_expr(stopword_scores(toks))
    base = t.documents.select(
        F.size(toks).cast("long").alias("n_tokens"),
        (pred == "en").cast("long").alias("is_en"),
        normalized_text_hash("text").alias("text_hash"),
    )
    doc_stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.sum("is_en").alias("n_en"),
    )
    groups = base.groupBy("text_hash").agg(F.count(F.lit(1)).alias("sz"))
    dup_stats = groups.agg(
        F.sum((F.col("sz") > 1).cast("long")).alias("dup_groups"),
        F.sum(F.col("sz") - 1).alias("dup_docs"),
    )
    oov = q_vocab_coverage(spark, sf_dir).agg(
        F.sum("n_oov").alias("oov"), F.sum("n_tokens").alias("tok")
    )
    lm = q_bigram_cross_entropy(spark, sf_dir).agg(
        F.sum("sum_cost_unats").alias("cost"),
        F.sum("n_bigrams").alias("grams"),
    )

    def row(name: str, value) -> DataFrame:
        return value.select(
            F.lit(name).alias("metric"), F.col("v").cast("double").alias("value")
        )

    return (
        row("n_docs", doc_stats.select(F.col("n_docs").alias("v")))
        .unionByName(
            row("total_tokens", doc_stats.select(F.col("total_tokens").alias("v")))
        )
        .unionByName(
            row(
                "english_ppm",
                doc_stats.select(
                    halfup_div(
                        F.col("n_en") * 1_000_000, F.col("n_docs"), 0
                    ).alias("v")
                ),
            )
        )
        .unionByName(
            row("dup_groups", dup_stats.select(F.col("dup_groups").alias("v")))
        )
        .unionByName(
            row("dup_docs", dup_stats.select(F.col("dup_docs").alias("v")))
        )
        .unionByName(
            row(
                "oov_ppm",
                oov.select(
                    halfup_div(F.col("oov") * 1_000_000, F.col("tok"), 0).alias("v")
                ),
            )
        )
        .unionByName(
            row(
                "bigram_cross_entropy_unats",
                lm.select(
                    halfup_div(F.col("cost"), F.col("grams"), 0).alias("v")
                ),
            )
        )
    )


#: Portable Bloom-filter geometry for the decontamination pre-filter:
#: BLOOM_BITS-bit filter stored as BLOOM_BITS/32 words, BLOOM_K
#: md5-derived hash functions. ~4.7k distinct test grams at sf0.01 in
#: 2^16 bits → ~25% occupancy → (0.25)^4 ≈ 0.4% false-positive rate.
BLOOM_BITS = 1 << 16
BLOOM_K = 4


def _bloom_pos(key, j: int):
    """Bit position [0, BLOOM_BITS) of hash function j — md5-derived,
    identical in DuckDB."""
    return F.pmod(
        portable_hash64(F.concat(F.lit(f"bloom{j}:"), key)),
        F.lit(BLOOM_BITS),
    )


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-filter — the 100 TB shape of
    q_decontaminate, fully oracle-exact. The exact posting-list join
    must shuffle train grams against test grams; at scale the right
    first pass is a Bloom filter OF THE TEST SET (here 2^16 bits = a
    1024-row (word, bits) table built by groupBy(word).bit_or — the
    same registers-style mergeable-aggregate pattern as the portable
    HLL) broadcast to the train side, so only grams that HIT the
    filter proceed to exact verification. No false negatives by
    construction (every true leak hits all its bits — pytest-pinned);
    false positives are the (0.25)^k ≈ 0.4% tax the exact
    verification pass then removes.

    Output per train/val doc with ≥ 1 bloom hit: distinct grams,
    bloom-hit grams, true-hit grams (exact), and the false-positive
    count the bloom would have sent to verification unnecessarily —
    the filter's measured precision, reported per document.

    Everything is deterministic integer arithmetic over md5-derived
    positions, so the DuckDB twin computes the identical filter,
    identical hits, and identical false-positive accounting."""
    from .dedup import shingles

    t = load(spark, sf_dir)
    sh = shingles(
        t.documents, n=3, max_doc_freq=DECON_MAX_DOC_FREQ
    ).localCheckpoint(eager=False)
    is_test = _bucket(F.col("doc_id"), "split") >= SPLIT_VAL_END
    test_grams = sh.filter(is_test).select("shingle").distinct()
    train_gr = sh.filter(~is_test).select("doc_id", "shingle")

    # build: k bit positions per distinct test gram -> 1024-row filter
    pos = test_grams.select(
        F.explode(
            F.array(*[_bloom_pos(F.col("shingle"), j) for j in range(BLOOM_K)])
        ).alias("p")
    )
    # 32-bit words (word = p >> 5, bit = p & 31): shifts stay below the
    # sign bit, which DuckDB's checked << would reject at bit 63
    bloom = (
        pos.select(
            F.shiftright("p", 5).alias("word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod("p", F.lit(32)).cast("int"),
            ).alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )

    # probe: per distinct train gram, all k bits present?
    probe = train_gr.select("shingle").distinct().select(
        "shingle",
        F.explode(
            F.array(*[_bloom_pos(F.col("shingle"), j) for j in range(BLOOM_K)])
        ).alias("p"),
    )
    gram_hits = (
        probe.select(
            "shingle",
            F.shiftright("p", 5).alias("word"),
            F.call_function(
                "shiftleft",
                F.lit(1).cast("long"),
                F.pmod("p", F.lit(32)).cast("int"),
            ).alias("mask"),
        )
        .join(F.broadcast(bloom), "word", "left")
        .select(
            "shingle",
            (
                F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("mask"))
                != 0
            )
            .cast("long")
            .alias("present"),
        )
        .groupBy("shingle")
        .agg((F.sum("present") == BLOOM_K).alias("bloom_hit"))
    )
    truth = (
        train_gr.join(test_grams, "shingle")
        .select("shingle")
        .distinct()
        .withColumn("true_hit", F.lit(True))
    )
    per_gram = gram_hits.join(truth, "shingle", "left").select(
        "shingle",
        "bloom_hit",
        F.coalesce("true_hit", F.lit(False)).alias("true_hit"),
    )
    return (
        train_gr.join(per_gram, "shingle")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("shingle").alias("n_grams"),
            F.countDistinct(
                F.when(F.col("bloom_hit"), F.col("shingle"))
            ).alias("n_bloom_hits"),
            F.countDistinct(
                F.when(F.col("true_hit"), F.col("shingle"))
            ).alias("n_true_hits"),
        )
        .filter(F.col("n_bloom_hits") > 0)
        .select(
            "doc_id",
            "n_grams",
            "n_bloom_hits",
            "n_true_hits",
            (F.col("n_bloom_hits") - F.col("n_true_hits")).alias(
                "n_false_positives"
            ),
        )
    )


#: q_bloom_fpr_audit sweep: hash counts measured over the SAME
#: BLOOM_BITS filter geometry. BLOOM_FPR_MAXJ positions are computed
#: once per gram; level k uses the PREFIX j < k, so the whole sweep
#: is one pass (the standard "how many hash functions" sizing
#: question answered on real data instead of the e^-kn/m formula).
BLOOM_FPR_KS = [1, 2, 4, 6, 8]
BLOOM_FPR_MAXJ = 8


def q_bloom_fpr_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter FALSE-POSITIVE-RATE audit — the measured
    occupancy/FPR trade-off across hash counts k ∈ {1,2,4,6,8} on the
    decontamination workload (test-gram filter probed by train grams),
    i.e. the physical-design experiment behind choosing BLOOM_K.

    One-pass k-sweep: position j of gram g depends only on (g, j), so
    the level-k filter's membership of position p is ``minj(p) < k``
    where minj(p) = min hash index of any test gram landing on p. A
    probe hits at level k iff ALL its first k positions are set:
    ``max_{j<k} coalesce(minj(p_j), MAXJ) <= k-1``. The sweep is then
    a groupBy over an exploded (gram, j, k) frame — no k rebuilds.

    Members (train grams that ARE test grams) always hit — the
    no-false-negative law, pinned per level by pytest. Output per k:
    filter occupancy (bits_set), probes, member probes, bloom hits,
    false positives, and fpr_micro over the non-member probes. All
    md5-derived integer arithmetic — the DuckDB twin reproduces every
    count exactly.

    Scale: minj is ≤ BLOOM_BITS rows (broadcast); the probe side is
    one exploded linear pass over distinct grams with a map-side
    combinable groupBy. Nothing is quadratic in the corpus."""
    from .dedup import shingles

    t = load(spark, sf_dir)
    sh = shingles(
        t.documents, n=3, max_doc_freq=DECON_MAX_DOC_FREQ
    ).localCheckpoint(eager=False)
    is_test = _bucket(F.col("doc_id"), "split") >= SPLIT_VAL_END
    test_grams = sh.filter(is_test).select("shingle").distinct()
    probe_grams = sh.filter(~is_test).select("shingle").distinct()

    def positions(df: DataFrame) -> DataFrame:
        return df.select(
            "shingle",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("j"),
                            _bloom_pos(F.col("shingle"), j).alias("p"),
                        )
                        for j in range(BLOOM_FPR_MAXJ)
                    ]
                )
            ).alias("jp"),
        ).select("shingle", F.col("jp.j").alias("j"), F.col("jp.p").alias("p"))

    minj = (
        positions(test_grams)
        .groupBy("p")
        .agg(F.min("j").alias("minj"))
        .localCheckpoint(eager=False)  # <= BLOOM_BITS rows, feeds 2 paths
    )
    klits = F.array(*[F.lit(k) for k in BLOOM_FPR_KS])
    hits = (
        positions(probe_grams)
        .join(F.broadcast(minj), "p", "left")
        .select(
            "shingle",
            "j",
            F.coalesce("minj", F.lit(BLOOM_FPR_MAXJ)).alias("t"),
            F.explode(klits).alias("k"),
        )
        .filter(F.col("j") < F.col("k"))
        .groupBy("shingle", "k")
        .agg(F.max("t").alias("mk"))
        .withColumn("bloom_hit", F.col("mk") <= F.col("k") - 1)
    )
    membership = probe_grams.join(
        test_grams.withColumn("is_member", F.lit(True)), "shingle", "left"
    ).select("shingle", F.coalesce("is_member", F.lit(False)).alias("is_member"))
    per_k = (
        hits.join(membership, "shingle")
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.col("is_member").cast("long")).alias("n_member_probes"),
            F.sum(F.col("bloom_hit").cast("long")).alias("n_bloom_hits"),
            F.sum(
                (F.col("bloom_hit") & ~F.col("is_member")).cast("long")
            ).alias("n_false_pos"),
        )
    )
    bits_set = (
        minj.select(F.explode(klits).alias("k"), "minj")
        .filter(F.col("minj") <= F.col("k") - 1)
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("bits_set"))
    )
    n_test = test_grams.agg(
        F.count(F.lit(1)).alias("n_test_grams")
    )
    from ..functions import _idiv

    return (
        per_k.join(bits_set, "k")
        .crossJoin(n_test)  # 1-row scalar attach
        .select(
            F.col("k").cast("int").alias("k_hashes"),
            "n_test_grams",
            "bits_set",
            "n_probes",
            "n_member_probes",
            "n_bloom_hits",
            "n_false_pos",
            _idiv(
                F.col("n_false_pos") * F.lit(1_000_000),
                F.col("n_probes") - F.col("n_member_probes"),
            ).alias("fpr_micro"),
        )
        .orderBy("k_hashes")
    )


#: q_token_subsampling threshold t = SUB_T_NUM / SUB_T_DEN (the
#: word2vec default 1e-3) and the 30-bit hash scale.
SUB_T_NUM = 1
SUB_T_DEN = 1000
SUB_HASH_BITS = 30


def q_token_subsampling(spark, sf_dir: str) -> DataFrame:
    """Frequency subsampling of the token stream (Mikolov/word2vec):
    an occurrence of term w survives with probability
    √(t / f(w)) (capped at 1), so stopword-frequency terms are
    aggressively thinned while rare terms pass untouched — the
    standard rebalancing step before embedding/tokenizer training,
    made DETERMINISTIC and oracle-exact.

    No RNG and no square root: the occurrence's 30-bit md5-derived
    hash h (keyed on term:doc:pos) survives iff
    ``h² · c_w · SUB_T_DEN < N · SUB_T_NUM · 2^60`` — squaring the
    comparison removes the √ entirely; everything is one exact
    DECIMAL(38,0)/HUGEINT cross-multiply, identical in both engines.
    The hash is uniform, so the survival RATE converges to √(t/f) —
    the pytest pins the rate against the closed form.

    Scale: one exploded pass with the term-count dictionary joined
    back (broadcast at test SF, shuffle join at vocabulary scale), one
    groupBy to the per-term report. Map-side combinable throughout.

    Output: (term, n_before, n_kept) per term."""
    from ..catalog import load
    from ..functions import portable_hash64

    d38 = "decimal(38,0)"
    t = load(spark, sf_dir)
    toks = (
        t.documents.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
        )
        .filter(F.col("term") != "")
    )
    counts = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    total = toks.agg(F.count(F.lit(1)).alias("n_total"))
    h = F.pmod(
        portable_hash64(
            F.concat_ws(
                ":",
                F.col("term"),
                F.col("doc_id").cast("string"),
                F.col("pos").cast("string"),
            )
        ),
        F.lit(1 << SUB_HASH_BITS),
    ).cast(d38)
    keep = (
        h * h * F.col("c").cast(d38) * F.lit(SUB_T_DEN)
        < F.col("n_total").cast(d38)
        * F.lit(SUB_T_NUM)
        * F.lit(2**60).cast(d38)
    )
    return (
        toks.join(F.broadcast(counts), "term")
        .crossJoin(F.broadcast(total))
        .groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("n_before"),
            F.sum(keep.cast("long")).alias("n_kept"),
        )
    )


#: Skip-gram context window: offsets ±1..±SKIPGRAM_WINDOW.
SKIPGRAM_WINDOW = 2
#: Report floor: pairs seen fewer times are noise.
SKIPGRAM_MIN_COUNT = 5


def q_skipgram_pairs(spark, sf_dir: str) -> DataFrame:
    """(center, context) skip-gram training-pair counts over a ±2
    positional window — the example generator of word2vec/GloVe-style
    embedding training, positional where `term_pmi_top_pairs` is
    document-level.

    The window join is OFFSET-EXPLODED: each occurrence emits its
    (doc, pos ± k) probe keys and pairs form by plain EQUI-join on
    (doc_id, pos) — never an inequality/range join, so the plan is a
    hash join at any scale (the same trick as the binned interval
    join). Pair counting is map-side combinable; the report keeps
    pairs with ≥ ``SKIPGRAM_MIN_COUNT`` co-occurrences, ordered
    deterministically.

    Output: (center, context, n_pairs) — direction preserved
    (left/right contexts both counted, as training does)."""
    from ..catalog import load

    t = load(spark, sf_dir)
    toks = (
        t.documents.select(
            "doc_id", F.posexplode(F.split("text", " ")).alias("pos", "term")
        )
        .filter(F.col("term") != "")
        .cache()  # probe + build sides
    )
    offsets = [k for k in range(-SKIPGRAM_WINDOW, SKIPGRAM_WINDOW + 1) if k]
    probes = toks.select(
        "doc_id",
        F.col("term").alias("center"),
        F.explode(
            F.array(*[F.col("pos") + F.lit(k) for k in offsets])
        ).alias("pos"),
    )
    pairs = probes.join(toks, ["doc_id", "pos"]).select(
        "center", F.col("term").alias("context")
    )
    return (
        pairs.groupBy("center", "context")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .filter(F.col("n_pairs") >= SKIPGRAM_MIN_COUNT)
    )


#: q_ccnet_buckets bucket shift: perplexity keys (micro-nats x 1e6)
#: coarsen by 2^33 so the bucket table stays ~4k rows.
CCNET_BUCKET_SHIFT = 33


def q_ccnet_buckets(spark, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail corpus split: rank every document
    by its bigram-LM cross-entropy (the oracle-exact perplexity score
    from ``text.q_bigram_cross_entropy``) and cut the corpus into
    exact terciles — head = most in-distribution third, tail = most
    perplexing. THE canonical LLM-pretraining quality bucketing.

    Exactness: the rank key is the half-up integer
    ``round(sum_cost·10⁶ / n_bigrams)`` (pure integers on both
    engines); the global rank uses the two-level bucket-offset
    decomposition (bucket = key >> 33, a ≤ ~4k-row table — the ONLY
    unpartitioned window runs over it, the same scale argument as
    customer_spend_ntile), and the tercile is
    ``(rank−1)·3 div n + 1``, which reproduces NTILE(3)'s
    larger-first-tiles arithmetic bit for bit.

    Scale: score = two dictionary-grain groupBys (see the LM query);
    ranking adds one bucket-grain window and a broadcast offset join —
    no global sort of the corpus anywhere."""
    from pyspark.sql import Window

    from ..catalog import load
    from ..functions import _idiv
    from .text import q_bigram_cross_entropy

    d38 = "decimal(38,0)"
    sc = q_bigram_cross_entropy(spark, sf_dir).select(
        "doc_id",
        _idiv(
            F.lit(2).cast(d38) * F.col("sum_cost_unats").cast(d38)
            * F.lit(1_000_000)
            + F.col("n_bigrams").cast(d38),
            F.lit(2).cast(d38) * F.col("n_bigrams").cast(d38),
        ).alias("k"),
    )
    scored = sc.select(
        "doc_id", "k", F.shiftright("k", CCNET_BUCKET_SHIFT).alias("bkt")
    ).localCheckpoint(eager=False)
    sizes = scored.groupBy("bkt").agg(F.count(F.lit(1)).alias("c"))
    offs = sizes.select(
        "bkt",
        (
            F.sum("c").over(
                Window.orderBy("bkt").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            )
        ).alias("off"),
    ).fillna(0, subset=["off"])
    rn = F.row_number().over(Window.partitionBy("bkt").orderBy("k", "doc_id"))
    ranked = (
        scored.withColumn("rn", rn)
        .join(F.broadcast(offs), "bkt")
        .select("doc_id", "k", (F.col("off") + F.col("rn")).alias("rank"))
    )
    n_total = scored.agg(F.count(F.lit(1)).alias("n"))
    tercile = (
        _idiv((F.col("rank") - 1) * 3, F.col("n")) + 1
    ).cast("int")
    return (
        ranked.crossJoin(F.broadcast(n_total))
        .select(
            "doc_id",
            F.col("k").alias("avg_cost_key"),
            F.col("rank").cast("long").alias("rank"),
            tercile.alias("tercile"),
        )
        .withColumn(
            "bucket",
            F.element_at(
                F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
                F.col("tercile"),
            ),
        )
    )


# ---------------------------------------------------------------------------
# Weighted sampling without replacement (A-ES / exponential keys)
# ---------------------------------------------------------------------------

#: Weighted-sample size and the uniform-hash modulus (u in (0, 1] at
#: millionth grain).
WSAMPLE_K = 100
WSAMPLE_U_MOD = 1_000_000


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the top-k
    documents by the A-ES exponential-key order (Efraimidis–Spirakis),
    weight = token count — the 'sample long documents proportionally
    more' corpus-curation policy, where each doc's inclusion
    probability is proportional to its weight and reruns are identical.

    A-ES keys: u ~ U(0,1] per doc, key = -ln(u)/w; keep the k SMALLEST
    keys. Fixed-point and cross-engine exact: u = h/10⁶ with
    h = portable_hash64('ws:'||doc_id) % 10⁶ + 1, -ln(u) =
    ``ln_micro(10⁶, h)`` (the integer shift-and-square log both
    engines define bit-identically), and the rank key is
    ``(ln_micro · 10⁶) div w`` — pure integers, no float ln anywhere.

    Scale: key computation is an expression scan; selection is global
    top-k (TakeOrderedAndProject — per-partition heaps then a k-row
    merge, never a global sort). The one-pass distributed weighted
    reservoir at 100 TB is exactly this: score, then top-k."""
    from ..functions import _idiv, ln_micro

    t = load(spark, sf_dir)
    toks = t.documents.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != "")).alias(
            "n_tokens"
        ),
    ).filter(F.col("n_tokens") >= 1)
    h = (
        portable_hash64(F.concat(F.lit("ws:"), F.col("doc_id").cast("string")))
        % WSAMPLE_U_MOD
        + 1
    )
    keyed = toks.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("weight"),
        _idiv(
            ln_micro(F.lit(WSAMPLE_U_MOD), h) * F.lit(1_000_000),
            F.col("n_tokens"),
        ).alias("key_micro"),
    )
    return (
        keyed.orderBy(F.asc("key_micro"), F.asc("doc_id"))
        .limit(WSAMPLE_K)
        .select("doc_id", "weight", "key_micro")
    )


# ---------------------------------------------------------------------------
# Round-robin source interleaving (data-loader order)
# ---------------------------------------------------------------------------


def q_interleaved_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic round-robin interleave across sources — the
    data-loader ORDER construction that complements the mixture-WEIGHT
    operators: take each source's documents in a reproducible shuffled
    order and deal them out one-per-source per round (round 1 = every
    source's first doc, round 2 = the seconds, ...), with exhausted
    sources simply skipped. The property a training run needs: maximal
    source dispersion (no two consecutive examples from one source
    while others still have docs) as a pure function of the ids.

    Scale: BOTH ranking levels avoid single-partition windows. The
    within-source rank decomposes per (source, key-bucket) — the only
    unpartitioned window runs over the ≤ |sources|·4096 bucket-count
    table — and the global round-robin position is rank-decomposed
    over (round, source) groups the same way: position = docs dealt in
    earlier rounds (prefix sum over the bounded per-round size table)
    + the source's slot among this round's survivors."""
    t = load(spark, sf_dir)
    key = portable_hash64(
        F.concat(F.lit("il:"), F.col("doc_id").cast("string"))
    )
    d = t.documents.select(
        "doc_id", "source", key.alias("k")
    ).withColumn("bucket", F.shiftright("k", 48))
    # within-source rank, two-level: per (source, bucket) counts give
    # per-source bucket offsets; row_number stays inside the bucket
    sizes = d.groupBy("source", "bucket").agg(F.count(F.lit(1)).alias("n"))
    offs = sizes.withColumn(
        "off",
        F.coalesce(
            F.sum("n").over(
                Window.partitionBy("source")
                .orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("source", "bucket", "off")
    wb = Window.partitionBy("source", "bucket").orderBy("k", "doc_id")
    ranked = (
        d.join(F.broadcast(offs), ["source", "bucket"])
        .withColumn("round", F.row_number().over(wb) + F.col("off"))
        .select("doc_id", "source", "round")
    )
    # global round-robin position: all docs of rounds < r precede
    # round r. The offset needs NO table of per-round sizes (that
    # table is O(n/|sources|) rows — an unpartitioned cumsum over it
    # was the round-6 plan-sweep catch): source s deals min(count_s,
    # r-1) docs before round r, so the offset is one array expression
    # over the broadcast |sources|-row count list. Within a round,
    # sources in lexicographic order (window partitioned by round:
    # ≤ |sources| rows per partition).
    scounts = d.groupBy("source").agg(F.count(F.lit(1)).alias("cnt"))
    call = scounts.groupBy().agg(
        F.collect_list("cnt").alias("cnts")
    )
    roff = F.aggregate(
        "cnts",
        F.lit(0).cast("long"),
        lambda acc, c: acc + F.least(c, F.col("round").cast("long") - 1),
    )
    wr = Window.partitionBy("round").orderBy("source")
    return (
        ranked.crossJoin(F.broadcast(call))
        .withColumn("roff", roff)
        .withColumn("position", F.row_number().over(wr) + F.col("roff") - 1)
        .select("position", "doc_id", "source", F.col("round").cast("long").alias("round"))
    )


# ---------------------------------------------------------------------------
# Contrastive pair mining (near-dup positives, cross-cluster negatives)
# ---------------------------------------------------------------------------


def q_contrastive_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mine (anchor, positive, negative) training triplets for
    embedding/retrieval models from the dedup graph: every
    non-canonical member of a multi-member near-dup cluster anchors
    one triplet — positive = its cluster's canonical (a genuine
    near-duplicate), negative = the canonical of the NEXT multi-member
    cluster in a deterministic hash order (wrap-around), guaranteed to
    be a different entity. The standard "duplicates are free positive
    pairs" construction of contrastive pretraining data.

    Scale: clusters come from the memoized CC table; the negative
    assignment ranks the (multi-member) cluster canonicals with the
    same two-level bucket-offset decomposition every global rank here
    uses (the only unpartitioned window runs over the bounded
    bucket-count table), then one broadcast join maps rank -> next
    rank's canonical. No window ever sorts cluster rows in a single
    partition."""
    from .dedup import corpus_components

    comp = corpus_components(spark, sf_dir)
    sizes = comp.groupBy("comp").agg(F.count(F.lit(1)).alias("n"))
    multi = sizes.filter(F.col("n") >= 2).select("comp")
    # rank multi-member clusters in hash order, two-level
    keyed = multi.select(
        "comp",
        portable_hash64(
            F.concat(F.lit("neg:"), F.col("comp").cast("string"))
        ).alias("k"),
    ).withColumn("bucket", F.shiftright("k", 48))
    bsizes = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    boffs = bsizes.withColumn(
        "off",
        F.coalesce(
            F.sum("bn").over(
                Window.orderBy("bucket").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("bucket", "off")
    wb = Window.partitionBy("bucket").orderBy("k", "comp")
    ranked = (
        keyed.join(F.broadcast(boffs), "bucket")
        .withColumn("rk", F.row_number().over(wb) + F.col("off") - 1)
        .select("comp", "rk")
        .cache()  # consumed by both sides of the shift join
    )
    n_multi = ranked.groupBy().agg(F.count(F.lit(1)).alias("n_clusters"))
    nxt = ranked.select(F.col("comp").alias("neg_comp"), F.col("rk").alias("nrk"))
    shifted = (
        ranked.crossJoin(F.broadcast(n_multi))
        # degenerate corpus guard (r7): with exactly ONE multi-member
        # cluster the wrap-around (rk+1) % n would point the negative
        # back at the anchor's own cluster — emit no triplets instead,
        # keeping the "negative is a different entity" guarantee true
        .filter(F.col("n_clusters") >= 2)
        .withColumn("want", (F.col("rk") + 1) % F.col("n_clusters"))
        .join(nxt, F.col("want") == F.col("nrk"))
        .select("comp", "neg_comp")
    )
    anchors = comp.join(F.broadcast(multi), "comp").filter(
        F.col("id") != F.col("comp")  # canonical = min id = comp label
    )
    return (
        anchors.join(F.broadcast(shifted), "comp")
        .select(
            F.col("id").alias("anchor_id"),
            F.col("comp").alias("positive_id"),
            F.col("neg_comp").alias("negative_id"),
        )
    )


# ---------------------------------------------------------------------------
# Length-bucketed batching (padding-efficiency batch construction)
# ---------------------------------------------------------------------------

#: Batch geometry: docs per batch, and the power-of-2 length-bucket
#: floor (buckets: [0,32), [32,64), [64,128), ... by token count).
LB_BATCH_DOCS = 8
LB_MIN_BUCKET = 32


def q_length_bucketed_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch construction — the padding-efficiency
    pattern of every training data loader: group documents into
    power-of-2 token-length buckets, fill fixed-size batches within
    each bucket in deterministic order, and account the padding waste
    each batch pays (docs padded to the batch max). Batching similar
    lengths together is what keeps that waste low; the output's
    pad_frac column makes the saving auditable.

    Scale: the within-bucket rank decomposes over (bucket, doc_id div
    4096) sub-ranges — counts/offsets live on a bounded grid, the only
    row-level window is partitioned by those sub-ranges — and the
    batch-grain aggregate is map-side combinable. No global sort, no
    per-bucket single-partition window."""
    from ..functions import halfup_div

    t = load(spark, sf_dir)
    n_tok = F.size(F.filter(F.split("text", " "), lambda x: x != ""))
    d = t.documents.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
    ).withColumn(
        # next power of two >= n_tokens, in pure integers (the float
        # log2/pow form can land on 5.999… at exact powers and drift
        # cross-engine): 1 << bit_length(n-1), floored at LB_MIN_BUCKET
        "bucket",
        F.greatest(
            F.lit(LB_MIN_BUCKET).cast("long"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), "
                "length(bin(greatest(n_tokens - 1, 1))))"
            ),
        ),
    ).withColumn("sub", F.expr("doc_id div 4096"))
    sizes = d.groupBy("bucket", "sub").agg(F.count(F.lit(1)).alias("n"))
    offs = sizes.withColumn(
        "off",
        F.coalesce(
            F.sum("n").over(
                Window.partitionBy("bucket")
                .orderBy("sub")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("bucket", "sub", "off")
    ws = Window.partitionBy("bucket", "sub").orderBy("doc_id")
    ranked = d.join(F.broadcast(offs), ["bucket", "sub"]).withColumn(
        "rk", F.row_number().over(ws) + F.col("off") - 1
    )
    batched = ranked.withColumn(
        "batch_id", F.expr(f"rk div {LB_BATCH_DOCS}")
    )
    return (
        batched.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "max_len",
            "sum_tokens",
            halfup_div(
                F.col("n_docs") * F.col("max_len") - F.col("sum_tokens"),
                F.col("n_docs") * F.col("max_len"),
                6,
            ).alias("pad_frac"),
        )
    )


# ---------------------------------------------------------------------------
# Curriculum ordering (easy-to-hard by LM perplexity terciles)
# ---------------------------------------------------------------------------


def q_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum construction: a deterministic global training order
    that presents the most in-distribution documents first — the
    CCNet/perplexity head tercile, then middle, then tail — with a
    reproducible shuffle WITHIN each tercile (so the curriculum is
    easy→hard across stages but unordered inside a stage). Composes
    the oracle-exact ``q_ccnet_buckets`` tercile with the same
    two-level rank decomposition every global order here uses.

    Scale: tercile assignment is the LM-scoring pipeline (dictionary-
    grain groupBys); the within-tercile rank decomposes over (tercile,
    key-bucket) — offsets live on a ≤3·4096-row grid — and the
    tercile base offsets are a broadcast 3-row table. No global sort
    of the corpus anywhere."""
    cc = q_ccnet_buckets(spark, sf_dir).select("doc_id", "tercile")
    key = portable_hash64(
        F.concat(F.lit("cur:"), F.col("doc_id").cast("string"))
    )
    d = cc.withColumn("k", key).withColumn(
        "bucket", F.shiftright("k", 48)
    ).cache()  # scoring pipeline consumed by 3 branches
    sizes = d.groupBy("tercile", "bucket").agg(F.count(F.lit(1)).alias("n"))
    offs = sizes.withColumn(
        "off",
        F.coalesce(
            F.sum("n").over(
                Window.partitionBy("tercile")
                .orderBy("bucket")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("tercile", "bucket", "off")
    tsizes = d.groupBy("tercile").agg(F.count(F.lit(1)).alias("tn"))
    toffs = tsizes.withColumn(
        "toff",
        F.coalesce(
            F.sum("tn").over(
                Window.orderBy("tercile").rowsBetween(
                    Window.unboundedPreceding, -1
                )
            ),
            F.lit(0),
        ),
    ).select("tercile", "toff")
    wb = Window.partitionBy("tercile", "bucket").orderBy("k", "doc_id")
    return (
        d.join(F.broadcast(offs), ["tercile", "bucket"])
        .join(F.broadcast(toffs), "tercile")
        .withColumn(
            "position",
            F.row_number().over(wb) + F.col("off") + F.col("toff") - 1,
        )
        .select(F.col("position").cast("long").alias("position"), "doc_id", "tercile")
    )


def q_corpus_training_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end capstone for the round-6 construction ops: CLEANED
    corpus (the C4-style keep decision) → perplexity-tercile
    CURRICULUM stage → LENGTH-BUCKETED fixed-size batches with exact
    padding-waste accounting, at batch grain — the complete "what does
    the trainer actually consume" plan, each constituent reused from
    its own oracle-exact operator so the composition carries a DuckDB
    twin too (the same composition discipline as corpus_survivors).

    Scale: cleaning + LM scoring are the constituent pipelines;
    the batch rank decomposes over (tercile, bucket, doc_id div 4096)
    sub-ranges; the aggregate is batch-grain and map-side combinable."""
    from ..functions import halfup_div

    t = load(spark, sf_dir)
    kept = q_corpus_cleaning_report(spark, sf_dir).filter(
        F.col("reason") == "kept"
    ).select("doc_id")
    cc = q_ccnet_buckets(spark, sf_dir).select("doc_id", "tercile")
    # bucketing length = NON-EMPTY token count, the same definition
    # q_length_bucketed_batches uses (r7: previously the capstone used
    # the unfiltered split size, so a doc with consecutive spaces
    # could land in a different bucket here than in the standalone
    # operator; the cleaning thresholds above keep their own
    # unfiltered n_tokens — only the batch-bucket length is unified)
    ntok = t.documents.select(
        "doc_id",
        F.size(F.filter(F.split("text", " "), lambda x: x != ""))
        .cast("long")
        .alias("n_tokens"),
    )
    d = (
        kept.join(cc, "doc_id")
        .join(ntok, "doc_id")
        .withColumn(
            "bucket",
            F.greatest(
                F.lit(LB_MIN_BUCKET).cast("long"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), "
                    "length(bin(greatest(n_tokens - 1, 1))))"
                ),
            ),
        )
        .withColumn("sub", F.expr("doc_id div 4096"))
        .cache()  # scoring pipelines consumed twice
    )
    sizes = d.groupBy("tercile", "bucket", "sub").agg(
        F.count(F.lit(1)).alias("n")
    )
    offs = sizes.withColumn(
        "off",
        F.coalesce(
            F.sum("n").over(
                Window.partitionBy("tercile", "bucket")
                .orderBy("sub")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ),
    ).select("tercile", "bucket", "sub", "off")
    ws = Window.partitionBy("tercile", "bucket", "sub").orderBy("doc_id")
    ranked = d.join(F.broadcast(offs), ["tercile", "bucket", "sub"]).withColumn(
        "rk", F.row_number().over(ws) + F.col("off") - 1
    )
    return (
        ranked.withColumn("batch_id", F.expr(f"rk div {LB_BATCH_DOCS}"))
        .groupBy("tercile", "bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tokens").alias("max_len"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .select(
            "tercile",
            "bucket",
            "batch_id",
            "n_docs",
            "max_len",
            "sum_tokens",
            halfup_div(
                F.col("n_docs") * F.col("max_len") - F.col("sum_tokens"),
                F.col("n_docs") * F.col("max_len"),
                6,
            ).alias("pad_frac"),
        )
    )


#: T5-style span corruption geometry: one corrupted span per
#: SPAN_SEG-token segment (~15% noise density at the mean span length
#: of 3), spans of 2-4 tokens, docs shorter than SPAN_MIN_TOKENS skipped.
SPAN_MIN_TOKENS = 20
SPAN_SEG = 20


def q_span_corruption_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style SPAN CORRUPTION mask generator — the denoising-
    pretraining transformation (Raffel et al., JMLR 2020): for every
    document, a deterministic set of non-overlapping token spans to
    mask, each paired with the exact masked token text so the span
    arithmetic AND the tokenization are both oracle-verified.

    Determinism without a RNG: the token range is cut into
    ``k = n_tokens // SPAN_SEG`` equal segments and each segment hosts
    exactly one span (guaranteed non-overlap, no rejection sampling —
    the property per-position Bernoulli masking only gets in
    expectation); the span length (2-4 tokens) and in-segment offset
    come from the portable md5 hash of (doc_id, span_id), so any
    engine regenerates the identical mask set. Everything is
    expression-side: split → sequence/explode → slice/array_join; row
    count is Σ n_tokens / SPAN_SEG, never quadratic.

    Output: (doc_id, span_id, start_token, span_len, masked_tokens)."""
    t = load(spark, sf_dir)
    d = (
        t.documents.select("doc_id", F.split("text", " ").alias("toks"))
        .withColumn("n_tokens", F.size("toks").cast("long"))
        .filter(F.col("n_tokens") >= SPAN_MIN_TOKENS)
        .withColumn(
            "k",
            F.floor(F.col("n_tokens") / F.lit(SPAN_SEG)).cast("long"),
        )
        .withColumn(
            "seg_len", F.floor(F.col("n_tokens") / F.col("k")).cast("long")
        )
    )
    s = d.select(
        "doc_id",
        "toks",
        "seg_len",
        F.explode(
            F.sequence(F.lit(0).cast("long"), F.col("k") - 1)
        ).alias("span_id"),
    )
    span_len = 2 + F.pmod(
        portable_hash64(
            F.concat(
                F.lit("spanlen:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("span_id").cast("string"),
            )
        ),
        F.lit(3),
    )
    s = s.withColumn("span_len", span_len)
    start = F.col("span_id") * F.col("seg_len") + F.pmod(
        portable_hash64(
            F.concat(
                F.lit("spanstart:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("span_id").cast("string"),
            )
        ),
        F.col("seg_len") - F.col("span_len") + 1,
    )
    s = s.withColumn("start_token", start)
    return s.select(
        "doc_id",
        "span_id",
        "start_token",
        "span_len",
        F.array_join(
            F.slice(
                "toks",
                (F.col("start_token") + 1).cast("int"),
                F.col("span_len").cast("int"),
            ),
            " ",
        ).alias("masked_tokens"),
    )


#: Fixed slot budget for the largest-remainder apportionment demo.
APPORTION_BUDGET = 1000


def q_source_quota_apportionment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LARGEST-REMAINDER (Hamilton) APPORTIONMENT — exact integer
    allocation of a fixed document budget across sources proportional
    to their token mass, the allocation step a training-mixture plan
    needs once rates (`mixture_rebalance`) say *how much* and the
    budget says *how many*: every source gets ``floor(B·w/W)`` slots,
    and the ``B − Σ floor`` leftover slots go to the largest division
    remainders (ties broken by source name), so Σ quota == B exactly —
    the property naive per-source rounding cannot give.

    Everything is exact integer arithmetic (DECIMAL(38,0)/HUGEINT
    products, pmod remainders), so both engines allocate identically.
    Scale: one map-side-combinable aggregate for the per-source token
    masses; the apportionment itself runs on the |sources|-row table
    (windows over a bounded aggregate, the whitelisted class).

    Output: (source, tokens, base_quota, remainder, extra_seat,
    quota)."""
    from pyspark.sql import Window

    from ..functions import _idiv

    t = load(spark, sf_dir)
    w = (
        t.documents.select(
            "source", F.size(F.split("text", " ")).alias("n_tok")
        )
        .groupBy("source")
        .agg(F.sum("n_tok").alias("tokens"))
    )
    tot = w.agg(F.sum("tokens").alias("w_total"))
    b = F.lit(APPORTION_BUDGET).cast("decimal(38,0)")
    g = w.crossJoin(F.broadcast(tot)).select(
        "source",
        "tokens",
        _idiv(b * F.col("tokens"), F.col("w_total")).alias("base_quota"),
        F.pmod(
            (b * F.col("tokens")).cast("decimal(38,0)"),
            F.col("w_total").cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("remainder"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("remainder"), F.asc("source"))
    )
    base_sum = g.agg(F.sum("base_quota").alias("base_sum"))
    ranked = g.withColumn("rk", rk).crossJoin(F.broadcast(base_sum))
    extra = (
        F.col("rk") <= (F.lit(APPORTION_BUDGET) - F.col("base_sum"))
    ).cast("long")
    return ranked.select(
        "source",
        "tokens",
        "base_quota",
        "remainder",
        extra.alias("extra_seat"),
        (F.col("base_quota") + extra).alias("quota"),
    )


#: Domain-grain synthesis + mixture budget (VERDICT r10 ask #8). The
#: fixture has no URL column, so one is DERIVED deterministically:
#: trailing doc_id digits 7/8/9 collide onto the ...6 page of their
#: decade (planted exact URL duplicates — the "same page crawled
#: thrice" stage), and the page's domain is the linear-skew map
#: isqrt(url_key % DOMAIN_MOD): domain k owns 2k+1 of every 2500 url
#: slots — a crawl-like long tail without any RNG, reproducible in
#: both engines (exact integer square root).
DOMAIN_MOD = 2500
DOMAIN_BUDGET = 100_000


def q_domain_dedup_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/DOMAIN-GRAIN DEDUP + QUALITY-WEIGHTED MIXTURE — the one
    common pretraining-pipeline stage the registry lacked (VERDICT r10
    ask #8): web corpora are deduplicated at URL grain FIRST (the same
    page recrawled is the cheapest duplicate class, caught before any
    content hashing), then per-DOMAIN statistics drive the mixture —
    how much of each domain the training budget should sample, with
    low-quality domains down-weighted (the CCNet/RefinedWeb recipe).

    Stages, all deterministic integer arithmetic:

    1. **URL synthesis** (fixture seam, see `DOMAIN_MOD`): url_key
       collisions plant exact URL dups; domain = isqrt-skewed map.
    2. **URL dedup**: per url_key the smallest doc_id survives (first
       crawl wins) — a per-url window min, no content comparison.
    3. **Domain quality**: per-doc type-token ratio in micro
       (distinct_tokens·10⁶ div tokens — the cheap lexical-diversity
       proxy; boilerplate/spam domains score low), averaged per domain
       over SURVIVORS (trunc division, engine-exact).
    4. **Mixture interaction**: the DOMAIN_BUDGET sample quota is
       apportioned across domains by the SAME Hamilton
       largest-remainder scheme as `source_quota_apportionment`,
       weighted by tokens × mean_ttr — so a spammy domain's mass is
       discounted by its quality before seats are allocated, and
       Σ quota == DOMAIN_BUDGET exactly. The quota column is the
       per-domain budget a `mixture_rebalance`-style sampler consumes.

    Scale: one map-side token/distinct count per doc; the URL window
    is partitioned by url_key (never global); domain aggregation is
    one combinable shuffle at domain grain; the Hamilton windows run
    over the bounded |domains| table (≤ 50 rows — the whitelisted
    bounded-window class).

    Output per domain: (domain, n_docs, n_dup_removed, tokens,
    mean_ttr_micro, quota)."""
    from pyspark.sql import Window

    winners = (
        url_keyed_docs(load(spark, sf_dir).documents)
        .withColumn(
            "keep",
            (
                F.col("doc_id")
                == F.min("doc_id").over(Window.partitionBy("url_key"))
            ).cast("long"),
        )
        .withColumn(
            "n_at_url",
            F.count(F.lit(1)).over(Window.partitionBy("url_key")),
        )
        .filter(F.col("keep") == 1)
        .select("url_key", "n_tok", "n_distinct", "n_at_url")
    )
    return domain_mixture_finish(winners)


def url_keyed_docs(documents: DataFrame) -> DataFrame:
    """The deterministic URL synthesis shared by the batch operator and
    the streamed drain: (doc_id, url_key, n_tok, n_distinct)."""
    d = F.col("doc_id") % 10
    url_key = F.when(d >= 7, F.col("doc_id") - (d - 6)).otherwise(
        F.col("doc_id")
    )
    return documents.select(
        "doc_id",
        url_key.alias("url_key"),
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.size(F.array_distinct(F.split("text", " ")))
        .cast("long")
        .alias("n_distinct"),
    )


def domain_mixture_finish(winners: DataFrame) -> DataFrame:
    """Shared tail of the domain-mixture pipeline (batch operator AND
    the URL-dedup-at-ingest streaming drain): ``winners`` is the
    per-URL survivor table (url_key, n_tok, n_distinct, n_at_url) —
    one row per distinct URL carrying the smallest-doc_id crawl's
    stats plus the URL's total crawl count. Aggregates to domain grain
    (n_dup_removed = Σ (n_at_url − 1)) and Hamilton-apportions the
    DOMAIN_BUDGET by tokens × mean-TTR quality."""
    from pyspark.sql import Window

    from ..functions import _idiv, isqrt

    ttr = _idiv(F.col("n_distinct") * F.lit(1_000_000), F.col("n_tok"))
    dom = (
        winners.withColumn(
            "domain_id", isqrt(F.col("url_key") % DOMAIN_MOD)
        )
        .groupBy("domain_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("n_at_url") - 1).cast("long").alias("n_dup_removed"),
            F.sum("n_tok").cast("long").alias("tokens"),
            F.sum(ttr).cast("long").alias("ttr_sum"),
        )
        .withColumn("mean_ttr_micro", _idiv(F.col("ttr_sum"), F.col("n_docs")))
        .withColumn(
            "w",
            F.col("tokens").cast("decimal(38,0)") * F.col("mean_ttr_micro"),
        )
    )
    tot = dom.agg(F.sum("w").alias("w_total"))
    b = F.lit(DOMAIN_BUDGET).cast("decimal(38,0)")
    g = dom.crossJoin(F.broadcast(tot)).select(
        "domain_id",
        "n_docs",
        "n_dup_removed",
        "tokens",
        "mean_ttr_micro",
        _idiv(b * F.col("w"), F.col("w_total")).alias("base_quota"),
        F.pmod(
            (b * F.col("w")).cast("decimal(38,0)"),
            F.col("w_total").cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("remainder"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("remainder"), F.asc("domain_id"))
    )
    base_sum = g.agg(F.sum("base_quota").alias("base_sum"))
    ranked = g.withColumn("rk", rk).crossJoin(F.broadcast(base_sum))
    extra = (
        F.col("rk") <= (F.lit(DOMAIN_BUDGET) - F.col("base_sum"))
    ).cast("long")
    return ranked.select(
        F.concat(
            F.lit("d"),
            F.col("domain_id").cast("string"),
            F.lit(".example.com"),
        ).alias("domain"),
        "n_docs",
        "n_dup_removed",
        "tokens",
        "mean_ttr_micro",
        (F.col("base_quota") + extra).alias("quota"),
    )


#: DSIR geometry: hashed-bigram feature buckets (the paper uses 10k
#: buckets of hashed unigrams+bigrams; 4096 keeps the bucket table
#: trivially broadcastable while leaving ~7 grams/bucket at sf0.01),
#: and the designated target source (stable across scale factors).
DSIR_BUCKETS = 4096
DSIR_TARGET = "src0"


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection with Importance Resampling (Xie et al.
    2023): score every RAW-pool document by how target-like its hashed
    n-gram feature distribution is, the importance-weighting stage the
    paper puts in front of pretraining-data selection (select raw docs
    whose log importance weight is highest / resample by it).

    Feature model (the paper's, fixed-point): bigrams hashed into
    ``DSIR_BUCKETS`` buckets (``portable_hash64 mod B``); the target
    (source == DSIR_TARGET) and raw (every other source) corpora each
    induce an add-one-smoothed unigram distribution over buckets; a
    doc's log weight is

        log w(d) = Σ_f c_f(d) · [ln p̂_t(f) − ln p̂_r(f)]
                 = Σ_f c_f(d) · Δ(f)  +  n_grams(d) · C

    with Δ(f) = ±ln_micro(t_f+1, r_f+1) (sign-split — the
    `term_pmi_top_pairs` convention) and the per-corpus normalizer
    C = ±ln_micro(R+B, T+B) factored out of the ratio so every
    ln_micro argument stays inside the < 2³¹ contract (the raw
    cross-product (t_f+1)(R+B) would not). Pure integer micro-nats
    end to end — both engines agree bit-for-bit.

    Scale: one token-grain pass to grams; bucket counting is map-side
    combinable at (doc, bucket) grain; the bucket model is B = 4096
    rows → broadcast; scoring is one combinable aggregate per doc.
    Nothing shuffles above gram grain, and the model table is
    constant-size regardless of corpus size (the paper's point: the
    importance model is a hashed sketch, not a vocabulary).

    Output: one row per RAW document — (doc_id, source, n_grams,
    logw_micro)."""
    t = load(spark, sf_dir)
    db_all = (
        dsir_doc_buckets(t.documents)
        .groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    return dsir_finish(db_all)


def dsir_doc_buckets(documents: DataFrame) -> DataFrame:
    """The hashed-bigram feature projection shared by the batch DSIR
    operator and the model-at-ingest streaming drain: one row per
    (doc_id, source, bucket) GRAM occurrence."""
    from ..functions import portable_hash64

    base = spread_scan(
        documents.select(
            "doc_id", "source", F.split("text", " ").alias("tk")
        )
    )
    grams = base.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "zip_with(slice(tk, 1, size(tk) - 1), "
                "slice(tk, 2, size(tk) - 1), "
                "(a, b) -> concat(a, ' ', b))"
            )
        ).alias("gram"),
    )
    return grams.select(
        "doc_id",
        "source",
        F.pmod(portable_hash64(F.col("gram")), F.lit(DSIR_BUCKETS)).alias(
            "bucket"
        ),
    )


def dsir_finish(db_all: DataFrame) -> DataFrame:
    """Shared DSIR tail (batch operator AND the streamed drain):
    ``db_all`` is the per-(doc_id, source, bucket) gram-count grid
    over ALL documents (target + raw). Derives the bucket model
    (t_f/r_f sums), the sign-split Δ(f) deltas and the factored
    normalizer C, and scores the raw-pool docs."""
    from ..functions import ln_micro

    db_all = db_all.localCheckpoint(eager=False)  # model AND scoring
    is_t = F.col("source") == DSIR_TARGET
    bt = db_all.groupBy("bucket").agg(
        F.sum(F.when(is_t, F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("t_f"),
        F.sum(F.when(~is_t, F.col("c")).otherwise(F.lit(0)))
        .cast("long")
        .alias("r_f"),
    )
    a, b = F.col("t_f") + 1, F.col("r_f") + 1
    delta = F.when(a >= b, ln_micro(a, b)).otherwise(-ln_micro(b, a))
    model = bt.select("bucket", delta.alias("delta_unats"))
    tot = bt.agg(
        (F.sum("t_f") + F.lit(DSIR_BUCKETS)).alias("tb"),
        (F.sum("r_f") + F.lit(DSIR_BUCKETS)).alias("rb"),
    )
    cnorm = tot.select(
        F.when(
            F.col("rb") >= F.col("tb"),
            ln_micro(F.col("rb"), F.col("tb")),
        )
        .otherwise(-ln_micro(F.col("tb"), F.col("rb")))
        .alias("c_unats")
    )
    return (
        db_all.filter(~is_t)
        .join(F.broadcast(model), "bucket")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("delta_unats")).alias("s"),
        )
        .crossJoin(F.broadcast(cnorm))
        .select(
            "doc_id",
            "source",
            "n_grams",
            (F.col("s") + F.col("n_grams") * F.col("c_unats"))
            .cast("long")
            .alias("logw_micro"),
        )
    )


#: Negative-sampling table geometry: total slots and the vocabulary cap
#: (rank windows only ever run over the capped top vocabulary, never the
#: raw term space).
NEG_TABLE_SLOTS = 65_536
NEG_VOCAB_CAP = 65_536


def q_negative_sampling_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """word2vec/NCE negative-sampling table — the freq^(3/4) unigram
    table every embedding trainer draws negatives from (Mikolov et al.
    2013: the 3/4 power keeps rare words reachable without letting
    stopwords dominate). Slots are allocated by the SAME Hamilton
    largest-remainder scheme as ``source_quota_apportionment``, so
    Σ slots == NEG_TABLE_SLOTS exactly — a table you can index by a
    uniform integer draw with zero rejection.

    Fixed point: the 3/4 power is the deterministic quantization
    isqrt(f · isqrt(f)) — two exact integer square roots, no float
    pow, identical on both engines (the ``ln_micro`` policy); its
    isqrt domain contract (f·isqrt(f) < 2⁵²  ⟸  f < 2³⁴) is guarded
    with raise_error Spark-side and the same error() CASE in the
    oracle. Vocabulary is capped to the top ``NEG_VOCAB_CAP`` terms by
    (freq desc, term) FIRST, so the remainder-rank window runs over a
    bounded table at any corpus size.

    Output: top-50 table rows by (slots desc, term) —
    (term, freq, weight, base_quota, slots)."""
    from ..functions import _idiv, isqrt

    t = load(spark, sf_dir)
    tf = (
        t.documents.select(
            F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), "term")
        .limit(NEG_VOCAB_CAP)
    )
    guarded_f = F.when(
        F.col("freq") >= F.lit(2**34),
        F.raise_error(
            F.lit(
                "negative_sampling contract violated: freq >= 2^34 "
                "exceeds the exact isqrt domain; pre-scale counts"
            )
        ).cast("long"),
    ).otherwise(F.col("freq"))
    w = tf.select(
        "term",
        "freq",
        isqrt(guarded_f * isqrt(guarded_f)).alias("weight"),
    )
    tot = w.agg(F.sum("weight").alias("w_total"))
    slots = F.lit(NEG_TABLE_SLOTS).cast("decimal(38,0)")
    g = w.crossJoin(F.broadcast(tot)).select(
        "term",
        "freq",
        "weight",
        _idiv(slots * F.col("weight"), F.col("w_total")).alias(
            "base_quota"
        ),
        F.pmod(
            (slots * F.col("weight")).cast("decimal(38,0)"),
            F.col("w_total").cast("decimal(38,0)"),
        )
        .cast("long")
        .alias("remainder"),
    )
    rk = F.row_number().over(
        Window.orderBy(F.desc("remainder"), F.asc("term"))
    )
    base_sum = g.agg(F.sum("base_quota").alias("base_sum"))
    ranked = g.withColumn("rk", rk).crossJoin(F.broadcast(base_sum))
    extra = (
        F.col("rk") <= (F.lit(NEG_TABLE_SLOTS) - F.col("base_sum"))
    ).cast("long")
    return (
        ranked.select(
            "term",
            "freq",
            "weight",
            "base_quota",
            (F.col("base_quota") + extra).alias("slots"),
        )
        .orderBy(F.desc("slots"), "term")
        .limit(50)
    )


#: Hashing-trick feature space size (Vowpal-Wabbit style 2^12 buckets).
FEATURE_HASH_BITS = 12


def q_feature_hash_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit — before committing a pipeline to
    feature hashing (Weinberger et al. 2009), measure what a 2^``FEATURE_
    HASH_BITS`` bucket space does to THIS vocabulary: the bucket-load
    count-of-counts histogram, from which collision exposure reads off
    directly (a bucket holding k terms conflates k features). The same
    shape as ``key_skew_profile``, one level up: skew of the HASH
    space, not the key space.

    Buckets come from the portable md5 hash masked to the low bits
    (identical both engines); the histogram is two map-side-combinable
    aggregates over the vocabulary grain. Self-auditing: Σ load ×
    n_buckets = |vocab| and Σ n_buckets ≤ 2^bits are pytest-pinned.

    Output: (bucket_load, n_buckets, n_terms) — one row per observed
    bucket load, plus the load-0 row completing the 2^bits space."""
    from ..functions import portable_hash64

    t = load(spark, sf_dir)
    n_space = 1 << FEATURE_HASH_BITS
    vocab = (
        t.documents.select(
            F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .filter(F.col("term") != "")
        .distinct()
        .select(
            F.pmod(portable_hash64(F.col("term")), F.lit(n_space)).alias(
                "bucket"
            )
        )
    )
    loads = vocab.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("bucket_load")
    )
    hist = loads.groupBy("bucket_load").agg(
        F.count(F.lit(1)).alias("n_buckets")
    )
    occupied = hist.agg(F.sum("n_buckets").alias("occ"))
    zero_row = occupied.select(
        F.lit(0).cast("long").alias("bucket_load"),
        (F.lit(n_space) - F.col("occ")).alias("n_buckets"),
    )
    return (
        hist.select(F.col("bucket_load"), "n_buckets")
        .unionByName(zero_row)
        .select(
            "bucket_load",
            "n_buckets",
            (F.col("bucket_load") * F.col("n_buckets")).alias("n_terms"),
        )
        .orderBy("bucket_load")
    )


#: FIM geometry: docs shorter than this pass through untransformed
#: (a 3-way split of a tiny doc trains nothing); cut points are
#: splitmix60-derived so the transform is reproducible and
#: cross-engine exact.
FIM_MIN_CHARS = 32
#: Sentinel tokens (Bavarian et al. 2022, "Efficient Training of
#: Language Models to Fill in the Middle").
FIM_PRE, FIM_SUF, FIM_MID = "<fim_prefix>", "<fim_suffix>", "<fim_middle>"


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILL-IN-THE-MIDDLE transform of the document corpus — the
    data-side half of FIM pretraining (Bavarian et al. 2022): each
    document is split at two deterministic cut points into
    (prefix, middle, suffix) and re-serialized in PSM or SPM sentinel
    order, 50/50 by a third hash draw, so the SAME corpus build is
    reproducible across engines and backfills (no RNG state — the
    curation-module contract).

    Cut-point derivation (splitmix60, seed = portable_hash64(doc_id)):
    stream 0 → lo ∈ [1, n−2], stream 1 → hi ∈ [lo+1, n−1], stream 2
    LSB → PSM/SPM. All three spans are therefore non-empty by
    construction. Docs with fewer than ``FIM_MIN_CHARS`` characters
    pass through as mode 'raw' with NULL cuts (transforming a tiny
    doc yields degenerate spans; passing it through keeps the corpus
    complete — same row count in, same out).

    Scale: map-only — one md5 per doc, then three staged integer
    mixes (``splitmix60_apply``; the inline form duplicates a ~1300-
    node subtree per draw). No shuffle, no window, no collect; at
    100 TB this is a pure narrow scan.

    Output: (doc_id, n_chars, cut_lo, cut_hi, mode, fim_len,
    fim_md5) — the md5 is over the re-serialized text, so the oracle
    hash-checks the full transform without shipping the strings."""
    from ..functions import splitmix60_apply

    t = load(spark, sf_dir)
    base = t.documents.select(
        "doc_id",
        "text",
        F.length("text").cast("long").alias("n"),
        portable_hash64(F.col("doc_id")).alias("seed"),
    )
    cur = splitmix60_apply(
        base, ["doc_id", "text", "n", "seed"], F.col("seed"), F.lit(0),
        out="u1",
    )
    cur = splitmix60_apply(
        cur, ["doc_id", "text", "n", "seed", "u1"], F.col("seed"),
        F.lit(1), out="u2",
    )
    cur = splitmix60_apply(
        cur, ["doc_id", "text", "n", "u1", "u2"], F.col("seed"),
        F.lit(2), out="u3",
    )
    n = F.col("n")
    lo = F.lit(1) + F.pmod(F.col("u1"), n - F.lit(2))
    hi = lo + F.lit(1) + F.pmod(F.col("u2"), n - F.lit(1) - lo)
    c = cur.select(
        "doc_id",
        "text",
        "n",
        F.when(n >= FIM_MIN_CHARS, lo).alias("cut_lo"),
        F.when(n >= FIM_MIN_CHARS, hi).alias("cut_hi"),
        F.when(n < FIM_MIN_CHARS, F.lit("raw"))
        .when(F.pmod(F.col("u3"), F.lit(2)) == 0, F.lit("psm"))
        .otherwise(F.lit("spm"))
        .alias("mode"),
    )
    pre = F.substring(F.col("text"), F.lit(1), F.col("cut_lo").cast("int"))
    mid = F.expr("substring(text, cut_lo + 1, cut_hi - cut_lo)")
    suf = F.expr("substring(text, cut_hi + 1, n - cut_hi)")
    fim = (
        F.when(F.col("mode") == "raw", F.col("text"))
        .when(
            F.col("mode") == "psm",
            F.concat(
                F.lit(FIM_PRE), pre, F.lit(FIM_SUF), suf, F.lit(FIM_MID), mid
            ),
        )
        .otherwise(
            F.concat(
                F.lit(FIM_SUF), suf, F.lit(FIM_PRE), pre, F.lit(FIM_MID), mid
            )
        )
    )
    return (
        c.select(
            "doc_id",
            F.col("n").alias("n_chars"),
            "cut_lo",
            "cut_hi",
            "mode",
            F.length(fim).cast("long").alias("fim_len"),
            F.md5(fim).alias("fim_md5"),
        )
        .orderBy("doc_id")
    )


#: Priority-sample size (the sketch keeps k+1 priorities; estimates
#: use the (k+1)-th as the threshold).
PRIO_K = 50
_PRIO_SCALE = 1 << 60


def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PRIORITY SAMPLING (Duffield, Lund & Thorup 2007) of orders by
    spend — the weighted-sampling scheme with PROVABLY near-optimal
    subset-sum variance: each order gets priority q = w/u (u uniform
    in (0,1], splitmix60-derived), the top ``PRIO_K`` priorities are
    kept, and Σ max(w, τ) over the sample (τ = the (k+1)-th priority)
    is an UNBIASED estimator of total spend — the one-pass bounded-
    memory answer to "sample 50 orders but keep revenue estimable".
    Complements `weighted_sample` (fixed rates) and `neyman_allocation`
    (stratified counts): this is the scheme you use when a single
    fixed-size sample must support unbiased subset-sum queries.

    Fixed point: with u drawn as a 60-bit integer, the priority
    qn = w·2⁶⁰ // (u+1) IS w/u on the cents scale (u_real = (u+1)/2⁶⁰),
    computed in DECIMAL(38,0)/HUGEINT, so the estimator term is
    literally max(w, τ) in integer cents — no float anywhere. One md5
    per order + one splitmix60 mix — the bootstrap-mixer pattern.

    Scale: map-only priority assignment, ONE TakeOrdered(k+1) (never
    a global sort), bounded-table window for the rank; the sketch
    merges across shards by keeping the top k+1 of a union — the
    standard distributed-sample merge.

    Output: ``PRIO_K`` rows (rank, o_orderkey, w_cents, w_max_cents)
    + attached (tau_str, est_cents, exact_cents, err_ppm)."""
    from ..functions import _idiv, dec2, portable_hash64, splitmix60_apply

    t = load(spark, sf_dir)
    base = t.orders.select(
        "o_orderkey",
        (dec2("o_totalprice") * 100).cast("long").alias("w_cents"),
        portable_hash64(F.col("o_orderkey")).alias("seed"),
    )
    mixed = splitmix60_apply(
        base, ["o_orderkey", "w_cents"], F.col("seed"), F.lit(0)
    )
    nd = F.col("w_cents").cast("decimal(38,0)") * F.lit(_PRIO_SCALE)
    dd = (F.col("u") + 1).cast("decimal(38,0)")
    qn = ((nd - nd % dd) / dd).cast("decimal(38,0)")
    pri = mixed.select("o_orderkey", "w_cents", qn.alias("qn"))
    topk1 = pri.orderBy(F.desc("qn"), F.asc("o_orderkey")).limit(PRIO_K + 1)
    w = Window.orderBy(F.desc("qn"), F.asc("o_orderkey"))
    ranked = topk1.withColumn("rank", F.row_number().over(w))
    tau = ranked.filter(F.col("rank") == PRIO_K + 1).select(
        F.col("qn").alias("tau")
    )
    sample = (
        ranked.filter(F.col("rank") <= PRIO_K)
        .crossJoin(F.broadcast(tau))
        .select(
            "rank",
            "o_orderkey",
            "w_cents",
            F.greatest(
                F.col("w_cents").cast("decimal(38,0)"), F.col("tau")
            )
            .cast("long")
            .alias("w_max_cents"),
            F.col("tau").cast("string").alias("tau_str"),
        )
    )
    est = sample.agg(F.sum("w_max_cents").cast("long").alias("est_cents"))
    exact = base.agg(F.sum("w_cents").cast("long").alias("exact_cents"))
    stats = est.crossJoin(F.broadcast(exact)).select(
        "est_cents",
        "exact_cents",
        _idiv(
            F.abs(F.col("est_cents") - F.col("exact_cents"))
            * F.lit(1_000_000),
            F.col("exact_cents"),
        ).alias("err_ppm"),
    )
    return (
        sample.crossJoin(F.broadcast(stats))
        .select(
            "rank",
            "o_orderkey",
            "w_cents",
            "w_max_cents",
            "tau_str",
            "est_cents",
            "exact_cents",
            "err_ppm",
        )
        .orderBy("rank")
    )


#: MLM geometry: 15% positions selected; of those 80% -> [MASK],
#: 10% -> random vocab token, 10% -> kept (Devlin et al. 2019).
MLM_VOCAB = 100
MLM_MASK_TOKEN = "[MASK]"


def q_mlm_masks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLM MASKING transform (BERT, Devlin et al. 2019) — the
    encoder-side sibling of `span_corruption_masks` (T5) and
    `fim_transform` (infilling): each token position draws one
    splitmix60 uniform (seed = md5 of doc_id, stream = position);
    15% of positions are selected, and of those 80% are replaced by
    ``[MASK]``, 10% by a RANDOM vocabulary token (hash-picked from
    the corpus top-``MLM_VOCAB``), 10% kept — the exact 80/10/10
    recipe, fully deterministic and cross-engine exact, so the same
    corpus build reproduces bit-for-bit on a backfill.

    Scale: one md5 per document + a staged integer mix per position
    (map-side); the vocabulary is a TakeOrdered(100) broadcast as a
    1-row array (whitelisted attach); reassembly is ONE doc-grain
    groupBy (the masked sequence must be order-faithful, so the
    shuffle is at document grain — the minimum possible).

    Output: one row per document (doc_id, n_tokens, n_masked,
    n_random, n_keep, masked_md5)."""
    from ..functions import splitmix60_apply

    t = load(spark, sf_dir)
    toks = (
        t.documents.select(
            "doc_id",
            portable_hash64(F.col("doc_id")).alias("seed"),
            F.posexplode(F.split("text", " ")).alias("p", "tok"),
        )
    )
    mixed = splitmix60_apply(
        toks, ["doc_id", "p", "tok"], F.col("seed"), F.col("p")
    )
    # collect_list order is non-deterministic — rebuild the ranked
    # array deterministically via array_sort over (-freq, term)
    vocab = (
        t.documents.select(F.explode(F.split("text", " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("term"))
        .limit(MLM_VOCAB)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct((-F.col("n")).alias("k"), F.col("term"))
                    )
                ),
                lambda s: s["term"],
            ).alias("voc")
        )
    )
    u = F.col("u")
    sel = F.pmod(u, F.lit(100)) < 15
    act = F.expr("pmod(u div 100, 10)").cast("long")
    # the corpus may have fewer than MLM_VOCAB types: index mod the
    # ACTUAL vocabulary size
    repl = F.element_at(
        F.col("voc"),
        (F.expr("pmod(u div 1000, size(voc))") + 1).cast("int"),
    )
    rows = mixed.crossJoin(F.broadcast(vocab)).select(
        "doc_id",
        "p",
        F.when(~sel, F.col("tok"))
        .when(act < 8, F.lit(MLM_MASK_TOKEN))
        .when(act == 8, repl)
        .otherwise(F.col("tok"))
        .alias("new_tok"),
        (sel & (act < 8)).cast("long").alias("is_mask"),
        (sel & (act == 8)).cast("long").alias("is_rand"),
        (sel & (act == 9)).cast("long").alias("is_keep"),
    )
    return (
        rows.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("is_mask").alias("n_masked"),
            F.sum("is_rand").alias("n_random"),
            F.sum("is_keep").alias("n_keep"),
            F.md5(
                F.concat_ws(
                    " ",
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("p", "new_tok"))
                        ),
                        lambda s: s["new_tok"],
                    ),
                )
            ).alias("masked_md5"),
        )
        .orderBy("doc_id")
    )


def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PACKING-EFFICIENCY audit — how many of the training budget's
    tokens are PAD under each packing strategy the engine implements
    (the number a pretraining-cost review actually asks for; Krell et
    al. 2021 report ~25–50% waste for naive padding at BERT lengths):

    - ``no_pack_split``: one document per sequence run, long docs
      split (ceil(n/L) sequences each) — pad = per-doc tail waste;
    - ``concat_split``: the `sequence_packing` contiguous stream —
      docs tile sequences end-to-end, pad is only the final tail
      (the information-theoretic floor, at the cost of cross-doc
      attention contamination);
    - ``bucket_pow2_nosplit``: the `length_bucketed_batches` layout —
      docs padded to their power-of-2 bucket ceiling (no splitting,
      no contamination, bounded waste < 50%).

    Every strategy's cost is an EXACT closed form over per-doc token
    counts (ceil arithmetic / one stream total / bucket-grain sums) —
    no simulation, no sequential fold — so the audit is one
    map-side-combinable pass however large the corpus.

    Output: 3 rows (strategy, n_docs, n_tokens, n_seqs, pad_tokens,
    waste_ppm), ordered by strategy."""
    from ..functions import _idiv

    t = load(spark, sf_dir)
    L = SEQ_LEN
    docs = t.documents.select(
        F.size(F.split("text", " ")).cast("long").alias("n")
    )
    per = docs.select(
        "n",
        F.expr(f"(n + {L} - 1) div {L}").alias("segs"),
        F.greatest(
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CASE WHEN n <= 1 THEN 0 "
                "ELSE CAST(length(bin(n - 1)) AS INT) END)"
            ),
            F.lit(LB_MIN_BUCKET).cast("long"),
        ).alias("bucket"),
    )
    agg = per.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n").cast("long").alias("n_tokens"),
        F.sum("segs").cast("long").alias("split_seqs"),
        F.sum(F.col("segs") * L - F.col("n")).cast("long").alias(
            "split_pad"
        ),
    )
    # bucket strategy: docs longer than L fall back to split cost
    # (a pow-2 bucket above L is not a trainable sequence); shorter
    # docs pad to their bucket ceiling
    bpad = per.agg(
        F.sum(
            F.when(F.col("n") > L, F.col("segs") * L - F.col("n"))
            .otherwise(F.col("bucket") - F.col("n"))
        )
        .cast("long")
        .alias("pad"),
        F.sum(
            F.when(F.col("n") > L, F.col("segs")).otherwise(F.lit(1))
        )
        .cast("long")
        .alias("seqs_equiv"),
    )
    rows = []
    base = agg.crossJoin(F.broadcast(bpad))
    stream_seqs = F.expr(f"(n_tokens + {L} - 1) div {L}")
    for strategy, n_seqs, pad in [
        ("bucket_pow2_nosplit", F.col("seqs_equiv"), F.col("pad")),
        ("concat_split", stream_seqs, stream_seqs * L - F.col("n_tokens")),
        ("no_pack_split", F.col("split_seqs"), F.col("split_pad")),
    ]:
        rows.append(
            base.select(
                F.lit(strategy).alias("strategy"),
                "n_docs",
                "n_tokens",
                n_seqs.cast("long").alias("n_seqs"),
                pad.cast("long").alias("pad_tokens"),
                _idiv(
                    pad.cast("decimal(38,0)") * F.lit(1_000_000),
                    n_seqs.cast("decimal(38,0)") * F.lit(L),
                ).alias("waste_ppm"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("strategy")

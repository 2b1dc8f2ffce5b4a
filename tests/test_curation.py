"""Curation operator semantics: deterministic sampling, stable splits,
budget-boundary exactness, cleaning-rule precedence."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import curation


def test_sample_is_partition_independent(spark, sf_dir):
    """The kept set is a pure function of doc_id — repartitioning the
    input must not change a single selection decision."""
    base = {
        r.doc_id for r in curation.q_doc_sample_deterministic(spark, sf_dir).collect()
    }
    t = load(spark, sf_dir)
    docs = t.documents.repartition(7, "lang")
    rate = F.coalesce(
        *[
            F.when(F.col("lang") == lang, F.lit(r))
            for lang, r in curation.SAMPLE_RATES.items()
        ],
        F.lit(curation.SAMPLE_DEFAULT_RATE),
    )
    again = {
        r.doc_id
        for r in docs.select(
            "doc_id", curation._bucket(F.col("doc_id"), "sample").alias("b"), rate.alias("r")
        )
        .filter(F.col("b") < F.col("r"))
        .collect()
    }
    assert base == again


def test_sample_rates_approximate_targets(spark, sf_dir):
    """Per-language keep fraction lands near its configured rate (the
    bucket hash is uniform; 500 docs -> generous tolerance)."""
    t = load(spark, sf_dir)
    totals = {
        r.lang: r.n for r in t.documents.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    kept = {
        r.lang: r.n
        for r in curation.q_doc_sample_deterministic(spark, sf_dir)
        .groupBy("lang")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for lang, total in totals.items():
        rate = curation.SAMPLE_RATES.get(lang, curation.SAMPLE_DEFAULT_RATE) / 100
        frac = kept.get(lang, 0) / total
        assert abs(frac - rate) < 0.25, (lang, frac, rate)


def test_split_assignment_stable_under_corpus_growth(spark, sf_dir):
    """A document's split never changes when other documents are added:
    assign on the full corpus and on a half corpus; the intersection
    must agree doc-by-doc (THE property motivating hash splits)."""
    t = load(spark, sf_dir)
    b = curation._bucket(F.col("doc_id"), "split")
    split = (
        F.when(b < curation.SPLIT_TRAIN_END, F.lit("train"))
        .when(b < curation.SPLIT_VAL_END, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    full = {r.doc_id: r.s for r in t.documents.select("doc_id", split.alias("s")).collect()}
    half = {
        r.doc_id: r.s
        for r in t.documents.filter(F.col("doc_id") % 2 == 0)
        .select("doc_id", split.alias("s"))
        .collect()
    }
    assert half and all(full[k] == v for k, v in half.items())


def test_split_partitions_corpus(spark, sf_dir):
    t = load(spark, sf_dir)
    n = t.documents.count()
    agg = curation.q_train_val_test_split(spark, sf_dir).collect()
    assert sum(r.n_docs for r in agg) == n
    assert {r.split for r in agg} <= {"train", "val", "test"}


def test_budget_selection_matches_naive_window(spark, sf_dir):
    """The two-phase bucket form must select EXACTLY the rows the naive
    per-source running-sum window selects."""
    t = load(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", "source", "n_chars", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.desc("n_chars"), F.asc("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    naive = {
        (r.source, r.doc_id)
        for r in docs.withColumn("run", F.sum("n_tokens").over(w))
        .filter(F.col("run") <= curation.TOKEN_BUDGET_PER_SOURCE)
        .collect()
    }
    fast = {
        (r.source, r.doc_id)
        for r in curation.q_token_budget_selection(spark, sf_dir).collect()
    }
    assert fast == naive and naive


def test_budget_never_exceeded(spark, sf_dir):
    sel = (
        curation.q_token_budget_selection(spark, sf_dir)
        .groupBy("source")
        .agg(F.sum("n_tokens").alias("tot"))
        .collect()
    )
    assert sel
    for r in sel:
        assert r.tot <= curation.TOKEN_BUDGET_PER_SOURCE


def test_cleaning_reasons_partition_and_precede(spark, sf_dir):
    """Every doc gets exactly one reason; duplicate outranks lang/quality
    (a non-canonical copy of an English doc is 'duplicate', never
    'lang'); keep is true iff reason == kept."""
    rows = curation.q_corpus_cleaning_report(spark, sf_dir).collect()
    t = load(spark, sf_dir)
    assert len(rows) == t.documents.count()
    by_reason = {}
    for r in rows:
        assert r.keep == (r.reason == "kept")
        by_reason.setdefault(r.reason, 0)
        by_reason[r.reason] += 1
    assert set(by_reason) <= {"duplicate", "lang", "quality", "kept"}
    assert by_reason.get("kept", 0) > 0


def test_sequence_packing_matches_naive_global_cumsum(spark, sf_dir):
    """Two-level prefix sum must equal the naive global-window form."""
    t = load(spark, sf_dir)
    docs = t.documents.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens")
    )
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = {
        r.doc_id: (r.seq_id, r.seq_offset, r.n_seqs)
        for r in docs.withColumn(
            "cb", F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
        )
        .selectExpr(
            "doc_id",
            f"cb div {curation.SEQ_LEN} AS seq_id",
            f"cb % {curation.SEQ_LEN} AS seq_offset",
            f"(cb + n_tokens - 1) div {curation.SEQ_LEN} - cb div {curation.SEQ_LEN} + 1 AS n_seqs",
        )
        .collect()
    }
    fast = {
        r.doc_id: (r.seq_id, r.seq_offset, r.n_seqs)
        for r in curation.q_sequence_packing(spark, sf_dir).collect()
    }
    assert fast == naive and fast


def test_sequence_packing_is_gapless(spark, sf_dir):
    """Docs tile the token stream: doc k's start == doc k-1's start +
    its token count, every offset < SEQ_LEN, spans consistent."""
    rows = sorted(
        curation.q_sequence_packing(spark, sf_dir).collect(), key=lambda r: r.doc_id
    )
    pos = 0
    for r in rows:
        assert r.seq_id == pos // curation.SEQ_LEN
        assert r.seq_offset == pos % curation.SEQ_LEN
        assert r.n_seqs == (pos + r.n_tokens - 1) // curation.SEQ_LEN - pos // curation.SEQ_LEN + 1
        pos += r.n_tokens


def test_mixture_rebalance_caps_expected_tokens(spark, sf_dir):
    """Derived rates: rate = min(100, cap*100 div tok_s); kept docs'
    bucket < rate; expected token mass per source lands near the cap
    when the rate binds (hash buckets uniform; generous tolerance)."""
    t = load(spark, sf_dir)
    tok = {
        r.source: r.tok
        for r in t.documents.select(
            "source", F.size(F.split("text", " ")).cast("long").alias("n")
        )
        .groupBy("source")
        .agg(F.sum("n").alias("tok"))
        .collect()
    }
    rows = curation.q_mixture_rebalance(spark, sf_dir).collect()
    assert rows
    kept_tok: dict = {}
    for r in rows:
        res = curation.MIXTURE_RATE_RESOLUTION
        want_rate = min(res, max(1, (curation.MIXTURE_TOKEN_CAP * res) // tok[r.source]))
        assert r.rate == want_rate
        assert r.bucket < r.rate
        kept_tok[r.source] = kept_tok.get(r.source, 0) + r.n_tokens
    for s, k in kept_tok.items():
        if tok[s] > curation.MIXTURE_TOKEN_CAP:  # binding
            assert k < tok[s]  # actually subsampled
            assert abs(k - curation.MIXTURE_TOKEN_CAP) < curation.MIXTURE_TOKEN_CAP


def test_cluster_safe_split_no_leakage(spark, sf_dir):
    """Every member of a dedup cluster must land in the same split —
    the invariant that kills paraphrase-duplicate train/test leakage."""
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.operators.curation import (
        q_cluster_safe_split,
    )

    df = q_cluster_safe_split(spark, sf_dir)
    leaky = (
        df.groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter("n_splits > 1")
        .count()
    )
    assert leaky == 0
    # and it is a real split: more than one split value exists overall
    assert df.select("split").distinct().count() >= 2


def test_chunking_covers_every_token_with_stride_geometry(spark, sf_dir):
    """Chunks tile each document: stride-aligned starts, contiguous
    chunk indices, the last chunk ends exactly at the doc's token
    count, and every non-final chunk is full-size."""
    t = load(spark, sf_dir)
    n_tok = t.documents.select(
        "doc_id", F.size(F.split("text", " ")).alias("n")
    )
    chunks = curation.q_doc_chunking(spark, sf_dir)
    per_doc = (
        chunks.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.max(F.col("start_tok") + F.col("n_chunk_tokens")).alias("end"),
            F.min(
                (F.col("start_tok") == curation.CHUNK_STRIDE * F.col("chunk_idx"))
                .cast("int")
            ).alias("aligned"),
        )
        .join(n_tok, "doc_id")
    )
    bad = per_doc.filter(
        (F.col("max_idx") != F.col("n_chunks") - 1)
        | (F.col("end") != F.col("n"))
        | (F.col("aligned") == 0)
    )
    assert bad.count() == 0
    # exact length law: every chunk spans min(SIZE, n - start) tokens
    wrong_len = (
        chunks.join(n_tok, "doc_id")
        .filter(
            F.col("n_chunk_tokens")
            != F.least(F.lit(curation.CHUNK_SIZE), F.col("n") - F.col("start_tok"))
        )
    )
    assert wrong_len.count() == 0


def test_training_shuffle_is_a_permutation_and_deterministic(spark, sf_dir):
    out = curation.q_training_order_shuffle(spark, sf_dir)
    n = load(spark, sf_dir).documents.count()
    agg = out.agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("position").alias("npos"),
        F.min("position").alias("lo"),
        F.max("position").alias("hi"),
    ).first()
    assert agg.rows == n and agg.npos == n
    assert agg.lo == 0 and agg.hi == n - 1
    # pure function of ids: two plans, identical order
    a = [r.doc_id for r in out.orderBy("position").collect()]
    b = [
        r.doc_id
        for r in curation.q_training_order_shuffle(spark, sf_dir)
        .orderBy("position")
        .collect()
    ]
    assert a == b


def test_epoch_expansion_multiplicity(spark, sf_dir):
    out = curation.q_epoch_mixture_expand(spark, sf_dir)
    per_doc = out.groupBy("doc_id", "n_epochs").agg(
        F.count(F.lit(1)).alias("rows"),
        F.countDistinct("epoch").alias("neps"),
        F.countDistinct("example_key").alias("nkeys"),
    )
    bad = per_doc.filter(
        (F.col("rows") != F.col("n_epochs"))
        | (F.col("neps") != F.col("n_epochs"))
        | (F.col("nkeys") != F.col("n_epochs"))
    )
    assert bad.count() == 0
    rng = out.agg(F.min("n_epochs").alias("lo"), F.max("n_epochs").alias("hi")).first()
    assert rng.lo >= 1 and rng.hi <= curation.EPOCH_MOD


def test_mixture_temperature_flattens(spark, sf_dir):
    """Temperature weights flatten the mixture: shares sum to ~1e6 ppm
    on both axes, the largest source's flattened share is <= its raw
    share, the smallest's is >= — and every weight is exactly
    isqrt(source tokens)."""
    import math

    from beauty_lakehouse_spark.operators import curation

    rows = curation.q_mixture_temperature(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.w == math.isqrt(r.tok)
        assert r.resample_ppm > 0
    total_raw = sum(r.raw_share_ppm for r in rows)
    total_temp = sum(r.temp_share_ppm for r in rows)
    assert abs(total_raw - 1_000_000) <= len(rows)  # half-up rounding slack
    assert abs(total_temp - 1_000_000) <= len(rows)
    biggest = max(rows, key=lambda r: r.tok)
    smallest = min(rows, key=lambda r: r.tok)
    assert biggest.temp_share_ppm <= biggest.raw_share_ppm
    assert smallest.temp_share_ppm >= smallest.raw_share_ppm
    assert smallest.resample_ppm >= biggest.resample_ppm
    # FLOAT WITNESS: flattened share tracks sqrt(tokens) mass in float
    # (isqrt truncation is up to ~1/(2*sqrt(tok)) relative per source —
    # a few percent at fixture token counts; the witness targets scale
    # bugs, not rounding)
    sum_sqrt = sum(math.sqrt(r.tok) for r in rows)
    for r in rows:
        fshare = math.sqrt(r.tok) / sum_sqrt
        assert abs(r.temp_share_ppm / 1e6 - fshare) <= 0.05 * fshare + 1e-6


def test_corpus_datacard_consistent_with_constituents(spark, sf_dir):
    """The card's numbers equal independent recomputation from the
    constituent queries it composes."""
    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.operators import curation, text

    card = {
        r.metric: r.value
        for r in curation.q_corpus_datacard(spark, sf_dir).collect()
    }
    docs = load(spark, sf_dir).documents
    assert card["n_docs"] == docs.count()
    assert card["dup_docs"] >= 0 and card["dup_groups"] >= 0
    assert 0 <= card["english_ppm"] <= 1_000_000
    cov = text.q_vocab_coverage(spark, sf_dir).collect()
    # FLOAT WITNESS: float-division recompute of the ppm shares
    want_oov = round(
        sum(r.n_oov for r in cov) * 1_000_000 / sum(r.n_tokens for r in cov)
    )
    assert abs(card["oov_ppm"] - want_oov) <= 1
    lm = text.q_bigram_cross_entropy(spark, sf_dir).collect()
    want_ce = sum(r.sum_cost_unats for r in lm) / sum(r.n_bigrams for r in lm)
    assert abs(card["bigram_cross_entropy_unats"] - want_ce) <= 1


def test_bloom_decontaminate_no_false_negatives(spark, sf_dir):
    """The Bloom pre-filter never loses a leak: every document the
    exact decontamination scan reports appears in the bloom report
    with n_true_hits equal to the exact n_hit_grams, and bloom hits
    always dominate true hits (FPs are the only divergence). The
    measured FP rate stays under a few percent of probed grams."""
    from beauty_lakehouse_spark.operators import curation

    exact = {
        r.doc_id: r.n_hit_grams
        for r in curation.q_decontaminate(spark, sf_dir).collect()
    }
    bloom = {
        r.doc_id: r for r in curation.q_bloom_decontaminate(spark, sf_dir).collect()
    }
    for doc_id, n_hit in exact.items():
        assert doc_id in bloom, f"bloom lost contaminated doc {doc_id}"
        assert bloom[doc_id].n_true_hits == n_hit
    total_bloom = sum(r.n_bloom_hits for r in bloom.values())
    total_true = sum(r.n_true_hits for r in bloom.values())
    total_grams = sum(r.n_grams for r in bloom.values())
    assert total_bloom >= total_true
    # FP tax small: (occupancy)^k of probed grams — well under 5% here
    assert total_bloom - total_true <= max(0.05 * total_grams, 5)


def test_token_subsampling_rate_tracks_closed_form(spark, sf_dir):
    """Per-term survival rate converges to min(1, sqrt(t/f)): exact for
    rare terms (all kept), within sampling noise for frequent ones;
    kept never exceeds before."""
    import math

    from beauty_lakehouse_spark.operators.curation import (
        SUB_T_DEN,
        SUB_T_NUM,
        q_token_subsampling,
    )

    rows = q_token_subsampling(spark, sf_dir).collect()
    assert rows
    n_total = sum(r.n_before for r in rows)
    for r in rows:
        assert 0 <= r.n_kept <= r.n_before
        f = r.n_before / n_total
        p = min(1.0, math.sqrt(SUB_T_NUM / SUB_T_DEN / f))
        got = r.n_kept / r.n_before
        # 5-sigma binomial slack
        slack = 5 * math.sqrt(p * (1 - p) / r.n_before) + 1 / r.n_before
        assert abs(got - p) <= slack, (r.term, got, p)


def test_skipgram_pairs_planted_window(spark, tmp_path):
    """A fixed sentence yields exactly the +-2 window pairs with the
    right multiplicities; symmetry holds (a->b and b->a counts equal)."""
    docs = [(i, "a b c d e") for i in range(5)]
    spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    from beauty_lakehouse_spark.operators.curation import q_skipgram_pairs

    got = {
        (r.center, r.context): r.n_pairs
        for r in q_skipgram_pairs(spark, str(tmp_path)).collect()
    }
    # 'c' sees a,b,d,e once per doc => 5 each; 'a' sees b,c only
    assert got[("c", "a")] == got[("c", "e")] == 5
    assert got[("a", "b")] == got[("a", "c")] == 5
    assert ("a", "d") not in got
    for (x, y), n in got.items():
        assert got[(y, x)] == n  # window symmetry


def test_ccnet_buckets_tercile_law(spark, sf_dir):
    """Terciles partition the corpus with NTILE(3) sizes (first tiles
    one larger on remainder), ranks are a permutation of 1..n, and
    bucket labels follow rank order (head scores <= tail scores)."""
    from beauty_lakehouse_spark.operators.curation import q_ccnet_buckets

    rows = q_ccnet_buckets(spark, sf_dir).collect()
    n = len(rows)
    assert sorted(r.rank for r in rows) == list(range(1, n + 1))
    sizes = {}
    for r in rows:
        sizes[r.tercile] = sizes.get(r.tercile, 0) + 1
    base, rem = divmod(n, 3)
    assert sorted(sizes) == [1, 2, 3]
    assert all(
        sizes[t] == base + (1 if t <= rem else 0) for t in (1, 2, 3)
    )
    head_max = max(r.avg_cost_key for r in rows if r.tercile == 1)
    tail_min = min(r.avg_cost_key for r in rows if r.tercile == 3)
    assert head_max <= tail_min
    assert all(
        r.bucket == {1: "head", 2: "middle", 3: "tail"}[r.tercile]
        for r in rows
    )


def test_weighted_sample_is_deterministic_and_weight_biased(spark, sf_dir):
    """A-ES sampling: reruns identical; the sampled docs' mean weight
    exceeds the corpus mean (inclusion probability grows with weight);
    exactly WSAMPLE_K rows."""
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.operators.curation import (
        WSAMPLE_K,
        q_weighted_sample,
    )

    a = q_weighted_sample(spark, sf_dir).collect()
    b = q_weighted_sample(spark, sf_dir).collect()
    assert a == b
    assert len(a) == WSAMPLE_K
    sample_mean = sum(r.weight for r in a) / len(a)
    t = load(spark, sf_dir)
    corpus_mean = (
        t.documents.select(
            F.avg(
                F.size(F.filter(F.split("text", " "), lambda x: x != ""))
            ).alias("m")
        ).collect()[0].m
    )
    assert sample_mean > corpus_mean
    # keys are sorted ascending with doc_id tiebreak
    keys = [(r.key_micro, r.doc_id) for r in a]
    assert keys == sorted(keys)


def test_interleaved_mixture_round_robin_dispersion(spark, sf_dir):
    """Round-robin property: positions are a permutation of 0..n-1,
    rounds are contiguous position blocks, within a round every source
    appears at most once, and no source repeats consecutively while
    other sources still have undealt documents."""
    from beauty_lakehouse_spark.operators.curation import (
        q_interleaved_mixture,
    )

    rows = sorted(
        q_interleaved_mixture(spark, sf_dir).collect(),
        key=lambda r: r.position,
    )
    n = len(rows)
    assert [r.position for r in rows] == list(range(n))
    # rounds non-decreasing along positions; each round hits a source
    # at most once
    seen_rounds = []
    by_round = {}
    for r in rows:
        seen_rounds.append(r.round)
        by_round.setdefault(r.round, []).append(r.source)
    assert seen_rounds == sorted(seen_rounds)
    for srcs in by_round.values():
        assert len(srcs) == len(set(srcs))
    # while all sources survive, rounds have the full source set
    n_sources = len({r.source for r in rows})
    full_rounds = [
        rd for rd, srcs in by_round.items() if len(srcs) == n_sources
    ]
    assert full_rounds, "no full round-robin rounds found"


def test_contrastive_pairs_structure(spark, sf_dir):
    """Triplet invariants: positive is the anchor's own cluster
    canonical, negative is a DIFFERENT cluster's canonical, and every
    non-canonical member of every multi-member cluster anchors exactly
    one triplet."""
    from beauty_lakehouse_spark.operators.curation import (
        q_contrastive_pairs,
    )
    from beauty_lakehouse_spark.operators.dedup import q_dedup_clusters

    trips = q_contrastive_pairs(spark, sf_dir).collect()
    clusters = {
        r.doc_id: r.cluster_id
        for r in q_dedup_clusters(spark, sf_dir).collect()
    }
    multi_members = [
        d for d, c in clusters.items()
        if d != c and sum(1 for x in clusters.values() if x == c) >= 2
    ]
    assert len(trips) == len(multi_members)
    for t in trips:
        assert clusters[t.anchor_id] == t.positive_id
        assert t.positive_id != t.negative_id
        assert clusters[t.negative_id] == t.negative_id  # a canonical
        assert t.anchor_id != t.positive_id


def test_length_bucketed_batches_properties(spark, sf_dir):
    """Batch invariants: bucket is a power of two >= 32 and >= every
    member's length; batches hold <= LB_BATCH_DOCS docs; padding
    fraction is the exact (n*max - sum)/(n*max) ratio; total docs
    conserved."""
    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.operators.curation import (
        LB_BATCH_DOCS,
        q_length_bucketed_batches,
    )

    rows = q_length_bucketed_batches(spark, sf_dir).collect()
    n_docs_total = sum(r.n_docs for r in rows)
    assert n_docs_total == load(spark, sf_dir).documents.count()
    for r in rows:
        assert r.bucket >= 32 and (r.bucket & (r.bucket - 1)) == 0
        assert r.max_len <= r.bucket
        assert 1 <= r.n_docs <= LB_BATCH_DOCS
        exact = (r.n_docs * r.max_len - r.sum_tokens) / (r.n_docs * r.max_len)
        assert abs(float(r.pad_frac) - exact) < 1e-6
    # padding efficiency: bucketed batching keeps waste low on the
    # fixture (identical-bucket lengths are within 2x of each other)
    weighted = sum(float(r.pad_frac) * r.n_docs for r in rows) / n_docs_total
    assert weighted < 0.5


def test_curriculum_order_easy_first(spark, sf_dir):
    """Curriculum law: positions are a permutation of 0..n-1 and
    terciles are contiguous position blocks in 1, 2, 3 order (all of
    head before any of middle before any of tail)."""
    from beauty_lakehouse_spark.operators.curation import (
        q_curriculum_order,
    )

    rows = sorted(
        q_curriculum_order(spark, sf_dir).collect(),
        key=lambda r: r.position,
    )
    assert [r.position for r in rows] == list(range(len(rows)))
    terciles = [r.tercile for r in rows]
    assert terciles == sorted(terciles)
    assert set(terciles) == {1, 2, 3}


def test_corpus_training_plan_composition(spark, sf_dir):
    """Capstone consistency: total batched docs == kept docs; every
    batch respects the size cap and the power-of-2 bucket bound; the
    tercile set matches ccnet's."""
    from beauty_lakehouse_spark.operators.curation import (
        LB_BATCH_DOCS,
        q_corpus_cleaning_report,
        q_corpus_training_plan,
    )

    plan = q_corpus_training_plan(spark, sf_dir).collect()
    n_kept = (
        q_corpus_cleaning_report(spark, sf_dir)
        .filter("reason = 'kept'")
        .count()
    )
    assert sum(r.n_docs for r in plan) == n_kept
    for r in plan:
        assert 1 <= r.n_docs <= LB_BATCH_DOCS
        assert r.bucket >= 32 and (r.bucket & (r.bucket - 1)) == 0
        assert r.max_len <= r.bucket
        assert r.tercile in (1, 2, 3)


def test_bloom_semijoin_accounting_pure_python(spark, sf_dir):
    """The runtime-filter semi-join's one-row accounting matches a pure
    Python recompute of the same md5-derived Bloom filter: identical
    pass counts (so the filter itself is verified, not just the final
    join), zero false negatives by construction, and exact-join counts
    equal to the true semi-join size."""
    import hashlib

    import pandas as pd

    from beauty_lakehouse_spark.operators.relational import (
        q_bloom_semijoin_pushdown,
    )

    row = q_bloom_semijoin_pushdown(spark, sf_dir).collect()[0]

    def pos(key, j):
        return int(
            hashlib.md5(f"bloom{j}:{key}".encode()).hexdigest()[:15], 16
        ) % (1 << 16)

    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    sel = orders[
        (orders["o_orderpriority"] == "1-URGENT")
        & (orders["o_orderstatus"] == "F")
    ]["o_orderkey"]
    bits = set()
    for k in sel:
        for j in range(4):
            bits.add(pos(k, j))
    selset = set(sel)
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    n_pass = n_exact = 0
    for k in li["l_orderkey"]:
        if all(pos(k, j) in bits for j in range(4)):
            n_pass += 1
            if k in selset:
                n_exact += 1
        else:
            assert k not in selset  # no false negatives
    assert row["n_orders_selected"] == len(sel)
    assert row["n_lines_bloom_pass"] == n_pass
    assert row["n_lines_exact"] == n_exact
    assert row["bloom_false_positive_lines"] == n_pass - n_exact


def test_span_corruption_nonoverlap_and_text(spark, sf_dir):
    """Spans never overlap within a document (the segment construction
    guarantees it, not expectation), lengths stay in [2, 4], every
    span fits its document, and the masked text equals the exact token
    slice in a pure-Python recompute."""
    import hashlib

    import pandas as pd

    spans = curation.q_span_corruption_masks(spark, sf_dir).collect()
    assert spans
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    toks = {r.doc_id: r.text.split(" ") for r in docs.itertuples()}

    def h(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    by_doc = {}
    for r in spans:
        assert 2 <= r["span_len"] <= 4
        tk = toks[r["doc_id"]]
        assert r["start_token"] + r["span_len"] <= len(tk)
        assert r["masked_tokens"] == " ".join(
            tk[r["start_token"] : r["start_token"] + r["span_len"]]
        )
        assert r["span_len"] == 2 + h(
            f"spanlen:{r['doc_id']}:{r['span_id']}"
        ) % 3
        by_doc.setdefault(r["doc_id"], []).append(
            (r["start_token"], r["start_token"] + r["span_len"])
        )
    for doc_id, ivs in by_doc.items():
        ivs.sort()
        for (s1, e1), (s2, e2) in zip(ivs, ivs[1:]):
            assert e1 <= s2, (doc_id, ivs)
    # every long-enough doc is covered, shorter ones skipped
    want = {d for d, tk in toks.items() if len(tk) >= 20}
    assert set(by_doc) == want


def test_apportionment_sums_to_budget(spark, sf_dir):
    """Hamilton's method invariants: quotas sum exactly to the budget,
    every quota is floor or floor+1 of the exact proportional share,
    and extra seats go to the largest remainders (ties by name)."""
    rows = curation.q_source_quota_apportionment(spark, sf_dir).collect()
    assert rows
    budget = curation.APPORTION_BUDGET
    assert sum(r["quota"] for r in rows) == budget
    w_total = sum(r["tokens"] for r in rows)
    for r in rows:
        assert r["base_quota"] == (budget * r["tokens"]) // w_total
        assert r["remainder"] == (budget * r["tokens"]) % w_total
        assert r["quota"] in (r["base_quota"], r["base_quota"] + 1)
    got_extra = {r["source"] for r in rows if r["extra_seat"]}
    n_extra = budget - sum(r["base_quota"] for r in rows)
    want_extra = {
        r["source"]
        for r in sorted(rows, key=lambda r: (-r["remainder"], r["source"]))[
            :n_extra
        ]
    }
    assert got_extra == want_extra


def test_negative_sampling_table_pure_python(spark, sf_dir):
    """The freq^(3/4) Hamilton table matches a pure-Python recompute
    (weights, quotas, remainder ranking, top-50 ordering) and the
    full-table slot sum is exactly NEG_TABLE_SLOTS."""
    import math
    from collections import Counter

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        NEG_TABLE_SLOTS,
        NEG_VOCAB_CAP,
        q_negative_sampling_table,
    )

    rows = q_negative_sampling_table(spark, sf_dir).collect()
    assert rows

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tf = Counter()
    for text in docs["text"]:
        tf.update(t for t in text.split(" ") if t)
    vocab = sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
        :NEG_VOCAB_CAP
    ]
    w = {t: math.isqrt(f * math.isqrt(f)) for t, f in vocab}
    W = sum(w.values())
    base = {t: NEG_TABLE_SLOTS * w[t] // W for t, _ in vocab}
    rem = {t: NEG_TABLE_SLOTS * w[t] % W for t, _ in vocab}
    leftover = NEG_TABLE_SLOTS - sum(base.values())
    order = sorted(vocab, key=lambda kv: (-rem[kv[0]], kv[0]))
    slots = dict(base)
    for t, _ in order[:leftover]:
        slots[t] += 1
    assert sum(slots.values()) == NEG_TABLE_SLOTS  # zero-rejection table
    want = sorted(
        ((-slots[t], t, f, w[t], base[t]) for t, f in vocab)
    )[:50]
    got = [
        (-r["slots"], r["term"], r["freq"], r["weight"], r["base_quota"])
        for r in rows
    ]
    assert got == want
    # FLOAT WITNESS: the isqrt(f*isqrt(f)) quantization tracks the
    # true f^0.75 weight, and each term's slot share tracks its float
    # probability mass within the Hamilton rounding bound (1 slot)
    Wf = sum(f**0.75 for _t, f in vocab)
    fprob = {t: f**0.75 / Wf for t, f in vocab}
    for r in rows:
        # double-isqrt truncation loses up to ~1/(2*sqrt(sqrt(f)))
        # relative per level — a ~3% band; the witness targets scale
        # bugs, not rounding
        assert abs(r["weight"] - r["freq"] ** 0.75) <= max(
            2.0, 0.03 * r["freq"] ** 0.75
        )
        # isqrt truncation gives up to ~1/sqrt(w) relative error on
        # small weights, so the slot-mass bound is loose — it exists
        # to catch scale bugs (10^x), not rounding
        assert (
            abs(r["slots"] - fprob[r["term"]] * NEG_TABLE_SLOTS)
            <= 2 + 0.2 * fprob[r["term"]] * NEG_TABLE_SLOTS
        )


def test_feature_hash_stats_pure_python(spark, sf_dir):
    """The collision histogram matches a pure-Python md5 recompute and
    conserves both the vocabulary and the 2^bits bucket space."""
    import hashlib

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        FEATURE_HASH_BITS,
        q_feature_hash_stats,
    )

    rows = {
        r["bucket_load"]: r
        for r in q_feature_hash_stats(spark, sf_dir).collect()
    }
    n_space = 1 << FEATURE_HASH_BITS

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = set()
    for text in docs["text"]:
        vocab.update(t for t in text.split(" ") if t)
    from collections import Counter

    loads = Counter(
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % n_space
        for t in vocab
    )
    hist = Counter(loads.values())
    hist[0] = n_space - len(loads)
    assert set(rows) == set(hist)
    for ld, nb in hist.items():
        assert rows[ld]["n_buckets"] == nb
        assert rows[ld]["n_terms"] == ld * nb
    assert sum(r["n_terms"] for r in rows.values()) == len(vocab)
    assert sum(r["n_buckets"] for r in rows.values()) == n_space


def test_bloom_fpr_audit_pure_python(spark, sf_dir):
    """The k-sweep rows match a pure-python recompute of the whole
    pipeline (shingles → md5 positions → prefix-k filter → probe);
    the no-false-negative law holds exactly per level (hits - FPs =
    member probes); FLOAT WITNESS: fpr_micro tracks the float FP
    share within 1 micro."""
    import hashlib

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        BLOOM_BITS,
        BLOOM_FPR_KS,
        BLOOM_FPR_MAXJ,
        DECON_MAX_DOC_FREQ,
        SPLIT_VAL_END,
        q_bloom_fpr_audit,
    )

    docs = pd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )

    def h15(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    per_doc = {}
    df_count = {}
    for doc_id, text in zip(docs.doc_id, docs.text):
        toks = text.split(" ")
        if len(toks) < 3:
            continue
        grams = {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }
        per_doc[doc_id] = grams
        for g in grams:
            df_count[g] = df_count.get(g, 0) + 1
    test_grams, probe_grams = set(), set()
    for doc_id, grams in per_doc.items():
        keep = {g for g in grams if df_count[g] <= DECON_MAX_DOC_FREQ}
        if h15(f"split:{doc_id}") % 100 >= SPLIT_VAL_END:
            test_grams |= keep
        else:
            probe_grams |= keep

    def pos(g, j):
        return h15(f"bloom{j}:{g}") % BLOOM_BITS

    minj = {}
    for g in test_grams:
        for j in range(BLOOM_FPR_MAXJ):
            p = pos(g, j)
            if p not in minj or j < minj[p]:
                minj[p] = j
    want = {}
    for k in BLOOM_FPR_KS:
        n_hits = n_fp = n_member = 0
        for g in probe_grams:
            member = g in test_grams
            n_member += member
            hit = all(
                minj.get(pos(g, j), BLOOM_FPR_MAXJ) <= k - 1
                for j in range(k)
            )
            n_hits += hit
            n_fp += hit and not member
        bits = sum(1 for v in minj.values() if v <= k - 1)
        want[k] = (
            len(test_grams),
            bits,
            len(probe_grams),
            n_member,
            n_hits,
            n_fp,
            n_fp * 1_000_000 // (len(probe_grams) - n_member),
        )

    rows = q_bloom_fpr_audit(spark, sf_dir).collect()
    got = {
        r.k_hashes: (
            r.n_test_grams,
            r.bits_set,
            r.n_probes,
            r.n_member_probes,
            r.n_bloom_hits,
            r.n_false_pos,
            r.fpr_micro,
        )
        for r in rows
    }
    assert got == want
    for r in rows:
        # no false negatives: every member probe hits at every level
        assert r.n_bloom_hits - r.n_false_pos == r.n_member_probes
        # FLOAT WITNESS on the fixed-point division
        nonmember = r.n_probes - r.n_member_probes
        assert abs(r.fpr_micro - r.n_false_pos * 1e6 / nonmember) <= 1
    # occupancy grows with k; FPR is finite and sane
    ks = sorted(got)
    for a, b in zip(ks, ks[1:]):
        assert got[a][1] <= got[b][1]


def test_domain_dedup_mixture_pure_python(spark, sf_dir):
    """Pure-Python recompute of the whole URL-dedup → domain-quality →
    Hamilton-quota chain on the real fixture, plus the Hamilton
    apportionment invariants (Σ quota == budget; every quota within 1
    seat of the exact proportional share)."""
    import math

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        DOMAIN_BUDGET,
        DOMAIN_MOD,
        q_domain_dedup_mixture,
    )

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    best: dict[int, int] = {}  # url_key -> surviving doc_id
    per_doc = {}
    for doc_id, text in zip(pdf.doc_id, pdf.text):
        doc_id = int(doc_id)
        d = doc_id % 10
        url_key = doc_id - (d - 6) if d >= 7 else doc_id
        toks = text.split(" ")
        per_doc[doc_id] = (url_key, len(toks), len(set(toks)))
        if url_key not in best or doc_id < best[url_key]:
            best[url_key] = doc_id
    dom: dict[int, dict] = {}
    for doc_id, (url_key, n_tok, n_dist) in per_doc.items():
        k = math.isqrt(url_key % DOMAIN_MOD)
        s = dom.setdefault(
            k, {"n_docs": 0, "n_dup": 0, "tokens": 0, "ttr_sum": 0}
        )
        if best[url_key] == doc_id:
            s["n_docs"] += 1
            s["tokens"] += n_tok
            s["ttr_sum"] += (n_dist * 1_000_000) // n_tok
        else:
            s["n_dup"] += 1
    w = {k: s["tokens"] * (s["ttr_sum"] // s["n_docs"]) for k, s in dom.items()}
    W = sum(w.values())
    base = {k: (DOMAIN_BUDGET * wk) // W for k, wk in w.items()}
    rem = {k: (DOMAIN_BUDGET * wk) % W for k, wk in w.items()}
    leftover = DOMAIN_BUDGET - sum(base.values())
    order = sorted(dom, key=lambda k: (-rem[k], k))
    quota = {
        k: base[k] + (1 if i < leftover else 0) for i, k in enumerate(order)
    }

    rows = {r.domain: r for r in q_domain_dedup_mixture(spark, sf_dir).collect()}
    assert len(rows) == len(dom)
    for k, s in dom.items():
        r = rows[f"d{k}.example.com"]
        assert r.n_docs == s["n_docs"], (k, r)
        assert r.n_dup_removed == s["n_dup"], (k, r)
        assert r.tokens == s["tokens"], (k, r)
        assert r.mean_ttr_micro == s["ttr_sum"] // s["n_docs"], (k, r)
        assert r.quota == quota[k], (k, r)
        # FLOAT WITNESS: integer Hamilton quota is within 1 seat of the
        # exact float proportional share B*w/W (a shared 10^x integer
        # scale bug would blow this bound by orders of magnitude), and
        # mean_ttr_micro/1e6 is the float mean type-token ratio of the
        # surviving docs to within trunc-division slack
        assert abs(r.quota - DOMAIN_BUDGET * w[k] / W) < 1.0
        float_ttrs = [
            per_doc[doc_id][2] / per_doc[doc_id][1]
            for doc_id, (url_key, _, _) in per_doc.items()
            if math.isqrt(url_key % DOMAIN_MOD) == k
            and best[url_key] == doc_id
        ]
        float_mean = sum(float_ttrs) / len(float_ttrs)
        assert abs(r.mean_ttr_micro / 1e6 - float_mean) < 2e-6 * (
            1 + len(float_ttrs)
        )
    # dedup actually removed the planted collisions (trailing 7/8/9)
    assert sum(s["n_dup"] for s in dom.values()) > 0
    # apportionment sums exactly to the budget
    assert sum(r.quota for r in rows.values()) == DOMAIN_BUDGET


def test_dsir_importance_pure_python(spark, sf_dir):
    """Pure-Python recompute of the DSIR hashed-bigram importance
    model (bucket counts, add-one smoothing, sign-split fixed-point
    deltas + factored normalizer), plus a FLOAT WITNESS: the true
    float log-weight Σ c_f·ln(p_t(f)/p_r(f)) must agree with
    logw_micro/1e6 to within ln_micro's documented ±1e-4-nat
    per-evaluation quantization times the doc's gram count (a shared
    10^x scale bug would miss by orders of magnitude)."""
    import hashlib
    import math

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        DSIR_BUCKETS,
        DSIR_TARGET,
        q_dsir_importance,
    )

    def p64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "source", "text"]
    ]
    t_f = [0] * DSIR_BUCKETS
    r_f = [0] * DSIR_BUCKETS
    doc_buckets: dict[int, dict[int, int]] = {}
    doc_src: dict[int, str] = {}
    for doc_id, source, text in zip(pdf.doc_id, pdf.source, pdf.text):
        doc_id = int(doc_id)
        toks = text.split(" ")
        doc_src[doc_id] = source
        cnt: dict[int, int] = {}
        for a_tok, b_tok in zip(toks, toks[1:]):
            bkt = p64(f"{a_tok} {b_tok}") % DSIR_BUCKETS
            cnt[bkt] = cnt.get(bkt, 0) + 1
            if source == DSIR_TARGET:
                t_f[bkt] += 1
            else:
                r_f[bkt] += 1
        if source != DSIR_TARGET and cnt:
            doc_buckets[doc_id] = cnt
    T = sum(t_f) + DSIR_BUCKETS
    R = sum(r_f) + DSIR_BUCKETS

    rows = {r.doc_id: r for r in q_dsir_importance(spark, sf_dir).collect()}
    assert set(rows) == set(doc_buckets)
    for doc_id, cnt in doc_buckets.items():
        r = rows[doc_id]
        assert r.source == doc_src[doc_id]
        n_grams = sum(cnt.values())
        assert r.n_grams == n_grams
        # FLOAT WITNESS: true float log importance weight
        logw_float = sum(
            c * math.log(((t_f[b] + 1) / T) / ((r_f[b] + 1) / R))
            for b, c in cnt.items()
        )
        # ln_micro quantization: ~1e-4 nats per ln evaluation; each
        # gram contributes one delta + one normalizer evaluation
        tol = 2.5e-4 * n_grams + 1e-6
        assert abs(r.logw_micro / 1e6 - logw_float) < tol, (
            doc_id, r.logw_micro / 1e6, logw_float, tol,
        )
    # the model separates: target-like raw docs must not all score
    # identically (degenerate-model guard)
    scores = {r.logw_micro for r in rows.values()}
    assert len(scores) > 10


def test_fim_transform_pure_python(spark, sf_dir):
    """Cut points, mode selection, and the re-serialized md5 all match
    a pure-Python recomputation (md5-seed + splitmix60 reference twin
    kept independent of the library code); spans are non-empty by
    construction and the corpus passes through complete."""
    import hashlib

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        FIM_MID,
        FIM_MIN_CHARS,
        FIM_PRE,
        FIM_SUF,
        q_fim_transform,
    )
    from tests.test_quality import _splitmix60_py

    rows = {r.doc_id: r for r in q_fim_transform(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    assert len(rows) == len(docs)
    n_modes = {"psm": 0, "spm": 0, "raw": 0}
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        r = rows[doc_id]
        n = len(text)
        assert r.n_chars == n
        seed = int(
            hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16
        )
        if n < FIM_MIN_CHARS:
            assert r.mode == "raw" and r.cut_lo is None
            want = text
        else:
            lo = 1 + _splitmix60_py(seed, 0) % (n - 2)
            hi = lo + 1 + _splitmix60_py(seed, 1) % (n - 1 - lo)
            assert (r.cut_lo, r.cut_hi) == (lo, hi)
            # all three spans non-empty
            assert 1 <= lo < hi <= n - 1
            pre, mid, suf = text[:lo], text[lo:hi], text[hi:]
            assert pre and mid and suf
            if _splitmix60_py(seed, 2) % 2 == 0:
                assert r.mode == "psm"
                want = FIM_PRE + pre + FIM_SUF + suf + FIM_MID + mid
            else:
                assert r.mode == "spm"
                want = FIM_SUF + suf + FIM_PRE + pre + FIM_MID + mid
        assert r.fim_len == len(want)
        assert r.fim_md5 == hashlib.md5(want.encode()).hexdigest()
        n_modes[r.mode] += 1
    # both sentinel orders occur (the 50/50 draw is live)
    assert n_modes["psm"] > 0 and n_modes["spm"] > 0


def test_priority_sample_pure_python(spark, sf_dir):
    """Priorities, the threshold, the sample membership, and the
    subset-sum estimator all match a direct recomputation; the float
    witness checks the estimator against the float q = w/u ranking
    and the estimate against the true total."""
    import hashlib

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        PRIO_K,
        _PRIO_SCALE,
        q_priority_sample,
    )
    from tests.test_quality import _splitmix60_py

    rows = sorted(q_priority_sample(spark, sf_dir).collect(),
                  key=lambda r: r.rank)
    od = pd.read_parquet(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"]
    )
    pri = []
    total = 0
    for ok, tp in zip(od["o_orderkey"], od["o_totalprice"]):
        w = round(round(tp, 2) * 100)
        total += w
        seed = int(hashlib.md5(str(ok).encode()).hexdigest()[:15], 16)
        u = _splitmix60_py(seed, 0)
        pri.append((w * _PRIO_SCALE // (u + 1), -int(ok), w, u))
    pri.sort(reverse=True)
    tau = pri[PRIO_K][0]
    want = [
        (i + 1, -negok, w, max(w, tau))
        for i, (qn, negok, w, _u) in enumerate(pri[:PRIO_K])
    ]
    got = [(r.rank, r.o_orderkey, r.w_cents, r.w_max_cents) for r in rows]
    assert got == want
    g = rows[0]
    assert g.tau_str == str(tau)
    est = sum(w for *_x, w in want)
    assert g.est_cents == est
    assert g.exact_cents == total
    assert g.err_ppm == abs(est - total) * 1_000_000 // total
    # FLOAT WITNESS: the integer priority ranking agrees with the
    # float q = w / (u/2^60) ranking on the kept set, and the
    # estimator lands within 35% of the true total on the fixture
    float_top = sorted(
        pri,
        key=lambda p: (-(p[2] / ((p[3] + 1) / _PRIO_SCALE)), -p[1]),
    )[:PRIO_K]
    assert {(-p[1]) for p in float_top} == {r.o_orderkey for r in rows}
    assert abs(est - total) / total < 0.35


def test_mlm_masks_pure_python(spark, sf_dir):
    """Selection, the 80/10/10 split, vocab replacement picks, and the
    reassembled md5 all match a pure-python recomputation; the
    corpus-level mask rate lands near 12% (15% x 80%) — the float
    witness on the mechanism's law."""
    import hashlib
    from collections import Counter

    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        MLM_MASK_TOKEN,
        MLM_VOCAB,
        q_mlm_masks,
    )
    from tests.test_quality import _splitmix60_py

    rows = {r.doc_id: r for r in q_mlm_masks(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    corp = Counter()
    for text in docs["text"]:
        for w in text.split(" "):
            if w:
                corp[w] += 1
    voc = sorted(corp, key=lambda w: (-corp[w], w))[:MLM_VOCAB]
    tot = dict(n_tokens=0, n_masked=0, n_random=0, n_keep=0)
    assert len(rows) == len(docs)
    for doc_id, text in zip(docs["doc_id"], docs["text"]):
        toks = text.split(" ")
        seed = int(hashlib.md5(str(doc_id).encode()).hexdigest()[:15], 16)
        out = []
        nm = nr = nk = 0
        for p, tok in enumerate(toks):
            u = _splitmix60_py(seed, p)
            if u % 100 < 15:
                act = (u // 100) % 10
                if act < 8:
                    out.append(MLM_MASK_TOKEN)
                    nm += 1
                elif act == 8:
                    out.append(voc[(u // 1000) % len(voc)])
                    nr += 1
                else:
                    out.append(tok)
                    nk += 1
            else:
                out.append(tok)
        r = rows[doc_id]
        assert (r.n_tokens, r.n_masked, r.n_random, r.n_keep) == (
            len(toks), nm, nr, nk,
        )
        assert r.masked_md5 == hashlib.md5(
            " ".join(out).encode()
        ).hexdigest()
        tot["n_tokens"] += len(toks)
        tot["n_masked"] += nm
        tot["n_random"] += nr
        tot["n_keep"] += nk
    # FLOAT WITNESS: the realized rates track 12% / 1.5% / 1.5%
    assert abs(tot["n_masked"] / tot["n_tokens"] - 0.12) < 0.01
    assert abs(tot["n_random"] / tot["n_tokens"] - 0.015) < 0.005
    assert abs(tot["n_keep"] / tot["n_tokens"] - 0.015) < 0.005


def test_packing_efficiency_pure_python(spark, sf_dir):
    """Every strategy's seq/pad cost matches a direct recomputation,
    the ordering law holds (concat <= bucket <= no_pack waste), and
    the float witness tracks the waste fractions."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.curation import (
        LB_MIN_BUCKET,
        SEQ_LEN,
        q_packing_efficiency,
    )

    rows = {r.strategy: r for r in
            q_packing_efficiency(spark, sf_dir).collect()}
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    ns = [len(t.split(" ")) for t in docs["text"]]
    L = SEQ_LEN
    total = sum(ns)
    split_seqs = sum((n + L - 1) // L for n in ns)
    split_pad = split_seqs * L - total
    stream_seqs = (total + L - 1) // L
    bpad = bseqs = 0
    for n in ns:
        if n > L:
            segs = (n + L - 1) // L
            bpad += segs * L - n
            bseqs += segs
        else:
            b = max(1 << (n - 1).bit_length() if n > 1 else 1,
                    LB_MIN_BUCKET)
            bpad += b - n
            bseqs += 1
    want = {
        "no_pack_split": (split_seqs, split_pad),
        "concat_split": (stream_seqs, stream_seqs * L - total),
        "bucket_pow2_nosplit": (bseqs, bpad),
    }
    assert set(rows) == set(want)
    for s, (seqs, pad) in want.items():
        r = rows[s]
        assert (r.n_docs, r.n_tokens) == (len(ns), total)
        assert (r.n_seqs, r.pad_tokens) == (seqs, pad)
        assert r.waste_ppm == pad * 1_000_000 // (seqs * L)
        # FLOAT WITNESS: ppm floor tracks the float waste fraction
        assert abs(r.waste_ppm / 1e6 - pad / (seqs * L)) <= 1e-6
    # the audit discriminates: stream packing is the floor
    assert (
        rows["concat_split"].waste_ppm
        <= rows["bucket_pow2_nosplit"].waste_ppm
        <= rows["no_pack_split"].waste_ppm
    )

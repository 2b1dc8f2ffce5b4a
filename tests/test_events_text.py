"""Events (TIMESTAMP(NANOS) handling, window semantics) and text
analysis sanity properties."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from beauty_lakehouse_spark.catalog import load
from beauty_lakehouse_spark.operators import events, text


def test_events_ts_surfaces_as_timestamp(spark, sf_dir):
    t = load(spark, sf_dir)
    assert isinstance(t.events.schema["ts"].dataType, T.TimestampType)
    assert t.events.count() > 0


def test_hourly_buckets_align(spark, sf_dir):
    rows = events.q_events_hourly(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hour_start_us % 3_600_000_000 == 0
        assert r.n_events > 0


def test_sliding_doubles_event_mass(spark, sf_dir):
    t = load(spark, sf_dir)
    n = t.events.count()
    total = sum(r.n_events for r in events.q_events_sliding(spark, sf_dir).collect())
    assert total == 2 * n  # 1h window / 30min slide → every event in 2 windows


def test_sessions_partition_events(spark, sf_dir):
    t = load(spark, sf_dir)
    n = t.events.count()
    total = sum(r.n_events for r in events.q_events_sessions(spark, sf_dir).collect())
    assert total == n


def test_text_stats_ranges(spark, sf_dir):
    rows = text.q_text_stats(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.ttr <= 1.0
        assert r.n_distinct <= r.n_tokens
        assert r.avg_token_len > 0


def test_lang_id_domain(spark, sf_dir):
    rows = text.q_lang_id(spark, sf_dir).collect()
    assert rows
    allowed = {"en", "de", "fr", "es", "und"}
    for r in rows:
        assert r.pred_lang in allowed
        best = max(r.score_en, r.score_de, r.score_fr, r.score_es)
        if best == 0:
            assert r.pred_lang == "und"


def test_doc_fingerprint_stable(spark, sf_dir):
    a = sorted(tuple(r) for r in text.q_doc_fingerprint(spark, sf_dir).collect())
    b = sorted(tuple(r) for r in text.q_doc_fingerprint(spark, sf_dir).collect())
    assert a == b


def test_tfidf_top_terms_match_python(spark, sf_dir):
    """Verify the distributed TF-IDF against a driver-side float-log
    recomputation: tf/df counts exact; the fixed-point score within
    quantization distance of tf·ln(N/df)·1e6 (ln_micro is accurate to
    ~±15 micro-nats per idf, times tf)."""
    import math
    from collections import Counter

    from beauty_lakehouse_spark.catalog import load

    out = text.q_tfidf_top_terms(spark, sf_dir)
    docs = {r.doc_id: r.text.split(" ") for r in load(spark, sf_dir).documents.collect()}
    n = len(docs)
    df_counts = Counter()
    for toks in docs.values():
        df_counts.update(set(toks))
    got = {}
    for r in out.collect():
        got.setdefault(r.doc_id, []).append(r)
    assert set(got) == set(docs)
    for doc_id, rows in got.items():
        tf = Counter(docs[doc_id])
        rows = sorted(rows, key=lambda r: r.rk)
        best = sorted(
            ((t, c * math.log(n / df_counts[t]) * 1e6) for t, c in tf.items()),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        cutoff = best[-1][1]  # 3rd-best float score
        for r in rows:
            assert r.tf == tf[r.term] and r.df == df_counts[r.term]
            fscore = r.tf * math.log(n / r.df) * 1e6
            # fixed-point score tracks the float score to quantization
            assert abs(r.score_unats - fscore) <= 60 * r.tf
            # every selected term is (within quantization of) the float
            # top-3 — ranking flips are confined to exact near-ties
            assert fscore >= cutoff - 120 * r.tf


def test_cohort_retention_identities(spark, sf_dir):
    """Offset-0 cell equals the cohort's full user count (everyone is
    active in their first week by construction); offsets nonnegative;
    total distinct users conserved."""
    rows = events.q_cohort_retention(spark, sf_dir).collect()
    assert rows
    t = load(spark, sf_dir)
    n_users = t.events.select("user_id").distinct().count()
    zero = {r.cohort_week: r.n_active for r in rows if r.week_offset == 0}
    assert sum(zero.values()) == n_users
    for r in rows:
        assert r.week_offset >= 0
        assert r.n_active <= zero[r.cohort_week]


def test_latest_event_equals_window_form(spark, sf_dir):
    """max(struct) newest-per-key must agree with the row_number window
    form row for row."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.catalog import load
    from beauty_lakehouse_spark.functions import epoch_us
    from beauty_lakehouse_spark.operators.events import q_latest_event_per_user

    got = {
        r["user_id"]: (r["last_us"], r["last_event_id"])
        for r in q_latest_event_per_user(spark, sf_dir).collect()
    }
    e = load(spark, sf_dir).events.select(
        "user_id", "event_id", epoch_us("ts").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("us"), F.desc("event_id"))
    want = {
        r["user_id"]: (r["us"], r["event_id"])
        for r in e.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .collect()
    }
    assert got == want


def test_latest_event_plan_has_no_window_sort(spark, sf_dir):
    """The newest-per-key compaction must be a partial-merge hash
    aggregate, not a per-key sort: no Window/Sort operator in the plan."""
    from beauty_lakehouse_spark.operators.events import q_latest_event_per_user

    plan = (
        q_latest_event_per_user(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan, plan
    assert "partial_max" in plan or "HashAggregate" in plan, plan


def test_rolling_distinct_users_no_nested_loop(spark, sf_dir):
    """The explode-vote encoding must stay an equi-plan: no
    BroadcastNestedLoopJoin (the inequality-join form the oracle uses)."""
    from beauty_lakehouse_spark.operators.events import (
        q_rolling_distinct_users,
    )

    df = q_rolling_distinct_users(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert df.count() > 0


def test_fuzzy_part_names_no_cartesian(spark, sf_dir):
    """Blocking must keep fuzzy matching an equi-join pipeline — no
    cartesian product, and the levenshtein verify only runs on
    within-block candidate pairs."""
    from beauty_lakehouse_spark.operators.text import q_fuzzy_part_names

    df = q_fuzzy_part_names(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan and "NestedLoop" not in plan, plan
    rows = df.collect()
    assert len(rows) <= 200
    assert all(1 <= r["edit_dist"] <= 4 for r in rows)


def test_bpe_pairs_are_adjacent_substrings(spark, sf_dir):
    """Every reported pair is 2 chars and its weight counts real
    adjacent occurrences: recompute one pair's weight by scanning the
    corpus vocabulary driver-side."""
    rows = text.q_bpe_pair_counts(spark, sf_dir).collect()
    assert rows and all(len(r.pair) == 2 for r in rows)
    weights = [r.weight for r in rows]
    assert weights == sorted(weights, reverse=True)
    t = load(spark, sf_dir)
    vocab = (
        t.documents.select(F.explode(F.split("text", " ")).alias("tok"))
        .filter(F.col("tok") != "")
        .groupBy("tok")
        .count()
        .collect()
    )
    target = rows[0].pair
    expect = sum(
        r["count"] * sum(1 for i in range(len(r.tok) - 1) if r.tok[i : i + 2] == target)
        for r in vocab
    )
    assert rows[0].weight == expect


def test_bigram_novelty_bounds(spark, sf_dir):
    out = text.q_bigram_novelty(spark, sf_dir)
    bad = out.filter(
        (F.col("n_rare") > F.col("n_bigrams"))
        | (F.col("rare_rate") < 0)
        | (F.col("rare_rate") > 1)
    )
    assert bad.count() == 0


def test_boilerplate_ngrams_are_cross_doc(spark, sf_dir):
    rows = text.q_boilerplate_ngrams(spark, sf_dir).collect()
    assert rows and all(r.n_docs >= text.BOILERPLATE_MIN_DOCS for r in rows)
    assert all(len(r.shingle.split(" ")) == text.BOILERPLATE_NGRAM for r in rows)


def _ref_bpe(words: dict[str, int], n_merges: int):
    """Pure-Python reference BPE trainer (Sennrich merge loop)."""
    vocab: dict[tuple, int] = {}
    for w, f in words.items():
        k = tuple(w)
        vocab[k] = vocab.get(k, 0) + f
    merges = []
    for rnd in range(1, n_merges + 1):
        counts: dict[tuple, int] = {}
        for sym, f in vocab.items():
            for i in range(len(sym) - 1):
                p = (sym[i], sym[i + 1])
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        (a, b), w = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, a, b, w))
        new: dict[tuple, int] = {}
        for sym, f in vocab.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            k = tuple(out)
            new[k] = new.get(k, 0) + f
        vocab = new
    return merges


def test_bpe_train_matches_python_reference(spark, sf_dir):
    """The distributed BPE trainer learns the EXACT merge sequence of
    the reference Python implementation — same argmax pairs, same
    weights, in the same order — on the fixture corpus."""
    from collections import Counter

    from beauty_lakehouse_spark.catalog import load

    words = Counter()
    for r in load(spark, sf_dir).documents.collect():
        words.update(t for t in r.text.split(" ") if t)
    expected = _ref_bpe(dict(words), text.BPE_MERGES)

    got = [
        (r.merge_rank, r.left, r.right, r.weight)
        for r in text.q_bpe_train_merges(spark, sf_dir)
        .orderBy("merge_rank")
        .collect()
    ]
    assert got == expected


def test_bpe_merge_application_greedy_scan(spark):
    """_apply_merge folds exactly like the reference left-to-right
    greedy scan, including the overlapping-pair case (aaa with merge
    (a,a) -> [aa, a], never [a, aa] or [aa, aa])."""
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.operators.text import _apply_merge

    df = spark.createDataFrame(
        [(["a", "a", "a"],), (["a", "b", "b"],), (["x", "a", "b"],), ([],)],
        "sym array<string>",
    )
    got = [r.m for r in df.select(_apply_merge(F.col("sym"), "a", "b").alias("m")).collect()]
    assert got == [["a", "a", "a"], ["ab", "b"], ["x", "ab"], []]
    got_aa = [r.m for r in df.select(_apply_merge(F.col("sym"), "a", "a").alias("m")).collect()]
    assert got_aa == [["aa", "a"], ["a", "b", "b"], ["x", "a", "b"], []]


def test_bigram_cross_entropy_matches_float_model(spark, sf_dir):
    """The fixed-point bigram cross-entropy tracks the float MLE bigram
    model: per doc, avg cost within quantization of
    mean(ln(c_prefix/c_bigram)), all costs nonnegative, and exp(avg)
    is a sane perplexity (>= 1)."""
    import math
    from collections import Counter

    from beauty_lakehouse_spark.catalog import load

    docs = {
        r.doc_id: r.text.split(" ")
        for r in load(spark, sf_dir).documents.collect()
    }
    c_bg, c_pref = Counter(), Counter()
    for toks in docs.values():
        for a, b in zip(toks, toks[1:]):
            c_bg[(a, b)] += 1
            c_pref[a] += 1
    rows = text.q_bigram_cross_entropy(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == {
        d for d, t in docs.items() if len(t) >= 2
    }
    for r in rows:
        toks = docs[r.doc_id]
        costs = [
            math.log(c_pref[a] / c_bg[(a, b)]) for a, b in zip(toks, toks[1:])
        ]
        assert r.n_bigrams == len(costs)
        assert r.sum_cost_unats >= 0
        want = sum(costs) / len(costs) * 1e6
        assert abs(r.avg_cost_unats - want) <= 25, (r.doc_id, want)
        assert math.exp(r.avg_cost_unats / 1e6) >= 1.0


def test_vocab_coverage_matches_python(spark, sf_dir):
    """OOV rates recomputed driver-side: the top-1000 vocabulary
    (freq desc, term asc) and each doc's OOV count match exactly."""
    from collections import Counter

    from beauty_lakehouse_spark.catalog import load

    docs = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in load(spark, sf_dir).documents.collect()
    }
    freq = Counter()
    for toks in docs.values():
        freq.update(toks)
    vocab = {
        t for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:1000]
    }
    rows = text.q_vocab_coverage(spark, sf_dir).collect()
    assert {r.doc_id for r in rows} == {d for d, t in docs.items() if t}
    for r in rows:
        toks = docs[r.doc_id]
        want_oov = sum(1 for t in toks if t not in vocab)
        assert (r.n_tokens, r.n_oov) == (len(toks), want_oov), r.doc_id
        assert 0.0 <= r.oov_rate <= 1.0


def test_event_volume_anomalies_planted_spike(spark, tmp_path):
    """30 steady hours of 10 events + one 100-event spike hour: only the
    spike is flagged; zero-variance steady hours (dev=0) are not, and
    the first ANOMALY_MIN_TRAIL hours abstain."""
    import datetime as dt

    from beauty_lakehouse_spark.operators.events import (
        ANOMALY_MIN_TRAIL,
        q_event_volume_anomalies,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for hour in range(30):
        n = 100 if hour == 25 else 10
        for i in range(n):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(hours=hour, seconds=10 * i),
                    1,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))

    out = q_event_volume_anomalies(spark, str(tmp_path)).collect()
    assert len(out) == 30
    flagged = {r.hour_start_us for r in out if r.is_anomaly}
    spike_us = int((base + dt.timedelta(hours=25)).timestamp() * 1_000_000)
    assert flagged == {spike_us}
    for r in out:
        hour = (r.hour_start_us - out[0].hour_start_us) // 3_600_000_000
        if r.trailing_hours < ANOMALY_MIN_TRAIL:
            assert not r.is_anomaly


def test_term_pmi_planted_collocation(spark, tmp_path):
    """alpha+beta always co-occur (positive PMI, top pair); alpha+gamma
    co-occur below independence (negative PMI); support < 5 pairs are
    dropped."""
    docs = (
        [(i, "alpha beta") for i in range(10)]
        + [(10 + i, "gamma delta") for i in range(10)]
        + [(20 + i, "alpha gamma") for i in range(5)]
        + [(25, "alpha rare"), (26, "alpha rare")]
    )
    spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    from beauty_lakehouse_spark.operators.text import q_term_pmi_top_pairs

    out = q_term_pmi_top_pairs(spark, str(tmp_path)).collect()
    by_pair = {(r.term_a, r.term_b): r for r in out}
    assert ("alpha", "rare") not in by_pair  # support 2 < 5
    top = out[0]
    # N=27: (delta,gamma) c_ab=10, c=10/15 -> ln(270/150)=ln 1.8 ~ +0.5878
    assert (top.term_a, top.term_b) == ("delta", "gamma")
    assert 585_000 < top.pmi_unats < 590_000
    ab = by_pair[("alpha", "beta")]
    # c_ab=10, c_a=17, c_b=10 -> ln(270/170) ~ +0.4626 nats
    assert 460_000 < ab.pmi_unats < 465_000
    ag = by_pair[("alpha", "gamma")]
    # N=27, c_ab=5, c_a=17, c_b=15 -> ln(135/255) < 0
    assert ag.pmi_unats < 0


def test_bpe_encode_matches_reference_scan(spark):
    """The <c>-wrapped replace chain equals the reference greedy
    left-to-right merge scan on adversarial tokens (overlaps, repeats,
    self-pairs)."""
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.operators.text import (
        BPE_FIXED_MERGES,
        bpe_encode_expr,
    )

    def ref_encode(token: str) -> list[str]:
        syms = list(token)
        for a, b in BPE_FIXED_MERGES:
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    tokens = [
        "table", "tabletable", "value", "sparky", "query", "aaa",
        "tata", "tab", "ttaa", "erer", "row", "rrow", "owow", "x",
        "valuevalue", "spark", "querytable",
    ]
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    got = {
        r.token: r.pieces.split(" ")
        for r in df.select(
            "token",
            F.btrim(
                F.replace(
                    bpe_encode_expr(F.col("token"), BPE_FIXED_MERGES),
                    F.lit("><"),
                    F.lit(" "),
                ),
                F.lit("<>"),
            ).alias("pieces"),
        ).collect()
    }
    for t in tokens:
        assert got[t] == ref_encode(t), t


def test_user_state_scd2_invariants(spark, sf_dir):
    """SCD2 intervals tile each user's history: versions are
    consecutive, effective_to chains to the next effective_from,
    exactly one open (is_current) version per user, consecutive states
    differ, and observation counts conserve the event count."""
    from beauty_lakehouse_spark.operators.events import q_user_state_scd2

    rows = q_user_state_scd2(spark, sf_dir).collect()
    t = load(spark, sf_dir)
    n_events = t.events.count()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    assert sum(r.n_observations for r in rows) == n_events
    for user, vs in by_user.items():
        vs = sorted(vs, key=lambda r: r.version)
        assert [v.version for v in vs] == list(range(1, len(vs) + 1))
        assert sum(v.is_current for v in vs) == 1 and vs[-1].is_current
        for a, b in zip(vs, vs[1:]):
            assert a.effective_to == b.effective_from
            assert a.state != b.state
            assert not a.is_current


def test_part_golden_record_planted_cluster(spark, tmp_path):
    """Three near-identical names (one-edit chain) collapse into one
    golden record keyed by the smallest partkey, carrying the max
    price; an unrelated part stays out."""
    rows = [
        (10, "promo steel widget", "B1", "T", 5, 100.00),
        (11, "promo steel widgat", "B2", "T", 7, 150.00),
        (12, "promo steel widgett", "B1", "T", 6, 120.00),
        (99, "economy brass anchor", "B3", "T", 9, 80.00),
    ]
    spark.createDataFrame(
        rows,
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    ).write.parquet(str(tmp_path / "part.parquet"))

    from beauty_lakehouse_spark.operators.text import q_part_golden_record

    out = q_part_golden_record(spark, str(tmp_path)).collect()
    assert len(out) == 1
    g = out[0]
    assert g.cluster_id == 10 and g.n_members == 3
    assert g.survivor_name == "promo steel widget"
    assert g.golden_price == 150.0
    assert (g.n_brands, g.min_size, g.max_size) == (2, 5, 7)


def test_events_seasonality_identities(spark, sf_dir):
    """Profile grid conserves the event count, slot means are the exact
    ratio, and var_num is the one-pass identity (nonnegative, zero iff
    all per-day counts equal)."""
    from beauty_lakehouse_spark.operators.events import q_events_seasonality

    rows = q_events_seasonality(spark, sf_dir).collect()
    t = load(spark, sf_dir)
    assert sum(r.n_events for r in rows) == t.events.count()
    for r in rows:
        assert 0 <= r.hod <= 23
        assert r.var_num >= 0
        assert abs(r.mean_per_day - round(r.n_events / r.n_days, 6)) <= 1e-6
        if r.n_days == 1:
            assert r.var_num == 0


def test_session_paths_conserve_sessions(spark, sf_dir):
    """Path counts sum to the number of gap-defined sessions, paths are
    '>'-joined event types with at most PATH_PREFIX steps."""
    from beauty_lakehouse_spark.operators.events import (
        PATH_PREFIX,
        q_events_sessions,
        q_session_paths_top,
    )

    rows = q_session_paths_top(spark, sf_dir).collect()
    assert rows
    types = {"view", "click", "purchase", "signup", "error"}
    for r in rows:
        steps = r.path.split(">")
        assert 1 <= len(steps) <= PATH_PREFIX
        assert set(steps) <= types
    # top-30 is a subset; total session count bounds any path count
    n_sessions = q_events_sessions(spark, sf_dir).count()
    assert all(r.n_sessions <= n_sessions for r in rows)


def test_heavy_hitters_adversarial_planted(spark, tmp_path):
    """A term just above the 1/200 share threshold is reported exactly
    despite a flood of distinct singletons built to thrash the MG
    counters; one just below is not."""
    docs = []
    # 40000 total tokens: 'hot' 240 times (1/166 > 1/200),
    # 'warm' 120 times (1/333 < 1/200), the rest ~39640 distinct fillers
    filler = 0
    for i in range(200):
        toks = []
        if i < 120:
            toks += ["hot", "hot", "warm"]
        for _ in range(197):
            toks.append(f"x{filler}")
            filler += 1
        docs.append((i, " ".join(toks)))
    spark.createDataFrame(
        [(d, t, "en", "src0", len(t)) for d, t in docs],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))

    from beauty_lakehouse_spark.operators.text import q_heavy_hitter_terms

    out = {r.term: r for r in q_heavy_hitter_terms(spark, str(tmp_path)).collect()}
    assert "hot" in out and out["hot"].n_occurrences == 240
    assert "warm" not in out
    assert all(r.n_occurrences * 200 > 39760 for r in out.values())


def test_next_token_suggestions_consistency(spark, sf_dir):
    """Suggestions agree with the bigram model: per prefix at most 3
    rows, ranked by count desc then token, probabilities are exact
    shares of the prefix total and never increase with rank."""
    from beauty_lakehouse_spark.operators.text import (
        q_next_token_suggestions,
    )

    rows = q_next_token_suggestions(spark, sf_dir).collect()
    assert rows
    by_prefix = {}
    for r in rows:
        by_prefix.setdefault(r.prefix, []).append(r)
    for prefix, rs in by_prefix.items():
        rs = sorted(rs, key=lambda r: r.rk)
        assert [r.rk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= 3
        for a, b in zip(rs, rs[1:]):
            assert a.n > b.n or (a.n == b.n and a.next_token < b.next_token)
            assert a.p_ppm >= b.p_ppm
        assert all(0 < r.p_ppm <= 1_000_000 for r in rs)


def test_winnowing_guarantee_shared_passage(spark):
    """The SWA winnowing guarantee: two docs sharing a token run of
    length >= k + w - 1 ALWAYS share at least one selected
    fingerprint; disjoint-vocabulary docs share none."""
    from beauty_lakehouse_spark.operators.text import (
        WINNOW_K,
        WINNOW_W,
        winnow_fingerprints,
    )

    passage = " ".join(f"p{i}" for i in range(WINNOW_K + WINNOW_W - 1))
    docs = [
        (1, "aa bb cc " + passage + " dd ee ff"),
        (2, "zz yy xx ww " + passage + " vv uu"),
        (3, "qq rr ss tt qq rr ss tt qq rr"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df).collect()
    by_doc = {}
    for r in fps:
        by_doc.setdefault(r.doc_id, set()).add(r.fp)
    assert by_doc[1] & by_doc[2], "guaranteed shared fingerprint missing"
    assert not (by_doc[1] & by_doc[3])
    assert not (by_doc[2] & by_doc[3])


def test_winnowing_positional_not_settish(spark):
    """Winnowing is positional: a doc whose k-gram SET equals another's
    but whose sequence differs can select different fingerprints —
    and short docs (< k + w - 1 tokens) emit nothing."""
    from beauty_lakehouse_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d e")],
        "doc_id long, text string",
    )
    got = winnow_fingerprints(df).collect()
    assert all(r.doc_id != 1 for r in got)  # 3 tokens < 6: no window


def test_winnow_stream_plan_evaluates_hash_chain_once(spark):
    """Regression pin for the explode-inferred-filter trap: in the
    stream-safe (checkpoint-free) path the md5 k-gram transform must
    appear in the optimized plan a bounded number of times — a plain
    explode's inferred size(fps) > 0 predicate duplicated the whole
    interpreted chain (measured 220s at sf0.1)."""
    from beauty_lakehouse_spark.operators.text import winnow_fingerprints

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))],
        "doc_id long, text string",
    )
    plan = (
        winnow_fingerprints(df, stream_safe=True)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("md5") <= 2, f"md5 chain duplicated: {plan.count('md5')}x"


def test_bpe_oracle_ctes_are_materialized():
    """Regression pin: DuckDB inlines CTEs by default, which went
    exponential over the 12 unrolled trainer rounds (227s -> 0.1s
    with MATERIALIZED)."""
    import __spark_entry__ as entrymod

    sql = entrymod.oracle_sql()["bpe_train_merges"]
    # every vocab CTE must be materialized
    for k in range(0, 13):
        assert f"v{k} AS MATERIALIZED" in sql, f"v{k} not materialized"


def test_multires_cascade_mass_conservation(spark, sf_dir):
    """Every tier of the hypertable cascade carries the SAME total
    event count and (exact decimal) value sum — aggregating the finer
    tier loses nothing, and day buckets are supersets of their hours."""
    out = events.q_events_multires_rollup(spark, sf_dir)
    tiers = {
        r["resolution"]: (r["n"], r["tv"])
        for r in out.groupBy("resolution")
        .agg(
            F.sum("n_events").alias("n"),
            F.round(F.sum("total_value"), 1).alias("tv"),
        )
        .collect()
    }
    assert tiers["minute"][0] == tiers["hour"][0] == tiers["day"][0]
    # rounding happened per-bucket at 2dp; compare at 1dp tolerance-free
    assert abs(tiers["minute"][1] - tiers["day"][1]) <= 0.1 * 1
    n_raw = load(spark, sf_dir).events.count()
    assert tiers["minute"][0] == n_raw
    # tier granularity strictly coarsens
    per = {
        r["resolution"]: r["n"]
        for r in out.groupBy("resolution").count().withColumnRenamed("count", "n").collect()
    }
    assert per["minute"] >= per["hour"] >= per["day"]


def test_multires_bucket_alignment(spark, sf_dir):
    """Bucket starts are exact multiples of their resolution span."""
    out = events.q_events_multires_rollup(spark, sf_dir)
    spans = {"minute": 60_000_000, "hour": 3_600_000_000, "day": 86_400_000_000}
    for res, span in spans.items():
        bad = out.filter(
            (F.col("resolution") == res)
            & (F.col("bucket_start_us") % F.lit(span) != 0)
        ).count()
        assert bad == 0, res


def test_zipf_fit_matches_python(spark, sf_dir):
    """The fixed-point OLS exponent equals a pure-Python reimplementation
    over the same integer micro-nat points (ln_micro quantization and
    half-up division reproduced exactly)."""
    from collections import Counter

    row = text.q_zipf_law_fit(spark, sf_dir).collect()[0]

    docs = load(spark, sf_dir).documents.select("text").collect()
    c = Counter()
    for r in docs:
        for tkn in r["text"].split(" "):
            if tkn:
                c[tkn] += 1
    top = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: text.ZIPF_K]

    def ln_micro_py(num: int) -> int:
        q = num
        e = q.bit_length() - 1
        x = (num << 30) >> e
        acc = 0
        for _ in range(16):
            x2 = (x * x) >> 30
            if x2 >= 1 << 31:
                x = x2 >> 1
                acc = acc * 2 + 1
            else:
                x = x2
                acc = acc * 2
        log2_fixed = e * (1 << 16) + acc
        return (log2_fixed * 693147) >> 16

    pts = [
        (ln_micro_py(rank), ln_micro_py(n))
        for rank, (_t, n) in enumerate(top, start=1)
    ]
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)

    def hud(num: int, den: int, kk: int = 6) -> float:
        return ((num * 2 * 10**kk + den) // (den * 2)) / float(10**kk)

    assert row["n_terms"] == k
    assert row["mean_ln_rank"] == hud(sx, k)
    assert row["mean_ln_freq"] == hud(sy, k)
    assert row["zipf_exponent"] == hud(sx * sy - k * sxy, k * sxx - sx * sx)
    # a natural-ish corpus: exponent in a sane band
    assert 0.0 < row["zipf_exponent"] < 3.0
    # FLOAT WITNESS: the quantized OLS slope must track the true
    # math.log OLS slope — Spark, oracle and the recompute above all
    # share the ln_micro quantization, so only the float formula can
    # catch a shared scale bug (the r9 CUPED incident class)
    import math

    fx = [math.log(rank) for rank in range(1, len(top) + 1)]
    fy = [math.log(n) for _t, n in top]
    fk = len(fx)
    fslope = (sum(fx) * sum(fy) - fk * sum(a * b for a, b in zip(fx, fy))) / (
        fk * sum(a * a for a in fx) - sum(fx) ** 2
    )
    assert abs(row["zipf_exponent"] - fslope) < max(0.01, 0.02 * abs(fslope))


def test_bm25_topk_matches_python(spark, sf_dir):
    """The exact-integer BM25 scores and per-query rankings equal a
    pure-Python reimplementation (ln_micro idf, the 22T·tf/(10T·tf +
    3T + 9·dl·N) rational, half-up micro division) over the fixture."""
    from collections import Counter

    out = text.q_bm25_topk(spark, sf_dir).collect()

    docs = load(spark, sf_dir).documents.select("doc_id", "text").collect()
    tf: dict[tuple, int] = {}
    dl: dict = {}
    df = Counter()
    for r in docs:
        c = Counter(t for t in r["text"].split(" ") if t)
        dl[r["doc_id"]] = sum(c.values())
        for term, n in c.items():
            tf[(r["doc_id"], term)] = n
            df[term] += 1
    n_docs = len(docs)
    t_tokens = sum(dl.values())

    def ln_micro_py(num: int, den: int) -> int:
        q = num // den
        e = q.bit_length() - 1
        x = ((num << 30) // den) >> e
        acc = 0
        for _ in range(16):
            x2 = (x * x) >> 30
            if x2 >= 1 << 31:
                x, acc = x2 >> 1, acc * 2 + 1
            else:
                x, acc = x2, acc * 2
        return ((e * (1 << 16) + acc) * 693147) >> 16

    top20 = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    scores: dict[tuple, int] = {}
    hits: dict[tuple, int] = {}
    for rk0, (term, d) in enumerate(top20):
        qid = rk0 // text.BM25_TERMS_PER_QUERY
        idf = ln_micro_py(n_docs, d)
        for (doc, t2), n in tf.items():
            if t2 != term:
                continue
            num = idf * 22 * n * t_tokens
            den = 10 * t_tokens * n + 3 * t_tokens + 9 * dl[doc] * n_docs
            s = (num * 2 + den) // (den * 2)
            scores[(qid, doc)] = scores.get((qid, doc), 0) + s
            hits[(qid, doc)] = hits.get((qid, doc), 0) + 1

    expected = {}
    for qid in range(5):
        ranked = sorted(
            ((s, doc) for (q, doc), s in scores.items() if q == qid),
            key=lambda sd: (-sd[0], sd[1]),
        )[: text.BM25_TOPK]
        for rk, (s, doc) in enumerate(ranked, start=1):
            expected[(qid, doc)] = (s, hits[(qid, doc)], rk)

    got = {
        (r["query_id"], r["doc_id"]): (r["bm25_micro"], r["n_terms_hit"], r["rk"])
        for r in out
    }
    assert got == expected
    # sanity: every query returned a full top-10 and scores are positive
    assert len(out) == 5 * text.BM25_TOPK
    assert all(r["bm25_micro"] > 0 for r in out)
    # FLOAT WITNESS: the micro-scaled integer score must track the
    # true float Okapi BM25 (k1=1.2, b=0.75, avgdl=T/N) — independent
    # of the shared ln_micro/rational quantization
    import math

    for r in out:
        fscore = 0.0
        for rk0, (term, d) in enumerate(top20):
            if rk0 // text.BM25_TERMS_PER_QUERY != r["query_id"]:
                continue
            n = tf.get((r["doc_id"], term))
            if n is None:
                continue
            fscore += math.log(n_docs / d) * (
                n * 2.2 / (n + 0.3 + 0.9 * dl[r["doc_id"]] * n_docs / t_tokens)
            )
        assert abs(r["bm25_micro"] / 1e6 - fscore) < 1e-3 + 1e-4 * abs(fscore)


def test_user_modal_event_pure_python(spark, sf_dir):
    """The sort-free min(struct(-n, type)) mode aggregate matches a
    pure Counter recompute with the same lexicographic tie-break."""
    from collections import Counter, defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.events import q_user_modal_event

    rows = {
        r["user_id"]: r for r in q_user_modal_event(spark, sf_dir).collect()
    }
    assert rows
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    per_user = defaultdict(Counter)
    for u, t in zip(ev["user_id"], ev["event_type"]):
        per_user[u][t] += 1
    assert set(rows) == set(per_user)
    for u, cnt in per_user.items():
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        r = rows[u]
        assert (r["modal_event_type"], r["n_modal"]) == (best[0], best[1])
        assert r["n_total"] == sum(cnt.values())


def test_user_behavior_entropy_properties(spark, sf_dir):
    """n_transitions is exactly n_events - 1 per user, entropy is
    bounded by [0, ln(#types)], and the fixed-point value tracks a
    float recompute of the conditional entropy within ln_micro's
    quantization band."""
    import math
    from collections import Counter, defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        q_user_behavior_entropy,
    )

    rows = {
        r["user_id"]: r
        for r in q_user_behavior_entropy(spark, sf_dir).collect()
    }
    assert rows
    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    n_types = ev["event_type"].nunique()
    per_user = defaultdict(list)
    for u, t in zip(ev["user_id"], ev["event_type"]):
        per_user[u].append(t)
    for u, seq in per_user.items():
        if len(seq) < 2:
            assert u not in rows
            continue
        r = rows[u]
        assert r["n_transitions"] == len(seq) - 1
        nij = Counter(zip(seq, seq[1:]))
        ni = Counter(seq[:-1])
        h = sum(
            n * math.log(ni[f] / n) for (f, _), n in nij.items()
        ) / (len(seq) - 1)
        assert 0 <= r["entropy_micro_nats"] <= math.log(n_types) * 1e6 + 200
        # ln_micro quantizes each term within ~1e-4 nats
        assert abs(r["entropy_micro_nats"] - h * 1e6) <= 150, (u, h)


def test_rate_cap_throttle_properties(spark, sf_dir):
    """At most RATE_CAP_PER_HOUR survivors per (user, hour), ranks are
    the contiguous prefix 1..k, and the kept set is exactly the first-k
    by (ts, event_id) in a pure pandas recompute."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        RATE_CAP_PER_HOUR,
        q_events_rate_capped,
    )

    rows = q_events_rate_capped(spark, sf_dir).collect()
    assert rows
    by_uh = {}
    for r in rows:
        by_uh.setdefault((r["user_id"], r["hour_us"]), []).append(
            (r["rk"], r["event_id"])
        )
    for ks in by_uh.values():
        ks.sort()
        assert len(ks) <= RATE_CAP_PER_HOUR
        assert [k for k, _ in ks] == list(range(1, len(ks) + 1))

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    ev = ev.assign(us=us, hour_us=us - us % 3_600_000_000).sort_values(
        ["user_id", "hour_us", "us", "event_id"]
    )
    want = {}
    for (u, h), grp in ev.groupby(["user_id", "hour_us"]):
        want[(u, h)] = [
            (i + 1, e)
            for i, e in enumerate(grp["event_id"][:RATE_CAP_PER_HOUR])
        ]
    assert by_uh == want


def test_retention_decay_fit_pure_python(spark, sf_dir):
    """The fit matches an exact Fraction recompute of the same
    censoring-aware curve (eligible cohorts only per offset), using a
    Python reimplementation of ln_micro-quantized decays via the Spark
    values themselves: n_points, slope, and half-life all equal the
    closed-form recompute, and the half-life is ln2/slope exactly."""
    from collections import defaultdict
    from fractions import Fraction

    from beauty_lakehouse_spark.operators.events import (
        LN2_MICRO,
        q_cohort_retention,
        q_retention_decay_fit,
    )

    out = q_retention_decay_fit(spark, sf_dir).collect()
    assert len(out) == 1
    r = out[0]

    cells = q_cohort_retention(spark, sf_dir).collect()
    max_week = max(c["cohort_week"] + c["week_offset"] for c in cells)
    sizes = {
        c["cohort_week"]: c["n_active"]
        for c in cells
        if c["week_offset"] == 0
    }
    num = defaultdict(int)
    for c in cells:
        if c["week_offset"] >= 1:
            num[c["week_offset"]] += c["n_active"]
    den = defaultdict(int)
    for w, sz in sizes.items():
        for k in range(1, max_week - w + 1):
            den[k] += sz
    # reuse the engine's own ln_micro quantization by reading the y
    # values off a direct Spark evaluation of the kit
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.functions import ln_micro

    ks = sorted(k for k in num if k in den)
    ys = {
        row["k"]: row["y"]
        for row in spark.createDataFrame(
            [(k, den[k], num[k]) for k in ks], ["k", "e", "a"]
        )
        .select("k", ln_micro(F.col("e"), F.col("a")).alias("y"))
        .collect()
    }
    n = len(ks)
    assert r["n_points"] == n
    sx = sum(ks)
    sy = sum(ys.values())
    sxy = sum(k * ys[k] for k in ks)
    sxx = sum(k * k for k in ks)
    nm, dn = n * sxy - sx * sy, n * sxx - sx * sx
    frac = Fraction(nm * 1_000_000, dn)
    want_slope = int(frac)  # truncates toward zero
    assert r["slope_micro_nats_per_week"] == want_slope
    if want_slope > 0:
        assert r["half_life_micro_weeks"] == (
            LN2_MICRO * 1_000_000
        ) // want_slope
    else:
        assert r["half_life_micro_weeks"] is None
    # FLOAT WITNESS: the micro-nat slope must track the true math.log
    # OLS decay rate — the recompute above reads ln_micro off the
    # engine itself, so it shares any quantization-scale bug
    import math

    fy = {k: math.log(den[k] / num[k]) for k in ks}
    fsy = sum(fy.values())
    fsxy = sum(k * fy[k] for k in ks)
    fslope = (n * fsxy - sx * fsy) / (n * sxx - sx * sx)
    assert abs(r["slope_micro_nats_per_week"] / 1e6 - fslope) < max(
        1e-4, 0.01 * abs(fslope)
    )
    if want_slope > 0:
        assert abs(
            r["half_life_micro_weeks"] / 1e6 - math.log(2) / fslope
        ) < max(1e-3, 0.02 * (math.log(2) / fslope))


def test_heaps_law_fit_pure_python(spark, sf_dir):
    """Curve points match a pure-Python prefix recompute (token totals
    and first-occurrence vocabulary at each dense-doc-id decile), the
    curve is monotone, and beta lands in (0, 1) — sublinear vocabulary
    growth — matching the exact Fraction fit over the engine's own
    ln_micro point values."""
    from fractions import Fraction

    import pandas as pd

    from beauty_lakehouse_spark.operators.text import q_heaps_law_fit

    rows = sorted(
        q_heaps_law_fit(spark, sf_dir).collect(),
        key=lambda r: r["checkpoint"],
    )
    assert [r["checkpoint"] for r in rows] == list(range(1, 11))
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").sort_values(
        "doc_id"
    )
    n = len(docs)
    toks_per_doc = {
        r.doc_id: [t for t in r.text.split(" ") if t]
        for r in docs.itertuples()
    }
    for r in rows:
        bound = -(-r["checkpoint"] * n // 10)  # docs with (id*10)//n < c
        # dense ids: doc_id d feeds checkpoint c iff (d*10)//n + 1 <= c
        ids = [d for d in toks_per_doc if (d * 10) // n + 1 <= r["checkpoint"]]
        assert r["n_tokens"] == sum(len(toks_per_doc[d]) for d in ids)
        vocab = set()
        for d in ids:
            vocab.update(toks_per_doc[d])
        assert r["vocab"] == len(vocab)
    nt = [r["n_tokens"] for r in rows]
    vc = [r["vocab"] for r in rows]
    assert nt == sorted(nt) and vc == sorted(vc)
    beta = rows[0]["beta_micro"]
    assert all(r["beta_micro"] == beta for r in rows)
    # the fixture corpus draws from a FIXED jargon vocabulary — V is
    # constant across every prefix, so beta == 0 exactly: the operator
    # correctly flags it as a template corpus (that IS the diagnostic)
    assert vc[0] == vc[-1]
    assert beta == 0
    # exact fit recompute over the engine's own ln_micro values
    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.functions import ln_micro

    xs = {
        row["c"]: (row["x"], row["y"])
        for row in spark.createDataFrame(
            [(r["checkpoint"], r["n_tokens"], r["vocab"]) for r in rows],
            ["c", "nt", "vc"],
        )
        .select(
            "c",
            ln_micro(F.col("nt"), F.lit(1)).alias("x"),
            ln_micro(F.col("vc"), F.lit(1)).alias("y"),
        )
        .collect()
    }
    pts = list(xs.values())
    k = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    want = int(Fraction((k * sxy - sx * sy) * 1_000_000, k * sxx - sx * sx))
    assert beta == want
    # FLOAT WITNESS: constant vocabulary -> the true math.log OLS
    # slope is EXACTLY zero (all y equal), independently confirming
    # beta == 0 is the corpus property, not a shared scale artifact
    import math

    fx2 = [math.log(r2["n_tokens"]) for r2 in rows]
    fy2 = [math.log(r2["vocab"]) for r2 in rows]
    fk = len(fx2)
    fnum = fk * sum(a * b for a, b in zip(fx2, fy2)) - sum(fx2) * sum(fy2)
    fden = fk * sum(a * a for a in fx2) - sum(fx2) ** 2
    assert abs(fnum / fden) < 1e-12


def test_heaps_beta_positive_on_growing_vocabulary(spark, tmp_path):
    """On a corpus whose vocabulary genuinely grows (every doc minting
    some fresh tokens), the fitted exponent lands in (0, 1) — the
    sublinear Heaps band a natural corpus shows."""
    from beauty_lakehouse_spark.operators.text import q_heaps_law_fit

    docs = []
    for d in range(100):
        # half repeated head tokens, half fresh per-doc tokens
        toks = [f"w{j}" for j in range(20)] + [
            f"new{d}_{j}" for j in range(1 + d % 7)
        ]
        docs.append((d, " ".join(toks), "en", "syn", len(" ".join(toks))))
    sf = str(tmp_path / "heaps_sf")
    spark.createDataFrame(
        docs, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    rows = q_heaps_law_fit(spark, sf).collect()
    beta = rows[0]["beta_micro"]
    vc = [r["vocab"] for r in sorted(rows, key=lambda r: r["checkpoint"])]
    assert vc[-1] > vc[0]
    assert 0 < beta < 1_000_000
    # FLOAT WITNESS: beta tracks the true math.log OLS slope
    import math

    fx = [math.log(r["n_tokens"]) for r in rows]
    fy = [math.log(r["vocab"]) for r in rows]
    k = len(fx)
    fslope = (k * sum(a * b for a, b in zip(fx, fy)) - sum(fx) * sum(fy)) / (
        k * sum(a * a for a in fx) - sum(fx) ** 2
    )
    assert abs(beta / 1e6 - fslope) < max(1e-3, 0.01 * abs(fslope))


def test_source_vocab_overlap_pure_python(spark, sf_dir):
    """Every (source_a < source_b) pair appears once with exact
    intersection and vocabulary sizes matching a pure-Python set
    recompute; Jaccard is the half-up 6-dp integer ratio."""
    from collections import defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.text import q_source_vocab_overlap

    rows = q_source_vocab_overlap(spark, sf_dir).collect()
    assert rows
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    vocab = defaultdict(set)
    for r in docs.itertuples():
        vocab[r.source].update(t for t in r.text.split(" ") if t)
    got = {(r["source_a"], r["source_b"]): r for r in rows}
    assert all(a < b for a, b in got)
    srcs = sorted(vocab)
    for i, a in enumerate(srcs):
        for b in srcs[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            if inter == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r["n_common"] == inter
            assert r["n_a"] == len(vocab[a])
            assert r["n_b"] == len(vocab[b])
            union = len(vocab[a]) + len(vocab[b]) - inter
            # exact half-up 6-dp: (2*n*10^6 + d) // (2*d), then /1e6
            want = ((2 * inter * 10**6 + union) // (2 * union)) / 1e6
            assert r["jaccard"] == want
            # FLOAT WITNESS: half-up 6-dp sits within 5e-7 of the
            # true float ratio (independent of the shared formula)
            assert abs(r["jaccard"] - inter / union) <= 5e-7


def test_user_stickiness_pure_python(spark, sf_dir):
    """WAU, trailing-4-week MAU, and the half-up ratio all match a
    pure pandas recompute; stickiness is bounded by (0, 1] and MAU
    dominates WAU on every week."""
    from collections import defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.events import q_user_stickiness

    rows = {r["week"]: r for r in q_user_stickiness(spark, sf_dir).collect()}
    assert rows
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")
    weeks = us // 86_400_000_000 // 7
    by_week = defaultdict(set)
    for u, w in zip(ev["user_id"], weeks):
        by_week[w].add(u)
    assert set(rows) == set(by_week)
    for w, users in by_week.items():
        mau_set = set()
        for back in range(4):
            mau_set |= by_week.get(w - back, set())
        r = rows[w]
        assert r["wau"] == len(users)
        assert r["mau"] == len(mau_set)
        assert r["wau"] <= r["mau"]
        want = ((2 * r["wau"] * 10**6 + r["mau"]) // (2 * r["mau"])) / 1e6
        assert r["stickiness"] == want
        assert 0 < r["stickiness"] <= 1.0
        # FLOAT WITNESS: within half-up 6-dp rounding of the float ratio
        assert abs(r["stickiness"] - r["wau"] / r["mau"]) <= 5e-7


def test_user_activity_streaks_pure_python(spark, sf_dir):
    """Longest-consecutive-day streaks match a pure-Python calendar
    walk per user: lengths, island counts, start dates, ordering."""
    import datetime as dt

    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        q_user_activity_streaks,
    )

    rows = q_user_activity_streaks(spark, sf_dir).collect()
    assert rows

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    days = {}
    for u, ts in zip(ev["user_id"], ev["ts"]):
        days.setdefault(u, set()).add(ts.date())
    stats = {}
    for u, ds in days.items():
        ds = sorted(ds)
        streaks = []
        start = prev = ds[0]
        for d in ds[1:]:
            if (d - prev).days == 1:
                prev = d
            else:
                streaks.append((start, (prev - start).days + 1))
                start = prev = d
        streaks.append((start, (prev - start).days + 1))
        longest = max(s[1] for s in streaks)
        # earliest start among the longest
        lstart = min(s[0] for s in streaks if s[1] == longest)
        stats[u] = (len(ds), len(streaks), longest, lstart)
    want = sorted(
        (
            (-lg, -nd, u, ns, lstart.isoformat())
            for u, (nd, ns, lg, lstart) in stats.items()
        )
    )[:100]
    got = [
        (
            -r["longest_streak"],
            -r["n_active_days"],
            r["user_id"],
            r["n_streaks"],
            r["longest_start"],
        )
        for r in rows
    ]
    assert got == want
    # islands partition the active days: sum of streak lengths = n days
    for r in rows:
        assert r["longest_streak"] <= r["n_active_days"]


def test_kaplan_meier_pure_python(spark, sf_dir):
    """The KM repeat-purchase grid (risk sets, deaths, censoring) and
    the log-space survival sum match a pure-Python recompute using the
    engine's own ln_micro steps; survival is monotone non-increasing
    and the top risk set is every customer."""
    import pandas as pd

    from pyspark.sql import functions as F

    from beauty_lakehouse_spark.functions import ln_micro
    from beauty_lakehouse_spark.operators.events import (
        q_kaplan_meier_repeat,
    )

    rows = q_kaplan_meier_repeat(spark, sf_dir).collect()
    assert rows

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["d"] = o["o_orderdate"].dt.date
    gmax = o["d"].max()
    grid = {}
    n_cust = 0
    for _, g in o.groupby("o_custkey"):
        n_cust += 1
        two = g.sort_values(["d", "o_orderkey"]).head(2)
        if len(two) >= 2:
            t_days, cen = (two["d"].iloc[1] - two["d"].iloc[0]).days, 0
        else:
            t_days, cen = (gmax - two["d"].iloc[0]).days, 1
        d, c = grid.get(t_days, (0, 0))
        grid[t_days] = (d + 1 - cen, c + cen)
    ts = sorted(grid)
    n_risk, seen = {}, 0
    for t_ in reversed(ts):
        d, c = grid[t_]
        seen += d + c
        n_risk[t_] = seen
    assert n_risk[ts[0]] == n_cust
    need = sorted(
        {
            (n_risk[t_], n_risk[t_] - grid[t_][0])
            for t_ in ts
            if grid[t_][0] > 0 and n_risk[t_] - grid[t_][0] >= 1
        }
    )
    lnm = {
        (r["a"], r["b"]): r["v"]
        for r in spark.createDataFrame(need, ["a", "b"])
        .select(
            "a",
            "b",
            ln_micro(
                F.col("a").cast("long"), F.col("b").cast("long")
            ).alias("v"),
        )
        .collect()
    }
    acc, dead = 0, False
    want = []
    for t_ in ts:
        d, c = grid[t_]
        if d > 0 and n_risk[t_] - d >= 1:
            acc -= lnm[(n_risk[t_], n_risk[t_] - d)]
        if d > 0 and n_risk[t_] == d:
            dead = True
        if d > 0:
            want.append((t_, n_risk[t_], d, c, None if dead else acc))
    got = [
        (
            r["t_days"],
            r["n_risk"],
            r["n_deaths"],
            r["n_censored"],
            r["ln_surv_micro"],
        )
        for r in rows
    ]
    assert got == want
    vals = [v for *_, v in got if v is not None]
    assert all(x >= y for x, y in zip(vals, vals[1:]))
    assert all(v <= 0 for v in vals)
    # FLOAT WITNESS: the micro-nat log-survival tracks the true float
    # Kaplan-Meier product-limit curve (the recompute above reads
    # ln_micro off the engine, so it shares any quantization bug)
    import math

    fcurve = {}
    facc, fdead = 0.0, False
    for t_ in ts:
        d, _c = grid[t_]
        if d > 0 and n_risk[t_] - d >= 1:
            facc += math.log(1 - d / n_risk[t_])
        if d > 0 and n_risk[t_] == d:
            fdead = True
        if d > 0:
            fcurve[t_] = None if fdead else facc
    for t_, _nr, _d, _c, lnv in got:
        fv = fcurve[t_]
        assert (lnv is None) == (fv is None)
        if lnv is not None:
            assert abs(lnv / 1e6 - fv) < max(1e-4, 0.001 * abs(fv))


def test_er_blocking_quality_pure_python(spark, sf_dir):
    """Reduction ratio / pair completeness match a pure-Python
    recompute over the same deterministic sample, and the metrics sit
    in their legal ranges with the count identities intact."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.text import (
        ER_AUDIT_SAMPLE,
        q_er_blocking_quality,
    )

    [r] = q_er_blocking_quality(spark, sf_dir).collect()

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    p = (
        pd.read_parquet(f"{sf_dir}/part.parquet")
        .sort_values("p_partkey")
        .head(ER_AUDIT_SAMPLE)
    )
    recs = list(zip(p["p_partkey"], p["p_name"]))
    total = cand = true = true_b = 0
    for i, (ka, na) in enumerate(recs):
        for kb, nb in recs[i + 1 :]:
            total += 1
            blocked = na.split(" ")[0] == nb.split(" ")[0]
            is_true = 1 <= lev(na, nb) <= 4
            cand += blocked
            true += is_true
            true_b += blocked and is_true
    assert r["n_pairs_total"] == total
    assert r["n_candidates"] == cand
    assert r["n_true"] == true
    assert r["n_true_blocked"] == true_b

    def hu6(num, den):
        return ((2 * num * 10**6 + den) // (2 * den)) / 1e6

    assert r["reduction_ratio"] == hu6(total - cand, total)
    if true:
        assert r["pair_completeness"] == hu6(true_b, true)
    else:
        assert r["pair_completeness"] is None
    assert 0 <= r["reduction_ratio"] <= 1
    # FLOAT WITNESS: within half-up 6-dp rounding of the float ratios
    assert abs(r["reduction_ratio"] - (total - cand) / total) <= 5e-7
    if true:
        assert abs(r["pair_completeness"] - true_b / true) <= 5e-7


def test_markov_conversion_prob_pure_python(spark, sf_dir):
    """The unrolled value iteration matches a pure-Python recompute
    with the identical trunc quantization; probabilities are monotone
    in the horizon and bounded by 10^6; purchase stays absorbed."""
    from collections import defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        MARKOV_ABSORB,
        MARKOV_STEPS,
        q_markov_conversion_prob,
    )

    rows = {
        (r["step"], r["state"]): r["p_micro"]
        for r in q_markov_conversion_prob(spark, sf_dir).collect()
    }
    assert rows

    ev = pd.read_parquet(f"{sf_dir}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    c = defaultdict(int)
    for _, g in ev.groupby("user_id"):
        ts = list(g["event_type"])
        for a, b in zip(ts, ts[1:]):
            c[(a, b)] += 1
    n_i = defaultdict(int)
    for (a, _), n in c.items():
        n_i[a] += n
    states = sorted(set(ev["event_type"]))
    p = {s: 10**6 if s == MARKOV_ABSORB else 0 for s in states}
    for step in range(1, MARKOV_STEPS + 1):
        nxt = {}
        for s in states:
            if s == MARKOV_ABSORB:
                nxt[s] = 10**6
            elif n_i[s]:
                nxt[s] = (
                    sum(c[(s, j)] * p[j] for j in states) // n_i[s]
                )
            else:
                nxt[s] = 0
        p = nxt
        for s in states:
            assert rows[(step, s)] == p[s], (step, s)
    # structural sanity: monotone in horizon, bounded, absorbed
    for s in states:
        seq = [rows[(k, s)] for k in range(1, MARKOV_STEPS + 1)]
        assert all(0 <= v <= 10**6 for v in seq)
        assert all(x <= y + 1 for x, y in zip(seq, seq[1:]))  # quantized monotone
    assert all(rows[(k, MARKOV_ABSORB)] == 10**6 for k in range(1, 6))
    # FLOAT WITNESS: the same value iteration in float probabilities —
    # trunc quantization loses < 1 micro per step, so after K steps
    # the gap is bounded by K micro (independent of the shared
    # integer-scale formula)
    fp = {s: 1.0 if s == MARKOV_ABSORB else 0.0 for s in states}
    for step in range(1, MARKOV_STEPS + 1):
        fp = {
            s: 1.0
            if s == MARKOV_ABSORB
            else (
                sum(c[(s, j)] * fp[j] for j in states) / n_i[s]
                if n_i[s]
                else 0.0
            )
            for s in states
        }
        for s in states:
            assert abs(rows[(step, s)] / 1e6 - fp[s]) <= step * 1e-6 + 1e-9


def test_term_burstiness_pure_python(spark, sf_dir):
    """Fano factors match an exact recompute over all docs (zeros
    implicit) and agree with float var/mean; everything Poisson-ish
    or burstier (F bounded below by the minimum the integer floor
    allows)."""
    from collections import Counter

    import pandas as pd

    from beauty_lakehouse_spark.operators.text import q_term_burstiness

    rows = q_term_burstiness(spark, sf_dir).collect()
    assert rows

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    N = len(docs)
    per_term = {}
    for text in docs["text"]:
        for t, x in Counter(
            w for w in text.split(" ") if w
        ).items():
            st = per_term.setdefault(t, [0, 0, 0])
            st[0] += 1
            st[1] += x
            st[2] += x * x
    scored = []
    for t, (df, sx, sxx) in per_term.items():
        fano = (N * sxx - sx * sx) * 10**6 // ((N - 1) * sx)
        scored.append((-fano, t, df, sx))
    scored.sort()
    want = scored[:50]
    got = [
        (-r["fano_micro"], r["term"], r["df"], r["total_tf"])
        for r in rows
    ]
    assert got == want
    # float witness on the top row
    fano0, t0 = -want[0][0], want[0][1]
    df, sx, sxx = per_term[t0]
    xs_mean = sx / N
    var = (sxx - N * xs_mean**2) / (N - 1)
    assert abs(fano0 / 1e6 - var / xs_mean) < 1e-4


def test_revenue_cusum_scan_identity(spark, sf_dir):
    """The windowed CUSUM equals the textbook SEQUENTIAL recursion
    S_t = max(0, S_{t-1} + x_t - mu - k) computed in pure Python —
    the scan identity proof — and alarms fire exactly at S > 4 sd."""
    import math

    import pandas as pd

    from beauty_lakehouse_spark.operators.temporal import (
        q_revenue_cusum,
    )

    rows = q_revenue_cusum(spark, sf_dir).collect()
    assert rows

    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["cents"] = (o["o_totalprice"].round(2) * 100).round().astype("int64")
    o["day"] = o["o_orderdate"].dt.date
    daily = o.groupby("day")["cents"].sum().sort_index()
    xs = [int(v) for v in daily]
    n = len(xs)
    s1, s2 = sum(xs), sum(x * x for x in xs)
    mu = s1 // n
    sd = math.isqrt((n * s2 - s1 * s1) // (n * (n - 1)))
    k = sd // 2
    s = 0
    want = []
    for d, x in zip(daily.index, xs):
        s = max(0, s + x - mu - k)
        want.append((d.isoformat(), x, s, s > 4 * sd))
    got = [
        (r["day"], r["revenue_cents"], r["cusum_cents"], r["alarm"])
        for r in rows
    ]
    assert got == want
    # FLOAT WITNESS: the integer reference level and allowance carry
    # the scale — they must sit within one unit of the float mean and
    # sample-sd (a shared 10^x scale bug would blow these up), and the
    # float recursion with the integer mu/k reproduces the curve
    fmu = s1 / n
    fsd = math.sqrt((n * s2 - s1 * s1) / (n * (n - 1)))
    assert abs(mu - fmu) <= 1
    assert abs(sd - fsd) <= 1
    fs = 0.0
    for (_d, _x, s_int, _a), x in zip(want, xs):
        fs = max(0.0, fs + x - mu - k)
        assert abs(s_int - fs) < 1e-6


def test_window_funnel_strict_pure_python(spark, sf_dir):
    """Depth histogram matches a pure-Python greedy-earliest recompute
    of the windowFunnel contract; users are conserved; ordering is
    strict (an out-of-order purchase cannot create depth 3)."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        FUNNEL_STEPS,
        FUNNEL_WINDOW_US,
        q_window_funnel_strict,
    )

    rows = {r["depth"]: r["n_users"] for r in q_window_funnel_strict(spark, sf_dir).collect()}

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    from collections import Counter

    depth = Counter()
    for _, g in ev.groupby("user_id"):
        t_prev = None
        d = 0
        for step in FUNNEL_STEPS:
            cand = g[g["event_type"] == step]["us"]
            if t_prev is not None:
                cand = cand[
                    (cand > t_prev) & (cand <= t_prev + FUNNEL_WINDOW_US)
                ]
            if cand.empty:
                break
            t_prev = int(cand.min())
            d += 1
        depth[d] += 1
    assert rows == dict(depth)
    assert sum(rows.values()) == ev["user_id"].nunique()


def test_shapley_channel_attribution_pure_python(spark, sf_dir):
    """phi values match a pure-Python lattice recompute and satisfy
    the EFFICIENCY axiom: sum of 6*phi over channels equals
    6*(v(full) - v(empty)) exactly (the game-theoretic budget)."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        SHAPLEY_CHANNELS,
        q_shapley_channel_attribution,
    )

    rows = {
        r["channel"]: r
        for r in q_shapley_channel_attribution(spark, sf_dir).collect()
    }
    assert set(rows) == set(SHAPLEY_CHANNELS)

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    grid = {}
    for _, g in ev.groupby("user_id"):
        firsts = g.groupby("event_type")["us"].min()
        t_buy = firsts.get("purchase")
        mask = 0
        for i, ch in enumerate(SHAPLEY_CHANNELS):
            tc = firsts.get(ch)
            if tc is not None and (t_buy is None or tc < t_buy):
                mask |= 1 << i
        n, c = grid.get(mask, (0, 0))
        grid[mask] = (n + 1, c + (t_buy is not None))
    v = {
        m: (grid[m][1] * 10**6 // grid[m][0]) if m in grid else 0
        for m in range(8)
    }
    coef = {0: 2, 1: 1, 2: 2}
    phis = {}
    for i, ch in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << i
        phis[ch] = sum(
            coef[bin(s).count("1")] * (v[s | bit] - v[s])
            for s in range(8)
            if not s & bit
        )
    for ch in SHAPLEY_CHANNELS:
        r = rows[ch]
        assert r["phi_x6_micro"] == phis[ch]
        assert r["v_solo_micro"] == v[1 << SHAPLEY_CHANNELS.index(ch)]
        assert r["v_full_micro"] == v[7]
    # efficiency axiom (exact, because all eight masks are populated
    # on this fixture — otherwise zero-filled gaps break the identity)
    if all(m in grid for m in range(8)):
        assert sum(phis.values()) == 6 * (v[7] - v[0])
    # FLOAT WITNESS: the same lattice over float conversion rates —
    # each v is trunc-quantized to micro, and phi sums 4 coalition
    # differences with coefficients summing to 6, so the micro gap is
    # bounded by 6 * 2 quanta (independent of the integer formula)
    fv = {
        m: (grid[m][1] / grid[m][0]) if m in grid else 0.0
        for m in range(8)
    }
    for i, ch in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << i
        fphi = sum(
            coef[bin(s).count("1")] * (fv[s | bit] - fv[s])
            for s in range(8)
            if not s & bit
        )
        assert abs(rows[ch]["phi_x6_micro"] / 1e6 - fphi) <= 12e-6 + 1e-9


def test_lang_id_kappa_pure_python(spark, sf_dir):
    """kappa matches an exact recompute from the engine's own
    predictions and the float Cohen formula; chance correction really
    bites (kappa < accuracy on this imbalanced, weak-signal corpus)."""
    from collections import Counter

    from beauty_lakehouse_spark.operators.text import (
        q_lang_id,
        q_lang_id_kappa,
    )

    [r] = q_lang_id_kappa(spark, sf_dir).collect()
    pred = [
        (p["lang"], p["pred_lang"])
        for p in q_lang_id(spark, sf_dir).select("lang", "pred_lang").collect()
    ]
    N = len(pred)
    A = sum(1 for a, b in pred if a == b)
    nt = Counter(a for a, _ in pred)
    np_ = Counter(b for _, b in pred)
    M = sum(nt[c] * np_.get(c, 0) for c in nt | np_.keys())
    assert (r["n_docs"], r["n_agree"], r["marginal_prod"]) == (N, A, M)
    assert r["po_micro"] == A * 10**6 // N
    assert r["pe_micro"] == M * 10**6 // (N * N)
    num = (N * A - M) * 10**6
    den = N * N - M
    want = -((-num) // den) if num < 0 else num // den
    assert r["kappa_micro"] == want
    # float witness
    po, pe = A / N, M / (N * N)
    kf = (po - pe) / (1 - pe)
    assert abs(r["kappa_micro"] / 1e6 - kf) < 1e-5
    assert r["kappa_micro"] < r["po_micro"]  # chance correction bites


def test_position_attribution_pure_python(spark, sf_dir):
    """U-shaped credits match a pure pandas recompute (first/last/
    middle roles under the (us, event_id) total order); per-user
    credit conserves 1e6 ppm up to the documented middle-split
    truncation; float witness on the role fractions."""
    from collections import defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        ATTRIB_CHANNELS,
        q_position_attribution,
    )

    rows = {r["channel"]: r for r in q_position_attribution(spark, sf_dir).collect()}
    assert rows

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    buys = (
        ev[ev["event_type"] == "purchase"].groupby("user_id")["us"].min()
    )
    want = defaultdict(lambda: [0, 0, 0, 0])  # first, last, mid, credit
    for u, g in ev[ev["event_type"].isin(ATTRIB_CHANNELS)].groupby(
        "user_id"
    ):
        if u not in buys.index:
            continue
        t_buy = buys[u]
        tch = g[g["us"] < t_buy].sort_values(["us", "event_id"])
        n = len(tch)
        if n == 0:
            continue
        user_total = 0
        for i, (_, r) in enumerate(tch.iterrows()):
            ch = r["event_type"]
            if n == 1:
                c = 1_000_000
            elif n == 2:
                c = 500_000
            elif i == 0:
                c = 400_000
            elif i == n - 1:
                c = 400_000
            else:
                c = 200_000 // (n - 2)
            want[ch][0] += i == 0
            want[ch][1] += (i == n - 1) and n > 1
            want[ch][2] += 0 < i < n - 1
            want[ch][3] += c
            user_total += c
        # conservation: the middle split truncates < n-2 ppm per user
        assert 1_000_000 - max(0, n - 2) <= user_total <= 1_000_000
    assert set(rows) == set(want)
    for ch, (nf, nl, nm, credit) in want.items():
        r = rows[ch]
        assert (r["n_first"], r["n_last"], r["n_middle"]) == (nf, nl, nm)
        assert r["credit_ppm"] == credit
    # FLOAT WITNESS: total credited mass tracks 1e6 per conversion
    # with touches (truncation loss bounded by total middle count)
    n_conv = sum(
        1
        for u, g in ev[ev["event_type"].isin(ATTRIB_CHANNELS)].groupby("user_id")
        if u in buys.index and (g["us"] < buys[u]).any()
    )
    total = sum(r["credit_ppm"] for r in rows.values())
    n_mid_total = sum(r["n_middle"] for r in rows.values())
    assert n_conv * 1e6 - n_mid_total <= total <= n_conv * 1e6


def test_time_decay_attribution_pure_python(spark, sf_dir):
    """Per-day halving weights and truncated credit splits match a
    pure pandas recompute; the shift weight tracks the float
    exponential 1e6 * 0.5^age within 1 unit (FLOAT WITNESS), and
    per-user credit conserves 1e6 up to truncation."""
    from collections import defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.events import (
        ATTRIB_CHANNELS,
        q_time_decay_attribution,
    )

    rows = {r["channel"]: r for r in q_time_decay_attribution(spark, sf_dir).collect()}
    assert rows

    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    buys = (
        ev[ev["event_type"] == "purchase"].groupby("user_id")["us"].min()
    )
    want = defaultdict(lambda: [0, 0, 0])  # touches, weight, credit
    for u, g in ev[ev["event_type"].isin(ATTRIB_CHANNELS)].groupby(
        "user_id"
    ):
        if u not in buys.index:
            continue
        t_buy = int(buys[u])
        tch = g[g["us"] < t_buy]
        if len(tch) == 0:
            continue
        wts = []
        for _, r in tch.iterrows():
            k = min((t_buy - int(r["us"])) // 86_400_000_000, 30)
            wt = 1_000_000 >> k
            # FLOAT WITNESS: shift weight ~ float exponential decay
            assert abs(wt - 1_000_000 * 0.5**k) <= 1
            wts.append((r["event_type"], wt))
        w_sum = sum(w for _, w in wts)
        for ch, w in wts:
            want[ch][0] += 1
            want[ch][1] += w
            want[ch][2] += (w * 1_000_000) // w_sum if w_sum > 0 else 0
    assert set(rows) == set(want)
    for ch, (nt, ws, credit) in want.items():
        r = rows[ch]
        assert (r["n_touches"], r["weight_sum"], r["credit_ppm"]) == (
            nt,
            ws,
            credit,
        )


def test_fellegi_sunter_weights_pure_python(spark, sf_dir):
    """m/u cells match a pure-Python recompute over the same bounded
    sample and match rule; FLOAT WITNESS: each micro weight tracks
    math.log of the smoothed float odds ratio."""
    import math

    import pandas as pd

    from beauty_lakehouse_spark.operators.text import (
        ER_AUDIT_SAMPLE,
        FS_FIELDS,
        q_fellegi_sunter_weights,
    )
    rows = {r["field"]: r for r in q_fellegi_sunter_weights(spark, sf_dir).collect()}
    assert set(rows) == set(FS_FIELDS)

    p = (
        pd.read_parquet(f"{sf_dir}/part.parquet")
        .sort_values("p_partkey")
        .head(ER_AUDIT_SAMPLE)
    )
    p["pc"] = (p["p_retailprice"].round(2) * 100).round().astype("int64")
    recs = list(
        zip(p["p_partkey"], p["p_name"], p["p_brand"], p["p_type"],
            p["p_size"], p["pc"])
    )

    def lev(a, b):
        if len(a) < len(b):
            a, b = b, a
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(
                    min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb))
                )
            prev = cur
        return prev[-1]

    cells = {f: [0, 0] for f in FS_FIELDS}  # agree_match, agree_unmatch
    n_m = n_u = 0
    for i, (ka, na, bra, tya, sza, pca) in enumerate(recs):
        for kb, nb, brb, tyb, szb, pcb in recs[i + 1 :]:
            m = 1 <= lev(na, nb) <= 4
            n_m += m
            n_u += not m
            ag = {
                "brand_eq": bra == brb,
                "type_eq": tya == tyb,
                "size_close": abs(int(sza) - int(szb)) <= 2,
                "price_close": abs(int(pca) - int(pcb)) <= 500,
            }
            for f, v in ag.items():
                if v:
                    if m:
                        cells[f][0] += 1
                    else:
                        cells[f][1] += 1
    for f in FS_FIELDS:
        am, au = cells[f]
        r = rows[f]
        assert (r["n_match_pairs"], r["n_unmatch_pairs"]) == (n_m, n_u)
        assert (r["n_agree_match"], r["n_agree_unmatch"]) == (am, au)
        assert r["m_micro"] == (am + 1) * 10**6 // (n_m + 2)
        assert r["u_micro"] == (au + 1) * 10**6 // (n_u + 2)
        # FLOAT WITNESS: weights track math.log of the smoothed odds
        mf = (am + 1) / (n_m + 2)
        uf = (au + 1) / (n_u + 2)
        assert abs(r["w_agree_micro"] / 1e6 - math.log(mf / uf)) < 1e-4
        assert (
            abs(
                r["w_disagree_micro"] / 1e6
                - math.log((1 - mf) / (1 - uf))
            )
            < 1e-4
        )


def test_rake_keyword_scores_pure_python(spark, sf_dir):
    """RAKE deg/freq scores match a pure-Python phrase-split recompute;
    FLOAT WITNESS: score_milli tracks the float deg/freq ratio, and
    deg >= freq always (every phrase has length >= 1)."""
    from collections import Counter, defaultdict

    import pandas as pd

    from beauty_lakehouse_spark.operators.text import (
        RAKE_STOPWORDS,
        RAKE_TOP,
        q_rake_keyword_scores,
    )

    rows = q_rake_keyword_scores(spark, sf_dir).collect()
    # the fixture vocabulary is a small jargon set, so fewer than
    # RAKE_TOP candidate words can exist at small SF
    assert 0 < len(rows) <= RAKE_TOP

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tf = Counter()
    toks_per_doc = {}
    for r in docs.itertuples():
        toks = [t for t in r.text.split(" ") if t]
        toks_per_doc[r.doc_id] = toks
        tf.update(toks)
    stop = {
        t
        for t, _n in sorted(tf.items(), key=lambda kv: (-kv[1], kv[0]))[
            :RAKE_STOPWORDS
        ]
    }
    freq = Counter()
    deg = defaultdict(int)
    for toks in toks_per_doc.values():
        phrase = []
        for t in toks + [None]:
            if t is None or t in stop:
                for w in phrase:
                    freq[w] += 1
                    deg[w] += len(phrase)
                phrase = []
            else:
                phrase.append(t)
    scored = sorted(
        ((-(deg[w] * 1000 // freq[w]), -deg[w], w) for w in freq)
    )[: len(rows)]
    assert len(freq) == len(rows) or len(rows) == RAKE_TOP
    want = [(w, freq[w], deg[w], -s) for s, _d, w in scored]
    got = [
        (r["word"], r["freq"], r["deg"], r["score_milli"]) for r in rows
    ]
    assert got == want
    for w, f, d, s in got:
        assert d >= f
        # FLOAT WITNESS: trunc milli within 1 of the float ratio
        assert abs(s / 1e3 - d / f) <= 1e-3


def test_kneser_ney_bigrams_pure_python(spark, sf_dir):
    """Pure-Python recompute of the exact-rational interpolated KN
    formula for the top-50 bigrams, a FLOAT WITNESS via the textbook
    max(c-d,0)/c_u + d*N1u/c_u * Ncw/Nbb float form, and the KN
    normalization law: for any observed context u, the observed-bigram
    mass plus the backoff mass over the FULL continuation distribution
    sums to exactly 1."""
    from decimal import ROUND_HALF_UP, Decimal

    import pandas as pd

    from beauty_lakehouse_spark.operators.text import (
        KN_DISC_DEN,
        KN_DISC_NUM,
        q_kneser_ney_bigrams,
    )

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["text"]]
    c_uw: dict[tuple[str, str], int] = {}
    for text in pdf.text:
        toks = text.split(" ")
        for u, w in zip(toks, toks[1:]):
            c_uw[(u, w)] = c_uw.get((u, w), 0) + 1
    c_u: dict[str, int] = {}
    n1_u: dict[str, int] = {}
    n_cont: dict[str, int] = {}
    for (u, w), c in c_uw.items():
        c_u[u] = c_u.get(u, 0) + c
        n1_u[u] = n1_u.get(u, 0) + 1
        n_cont[w] = n_cont.get(w, 0) + 1
    n_bb = len(c_uw)
    d = KN_DISC_NUM / KN_DISC_DEN  # 0.75

    rows = q_kneser_ney_bigrams(spark, sf_dir).collect()
    assert len(rows) == 50
    # top-50 selection matches (count desc, u, w)
    want = sorted(c_uw.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    assert [(r.u, r.w) for r in rows] == [k for k, _ in want]
    for r in rows:
        assert r.c_uw == c_uw[(r.u, r.w)]
        assert r.c_u == c_u[r.u] and r.n1_u == n1_u[r.u]
        assert r.n_cont_w == n_cont[r.w] and r.n_bb == n_bb
        # exact rational -> half-up 6dp recompute
        num = (4 * r.c_uw - 3) * n_bb + 3 * r.n1_u * r.n_cont_w
        den = 4 * r.c_u * n_bb
        exact = float(
            (Decimal(num) / Decimal(den)).quantize(
                Decimal("0.000001"), rounding=ROUND_HALF_UP
            )
        )
        assert r.p_kn == exact, (r, exact)
        # FLOAT WITNESS: the textbook interpolated-KN float form
        flt = max(r.c_uw - d, 0) / r.c_u + (
            d * r.n1_u / r.c_u
        ) * (r.n_cont_w / n_bb)
        assert abs(r.p_kn - flt) < 1e-6, (r, flt)
    # normalization law for the most frequent context u*: observed
    # discounted mass + full backoff mass == 1 (float)
    u_star = rows[0].u
    obs = sum(
        max(c - d, 0) / c_u[u_star]
        for (u, _), c in c_uw.items()
        if u == u_star
    )
    backoff = (d * n1_u[u_star] / c_u[u_star]) * sum(
        n_cont[w] / n_bb for w in n_cont
    )
    assert abs(obs + backoff - 1.0) < 1e-9


def test_tokenizer_fertility_pure_python(spark, sf_dir):
    """Pure-Python recompute of the per-source fertility table under
    the fixed BPE merge chain, with a FLOAT WITNESS on the two micro
    ratios (trunc-division slack only)."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.text import (
        BPE_FIXED_MERGES,
        q_tokenizer_fertility,
    )

    def encode_pieces(token: str) -> int:
        w = "".join(f"<{ch}>" for ch in token)
        for a, b in BPE_FIXED_MERGES:
            w = w.replace(f"<{a}><{b}>", f"<{a}{b}>")
        return w.count("<")

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "source", "text"]
    ]
    agg: dict[str, dict] = {}
    piece_cache: dict[str, int] = {}
    for _doc, source, text in pdf.itertuples(index=False):
        s = agg.setdefault(
            source, {"docs": set(), "tok": 0, "pieces": 0, "chars": 0}
        )
        for tok in text.split(" "):
            if tok == "":
                continue
            s["docs"].add(_doc)
            s["tok"] += 1
            s["chars"] += len(tok)
            if tok not in piece_cache:
                piece_cache[tok] = encode_pieces(tok)
            s["pieces"] += piece_cache[tok]

    rows = {r.source: r for r in q_tokenizer_fertility(spark, sf_dir).collect()}
    assert set(rows) == set(agg)
    for src, s in agg.items():
        r = rows[src]
        assert r.n_docs == len(s["docs"])
        assert r.n_tokens == s["tok"] and r.n_pieces == s["pieces"]
        assert r.n_chars == s["chars"]
        assert r.fertility_micro == (s["pieces"] * 1_000_000) // s["tok"]
        assert (
            r.chars_per_piece_micro
            == (s["chars"] * 1_000_000) // s["pieces"]
        )
        # FLOAT WITNESS: micro ratios against plain float division
        assert abs(r.fertility_micro / 1e6 - s["pieces"] / s["tok"]) < 1e-6
        assert (
            abs(r.chars_per_piece_micro / 1e6 - s["chars"] / s["pieces"])
            < 1e-6
        )
        # fertility is >= 1 by construction (every token >= 1 piece)
        assert r.fertility_micro >= 1_000_000


def test_good_turing_smoothing_pure_python(spark, sf_dir):
    """Pure-Python recompute of the bigram count-of-counts table and
    the Good-Turing adjusted counts + unseen mass, with a FLOAT
    WITNESS on r* and p0 (plain float (r+1)N_{r+1}/N_r vs the micro
    integers) and the Good-Turing mass identity: summing the adjusted
    counts over ALL r (plus the N_1 mass moved to unseen) conserves
    the total occurrence count."""
    import pandas as pd

    from beauty_lakehouse_spark.operators.text import (
        GT_TOP_R,
        q_good_turing_smoothing,
    )

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["text"]]
    freq: dict[str, int] = {}
    n_total = 0
    for text in pdf.text:
        toks = text.split(" ")
        for a, b in zip(toks, toks[1:]):
            g = f"{a} {b}"
            freq[g] = freq.get(g, 0) + 1
            n_total += 1
    coc: dict[int, int] = {}
    for r in freq.values():
        coc[r] = coc.get(r, 0) + 1

    rows = {r.r: r for r in q_good_turing_smoothing(spark, sf_dir).collect()}
    assert set(rows) == {r for r in coc if r <= GT_TOP_R}
    p0_want = (coc.get(1, 0) * 1_000_000) // n_total
    for r, row in rows.items():
        assert row.n_r == coc[r]
        assert row.n_r_plus_1 == coc.get(r + 1, 0)
        want = ((r + 1) * coc.get(r + 1, 0) * 1_000_000) // coc[r]
        assert row.r_star_micro == want
        assert row.p0_micro == p0_want
        # FLOAT WITNESS: plain float forms within trunc slack
        assert abs(
            row.r_star_micro / 1e6 - (r + 1) * coc.get(r + 1, 0) / coc[r]
        ) < 1e-6
        assert abs(row.p0_micro / 1e6 - coc.get(1, 0) / n_total) < 1e-6
    # Good-Turing conservation: the total adjusted mass over the whole
    # spectrum, Σ_r N_r·r*(r) = Σ_{s>=2} s·N_s, equals N − N_1 — the
    # singleton mass is exactly what moved to the unseen estimate
    total_adjusted = sum(s * n for s, n in coc.items() if s >= 2)
    assert total_adjusted == n_total - coc.get(1, 0)


def test_nb_lang_classifier_pure_python(spark, sf_dir):
    """Pure-Python recompute of the multinomial NB train/score path:
    same deterministic split, same add-one model, same integer
    micro-nat costs — the confusion matrix and acc_ppm must match
    bit-for-bit. FLOAT WITNESS: every (doc, class) integer cost agrees
    with the true float log-cost within the accumulated ln_micro
    quantization budget, and wherever the float argmin is uniquely
    separated beyond that budget it picks the SAME class. A planted
    lang-specific-vocabulary control checks the learner detects real
    signal (this fixture's shared-vocabulary text is the negative
    control — accuracy rides the majority-class floor)."""
    import math

    import pandas as pd

    from beauty_lakehouse_spark.operators.text import (
        NB_TEST_MOD,
        nb_finish,
        nb_token_grid,
        q_nb_lang_classifier,
    )

    def ln_micro_py(num: int, den: int) -> int:
        q = num // den
        e = q.bit_length() - 1
        x = ((num << 30) // den) >> e
        acc = 0
        for _ in range(16):
            x2 = (x * x) >> 30
            if x2 >= 1 << 31:
                x, acc = x2 >> 1, acc * 2 + 1
            else:
                x, acc = x2, acc * 2
        return ((e * (1 << 16) + acc) * 693147) >> 16

    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "lang", "text"]
    ]
    train = pdf[pdf.doc_id % NB_TEST_MOD != 0]
    test = pdf[pdf.doc_id % NB_TEST_MOD == 0]
    vocab = {t for text in train.text for t in text.split(" ")}
    v_n = len(vocab)
    tot: dict[str, int] = {}
    nd: dict[str, int] = {}
    ctl: dict[tuple[str, str], int] = {}
    for _, r in train.iterrows():
        toks = r.text.split(" ")
        tot[r.lang] = tot.get(r.lang, 0) + len(toks)
        nd[r.lang] = nd.get(r.lang, 0) + 1
        for t in toks:
            ctl[(t, r.lang)] = ctl.get((t, r.lang), 0) + 1
    nd_total = sum(nd.values())
    langs = sorted(tot)

    conf: dict[tuple[str, str], int] = {}
    for _, r in test.iterrows():
        toks = r.text.split(" ")
        best = None
        for lang in langs:
            den = tot[lang] + v_n + 1
            cost = ln_micro_py(nd_total, nd[lang])
            fcost = math.log(nd_total / nd[lang])
            for t in toks:
                c = ctl.get((t, lang), 0)
                cost += ln_micro_py(den, c + 1)
                fcost += math.log(den / (c + 1))
            # FLOAT WITNESS: integer micro-nat cost tracks the true
            # float log-cost within the per-ln quantization budget
            # (±1e-4 nats per ln_micro call, one per token + prior)
            budget = (len(toks) + 1) * 1.1e-4
            assert abs(cost / 1e6 - fcost) < budget
            if best is None or (cost, lang) < best:
                best = (cost, lang)
        key = (r.lang, best[1])
        conf[key] = conf.get(key, 0) + 1

    n_correct = sum(n for (t, p), n in conf.items() if t == p)
    acc_ppm = n_correct * 1_000_000 // sum(conf.values())
    rows = q_nb_lang_classifier(spark, sf_dir).collect()
    got = {(r.true_lang, r.pred_lang): r.n_docs for r in rows}
    assert got == conf
    assert all(r.acc_ppm == acc_ppm for r in rows)

    # planted-signal positive control: class-specific vocabularies
    # must classify perfectly (the learner sees real signal)
    planted = spark.createDataFrame(
        [
            (i, " ".join([f"w{i % 3}"] * 6), f"L{i % 3}", "s", 6)
            for i in range(30)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    prows = nb_finish(nb_token_grid(planted)).collect()
    assert all(r.true_lang == r.pred_lang for r in prows)
    assert all(r.acc_ppm == 1_000_000 for r in prows)

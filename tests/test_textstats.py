"""Property tests (hypothesis) for the text-analysis operators:
invariants that must hold for ANY input text, not just the corpus."""

from __future__ import annotations

import re

import pytest

from hypothesis import given, settings, strategies as st

# token alphabet: lowercase words + punctuation, single-space joined —
# the documents-table shape
words = st.lists(
    st.text(alphabet="abcdefghijklmnopqrstuvwxyz.,!?;:0123456789", min_size=1, max_size=8),
    min_size=1,
    max_size=30,
)


@pytest.fixture(scope="module")
def make_df(spark):
    def _make(texts):
        return spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], ["doc_id", "text"]
        )

    return _make


@settings(max_examples=15, deadline=None)
@given(words)
def test_quality_features_bounds(spark, toks):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        quality_features,
        quality_score,
    )

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = quality_score(quality_features(df)).collect()[0]
    assert r.n_tokens == len(toks)
    assert 0.0 <= r.punct_ratio <= 1.0
    assert 0.0 <= r.stopword_ratio <= 1.0
    assert 0 <= r.quality_score <= 100


@settings(max_examples=15, deadline=None)
@given(words)
def test_bag_fingerprint_order_invariant(spark, toks):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bag_fingerprint,
    )
    from pyspark.sql import functions as F

    fwd = " ".join(toks)
    rev = " ".join(reversed(toks))
    df = spark.createDataFrame([(1, fwd), (2, rev)], ["doc_id", "text"])
    fps = [
        r.fp for r in df.select(bag_fingerprint("text").alias("fp")).collect()
    ]
    assert fps[0] == fps[1], "bag fingerprint must ignore token order"


@settings(max_examples=15, deadline=None)
@given(words)
def test_token_counts_match_python(spark, toks):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        BPE_ISH_PATTERN,
        token_counts,
    )

    text = " ".join(toks)
    df = spark.createDataFrame([(1, text)], ["doc_id", "text"])
    r = token_counts(df).collect()[0]
    assert r.ws_tokens == len(text.split(" "))
    assert r.bpe_ish_tokens == len(re.findall(BPE_ISH_PATTERN, text))


def test_predict_lang_deterministic_tiebreak(spark):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        predict_lang,
    )

    # 'la' is a marker for both fr and es; fr wins (language-code order)
    df = spark.createDataFrame(
        [(1, "la la la"), (2, "zzz qqq"), (3, "the the le")],
        ["doc_id", "text"],
    )
    got = {r.doc_id: r.predicted_lang for r in predict_lang(df).collect()}
    assert got[1] == "fr"
    assert got[2] == "und"
    assert got[3] == "en"


def test_tfidf_rare_term_outranks_common(spark):
    """A term unique to one doc must outscore a term every doc shares
    (idf dominance), and ranks must be contiguous from 1."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        tfidf_top_terms,
    )

    rows = [
        (1, "common common common unicorn"),
        (2, "common filler words here"),
        (3, "common other text body"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = tfidf_top_terms(df, "doc_id", "text", k=2).collect()
    doc1 = sorted((r for r in out if r.doc_id == 1), key=lambda r: r.rnk)
    assert doc1[0].term == "unicorn", "doc-unique term must rank first despite tf=1 vs tf=3"
    assert [r.rnk for r in doc1] == [1, 2]


@settings(max_examples=10, deadline=None)
@given(words)
def test_repetition_stats_invariants(spark, toks):
    """ppm ratios stay in [0, 1e6]; a doc made of ONE repeated token is
    maximally repetitive; an all-distinct doc has dup_token_ppm == 0."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        repetition_stats,
    )

    text = " ".join(toks)
    df = spark.createDataFrame(
        [
            (1, text),
            (2, "spam " * 9 + "spam"),
            # long all-distinct doc: top bigram covers < 20% of chars
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"),
        ],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in repetition_stats(df).collect()}
    r1 = rows[1]
    assert 0 <= r1.dup_token_ppm <= 1_000_000
    assert 0 <= r1.top_bigram_ppm <= 1_000_000
    assert 0 <= r1.dup_trigram_ppm <= 1_000_000
    assert r1.n_tokens == len(toks)
    expected_dup = (1_000_000 * (len(toks) - len(set(toks)))) // len(toks)
    assert r1.dup_token_ppm == expected_dup
    # 10x "spam": dup fraction 9/10, top bigram "spam spam" covers all chars
    assert rows[2].dup_token_ppm == 900_000
    assert rows[2].top_bigram == "spam spam"
    assert rows[2].repetitive == 1
    assert rows[3].dup_token_ppm == 0
    assert rows[3].repetitive == 0


def test_vocab_stats_exact_small(spark):
    """vocab/hapax/top-k numbers must match hand counts."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        vocab_stats,
    )

    df = spark.createDataFrame(
        [(1, "en", "a a b c"), (2, "en", "a b d"), (3, "fr", "x y")],
        ["doc_id", "lang", "text"],
    )
    out = {r.lang: r for r in vocab_stats(df, "lang", "text", top_k=2).collect()}
    en = out["en"]
    # counts: a=3 b=2 c=1 d=1 -> vocab 4, total 7, hapax 2, top2 = a+b = 5
    assert (en.vocab_size, en.total_tokens, en.hapax_terms, en.topk_tokens) == (4, 7, 2, 5)
    assert en.topk_coverage_ppm == (1_000_000 * 5) // 7
    assert en.hapax_ppm == 500_000
    fr = out["fr"]
    assert (fr.vocab_size, fr.total_tokens, fr.hapax_terms) == (2, 2, 2)
    assert fr.topk_coverage_ppm == 1_000_000


def test_classifier_score_bounds_and_gate(spark, sf_dir):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        classifier_score,
    )
    from etl_sql_and_pyspark_developement__spark.sources.catalog import table

    docs = table(spark, sf_dir, "documents")
    out = classifier_score(docs).collect()
    assert len(out) == docs.count()
    for r in out:
        # components cap at 300k + 250k + 150k + 300k = 1e6 ppm
        assert 0 <= r["score_ppm"] <= 1_000_000
        assert r["kept"] == (1 if r["score_ppm"] >= 700_000 else 0)
    kept_frac = sum(r["kept"] for r in out) / len(out)
    # the gate must actually discriminate on this corpus
    assert 0.05 < kept_frac < 0.95


def test_classifier_score_prefers_diverse_long_text(spark):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        classifier_score,
    )

    rows = [
        (1, " ".join(f"w{i}" for i in range(100))),   # long, all-distinct
        (2, "the " * 49 + "the"),                      # pure repetition
        (3, "a b"),                                    # too short
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r["score_ppm"] for r in classifier_score(df).collect()}
    assert got[1] > got[2] and got[1] > got[3]


def test_pii_scrub_counts_redacts_and_is_idempotent(spark):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        pii_scrub,
    )

    rows = [
        (1, "reach me at jane.doe+x@corp.example.com or 555-867-5309 ok"),
        (2, "server 192.168.001.042 answered; backup 10.0.0.7 did not"),
        (3, "no pii here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r for r in pii_scrub(df).collect()}
    assert (got[1].n_email, got[1].n_phone, got[1].n_ipv4) == (1, 1, 0)
    assert "[EMAIL]" in got[1].scrubbed and "[PHONE]" in got[1].scrubbed
    assert "jane" not in got[1].scrubbed and "5309" not in got[1].scrubbed
    assert got[2].n_ipv4 == 2 and got[2].scrubbed.count("[IPV4]") == 2
    assert got[3].scrubbed == rows[2][1]

    # idempotent: scrubbing the scrubbed text finds nothing
    scrubbed_df = spark.createDataFrame(
        [(r.doc_id, r.scrubbed) for r in got.values()],
        "doc_id BIGINT, text STRING",
    )
    again = pii_scrub(scrubbed_df).collect()
    assert all(r.n_email == r.n_phone == r.n_ipv4 == 0 for r in again)


def test_surprisal_rare_tokens_score_higher(spark):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        surprisal_scores,
    )

    rows = [
        (1, "common common common common"),
        (2, "common rareword1 rareword2 rareword3"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r.doc_id: r for r in surprisal_scores(df).collect()}
    # "common" appears 5x corpus-wide -> rarity 200000; rarewords 1x
    # -> 1000000. doc1 = 200000; doc2 = (200000 + 3*1000000) // 4
    assert got[1].mean_rarity_ppm == 200000
    assert got[2].mean_rarity_ppm == (200000 + 3 * 1000000) // 4
    assert got[2].mean_rarity_ppm > got[1].mean_rarity_ppm


def test_heuristic_rules_flags_and_conjunction(spark):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        heuristic_rules,
    )

    rows = [
        # passes everything: 30+ varied words incl. 'a' and 'the'
        (0, "a the " + " ".join(f"word{i:02d}" for i in range(30))),
        # too short
        (1, "a the tiny doc"),
        # repetitive: unique fraction < 1/2
        (2, "a the " + " ".join(["dup"] * 40)),
        # no stopwords
        (3, " ".join(f"tok{i:02d}" for i in range(32))),
        # code screen: contains '{'
        (4, "a the { " + " ".join(f"w{i:03d}" for i in range(30))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in heuristic_rules(df).collect()}
    assert out[0].keep and out[0].n_failed == 0
    assert not out[1].r_nwords and not out[1].keep
    assert not out[2].r_unique and not out[2].keep
    assert not out[3].r_stop2 and not out[3].keep
    assert not out[4].r_clean and not out[4].keep
    # n_failed counts exactly the false flags
    for r in out.values():
        flags = [r.r_nwords, r.r_wordlen, r.r_stop2, r.r_unique, r.r_clean]
        assert r.n_failed == sum(not f for f in flags)
        assert r.keep == all(flags)


def test_bpe_merge_counts_hand_computed(spark):
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_merge_counts,
    )

    # dictionary: low=2, lower=1, newest=1, widest=1  (word freq)
    df = spark.createDataFrame(
        [(0, "low low lower newest widest")], "doc_id long, text string"
    )
    out = {r.pair: (r.rnk, r.pair_count) for r in bpe_merge_counts(df).collect()}
    # 'lo' appears in low(2) + lower(1) = 3; 'ow' likewise 3;
    # 'es' and 'st' in newest + widest = 2 each; 'we' in lower+newest = 2
    assert out["lo"][1] == 3 and out["ow"][1] == 3
    assert out["es"][1] == 2 and out["st"][1] == 2 and out["we"][1] == 2
    # top pair is the lexicographically first of the count-3 ties
    assert out["lo"][0] == 1 and out["ow"][0] == 2
    # single-char words contribute nothing; ranks are dense from 1
    ranks = sorted(r for r, _ in out.values())
    assert ranks == list(range(1, len(ranks) + 1))


def test_char_stats_bounds_and_extremes(spark):
    """t14 invariants: collision_ppm in (0, 1e6]; uniq bounded by the
    alphabet; a single-char doc hits exactly 1e6 (maximal spam); a
    perfectly diverse doc hits the uniform lower bound 1e6/n; chars
    outside the alphabet don't count."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        CHAR_ALPHABET,
        char_stats,
    )

    rows = [
        (1, "aaaaaaaa"),                 # one char repeated
        (2, "abcdefgh"),                 # 8 distinct chars, uniform
        (3, "@@@###$$$"),                # nothing in alphabet
        (4, "The quick brown fox 42!"),  # mixed case + punct
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in char_stats(df).collect()}
    assert out[1].collision_ppm == 1_000_000 and out[1].uniq_chars == 1
    assert out[2].collision_ppm == 1_000_000 // 8 and out[2].uniq_chars == 8
    assert out[3].counted_chars == 0 and out[3].collision_ppm is None
    r4 = out[4]
    assert 0 < r4.collision_ppm <= 1_000_000
    assert r4.uniq_chars <= len(CHAR_ALPHABET)
    # '!' excluded, alphabetics+digits+spaces counted (lowercased)
    assert r4.counted_chars == len("the quick brown fox 42")


def test_hash_embed_properties(spark):
    """t16 invariants: identical texts → identical embeddings (the
    semantic-dedup bridge), unit L2 norm (±rounding), determinism
    across runs, and token-order invariance (bag-of-words by
    construction)."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        hash_embed,
    )

    rows = [
        (1, "alpha beta gamma delta"),
        (2, "alpha beta gamma delta"),   # exact duplicate
        (3, "delta gamma beta alpha"),   # same bag, different order
        (4, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: [r[f"d{i:02d}"] for i in range(16)] for r in hash_embed(df).collect()}
    assert out[1] == out[2] == out[3]
    assert out[1] != out[4]
    for vec in out.values():
        norm2 = sum(v * v for v in vec)
        assert abs(norm2 - 1.0) < 1e-3, norm2
    out2 = {r.doc_id: [r[f"d{i:02d}"] for i in range(16)] for r in hash_embed(df).collect()}
    assert out == out2


def test_bpe_train_planted_merge_sequence(spark):
    """Hand-computed 4-merge trainer on 'the the cat': words the(x2),
    cat(x1). Round 1 pairs (t,h):2 (h,e):2 (c,a):1 (a,t):1 -> tie at 2
    broken lexicographically -> (h,e). Round 2: (t,he):2. Round 3:
    (a,t) vs (c,a) at 1 -> (a,t). Round 4: (c,at). Exercises the
    greedy re-segmentation, the (count, l, r) tie-break, and the
    prefix-separator representation."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_train,
    )

    docs = spark.createDataFrame([("the the cat",)], "text STRING")
    rows = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges=4).orderBy("step").collect()
    ]
    assert rows == [
        (1, "h", "e", "he", 2),
        (2, "t", "he", "the", 2),
        (3, "a", "t", "at", 1),
        (4, "c", "at", "cat", 1),
    ]


def test_bpe_train_consecutive_occurrences_both_merge(spark):
    """Merge application must catch BOTH pairs in 'abab'
    ('|a|b|a|b|' -> '|ab|ab|'): a single both-delimited replace pass
    consumes the shared boundary and misses the second occurrence —
    the second pass of _bpe_apply_expr picks it up. Also pins greedy
    left-to-right on overlapping runs: 'aaa' -> [aa, a]."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_train,
    )

    docs = spark.createDataFrame([("abab abab aaa",)], "text STRING")
    # round 1: pairs (a,b):4, (b,a):2, (a,a):2 -> merge (a,b) cnt 4
    # round 2: words |ab|ab x2, |a|a|a -> pairs (ab,ab):2, (a,a):2
    #          -> tie at 2 -> lex: (a,a) < (ab,ab) -> merge (a,a)
    # round 3: |ab|ab x2, |aa|a -> (ab,ab):2, (aa,a):1 -> (ab,ab)
    rows = [
        (r.step, r.lhs, r.rhs, r.pair_count)
        for r in bpe_train(docs, n_merges=3).orderBy("step").collect()
    ]
    assert rows == [
        (1, "a", "b", 4),
        (2, "a", "a", 2),
        (3, "ab", "ab", 2),
    ]


def test_bpe_train_no_prefix_extension_false_merge(spark):
    """A prior merge's symbol that is a PROPER EXTENSION of a later
    rhs must not be fused: corpus 'bc bc bc abc ab' trains (b,c) cnt 4
    first; applying round-2's (a,b) to '|a|bc|' must NOT produce
    '|abc|' (an end-delimiter-less replace('|a|b', '|ab') would).
    With the bug, round 3 finds no pairs and raises 'ran dry'; correct
    greedy BPE still has (a,bc):1 to merge."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_train,
    )

    docs = spark.createDataFrame([("bc bc bc abc ab",)], "text STRING")
    # round 1: (b,c): 3 + 1 (inside abc) = 4, (a,b): 2 -> merge (b,c)
    # round 2: words |bc| x3, |a|bc|, |a|b| -> (a,bc):1, (a,b):1
    #          -> tie at 1 -> lex: 'b' < 'bc' -> merge (a,b)
    # round 3: |a|bc| is the only multi-symbol word -> merge (a,bc)
    rows = [
        (r.step, r.lhs, r.rhs, r.merged, r.pair_count)
        for r in bpe_train(docs, n_merges=3).orderBy("step").collect()
    ]
    assert rows == [
        (1, "b", "c", "bc", 4),
        (2, "a", "b", "ab", 1),
        (3, "a", "bc", "abc", 1),
    ]


def test_bpe_train_raises_when_corpus_runs_dry(spark):
    """Iterative-budget discipline: asking for more merges than the
    corpus can yield must RAISE, not silently return fewer rows."""
    import pytest

    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_train,
    )

    docs = spark.createDataFrame([("ab ab",)], "text STRING")
    with pytest.raises(RuntimeError, match="ran dry"):
        bpe_train(docs, n_merges=2)


def test_bpe_compression_planted_exact(spark):
    """'the the cat' trained 4 merges: every word becomes ONE symbol
    (the, the, cat), so corpus syms = 3, corpus chars = 9,
    compression_ppm = 3e6 DIV 9 = 333333; vocab = 2 distinct words."""
    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        bpe_compression,
    )

    docs = spark.createDataFrame([("the the cat",)], "text STRING")
    r = bpe_compression(docs, n_merges=4).collect()[0]
    assert (
        r.n_vocab_words,
        r.corpus_chars,
        r.corpus_syms,
        r.compression_ppm,
    ) == (2, 9, 3, 333333)


def test_heldout_bigram_eval_hand_computed(spark):
    """Planted split: train doc 'a b a c' (c1: a=2, b=1; c12: 'a b'=1,
    'b a'=1, 'a c'=1; V=2), test doc 'a b x'. Scores:
    'a b' -> 1e6*(2+2)//(1+1) = 2_000_000 (seen),
    'b x' -> 1e6*(1+2)//(0+1) = 3_000_000 (unseen transition).
    Mean = 2_500_000, n_bigrams = 2, n_unseen = 1."""
    from pyspark.sql import functions as F

    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        heldout_bigram_eval,
    )

    df = spark.createDataFrame(
        [(1, "a b a c"), (2, "a b x")], ["doc_id", "text"]
    )
    out = heldout_bigram_eval(
        df, test_pred=F.col("doc_id") == 2
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.doc_id == 2
    assert r.n_bigrams == 2
    assert r.n_unseen_bigrams == 1
    assert r.mean_heldout_ppm == 2_500_000


def test_heldout_eval_never_scores_train_docs(spark):
    """Train docs must not appear in the output, and a test doc with
    fewer than two tokens carries no bigram evidence and is excluded."""
    from pyspark.sql import functions as F

    from etl_sql_and_pyspark_developement__spark.operators.textstats import (
        heldout_bigram_eval,
    )

    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x")], ["doc_id", "text"]
    )
    out = heldout_bigram_eval(
        df, test_pred=F.col("doc_id") >= 2
    ).collect()
    assert sorted(r.doc_id for r in out) == [2]

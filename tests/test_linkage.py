"""Fellegi–Sunter record-linkage operator units (operators/linkage.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from django_indexer_spark.operators import linkage as L


def _people(spark):
    # (id, block, name, city): 1-2 same person (name+city agree),
    # 1-3 same name only, 4 alone in its block (no pairs)
    return spark.createDataFrame(
        [
            (1, "b1", "ann", "oslo"),
            (2, "b1", "ann", "oslo"),
            (3, "b1", "ann", "rome"),
            (4, "b2", "bob", "riga"),
        ],
        "id long, blk string, name string, city string",
    )


FIELDS = lambda: [  # noqa: E731 — tiny fixture factory
    (L.FieldModel("name", m=0.9, u=0.1), F.col("name_a") == F.col("name_b")),
    (L.FieldModel("city", m=0.8, u=0.05), F.col("city_a") == F.col("city_b")),
]


def test_blocked_pairs_meet_only_inside_blocks(spark):
    pairs = L.blocked_pairs(_people(spark), "id", ["blk"])
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {(1, 2), (1, 3), (2, 3)}  # id 4's block has no partner


def test_scores_are_exact_literal_sums_and_decisions_split(spark):
    pairs = L.blocked_pairs(_people(spark), "id", ["blk"])
    scored = L.fellegi_sunter_scores(pairs, FIELDS(), upper=5.0, lower=0.0)
    rows = {(r["id_a"], r["id_b"]): r for r in scored.collect()}

    from decimal import Decimal

    # the operator sums DECIMAL(18,6) literals, so the expectation must
    # be the decimal sum too — float addition of the same weights is off
    # by an ulp (3.169925 + -2.247928 == 0.9219969999999998 in IEEE)
    w_name = Decimal(str(round(math.log2(0.9 / 0.1), 6)))  # 3.169925
    w_city = Decimal(str(round(math.log2(0.8 / 0.05), 6)))  # 4.0
    d_city = Decimal(str(round(math.log2(0.2 / 0.95), 6)))  # -2.247928

    both = rows[(1, 2)]
    assert both["agree_name"] and both["agree_city"]
    assert both["score"] == float(w_name + w_city)  # decimal-exact sum
    assert both["decision"] == "match"

    name_only = rows[(1, 3)]
    assert name_only["agree_name"] and not name_only["agree_city"]
    assert name_only["score"] == float(w_name + d_city)
    assert name_only["decision"] == "possible"


def test_null_field_counts_as_disagreement_not_null(spark):
    df = spark.createDataFrame(
        [(1, "b", "ann", None), (2, "b", "ann", "oslo")],
        "id long, blk string, name string, city string",
    )
    scored = L.fellegi_sunter_scores(
        L.blocked_pairs(df, "id", ["blk"]), FIELDS(), upper=5.0, lower=0.0
    )
    r = scored.collect()[0]
    # NULL city comparison must land as agree_city=False (not NULL) so
    # the score stays total — matching the oracle's COALESCE(..., FALSE)
    assert r["agree_city"] is False
    assert r["score"] is not None and r["decision"] == "possible"


def test_field_weights_signs(spark):
    fm = L.FieldModel("x", m=0.9, u=0.2)
    assert fm.w_agree > 0 > fm.w_disagree


def test_blocked_pairs_suffix_collision_raises(spark):
    df = spark.createDataFrame(
        [(1, "b", "x", "y")], "id long, blk string, name string, name_a string"
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="suffix collision"):
        L.blocked_pairs(df, "id", ["blk"])


def test_blocked_pairs_property_matches_bruteforce(spark):
    """Property: blocked_pairs == every (a<b) pair sharing a block key,
    over a deterministic pseudo-random fixture (30 ids, 4 blocks)."""
    rows = [(i, f"b{(i * 7 + 3) % 4}", f"v{i % 5}") for i in range(30)]
    df = spark.createDataFrame(rows, "id long, blk string, val string")
    got = {(r["id_a"], r["id_b"]) for r in L.blocked_pairs(df, "id", ["blk"]).collect()}
    want = {
        (a, b)
        for a, ba, _ in rows
        for b, bb, _ in rows
        if a < b and ba == bb
    }
    assert got == want


# ---------------------------------------------------------------------------
# BPE merge training (operators/text.py:bpe_train_merges) — placed here to
# avoid re-running the big test_operators module for two small cases.
# ---------------------------------------------------------------------------


def test_bpe_train_learns_hand_computed_merges(spark):
    """'the'x3 + 'cat'x2: round 1 ties (t,h)/(h,e) at 3 → (h,e) by pair
    ASC; round 2 merges (t,he); round 3 ties (a,t)/(c,a) at 2 → (a,t)."""
    from django_indexer_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([("the the cat",), ("the cat",)], "text string")
    got = [tuple(r) for r in bpe_train_merges(df, "text", rounds=3).collect()]
    assert got == [(1, "h", "e", 3), (2, "t", "he", 3), (3, "a", "t", 2)]


def test_bpe_train_run_of_pairs_bounded_fixpoint(spark):
    """'aaaa': the merge (a,a) must apply across the run — the triple
    replace converges to aa|aa, so round 2 learns (aa,aa)."""
    from django_indexer_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame([("aaaa aaaa",)], "text string")
    got = [tuple(r) for r in bpe_train_merges(df, "text", rounds=2).collect()]
    assert got[0] == (1, "a", "a", 6)  # 3 adjacent (a,a) pairs x 2 words
    assert got[1] == (2, "aa", "aa", 2)


# ---------------------------------------------------------------------------
# Count-Min sketch (operators/sketches.py:cm_error_profile)
# ---------------------------------------------------------------------------


def test_cm_sketch_one_sided_error_and_exact_when_wide(spark):
    from django_indexer_spark.operators.sketches import cm_error_profile

    rows = [(f"u{i % 7}",) for i in range(70)]
    df = spark.createDataFrame(rows, "user string")

    # width 1: every value collides into one cell per row → estimate = N
    tight = {r["value"]: r for r in cm_error_profile(df, "user", 4, 1).collect()}
    assert all(r["cm_estimate"] == 70 for r in tight.values())
    assert all(r["overcount"] == 70 - r["exact_count"] for r in tight.values())

    # wide sketch: 7 values in 4x4096 cells → no collisions, estimate exact
    wide = {r["value"]: r for r in cm_error_profile(df, "user", 4, 4096).collect()}
    assert all(r["overcount"] == 0 for r in wide.values())
    assert all(r["cm_estimate"] == r["exact_count"] == 10 for r in wide.values())

    # the one-sided contract on a mid-size sketch
    mid = cm_error_profile(df, "user", 2, 4).collect()
    assert all(r["overcount"] >= 0 for r in mid)


def test_bpe_local_matches_declarative_first_merges(spark):
    """bpe_train_merges_local (driver-side exact loop) must learn the
    SAME first merges as the declarative gate path on a corpus with no
    >16-repeat words — identical tie-break (count DESC, pair ASC)."""
    from django_indexer_spark.operators.text import (
        bpe_train_merges,
        bpe_train_merges_local,
    )

    df = spark.createDataFrame(
        [("the the cat sat on the mat",), ("the cat and the hat",)],
        "text string",
    )
    declarative = [
        tuple(r) for r in bpe_train_merges(df, "text", rounds=3).collect()
    ]
    local = [
        tuple(r) for r in bpe_train_merges_local(df, "text", rounds=3).collect()
    ]
    assert local == declarative


def test_bpe_local_runs_many_rounds_and_stops_when_dry(spark):
    """Production-shape check (round-5 verdict #2): a large ``rounds``
    must not blow up — the corpus pass happens once, the loop is
    driver-side, and the loop STOPS when every word is fully merged."""
    from django_indexer_spark.operators.text import bpe_train_merges_local

    df = spark.createDataFrame(
        [("the quick brown fox jumps over the lazy dog",)], "text string"
    )
    got = bpe_train_merges_local(df, "text", rounds=1000).collect()
    # 8 distinct words, 35 letters → at most 35-8=27 merges... but
    # single-occurrence words still merge pair-by-pair until each word
    # is one token; just assert it terminated early and monotonic rounds
    assert 0 < len(got) < 1000
    assert [r["merge_round"] for r in got] == list(range(1, len(got) + 1))


def test_bpe_declarative_survives_checkpointed_rounds(spark):
    """rounds=20 crosses two localCheckpoint boundaries (every 8): the
    lineage cut must not change results — first 3 merges equal the
    rounds=3 run, all 20 rounds produced."""
    from django_indexer_spark.operators.text import bpe_train_merges

    df = spark.createDataFrame(
        [("the the cat sat on the mat the cat",), ("a banana bandana",)],
        "text string",
    )
    short = [tuple(r) for r in bpe_train_merges(df, "text", rounds=3).collect()]
    long = [tuple(r) for r in bpe_train_merges(df, "text", rounds=20).collect()]
    assert long[:3] == short
    # this corpus fully merges after 13 rounds — later rounds' 1-row
    # TakeOrdered frames are empty (the declarative analogue of the
    # local path's early stop), so 13 contiguous rounds come back
    assert [t[0] for t in long] == list(range(1, len(long) + 1))
    assert 8 < len(long) < 20  # crossed at least one checkpoint boundary


def test_bpe_repeat_cap_under_merge_vs_exact_local(spark):
    """The documented semantic cap (round-5 verdict #2): a word with >16
    repeats of the merged pair UNDER-merges in the declarative
    triple-replace path, while the exact driver-side list scan merges
    it fully. 40 a's: exact round 2 sees 19 (aa,aa) pairs; the
    declarative path leaves singleton a's behind after 3 passes."""
    from django_indexer_spark.operators.text import (
        bpe_train_merges,
        bpe_train_merges_local,
    )

    df = spark.createDataFrame([("a" * 40,)], "text string")
    exact = [
        tuple(r) for r in bpe_train_merges_local(df, "text", rounds=2).collect()
    ]
    assert exact[0] == (1, "a", "a", 39)
    assert exact[1] == (2, "aa", "aa", 19)  # fully merged to 20 'aa' tokens
    decl = [tuple(r) for r in bpe_train_merges(df, "text", rounds=2).collect()]
    assert decl[0] == (1, "a", "a", 39)  # pair COUNT agrees
    # ...but the rewrite under-merges: round 2's top pair differs from
    # the exact path's (leftover 'a' singletons create (aa,a)/(a,aa)
    # adjacencies). Pin the divergence so a future rewrite that FIXES
    # the cap fails here loudly and updates the docs.
    assert decl[1] != exact[1]


def test_bpe_local_warns_without_max_vocab(spark):
    """max_vocab=None collects the full distinct-word table — fine for
    tests/verification, a footgun at corpus scale — so it must warn
    (ResourceWarning), and a capped call must not."""
    import warnings

    from django_indexer_spark.operators.text import bpe_train_merges_local

    def bpe_warnings(caught):
        # match on message: pyspark itself emits unrelated ResourceWarnings
        # (unclosed sockets) under simplefilter("always")
        return [w for w in caught if "bpe_train_merges_local" in str(w.message)]

    df = spark.createDataFrame([("aa bb aa",)], "text string")
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_train_merges_local(df, "text", rounds=1)
    assert bpe_warnings(caught)
    assert all(issubclass(w.category, ResourceWarning) for w in bpe_warnings(caught))
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        bpe_train_merges_local(df, "text", rounds=1, max_vocab=10)
    assert not bpe_warnings(caught)


def test_bpe_local_max_vocab_caps_the_collect(spark):
    """The documented driver-side-collect bound: max_vocab keeps only
    the most frequent words (ties by word ASC), so rare words stop
    contributing pair counts — and the collect is hard-capped."""
    from django_indexer_spark.operators.text import bpe_train_merges_local

    df = spark.createDataFrame(
        [("zz zz zz zz aa aa rare",)], "text string"
    )
    full = [tuple(r) for r in bpe_train_merges_local(df, "text", rounds=1).collect()]
    capped = [
        tuple(r)
        for r in bpe_train_merges_local(df, "text", rounds=1, max_vocab=1).collect()
    ]
    # full corpus: (z,z) wins with wf 4; capped to top-1 word ('zz', the
    # most frequent) the answer is the same — but 'aa'/'rare' pairs are
    # gone, so a capped run can never see their counts
    assert full[0][1:3] == ("z", "z") and capped[0][1:3] == ("z", "z")
    assert full[0][3] == 4 and capped[0][3] == 4
    capped2 = [
        tuple(r)
        for r in bpe_train_merges_local(df, "text", rounds=1, max_vocab=2).collect()
    ]
    assert capped2[0][1:3] == ("z", "z")  # aa (wf 2) joins, zz still wins

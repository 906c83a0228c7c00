"""Unit tests for the training-text operators added in round 2:
repetition stats, decontamination, tf-idf, and overlapping chunking.
Edge cases the sf-gate's synthetic corpus never hits: empty text,
single-token docs, fully-contaminated corpora, sub-window documents.
"""

from __future__ import annotations

from demo_data_warehouse_spark.operators import text


def _docs(spark, rows):
    return spark.createDataFrame(rows, "id bigint, text string")


def test_repetition_stats_extremes(spark):
    df = _docs(
        spark,
        [
            (1, "a a a a"),  # fully repetitive
            (2, "a b c d"),  # fully distinct
            (3, "x"),  # single token
        ],
    )
    got = {r.id: r for r in text.repetition_stats(df, "id", "text").collect()}
    assert got[1].n_tokens == 4 and got[1].n_distinct == 1
    assert got[1].rep_micro == 750000 and got[1].top_token_micro == 1000000
    assert got[2].rep_micro == 0 and got[2].top_token_micro == 250000
    assert got[3].n_tokens == 1 and got[3].rep_micro == 0


def test_decontaminate_drops_overlap_keeps_clean(spark):
    corpus = _docs(
        spark,
        [
            (1, "the quick brown fox jumps"),  # shares 'quick brown fox'
            (2, "entirely unrelated clean document"),
            (3, "xy"),  # shorter than one shingle, never matches
        ],
    )
    evals = _docs(spark, [(100, "quick brown fox")])
    kept = sorted(r.id for r in text.decontaminate(corpus, evals, "id", "text").collect())
    assert kept == [2, 3]


def test_decontaminate_is_idempotent_and_total(spark):
    corpus = _docs(spark, [(1, "a b c d"), (2, "a b c e")])
    evals = _docs(spark, [(9, "a b c")])
    once = text.decontaminate(corpus, evals, "id", "text")
    assert once.count() == 0  # both share the eval shingle
    again = text.decontaminate(once, evals, "id", "text")
    assert again.count() == 0


def test_tfidf_values(spark):
    # 'rare' appears in 1 of 2 docs; 'common' in both (idf = ln(1) = 0).
    df = _docs(spark, [(1, "common rare"), (2, "common common")])
    got = {(r.id, r.term): r for r in text.tfidf(df, "id", "text").collect()}
    assert got[(1, "common")].tfidf_micro == 0
    # round(ln(2)*1e6) = 693147 → 693147 * 1 div 2 = 346573 (floor div)
    assert got[(1, "rare")].tfidf_micro == 346573
    assert got[(2, "common")].df == 2 and got[(2, "common")].c == 2


def test_chunk_tokens_windows(spark):
    short = " ".join(f"t{i}" for i in range(10))  # < window → 1 chunk
    exact = " ".join(f"t{i}" for i in range(32))  # == window → 1 chunk
    longer = " ".join(f"t{i}" for i in range(80))  # 3 chunks at stride 24
    df = _docs(spark, [(1, short), (2, exact), (3, longer)])
    out = text.chunk_tokens(df, "id", "text", window=32, stride=24).collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r.id, []).append(r)
    assert len(by_id[1]) == 1 and by_id[1][0].n_chunk_tokens == 10
    assert len(by_id[2]) == 1 and by_id[2][0].n_chunk_tokens == 32
    chunks = sorted(by_id[3], key=lambda r: r.chunk_id)
    assert [c.n_chunk_tokens for c in chunks] == [32, 32, 32]
    # stride-24 overlap: chunk i starts at token 24*i
    assert chunks[1].chunk_text.split(" ")[0] == "t24"
    assert chunks[2].chunk_text.split(" ")[0] == "t48"
    # consecutive chunks share window-stride = 8 tokens
    assert chunks[0].chunk_text.split(" ")[-8:] == chunks[1].chunk_text.split(" ")[:8]


def test_decontaminate_broadcasts_eval_shingles(spark):
    from demo_data_warehouse_spark.plans.checks import assert_broadcast_join

    corpus = _docs(spark, [(i, f"doc {i} text body here") for i in range(50)])
    evals = _docs(spark, [(999, "held out benchmark prompt")])
    out = text.decontaminate(corpus, evals, "id", "text")
    # the eval shingle set must broadcast — the corpus side never shuffles
    assert_broadcast_join(out, count=1)


def test_bpe_merge_steps_hand_computed(spark):
    # Sennrich-style toy corpus: 'low' x5, 'lower' x2, 'newest' x6,
    # 'widest' x3 — hand-run BPE, per-step expectations derived below
    from demo_data_warehouse_spark.operators.text import bpe_merge_steps

    docs = spark.createDataFrame(
        [(" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3),)],
        ["text"],
    )
    got = [
        (r.step, r.left_sym, r.right_sym, r.pair_count)
        for r in bpe_merge_steps(docs, "text", n_merges=3)
        .orderBy("step")
        .collect()
    ]
    # census is DISTINCT words (freq-weighted): low:5 lower:2 newest:6 widest:3
    # step 1 pair counts: (e,s)=6+3=9, (s,t)=9, (w,e)=2+6=8, (l,o)=7, (o,w)=7,
    #   (n,e)=6, (e,w)=6, (w,i)=3, (i,d)=3, (d,e)=3, (e,r)=2
    # tie (e,s)/(s,t) at 9 -> (e,s) by left asc
    assert got[0] == (1, "e", "s", 9)
    # step 2: 'es' exists; (es,t)=9 now the max
    assert got[1] == (2, "es", "t", 9)
    # step 3: after 'est' formed, (w,e) survives only in 'lower' (2);
    # (l,o)=(o,w)=7 tie -> (l,o) by left asc
    assert got[2] == (3, "l", "o", 7)


def test_fingerprint_matches_scalar_fold_law(spark):
    # equivalence law for the Arrow-batched fingerprint pass
    # (operators/text.py::fingerprint): on randomized and adversarial
    # strings, the batched Horner fold and min-shingle md5 must agree
    # row-for-row with a direct per-row Python reference of the
    # documented semantics — Horner base 31 mod 2^31-1 over codepoints
    # (empty text folds one step to 0, matching Spark split('','') ==
    # [''] / ascii('') == 0), split(' ') shingles including empty
    # tokens, NULL text stays NULL.
    import hashlib
    import random

    MOD = 2147483647

    def ref_rolling(s):
        if s is None:
            return None
        acc = 0
        for ch in s if s else "\x00":
            acc = (acc * 31 + (ord(ch) if s else 0)) % MOD
        return acc

    def ref_shingle(s):
        if s is None:
            return None
        toks = s.split(" ")
        n_sh = max(len(toks) - 2, 1)
        return min(
            hashlib.md5(" ".join(toks[j : j + 3]).encode("utf-8")).hexdigest()
            for j in range(n_sh)
        )

    rng = random.Random(13)
    alphabet = "ab xyz é世 0;"
    rows = [
        (i, "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60))))
        for i in range(200)
    ]
    rows += [
        (200, None),
        (201, ""),
        (202, "a"),
        (203, "a b"),
        (204, "a b c"),
        (205, "a  b   c"),  # empty tokens from space runs
        (206, " leading and trailing "),
        (207, "世界 été tokens"),  # non-ASCII codepoints
    ]
    df = spark.createDataFrame(rows, "id bigint, text string")
    got = {
        r["id"]: (r["rolling_hash"], r["min_shingle_md5"])
        for r in text.fingerprint(df, "id", "text").collect()
    }
    assert len(got) == len(rows)
    for i, s in rows:
        assert got[i] == (ref_rolling(s), ref_shingle(s)), (i, s)

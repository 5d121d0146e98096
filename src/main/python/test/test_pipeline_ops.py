# -*- coding: utf-8 -*-
"""e2e tests for the PySpark pipeline-operator bindings (graft.pipeline).

Each test drives a real Spark job through py4j into the Scala operators;
assertions replay the expected math in plain Python.
"""

import pytest

from graft import pipeline as P


@pytest.fixture(scope="module")
def docs(local_spark):
    return local_spark.createDataFrame(
        [(0, "the quick brown fox jumps over the lazy dog"),
         (1, "the quick brown fox jumps over the lazy cat"),
         (2, "completely different text with other words entirely present"),
         (3, "the quick brown fox jumps over the lazy dog"),
         (4, "short one")],
        ["doc_id", "text"])


@pytest.fixture(scope="module")
def vecs(local_spark):
    return local_spark.createDataFrame(
        [(0, [1.0, 0.1, 0.0]),
         (1, [0.99, 0.12, 0.01]),
         (2, [-0.5, 0.9, 0.0]),
         (3, [0.0, 0.0, 1.0])],
        ["vec_id", "embedding"])


class TestDedup(object):

    def test_exact_canon(self, docs):
        got = {r["doc_id"]: r["canon_id"] for r in P.exact_canon(docs).collect()}
        assert got == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4}

    def test_minhash_equals_jaccard(self, docs):
        jac = sorted(tuple(r) for r in P.jaccard_pairs(docs, tau=0.5).collect())
        mh = sorted(tuple(r) for r in P.minhash_pairs(docs, tau=0.5).collect())
        assert mh == jac
        assert (0, 3, 1.0) in [(a, b, j) for a, b, j in jac]

    def test_cluster_pairs(self, docs):
        pairs = P.jaccard_pairs(docs, tau=0.5)
        got = {r["doc_id"]: r["cluster_id"] for r in P.cluster_pairs(pairs).collect()}
        assert got == {0: 0, 1: 0, 3: 0}  # 0-1-3 one near-dup component

    def test_embedding_pairs(self, vecs):
        got = [(r["doc_i"], r["doc_j"]) for r in
               P.embedding_pairs(vecs, tau=0.99).collect()]
        assert got == [(0, 1)]


class TestSimilarity(object):

    def test_cosine_top_k(self, vecs):
        rows = P.cosine_top_k(vecs.where("vec_id = 0"), vecs, k=2).collect()
        ranked = [r["cid"] for r in sorted(rows, key=lambda r: r["rnk"])]
        assert ranked == [1, 3]  # 1 near-parallel; 3 orthogonal beats 2 (negative)

    def test_ivf_trained_centroids(self, vecs):
        cents = P.train_centroids(vecs, nlist=2, iters=2)
        assert cents.count() == 2
        exact = {(r["qid"], r["cid"]) for r in
                 P.cosine_top_k(vecs.where("vec_id = 0"), vecs, k=2).collect()}
        full = {(r["qid"], r["cid"]) for r in
                P.ivf_top_k_with(vecs.where("vec_id = 0"), vecs, cents,
                                 k=2, nprobe=2).collect()}
        assert full == exact  # nprobe = nlist probes every cell


class TestText(object):

    def test_text_profile(self, docs):
        row = {r["doc_id"]: r for r in P.text_profile(docs).collect()}
        assert row[0]["n_tokens"] == 9
        assert row[0]["bpe_tokens"] == 9  # all plain words
        assert row[4]["n_tokens"] == 2
        assert row[0]["fingerprint"] == row[3]["fingerprint"]
        assert row[0]["fingerprint"] != row[1]["fingerprint"]

    def test_text_profile_unicode(self, local_spark):
        # tab / NBSP / ideographic-space delimited text: the default
        # single-space tokenizer sees ONE token, the unicode opt-in four
        docs = local_spark.createDataFrame(
            [(0, u"alpha\tbeta gamma　delta")], ["doc_id", "text"])
        legacy = P.text_profile(docs).collect()[0]
        unicode_ = P.text_profile(docs, unicode_tokens=True).collect()[0]
        assert legacy["n_tokens"] == 1
        assert unicode_["n_tokens"] == 4
        assert unicode_["avg_token_len"] == 4.75  # (5+4+5+5)/4


class TestStreamingUnified(object):

    def test_curate(self, docs):
        # docs 0/1/3 are stopword-rich English; 3 duplicates 0 (dropped by
        # canonical-only dedup); 2 has no stopwords -> langId 'und'; 4 is
        # under min_tokens. Survivors: the canonical English rows 0 and 1.
        got = P.curate(docs, min_tokens=5, min_distinct_ratio=0.3)
        assert sorted(r["doc_id"] for r in got.collect()) == [0, 1]
        row = {r["doc_id"]: r for r in got.collect()}[0]
        assert row["lang_pred"] == "en" and row["n_tokens"] == 9

    def test_asof_join(self, local_spark):
        left = local_spark.createDataFrame(
            [(1, 10, "a"), (1, 5, "b"), (2, 7, "c")], ["k", "lts", "pay"])
        right = local_spark.createDataFrame(
            [(1, 8, 80), (1, 3, 30), (2, 9, 90)], ["k", "rts", "v"])
        got = {(r["k"], r["lts"], r["v"])
               for r in P.asof_join(left, right, keys="k",
                                    left_ts="lts", right_ts="rts").collect()}
        # k=2's only right row is later than its left row -> inner drop
        assert got == {(1, 10, 80), (1, 5, 30)}
        # left outer keeps it with null right columns
        left_got = {(r["k"], r["lts"], r["v"])
                    for r in P.asof_join(left, right, keys="k", left_ts="lts",
                                         right_ts="rts",
                                         join_type="left").collect()}
        assert left_got == {(1, 10, 80), (1, 5, 30), (2, 7, None)}
        # forward: smallest right_ts at-or-after; nearest: closer side
        fwd = {(r["k"], r["lts"], r["v"])
               for r in P.asof_join(left, right, keys="k", left_ts="lts",
                                    right_ts="rts",
                                    direction="forward").collect()}
        assert fwd == {(1, 5, 80), (2, 7, 90)}
        near = {(r["k"], r["lts"], r["v"])
                for r in P.asof_join(left, right, keys="k", left_ts="lts",
                                     right_ts="rts",
                                     direction="nearest").collect()}
        assert near == {(1, 10, 80), (1, 5, 30), (2, 7, 90)}

    def test_tfidf_top_m(self, local_spark):
        docs = local_spark.createDataFrame(
            [(0, "apple apple banana the"), (1, "banana the"), (2, "the")],
            ["doc_id", "text"])
        got = {(r["doc_id"], r["rnk"]): (r["token"], r["tfidf_r6"])
               for r in P.tfidf_top_m(docs, m=2).collect()}
        # 'the' is in every doc -> idf 0; 'apple' only in doc 0 (tf=2)
        import math
        assert got[(0, 1)] == ("apple", round(2 * math.log(3.0), 6))
        assert got[(0, 2)] == ("banana", round(math.log(3.0 / 2.0), 6))
        # doc 2 has only the zero-idf token
        assert got[(2, 1)] == ("the", 0.0)

    def test_substring_pairs(self, local_spark):
        quote = " ".join(f"q{i}" for i in range(30))
        host = " ".join(f"h{i}" for i in range(120)) + " " + quote
        df = local_spark.createDataFrame(
            [(1, quote), (2, host)], ["doc_id", "text"])
        got = [(r["doc_i"], r["doc_j"], r["span_len"]) for r in
               P.substring_pairs(df, min_span=20, k=8).collect()]
        assert got == [(1, 2, 30)]

    def test_winnowed_substring_pairs(self, local_spark):
        quote = " ".join(f"q{i}" for i in range(30))
        host = " ".join(f"h{i}" for i in range(120)) + " " + quote
        df = local_spark.createDataFrame(
            [(1, quote), (2, host)], ["doc_id", "text"])
        got = [(r["doc_i"], r["doc_j"], r["span_lb"]) for r in
               P.winnowed_substring_pairs(df, min_span_lb=18, k=8, w=4).collect()]
        # span_lb lower-bounds the true 30, tight to 2*(w-1) = 6
        assert len(got) == 1 and got[0][:2] == (1, 2)
        assert 24 <= got[0][2] <= 30

    def test_pack_sequences(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "a b c"), (2, "d e"), (3, "f g h i")], ["doc_id", "text"])
        got = {r["doc_id"]: (r["n_tokens"], r["bin_id"], r["bin_offset"])
               for r in P.pack_sequences(df, budget=4).collect()}
        # starts 0, 3, 5 -> bins 0, 0, 1; offsets 0, 3, 1
        assert got == {1: (3, 0, 0), 2: (2, 0, 3), 3: (4, 1, 1)}

    def test_redact_and_chunks(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "mail a@b.co ip 10.0.0.1 card 4111 1111 1111 1111 end")],
            ["doc_id", "text"])
        red = P.redact_pii(df).collect()[0]["redacted"]
        assert red == "mail <EMAIL> ip <IP> card <NUM> end"
        ch = {(r["chunk_index"], r["chunk"], r["n_tokens"]) for r in
              P.token_chunks(df, chunk=4, overlap=1).collect()}
        assert (0, "mail a@b.co ip 10.0.0.1", 4) in ch
        assert len(ch) == 3

    def test_containment_and_vocabulary(self, docs):
        # doc 3 duplicates doc 0 byte-for-byte -> containment 1.0
        pairs = {(r["doc_i"], r["doc_j"]) for r in
                 P.containment_pairs(docs, tau=0.9).collect()}
        assert (0, 3) in pairs
        vocab = {r["token"]: (r["doc_freq"], r["total_freq"])
                 for r in P.vocabulary(docs).collect()}
        assert vocab["the"][0] >= 2  # stopword spans multiple docs

    def test_asof_join_bucketed(self, local_spark):
        left = local_spark.createDataFrame(
            [(1, 10, "a"), (1, 5, "b"), (2, 7, "c")], ["k", "lts", "pay"])
        right = local_spark.createDataFrame(
            [(1, 8, 80), (1, 3, 30), (2, 9, 90)], ["k", "rts", "v"])
        plain = {(r["k"], r["lts"], r["v"]) for r in
                 P.asof_join(left, right, keys="k",
                             left_ts="lts", right_ts="rts").collect()}
        bucketed = {(r["k"], r["lts"], r["v"]) for r in
                    P.asof_join_bucketed(left, right, keys="k", left_ts="lts",
                                         right_ts="rts", bucket_width=4.0).collect()}
        assert bucketed == plain == {(1, 10, 80), (1, 5, 30)}

    def test_range_join(self, local_spark):
        pts = local_spark.createDataFrame(
            [(1, 5.0), (2, 10.0), (3, 42.0)], ["pid", "v"])
        ivs = local_spark.createDataFrame(
            [("a", 5.0, 10.0), ("b", 40.0, 41.0)], ["iid", "lo", "hi"])
        got = {(r["pid"], r["iid"]) for r in
               P.range_join(pts, ivs, point_col="v").collect()}
        assert got == {(1, "a"), (2, "a")}  # inclusive both ends; 42 > 41
        left = {(r["pid"], r["iid"]) for r in
                P.range_join(pts, ivs, point_col="v",
                             join_type="left").collect()}
        assert left == {(1, "a"), (2, "a"), (3, None)}  # miss kept

    def test_first_per_content(self, docs, local_spark):
        from pyspark.sql import functions as F
        stamped = docs.withColumn("ts", F.col("doc_id").cast("long"))
        got = sorted(r["doc_id"] for r in P.first_per_content(stamped).collect())
        assert got == [0, 1, 2, 4]  # doc 3 is a byte-duplicate of 0

    def test_interval_join(self, local_spark):
        clicks = local_spark.createDataFrame(
            [(1, "u1", "2024-01-01 10:00:00"), (2, "u2", "2024-01-01 10:00:00")],
            ["click_id", "user_id", "t"]).selectExpr(
                "click_id", "user_id", "timestamp(t) as ts")
        buys = local_spark.createDataFrame(
            [(101, "u1", "2024-01-01 10:20:00"), (102, "u2", "2024-01-01 11:20:00")],
            ["buy_id", "user_id", "bt"]).selectExpr(
                "buy_id", "user_id", "timestamp(bt) as b_ts")
        got = {(r["click_id"], r["buy_id"]) for r in P.interval_join(
            clicks, buys, "user_id", "ts", "b_ts", upper="30 minutes").collect()}
        assert got == {(1, 101)}  # buy 102 is 80 minutes out

    def test_minhash_pairs_across(self, local_spark):
        base = " ".join(f"w{i}" for i in range(50))
        new = local_spark.createDataFrame(
            [(1, base + " fresh"), (2, " ".join(f"u{i}" for i in range(40)))],
            ["doc_id", "text"])
        old = local_spark.createDataFrame([(10, base)], ["doc_id", "text"])
        got = [(r["doc_i"], r["doc_j"]) for r in
               P.minhash_pairs_across(new, old).collect()]
        assert got == [(1, 10)]

    def test_decontaminate(self, local_spark):
        quote = " ".join(f"q{i}" for i in range(20))
        corpus = local_spark.createDataFrame(
            [(1, " ".join(f"h{i}" for i in range(50)) + " " + quote),
             (2, " ".join(f"u{i}" for i in range(30)))],
            ["doc_id", "text"])
        bench = local_spark.createDataFrame([(quote,)], ["text"])
        got = [(r["doc"], r["hits"], r["max_span"]) for r in
               P.decontaminate(corpus, bench, k=8).collect()]
        assert got == [(1, 13, 20)]  # 20-8+1 window hits, exact span

    def test_decontaminate_bloom_matches_exact(self, local_spark):
        quote = " ".join("q%d" % i for i in range(20))
        corpus = local_spark.createDataFrame(
            [(1, " ".join("h%d" % i for i in range(50)) + " " + quote),
             (2, " ".join("u%d" % i for i in range(30)))],
            ["doc_id", "text"])
        bench = local_spark.createDataFrame([(quote,)], ["text"])
        got = sorted(r["doc"] for r in P.decontaminate_bloom(
            corpus, bench, k=8, expected_items=16, fpp=0.4).collect())
        assert got == [1]

    def test_decontam_overlap(self, local_spark):
        corpus = local_spark.createDataFrame(
            [(1, "a b c x y"), (2, "p q r s t")], ["doc_id", "text"])
        bench = local_spark.createDataFrame([("a b c",)], ["text"])
        got = {r["doc"]: (r["n_grams"], r["n_hit"], r["frac"], r["contaminated"])
               for r in P.decontam_overlap(corpus, bench, n=2, theta=0.5).collect()}
        assert got == {1: (4, 2, 0.5, True), 2: (4, 0, 0.0, False)}

    def test_segment_dedup(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "a b c d e f g h"), (2, "e f g h x y z w")],
            ["doc_id", "text"])
        got = {r["doc"]: (r["text_clean"], r["n_kept"], r["n_dropped"])
               for r in P.segment_dedup(df, seg=4).collect()}
        assert got == {1: ("a b c d e f g h", 2, 0),
                       2: ("x y z w", 1, 1)}

    def test_semantic_dedup(self, vecs):
        # k=1: one cell; only the (0, 1) near-parallel pair clears 0.99,
        # flagging the larger id
        got = {r["doc"]: r["is_dup"]
               for r in P.semantic_dedup(vecs, k=1, tau=0.99).collect()}
        assert got == {0: False, 1: True, 2: False, 3: False}

    def test_link_blocked_pairs(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "red widget"), (2, "red widgets"), (3, "blue widget")],
            ["id", "name"])
        got = [(r["id_i"], r["id_j"], r["dist"]) for r in P.link_blocked_pairs(
            df, "id", "name", "split(name, ' ')[0]", max_dist=2).collect()]
        assert got == [(1, 2, 1)]  # cross-block (1,3) never pairs

    def test_group_approx_quantiles(self, local_spark):
        rows = [("a", v) for v in range(1, 101)]
        df = local_spark.createDataFrame(rows, ["g", "v"])
        r = P.group_approx_quantiles(df, group_cols="g", value_col="v",
                                     qs=[50, 90], accuracy=10000).collect()[0]
        assert r["n"] == 100
        assert abs(r["ap50"] - 50) <= 1 and abs(r["ap90"] - 90) <= 1

    def test_exact_canon_by(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "same", 0.2), (2, "same", 0.9), (3, "other", 0.1)],
            ["doc_id", "text", "q"])
        got = {r["doc_id"]: r["canon_id"]
               for r in P.exact_canon_by(df).collect()}
        assert got == {1: 2, 2: 2, 3: 3}  # best-scored copy wins

    def test_multimodal_codec_selection(self, local_spark):
        rows = [(1, bytearray([3, 50, 60, 7]))]  # stub header: kind image
        df = local_spark.createDataFrame(rows, ["asset_id", "content"])
        stub = P.with_decoded_meta(df).select("meta.kind").collect()[0][0]
        assert stub == "image"
        # the REAL codec refuses to call 4 garbage bytes an image
        real = P.with_decoded_meta(df, codec="imageio") \
            .select("meta.kind").collect()[0][0]
        assert real == "unknown"
        with pytest.raises(Exception):
            P.with_decoded_meta(df, codec="bogus").collect()

    def test_unigram_tokenizer(self, local_spark):
        corpus = local_spark.createDataFrame(
            [(1, "ababab ababab cdcd"), (2, "ababab cdcd cdcd")],
            ["doc_id", "text"])
        pieces = P.unigram_train(corpus, vocab_size=8, max_piece_len=4)
        assert pieces.count() > 0
        counts = {r["doc_id"]: r["n_unigram"] for r in
                  P.unigram_token_count(corpus, pieces).collect()}
        assert all(v > 0 for v in counts.values())
        words = local_spark.createDataFrame([("ababab",)], ["word"])
        r = P.unigram_word_scores(words, pieces).collect()[0]
        assert r["n_pieces"] >= 1 and r["score_micro"] < 0
        # one Viterbi-EM round: refined frame serves the same words,
        # vocabulary never grows, and the refinement is deterministic
        refined = P.unigram_em_refine(corpus, pieces)
        assert 0 < refined.count() <= pieces.count()
        r2 = P.unigram_word_scores(words, refined).collect()[0]
        assert r2["n_pieces"] >= 1 and r2["score_micro"] < 0
        again = P.unigram_em_refine(corpus, pieces)
        assert sorted(map(tuple, refined.collect())) == \
            sorted(map(tuple, again.collect()))
        # multi-round EM with trajectory: (kind, idx, piece, value)
        # artifact rows; LL monotone non-decreasing, seed score first
        art = P.unigram_em_train(corpus, pieces, rounds=2).collect()
        ll = [r["value"] for r in sorted(
            (x for x in art if x["kind"] == "ll"), key=lambda x: x["idx"])]
        assert len(ll) == 3 and all(b >= a for a, b in zip(ll, ll[1:]))
        assert all(ll_i < 0 for ll_i in ll)
        meta = {r["piece"]: r["value"] for r in art if r["kind"] == "meta"}
        assert meta["max_piece_len"] == 4
        # the embedded refined model equals composed em_refine rounds
        twice = P.unigram_em_refine(corpus, P.unigram_em_refine(corpus, pieces))
        got = sorted((r["piece"], r["value"]) for r in art if r["kind"] == "piece")
        want = sorted((r["piece"], r["lp_micro"]) for r in twice.collect())
        assert got == want

    def test_drift_summary(self, local_spark):
        a = local_spark.createDataFrame([(1, "p p p")], ["doc_id", "text"])
        b = local_spark.createDataFrame([(1, "q z w")], ["doc_id", "text"])
        same = P.drift_summary(a, a).collect()[0]
        assert same["kl_ab_micro"] == 0 and same["tvd_r6"] == 0.0
        moved = P.drift_summary(a, b).collect()[0]
        assert moved["kl_ab_micro"] > 0 and moved["tvd_r6"] > 0.0

    def test_zorder_by(self, local_spark):
        rows = [(x, y) for x in range(16) for y in range(16)]
        df = local_spark.createDataFrame(rows, ["x", "y"])
        out = P.zorder_by(df, ["x", "y"], partitions=4, bits=4)
        got = sorted((r["x"], r["y"]) for r in out.collect())
        assert got == sorted(rows)  # layout-only: row multiset preserved

    def test_minhash_index_roundtrip(self, local_spark, tmp_path):
        base = " ".join("w%d" % i for i in range(40))
        old = local_spark.createDataFrame([(10, base)], ["doc_id", "text"])
        new = local_spark.createDataFrame(
            [(1, base + " fresh"), (2, " ".join("u%d" % i for i in range(30)))],
            ["doc_id", "text"])
        path = str(tmp_path / "mhidx")
        P.save_minhash_index(P.build_minhash_index(old), path)
        got = [(r["doc_i"], r["doc_j"]) for r in P.minhash_pairs_vs_index(
            new, P.load_minhash_index(new, path), tau=0.5).collect()]
        assert got == [(1, 10)]

    def test_temperature_sample(self, local_spark):
        rows = [("a%d" % i, "small") for i in range(20)] + \
               [("b%d" % i, "big") for i in range(2000)]
        df = local_spark.createDataFrame(rows, ["key", "stratum"])
        got = P.temperature_sample(df, "key", "stratum", alpha=0.5).collect()
        small = sum(1 for r in got if r["stratum"] == "small")
        big = sum(1 for r in got if r["stratum"] == "big")
        assert small == 20  # binding stratum kept whole
        assert 100 <= big <= 300  # sqrt share: ~200 of 2000

    def test_importance_weights(self, local_spark):
        target = local_spark.createDataFrame(
            [("alpha beta gamma",)], ["text"])
        raw = local_spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "x y z w")], ["doc_id", "text"])
        got = {r["doc"]: r["logratio_micro"]
               for r in P.importance_weights(raw, target).collect()}
        assert got[1] > got[2]  # target-like doc scores higher

    def test_repetition_profile(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "a b a b a b"), (2, "t0 t1 t2 t3 t4 t5 t6 t7")],
            ["doc_id", "text"])
        got = {r["doc"]: (r["n_tokens"], r["top_frac"], r["dup_frac"])
               for r in P.repetition_profile(df).collect()}
        assert got[1] == (6, 0.6, 0.0)
        assert got[2] == (8, 0.142857, 0.0)

    def test_quota_and_hash_sample(self, local_spark):
        df = local_spark.createDataFrame(
            [("s1", i, i % 5) for i in range(1, 21)],
            ["source", "doc_id", "score"])
        top = [(r["rank"], r["doc_id"], r["score"]) for r in
               P.quota_top_k(df, "source", "score", k=3).collect()]
        assert sorted(top) == [(1, 4, 4), (2, 9, 4), (3, 14, 4)]
        from pyspark.sql import functions as F
        keyed = df.withColumn("key", F.col("doc_id").cast("string"))
        kept = P.hash_sample(keyed, "key", "source", {"s1": "8000"})
        n = kept.count()
        assert 0 < n < 20
        assert kept.count() == n  # deterministic re-run


class TestModelAndProfile(object):

    def test_pq_top_k_structural_exact(self, vecs):
        exact = {(r["qid"], r["cid"], r["rnk"])
                 for r in P.cosine_top_k(vecs, vecs, k=2).collect()}
        pq = {(r["qid"], r["cid"], r["rnk"])
              for r in P.pq_top_k(vecs, vecs, k=2, m=3, ksub=2,
                                  iters=1, shortlist=0).collect()}
        assert pq == exact  # unbounded shortlist == brute force

    def test_train_quality_score(self, local_spark):
        rows = [(i, "the quick and of is brown fox dog cat", 1.0)
                for i in range(10)]
        rows += [(100 + i, "zz zz zz zz zz zz zz zz", 0.0)
                 for i in range(10)]
        df = local_spark.createDataFrame(rows, ["doc_id", "text", "label"])
        got = P.train_quality_score(df, iters=30, lr=2.0).collect()
        scores = {r["doc_id"]: r["q_score"] for r in got}
        assert all(0.0 <= s <= 1.0 for s in scores.values())
        # the stopword-rich positives outscore the degenerate negatives
        assert min(scores[i] for i in range(10)) > \
            max(scores[100 + i] for i in range(10))

    def test_corpus_profile(self, local_spark):
        texts = ["the " * n for n in (1, 2, 3, 4, 5)] + ["xyz"]
        df = local_spark.createDataFrame(
            [(i, t.strip()) for i, t in enumerate(texts)], ["doc_id", "text"])
        got = {r["lang_pred"]: r for r in P.corpus_profile(df).collect()}
        en = got["en"]
        assert (en["n_docs"], en["total_tokens"], en["max_tokens"]) == (5, 15, 5)
        assert (en["p50_tokens"], en["p90_tokens"]) == (3, 5)
        assert got["und"]["n_docs"] == 1

    def test_bigram_lm_score(self, local_spark):
        import math
        # train corpus "a b","a b","a c": P(b|a)=3/7, P(c|a)=2/7 (V=4)
        df = local_spark.createDataFrame(
            [(1, "a b"), (2, "a b"), (3, "a c")], ["doc_id", "text"])
        got = {r["doc_id"]: (r["n_bigrams"], r["bi_logp_r6"])
               for r in P.bigram_lm_score(df).collect()}
        assert got[1] == (1, round(math.log(3.0 / 7.0) * 1e6) / 1e6)
        assert got[3] == (1, round(math.log(2.0 / 7.0) * 1e6) / 1e6)

    def test_sliding_windows(self, local_spark):
        df = local_spark.createDataFrame(
            [("2024-01-01 10:05:00", "click", 2.0)], ["t", "event_type", "value"]
        ).selectExpr("timestamp(t) as ts", "event_type", "value")
        got = P.sliding_windows(df).collect()
        # one event, 1h/15m windows -> exactly 4 overlapping windows
        assert len(got) == 4
        assert all(r["cnt"] == 1 and r["sum_value"] == 2.0 for r in got)

    def test_normalize_text(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "Hello,  World!"), (2, "hello world")], ["id", "text"])
        got = {r["id"]: r["text_norm"]
               for r in P.normalize_text(df).collect()}
        assert got == {1: "hello world", 2: "hello world"}

    def test_group_quantiles(self, local_spark):
        rows = [("a", v) for v in range(1, 11)] + [("b", 7)] * 4
        df = local_spark.createDataFrame(rows, ["g", "v"])
        got = {r["g"]: r for r in P.group_quantiles(
            df, group_cols="g", value_col="v", qs=[50, 90]).collect()}
        a = got["a"]
        assert (a["n"], a["min_v"], a["max_v"], a["p50"], a["p90"]) == (10, 1, 10, 5, 9)
        assert (got["b"]["n"], got["b"]["p50"]) == (4, 7)

    def test_split_by_hash(self, local_spark):
        rows = [(f"doc {i}",) for i in range(300)]
        df = local_spark.createDataFrame(rows, ["key"])
        got = P.split_by_hash(
            df, "key", [("train", 0.8), ("val", 0.1), ("test", 0.1)]).collect()
        assert len(got) == 300  # a partition: nothing dropped
        counts = {}
        for r in got:
            counts[r["split"]] = counts.get(r["split"], 0) + 1
        assert set(counts) == {"train", "val", "test"}
        assert counts["train"] > counts["val"]
        # pure function of content: same key -> same split on a re-run
        again = {r["key"]: r["split"] for r in P.split_by_hash(
            df, "key", [("train", 0.8), ("val", 0.1), ("test", 0.1)]).collect()}
        assert all(again[r["key"]] == r["split"] for r in got)

    def test_group_split_no_straddle(self, local_spark):
        docs = local_spark.createDataFrame(
            [(i, "d%d" % i) for i in range(50)], ["doc_id", "text"])
        pairs = local_spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], ["doc_i", "doc_j"])
        got = {r["doc_id"]: r["split"] for r in P.group_split(
            docs, pairs, splits=[("train", 0.5), ("test", 0.5)]).collect()}
        assert len(got) == 50  # a partition: nothing dropped
        # transitive closure shares one label
        assert got[1] == got[2] == got[3]
        assert got[10] == got[11]

    def test_hot_phrases(self, local_spark):
        docs = local_spark.createDataFrame(
            [("A", "a b c tail"), ("A", "pre a b c"), ("A", "a b c a b c"),
             ("A", "x y z pad"), ("A", "x y z"), ("B", "q r s")],
            ["source", "text"])
        got = [(r["source"], r["rank"], r["phrase"], r["df"])
               for r in P.hot_phrases(docs, n=3, k=2, min_df=2).collect()]
        # df semantics: the doc repeating "a b c" counts once (df=3)
        assert sorted(got) == [("A", 1, "a b c", 3), ("A", 2, "x y z", 2)]

    def test_bm25_top_k(self, local_spark):
        corpus = local_spark.createDataFrame(
            [(1, "x x y"), (2, "x z"), (3, "y z z")], ["doc_id", "text"])
        queries = local_spark.createDataFrame(
            [(10, "x y x"), (20, "z")], ["qid", "qtext"])
        got = [(r["qid"], r["doc_id"], r["rnk"])
               for r in P.bm25_top_k(queries, corpus, k=2).collect()]
        # q1 {x,y}: d1 holds both terms -> rank 1; q2 {z}: d3 has tf=2
        assert sorted(got) == [(10, 1, 1), (10, 2, 2), (20, 2, 2), (20, 3, 1)]

    def test_mixture_sample(self, local_spark):
        rows = [(f"a{i}", "a") for i in range(100)]
        rows += [(f"b{i}", "b") for i in range(4000)]
        df = local_spark.createDataFrame(rows, ["key", "stratum"])
        got = P.mixture_sample(df, "key", "stratum", {"a": 1, "b": 1})
        from pyspark.sql import functions as F
        counts = {r["stratum"]: r["n"] for r in
                  got.groupBy("stratum").agg(F.count("*").alias("n")).collect()}
        assert counts["a"] == 100  # binding stratum kept whole
        assert 60 <= counts["b"] <= 140  # ~100 of 4000 at the derived rate


class TestModelStore(object):
    """Persistence round-trips: serve-with-reloaded-state must equal
    serve-with-fresh-state."""

    def test_centroid_artifact_round_trip(self, vecs, tmp_path):
        path = str(tmp_path / "ivf")
        cents = P.train_and_save_centroids(vecs, path, nlist=2, iters=2)
        reloaded = P.load_centroids(vecs, path)
        assert (sorted(tuple(r) for r in reloaded.collect())
                == sorted(tuple(r) for r in cents.collect()))
        q = vecs.where("vec_id = 0")
        fresh = sorted(tuple(r) for r in P.ivf_top_k_with(
            q, vecs, cents, k=2, nprobe=2).collect())
        served = sorted(tuple(r) for r in P.ivf_top_k_with(
            q, vecs, reloaded, k=2, nprobe=2).collect())
        assert served == fresh

    def test_pq_artifact_round_trip(self, vecs, tmp_path):
        path = str(tmp_path / "pq")
        P.train_and_save_pq(vecs, path, m=3, ksub=2, iters=2)
        q = vecs.where("vec_id = 0")
        fresh = sorted(tuple(r) for r in P.pq_top_k(
            q, vecs, k=2, m=3, ksub=2, iters=2).collect())
        served = sorted(tuple(r) for r in P.pq_top_k_from_artifact(
            q, vecs, path, k=2).collect())
        assert served == fresh

    def test_bigram_lm_artifact_round_trip(self, docs, tmp_path):
        path = str(tmp_path / "lm")
        P.train_and_save_bigram_lm(docs, path, min_count=2)
        fresh = sorted(tuple(r) for r in P.bigram_lm_score(
            docs, min_count=2).collect())
        served = sorted(tuple(r) for r in
                        P.bigram_lm_score_from_artifact(docs, path).collect())
        assert served == fresh

    def test_quality_model_artifact_round_trip(self, docs, local_spark, tmp_path):
        path = str(tmp_path / "logit")
        labeled = docs.selectExpr("doc_id", "text",
                                  "cast(doc_id % 2 as int) as y")
        P.train_and_save_quality_model(labeled, path, iters=3, lr=0.5)
        scored = {r["doc_id"]: r["q_score"] for r in
                  P.quality_score_from_artifact(docs, path).collect()}
        assert set(scored) == {0, 1, 2, 3, 4}
        assert all(0.0 <= s <= 1.0 for s in scored.values())
        # identical texts score identically under the reloaded model
        assert scored[0] == scored[3]


class TestBpe(object):

    def test_train_segment_and_pack(self, docs, local_spark):
        merges = P.bpe_train(docs, rounds=3)
        rows = sorted(tuple(r) for r in merges.collect())
        assert len(rows) == 3
        # lossless segmentation: subwords reassemble each word
        seg = P.bpe_segment(docs, merges).collect()
        texts = {r["doc_id"]: r["text"] for r in docs.collect()}
        for r in seg:
            assert "".join(r["subwords"]) == texts[r["doc_id"]].replace(" ", "")
        # counts consistent with segmentation lengths
        counts = {r["doc_id"]: r["n_bpe"] for r in
                  P.bpe_counts(docs, merges).collect()}
        for r in seg:
            assert counts[r["doc_id"]] == len(r["subwords"])
        # packing bills subword counts: offsets are the exact cumsum
        packed = sorted(P.pack_sequences_bpe(docs, merges, budget=10).collect(),
                        key=lambda r: r["doc_id"])
        start = 0
        for r in packed:
            assert (r["bin_id"], r["bin_offset"]) == (start // 10, start % 10)
            start += r["n_tokens"]


class TestCorpusSketch(object):

    def test_sketch_exact_at_small_cardinality(self, docs):
        docs2 = docs.selectExpr("doc_id", "text",
                                "concat('s', cast(doc_id % 2 as string)) as source")
        rows = {r["source"]: r for r in P.corpus_sketch(docs2).collect()}
        assert rows["s0"]["n_docs"] == 3 and rows["s1"]["n_docs"] == 2
        # sparse-mode HLL is exact here: s0 holds docs 0/2/4 (0 and 4
        # distinct, 2 distinct) -> 3 distinct texts... doc 0 == doc 3 but
        # they are in different strata, so s0 has 3 distinct contents
        assert rows["s0"]["approx_distinct_content"] == 3
        assert rows["s1"]["approx_distinct_content"] == 2


class TestRound7c(object):

    def test_jaccard_prefix_equals_exact(self, docs):
        exact = sorted(tuple(r) for r in P.jaccard_pairs(docs, tau=0.5).collect())
        pref = sorted(tuple(r) for r in
                      P.jaccard_pairs_prefix(docs, tau=0.5).collect())
        assert pref == exact and len(pref) > 0

    def test_phrase_hits(self, docs):
        rows = {(r["doc"], r["phrase"]): (r["hits"], r["first_pos"])
                for r in P.phrase_hits(docs, ["quick brown fox", "lazy dog"]).collect()}
        assert rows[(0, "quick brown fox")] == (1, 1)
        assert rows[(0, "lazy dog")] == (1, 7)
        assert (2, "quick brown fox") not in rows

    def test_snapshot_diff(self, docs, local_spark):
        new = local_spark.createDataFrame(
            [(0, "the quick brown fox jumps over the lazy dog"),
             (1, "edited text"), (5, "brand new")],
            ["doc_id", "text"])
        st = {r["id"]: r["status"]
              for r in P.snapshot_diff(docs, new).collect()}
        assert st[1] == "changed" and st[5] == "added" and st[2] == "removed"
        assert 0 not in st
        summary = {r["status"]: r["n"]
                   for r in P.snapshot_diff_summary(docs, new).collect()}
        assert summary["removed"] == 3 and summary["added"] == 1

    def test_cms_never_undercounts(self, docs, local_spark):
        sk = P.cms_build(docs, depth=3, width=4)
        exact = docs.selectExpr("explode(split(text, ' ')) as term") \
            .groupBy("term").count()
        est = {r["term"]: r["est"]
               for r in P.cms_estimate(sk, exact, depth=3, width=4).collect()}
        for r in exact.collect():
            assert est[r["term"]] >= r["count"]

    def test_hashed_features_conserve(self, docs):
        hv = P.hashed_features(docs, dim=16)
        total = hv.groupBy().sum("cnt").collect()[0][0]
        # 9+9+8+9+2 unigrams, 8+8+7+8+1 bigrams
        assert total == 69

    def test_strip_html(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "<p>a &amp; b</p><script>junk</script>")], ["doc_id", "text"])
        out = P.strip_html(df).collect()[0]["clean"]
        assert out == "a & b"


    def test_int8_artifact_round_trip(self, vecs, tmp_path):
        path = str(tmp_path / "int8")
        P.train_and_save_int8(vecs, path)
        q = vecs.where("vec_id < 2")
        got = {(r["qid"], r["cid"], r["rnk"]) for r in
               P.int8_top_k_from_artifact(q, vecs, path, k=3).collect()}
        exact = {(r["qid"], r["cid"], r["rnk"]) for r in
                 P.cosine_top_k(q, vecs, k=3).collect()}
        assert got == exact


    def test_binary_artifact_round_trip(self, vecs, tmp_path):
        path = str(tmp_path / "binary")
        P.train_and_save_binary(vecs, path)
        q = vecs.where("vec_id < 2")
        got = {(r["qid"], r["cid"], r["rnk"]) for r in
               P.binary_top_k_from_artifact(q, vecs, path, k=3).collect()}
        exact = {(r["qid"], r["cid"], r["rnk"]) for r in
                 P.cosine_top_k(q, vecs, k=3).collect()}
        assert got == exact


    def test_phrase_flagged_batch(self, docs):
        out = {(r["doc_id"], r["phrase"]) for r in
               P.phrase_flagged(docs, ["quick brown fox"]).collect()}
        # docs 0 and 3 share content -> one flag for the pair
        flagged_ids = {i for i, _ in out}
        assert len(out) == 2 and flagged_ids < {0, 1, 3}


    def test_funnel_and_expectations(self, local_spark):
        import datetime
        t0 = datetime.datetime(2026, 1, 1, 10, 0, 0)
        d = lambda s: t0 + datetime.timedelta(seconds=s)
        ev = local_spark.createDataFrame(
            [(1, "view", d(0)), (1, "click", d(5)), (1, "purchase", d(9)),
             (2, "view", d(0)), (2, "purchase", d(1))],
            ["user_id", "event_type", "ts"])
        out = {r["user_id"]: (r["steps_reached"], r["converted"]) for r in
               P.funnel_earliest_chain(ev, ["view", "click", "purchase"],
                                       window_micros=60 * 1000000).collect()}
        assert out == {1: (3, True), 2: (1, False)}
        df = local_spark.createDataFrame([(1, 5), (1, -2)], ["k", "v"])
        rep = {r["rule"]: (r["n_bad"], r["pass"]) for r in
               P.expectations_table_rules(df, [("v_pos", "NOT (v > 0)")])
               .unionByName(P.expectations_unique_key(df, "k", "k_unique"))
               .collect()}
        assert rep == {"v_pos": (1, False), "k_unique": (1, False)}


    def test_scd2(self, local_spark):
        log = local_spark.createDataFrame(
            [(1, 10, "b"), (1, 20, "b"), (1, 30, "g")], ["id", "ts", "tier"])
        out = {(r["tier"], r["valid_from"], r["valid_to"], r["version"])
               for r in P.scd2(log, "id", "ts", "tier").collect()}
        assert out == {("b", 10, 30, 1), ("g", 30, None, 2)}


    def test_point_in_time(self, local_spark):
        log = local_spark.createDataFrame(
            [(1, 10, "b"), (1, 30, "g")], ["id", "ts", "tier"])
        hist = P.scd2(log, "id", "ts", "tier")
        facts = local_spark.createDataFrame(
            [(100, 1, 15), (101, 1, 35), (102, 1, 5)], ["fact_id", "id", "fts"])
        inner = {(r["fact_id"], r["tier"]) for r in
                 P.point_in_time(facts, hist, "id", "fts").collect()}
        assert inner == {(100, "b"), (101, "g")}  # 102 predates history
        left = {(r["fact_id"], r["tier"]) for r in
                P.point_in_time(facts, hist, "id", "fts",
                                join_type="left").collect()}
        assert left == {(100, "b"), (101, "g"), (102, None)}


    def test_ab_two_proportions(self, local_spark):
        import math
        ev = local_spark.createDataFrame(
            [("A", 1, True), ("A", 2, True), ("A", 3, False),
             ("B", 11, False), ("B", 12, False), ("B", 13, True)],
            ["variant", "user_id", "converted"])
        r = P.ab_two_proportions(ev).collect()[0]
        assert (r["n_a"], r["x_a"], r["n_b"], r["x_b"]) == (3, 2, 3, 1)
        pool = 3.0 / 6.0
        se = math.sqrt(pool * (1 - pool) * (2.0 / 3))
        assert r["z_micro"] == math.floor(1e6 * (2 / 3 - 1 / 3) / se)


    def test_trailing_count(self, local_spark):
        ev = local_spark.createDataFrame(
            [(1, 1, 0), (2, 1, 50), (3, 1, 120)], ["event_id", "user_id", "us"])
        out = {r["event_id"]: r["trail_cnt"] for r in P.trailing_count(
            ev, ts_col="us", window_micros=100).collect()}
        assert out == {1: 0, 2: 1, 3: 1}  # 3 sees only 2 ([20,119])


    def test_trending_grams(self, local_spark):
        import datetime
        t0 = datetime.datetime(2026, 1, 1)
        docs = local_spark.createDataFrame(
            [(t0, "hot take one"), (t0 + datetime.timedelta(seconds=5),
              "hot take two")], ["ts", "text"])
        out = {(r["gram"], r["df"]) for r in
               P.trending_grams(docs, min_df=2).collect()}
        assert out == {("hot take", 2)}


    def test_standardize(self, local_spark):
        import math
        df = local_spark.createDataFrame(
            [("g", v) for v in (1, 2, 3, 4)] + [("h", 7), ("h", 7)],
            ["grp", "v"])
        out = {(r["grp"], r["v"]): r["z_micro"] for r in
               P.standardize(df, "grp", "v").collect()}
        std = math.sqrt(1.25)
        assert out[("g", 1)] == math.floor(1e6 * (1 - 2.5) / std)
        assert out[("h", 7)] is None  # zero variance


    def test_hard_negatives(self, local_spark):
        vecs = local_spark.createDataFrame(
            [(0, [1.0, 0.0]), (1, [1.0, 0.02]), (2, [0.8, 0.6]),
             (3, [0.0, 1.0])], ["vec_id", "embedding"])
        out = [r["cid"] for r in P.hard_negatives(
            vecs.where("vec_id = 0"), vecs, k=2, shortlist=3,
            dup_threshold=0.95).orderBy("rnk").collect()]
        assert out == [2, 3]  # the near-dup (cid 1) is excluded


    def test_overlap_join(self, local_spark):
        lhs = local_spark.createDataFrame(
            [(1, 0.0, 5.0), (2, 10.0, 12.0)], ["lid_", "alo", "ahi"])
        rhs = local_spark.createDataFrame(
            [(7, 5.0, 6.0)], ["rid_", "blo", "bhi"])
        inner = {(r["lid_"], r["rid_"]) for r in
                 P.overlap_join(lhs, rhs).collect()}
        assert inner == {(1, 7)}  # touching endpoints match
        left = {(r["lid_"], r["rid_"]) for r in
                P.overlap_join(lhs, rhs, join_type="left").collect()}
        assert left == {(1, 7), (2, None)}


    def test_cdc_apply(self, local_spark):
        snap = local_spark.createDataFrame(
            [(1, "a"), (2, "b")], ["k", "v"])
        log = local_spark.createDataFrame(
            [(1, 10, "upsert", "a2"), (2, 10, "delete", None),
             (3, 10, "upsert", "c")], ["k", "ts", "op", "v"])
        out = {(r["k"], r["v"]) for r in
               P.cdc_apply(snap, log, "k").collect()}
        assert out == {(1, "a2"), (3, "c")}


    def test_quantile_bins(self, local_spark):
        df = local_spark.createDataFrame(
            [("g", v) for v in range(1, 9)], ["grp", "v"])
        out = {r["v"]: r["bin"] for r in
               P.quantile_bins(df, "grp", "v", num_bins=4).collect()}
        assert out == {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 2, 7: 3, 8: 3}


    def test_retention_cohorts(self, local_spark):
        import datetime
        t0 = datetime.datetime(2026, 1, 1)
        d = lambda days: t0 + datetime.timedelta(days=days)
        ev = local_spark.createDataFrame(
            [(1, d(0), "signup"), (1, d(3), "click"), (1, d(10), "click"),
             (2, d(1), "click")],  # no signup -> never counted
            ["user_id", "ts", "event_type"])
        out = {(r["period_offset"], r["n_users"])
               for r in P.retention_cohorts(ev).collect()}
        assert out == {(0, 1), (1, 1)}  # week 0 (signup+click), week 1


    def test_extract_urls(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "go https://www.A.org/x then http://b.io:80/y")],
            ["doc_id", "text"])
        out = [(r["url_idx"], r["url"], r["domain"])
               for r in P.extract_urls(df).collect()]
        assert out == [(0, "https://www.A.org/x", "a.org"),
                       (1, "http://b.io:80/y", "b.io")]


    def test_salted_join(self, local_spark):
        probe = local_spark.createDataFrame(
            [(0 if i % 2 == 0 else i % 7, i) for i in range(80)], ["k", "pay"])
        build = local_spark.createDataFrame(
            [(i, "b%d" % i) for i in range(7)], ["k", "bpay"])
        plain = sorted((r["k"], r["pay"], r["bpay"])
                       for r in probe.join(build, "k").collect())
        hot = local_spark.createDataFrame([(0,)], ["k"])
        salted = sorted((r["k"], r["pay"], r["bpay"]) for r in
                        P.salted_join(probe, build, "k", 4, hot).collect())
        assert salted == plain
        everything = sorted((r["k"], r["pay"], r["bpay"]) for r in
                            P.salted_join(probe, build, "k", 4).collect())
        assert everything == plain


    def test_bucketed_colocated_join(self, local_spark, tmp_path):
        facts = local_spark.createDataFrame(
            [(i % 5, i) for i in range(50)], ["k", "fid"])
        dim = local_spark.createDataFrame(
            [(i, "d%d" % i) for i in range(5)], ["k", "name"])
        P.write_bucketed(facts, "pybkt_facts", str(tmp_path / "f"), "k", 4)
        P.write_bucketed(dim, "pybkt_dim", str(tmp_path / "d"), "k", 4)
        out = P.colocated_join(local_spark, "pybkt_facts", "pybkt_dim", "k")
        assert out.count() == 50
        assert "Exchange" not in out._jdf.queryExecution().executedPlan().toString()
        import pytest as _pt
        with _pt.raises(Exception):
            P.colocated_join(local_spark, "pybkt_facts", "no_such_table", "k")


    def test_sentences_topvalues_audit(self, docs, local_spark):
        df = local_spark.createDataFrame(
            [(1, "one two. three! four")], ["doc_id", "text"])
        sent = [(r["sent_idx"], r["sentence"]) for r in
                P.sentences(df).collect()]
        assert sorted(sent) == [(0, "one two."), (1, "three!"), (2, "four")]
        tv = [(r["cnt"], r["rnk"]) for r in
              P.top_values(docs, "text", k=2).collect()]
        assert tv[0] == (2, 1)  # docs 0 and 3 share content
        audit = {r["doc_id"]: r["reason"] for r in P.curate_audit(docs).collect()}
        assert audit[3] == "duplicate" and len(audit) == 5


    def test_scd2_stream_batch_path(self, local_spark):
        import datetime
        t0 = datetime.datetime(2026, 1, 1)
        d = lambda s: t0 + datetime.timedelta(seconds=s)
        log = local_spark.createDataFrame(
            [(1, d(10), "b"), (1, d(20), "g"), (1, d(30), "g")],
            ["id", "ts", "tier"])
        out = [(r["tier"], r["version"]) for r in
               P.scd2_stream(log, "id", "ts", "tier").collect()]
        assert out == [("b", 1)]  # only the closed episode on batch


class TestRound8(object):

    def test_incremental_minhash_index(self, docs, tmp_path):
        path = str(tmp_path / "mhidx")
        base = docs.where("doc_id % 2 = 0")
        delta = docs.where("doc_id % 2 = 1")
        P.save_minhash_index(P.build_minhash_index(base), path)
        P.append_minhash_index(delta, path)
        P.append_minhash_index(base, path)  # unchanged re-ingest
        maintained = P.compact_minhash_index(P.load_minhash_index(docs, path))
        rebuilt = P.build_minhash_index(docs)
        assert maintained.count() == rebuilt.count()
        probe = docs.withColumn("doc_id", docs.doc_id + 100)
        a = sorted(tuple(r) for r in
                   P.minhash_pairs_vs_index(probe, maintained).collect())
        b = sorted(tuple(r) for r in
                   P.minhash_pairs_vs_index(probe, rebuilt).collect())
        assert a == b and len(a) > 0

    def test_bpe_train_capped(self, docs):
        full = [tuple(r) for r in P.bpe_train(docs, rounds=4).collect()]
        capped = [tuple(r) for r in
                  P.bpe_train_capped(docs, rounds=4, max_words=1 << 20).collect()]
        assert capped == full  # an unreached cap must not change training
        small = P.bpe_train_capped(docs, rounds=2, max_words=3).collect()
        assert len(small) == 2  # still trains on the pruned histogram

    def test_compact_bucketed(self, docs, local_spark, tmp_path):
        P.write_bucketed(docs.where("doc_id % 2 = 0"), "py_compact_t",
                         str(tmp_path / "v1"), "doc_id", 4)
        (docs.where("doc_id % 2 = 1").repartition(2).write
         .format("parquet").bucketBy(4, "doc_id").sortBy("doc_id")
         .mode("append").saveAsTable("py_compact_t"))
        before, after = P.compact_bucketed(local_spark, "py_compact_t",
                                           str(tmp_path / "v2"))
        # <= numBuckets: a bucket with no rows writes no file
        assert after <= 4 and before > after
        assert local_spark.table("py_compact_t").count() == docs.count()

    def test_vacuum_superseded_location(self, docs, local_spark, tmp_path):
        import os
        P.write_bucketed(docs.where("doc_id % 2 = 0"), "py_vacuum_t",
                         str(tmp_path / "v1"), "doc_id", 4)
        old = P.table_location(local_spark, "py_vacuum_t")
        P.compact_bucketed(local_spark, "py_vacuum_t", str(tmp_path / "v2"))
        files, nbytes = P.vacuum(local_spark, old)
        assert files > 0 and nbytes > 0
        assert not os.path.exists(str(tmp_path / "v1"))
        # live table untouched; vacuuming its CURRENT location refuses
        assert local_spark.table("py_vacuum_t").count() > 0
        import pytest as _pt
        with _pt.raises(Exception, match="currently live"):
            P.vacuum(local_spark, P.table_location(local_spark, "py_vacuum_t"))

    def test_shards_assign_and_manifest(self, docs):
        out = P.shards_assign(
            docs.selectExpr("doc_id", "length(text) AS n_chars"),
            "doc_id", "n_chars", 4)
        rows = out.collect()
        assert len(rows) == docs.count()
        assert {r["shard"] for r in rows} == {0, 1, 2, 3}
        man = {r["shard"]: (r["n_rows"], r["weight_sum"])
               for r in P.shards_manifest(out).collect()}
        total = sum(w for _, w in man.values())
        maxw = max(r["weight"] for r in rows)
        for _, w in man.values():  # balance bound: ideal ± max doc
            assert abs(w - total / 4) <= maxw

    def test_bmp_codec_real_bytes(self, local_spark):
        # one real 24-bit BMP built in the JVM, decoded through the py binding
        jvm = local_spark._jvm
        assets = local_spark.createDataFrame(
            [(1, bytearray(b"not an image"))], ["asset_id", "content"])
        meta = {r["asset_id"]: r["meta"]["kind"] for r in
                P.with_decoded_meta(assets, codec="bmp").collect()}
        assert meta[1] == "unknown"  # pass-through contract on foreign bytes

    def test_wav_codec_real_bytes(self, local_spark):
        # a real canonical PCM WAV: 44-byte header + 4 LE 16-bit samples
        import struct
        wav = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 2000, 2, 16)
               + b"data" + struct.pack("<I", 8)
               + struct.pack("<4h", 10, 20, 30, 40))
        assets = local_spark.createDataFrame(
            [(1, bytearray(wav)), (2, bytearray(b"not audio"))],
            ["asset_id", "content"])
        meta = {r["asset_id"]: (r["meta"]["kind"], r["meta"]["sample_rate"])
                for r in P.with_decoded_meta(assets, codec="wav").collect()}
        assert meta[1] == ("audio", 1000)
        assert meta[2][0] == "unknown"  # pass-through on foreign bytes
        # decimate by 2: rate halves, every other sample kept
        ds = {r["asset_id"]: bytes(r["content"]) for r in
              P.downsample_audio(assets, factor=2).collect()}
        assert struct.unpack("<I", ds[1][24:28])[0] == 500
        assert struct.unpack("<2h", ds[1][44:48]) == (10, 30)
        assert ds[2] == b"not audio"  # untouched

    def test_map_in_pandas_decode_agrees_with_jvm_codecs(self, local_spark):
        # the Arrow-batched Python decode path must agree with the JVM
        # codecs byte-for-byte on the canonical formats
        import struct
        from graft import multimodal_pandas as MP
        wav = (b"RIFF" + struct.pack("<I", 36 + 8) + b"WAVEfmt "
               + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 2000, 2, 16)
               + b"data" + struct.pack("<I", 8)
               + struct.pack("<4h", 10, 20, 30, 40))
        # canonical 2x1 24bpp BMP: 54-byte header + one padded BGR row
        bmp = (b"BM" + struct.pack("<I", 54 + 8) + b"\0\0\0\0"
               + struct.pack("<I", 54) + struct.pack("<I", 40)
               + struct.pack("<ii", 2, 1) + struct.pack("<HH", 1, 24)
               + struct.pack("<II", 0, 8) + struct.pack("<ii", 2835, 2835)
               + struct.pack("<II", 0, 0) + b"\x01\x02\x03\x04\x05\x06\0\0")
        assets = local_spark.createDataFrame(
            [(1, bytearray(wav)), (2, bytearray(bmp)),
             (3, bytearray(b"junk")), (4, None)],
            "asset_id int, content binary")
        py = {r["asset_id"]: (r["kind"], r["width"], r["height"],
                              r["sample_rate"], r["duration_ms"])
              for r in MP.decode_meta_pandas(assets).collect()}
        assert py[1] == ("audio", None, None, 1000, 4)
        assert py[2] == ("image", 2, 1, None, None)
        assert py[3][0] == "unknown" and py[4][0] == "unknown"
        for codec, aid in (("wav", 1), ("bmp", 2)):
            jvm = {r["asset_id"]: (r["meta"]["kind"], r["meta"]["width"],
                                   r["meta"]["height"], r["meta"]["sample_rate"],
                                   r["meta"]["duration_ms"])
                   for r in P.with_decoded_meta(assets, codec=codec).collect()}
            assert jvm[aid] == py[aid]
        # vectorized numpy feature path agrees with the JVM histogram
        hp = {r["asset_id"]: r["histogram"] for r in
              MP.byte_histogram_pandas(assets.where("content is not null"))
              .collect()}
        hj = {r["asset_id"]: r["histogram"] for r in
              P.byte_histogram(assets.where("content is not null")).collect()}
        assert hp == hj

    def test_ivf_pq_top_k(self, vecs):
        exact = sorted((r["qid"], r["cid"], r["rnk"]) for r in
                       P.cosine_top_k(vecs.where("vec_id = 0"), vecs, k=2).collect())
        got = sorted((r["qid"], r["cid"], r["rnk"]) for r in
                     P.ivf_pq_top_k(vecs.where("vec_id = 0"), vecs, k=2,
                                    nlist=2, m=3, ksub=4, iters=1,
                                    nprobe=2, shortlist=0).collect())
        assert got == exact  # structurally exact at nprobe=nlist

    def test_asof_join_within(self, local_spark):
        l = local_spark.createDataFrame([(1, 100), (1, 500)], ["k", "lts"])
        r = local_spark.createDataFrame([(1, 95, "a"), (1, 200, "b")],
                                        ["k", "rts", "pay"])
        got = {(x["k"], x["lts"]): x["pay"] for x in
               P.asof_join_within(l, r, "k", "lts", "rts",
                                  tolerance=100, join_type="left").collect()}
        assert got == {(1, 100): "a", (1, 500): None}  # 500's match is 300 stale

    def test_bpe_artifact_round_trip(self, docs, tmp_path):
        path = str(tmp_path / "bpe")
        P.train_and_save_bpe(docs, path, rounds=4)
        fresh = sorted(tuple(r) for r in
                       P.bpe_counts(docs, P.bpe_train(docs, rounds=4)).collect())
        loaded = sorted(tuple(r) for r in
                        P.bpe_counts_from_artifact(docs, path).collect())
        assert loaded == fresh
        # merges.txt interop twin: export the parquet artifact as the
        # GPT-2 text layout, serve from the imported text — same counts
        txt = str(tmp_path / "merges.txt")
        P.export_bpe_merges_txt(docs, path, txt)
        with open(txt) as f:
            assert f.readline().rstrip("\n") == "#version: 0.2"
        from_txt = sorted(tuple(r) for r in
                          P.bpe_counts_from_merges_txt(docs, txt).collect())
        assert from_txt == fresh

    def test_pagerank_and_personalized(self, local_spark):
        edges = local_spark.createDataFrame(
            [(1, 2), (2, 1), (3, 1), (4, 1), (1, 3), (1, 4)], ["src", "dst"])
        pr = {r["node"]: r["pr_unit"]
              for r in P.pagerank(edges, iterations=8).collect()}
        assert pr[1] > pr[3] and pr[1] > pr[4]  # hub outranks leaves
        seeds = local_spark.createDataFrame([(3,)], ["id"])
        ppr = {r["node"]: r["pr_unit"] for r in
               P.personalized_pagerank(edges, seeds, iterations=8).collect()}
        assert ppr[3] > ppr[4]  # teleport mass concentrates on the seed

    def test_rrf_fusion(self, local_spark):
        l1 = local_spark.createDataFrame(
            [(1, 10, 1), (1, 20, 2)], ["qid", "doc_id", "rnk"])
        l2 = local_spark.createDataFrame(
            [(1, 20, 1), (1, 30, 2)], ["qid", "doc_id", "rnk"])
        got = [(r["doc_id"], r["rrf_unit"], r["rnk"]) for r in
               P.rrf_fusion([l1, l2], k=3).orderBy("rnk").collect()]
        assert got == [(20, 16393 + 16129, 1), (10, 16393, 2), (30, 16129, 3)]

    def test_cluster_canon_by(self, local_spark):
        docs = local_spark.createDataFrame(
            [(1, 10), (2, 30), (3, 20), (9, 1)], ["id", "len"])
        pairs = local_spark.createDataFrame(
            [(1, 2), (2, 3)], ["doc_i", "doc_j"])
        got = {r["id"]: r["canon_id"] for r in
               P.cluster_canon_by(docs, "id", "len", pairs).collect()}
        assert got == {1: 2, 2: 2, 3: 2, 9: 9}

    def test_weighted_pagerank_and_triangles(self, local_spark):
        w1 = local_spark.createDataFrame(
            [(1, 2, 1), (2, 1, 1)], ["src", "dst", "w"])
        pr = {r["node"]: r["pr_unit"] for r in
              P.weighted_pagerank(w1, iterations=3).collect()}
        assert pr == {1: 500000000000, 2: 500000000000}  # symmetric cycle
        k4 = local_spark.createDataFrame(
            [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],
            ["doc_i", "doc_j"])
        tri = {r["node"]: r["tri_cnt"] for r in P.triangle_counts(k4).collect()}
        assert tri == {1: 3, 2: 3, 3: 3, 4: 3}

    def test_clustering_coef_and_k_core(self, local_spark):
        edges = local_spark.createDataFrame(
            [(1, 2), (2, 3), (1, 3), (3, 4)], ["doc_i", "doc_j"])
        coef = {r["node"]: r["coef_unit"] for r in
                P.clustering_coef(edges).collect()}
        assert coef == {1: 1000000, 2: 1000000, 3: 333333, 4: 0}
        core = {r["node"]: r["deg"] for r in
                P.k_core(edges, k=2).collect()}
        assert core == {1: 2, 2: 2, 3: 2}  # pendant 4 peeled

    def test_co_occurrence_and_walks(self, local_spark):
        bip = local_spark.createDataFrame(
            [(10, 1), (10, 2), (20, 1), (20, 2), (30, 2)], ["l", "r"])
        co = {(r["node_i"], r["node_j"]): r["w"] for r in
              P.co_occurrence(bip, "l", "r").collect()}
        assert co == {(1, 2): 2}
        cyc = local_spark.createDataFrame(
            [(1, 2), (2, 3), (3, 1)], ["src", "dst"])
        w = sorted((r["walk_id"], r["step"], r["node"]) for r in
                   P.graph_walks(cyc, steps=2).collect()
                   if r["walk_id"] == "1#0")
        assert w == [("1#0", 0, 1), ("1#0", 1, 2), ("1#0", 2, 3)]
        lines = {r["walk_id"]: r["line"] for r in
                 P.walk_corpus_lines(P.graph_walks(cyc, steps=2)).collect()}
        assert lines["1#0"] == "1 2 3"

    def test_label_propagate(self, local_spark):
        chain = local_spark.createDataFrame(
            [(1, 2), (2, 3)], ["src", "dst"])
        seeds = local_spark.createDataFrame([(1, 7)], ["node", "label"])
        got = {r["node"]: r["label"] for r in
               P.label_propagate(chain, seeds, rounds=2).collect()}
        assert got == {1: 7, 2: 7, 3: 7}

    def test_audio_energy(self, local_spark):
        import struct
        samples = [3, -4, 5, 100]
        data = b"".join(struct.pack("<h", s) for s in samples)
        wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 2000, 2, 16)
               + b"data" + struct.pack("<I", len(data)) + data)
        df = local_spark.createDataFrame(
            [(1, bytearray(wav)), (2, bytearray(b"text"))], ["id", "content"])
        got = sorted((r["window_idx"], r["n_samples"], r["mean_sq"]) for r in
                     P.audio_energy(df, "id", window_samples=2).collect())
        assert got == [(0, 2, 12), (1, 2, 5012)]

    def test_image_tile_stats(self, local_spark):
        import struct
        # 2x1 24bpp bottom-up BMP: pixels B,G,R = (1,2,3) and (5,6,7)
        row = bytes([1, 2, 3, 5, 6, 7]) + b"\x00\x00"  # padded to 8
        bmp = (b"BM" + struct.pack("<I", 54 + len(row)) + b"\x00" * 4
               + struct.pack("<I", 54) + struct.pack("<IiiHH", 40, 2, 1, 1, 24)
               + struct.pack("<IIIIII", 0, len(row), 2835, 2835, 0, 0) + row)
        df = local_spark.createDataFrame([(1, bytearray(bmp))], ["id", "content"])
        got = {(r["tile_x"], r["tile_y"]): (r["mean_b"], r["mean_g"], r["mean_r"])
               for r in P.image_tile_stats(df, "id", tile_w=1, tile_h=1).collect()}
        assert got == {(0, 0): (1, 2, 3), (1, 0): (5, 6, 7)}

    def test_demux_frames_and_mp4_meta(self, local_spark):
        import struct
        le32 = lambda v: struct.pack("<I", v)
        be32 = lambda v: struct.pack(">I", v)
        # two real 2x1 BMP frames inside a canonical MJPEG-in-AVI shell
        def bmp(px0, px1):
            row = bytes(px0) + bytes(px1) + b"\x00\x00"
            return (b"BM" + le32(54 + len(row)) + b"\x00" * 4 + le32(54)
                    + struct.pack("<IiiHH", 40, 2, 1, 1, 24)
                    + struct.pack("<IIIIII", 0, len(row), 2835, 2835, 0, 0)
                    + row)
        frames = [bmp((1, 2, 3), (5, 6, 7)), bmp((9, 10, 11), (13, 14, 15))]
        movi = b"movi" + b"".join(
            b"00dc" + le32(len(f)) + f + (b"\x00" if len(f) % 2 else b"")
            for f in frames)
        avih = (b"avih" + le32(56) + le32(100000) + le32(0) * 3
                + le32(len(frames)) + le32(0) + le32(1) + le32(0)
                + le32(2) + le32(1) + le32(0) * 4)
        strh = (b"strh" + le32(56) + b"vidsMJPG" + le32(0) * 3
                + le32(1) + le32(10) + le32(0) + le32(len(frames))
                + le32(0) * 5)
        strf = (b"strf" + le32(40) + le32(40) + le32(2) + le32(1)
                + struct.pack("<HH", 1, 24) + b"MJPG" + le32(0) * 5)
        hdrl = b"LIST" + le32(192) + b"hdrl" + avih \
            + b"LIST" + le32(116) + b"strl" + strh + strf
        avi = (b"RIFF" + le32(4 + len(hdrl) + 8 + len(movi)) + b"AVI "
               + hdrl + b"LIST" + le32(len(movi)) + movi)
        df = local_spark.createDataFrame(
            [(1, bytearray(avi)), (2, bytearray(b"not a video"))],
            ["id", "content"])
        meta = {r["id"]: (r["meta"]["kind"], r["meta"]["n_frames"])
                for r in P.with_decoded_meta(df, codec="avi").collect()}
        assert meta == {1: ("video", 2), 2: ("unknown", None)}
        # demux -> per-frame decode -> tile stats, through the py facade
        fr = P.demux_frames(df, "id", every_n=1)
        got = {(r["asset_id"], r["frame_index"]) for r in
               fr.select("asset_id", "frame_index").collect()}
        assert got == {(1, 0), (1, 1)}
        tiles = {(r["asset_id"], r["tile_x"]): r["mean_b"] for r in
                 P.image_tile_stats(
                     fr.withColumn("fid", fr.asset_id * 16 + fr.frame_index),
                     "fid", content_col="frame", tile_w=1, tile_h=1,
                     codec="bmp").collect()}
        assert tiles == {(16, 0): 1, (16, 1): 5, (17, 0): 9, (17, 1): 13}
        # canonical metadata-only MP4 through the box walk
        matrix = (be32(0x10000) + be32(0) * 3 + be32(0x10000) + be32(0) * 3
                  + be32(0x40000000))
        ts, dur, w, h = 600, 7260, 320, 240
        mvhd = (be32(108) + b"mvhd" + be32(0) * 3 + be32(ts) + be32(dur)
                + be32(0x10000) + struct.pack(">HH", 0x0100, 0) + b"\x00" * 8
                + matrix + b"\x00" * 24 + be32(2))
        tkhd = (be32(92) + b"tkhd" + be32(7) + be32(0) * 2 + be32(1)
                + be32(0) + be32(dur) + b"\x00" * 8 + b"\x00\x00" * 4
                + matrix + be32(w << 16) + be32(h << 16))
        mdhd = (be32(32) + b"mdhd" + be32(0) * 3 + be32(ts) + be32(dur)
                + struct.pack(">HH", 0x55C4, 0))
        hdlr = be32(33) + b"hdlr" + be32(0) * 2 + b"vide" + b"\x00" * 13
        mdia = be32(73) + b"mdia" + mdhd + hdlr
        trak = be32(173) + b"trak" + tkhd + mdia
        mp4 = (be32(16) + b"ftyp" + b"isom" + be32(0x200)
               + be32(289) + b"moov" + mvhd + trak)
        assert len(mp4) == 305
        df4 = local_spark.createDataFrame(
            [(1, bytearray(mp4)), (2, bytearray(b"junk bytes"))],
            ["id", "content"])
        m4 = {r["id"]: (r["meta"]["kind"], r["meta"]["width"],
                        r["meta"]["height"], r["meta"]["duration_ms"])
              for r in P.with_decoded_meta(df4, codec="mp4").collect()}
        assert m4[1] == ("video", 320, 240, 12100)
        assert m4[2][0] == "unknown"

    @staticmethod
    def _gray_bmp(rows):
        import struct
        h, w = len(rows), len(rows[0])
        rb = (w * 3 + 3) & ~3
        body = b"".join(
            bytes(v for px in row for v in (px, px, px)).ljust(rb, b"\x00")
            for row in reversed(rows))
        return (b"BM" + struct.pack("<I", 54 + len(body)) + b"\x00" * 4
                + struct.pack("<I", 54) + struct.pack("<IiiHH", 40, w, h, 1, 24)
                + struct.pack("<IIIIII", 0, len(body), 2835, 2835, 0, 0) + body)

    def test_image_hash_and_key_canon(self, local_spark):
        # grays 0,30/60,90 -> mean 45 -> bits 0,0,1,1 -> lo = 12
        bmp = self._gray_bmp([[0, 30], [60, 90]])
        df = local_spark.createDataFrame(
            [(1, bytearray(bmp)), (2, bytearray(bmp)), (3, bytearray(b"txt"))],
            ["id", "content"])
        hs = P.image_hash(df, "id", side=2).collect()
        assert {(r["asset_id"], r["hash_hi"], r["hash_lo"]) for r in hs} \
            == {(1, 0, 12), (2, 0, 12)}
        canon = {r["asset_id"]: r["canon_id"] for r in
                 P.key_canon(P.image_hash(df, "id", side=2), "asset_id",
                             ["hash_hi", "hash_lo"]).collect()}
        assert canon == {1: 1, 2: 1}

    def test_audio_fingerprint(self, local_spark):
        import struct
        samples = [0, 0, 10, 10, 0, 0]  # window energies 0,100,0 -> floor 33
        data = b"".join(struct.pack("<h", s) for s in samples)
        wav = (b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
               + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 1000, 2000, 2, 16)
               + b"data" + struct.pack("<I", len(data)) + data)
        df = local_spark.createDataFrame([(1, bytearray(wav))], ["id", "content"])
        r = P.audio_fingerprint(df, "id", window_samples=2).collect()[0]
        assert (r["n_windows"], r["energy_floor"], r["fp"]) == (3, 33, 2)

    def test_decontam_semantic(self, local_spark):
        corpus = local_spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [0.6, 0.8])], ["id", "vec"])
        bench = local_spark.createDataFrame(
            [(10, [1.0, 0.0]), (11, [0.8, 0.6])], ["bid", "bvec"])
        got = {r["doc"]: (r["n_hits"], r["best_bench"]) for r in
               P.decontam_semantic(corpus, "id", "vec", bench, "bid",
                                   "bvec", tau=0.9).collect()}
        assert got == {1: (1, 10), 3: (1, 11)}

    def test_robust_outliers(self, local_spark):
        df = local_spark.createDataFrame(
            [("g", 1, 1), ("g", 2, 2), ("g", 3, 3), ("g", 4, 100)],
            ["grp", "id", "v"])
        got = {r["id"]: r["is_outlier"] for r in
               P.robust_outliers(df, "grp", "v", k=3).collect()}
        assert got == {1: False, 2: False, 3: False, 4: True}

    def test_knn_label_accuracy(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"),
             (3, [0.0, 1.0], "b"), (4, [0.1, 0.9], "b")],
            ["id", "vec", "lbl"])
        got = {r["lbl"]: (r["n"], r["n_correct"], r["acc_micro"]) for r in
               P.knn_label_accuracy(df, "id", "vec", "lbl").collect()}
        assert got == {"a": (2, 2, 1000000), "b": (2, 2, 1000000)}

    def test_knn_predict_and_confusion(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, [1.0, 0.0], "a"), (2, [0.9, 0.1], "a"),
             (3, [0.0, 1.0], "b"), (4, [0.1, 0.9], "b"),
             (5, [0.8, 0.75], "b")],
            ["id", "vec", "lbl"])
        pred = P.knn_predict(df, "id", "vec", "lbl")
        got = {r["actual"] + r["predicted"]: r["n"] for r in
               P.confusion(pred, "actual", "predicted").collect()}
        assert got == {"aa": 2, "bb": 2, "ba": 1}

    def test_classification_report(self, local_spark):
        df = local_spark.createDataFrame(
            [("a", "a"), ("a", "b"), ("a", "b"), ("b", "c")],
            ["act", "prd"])
        got = {r["clazz"]: (r["tp"], r["fp"], r["fn"], r["prec_micro"],
                            r["rec_micro"], r["f1_micro"]) for r in
               P.classification_report(df, "act", "prd").collect()}
        assert got["a"] == (1, 0, 2, 1000000, 333333, 500000)
        assert got["c"] == (0, 1, 0, 0, None, 0)

    def test_cohen_kappa(self, local_spark):
        rows = ([("a", "a")] * 45 + [("a", "b")] * 5 +
                [("b", "b")] * 25 + [("b", "a")] * 25)
        df = local_spark.createDataFrame(rows, ["act", "prd"])
        r = P.cohen_kappa(df, "act", "prd").collect()[0]
        assert (r["n"], r["po_micro"], r["pe_micro"],
                r["kappa_micro"]) == (100, 700000, 500000, 400000)

    def test_roc_auc(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, 4), (1, 2), (1, 2), (0, 3), (0, 2), (0, 1)],
            ["y", "sc"])
        r = P.roc_auc(df, "y", "sc").collect()[0]
        assert (r["n_pos"], r["n_neg"], r["auc_micro"]) == (3, 3, 666666)

    def test_spearman(self, local_spark):
        df = local_spark.createDataFrame(
            [("g", 1, 10), ("g", 2, 20), ("g", 2, 30), ("g", 4, 40)],
            ["g", "x", "y"])
        r = P.spearman(df, "g", "x", "y").collect()[0]
        assert (r["n"], r["rho_micro"]) == (4, 950000)

    def test_winsorize(self, local_spark):
        df = local_spark.createDataFrame(
            [("g", v) for v in range(1, 11)], ["g", "v"])
        got = sorted(r["w"] for r in
                     P.winsorize(df, "g", "v", 10, 90, "w").collect())
        assert got == [1, 2, 3, 4, 5, 6, 7, 8, 9, 9]

    def test_novelty_scores(self, local_spark):
        df = local_spark.createDataFrame(
            [(1, "a b c"), (2, "b c d"), (3, "a b c d")],
            ["doc_id", "text"])
        got = {r["doc_id"]: r["novelty_micro"] for r in
               P.novelty_scores(df, "doc_id", "text", n=2).collect()}
        assert got == {1: 1000000, 2: 500000, 3: 0}

    def test_write_shards(self, local_spark, tmp_path):
        df = local_spark.range(1, 101).selectExpr("id", "(id % 7) + 1 AS w")
        assigned = P.shards_assign(df, "id", "w", 4)
        shards, files, rows = P.write_shards(
            assigned, str(tmp_path / "shards"), 4)
        assert (shards, files, rows) == (4, 4, 100)

    def test_session_lines(self, local_spark):
        df = local_spark.createDataFrame(
            [("2024-01-01 10:00:00", "a", 1, "view"),
             ("2024-01-01 10:10:00", "a", 2, "click")],
            ["t", "user_id", "event_id", "event_type"]).selectExpr(
            "timestamp(t) ts", "user_id", "event_id", "event_type")
        got = P.session_lines(df, gap="1 hour").collect()
        assert [(r["user_id"], r["line"]) for r in got] == [("a", "view click")]

    def test_mmr_rerank(self, local_spark):
        q = local_spark.createDataFrame([(100, [0.8, 0.6])], ["id", "vec"])
        c = local_spark.createDataFrame(
            [(1, [1.0, 0.0]), (2, [0.99, 0.14]), (3, [0.7, 0.71])],
            ["id", "vec"])
        got = [r["cid"] for r in
               P.mmr_rerank(q, c, "id", "vec", 3, 3, 500000)
               .orderBy("rnk").collect()]
        assert got == [3, 1, 2]  # diversified: A beats more-relevant B

    def test_global_rank(self, local_spark):
        df = local_spark.createDataFrame(
            [(5, 1), (5, 2), (9, 3), (1, 4)], ["s", "id"])
        got = {r["id"]: r["rank"] for r in
               P.global_rank(df, "s", "id", descending=True).collect()}
        assert got == {3: 0, 1: 1, 2: 2, 4: 3}

    def test_first_per_normalized(self, local_spark):
        df = local_spark.createDataFrame(
            [(2, "HELLO world", 5), (1, "hello, world!", 0), (3, "bbb", 1)],
            ["id", "text", "ts"])
        got = sorted(r["id"] for r in
                     P.first_per_normalized(df, "text", "ts").collect())
        assert got == [1, 3]

    def test_gini(self, local_spark):
        df = local_spark.createDataFrame(
            [("g", 0, 1), ("g", 0, 2), ("g", 0, 3), ("g", 4, 4)],
            ["g", "v", "id"])
        r = P.gini(df, "g", "v", "id").collect()[0]
        assert (r["n"], r["value_sum"], r["gini_micro"]) == (4, 4, 750000)

    def test_group_percent_rank(self, local_spark):
        df = local_spark.createDataFrame(
            [("a", 10, 1), ("a", 20, 2), ("a", 30, 3)], ["g", "v", "id"])
        got = {r["id"]: (r["rank"], r["pct_micro"]) for r in
               P.group_percent_rank(df, "g", "v", "id").collect()}
        assert got == {1: (0, 0), 2: (1, 500000), 3: (2, 1000000)}

    def test_negative_samples(self, local_spark):
        pos = local_spark.createDataFrame([(1, 10), (1, 11)], ["u", "it"])
        items = local_spark.createDataFrame(
            [(i,) for i in range(10, 20)], ["it"])
        rows = P.negative_samples(pos, items, "u", "it", 3).collect()
        assert len(rows) == 3
        assert all(r["it"] not in (10, 11) for r in rows)
        again = P.negative_samples(pos, items, "u", "it", 3).collect()
        assert sorted(map(tuple, rows)) == sorted(map(tuple, again))

    def test_epoch_plan(self, local_spark):
        corpus = local_spark.createDataFrame(
            [("a", 50), ("a", 50), ("b", 400)], ["src", "tok"])
        w = local_spark.createDataFrame([("a", 3), ("b", 1)], ["s", "wt"])
        got = {r["source"]: (r["target_tokens"], r["epochs_micro"]) for r in
               P.epoch_plan(corpus, "src", "tok", w, "s", "wt", 800).collect()}
        assert got == {"a": (600, 6000000), "b": (200, 500000)}

    def test_int_kmeans(self, local_spark):
        pts = local_spark.createDataFrame(
            [(1, [0.0, 0.0]), (2, [0.01, 0.0]), (3, [0.0, 0.01]),
             (11, [1.0, 1.0]), (12, [0.99, 1.0]), (13, [1.0, 0.99])],
            ["id", "vec"])
        rows = P.int_kmeans(pts, "id", "vec", k=2, rounds=3).collect()
        blobs = {}
        for r in rows:
            blobs.setdefault(r["cluster"], set()).add(r["doc"])
        assert sorted(map(sorted, blobs.values())) == [[1, 2, 3], [11, 12, 13]]

    def test_decayed_sum(self, local_spark):
        ev = local_spark.createDataFrame(
            [(1, 7, 10, 1), (2, 7, 20, 2), (3, 7, 30, 3)],
            ["event_id", "user_id", "us", "v"])
        got = {r["event_id"]: r["decay_sum"] for r in
               P.decayed_sum(ev, "user_id", "us", "event_id", "v",
                             steps=2).collect()}
        assert got == {1: 2, 2: 5, 3: 8}

# -*- coding: utf-8 -*-
"""PySpark bindings for the graft training-data pipeline operators.

Thin py4j wrappers over ``graft.api.PyFacade`` (flat-signature Scala
facade): every function takes and returns PySpark DataFrames; all data
stays on the JVM — only handles and scalar knobs cross the boundary.

    from graft.pipeline import minhash_pairs, cosine_top_k, text_profile
    pairs = minhash_pairs(docs, tau=0.8)
    top = cosine_top_k(queries, corpus, k=10)
"""

from pyspark.sql import DataFrame


def _facade(df):
    return df.sparkSession._jvm.graft.api.PyFacade


def _wrap(df, jdf):
    return DataFrame(jdf, df.sparkSession)


# --- dedup ---------------------------------------------------------------

def exact_canon(df, id_col="doc_id", text_col="text"):
    """(id, canon_id): minimum id among byte-identical texts."""
    return _wrap(df, _facade(df).exactCanon(df._jdf, id_col, text_col))


def jaccard_pairs(df, id_col="doc_id", text_col="text", tau=0.8, n=3,
                  max_doc_freq=0):
    """Exact word-n-gram Jaccard near-dup pairs (doc_i, doc_j, jac).
    ``max_doc_freq > 0`` drops shingles hotter than that (skew cap)."""
    return _wrap(df, _facade(df).jaccardPairs(
        df._jdf, id_col, text_col, float(tau), int(n), int(max_doc_freq)))


def substring_pairs(df, id_col="doc_id", text_col="text", min_span=50,
                    k=40, max_doc_freq=0):
    """Exact-substring dedup: (doc_i, doc_j, span_len) pairs sharing a
    verbatim token span of at least ``min_span`` tokens (longest span
    reported; spans shorter than ``k`` are invisible, so ``k <=
    min_span``). ``max_doc_freq <= 0`` disables the boilerplate-run
    cap."""
    return _wrap(df, _facade(df).substringPairs(
        df._jdf, id_col, text_col, int(min_span), int(k), int(max_doc_freq)))


def winnowed_substring_pairs(df, id_col="doc_id", text_col="text",
                             min_span_lb=50, k=40, w=8, max_doc_freq=0):
    """Winnowed exact-substring dedup: like :func:`substring_pairs` but
    the inverted index keeps only winnowing-selected fingerprints
    (~2/(w+1) density) — the 100 TB shape. Detection is guaranteed for
    shared spans of at least ``w+k-1`` tokens; ``span_lb`` is a lower
    bound on the true span, tight to ``2*(w-1)`` tokens."""
    return _wrap(df, _facade(df).winnowedSubstringPairs(
        df._jdf, id_col, text_col, int(min_span_lb), int(k), int(w),
        int(max_doc_freq)))


def minhash_pairs(df, id_col="doc_id", text_col="text", tau=0.8, n=3,
                  num_hashes=32, band_rows=2):
    """MinHash+LSH candidates with exact Jaccard verification — the
    scale path; emitted pairs equal jaccard_pairs up to LSH recall."""
    return _wrap(df, _facade(df).minhashPairs(
        df._jdf, id_col, text_col, float(tau), int(n),
        int(num_hashes), int(band_rows)))


def containment_pairs(df, id_col="doc_id", text_col="text", tau=0.8, n=3,
                      max_doc_freq=0):
    """Near-superset pairs (doc_i, doc_j, cont) by max-containment
    ``|A n B| / min(|A|, |B|)`` -- catches quote-inclusion and
    boilerplate-wrapping that union-normalized Jaccard misses."""
    return _wrap(df, _facade(df).containmentPairs(
        df._jdf, id_col, text_col, float(tau), int(n), int(max_doc_freq)))


def simhash_pairs(df, id_col="doc_id", text_col="text", max_hamming=3,
                  use_md5=False):
    """SimHash near-dup pairs (doc_i, doc_j, hamming)."""
    return _wrap(df, _facade(df).simhashPairs(
        df._jdf, id_col, text_col, int(max_hamming), bool(use_md5)))


def embedding_pairs(df, id_col="vec_id", vec_col="embedding", tau=0.9):
    """Exact all-pairs cosine near-dups — the small-N path."""
    return _wrap(df, _facade(df).embeddingPairs(
        df._jdf, id_col, vec_col, float(tau)))


def embedding_pairs_lsh(df, id_col="vec_id", vec_col="embedding", tau=0.9,
                        planes=10, tables=8):
    """LSH-bucketed embedding near-dups — the scale path; emitted pairs
    carry exact cosines."""
    return _wrap(df, _facade(df).embeddingPairsLsh(
        df._jdf, id_col, vec_col, float(tau), int(planes), int(tables)))


def minhash_pairs_across(new_df, old_df, id_col="doc_id", text_col="text",
                         tau=0.8, n=3, num_hashes=32, band_rows=2):
    """Cross-corpus incremental dedup: near-dups of new_df documents
    against old_df (the already-ingested corpus) as (doc_i, doc_j, jac)
    -- candidates only where a band collides ACROSS sides, so no
    old-vs-old work is repeated; Jaccard values are exact."""
    return _wrap(new_df, _facade(new_df).minhashPairsAcross(
        new_df._jdf, old_df._jdf, id_col, text_col, float(tau), int(n),
        int(num_hashes), int(band_rows)))


def cluster_pairs(pairs, i_col="doc_i", j_col="doc_j", max_iters=20):
    """(doc_id, cluster_id) connected components over a pair list;
    raises if max_iters truncates propagation."""
    return _wrap(pairs, _facade(pairs).clusterPairs(
        pairs._jdf, i_col, j_col, int(max_iters)))


def asof_join(left, right, keys="user_id", left_ts="ts", right_ts="ts",
              join_type="inner", direction="backward"):
    """As-of join: for every left row, the right row with the greatest
    ``right_ts`` at-or-before ``left_ts`` sharing the key columns
    (comma-separated ``keys``); inner -- unmatched left rows drop;
    join_type="left" keeps them with null right columns. ``direction``:
    "backward" (default), "forward" (smallest right_ts at-or-after) or
    "nearest" (closer side, ties to backward)."""
    return _wrap(left, _facade(left).asofJoin(
        left._jdf, right._jdf, keys, left_ts, right_ts, join_type,
        direction))


def asof_join_within(left, right, keys, left_ts_col, right_ts_col,
                     tolerance, join_type="inner", direction="backward"):
    """:func:`asof_join` with a match-age bound (pandas merge_asof's
    ``tolerance``): the selected partner must lie within ``tolerance``
    of the row's own timestamp (numeric ts-distance units — micros for
    timestamps, days for dates); stale matches drop (inner) or null
    out (left)."""
    return _wrap(left, _facade(left).asofJoinWithin(
        left._jdf, right._jdf, keys, left_ts_col, right_ts_col,
        int(tolerance), join_type, direction))


def asof_join_bucketed(left, right, keys="user_id", left_ts="ts",
                       right_ts="ts", bucket_width=3600.0,
                       join_type="inner"):
    """Hot-key-safe as-of join: identical result to ``asof_join`` but
    every key is split by floor(ts / bucket_width) time buckets, so one
    pathologically hot key never lands on a single task."""
    return _wrap(left, _facade(left).asofJoinBucketed(
        left._jdf, right._jdf, keys, left_ts, right_ts, float(bucket_width),
        join_type))


def range_join(points, intervals, point_col="v", lo_col="lo", hi_col="hi",
               bucket_width=0.0, join_type="inner"):
    """Range (interval) join: every (point, interval) pair with
    ``lo <= v <= hi`` (inclusive) -- bucketed, no cartesian, neither side
    broadcast. ``join_type`` 'left' keeps unmatched points with null
    interval columns (no extra shuffle). ``bucket_width <= 0`` derives
    the width from interval statistics -- NOTE: that path runs an eager
    Spark job at CALL time (one slim stats aggregate over the interval
    bounds); pass an explicit width to stay fully lazy."""
    return _wrap(points, _facade(points).rangeJoin(
        points._jdf, intervals._jdf, point_col, lo_col, hi_col,
        float(bucket_width), join_type))


def hard_negatives(queries, candidates, id_col="vec_id",
                   vec_col="embedding", k=10, shortlist=100,
                   dup_threshold=0.95):
    """Hard-negative mining for contrastive training: per query, the k
    most similar candidates with cosine at or below ``dup_threshold``
    (near-dups are excluded, not re-labeled), drawn from the exact
    top-``shortlist`` neighbors and re-ranked."""
    return _wrap(queries, _facade(queries).hardNegatives(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k),
        int(shortlist), float(dup_threshold)))


def overlap_join(left, right, left_lo="alo", left_hi="ahi", right_lo="blo",
                 right_hi="bhi", bucket_width=1.0, join_type="inner"):
    """Interval-overlap join: every (left, right) pair whose closed
    intervals intersect (touching endpoints match) — bucket PBSM with
    first-shared-bucket dedup, no cartesian. ``join_type`` 'left' keeps
    unmatched left intervals with null right columns."""
    return _wrap(left, _facade(left).overlapJoin(
        left._jdf, right._jdf, left_lo, left_hi, right_lo, right_hi,
        float(bucket_width), join_type))


# --- similarity search ---------------------------------------------------

def cosine_top_k(queries, candidates, id_col="vec_id", vec_col="embedding",
                 k=10):
    """Exact brute-force cosine top-k (qid, cid, cos_r6, rnk)."""
    return _wrap(queries, _facade(queries).cosineTopK(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k)))


def lsh_cosine_top_k(queries, candidates, id_col="vec_id",
                     vec_col="embedding", k=10, planes=8, tables=4):
    """Approximate top-k via random-hyperplane LSH buckets."""
    return _wrap(queries, _facade(queries).lshCosineTopK(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k),
        int(planes), int(tables)))


def ivf_top_k(queries, candidates, id_col="vec_id", vec_col="embedding",
              k=10, nlist=16, nprobe=4):
    """Approximate top-k via IVF cells (id-sample quantizer)."""
    return _wrap(queries, _facade(queries).ivfTopK(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k),
        int(nlist), int(nprobe)))


def train_centroids(candidates, id_col="vec_id", vec_col="embedding",
                    nlist=16, iters=5):
    """Deterministic spherical k-means for the IVF coarse quantizer:
    one (cell, vec_col) row per centroid."""
    return _wrap(candidates, _facade(candidates).trainCentroids(
        candidates._jdf, id_col, vec_col, int(nlist), int(iters)))


def ivf_top_k_with(queries, candidates, centroids, id_col="vec_id",
                   vec_col="embedding", k=10, nprobe=4):
    """IVF top-k with explicit (trained) centroids."""
    return _wrap(queries, _facade(queries).ivfTopKWith(
        queries._jdf, candidates._jdf, centroids._jdf, id_col, vec_col,
        int(k), int(nprobe)))


def pq_top_k(queries, candidates, id_col="vec_id", vec_col="embedding",
             k=10, m=8, ksub=16, iters=2, shortlist=0):
    """Product-quantization ANN: train per-subspace codebooks on the
    candidates, ADC-scan the m-byte codes, exact-re-rank the per-query
    shortlist. ``shortlist<=0`` re-ranks everything (structurally exact);
    a bounded shortlist is the production shape. Scores are exact
    cosines either way."""
    return _wrap(queries, _facade(queries).pqTopK(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k),
        int(m), int(ksub), int(iters), int(shortlist)))


def ivf_pq_top_k(queries, candidates, id_col="vec_id", vec_col="embedding",
                 k=10, nlist=8, m=8, ksub=16, iters=2, nprobe=2,
                 shortlist=0):
    """Composed IVF+PQ ANN (the FAISS ``IVFx,PQy`` shape): the inverted
    file restricts WHICH candidates are scanned (``nprobe`` of
    ``nlist`` cells per query), PQ codes restrict WHAT is scanned, the
    exact re-rank keeps emitted cosines exact. ``nprobe=nlist`` +
    ``shortlist<=0`` is structurally exact."""
    return _wrap(queries, _facade(queries).ivfPqTopK(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k),
        int(nlist), int(m), int(ksub), int(iters), int(nprobe),
        int(shortlist)))


# --- text analysis -------------------------------------------------------

def text_profile(df, id_col="doc_id", text_col="text", unicode_tokens=False):
    """Per-document profile: n_tokens, bpe_tokens, len_chars,
    avg_token_len, stopword_ratio, distinct_ratio, lang, fingerprint.
    ``unicode_tokens=True`` tokenizes on runs of ANY Unicode whitespace
    (tab / newline / NBSP / ideographic space) instead of the default
    literal single-space split -- the opt-in for corpora that are not
    single-space delimited."""
    fac = _facade(df)
    jdf = (fac.textProfileUnicode(df._jdf, id_col, text_col)
           if unicode_tokens else fac.textProfile(df._jdf, id_col, text_col))
    return _wrap(df, jdf)


def vocabulary(df, id_col="doc_id", text_col="text"):
    """Corpus vocabulary statistics: (token, doc_freq, total_freq)."""
    return _wrap(df, _facade(df).vocabulary(df._jdf, id_col, text_col))


def pack_sequences(df, id_col="doc_id", text_col="text", budget=2048,
                   target_groups=4096):
    """Greedy sequence packing for training-sequence layout:
    (id_col, n_tokens, bin_id, bin_offset) -- documents concatenate in
    id order and the token stream cuts every ``budget`` tokens (a doc
    may straddle a cut). Runs one eager min/max/count stats job at call
    time."""
    return _wrap(df, _facade(df).packSequences(
        df._jdf, id_col, text_col, int(budget), int(target_groups)))


def redact_pii(df, text_col="text", out_col="redacted"):
    """Redact PII-shaped spans (emails, IPv4 literals, 13+-char digit
    runs) with typed placeholders <EMAIL>/<IP>/<NUM>."""
    return _wrap(df, _facade(df).redactPii(df._jdf, text_col, out_col))


def token_chunks(df, id_col="doc_id", text_col="text", chunk=512, overlap=64):
    """Sliding token-window chunks for context-window packing:
    (id_col, chunk_index, chunk, n_tokens); the final chunk clips at the
    document end, documents shorter than one chunk yield themselves."""
    return _wrap(df, _facade(df).tokenChunks(
        df._jdf, id_col, text_col, int(chunk), int(overlap)))


def tfidf_top_m(df, id_col="doc_id", text_col="text", m=5):
    """TF-IDF top-m terms per document: (id_col, token, tfidf_r6, rnk)
    with tfidf_r6 = round(tf * ln(N / df), 6); rank orders by
    (tfidf_r6 desc, token)."""
    return _wrap(df, _facade(df).tfidfTopM(df._jdf, id_col, text_col, int(m)))


def normalize_text(df, text_col="text", out_col="text_norm"):
    """Dedup-keying normalization (the C4/CCNet step before exact/near
    dedup): ASCII-lowercase, every char outside [a-z0-9 ] -> space,
    whitespace runs collapsed, trimmed. Compose with exact_canon on the
    normalized column to catch case/punctuation variants."""
    return _wrap(df, _facade(df).normalizeText(df._jdf, text_col, out_col))


def group_quantiles(df, group_cols="source", value_col="n_chars",
                    qs=(50, 90, 99)):
    """Exact per-group order statistics over a VALUE HISTOGRAM (the rank
    window runs over distinct values per group, never data rows):
    (group_cols..., n, min_<v>, max_<v>, p<q>...). p<q> is the smallest
    value whose cumulative count c satisfies 100*c >= q*n."""
    return _wrap(df, _facade(df).groupQuantiles(
        df._jdf, group_cols, value_col, [int(q) for q in qs]))


def hot_phrases(df, stratum_col="source", text_col="text", n=3, k=5, min_df=2):
    """Hot-phrase mining (boilerplate discovery): the k n-grams contained
    in the most documents per stratum, with document frequency ->
    (stratum_col, rank, phrase, df); rank orders by (df desc, phrase)."""
    return _wrap(df, _facade(df).hotPhrases(
        df._jdf, stratum_col, text_col, int(n), int(k), int(min_df)))


def bm25_top_k(queries, corpus, q_id_col="qid", q_text_col="qtext",
               id_col="doc_id", text_col="text", k=10, k1=1.2, b=0.75):
    """BM25 top-k lexical retrieval: score `corpus` documents against
    each query (Okapi BM25, Lucene non-negative idf, distinct query
    terms) -> (q_id_col, id_col, bm25_r6, rnk), k best docs per query,
    rank ordered by (score desc, id asc)."""
    return _wrap(corpus, _facade(corpus).bm25TopK(
        queries._jdf, corpus._jdf, q_id_col, q_text_col, id_col, text_col,
        int(k), float(k1), float(b)))


def bigram_lm_score(df, id_col="doc_id", text_col="text", ref=None,
                    ref_text_col=None, min_count=1):
    """CCNet-style bigram-LM quality score: train an add-one bigram LM
    on `ref` (default: df itself; vocabulary tail below min_count maps
    to '<unk>'), then score each document's average bigram
    log-probability -> (id_col, n_bigrams, bi_logp_r6); docs with < 2
    tokens score 0.0. Low scores flag boilerplate/keyword-stuffing."""
    ref = df if ref is None else ref
    ref_text_col = text_col if ref_text_col is None else ref_text_col
    return _wrap(df, _facade(df).bigramLmScore(
        df._jdf, id_col, text_col, ref._jdf, ref_text_col, int(min_count)))


def repetition_profile(df, id_col="doc_id", text_col="text", top_n=2, dup_n=5):
    """Gopher-family repetition quality filter: (doc, n_tokens,
    top_frac, dup_frac) — coverage of the most frequent top_n-gram and
    of all duplicated dup_n-grams; short docs pass through with 0.0."""
    return _wrap(df, _facade(df).repetitionProfile(
        df._jdf, id_col, text_col, int(top_n), int(dup_n)))


def corpus_profile(df, text_col="text"):
    """Per-language corpus report: (lang_pred, n_docs, total_tokens,
    max_tokens, p50_tokens, p90_tokens). Quantiles are explicit-rank
    order statistics computed over a token-count histogram (the window
    runs over distinct lengths, never documents)."""
    return _wrap(df, _facade(df).corpusProfile(df._jdf, text_col))


def train_quality_score(df, id_col="doc_id", text_col="text",
                        label_col="label", iters=20, lr=1.0, l2=0.0):
    """Train a logistic quality classifier on the standard 4-feature
    text profile against a 0/1 label column and score every row:
    (id, label, q_score in [0,1]). Each training iteration is one
    map-side-combined gradient aggregation; only the 5-element gradient
    reaches the driver."""
    return _wrap(df, _facade(df).trainQualityScore(
        df._jdf, id_col, text_col, label_col, int(iters), float(lr),
        float(l2)))


def decontaminate(corpus, bench, id_col="doc_id", text_col="text",
                  bench_text_col="text", k=40, broadcast_bench=True):
    """Benchmark decontamination: corpus docs sharing a verbatim k-token
    run with `bench`, as (doc, hits, max_span). Anti-join the corpus on
    `doc` for the clean split. With broadcast_bench the corpus side
    never shuffles (the benchmark collapses to a broadcast digest set)."""
    return _wrap(corpus, _facade(corpus).decontaminate(
        corpus._jdf, id_col, text_col, bench._jdf, bench_text_col,
        int(k), bool(broadcast_bench)))


def decontaminate_bloom(corpus, bench, id_col="doc_id", text_col="text",
                        bench_text_col="text", k=40,
                        expected_items=1000000, fpp=0.01):
    """Bloom-prefiltered decontamination: distinct contaminated doc ids
    as (doc). The corpus probes a broadcast bloom over the benchmark's
    k-token window digests MAP-SIDE (no corpus shuffle before the
    filter); an exact verify join removes every bloom false positive, so
    the output is identical to an exact digest join at any fpp. Builds
    the filter eagerly (one Spark job at call time)."""
    return _wrap(corpus, _facade(corpus).decontaminateBloom(
        corpus._jdf, id_col, text_col, bench._jdf, bench_text_col,
        int(k), int(expected_items), float(fpp)))


def decontam_overlap(corpus, bench, id_col="doc_id", text_col="text",
                     bench_text_col="text", n=8, theta=0.1,
                     broadcast_bench=True):
    """N-gram overlap-fraction decontamination report: per corpus doc,
    (doc, n_grams, n_hit, frac, contaminated) over its DISTINCT word
    n-grams vs the benchmark's digest set."""
    return _wrap(corpus, _facade(corpus).decontamOverlap(
        corpus._jdf, id_col, text_col, bench._jdf, bench_text_col,
        int(n), float(theta), bool(broadcast_bench)))


def segment_dedup(df, id_col="doc_id", text_col="text", seg=16):
    """C4-style segment-level dedup: split docs into seg-token segments,
    keep only the global first occurrence of each distinct segment, and
    reassemble docs as (doc, text_clean, n_kept, n_dropped)."""
    return _wrap(df, _facade(df).segmentDedup(df._jdf, id_col, text_col,
                                              int(seg)))


def semantic_dedup(df, id_col="vec_id", vec_col="embedding", k=16, tau=0.7):
    """SemDeDup-style semantic dedup over an embedding column:
    (doc, cluster, is_dup) — deterministic md5-sampled seed cells,
    duplicate iff a smaller-id cell-mate has cosine >= tau."""
    return _wrap(df, _facade(df).semanticDedup(df._jdf, id_col, vec_col,
                                               int(k), float(tau)))


def link_blocked_pairs(df, id_col, name_col, block_key_expr, max_dist=2,
                       max_block=0):
    """Blocking-based record linkage: within-block Levenshtein pairs
    (id_i, id_j, dist). block_key_expr is a SQL expression (e.g.
    "split(name, ' ')[0]"); max_block > 0 drops larger blocks before
    pairing (skew guard)."""
    return _wrap(df, _facade(df).linkBlockedPairs(
        df._jdf, id_col, name_col, block_key_expr, int(max_dist),
        int(max_block)))


def group_approx_quantiles(df, group_cols="source", value_col="n_chars",
                           qs=(50, 90, 99), accuracy=10000):
    """Approximate (Greenwald-Khanna) per-group percentiles for
    continuous value columns: group cols + n + ap<q> columns. Estimates
    are actual group elements with rank within n/accuracy of target."""
    if isinstance(group_cols, str):
        group_cols = [group_cols]
    return _wrap(df, _facade(df).groupApproxQuantiles(
        df._jdf, ",".join(group_cols), value_col,
        ",".join(str(int(q)) for q in qs), int(accuracy)))


def exact_canon_by(df, id_col="doc_id", text_col="text", score_col="q",
                   descending=True):
    """exact_canon with a keep policy: the best-scored copy of each
    byte-identical text wins (keep the freshest recrawl / highest
    quality), ties to the smallest id; null scores never win."""
    return _wrap(df, _facade(df).exactCanonBy(df._jdf, id_col, text_col,
                                              score_col, bool(descending)))


def unigram_train(df, text_col="text", vocab_size=1000, max_piece_len=4):
    """Train a frequency-seeded unigram-LM tokenizer; returns the
    persistable (piece, lp_micro, max_piece_len, unk_micro) frame
    (write it as parquet, reload, and pass to the scoring calls)."""
    return _wrap(df, _facade(df).unigramTrain(df._jdf, text_col,
                                              int(vocab_size),
                                              int(max_piece_len)))


def unigram_em_refine(df, pieces, text_col="text"):
    """One Viterbi-EM refinement round: re-segment the corpus under the
    pieces frame, recount best-path vocabulary pieces weighted by word
    frequency, re-normalize log-probs; returns the refined frame."""
    return _wrap(df, _facade(df).unigramEmRefine(df._jdf, text_col,
                                                 pieces._jdf))


def unigram_em_train(df, pieces, text_col="text", rounds=1):
    """Run N Viterbi-EM rounds from a pieces frame, recording the exact
    micro-nat corpus log-likelihood before and after every round.
    Returns the ModelStore.saveUnigram artifact shape — (kind, idx,
    piece, value) rows: kind 'piece' carries the refined model, 'meta'
    its constants, 'll' the trajectory (idx 0 = seed score; hard EM is
    monotone non-decreasing). Persist the frame as-is; reload with
    ModelStore.loadUnigram on the JVM side."""
    return _wrap(df, _facade(df).unigramEmTrain(df._jdf, text_col,
                                                pieces._jdf, int(rounds)))


def unigram_word_scores(df, pieces, word_col="word"):
    """Integer-Viterbi best-segmentation scores per word under a
    trained pieces frame: (word, score_micro, n_pieces)."""
    return _wrap(df, _facade(df).unigramWordScores(df._jdf, word_col,
                                                   pieces._jdf))


def unigram_token_count(df, pieces, id_col="doc_id", text_col="text"):
    """Per-document trained-subword counts under a unigram pieces
    frame — the BPE token-budget twin."""
    return _wrap(df, _facade(df).unigramTokenCount(df._jdf, id_col,
                                                   text_col, pieces._jdf))


def drift_report(a, b, a_text_col="text", b_text_col="text", buckets=4096,
                 ns=(1,)):
    """Corpus drift, localized: per hashed-gram bucket
    (bucket, c_a, c_b, lr_micro) — micro-nat add-one-smoothed log
    ratios; top-|lr| rows show WHERE the distribution moved."""
    return _wrap(a, _facade(a).driftReport(
        a._jdf, a_text_col, b._jdf, b_text_col, int(buckets),
        ",".join(str(int(n)) for n in ns)))


def drift_summary(a, b, a_text_col="text", b_text_col="text", buckets=4096,
                  ns=(1,)):
    """Corpus drift, one row: (n_grams_a, n_grams_b, kl_ab_micro,
    tvd_num, tvd_r6) — KL(A||B) in integer micro-nats + exact
    total-variation distance between snapshots."""
    return _wrap(a, _facade(a).driftSummary(
        a._jdf, a_text_col, b._jdf, b_text_col, int(buckets),
        ",".join(str(int(n)) for n in ns)))


def zorder_by(df, cols, partitions, bits=16):
    """Z-order (Morton-curve) layout rewrite on integer columns: same
    rows, clustered partitioning — per-file min/max stats become tight
    on EVERY listed column, so format-level data skipping prunes
    multi-predicate scans. The Delta/Iceberg OPTIMIZE ZORDER shape."""
    if isinstance(cols, str):
        cols = [cols]
    return _wrap(df, _facade(df).zorderBy(df._jdf, ",".join(cols),
                                          int(partitions), int(bits)))


def build_minhash_index(df, id_col="doc_id", text_col="text", n=3,
                        num_hashes=32):
    """Persistable MinHash corpus index (doc, sh, sig): signature
    extraction paid once; save with save_minhash_index and probe new
    batches with minhash_pairs_vs_index."""
    return _wrap(df, _facade(df).buildMinhashIndex(df._jdf, id_col, text_col,
                                                   int(n), int(num_hashes)))


def save_minhash_index(index, path):
    """Persist a MinHash index as parquet (natural partitioning)."""
    _facade(index).saveMinhashIndex(index._jdf, path)


def load_minhash_index(anchor_df, path):
    """Reload a MinHash index artifact (anchor_df supplies the session)."""
    return _wrap(anchor_df, _facade(anchor_df).loadMinhashIndex(
        anchor_df._jdf, path))


def minhash_pairs_vs_index(left, index, id_col="doc_id", text_col="text",
                           tau=0.8, band_rows=2):
    """Near-dup pairs of a new batch against a prebuilt (usually
    reloaded) index: (doc_i from left, doc_j from index, exact jaccard).
    Shingle size and signature width derive FROM the index."""
    return _wrap(left, _facade(left).minhashPairsVsIndex(
        left._jdf, id_col, text_col, index._jdf, float(tau), int(band_rows)))


def append_minhash_index(delta, path, id_col="doc_id", text_col="text"):
    """Delta-append a batch's index rows to the SAVED index at ``path``
    — parameters derive from the saved head row, compute and I/O are
    proportional to the delta (the corpus files are never rewritten)."""
    _facade(delta).appendMinhashIndex(delta._jdf, path, id_col, text_col)


def compact_minhash_index(index):
    """Collapse exact-duplicate rows left by unchanged re-ingests
    (periodic maintenance; full-row distinct)."""
    return _wrap(index, _facade(index).compactMinhashIndex(index._jdf))


def temperature_sample(df, key_col, stratum_col, alpha=0.5):
    """Temperature sampling: stratum shares proportional to
    count^alpha (alpha=0.5 = classic square-root multilingual
    rebalance). Binding stratum keeps 100%; larger strata downsample
    via deterministic md5-prefix thresholds — no RNG."""
    return _wrap(df, _facade(df).temperatureSample(
        df._jdf, key_col, stratum_col, float(alpha)))


def importance_weights(raw, target, id_col="doc_id", text_col="text",
                       target_text_col="text", buckets=4096, ns=(1, 2)):
    """DSIR-style hashed-n-gram importance weights: per raw doc,
    (doc, n_feats, logratio_micro) — the micro-nat log-likelihood ratio
    of the doc's hashed gram features under the target vs raw
    distributions. Filter / quota-select on the score downstream."""
    return _wrap(raw, _facade(raw).importanceWeights(
        raw._jdf, id_col, text_col, target._jdf, target_text_col,
        int(buckets), ",".join(str(int(n)) for n in ns)))


def quota_top_k(df, stratum_cols, score_col, id_col="doc_id", k=10,
                descending=True):
    """Deterministic quota sampling: the k best rows per stratum by a
    numeric score, ties broken by ascending id — stratum cols +
    (rank, id, score). O(k) state per stratum at every stage (no
    per-stratum window sort), so a dominant domain cannot straggle."""
    if isinstance(stratum_cols, str):
        stratum_cols = [stratum_cols]
    return _wrap(df, _facade(df).quotaTopK(
        df._jdf, list(stratum_cols), score_col, id_col, int(k),
        bool(descending)))


def hash_sample(df, key_col, stratum_col, thresholds):
    """Deterministic content-hash rate sampling: keep a row iff the
    first 4 hex chars of md5(key) sort below thresholds[stratum]
    (keep-rate = int(threshold, 16) / 65536); unlisted strata drop."""
    return _wrap(df, _facade(df).hashSample(
        df._jdf, key_col, stratum_col, dict(thresholds)))


def mixture_sample(df, key_col, stratum_col, weights):
    """Downsample strata so the output composition matches target
    mixture weights (e.g. {"web": 6, "code": 3, "books": 1}): the
    binding stratum keeps 100%, everything else downsamples to
    proportion via the deterministic content-hash rule; unlisted strata
    drop. Runs one strata-sized counting job at call time."""
    jw = {k: float(v) for k, v in weights.items()}
    return _wrap(df, _facade(df).mixtureSample(
        df._jdf, key_col, stratum_col, jw))


def split_by_hash(df, key_col, splits, out_col="split"):
    """Deterministic dataset split: append `out_col` labelling each row
    train/val/test/... from the md5 prefix of `key_col` — reproducible
    across runs, engines and incremental batches (the alternative to
    randomSplit). `splits` is an ORDERED list of (label, weight) pairs,
    e.g. [("train", 0.8), ("val", 0.1), ("test", 0.1)]."""
    labels = [str(l) for l, _ in splits]
    weights = [float(w) for _, w in splits]
    return _wrap(df, _facade(df).splitByHash(
        df._jdf, key_col, labels, weights, out_col))


def group_split(df, pairs, id_col="doc_id", splits=None, out_col="split"):
    """Leakage-safe dataset split: near-duplicate connected components
    (from any pair frame — minhash_pairs, jaccard_pairs, ...) move as
    ONE unit, so no near-dup pair straddles train/test. `splits` as in
    :func:`split_by_hash` (default 80/10/10)."""
    splits = splits or [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    labels = [str(l) for l, _ in splits]
    weights = [float(w) for _, w in splits]
    return _wrap(df, _facade(df).groupSplit(
        df._jdf, id_col, pairs._jdf, labels, weights, out_col))


def curate(df, id_col="doc_id", text_col="text", lang="en", min_tokens=5,
           min_distinct_ratio=0.3):
    """Profile -> language/length/degeneracy filter -> canonical-only
    exact dedup, one Catalyst plan (the `pipeline_curate` gate path).
    Output: (id, text, n_tokens, stop_ratio, distinct_ratio, lang_pred),
    canonical rows only."""
    return _wrap(df, _facade(df).curate(df._jdf, id_col, text_col, lang,
                                        int(min_tokens),
                                        float(min_distinct_ratio)))


# --- multimodal ----------------------------------------------------------

def with_decoded_meta(df, content_col="content", codec="stub"):
    """Append the typed `meta` struct decoded partition-wise.
    codec='imageio' uses the REAL pure-JDK codec (PNG/JPEG/BMP/GIF via
    javax.imageio, WAV/AIFF via javax.sound); 'bmp'/'wav' are the real
    hand-rolled uncompressed codecs; 'avi' the real MJPEG-in-AVI
    demuxing codec; 'mp4' the real ISO-BMFF metadata box walk (frame
    decode stays behind the ffmpeg seam); 'stub' keeps the
    oracle-replayable fake-header codec."""
    return _wrap(df, _facade(df).withDecodedMeta(df._jdf, content_col,
                                                 codec))


def resize_images(df, content_col="content", w=224, h=224, codec="stub"):
    """Resize image assets; codec='imageio' re-encodes real pixels."""
    return _wrap(df, _facade(df).resizeImages(df._jdf, content_col,
                                              int(w), int(h), codec))


def downsample_audio(df, content_col="content", factor=2, codec="wav"):
    """Decimate audio assets by an integer factor (keep every k-th
    sample, divide the rate by k — duration preserved). codec='wav'
    is the real PCM codec that owns samples; non-audio rows and
    payloads the codec cannot decimate pass through unchanged."""
    return _wrap(df, _facade(df).downsampleAudio(
        df._jdf, content_col, int(factor), codec))


def sample_frames(df, id_col="doc_id", content_col="content",
                  frame_bytes=256, every_n=2):
    return _wrap(df, _facade(df).sampleFrames(
        df._jdf, id_col, content_col, int(frame_bytes), int(every_n)))


def demux_frames(df, id_col="doc_id", content_col="content",
                 every_n=1, codec="avi"):
    """Demux every `every_n`-th REAL container frame payload
    (codec-determined boundaries; one JPEG per row for MJPEG-in-AVI) as
    (asset_id, frame_index, frame) rows; non-video payloads emit no
    rows. Compose with image_tile_stats/image_hash for per-frame pixel
    work."""
    return _wrap(df, _facade(df).demuxFrames(
        df._jdf, id_col, content_col, int(every_n), codec))


def byte_histogram(df, content_col="content", out_col="histogram"):
    return _wrap(df, _facade(df).byteHistogram(df._jdf, content_col, out_col))


# --- streaming-unified ---------------------------------------------------

def first_per_content(df, text_col="text", ts_col="ts"):
    """First row per byte-identical content (works on batch and
    streaming frames — streaming keeps watermark-bounded state)."""
    return _wrap(df, _facade(df).firstPerContent(df._jdf, text_col, ts_col))


def first_per_normalized(df, text_col="text", ts_col="ts",
                         watermark="10 minutes"):
    """First row per NORMALIZED content (C4-style lowercase/punctuation
    collapse as the dedup key; original text kept). Batch and
    streaming."""
    return _wrap(df, _facade(df).firstPerNormalized(
        df._jdf, text_col, ts_col, watermark))


def sliding_windows(events, width="1 hour", slide="15 minutes", ts_col="ts",
                    type_col="event_type", value_col="value",
                    watermark="2 hours"):
    """Sliding-window counts and exact value sums per event type
    (batch/stream unified): every event contributes to width/slide
    overlapping windows -> (win_ts, event_type, cnt, sum_value)."""
    return _wrap(events, _facade(events).slidingWindows(
        events._jdf, width, slide, ts_col, type_col, value_col, watermark))


def event_sessions(events, ts_col="ts", key_col="user_id",
                   value_col="value", gap="12 hours", watermark="1 day"):
    """Gap-based session windows (batch/stream unified)."""
    return _wrap(events, _facade(events).eventSessions(
        events._jdf, ts_col, key_col, value_col, gap, watermark))


def interval_join(left, right, key_col, left_ts_col, right_ts_col,
                  upper, lower="0 seconds", watermark="1 hour"):
    """Event-time interval join (batch/stream unified): pair left events
    with same-key right events whose timestamp lies in
    [left_ts + lower, left_ts + upper]. On streams both sides are
    watermarked and the two-sided bound keeps join state evictable.
    Frames must not share non-key column names."""
    return _wrap(left, _facade(left).intervalJoin(
        left._jdf, right._jdf, key_col, left_ts_col, right_ts_col,
        upper, lower, watermark))


# --- trained-state persistence -------------------------------------------

def train_and_save_centroids(candidates, path, id_col="vec_id",
                             vec_col="embedding", nlist=16, iters=5):
    """Train IVF centroids and persist the parquet artifact at ``path``;
    returns the centroid frame that was saved."""
    return _wrap(candidates, _facade(candidates).trainAndSaveCentroids(
        candidates._jdf, id_col, vec_col, int(nlist), int(iters), path))


def load_centroids(anchor, path):
    """Reload a centroid artifact (feed to :func:`ivf_top_k_with`).
    ``anchor`` is any DataFrame of the target session."""
    return _wrap(anchor, _facade(anchor).loadCentroids(anchor._jdf, path))


def train_and_save_pq(candidates, path, id_col="vec_id",
                      vec_col="embedding", m=8, ksub=16, iters=2):
    """Train PQ codebooks and persist them at ``path``."""
    _facade(candidates).trainAndSavePq(
        candidates._jdf, id_col, vec_col, int(m), int(ksub), int(iters), path)


def pq_top_k_from_artifact(queries, candidates, path, id_col="vec_id",
                           vec_col="embedding", k=10, shortlist=0):
    """PQ ANN served from a RELOADED codebook artifact — the
    train-once-score-for-months path. ``shortlist<=0`` = unbounded."""
    return _wrap(queries, _facade(queries).pqTopKFromArtifact(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k), path,
        int(shortlist)))


def train_and_save_bigram_lm(ref, path, ref_text_col="text", min_count=1):
    """Train an add-one bigram LM on ``ref`` and persist its count
    tables (vocab/bigrams/contexts parquet) at ``path``."""
    _facade(ref).trainAndSaveBigramLm(ref._jdf, ref_text_col,
                                      int(min_count), path)


def bigram_lm_score_from_artifact(df, path, id_col="doc_id",
                                  text_col="text"):
    """Bigram-LM scoring from a RELOADED artifact — identical output to
    :func:`bigram_lm_score` trained fresh on the same reference."""
    return _wrap(df, _facade(df).bigramLmScoreFromArtifact(
        df._jdf, id_col, text_col, path))


def train_and_save_quality_model(df, path, id_col="doc_id",
                                 text_col="text", label_col="y",
                                 iters=20, lr=1.0, l2=0.0):
    """Train a logistic quality model on the standard 4-feature profile
    and persist weights + bias + loss trajectory at ``path``."""
    _facade(df).trainAndSaveQualityModel(
        df._jdf, id_col, text_col, label_col, int(iters), float(lr),
        float(l2), path)


def quality_score_from_artifact(df, path, id_col="doc_id",
                                text_col="text"):
    """Quality scoring from a RELOADED weight artifact:
    (id_col, q_score)."""
    return _wrap(df, _facade(df).qualityScoreFromArtifact(
        df._jdf, id_col, text_col, path))


# --- corpus-trained BPE --------------------------------------------------

def bpe_train(df, text_col="text", rounds=32):
    """Learn a BPE merge table from the corpus' word-frequency
    distribution: (merge_rank, lft, rgt, pair_cnt). Persist it as
    parquet and feed it back to the serving calls below. The training
    histogram is capped at 1,000,000 distinct words by default (the
    scale-safe mode) — use :func:`bpe_train_capped` to pick the cap, or
    ``train_and_save_bpe(..., max_words=0)`` for unbounded exact
    training."""
    return _wrap(df, _facade(df).bpeTrain(df._jdf, text_col, int(rounds)))


def bpe_train_capped(df, text_col="text", rounds=32, max_words=1 << 20):
    """:func:`bpe_train` with the open-vocabulary histogram cap: the
    greedy loop trains on the top ``max_words`` distinct words by
    (count desc, word asc) — the frequency-pruned training corpus a
    100 TB text table needs."""
    return _wrap(df, _facade(df).bpeTrainCapped(df._jdf, text_col,
                                                int(rounds), int(max_words)))


def bpe_segment(df, merges, id_col="doc_id", text_col="text"):
    """Trained-subword tokens per document: (id_col, subwords)."""
    return _wrap(df, _facade(df).bpeSegment(df._jdf, id_col, text_col,
                                            merges._jdf))


def bpe_counts(df, merges, id_col="doc_id", text_col="text"):
    """Trained-subword counts per document: (id_col, n_bpe)."""
    return _wrap(df, _facade(df).bpeCounts(df._jdf, id_col, text_col,
                                           merges._jdf))


def pack_sequences_bpe(df, merges, id_col="doc_id", text_col="text",
                       budget=2048, target_groups=4096):
    """:func:`pack_sequences` billing REAL trained subwords against the
    budget — the production token-budget shape."""
    return _wrap(df, _facade(df).packSequencesBpe(
        df._jdf, id_col, text_col, int(budget), merges._jdf,
        int(target_groups)))


def corpus_sketch(df, strata="source", text_col="text", rsd=0.05):
    """HLL-sketch corpus statistics per stratum (the cheap 100 TB first
    pass): (strata..., n_docs, approx_distinct_content, total_tokens,
    approx_distinct_tokens). ``strata`` is a CSV of column names."""
    return _wrap(df, _facade(df).corpusSketch(df._jdf, strata, text_col,
                                              float(rsd)))


# --- round-7c additions --------------------------------------------------

def jaccard_pairs_prefix(df, id_col="doc_id", text_col="text", tau=0.8, n=3):
    """Prefix-filtered exact Jaccard pairs (SSJoin/PPJoin): identical
    output to :func:`jaccard_pairs`, hot-shingle-safe without a lossy
    ``max_doc_freq`` cap."""
    return _wrap(df, _facade(df).jaccardPairsPrefix(
        df._jdf, id_col, text_col, float(tau), int(n)))


def phrase_hits(df, phrases, id_col="doc_id", text_col="text"):
    """Exact positional phrase search: (doc, phrase, hits, first_pos)
    with 0-based token offsets; ``phrases`` is a list of needle
    strings (tokenized with the corpus tokenizer)."""
    return _wrap(df, _facade(df).phraseHits(
        df._jdf, id_col, text_col, [str(p) for p in phrases]))


def snapshot_diff(old_df, new_df, id_col="doc_id", text_col="text"):
    """Corpus snapshot diff: (id, status in added|removed|changed);
    unchanged rows dropped (delta-sized output)."""
    return _wrap(old_df, _facade(old_df).snapshotDiff(
        old_df._jdf, new_df._jdf, id_col, text_col))


def snapshot_diff_summary(old_df, new_df, id_col="doc_id", text_col="text"):
    """Per-status rollup of :func:`snapshot_diff`: (status, n)."""
    return _wrap(old_df, _facade(old_df).snapshotDiffSummary(
        old_df._jdf, new_df._jdf, id_col, text_col))


def cms_build(df, text_col="text", depth=4, width=1024):
    """Count-min sketch of token frequencies: (r, bucket, cnt) —
    depth*width rows regardless of corpus size. ``width`` must be a
    power of two (engine-exact md5 bucketing)."""
    return _wrap(df, _facade(df).cmsBuild(df._jdf, text_col,
                                          int(depth), int(width)))


def cms_estimate(sketch, probes, term_col="term", depth=4, width=1024):
    """CMS point-frequency estimates for probe terms: (term, est);
    never undercounts. Pass the build's depth/width."""
    return _wrap(probes, _facade(probes).cmsEstimate(
        sketch._jdf, probes._jdf, term_col, int(depth), int(width)))


def hashed_features(df, id_col="doc_id", text_col="text", dim=4096,
                    ns="1,2"):
    """Hashing-trick vectorizer: (doc, bucket, cnt) sparse rows over
    word n-gram occurrences; ``dim`` must be a power of two, ``ns`` a
    CSV of gram sizes."""
    return _wrap(df, _facade(df).hashedFeatures(df._jdf, id_col, text_col,
                                                int(dim), ns))


def strip_html(df, html_col="text", out_col="clean"):
    """HTML -> text extraction (script/style blocks dropped, tags
    flattened, six common entities decoded, whitespace collapsed)."""
    return _wrap(df, _facade(df).stripHtml(df._jdf, html_col, out_col))


def train_and_save_bpe(df, path, text_col="text", rounds=32,
                       max_words=1000000):
    """Train a BPE merge table and persist it as a single-file parquet
    artifact. The training histogram is capped at ``max_words``
    (default 1,000,000 — the scale-safe mode); ``max_words<=0`` opts in
    to the unbounded exact histogram."""
    _facade(df).trainAndSaveBpe(df._jdf, text_col, int(rounds),
                                int(max_words), path)


def bpe_counts_from_artifact(df, path, id_col="doc_id", text_col="text"):
    """Trained-subword counts under a reloaded merge-table artifact —
    must equal :func:`bpe_counts` with the fresh model."""
    return _wrap(df, _facade(df).bpeCountsFromArtifact(
        df._jdf, id_col, text_col, path))


def export_bpe_merges_txt(df, parquet_path, txt_path):
    """Export a parquet BPE artifact as a GPT-2/HuggingFace merges.txt
    ("#version: 0.2" header + rank-ordered "left right" lines) — the
    text artifact external tokenizer stacks load directly."""
    _facade(df).exportBpeMergesTxt(df._jdf, parquet_path, txt_path)


def bpe_counts_from_merges_txt(df, txt_path, id_col="doc_id",
                               text_col="text"):
    """Trained-subword counts served from an imported merges.txt —
    must equal :func:`bpe_counts_from_artifact` on the parquet twin."""
    return _wrap(df, _facade(df).bpeCountsFromMergesTxt(
        df._jdf, id_col, text_col, txt_path))


def train_and_save_int8(candidates, path, vec_col="embedding"):
    """Train int8 scalar-quantization params (per-dimension affine
    codes, 4x storage cut) and persist the (pos, lo, scale) artifact."""
    _facade(candidates).trainAndSaveInt8(candidates._jdf, vec_col, path)


def int8_top_k_from_artifact(queries, candidates, path, id_col="vec_id",
                             vec_col="embedding", k=10, shortlist=0):
    """Int8-shortlisted exact-rerank top-k from a RELOADED parameter
    artifact; shortlist <= 0 = unbounded (structurally exact)."""
    return _wrap(queries, _facade(queries).int8TopKFromArtifact(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k), path,
        int(shortlist)))


def train_and_save_binary(candidates, path, vec_col="embedding"):
    """Train binary (1-bit sign) quantization thresholds (per-dimension
    mean, 64x storage cut) and persist the (pos, thr) artifact."""
    _facade(candidates).trainAndSaveBinary(candidates._jdf, vec_col, path)


def binary_top_k_from_artifact(queries, candidates, path, id_col="vec_id",
                               vec_col="embedding", k=10, shortlist=0):
    """Binary-Hamming-shortlisted exact-rerank top-k from a RELOADED
    threshold artifact; shortlist <= 0 = unbounded (structurally exact)."""
    return _wrap(queries, _facade(queries).binaryTopKFromArtifact(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k), path,
        int(shortlist)))


def phrase_flagged(df, phrases, text_col="text", ts_col="ts",
                   watermark="10 minutes"):
    """Streaming-capable phrase monitor: flag rows whose text contains
    any needle phrase — one row per (distinct content, phrase), original
    columns + ``phrase``; works on batch frames too (plain dedup)."""
    return _wrap(df, _facade(df).phraseFlagged(
        df._jdf, text_col, ts_col, [str(p) for p in phrases], watermark))


def funnel_earliest_chain(events, steps, user_col="user_id", ts_col="ts",
                          type_col="event_type",
                          window_micros=2 * 3600 * 1000000):
    """Funnel analysis: per user, the earliest greedy chain through the
    ordered step event types (forward as-of folds) — step timestamps,
    steps_reached, converted-within-window."""
    return _wrap(events, _facade(events).funnelEarliestChain(
        events._jdf, user_col, ts_col, type_col,
        [str(s) for s in steps], int(window_micros)))


def expectations_table_rules(df, rules):
    """Row-level data-quality rules in ONE pass: ``rules`` is a list of
    (name, sql_bool_marking_bad_rows) pairs -> (rule, n_checked, n_bad,
    pass) report rows."""
    names = [str(n) for n, _ in rules]
    exprs = [str(e) for _, e in rules]
    return _wrap(df, _facade(df).expectationsTableRules(df._jdf, names, exprs))


def expectations_unique_key(df, keys, rule):
    """Exactly-once key expectation (surplus rows counted as bad)."""
    return _wrap(df, _facade(df).expectationsUniqueKey(df._jdf, keys, rule))


def expectations_referential(child, parent, child_keys, parent_keys, rule):
    """FK orphan expectation; null child keys are out of scope."""
    return _wrap(child, _facade(child).expectationsReferential(
        child._jdf, child_keys, parent._jdf, parent_keys, rule))


def scd2(df, key_col, ts_col, value_cols):
    """SCD2 change history: one row per value episode with
    valid_from/valid_to (null = current) and per-key version;
    ``value_cols`` is a CSV of tracked columns."""
    return _wrap(df, _facade(df).scd2(df._jdf, key_col, ts_col, value_cols))


def ab_two_proportions(df, unit_col="user_id", variant_col="variant",
                       success_col="converted"):
    """Two-proportion A/B test: one report row with per-variant unit
    and conversion counts plus the pooled z-statistic in micro-units
    (floor(1e6*z), engine-exact); a unit converts if ANY of its rows
    carries the success flag; exactly 2 variants required."""
    return _wrap(df, _facade(df).abTwoProportions(
        df._jdf, unit_col, variant_col, success_col))


def trailing_count(events, key_col="user_id", ts_col="ts",
                   window_micros=3600 * 1000000, out_prefix="trail"):
    """Trailing-window per-event feature: stamp every event with the
    count of the same key's events in ``[ts - window_micros, ts)`` —
    half-open, so the frame ends strictly before the event
    (leakage-free); one RANGE window, never an event-pair join."""
    return _wrap(events, _facade(events).trailingCount(
        events._jdf, key_col, ts_col, int(window_micros), out_prefix))


def trending_grams(df, ts_col="ts", text_col="text", n=2,
                   window_dur="1 minute", min_df=2, watermark="1 minute"):
    """Windowed trending n-grams: per tumbling event-time window, the
    document frequency of every word n-gram clearing ``min_df`` — one
    stateful aggregation, streaming-safe (append mode); on a batch
    frame the same plan runs without state."""
    return _wrap(df, _facade(df).trendingGrams(
        df._jdf, ts_col, text_col, int(n), window_dur, int(min_df),
        watermark))


def standardize(df, group_cols, value_col, out_col="z_micro"):
    """Per-group z-score standardization: ``floor(1e6 * (v - mean) /
    stddev)`` as an exact micro-unit integer (decimal moment sums,
    single-valued double finishing); zero-variance groups and null
    values get a null score. The value column must be integral —
    pre-scale continuous features to micro-units. ``group_cols`` is a
    CSV."""
    return _wrap(df, _facade(df).standardize(
        df._jdf, group_cols, value_col, out_col))


def cdc_apply(snapshot, changes, keys, ts_col="ts", op_col="op"):
    """CDC merge-apply (MERGE INTO): produce the next snapshot from the
    current one plus an upsert/delete change log — last-writer-wins per
    key over the (ts, op, payload) total order; ``keys`` is a CSV; the
    snapshot never windows, only the delta-sized winner set joins."""
    return _wrap(snapshot, _facade(snapshot).cdcApply(
        snapshot._jdf, changes._jdf, keys, ts_col, op_col))


def quantile_bins(df, group_cols, value_col, num_bins=4, out_col="bin"):
    """Equal-frequency quantile binning: every row stamped with its
    per-group bin in [0, num_bins) — histogram + distinct-value window
    + join-back, never an ntile data sort; ties share a bin; null
    values get a null bin. ``group_cols`` is a CSV."""
    return _wrap(df, _facade(df).quantileBins(
        df._jdf, group_cols, value_col, int(num_bins), out_col))


def retention_cohorts(events, user_col="user_id", ts_col="ts",
                      type_col="event_type", anchor_type="signup",
                      period_micros=7 * 24 * 3600 * 1000000):
    """Cohort retention matrix: users grouped by their earliest
    ``anchor_type`` period, distinct-active counts per (cohort_period,
    period_offset); pre-anchor events drop, exact integer period
    indexes."""
    return _wrap(events, _facade(events).retentionCohorts(
        events._jdf, user_col, ts_col, type_col, anchor_type,
        int(period_micros)))


def extract_urls(df, id_col="doc_id", text_col="text"):
    """URL extraction: exploded (id, url_idx, url, domain) rows —
    whitespace-delimited http(s) tokens in order, with lowercased
    www-stripped host keys for domain-level curation."""
    return _wrap(df, _facade(df).extractUrls(df._jdf, id_col, text_col))


def salted_join(left, right, keys, salt_factor=8, hot_keys=None,
                join_type="inner"):
    """Salted hot-key equi-join: result-identical to a plain join on
    ``keys`` (CSV), with hot-key probe rows spread over ``salt_factor``
    partitions (build rows replicated per salt). ``hot_keys`` is an
    optional DataFrame of exactly the key columns (e.g. a top-k) —
    without it the whole build side replicates."""
    hk = hot_keys._jdf if hot_keys is not None else None
    return _wrap(left, _facade(left).saltedJoin(
        left._jdf, right._jdf, keys, int(salt_factor), hk, join_type))


def write_bucketed(df, table, path, keys, num_buckets):
    """Write ``df`` as an external parquet table bucketed (and
    per-bucket sorted) on ``keys`` (CSV), one file per bucket — later
    equi-joins/aggregations on the keys plan with no exchange."""
    _facade(df).writeBucketed(df._jdf, table, path, keys, int(num_buckets))


def colocated_join(spark, left_table, right_table, keys, join_type="inner"):
    """Exchange-free equi-join of two co-bucketed tables on ``keys``
    (CSV); refuses mismatched bucket layouts instead of silently
    shuffling."""
    jdf = spark._jvm.graft.api.PyFacade.colocatedJoin(
        spark._jsparkSession, left_table, right_table, keys, join_type)
    return DataFrame(jdf, spark)


def compact_bucketed(spark, table, new_path):
    """Bin-pack a fragmented bucketed table back to one file per bucket
    at ``new_path`` (spec preserved, catalog swap only on success).
    Returns (files_before, files_after); the superseded location is the
    caller's to vacuum."""
    res = spark._jvm.graft.api.PyFacade.compactBucketed(
        spark._jsparkSession, table, new_path)
    return int(res[0]), int(res[1])


def compact_files(spark, path, out_path, sort_cols, target_files):
    """Range-clustered bin-pack of a plain sorted parquet directory
    (e.g. a :func:`zorder_by` layout): ``target_files`` files, each a
    contiguous slice of the sort order on ``sort_cols`` (CSV)."""
    res = spark._jvm.graft.api.PyFacade.compactFiles(
        spark._jsparkSession, path, out_path, sort_cols, int(target_files))
    return int(res[0]), int(res[1])


def table_location(spark, table):
    """The catalog table's current storage location (capture it BEFORE
    compacting; the rewrite swaps the registration to the new path)."""
    return str(spark._jvm.graft.api.PyFacade.tableLocation(
        spark._jsparkSession, table))


def vacuum(spark, location):
    """Delete a SUPERSEDED location returned by a compaction (refuses
    live-table paths loudly). Returns (files_removed, bytes_removed)."""
    res = spark._jvm.graft.api.PyFacade.vacuum(spark._jsparkSession, location)
    return int(res[0]), int(res[1])


def shards_assign(df, id_col, weight_col, num_shards):
    """Weight-balanced contiguous training-shard assignment: shard =
    (weight-before-this-row * num_shards) // total in ascending id
    order. Output columns: (id_col, weight, shard)."""
    return _wrap(df, _facade(df).shardsAssign(
        df._jdf, id_col, weight_col, int(num_shards)))


def shards_manifest(assigned):
    """Per-shard audit rollup (shard, n_rows, weight_sum) of
    :func:`shards_assign`'s output."""
    return _wrap(assigned, _facade(assigned).shardsManifest(assigned._jdf))


def write_shards(assigned, path, num_shards):
    """Land a shard assignment as ONE parquet file per shard directory
    under ``path/shard=<i>/``. Returns (shards, data_files, rows) —
    verify data_files == shards."""
    res = _facade(assigned).writeShards(assigned._jdf, path, int(num_shards))
    return int(res[0]), int(res[1]), int(res[2])


def point_in_time(facts, history, keys, fact_ts_col,
                  valid_from_col="valid_from", valid_to_col="valid_to",
                  join_type="inner"):
    """Point-in-time join (the :func:`scd2` read side): attach to each
    fact the episode valid at the fact's timestamp — features as-of
    label time, no future leakage; ``keys`` is a CSV. ``join_type``
    'inner' drops facts with no valid episode, 'left' keeps them with
    null episode columns."""
    return _wrap(facts, _facade(facts).pointInTime(
        facts._jdf, history._jdf, keys, fact_ts_col,
        valid_from_col, valid_to_col, join_type))


def sentences(df, id_col="doc_id", text_col="text"):
    """Sentence segmentation (RE2-replayable heuristic): exploded
    (id_col, sent_idx, sentence) rows, terminators kept."""
    return _wrap(df, _facade(df).sentences(df._jdf, id_col, text_col))


def top_values(df, value_col, k=10):
    """Hot-value skew diagnostic: the k most frequent values of a
    column with counts and ranks (ties: count desc, value asc)."""
    return _wrap(df, _facade(df).topValues(df._jdf, value_col, int(k)))


def curate_audit(df, id_col="doc_id", text_col="text", lang="en",
                 min_tokens=5, min_distinct_ratio=0.3):
    """Curation audit: every input row with (kept, reason) — reason is
    the first failing stage (lang/short/degenerate/duplicate) or
    'kept'; kept rows are exactly :func:`curate`'s survivors."""
    return _wrap(df, _facade(df).curateAudit(
        df._jdf, id_col, text_col, lang, int(min_tokens),
        float(min_distinct_ratio)))


def scd2_stream(df, key_col, ts_col, value_col, watermark="1 hour",
                idle_timeout_micros=3600 * 1000000):
    """Streaming SCD2 episodes (custom per-key state): closed episodes
    emit on value flips, open episodes finalize when the watermark
    passes the idle horizon; on a batch frame emits closed episodes."""
    return _wrap(df, _facade(df).scd2Stream(
        df._jdf, key_col, ts_col, value_col, watermark,
        int(idle_timeout_micros)))


def pagerank(edges, src_col="src", dst_col="dst", iterations=8,
             damping_num=85, damping_den=100, scale=1000000000000):
    """Fixed-point PageRank over a directed edge list: (node, pr_unit)
    with pr_unit in ``scale``:sup:`-1` integer units — bit-identical
    across engines and partitionings. Dangling nodes leak their damped
    mass (symmetrize the edge list if leakage matters)."""
    return _wrap(edges, _facade(edges).pageRank(
        edges._jdf, src_col, dst_col, int(iterations), int(damping_num),
        int(damping_den), int(scale)))


def personalized_pagerank(edges, seeds, src_col="src", dst_col="dst",
                          seed_col="id", iterations=8, damping_num=85,
                          damping_den=100, scale=1000000000000):
    """Personalized PageRank: teleport mass only to ``seeds`` rows —
    rank the graph from a trusted seed pool."""
    return _wrap(edges, _facade(edges).personalizedPageRank(
        edges._jdf, seeds._jdf, src_col, dst_col, seed_col,
        int(iterations), int(damping_num), int(damping_den), int(scale)))


def rrf_fusion(lists, qid_col="qid", id_col="doc_id", rank_col="rnk",
               k=10, rrf_k=60, unit=1000000):
    """Reciprocal-rank fusion of ranked retrieval lists (hybrid
    sparse+dense search): integer ``unit // (rrf_k + rank)``
    contributions summed per (qid, id), top-``k`` per query by
    (fused score desc, id asc)."""
    assert lists, "at least one ranked list required"
    return _wrap(lists[0], _facade(lists[0]).rrfFusion(
        [df._jdf for df in lists], qid_col, id_col, rank_col,
        int(k), int(rrf_k), int(unit)))


def cluster_canon_by(docs, id_col, score_col, pairs, i_col="doc_i",
                     j_col="doc_j", descending=True):
    """Near-dup keep policy: cluster the pair list, keep the
    best-scoring member per component (ties by ascending id);
    singletons map to themselves. (id_col, canon_id) for every row."""
    return _wrap(docs, _facade(docs).clusterCanonBy(
        docs._jdf, id_col, score_col, pairs._jdf, i_col, j_col,
        bool(descending)))


def weighted_pagerank(edges, src_col="src", dst_col="dst", weight_col="w",
                      iterations=8, damping_num=85, damping_den=100,
                      scale=1000000000000):
    """:func:`pagerank` with contributions proportional to edge weight
    ((rank * w) // out-weight); null/non-positive weights drop the
    edge. With all weights 1 this is bit-identical to pagerank."""
    return _wrap(edges, _facade(edges).weightedPageRank(
        edges._jdf, src_col, dst_col, weight_col, int(iterations),
        int(damping_num), int(damping_den), int(scale)))


def triangle_counts(pairs, i_col="doc_i", j_col="doc_j"):
    """Per-node triangle counts over an undirected pair list (cluster
    cohesion on a similarity graph): (node, tri_cnt) for every node in
    at least one triangle; degree-ordered orientation bounds the wedge
    join at O(E^1.5)."""
    return _wrap(pairs, _facade(pairs).triangleCounts(
        pairs._jdf, i_col, j_col))


def clustering_coef(pairs, i_col="doc_i", j_col="doc_j", unit=1000000):
    """Local clustering coefficient per node in ``unit``:sup:`-1` fixed
    point: (2 * triangles * unit) // (deg * (deg - 1)); deg < 2 scores
    0. Output: (node, deg, tri_cnt, coef_unit)."""
    return _wrap(pairs, _facade(pairs).clusteringCoef(
        pairs._jdf, i_col, j_col, int(unit)))


def k_core(pairs, i_col="doc_i", j_col="doc_j", k=3, rounds=8):
    """k-core extraction by exactly ``rounds`` simultaneous peel rounds
    (drop every node below degree ``k`` each round) — dense-subgraph
    detection for boilerplate/spam clusters. Output: surviving
    (node, deg) with degree inside the surviving subgraph."""
    return _wrap(pairs, _facade(pairs).kCore(
        pairs._jdf, i_col, j_col, int(k), int(rounds)))


def co_occurrence(pairs, left_col, right_col, max_degree=0):
    """Weighted one-mode projection of a bipartite edge list:
    (node_i, node_j, w) with node_i < node_j and w = shared distinct
    left neighbors. ``max_degree`` > 0 drops hub left nodes above that
    degree before the self-join (the documented skew valve)."""
    return _wrap(pairs, _facade(pairs).coOccurrence(
        pairs._jdf, left_col, right_col, int(max_degree)))


def graph_walks(edges, src_col="src", dst_col="dst", steps=4,
                walks_per_node=1):
    """Deterministic pseudo-random walks (DeepWalk/node2vec corpus
    generation without RNG): step t of a walk is a pure md5 function of
    (walk, step, node), identical on every engine and re-run. Output:
    (walk_id, start, step, node); dead-end walks stop early."""
    return _wrap(edges, _facade(edges).graphWalks(
        edges._jdf, src_col, dst_col, int(steps), int(walks_per_node)))


def label_propagate(edges, seeds, src_col="src", dst_col="dst",
                    seed_node_col="node", seed_label_col="label",
                    rounds=4):
    """Semi-supervised label spreading: exactly ``rounds`` synchronous
    majority-vote rounds from the seed set (ties pick the smallest
    label, seeds stay clamped, labels never retract). Output:
    (node, label) for every labeled node."""
    return _wrap(edges, _facade(edges).labelPropagate(
        edges._jdf, seeds._jdf, src_col, dst_col, seed_node_col,
        seed_label_col, int(rounds)))


def walk_corpus_lines(walks):
    """Render :func:`graph_walks` output as one whitespace-joined
    node-id line per walk (the DeepWalk/word2vec corpus format):
    (walk_id, line), step-ordered deterministically."""
    return _wrap(walks, _facade(walks).walkCorpusLines(walks._jdf))


def audio_energy(df, id_col, content_col="content", window_samples=400,
                 codec="wav"):
    """Per-window audio energy (the silence/VAD gating primitive):
    integer mean-square of signed 16-bit samples per fixed window
    (last window may be short). Non-audio/undecodable payloads emit no
    rows. Output: (asset_id, window_idx, n_samples, mean_sq)."""
    return _wrap(df, _facade(df).audioEnergy(
        df._jdf, id_col, content_col, int(window_samples), codec))


def image_tile_stats(df, id_col, content_col="content", tile_w=32,
                     tile_h=32, codec="bmp"):
    """Per-tile image statistics (flat/blank-region screening): integer
    mean of each channel over a tile grid (edge tiles may be short).
    Non-image payloads emit no rows. Output: (asset_id, tile_x,
    tile_y, n_px, mean_b, mean_g, mean_r)."""
    return _wrap(df, _facade(df).imageTileStats(
        df._jdf, id_col, content_col, int(tile_w), int(tile_h), codec))


def image_hash(df, id_col, content_col="content", side=8, codec="bmp"):
    """Perceptual image hash (aHash): nearest-neighbor side x side
    downsample, integer gray, clip-mean threshold; 64 bits shipped as
    two unsigned 32-bit halves. Equal hashes = shared brightness
    envelope (the O(N) first stage of image near-dup dedup). Non-image
    payloads emit no rows. Output: (asset_id, width, height, hash_hi,
    hash_lo)."""
    return _wrap(df, _facade(df).imageHash(
        df._jdf, id_col, content_col, int(side), codec))


def audio_fingerprint(df, id_col, content_col="content",
                      window_samples=400, codec="wav"):
    """Audio energy fingerprint: window energies thresholded at the
    clip floor, the first min(n_windows, 62) loud/quiet bits packed
    little-endian into one integer. Non-audio payloads emit no rows.
    Output: (asset_id, n_windows, energy_floor, fp)."""
    return _wrap(df, _facade(df).audioFingerprint(
        df._jdf, id_col, content_col, int(window_samples), codec))


def key_canon(df, id_col, key_cols):
    """Exact dedup on pre-computed key columns (perceptual hashes,
    fingerprints, normalized tuples): every id maps to the minimum id
    sharing its whole key tuple; null keys group null-safely. Output:
    (id_col, canon_id)."""
    cols = key_cols if isinstance(key_cols, str) else ",".join(key_cols)
    return _wrap(df, _facade(df).keyCanon(df._jdf, id_col, cols))


def decontam_semantic(corpus, id_col, vec_col, bench, bench_id_col,
                      bench_vec_col, tau=0.9):
    """Semantic decontamination: flag corpus rows whose embedding has
    rounded cosine >= tau against ANY benchmark embedding (broadcast
    bench — the corpus never shuffles). Hit-only output: (doc, n_hits,
    best_bench, best_cos_r6), best = cos desc / bench id asc."""
    return _wrap(corpus, _facade(corpus).decontamSemantic(
        corpus._jdf, id_col, vec_col, bench._jdf, bench_id_col,
        bench_vec_col, float(tau)))


def robust_outliers(df, group_cols, value_col, k=3):
    """MAD-based robust outlier flags per group: |v - median| > k * MAD
    with the exact integer median/MAD (quantiles' p50 rule). value_col
    must be integral (pre-scale continuous features to micro-units).
    Adds abs_dev, group_med, group_mad, is_outlier."""
    cols = group_cols if isinstance(group_cols, str) else ",".join(group_cols)
    return _wrap(df, _facade(df).robustOutliers(df._jdf, cols, value_col,
                                                int(k)))


def int_kmeans(df, id_col, vec_col, k, rounds=2, scale=1000000):
    """Deterministic integer k-means: coordinates floor-quantized to
    fixed point, init = the k rows with the smallest md5(id), nearest
    centroid by integer squared L2 (ties to the smaller index),
    truncating-division centroid updates — bit-identical assignments
    across engines and partitionings. Output: (doc, cluster, d2)."""
    return _wrap(df, _facade(df).intKMeans(df._jdf, id_col, vec_col,
                                           int(k), int(rounds), int(scale)))


def knn_label_accuracy(df, id_col, vec_col, label_col):
    """Embedding-quality eval: per-label leave-one-out 1-NN agreement
    (neighbor = cos_r6 desc / id asc, self excluded; null labels
    excluded both ways). Output: (label_col, n, n_correct, acc_micro)
    with acc_micro = n_correct*1e6 div n."""
    return _wrap(df, _facade(df).knnLabelAccuracy(df._jdf, id_col, vec_col,
                                                  label_col))


def knn_predict(df, id_col, vec_col, label_col):
    """Leave-one-out 1-NN label predictions (neighbor = cos_r6 desc /
    id asc, self excluded; null labels excluded both ways). Output:
    (id_col, actual, predicted) — feed to confusion/classification
    metrics below."""
    return _wrap(df, _facade(df).knnPredict(df._jdf, id_col, vec_col,
                                            label_col))


def confusion(df, actual_col, pred_col):
    """Exact confusion-matrix counts over an (actual, predicted) frame;
    rows with a NULL on either side are excluded. Output:
    (actual, predicted, n) — class-bounded shuffle."""
    return _wrap(df, _facade(df).confusion(df._jdf, actual_col, pred_col))


def classification_report(df, actual_col, pred_col):
    """Per-class precision/recall/F1 in truncating micro-units
    (NULL where the denominator is zero). Output: (clazz, n_actual,
    tp, fp, fn, prec_micro, rec_micro, f1_micro)."""
    return _wrap(df, _facade(df).classificationReport(df._jdf, actual_col,
                                                      pred_col))


def cohen_kappa(df, actual_col, pred_col):
    """Cohen's kappa in micro-units: single row (n, n_agree, po_micro,
    pe_micro, kappa_micro); kappa NULL for a degenerate single-class
    frame. Eval-set harness (n <= ~3e6)."""
    return _wrap(df, _facade(df).cohenKappa(df._jdf, actual_col, pred_col))


def roc_auc(df, label_col, score_col):
    """Exact Mann-Whitney ROC-AUC with average-rank tie handling over
    an integral score column and 0/1 labels. Single row (n_pos, n_neg,
    auc_micro); NULL when either class is empty."""
    return _wrap(df, _facade(df).rocAuc(df._jdf, label_col, score_col))


def winsorize(df, group_cols, value_col, lo_q=10, hi_q=90,
              out_col="winsorized"):
    """Clip ``value_col`` into its own group's [p``lo_q``, p``hi_q``]
    quantile band (explicit-rank quantiles; NULLs pass through)."""
    cols = ",".join(group_cols) if not isinstance(group_cols, str) else group_cols
    return _wrap(df, _facade(df).winsorize(
        df._jdf, cols, value_col, int(lo_q), int(hi_q), out_col))


def novelty_scores(df, id_col, text_col, n=3):
    """Incremental novelty: each distinct word n-gram credits its
    lowest-id document; a doc's score is the credited share of its own
    shingles, in micro-units. Docs with < n tokens are excluded."""
    return _wrap(df, _facade(df).noveltyScores(df._jdf, id_col, text_col,
                                               int(n)))


def session_lines(events, key_col="user_id", ts_col="ts",
                  type_col="event_type", tie_col="event_id",
                  gap="12 hours"):
    """One chronological event-type line per (key, session) — the
    behavioral-corpus export (next-action-model training format).
    Order within a session is (event time, tie_col)."""
    return _wrap(events, _facade(events).sessionLines(
        events._jdf, key_col, ts_col, type_col, tie_col, gap))


def mmr_rerank(queries, candidates, id_col, vec_col, k, shortlist,
               lambda_ppm=700000):
    """MMR diversified top-k: greedily select k of the exact
    top-``shortlist`` maximizing lambda*relevance - (1-lambda)*max-sim
    to already-selected (integer micro-units, engine-exact argmax).
    Output: (qid, rnk, cid, mmr_u)."""
    return _wrap(queries, _facade(queries).mmrRerank(
        queries._jdf, candidates._jdf, id_col, vec_col, int(k),
        int(shortlist), int(lambda_ppm)))


def global_rank(df, value_col, tie_col, out_col="rank", descending=False):
    """Exact 0-based global rank over (value, tie) with NO global sort:
    histogram base + per-tie-group windows. (value, tie) pairs must be
    unique; NULL coordinates are excluded."""
    return _wrap(df, _facade(df).globalRank(
        df._jdf, value_col, tie_col, out_col, bool(descending)))


def gini(df, group_cols, value_col, tie_col):
    """Per-group Gini coefficient in micro-units (0 = even, (n-1)/n =
    one row holds everything) — exact rank identity, tie-insensitive,
    non-negative values only (loud otherwise)."""
    cols = group_cols if isinstance(group_cols, str) else ",".join(group_cols)
    return _wrap(df, _facade(df).gini(df._jdf, cols, value_col, tie_col))


def group_percent_rank(df, group_cols, value_col, tie_col,
                       descending=False):
    """Per-group exact 0-based rank plus pct_micro = rank*1e6 //
    (n-1) — the cross-group-comparable percentile feature. No
    data-sized window (histogram base + tie-group windows)."""
    cols = group_cols if isinstance(group_cols, str) else ",".join(group_cols)
    return _wrap(df, _facade(df).groupPercentRank(
        df._jdf, cols, value_col, tie_col, bool(descending)))


def negative_samples(positives, items, user_col, item_col, k, oversample=2):
    """Deterministic negative sampling: up to k items per user drawn by
    pure md5 arithmetic from the md5-permuted catalog, positives
    excluded. Output: (user_col, neg_rank, item_col)."""
    return _wrap(positives, _facade(positives).negativeSamples(
        positives._jdf, items._jdf, user_col, item_col, int(k),
        int(oversample)))


def epoch_plan(df, source_col, token_col, weights, weight_source_col,
               weight_col, target_tokens):
    """Mixture epoch planning: per-source (tokens_have, weight_ppm,
    target_tokens, epochs_micro) for a token budget. Sources weighted
    but absent get NULL epochs; unweighted corpus sources get 0."""
    return _wrap(df, _facade(df).epochPlan(
        df._jdf, source_col, token_col, weights._jdf, weight_source_col,
        weight_col, int(target_tokens)))


def spearman(df, group_cols, x_col, y_col):
    """Per-group Spearman rank correlation in micro-units (average-rank
    ties, displacement formula, truncating integer division). Ranks are
    computed from per-(group, value) histograms — never a data-row sort
    window. Output: (group_cols..., n, rho_micro); rho_micro NULL for
    n < 2."""
    cols = group_cols if isinstance(group_cols, str) else ",".join(group_cols)
    return _wrap(df, _facade(df).spearman(df._jdf, cols, x_col, y_col))


def decayed_sum(events, key_col, ts_col, tie_col, value_col, steps=8):
    """Exponentially-decayed activity sum: over the last `steps` events
    of the key (current included, ordered by ts then tie), each step
    back halves the weight (current 2^(steps-1), oldest 1); missing
    lags count 0. value_col must be integral. Adds decay_sum."""
    return _wrap(events, _facade(events).decayedSum(
        events._jdf, key_col, ts_col, tie_col, value_col, int(steps)))

package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.BoundedTopKSet

/**
 * BM25 top-k lexical retrieval of corpus documents for a set of queries
 * — the sparse-retrieval half of the data-selection toolbox next to the
 * dense [[graft.similarity.Similarity]] family, and the standard engine
 * behind retrieval-based decontamination and targeted data selection
 * (find the corpus documents closest to a benchmark / target domain).
 * Okapi BM25 with the Lucene non-negative idf:
 *
 *   score(q, d) = Σ_{t ∈ q} ln(1 + (N - df_t + 0.5)/(df_t + 0.5))
 *                  · tf_td·(k1 + 1) / (tf_td + k1·(1 - b + b·dl_d/avgdl))
 *
 * summed over the DISTINCT query terms (short-query convention: query-
 * side term frequency is ignored). Output: (qid, docId, bm25_r6, rnk)
 * for the k highest-scoring documents per query, rank ordered by
 * (score desc, docId asc).
 *
 * Determinism contract (the library-wide oracle convention,
 * [[NgramLm]] / [[TextFunctions.tfidfTopM]]): each per-(term, doc)
 * contribution is one double expression rounded to micro-units and cast
 * to LONG, the per-(query, doc) score is the exact integer sum of those
 * longs — order-free, so the distributed aggregation order can never
 * perturb the hash — and ranking compares the INTEGER score, where no
 * engine-to-engine double-comparison boundary exists. `bm25_r6` is the
 * micro-unit sum divided by 1e6 (both engines divide the same integer).
 *
 * Scale shape (the inverted-index probe, NOT a documents×queries
 * cross): corpus postings (doc, token, tf) and doc lengths are two
 * map-side-combined aggregations; the query-term table — queries are
 * few and terms deduplicated — joins df and the (N, avgdl) single-row
 * aggregate small-side, then probes the postings through a token-keyed
 * equi-join that only materializes postings OF QUERY TERMS. The final
 * per-query top-k is an O(k)-state [[BoundedTopKSet]], so post-scoring
 * shuffle volume is O(queries · k) regardless of corpus size. A
 * pathologically common query term (df ≈ N) is the one skew source:
 * its posting list is corpus-sized, which AQE's skew split handles, and
 * its idf ≈ ln(1 + ~0.5/N) contributes nothing — callers chasing tail
 * latency should drop stopword-grade terms query-side.
 */
object Bm25 {

  /** BM25 top-k per query. `queries` rows are (qIdCol, qTextCol);
    * `corpus` rows are (idCol, textCol). Ids must be unique per side
    * (the library-wide contract). Documents with no tokens never match;
    * queries with no tokens (or only out-of-vocabulary tokens) emit no
    * rows.
    *
    * `materialize` snapshots the term-frequency table, which feeds FOUR
    * plan consumers (doc lengths twice — stats + the scoring join —
    * document frequencies, and the postings probe); left lazy, Catalyst
    * clones the whole corpus tokenization per consumer (pushed-down
    * null filters specialize the clones past ReuseExchange — the
    * Triangles lesson, r14; measured 4 executions in the r14 plan).
    * Default `localCheckpoint(false)` is executor-local and
    * non-recomputable — on clusters with executor churn (dynamic
    * allocation, preemption) pass `identity` (pay the re-execution) or
    * `_.checkpoint(eager = true)` (reliable snapshot). */
  def topK(queries: DataFrame, corpus: DataFrame,
      qIdCol: String, qTextCol: String, idCol: String, textCol: String,
      k: Int, k1: Double = 1.2, b: Double = 0.75,
      materialize: DataFrame => DataFrame = _.localCheckpoint(false)): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(qIdCol != idCol,
      s"qIdCol and idCol must differ (both are output columns), got '$qIdCol'")
    require(k1 >= 0, s"k1 must be >= 0, got $k1")
    require(b >= 0 && b <= 1, s"b must be in [0, 1], got $b")

    // spread: tokenization fan-out is compute-bound; no-op at real
    // scale, parallelizes under-split corpus scans (r14). Snapshot the
    // result: tf feeds four consumers (see scaladoc) and the snapshot
    // runs the corpus pass ONCE instead of once per consumer (r15)
    val tf = materialize(graft.toolbox.Partitions.spreadCompute(
        corpus.select(col(idCol).as("__doc"), col(textCol).as("__txt")))
      .select(col("__doc"),
        explode(TextFunctions.tokens(col("__txt"))).as("token"))
      .groupBy(col("__doc"), col("token"))
      .agg(count(lit(1)).as("__tf")))
    val dl = tf.groupBy(col("__doc")).agg(sum(col("__tf")).as("__dl"))
    val dfreq = tf.groupBy(col("token")).agg(count(lit(1)).as("__df"))
    // N and avgdl ride as ONE broadcast row — never a driver collect
    val stats = dl.agg(count(lit(1)).as("__n"),
      (sum(col("__dl")).cast("double") / count(lit(1)).cast("double")).as("__avgdl"))

    val qterms = queries
      .select(col(qIdCol).as("qid"),
        explode(array_distinct(TextFunctions.tokens(col(qTextCol)))).as("token"))
    // the small side carries df and (N, avgdl) into the postings probe
    val qside = qterms.join(dfreq, Seq("token")).crossJoin(broadcast(stats))

    val idf = log(lit(1.0) +
      ((col("__n") - col("__df")).cast("double") + lit(0.5)) /
        (col("__df").cast("double") + lit(0.5)))
    val tfd = col("__tf").cast("double")
    val norm = tfd * lit(k1 + 1.0) /
      (tfd + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / col("__avgdl")))

    val terms = broadcast(qside).join(tf, Seq("token"))
      .join(dl, Seq("__doc"))
      .select(col("qid"), col("__doc"),
        // micro-units: exact-integer term, order-free distributed sum
        round(idf * norm * lit(1e6)).cast("long").as("__u"))

    val scored = terms.groupBy(col("qid"), col("__doc"))
      .agg(sum(col("__u")).as("__su"))
    // k-smallest of (-score, doc) = (score desc, doc asc) top-k; the
    // negated INTEGER sort key is exact (BM25 with the +1 idf is
    // non-negative, so only 0 ever negates to itself)
    scored.groupBy(col("qid"))
      .agg(BoundedTopKSet.topKSet(
        struct((lit(0L) - col("__su")).as("o"), col("__doc"), col("__su")), k).as("__top"))
      .select(col("qid").as(qIdCol), posexplode(col("__top")))
      .select(col(qIdCol), col("col.__doc").as(idCol),
        (col("col.__su").cast("double") / 1e6).as("bm25_r6"),
        (col("pos") + 1).cast("long").as("rnk"))
  }
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.text.TextFunctions

/**
 * Document deduplication operators for training-data pipelines:
 *
 *  - [[exactCanon]]: exact duplicate grouping (hash-groupBy semantics);
 *  - [[jaccardPairs]]: exact word-n-gram Jaccard near-dup pairs via a
 *    shingle inverted-index join — the exact-answer path;
 *  - [[minhashPairs]]: MinHash + LSH banding candidate generation with
 *    exact Jaccard verification — the 100 TB path (candidates shrink the
 *    quadratic pair space to near-linear; every emitted pair is exact).
 *
 * All plans are pure DataFrame ops: narrow maps + shuffles keyed on
 * digests/shingles, no driver-side collection, no UDFs. Hashing is md5
 * (bit-identical across engines, so every operator is oracle-checkable);
 * for throughput-critical deployments swap `md5` for `xxhash64` via the
 * `hashFn` parameter — the plan shape is unchanged.
 *
 * Scale notes (100 TB):
 *  - exactCanon shuffles 16-byte digests, never full texts;
 *  - jaccardPairs is quadratic per hot shingle — cap blowup with
 *    `maxDocFreq` (drops shingles shared by more than that many docs;
 *    high-Jaccard pairs always share rarer shingles too) or prefer
 *    minhashPairs, whose band join is linear in candidates;
 *  - minhashPairs verification joins shingle *arrays* (bounded per doc),
 *    not the inverted index, so the verify stage is linear in candidates.
 */
object Dedup {

  /** For every row: the minimum id among rows with byte-identical text.
    * Shuffles md5 digests (16 bytes/row), not text payloads. */
  def exactCanon(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      min(col(idCol)).over(Window.partitionBy(md5(col(textCol).cast("binary"))))
        .as("canon_id"))

  /** (docId, shingleArray) projection shared by the dedup operators. */
  private def shingled(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.select(
      col(idCol).as("doc"),
      TextFunctions.shingles(TextFunctions.tokens(col(textCol)), n).as("sh"))

  /** Exact Jaccard: one IEEE division of exact integer counts — identical
    * in any engine. */
  private def jaccard(inter: Column, na: Column, nb: Column): Column =
    inter.cast("double") / (na + nb - inter).cast("double")

  /**
   * All pairs (i < j) with word-n-gram Jaccard similarity >= tau, exactly.
   * Inverted-index join on shingles → per-pair intersection counts →
   * Jaccard filter. Output: (doc_i, doc_j, jac).
   *
   * @param maxDocFreq if set, shingles occurring in more than this many
   *        documents are dropped before the pair join (skew guard; exact
   *        results require it unset).
   */
  def jaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      tau: Double, n: Int = 3, maxDocFreq: Option[Int] = None): DataFrame = {
    val sh = shingled(df, idCol, textCol, n)
    val sizes = sh.select(col("doc"), size(col("sh")).as("nsh"))
    val inv0 = sh.select(col("doc"), explode(col("sh")).as("s"))
    val inv = maxDocFreq.fold(inv0) { cap =>
      val hot = inv0.groupBy("s").agg(count(lit(1)).as("df")).where(col("df") > cap).select("s")
      inv0.join(broadcast(hot), Seq("s"), "left_anti")
    }
    val counts = inv.as("a")
      .join(inv.as("b"), col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_i"), col("b.doc").as("doc_j"))
      .agg(count(lit(1)).as("c"))
    counts
      .join(sizes.withColumnRenamed("doc", "doc_i").withColumnRenamed("nsh", "ni"), "doc_i")
      .join(sizes.withColumnRenamed("doc", "doc_j").withColumnRenamed("nsh", "nj"), "doc_j")
      .select(col("doc_i"), col("doc_j"), jaccard(col("c"), col("ni"), col("nj")).as("jac"))
      .where(col("jac") >= tau)
  }

  /**
   * MinHash signature: for each of `numHashes` hash families i, the minimum
   * `hashFn(i || ':' || shingle)` over the document's shingles. With the
   * default md5 the signature is engine-reproducible hex strings.
   */
  def minhashSignature(
      sh: Column, numHashes: Int,
      hashFn: Column => Column = c => md5(c.cast("binary"))): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(sh, s => hashFn(concat(i.cast("string"), lit(":"), s)))))

  /**
   * MinHash-LSH near-dup pairs: signatures → banding (bandRows rows/band)
   * → candidate pairs sharing >= 1 band → exact Jaccard verification
   * >= tau. Same output contract as [[jaccardPairs]]; emitted Jaccard
   * values are exact, only recall depends on (numHashes, bandRows) —
   * with 32 hashes × 2 rows/band, P(miss | jac = 0.8) ≈ 1e-7.
   */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String, tau: Double,
      n: Int = 3, numHashes: Int = 32, bandRows: Int = 2): DataFrame = {
    require(numHashes % bandRows == 0, "numHashes must be a multiple of bandRows")
    val numBands = numHashes / bandRows
    val sh = shingled(df, idCol, textCol, n).where(size(col("sh")) > 0)
    val sig = sh.select(col("doc"), col("sh"),
      minhashSignature(col("sh"), numHashes).as("sig"))
    // (doc, band index, band key = md5 of the band's signature slice)
    val bands = sig.select(col("doc"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(numBands - 1)),
        b => md5(concat_ws("|", slice(col("sig"), b * bandRows + 1, lit(bandRows))).cast("binary")))))
      .withColumnsRenamed(Map("pos" -> "band", "col" -> "bkey"))
    val cands = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey")
          && col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_i"), col("b.doc").as("doc_j"),
        col("a.sh").as("sha"), col("b.sh").as("shb"))
      .dropDuplicates("doc_i", "doc_j")
    // exact verification on the bounded per-doc shingle arrays
    cands
      .select(col("doc_i"), col("doc_j"),
        jaccard(size(array_intersect(col("sha"), col("shb"))),
          size(col("sha")), size(col("shb"))).as("jac"))
      .where(col("jac") >= tau)
  }
}

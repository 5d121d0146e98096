package graft.join

import scala.util.Try

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, RepartitionOperation, Sort, Window}

/**
 * Mid-scale balance guard shared by the bucket/cell equi-join operators
 * ([[GridSpatialJoin]], [[RangeJoin]]).
 *
 * When one join side is small enough that Catalyst will BROADCAST it,
 * the equi-join introduces no exchange, so the whole explode -> join ->
 * refine pipeline inherits the other side's SCAN layout — and a single
 * small parquet file is ONE partition, putting the entire join on one
 * core even though its post-explode, post-join work is quadratically
 * larger than its bytes (measured 57 s single-task vs ~3 s spread on a
 * 42M-pair probe). [[balance]] spreads a side before its explode iff:
 * the OTHER side fits Catalyst's own broadcast estimate (the only
 * regime without a join-owned exchange), this side is scan-shaped (no
 * shuffling operator below — `.rdd` is then exchange-free to plan and
 * its partition count IS the file layout), and it has fewer partitions
 * than the shuffle-partition target. The genuinely-large regime
 * (neither side broadcastable) is untouched: shuffle join on the bucket
 * key with AQE's hot-key skew split (spec-pinned). Streaming sides
 * cannot be batch-planned (stats/.rdd throw) and the micro-batch engine
 * owns their partitioning — they pass through unchanged.
 */
private[join] object JoinLayout {

  def balance(left: DataFrame, right: DataFrame): (DataFrame, DataFrame) =
    if (left.isStreaming || right.isStreaming) (left, right)
    else (if (broadcastable(right)) spreadIfDegenerate(left) else left,
      if (broadcastable(left)) spreadIfDegenerate(right) else right)

  private def broadcastable(df: DataFrame): Boolean = {
    val raw = df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val thr = Try(raw.toLong).getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    thr > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(thr)
  }

  private def spreadIfDegenerate(df: DataFrame): DataFrame = {
    val scanShaped = df.queryExecution.optimizedPlan.collectFirst {
      case p @ (_: Join | _: Aggregate | _: Sort | _: Window | _: RepartitionOperation) => p
    }.isEmpty
    if (!scanShaped) return df
    val spark = df.sparkSession
    val target = Try(spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
      .getOrElse(spark.sparkContext.defaultParallelism)
    if (df.rdd.getNumPartitions * 2 <= target) df.repartition(target) else df
  }
}

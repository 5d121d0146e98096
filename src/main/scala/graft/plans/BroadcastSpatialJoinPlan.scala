package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, Predicate, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

import graft.spatial.SpatialPredicate

/**
 * Catalyst-native broadcast spatial join: a custom logical node + planner
 * strategy + physical operator, so the transformer's output is ONE plan
 * end-to-end — no RDD drop-out, no `createDataFrame` barrier (the
 * reference's architecture re-enters SQL with an opaque RDD scan, hiding
 * everything from the optimizer; SURVEY §4).
 *
 * Left = iterated side (streamed, partitioning preserved), right =
 * broadcast side (collected once, packed as WKB, STRtree per executor).
 * Output by `mode` (graft.spatial.SpatialJoinMode): Inner/LeftOuter =
 * left.output ++ right.output (++ distance) — LeftOuter keeps
 * match-less left rows (null geometry included) with the right side +
 * distance nulled under the standard outer nullability widening;
 * Semi/Anti = left.output ONLY (existence filter — no distance).
 * `condition` is a pre-bound predicate over the concatenated
 * (left ++ right) row.
 */
case class BroadcastSpatialJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftWkb: Attribute,
    rightWkb: Attribute,
    predicate: SpatialPredicate,
    condition: Option[Expression], // bound over left.output ++ right.output
    distAttr: Option[AttributeReference],
    mode: graft.spatial.SpatialJoinMode = graft.spatial.SpatialJoinMode.Inner)
  extends BinaryNode {

  import graft.spatial.SpatialJoinMode._
  require(!(distAttr.isDefined && (mode == Semi || mode == Anti)),
    "semi/anti spatial joins emit the left schema only — no distance column")

  override def output: Seq[Attribute] = mode match {
    case Semi | Anti => left.output
    case LeftOuter =>
      left.output ++ right.output.map(_.withNullability(true)) ++ distAttr.toSeq
    case Inner => left.output ++ right.output ++ distAttr.toSeq
  }

  // the probe consumes whole child rows (the condition is ordinal-bound),
  // so column pruning must not reshape the children
  override def references: AttributeSet = AttributeSet(left.output ++ right.output)

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): BroadcastSpatialJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: install via `spark.experimental.extraStrategies` (the
  * transformer self-registers) or GraftExtensions. */
object SpatialJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case p: BroadcastSpatialJoinPlan =>
      BroadcastSpatialJoinExec(
        planLater(p.left), planLater(p.right),
        p.leftWkb, p.rightWkb, p.predicate, p.condition, p.distAttr,
        p.mode) :: Nil
    case _ => Nil
  }
}

case class BroadcastSpatialJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftWkb: Attribute,
    rightWkb: Attribute,
    predicate: SpatialPredicate,
    condition: Option[Expression],
    distAttr: Option[AttributeReference],
    mode: graft.spatial.SpatialJoinMode = graft.spatial.SpatialJoinMode.Inner)
  extends BinaryExecNode {

  import graft.spatial.SpatialJoinMode._

  override def output: Seq[Attribute] = mode match {
    case Semi | Anti => left.output
    case LeftOuter =>
      left.output ++ right.output.map(_.withNullability(true)) ++ distAttr.toSeq
    case Inner => left.output ++ right.output ++ distAttr.toSeq
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastSpatialJoinExec =
    copy(left = newLeft, right = newRight)

  // collect + pack + broadcast the right side once per physical plan —
  // Dataset caches its QueryExecution, so repeated actions on the same
  // transformed DataFrame reuse one broadcast instead of re-collecting
  // (the broadcast lives as long as the plan; ContextCleaner reclaims it
  // when the Dataset is garbage-collected, as with Spark's own
  // BroadcastExchangeExec)
  @transient private lazy val packedBroadcast = {
    val rIdx = right.output.indexWhere(_.exprId == rightWkb.exprId)
    require(rIdx >= 0, "right wkb attribute must be in child output")
    val rightRows: Array[InternalRow] = right.executeCollect().map(_.copy())
    val wkbs = rightRows.map(r => if (r.isNullAt(rIdx)) null else r.getBinary(rIdx))
    sparkContext.broadcast(new PackedSpatialIndex(rightRows, wkbs))
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val lIdx = left.output.indexWhere(_.exprId == leftWkb.exprId)
    require(lIdx >= 0, "left wkb attribute must be in child output")
    val bc = packedBroadcast

    val needDist = distAttr.isDefined
    val outAttrs = output
    val condExpr = condition
    val pred = predicate

    val joinMode = mode
    val rightWidth = right.output.length

    left.execute().mapPartitions { it =>
      val idx = bc.value
      val probe = new SpatialProbe(idx.geoms, idx.tree)
      val condPred = condExpr.map(Predicate.create)
      condPred.foreach(_.initialize(0))
      val joined = new JoinedRow
      val joinedDist = new JoinedRow
      val distRow = new GenericInternalRow(1)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      def condEvalFor(lrow: InternalRow): Int => Boolean = condPred match {
        case None => SpatialProbe.AlwaysTrue // sentinel: enables the
        // unconditioned-nearest fast path inside the probe kernel
        case Some(p) => i => p.eval(joined(lrow, idx.rows(i)))
      }
      def hitsOf(lrow: InternalRow): Iterator[(Int, Int)] = {
        val g = graft.spatial.GeoKit.wkbToGeom(lrow.getBinary(lIdx))
        probe.matches(g, pred, condEvalFor(lrow), needDist)
      }

      joinMode match {
        // existence filters: emit the LEFT row alone. hasNext, never
        // isEmpty — isEmpty would consume the iterator's first element.
        // A null-geometry row has no match: dropped by semi, kept by anti
        case Semi =>
          it.filter(lrow => !lrow.isNullAt(lIdx) && hitsOf(lrow).hasNext).map(proj)
        case Anti =>
          it.filter(lrow => lrow.isNullAt(lIdx) || !hitsOf(lrow).hasNext).map(proj)

        case _ =>
          val outer = joinMode == LeftOuter
          // all-null right payload (+ null distance) for left-outer
          // misses — GenericInternalRow slots default to null
          val nullRight = new GenericInternalRow(rightWidth)
          val nullDist = new GenericInternalRow(1)
          def missRow(lrow: InternalRow): InternalRow = {
            val base = joined(lrow, nullRight)
            proj(if (needDist) joinedDist(base, nullDist) else base)
          }
          it.flatMap { lrow =>
            if (lrow.isNullAt(lIdx)) {
              if (outer) Iterator.single(missRow(lrow)) else Iterator.empty
            } else {
              val hits = hitsOf(lrow)
              if (outer && !hits.hasNext) Iterator.single(missRow(lrow))
              else hits.map { case (i, d) =>
                val base = joined(lrow, idx.rows(i))
                val full: InternalRow =
                  if (needDist) { distRow.setInt(0, d); joinedDist(base, distRow) }
                  else base
                proj(full)
              }
            }
          }
      }
    }
  }
}

package graft.join

import org.apache.spark.sql.functions._
import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark
import graft.functions.GeoExpressions
import graft.spatial.SpatialPredicate

/**
 * ANSI eager-key safety on the grid kernels (r14, ADVICE r13): the
 * factored equi keys / side-only prefilters evaluate EAGERLY over every
 * frame row, while the unfactored path only evaluates the condition on
 * cell-co-located pairs — so under ANSI mode only statically throw-free
 * conjuncts may factor ([[PairCondition.neverThrows]]). A key that
 * throws (cast overflow, string parse) on a row that never pairs must
 * not fail the query; it stays in the full condition instead, restoring
 * the unfactored path byte for byte — the grid twin of the broadcast
 * kernel's runtime flat-path fallback.
 */
class AnsiFactoringSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "PairCondition.neverThrows"

  it should "whitelist throw-free shapes and reject throwing ones" in {
    import org.apache.spark.sql.catalyst.dsl.expressions._
    import org.apache.spark.sql.catalyst.expressions._
    import org.apache.spark.sql.types._
    val i = AttributeReference("i", IntegerType)()
    val l = AttributeReference("l", LongType)()
    val s = AttributeReference("s", StringType)()
    val d = AttributeReference("d", DoubleType)()
    PairCondition.neverThrows(i) shouldBe true
    PairCondition.neverThrows(Literal(42)) shouldBe true
    // % / pmod by a NON-ZERO literal: the one integral arithmetic with
    // no ANSI failure case (Long.MinValue % -1 is 0, unlike division)
    PairCondition.neverThrows(Remainder(l, Literal(4L), EvalMode.ANSI)) shouldBe true
    PairCondition.neverThrows(Pmod(l, Literal(5L), EvalMode.ANSI)) shouldBe true
    PairCondition.neverThrows(Remainder(l, Literal(0L), EvalMode.ANSI)) shouldBe false
    PairCondition.neverThrows(Remainder(l, l, EvalMode.ANSI)) shouldBe false
    // up-cast widens losslessly (never throws); down-cast / string
    // parse can throw under ANSI
    PairCondition.neverThrows(Cast(i, LongType)) shouldBe true
    PairCondition.neverThrows(Cast(l, IntegerType)) shouldBe false
    PairCondition.neverThrows(Cast(s, IntegerType)) shouldBe false
    // integral add can overflow-throw; double arithmetic is IEEE-total
    PairCondition.neverThrows(Add(i, Literal(1), EvalMode.ANSI)) shouldBe false
    PairCondition.neverThrows(Add(d, Literal(1.0), EvalMode.ANSI)) shouldBe true
    PairCondition.neverThrows(Divide(d, Literal(0.0), EvalMode.ANSI)) shouldBe true
    PairCondition.neverThrows(CreateNamedStruct(Seq(Literal("k"), i))) shouldBe true
    PairCondition.neverThrows(In(i, Seq(Literal(1), Literal(2)))) shouldBe true
  }

  behavior of "grid kernels under ANSI with a throwing key on a never-paired row"

  // NOTE on GridSpatialJoin: the cell kernel applies the full condition
  // as a `.where` over the cell equi-join, and Catalyst ITSELF extracts
  // `castExpr = attr` conjuncts into join keys evaluated frame-wide
  // during shuffle partitioning — plain `l.join(r, cell).where(cond)`
  // throws under ANSI on a malformed never-paired row EXACTLY like the
  // factored plan did. The ansiSafeOnly gate there keeps the engine's
  // own factoring from being the one introducing the eager eval, but
  // observable behavior matches stock Spark either way, so there is no
  // completion to assert. The ring kernel below is different: its
  // condition lives inside an aggregate guard (never a join condition),
  // so the unfactored path genuinely evaluates it per-candidate only.

  it should "complete on GridNearestJoin (expanding-ring kernel)" in {
    spark.conf.get("spark.sql.ansi.enabled") shouldBe "true" // Spark 4 default
    // nearest semantics pair every STRAGGLER with every candidate in the
    // exhaustive pass, so a left-side bad row would legitimately throw
    // on both paths. The regression class here is a bad RIGHT row the
    // rings never examine: all probes resolve in early rings near the
    // origin, the far bad candidate is binned but never paired — the
    // unfactored path never evaluates the condition on it, so the
    // factored path must not either (pre-fix, the eager ekey stamp on
    // the binned side threw frame-wide).
    val l = Seq(("a", 0.1, 0.1, 1), ("b", 0.2, 0.3, 2)).toDF("id", "lon", "lat", "code")
    val r = Seq(
      ("p1", 0.15, 0.12, "1"),
      ("p2", 0.22, 0.28, "2"),
      ("badp", 50.0, 50.0, "xx")).toDF("poi_id", "plon", "plat", "pcode")
    val got = GridNearestJoin.nearest(
      l, r,
      GeoExpressions.wkbPoint(col("lon"), col("lat")),
      GeoExpressions.wkbPoint(col("plon"), col("plat")),
      cellDeg = 1.0, condition = Some(expr("CAST(pcode AS INT) = code")),
      // rings-only: budget disabled, no early fallback — the probes must
      // resolve via ring margins without ever touching badp's far cell
      fallbackBelow = 0L, fallbackPairs = 0L)
      .select("id", "poi_id")
      .collect().map(x => (x.getString(0), x.getString(1))).toSet
    got shouldBe Set(("a", "p1"), ("b", "p2"))
  }
}

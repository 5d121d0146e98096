package graft.curation

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

import graft.SparkTestKit.spark

class CdcSpec extends AnyFlatSpec with Matchers {

  import spark.implicits._

  behavior of "Cdc.applyLog"

  private val snap = Seq((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    .toDF("k", "v", "n")

  it should "apply last-writer-wins upserts, deletes and inserts" in {
    val log = Seq(
      (1L, 100L, "upsert", "a2", 11), // replace key 1
      (1L, 50L, "upsert", "aX", 99),  // superseded by ts=100
      (2L, 100L, "delete", null, 0),  // drop key 2
      (4L, 100L, "upsert", "d", 40),  // insert new key 4
      (5L, 100L, "delete", null, 0),  // delete of an absent key: no-op
      (3L, 100L, "noop", "zz", 0))    // unknown op ignored
      .toDF("k", "ts", "op", "v", "n")
    val out = Cdc.applyLog(snap, log, Seq("k"), "ts", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    out shouldBe Set((1L, "a2", 11), (3L, "c", 30), (4L, "d", 40))
  }

  it should "break exact ties deterministically (upsert beats delete at the same ts)" in {
    val log = Seq(
      (1L, 100L, "delete", null.asInstanceOf[String], 0),
      (1L, 100L, "upsert", "u1", 7),
      (1L, 100L, "upsert", "u0", 5)) // payload desc: u1 wins over u0
      .toDF("k", "ts", "op", "v", "n")
    val out = Cdc.applyLog(snap, log, Seq("k"), "ts", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    out should contain ((1L, "u1", 7))
  }

  it should "be a fixpoint under an empty log and validate inputs" in {
    val empty = Seq.empty[(Long, Long, String, String, Int)]
      .toDF("k", "ts", "op", "v", "n")
    Cdc.applyLog(snap, empty, Seq("k"), "ts", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
      .toSet shouldBe Set((1L, "a", 10), (2L, "b", 20), (3L, "c", 30))
    an[IllegalArgumentException] should be thrownBy
      Cdc.applyLog(snap, empty.drop("op"), Seq("k"), "ts", "op")
    an[IllegalArgumentException] should be thrownBy
      Cdc.applyLog(snap, empty, Nil, "ts", "op")
    an[IllegalArgumentException] should be thrownBy
      Cdc.applyLog(snap.withColumn("ts", snap("k")), empty, Seq("k"), "ts", "op")
  }

  it should "match a brute-force merge on random logs" in {
    val rnd = new scala.util.Random(23)
    val snap2 = (1 to 50).map(k => (k.toLong, s"v$k", k)).toDF("k", "v", "n")
    val logRows = Seq.tabulate(400)(_ => (
      rnd.nextInt(80).toLong, rnd.nextInt(50).toLong,
      if (rnd.nextBoolean()) "upsert" else "delete",
      s"p${rnd.nextInt(100)}", rnd.nextInt(1000)))
    val log = logRows.toDF("k", "ts", "op", "v", "n")
    val got = Cdc.applyLog(snap2, log, Seq("k"), "ts", "op")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSet
    val winners = logRows.groupBy(_._1).map { case (k, rs) =>
      k -> rs.maxBy(r => (r._2, r._3, r._4, r._5))
    }
    val base = (1 to 50).map(k => (k.toLong, s"v$k", k)).map(t => t._1 -> t).toMap
    val brute = (base.keySet ++ winners.keySet).flatMap { k =>
      winners.get(k) match {
        case Some((_, _, "delete", _, _)) => None
        case Some((_, _, "upsert", v, n)) => Some((k, v, n))
        case _ => base.get(k).map(t => (t._1, t._2, t._3))
      }
    }
    got shouldBe brute
  }
}

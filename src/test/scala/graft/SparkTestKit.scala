package graft

import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.{DataFrame, Dataset}
import org.scalatest.Assertions._

/** One SparkSession for the whole forked test JVM, plus DataFrame equality
  * helpers (column-order-insensitive, row-order-insensitive multiset
  * compare; schema compared on names+types, nullability ignored). */
object SparkTestKit {

  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      // local[4, 3]: up to 3 attempts per task, so TaskRetrySpec can
      // inject first-attempt failures and assert bit-identical results
      // under retries (local-mode default is maxFailures=1 = no retry).
      // Suites that assert on deliberately-poisoned jobs still fail:
      // their injected faults throw on EVERY attempt.
      .master("local[4, 3]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // match the harness sessions: event-time gate queries read
      // TIMESTAMP(NANOS) parquet as nanosecond longs
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // micros-encoded events read as plain TimestampType (not NTZ) on a
      // pinned-UTC session, so epoch arithmetic matches the DuckDB oracle
      // whichever timestamp encoding the data generator shipped
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def assertDataFrameEquals(actual: Dataset[_], expected: Dataset[_]): Unit = {
    val expCols = expected.schema.fieldNames.toSeq
    val act = actual.toDF.select(expCols.head, expCols.tail: _*)

    val actTypes = act.schema.fields.map(f => (f.name, f.dataType)).toSeq
    val expTypes = expected.schema.fields.map(f => (f.name, f.dataType)).toSeq
    assert(actTypes == expTypes,
      s"schema mismatch:\n actual:   $actTypes\n expected: $expTypes")

    val a = act.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    val e = expected.toDF.collect().map(_.toSeq.map(String.valueOf)).sortBy(_.mkString("|"))
    assert(a.length == e.length && a.zip(e).forall(p => p._1 == p._2),
      s"rows mismatch:\n actual:\n${a.map(_.mkString(", ")).mkString("\n")}\n" +
        s" expected:\n${e.map(_.mkString(", ")).mkString("\n")}")
  }
}

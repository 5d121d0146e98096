package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // SPARK_GRAFT_ALT_SESSION=1: a deliberately DIFFERENT session — AQE
    // forced on with a tiny advisory size (different post-shuffle
    // partitioning), prime shuffle partition count, small scan splits
    // (different file partitioning), ANSI pinned on, and whole-stage
    // codegen OFF (interpreted expression paths must agree with
    // codegen'd ones). Every gate's output must be bit-identical to
    // the default session's — the global falsification test for "no
    // result depends on session config / partitioning" (round-10
    // VERDICT directive #4).
    val alt = sys.env.get("SPARK_GRAFT_ALT_SESSION").contains("1")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", if (alt) "7" else cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    if (alt) builder
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
      .config("spark.sql.files.maxPartitionBytes", "4m")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.codegen.wholeStage", "false")
    // SPARK_GRAFT_STATESTORE=rocksdb: the provider production 100 TB
    // streaming runs on — the streaming gates (and the stateful
    // stream-stream interval join in particular) must be bit-identical
    // under it (batch queries ignore the conf). The alt-session
    // discipline applied to streaming state; RocksDbStateParitySpec
    // pins the MemoryStream side.
    if (sys.env.get("SPARK_GRAFT_STATESTORE").contains("rocksdb")) builder
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val spark = builder
      // events.parquet carries TIMESTAMP(NANOS); the event-time queries
      // read it as nanosecond longs (set here once — queries never
      // mutate session state)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // micros-encoded events read as plain TimestampType (not NTZ) on a
      // pinned-UTC session, so epoch arithmetic matches the DuckDB oracle
      // whichever timestamp encoding the data generator shipped
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // dev aid: SPARK_GRAFT_ONLY=q1,q2 restricts to named queries for a
    // fast single-row oracle check (the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    SparkEntry.queries
      .filter { case (name, _) => only.isEmpty || only(name) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}

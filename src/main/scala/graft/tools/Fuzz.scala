package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Differential fuzz harness: a SEEDED random composition generator over
 * the join/dedup/agg/window operator surface, every generated case
 * replayed in DuckDB. The 140+ hand-written gates prove each operator
 * once; this guards the COMPOSITIONS — a salted join feeding a bounded
 * top-k, a left range join aggregated over its miss rows, an as-of over
 * filtered inputs — with randomized knobs (mod filters, salt factors,
 * bucket widths, channel caps, join types, directions, k) that no
 * hand-written gate enumerates.
 *
 * Determinism rules every pattern obeys (the same discipline as the
 * gates): integer/decimal arithmetic only, unique ids wherever a rank
 * or dedup needs a total order, aggregated right sides so as-of
 * payloads are tie-free, and identical modulo filters speakable in both
 * engines.
 *
 * Usage: `runMain graft.tools.Fuzz <sfDir> <outDir> [nCases] [seed]` —
 * writes one parquet per case plus `oracle_sql.json`, the exact layout
 * `graft.Verify` emits, so `tools/check_oracle.py` replays and compares
 * unchanged; `tools/fuzz.sh` wraps the pair and records
 * `FUZZ_RESULT.json`. Drive runs a small smoke slice each round.
 */
object Fuzz {

  private case class Case(name: String, df: DataFrame, sql: String)

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Fuzz <sfDir> <outDir> [nCases] [seed]")
    val (sfDir, outDir) = (args(0), args(1))
    val n = if (args.length > 2) args(2).toInt else 200
    val seed = if (args.length > 3) args(3).toLong else 20260814L
    val spark = session()
    val cases = (0 until n).map(i => gen(spark, sfDir, i, seed))
    val sqls = new java.util.TreeMap[String, String]()
    cases.foreach { c =>
      c.df.write.mode("overwrite").parquet(s"$outDir/${c.name}")
      sqls.put(c.name, c.sql)
    }
    val json = new StringBuilder("{")
    val it = sqls.entrySet().iterator()
    var first = true
    while (it.hasNext) {
      val e = it.next()
      if (!first) json.append(",")
      first = false
      json.append("\"").append(e.getKey).append("\":")
        .append(quote(e.getValue))
    }
    json.append("}")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$outDir/oracle_sql.json"),
      json.toString.getBytes("UTF-8"))
    println(s"[fuzz] wrote ${cases.size} cases to $outDir (seed=$seed)")
    spark.stop()
  }

  private def quote(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .master("local[32]")
      .appName("graft-fuzz")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Drive smoke slice: build and execute the first `n` cases on the
    * given session (one per pattern at n=6), returning (name, rows).
    * The DuckDB differential replay lives in tools/fuzz.sh — this only
    * proves the generator's compositions plan and run. */
  def smoke(spark: SparkSession, dir: String, n: Int, seed: Long): Seq[(String, Long)] =
    (0 until n).map { i =>
      val c = gen(spark, dir, i, seed)
      (c.name, c.df.count())
    }

  /** One seeded case: the pattern cycles round-robin so every family
    * gets ~n/10 of the budget; knobs derive from the per-case RNG. */
  private def gen(spark: SparkSession, dir: String, i: Int, seed: Long): Case = {
    val rng = new scala.util.Random(seed * 1000003L + i)
    val name = f"fz_$i%03d"
    (i % 14) match {
      case 0 => saltedAgg(spark, dir, name, rng)
      case 1 => rangeAgg(spark, dir, name, rng)
      case 2 => joinQuota(spark, dir, name, rng)
      case 3 => dedupVariants(spark, dir, name, rng)
      case 4 => asofCase(spark, dir, name, rng)
      case 5 => runningWindow(spark, dir, name, rng)
      case 6 => pointInTimeCase(spark, dir, name, rng)
      case 7 => overlapAgg(spark, dir, name, rng)
      case 8 => groupSplitCase(spark, dir, name, rng)
      case 9 => graphCase(spark, dir, name, rng)
      case 10 => winsorizeCase(spark, dir, name, rng)
      case 11 => shardsCase(spark, dir, name, rng)
      case 12 => noveltyCase(spark, dir, name, rng)
      case 13 => spearmanCase(spark, dir, name, rng)
    }
  }

  /** per-group Spearman, BOTH normalizers (the tieCorrected flag is a
    * random knob), over synthetic heavy-tie integer columns vs the
    * doubled-average-rank replay — tie-corrected cases replay the
    * Σ(t³−t) terms plus the identical IEEE-double √ normalizer with
    * explicit trunc (random moduli, multiplier, and group count). */
  private def spearmanCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val g = 2 + rng.nextInt(8)
    val mx = 5 + rng.nextInt(50)
    val my = 5 + rng.nextInt(50)
    val a = 1 + rng.nextInt(7)
    val tied = rng.nextBoolean()
    val in = docs(spark, dir).select(
      pmod(col("doc_id"), lit(g.toLong)).as("gg"),
      pmod(col("n_chars"), lit(mx.toLong)).as("x"),
      pmod(col("n_chars") * a + col("doc_id"), lit(my.toLong)).as("y"))
    val base =
      s"""r AS (SELECT doc_id % $g gg, n_chars % $mx x,
         |             (n_chars * $a + doc_id) % $my y FROM documents),
         |rk AS (SELECT gg,
         |  2 * rank() OVER (PARTITION BY gg ORDER BY x)
         |    + count(*) OVER (PARTITION BY gg, x) - 1 ax,
         |  2 * rank() OVER (PARTITION BY gg ORDER BY y)
         |    + count(*) OVER (PARTITION BY gg, y) - 1 ay
         |  FROM r)""".stripMargin
    val sql =
      if (!tied)
        s"""WITH $base
           |SELECT gg, CAST(count(*) AS BIGINT) n,
           |  CASE WHEN count(*) >= 2 THEN CAST(
           |    1000000 - (3 * SUM((ax - ay) * (ax - ay)) * 1000000)
           |      // (2 * CAST(count(*) AS HUGEINT)
           |          * (CAST(count(*) AS HUGEINT) * count(*) - 1)) AS BIGINT)
           |    END rho_micro
           |FROM rk GROUP BY 1""".stripMargin
      else
        s"""WITH $base,
           |tx AS (SELECT gg, SUM(CAST(c AS HUGEINT) * c * c - c) t
           |       FROM (SELECT gg, x, count(*) c FROM r GROUP BY 1, 2)
           |       GROUP BY 1),
           |ty AS (SELECT gg, SUM(CAST(c AS HUGEINT) * c * c - c) t
           |       FROM (SELECT gg, y, count(*) c FROM r GROUP BY 1, 2)
           |       GROUP BY 1),
           |s AS (SELECT gg, CAST(count(*) AS BIGINT) n,
           |        SUM(CAST(ax - ay AS HUGEINT) * (ax - ay)) sd2
           |      FROM rk GROUP BY 1),
           |f AS (SELECT s.gg, s.n, s.sd2,
           |        CAST(s.n AS HUGEINT) * s.n * s.n - s.n - tx.t a,
           |        CAST(s.n AS HUGEINT) * s.n * s.n - s.n - ty.t b
           |      FROM s JOIN tx ON s.gg IS NOT DISTINCT FROM tx.gg
           |             JOIN ty ON s.gg IS NOT DISTINCT FROM ty.gg)
           |SELECT gg, n,
           |  CASE WHEN n >= 2 AND a > 0 AND b > 0 THEN
           |    CAST(trunc(1e6 * CAST(a + b - 3 * sd2 AS DOUBLE) /
           |      (2.0 * sqrt(CAST(a AS DOUBLE) * CAST(b AS DOUBLE))))
           |      AS BIGINT) END rho_micro
           |FROM f""".stripMargin
    Case(name,
      graft.stats.GroupStats.spearman(in, Seq("gg"), "x", "y",
        tieCorrected = tied),
      sql)
  }

  /** winsorize over a synthetic value/group pair vs the histogram-rank
    * replay (random modulus, group width, and clip band). */
  private def winsorizeCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val a = 1 + rng.nextInt(5)
    val b = rng.nextInt(3)
    val m = 50 + rng.nextInt(950)
    val g = 2 + rng.nextInt(8)
    val lo = 1 + rng.nextInt(40)
    val hi = 60 + rng.nextInt(40)
    val in = docs(spark, dir).select(col("doc_id"),
      pmod(col("doc_id"), lit(g.toLong)).as("gg"),
      pmod(col("n_chars") * a + col("doc_id") * b, lit(m.toLong)).as("v"))
    Case(name,
      graft.stats.GroupStats.winsorize(in, Seq("gg"), "v", lo, hi, "w"),
      s"""WITH d AS (SELECT doc_id, doc_id % $g gg,
         |             (n_chars * $a + doc_id * $b) % $m v FROM documents),
         |h AS (SELECT gg, v, CAST(count(*) AS BIGINT) cnt FROM d GROUP BY 1, 2),
         |c AS (SELECT gg, v, cnt,
         |        CAST(sum(cnt) OVER (PARTITION BY gg ORDER BY v) AS BIGINT) cum,
         |        CAST(sum(cnt) OVER (PARTITION BY gg) AS BIGINT) tot FROM h),
         |b2 AS (SELECT gg,
         |        min(CASE WHEN 100 * cum >= $lo * tot THEN v END) blo,
         |        min(CASE WHEN 100 * cum >= $hi * tot THEN v END) bhi
         |      FROM c GROUP BY 1)
         |SELECT d.doc_id, d.gg, d.v,
         |  CAST(least(greatest(d.v, b2.blo), b2.bhi) AS BIGINT) w
         |FROM d JOIN b2 ON d.gg = b2.gg""".stripMargin)
  }

  /** shard assignment over a synthetic non-negative weight vs the one
    * cumulative-window replay (random weight mix and shard count). */
  private def shardsCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val c = rng.nextInt(4)
    val m = 20 + rng.nextInt(480)
    val n = 2 + rng.nextInt(15)
    val in = docs(spark, dir).select(col("doc_id"),
      pmod(col("n_chars") + col("doc_id") * c, lit(m.toLong)).as("w"))
    Case(name,
      graft.curation.Shards.assign(in, "doc_id", "w", n),
      s"""WITH t AS (SELECT doc_id,
         |             CAST((n_chars + doc_id * $c) % $m AS BIGINT) w
         |           FROM documents),
         |c2 AS (SELECT doc_id, w,
         |        coalesce(sum(w) OVER (ORDER BY doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) st,
         |        sum(w) OVER () tot FROM t)
         |SELECT doc_id, w weight, CAST((st * $n) // tot AS BIGINT) shard
         |FROM c2""".stripMargin)
  }

  /** novelty scoring (random shingle width, random doc-subset filter)
    * vs the min-doc_id first-seen replay. */
  private def noveltyCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val n = 2 + rng.nextInt(2)
    val m = 1 + rng.nextInt(4) // keep doc_id % (m+1) != m
    val gram = (1 to n).map(k => s"ws[i + ${k - 1}]").mkString(" || ' ' || ")
    val in = docs(spark, dir)
      .where(pmod(col("doc_id"), lit(m + 1L)) =!= lit(m.toLong))
    Case(name,
      graft.text.TextFunctions.noveltyScores(in, "doc_id", "text", n),
      s"""WITH t AS (SELECT doc_id, ${graft.SparkEntry.tokensSql} ws FROM documents
         |           WHERE doc_id % ${m + 1} <> $m),
         |sh AS (SELECT doc_id,
         |         unnest(list_distinct([$gram
         |                 for i in range(1, len(ws) - ${n - 2})])) g
         |       FROM t WHERE len(ws) >= $n),
         |f AS (SELECT g, min(doc_id) fid FROM sh GROUP BY 1)
         |SELECT sh.doc_id, CAST(count(*) AS BIGINT) n_shingles,
         |  CAST(sum(CASE WHEN f.fid = sh.doc_id THEN 1 ELSE 0 END) AS BIGINT) n_novel,
         |  CAST((sum(CASE WHEN f.fid = sh.doc_id THEN 1 ELSE 0 END) * 1000000)
         |    // count(*) AS BIGINT) novelty_micro
         |FROM sh JOIN f ON sh.g = f.g GROUP BY 1""".stripMargin)
  }

  private def li(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/lineitem.parquet")
  private def ord(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/orders.parquet")
  private def cust(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/customer.parquet")
  private def docs(spark: SparkSession, dir: String) =
    spark.read.parquet(s"$dir/documents.parquet")

  /** filtered lineitem → salted join vs orders → grouped decimal agg.
    * The salted join must be RESULT-IDENTICAL to the plain join the
    * oracle runs, for any salt factor / hot-key set / join type. */
  private def saltedAgg(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val m = 2 + rng.nextInt(5)
    val r = rng.nextInt(m)
    val salt = 2 + rng.nextInt(7)
    val joinType = if (rng.nextBoolean()) "inner" else "left"
    val hotMod = 3 + rng.nextInt(5)
    // price in integer CENTS (per-row decimal→cents), so the final
    // column is BIGINT on both sides — a DECIMAL output column is the
    // one type the driver's hasher mangles (check_oracle RISKY_TYPES)
    val l = li(spark, dir)
      .where(pmod(col("l_orderkey"), lit(m)) === r)
      .select(col("l_orderkey").as("k"),
        (col("l_extendedprice").cast("decimal(38,8)") * 100)
          .cast("long").as("x"))
    val d = ord(spark, dir)
      .select(col("o_orderkey").as("k"), col("o_custkey").as("c"))
    val hot = d.where(pmod(col("k"), lit(hotMod)) === 0).select("k")
    val joined = graft.join.SkewJoin.salted(l, d, Seq("k"), salt,
      hotKeys = Some(hot), joinType = joinType)
    val out = joined.groupBy(col("c"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val jt = if (joinType == "left") "LEFT JOIN" else "JOIN"
    Case(name, out,
      s"""WITH l AS (SELECT l_orderkey k,
         |             CAST(CAST(l_extendedprice AS DECIMAL(38,8)) * 100 AS BIGINT) x
         |           FROM lineitem WHERE l_orderkey % $m = $r),
         |d AS (SELECT o_orderkey k, o_custkey c FROM orders)
         |SELECT d.c, CAST(count(*) AS BIGINT) n, CAST(sum(l.x) AS BIGINT) sx
         |FROM l $jt d ON l.k = d.k GROUP BY 1""".stripMargin)
  }

  /** points-in-intervals (random width, bucket width, channel cap,
    * join type) → per-interval counts; the tiny `maxBucketsPerInterval`
    * draws force the wide-interval broadcast channel. */
  private def rangeAgg(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val m = 2 + rng.nextInt(4)
    val r = rng.nextInt(m)
    val a = 3 + rng.nextInt(9)
    val span = 1 + rng.nextInt(400)
    val bw = Seq(8d, 32d, 128d)(rng.nextInt(3))
    val cap = Seq(2, 8, 4096)(rng.nextInt(3))
    val joinType = if (rng.nextBoolean()) "inner" else "left"
    val pts = li(spark, dir)
      .where(pmod(col("l_orderkey"), lit(m)) === r)
      .select((col("l_orderkey") * 10 + col("l_linenumber")).as("pt_id"),
        col("l_partkey").as("pt_v"))
    val ivs = cust(spark, dir)
      .select(col("c_custkey").as("iv_id"),
        pmod(col("c_custkey") * a, lit(1000)).as("iv_lo"),
        (pmod(col("c_custkey") * a, lit(1000)) + span).as("iv_hi"))
    val joined = graft.join.RangeJoin.pointInInterval(
      pts, ivs, col("pt_v"), col("iv_lo"), col("iv_hi"),
      bucketWidth = bw, maxBucketsPerInterval = cap, joinType = joinType)
    val out = joined.groupBy(col("iv_id"))
      .agg(count(lit(1)).as("n"), sum(col("pt_id")).as("sid"))
      .select(col("iv_id"), col("n"), col("sid").cast("long").as("sid"))
    val jt = if (joinType == "left") "LEFT JOIN" else "JOIN"
    Case(name, out,
      s"""WITH p AS (SELECT l_orderkey * 10 + l_linenumber pt_id, l_partkey pt_v
         |           FROM lineitem WHERE l_orderkey % $m = $r),
         |i AS (SELECT c_custkey iv_id, (c_custkey * $a) % 1000 iv_lo,
         |             (c_custkey * $a) % 1000 + $span iv_hi FROM customer)
         |SELECT i.iv_id, CAST(count(*) AS BIGINT) n, CAST(sum(p.pt_id) AS BIGINT) sid
         |FROM p $jt i ON p.pt_v >= i.iv_lo AND p.pt_v <= i.iv_hi
         |GROUP BY 1""".stripMargin)
  }

  /** join → bounded top-k per stratum (quotaTopK) with a pseudo-score:
    * the aggregate's (-score, id) cut must equal the oracle window's
    * (score DESC, id ASC) row_number for any k / stratum width. */
  private def joinQuota(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val m = 2 + rng.nextInt(4)
    val r = rng.nextInt(m)
    val g = 3 + rng.nextInt(10)
    val k = 1 + rng.nextInt(8)
    // the synthetic lineitem carries duplicate (orderkey, linenumber)
    // rows, so rid is made unique by a pre-aggregation (quotaTopK's id
    // contract requires it; the extra stage IS a composition)
    val base = li(spark, dir)
      .where(pmod(col("l_orderkey"), lit(m)) === r)
      .groupBy((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        col("l_orderkey").as("k"))
      .agg(min(col("l_returnflag")).as("f"))
      .join(ord(spark, dir).select(col("o_orderkey").as("k"),
        pmod(col("o_custkey"), lit(g)).as("cg")), "k")
      // mod rid down BEFORE the Knuth-multiplier: (rid % p) * c % p ==
      // rid * c % p, and the bounded product (< p*c ~ 2.7e15) cannot
      // overflow Long — the raw product does at sf1, where MakeSf1's
      // copy shift puts rid near 9e10 (ANSI mode correctly aborts)
      .withColumn("score",
        pmod(pmod(col("rid"), lit(1000003L)) * 2654435761L, lit(1000003L)))
    val out = graft.curation.Sampling
      .quotaTopK(base, Seq("f", "cg"), "score", "rid", k)
      .select(col("f"), col("cg"), col("rank").cast("long").as("rank"),
        col("rid"), col("score"))
    Case(name, out,
      s"""WITH u AS (
         |  SELECT l_orderkey * 10 + l_linenumber rid, l_orderkey k,
         |         min(l_returnflag) f
         |  FROM lineitem WHERE l_orderkey % $m = $r GROUP BY 1, 2),
         |b AS (
         |  SELECT u.rid, u.f, o.o_custkey % $g cg,
         |         ((u.rid % 1000003) * 2654435761) % 1000003 score
         |  FROM u JOIN orders o ON u.k = o.o_orderkey)
         |SELECT f, cg, CAST(rn AS BIGINT) rank, rid, score FROM (
         |  SELECT f, cg, rid, score,
         |         row_number() OVER (PARTITION BY f, cg ORDER BY score DESC, rid) rn
         |  FROM b) t WHERE rn <= $k""".stripMargin)
  }

  /** exact dedup over variant-injected documents (duplicate-content
    * twins at random id offsets): all variants of a text must collapse
    * to the same canon — composed with a mod filter on the base. */
  private def dedupVariants(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val m = 1 + rng.nextInt(3)
    val r = rng.nextInt(m)
    val off = 1000000L * (1 + rng.nextInt(3))
    val withTwin = rng.nextBoolean()
    val base = docs(spark, dir)
      .where(pmod(col("doc_id"), lit(m)) === r)
      .select(col("doc_id"), col("text"))
    val variants =
      if (withTwin)
        base.unionByName(base.select((col("doc_id") + off).as("doc_id"), col("text")))
      else base
    val out = graft.dedup.Dedup.exactCanon(variants, "doc_id", "text")
    val varSql =
      if (withTwin)
        s"SELECT doc_id, text FROM b UNION ALL SELECT doc_id + $off, text FROM b"
      else "SELECT doc_id, text FROM b"
    Case(name, out,
      s"""WITH b AS (SELECT doc_id, text FROM documents WHERE doc_id % $m = $r),
         |v AS ($varSql)
         |SELECT doc_id, min(doc_id) OVER (PARTITION BY text) canon_id FROM v""".stripMargin)
  }

  /** as-of (random direction / join type / key width) with a DISTINCT
    * left and an aggregated tie-free right, vs DuckDB's native ASOF. */
  private def asofCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val g = Seq(7, 19, 41)(rng.nextInt(3))
    val m = 2 + rng.nextInt(3)
    val r = rng.nextInt(m)
    val joinType = if (rng.nextBoolean()) "inner" else "left"
    val direction = if (rng.nextBoolean()) "backward" else "forward"
    val l = ord(spark, dir)
      .select(pmod(col("o_custkey"), lit(g)).as("g"), col("o_orderkey").as("lts"))
      .distinct()
    val rt = li(spark, dir)
      .where(pmod(col("l_orderkey"), lit(m)) === r)
      .groupBy(pmod(col("l_orderkey"), lit(g)).as("g"), col("l_partkey").as("rts"))
      .agg(max(col("l_suppkey")).as("pay"))
    val out = graft.join.AsOfJoin.asof(l, rt, Seq("g"), "lts", "rts",
        joinType = joinType, direction = direction)
      .select(col("g"), col("lts"), col("rts"), col("pay"))
    val jt = if (joinType == "left") "ASOF LEFT JOIN" else "ASOF JOIN"
    val cmp = if (direction == "backward") ">=" else "<="
    Case(name, out,
      s"""WITH l AS (SELECT DISTINCT o_custkey % $g g, o_orderkey lts FROM orders),
         |r AS (SELECT l_orderkey % $g g, l_partkey rts, max(l_suppkey) pay
         |      FROM lineitem WHERE l_orderkey % $m = $r GROUP BY 1, 2)
         |SELECT l.g, l.lts, r.rts, r.pay
         |FROM l $jt r ON l.g = r.g AND l.lts $cmp r.rts""".stripMargin)
  }

  /** point-in-time join over a constructed episode history (optionally
    * GAPPED — dropped episodes must surface as misses through the
    * as-of + residual-validity machinery exactly like the oracle's
    * plain `vf <= ts < vt` join). */
  private def pointInTimeCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val g = Seq(5, 11, 23)(rng.nextInt(3))
    val m = 2 + rng.nextInt(3)
    val r = rng.nextInt(m)
    val gapped = rng.nextBoolean()
    val joinType = if (rng.nextBoolean()) "inner" else "left"
    var h = cust(spark, dir).select(
      pmod(col("c_custkey"), lit(g)).as("g"),
      (expr(s"c_custkey div $g") * 100).as("vf"),
      (expr(s"c_custkey div $g") * 100 + 100).as("vt"),
      col("c_custkey").as("pay"))
    if (gapped) h = h.where(pmod(expr(s"c_custkey div $g"), lit(3)) =!= 0)
    val fct = li(spark, dir)
      .where(pmod(col("l_orderkey"), lit(m)) === r)
      .select(pmod(col("l_orderkey"), lit(g)).as("g"),
        (col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        pmod(col("l_partkey") * 13, lit(100000)).as("ts"))
    val out = graft.curation.ChangeHistory.pointInTime(
        fct, h, Seq("g"), "ts", "vf", "vt", joinType)
      .select(col("g"), col("rid"), col("ts"), col("vf"), col("pay"))
    val gapSql = if (gapped) s"WHERE (c_custkey // $g) % 3 != 0" else ""
    val jt = if (joinType == "left") "LEFT JOIN" else "JOIN"
    Case(name, out,
      s"""WITH h AS (SELECT c_custkey % $g g, (c_custkey // $g) * 100 vf,
         |                  (c_custkey // $g) * 100 + 100 vt, c_custkey pay
         |           FROM customer $gapSql),
         |f AS (SELECT l_orderkey % $g g, l_orderkey * 10 + l_linenumber rid,
         |             (l_partkey * 13) % 100000 ts
         |      FROM lineitem WHERE l_orderkey % $m = $r)
         |SELECT f.g, f.rid, f.ts, h.vf, h.pay
         |FROM f $jt h ON f.g = h.g AND f.ts >= h.vf AND f.ts < h.vt""".stripMargin)
  }

  /** interval×interval overlap join (inclusive ends, random widths and
    * bucket width, inner/left) aggregated per left interval. */
  private def overlapAgg(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val a = 3 + rng.nextInt(7)
    val b = 3 + rng.nextInt(7)
    val w1 = 1 + rng.nextInt(150)
    val w2 = 1 + rng.nextInt(150)
    val bw = Seq(16d, 64d, 256d)(rng.nextInt(3))
    val joinType = if (rng.nextBoolean()) "inner" else "left"
    val l = cust(spark, dir).select(col("c_custkey").as("al_id"),
      pmod(col("c_custkey") * a, lit(1000)).as("al"),
      (pmod(col("c_custkey") * a, lit(1000)) + w1).as("ah"))
    val rt = spark.read.parquet(s"$dir/supplier.parquet")
      .select(col("s_suppkey").as("br_id"),
        pmod(col("s_suppkey") * b, lit(1000)).as("bl"),
        (pmod(col("s_suppkey") * b, lit(1000)) + w2).as("bh"))
    val joined =
      if (joinType == "inner")
        graft.join.RangeJoin.overlapJoin(l, rt, col("al"), col("ah"),
          col("bl"), col("bh"), bw)
      else
        graft.join.RangeJoin.overlapJoinLeft(l, rt, col("al"), col("ah"),
          col("bl"), col("bh"), bw)
    val out = joined.groupBy(col("al_id"))
      .agg(count(lit(1)).as("n"), sum(col("br_id")).as("sb"))
      .select(col("al_id"), col("n"), col("sb").cast("long").as("sb"))
    val jt = if (joinType == "left") "LEFT JOIN" else "JOIN"
    Case(name, out,
      s"""WITH l AS (SELECT c_custkey al_id, (c_custkey * $a) % 1000 al,
         |                  (c_custkey * $a) % 1000 + $w1 ah FROM customer),
         |r AS (SELECT s_suppkey br_id, (s_suppkey * $b) % 1000 bl,
         |             (s_suppkey * $b) % 1000 + $w2 bh FROM supplier)
         |SELECT l.al_id, CAST(count(*) AS BIGINT) n, CAST(sum(r.br_id) AS BIGINT) sb
         |FROM l $jt r ON l.al <= r.bh AND r.bl <= l.ah
         |GROUP BY 1""".stripMargin)
  }

  /** leakage-safe group split over a RANDOM synthetic pair graph
    * (arithmetic chain edges of random stride/density over a filtered
    * corpus — chains exercise the transitive closure, not just direct
    * pairs) vs the recursive-reachability components + md5-threshold
    * CASE; random split weights. */
  private def groupSplitCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val m = 1 + rng.nextInt(3)
    val r = rng.nextInt(m)
    // stride is a multiple of the filter modulus so both edge endpoints
    // survive the filter (chains of length > 2 appear when edgeMod
    // admits consecutive sources)
    val step = m * (1 + rng.nextInt(3))
    val edgeMod = 1 + rng.nextInt(4)
    val wTrain = 0.4 + 0.1 * rng.nextInt(4)
    val splits = Seq("train" -> wTrain, "test" -> (1.0 - wTrain))
    val Seq(b1) = graft.curation.Sampling.splitBoundsHex(splits)
    val base = docs(spark, dir)
      .where(pmod(col("doc_id"), lit(m)) === r)
      .select(col("doc_id"), col("source"))
    val pairs = base
      .select(col("doc_id").as("doc_i"), (col("doc_id") + step).as("doc_j"))
      .where(pmod(col("doc_i"), lit(edgeMod)) === 0)
      .join(base.select(col("doc_id").as("doc_j")), "doc_j")
    val out = graft.curation.Sampling.groupSplit(base, "doc_id", pairs, splits)
      .select(col("doc_id"), col("source"), col("split"))
    Case(name, out,
      s"""WITH RECURSIVE
         |b AS (SELECT doc_id, source FROM documents WHERE doc_id % $m = $r),
         |jp AS (SELECT a.doc_id doc_i, a.doc_id + $step doc_j
         |       FROM b a JOIN b c ON c.doc_id = a.doc_id + $step
         |       WHERE a.doc_id % $edgeMod = 0),
         |edges AS (SELECT doc_i a, doc_j e FROM jp
         |          UNION ALL SELECT doc_j, doc_i FROM jp),
         |reach(src, node) AS (
         |  SELECT a, a FROM (SELECT DISTINCT a FROM edges) n0
         |  UNION
         |  SELECT rr.src, e2.e FROM reach rr JOIN edges e2 ON rr.node = e2.a),
         |comp AS (SELECT src doc_id, min(node) cluster_id FROM reach GROUP BY src),
         |g AS (SELECT b.doc_id, b.source,
         |        CAST(coalesce(c.cluster_id, b.doc_id) AS VARCHAR) grp
         |      FROM b LEFT JOIN comp c USING (doc_id))
         |SELECT doc_id, source,
         |  CASE WHEN substr(md5(grp), 1, 4) < '$b1' THEN 'train'
         |       ELSE 'test' END split
         |FROM g""".stripMargin)
  }

  /** graph ops over a random circulant-ish graph: customer keys
    * connected by generator steps {a, b, a+b} (triangle-rich by
    * construction — (k, k+a, k+a+b) closes via the b step), random op
    * among triangle counts / clustering coefficient / fixed-round
    * k-core, each replayed stage-for-stage in SQL. */
  private def graphCase(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    val m = 1 + rng.nextInt(3)
    val r = rng.nextInt(m)
    val a = m * (1 + rng.nextInt(3))
    val b = a + m * (1 + rng.nextInt(3)) // b > a, both multiples of m
    val base = cust(spark, dir)
      .where(pmod(col("c_custkey"), lit(m)) === r)
      .select(col("c_custkey").as("k"))
    def gen1(s: Int) = base
      .select(col("k").as("doc_i"), (col("k") + s).as("doc_j"))
      .join(base.select(col("k").as("doc_j")), "doc_j")
      .select("doc_i", "doc_j")
    val pairs = gen1(a).unionByName(gen1(b)).unionByName(gen1(a + b)).distinct()
    val pairsSql =
      s"""b AS (SELECT c_custkey k FROM customer WHERE c_custkey % $m = $r),
         |p AS (SELECT DISTINCT x.k i, x.k + s j
         |      FROM b x CROSS JOIN (VALUES ($a), ($b), (${a + b})) g(s)
         |      JOIN b y ON y.k = x.k + s)""".stripMargin
    val triSql =
      s"""deg AS (SELECT n, count(*) d FROM
         |        (SELECT i n FROM p UNION ALL SELECT j FROM p) GROUP BY 1),
         |o AS (SELECT
         |        CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND p.i < p.j) THEN p.i ELSE p.j END s,
         |        CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND p.i < p.j) THEN p.j ELSE p.i END t,
         |        CASE WHEN d1.d < d2.d OR (d1.d = d2.d AND p.i < p.j) THEN d2.d ELSE d1.d END dt
         |      FROM p JOIN deg d1 ON p.i = d1.n JOIN deg d2 ON p.j = d2.n),
         |w AS (SELECT e1.s a, e1.t b, e2.t c FROM o e1 JOIN o e2 ON e1.s = e2.s
         |      WHERE e1.dt < e2.dt OR (e1.dt = e2.dt AND e1.t < e2.t)),
         |tr AS (SELECT w.a, w.b, w.c FROM w JOIN o ON o.s = w.b AND o.t = w.c),
         |tc AS (SELECT node, CAST(count(*) AS BIGINT) tri_cnt FROM
         |  (SELECT a node FROM tr UNION ALL SELECT b FROM tr UNION ALL SELECT c FROM tr)
         |GROUP BY 1)""".stripMargin
    rng.nextInt(4) match {
      case 0 =>
        Case(name, graft.graph.Triangles.perNode(pairs, "doc_i", "doc_j"),
          s"WITH $pairsSql,\n$triSql\nSELECT node, tri_cnt FROM tc")
      case 3 =>
        // fixed-point PageRank over the symmetrized circulant graph,
        // random iteration count — full integer-round replay
        val iters = 1 + rng.nextInt(3)
        val edges = pairs.select(col("doc_i").as("src"), col("doc_j").as("dst"))
          .unionByName(pairs.select(col("doc_j").as("src"), col("doc_i").as("dst")))
        val rounds = (1 to iters).map { q =>
          s"""r$q AS MATERIALIZED (
             |  SELECT b.node, b.outdeg, b.b,
             |         b.b + (85 * coalesce(c.cs, 0)) // 100 rk
             |  FROM pbase b LEFT JOIN (
             |    SELECT pe.dst dn, sum(r.rk // r.outdeg) cs
             |    FROM r${q - 1} r JOIN pe ON r.node = pe.src
             |    WHERE r.outdeg > 0 GROUP BY 1) c ON b.node = c.dn)""".stripMargin
        }.mkString(",\n")
        Case(name,
          graft.graph.PageRank.run(edges, "src", "dst", iterations = iters),
          s"""WITH $pairsSql,
             |pe AS MATERIALIZED (SELECT i src, j dst FROM p
             |                    UNION ALL SELECT j, i FROM p),
             |outd AS MATERIALIZED (SELECT src, count(*) outdeg FROM pe GROUP BY 1),
             |pnd AS MATERIALIZED (SELECT DISTINCT node FROM
             |  (SELECT src node FROM pe UNION ALL SELECT dst FROM pe)),
             |pst AS MATERIALIZED (SELECT count(*) n FROM pnd),
             |pbase AS MATERIALIZED (
             |  SELECT node, coalesce(outdeg, 0) outdeg,
             |         (15 * 1000000000000) // (100 * n) b,
             |         1000000000000 // n r0
             |  FROM pnd LEFT JOIN outd ON node = src CROSS JOIN pst),
             |r0 AS MATERIALIZED (SELECT node, outdeg, b, r0 rk FROM pbase),
             |$rounds
             |SELECT CAST(node AS BIGINT) node, CAST(rk AS BIGINT) pr_unit
             |FROM r$iters""".stripMargin)
      case 1 =>
        Case(name,
          graft.graph.Triangles.clusteringCoef(pairs, "doc_i", "doc_j"),
          s"""WITH $pairsSql,
             |$triSql
             |SELECT d.n node, CAST(d.d AS BIGINT) deg,
             |  coalesce(tc.tri_cnt, 0) tri_cnt,
             |  CAST(CASE WHEN d.d < 2 THEN 0
             |       ELSE (2 * coalesce(tc.tri_cnt, 0) * 1000000) // (d.d * (d.d - 1))
             |       END AS BIGINT) coef_unit
             |FROM deg d LEFT JOIN tc ON d.n = tc.node""".stripMargin)
      case 2 =>
        val k = 2 + rng.nextInt(2)
        val rounds = 1 + rng.nextInt(4)
        val peel = (1 to rounds).map { q =>
          s"""d$q AS MATERIALIZED (SELECT node FROM (
             |  SELECT node, count(*) c FROM
             |    (SELECT u node FROM e${q - 1} UNION ALL SELECT v FROM e${q - 1})
             |  GROUP BY 1) WHERE c >= $k),
             |e$q AS MATERIALIZED (SELECT u, v FROM e${q - 1}
             |  WHERE u IN (SELECT node FROM d$q) AND v IN (SELECT node FROM d$q))""".stripMargin
        }.mkString(",\n")
        Case(name,
          graft.graph.KCore.kCore(pairs, "doc_i", "doc_j", k, rounds),
          s"""WITH $pairsSql,
             |e0 AS MATERIALIZED (SELECT i u, j v FROM p),
             |$peel
             |SELECT node, CAST(count(*) AS BIGINT) deg FROM
             |  (SELECT u node FROM e$rounds UNION ALL SELECT v FROM e$rounds)
             |GROUP BY 1""".stripMargin)
    }
  }

  /** running / trailing aggregation over a unique total order vs the
    * identical SQL window (random frame shape and partition width). */
  private def runningWindow(spark: SparkSession, dir: String, name: String,
      rng: scala.util.Random): Case = {
    import org.apache.spark.sql.expressions.Window
    val g = 3 + rng.nextInt(10)
    val trailing = rng.nextInt(5) // 0 => unbounded
    // pre-aggregate to a UNIQUE rid (duplicate synthetic rows would
    // make the ROWS-frame order within ties engine-dependent)
    val base = li(spark, dir)
      .groupBy((col("l_orderkey") * 10 + col("l_linenumber")).as("rid"),
        pmod(col("l_orderkey"), lit(g)).as("gg"))
      .agg(sum(col("l_quantity").cast("long")).as("q"))
    val w0 = Window.partitionBy("gg").orderBy(col("rid"))
    val w = if (trailing == 0) w0.rowsBetween(Window.unboundedPreceding, 0)
            else w0.rowsBetween(-trailing, 0)
    val out = base.select(col("gg"), col("rid"), col("q"),
      sum(col("q")).over(w).as("run"))
    val frame = if (trailing == 0) "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
                else s"ROWS BETWEEN $trailing PRECEDING AND CURRENT ROW"
    Case(name, out,
      s"""WITH b AS (SELECT l_orderkey * 10 + l_linenumber rid,
         |                  l_orderkey % $g gg,
         |                  CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) q
         |           FROM lineitem GROUP BY 1, 2)
         |SELECT gg, rid, q,
         |       CAST(sum(q) OVER (PARTITION BY gg ORDER BY rid $frame) AS BIGINT) run
         |FROM b""".stripMargin)
  }
}

package graft.layout

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Small-file compaction for long-lived table layouts. A 100 TB table
 * that receives per-batch appends (CDC merges, hourly loads) fragments:
 * every append task can add one file PER BUCKET, so after b batches a
 * `numBuckets`-bucket table holds up to b·numBuckets files — the scan
 * pays per-file open cost, and worse, Spark only trusts the writer's
 * per-bucket `sortBy` order for SINGLE-file buckets, so the fragmented
 * table silently re-sorts inside every sort-merge join that the layout
 * was built to make sort-free.
 *
 * [[compactBucketed]] is the maintenance operator that restores the
 * layout: it bin-packs every bucket back to exactly one file while
 * preserving the table's OWN bucket spec (count, keys, per-bucket
 * sort), so [[Bucketed.colocatedJoin]] plans with zero Exchange and
 * zero Sort before and after — pinned by `CompactSpec` and the
 * `layout_compact` oracle row (content identity through the rewrite).
 *
 * Safety shape (the write-then-swap contract): the rewrite lands at a
 * NEW path under a staging catalog name; only after it fully succeeds
 * is the old registration dropped and the staging entry renamed over
 * it. A failure at any earlier point leaves the original table —
 * catalog entry AND bytes — untouched. The previous location is
 * returned for the caller to vacuum once no readers need it (the
 * operator cannot know when open snapshots drain; deleting data is the
 * table owner's decision).
 *
 * Scale notes: the rewrite is one `repartition(numBuckets, keys)`
 * shuffle of the table — the same price as the original bucketed
 * write, paid per maintenance run, not per query. Run it when the
 * files-per-bucket ratio (`stats.filesBefore / numBuckets`) crosses a
 * threshold, not on a timer. Buckets are fixed-count, so a bucket that
 * has outgrown one task's comfort is a re-BUCKETING (new count, new
 * table), not a compaction.
 *
 * Reference: vasnake SpatialJoinTransformer has no storage layer —
 * this extends the training-data-pipeline surface; no reference
 * behavior is cited.
 */
object Compact {

  /** What a compaction did: data file counts either side of the
    * rewrite, and the superseded location awaiting vacuum. */
  final case class CompactStats(
      filesBefore: Int, filesAfter: Int, previousLocation: String)

  /** What a vacuum removed: file count (all files, markers included)
    * and total bytes under the deleted location. */
  final case class VacuumStats(filesRemoved: Int, bytesRemoved: Long)

  private def classic(spark: SparkSession) =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /**
   * Scheme-aware location → Hadoop Path: an explicit scheme
   * (`hdfs://`, `s3a://`, `file:`) is honored verbatim; ONLY
   * scheme-less strings are resolved as local-filesystem paths
   * (absolutized, so relative test paths work). The single resolution
   * rule for every user-supplied path this library touches — a blanket
   * `new java.io.File(path).toURI` would silently coerce an `s3a://`
   * export target to a bogus local path (round-9 ADVICE).
   */
  def resolveLocation(location: String): org.apache.hadoop.fs.Path = {
    val uri =
      try java.net.URI.create(location)
      catch { case _: IllegalArgumentException => null }
    if (uri == null || uri.getScheme == null)
      new org.apache.hadoop.fs.Path(new java.io.File(location).toURI)
    else new org.apache.hadoop.fs.Path(uri)
  }

  /** Fully qualify a location URI through its filesystem when one is
    * loadable; otherwise fall back to the raw normalized URI string —
    * still scheme+authority aware, so file:/x never aliases
    * hdfs://nn/x. The fallback matters for the vacuum guard: one
    * catalog table on a scheme with no FS implementation on the
    * classpath (e.g. s3a without the connector jar) must not make
    * every vacuum of unrelated local targets throw (round-10 ADVICE).
    */
  private def qualifiedOrRaw(u: java.net.URI,
      conf: org.apache.hadoop.conf.Configuration): String = {
    // compare by COMPONENTS, not by URI.toString: the same local
    // location renders as file:/x from File.toURI but file:///x from
    // catalog metadata — a string compare would call them different
    // and wave an in-place rewrite through
    def render(v: java.net.URI): String =
      s"${Option(v.getScheme).getOrElse("")}://" +
        s"${Option(v.getAuthority).getOrElse("")}" +
        Option(v.getPath).getOrElse("").stripSuffix("/")
    scala.util.Try {
      val qp = new org.apache.hadoop.fs.Path(u)
      render(qp.getFileSystem(conf).makeQualified(qp).toUri)
    }.getOrElse(render(u.normalize()))
  }

  /** A catalog table's storage location. */
  def tableLocation(spark: SparkSession, table: String): java.net.URI = {
    val ss = classic(spark).sessionState
    ss.catalog.getTableMetadata(ss.sqlParser.parseTableIdentifier(table))
      .location
  }

  /** Count the DATA files under a location (metadata/_SUCCESS markers
    * and hidden files excluded) — the fragmentation measure. */
  def dataFileCount(spark: SparkSession, location: java.net.URI): Int = {
    val path = new org.apache.hadoop.fs.Path(location)
    val fs = path.getFileSystem(classic(spark).sessionState.newHadoopConf())
    if (!fs.exists(path)) 0
    else {
      val it = fs.listFiles(path, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        val name = f.getPath.getName
        if (f.isFile && !name.startsWith("_") && !name.startsWith(".")) n += 1
      }
      n
    }
  }

  /**
   * Bin-pack a bucketed catalog table back to one file per bucket at
   * `newPath`, preserving its own (numBuckets, keys, sort) spec; the
   * catalog entry swaps to the new location only after the write
   * succeeds. Fails loudly on a non-bucketed table — compacting one of
   * those is [[compactFiles]]' job and the caller should say so.
   */
  def compactBucketed(spark: SparkSession, table: String,
      newPath: String): CompactStats = {
    val (numBuckets, keys) = Bucketed.bucketSpecOf(spark, table).getOrElse(
      throw new IllegalArgumentException(
        s"table `$table` is not bucketed — use compactFiles for plain layouts"))
    val oldLocation = tableLocation(spark, table)
    // compare FULLY QUALIFIED URIs (scheme + authority + path), as
    // vacuum's live-table guard does: a bare-path compare spuriously
    // rejected s3a://bucket/warehouse/t when the table lives at
    // hdfs://nn/warehouse/t (round-10 ADVICE — error-side only, but a
    // legitimate cross-filesystem compaction target must be accepted)
    val conf = classic(spark).sessionState.newHadoopConf()
    require(qualifiedOrRaw(resolveLocation(newPath).toUri, conf)
        != qualifiedOrRaw(oldLocation, conf),
      s"newPath must differ from the current location ($oldLocation) — " +
        "an in-place overwrite would destroy the table on a failed rewrite")
    val before = dataFileCount(spark, oldLocation)
    // one deterministic pass: read through the catalog (old location),
    // rewrite bucketed to the new one, swap the registration on success.
    // The read runs with bucketed scans DISABLED: a fragmented bucketed
    // scan advertises HashPartitioning(keys, n), which makes the
    // optimizer drop the writer's one-file-per-bucket repartition as
    // redundant — and then the auto-bucketed-scan rule, seeing no
    // distribution requirement left, falls back to file-split reads
    // that satisfy nothing. Forcing the plain scan keeps the shuffle,
    // which is the whole point of the rewrite. (Session-wide conf,
    // restored immediately; compaction is a maintenance action, not a
    // concurrent-query path.)
    val bucketingConf = "spark.sql.sources.bucketing.enabled"
    val prev = spark.conf.getOption(bucketingConf)
    spark.conf.set(bucketingConf, "false")
    try Bucketed.writeBucketed(spark.table(table), table, newPath, keys, numBuckets)
    finally prev match {
      case Some(v) => spark.conf.set(bucketingConf, v)
      case None => spark.conf.unset(bucketingConf)
    }
    val after = dataFileCount(spark, tableLocation(spark, table))
    CompactStats(before, after, oldLocation.toString)
  }

  /**
   * Storage locations of tables registered in NON-session v2 catalogs
   * — the live-table guard's reach beyond `spark_catalog` (round-9
   * ADVICE: a live table in another catalog must also block a vacuum).
   * Best effort by design: only catalogs exposing the TableCatalog +
   * SupportsNamespaces connector API are walked, and only tables that
   * publish the standard `location` property contribute; the session
   * catalog (walked precisely, fail-loudly, in [[vacuum]]) is skipped.
   */
  private def v2TableLocations(
      spark: SparkSession): Seq[(String, java.net.URI)] = {
    import org.apache.spark.sql.connector.catalog.{SupportsNamespaces, TableCatalog}
    val cm = classic(spark).sessionState.catalogManager
    val names = scala.util.Try(
      spark.catalog.listCatalogs().collect().map(_.name).toSeq)
      .getOrElse(Seq.empty).filterNot(_ == "spark_catalog")
    names.flatMap { cn =>
      scala.util.Try(cm.catalog(cn)).toOption.toSeq.flatMap {
        case tc: TableCatalog with SupportsNamespaces =>
          def walk(ns: Array[String]): Seq[Array[String]] =
            ns +: scala.util.Try(tc.listNamespaces(ns).toSeq)
              .getOrElse(Seq.empty).flatMap(walk)
          val nss = scala.util.Try(tc.listNamespaces().toSeq)
            .getOrElse(Seq.empty).flatMap(walk)
          nss.flatMap { ns =>
            scala.util.Try(tc.listTables(ns).toSeq)
              .getOrElse(Seq.empty).flatMap { id =>
                scala.util.Try(tc.loadTable(id)).toOption.flatMap { t =>
                  Option(t.properties().get(TableCatalog.PROP_LOCATION))
                    .flatMap(loc => scala.util.Try(
                      java.net.URI.create(loc)).toOption)
                    .map(u => (s"$cn.$id", u))
                }
              }
          }
        case _ => Seq.empty
      }
    }
  }

  /**
   * Delete the bytes at a SUPERSEDED location — the second half of the
   * write-then-swap contract: [[compactBucketed]] rewrites to a new
   * path and returns the old one in `CompactStats.previousLocation`;
   * once no reader needs the old snapshot, the table owner calls
   * vacuum on it. Deleting data is deliberately a SEPARATE, explicit
   * call (the operator cannot know when open snapshots drain), and it
   * fails loudly rather than ever racing a live table:
   *
   *  - the location must exist (a double-vacuum or a typo'd path is an
   *    error, not a silent no-op — the caller's bookkeeping is wrong);
   *  - no CATALOG TABLE may currently live at, under, or above the
   *    location. This is the guard that makes the API safe to script:
   *    pass the CURRENT location of a table (instead of the returned
   *    previous one) and the call refuses instead of destroying it.
   *
   * Scale notes: the walk and delete are driver-side filesystem
   * metadata operations, proportional to FILE COUNT (bounded by the
   * pre-compaction fragmentation), never data-sized; no Spark job
   * runs. On a MILLION-file location that driver-side listing is the
   * cost — budget minutes, not seconds, and expect namenode/object-
   * store listing pressure. `maxFiles` bounds it loudly: the walk
   * aborts (nothing deleted) as soon as the count crosses the bound,
   * so a typo'd location pointing at a huge live dataset fails fast
   * instead of grinding through its listing; raise it explicitly for
   * genuinely huge superseded snapshots. Returns what was removed for
   * the caller's audit log.
   */
  def vacuum(spark: SparkSession, location: String,
      maxFiles: Int = 1000000): VacuumStats = {
    val p = resolveLocation(location)
    val conf = classic(spark).sessionState.newHadoopConf()
    val fs = p.getFileSystem(conf)
    require(fs.exists(p),
      s"nothing to vacuum at $location — already removed, or not a " +
        "location this session's compactions produced")
    // guard key = the FULLY QUALIFIED URI (scheme + authority + path),
    // so file:/x never aliases hdfs://nn/x or s3a://bucket/x — a
    // path-only compare would let a remote live table slip past the
    // guard (round-9 ADVICE)
    def qualify(u: java.net.URI): String = qualifiedOrRaw(u, conf)
    val target = qualify(fs.makeQualified(p).toUri)
    val ss = classic(spark).sessionState
    // session catalog: every table's location must be READABLE — a
    // table whose metadata fails to load cannot be proven disjoint
    // from the target, so the vacuum refuses rather than silently
    // skipping it (fail-loudly; views without storage are exempt)
    val liveAt = ss.catalog.listDatabases().flatMap { db =>
      ss.catalog.listTables(db).flatMap { ti =>
        scala.util.Try(ss.catalog.getTableMetadata(ti)) match {
          case scala.util.Success(m) =>
            if (m.tableType == org.apache.spark.sql.catalyst.catalog
                  .CatalogTableType.VIEW || m.storage.locationUri.isEmpty)
              None
            else Some((ti.unquotedString, qualify(m.location)))
          case scala.util.Failure(_) if ss.catalog.isTempView(ti) => None
          case scala.util.Failure(e) =>
            throw new IllegalStateException(
              s"refusing to vacuum $location: metadata for catalog " +
                s"table ${ti.unquotedString} is unreadable, so it " +
                "cannot be proven disjoint from the target", e)
        }
      }
    } ++ v2TableLocations(spark).map { case (n, u) => (n, qualify(u)) }
    val overlapping = liveAt.filter { case (_, loc) =>
      loc == target || loc.startsWith(target + "/") ||
        target.startsWith(loc + "/")
    }
    require(overlapping.isEmpty,
      s"refusing to vacuum $location: catalog table(s) " +
        s"${overlapping.map(_._1).mkString(", ")} currently live there — " +
        "vacuum only the previousLocation a compaction returned")
    val it = fs.listFiles(p, true)
    var files = 0; var bytes = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.isFile) { files += 1; bytes += f.getLen }
      require(files <= maxFiles,
        s"refusing to vacuum $location: more than $maxFiles files under " +
          "the target (nothing was deleted) — this does not look like a " +
          "superseded compaction snapshot; pass an explicit larger " +
          "maxFiles if it genuinely is one")
    }
    require(fs.delete(p, true), s"filesystem refused to delete $location")
    VacuumStats(files, bytes)
  }

  /**
   * Bin-pack a PLAIN (non-bucketed) sorted parquet directory — e.g. a
   * [[ZOrder]] layout — into `targetFiles` files while preserving
   * range clustering: rows are range-repartitioned and re-sorted on
   * `sortCols`, so file k holds a contiguous slice of the sort order
   * (what makes min/max footer pruning work) exactly like the
   * original write. Output to `outPath` (fresh directory; same
   * no-in-place rule as [[compactBucketed]]).
   */
  def compactFiles(spark: SparkSession, path: String, outPath: String,
      sortCols: Seq[String], targetFiles: Int): CompactStats = {
    require(sortCols.nonEmpty, "at least one sort column required")
    require(targetFiles > 0, s"targetFiles must be positive, got $targetFiles")
    require(path != outPath, "outPath must differ from path (no in-place rewrite)")
    val before = dataFileCount(spark, resolveLocation(path).toUri)
    spark.read.parquet(path)
      .repartitionByRange(targetFiles, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outPath)
    val after = dataFileCount(spark, resolveLocation(outPath).toUri)
    CompactStats(before, after, resolveLocation(path).toUri.toString)
  }
}

package graft.transformer

import graft.join.{CompiledCondition, GridNearestJoin, GridSpatialJoin, PairCondition}
import graft.spatial.{GeomSpec, SpatialPredicate}
import graft.toolbox.StringToolbox._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{Param, ParamMap, Params}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.classic.SparkSession
import org.apache.spark.sql.types.{DataTypes, StructField, StructType}

import scala.util.Try

/**
 * spark.ml Transformer joining the input DataFrame with a catalog-registered
 * "external" table by a spatial relation, appending selected external
 * columns (and optionally a geodesic distance column, Int metres).
 *
 * Drop-in parameter surface of the reference transformer
 * (reference: src/main/scala/me/valik/spark/transformer/
 * BroadcastSpatialJoin.scala:83-151 — 12 string params, same names and
 * defaults). Differences, all Spark-first redesigns rather than behavior
 * changes visible to the reference's tests:
 *  - the external table is loaded with `spark.table(name)` instead of
 *    interpolated SQL (closes the injection surface of reference :178-180);
 *  - `transformSchema` is derived statically from params + catalog lookup —
 *    no empty-DataFrame execution (replaces the hack at reference :278-301);
 *  - the extra `condition` accepts ANY Spark SQL boolean expression over
 *    `left.`/`right.` columns (generalizes the two hardcoded strings of
 *    reference :493-533); `left` = iterated side, `right` = broadcast side;
 *  - appended columns follow the user's dataColumns order (the reference
 *    emits external-schema order; its tests are insensitive to order).
 *
 * Join semantics (pinned by the reference's 16 golden tests, ported in
 * graft.transformer.BroadcastSpatialJoinSpec): inner join; `broadcast`
 * picks which side is collected+indexed ("input" default, or "external"/
 * anything-else meaning the external dataset); the other side is iterated;
 * predicate evaluates `iterated op broadcast`; `nearest` yields exactly one
 * row per iterated row.
 */
class BroadcastSpatialJoin(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("spatial_join"))

  import BroadcastSpatialJoin._

  // --- the 12-param surface ---------------------------------------------

  /** Extra join condition over `left.`/`right.` columns, any Spark SQL
    * boolean expression; e.g. `right.fulldate_ts between left.start_ts and left.end_ts`. */
  final val condition = new Param[String](this, "condition", "extra predicate to push into SpatialJoin")
  setDefault(condition, "")
  def setJoinCondition(value: String): this.type = set(condition, value)

  /** Spark SQL filter applied to the external dataset before the join. */
  final val filter = new Param[String](this, "filter", "dataset filter")
  setDefault(filter, "")
  def setDatasetFilter(value: String): this.type = set(filter, value)

  /** Which side is broadcast: "input" (default), "external", "none"/"grid"
    * for the partitioned grid kernel, or "auto" to pick external-broadcast
    * vs grid from the external plan's size estimate against
    * `spark.sql.autoBroadcastJoinThreshold` (both auto candidates share
    * the broadcast=external orientation, so the choice is purely
    * physical — results are identical either way). */
  final val broadcast = new Param[String](this, "broadcast", "which DF will be broadcasted: 'input' or 'external'; or 'none' (partitioned grid), 'auto' (cost-based external-vs-grid)")
  setDefault(broadcast, input)
  def setBroadcast(value: String): this.type = set(broadcast, value)

  /** Spatial op: withindist N, within, contains, intersects, overlaps, nearest. */
  final val predicate = new Param[String](this, "predicate", "spatial op, one of: withindist, within, contains, intersects, overlaps, nearest")
  setDefault(predicate, nearest)
  def setPredicate(value: String): this.type = set(predicate, value)

  /** External dataset: a table/view name registered in the SQL catalog. */
  final val dataset = new Param[String](this, "dataset", "external dataset name, should be registered in sql metastore")
  setDefault(dataset, "")
  def setDataset(value: String): this.type = set(dataset, value)

  /** External columns appended to the input, CSV with optional aliases:
    * `id as poi_id, name`. */
  final val dataColumns = new Param[String](this, "dataColumns", "external ds column names to join to input, in csv format")
  setDefault(dataColumns, "")
  def setDataColumns(value: String): this.type = set(dataColumns, value)

  /** Non-empty ⇒ append centroid geodesic distance (Int metres) as last column. */
  final val distanceColumnAlias = new Param[String](this, "distanceColumnAlias", "alias for added `distance` column")
  setDefault(distanceColumnAlias, "")
  def setDistColAlias(value: String): this.type = set(distanceColumnAlias, value)

  final val datasetWKT = new Param[String](this, "datasetWKT", "external ds geometry column name")
  setDefault(datasetWKT, "")
  def setDatasetWKT(value: String): this.type = set(datasetWKT, value)

  final val datasetPoint = new Param[String](this, "datasetPoint", "external dataset point columns, e.g. `lon, lat`")
  setDefault(datasetPoint, "")
  def setDatasetPoint(colnames: String): this.type = set(datasetPoint, colnames)

  final val inputWKT = new Param[String](this, "inputWKT", "input ds geometry column name")
  setDefault(inputWKT, "")
  def setInputWKT(value: String): this.type = set(inputWKT, value)

  final val inputPoint = new Param[String](this, "inputPoint", "input point columns, e.g. `lon, lat`")
  setDefault(inputPoint, "")
  def setInputPoint(colnames: String): this.type = set(inputPoint, colnames)

  final val numPartitions = new Param[String](this, "numPartitions", "external dataset repartition parameter, no repartition if empty")
  setDefault(numPartitions, "")
  def setNumPartitions(value: String): this.type = set(numPartitions, value)

  // --- grid-mode (broadcast="none") tuning — extensions beyond the
  // --- reference's 12-param surface; empty = derive/default ------------

  /** Grid cell size in degrees for the partitioned (broadcast="none")
    * strategies. Empty (default) derives it from the external side's
    * extent and row count (one cheap agg — see GridNearestJoin.autoCellDeg),
    * targeting a few rows per cell; for withindist the radius-derived
    * lower bound still applies so the left fan-out stays bounded. Set it
    * explicitly to skip the derivation job when the density is known. */
  final val gridCellDeg = new Param[String](this, "gridCellDeg", "grid cell size in degrees for broadcast='none'; empty = density-derived")
  setDefault(gridCellDeg, "")
  def setGridCellDeg(value: String): this.type = set(gridCellDeg, value)

  /** Expanding-ring nearest: once this few left rows remain unresolved,
    * one exhaustive pass beats further ring rounds. Empty = 2000. */
  final val gridFallbackBelow = new Param[String](this, "gridFallbackBelow", "grid nearest: unresolved-row count below which the exhaustive fallback runs; empty = default")
  setDefault(gridFallbackBelow, "")
  def setGridFallbackBelow(value: String): this.type = set(gridFallbackBelow, value)

  /** Expanding-ring nearest: Chebyshev cell radius of the first search
    * block (later rounds double it). Empty = 2. */
  final val gridInitialHorizon = new Param[String](this, "gridInitialHorizon", "grid nearest: first-round search horizon in cells; empty = default")
  setDefault(gridInitialHorizon, "")
  def setGridInitialHorizon(value: String): this.type = set(gridInitialHorizon, value)

  /** Join type: "inner" (reference semantics, default), "left" (keep
    * every INPUT row, nulling the appended external columns and the
    * distance when nothing matches), "semi" (input rows WITH a match —
    * input schema only, no appended columns) or "anti" (input rows
    * WITHOUT a match — the "not covered by any site" query). All
    * non-inner types describe the INPUT side, so they require an
    * orientation where the input is the iterated/probe side:
    * broadcast = external/none/grid/auto (the default broadcast="input"
    * iterates the EXTERNAL side and is rejected). semi/anti are
    * existence tests: no dataColumns/distance appended (dataColumns may
    * be empty), and predicate=nearest is rejected (nearest decorates
    * rows 1:1 — use withindist for an existence-by-proximity test).
    * Extensions beyond the reference's inner-only surface. */
  final val joinType = new Param[String](this, "joinType", "join type: 'inner' (default), 'left' (keep unmatched input rows, external columns null), 'semi' or 'anti' (existence filters, input schema only)")
  setDefault(joinType, "inner")
  def setJoinType(value: String): this.type = set(joinType, value)

  /** k-nearest (k > 1) for the grid `nearest` strategy: up to k ranked
    * rows per input row instead of one, a trailing `knn_rank` long
    * column (1 = nearest) appended after the data/distance columns.
    * Requires `predicate = nearest` and `broadcast = none|grid` (the
    * broadcast kernel is k = 1 only). Empty or "1" = plain nearest. */
  final val gridKnn = new Param[String](this, "gridKnn", "grid nearest: k for k-nearest (ranked rows + knn_rank column); empty/1 = plain nearest")
  setDefault(gridKnn, "")
  def setGridKnn(value: String): this.type = set(gridKnn, value)

  // --- config ------------------------------------------------------------

  private val csvSep = Separators(",")
  private val asSep = Separators("as")

  private def checkParams(existenceMode: Boolean): Unit = {
    def checkGeomCols(wkt: String, point: String, name: String): Unit = {
      require(Seq(point.nonEmpty, wkt.nonEmpty).count(identity) == 1,
        s"You must specify one and only one property of (${name}WKT, ${name}Point)")
      require(point.isEmpty || point.splitTrim(csvSep).length == 2,
        s"${name}Point property should be empty or contain string like 'lon, lat'")
    }
    checkGeomCols(trimmed(datasetWKT), trimmed(datasetPoint), "dataset")
    checkGeomCols(trimmed(inputWKT), trimmed(inputPoint), "input")
    require(trimmed(dataset).nonEmpty, "dataset property must contain table or view name")
    // semi/anti emit the input schema only — dataColumns may stay empty
    require(existenceMode || trimmed(dataColumns).splitTrim(csvSep).nonEmpty,
      "dataColumns property must contain at least one column name")
  }

  private def trimmed(p: Param[String]): String = getOrDefault(p).trim

  /** True when `df`'s optimized-plan size estimate fits under
    * `spark.sql.autoBroadcastJoinThreshold` (same config, same units as
    * Spark's own broadcast-join planning; "-1" disables broadcasting). */
  private def fitsAutoBroadcast(spark: SparkSession, df: DataFrame): Boolean = {
    val raw = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10MB").trim
    val threshold = Try(raw.toLong).getOrElse(
      org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw))
    threshold > 0 && df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(threshold)
  }

  private def geomSpecOf(wkt: String, point: String): GeomSpec = {
    if (wkt.nonEmpty) GeomSpec.WktCol(wkt)
    else {
      val Array(lon, lat) = point.splitTrim(csvSep)
      GeomSpec.PointCols(lon, lat)
    }
  }

  /** Everything `transform` needs, parsed once per call on the driver. */
  private case class JoinConfig(
      externalDF: DataFrame,       // filtered + pruned + repartitioned, lazy plan
      externalSpec: GeomSpec,
      inputSpec: GeomSpec,
      dataCols: Seq[String],       // external column names to append
      aliases: Seq[String],        // their output names
      distanceAlias: String,
      spatialPredicate: SpatialPredicate,
      conditionSql: String,
      broadcastInput: Boolean,
      gridMode: Boolean,
      knn: Int,
      joinMode: graft.spatial.SpatialJoinMode)

  private def makeConfig(spark: SparkSession): JoinConfig = {
    val joinMode =
      try graft.spatial.SpatialJoinMode.parse(trimmed(joinType))
      catch {
        case e: IllegalArgumentException => throw new IllegalArgumentException(
          s"Spatial join transformer error: ${e.getMessage}", e)
      }
    import graft.spatial.SpatialJoinMode._
    val existenceMode = joinMode == Semi || joinMode == Anti
    checkParams(existenceMode)

    // "id as poi_id, name" → (Seq(id, name), Seq(poi_id, name))
    val pairs =
      for (Array(name, alias @ _*) <- trimmed(dataColumns).splitTrim(csvSep).map(_.splitTrim(asSep)))
        yield (name, alias.headOption.getOrElse(name))
    val (dataCols, aliases) = (pairs.toSeq.map(_._1), pairs.toSeq.map(_._2))

    val mode = trimmed(broadcast).toLowerCase
    val autoMode = mode == "auto"
    val fixedGridMode = Seq("none", "grid").contains(mode)
    val broadcastInput = !fixedGridMode && !autoMode && trimmed(broadcast) == input
    val conditionSql = trimmed(condition)
    val (condLeftCols, condRightCols) = PairCondition.referencedColumns(conditionSql)
    // external side plays `left` (iterated) when the input is broadcast;
    // in grid and auto modes orientation matches broadcast=dataset
    // (external = right), so auto's physical choice never flips semantics
    val condExternalCols = if (broadcastInput) condLeftCols else condRightCols

    val externalSpec = geomSpecOf(trimmed(datasetWKT), trimmed(datasetPoint))
    val externalDF = {
      val cols = (dataCols ++ externalSpec.columnNames ++ condExternalCols).distinct
      val df = spark.table(trimmed(dataset))
      val missing = condExternalCols.filterNot(df.columns.contains)
      require(missing.isEmpty,
        s"Spatial join transformer error: unknown extra condition `$conditionSql` " +
          s"(columns ${missing.mkString(", ")} not found in external dataset)")
      val filtered = if (trimmed(filter).nonEmpty) df.filter(trimmed(filter)) else df
      val projected = filtered.select(cols.head, cols.tail: _*)
      Try(projected.repartition(trimmed(numPartitions).toInt)).getOrElse(projected)
    }

    // cost-based strategy: broadcast the external side when its optimized
    // plan's size estimate fits under the session's broadcast threshold
    // (parquet scans report file-size-derived stats, so the decision
    // tracks the actual data, with filters and pruning applied); a plan
    // too big for every executor's memory goes to the partitioned grid
    val gridMode = fixedGridMode ||
      (autoMode && !fitsAutoBroadcast(spark, externalDF))

    val spatialPred = SpatialPredicate.parse(trimmed(predicate))
    val knn = {
      val s = trimmed(gridKnn)
      if (s.isEmpty) 1
      else Try(s.toInt).getOrElse(throw new IllegalArgumentException(
        s"Spatial join transformer error: gridKnn must be numeric, got `$s`"))
    }
    require(knn >= 1, s"Spatial join transformer error: gridKnn must be >= 1, got $knn")
    if (knn > 1) {
      require(spatialPred == SpatialPredicate.Nearest,
        "Spatial join transformer error: gridKnn requires predicate = nearest")
      // gridMode (not fixedGridMode): broadcast="auto" is fine when the
      // cost-based choice lands on the grid kernel
      require(gridMode,
        "Spatial join transformer error: gridKnn requires the grid strategy " +
          "(broadcast = none|grid, or auto resolving to grid) — " +
          "the broadcast kernel is k = 1 only")
      // the rank column is appended under a fixed name; a colliding
      // distance alias or dataColumns alias would silently shadow it
      val taken = trimmed(distanceColumnAlias) +: aliases
      require(!taken.contains("knn_rank"),
        "Spatial join transformer error: gridKnn appends a `knn_rank` column — " +
          "that name cannot also be used as a distance or data-column alias")
    }

    if (joinMode != Inner) {
      require(!broadcastInput,
        s"Spatial join transformer error: joinType='${joinMode.name}' describes the INPUT " +
          "rows, which requires the input to be the iterated side — " +
          "use broadcast = 'external', 'none'/'grid', or 'auto' (not 'input')")
      require(knn == 1,
        s"Spatial join transformer error: joinType='${joinMode.name}' supports gridKnn = 1 only")
    }
    if (existenceMode) {
      require(trimmed(distanceColumnAlias).isEmpty,
        s"Spatial join transformer error: joinType='${joinMode.name}' emits the input " +
          "schema only — no distance column")
      require(spatialPred != SpatialPredicate.Nearest,
        s"Spatial join transformer error: joinType='${joinMode.name}' is an existence " +
          "test; predicate=nearest decorates rows 1:1 — use withindist instead")
    }

    JoinConfig(
      externalDF = externalDF,
      externalSpec = externalSpec,
      inputSpec = geomSpecOf(trimmed(inputWKT), trimmed(inputPoint)),
      dataCols = dataCols,
      aliases = aliases,
      distanceAlias = trimmed(distanceColumnAlias),
      spatialPredicate = spatialPred,
      conditionSql = conditionSql,
      broadcastInput = broadcastInput,
      gridMode = gridMode,
      knn = knn,
      joinMode = joinMode)
  }

  /** Output schema = input fields ++ aliased selected external fields ++
    * optional Int distance. Statically derivable — shared by transform and
    * transformSchema so the two can never diverge. */
  private def outputSchema(inputSchema: StructType, cfg: JoinConfig): StructType = {
    import graft.spatial.SpatialJoinMode.{Anti, Semi}
    // existence filters pass the input schema through untouched
    if (cfg.joinMode == Semi || cfg.joinMode == Anti) return inputSchema
    val extSchema = cfg.externalDF.schema
    val appended = cfg.dataCols.zip(cfg.aliases).map { case (n, a) =>
      val f = extSchema(extSchema.fieldIndex(n)).copy(name = a)
      // outer-join nullability widening: unmatched input rows null the
      // appended external columns
      if (cfg.joinMode == graft.spatial.SpatialJoinMode.LeftOuter) f.copy(nullable = true) else f
    }
    val fields = inputSchema.fields ++ appended
    val withDist =
      if (cfg.distanceAlias.nonEmpty)
        fields :+ StructField(cfg.distanceAlias, DataTypes.IntegerType)
      else fields
    if (cfg.knn > 1) StructType(withDist :+ StructField("knn_rank", DataTypes.LongType))
    else StructType(withDist)
  }

  // --- transformer -------------------------------------------------------

  override def copy(extra: ParamMap): BroadcastSpatialJoin = defaultCopy(extra)

  override def transformSchema(schema: StructType): StructType = {
    // prefer the thread's active session: builder().getOrCreate() could
    // return a different session (and catalog) than the dataset later
    // passed to transform in multi-session applications
    val spark = SparkSession.getActiveSession
      .getOrElse(SparkSession.builder().getOrCreate())
    outputSchema(schema, makeConfig(spark))
  }

  override def transform(inputDS: Dataset[_]): DataFrame = {
    val spark = inputDS.sparkSession.asInstanceOf[SparkSession]
    val input = inputDS.toDF
    val cfg = makeConfig(spark)

    // debug taps — no-ops unless spark.graft.debug=true (companion show)
    show(input, "input")
    show(cfg.externalDF, "dataset")

    if (cfg.gridMode) return gridTransform(spark, input, cfg)

    val (iterDF, iterSpec, bcDF, bcSpec) =
      if (cfg.broadcastInput) (cfg.externalDF, cfg.externalSpec, input, cfg.inputSpec)
      else (input, cfg.inputSpec, cfg.externalDF, cfg.externalSpec)

    // Catalyst-native path: the custom BroadcastSpatialJoinPlan keeps the
    // whole transform in one plan — no RDD drop-out, no createDataFrame
    // barrier (fixes the reference's opaque-scan re-entry, SURVEY §4)
    val lwName = "__graft_wkb_l"
    val rwName = "__graft_wkb_r"
    val leftD = iterDF.withColumn(lwName, wkbColOf(iterSpec))
    val rightD = bcDF.withColumn(rwName, wkbColOf(bcSpec))
    val compiled: Option[CompiledCondition] =
      PairCondition.compile(spark, cfg.conditionSql, leftD.schema, rightD.schema)

    ensureStrategy(spark)
    val lp = leftD.queryExecution.analyzed
    val rp0 = rightD.queryExecution.analyzed
    // self-join safety: when both sides stem from the same plan their
    // attributes share exprIds and downstream by-attribute resolution
    // would collapse onto one side — re-alias the right side with fresh
    // exprIds (ordinal-bound condition is unaffected: positions match)
    val rp: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
      if (lp.outputSet.intersect(rp0.outputSet).isEmpty) rp0
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rp0.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rp0)
    val lAttr = lp.output.find(_.name == lwName).get
    val rAttr = rp.output.find(_.name == rwName).get
    val needDistance = cfg.distanceAlias.nonEmpty
    val distAttr =
      if (needDistance)
        Some(org.apache.spark.sql.catalyst.expressions.AttributeReference(
          cfg.distanceAlias, DataTypes.IntegerType, nullable = cfg.joinMode == graft.spatial.SpatialJoinMode.LeftOuter)())
      else None

    val plan = graft.plans.BroadcastSpatialJoinPlan(
      lp, rp, lAttr, rAttr, cfg.spatialPredicate, compiled.map(_.bound), distAttr,
      mode = cfg.joinMode)
    val joinedDF = org.apache.spark.sql.graft.DatasetBridge.ofRows(spark, plan)

    // final projection BY ATTRIBUTE (names may repeat across the sides):
    // input columns ++ alias-renamed selected external columns ++ distance
    val (inputOut, extOut) =
      if (cfg.broadcastInput) (rp.output.filterNot(_.exprId == rAttr.exprId), lp.output)
      else (lp.output.filterNot(_.exprId == lAttr.exprId), rp.output)
    def extAttr(name: String) = extOut.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"dataColumns column `$name` not found in external dataset"))
    import graft.spatial.SpatialJoinMode.{Anti, Semi}
    val existence = cfg.joinMode == Semi || cfg.joinMode == Anti
    // semi/anti plans emit the left (= input) output only — project just
    // the input columns (the wkb helper dropped)
    val outCols =
      if (existence) inputOut.map(a => org.apache.spark.sql.graft.ColumnBridge.column(a))
      else inputOut.map(a => org.apache.spark.sql.graft.ColumnBridge.column(a)) ++
        cfg.dataCols.zip(cfg.aliases).map { case (n, a) =>
          org.apache.spark.sql.graft.ColumnBridge.column(extAttr(n)).as(a) } ++
        distAttr.map(a => org.apache.spark.sql.graft.ColumnBridge.column(a))
    val result = joinedDF.select(outCols.toIndexedSeq: _*)
    show(result, "join result")
    result
  }

  /** GeomSpec → WKB column (same coercions as the reference's per-row
    * matrix: lon/lat cast to double, WKT parsed null-safe). */
  private def wkbColOf(spec: GeomSpec): org.apache.spark.sql.Column = {
    import graft.functions.GeoExpressions
    spec match {
      case GeomSpec.WktCol(w) => GeoExpressions.wkbFromWkt(F.col(w))
      case GeomSpec.PointCols(lon, lat) =>
        GeoExpressions.wkbPoint(F.col(lon).cast("double"), F.col(lat).cast("double"))
    }
  }

  /** Register the spatial join planner strategy on this session (idempotent). */
  private def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(graft.plans.SpatialJoinStrategy))
      spark.experimental.extraStrategies = cur :+ graft.plans.SpatialJoinStrategy
  }

  /** Partitioned grid join (broadcast="none"): neither side collected,
    * one Catalyst plan end-to-end — see graft.join.GridSpatialJoin.
    * Orientation matches broadcast=dataset: predicate is `input op
    * external`, condition `left` = input, `right` = external. `nearest`
    * runs the expanding-ring GridNearestJoin (any input geometry — WKT or
    * points — and any extra condition; ties break by the external side's
    * column values rather than the kernel's broadcast row index). */
  private def gridTransform(spark: SparkSession, input: DataFrame, cfg: JoinConfig): DataFrame = {
    import graft.functions.GeoExpressions

    def wkbOf(spec: GeomSpec, rename: String => String): org.apache.spark.sql.Column = spec match {
      case GeomSpec.WktCol(w) => GeoExpressions.wkbFromWkt(F.col(rename(w)))
      case GeomSpec.PointCols(lon, lat) =>
        GeoExpressions.wkbPoint(F.col(rename(lon)).cast("double"), F.col(rename(lat)).cast("double"))
    }

    val pref = "__r_"
    val ext = cfg.externalDF.columns.foldLeft(cfg.externalDF)((d, c) =>
      d.withColumnRenamed(c, pref + c))

    val extraCond: Option[org.apache.spark.sql.Column] = {
      val trimmedCond = cfg.conditionSql.trim
      if (trimmedCond.isEmpty) None
      else try Some(F.expr(PairCondition.rewriteSides(trimmedCond,
        l => s"`$l`", r => s"`$pref$r`")))
      catch {
        case e: Exception => throw new IllegalArgumentException(
          s"Spatial join transformer error: unknown extra condition `$trimmedCond`: ${e.getMessage}", e)
      }
    }

    val radius = cfg.spatialPredicate match {
      case SpatialPredicate.WithinDist(m) => m
      case _ => 0.0
    }
    // cell size: user-pinned, else density-derived from the external side
    // (one cheap agg) with the radius lower bound — a blind constant here
    // made ring rounds multiply on sparse data (VERDICT r02 #1)
    def numeric[T](p: Param[String], parse: String => T): Option[T] = {
      val s = trimmed(p)
      if (s.isEmpty) None
      else Some(Try(parse(s)).getOrElse(throw new IllegalArgumentException(
        s"Spatial join transformer error: ${p.name} must be numeric, got `$s`")))
    }
    val cellDeg = numeric(gridCellDeg, _.toDouble).getOrElse {
      val density = GridNearestJoin.autoCellDeg(ext, wkbOf(cfg.externalSpec, pref + _))
      math.max(density, 2.0 * radius / 110500.0)
    }

    val needDistance = cfg.distanceAlias.nonEmpty
    val joined = cfg.spatialPredicate match {
      case SpatialPredicate.Nearest =>
        // key-only deterministic tie-break: the min(struct) candidate
        // ordering continues through the full right-side payload after the
        // tie-break field, so determinism holds even when dataColumns is
        // not unique — and narrow keys keep every ring-shuffle row slim
        // (the full-struct tie-break duplicated the whole external row)
        val tb = F.struct(cfg.dataCols.distinct.map(n => F.col(pref + n)): _*)
        val fb = numeric(gridFallbackBelow, _.toLong).getOrElse(2000L)
        val ih = numeric(gridInitialHorizon, _.toInt).getOrElse(2)
        val base =
          if (cfg.knn == 1)
            GridNearestJoin.nearest(
              input, ext,
              wkbOf(cfg.inputSpec, identity), wkbOf(cfg.externalSpec, pref + _),
              cellDeg, tieBreak = Some(tb), condition = extraCond,
              fallbackBelow = fb, initialHorizon = ih,
              joinType = cfg.joinMode.name)
          else
            GridNearestJoin.knearest(
              input, ext,
              wkbOf(cfg.inputSpec, identity), wkbOf(cfg.externalSpec, pref + _),
              k = cfg.knn, rankCol = "knn_rank",
              cellDeg = cellDeg, tieBreak = Some(tb), condition = extraCond,
              fallbackBelow = fb, initialHorizon = ih)
        if (!needDistance) base
        else base.withColumn(cfg.distanceAlias, graft.functions.GeoExpressions.geodesicMeters(
          wkbOf(cfg.inputSpec, identity), wkbOf(cfg.externalSpec, pref + _)))
      case _ =>
        GridSpatialJoin.join(
          input, ext,
          wkbOf(cfg.inputSpec, identity), wkbOf(cfg.externalSpec, pref + _),
          cfg.spatialPredicate, cellDeg, extraCond,
          if (needDistance) Some(cfg.distanceAlias) else None,
          joinType = cfg.joinMode.name)
    }

    import graft.spatial.SpatialJoinMode.{Anti, Semi}
    val outCols: Seq[org.apache.spark.sql.Column] =
      if (cfg.joinMode == Semi || cfg.joinMode == Anti) input.columns.map(F.col).toSeq
      else input.columns.map(F.col).toSeq ++
        cfg.dataCols.zip(cfg.aliases).map { case (n, a) => F.col(pref + n).as(a) } ++
        (if (needDistance) Seq(F.col(cfg.distanceAlias)) else Nil) ++
        (if (cfg.knn > 1) Seq(F.col("knn_rank")) else Nil)
    joined.select(outCols: _*)
  }
}

object BroadcastSpatialJoin extends DefaultParamsReadable[BroadcastSpatialJoin] {

  override def load(path: String): BroadcastSpatialJoin = super.load(path)

  /** Default `broadcast` value: broadcast the transformer's input. */
  val input = "input"

  /** Default spatial predicate. */
  val nearest = "nearest"

  /** Debug tap (reference U6 parity: an `@elidable(FINE)` `df.show`,
    * reference BroadcastSpatialJoin.scala:343-347), double-gated: the
    * body no-ops unless the session conf `spark.graft.debug` is `true`
    * (the shipped default — a call site costs one conf lookup and never
    * touches the plan), and `@elidable(FINE)` additionally lets a user
    * building the library with `-Xelide-below` above FINE compile the
    * taps away entirely (this build does NOT set the flag — the conf
    * gate is the default-off mechanism, and it keeps the tap testable).
    * Unlike the reference, whose call sites interpolated
    * `rdd.getNumPartitions` into the message argument (forcing physical
    * planning whenever elision was off), all side effects live inside
    * the gate. */
  @scala.annotation.elidable(scala.annotation.elidable.FINE)
  def show(df: DataFrame, txt: String = "spatial-join-debug",
      n: Int = 7, truncate: Boolean = true): Unit =
    if (df.sparkSession.conf.get("spark.graft.debug", "false") == "true") {
      println(s"msg: `$txt` parts ${df.rdd.getNumPartitions}")
      df.show(n, truncate)
    }
}

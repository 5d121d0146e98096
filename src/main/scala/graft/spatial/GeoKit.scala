package graft.spatial

import org.locationtech.jts.geom.{Coordinate, Geometry, GeometryFactory, PrecisionModel}
import org.locationtech.jts.io.{WKBReader, WKBWriter, WKTReader, WKTWriter}

/**
 * JTS plumbing: per-thread factories/readers (JTS reader objects are not
 * thread-safe and not serializable), WKT/WKB codecs, and the lon/lat
 * coercion matrix the reference pins
 * (reference: src/main/scala/me/valik/spark/geometry/DatasetGeometry.scala:90-96).
 *
 * CRS is fixed to WGS84 / SRID 4326
 * (reference: DatasetGeometry.scala:35,54-59).
 */
object GeoKit {

  val SridWgs84 = 4326

  private val tlFactory = new ThreadLocal[GeometryFactory] {
    override def initialValue(): GeometryFactory =
      new GeometryFactory(new PrecisionModel(PrecisionModel.FLOATING), SridWgs84)
  }
  private val tlWktReader = new ThreadLocal[WKTReader] {
    override def initialValue(): WKTReader = new WKTReader(tlFactory.get())
  }
  private val tlWkbReader = new ThreadLocal[WKBReader] {
    override def initialValue(): WKBReader = new WKBReader(tlFactory.get())
  }
  private val tlWkbWriter = new ThreadLocal[WKBWriter] {
    override def initialValue(): WKBWriter = new WKBWriter()
  }
  private val tlWktWriter = new ThreadLocal[WKTWriter] {
    override def initialValue(): WKTWriter = new WKTWriter()
  }

  def factory: GeometryFactory = tlFactory.get()

  /** WKT → Geometry; null/empty input → null (nulls flow, join drops them —
    * reference: DatasetGeometry.scala:40-42). Empty geometries (e.g.
    * `POLYGON EMPTY`, null JTS envelope, no centroid) also map to null so
    * every join path drops them uniformly. Invalid WKT throws. */
  def wktToGeom(wkt: String): Geometry =
    if (wkt == null || wkt.isEmpty) null
    else {
      val g = tlWktReader.get().read(wkt)
      if (g == null || g.isEmpty) null else g
    }

  def geomToWkt(g: Geometry): String = if (g == null) null else tlWktWriter.get().write(g)

  def wkbToGeom(wkb: Array[Byte]): Geometry =
    if (wkb == null || wkb.isEmpty) null else tlWkbReader.get().read(wkb)

  // Per-thread direct-mapped parse cache for PAIRWISE hot paths
  // (distance / relate / ref-cell evaluate two parses per candidate
  // pair). In a broadcast nested-loop join the STREAMED row's WKB
  // re-arrives unchanged for every broadcast candidate AND the broadcast
  // side's geometries rotate through per streamed row — a 2-slot memo
  // (the previous design) pins the streamed side but re-parses the
  // rotating side on EVERY pair, which at 15M pairs is 15M parses and
  // 15M discarded JTS objects per pass; the resulting allocation storm
  // measurably degraded whole stages (in-task GC growing run over run).
  // A direct-mapped table keyed by WKB content (hash & mask → slot,
  // collision = overwrite) caches the rotating side too: parses drop to
  // O(distinct geometries) per thread and the garbage goes with them.
  // Content-keyed (UnsafeRow.getBinary returns a fresh copy each access,
  // so reference equality never fires); a hit costs one hashCode + one
  // short Arrays.equals. Entries over `CacheMaxEntryBytes` bypass the
  // cache (bounds per-thread memory: 4096 slots x ≤512 B WKB + parsed
  // geometry, a few MB worst-case); JTS geometries are immutable for all
  // ops used here, so cross-row reuse is safe.
  private val CacheSlots = 4096 // power of two
  private val CacheMaxEntryBytes = 512
  private val tlMemo = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](CacheSlots * 2)
  }

  def wkbToGeomMemo(wkb: Array[Byte]): Geometry = {
    if (wkb == null || wkb.isEmpty) return null
    if (wkb.length > CacheMaxEntryBytes) return tlWkbReader.get().read(wkb)
    val m = tlMemo.get()
    val i = (java.util.Arrays.hashCode(wkb) & (CacheSlots - 1)) << 1
    val k = m(i).asInstanceOf[Array[Byte]]
    if (k != null && java.util.Arrays.equals(k, wkb))
      return m(i + 1).asInstanceOf[Geometry]
    val g = tlWkbReader.get().read(wkb)
    m(i) = wkb; m(i + 1) = g
    g
  }

  def geomToWkb(g: Geometry): Array[Byte] =
    if (g == null) null else tlWkbWriter.get().write(g)

  /** Lon/lat value coercion: Double, Float, String, Int, else toString
    * (reference: DatasetGeometry.scala:90-96). */
  def anyToDouble(v: Any): Double = v match {
    case a: Double => a
    case a: Float  => a.toDouble
    case a: String => a.toDouble
    case a: Int    => a.toDouble
    case a         => a.toString.toDouble
  }

  def point(lon: Double, lat: Double): Geometry =
    factory.createPoint(new Coordinate(lon, lat))
}

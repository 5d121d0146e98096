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

  // 2-slot per-thread parse memo for PAIRWISE hot paths (distance /
  // relate / ref-cell evaluate two parses per candidate pair): in a
  // nested-loop or sorted join the outer row's WKB re-arrives unchanged
  // for every inner candidate, so one slot pins the outer geometry while
  // the other slot churns — the outer side's parse cost drops from
  // O(pairs) to O(rows). Content-keyed (UnsafeRow.getBinary returns a
  // fresh copy each access, so reference equality never fires); a miss
  // costs one short Arrays.equals. JTS geometries are immutable for all
  // ops used here, so cross-row reuse is safe.
  private val tlMemo = new ThreadLocal[Array[AnyRef]] {
    override def initialValue(): Array[AnyRef] = new Array[AnyRef](4)
  }

  def wkbToGeomMemo(wkb: Array[Byte]): Geometry = {
    if (wkb == null || wkb.isEmpty) return null
    val m = tlMemo.get()
    val a0 = m(0).asInstanceOf[Array[Byte]]
    if (a0 != null && java.util.Arrays.equals(a0, wkb))
      return m(1).asInstanceOf[Geometry]
    val a1 = m(2).asInstanceOf[Array[Byte]]
    if (a1 != null && java.util.Arrays.equals(a1, wkb)) {
      val g = m(3) // promote, so an alternating (outer, inner) pattern keeps the outer pinned
      m(2) = m(0); m(3) = m(1); m(0) = a1; m(1) = g
      return g.asInstanceOf[Geometry]
    }
    val g = tlWkbReader.get().read(wkb)
    m(2) = m(0); m(3) = m(1); m(0) = wkb; m(1) = g
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

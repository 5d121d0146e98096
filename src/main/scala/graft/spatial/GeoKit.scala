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

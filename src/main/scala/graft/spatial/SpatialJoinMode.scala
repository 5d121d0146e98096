package graft.spatial

/** Join semantics of the spatial join surface. The reference transformer
  * is inner-only; `left`/`semi`/`anti` are extensions (VERDICT r6
  * "what's missing #4"): `left` keeps unmatched input rows with null
  * externals, `semi` keeps exactly the input rows WITH a match (input
  * schema only), `anti` keeps exactly the rows WITHOUT one (the
  * "customers not covered by any site" query). */
sealed abstract class SpatialJoinMode(val name: String)

object SpatialJoinMode {
  case object Inner extends SpatialJoinMode("inner")
  case object LeftOuter extends SpatialJoinMode("left")
  case object Semi extends SpatialJoinMode("semi")
  case object Anti extends SpatialJoinMode("anti")

  def parse(s: String): SpatialJoinMode = s.trim.toLowerCase match {
    case "" | "inner" => Inner
    case "left" | "left_outer" | "leftouter" => LeftOuter
    case "semi" | "left_semi" | "leftsemi" => Semi
    case "anti" | "left_anti" | "leftanti" => Anti
    case other => throw new IllegalArgumentException(
      s"joinType must be one of inner, left, semi, anti — got `$other`")
  }
}

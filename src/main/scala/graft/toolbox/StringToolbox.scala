package graft.toolbox

import scala.util.Try

/**
 * Small string-parameter parsing DSL used by the transformer param surface.
 *
 * Semantics are pinned by the reference's unit tests
 * (reference: src/test/scala/me/valik/toolbox/StringToolboxTest.scala and
 * src/main/scala/me/valik/toolbox/StringToolbox.scala:31-83): regex
 * split-and-trim dropping empties, non-regex list split, "k: v, k: v" map
 * parsing, and positional number extraction.
 */
object StringToolbox {

  /** Separator chain: `v` splits the outer level, `next` the one below. */
  case class Separators(v: String, next: Option[Separators] = None)

  object DefaultSeparators {
    implicit val commaColon: Separators = Separators(",", Some(Separators(":")))

    import scala.language.implicitConversions
    implicit def stringToSeparators(sep: String): Separators = Separators(sep)
  }

  implicit class RichString(val src: String) extends AnyVal {

    /** Split by separator, pick item at `pos`, parse as Double. */
    def extractNumber(pos: Int)(implicit sep: Separators): Option[Double] =
      Try(src.splitTrim(sep)(pos).toDouble).toOption

    /** Regex split on `\s*<sep>\s*`, trimmed, empties dropped. */
    def splitTrim(implicit sep: Separators): Array[String] =
      src.trim.split("""\s*""" + sep.v + """\s*""").filter(_.nonEmpty)

    /** Literal (non-regex) split, trimmed, empties dropped. */
    def s2list(implicit sep: Separators): Seq[String] =
      src.split(sep.v).toSeq.map(_.trim).filter(_.nonEmpty)

    /** Parse "k: v, k2: v2" into a Map using the separator chain. */
    def parseMap(implicit sep: Separators): Map[String, String] = {
      val kvsep = sep.next.getOrElse(Separators(":"))
      val pairs = for {
        Array(k, v) <- src.splitTrim(sep).map(_.splitTrim(kvsep))
      } yield k -> v
      pairs.toMap
    }
  }
}

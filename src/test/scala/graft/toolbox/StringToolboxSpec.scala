package graft.toolbox

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Semantics pinned by the reference's StringToolboxTest
  * (reference: src/test/scala/me/valik/toolbox/StringToolboxTest.scala). */
class StringToolboxSpec extends AnyFlatSpec with Matchers {
  import StringToolbox._

  implicit val sep: Separators = Separators(";", Some(Separators("=")))

  it should "split string to array of non-empty trimmed strings" in {
    "foo; bar; baz; bara bas".splitTrim shouldBe Array("foo", "bar", "baz", "bara bas")
  }

  it should "split string to list of non-empty trimmed strings" in {
    "foo; bar; baz; bara bas".s2list shouldBe Seq("foo", "bar", "baz", "bara bas")
  }

  it should "parse string to Map" in {
    "foo = bar; baz = bara bas".parseMap shouldBe Map("foo" -> "bar", "baz" -> "bara bas")
  }
}

class StringToolboxCornerSpec extends AnyFlatSpec with Matchers {
  import StringToolbox._
  import StringToolbox.DefaultSeparators.commaColon

  it should "produce empty array from separators and whitespace" in {
    "".splitTrim shouldBe Array.empty[String]
    ",,,,,,, ,,,, , , , ".splitTrim shouldBe Array.empty[String]
    " , \t , \n \n \t ".splitTrim shouldBe Array.empty[String]
  }

  it should "produce single-item arrays with trimming" in {
    ".".splitTrim shouldBe Array(".")
    " \t \n . \n \t ".splitTrim shouldBe Array(".")
    " ,,, foo ,, ".splitTrim shouldBe Array("foo")
    " , foo".splitTrim shouldBe Array("foo")
  }

  it should "process complex text" in {
    val text =
      """
        | Mary,
        | had a little,
        | lamb,
        | ,.
      """.stripMargin
    text.splitTrim shouldBe Array("Mary", "had a little", "lamb", ".")
  }

  it should "extract positional numbers" in {
    val space: Separators = Separators(" ")
    "withindist 15700".extractNumber(1)(space) shouldBe Some(15700d)
    "withindist".extractNumber(1)(space) shouldBe None
    "withindist x".extractNumber(1)(space) shouldBe None
    "a 1.5 b".extractNumber(1)(space) shouldBe Some(1.5)
  }

  it should "parse maps with default separators" in {
    "a: 1, b: 2".parseMap shouldBe Map("a" -> "1", "b" -> "2")
    "".parseMap shouldBe Map.empty[String, String]
  }
}

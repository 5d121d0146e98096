package graft.tools

import org.scalatest.flatspec.AnyFlatSpec
import org.scalatest.matchers.should.Matchers

/** Pins the scale generator's pure perturbation kernels: the growth
  * evidence at sf1 (BASELINE.md) leans on these exact properties, so
  * they are spec'd, not just argued.
  */
class MakeSf1Spec extends AnyFlatSpec with Matchers {

  private def vec(seed: Int, d: Int): Seq[Float] =
    Seq.tabulate(d)(i => math.sin(seed * 997 + i * 13).toFloat)

  private def dot(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum

  "decorrelate" should "preserve within-copy inner products bit-exactly" in {
    val (a, b) = (vec(1, 64), vec(2, 64))
    for (k <- 1 to 9) {
      val (a2, b2) = (MakeSf1.decorrelate(a, k), MakeSf1.decorrelate(b, k))
      // same permutation + squared signs: Σ s²·aπ·bπ = a·b exactly —
      // each copy reproduces the source corpus's similarity structure
      dot(a2, b2) shouldBe dot(a, b) +- 1e-12
      dot(a2, a2) shouldBe dot(a, a) +- 1e-12 // norm preserved
    }
  }

  it should "decorrelate across copies (no identical-vector cliques)" in {
    val a = vec(1, 256)
    val cos0 = 1.0 // a vs itself
    for (k <- 1 to 9) {
      val ak = MakeSf1.decorrelate(a, k)
      val cos = dot(ak, a) / math.sqrt(dot(a, a) * dot(ak, ak))
      // a sign-scrambled permutation of a 256-dim vector against its
      // source: cosine collapses far below any similarity threshold
      math.abs(cos) should be < 0.3
      math.abs(cos) should be < cos0
      for (l <- 1 until k) {
        val al = MakeSf1.decorrelate(a, l)
        val c = dot(ak, al) / math.sqrt(dot(ak, ak) * dot(al, al))
        math.abs(c) should be < 0.3
      }
    }
  }

  it should "be deterministic and identity on copy 0 / null" in {
    val a = vec(7, 32)
    MakeSf1.decorrelate(a, 3) shouldBe MakeSf1.decorrelate(a, 3)
    MakeSf1.decorrelate(a, 0) shouldBe theSameInstanceAs(a)
    MakeSf1.decorrelate(null, 3) shouldBe null
  }

  "perturbText" should "be deterministic, identity on copy 0, and near-dup not exact" in {
    val text = (1 to 200).map(i => s"tok$i").mkString(" ")
    MakeSf1.perturbText(text, 42L, 1) shouldBe MakeSf1.perturbText(text, 42L, 1)
    MakeSf1.perturbText(text, 42L, 0) shouldBe text
    val p = MakeSf1.perturbText(text, 42L, 1)
    p should not be text
    // ~4% of tokens touched: still a near-duplicate (high token overlap)
    val src = text.split(" ").toSet
    val out = p.split(" ").toSet
    val jac = out.intersect(src).size.toDouble / out.union(src).size
    jac should be > 0.9
  }

  "suffixTokens" should "cap family width: disjoint across groups, identity on group 0" in {
    val text = (1 to 100).map(i => s"tok$i").mkString(" ")
    MakeSf1.suffixTokens(text, 0) shouldBe theSameInstanceAs(text)
    MakeSf1.suffixTokens(null, 3) shouldBe null
    val g1 = MakeSf1.suffixTokens(text, 1)
    val g2 = MakeSf1.suffixTokens(text, 2)
    // zero token overlap across groups (shingle sets likewise) — the
    // family-size cap for the ×100 jaccard/clusters oracle slice
    g1.split(" ").toSet.intersect(g2.split(" ").toSet) shouldBe empty
    g1.split(" ").toSet.intersect(text.split(" ").toSet) shouldBe empty
    // same-group copies keep near-dup structure: perturb-then-suffix
    // of two copies in one group still overlap heavily
    val a = MakeSf1.suffixTokens(MakeSf1.perturbText(text, 7L, 11), 1)
    val b = MakeSf1.suffixTokens(MakeSf1.perturbText(text, 7L, 12), 1)
    val (sa, sb) = (a.split(" ").toSet, b.split(" ").toSet)
    sa.intersect(sb).size.toDouble / sa.union(sb).size should be > 0.85
    // empty tokens survive untouched (split/join round-trip stability)
    MakeSf1.suffixTokens("a  b", 1) shouldBe "ag1  bg1"
  }
}

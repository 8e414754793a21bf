package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Property-style checks (seeded random sampling) for the pure-JVM kernels
  * the oracle can't reach directly — shingle boundaries, determinism,
  * packing arithmetic. These kernels sit under MinHash/LSH/decontaminate;
  * a silent off-by-one in a boundary would skew every downstream
  * similarity estimate.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val rng = new scala.util.Random(42)
  private def randWord(): String =
    Seq.fill(1 + rng.nextInt(6))(('a' + rng.nextInt(26)).toChar).mkString
  private def randDoc(maxWords: Int): String =
    Seq.fill(rng.nextInt(maxWords))(randWord()).mkString(" ")

  test("shinglesOf: count, width, and distinctness invariants (500 samples)") {
    (1 to 500).foreach { _ =>
      val text0 = randDoc(30)
      val text = if (text0.trim.isEmpty) "x" else text0
      val w = 1 + rng.nextInt(6)
      val toks = text.trim.split("\\s+").filter(_.nonEmpty)
      val sh = Dedup.shinglesOf(text, w)
      assert(sh.toSet.size == sh.length, s"duplicate shingles for w=$w in '$text'")
      assert(sh.forall { s => val n = s.split(" ").length; n >= 1 && n <= w })
      if (toks.length >= w) {
        assert(sh.length <= toks.length - w + 1)
        val windows = toks.sliding(w).map(_.mkString(" ")).toSet
        assert(sh.forall(windows.contains), s"non-window shingle for w=$w in '$text'")
      }
    }
  }

  test("shinglesOf is deterministic and whitespace-insensitive at the edges") {
    (1 to 200).foreach { _ =>
      val t0 = randDoc(20)
      val t = if (t0.trim.isEmpty) "x" else t0
      assert(Dedup.shinglesOf(t, 3).toSeq == Dedup.shinglesOf(t, 3).toSeq)
      assert(Dedup.shinglesOf("  " + t + "  ", 3).toSeq == Dedup.shinglesOf(t, 3).toSeq)
    }
  }

  test("sequence-packing arithmetic tiles without gaps") {
    (1 to 200).foreach { _ =>
      val lens = Seq.fill(rng.nextInt(50))(1L + rng.nextInt(600))
      val maxTok = 16 + rng.nextInt(500)
      var prior = 0L
      lens.foreach { n =>
        val off = prior % maxTok
        assert(off >= 0 && off < maxTok)
        assert(prior / maxTok >= 0)
        prior += n
      }
      assert(prior == lens.sum)
    }
  }
}

package graft

import graft.functions.WinnowOps

/** The winnowing fingerprint kernel: rolling-hash correctness against a
  * naive recompute, the paper's tie and guarantee properties, and edges. */
class WinnowSpec extends SparkSpec {

  /** Naive O(n·k) Horner hash of the gram at 0-based `i`. */
  private def naive(bytes: Array[Byte], i: Int): Long = {
    var acc = 0L
    var j = 0
    while (j < WinnowOps.K) {
      acc = (acc * WinnowOps.B + (bytes(i + j) & 0xffL)) % WinnowOps.M
      j += 1
    }
    acc
  }

  test("rolling hash equals the naive Horner hash at every position") {
    val rnd = new scala.util.Random(42)
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "aaaaaaaaaaaaaaaaaaaaaa",
      rnd.alphanumeric.take(500).mkString)
    texts.foreach { t =>
      val bytes = t.getBytes("UTF-8")
      val fps = WinnowOps.fingerprints(bytes).toMap // pos(1-based) -> fp
      fps.foreach { case (pos, fp) =>
        assert(fp == naive(bytes, pos - 1),
          s"rolling hash diverges from Horner at pos $pos of '${t.take(30)}'")
      }
    }
  }

  test("winnowing selects the per-window min with rightmost tie-break") {
    // 'aaaa...' makes every gram hash identical: each window's min ties
    // everywhere and the RIGHTMOST must win — so selections advance one
    // position per window, yielding one fingerprint per window position
    val t = "a" * 20 // 13 grams, 10 complete windows
    val fps = WinnowOps.fingerprints(t.getBytes("UTF-8"))
    assert(fps.forall(_._2 == fps.head._2), "identical grams hash equal")
    // rightmost-of-window: window ending at gram p selects p itself
    assert(fps.map(_._1).toSeq == (WinnowOps.W to 13).toSeq,
      s"rightmost tie-break violated: ${fps.map(_._1).toSeq}")
  }

  test("shared substring of length >= k+w-1 yields a common fingerprint") {
    val shared = "unmistakable-shared-run-of-text" // >= 11 chars
    val a = ("prefix one two three " + shared + " tail alpha").getBytes("UTF-8")
    val b = ("completely different head " + shared + " other ending").getBytes("UTF-8")
    val fa = WinnowOps.fingerprints(a).map(_._2).toSet
    val fb = WinnowOps.fingerprints(b).map(_._2).toSet
    assert((fa intersect fb).nonEmpty,
      "winnowing guarantee: shared run must contribute a common fingerprint")
  }

  test("short inputs yield no fingerprints; density is ~2/(w+1)") {
    assert(WinnowOps.fingerprints("short".getBytes).isEmpty)
    assert(WinnowOps.fingerprints("elevenchars".getBytes).length == 1)
    val long = new scala.util.Random(7).alphanumeric.take(4000).mkString
    val n = WinnowOps.fingerprints(long.getBytes("UTF-8")).length
    val grams = 4000 - WinnowOps.K + 1
    val expected = 2.0 * grams / (WinnowOps.W + 1)
    assert(n > expected * 0.5 && n < expected * 1.5,
      s"density off: $n fingerprints over $grams grams (expected ~$expected)")
  }
}

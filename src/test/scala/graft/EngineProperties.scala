package graft

import graft.functions.TextHash
import org.scalacheck.{Gen, Prop, Properties}

/** scalacheck properties for the pure arithmetic the engine's
  * cross-engine determinism rests on (SURVEY §5.3). */
object EngineProperties extends Properties("engine") {

  /** Pure-Scala mirror of TextHash.tokHash (the Spark expression and
    * DuckDB SQL are asserted against this in HashParitySpec). */
  def tokHashRef(tok: String): Long =
    tok.take(8).foldLeft(0L)((acc, c) => acc * 31 + c.toInt) + tok.length

  val token: Gen[String] =
    Gen.chooseNum(1, 14).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaLowerChar))

  property("tokHash is positive and bounded below 2^50") =
    Prop.forAll(token) { t =>
      val h = tokHashRef(t)
      h > 0 && h < (1L << 50)
    }

  /** For lowercase tokens of <= 8 chars the fold is injective (digit
    * range 97..122 spans < base 31, and the +length term separates
    * lengths), so distinct tokens must hash distinctly. */
  property("tokHash is injective on short lowercase tokens") =
    Prop.forAll(Gen.chooseNum(1, 8).flatMap(n =>
      Gen.stringOfN(n, Gen.alphaLowerChar)), token) { (a, b) =>
      a == b || b.length > 8 || tokHashRef(a) != tokHashRef(b)
    }

  property("minhash permutations stay in [0, P) for any base") =
    Prop.forAll(Gen.chooseNum(0L, TextHash.P - 1),
      Gen.chooseNum(0, TextHash.MinhashK - 1)) { (base, j) =>
      val (a, b) = TextHash.perms(j)
      val h = (a * base + b) % TextHash.P
      h >= 0 && h < TextHash.P
    }

  property("cents round-trip is exact for 2-decimal values") =
    Prop.forAll(Gen.chooseNum(0, 99999999), Gen.chooseNum(0, 99)) {
      (units, c) =>
        val x = units + c / 100.0
        math.round(x * 100) == units.toLong * 100 + c
    }

  /** Pure-Scala mirror of plans/Winnow.fingerprints over BMP chars
    * (the JVM expression is asserted against the HOF/driver-side fold
    * in DotProductSpec; this pins the ALGORITHM's properties on
    * arbitrary strings). */
  private def winnowRef(text: String): Seq[Long] = {
    val (k, w) = (graft.plans.Winnow.K, graft.plans.Winnow.W)
    val P = TextHash.P
    val codes = text.map(_.toLong)
    if (codes.length < k) return Seq.empty
    val gh = (0 to codes.length - k).map(i =>
      codes.slice(i, i + k).foldLeft(0L)((a, c) => (a * 31 + c) % P))
    (0 until math.max(gh.length - w + 1, 1))
      .map(j => gh.slice(j, j + w).min).distinct
  }

  private val docText: Gen[String] =
    Gen.chooseNum(20, 120).flatMap(n =>
      Gen.stringOfN(n, Gen.frequency(9 -> Gen.alphaLowerChar,
        1 -> Gen.const(' '))))

  /** The Schleimer et al. selection guarantee, property-tested: any
    * two strings sharing a >= K+W-1-char run share a fingerprint. */
  property("winnowing guarantee on arbitrary strings") =
    Prop.forAll(docText, docText, Gen.stringOfN(
      graft.plans.Winnow.K + graft.plans.Winnow.W - 1,
      Gen.alphaUpperChar)) { (a, b, shared) =>
      val fa = winnowRef(a + shared + b).toSet
      val fb = winnowRef(b.reverse + shared + a.reverse).toSet
      fa.intersect(fb).nonEmpty
    }

  /** The position-robustness the SURVEY row claims over stride
    * sampling: a single-char PREFIX insertion preserves the tail's
    * fingerprints — selection follows hash minima, so only the
    * boundary-region windows (~K+W chars of a 100+-char doc) can
    * change, where a fixed-stride sampler reshifts every window. */
  property("winnowing is position-robust under prefix insertion") =
    Prop.forAll(docText) { t =>
      val f1 = winnowRef(t).toSet
      val f2 = winnowRef("x" + t).toSet
      f1.isEmpty || f1.intersect(f2).size.toDouble / f1.size >= 0.7
    }

  /** measure_text_spaced (weather.py:226-231) fencepost invariant:
    * width(s) == sum(widths) + (len-1)*spacing for non-empty s. */
  property("text width fold fencepost") =
    Prop.forAll(Gen.alphaNumStr) { s =>
      def w(c: Char) = c.toInt % 7 + 3
      var width = 0
      for (c <- s) width += w(c) + 1
      val folded = if (width > 0) width - 1 else 0
      val direct =
        if (s.isEmpty) 0 else s.map(w).sum + (s.length - 1)
      folded == direct
    }

  /** sample_token_budget's admission rule (keep ⇔ running cum <
    * budget), mirrored purely — the mirror↔Spark pin is the
    * driver-side replay in CurationOpsSpec; these are the rule's own
    * algebraic guarantees on ANY fill order. */
  private def greedyFill(toks: List[Long], budget: Long): List[Boolean] = {
    var cum = 0L
    toks.map { n => val k = cum < budget; cum += n; k }
  }

  property("greedy token-budget fill is prefix-closed with bounded overshoot") =
    Prop.forAll(Gen.listOf(Gen.chooseNum(1L, 50L)),
      Gen.chooseNum(0L, 500L)) { (toks, budget) =>
      val keep = greedyFill(toks, budget)
      val kept = toks.zip(keep).collect { case (n, true) => n }
      // once a doc is rejected nothing after it ships (cum only grows)
      val prefixClosed = !keep.dropWhile(identity).contains(true)
      // the boundary doc may overshoot, by strictly less than itself
      val bounded = kept.isEmpty || kept.sum < budget + kept.max
      // a budget covering the whole corpus admits everything; a zero
      // budget admits nothing (positive token counts by construction)
      val total = if (budget >= toks.sum) keep.forall(identity) else true
      val zero = if (budget == 0L) !keep.contains(true) else true
      prefixClosed && bounded && total && zero
    }

  /** The √n k-routing rule (round 13 — dedup_semdedup /
    * sim_ann_ivf_rerank): minimal menu choice under n ≤ k²·occ,
    * monotone in n, saturating at the menu's last entry. */
  property("semDedupKFor picks the minimal bounding menu k, monotone, saturating") =
    Prop.forAll(Gen.chooseNum(1L, 500000000L)) { n =>
      import graft.operators.SimilarityOps._
      val k = semDedupKFor(n)
      val occ = SemDedupOcc
      val menu = SemDedupKConfigs
      val inMenu = menu.contains(k)
      // bounding (unless saturated), and MINIMAL among bounding entries
      val bounds = n <= k.toLong * k * occ || k == menu.last
      val minimal = menu.filter(_ < k)
        .forall(sm => n > sm.toLong * sm * occ)
      // monotone: one more row can never shrink k
      val mono = semDedupKFor(n + 1) >= k
      inMenu && bounds && minimal && mono
    }
}

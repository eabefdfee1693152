package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Sampling, Similarity}
import graft.functions.HashFunctions

/** Property-based checks of the PURE model functions the LSH
  * geometries are coupled to (no SparkSession — thousands of cases
  * evaluate instantly). The spec files pin specific operating points;
  * these pin the SHAPE of the models over their whole domain, which
  * is what makes coupling a threshold to a model sound.
  *
  * Cases come from a seeded RNG (deterministic, reproducible) — the
  * scalacheck-style sweep without the scalatest bridge (not in the
  * offline dependency set).
  */
class PropertiesSpec extends AnyFunSuite {

  private def cases[A](n: Int)(mk: scala.util.Random => A): Seq[A] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(mk(rnd))
  }

  test("srpCollisionProb is a probability, monotone in cos, tables buy recall, planes prune") {
    cases(2000) { r =>
      (r.nextDouble() * 1.998 - 0.999, 1 + r.nextInt(24), 1 + r.nextInt(32))
    }.foreach { case (c, p, t) =>
      val v = Similarity.srpCollisionProb(c, p, t)
      assert(v >= 0.0 && v <= 1.0, s"($c,$p,$t)")
      assert(Similarity.srpCollisionProb(math.min(0.999, c + 0.05), p, t) >= v - 1e-12,
        s"monotone in cosine at ($c,$p,$t)")
      assert(Similarity.srpCollisionProb(c, p, t + 1) >= v - 1e-12,
        s"tables buy recall at ($c,$p,$t)")
      assert(Similarity.srpCollisionProb(c, p + 1, t) <= v + 1e-12,
        s"planes prune at ($c,$p,$t)")
    }
  }

  test("multi-probe model: reduces at probes=1, monotone in probes, never below single-probe") {
    cases(2000) { r =>
      (r.nextDouble() * 1.998 - 0.999, 1 + r.nextInt(24), 1 + r.nextInt(32))
    }.foreach { case (c, p, t) =>
      val single = Similarity.srpCollisionProb(c, p, t)
      assert(math.abs(Similarity.srpMultiProbeCollisionProb(c, p, t, 1) - single) < 1e-12)
      (2 to math.min(p + 1, 6)).foldLeft(single) { (prev, probes) =>
        val v = Similarity.srpMultiProbeCollisionProb(c, p, t, probes)
        assert(v >= prev - 1e-12, s"probes=$probes must not lose recall at ($c,$p,$t)")
        assert(v >= 0.0 && v <= 1.0)
        v
      }
    }
  }

  test("suggestSrpGeometry always clears its recall target with log2(n) planes, table-minimally") {
    cases(300) { r =>
      (1000L + (r.nextDouble() * 1e9).toLong,
        0.5 + r.nextDouble() * 0.48, // thresholds with real background separation
        0.5 + r.nextDouble() * 0.45)
    }.foreach { case (n, thr, rec) =>
      val planes = math.max(4, math.ceil(math.log(n.toDouble) / math.log(2.0)).toInt)
      try {
        val (p, t, pr) = Similarity.suggestSrpGeometry(n, thr, rec)
        assert(p == planes)
        assert(Similarity.srpMultiProbeCollisionProb(thr, p, t, pr) >= rec, s"($n,$thr,$rec)")
        assert(pr >= 1 && pr <= p + 1 && t >= 1)
        // minimality in the index dimension: one fewer table cannot
        // reach the target with ANY legal probe count
        if (t > 1)
          assert(!(1 to p + 1).exists(q =>
            Similarity.srpMultiProbeCollisionProb(thr, p, t - 1, q) >= rec),
            s"(planes=$p tables=$t probes=$pr) is not table-minimal for ($n,$thr,$rec)")
      } catch {
        case _: IllegalArgumentException =>
          // the refusal must be TRUE: even the max-recall configuration
          // (max tables, fully probed) cannot reach the target — the
          // billion-row / moderate-threshold regime where the honest
          // answer is "more tables than the cap" or the exact path
          assert(Similarity.srpMultiProbeCollisionProb(thr, planes, 64, planes + 1) < rec,
            s"refused ($n,$thr,$rec) although a legal geometry exists")
      }
    }
  }

  test("minhash banding model: probability bounds and band/row monotonicity") {
    cases(2000) { r =>
      (0.01 + r.nextDouble() * 0.98, 1 + r.nextInt(16), 1 + r.nextInt(16))
    }.foreach { case (j, bands, rows) =>
      val v = HashFunctions.lshCollisionProb(j, bands, rows)
      assert(v >= 0.0 && v <= 1.0)
      assert(HashFunctions.lshCollisionProb(math.min(0.999, j + 0.05), bands, rows) >= v - 1e-12)
      assert(HashFunctions.lshCollisionProb(j, bands + 1, rows) >= v - 1e-12, "bands buy recall")
      assert(HashFunctions.lshCollisionProb(j, bands, rows + 1) <= v + 1e-12, "rows prune")
    }
  }

  test("hexThreshold: lexicographic thresholds are monotone in the fraction and well-formed") {
    cases(2000) { r => (r.nextDouble(), r.nextDouble(), 1 + r.nextInt(6)) }
      .foreach { case (f1, f2, width) =>
        val (lo, hi) = if (f1 <= f2) (f1, f2) else (f2, f1)
        val tLo = Sampling.hexThreshold(lo, width)
        val tHi = Sampling.hexThreshold(hi, width)
        // contract: fixed-width lowercase hex, OR the documented "g"
        // keep-all sentinel (sorts above every hex digit) when the
        // rounded cut reaches the bucket count
        def wellFormed(s: String) =
          s == "g" || (s.length == width && s.forall(c => c.isDigit || ('a' to 'f').contains(c)))
        assert(wellFormed(tLo) && wellFormed(tHi), s"$tLo / $tHi")
        assert(tLo <= tHi, s"monotone: $lo -> $tLo vs $hi -> $tHi")
      }
  }
}

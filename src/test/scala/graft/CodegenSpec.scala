package graft

import org.apache.spark.sql.functions._
import graft.functions._

/** The score expressions implement doGenCode; the generated Java must compile
 *  and agree with the interpreted eval on every branch (clamps, bounds,
 *  float mode). CODEGEN_ONLY forbids the silent interpreted fallback. */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  private def withCodegenOnly[A](f: => A): A = {
    val key = "spark.sql.codegen.factoryMode"
    val old = spark.conf.getOption(key)
    spark.conf.set(key, "CODEGEN_ONLY")
    try f finally old match {
      case Some(v) => spark.conf.set(key, v)
      case None    => spark.conf.unset(key)
    }
  }

  private val rows = Seq(
    (0.5, 0.1, 0.9), (0.1, 0.1, 0.9), (0.9, 0.1, 0.9), (0.4, 0.4, 0.4), (0.0, 0.0, 1.0)
  )

  test("minmax_norm codegen == interpreted (incl. bounds and float mode)") {
    withCodegenOnly {
      for {
        useFloat <- Seq(false, true)
        (lower, upper) <- Seq(
          (None, None),
          (Some(Bound(BoundMode.Apply, 0.2)), None),
          (Some(Bound(BoundMode.Clip, 0.2)), Some(Bound(BoundMode.Clip, 0.8))),
          (None, Some(Bound(BoundMode.Apply, 0.8))))
      } {
        val df = rows.toDF("s", "mn", "mx")
        val got = df.select(ScoreFunctions.minmaxNorm($"s", $"mn", $"mx", lower, upper, useFloat))
          .collect().map(_.getDouble(0))
        val want = rows.map { case (s, mn, mx) =>
          import org.apache.spark.sql.catalyst.expressions.Literal
          MinMaxNorm(Literal(s), Literal(mn), Literal(mx), lower, upper, useFloat)
            .eval(null).asInstanceOf[Double]
        }
        assert(got.toSeq == want, s"useFloat=$useFloat lower=$lower upper=$upper")
      }
    }
  }

  test("l2 / zscore / rrf / combine codegen == interpreted") {
    withCodegenOnly {
      val l2 = Seq((3.0, 5.0), (1.0, 0.0)).toDF("s", "n")
        .select(ScoreFunctions.l2Normalize($"s", $"n")).collect().map(_.getDouble(0))
      assert(l2.toSeq == Seq(0.6, 0.001))

      val z = Seq((2.0, 1.0, 0.5, 3.0, 0.0), (1.0, 1.0, 0.5, 3.0, 0.0), (2.0, 1.0, 0.0, 3.0, 0.5))
        .toDF("s", "m", "sd", "mx", "mn")
        .select(ScoreFunctions.zscoreNorm($"s", $"m", $"sd", $"mx", $"mn"))
        .collect().map(_.getDouble(0))
      assert(z.toSeq == Seq(2.0, 3.0, 0.5)) // normal, s==mean -> max, sd==0 -> min

      val rrf = Seq(1, 2).toDF("r")
        .select(ScoreFunctions.rrfScore($"r")).collect().map(_.getDouble(0))
      // scale-10 HALF_UP rounding bounds the error at 5e-11
      assert(math.abs(rrf(0) - 1.0 / 61) < 5e-11 && math.abs(rrf(1) - 1.0 / 62) < 5e-11)

      val comb = Seq(Seq(0.4, 0.8), Seq(0.0, 0.8)).toDF("a")
      def c(t: String, w: Seq[Double] = Nil) =
        comb.select(ScoreFunctions.combineScores($"a", t, w)).collect().map(_.getDouble(0)).toSeq
      def approx(got: Seq[Double], want: Seq[Double]): Unit =
        got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"$got vs $want") }
      approx(c(Combine.Arithmetic), Seq(0.6, 0.4))
      approx(c(Combine.Arithmetic, Seq(0.75, 0.25)), Seq(0.4 * 0.75 + 0.8 * 0.25, 0.2))
      assert(math.abs(c(Combine.Geometric).head - math.sqrt(0.4 * 0.8)) < 1e-12)
      assert(c(Combine.Geometric)(1) == 0.8) // zero skipped entirely
      assert(math.abs(c(Combine.Harmonic).head - 2.0 / (1 / 0.4 + 1 / 0.8)) < 1e-12)
      assert(c(Combine.Rrf) == Seq(1.2000000000000002, 0.8))
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.functions._

/**
 * Golden-value parity with the reference's normalization/combination unit
 * tests, float mode, delta 1e-4 (reference:
 * processor/normalization/MinMaxScoreNormalizationTechniqueTests.java:42-130,
 * testFixtures TestUtils.java:46).
 */
class NormalizationSpec extends SparkSpec {
  import spark.implicits._

  private val D = 1e-4

  // reference fixture: subq0 = [(2,0.5),(4,0.2)], subq1 = [(3,0.9),(4,0.7),(2,0.1)]
  private def fixture = Seq(
    (0, 2L, 0.5), (0, 4L, 0.2),
    (1, 3L, 0.9), (1, 4L, 0.7), (1, 2L, 0.1)
  ).toDF("subq", "doc_id", "score")

  private def normalized(nscore: org.apache.spark.sql.Column, stats: org.apache.spark.sql.DataFrame) =
    fixture.join(broadcast(stats), "subq").withColumn("ns", nscore)
      .select($"subq", $"doc_id", $"ns")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("min_max golden: (2,1.0),(4,0.001) / (3,1.0),(4,0.75),(2,0.001)") {
    val stats = fixture.groupBy($"subq").agg(min($"score").as("mn"), max($"score").as("mx"))
    val m = normalized(ScoreFunctions.minmaxNorm($"score", $"mn", $"mx", useFloat = true), stats)
    assert(math.abs(m((0, 2L)) - 1.0) < D)
    assert(math.abs(m((0, 4L)) - 0.001) < D)
    assert(math.abs(m((1, 3L)) - 1.0) < D)
    assert(math.abs(m((1, 4L)) - 0.75) < D)
    assert(math.abs(m((1, 2L)) - 0.001) < D)
  }

  test("min_max single-score -> 1.0") {
    val one = Seq((0, 7L, 0.42)).toDF("subq", "doc_id", "score")
    val stats = one.groupBy($"subq").agg(min($"score").as("mn"), max($"score").as("mx"))
    val m = one.join(stats, "subq")
      .select(ScoreFunctions.minmaxNorm($"score", $"mn", $"mx", useFloat = true))
      .head().getDouble(0)
    assert(m == 1.0)
  }

  test("min_max lower bound apply/clip (bounds/LowerBound.java:53-77)") {
    // scores [0.2 .. 0.5], lower bound 0.3 apply: s=0.4 -> (0.4-0.3)/(0.5-0.3)=0.5
    val df = Seq((0, 1L, 0.5), (0, 2L, 0.4), (0, 3L, 0.2)).toDF("subq", "doc_id", "score")
    val stats = df.groupBy($"subq").agg(min($"score").as("mn"), max($"score").as("mx"))
    val apply = df.join(stats, "subq").withColumn("ns",
      ScoreFunctions.minmaxNorm($"score", $"mn", $"mx",
        lower = Some(Bound(BoundMode.Apply, 0.3)), useFloat = true))
      .select($"doc_id", $"ns")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(math.abs(apply(2L) - 0.5) < D)
    // s=0.2 below bound: effective min falls back to real min -> (0.2-0.2)/(0.5-0.2)=0 -> 0.001
    assert(math.abs(apply(3L) - 0.001) < D)
    val clip = df.join(stats, "subq").withColumn("ns",
      ScoreFunctions.minmaxNorm($"score", $"mn", $"mx",
        lower = Some(Bound(BoundMode.Clip, 0.3)), useFloat = true))
      .select($"doc_id", $"ns")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // clip: s < bound -> MIN_SCORE
    assert(math.abs(clip(3L) - 0.001) < D)
    assert(math.abs(clip(2L) - (0.4 - 0.3) / (0.5 - 0.3)) < D)
  }

  test("l2 golden (L2ScoreNormalizationTechnique.java:47-72)") {
    val stats = fixture.groupBy($"subq").agg(sqrt(sum($"score" * $"score")).as("l2"))
    val m = normalized(ScoreFunctions.l2Normalize($"score", $"l2", useFloat = true), stats)
    val n0 = math.sqrt(0.5 * 0.5 + 0.2 * 0.2)
    val n1 = math.sqrt(0.9 * 0.9 + 0.7 * 0.7 + 0.1 * 0.1)
    assert(math.abs(m((0, 2L)) - 0.5 / n0) < D)
    assert(math.abs(m((0, 4L)) - 0.2 / n0) < D)
    assert(math.abs(m((1, 3L)) - 0.9 / n1) < D)
  }

  test("z_score golden incl. <=0 clamp (ZScoreNormalizationTechnique.java:206-224)") {
    val stats = fixture.groupBy($"subq").agg(
      avg($"score").as("mean"), coalesce(stddev_samp($"score"), lit(0.0)).as("sd"),
      max($"score").as("mx"), min($"score").as("mn"))
    val m = normalized(
      ScoreFunctions.zscoreNorm($"score", $"mean", $"sd", $"mx", $"mn", useFloat = true), stats)
    // subq1: mean .56667, sample sd .41633
    assert(math.abs(m((1, 3L)) - 0.80064) < 1e-3)
    assert(math.abs(m((1, 4L)) - 0.32026) < 1e-3)
    assert(math.abs(m((1, 2L)) - 0.001) < D) // z negative -> clamp
  }

  test("rrf golden: 1/(60+rank), BigDecimal scale 10 HALF_UP") {
    val df = Seq((1, 1), (2, 2), (3, 3)).toDF("doc_id", "rank")
    val m = df.select($"doc_id", ScoreFunctions.rrfScore($"rank", 60, useFloat = true))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(math.abs(m(1) - 1.0 / 61) < 1e-7)
    assert(math.abs(m(2) - 1.0 / 62) < 1e-7)
    assert(math.abs(m(3) - 1.0 / 63) < 1e-7)
  }

  test("combination techniques incl. zero-score handling") {
    def c(scores: Seq[Double], tech: String, w: Seq[Double] = Nil): Double =
      Seq(Tuple1(scores)).toDF("scores")
        .select(ScoreFunctions.combineScores($"scores", tech, w, useFloat = true))
        .head().getDouble(0)
    assert(math.abs(c(Seq(0.5, 0.3), Combine.Arithmetic) - 0.4) < D)
    // zero score still counts its weight in arithmetic (score >= 0)
    assert(math.abs(c(Seq(0.5, 0.0), Combine.Arithmetic) - 0.25) < D)
    assert(math.abs(c(Seq(0.5, 0.3), Combine.Geometric) - math.sqrt(0.15)) < D)
    // zero skipped entirely in geometric/harmonic
    assert(math.abs(c(Seq(0.5, 0.0), Combine.Geometric) - 0.5) < D)
    assert(math.abs(c(Seq(0.5, 0.3), Combine.Harmonic) - 2.0 / (1 / 0.5 + 1 / 0.3)) < D)
    assert(math.abs(c(Seq(0.5, 0.0), Combine.Harmonic) - 0.5) < D)
    // rrf combine = weighted SUM
    assert(math.abs(c(Seq(0.5, 0.3), Combine.Rrf) - 0.8) < D)
    // weights
    assert(math.abs(c(Seq(0.5, 0.3), Combine.Arithmetic, Seq(0.7, 0.3)) - (0.35 + 0.09)) < D)
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.functions.lit

/**
 * Score normalization + combination as native Catalyst expressions (north
 * rule: "mirroring its min-max/L2 score-normalization processors as Catalyst
 * expressions"). Each expression reproduces one reference technique's scalar
 * math exactly, including the idiosyncratic clamps:
 *
 *  - min_max  (reference: processor/normalization/MinMaxScoreNormalizationTechnique.java:260-297
 *    + bounds/LowerBound.java:53-77, bounds/UpperBound.java:53-77):
 *    single-score -> 1.0; bound modes apply/clip/ignore; clip -> 0.001/1.0;
 *    effMax==effMin -> 1.0; normalized==0 -> 0.001.
 *  - l2       (reference: L2ScoreNormalizationTechnique.java:143-145): norm==0 -> 0.001.
 *  - z_score  (reference: ZScoreNormalizationTechnique.java:206-224):
 *    score==mean -> max; sd==0 -> min; result<=0 -> 0.001; sd is the SAMPLE
 *    standard deviation (commons-math DescriptiveStatistics).
 *  - rrf      (reference: RRFNormalizationTechnique.java:221-223):
 *    BigDecimal ONE/(rankConstant + rank) at scale 10 HALF_UP.
 *  - combine  (reference: combination package, XxxScoreCombinationTechnique.java):
 *    arithmetic/geometric/harmonic weighted means + rrf weighted sum, with
 *    the reference's >=0 / >0 inclusion rules and zero-weight-sum -> 0.
 *
 * `useFloat = true` reproduces the reference's float32 arithmetic bit-exactly
 * (for golden-value parity tests); `false` computes in float64 (for
 * DuckDB-oracle parity). All expressions evaluate over the tiny normalized
 * top-k sets (<= depth x numSubQueries rows), so CodegenFallback costs
 * nothing measurable; the heavy path (BM25 block scoring) never goes through
 * these.
 */
object BoundMode {
  val Apply = "apply"
  val Clip = "clip"
  val Ignore = "ignore"
}

/** Optional min-max bound (mode, boundScore) pair. */
case class Bound(mode: String, score: Double)

case class MinMaxNorm(
    score: Expression,
    min: Expression,
    max: Expression,
    lower: Option[Bound],
    upper: Option[Bound],
    useFloat: Boolean
) extends TernaryExpression with CodegenFallback {

  override def first: Expression = score
  override def second: Expression = min
  override def third: Expression = max
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "minmax_norm"

  private val MinScore = 0.001
  private val MaxScore = 1.0
  private val SingleResult = 1.0

  override protected def nullSafeEval(s0: Any, mn0: Any, mx0: Any): Any = {
    if (useFloat) evalF(s0.asInstanceOf[Double].toFloat, mn0.asInstanceOf[Double].toFloat,
      mx0.asInstanceOf[Double].toFloat).toDouble
    else evalD(s0.asInstanceOf[Double], mn0.asInstanceOf[Double], mx0.asInstanceOf[Double])
  }

  private def effectiveLower(s: Double, mn: Double, mx: Double): Double = lower match {
    case None => mn
    case Some(Bound(m, b)) => m match {
      case BoundMode.Apply  => if (mx > b && s > b) b else mn
      case BoundMode.Clip   => if (mx < b) mn else b
      case _                => mn
    }
  }
  private def effectiveUpper(s: Double, mn: Double, mx: Double): Double = upper match {
    case None => mx
    case Some(Bound(m, b)) => m match {
      case BoundMode.Apply  => if (mn < b && s < b) b else mx
      case BoundMode.Clip   => if (mn > b) mx else b
      case _                => mx
    }
  }

  private def evalD(s: Double, mn: Double, mx: Double): Double = {
    if (mx == mn && mx == s) return SingleResult
    val effMn = effectiveLower(s, mn, mx)
    val effMx = effectiveUpper(s, mn, mx)
    if (lower.exists(_.mode == BoundMode.Clip) && s < effMn) return MinScore
    if (upper.exists(_.mode == BoundMode.Clip) && s > effMx) return MaxScore
    if (effMx == effMn) return SingleResult
    val n = (s - effMn) / (effMx - effMn)
    if (n == 0.0) MinScore else n
  }

  private def evalF(s: Float, mn: Float, mx: Float): Float = {
    if (mx == mn && mx == s) return SingleResult.toFloat
    val effMn = effectiveLower(s, mn, mx).toFloat
    val effMx = effectiveUpper(s, mn, mx).toFloat
    if (lower.exists(_.mode == BoundMode.Clip) && s < effMn) return MinScore.toFloat
    if (upper.exists(_.mode == BoundMode.Clip) && s > effMx) return MaxScore.toFloat
    if (effMx == effMn) return SingleResult.toFloat
    val n = (s - effMn) / (effMx - effMn)
    if (n == 0.0f) MinScore.toFloat else n
  }

  override protected def withNewChildrenInternal(f: Expression, s: Expression, t: Expression): Expression =
    copy(score = f, min = s, max = t)
}

case class L2Normalize(score: Expression, norm: Expression, useFloat: Boolean)
    extends BinaryExpression with CodegenFallback {
  override def left: Expression = score
  override def right: Expression = norm
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "l2_normalize"

  override protected def nullSafeEval(s: Any, n: Any): Any = {
    if (useFloat) {
      val sf = s.asInstanceOf[Double].toFloat
      val nf = n.asInstanceOf[Double].toFloat
      (if (nf == 0f) 0.001f else sf / nf).toDouble
    } else {
      val sd = s.asInstanceOf[Double]
      val nd = n.asInstanceOf[Double]
      if (nd == 0d) 0.001 else sd / nd
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(score = l, norm = r)
}

case class ZScoreNorm(
    score: Expression, mean: Expression, sd: Expression, maxS: Expression, minS: Expression,
    useFloat: Boolean
) extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(score, mean, sd, maxS, minS)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "zscore_norm"

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) return null
    val Seq(s, m, d, mx, mn) = vs.map(_.asInstanceOf[Double])
    if (useFloat) {
      val (sf, mf, df, mxf, mnf) = (s.toFloat, m.toFloat, d.toFloat, mx.toFloat, mn.toFloat)
      val r =
        if (java.lang.Float.compare(mf, sf) == 0) mxf
        else if (java.lang.Float.compare(df, 0.0f) == 0) mnf
        else { val n = (sf - mf) / df; if (n <= 0.0f) 0.001f else n }
      r.toDouble
    } else {
      if (s == m) mx
      else if (d == 0.0) mn
      else { val n = (s - m) / d; if (n <= 0.0) 0.001 else n }
    }
  }
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(score = cs(0), mean = cs(1), sd = cs(2), maxS = cs(3), minS = cs(4))
}

/** rank is the 1-based global rank within the sub-query. */
case class RrfScore(rank: Expression, rankConstant: Int, useFloat: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def child: Expression = rank
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "rrf_score"

  override protected def nullSafeEval(r: Any): Any = {
    val rk = r.asInstanceOf[Int]
    val bd = java.math.BigDecimal.ONE.divide(
      java.math.BigDecimal.valueOf(rankConstant.toLong + rk), 10, java.math.RoundingMode.HALF_UP)
    if (useFloat) bd.floatValue().toDouble else bd.doubleValue()
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(rank = c)
}

object Combine {
  val Arithmetic = "arithmetic_mean"
  val Geometric = "geometric_mean"
  val Harmonic = "harmonic_mean"
  val Rrf = "rrf"
}

/** Combine the per-sub-query normalized score array into one score.
 *  Missing sub-query entries must be pre-filled with 0.0 (the reference
 *  zero-initializes its per-doc float[numSubQueries] —
 *  processor/combination/ScoreCombiner.java:361-375). */
case class CombineScores(scores: Expression, technique: String, weights: Seq[Double], useFloat: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def child: Expression = scores
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "combine_scores"

  private def weightAt(i: Int): Double = if (i < weights.length) weights(i) else 1.0

  override protected def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData].toDoubleArray()
    if (useFloat) evalF(arr) else evalD(arr)
  }

  private def evalD(arr: Array[Double]): Double = technique match {
    case Combine.Arithmetic =>
      var cs = 0.0; var ws = 0.0
      var i = 0
      while (i < arr.length) {
        if (arr(i) >= 0.0) { val w = weightAt(i); cs += arr(i) * w; ws += w }
        i += 1
      }
      if (ws == 0.0) 0.0 else cs / ws
    case Combine.Geometric =>
      var ls = 0.0; var ws = 0.0
      var i = 0
      while (i < arr.length) {
        if (arr(i) > 0.0) { val w = weightAt(i); ws += w; ls += w * math.log(arr(i)) }
        i += 1
      }
      if (ws == 0.0) 0.0 else math.exp(ls / ws)
    case Combine.Harmonic =>
      var ws = 0.0; var hs = 0.0
      var i = 0
      while (i < arr.length) {
        if (arr(i) > 0.0) { val w = weightAt(i); ws += w; hs += w / arr(i) }
        i += 1
      }
      if (hs > 0.0) ws / hs else 0.0
    case Combine.Rrf =>
      var cs = 0.0; var ws = 0.0
      var i = 0
      while (i < arr.length) {
        if (arr(i) >= 0.0) { val w = weightAt(i); cs += arr(i) * w; ws += w }
        i += 1
      }
      if (ws == 0.0) 0.0 else cs
    case other => throw new IllegalArgumentException(s"unknown combination technique: $other")
  }

  private def evalF(arr: Array[Double]): Double = technique match {
    case Combine.Arithmetic =>
      var cs = 0.0f; var ws = 0.0f
      var i = 0
      while (i < arr.length) {
        val s = arr(i).toFloat
        if (s >= 0.0f) { val w = weightAt(i).toFloat; cs += s * w; ws += w }
        i += 1
      }
      (if (ws == 0.0f) 0.0f else cs / ws).toDouble
    case Combine.Geometric =>
      var ls = 0.0f; var ws = 0.0f
      var i = 0
      while (i < arr.length) {
        val s = arr(i).toFloat
        if (s > 0.0f) { val w = weightAt(i).toFloat; ws += w; ls += w * math.log(s.toDouble).toFloat }
        i += 1
      }
      (if (ws == 0.0f) 0.0f else math.exp((ls / ws).toDouble).toFloat).toDouble
    case Combine.Harmonic =>
      var ws = 0.0f; var hs = 0.0f
      var i = 0
      while (i < arr.length) {
        val s = arr(i).toFloat
        if (s > 0.0f) { val w = weightAt(i).toFloat; ws += w; hs += w / s }
        i += 1
      }
      (if (hs > 0.0f) ws / hs else 0.0f).toDouble
    case Combine.Rrf =>
      var cs = 0.0f; var ws = 0.0f
      var i = 0
      while (i < arr.length) {
        val s = arr(i).toFloat
        if (s >= 0.0f) { val w = weightAt(i).toFloat; cs += s * w; ws += w }
        i += 1
      }
      (if (ws == 0.0f) 0.0f else cs).toDouble
    case other => throw new IllegalArgumentException(s"unknown combination technique: $other")
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(scores = c)
}

/** Column-API facade + SQL registration for the score expressions. */
object ScoreFunctions {

  private def col(e: Expression): Column = org.apache.spark.sql.GraftColumnBridge.column(e)
  private def ex(c: Column): Expression = org.apache.spark.sql.GraftColumnBridge.expression(c)

  def minmaxNorm(score: Column, min: Column, max: Column,
                 lower: Option[Bound] = None, upper: Option[Bound] = None,
                 useFloat: Boolean = false): Column =
    col(MinMaxNorm(ex(score), ex(min), ex(max), lower, upper, useFloat))

  def l2Normalize(score: Column, norm: Column, useFloat: Boolean = false): Column =
    col(L2Normalize(ex(score), ex(norm), useFloat))

  def zscoreNorm(score: Column, mean: Column, sd: Column, maxS: Column, minS: Column,
                 useFloat: Boolean = false): Column =
    col(ZScoreNorm(ex(score), ex(mean), ex(sd), ex(maxS), ex(minS), useFloat))

  def rrfScore(rank: Column, rankConstant: Int = 60, useFloat: Boolean = false): Column =
    col(RrfScore(ex(rank), rankConstant, useFloat))

  def combineScores(scores: Column, technique: String, weights: Seq[Double] = Nil,
                    useFloat: Boolean = false): Column =
    col(CombineScores(ex(scores), technique, weights, useFloat))

  /** Register SQL-callable forms (defaults: no bounds, double math),
   *  mirroring the reference's technique factories keyed by name
   *  (reference: processor/normalization/ScoreNormalizationFactory.java:98-109). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minmax_norm",
      es => MinMaxNorm(es(0), es(1), es(2), None, None, useFloat = false), "scala_udf")
    reg.createOrReplaceTempFunction("l2_normalize",
      es => L2Normalize(es(0), es(1), useFloat = false), "scala_udf")
    reg.createOrReplaceTempFunction("zscore_norm",
      es => ZScoreNorm(es(0), es(1), es(2), es(3), es(4), useFloat = false), "scala_udf")
    reg.createOrReplaceTempFunction("rrf_score",
      es => RrfScore(es(0), 60, useFloat = false), "scala_udf")
  }
}

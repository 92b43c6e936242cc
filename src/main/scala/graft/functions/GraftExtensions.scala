package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/**
 * SparkSessionExtensions entry point: registers the score-normalization
 * Catalyst expressions as SQL functions for any session built with
 * `.withExtensions(new GraftExtensions)` or
 * `spark.sql.extensions=graft.functions.GraftExtensions`. This is the
 * engine-level analogue of the reference's technique factories, which resolve
 * normalization/combination implementations by name
 * (reference: processor/normalization/ScoreNormalizationFactory.java:98-109,
 * processor/combination/ScoreCombinationFactory.java).
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((FunctionIdentifier("minmax_norm"), info("minmax_norm"),
      (es: Seq[Expression]) => MinMaxNorm(es(0), es(1), es(2), None, None, useFloat = false)))
    ext.injectFunction((FunctionIdentifier("l2_normalize"), info("l2_normalize"),
      (es: Seq[Expression]) => L2Normalize(es(0), es(1), useFloat = false)))
    ext.injectFunction((FunctionIdentifier("zscore_norm"), info("zscore_norm"),
      (es: Seq[Expression]) => ZScoreNorm(es(0), es(1), es(2), es(3), es(4), useFloat = false)))
    ext.injectFunction((FunctionIdentifier("rrf_score"), info("rrf_score"),
      (es: Seq[Expression]) => RrfScore(es(0), rankConstant = 60, useFloat = false)))
  }
}

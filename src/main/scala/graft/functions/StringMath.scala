package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Damerau-Levenshtein distance (unrestricted, Lowrance-Wagner): the edit
 * distance Lucene's FuzzyQuery uses when `transpositions = true` (its
 * default) — an adjacent transposition counts as ONE edit, so "hte" reaches
 * "the" at distance 1 where classic Levenshtein needs 2. DuckDB's
 * `damerau_levenshtein` computes the same unrestricted variant (probe:
 * ca→abc = 2, which the restricted/OSA form forbids at 3), so the oracle
 * re-derives expansions exactly.
 *
 * Shared by the interpreted and generated paths of [[DamerauDistance]] the
 * same way [[ScoreMath]] backs the score expressions.
 */
object StringMath {

  /** Unrestricted Damerau-Levenshtein over the analyzed-token alphabet.
   *  Terms are ASCII ([a-z0-9]); non-ASCII code points still work through
   *  the generic last-occurrence table fallback below. */
  def damerau(a: String, b: String): Int = {
    val la = a.length
    val lb = b.length
    if (la == 0) return lb
    if (lb == 0) return la
    val maxd = la + lb
    // d is (la+2) x (lb+2) with the Lowrance-Wagner sentinel border
    val w = lb + 2
    val d = new Array[Int]((la + 2) * w)
    d(0) = maxd
    var i = 0
    while (i <= la) { d((i + 1) * w) = maxd; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= lb) { d(j + 1) = maxd; d(w + j + 1) = j; j += 1 }
    // last row index in which each character of the alphabet occurred in a
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= la) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= lb) {
        val bj = b.charAt(j - 1)
        val k: Int = { val v = da.get(bj); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (ai == bj) { db = j; 0 } else 1
        var m = d(i * w + j) + cost                      // substitute / match
        val ins = d((i + 1) * w + j) + 1                 // insert
        if (ins < m) m = ins
        val del = d(i * w + j + 1) + 1                   // delete
        if (del < m) m = del
        val tr = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1) // transpose
        if (tr < m) m = tr
        d((i + 1) * w + j + 1) = m
        j += 1
      }
      da.put(ai, i)
      i += 1
    }
    d((la + 1) * w + lb + 1)
  }

  /** UTF8String entry point the generated code calls. */
  def damerau(a: UTF8String, b: UTF8String): Int =
    damerau(a.toString, b.toString)
}

/** `damerau_distance(a, b)` as a native Catalyst expression so the fuzzy
 *  term-dictionary predicate stays inside whole-stage codegen (the generated
 *  Java emits a static call into [[StringMath]], like the score
 *  expressions emit into ScoreMath). */
case class DamerauDistance(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "damerau_distance"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    StringMath.damerau(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.StringMath.damerau($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

object StringFunctions {
  def damerauDistance(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      DamerauDistance(
        org.apache.spark.sql.GraftColumnBridge.expression(a),
        org.apache.spark.sql.GraftColumnBridge.expression(b)))
}

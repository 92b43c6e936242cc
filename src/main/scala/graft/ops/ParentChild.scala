package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The join-field queries — `has_child` / `has_parent`. The reference maps
 *  parents and children into ONE index via the parent-join field and
 *  resolves the relation at query time with a global-ordinals join held in
 *  memory per shard; the Spark re-expression keeps children as a
 *  first-class table keyed by parent id, so the relation is a plain
 *  relational join Catalyst can plan (broadcast when one side is small,
 *  shuffle otherwise) — no per-shard ordinal map to build or invalidate.
 *
 *  Scale shape: both directions are ONE join + (for has_child) ONE
 *  aggregation, each keyed on the parent id. Child matching is codegen'd
 *  column algebra over the child text (array_intersect against the
 *  query-term literal), so the matched child set — not the child corpus —
 *  is what reaches the aggregation. */
object ParentChild {

  private val Modes = Set("none", "sum", "avg", "max", "min")

  /** `has_child`: parents with matching children, scored per `scoreMode`.
   *  A child matches when it contains at least one query term; its score is
   *  the count of DISTINCT query terms it contains (the bool-of-terms child
   *  query). `minChildren`/`maxChildren` bound the MATCHING child count —
   *  the reference applies the bounds to matching children, not all
   *  children. Returns (parent_id, score, n_children). */
  def hasChild(children: DataFrame, parentCol: String, textCol: String,
               terms: Seq[String], scoreMode: String,
               minChildren: Int = 1, maxChildren: Int = Int.MaxValue): DataFrame = {
    require(terms.nonEmpty, "has_child requires at least one query term")
    require(Modes.contains(scoreMode),
      s"score_mode must be one of ${Modes.mkString("/")}, got [$scoreMode]")
    require(minChildren >= 1, s"min_children must be >= 1, got $minChildren")
    require(maxChildren >= minChildren,
      s"max_children ($maxChildren) must be >= min_children ($minChildren)")
    val toks = TextOps.tokensCol(col(textCol))
    val matched = children
      .select(col(parentCol).as("parent_id"),
        size(array_intersect(toks, lit(terms.distinct.toArray)))
          .cast("double").as("cs"))
      .where(col("cs") > 0)
    val scoreAgg: Column = scoreMode match {
      case "none" => lit(1.0)
      case "sum"  => sum(col("cs"))
      case "avg"  => avg(col("cs"))
      case "max"  => max(col("cs"))
      case "min"  => min(col("cs"))
    }
    matched.groupBy("parent_id")
      .agg(scoreAgg.as("score"), count(lit(1)).as("n_children"))
      .where(col("n_children") >= minChildren && col("n_children") <= maxChildren)
      .select(col("parent_id"), col("score").cast("double").as("score"),
        col("n_children"))
  }

  /** `parent_id`: the children of ONE named parent — the third member of
   *  the parent-join query family (has_child / has_parent / parent_id).
   *  The reference resolves it as a single ordinal lookup; relationally it
   *  is a constant equality predicate on the parent-key column, which the
   *  scan accepts as a pushed filter — bounded work (one parent's children)
   *  however large the child table. Children score the constant 1.0, as the
   *  reference's ParentIdQueryBuilder does. */
  def parentId(children: DataFrame, parentCol: String, id: Long): DataFrame =
    children.where(col(parentCol) === id)
      .withColumn("score", lit(1.0))

  /** `has_parent`: children whose parent is in the matched parent set.
   *  `parents` carries (parent_id, score); with `withScore` each child
   *  inherits its parent's score (the reference's `score: true`), otherwise
   *  the constant 1.0. One join keyed on the parent id; child columns pass
   *  through. */
  def hasParent(children: DataFrame, parentCol: String,
                parents: DataFrame, withScore: Boolean): DataFrame = {
    val p = parents.select(col("parent_id"),
      (if (withScore) col("score") else lit(1.0)).as("_pscore"))
    children.join(p, children(parentCol) === p("parent_id"))
      .drop("parent_id")
      .withColumnRenamed("_pscore", "score")
  }
}

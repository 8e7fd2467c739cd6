package graft.plans

import graft.core.Lsh
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Whole-operator Catalyst surface for the similarity join (SURVEY §7.2's
  * optional `Rule`): `SimilarityJoinPlan` is a logical placeholder node
  * declaring the operator's semantics — "pairs (a, b) from left x right
  * with estimated Jaccard >= threshold" — and [[ResolveSimilarityJoin]]
  * rewrites it during analysis into the banding plan (postings equi-join,
  * never a cross join), which Catalyst then optimizes like any other plan.
  * Registered through [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
case class SimilarityJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    idCol: String,
    sigCol: String,
    threshold: Double,
    params: Lsh.Params = Lsh.Params())
  extends BinaryNode {

  override val output: Seq[Attribute] = Seq(
    AttributeReference("a", LongType, nullable = false)(),
    AttributeReference("b", LongType, nullable = false)(),
    AttributeReference("score", DoubleType, nullable = false)())

  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): SimilarityJoinPlan =
    copy(left = l, right = r)
}

/** Analysis-time rewrite: placeholder -> banding plan. The expansion is
  * built with the DataFrame API (so it stays in lockstep with the
  * function-level operator) and re-aliased onto the placeholder's output
  * attribute ids so parent operators keep resolving. */
class ResolveSimilarityJoin(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case sj: SimilarityJoinPlan if sj.childrenResolved =>
      val l = Bridge.ofRows(spark, sj.left)
      val r = Bridge.ofRows(spark, sj.right)
      val expanded = Bridge.analyzed(
        Lsh.similarityJoin(l, r, sj.idCol, sj.sigCol, sj.threshold, sj.params))
      Project(
        sj.output.zip(expanded.output).map { case (o, n) =>
          Alias(n, o.name)(exprId = o.exprId)
        },
        expanded)
  }
}

/** SparkSessionExtensions entry point: injects the similarity-join
  * resolution rule and the engine's SQL functions. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(ext: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    ext.injectResolutionRule(spark => new ResolveSimilarityJoin(spark))
  }
}

object SimilarityJoinPlan {
  /** DataFrame-level entry: builds the placeholder node; requires the
    * session to carry [[GraftExtensions]] (or [[ResolveSimilarityJoin]] to
    * be applied manually) for resolution. */
  def dataFrame(left: org.apache.spark.sql.DataFrame, right: org.apache.spark.sql.DataFrame,
                idCol: String, sigCol: String, threshold: Double,
                params: Lsh.Params = Lsh.Params()): org.apache.spark.sql.DataFrame =
    Bridge.ofRows(left.sparkSession,
      SimilarityJoinPlan(Bridge.analyzed(left), Bridge.analyzed(right),
        idCol, sigCol, threshold, params))
}

package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LocalRelation, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, Literal, Expression, And}
import org.apache.spark.unsafe.types.UTF8String
import graft.core.GraphSchema

/** SparkSessionExtensions integration (SURVEY §4.3):
  *
  *  1. SQL registration of the native vector expressions (`cosine_sim`,
  *     `dot_product`) so `spark.sql("SELECT cosine_sim(a, b) …")` works.
  *  2. [[SchemaLinkPruning]] — the one reference optimization Catalyst
  *     doesn't already do (`GraphTransaction.optimizeQuery:1560-1589`):
  *     a scan of the edges table filtered to an edge label that exists in
  *     no schema (impossible label) is replaced by an empty relation before
  *     any I/O happens. Registered only when a schema is installed via
  *     [[GraftExtensions.installSchema]].
  *
  * Usage: `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
  import graft.functions.VectorFunctions

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => SchemaLinkPruning)
    e.injectFunction((FunctionIdentifier("cosine_sim"),
      new ExpressionInfo("graft.functions.VectorFunctions", "cosine_sim"),
      (es: Seq[Expression]) => VectorFunctions.CosineSimExpr(es.head, es(1))))
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo("graft.functions.VectorFunctions", "dot_product"),
      (es: Seq[Expression]) => VectorFunctions.DotProductExpr(es.head, es(1))))
  }
}

object GraftExtensions {
  @volatile private[plans] var installedSchema: Option[GraphSchema] = None
  /** Install the graph schema that SchemaLinkPruning consults. */
  def installSchema(s: GraphSchema): Unit = { installedSchema = Some(s) }
  def clearSchema(): Unit = { installedSchema = None }
}

/** Replaces `Filter(label = 'x', scan)` with an empty relation when 'x' is
  * not a declared edge/vertex label — the schema knows the scan cannot
  * match, so the storage is never touched (join elimination by metadata). */
object SchemaLinkPruning extends Rule[LogicalPlan] {

  private def impossibleLabel(cond: Expression, schema: GraphSchema): Boolean = {
    // `label = x` with x undeclared, or `sub_label = x` with x not a
    // declared SUB edge label (father/sub hierarchy): the scan can't match.
    // sub_label pruning only activates when the installed schema declares
    // a father/sub hierarchy at all — otherwise an ad-hoc frame's
    // sub_label filter (a graph the installed schema knows nothing about)
    // would silently collapse to empty.
    def impossibleEq(column: String, value: String): Boolean = column match {
      case "label" =>
        !schema.edgeLabels.exists(_.name == value) &&
          !schema.vertexLabels.exists(_.name == value)
      case "sub_label" =>
        schema.edgeLabels.exists(_.father.isDefined) &&
          !schema.edgeLabels.exists(e => e.name == value && e.father.isDefined)
      case _ => false
    }
    // bare column = literal ONLY: `upper(label) = 'X'` or
    // `substring(sub_label, …) = 'x'` can match rows the bare column never
    // would, so any computed left side must not prune
    def check(e: Expression): Boolean = e match {
      case And(l, r) => check(l) || check(r)
      case EqualTo(a: AttributeReference, Literal(v: UTF8String, _)) =>
        impossibleEq(a.name, v.toString)
      case EqualTo(Literal(v: UTF8String, _), a: AttributeReference) =>
        impossibleEq(a.name, v.toString)
      case _ => false
    }
    check(cond)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    GraftExtensions.installedSchema match {
      case None => plan
      case Some(schema) =>
        plan.transform {
          case f @ Filter(cond, _) if impossibleLabel(cond, schema) =>
            LocalRelation(f.output, Nil, isStreaming = false)
        }
    }
}

package graft.core

import org.apache.spark.sql.{Column, DataFrame, functions => F}
import org.apache.spark.sql.functions._

/** Predicate algebra mirroring the reference's `Condition` tree
  * (`.../backend/query/Condition.java`: ConditionType AND/OR/RELATION at
  * `:46`, RelationType surface at `:54-140`), compiled to Catalyst `Column`
  * expressions. The reference needs a whole planning module
  * (ConditionQueryFlatten DNF + GraphIndexTransaction index selection,
  * ~2000 LoC) to execute these against KV indexes; on Spark the compiled
  * `Column` IS the plan — Catalyst does pushdown, DNF and contradiction
  * elimination natively (SURVEY §4.1).
  */
sealed trait Cond {
  def and(o: Cond): Cond = And(this, o)
  def or(o: Cond): Cond = Or(this, o)
  def compile: Column
}
final case class And(l: Cond, r: Cond) extends Cond { def compile: Column = l.compile && r.compile }
final case class Or(l: Cond, r: Cond) extends Cond { def compile: Column = l.compile || r.compile }
final case class Not(c: Cond) extends Cond { def compile: Column = !c.compile }

/** Scalar relations — reference `Condition.RelationType` (`Condition.java:54-140`). */
final case class Rel(key: String, op: RelOp.Value, value: Any) extends Cond {
  import RelOp._
  def compile: Column = {
    val c = col(key)
    op match {
      case EQ  => c === lit(value)
      case NEQ => c =!= lit(value)
      case GT  => c > lit(value)
      case GTE => c >= lit(value)
      case LT  => c < lit(value)
      case LTE => c <= lit(value)
      case IN  => c.isin(value.asInstanceOf[Seq[Any]]: _*)
      case NOT_IN => !c.isin(value.asInstanceOf[Seq[Any]]: _*)
      case PREFIX => c.startsWith(value.toString)
      // TinkerPop TextP endingWith / containing — plain string suffix and
      // substring (distinct from TEXT_CONTAINS' tokenized word semantics)
      case SUFFIX => c.endsWith(value.toString)
      case SUBSTR => c.contains(value.toString)
      // Tokenized word containment — the SEARCH-index semantic
      // (`Condition.java:94`, `GraphIndexTransaction.segmentWords:897`).
      case TEXT_CONTAINS =>
        array_contains(graft.functions.TextFunctions.tokenize(c), value.toString)
      case TEXT_CONTAINS_ANY =>
        arrays_overlap(graft.functions.TextFunctions.tokenize(c),
          lit(value.asInstanceOf[Seq[String]].toArray))
      // Collection-property containment (`Condition.java:116-126`).
      case CONTAINS => array_contains(c, lit(value))
      case CONTAINS_KEY => map_contains_key(c, lit(value))
      case CONTAINS_VALUE => array_contains(map_values(c), lit(value))
    }
  }
}

object RelOp extends Enumeration {
  val EQ, NEQ, GT, GTE, LT, LTE, IN, NOT_IN, PREFIX, SUFFIX, SUBSTR,
      TEXT_CONTAINS, TEXT_CONTAINS_ANY, CONTAINS, CONTAINS_KEY, CONTAINS_VALUE = Value
}

object Cond {
  def eq(k: String, v: Any): Cond = Rel(k, RelOp.EQ, v)
  def neq(k: String, v: Any): Cond = Rel(k, RelOp.NEQ, v)
  def gt(k: String, v: Any): Cond = Rel(k, RelOp.GT, v)
  def gte(k: String, v: Any): Cond = Rel(k, RelOp.GTE, v)
  def lt(k: String, v: Any): Cond = Rel(k, RelOp.LT, v)
  def lte(k: String, v: Any): Cond = Rel(k, RelOp.LTE, v)
  def in(k: String, vs: Seq[Any]): Cond = Rel(k, RelOp.IN, vs)
  def notIn(k: String, vs: Seq[Any]): Cond = Rel(k, RelOp.NOT_IN, vs)
  def prefix(k: String, v: String): Cond = Rel(k, RelOp.PREFIX, v)
  def suffix(k: String, v: String): Cond = Rel(k, RelOp.SUFFIX, v)
  def substr(k: String, v: String): Cond = Rel(k, RelOp.SUBSTR, v)
  def textContains(k: String, w: String): Cond = Rel(k, RelOp.TEXT_CONTAINS, w)
  def textContainsAny(k: String, ws: Seq[String]): Cond = Rel(k, RelOp.TEXT_CONTAINS_ANY, ws)
  def contains(k: String, v: Any): Cond = Rel(k, RelOp.CONTAINS, v)
}

/** ConditionQuery analogue (`.../backend/query/ConditionQuery.java`): a
  * label/condition/order/limit bundle compiled onto a DataFrame scan.
  * offset/limit mirror `Query.java:61-64`; orders mirror `Query.Order`. */
final case class ElementQuery(
    label: Option[String] = None,
    cond: Option[Cond] = None,
    orderBy: Seq[(String, Boolean)] = Nil, // (key, ascending)
    offset: Long = 0L,
    limit: Long = -1L) {

  def where(c: Cond): ElementQuery = copy(cond = Some(cond.map(_.and(c)).getOrElse(c)))

  def apply(df: DataFrame): DataFrame = {
    var out = df
    label.foreach(l => out = out.filter(col("label") === l))
    cond.foreach(c => out = out.filter(c.compile))
    if (orderBy.nonEmpty)
      out = out.orderBy(orderBy.map { case (k, asc) => if (asc) col(k).asc else col(k).desc }: _*)
    if (offset > 0) out = out.offset(offset.toInt)
    if (limit >= 0) out = out.limit(limit.toInt)
    out
  }
}

/** Per-hop traversal step config — reference `steps/EdgeStep.java:42-46`:
  * direction, labels, property filters, degree cap, skipDegree (supernode
  * skip, `HugeTraverser.skipSuperNodeIfNeeded:210-229`). Degree semantics on
  * Spark: deterministic truncation by (label, dst) order via a window —
  * reference truncation is storage-order (nondeterministic), SURVEY §7.4. */
final case class EdgeStep(
    direction: Direction.Value = Direction.OUT,
    labels: Seq[String] = Nil,
    cond: Option[Cond] = None,
    degree: Long = -1L,
    skipDegree: Long = 0L) {

  def edgesFor(g: PropertyGraph): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    var e = g.adjacency(direction, labels)
    cond.foreach(c => e = e.filter(c.compile))
    if (skipDegree > 0L) {
      // skip supernodes entirely: drop all edges of vertices whose degree
      // exceeds skipDegree
      val deg = e.groupBy(col("src").as("__sv")).agg(count(lit(1)).as("__deg"))
        .filter(col("__deg") <= skipDegree)
      e = e.join(deg.select(col("__sv")), e("src") === col("__sv"), "left_semi")
    }
    if (degree >= 0L) {
      val w = Window.partitionBy(col("src")).orderBy(col("label"), col("dst"))
      e = e.withColumn("__rn", row_number().over(w)).filter(col("__rn") <= degree).drop("__rn")
    }
    e
  }
}

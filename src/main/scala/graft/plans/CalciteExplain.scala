package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans._
import org.apache.spark.sql.catalyst.plans.logical._

/**
 * Renders an optimized Catalyst plan in the reference's explain format: the
 * Calcite relational-algebra string (`bc.explain(sql)` returns e.g.
 * `LogicalUnion(all=[true])\n  LogicalTableScan(table=[[main, t]])` —
 * reference: pyblazing/pyblazing/apiv2/context.py:1842-1924, node
 * vocabulary from algebra/.../RelationalAlgebraGenerator.java and the
 * docs examples).
 *
 * Same CONTENT (the optimized logical algebra), reference SHAPE: Calcite
 * node names, two-space indentation, `$n` input refs, prefix operators
 * (`<($0, 10)`, `AND(...)`), and the scan-pushdown rules' BindableTableScan
 * form when a filter/projection sits directly on a scan — the shape
 * Calcite's ProjectTableScanRule/FilterTableScanRule produce in the
 * reference. Expressions the vocabulary doesn't cover fall back to their
 * SQL rendering; the node tree and indentation are the contract.
 */
object CalciteExplain {

  /** nameOf: resolves a (sub)plan to a registered table name, so catalog
    * scans render as `table=[[main, name]]` like the reference's
    * single-schema catalog. */
  def format(plan: LogicalPlan, nameOf: LogicalPlan => Option[String]): String = {
    val sb = new StringBuilder
    render(plan, nameOf, 0, sb)
    sb.toString.stripLineEnd
  }

  // ------------------------------------------------------------ expressions

  private def inputIndex(p: LogicalPlan): Map[ExprId, Int] =
    p.children.flatMap(_.output).zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap

  private def lit(l: Literal): String = l.value match {
    case null                => "null"
    case s: org.apache.spark.unsafe.types.UTF8String => s"'$s'"
    case v                   => v.toString
  }

  private def rex(e: Expression, idx: Map[ExprId, Int]): String = e match {
    case a: AttributeReference => idx.get(a.exprId).map(i => s"$$$i").getOrElse(a.name)
    case Alias(c, _)           => rex(c, idx)
    case l: Literal            => lit(l)
    case EqualTo(a, b)         => s"=(${rex(a, idx)}, ${rex(b, idx)})"
    case Not(EqualTo(a, b))    => s"<>(${rex(a, idx)}, ${rex(b, idx)})"
    case LessThan(a, b)        => s"<(${rex(a, idx)}, ${rex(b, idx)})"
    case LessThanOrEqual(a, b) => s"<=(${rex(a, idx)}, ${rex(b, idx)})"
    case GreaterThan(a, b)     => s">(${rex(a, idx)}, ${rex(b, idx)})"
    case GreaterThanOrEqual(a, b) => s">=(${rex(a, idx)}, ${rex(b, idx)})"
    case EqualNullSafe(a, b)   => s"IS NOT DISTINCT FROM(${rex(a, idx)}, ${rex(b, idx)})"
    case a: And => s"AND(${conjuncts(a).map(rex(_, idx)).mkString(", ")})"
    case o: Or  => s"OR(${disjuncts(o).map(rex(_, idx)).mkString(", ")})"
    case Not(c)        => s"NOT(${rex(c, idx)})"
    case IsNull(c)     => s"IS NULL(${rex(c, idx)})"
    case IsNotNull(c)  => s"IS NOT NULL(${rex(c, idx)})"
    case Add(a, b, _)      => s"+(${rex(a, idx)}, ${rex(b, idx)})"
    case Subtract(a, b, _) => s"-(${rex(a, idx)}, ${rex(b, idx)})"
    case Multiply(a, b, _) => s"*(${rex(a, idx)}, ${rex(b, idx)})"
    case Divide(a, b, _)   => s"/(${rex(a, idx)}, ${rex(b, idx)})"
    case c: Cast => s"CAST(${rex(c.child, idx)}):${c.dataType.sql}"
    case ae: AggregateExpression =>
      val fn = ae.aggregateFunction
      val name = fn.prettyName.toUpperCase
      val args = fn.children.filterNot(_.foldable).map(rex(_, idx))
      s"$name(${if (ae.isDistinct) "DISTINCT " else ""}${args.mkString(", ")})"
    case other =>
      scala.util.Try(other.sql).getOrElse(other.toString).replaceAll("#\\d+", "")
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x => Seq(x)
  }

  private def disjuncts(e: Expression): Seq[Expression] = e match {
    case Or(a, b) => disjuncts(a) ++ disjuncts(b)
    case x => Seq(x)
  }

  /** Calcite's plans never carry the null guards Spark's optimizer infers
    * from strict predicates — drop IsNotNull(a) conjuncts when another
    * conjunct already references a (which implied them in the first
    * place), so filters read like the reference's. */
  private def dropImpliedNullGuards(cond: Expression): Option[Expression] = {
    val cs = conjuncts(cond)
    val referenced = cs.collect {
      case c if !c.isInstanceOf[IsNotNull] => c.references.toSeq.map(_.exprId)
    }.flatten.toSet
    val kept = cs.filter {
      case IsNotNull(a: AttributeReference) => !referenced.contains(a.exprId)
      case _ => true
    }
    kept.reduceOption(And)
  }

  // ------------------------------------------------------------------ nodes

  private def dir(o: SortOrder): String = (o.direction, o.nullOrdering) match {
    // reference defaults (OrderBy.cpp:69-85): ASC -> nulls last,
    // DESC -> nulls first; only deviations are spelled out
    case (Ascending, NullsLast)   => "ASC"
    case (Ascending, NullsFirst)  => "ASC-nulls-first"
    case (Descending, NullsFirst) => "DESC"
    case (Descending, NullsLast)  => "DESC-nulls-last"
  }

  private def joinTypeName(t: JoinType): String = t match {
    case Inner | Cross   => "inner"
    case LeftOuter       => "left"
    case RightOuter      => "right"
    case FullOuter       => "full"
    case LeftSemi        => "semi"
    case LeftAnti        => "anti"
    case other           => other.toString.toLowerCase
  }

  private def render(p: LogicalPlan, nameOf: LogicalPlan => Option[String],
                     depth: Int, sb: StringBuilder): Unit = {
    val pad = "  " * depth
    val idx = inputIndex(p)

    def line(s: String): Unit = sb.append(pad).append(s).append('\n')
    def children(cs: Seq[LogicalPlan]): Unit =
      cs.foreach(render(_, nameOf, depth + 1, sb))

    // whole-subplan match first: a bare registered scan (possibly behind
    // view aliases the optimizer erased) is a LogicalTableScan
    nameOf(p) match {
      case Some(t) =>
        line(s"LogicalTableScan(table=[[main, $t]])")
        return
      case None =>
    }

    p match {
      // scan-pushdown folding: [Project(attrs)] over [Filter] over scan ->
      // BindableTableScan, the shape the reference's
      // ProjectTableScanRule/FilterTableScanRule emit
      case Project(exprs, child) if exprs.forall(_.isInstanceOf[AttributeReference]) &&
          bindableParts(child, nameOf).isDefined =>
        val (t, scan, filt) = bindableParts(child, nameOf).get
        val sIdx = scan.output.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
        val projects = exprs.map(e => sIdx(e.asInstanceOf[AttributeReference].exprId))
        val fStr = filt.map(f => s", filters=[[${rex(f, sIdx)}]]").getOrElse("")
        val aliases = exprs.map(_.name).mkString(", ")
        line(s"BindableTableScan(table=[[main, $t]]$fStr, " +
          s"projects=[[${projects.mkString(", ")}]], aliases=[[$aliases]])")
      case Filter(cond, child) if nameOf(child).isDefined =>
        val t = nameOf(child).get
        val sIdx = child.output.zipWithIndex.map { case (a, i) => a.exprId -> i }.toMap
        dropImpliedNullGuards(cond) match {
          case Some(f) => line(s"BindableTableScan(table=[[main, $t]], filters=[[${rex(f, sIdx)}]])")
          case None    => line(s"LogicalTableScan(table=[[main, $t]])")
        }

      case Project(exprs, child) =>
        val fields = exprs.map(e => s"${e.name}=[${rex(e, idx)}]").mkString(", ")
        line(s"LogicalProject($fields)")
        children(Seq(child))

      case Filter(cond, child) =>
        val shown = dropImpliedNullGuards(cond).getOrElse(Literal.TrueLiteral)
        line(s"LogicalFilter(condition=[${rex(shown, idx)}])")
        children(Seq(child))

      case j: Join =>
        val cond = j.condition.map(rex(_, idx)).getOrElse("true")
        line(s"LogicalJoin(condition=[$cond], joinType=[${joinTypeName(j.joinType)}])")
        children(Seq(j.left, j.right))

      case a: Aggregate =>
        val gIdx = a.child.output.zipWithIndex.map { case (x, i) => x.exprId -> i }.toMap
        val groups = a.groupingExpressions.collect {
          case ar: AttributeReference => gIdx.getOrElse(ar.exprId, -1)
        }
        val aggs = a.aggregateExpressions.collect {
          case al @ Alias(_: AggregateExpression, _) => s"${al.name}=[${rex(al.child, idx)}]"
          case al @ Alias(c, _) if c.exists(_.isInstanceOf[AggregateExpression]) =>
            s"${al.name}=[${rex(c, idx)}]"
        }
        val parts = s"group=[{${groups.mkString(", ")}}]" +: aggs
        line(s"LogicalAggregate(${parts.mkString(", ")})")
        children(Seq(a.child))

      // LIMIT folds into LogicalSort(fetch=[n]) in Calcite, with or
      // without sort keys
      case Limit(IntegerLiteral(n), s: Sort) =>
        val sIdx = inputIndex(s)
        val keys = s.order.zipWithIndex.map { case (o, i) =>
          s"sort$i=[${rex(o.child, sIdx)}], dir$i=[${dir(o)}]"
        }
        line(s"LogicalSort(${(keys :+ s"fetch=[$n]").mkString(", ")})")
        children(Seq(s.child))
      case Limit(IntegerLiteral(n), child) =>
        line(s"LogicalSort(fetch=[$n])")
        children(Seq(child))
      case s: Sort =>
        val keys = s.order.zipWithIndex.map { case (o, i) =>
          s"sort$i=[${rex(o.child, idx)}], dir$i=[${dir(o)}]"
        }
        line(s"LogicalSort(${keys.mkString(", ")})")
        children(Seq(s.child))

      case u: Union =>
        line("LogicalUnion(all=[true])")
        children(u.children)

      case _: OneRowRelation =>
        line("LogicalValues(tuples=[[{ 0 }]])")
      case l: LocalRelation =>
        line(s"LogicalValues(tuples=[[${l.data.size} rows]])")

      case leaf if leaf.children.isEmpty =>
        // unregistered scan (e.g. an ad-hoc path): show the node kind
        line(s"LogicalTableScan(table=[[main, ${leaf.nodeName}]])")

      case other =>
        // vocabulary gap (Window, Expand, ...): Calcite-style name, Spark
        // args with exprId noise stripped
        val args = other.argString(25).replaceAll("#\\d+", "")
        line(s"Logical${other.nodeName}($args)")
        children(other.children)
    }
  }

  /** child decomposes as [Filter over] registered scan -> (name, scan,
    * residual filter with null guards dropped). */
  private def bindableParts(child: LogicalPlan, nameOf: LogicalPlan => Option[String])
      : Option[(String, LogicalPlan, Option[Expression])] = child match {
    case scan if nameOf(scan).isDefined => Some((nameOf(scan).get, scan, None))
    case Filter(cond, scan) if nameOf(scan).isDefined =>
      Some((nameOf(scan).get, scan, dropImpliedNullGuards(cond)))
    case _ => None
  }
}

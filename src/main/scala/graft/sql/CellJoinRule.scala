package graft.sql

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType
import graft.expr.{CellOf, CellsAt, StContainsPoint, WkbEnvelope}

/** Optimizer rule rewriting brute-force spatial-predicate joins into
  * cell-keyed equi-joins (SURVEY.md §4 "optional Rule: auto-rewrite
  * st_intersects joins → cell joins" / §7.5 sql module).
  *
  * Pattern: an Inner/Cross join whose condition contains the conjunct
  * `st_contains_point(wkb, lon, lat)` with `wkb` from one side and
  * `lon`/`lat` from the other, and no cell key already present. Without
  * the rule Catalyst can only plan that as BroadcastNestedLoopJoin /
  * CartesianProduct — O(|points|·|polys|) comparisons. The rewrite:
  *
  *   points side  += __pip_cell = cell_of(lon, lat, L)
  *   polygon side += Generate(explode(cells_at(st_env(wkb), L)))
  *   join condition := (__pip_cell = __poly_cell) AND original
  *
  * which hashes instead of nesting — each (point, polygon) pair meets on
  * exactly ONE cell (the point's), so multiplicity is unchanged, and the
  * original exact predicate still refines. Output schema is restored by a
  * trailing Project. Level via `spark.gdalspark.cellJoinLevel` (default
  * 7). Idempotent: rewritten joins contain a CellOf conjunct and no
  * longer match.
  */
case class CellJoinRule(level: Int = 7) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner | Cross, Some(cond), hint) if eligible(j) =>
      val conjuncts = splitConjuncts(cond)
      val pip = conjuncts.collectFirst {
        case p @ StContainsPoint(w, lon, lat)
          if sidesSplit(j, w, Seq(lon, lat)).isDefined => p
      }.get
      val (polySide, pointSide) = sidesSplit(j, pip.first, Seq(pip.second, pip.third)).get

      // point side: project the cell key
      val pCellAlias = Alias(CellOf(pip.second, pip.third, Literal(level)), "__pip_cell")()
      val pointPlan = if (pointSide eq left) left else right
      val polyPlan = if (polySide eq left) left else right
      val pointProj = Project(pointPlan.output :+ pCellAlias, pointPlan)

      // polygon side: explode covering cells
      val gCellAttr = AttributeReference("__poly_cell", LongType, nullable = false)()
      val gen = Generate(
        ExplodeBase$Helper.explode(CellsAt(WkbEnvelope(pip.first), Literal(level))),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(gCellAttr), child = polyPlan)

      val cellEq = EqualTo(pCellAlias.toAttribute, gCellAttr)
      val (newLeft, newRight) =
        if (pointSide eq left) (pointProj: LogicalPlan, gen: LogicalPlan)
        else (gen: LogicalPlan, pointProj: LogicalPlan)
      val newJoin = Join(newLeft, newRight, Inner, Some(And(cellEq, cond)), hint)
      Project(j.output, newJoin)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConjuncts(a) ++ splitConjuncts(b)
    case other => Seq(other)
  }

  /** Returns (sideOfWkb, sideOfPoint) when the pip arguments split
    * cleanly across the two join children. */
  private def sidesSplit(j: Join, wkb: Expression,
                         pointArgs: Seq[Expression]): Option[(LogicalPlan, LogicalPlan)] = {
    val wRefs = wkb.references
    val pRefs = AttributeSet(pointArgs.flatMap(_.references))
    if (wRefs.isEmpty || pRefs.isEmpty) return None
    if (wRefs.subsetOf(j.left.outputSet) && pRefs.subsetOf(j.right.outputSet))
      Some((j.left, j.right))
    else if (wRefs.subsetOf(j.right.outputSet) && pRefs.subsetOf(j.left.outputSet))
      Some((j.right, j.left))
    else None
  }

  private def eligible(j: Join): Boolean = j.condition.exists { cond =>
    val cs = splitConjuncts(cond)
    // not already cell-keyed (idempotence + respect explicit cell joins)
    !cs.exists(c => c.exists { case _: CellOf | _: CellsAt => true; case _ => false }) &&
      cs.exists {
        case StContainsPoint(w, lon, lat) => sidesSplit(j, w, Seq(lon, lat)).isDefined
        case _ => false
      } &&
      // no usable equi-key already present (would hash-join anyway)
      !cs.exists {
        case EqualTo(a, b) =>
          (a.references.subsetOf(j.left.outputSet) && b.references.subsetOf(j.right.outputSet) &&
            a.references.nonEmpty && b.references.nonEmpty) ||
            (a.references.subsetOf(j.right.outputSet) && b.references.subsetOf(j.left.outputSet) &&
              a.references.nonEmpty && b.references.nonEmpty)
        case _ => false
      }
  }
}

/** Version-stable construction of the explode generator. */
private object ExplodeBase$Helper {
  def explode(child: Expression): Generator = Explode(child)
}

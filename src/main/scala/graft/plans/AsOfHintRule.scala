package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, IsNotNull, Literal}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, UnresolvedHint}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, StringType, TimestampNTZType, TimestampType}

/** SQL surface for the as-of join (SURVEY §2.H): the `ASOF` hint turns a
  * plain equi-join into [[AsOfJoinPlan]], so `spark.sql` users get the
  * operator without touching the DataFrame API — the closest Spark's
  * extension points allow to DuckDB's native `ASOF JOIN` syntax
  * (`injectParser` would have to re-implement the whole statement
  * grammar; a hint composes with the stock parser):
  *
  * {{{
  *   SELECT /*+ ASOF('ts', 'pts') */ e.event_id, p.p_value
  *   FROM errors e JOIN purchases p ON e.user_id = p.user_id
  *
  *   -- direction + tolerance (micros for timestamp columns):
  *   SELECT /*+ ASOF('ts', 'pts', 'nearest', 3600000000) */ ...
  * }}}
  *
  * Semantics mirror DuckDB's: the hint on a plain `JOIN` behaves as
  * `ASOF JOIN` (inner — left rows with no match drop, expressed as an
  * IsNotNull filter on the matched time), and on a `LEFT JOIN` as
  * `ASOF LEFT JOIN` (unmatched left rows survive with nulls — the
  * operator's native output). The equi-condition supplies the match
  * key(s): one equality joins on the bare attribute; a conjunction of
  * equalities packs into a struct key with [[AsOf.joinMulti]]'s null
  * semantics made relational (right rows with any null key field are
  * pre-filtered, because struct comparison would equate null fields —
  * see the rewrite's comment).
  *
  * Resolution-rule placement matters: injected rules run inside the
  * analyzer's fixed-point Resolution batch, BEFORE `RemoveAllHints`
  * would warn-and-drop an unrecognized hint — the rewrite waits for the
  * child subtree to resolve, then replaces the Join in place, keeping
  * the Join's own output attributes (so everything above re-resolves
  * untouched). Malformed usage fails loudly with the expected shape —
  * silently keeping the plain join would be a wrong-results bug.
  */
object AsOfHintRule extends Rule[LogicalPlan] {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(
      s"ASOF hint: $msg. Expected SELECT /*+ ASOF('<leftTime>', " +
        "'<rightTime>'[, '<backward|forward|nearest>'[, <toleranceLong>]]) */ " +
        "... FROM l [LEFT] JOIN r ON l.k = r.k")

  private def strParam(e: Expression): Option[String] = e match {
    case Literal(s, StringType) if s != null => Some(s.toString)
    case u: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(u.name)
    case _ => None
  }

  private def splitConj(e: Expression): Seq[Expression] = e match {
    case And(a, b) => splitConj(a) ++ splitConj(b)
    case x => Seq(x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case UnresolvedHint(name, params, child)
        if name.equalsIgnoreCase("ASOF") && child.resolved =>
      rewrite(params, child)
  }

  private def rewrite(params: Seq[Expression], child: LogicalPlan): LogicalPlan = {
    val (ltName, rtName) = params.take(2).flatMap(strParam) match {
      case Seq(a, b) => (a, b)
      case _ => fail("the first two arguments must name the left and right time columns")
    }
    val direction = params.lift(2).map(p => strParam(p).getOrElse(
      fail("direction must be a string"))).getOrElse("backward")
    def intLit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      // the parser yields UnaryMinus(Literal) for a negative literal —
      // fold it here so the >= 0 check sees the real value
      case org.apache.spark.sql.catalyst.expressions.UnaryMinus(inner, _) =>
        intLit(inner).map(v => -v)
      case _ => None
    }
    val tolerance = params.lift(3).map(p => intLit(p).getOrElse(
      fail(s"tolerance must be an integer literal, got $p")))
    // mirror AsOf.join's require — the hint path builds AsOfJoinPlan
    // directly, and a negative window would silently match nothing
    tolerance.filter(_ < 0).foreach(t => fail(s"tolerance must be >= 0, got $t"))
    val dir = try AsOfDirection.parse(direction) catch {
      case e: IllegalArgumentException => fail(e.getMessage)
    }
    val joins = child.collect { case j: Join => j }
    if (joins.size != 1)
      fail(s"the hinted query must contain exactly one JOIN, found ${joins.size}")
    val j = joins.head
    if (j.joinType != Inner && j.joinType != LeftOuter)
      fail(s"only JOIN (ASOF inner) and LEFT JOIN (ASOF LEFT) are supported, got ${j.joinType}")
    val cond = j.condition.getOrElse(
      fail("the JOIN needs an equi-condition naming the match key(s)"))
    val keyPairs = splitConj(cond).map {
      case EqualTo(a: Attribute, b: Attribute)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) => (a, b)
      case EqualTo(b: Attribute, a: Attribute)
          if j.left.outputSet.contains(a) && j.right.outputSet.contains(b) => (a, b)
      case other => fail(s"join condition must be a conjunction of column equalities, got $other")
    }
    def timeAttr(side: LogicalPlan, n: String, which: String): Attribute =
      side.output.find(a => conf.resolver(a.name, n)).getOrElse(
        fail(s"$which time column '$n' not in [${side.output.map(_.name).mkString(", ")}]"))
    val lt = timeAttr(j.left, ltName, "left")
    val rt = timeAttr(j.right, rtName, "right")
    def longBacked(dt: org.apache.spark.sql.types.DataType): Boolean =
      dt == TimestampType || dt == TimestampNTZType || dt == LongType
    if (!longBacked(lt.dataType))
      fail(s"left time '$ltName' must be Timestamp/TimestampNTZ/Long, got ${lt.dataType}")
    if (lt.dataType != rt.dataType)
      fail(s"time types must match exactly: '$ltName' is ${lt.dataType}, '$rtName' is ${rt.dataType}")
    keyPairs.foreach { case (a, b) =>
      if (!org.apache.spark.sql.types.DataType.equalsStructurally(
          a.dataType, b.dataType, ignoreNullability = true))
        fail(s"key types must match exactly: ${a.name} is ${a.dataType} vs ${b.dataType}")
    }
    // Composite keys pack into one struct per side — the same mechanism
    // AsOf.joinMulti uses — with its null routing expressed relationally:
    // the merge compares whole struct VALUES, under which two null fields
    // would compare EQUAL, so right rows with any null key field are
    // filtered out here (SQL multi-key semantics say they can never be
    // emitted); a left row with a null field then simply never finds a
    // candidate — surviving unmatched in the LEFT form, dropping in the
    // inner form — which is exactly the SQL behavior.
    val (lKey: Expression, rKey: Expression, rChild: LogicalPlan) =
      keyPairs match {
        case Seq((a, b)) => (a, b, j.right)
        case pairs =>
          import org.apache.spark.sql.catalyst.expressions.CreateNamedStruct
          def pack(attrs: Seq[Attribute]): Expression =
            CreateNamedStruct(attrs.zipWithIndex.flatMap { case (a, i) =>
              Seq(Literal(s"f$i"), a) })
          (pack(pairs.map(_._1)), pack(pairs.map(_._2)),
            Filter(pairs.map(p => IsNotNull(p._2): Expression).reduce(And),
              j.right))
      }
    val asof = AsOfJoinPlan(j.left, rChild, lKey, rKey, lt, rt, dir, tolerance)
    val rewritten: LogicalPlan =
      if (j.joinType == LeftOuter) asof
      // ASOF inner (DuckDB's bare ASOF JOIN): unmatched left rows drop —
      // the matched right time is null exactly when no row matched
      else Filter(IsNotNull(asof.output.find(_.exprId == rt.exprId).getOrElse(
        fail("internal: right time attribute lost in rewrite"))), asof)
    child.transformUp { case node if node eq j => rewritten }
  }
}

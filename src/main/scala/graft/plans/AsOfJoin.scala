package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftPlanBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode, JavaCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, CodegenSupport, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Match direction for the as-of join — pandas `merge_asof`'s surface.
  *
  *  - [[AsOfDirection.Backward]]: the LAST right row with time ≤ left time
  *    (the kdb/Flink temporal-join default).
  *  - [[AsOfDirection.Forward]]: the FIRST right row with time ≥ left time.
  *  - [[AsOfDirection.Nearest]]: whichever of the two is closer in time;
  *    exact-distance ties resolve backward (the earlier row), so the
  *    result is deterministic.
  */
sealed abstract class AsOfDirection(val name: String) extends Serializable
object AsOfDirection {
  case object Backward extends AsOfDirection("backward")
  case object Forward extends AsOfDirection("forward")
  case object Nearest extends AsOfDirection("nearest")
  def parse(s: String): AsOfDirection = s.toLowerCase match {
    case "backward" => Backward
    case "forward"  => Forward
    case "nearest"  => Nearest
    case other => throw new IllegalArgumentException(
      s"as-of direction must be backward|forward|nearest, got '$other'")
  }
}

/** As-of join as a first-class engine operator — the whole-operator tier
  * of the custom-Catalyst ladder (SURVEY §2.H): a logical node, a planner
  * strategy, and a physical sorted-merge operator, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`.
  *
  * Semantics (the kdb/pandas `asof` / Flink temporal-join staple Spark
  * lacks natively): for every LEFT row, append the right row with the
  * same key selected by `direction` (backward = last at-or-before,
  * forward = first at-or-after, nearest = closer of the two), optionally
  * bounded by `tolerance` (max |Δtime| in the time column's long unit —
  * microseconds for timestamps, inclusive, as in pandas); nulls when no
  * such row exists. e06 composes the same-table case from a union +
  * window; this operator serves the general two-table case without
  * materializing a merged stream: each side shuffles ONCE on its key
  * (co-partitioned by EnsureRequirements), sorts by (key, time) — both
  * properties the planner can satisfy for free from bucketed/sorted
  * tables — and the physical operator is a single forward merge pass per
  * partition: O(|L| + |R|), no window state, no per-row probe, no
  * right-side buffering beyond ONE row (the backward candidate; forward
  * and nearest additionally peek at — never buffer — the merge head).
  * At 100 TB that is the plan you want for "enrich every event with the
  * latest earlier dimension version": a dimension-versions table joined
  * as-of, never exploded or windowed over the fact stream.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    direction: AsOfDirection = AsOfDirection.Backward,
    tolerance: Option[Long] = None) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `injectPlannerStrategy` in [[graft.GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
    case _ => Nil
  }
}

/** Sorted-merge as-of join: children co-partitioned on their keys and
  * sorted by (key, time) — requirements EnsureRequirements satisfies
  * with at most one Exchange+Sort per side (zero when the source is
  * bucketed+sorted). The merge keeps exactly one candidate row of state.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    rightKey: Expression,
    leftTime: Expression,
    rightTime: Expression,
    direction: AsOfDirection,
    tolerance: Option[Long]) extends BinaryExecNode with CodegenSupport {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Both sides clustered on their key with an EXACT partition count:
    * doExecute zip-aligns partitions positionally, so the two shuffles
    * must stay identically partitioned. Pinning requiredNumPartitions
    * makes the exchanges non-coalescable — AQE's partition coalescing
    * (which may merge the two sides differently) never applies, the
    * alignment zipPartitions depends on is guaranteed by construction.
    *
    * Skew tradeoff (deliberate, documented): the pin also opts out of
    * AQE's skew-join splitting, so ONE pathologically hot key lands in
    * one partition — same worst case as any hash-partitioned merge join
    * on that key. AQE's own skew splitting could not help here even if
    * enabled: splitting a key's right side across tasks would break the
    * "last earlier row" scan, which needs the key's full right history
    * in one sorted run. The mitigations that actually work at 100 TB
    * are upstream of the operator and preserved by it: (a) raise
    * spark.sql.shuffle.partitions — the pin tracks it; (b) pre-reduce
    * the right side to the rows that can ever win (e.g. latest version
    * per (key, coarse time bucket)) before joining; (c) for a key so hot
    * it exceeds one task's memory/time budget, [[AsOf.joinSliced]] — the
    * implemented two-pass composition that re-keys on (key, time slice)
    * with per-slice boundary seeds; AsOfJoinSpec pins both that plain
    * correctness under 50%-skew is unaffected AND that joinSliced
    * spreads the hot key across partitions with identical results.
    */
  override def requiredChildDistribution: Seq[Distribution] = {
    val n = Some(conf.numShufflePartitions)
    ClusteredDistribution(leftKey :: Nil, requiredNumPartitions = n) ::
      ClusteredDistribution(rightKey :: Nil, requiredNumPartitions = n) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val allOut = output
    val (lk, rk, lt, rt) = (leftKey, rightKey, leftTime, rightTime)
    val dir = direction
    val tol = tolerance.getOrElse(Long.MaxValue)
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // projections/orderings are codegen'd per-partition (not serialized)
      val lKeyP = UnsafeProjection.create(Seq(lk), leftOut)
      val rKeyP = UnsafeProjection.create(Seq(rk), rightOut)
      val lTimeP = UnsafeProjection.create(Seq(lt), leftOut)
      val rTimeP = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lk.dataType))
      val resultP = UnsafeProjection.create(allOut, allOut)
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered
      // Backward candidate: the latest valid right row consumed, with its
      // key and time. The row must be copied (held across the merge); the
      // key copy is one 1-field UnsafeRow per CONSUMED right row, not per
      // comparison.
      var lastMatch: InternalRow = null
      var lastKey: InternalRow = null
      var lastTime = 0L
      // Merge-head cache: key/time of rBuf.head are projected ONCE per
      // head row, not once per comparison — the projection buffers stay
      // valid until the next projection call, which only happens after
      // the cached head is consumed.
      var headValid = false
      var headKey: InternalRow = null
      var headKeyNull = false
      var headTimeNull = false
      var headTime = 0L
      def refreshHead(): Unit = {
        headKey = rKeyP(rBuf.head)
        headKeyNull = headKey.isNullAt(0)
        val t = rTimeP(rBuf.head)
        headTimeNull = t.isNullAt(0)
        headTime = if (headTimeNull) 0L else t.getLong(0)
        headValid = true
      }
      // Forward mode consumes only strictly-earlier right rows, so a right
      // row at exactly the left time stays at the head as the match;
      // backward/nearest consume at-or-before (ties belong to backward).
      val strictBefore = dir == AsOfDirection.Forward
      lIter.map { lrow =>
        val lkRow = lKeyP(lrow)
        val lkNull = lkRow.isNullAt(0)
        val ltRow = lTimeP(lrow)
        val ltNull = ltRow.isNullAt(0)
        val lTime = if (ltNull) Long.MinValue else ltRow.getLong(0)
        var advance = rBuf.hasNext
        while (advance) {
          if (!headValid) refreshHead()
          val c = keyOrd.compare(headKey, lkRow)
          // NULL keys/times sort first; consume them so the merge keeps
          // moving, but never record them as a match (SQL equality and
          // the time bound are both false on NULL — DuckDB ASOF agrees)
          val timeOk = !ltNull &&
            (if (strictBefore) headTime < lTime else headTime <= lTime)
          if (c < 0 || (c == 0 && (headTimeNull || timeOk))) {
            val r = rBuf.next()
            // forward mode never reads the backward candidate — skip the copies
            if (!headKeyNull && !headTimeNull && !strictBefore) {
              lastMatch = r.copy()
              lastKey = headKey.copy()
              lastTime = headTime
            }
            headValid = false
            advance = rBuf.hasNext
          } else advance = false
        }
        val lValid = !lkNull && !ltNull
        val backOk = lValid && dir != AsOfDirection.Forward &&
          lastMatch != null && keyOrd.compare(lastKey, lkRow) == 0 &&
          lTime - lastTime <= tol
        // Forward candidate = the UNCONSUMED merge head (first same-key
        // row at-or-after lTime) — peeked, never buffered.
        val fwdOk = lValid && dir != AsOfDirection.Backward && rBuf.hasNext && {
          if (!headValid) refreshHead()
          !headKeyNull && !headTimeNull &&
            keyOrd.compare(headKey, lkRow) == 0 && headTime - lTime <= tol
        }
        val m =
          if (backOk && fwdOk) {
            // nearest: both in tolerance — closer wins, ties backward
            if (lTime - lastTime <= headTime - lTime) lastMatch else rBuf.head
          } else if (backOk) lastMatch
          else if (fwdOk) rBuf.head
          else nullRight
        // No defensive copy: SparkPlan iterators may reuse rows; buffering
        // consumers (sort, agg) copy on their side, like SortMergeJoinExec.
        resultP(joined(lrow, m))
      }
    }
  }

  // ── Whole-stage codegen (VERDICT r7 #6): the two-iterator merge in ──
  // produce/consume form, SortMergeJoinExec's recipe. The merge itself is
  // a codegen STAGE HEAD (both children feed through iterators — exactly
  // like SMJ, whose children also end their own codegen stages at the
  // required Sort), but everything DOWNSTREAM of the join now fuses:
  // project/filter/partial-aggregate over the joined rows run inside the
  // same generated loop instead of across an iterator boundary with a
  // JoinedRow + UnsafeProjection copy per row. Semantics are the
  // interpreted doExecute's, line for line: one candidate row of state
  // (copied on consume), head key/time cached per fetched head row (row
  // buffers may be reused by the shuffle reader, so the cache lives
  // exactly as long as the head row), null keys/times consumed but never
  // matched, forward consuming strictly-earlier rows only.
  // AsOfJoinSpec pins codegen-on ≡ codegen-off bit-for-bit and that the
  // operator actually plans inside a WholeStageCodegen span.

  override def inputRDDs(): Seq[RDD[InternalRow]] =
    left.execute() :: right.execute() :: Nil

  override def needCopyResult: Boolean = true

  /** Null-first three-way compare of two already-evaluated key values —
    * the codegen twin of doExecute's 1-field natural ascending ordering.
    */
  private def genNullFirstCompare(ctx: CodegenContext, c: String,
      aNull: String, a: String, bNull: String, b: String): String =
    s"""
      int $c;
      if ($aNull && $bNull) $c = 0;
      else if ($aNull) $c = -1;
      else if ($bNull) $c = 1;
      else $c = ${ctx.genComp(leftKey.dataType, a, b)};
    """

  protected override def doProduce(ctx: CodegenContext): String = {
    val leftInput = ctx.addMutableState("scala.collection.Iterator", "asofLeftInput",
      v => s"$v = inputs[0];")
    val rightInput = ctx.addMutableState("scala.collection.Iterator", "asofRightInput",
      v => s"$v = inputs[1];")
    val keyJava = CodeGenerator.javaType(leftKey.dataType)
    // merge state: the unconsumed head row + its cached key/time, and the
    // backward candidate (an owned copy) + its key/time
    val headRow = ctx.addMutableState("InternalRow", "asofHeadRow")
    val headValid = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofHeadValid")
    val headKey = ctx.addMutableState(keyJava, "asofHeadKey")
    val headKeyNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofHeadKeyNull")
    val headTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofHeadTime")
    val headTimeNull = ctx.addMutableState(CodeGenerator.JAVA_BOOLEAN, "asofHeadTimeNull")
    val lastMatch = ctx.addMutableState("InternalRow", "asofLastMatch")
    val lastKey = ctx.addMutableState(keyJava, "asofLastKey")
    val lastTime = ctx.addMutableState(CodeGenerator.JAVA_LONG, "asofLastTime")

    val leftRow = ctx.freshName("asofLeftRow")
    ctx.INPUT_ROW = leftRow
    ctx.currentVars = null
    val lkEv = BindReferences.bindReference(leftKey, left.output).genCode(ctx)
    val ltEv = BindReferences.bindReference(leftTime, left.output).genCode(ctx)
    // left output vars for consume() — evaluated from the left row
    val leftVars = left.output.zipWithIndex.map { case (a, i) =>
      BoundReference(i, a.dataType, a.nullable).genCode(ctx)
    }

    // head refresh: evaluate right key/time on the freshly fetched row
    val headTmp = ctx.freshName("asofHeadTmp")
    ctx.INPUT_ROW = headTmp
    val rkEv = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val rtEv = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val refreshHead =
      s"""
        InternalRow $headTmp = (InternalRow) $rightInput.next();
        $headRow = $headTmp;
        ${rkEv.code}
        $headKeyNull = ${rkEv.isNull};
        $headKey = ${rkEv.value};
        ${rtEv.code}
        $headTimeNull = ${rtEv.isNull};
        $headTime = ${rtEv.isNull} ? 0L : ${rtEv.value};
        $headValid = true;
      """

    // backward-candidate record: copy the consumed row (iterator buffers
    // are reused), then re-evaluate key/time ON THE COPY so the cached
    // values never alias a reused buffer (a UTF8String/struct key read
    // from the head row would)
    val lastTmp = ctx.freshName("asofLastTmp")
    ctx.INPUT_ROW = lastTmp
    val lkOnLast = BindReferences.bindReference(rightKey, right.output).genCode(ctx)
    val ltOnLast = BindReferences.bindReference(rightTime, right.output).genCode(ctx)
    val recordLast =
      s"""
        InternalRow $lastTmp = $headRow.copy();
        $lastMatch = $lastTmp;
        ${lkOnLast.code}
        $lastKey = ${lkOnLast.value};
        ${ltOnLast.code}
        $lastTime = ${ltOnLast.value};
      """

    // right output vars for consume(): nullable reads off the matched row
    val matched = ctx.freshName("asofMatched")
    val rightVars = right.output.zipWithIndex.map { case (a, i) =>
      val isNull = ctx.freshName("asofRIsNull")
      val value = ctx.freshName("asofRValue")
      val jt = CodeGenerator.javaType(a.dataType)
      val code =
        code"""
          boolean $isNull = $matched == null || $matched.isNullAt($i);
          $jt $value = $isNull ? ${CodeGenerator.defaultValue(a.dataType)} :
            (${CodeGenerator.getValue(matched, a.dataType, i.toString)});
        """
      ExprCode(code, JavaCode.isNullVariable(isNull),
        JavaCode.variable(value, a.dataType))
    }

    val (lt, lkNull, lk) = (ctx.freshName("asofLt"), lkEv.isNull, lkEv.value)
    val (cAdv, cBack, cFwd) = (ctx.freshName("asofCmpAdv"),
      ctx.freshName("asofCmpBack"), ctx.freshName("asofCmpFwd"))
    val advance = ctx.freshName("asofAdvance")
    val (lValid, backOk, fwdOk) = (ctx.freshName("asofLValid"),
      ctx.freshName("asofBackOk"), ctx.freshName("asofFwdOk"))
    val timeOk = ctx.freshName("asofTimeOk")
    val strict = direction == AsOfDirection.Forward
    val tol = tolerance.getOrElse(Long.MaxValue)
    val headCmp = if (strict) "<" else "<="

    s"""
      while ($leftInput.hasNext()) {
        InternalRow $leftRow = (InternalRow) $leftInput.next();
        ${lkEv.code}
        ${ltEv.code}
        long $lt = ${ltEv.isNull} ? Long.MIN_VALUE : ${ltEv.value};
        boolean $advance = $headValid || $rightInput.hasNext();
        while ($advance) {
          if (!$headValid) {
            $refreshHead
          }
          ${genNullFirstCompare(ctx, cAdv, headKeyNull, headKey, lkNull.toString, lk.toString)}
          boolean $timeOk = !${ltEv.isNull} && ($headTime $headCmp $lt);
          if ($cAdv < 0 || ($cAdv == 0 && ($headTimeNull || $timeOk))) {
            ${if (!strict) s"if (!$headKeyNull && !$headTimeNull) { $recordLast }" else ""}
            $headValid = false;
            $advance = $rightInput.hasNext();
          } else {
            $advance = false;
          }
        }
        boolean $lValid = !$lkNull && !${ltEv.isNull};
        boolean $backOk = false;
        ${if (direction != AsOfDirection.Forward)
          s"""if ($lValid && $lastMatch != null) {
            ${genNullFirstCompare(ctx, cBack, "false", lastKey, lkNull.toString, lk.toString)}
            $backOk = $cBack == 0 && ($lt - $lastTime) <= ${tol}L;
          }""" else ""}
        boolean $fwdOk = false;
        ${if (direction != AsOfDirection.Backward)
          s"""if ($lValid && $headValid && !$headKeyNull && !$headTimeNull) {
            ${genNullFirstCompare(ctx, cFwd, "false", headKey, lkNull.toString, lk.toString)}
            $fwdOk = $cFwd == 0 && ($headTime - $lt) <= ${tol}L;
          }""" else ""}
        InternalRow $matched = null;
        if ($backOk && $fwdOk) {
          $matched = (($lt - $lastTime) <= ($headTime - $lt)) ? $lastMatch : $headRow;
        } else if ($backOk) {
          $matched = $lastMatch;
        } else if ($fwdOk) {
          $matched = $headRow;
        }
        ${leftVars.map(_.code.toString).mkString("\n")}
        ${rightVars.map(_.code.toString).mkString("\n")}
        ${consume(ctx, (leftVars ++ rightVars).map(_.copy(code =
          org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock)))}
        if (shouldStop()) return;
      }
    """
  }
}

/** DataFrame-level API: `AsOf.join(facts, versions, "user_id", "ts", "ts")`,
  * optionally with `direction` (backward|forward|nearest) and `tolerance`
  * (max |Δtime| in the time column's long unit — micros for timestamps,
  * inclusive). Columns are resolved by NAME against each side's analyzed
  * plan, so the operator composes with any upstream DataFrame lineage.
  *
  * Custom logical nodes bypass the analyzer's implicit-cast coercion, so
  * the types that a built-in join would silently reconcile are validated
  * here instead: key types must match exactly (an int-vs-long mismatch
  * would hash to different partitions AND compare through the left-typed
  * ordering — silently wrong), and both time columns must be long-backed
  * (Timestamp/TimestampNTZ/Long — the merge reads epoch micros via
  * getLong) and of the same type.
  */
object AsOf {
  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String): DataFrame =
    join(left, right, key, leftTime, rightTime, "backward", None)

  def join(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           direction: String, tolerance: Option[Long]): DataFrame = {
    val dir = AsOfDirection.parse(direction)
    tolerance.foreach(t => require(t >= 0, s"as-of tolerance must be >= 0, got $t"))
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lPlan = left.queryExecution.analyzed
    val rPlan0 = right.queryExecution.analyzed
    // Both sides may share lineage (e.g. two filters of one table), which
    // means shared attribute exprIds — the analyzer's DeduplicateRelations
    // fixes that for built-in Join nodes only. Re-alias the right side
    // with fresh exprIds so the custom node's sides are always disjoint.
    val rPlan = org.apache.spark.sql.catalyst.plans.logical.Project(
      rPlan0.output.map(a =>
        org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()), rPlan0)
    val (lkA, rkA) = (attr(lPlan, key), attr(rPlan, key))
    val (ltA, rtA) = (attr(lPlan, leftTime), attr(rPlan, rightTime))
    def longBacked(dt: DataType): Boolean =
      dt == TimestampType || dt == TimestampNTZType || dt == LongType
    // nullability-insensitive (two sides of a real pipeline rarely agree
    // on it) but otherwise EXACT — int-vs-long etc. stays an error
    require(org.apache.spark.sql.types.DataType.equalsStructurally(
        lkA.dataType, rkA.dataType, ignoreNullability = true),
      s"as-of key types must match exactly: left $key is ${lkA.dataType}, " +
        s"right $key is ${rkA.dataType} (cast explicitly before joining)")
    require(longBacked(ltA.dataType),
      s"as-of left time $leftTime must be Timestamp/TimestampNTZ/Long, got ${ltA.dataType}")
    require(ltA.dataType == rtA.dataType,
      s"as-of time types must match exactly: left $leftTime is ${ltA.dataType}, " +
        s"right $rightTime is ${rtA.dataType} (cast explicitly before joining)")
    GraftPlanBridge.ofRows(left.sparkSession,
      AsOfJoinPlan(lPlan, rPlan, lkA, rkA, ltA, rtA, dir, tolerance))
  }

  /** RUNTIME-BLOOM-PREFILTERED as-of join — [[join]] with the dimension
    * (right) side pre-filtered by a Bloom filter built over the LEFT
    * side's keys at runtime, the same plan shape Spark's own
    * `InjectRuntimeFilter` produces for equi-joins (which it will never
    * produce here: the optimizer rule only fires on `Join` nodes, so a
    * custom logical operator has to inject its own runtime filter):
    *
    * {{{ Filter(might_contain(scalar-subquery(bloom_agg(xxhash64(lk))),
    *            xxhash64(rk)), right) }}}
    *
    * Why it matters at 100 TB: the dimension HISTORY table (every version
    * of every key, ever) is routinely orders of magnitude wider in key
    * space than one day's facts. Without the filter, all of it shuffles
    * into the merge and sorts, only for the unmatched keys' runs to be
    * scanned past. With it, the right scan drops non-fact keys BEFORE its
    * exchange — the shuffle/sort shrinks by the key-selectivity factor,
    * at the cost of one extra pass over the (already filtered, usually
    * far smaller) left side's key column.
    *
    * Correctness is unconditional: `might_contain` has NO false
    * negatives, so every right row that could ever win its key's merge
    * survives; false positives merely shuffle a few extra rows that then
    * match nothing. e36 gates this cross-engine on the same DuckDB ASOF
    * oracle shape as e31 — the filtered operator must produce the
    * bit-identical join result.
    */
  def joinKeyFiltered(left: DataFrame, right: DataFrame, key: String,
                      leftTime: String, rightTime: String,
                      direction: String = "backward",
                      tolerance: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, And, IsNotNull, ScalarSubquery, XxHash64, BloomFilterMightContain}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Filter, Project}
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    val (lkA, rkA) = (attr(lPlan, key), attr(rPlan, key))
    // bloom over xxhash64(left key): InjectRuntimeFilter's exact recipe —
    // the aggregate runs as an uncorrelated scalar subquery, its binary
    // result feeds might_contain against the right side's hashed key.
    // XxHash64 never returns NULL (a null child hashes to the seed), so
    // NULL right keys would PASS might_contain and shuffle into one hot
    // merge partition without ever matching — the explicit IsNotNull
    // drops them at the scan, where the merge semantics already say they
    // can never be emitted.
    val bloomAgg = Aggregate(Nil,
      Seq(Alias(new BloomFilterAggregate(new XxHash64(Seq(lkA)))
        .toAggregateExpression(), "graft_asof_bf")()),
      Project(Seq(lkA), lPlan))
    val rFiltered = GraftPlanBridge.ofRows(left.sparkSession,
      Filter(And(IsNotNull(rkA),
        BloomFilterMightContain(ScalarSubquery(bloomAgg), new XxHash64(Seq(rkA)))),
        rPlan))
    // all validation (key/time types, tolerance, direction parse) and the
    // shared-lineage re-alias live in join() — ONE copy of the
    // preconditions governs both entry points
    join(left, rFiltered, key, leftTime, rightTime, direction, tolerance)
  }

  /** COMPOSITE-KEY as-of join — the production shape where the match key
    * is (tenant, user) or (symbol, venue): the keys pack into one struct
    * column (the same composite-key mechanism [[joinSliced]] uses for its
    * slice re-keying; the merge's hash partitioning and natural ordering
    * both handle struct keys), and SQL multi-key NULL semantics are
    * preserved explicitly — a NULL in ANY key field never matches, which
    * the struct comparison alone would not guarantee: right rows with a
    * null field drop (never emittable), left rows bypass the join and
    * surface unmatched.
    */
  def joinMulti(left: DataFrame, right: DataFrame, keys: Seq[String],
                leftTime: String, rightTime: String,
                direction: String = "backward",
                tolerance: Option[Long] = None): DataFrame = {
    require(keys.nonEmpty, "as-of join needs at least one key column")
    if (keys.size == 1)
      return join(left, right, keys.head, leftTime, rightTime, direction, tolerance)
    // functions._ exports `left`/`right` — hold the params first
    val (lDf, rDf) = (left, right)
    import org.apache.spark.sql.functions._
    def anyNull(timeCol: String) =
      keys.map(col(_).isNull).reduce(_ || _) || col(timeCol).isNull
    def mk = struct(keys.map(col): _*)
    val lAll = lDf.withColumn("__k", mk)
    val l2 = lAll.filter(!anyNull(leftTime))
    val lNull = lAll.filter(anyNull(leftTime))
    val r2 = rDf.filter(!anyNull(rightTime)).withColumn("__k", mk)
    val joined = join(l2, r2, "__k", leftTime, rightTime, direction, tolerance)
      .toDF((lAll.columns ++ r2.columns.map("r_" + _)).toIndexedSeq: _*)
      .drop("__k", "r___k")
    val nullOut = lNull.drop("__k")
      .select(col("*") +:
        rDf.schema.fields.map(f =>
          lit(null).cast(f.dataType).as("r_" + f.name)).toIndexedSeq: _*)
    joined.unionByName(nullOut)
  }

  /** HOT-KEY-SAFE as-of join: the two-pass time-sliced composition the
    * [[AsOfJoinExec]] Scaladoc prescribes for a key too hot for one task.
    * The join key becomes (key, floor(time / sliceUs)), so a hot key's
    * rows spread across up to ⌈span/sliceUs⌉ partitions instead of one;
    * semantics are restored by SEEDING each slice with the rows that can
    * reach across its boundary:
    *
    *  - backward/nearest: the latest right row from any EARLIER slice
    *    (the reigning match for left rows before their slice's first
    *    in-slice right row);
    *  - forward/nearest: the earliest right row from any LATER slice.
    *
    * Seed construction never touches the hot key's full row set in one
    * task: the per-(key, slice) boundary rows come from a window
    * PARTITIONED BY (key, slice) — already spread — and the cross-slice
    * propagation runs on the boundary frame (≤ |keys|×|slices| rows).
    * Each left slice gains at most one seed per needed direction, so the
    * union grows the right side by ≤ 2·|keys|×|slices| rows.
    *
    * Equivalence with [[join]] is exact for backward and forward, and
    * for nearest whenever matched times are unambiguous (exact-tie right
    * rows may swap which equal-distance row is reported — same
    * tie-dependence the unsliced merge has); AsOfJoinSpec pins parity on
    * a planted 50%-skew corpus for all three directions plus tolerance,
    * and that the hot key's output actually spans multiple partitions.
    */
  def joinSliced(left: DataFrame, right: DataFrame, key: String,
                 leftTime: String, rightTime: String,
                 direction: String, tolerance: Option[Long],
                 sliceUs: Long): DataFrame = {
    require(sliceUs > 0, s"sliceUs must be positive, got $sliceUs")
    val dir = AsOfDirection.parse(direction)
    // functions._ exports `left`/`right` — hold the params first
    val (lDf, rDf) = (left, right)
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._

    def us(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
      if (dt == LongType) c else unix_micros(c)
    val ltType = lDf.schema(leftTime).dataType
    val rtType = rDf.schema(rightTime).dataType

    // NULL keys/times never match in the unsliced operator; the struct
    // key would instead GROUP them, so: null right rows drop (they can
    // never be emitted), null left rows bypass the join and re-enter the
    // output with null right columns.
    val lAll = lDf
      .withColumn("__slice", floor(us(col(leftTime), ltType) / sliceUs))
      .withColumn("__k", struct(col(key).as("k"), col("__slice").as("s")))
    val l2 = lAll.filter(col(key).isNotNull && col(leftTime).isNotNull)
    val lNull = lAll.filter(col(key).isNull || col(leftTime).isNull)
    val r1 = rDf
      .filter(col(key).isNotNull && col(rightTime).isNotNull)
      .withColumn("__slice", floor(us(col(rightTime), rtType) / sliceUs))

    // per-(key, slice) boundary rows — window partitioned by the SLICED
    // key, so the hot key is already spread here
    def boundary(desc: Boolean): DataFrame = {
      val ord = if (desc) col(rightTime).desc else col(rightTime).asc
      val w = Window.partitionBy(col(key), col("__slice")).orderBy(ord)
      r1.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .drop("__rn")
    }
    // left slices that need seeding (≤ |keys|×|slices| rows)
    val targets = l2.select(col(key).as("__tk"), col("__slice").as("__ts")).distinct()

    // seed = the single boundary row from the nearest earlier (or later)
    // slice, per target slice: a boundary×target equality join on the key
    // (both frames slice-bounded), then keep the closest slice
    def seeds(earlier: Boolean): DataFrame = {
      val b = boundary(desc = earlier)
      val cond = col(key) === col("__tk") &&
        (if (earlier) col("__slice") < col("__ts") else col("__slice") > col("__ts"))
      val ord =
        if (earlier) Seq(col("__slice").desc, col(rightTime).desc)
        else Seq(col("__slice").asc, col(rightTime).asc)
      val w = Window.partitionBy(col("__tk"), col("__ts")).orderBy(ord: _*)
      b.join(targets, cond)
        .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        .select((rDf.columns.map(col) :+
          col("__ts").as("__slice")).toIndexedSeq: _*)
    }
    val needBack = dir != AsOfDirection.Forward
    val needFwd = dir != AsOfDirection.Backward
    val rSeeded = Seq(
      Some(r1.select((rDf.columns.map(col) :+ col("__slice")).toIndexedSeq: _*)),
      if (needBack) Some(seeds(earlier = true)) else None,
      if (needFwd) Some(seeds(earlier = false)) else None
    ).flatten.reduce(_ unionByName _)
      .withColumn("__k", struct(col(key).as("k"), col("__slice").as("s")))

    val joined = join(l2, rSeeded, "__k", leftTime, rightTime, direction, tolerance)
      .toDF((l2.columns ++ rSeeded.columns.map("r_" + _)).toIndexedSeq: _*)
      .drop("__slice", "__k", "r___slice", "r___k")
    val nullOut = lNull.drop("__slice", "__k")
      .select(col("*") +:
        rDf.schema.fields.map(f =>
          lit(null).cast(f.dataType).as("r_" + f.name)).toIndexedSeq: _*)
    joined.unionByName(nullOut)
  }

  /** SKEW-AUTO-ROUTED as-of join: [[join]] that measures its own key
    * distribution and re-plans through [[joinSliced]] when a key is too
    * hot for one task — the user no longer has to KNOW their key is hot
    * (BinnedRangeJoinRule's precedent: plan the scale-safe form from the
    * naive spelling).
    *
    * The probe is one aggregation over ONLY the (key, time) columns of
    * both sides: per-key counts are map-side combined (the shuffle
    * carries ≤ |distinct keys| rows per map task, never corpus rows),
    * then reduced to FOUR numbers — max key count, total rows, min/max
    * time — collected to the driver. That is metadata collection, not a
    * driver-side loop; at 100 TB it costs one column-pruned scan, which
    * is the price of not discovering the hot key when task 17 of the
    * merge runs for nine hours.
    *
    * MEASURED probe overhead (SCALING.md §7, uniform corpus where the
    * probe buys nothing: joinAuto minus plain [[join]] on local[32]):
    * ≈0.1 s at sf0.01–0.1, ≈0.27 s at sf1 (1M events), ≈1.1 s at sf10
    * (10M events) — scan-proportional, ~0.6× the join itself at local
    * SFs because the join is also scan-bound there; the probe's SHUFFLE
    * stays ≤ |distinct keys| rows at any scale. Callers who already
    * know their key distribution skip the tax by calling [[join]] or
    * [[joinSliced]] directly; joinAuto is for the pipeline that cannot
    * know (e40's contract).
    *
    * Routing: a key is hot when its combined row count exceeds
    * `skewFactor` × the mean per-partition share (the same "N× the
    * average" shape AQE's skew-join detector uses). Hot → [[joinSliced]]
    * with the slice width chosen so the hot key splits into
    * ⌈maxCnt / threshold⌉ time slices across the measured span; not hot
    * (or a degenerate zero span, where slicing cannot spread anything)
    * → the plain merge. Both paths emit the SAME schema — left columns
    * plus `r_`-prefixed right columns — so callers never see which plan
    * ran; parity with [[join]] on every path is pinned in AsOfJoinSpec.
    */
  def joinAuto(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String,
               direction: String = "backward",
               tolerance: Option[Long] = None,
               skewFactor: Double = 4.0): DataFrame = {
    require(skewFactor > 0, s"skewFactor must be positive, got $skewFactor")
    val (lDf, rDf) = (left, right)
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.functions._
    def us(c: Column, dt: DataType): Column =
      if (dt == LongType) c else unix_micros(c)
    val lt = us(col(leftTime), lDf.schema(leftTime).dataType)
    val rt = us(col(rightTime), rDf.schema(rightTime).dataType)
    val probe = lDf.select(col(key).as("__pk"), lt.as("__pt"))
      .unionByName(rDf.select(col(key).as("__pk"), rt.as("__pt")))
      .filter(col("__pk").isNotNull && col("__pt").isNotNull)
      .groupBy(col("__pk"))
      .agg(count(lit(1)).as("__c"), min("__pt").as("__mn"), max("__pt").as("__mx"))
      .agg(max("__c"), sum("__c"), min("__mn"), max("__mx"))
      .collect()(0)
    val plainRenamed = () =>
      join(lDf, rDf, key, leftTime, rightTime, direction, tolerance)
        .toDF((lDf.columns ++ rDf.columns.map("r_" + _)).toIndexedSeq: _*)
    if (probe.isNullAt(0)) return plainRenamed() // no non-null keys at all
    val (maxCnt, total) = (probe.getLong(0), probe.getLong(1))
    val (tMin, tMax) = (probe.getLong(2), probe.getLong(3))
    val partitions = lDf.sparkSession.conf
      .get("spark.sql.shuffle.partitions").toInt
    val threshold = math.max(1L,
      math.ceil(total.toDouble / partitions * skewFactor).toLong)
    val span = tMax - tMin
    if (maxCnt <= threshold || span <= 0) plainRenamed()
    else {
      val slices = math.min(maxCnt / threshold + 1, 100000L)
      val sliceUs = math.max(1L, span / slices + 1)
      joinSliced(lDf, rDf, key, leftTime, rightTime, direction, tolerance, sliceUs)
    }
  }
}

package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.PlanGlue

/** Native AS-OF join: the whole-operator tier of the extension ladder
  * (custom `LogicalPlan` + `Strategy` + physical `SparkPlan`, registered
  * through `SparkSessionExtensions` / `experimental.extraStrategies`).
  *
  * Semantics (backward as-of, the time-series staple the reference's
  * ORDER-BY-(logdate,logdatetime) store exists to serve — R11/R13,
  * `/root/reference/nginx.click:1`): for every left row, attach the single
  * right row with equal keys and the greatest `rightTime <= leftTime`;
  * left rows with no match null-extend (left-outer shape). `rightTie`
  * breaks equal-time ties deterministically (last in ascending tie order
  * wins, i.e. the maximum).
  *
  * Why a custom operator instead of the join+window composition
  * (`q_join_asof`): the composed form materializes EVERY (error, earlier
  * purchase) pair before row_number picks one — per-key quadratic. A hot
  * key with 10k rows a side is 10^8 intermediate rows at 100 TB. This
  * operator instead declares SMJ-style requirements — co-partition both
  * sides on the keys, sort each partition by (keys, time) — and merges the
  * two sorted streams in ONE O(n+m) pass per partition, carrying only a
  * single candidate row of state. Same two shuffles as the composed form's
  * first join, no pair blowup, no second window sort.
  */
case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                    leftTime: Expression, rightTime: Expression,
                    rightTie: Seq[Expression],
                    toleranceUs: Option[Long] = None) extends BinaryNode {
  // right side null-extends on misses, so its attributes go nullable
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans the logical [[AsOfJoin]] 1:1 onto [[AsOfJoinExec]]. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, rk, lt, rt, tie, tol) =>
      AsOfJoinExec(lk, rk, lt, rt, tie, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Sort-merge as-of join.
  *
  * Declared requirements do the heavy lifting: `requiredChildDistribution`
  * co-partitions both sides on the join keys (EnsureRequirements inserts
  * compatible hash exchanges exactly as for SortMergeJoin — AQE and reused
  * exchanges apply as usual) and `requiredChildOrdering` sorts each
  * partition by (keys, time[, tie]). The merge itself is then a single
  * forward pass: for each left row in (key, time) order, absorb right rows
  * with the same key and `rightTime <= leftTime` — the last absorbed row IS
  * the as-of match (greatest time, ties broken by the trailing sort
  * columns) — and emit. One candidate row of state per partition, never a
  * pair set.
  */
case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
                        leftTime: Expression, rightTime: Expression,
                        rightTie: Seq[Expression], toleranceUs: Option[Long],
                        left: SparkPlan, right: SparkPlan)
  extends BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match pairwise")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time column types must match")
  require(toleranceUs.isEmpty || (leftTime.dataType
      .isInstanceOf[org.apache.spark.sql.types.TimestampType] ||
      leftTime.dataType == org.apache.spark.sql.types.LongType),
    "tolerance requires timestamp (or long-µs) time columns")
  // Catalyst's NormalizeFloatingNumbers only rewrites keys of operators it
  // knows (Join/Aggregate/Window); raw float keys here would make
  // -0.0 != 0.0 and NaN-bit-pattern mismatches silently null-extend.
  // As-of keys are identifiers — reject the floating types outright.
  require(!leftKeys.exists(k =>
      k.dataType == org.apache.spark.sql.types.FloatType ||
      k.dataType == org.apache.spark.sql.types.DoubleType),
    "floating-point as-of join keys are not supported (-0.0/NaN equality " +
      "diverges from SQL join semantics); cast to a non-floating type")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    ((rightKeys :+ rightTime) ++ rightTie).map(SortOrder(_, Ascending)))

  // rows stream out in the left child's partitions and (key, time) order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val rightWidth = right.output.size
    val boundLt = BindReferences.bindReference(leftTime, left.output)
    val boundRt = BindReferences.bindReference(rightTime, right.output)
    val lKeysB = leftKeys.map(BindReferences.bindReference(_, left.output))
    val rKeysB = rightKeys.map(BindReferences.bindReference(_, right.output))
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lKeysB)
      val rKeyProj = UnsafeProjection.create(rKeysB)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = TypeUtils.getInterpretedOrdering(timeType)
      val result = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)

      // current right head (not yet absorbed, key projected once per
      // advance — the projection buffer is reused, never held) and the
      // per-key candidate
      var rHead: InternalRow = null
      var rKey: InternalRow = null
      def advanceR(): Unit = {
        rHead = if (rIter.hasNext) rIter.next() else null
        rKey = if (rHead == null) null else rKeyProj(rHead)
      }
      advanceR()
      // SQL null-key semantics: null keys never match. NULLS FIRST ordering
      // puts them at the front of the right stream — drop them once here.
      while (rHead != null && rKey.anyNull) advanceR()
      var candKey: InternalRow = null
      var cand: InternalRow = null

      lIter.map { lRow =>
        val lk = lKeyProj(lRow)
        if (lk.anyNull) {
          // null-keyed left rows (sorted first) match nothing
          result(joined(lRow, nullRight))
        } else {
          if (candKey == null || keyOrd.compare(candKey, lk) != 0) {
            cand = null
            candKey = lk.copy()
            // skip right keys below the new left key
            while (rHead != null && keyOrd.compare(rKey, lk) < 0) advanceR()
          }
          val lt = boundLt.eval(lRow)
          if (lt != null) {
            // absorb all same-key right rows at or before the left time;
            // the LAST one absorbed is the match (max time, max tie)
            var advance = true
            while (advance && rHead != null && keyOrd.compare(rKey, lk) == 0) {
              val rt = boundRt.eval(rHead)
              if (rt != null && timeOrd.lteq(rt, lt)) {
                cand = rHead.copy(); advanceR()
              } else if (rt == null) advanceR() // null times match nothing
              else advance = false
            }
          }
          // tolerance = bounded lookback: the candidate (max rtime <= lt)
          // must also sit within [lt - tol, lt]; timestamps eval as Long µs
          val inTol = cand != null && lt != null && (toleranceUs match {
            case None => true
            case Some(tol) =>
              boundRt.eval(cand).asInstanceOf[Long] >=
                lt.asInstanceOf[Long] - tol
          })
          result(joined(lRow, if (inTol) cand else nullRight))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Library surface for the native as-of join. */
object AsOf {

  /** Registers the planner strategy and the pushdown/pruning optimizer
    * rules on a live session (idempotent); the declarative deployment path
    * is `spark.sql.extensions=graft.GraftExtensions`.
    */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    PlanGlue.addStrategy(spark, AsOfJoinStrategy)
    PlanGlue.addOptimization(spark, AsOfRules.PushThroughAsOf)
    PlanGlue.addOptimization(spark, AsOfRules.PruneThroughAsOf)
    // SQL reach: the graft_asof_join + graft_salted_join table-valued
    // functions (idempotent create-or-replace, same registry the
    // declarative path populates)
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      AsOfSql.name, AsOfSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      SkewSql.name, SkewSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      AnnSql.name, AnnSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      NearDupSql.name, NearDupSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      ProfileSql.name, ProfileSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      SnapshotSql.name, SnapshotSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      SnapshotWhereSql.name, SnapshotWhereSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      CountSql.name, CountSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MinMaxSql.name, MinMaxSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      ChangesSql.name, ChangesSql.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Compact.name, MaintenanceSql.Compact.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Rollback.name, MaintenanceSql.Rollback.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Expire.name, MaintenanceSql.Expire.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Rename.name, MaintenanceSql.Rename.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DropColumn.name, MaintenanceSql.DropColumn.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Retype.name, MaintenanceSql.Retype.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Merge.name, MaintenanceSql.Merge.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Append.name, MaintenanceSql.Append.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Delete.name, MaintenanceSql.Delete.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Update.name, MaintenanceSql.Update.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DeleteMor.name, MaintenanceSql.DeleteMor.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.UpdateMor.name, MaintenanceSql.UpdateMor.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.MaterializeDvs.name,
      MaintenanceSql.MaterializeDvs.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DeclareZorder.name,
      MaintenanceSql.DeclareZorder.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.MergeInto.name,
      MaintenanceSql.MergeInto.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.MergeIntoMor.name,
      MaintenanceSql.MergeIntoMor.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.EvolvePartition.name,
      MaintenanceSql.EvolvePartition.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Fsck.name, MaintenanceSql.Fsck.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DeleteBranchMor.name,
      MaintenanceSql.DeleteBranchMor.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.UpdateBranchMor.name,
      MaintenanceSql.UpdateBranchMor.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DeleteBranch.name, MaintenanceSql.DeleteBranch.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.UpdateBranch.name, MaintenanceSql.UpdateBranch.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DeclareSort.name, MaintenanceSql.DeclareSort.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.AddConstraint.name, MaintenanceSql.AddConstraint.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DropConstraint.name,
      MaintenanceSql.DropConstraint.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.BackfillStats.name,
      MaintenanceSql.BackfillStats.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Tag.name, MaintenanceSql.Tag.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DropTag.name, MaintenanceSql.DropTag.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.Branch.name, MaintenanceSql.Branch.builder, "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.AppendBranch.name, MaintenanceSql.AppendBranch.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.MergeBranch.name, MaintenanceSql.MergeBranch.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.PublishBranch.name, MaintenanceSql.PublishBranch.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.DropBranch.name, MaintenanceSql.DropBranch.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.RebaseBranch.name, MaintenanceSql.RebaseBranch.builder,
      "scala_udf")
    spark.sessionState.tableFunctionRegistry.createOrReplaceTempFunction(
      MaintenanceSql.ExpireBranches.name,
      MaintenanceSql.ExpireBranches.builder, "scala_udf")
  }

  /** Parses a tolerance interval string (e.g. "30 minutes") to microseconds,
    * rejecting calendar months (ambiguous duration). */
  def parseToleranceUs(t: String): Long = {
    val iv = org.apache.spark.sql.catalyst.util.IntervalUtils
      .stringToInterval(org.apache.spark.unsafe.types.UTF8String.fromString(t))
    require(iv.months == 0, s"calendar-month tolerance is ambiguous: $t")
    iv.days * 86400000000L + iv.microseconds
  }

  /** Backward as-of join of `left` to `right`: for each left row, the right
    * row with equal `keys` and the greatest `rightTime <= leftTime`
    * (ties broken by greatest `tie`), null-extended when none exists.
    *
    * Columns are named, not expressions (project first for computed keys —
    * the `dropDuplicates`/using-column convention): the node is built
    * RESOLVED against both analyzed children, which keeps a custom operator
    * independent of the analyzer's per-operator column-resolution rules.
    * Column sets must be disjoint (alias before joining, as with any
    * self-join).
    */
  /** `tolerance` bounds the lookback (à la pandas `merge_asof`): a match
    * must satisfy `leftTime - tolerance <= rightTime <= leftTime`.
    * Timestamp time columns only; e.g. `tolerance = Some("30 minutes")`.
    *
    * `direction = "forward"` flips the match to the EARLIEST right at or
    * after the left time (`leftTime <= rightTime <= leftTime + tolerance`),
    * ties still broken by greatest `tie`. Implemented by running the same
    * backward merge over negated epoch-µs times — no second exec path to
    * keep correct.
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           tie: Seq[String] = Nil,
           tolerance: Option[String] = None,
           direction: String = "backward"): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    direction match {
      case "backward" =>
        PlanGlue.ofRows(spark,
          plan(left, right, leftKeys, rightKeys, leftTime, rightTime, tie,
            tolerance))
      case "forward" =>
        import org.apache.spark.sql.functions.{col, expr}
        val (ln, rn) = ("__graft_asof_neg_lt", "__graft_asof_neg_rt")
        val l2 = left.withColumn(ln, expr(s"-unix_micros(`$leftTime`)"))
        val r2 = right.withColumn(rn, expr(s"-unix_micros(`$rightTime`)"))
        PlanGlue.ofRows(spark,
          plan(l2, r2, leftKeys, rightKeys, ln, rn, tie, tolerance))
          .drop(col(ln)).drop(col(rn))
      case other =>
        throw new IllegalArgumentException(
          s"direction must be backward or forward, got $other")
    }
  }

  /** The resolved logical node alone (no imperative registration) — the
    * path a declaratively-extended session (`spark.sql.extensions`)
    * exercises, where the strategy/rules come from [[graft.GraftExtensions]].
    */
  def plan(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           tie: Seq[String] = Nil,
           tolerance: Option[String] = None): AsOfJoin = {
    require(leftKeys.size == rightKeys.size, "key lists must align")
    val caseSensitive = left.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    // the collision check must fold case the same way attr() resolves below
    def fold(n: String) = if (caseSensitive) n else n.toLowerCase
    val dup = left.columns.map(fold).toSet
      .intersect(right.columns.map(fold).toSet)
    require(dup.isEmpty, s"ambiguous columns in as-of join: $dup — alias first")
    val (lPlan, rPlan) = (PlanGlue.analyzed(left), PlanGlue.analyzed(right))
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(a =>
          if (caseSensitive) a.name == name else a.name.equalsIgnoreCase(name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${plan.output.map(_.name).mkString(", ")}"))
    val tolUs = tolerance.map(parseToleranceUs)
    AsOfJoin(lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      attr(lPlan, leftTime), attr(rPlan, rightTime),
      tie.map(attr(rPlan, _)), tolUs)
  }
}

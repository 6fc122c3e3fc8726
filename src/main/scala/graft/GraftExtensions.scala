package graft

import org.apache.spark.sql.SparkSessionExtensions

/** `SparkSessionExtensions` entry point: makes every graft native function
  * available to plain `spark.sql(...)` sessions via
  * `--conf spark.sql.extensions=graft.GraftExtensions` — the deployment shape
  * a shared 1000-executor cluster would use (no imperative registration).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // The whole-operator extension: the native as-of join's planner
    // strategy plus the optimizer rules that keep predicate pushdown and
    // column pruning flowing THROUGH the custom node (injected rules join
    // the operator-optimization fixpoint, composing with Catalyst's own
    // PushDownPredicates/ColumnPruning)
    ext.injectPlannerStrategy(_ => plans.AsOfJoinStrategy)
    ext.injectOptimizerRule(_ => plans.AsOfRules.PushThroughAsOf)
    ext.injectOptimizerRule(_ => plans.AsOfRules.PruneThroughAsOf)
    // SQL reach for the whole-operator tier: graft_asof_join(...) as a
    // table-valued function (the analyzer resolves its UnresolvedRelation /
    // UnresolvedAttribute arguments, then the strategy above plans the node)
    ext.injectTableFunction(plans.AsOfSql.descriptor)
    // Same SQL reach for the skew-salted join composition, the
    // persisted-index ANN search, and the banded-LSH near-dup pairs
    ext.injectTableFunction(plans.SkewSql.descriptor)
    ext.injectTableFunction(plans.AnnSql.descriptor)
    ext.injectTableFunction(plans.NearDupSql.descriptor)
    ext.injectTableFunction(plans.ProfileSql.descriptor)
    ext.injectTableFunction(plans.SnapshotSql.descriptor)
    ext.injectTableFunction(plans.SnapshotWhereSql.descriptor)
    ext.injectTableFunction(plans.CountSql.descriptor)
    ext.injectTableFunction(plans.MinMaxSql.descriptor)
    ext.injectTableFunction(plans.ChangesSql.descriptor)
    // CALL-style maintenance verbs (one-row status receipts): the
    // operations half of the SQL surface — compact/rollback/expire run
    // through the same store code paths as the DataFrame API
    ext.injectTableFunction(plans.MaintenanceSql.Compact.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Rollback.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Expire.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Rename.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.DropColumn.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Retype.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Merge.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Append.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Delete.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Update.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.DeleteMor.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.UpdateMor.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.MaterializeDvs.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.DeclareZorder.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.MergeInto.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Fsck.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.DeleteBranchMor.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.UpdateBranchMor.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.AddConstraint.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.DropConstraint.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.BackfillStats.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Tag.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.DropTag.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.Branch.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.AppendBranch.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.MergeBranch.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.PublishBranch.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.DropBranch.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.RebaseBranch.descriptor)
    ext.injectTableFunction(plans.MaintenanceSql.ExpireBranches.descriptor)
    // Function registration needs a live session's registry; inject via
    // a check rule that runs once at analysis start (idempotent registry ops).
    ext.injectCheckRule { session =>
      operators.Dedup.register(session)
      expressions.AccessLogParseExpr.register(session)
      expressions.VectorOps.register(session)
      expressions.LshPlanes.register(session)
      _ => ()
    }
  }
}

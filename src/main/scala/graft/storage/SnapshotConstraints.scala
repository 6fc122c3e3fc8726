package graft.storage

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array, coalesce, col, expr, filter,
  lit, not, size, when}

/** CHECK constraints at the [[SnapshotStore]] write boundary — the
  * Delta-Lake constraint idea (a public concept) re-derived on the
  * store's own primitives: a named SQL predicate every INGESTED row must
  * satisfy, enforced on append / merge / branch writes / predicate
  * UPDATE before anything is written, refused loudly with the violating
  * constraint and a sample row. The corpus-gate floor: the reference's
  * own parse-failure path (R4) manufactures corrupt rows, and a store
  * carrying `status_parses CHECK (status IS NOT NULL)` turns silent
  * corpus rot into a refused batch at the boundary where it is cheap to
  * fix.
  *
  * Semantics are SQL CHECK semantics: a row violates only when the
  * predicate is FALSE — NULL passes (`price > 0` admits a NULL price;
  * pair it with `price IS NOT NULL` to forbid that too).
  *
  * Layout: one `_constraint-<name>` file per constraint (content = the
  * escaped predicate SQL). Create is the store's single-winner file
  * publish — concurrent duplicate adds get one winner, loudly — and
  * there is NO read-modify-write anywhere, so concurrent adds of
  * DIFFERENT constraints both land. [[add]] first proves the CURRENT
  * head satisfies the predicate with a stats-PRUNED scan
  * ([[SnapshotStore.readWhere]] over the violation predicate — adding
  * `k IS NOT NULL` to a store with null counts opens only the gens that
  * might hold a NULL), the Delta `ALTER TABLE ADD CONSTRAINT` contract.
  *
  * Enforcement cost: one extra pass over each BATCH (never the store),
  * short-circuited by `limit(1)`; zero when no constraint exists (one
  * root listing, the same cost class as the head probe every write
  * already pays).
  *
  * Known race, documented: a write in flight when [[add]] lands may
  * commit unvalidated (it read the constraint list before the add) —
  * the same window Delta closes only by running both through one log.
  * [[add]] validates the head it sees; re-run it (or audit with
  * `readWhere(violation)`) after quiescing writers for a hard guarantee.
  * Time travel is unaffected: constraints gate WRITES, not reads, and
  * [[SnapshotStore.rollback]] may resurrect pre-constraint data (audit
  * after rollback — Delta's caveat too).
  */
private[graft] object SnapshotConstraints {
  import SnapshotStore.{headVersion, readRenames, readWhere, versionSchema}
  import SnapshotFormat.readFileUtf8

  private val Esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

  private val Prefix = "_constraint-"

  private def hfs(spark: SparkSession, path: String) =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def requireCleanName(name: String): Unit =
    require(name.nonEmpty && name.forall(c => c.isLetterOrDigit ||
      c == '_' || c == '-' || c == '.'),
      s"constraint name '$name' must be [A-Za-z0-9_.-]+")

  /** All constraints: name → predicate SQL. One root listing; empty map
    * for a store (or path) without any.
    */
  def all(spark: SparkSession, path: String): Map[String, String] = {
    val fs = hfs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (!fs.exists(root)) return Map.empty
    fs.listStatus(root).map(_.getPath.getName)
      .filter(_.startsWith(Prefix)).flatMap { f =>
        // a file that vanished between the listing and this read was
        // DROPPED by a concurrent actor — by that actor's own contract
        // the constraint no longer gates anything; other errors stay loud
        try Some(Esc.unescapePathName(f.stripPrefix(Prefix)) ->
          Esc.unescapePathName(readFileUtf8(fs,
            new org.apache.hadoop.fs.Path(root, f)).trim))
        catch { case _: java.io.FileNotFoundException => None }
      }.toMap
  }

  /** The logical column names `predSql` references, resolved against
    * `logicalSchema` (loud on unknown columns — the same failure a
    * filter would surface).
    */
  private[storage] def referencedColumns(spark: SparkSession,
      logicalSchema: org.apache.spark.sql.types.StructType,
      predSql: String): Set[String] = {
    val analyzed = spark.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](),
      logicalSchema).filter(expr(predSql))
      .queryExecution.analyzed
    analyzed.expressions.flatMap(_.collect {
      case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
        a.name
    }).toSet.intersect(logicalSchema.fieldNames.toSet)
  }

  /** Adds constraint `name` after proving the CURRENT head satisfies it
    * (stats-pruned violation scan; refused loudly with a sample row
    * otherwise). Duplicate names are single-winner-refused.
    */
  def add(spark: SparkSession, path: String, name: String,
          predSql: String): Unit = {
    requireCleanName(name)
    val head = headVersion(spark, path).getOrElse(
      throw new IllegalArgumentException(s"no snapshots at $path"))
    val renames = readRenames(spark, path, head)
    val logicalSchema = org.apache.spark.sql.types.StructType(
      versionSchema(spark, path, head).fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    referencedColumns(spark, logicalSchema, predSql) // loud on unknowns
    val viol = readWhere(spark, path,
      not(coalesce(expr(predSql), lit(true)))).limit(1).collect()
    if (viol.nonEmpty)
      throw new IllegalArgumentException(
        s"cannot add constraint '$name' CHECK ($predSql): the current " +
          s"head already violates it, e.g. ${viol(0)}")
    val fs = hfs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val tmp = new org.apache.hadoop.fs.Path(root,
      s".$Prefix$name.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    out.write(Esc.escapePathName(predSql).getBytes("UTF-8"))
    out.close()
    val dst = new org.apache.hadoop.fs.Path(root,
      s"$Prefix${Esc.escapePathName(name)}")
    try SnapshotStore.publishFile(spark, path, tmp, dst)
    catch {
      case e @ (_: org.apache.hadoop.fs.FileAlreadyExistsException |
                _: java.io.IOException) =>
        fs.delete(tmp, false)
        if (fs.exists(dst))
          throw new IllegalArgumentException(
            s"constraint '$name' already exists on $path (drop it first " +
              "to replace the predicate)")
        else throw e
    }
  }

  /** Drops constraint `name`; false when it never existed. */
  def drop(spark: SparkSession, path: String, name: String): Boolean = {
    requireCleanName(name)
    hfs(spark, path).delete(new org.apache.hadoop.fs.Path(path,
      s"$Prefix${Esc.escapePathName(name)}"), false)
  }

  /** Refuses a metadata verb (rename/drop column) that would orphan a
    * constraint's reference — the recipe is drop-constraint, alter,
    * re-add (Delta's contract for constrained columns).
    */
  private[storage] def requireUnreferenced(spark: SparkSession,
      path: String, logicalName: String, verb: String): Unit = {
    val cs = all(spark, path)
    if (cs.isEmpty) return
    val head = headVersion(spark, path).getOrElse(return)
    val renames = readRenames(spark, path, head)
    val logicalSchema = org.apache.spark.sql.types.StructType(
      versionSchema(spark, path, head).fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    val offending = cs.filter { case (_, p) =>
      try referencedColumns(spark, logicalSchema, p).contains(logicalName)
      catch { case _: Exception => true } // unresolvable: be conservative
    }.keys.toSeq.sorted
    require(offending.isEmpty,
      s"cannot $verb column '$logicalName': referenced by constraint" +
        s"${if (offending.size > 1) "s" else ""} " +
        s"${offending.mkString(", ")} — drop the constraint first")
  }

  /** Enforces every constraint on `batch` (logical names) before a write;
    * throws naming the violated constraints and one sample row. Columns
    * the batch lacks read as NULL (the union-schema semantics the store
    * gives them) — CHECK passes on NULL, so a narrow append is not
    * penalized for columns it does not carry.
    */
  private[storage] def enforce(spark: SparkSession, path: String,
                               batch: DataFrame, verb: String): Unit = {
    val cs = all(spark, path)
    if (cs.isEmpty) return
    val head = headVersion(spark, path).getOrElse(return)
    val renames = readRenames(spark, path, head)
    val logicalSchema = org.apache.spark.sql.types.StructType(
      versionSchema(spark, path, head).fields.map(f =>
        f.copy(name = renames.getOrElse(f.name, f.name))))
    // pad referenced columns the batch lacks with TYPED nulls (they read
    // NULL under the store's union schema — a narrow append is not
    // penalized for columns it does not carry); [[add]] resolved every
    // predicate against the store schema, so the referenced set is in it
    val needed = cs.values.flatMap(p =>
      referencedColumns(spark, logicalSchema, p)).toSet
    val have = batch.columns.toSet
    val dfp = needed.diff(have).foldLeft(batch)((d, c) =>
      d.withColumn(c, lit(null).cast(logicalSchema(c).dataType)))
    val flags = cs.toSeq.sortBy(_._1).map { case (n, p) =>
      when(not(coalesce(expr(p), lit(true))), lit(n))
    }
    val bad = dfp
      .withColumn("_graft_violated",
        filter(array(flags: _*), x => x.isNotNull))
      .filter(size(col("_graft_violated")) > 0)
      .limit(1).collect()
    if (bad.nonEmpty) {
      val row = bad(0)
      val names = row.getSeq[String](row.fieldIndex("_graft_violated"))
      throw new IllegalArgumentException(
        s"$verb to $path refused: constraint" +
          s"${if (names.size > 1) "s" else ""} " +
          names.map(n => s"'$n' CHECK (${cs(n)})").mkString(", ") +
          s" violated, e.g. $row")
    }
  }
}

package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.storage.{CatalogBridge, SnapshotStore}

/** The row-level operations' target scan. Spark's group-based rewrite
  * plans this as a REAL v2 batch scan (the V1 bridge the plain SELECT
  * path rides is not applied inside ReplaceData), so `toBatch`:
  *
  *  1. materializes the PINNED version through the store's own reader —
  *     [[SnapshotStore.read]] is the single source of read semantics
  *     (deletion vectors, additive schema unions, renames), so the
  *     rewrite can never diverge from what the TVF verbs read — into a
  *     uniform staging parquet dir under the store, and
  *  2. serves that staging dir through Spark's parquet reader, one
  *     input partition per file.
  *
  * The staging dir is removed by the operation's write at commit/abort.
  * Posture: one extra table materialization on top of the row-level
  * rewrite's whole-table copy — catalog-routed MERGE/UPDATE/DELETE are
  * the CORRECTNESS surface; the store's TVF verbs remain the
  * O(touched-partition) fast path (SURVEY §2.B records the trade).
  */
private[catalog] class GraftReplaceScanBuilder(path: String, pinned: Int,
    staging: String) extends ScanBuilder {

  override def build(): Scan = new Scan {
    private val spark = SparkSession.active
    private val logical = CatalogBridge.logicalSchema(spark, path, pinned)
    // the declared metadata attribute (`_p`, the row's partition key)
    // rides LAST — the rewrite resolves [table columns, metadata]
    private val withMeta = StructType(logical.fields :+
      org.apache.spark.sql.types.StructField("_p",
        org.apache.spark.sql.types.StringType, nullable = true))

    override def readSchema(): StructType = withMeta
    override def description(): String =
      s"graft-replace-scan($path @ v$pinned)"

    // the plan may reference this scan more than once (cardinality
    // check); materialize exactly once
    private lazy val batch: Batch = {
      val df = SnapshotStore.read(spark, path, Some(pinned))
        .withColumn("_p",
          CatalogBridge.partKeyColumn(spark, path, pinned))
      df.write.mode("overwrite").parquet(staging)
      val fs = new org.apache.hadoop.fs.Path(staging)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files = fs.listStatus(new org.apache.hadoop.fs.Path(staging))
        .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .map(s => (s.getPath.toString, s.getLen)).toSeq
      // the staging dir is UNIFORM parquet written just above, so the
      // plain row-based reader serves it without evolution concerns
      // (a fresh session scope disables vectorization: the FileFormat
      // reader yields ColumnarBatches under it, which a row-level
      // PartitionReader must not hand to Spark)
      val s2 = spark.newSession()
      s2.conf.set("spark.sql.parquet.enableVectorizedReader", "false")
      val readFunc = new org.apache.spark.sql.execution.datasources
        .parquet.ParquetFileFormat()
        .buildReaderWithPartitionValues(
          sparkSession = s2.asInstanceOf[org.apache.spark.sql.classic.SparkSession],
          dataSchema = withMeta,
          partitionSchema = StructType(Nil),
          requiredSchema = withMeta,
          filters = Nil,
          options = Map.empty,
          hadoopConf = s2.sessionState.newHadoopConf())
      new GraftStagedBatch(files, readFunc)
    }

    override def toBatch: Batch = batch
  }
}

private[catalog] case class GraftStagedFile(path: String, len: Long)
    extends InputPartition

private[catalog] class GraftStagedBatch(files: Seq[(String, Long)],
    readFunc: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow])
    extends Batch {

  override def planInputPartitions(): Array[InputPartition] =
    files.map { case (p, l) => GraftStagedFile(p, l) }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftStagedReaderFactory(readFunc)
}

private[catalog] class GraftStagedReaderFactory(
    readFunc: org.apache.spark.sql.execution.datasources.PartitionedFile =>
      Iterator[InternalRow])
    extends PartitionReaderFactory {

  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val f = partition.asInstanceOf[GraftStagedFile]
    val pf = org.apache.spark.sql.execution.datasources.PartitionedFile(
      InternalRow.empty,
      org.apache.spark.paths.SparkPath.fromPath(
        new org.apache.hadoop.fs.Path(f.path)),
      0L, f.len, Array.empty[String], 0L, f.len, Map.empty)
    val it = readFunc(pf)
    new PartitionReader[InternalRow] {
      private var cur: InternalRow = _
      override def next(): Boolean =
        if (it.hasNext) { cur = it.next(); true } else false
      override def get(): InternalRow = cur
      override def close(): Unit = ()
    }
  }
}

package graft.storage

import org.apache.spark.sql.SparkSession

/** Per-FILE column statistics from parquet FOOTERS — the grain below the
  * manifest's per-(partition, gen) blobs, read on demand by the DML
  * copy-on-write planner ([[SnapshotDml]]). The Delta deletion-vector
  * problem ("one matching row rewrites a 10 GB slice") is answered here
  * with the cheaper public idea first: Iceberg keeps per-FILE stats in
  * its manifests and rewrites only matching files; this store keeps its
  * manifests at gen grain (they stay small and copy forward verbatim)
  * and recovers the file grain lazily — footers are only opened for the
  * few slices the gen-level verdict left AMBIGUOUS, and the blobs they
  * yield ride the SAME grammar, so a kept file enters the manifest as a
  * first-class field (`data/gen/_p=v/part-...parquet` + blob) that every
  * reader, pruner, compactor, and the changes feed already understand.
  *
  * Trust model: the store writes every one of its files itself
  * ([[SnapshotStore.writeGen]], Spark's parquet writer — unsigned-order
  * binary stats, MICROS timestamps), so footer statistics are
  * trustworthy by construction; anything missing, unexpected, or
  * non-finite degrades that column to counts-only or to no field at all
  * — the same conservative ladder [[SnapshotStore.genStats]] rides.
  * Declared-but-absent columns (schema evolution) record the all-NULL
  * counts field, exactly like the gen-level codec.
  */
private[graft] object SnapshotFileStats {
  import SnapshotFormat.{escapeStatValue, stringBounds, NoBoundsCode}

  private val Esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

  /** Lists `leafDir`'s data files (store-relative paths, sorted) and
    * derives one stats blob per file for the declared `statsCols`
    * (PHYSICAL names, same grammar as the manifest's gen-level blobs —
    * v3 exactness flags on strings included). A file whose footer lacks
    * usable statistics for a column simply omits that column's bounds
    * (counts still recorded when null counts are present); a file with
    * no usable footer at all yields None — the caller treats it as
    * might-match, never as empty.
    */
  def fileBlobs(spark: SparkSession, path: String, leafDir: String,
                statsCols: Seq[String],
                physSchema: org.apache.spark.sql.types.StructType)
      : Seq[(String, Option[String])] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    val dirPath = new org.apache.hadoop.fs.Path(s"$path/$leafDir")
    val files = fs.listStatus(dirPath).map(_.getPath)
      .filter { p =>
        val n = p.getName
        !n.startsWith("_") && !n.startsWith(".") && n.endsWith(".parquet")
      }.sortBy(_.getName)
    files.toSeq.map { p =>
      s"$leafDir/${p.getName}" -> blobOfFooter(conf, p, statsCols, physSchema)
    }
  }

  /** One file's blob (None = unreadable/empty footer — might-match). */
  private def blobOfFooter(conf: org.apache.hadoop.conf.Configuration,
      file: org.apache.hadoop.fs.Path, statsCols: Seq[String],
      physSchema: org.apache.spark.sql.types.StructType): Option[String] = {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.types._
    val reader =
      try org.apache.parquet.hadoop.ParquetFileReader.open(
        org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(file, conf))
      catch { case scala.util.control.NonFatal(_) => return None }
    try {
      val blocks = reader.getFooter.getBlocks.asScala.toSeq
      if (blocks.isEmpty) return None
      val rows = blocks.map(_.getRowCount).sum
      if (rows <= 0L) return None
      val fileCols = reader.getFooter.getFileMetaData.getSchema
        .getFields.asScala.map(_.getName).toSet
      val fields = statsCols.flatMap { c =>
        val key = Esc.escapePathName(c)
        if (!physSchema.fieldNames.contains(c)) None
        else if (!fileCols.contains(c))
          // absent column: reads NULL under the union schema — the
          // all-NULL counts field, same as the gen-level codec
          Some(s"$key=$NoBoundsCode:::$rows:$rows")
        else {
          val chunks = blocks.map(b =>
            b.getColumns.asScala.find(_.getPath.toDotString == c))
          if (chunks.exists(_.isEmpty)) None
          else {
            val stats = chunks.flatten.map(_.getStatistics)
            val countsOk = stats.forall(st =>
              st != null && st.isNumNullsSet)
            val nulls = if (countsOk) Some(stats.map(_.getNumNulls).sum)
              else None
            val counts = nulls.map(n => s":$n:$rows").getOrElse("")
            def countsOnly =
              nulls.map(_ => s"$key=$NoBoundsCode::$counts")
            if (nulls.contains(rows)) countsOnly // all-NULL slice
            else {
              val boundsOk = stats.forall(st => st != null && !st.isEmpty &&
                st.hasNonNullValue)
              if (!boundsOk) countsOnly
              else renderBounds(key, physSchema(c).dataType, stats, counts)
                .orElse(countsOnly)
            }
          }
        }
      }
      if (fields.isEmpty) None else Some(fields.mkString(";"))
    } catch { case scala.util.control.NonFatal(_) => None }
    finally reader.close()
  }

  /** Merges the blocks' typed statistics into one blob field; None when
    * the footer's physical shape does not match the column's declared
    * type (a store never writes such files — stay conservative, not
    * loud, because DML correctness never depends on stats).
    */
  private def renderBounds(key: String,
      dt: org.apache.spark.sql.types.DataType,
      stats: Seq[org.apache.parquet.column.statistics.Statistics[_]],
      counts: String): Option[String] = {
    import org.apache.spark.sql.types._
    import org.apache.parquet.column.statistics._
    def longs: Option[(Long, Long)] = {
      val ls = stats.map {
        case st: IntStatistics => Some((st.getMin.toLong, st.getMax.toLong))
        case st: LongStatistics => Some((st.getMin, st.getMax))
        case _ => None
      }
      if (ls.exists(_.isEmpty)) None
      else Some((ls.flatten.map(_._1).min, ls.flatten.map(_._2).max))
    }
    def doubles: Option[(Double, Double)] = {
      val ds = stats.map {
        case st: FloatStatistics =>
          Some((st.getMin.doubleValue, st.getMax.doubleValue))
        case st: DoubleStatistics => Some((st.getMin, st.getMax))
        case _ => None
      }
      if (ds.exists(_.isEmpty)) None
      else Some((ds.flatten.map(_._1).min, ds.flatten.map(_._2).max))
    }
    dt match {
      case ByteType | ShortType | IntegerType | LongType =>
        longs.map { case (mn, mx) => s"$key=l:$mn:$mx$counts" }
      case DateType => // parquet int32 = epoch days, the blob's domain
        longs.map { case (mn, mx) => s"$key=a:$mn:$mx$counts" }
      case TimestampType => // Spark writes TIMESTAMP(MICROS)
        longs.map { case (mn, mx) => s"$key=t:$mn:$mx$counts" }
      case TimestampNTZType =>
        longs.map { case (mn, mx) => s"$key=n:$mn:$mx$counts" }
      case FloatType | DoubleType =>
        doubles.filter { case (mn, mx) =>
          !mn.isNaN && !mn.isInfinite && !mx.isNaN && !mx.isInfinite }
          .map { case (mn, mx) =>
            s"$key=d:$mn:$mx$counts" }
      case StringType =>
        val bs = stats.map {
          case st: BinaryStatistics =>
            Some((st.genericGetMin.toStringUsingUTF8,
              st.genericGetMax.toStringUsingUTF8))
          case _ => None
        }
        if (bs.exists(_.isEmpty)) None
        else {
          // merge in UTF-8 byte order — the order the writer's stats and
          // every blob comparison use (Java String order diverges above
          // the BMP)
          def lt(a: String, b: String): Boolean = {
            val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
            val n = math.min(x.length, y.length)
            var i = 0
            while (i < n) {
              val d = (x(i) & 0xff) - (y(i) & 0xff)
              if (d != 0) return d < 0
              i += 1
            }
            x.length < y.length
          }
          val mn = bs.flatten.map(_._1).reduce((a, b) => if (lt(a, b)) a else b)
          val mx = bs.flatten.map(_._2).reduce((a, b) => if (lt(a, b)) b else a)
          stringBounds(mn, mx).map { case (lo, hi) =>
            val flags = (if (lo == mn) 1 else 0) | (if (hi == mx) 2 else 0)
            // v3 flags need the 6-field shape; without null counts the
            // field degrades to v1 (parses inexact — conservative)
            if (counts.isEmpty)
              s"$key=s:${escapeStatValue(lo)}:${escapeStatValue(hi)}"
            else
              s"$key=s:${escapeStatValue(lo)}:${escapeStatValue(hi)}" +
                s"$counts:$flags"
          }
        }
      case _ => None
    }
  }
}

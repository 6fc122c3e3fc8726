package graft.storage

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The [[SnapshotStore]]'s INTEGRITY REPORT (`fsck` / `graft_fsck`) — the
  * read-only "is this store internally consistent, and what is waiting
  * for the sweeper" probe an operator runs before trusting a store they
  * did not build (and after any incident involving manual file surgery).
  * One metadata-only pass (manifests + staged branch files + one dir
  * listing; no data page read), one row per finding:
  *
  *   - `dangling_ref`: a retained manifest field (or branch-staged
  *     field) whose gen dir / DML file does not exist on disk — the
  *     store SERVES this version and reads of it will fail; severity
  *     `error`. The usual cause is a manual delete or an expire raced
  *     beyond its contract.
  *   - `dangling_dv`: a deletion-vector ref whose sidecar dir is gone —
  *     reads of the field would RESURRECT deleted rows if the reader
  *     ignored the miss (it does not — the scan fails loud), severity
  *     `error`.
  *   - `malformed_field`: a manifest field whose stats blob / DV suffix
  *     does not parse; severity `error` (readers treat blobs as
  *     corruption, not absence).
  *   - `orphan_dir`: a `data/` dir no retained version, tag, or staged
  *     branch references — space the next age-floored [[SnapshotStore
  *     .expire]] reclaims; severity `info` (a YOUNG orphan may be an
  *     in-flight commit: its age is reported, the floor decides).
  *   - `staging_leftover`: a crash-leftover `._*.tmp` / `.seg-*.tmp` /
  *     `.*.stage` file, also expire's to sweep; severity `info`.
  *
  * A healthy store reports zero rows. The report never mutates anything
  * — it is the dry-run complement to `expire`, not a repair tool (repair
  * is a POLICY decision: roll back past the damage, re-ingest, or expire
  * the affected history — the report names the versions so the operator
  * can choose).
  */
object SnapshotFsck {
  import SnapshotFormat._

  private def hfs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** (severity, kind, subject, detail) rows; empty = healthy. */
  def fsck(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    val fs = hfs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    val out = Seq.newBuilder[(String, String, String, String)]
    if (!fs.exists(root))
      return Seq(("error", "missing_store", path, "path does not exist"))
        .toDF("severity", "kind", "subject", "detail")

    // retained versions, tags, branches → every referenced field
    val versions: Seq[Int] = fs.listStatus(root).map(_.getPath.getName)
      .collect { case n if n.startsWith("_manifest-") =>
        n.stripPrefix("_manifest-").toInt }.toSeq.sorted
    val fieldsByVersion: Seq[(String, Seq[String])] = versions.flatMap { v =>
      try Some(s"version $v" ->
        SnapshotStore.readManifestDirs(spark, path, v))
      catch {
        case e: IllegalArgumentException if versionVanished(e) => None
        case e: IllegalArgumentException =>
          out += (("error", "malformed_manifest", s"version $v",
            Option(e.getMessage).getOrElse("").take(200)))
          None
      }
    } ++ (try Seq("branches" -> SnapshotBranch.allStagedDirs(spark, path))
      catch {
        case e: Exception =>
          out += (("error", "malformed_staged", "branches",
            Option(e.getMessage).getOrElse("").take(200)))
          Nil
      })

    val liveTopDirs = scala.collection.mutable.Set.empty[String]
    val checkedDirs = scala.collection.mutable.Set.empty[String]
    val checkedDvs = scala.collection.mutable.Set.empty[String]
    fieldsByVersion.foreach { case (ref, fields) =>
      fields.foreach { f =>
        // parse validity first: a malformed blob/DV suffix poisons reads
        val parsed =
          try { statsOf(f).foreach(parseStats); Some(dvOf(f)) }
          catch {
            case e: IllegalArgumentException =>
              out += (("error", "malformed_field", s"$ref: ${dirOf(f)}",
                Option(e.getMessage).getOrElse("").take(200)))
              None
          }
        val dir = dirOf(f)
        liveTopDirs += dir.split("/").take(2).mkString("/")
        if (checkedDirs.add(dir) &&
          !fs.exists(new org.apache.hadoop.fs.Path(path, dir)))
          out += (("error", "dangling_ref", s"$ref: $dir",
            "referenced gen dir/file missing on disk"))
        parsed.toSeq.flatten.foreach { dv =>
          liveTopDirs += dv.rel.split("/").take(2).mkString("/")
          if (checkedDvs.add(dv.rel) &&
            !fs.exists(new org.apache.hadoop.fs.Path(path, dv.rel)))
            out += (("error", "dangling_dv", s"$ref: ${dv.rel}",
              s"deletion-vector sidecar missing (${dv.deleted} positions)"))
        }
      }
    }

    // orphans: data/ dirs nothing references (age reported — the floor
    // decides whether the next expire may reclaim them)
    val now = System.currentTimeMillis()
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { st =>
        val rel = s"data/${st.getPath.getName}"
        if (!liveTopDirs.contains(rel))
          out += (("info", "orphan_dir", rel,
            s"referenced by nothing; age ~" +
              s"${(now - st.getModificationTime) / 1000}s — expire's " +
              "age-floored sweep reclaims it"))
      }
    // crash-leftover staging files at the root and under segs/
    def stagingIn(p: org.apache.hadoop.fs.Path): Unit =
      if (fs.exists(p)) fs.listStatus(p).foreach { st =>
        val n = st.getPath.getName
        if ((n.startsWith("._") && n.contains(".tmp")) ||
          (n.startsWith(".seg-") && n.endsWith(".tmp")) ||
          (n.startsWith(".") && n.endsWith(".stage")))
          out += (("info", "staging_leftover",
            if (p == root) n else s"${p.getName}/$n",
            s"crash leftover; age ~" +
              s"${(now - st.getModificationTime) / 1000}s"))
      }
    stagingIn(root)
    stagingIn(new org.apache.hadoop.fs.Path(root, "segs"))
    out.result()
      .toDF("severity", "kind", "subject", "detail")
      .orderBy("severity", "kind", "subject")
  }
}

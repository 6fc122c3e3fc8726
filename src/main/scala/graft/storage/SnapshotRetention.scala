package graft.storage

import org.apache.spark.sql.SparkSession

/** The [[SnapshotStore]]'s RETENTION layer — the expire sweep, split from
  * the commit/read verbs (same rationale as [[SnapshotFormat]]: the next
  * race should be read against a small file that does exactly one thing).
  * [[SnapshotStore.expire]] is the public entry point and owns the
  * filesystem-contract guard; this object owns the sweep itself:
  * which versions are retained (keep window + tag fixpoint + branch
  * protection), which gen dirs/segments/staging files are garbage, and
  * the orphan-age floor that keeps in-flight commits safe.
  */
private[storage] object SnapshotRetention {

  import SnapshotFormat._

  private def hfs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** The sweep behind [[SnapshotStore.expire]] — see its scaladoc for the
    * public contract (keep window, `minAgeMs` orphan-age floor, tag
    * retention, the concurrent-sweep races).
    */
  private[storage] def expire(spark: SparkSession, path: String, keep: Int,
                              minAgeMs: Long): Unit = {
    val fs = hfs(spark, path)
    val root = new org.apache.hadoop.fs.Path(path)
    if (SnapshotStore.headVersion(spark, path).isEmpty) return
    // TAGGED versions are retained regardless of the keep window: their
    // manifests, schemas, renames, and referenced gens all survive. Heads
    // first (cheap), then every DISTINCT segment exactly once: segments
    // are shared across versions by content-addressing, so a store with
    // `keep` retained versions of a 1M-partition manifest parses ~one
    // manifest's worth of segments, not keep x N lines.
    // The HEAD is re-read inside every resolution pass (not snapshotted
    // once at sweep start): a concurrent branch PUBLISH re-points gens
    // OLDER than the orphan floor into a brand-new manifest and drops
    // the staged chain — a sweep working from a pre-publish head would
    // see neither the staged refs nor the new manifest and sweep
    // published data. Re-reading per pass (plus the head-advance
    // fixpoint below) closes that window to the same residual as the
    // tag race: a publish landing after the LAST re-read, priced by the
    // same two-unsynchronized-actors posture (SURVEY §4).
    def resolve(tagged: Set[Int])
        : (Int, Set[String], Set[String]) = {
      val head = SnapshotStore.headVersion(spark, path).getOrElse(0)
      val retainedHeads =
        ((math.max(1, head - keep + 1) to head).toSet ++ tagged).toSeq.sorted
        .flatMap { v =>
          // a concurrent sweep (whose head, and so cutoff, was >= ours)
          // may delete a manifest in our range mid-scan: skipping it is
          // safe — any gen it shares with a version either sweep retains
          // is reachable through that retained version's manifest
          try Some(v -> readHead(spark, path, v))
          catch {
            case e: IllegalArgumentException if versionVanished(e) => None
          }
        }
      val liveSegs: Set[String] = retainedHeads.flatMap {
        case (_, SegHead(_, _, refs, cidx)) =>
          refs.values.map(_._2) ++ cidx.values.flatMap(_.values.map(_._2))
        case _ => Nil
      }.toSet
      val flatDirs = retainedHeads.flatMap {
        case (_, FlatHead(e)) => e.values.flatten
        case _ => Nil
      }
      val segDirs = liveSegs.toSeq.sorted.flatMap { seg =>
        // a segment swept by a concurrent expire (with its whole version)
        // contributes nothing — same skip rationale as a vanished head
        try loadSeg(spark, path, head, seg).values.flatten
        catch {
          case e: IllegalArgumentException if versionVanished(e) => Nil
        }
      }
      // BRANCH-staged gens are live: a gen whose only reference is a
      // staged file (an unpublished WAP candidate) must survive until
      // the branch publishes or drops. EVERY staged file contributes —
      // not just tips: a branch MERGE replaces touched partitions'
      // staged dirs, so gens referenced only by pre-merge staged
      // versions would fall out of a tips-only live set while the chain
      // still exists. A staged file dropped/published mid-sweep
      // contributes nothing (its gens age out from the NEXT sweep on);
      // a malformed file or an IO error fails the sweep LOUDLY instead
      // of sweeping a live branch's gens (see allStagedDirs).
      val stagedDirs = SnapshotBranch.allStagedDirs(spark, path)
      // each field contributes its gen dir AND any deletion-vector
      // sidecar dirs it references (`data/dv-<hex>` — a sidecar whose
      // only reference is a retained field must survive with it; one
      // no surviving field references ages out like any gen)
      (head, liveSegs,
        (flatDirs ++ segDirs ++ stagedDirs)
          .flatMap(f => dirOf(f) +: dvOf(f).map(_.rel))
          .map(_.split("/").take(2).mkString("/")).toSet)
    }
    // tag fixpoint: a tag published DURING the resolution must be honored
    // CONSISTENTLY — keeping its manifest while its gens miss the live
    // set would strand a retained version without data, which is worse
    // than a clean sweep. So tags are re-read after each resolution and
    // the resolution repeats until no new tag appears (bounded; in
    // practice one pass). A tag that lands after the LAST re-read gets no
    // protection from this sweep — its version is swept whole and tag()'s
    // own post-publish manifest re-check retracts it loudly: the same
    // two-unsynchronized-actors posture as Iceberg tag/expire without a
    // catalog lock (SURVEY §4 — a commit-coordination primitive is
    // required where the FS cannot provide one).
    var tagged: Set[Int] = SnapshotStore.tags(spark, path).values.toSet
    var (head, liveSegs, live) = resolve(tagged)
    var tries = 0
    var again = SnapshotStore.tags(spark, path).values.toSet
    var headAgain = SnapshotStore.headVersion(spark, path).getOrElse(0)
    while (((again -- tagged).nonEmpty || headAgain > head) && tries < 3) {
      tagged = tagged ++ again
      val r = resolve(tagged)
      head = r._1; liveSegs = r._2; live = r._3
      tries += 1
      again = SnapshotStore.tags(spark, path).values.toSet
      headAgain = SnapshotStore.headVersion(spark, path).getOrElse(0)
    }
    (1 until math.max(1, head - keep + 1)).filterNot(tagged).foreach { v =>
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_manifest-$v"), false)
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_schema-$v"), false)
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_renames-$v"), false)
      fs.delete(new org.apache.hadoop.fs.Path(root, s"_op-$v"), false)
    }
    val dataDir = new org.apache.hadoop.fs.Path(root, "data")
    val now = System.currentTimeMillis()
    // the age is the NEWEST status anywhere under the gen dir, not the
    // dir's own mtime: object stores (S3A & co) synthesize directory
    // mtimes, so only the youngest FILE reliably carries the "an
    // in-flight commit just wrote here" signal the floor exists for.
    // A dir that VANISHES mid-recursion was swept by a concurrent expire
    // between our listing and this probe — already-deleted is the outcome
    // this sweep wanted, so treat it as such instead of failing the whole
    // sweep on the racing sweeper's success (the per-dir delete below is
    // a no-op on a gone path either way).
    def newest(st: org.apache.hadoop.fs.FileStatus): Long =
      if (!st.isDirectory) st.getModificationTime
      else {
        val children =
          try fs.listStatus(st.getPath)
          catch {
            case _: java.io.FileNotFoundException =>
              Array.empty[org.apache.hadoop.fs.FileStatus]
            // RawLocalFileSystem surfaces a dir vanished mid-recursion as
            // a BARE IOException ("Invalid directory or I/O error"), not
            // FileNotFound — File.list() returns null for both a gone
            // path and a genuine I/O error. Re-probe to tell them apart:
            // gone = the racing deleter's success (a CAS-loser cleanup or
            // concurrent sweep), anything still present stays loud.
            case e: java.io.IOException =>
              if (!fs.exists(st.getPath))
                Array.empty[org.apache.hadoop.fs.FileStatus]
              else throw e
          }
        (st.getModificationTime +: children.map(newest).toSeq).max
      }
    if (fs.exists(dataDir))
      fs.listStatus(dataDir).foreach { st =>
        val g = st.getPath.getName
        if (!live.contains(s"data/$g") && now - newest(st) >= minAgeMs)
          fs.delete(new org.apache.hadoop.fs.Path(root, s"data/$g"), true)
      }
    // segment GC: content-addressed segment files referenced by NO
    // retained head age out under the same floor (a racing commit writes
    // its segments BEFORE the manifest CAS references them — the floor
    // protects that window exactly as it does for gen dirs), along with
    // crash-leftover segment staging files. Segment files are plain files,
    // so their own mtime is trustworthy (no synthetic-dir-mtime issue).
    val segsDir = new org.apache.hadoop.fs.Path(root, "segs")
    if (fs.exists(segsDir))
      fs.listStatus(segsDir).foreach { st =>
        val n = st.getPath.getName
        val stale = (n.startsWith(".seg-") && n.endsWith(".tmp")) ||
          (n.startsWith("seg-") && !liveSegs.contains(s"segs/$n"))
        if (stale && now - st.getModificationTime >= minAgeMs)
          fs.delete(st.getPath, false)
      }
    // crash-leftover manifest/schema staging files (a committer that died
    // between create and rename) age out under the same floor
    fs.listStatus(root).foreach { st =>
      val n = st.getPath.getName
      val isStaging =
        ((n.startsWith("._manifest-") || n.startsWith("._schema-") ||
          n.startsWith("._renames-") || n.startsWith("._op-") ||
          n.startsWith("._constraint-")) &&
          n.endsWith(".tmp")) ||
        n.startsWith("._tag.tmp-") || n.startsWith("._statscols.tmp-") ||
        n.startsWith("._bloomcols.tmp-") || n.startsWith("._sortcols.tmp-") ||
        n.startsWith("._partcol.tmp-") || n.startsWith("._staged.tmp-") ||
        // a crashed partition-spec evolution (`._partcol-<k>.tmp-...`)
        (n.startsWith("._partcol-") && n.contains(".tmp-"))
      if (isStaging && now - st.getModificationTime >= minAgeMs)
        fs.delete(st.getPath, false)
    }
  }
}

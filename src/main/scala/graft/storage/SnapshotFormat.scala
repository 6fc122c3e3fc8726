package graft.storage

import org.apache.spark.sql.SparkSession

/** The [[SnapshotStore]]'s FORMAT/CODEC layer — everything that defines
  * what the store's metadata BYTES mean, split from the commit/read verbs
  * (which own WHEN those bytes are written and what they promise):
  *
  *   - the manifest text format (flat tier) and the content-addressed
  *     hash-bucketed segment tier above it, with the three resolution
  *     shapes the verbs ride (full map / dirs-only / values-restricted)
  *   - the per-gen column-statistics blob codec (numeric + truncated
  *     string bounds) that rides inside manifest dir fields
  *   - the logical-name layer's `_renames-<v>` parsing (rename + drop
  *     tombstones)
  *
  * Nothing here mutates the store and nothing here decides policy: a
  * function in this object is a pure (bytes ⇄ values) mapping plus the
  * minimum FS reads to get the bytes. The split exists so the next
  * commit-protocol race is read against ~600 lines of verbs, not 2,200
  * lines of verbs interleaved with codec detail.
  *
  * ==Manifest tier: flat under the threshold, content-addressed
  * hash-bucketed segments above it==
  *
  * The flat one-line-per-partition manifest parses linearly in partition
  * count (measured 13.3x from 10k to 100k entries — the one super-linear
  * curve in SCALE100.json). At 1M partitions (daily x tenant at a true
  * 100 TB) that is ~0.5 s of driver parse per manifest resolution and a
  * multi-MB file rewritten whole on EVERY commit. The segment tier is the
  * Iceberg manifest-list argument re-expressed minimally:
  *   - `_manifest-<v>` becomes a small HEAD file: a marker line
  *     (`graft-segments TAB nBuckets TAB totalEntries`) plus one
  *     line per non-empty bucket (`bucket TAB nEntries TAB segs/seg-<md5>`)
  *   - each segment holds one hash-bucket's entries in the SAME line
  *     format as a flat manifest, and is CONTENT-ADDRESSED (named by the
  *     md5 of its bytes): an untouched bucket serializes to the same
  *     bytes, hashes to the same name, and is re-referenced WITHOUT any
  *     I/O — so a commit's segment writes are proportional to its TOUCHED
  *     buckets, versions share untouched segments the way they share gen
  *     dirs, and two racing writers of identical content converge on one
  *     file (the rename loser discards its staging copy).
  * What each operation costs at N partitions, B touched:
  *   - commitDelta (merge/append/compact): O(B) segment reads + writes
  *   - readPartitions / merge's touched-dir lookup: parses only the
  *     requested values' buckets — O(B)
  *   - changes: buckets whose (content-addressed) refs are EQUAL between
  *     the versions cannot differ — only differing buckets are parsed
  *   - rollback: copies the target's head text verbatim (segment refs and
  *     all) — O(head), no segment touched
  *   - full read / expire: inherently O(N); segments parse in parallel
  *     (the flat tier is one serial string split), and expire parses each
  *     DISTINCT segment once across all retained versions
  * The marker line cannot collide with a partition value: the marker
  * begins with the  control character, values are path-escaped
  * into the manifest, and escapePathName always %-escapes control
  * characters, so no escaped value can start a line with the marker
  * (SnapshotSpec pins this). Buckets come from the logical value's
  * String.hashCode (spec-fixed, JVM-stable), bucket count is the power of
  * two targeting ~4k entries per segment; a commit whose entry count
  * crosses a bucket-count boundary (or the flat threshold, in either
  * direction) re-segments whole — rare, amortized, and the upgrade path
  * for a flat store outgrowing the threshold.
  */
private[storage] object SnapshotFormat {

  private val Esc = org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils

  private def hfs(spark: SparkSession, path: String) =
    org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)

  /** Entry count at and above which commits write the segmented format.
    * Overridable for tests (`-Dgraft.snapshot.segmentThreshold=4` makes a
    * 5-partition store exercise the whole segment code path).
    */
  private[storage] def segmentThreshold: Int =
    sys.props.get("graft.snapshot.segmentThreshold").map(_.toInt)
      .getOrElse(8192)

  private[storage] val SegMarker = "graft-segments"

  /** Marker line opening one component's index section inside a
    * segmented head: `<marker> TAB <component position> TAB <nBuckets>`
    * (bucket count always equals the main tier's). Same forge-proofing
    * as [[SegMarker]]: begins with a control character escapePathName
    * always %-escapes.
    */
  private[storage] val CIndexMarker = "graft-cindex"

  /** The component-index bucket holding keys whose arity is NOT the
    * indexed spec's — an evolved store's old-era keys. Every partial
    * probe loads it alongside the constrained values' buckets; it
    * empties when compaction migrates the old era.
    */
  private[storage] val CIndexResidue = -1

  private[storage] def chooseBuckets(n: Int): Int = {
    var b = 16
    while (b.toLong * 4096 < n) b *= 2
    b
  }

  private[storage] def bucketOf(value: String, nBuckets: Int): Int =
    math.floorMod(value.hashCode, nBuckets)

  sealed trait Head { def totalEntries: Int }
  case class FlatHead(entries: Map[String, Seq[String]])
      extends Head { def totalEntries: Int = entries.size }
  /** refs: bucket → (nEntries, store-relative segment path). `cindex`
    * (r18) is the per-COMPONENT partial-probe index of a composite-spec
    * store: component position → (bucket → ref), where each segment
    * holds the SAME full manifest lines re-bucketed by the hash of that
    * component's encoded value (bucket [[CIndexResidue]] collects keys
    * whose arity is not the current spec's — old-era keys, which every
    * partial probe must also consider). Empty when the store is
    * single-column, the newest spec's arity is shared by another
    * recorded era (attribution would be ambiguous), or the head
    * predates the index.
    */
  case class SegHead(nBuckets: Int, total: Int,
      refs: Map[Int, (Int, String)],
      cindex: Map[Int, Map[Int, (Int, String)]] = Map.empty) extends Head {
    def totalEntries: Int = total
  }

  private[storage] def readFileUtf8(fs: org.apache.hadoop.fs.FileSystem,
                                    p: org.apache.hadoop.fs.Path): String = {
    // bulk byte read, not scala.io.Source (whose char-iterator costs ~1 s
    // per MB — measured dominating the 1M-partition manifest rung)
    val in = fs.open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream(64 * 1024)
      val chunk = new Array[Byte](64 * 1024)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Parses flat-format manifest/segment lines (escaped value TAB dirs).
    * Index-walk, not split-regex chains: the 1M-entry rung is driver CPU
    * and allocation bound, so per-line garbage is the constant that shows.
    */
  private[storage] def parseLines(txt: String,
                                  src: String): Map[String, Seq[String]] = {
    val b = Map.newBuilder[String, Seq[String]]
    var start = 0
    val n = txt.length
    while (start < n) {
      var end = txt.indexOf('\n', start)
      if (end < 0) end = n
      if (end > start) {
        val line = txt.substring(start, end)
        val i = line.indexOf('\t')
        // fail FAST on a dir-less line (truncated write, corruption):
        // mapping it to an empty dir list would silently drop the
        // partition's rows from every read instead of surfacing the
        // broken manifest
        require(i > 0 && i < line.length - 1,
          s"malformed manifest line in $src (no dirs): '$line'")
        b += Esc.unescapePathName(line.substring(0, i)) ->
          scala.collection.immutable.ArraySeq.unsafeWrapArray(
            line.substring(i + 1).split("\t"))
      }
      start = end + 1
    }
    b.result()
  }

  private[storage] def serializeEntries(
      entries: Map[String, Seq[String]]): String =
    entries.toSeq.sortBy(_._1)
      .map { case (value, ds) =>
        (Esc.escapePathName(value) +: ds).mkString("\t") }
      .mkString("\n")

  /** Parses `_manifest-<v>` WITHOUT loading segments (O(head file)). */
  private[storage] def readHead(spark: SparkSession, path: String,
                                version: Int): Head = {
    val fs = hfs(spark, path)
    val mf = new org.apache.hadoop.fs.Path(path, s"_manifest-$version")
    require(fs.exists(mf), s"no snapshot version $version at $path")
    val txt = readFileUtf8(fs, mf)
    if (!txt.startsWith(SegMarker + "\t"))
      FlatHead(parseLines(txt, mf.toString))
    else {
      val lines = txt.split("\n").filter(_.nonEmpty)
      val h = lines.head.split("\t")
      require(h.length == 3, s"malformed segment header in $mf")
      // ref lines belong to the MAIN tier until a component-index marker
      // opens a section; each section's refs then belong to it
      val refs = Map.newBuilder[Int, (Int, String)]
      var cur = -1
      val cb = scala.collection.mutable.LinkedHashMap
        .empty[Int, scala.collection.mutable.Builder[
          (Int, (Int, String)), Map[Int, (Int, String)]]]
      lines.tail.foreach { line =>
        val f = line.split("\t")
        require(f.length == 3,
          s"malformed segment ref in $mf: '$line'")
        if (f(0) == CIndexMarker) {
          cur = f(1).toInt
          require(f(2).toInt == h(1).toInt,
            s"component-index bucket count must match the main tier in $mf")
          cb.getOrElseUpdate(cur, Map.newBuilder[Int, (Int, String)])
        } else if (cur < 0) refs += f(0).toInt -> (f(1).toInt, f(2))
        else cb(cur) += f(0).toInt -> (f(1).toInt, f(2))
      }
      SegHead(h(1).toInt, h(2).toInt, refs.result(),
        cb.map { case (ci, b) => ci -> b.result() }.toMap)
    }
  }

  /** Loads one segment. A segment that VANISHED under a retained manifest
    * can only mean a concurrent expire dropped the whole version
    * between our head read and this load — surfaced with the same message
    * as a missing manifest so [[versionVanished]] callers treat both races
    * uniformly; any other corruption stays loud.
    */
  private[storage] def loadSeg(spark: SparkSession, path: String,
                               version: Int,
                               segRel: String): Map[String, Seq[String]] = {
    val fs = hfs(spark, path)
    try parseLines(
      readFileUtf8(fs, new org.apache.hadoop.fs.Path(path, segRel)),
      s"$path/$segRel")
    catch {
      case _: java.io.FileNotFoundException =>
        throw new IllegalArgumentException(
          s"no snapshot version $version at $path — segment $segRel swept " +
            "by a concurrent expire")
    }
  }

  /** value → dirs, the version's FULL entry map. Dir lists are
    * tab-separated: partition VALUES are path-escaped (tab → %09) and dir
    * strings are built from escaped values, so TAB never occurs inside a
    * field. Segmented heads load their segments in parallel (driver
    * threads — segment parses are independent).
    */
  private[storage] def readManifest(spark: SparkSession, path: String,
                                    version: Int): Map[String, Seq[String]] =
    readHead(spark, path, version) match {
      case FlatHead(e) => e
      case SegHead(_, _, refs, _) => loadSegs(spark, path, version,
        refs.values.map(_._2).toSeq)
    }

  /** Parallel load+parse of `segs`, merged into one map. `keep` filters
    * entries INSIDE each segment load, so a filtering scan (compaction
    * discovery) never materializes the store-wide map — only survivors.
    */
  private[storage] def loadSegs(spark: SparkSession, path: String,
      version: Int, segs: Seq[String],
      keep: (String, Seq[String]) => Boolean = (_, _) => true)
      : Map[String, Seq[String]] = {
    if (segs.isEmpty) return Map.empty
    if (segs.size == 1)
      return loadSeg(spark, path, version, segs.head)
        .filter { case (k, ds) => keep(k, ds) }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(16, segs.size))
    try {
      val futs = segs.map { seg =>
        pool.submit(
          new java.util.concurrent.Callable[Map[String, Seq[String]]] {
            def call(): Map[String, Seq[String]] =
              loadSeg(spark, path, version, seg)
                .filter { case (k, ds) => keep(k, ds) }
          })
      }
      // single sized builder pass — a flatMap-then-toMap materializes an
      // intermediate N-tuple Seq that dominated the 1M-entry rung
      val b = Map.newBuilder[String, Seq[String]]
      futs.foreach { f =>
        try b ++= f.get()
        catch { // surface the real parse/race failure, not the wrapper
          case e: java.util.concurrent.ExecutionException =>
            throw e.getCause
        }
      }
      b.result()
    } finally pool.shutdown()
  }

  /** The version's referenced DIRS only — the resolution `read` and
    * `expire` actually need. Skips the value-keyed map entirely (no
    * unescape, no map build — at 1M entries those JVM constants dominate
    * the full-map resolve several-fold): each segment line contributes
    * its post-TAB fields directly.
    */
  private[storage] def readManifestDirs(spark: SparkSession, path: String,
                                        version: Int): Seq[String] =
    readHead(spark, path, version) match {
      case FlatHead(e) => e.values.flatten.toSeq
      case SegHead(_, _, refs, _) =>
        val segs = refs.values.map(_._2).toSeq
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(16, math.max(1, segs.size)))
        try {
          val futs = segs.map { seg =>
            pool.submit(new java.util.concurrent.Callable[Array[String]] {
              def call(): Array[String] = {
                val fs = hfs(spark, path)
                val txt =
                  try readFileUtf8(fs,
                    new org.apache.hadoop.fs.Path(path, seg))
                  catch {
                    case _: java.io.FileNotFoundException =>
                      throw new IllegalArgumentException(
                        s"no snapshot version $version at $path — segment " +
                          s"$seg swept by a concurrent expire")
                  }
                txt.split("\n").filter(_.nonEmpty).flatMap { line =>
                  val i = line.indexOf('\t')
                  require(i > 0 && i < line.length - 1,
                    s"malformed manifest line in $path/$seg (no dirs): " +
                      s"'$line'")
                  line.substring(i + 1).split("\t")
                }
              }
            })
          }
          val b = Seq.newBuilder[String]
          futs.foreach { f =>
            try b ++= f.get()
            catch {
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          }
          b.result()
        } finally pool.shutdown()
    }

  /** The version's entries RESTRICTED to `values` — parses only the
    * buckets those values hash into on a segmented head (O(touched), the
    * manifest-lookup pruning `readPartitions` and `merge` ride on);
    * a flat head is one small parse either way.
    */
  private[storage] def readManifestValues(spark: SparkSession, path: String,
      version: Int, values: Seq[String]): Map[String, Seq[String]] = {
    val vset = values.toSet
    readHead(spark, path, version) match {
      case FlatHead(e) => e.filter { case (k, _) => vset(k) }
      case SegHead(nb, _, refs, _) =>
        val buckets = vset.map(bucketOf(_, nb))
        loadSegs(spark, path, version,
          buckets.toSeq.sorted.flatMap(b => refs.get(b).map(_._2)))
          .filter { case (k, _) => vset(k) }
    }
  }

  /** The version's entries restricted to those whose component `ci`
    * (of the current composite spec) might equal one of the ENCODED
    * `encValues` — the PARTIAL-probe resolution ("day = X, any tenant"):
    * parses only the constrained values' component-index buckets plus
    * the old-era residue bucket, O(touched) in store size. Returns a
    * SUPERSET of the matching entries (hash-bucket grain — the caller's
    * key filter finishes the job); None when the head carries no index
    * for `ci` (flat tier, legacy head, ambiguous spec history) — the
    * caller falls back to the store-wide key filter.
    */
  private[storage] def readManifestComponent(spark: SparkSession,
      path: String, version: Int, ci: Int, encValues: Set[String])
      : Option[Map[String, Seq[String]]] =
    readHead(spark, path, version) match {
      case SegHead(nb, _, _, cidx) if cidx.contains(ci) =>
        val refs = cidx(ci)
        val buckets = encValues.map(bucketOf(_, nb)) + CIndexResidue
        Some(loadSegs(spark, path, version,
          buckets.toSeq.sorted.flatMap(b => refs.get(b).map(_._2))))
      case _ => None
    }

  /** True iff `e` is [[readManifest]]'s missing-version failure — the
    * signature of a version a concurrent expire dropped between a
    * writer resolving it and reading it. Deliberately narrow: the
    * malformed-manifest require stays LOUD through every caller.
    */
  private[storage] def versionVanished(e: IllegalArgumentException): Boolean =
    e.getMessage != null && e.getMessage.contains("no snapshot version")

  // ---- gen-level column-statistics blob codec -----------------------------
  //
  // Each manifest dir field may carry a stats blob for the store's
  // declared stats columns, separated from the dir path by U+0002 — a
  // control character escapePathName always %-escapes, so no partition
  // value or column name can forge it. Grammar per field (v2, r15):
  // `<escaped col>=<code>:<lo>:<hi>:<nulls>:<rows>`, fields ';'-joined;
  // v1 blobs (`<code>:<lo>:<hi>`, pre-r15) parse forever with no counts.
  // Codes: 'l' integral, 'd' floating, 'a' date (epoch days), 't'
  // timestamp (epoch micros), 'n' ntz, 's' string (truncate+increment
  // bounds), 'z' counts-only (no usable bounds: all-NULL slice, NaN
  // min/max, increment overflow, column absent from the gen's files).

  private[storage] val StatsSep = ""

  /** The dir-path part of a manifest dir field (strips the stats blob and
    * any deletion-vector suffix).
    */
  private[storage] def dirOf(field: String): String = {
    val i = field.indexOf(StatsSep)
    val j = field.indexOf(DvSep)
    val cut = (i, j) match {
      case (-1, -1) => return field
      case (-1, b) => b
      case (a, -1) => a
      case (a, b) => math.min(a, b)
    }
    field.substring(0, cut)
  }

  private[storage] def statsOf(field: String): Option[String] = {
    val i = field.indexOf(StatsSep)
    if (i < 0) None
    else {
      val j = field.indexOf(DvSep, i + 1)
      Some(field.substring(i + 1, if (j < 0) field.length else j))
    }
  }

  // ---- deletion-vector suffix (merge-on-read DML, r16) ---------------------
  //
  // A manifest field may carry, after a second control separator U+0003,
  // references to DELETION-VECTOR sidecars: parquet files of (file-key,
  // row-index) pairs naming the field's rows a merge-on-read DELETE/UPDATE
  // logically removed (the Delta/Iceberg deletion-vector concept,
  // re-derived on the store's own manifest). The stats blob stays a
  // description of the dir's PHYSICAL rows -- bounds/null counts are
  // computed over what the files hold -- and the DV overlays it: live rows
  // = physical rows minus DV'd positions. That split keeps every pruning
  // verdict sound unchanged (survivors are a subset of the physical rows
  // the bounds describe) and makes the metadata COUNT exact again with
  // one subtraction (each ref records how many of the FIELD's positions
  // it holds). Grammar: `<dir>[\u0002<blob>][\u0003<rel>,<n>[;<rel>,<n>...]]`
  // where `rel` is the sidecar dir (store-relative, `data/dv-<hex>`) and
  // `n` the field's deleted-position count in it. U+0003 is a control
  // character escapePathName always %-escapes, so no partition value,
  // column name, or stat value can forge the separator.

  private[storage] val DvSep = ""

  /** One deletion-vector reference: the sidecar dir (store-relative) and
    * how many of the carrying FIELD's positions it holds.
    */
  private[storage] case class DvRef(rel: String, deleted: Long)

  /** The field's deletion-vector refs, oldest first; empty when none. */
  private[storage] def dvOf(field: String): Seq[DvRef] = {
    val i = field.indexOf(DvSep)
    if (i < 0) return Nil
    field.substring(i + 1).split(";").toSeq.map { part =>
      val c = part.lastIndexOf(',')
      require(c > 0 && c < part.length - 1 &&
        part.substring(c + 1).forall(_.isDigit),
        s"malformed deletion-vector ref: '$part'")
      DvRef(part.substring(0, c), part.substring(c + 1).toLong)
    }
  }

  /** The field WITHOUT its deletion-vector suffix (dir + stats blob). */
  private[storage] def baseOf(field: String): String = {
    val i = field.indexOf(DvSep)
    if (i < 0) field else field.substring(0, i)
  }

  /** `base` (a dir+blob field) re-annotated with `refs`; no suffix when
    * refs are empty.
    */
  private[storage] def withDv(base: String, refs: Seq[DvRef]): String =
    if (refs.isEmpty) base
    else base + DvSep + refs.map(r => s"${r.rel},${r.deleted}").mkString(";")

  /** The field's identity for version DIFFING: the dir plus the DV
    * suffix, never the stats blob. Dirs are immutable, so equal (dir, DV)
    * identities PROVE identical LIVE rows -- a stats backfill (blob-only
    * change) still yields an empty feed, while a merge-on-read DML commit
    * (DV-only change) correctly reads as "this slice's rows changed".
    */
  private[storage] def identityOf(field: String): String = {
    val i = field.indexOf(DvSep)
    if (i < 0) dirOf(field)
    else dirOf(field) + DvSep + field.substring(i + 1)
  }

  /** String bounds truncate to this many Unicode CODE POINTS — long
    * values (URLs, comments) would otherwise bloat every manifest entry,
    * and 16 code points separate real-world categorical/prefix data
    * (verbs, levels, path prefixes) while keeping the blob ~bounded.
    */
  private[storage] val StatsTruncLen = 16

  private[storage] def truncCodePoints(s: String, n: Int): String =
    if (s.codePointCount(0, s.length) <= n) s
    else s.substring(0, s.offsetByCodePoints(0, n))

  /** The smallest valid string strictly greater than every extension of
    * `t` (code-point order == UTF-8 byte order): increment `t`'s last
    * code point, skipping the surrogate gap (D800-DFFF are not code
    * points a decoded string can carry); a maxed-out (U+10FFFF) tail
    * carries leftward; all-maxed has no successor — None.
    */
  private[storage] def incrementLastCodePoint(t: String): Option[String] = {
    val cps = t.codePoints().toArray
    var i = cps.length - 1
    while (i >= 0) {
      if (cps(i) != 0x10FFFF) {
        val next =
          if (cps(i) + 1 >= 0xD800 && cps(i) + 1 <= 0xDFFF) 0xE000
          else cps(i) + 1
        val out = new java.lang.StringBuilder
        (0 until i).foreach(j => out.appendCodePoint(cps(j)))
        out.appendCodePoint(next)
        return Some(out.toString)
      }
      i -= 1
    }
    None
  }

  /** Iceberg's truncate(N) discipline (a public concept, re-derived):
    * lower bound = min truncated to N code points (a prefix sorts ≤ the
    * full string in UTF-8 byte order); upper bound = max truncated, and
    * when truncation dropped anything, last code point INCREMENTED —
    * every extension of the prefix sorts strictly below the incremented
    * prefix, so the bound stays sound. Increment overflow (an all-
    * U+10FFFF prefix) has no sound upper bound: record nothing, the gen
    * reads conservatively. Values arrive from the gen's own parquet
    * files, so they are valid UTF-8 by construction (no lone-surrogate
    * order hazard between Java's char order and UTF8String's byte
    * order), and all COMPARISONS against these bounds run in UTF8String
    * byte order — the exact order Spark's min/max and string filters
    * use.
    */
  private[storage] def stringBounds(mn: String,
                                    mx: String): Option[(String, String)] = {
    val lo = truncCodePoints(mn, StatsTruncLen)
    val hiT = truncCodePoints(mx, StatsTruncLen)
    val hi = if (hiT == mx) Some(mx) else incrementLastCodePoint(hiT)
    hi.map(h => (lo, h))
  }

  /** Escapes a string bound into the blob grammar: `escapePathName`
    * covers `: = %` and control chars; ';' (the blob's field separator,
    * not in Hive's escape set) is folded to its own %-escape, which the
    * single `unescapePathName` at parse time already decodes.
    */
  private[storage] def escapeStatValue(v: String): String =
    Esc.escapePathName(v).replace(";", "%3B")

  private[storage] def supportedStatsType(
      dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType |
           FloatType | DoubleType | DateType | TimestampType |
           TimestampNTZType | StringType => true
      case _ => false
    }
  }

  private[storage] def statCode(
      dt: org.apache.spark.sql.types.DataType): Char = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => 'l'
      case FloatType | DoubleType => 'd'
      case DateType => 'a'
      case TimestampType => 't'
      case TimestampNTZType => 'n' // naive micros — 't' is UTC-instant
      case StringType => 's'
      case other => throw new IllegalArgumentException(
        s"unsupported stats type $other")
    }
  }

  /** External row value → the blob's canonical string (epoch days for
    * dates, epoch micros for timestamps, plain toString for numbers —
    * deterministic, so identical content serializes identically and
    * content-addressed segments stay shared).
    *
    * FLOAT bounds serialize as their EXACT widened double
    * (`f.doubleValue.toString`), never `Float.toString`: predicates
    * compare in the double domain (a float row widens exactly under a
    * double literal), and Float's shortest round-trip decimal is a
    * DIFFERENT real than the widened double — e.g. 0.1f prints "0.1"
    * but widens to 0.100000001490…, so a blob carrying "0.1" would let
    * `readWhere(f > 0.1)` prune a gen whose rows satisfy the predicate.
    * Double.toString's shortest decimal is order-faithful (distinct
    * doubles → decimals in the same order), so comparing blob decimals
    * as BigDecimal matches comparing the doubles themselves.
    */
  private[storage] def statValue(v: Any): String = v match {
    case d: java.sql.Date => d.toLocalDate.toEpochDay.toString
    case d: java.time.LocalDate => d.toEpochDay.toString
    case t: java.sql.Timestamp =>
      (t.getTime * 1000L + (t.getNanos / 1000L) % 1000L).toString
    case i: java.time.Instant =>
      (i.getEpochSecond * 1000000L + i.getNano / 1000L).toString
    case ldt: java.time.LocalDateTime => // TimestampNTZ: naive micros
      (ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        ldt.getNano / 1000L).toString
    case f: java.lang.Float => f.doubleValue.toString
    case other => other.toString
  }

  /** One column's parsed stats field. `code` is the bound domain ('l'
    * integral, 'd' floating, 'a' date, 't' timestamp, 'n' ntz, 's'
    * string) or [[NoBoundsCode]] when the gen recorded counts but no
    * usable bounds (an all-NULL slice, a NaN-poisoned float min/max, an
    * increment-overflowed string prefix, a declared column ABSENT from
    * the gen's files, an unsupported-bounds type). `nulls`/`rows` are the
    * per-(partition, gen) NULL and total row counts — grammar v2 (r15);
    * v1 blobs parse with None (conservative: NULL predicates don't
    * prune there).
    */
  private[storage] case class ColStat(code: Char, lo: String, hi: String,
                                      nulls: Option[Long], rows: Option[Long],
                                      loExact: Boolean = true,
                                      hiExact: Boolean = true) {
    /** Every row's value is NULL ⟹ any comparison/prefix predicate on
      * the column is NULL for every row (filtered), `IS NOT NULL` never
      * holds. Partition dirs exist only with rows, so rows ≥ 1.
      */
    def allNull: Boolean = nulls.isDefined && nulls == rows
  }

  /** `code` for a counts-only field (no bounds recorded). */
  private[storage] val NoBoundsCode = 'z'

  /** Blob → col → [[ColStat]]. Malformed blobs are LOUD (a manifest
    * carrying a half-written blob is corruption, not a missing feature).
    * Values unescape here (numeric bounds are escape-invariant; string
    * bounds round-trip their one escape), and the `-1` split limit keeps
    * EMPTY string bounds — "" is a legal min — as real fields. Grammar
    * versioning by field count: v1 `<code>:<lo>:<hi>` (pre-r15, no
    * counts), v2 `<code>:<lo>:<hi>:<nulls>:<rows>`, v3 (r16, STRING
    * fields only) `s:<lo>:<hi>:<nulls>:<rows>:<flags>` where `flags` is
    * a bitmask — bit 0 = lo is the EXACT min (untruncated), bit 1 = hi
    * is the EXACT max. Exact string bounds let [[SnapshotStore
    * .minMaxWhere]] serve `min(verb)`/`max(url)` from metadata; a
    * truncated (containing) bound stays sound for pruning but never for
    * serving. Old blobs parse forever (they ride inside
    * content-addressed segments that copy forward verbatim); a v2
    * string field parses as inexact on both sides — conservative.
    * Numeric/temporal bounds are exact by construction.
    */
  private[storage] def parseStats(blob: String): Map[String, ColStat] =
    blob.split(";").filter(_.nonEmpty).map { part =>
      val eq = part.indexOf('=')
      require(eq > 0, s"malformed stats blob field: '$part'")
      val f = part.substring(eq + 1).split(":", -1)
      require((f.length == 3 || f.length == 5 || f.length == 6) &&
        f(0).length == 1,
        s"malformed stats blob field: '$part'")
      val counts =
        if (f.length == 3) (None, None)
        else {
          require(f(3).forall(_.isDigit) && f(4).forall(_.isDigit) &&
            f(3).nonEmpty && f(4).nonEmpty,
            s"malformed stats blob counts: '$part'")
          (Some(f(3).toLong), Some(f(4).toLong))
        }
      val code = f(0).head
      val flags =
        if (f.length == 6) {
          require(f(5).nonEmpty && f(5).forall(_.isDigit),
            s"malformed stats blob flags: '$part'")
          f(5).toInt
        }
        // v1/v2 string bounds carry no exactness proof; non-strings are
        // exact by construction
        else if (code == 's') 0 else 3
      Esc.unescapePathName(part.substring(0, eq)) ->
        ColStat(code, Esc.unescapePathName(f(1)),
          Esc.unescapePathName(f(2)), counts._1, counts._2,
          loExact = (flags & 1) != 0, hiExact = (flags & 2) != 0)
    }.toMap

  // ---- logical-name layer (`_renames-<v>`) parsing ------------------------

  /** The tombstone "logical name" marking a DROPPED physical column inside
    * the `_renames-<v>` mapping: a drop is a rename onto this sentinel, so
    * every carrier the logical-name layer already has — commit
    * carry-forward, rollback restore (the target's mapping IS its dropped
    * set), expire sweep, the retired-physical-name write guard — serves
    * drops with no second metadata file. The sentinel is a control
    * character: `escapePathName` %-escapes it in the file, and column
    * names are validated against control characters, so no user column
    * can collide with it.
    */
  private[storage] val Dropped = "dropped"

  /** physical → logical for version `v`; empty when never renamed. Entries
    * whose logical name is [[Dropped]] mark dropped physical columns.
    */
  private[storage] def readRenames(spark: SparkSession, path: String,
                                   v: Int): Map[String, String] = {
    val fs = hfs(spark, path)
    val p = new org.apache.hadoop.fs.Path(path, s"_renames-$v")
    if (!fs.exists(p)) Map.empty
    else readFileUtf8(fs, p).split("\n").filter(_.nonEmpty).map { line =>
      val f = line.split("\t")
      require(f.length == 2, s"malformed rename line in $p: '$line'")
      Esc.unescapePathName(f(0)) -> Esc.unescapePathName(f(1))
    }.toMap
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.storage.SnapshotStore

/** Randomized multi-writer soak over [[SnapshotStore]] — the composition
  * proof on top of the pairwise `beforeCommit` race seams: N concurrent
  * writers interleave appends (idempotency-keyed), merges (retried),
  * compactions, and retention sweeps against ONE store, under a seeded
  * schedule, and every lakehouse invariant must hold at the end. Races
  * that only emerge from composition (append landing mid-merge-retry,
  * expire sweeping under a compaction, dir lists growing while a merge
  * rewrites the partition) are the classic multi-writer failure mode the
  * pairwise specs cannot see.
  *
  * Determinism argument: writers own DISJOINT key spaces (writer w merges
  * only key w; appends use globally-unique keys), so the final head
  * content is schedule-independent — base ∪ appended rows ∪ each
  * writer's last merged value — even though the store's serialization
  * order is not.
  */
class SnapshotSoakSpec extends SparkSpec {
  import spark.implicits._

  test("seeded 3-writer soak of append/merge/compact/expire: head content " +
    "exact, every retained version readable, no dangling or leaked dirs") {
    val dir = java.nio.file.Files.createTempDirectory("graft_soak")
      .toString + "/st"
    val nWriters = 3
    val opsPer = 6
    val seed = 20260814

    val base = Seq((0L, "p0", 0.0), (1L, "p1", 0.0),
      (2L, "p2", 0.0), (3L, "p3", 0.0))
    SnapshotStore.write(base.toDF("k", "p", "v"), dir, "p")

    val errors = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]
    val appendedRows =
      new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Double)]
    val lastMerged = new Array[Option[Double]](nWriters)
    (0 until nWriters).foreach(lastMerged(_) = None)

    val threads = (0 until nWriters).map { w =>
      new Thread(() => {
        val r = new scala.util.Random(seed + w)
        try {
          (0 until opsPer).foreach { i =>
            r.nextInt(4) match {
              case 0 => // idempotency-keyed append of a globally-unique key
                val row = (w * 1000L + i, s"p${r.nextInt(4)}", i * 1.0)
                SnapshotStore.append(Seq(row).toDF("k", "p", "v"), dir, "p",
                  idempotencyKey = Some(s"w$w-b$i"), maxRetries = 50)
                appendedRows.add(row)
              case 1 => // retried upsert of the writer's OWN key
                val v = i * 10.0 + w
                SnapshotStore.mergeWithRetry(spark, dir,
                  Seq((w.toLong, s"p$w", v)).toDF("k", "p", "v"),
                  "p", Seq("k"), maxRetries = 50)
                lastMerged(w) = Some(v)
              case 2 => // maintenance: CAS loss is a documented re-call
                try SnapshotStore.compactPartitions(spark, dir, "p")
                catch { case _: java.util.ConcurrentModificationException => }
              case 3 => // retention with the default orphan-age floor; keep
                // comfortably exceeds commits any in-flight op can overlap
                SnapshotStore.expire(spark, dir, keep = 8)
            }
          }
        } catch { case t: Throwable => errors.add(t) }
      }, s"soak-writer-$w")
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000))
    assert(errors.isEmpty, {
      val sw = new java.io.StringWriter
      errors.forEach(_.printStackTrace(new java.io.PrintWriter(sw)))
      s"soak writers threw:\n$sw"
    })

    // expected head content is schedule-independent (disjoint key spaces)
    val expected: Map[Long, (String, Double)] =
      base.map(r => r._1 -> (r._2, r._3)).toMap ++
        (0 until nWriters).flatMap(w =>
          lastMerged(w).map(v => w.toLong -> (s"p$w", v))).toMap ++
        {
          val b = Map.newBuilder[Long, (String, Double)]
          appendedRows.forEach(r => b += (r._1 -> (r._2, r._3)))
          b.result()
        }
    def headMap() = SnapshotStore.read(spark, dir)
      .select("k", "p", "v").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(headMap() == expected,
      s"head diverged from the serialized expectation")

    // every retained version is readable and references only live dirs
    // (no bound on retained.size here: how many commits land AFTER a
    // writer's last expire is schedule-dependent; retention efficacy is
    // proven by the quiescent sweeps below)
    val retained = new java.io.File(dir).listFiles().map(_.getName)
      .collect { case n if n.startsWith("_manifest-") =>
        n.stripPrefix("_manifest-").toInt }.sorted.toSeq
    assert(retained.nonEmpty, "no retained manifests after the soak")
    retained.foreach { v =>
      SnapshotStore.readManifest(spark, dir, v).values.flatten.foreach(d =>
        assert(new java.io.File(s"$dir/$d").isDirectory,
          s"retained manifest v$v references a dangling dir: $d"))
      SnapshotStore.read(spark, dir, Some(v)).count() // must not throw
    }
    // no partition's dir list holds duplicates at head
    SnapshotStore.readManifest(spark, dir, retained.max).foreach {
      case (p, ds) =>
        assert(ds.distinct == ds, s"partition $p lists a dir twice: $ds")
    }

    // final quiescent sweep: with no writer live, a zero-floor expire must
    // leave EXACTLY the head's referenced gens (no leaked stage dirs, no
    // unreferenced survivors) and the head content intact
    SnapshotStore.expire(spark, dir, keep = 1, minAgeMs = 0L)
    val headGens = SnapshotStore
      .readManifest(spark, dir, SnapshotStore.headVersion(spark, dir).get)
      .values.flatten.map(_.split("/").take(2).mkString("/")).toSet
    val onDisk = new java.io.File(s"$dir/data").listFiles()
      .map("data/" + _.getName).toSet
    assert(onDisk == headGens,
      s"quiescent sweep mismatch — leaked: ${onDisk -- headGens}, " +
        s"dangling: ${headGens -- onDisk}")
    assert(headMap() == expected, "final sweep changed head content")
  }
}

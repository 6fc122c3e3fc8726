package graft.streaming

import java.io.{BufferedReader, InputStreamReader}
import java.net.{DatagramPacket, DatagramSocket, InetAddress, ServerSocket, Socket}
import java.nio.charset.StandardCharsets
import java.util.UUID
import java.util.concurrent.atomic.AtomicLong

import scala.collection.mutable.ArrayBuffer

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataOutputStream, FileSystem, Path}

/** Durable syslog transport: receiver → rolling spool files → Spark's
  * checkpointed file source.
  *
  * The TCP/UDP `MicroBatchStream` sources ([[UdpSyslogProvider]],
  * `Syslog.Tcp`) buffer frames in the driver JVM: every log line in the
  * cluster funnels through one heap, and an in-flight buffer dies with the
  * driver. This module is the production path the reference's own sink
  * implies (`/root/reference/nginx.conf:59-64` — omclickhouse's async
  * action queue persists actions before shipping, at-least-once): frames
  * reach DISK before Spark ever sees them, and the file source supplies
  * replayable, checkpointed offsets on top.
  *
  * Topology at scale: N receivers — plain JVM processes on the ingest
  * nodes, NOT inside the Spark driver — each append frames to their own
  * rolling spool files on shared storage (HDFS/NFS/object-FS via the
  * Hadoop `FileSystem` API); ONE Structured Streaming query tails the
  * directory. Read parallelism = spool files per micro-batch (each
  * receiver rolls independently, so a busy fleet yields many files);
  * adding ingest capacity = starting another receiver, no Spark change.
  *
  * Durability contract, made of two barriers:
  *  1. '''sync-then-rename''': a spool file is written under a
  *     dot-prefixed temp name (invisible to Spark's file listing), synced
  *     (`hsync`, falling back to `hflush` where the FS doesn't support
  *     it), then atomically renamed into visibility. Spark can never
  *     observe a torn file.
  *  2. '''file-source checkpoint''': once visible, replay/exactly-once is
  *     the file source's standard contract — a restarted query re-reads
  *     nothing it committed and misses nothing it hadn't.
  * Frames still in an unrolled temp file when a RECEIVER dies are lost —
  * bounded by `rollBytes`/`rollMillis`, the same window rsyslog's async
  * action queue accepts (`nginx.conf:59`) — and UDP is at-most-once at the
  * wire like any imudp deployment. Everything after the rename is
  * effectively-once.
  */
object SyslogSpool {

  /** A rolling frame spool: thread-safe `append`, size/age-based rolls,
    * sync-then-rename visibility. One instance per receiver; file names
    * carry a per-spool UUID so any number of receivers can share `dir`.
    *
    * @param rollBytes  roll once the current file reaches this many bytes
    * @param rollMillis roll a non-empty file this old even if small, so
    *                   frames never sit invisible on a quiet receiver
    */
  final class Spool(dir: String, rollBytes: Long = 16L << 20,
                    rollMillis: Long = 2000L) extends AutoCloseable {
    private val id = UUID.randomUUID().toString.take(8)
    private val fs = {
      val p = new Path(dir)
      val f = p.getFileSystem(new Configuration())
      f.mkdirs(p)
      f
    }
    private var out: FSDataOutputStream = _
    private var tmp: Path = _
    private var bytes = 0L
    private var openedAt = 0L
    private val seq = new AtomicLong(0L)
    @volatile private var closed = false

    // ages out small files on quiet links; daemon so it never pins the JVM.
    // A failed roll (transient FS error) must not kill the thread — the
    // rollMillis durability bound holds as long as the roller lives, so it
    // retries on the next tick; roll() itself resets the stream state, so a
    // retry starts a fresh file. InterruptedException stays fatal (close()).
    private val roller = new Thread(s"graft-spool-roller-$id") {
      setDaemon(true)
      override def run(): Unit =
        try {
          while (!closed) {
            Thread.sleep(math.max(rollMillis / 2, 50L))
            try Spool.this.synchronized {
              if (bytes > 0 && System.currentTimeMillis() - openedAt >= rollMillis)
                roll()
            } catch { case scala.util.control.NonFatal(_) => () }
          }
        } catch { case _: InterruptedException => () }
    }
    roller.start()

    /** Appends one frame. Embedded newlines are folded to spaces so the
      * one-frame-per-line invariant of the text source holds (the same
      * normalization rsyslog applies to control characters on receive).
      */
    def append(frame: String): Unit = synchronized {
      if (closed) throw new IllegalStateException("spool closed")
      if (out == null) {
        tmp = new Path(dir, s".spool-$id-${seq.get()}.tmp")
        out = fs.create(tmp, true)
        bytes = 0L
        openedAt = System.currentTimeMillis()
      }
      val b = (frame.replace('\n', ' ').replace('\r', ' ') + "\n")
        .getBytes(StandardCharsets.UTF_8)
      out.write(b)
      bytes += b.length
      if (bytes >= rollBytes ||
          System.currentTimeMillis() - openedAt >= rollMillis) roll()
    }

    /** Makes every appended frame durable and visible now. */
    def rollNow(): Unit = synchronized { if (bytes > 0) roll() }

    // sync-then-rename: the visibility barrier (contract point 1 above).
    // Stream state is detached FIRST: if sync/close/rename throws, the
    // spool's loss is bounded to that one temp file (the documented
    // unrolled-file window) and the next append opens a fresh file instead
    // of writing to a closed stream forever.
    private def roll(): Unit = {
      val (o, t) = (out, tmp)
      out = null; tmp = null; bytes = 0L
      try o.hsync()
      catch { case _: UnsupportedOperationException => o.hflush() }
      o.close()
      val fin = new Path(dir, s"spool-$id-${seq.getAndIncrement()}.log")
      if (!fs.rename(t, fin))
        throw new java.io.IOException(s"spool rename failed: $t -> $fin")
    }

    override def close(): Unit = synchronized {
      if (!closed) {
        closed = true
        roller.interrupt()
        if (out != null) {
          if (bytes > 0) roll()
          else { out.close(); fs.delete(tmp, false) }
        }
      }
    }
  }

  /** RFC 5426 datagram receiver writing straight to a [[Spool]] — the
    * durable imudp analog. One datagram = one frame; nothing is buffered
    * beyond the in-progress spool file.
    */
  final class UdpReceiver(port: Int, spool: Spool,
                          bind: String = "127.0.0.1") extends AutoCloseable {
    private val socket = new DatagramSocket(port, InetAddress.getByName(bind))
    def boundPort: Int = socket.getLocalPort
    private val thread = new Thread(s"graft-spool-udp-$boundPort") {
      setDaemon(true)
      override def run(): Unit = {
        val buf = new Array[Byte](UdpSyslog.MaxFrame)
        try {
          while (!socket.isClosed) {
            val pkt = new DatagramPacket(buf, buf.length)
            socket.receive(pkt)
            spool.append(new String(pkt.getData, pkt.getOffset, pkt.getLength,
              StandardCharsets.UTF_8))
          }
        } catch { case _: java.net.SocketException => () /* closed */ }
      }
    }
    thread.start()
    override def close(): Unit = socket.close()
  }

  /** Octet-stuffed (newline-framed) TCP receiver writing to a [[Spool]] —
    * the durable imtcp analog. Accepts any number of concurrent senders.
    */
  final class TcpReceiver(port: Int, spool: Spool,
                          bind: String = "127.0.0.1") extends AutoCloseable {
    private val server = new ServerSocket(port, 64, InetAddress.getByName(bind))
    def boundPort: Int = server.getLocalPort
    private val conns = new ArrayBuffer[Socket]
    private val acceptor = new Thread(s"graft-spool-tcp-$boundPort") {
      setDaemon(true)
      override def run(): Unit =
        try {
          while (!server.isClosed) {
            val sock = server.accept()
            conns.synchronized { conns += sock }
            val h = new Thread(() => {
              try {
                val in = new BufferedReader(new InputStreamReader(
                  sock.getInputStream, StandardCharsets.UTF_8))
                var line = in.readLine()
                while (line != null) { spool.append(line); line = in.readLine() }
              } catch { case _: java.io.IOException => () }
              finally {
                sock.close()
                conns.synchronized { conns -= sock } // no leak across senders
              }
            })
            h.setDaemon(true); h.start()
          }
        } catch { case _: java.net.SocketException => () /* closed */ }
    }
    acceptor.start()
    override def close(): Unit = {
      server.close()
      conns.synchronized { conns.foreach(s => try s.close() catch { case _: Throwable => () }) }
    }
  }
}

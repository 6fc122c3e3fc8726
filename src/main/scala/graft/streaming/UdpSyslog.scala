package graft.streaming

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets
import java.util

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Syslog-over-UDP (RFC 5426) micro-batch source — the `imudp` analog to
  * the TCP path in [[Syslog.fromSocket]].
  *
  * One datagram = one syslog frame (RFC 5426 §3.1); the receiver thread
  * buffers frames driver-side and each micro-batch drains the buffer — the
  * same dev-grade durability contract as Spark's built-in `socket` source
  * (no replay past a restart; a production deployment fronts receivers with
  * a durable bus — see [[Syslog.SyslogSource]]). Offsets are a monotone
  * frame counter; `commit` trims everything at or below the committed mark.
  *
  * Usage: `spark.readStream.format(classOf[UdpSyslogProvider].getName)
  * .option("port", p).load()` → single `line STRING` column.
  */
class UdpSyslogProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    UdpSyslog.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new UdpSyslogTable(properties.getOrDefault("port", "0").toInt,
      properties.getOrDefault("bind", "127.0.0.1"))
  override def supportsExternalMetadata(): Boolean = false
}

object UdpSyslog {
  val Schema: StructType = StructType(Seq(StructField("line", StringType)))

  /** Max syslog datagram we accept; RFC 5426 §3.2 requires ≥ 480 and
    * recommends up to the path MTU — 64 KiB covers any UDP payload.
    */
  val MaxFrame = 65535
}

class UdpSyslogTable(port: Int, bind: String) extends Table with SupportsRead {
  override def name(): String = s"udp-syslog:$bind:$port"
  override def schema(): StructType = UdpSyslog.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = UdpSyslog.Schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new UdpSyslogStream(port, bind)
      }
    }
}

case class UdpOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

class UdpSyslogStream(port: Int, bind: String) extends MicroBatchStream {

  // frames(i) holds the frame at offset base + i + 1 (offset = count seen)
  private val frames = new ArrayBuffer[UTF8String]
  private var base = 0L
  private var seen = 0L

  private val socket = new DatagramSocket(port, InetAddress.getByName(bind))

  /** The actually-bound port (for tests binding port 0). */
  def boundPort: Int = socket.getLocalPort

  private val receiver = new Thread(s"graft-udp-syslog-$port") {
    setDaemon(true)
    override def run(): Unit = {
      val buf = new Array[Byte](UdpSyslog.MaxFrame)
      try {
        while (!socket.isClosed) {
          val pkt = new DatagramPacket(buf, buf.length)
          socket.receive(pkt)
          val line = new String(pkt.getData, pkt.getOffset, pkt.getLength,
            StandardCharsets.UTF_8)
          UdpSyslogStream.this.synchronized {
            frames += UTF8String.fromString(line)
            seen += 1
          }
        }
      } catch {
        case _: java.net.SocketException => // closed in stop()
      }
    }
  }
  receiver.start()

  override def initialOffset(): Offset = UdpOffset(0L)
  override def latestOffset(): Offset = synchronized { UdpOffset(seen) }
  override def deserializeOffset(json: String): Offset = UdpOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val (s, e) = (start.asInstanceOf[UdpOffset].n, end.asInstanceOf[UdpOffset].n)
    val slice = synchronized {
      frames.slice((s - base).toInt, (e - base).toInt).map(_.toString).toArray
    }
    if (slice.isEmpty) Array.empty
    else Array(UdpFramesPartition(slice))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val lines = p.asInstanceOf[UdpFramesPartition].lines
        new PartitionReader[InternalRow] {
          private var i = -1
          override def next(): Boolean = { i += 1; i < lines.length }
          override def get(): InternalRow =
            InternalRow(UTF8String.fromString(lines(i)))
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = synchronized {
    val upTo = end.asInstanceOf[UdpOffset].n
    val drop = (upTo - base).toInt
    if (drop > 0) { frames.remove(0, math.min(drop, frames.length)); base = upTo }
  }

  override def stop(): Unit = socket.close()
}

case class UdpFramesPartition(lines: Array[String]) extends InputPartition

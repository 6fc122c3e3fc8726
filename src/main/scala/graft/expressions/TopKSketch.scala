package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a `TypedImperativeAggregate` — the
  * top-k operator for 100 TB streams where a full `groupBy(key).count()`
  * shuffle of every distinct key is the bottleneck. Fixed memory: at most
  * `capacity` counters per partition; partial sketches merge associatively,
  * so the plan is one partial-agg pass + a tiny final merge — no shuffle of
  * per-key rows at all.
  *
  * Approximation: counts are upper bounds with error ≤ N/capacity; any key
  * with true frequency > N/capacity is guaranteed present (classic
  * SpaceSaving bound). Unit-tested against exact counts on skewed data;
  * not oracle-declared (merge order affects non-heavy tail counts).
  */
object TopKSketch {

  case class Buffer(counts: mutable.LinkedHashMap[String, Long],
                    var error: mutable.LinkedHashMap[String, Long])

  case class TopKAgg(child: Expression, k: Int, capacity: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buffer] {

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType), StructField("cnt", LongType))))
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): Buffer =
      Buffer(mutable.LinkedHashMap.empty, mutable.LinkedHashMap.empty)

    private def bump(b: Buffer, item: String, by: Long, err: Long): Unit = {
      if (b.counts.contains(item)) b.counts(item) += by
      else if (b.counts.size < capacity) {
        b.counts(item) = by + err
        if (err > 0) b.error(item) = err
      } else {
        // evict the current minimum; the newcomer inherits its count bound
        val (minItem, minCnt) = b.counts.minBy(_._2)
        b.counts.remove(minItem); b.error.remove(minItem)
        b.counts(item) = minCnt + by
        b.error(item) = minCnt
      }
    }

    override def update(b: Buffer, input: InternalRow): Buffer = {
      val v = child.eval(input)
      if (v != null) bump(b, v.toString, 1L, 0L)
      b
    }

    override def merge(b: Buffer, other: Buffer): Buffer = {
      other.counts.foreach { case (item, cnt) =>
        val err = other.error.getOrElse(item, 0L)
        bump(b, item, cnt - err, err)
      }
      b
    }

    override def eval(b: Buffer): Any = {
      val top = b.counts.toSeq.sortBy { case (i, c) => (-c, i) }.take(k)
      new GenericArrayData(top.map { case (i, c) =>
        InternalRow(UTF8String.fromString(i), c)
      }.toArray[Any])
    }

    override def serialize(b: Buffer): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val out = new java.io.DataOutputStream(bos)
      out.writeInt(b.counts.size)
      b.counts.foreach { case (i, c) =>
        val bytes = i.getBytes("UTF-8")
        out.writeInt(bytes.length); out.write(bytes)
        out.writeLong(c); out.writeLong(b.error.getOrElse(i, 0L))
      }
      out.flush(); bos.toByteArray
    }

    override def deserialize(bytes: Array[Byte]): Buffer = {
      val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
      val n = in.readInt()
      val b = createAggregationBuffer()
      (0 until n).foreach { _ =>
        val len = in.readInt(); val arr = new Array[Byte](len); in.readFully(arr)
        val item = new String(arr, "UTF-8")
        val cnt = in.readLong(); val err = in.readLong()
        b.counts(item) = cnt
        if (err > 0) b.error(item) = err
      }
      b
    }

    override def withNewMutableAggBufferOffset(o: Int): TopKAgg =
      copy(mutableAggBufferOffset = o)
    override def withNewInputAggBufferOffset(o: Int): TopKAgg =
      copy(inputAggBufferOffset = o)
    override protected def withNewChildrenInternal(
        c: IndexedSeq[Expression]): TopKAgg = copy(child = c.head)
  }

  def register(spark: org.apache.spark.sql.SparkSession, k: Int = 10,
               capacity: Int = 1000): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_topk", es => TopKAgg(es.head, k, capacity).toAggregateExpression(),
      "built-in")

  def topk(col: Column): Column =
    org.apache.spark.sql.functions.call_function("graft_topk", col)
}

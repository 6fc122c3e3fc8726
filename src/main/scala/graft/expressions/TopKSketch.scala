package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a `TypedImperativeAggregate` — the
  * top-k operator for 100 TB streams where a full `groupBy(key).count()`
  * shuffle of every distinct key is the bottleneck. Fixed memory: at most
  * `capacity` counters per partition; partial sketches merge associatively,
  * so the plan is one partial-agg pass + a tiny final merge — no shuffle of
  * per-key rows at all.
  *
  * The buffer is a stream-summary: a counts map plus a count-ordered bucket
  * index (TreeMap count → items), so eviction of the current minimum is
  * O(log buckets) instead of an O(capacity) scan — adversarial
  * high-cardinality input stays O(rows · log capacity) (TopKSketchSpec has a
  * ≫capacity stress test).
  *
  * Approximation: counts are upper bounds; `count − error` is a lower bound
  * (error terms combine additively through merges, so the invariant survives
  * partial-aggregation in any order). Any key with true frequency > N/capacity
  * is guaranteed present (classic SpaceSaving bound). Unit-tested against
  * exact counts on skewed data; not oracle-declared (merge order affects
  * non-heavy tail counts).
  */
object TopKSketch {

  /** counts/error hold the sketch state; `index` is a count-ordered view
    * (count → sorted item set) maintained incrementally for O(log n) min
    * lookup and eviction. Items within a bucket are kept sorted so eviction
    * is deterministic (smallest count, lexicographically first item).
    */
  class Buffer {
    val counts = mutable.HashMap.empty[String, Long]
    val error = mutable.HashMap.empty[String, Long]
    val index = new java.util.TreeMap[Long, java.util.TreeSet[String]]()

    def indexAdd(item: String, cnt: Long): Unit = {
      var set = index.get(cnt)
      if (set == null) { set = new java.util.TreeSet[String](); index.put(cnt, set) }
      set.add(item)
    }

    def indexRemove(item: String, cnt: Long): Unit = {
      val set = index.get(cnt)
      if (set != null) { set.remove(item); if (set.isEmpty) index.remove(cnt) }
    }
  }

  case class TopKAgg(child: Expression, k: Int, capacity: Int,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[Buffer] {

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("item", StringType), StructField("cnt", LongType))))
    override def nullable: Boolean = false
    override def children: Seq[Expression] = Seq(child)

    override def createAggregationBuffer(): Buffer = new Buffer

    private def bump(b: Buffer, item: String, by: Long, err: Long): Unit = {
      b.counts.get(item) match {
        case Some(old) =>
          // the stored count is an UPPER bound, so the incoming error term
          // joins the count too (old + (cnt-err) + err = old + cnt); error
          // terms combine additively (upper/lower bounds both survive)
          b.counts(item) = old + by + err
          if (err > 0) b.error(item) = b.error.getOrElse(item, 0L) + err
          b.indexRemove(item, old); b.indexAdd(item, old + by + err)
        case None if b.counts.size < capacity =>
          b.counts(item) = by + err
          if (err > 0) b.error(item) = err
          b.indexAdd(item, by + err)
        case None =>
          // evict the minimum (deterministic: first item of the lowest
          // bucket); the newcomer inherits that count as its error bound
          val minEntry = b.index.firstEntry()
          val minCnt = minEntry.getKey
          val minItem = minEntry.getValue.first()
          b.counts.remove(minItem); b.error.remove(minItem)
          b.indexRemove(minItem, minCnt)
          b.counts(item) = minCnt + by + err
          b.error(item) = minCnt + err
          b.indexAdd(item, minCnt + by + err)
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
        b.indexAdd(item, cnt)
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

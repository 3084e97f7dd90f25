package graft.ops

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded-memory per-key top-k as a custom `TypedImperativeAggregate`
  * — the aggregation window `row_number` can't give you:
  *
  *  - `row_number().over(partitionBy(key).orderBy(score))` SORTS every
  *    group's full row set through the shuffle before discarding all
  *    but k rows — at 100 TB the shuffle carries the corpus.
  *  - this aggregate keeps a k-bounded heap per group and participates
  *    in PARTIAL aggregation: each map task reduces its slice to ≤ k
  *    entries per key before the exchange, so the shuffle carries at
  *    most k·keys·tasks entries — the classic combiner-style top-k.
  *
  * Semantics: top `k` (score DESC, ties to the LOWEST id) of
  * (score: Double, id: Long) pairs, returned as an array of structs in
  * rank order. Null scores/ids are skipped. Deterministic: the
  * (score, id) order is total.
  *
  * The buffer serializes as plain (count, pairs) bytes for the
  * partial/final exchange; `ObjectHashAggregate` executes it (assert
  * via plan audit), falling back to sort-based aggregation only under
  * memory pressure.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.PriorityQueue[(Double, Long)]]
  with ImplicitCastInputTypes {

  require(k >= 1, s"top_k_by_score: k must be >= 1, got $k")

  // Analysis-time contract: coercible inputs (int score, int id, …)
  // get implicit casts; incoercible ones fail analysis with a typed
  // error instead of a mid-job executor ClassCastException.
  override def inputTypes: Seq[org.apache.spark.sql.graftbridge.Bridge.AbstractType] =
    Seq(DoubleType, LongType)

  // Worst-first: the queue head is the eviction candidate — lowest
  // score, ties to the HIGHEST id (so ids ascend on equal score).
  private def worstFirst: Ordering[(Double, Long)] =
    Ordering.by((t: (Double, Long)) => (-t._1, t._2))

  override def children: Seq[Expression] = Seq(score, id)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): mutable.PriorityQueue[(Double, Long)] =
    mutable.PriorityQueue.empty(worstFirst)

  private def offer(
      q: mutable.PriorityQueue[(Double, Long)], s: Double, i: Long): Unit = {
    if (q.size < k) q.enqueue((s, i))
    else {
      val (ws, wi) = q.head
      if (s > ws || (s == ws && i < wi)) { q.dequeue(); q.enqueue((s, i)) }
    }
  }

  override def update(
      q: mutable.PriorityQueue[(Double, Long)],
      input: InternalRow): mutable.PriorityQueue[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      offer(q, s.asInstanceOf[Double], i.asInstanceOf[Long])
    q
  }

  override def merge(
      q: mutable.PriorityQueue[(Double, Long)],
      other: mutable.PriorityQueue[(Double, Long)]): mutable.PriorityQueue[(Double, Long)] = {
    other.foreach { case (s, i) => offer(q, s, i) }
    q
  }

  override def eval(q: mutable.PriorityQueue[(Double, Long)]): Any = {
    val ranked = q.toArray.sortBy(t => (-t._1, t._2)) // score desc, id asc
    new GenericArrayData(ranked.map { case (s, i) => InternalRow(s, i) })
  }

  override def serialize(q: mutable.PriorityQueue[(Double, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(q.size)
    q.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.PriorityQueue[(Double, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val q = createAggregationBuffer()
    val n = in.readInt()
    var j = 0
    while (j < n) { q.enqueue((in.readDouble(), in.readLong())); j += 1 }
    q
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKByScore =
    copy(score = newChildren(0), id = newChildren(1))
}

object TopKByScore {
  import org.apache.spark.sql.graftbridge.Bridge

  /** DataFrame-API surface: `df.groupBy(key).agg(topK($"score", $"id", 3))`. */
  def topK(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())
}

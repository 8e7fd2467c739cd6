package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import java.nio.ByteBuffer

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs.
  * Array-backed with lazy worst tracking — update is O(1) amortized until
  * full, O(k) on eviction scan (k is small: 5-100). With `withPayload`,
  * each entry also carries an opaque long-array payload (e.g. a vector
  * preview) so the top-k result needs no re-join back to the source. */
final class TopKBuffer(val k: Int, val distinctIds: Boolean = false,
                       val withPayload: Boolean = false) {
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  val payloads: Array[Array[Long]] = if (withPayload) new Array[Array[Long]](k) else null
  var size = 0

  @inline private def worse(s1: Double, i1: Long, s2: Double, i2: Long): Boolean =
    s1 < s2 || (s1 == s2 && i1 > i2)

  private def worstIdx: Int = {
    var w = 0
    var i = 1
    while (i < size) {
      if (worse(scores(i), ids(i), scores(w), ids(w))) w = i
      i += 1
    }
    w
  }

  def add(score: Double, id: Long): Unit = add(score, id, null)

  def add(score: Double, id: Long, payload: Array[Long]): Unit = {
    if (distinctIds) {
      // dedup by id: keep the better (score, id) entry. With per-id-unique
      // scores (the LSH case) this equals pre-deduplicating the input,
      // letting plans drop their distinct() exchange.
      var i = 0
      while (i < size) {
        if (ids(i) == id) {
          if (worse(scores(i), ids(i), score, id)) {
            scores(i) = score
            if (withPayload) payloads(i) = payload
          }
          return
        }
        i += 1
      }
    }
    if (size < k) {
      scores(size) = score; ids(size) = id
      if (withPayload) payloads(size) = payload
      size += 1
    } else if (k > 0) {
      val w = worstIdx
      if (worse(scores(w), ids(w), score, id)) {
        scores(w) = score; ids(w) = id
        if (withPayload) payloads(w) = payload
      }
    }
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) {
      add(o.scores(i), o.ids(i), if (o.payloads != null) o.payloads(i) else null)
      i += 1
    }
  }

  /** Buffer indices sorted score desc, id asc. */
  def sortedIdx: Array[Int] =
    (0 until size).toArray.sortBy(i => (-scores(i), ids(i)))

  /** (score, id) pairs sorted score desc, id asc. */
  def sorted: Array[(Double, Long)] = sortedIdx.map(i => (scores(i), ids(i)))
}

/** Grouped partial+final top-k as a real aggregate function: map-side
  * combine keeps only k rows per group per partition, so grouped top-k
  * shuffles O(groups x k) instead of all scored rows (the reference's
  * per-worker top_m=100 then global merge — worker_tasks.py:150,166-168,
  * query_service.py:186-192 — as one Catalyst aggregate).
  *
  * Usage: df.groupBy("query_id").agg(top_k_by_score(score, id, k)) ->
  * array<struct<score double, id long>> sorted score desc, id asc.
  */
case class TopKByScore(
    scoreExpr: Expression,
    idExpr: Expression,
    k: Int,
    distinctIds: Boolean = false,
    payloadExpr: Option[Expression] = None,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def children: Seq[Expression] = Seq(scoreExpr, idExpr) ++ payloadExpr
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false)) ++
      payloadExpr.map(_ =>
        StructField("preview", ArrayType(LongType, containsNull = false), nullable = true))),
    containsNull = false)

  override def createAggregationBuffer(): TopKBuffer =
    new TopKBuffer(k, distinctIds, payloadExpr.isDefined)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = scoreExpr.eval(input)
    val i = idExpr.eval(input)
    if (s != null && i != null) {
      val p = payloadExpr match {
        case Some(e) =>
          e.eval(input) match {
            case a: org.apache.spark.sql.catalyst.util.ArrayData => a.toLongArray()
            case _ => null
          }
        case None => null
      }
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long], p)
    }
    buf
  }

  override def merge(buf: TopKBuffer, other: TopKBuffer): TopKBuffer = {
    buf.mergeFrom(other); buf
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows: Array[Any] = buf.sortedIdx.map { i =>
      if (buf.withPayload) {
        val p = buf.payloads(i)
        new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i),
          if (p == null) null else new GenericArrayData(p)))
      } else new GenericInternalRow(Array[Any](buf.scores(i), buf.ids(i)))
    }
    new GenericArrayData(rows)
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    var payloadBytes = 0
    if (buf.withPayload) {
      var i = 0
      while (i < buf.size) {
        payloadBytes += 4 + (if (buf.payloads(i) == null) 0 else buf.payloads(i).length * 8)
        i += 1
      }
    }
    val bb = ByteBuffer.allocate(8 + buf.size * 16 + payloadBytes)
    bb.putInt(buf.k).putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i)); bb.putLong(buf.ids(i))
      if (buf.withPayload) {
        val p = buf.payloads(i)
        if (p == null) bb.putInt(-1)
        else {
          bb.putInt(p.length)
          var j = 0
          while (j < p.length) { bb.putLong(p(j)); j += 1 }
        }
      }
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new TopKBuffer(bb.getInt(), distinctIds, payloadExpr.isDefined)
    val n = bb.getInt()
    var i = 0
    while (i < n) {
      val s = bb.getDouble(); val id = bb.getLong()
      val p =
        if (!buf.withPayload) null
        else {
          val len = bb.getInt()
          if (len < 0) null
          else {
            val arr = new Array[Long](len)
            var j = 0
            while (j < len) { arr(j) = bb.getLong(); j += 1 }
            arr
          }
        }
      buf.add(s, id, p)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): TopKByScore =
    copy(scoreExpr = cs(0), idExpr = cs(1),
      payloadExpr = if (cs.length > 2) Some(cs(2)) else None)
  override def prettyName: String = "top_k_by_score"
}

object TopKByScore {
  import org.apache.spark.sql.graftbridge.Bridge

  def top_k_by_score(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k)
        .toAggregateExpression())

  /** Variant deduplicating by id inside the buffer (drop the upstream
    * distinct() when each id scores identically within a group). */
  def top_k_by_score_distinct(score: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k, distinctIds = true)
        .toAggregateExpression())

  /** Distinct-by-id variant that also carries a long-array payload per
    * entry (array<struct<score, id, preview>>): the single-probe plan
    * keeps the vector preview inside the aggregation instead of re-joining
    * the top-k back to the signature table — one fewer scan, broadcast and
    * sort per probe. */
  def top_k_by_score_distinct_preview(score: Column, id: Column,
                                      preview: Column, k: Int): Column =
    Bridge.column(
      TopKByScore(Bridge.expression(score), Bridge.expression(id), k,
        distinctIds = true, payloadExpr = Some(Bridge.expression(preview)))
        .toAggregateExpression())
}

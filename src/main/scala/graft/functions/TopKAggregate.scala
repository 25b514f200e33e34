package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs. */
final class TopKBuffer(val k: Int) {
  // min-heap ordered so the WORST retained entry is on top:
  // worst = lowest score, then highest id.
  private val ord: Ordering[(Double, Long)] = Ordering.fromLessThan {
    case ((s1, i1), (s2, i2)) => if (s1 != s2) s1 > s2 else i1 < i2
  }
  val heap = mutable.PriorityQueue.empty[(Double, Long)](ord)

  def add(score: Double, id: Long): Unit = {
    // NaN scores are skipped EVERYWHERE (declarative aggregate and the
    // fused physical operators alike): a NaN would otherwise slip into an
    // under-capacity heap here but be dropped by the fused scan's
    // `score >= minScore` gate, making the two plans diverge on corpora
    // with NaN embeddings. NaN is also the fused merge's empty-group
    // marker sentinel, which this skip keeps well-defined.
    if (java.lang.Double.isNaN(score)) return
    if (heap.size < k) heap.enqueue((score, id))
    else {
      val (ws, wi) = heap.head
      if (score > ws || (score == ws && id < wi)) {
        heap.dequeue(); heap.enqueue((score, id))
      }
    }
  }
  def mergeFrom(other: TopKBuffer): Unit =
    other.heap.foreach { case (s, i) => add(s, i) }
  /** Entries best-first: score desc, id asc. */
  def sorted: Array[(Double, Long)] =
    heap.toArray.sortBy { case (s, i) => (-s, i) }
}

/** Distributed exact top-k: a `TypedImperativeAggregate` with map-side
  * partial aggregation, so each partition ships only k (score, id) pairs
  * to the shuffle — the scan-engine replacement for the reference's HNSW
  * `knn_query` (services/index_service.py:102-108). At 100 TB the shuffle
  * volume is `partitions × k`, independent of corpus size.
  *
  * Output: array<struct<score double, id long>> sorted score desc, id asc.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (score.dataType != DoubleType)
      TypeCheckFailure(s"$prettyName requires a double score, got " +
        score.dataType.simpleString)
    else if (id.dataType != LongType)
      TypeCheckFailure(s"$prettyName requires a bigint id, got " +
        id.dataType.simpleString)
    else if (k <= 0) TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(buf: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      buf.add(s.asInstanceOf[Double], i.asInstanceOf[Long])
    buf
  }

  override def merge(b1: TopKBuffer, b2: TopKBuffer): TopKBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: TopKBuffer): Any = {
    val rows = buf.sorted.map { case (s, i) =>
      InternalRow(s, i)
    }
    new GenericArrayData(rows.asInstanceOf[Array[Any]])
  }

  override def serialize(buf: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    val entries = buf.sorted
    out.writeInt(buf.k)
    out.writeInt(entries.length)
    entries.foreach { case (s, i) => out.writeDouble(s); out.writeLong(i) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val n = in.readInt()
    val buf = new TopKBuffer(kk)
    var i = 0
    while (i < n) { buf.add(in.readDouble(), in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(score, id)
  override def withNewMutableAggBufferOffset(o: Int): TopKByScore =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKByScore =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      children: IndexedSeq[Expression]): TopKByScore =
    copy(score = children(0), id = children(1))
  override def prettyName: String = "top_k_by_score"
}

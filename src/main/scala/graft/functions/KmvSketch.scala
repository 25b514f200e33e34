package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) buffer: the k smallest DISTINCT 64-bit hash
  * values under UNSIGNED ordering. Bounded at k longs regardless of input
  * size, and merge is a set union — so the sketch is independent of
  * partitioning and row order, which is what makes it exactly
  * oracle-replayable (DuckDB recomputes the same k minima in HUGEINT). */
final class KmvBuffer(val k: Int) {
  val set = new java.util.TreeSet[java.lang.Long](
    new java.util.Comparator[java.lang.Long] {
      def compare(a: java.lang.Long, b: java.lang.Long): Int =
        java.lang.Long.compareUnsigned(a, b)
    })

  def add(h: Long): Unit = {
    if (set.contains(h)) ()
    else if (set.size < k) { set.add(h); () }
    else if (java.lang.Long.compareUnsigned(h, set.last()) < 0) {
      set.pollLast(); set.add(h); ()
    }
  }
  def mergeFrom(other: KmvBuffer): Unit = other.set.forEach(x => add(x))

  /** `(est_distinct, kth_min)`: the exact size below k (kth = 0), else the
    * bottom-k estimator (k-1)·2⁶⁴/h₍ₖ₎ in BigInt, clamped to
    * Long.MaxValue — a NON-uniform input (small sequential ids fed
    * instead of hashes) makes h₍ₖ₎ tiny and the estimate astronomically
    * large; the clamp surfaces that as an absurd-but-positive value
    * instead of wrapping to 0/negative on toLong (the DuckDB oracle's
    * HUGEINT→BIGINT cast would error rather than wrap, so a wrap would
    * also silently diverge from the oracle). Shared by the batch
    * aggregate and the streaming vocabulary tracker so the two stay
    * bit-identical by construction. */
  def estimate: (Long, Long) = {
    if (set.size < k) (set.size.toLong, 0L)
    else {
      val kth = set.last().longValue()
      // unsigned kth as BigInt; kth != 0 because k >= 2 distinct values
      // can't all be zero, so the k-th smallest is positive
      val u = BigInt(java.lang.Long.toUnsignedString(kth))
      val est = (BigInt(k - 1) << 64) / u
      (est.min(BigInt(Long.MaxValue)).toLong, kth)
    }
  }
}

/** Distributed distinct-count sketch over a 64-bit hash column (pair with
  * [[Fnv1a64]] so the correctness oracle can replay the hashes).
  *
  * The scale story: an exact `COUNT(DISTINCT token)` over a 100 TB corpus
  * shuffles the entire vocabulary (billions of keys); this aggregate ships
  * exactly k longs per partition and merges by set union. Estimator: with
  * h₍ₖ₎ the k-th smallest distinct hash on the unsigned 2⁶⁴ circle,
  * D ≈ (k-1)·2⁶⁴ / h₍ₖ₎ (the classic KMV/bottom-k estimator; relative
  * error ~1/√k). Fewer than k distinct hashes seen → the count is exact.
  *
  * The estimate is computed in INTEGER arithmetic (BigInt here, HUGEINT in
  * the oracle), so engine and oracle agree bit-for-bit — no floating-point
  * replay needed.
  *
  * Output: struct(est_distinct long, kth_min long) where kth_min is the
  * signed reinterpretation of h₍ₖ₎ (0 when the exact path was taken).
  */
case class KmvDistinct(
    hash: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvBuffer] {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    if (hash.dataType != LongType)
      TypeCheckFailure(s"$prettyName requires a bigint hash, got " +
        hash.dataType.simpleString)
    else if (k < 2) TypeCheckFailure(s"$prettyName requires k >= 2, got $k")
    else TypeCheckSuccess
  }

  override def createAggregationBuffer(): KmvBuffer = new KmvBuffer(k)

  override def update(buf: KmvBuffer, input: InternalRow): KmvBuffer = {
    val h = hash.eval(input)
    if (h != null) buf.add(h.asInstanceOf[Long])
    buf
  }

  override def merge(b1: KmvBuffer, b2: KmvBuffer): KmvBuffer = {
    b1.mergeFrom(b2); b1
  }

  override def eval(buf: KmvBuffer): Any = {
    val (est, kth) = buf.estimate
    InternalRow(est, kth)
  }

  override def serialize(buf: KmvBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.k)
    out.writeInt(buf.set.size)
    buf.set.forEach(x => out.writeLong(x))
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KmvBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val kk = in.readInt()
    val n = in.readInt()
    val buf = new KmvBuffer(kk)
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def dataType: DataType = StructType(Seq(
    StructField("est_distinct", LongType, nullable = false),
    StructField("kth_min", LongType, nullable = false)))

  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(hash)
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      children: IndexedSeq[Expression]): KmvDistinct =
    copy(hash = children(0))
  override def prettyName: String = "kmv_distinct"
}

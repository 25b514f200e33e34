package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** `might_contain(key)` over a pre-built bloom filter of the other join
  * side's keys — the probe half of a bloom-pruned join (see
  * [[graft.operators.Bloom]]).
  *
  * The filter ships SERIALIZED (`filterBytes`) inside the expression tree —
  * one copy per task binary, like a broadcast variable but requiring no
  * SparkContext cooperation — and is deserialized lazily once per JVM
  * instance of the expression, NOT per row. Codegen calls straight into
  * `BloomFilter.mightContainLong`, so the probe stays inside whole-stage
  * codegen with zero boxing: the hot path is two xxhash-style multiplies
  * and `numHashFunctions` bit tests per row.
  *
  * Long keys only, by design: at the scale this exists for, join keys are
  * surrogate integers; hashing a string key should happen explicitly
  * (e.g. `fnv1a64`) so both join sides agree on the bytes being hashed.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a BIGINT key, got ${child.dataType.sql}")

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(filterBytes)

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the DESERIALIZED filter rides the codegen references array (it is
    // java.io.Serializable), so generated code probes it directly
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.mightContainLong($c)")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "bloom_might_contain"
}

package graft.plans

import org.apache.spark.sql.{Column, GraftSqlShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst predicate testing a key against a pre-built Bloom
  * filter (SURVEY §4 / 100 TB shuffle-reduction tier; custom-operator
  * tier (b) — a scalar `Expression` with real `doGenCode`).
  *
  * This is the probe half of the runtime-filter pattern Spark itself
  * applies under `spark.sql.optimizer.runtime.bloomFilter.enabled`:
  * a compact summary of the build side's join keys is shipped to the
  * probe scan, where it drops rows that cannot possibly join BEFORE
  * they reach the shuffle. `BloomJoin.bloomSemiJoin` composes it with
  * an exact join, so false positives never reach the result — the
  * filter only moves work, it cannot change an answer.
  *
  * Why an `Expression` and not a UDF: the test sits in the scan's hot
  * loop over the (large) probe side. A Scala UDF boxes every key and
  * breaks whole-stage codegen at exactly the highest-volume point of
  * the plan; this expression inlines `mightContainLong` into the fused
  * scan loop via `ctx.addReferenceObj`.
  *
  * The filter rides the expression into the task closure — the same
  * distribution story as a broadcast variable for the megabyte-scale
  * filters `BloomJoin` guards to.
  *
  * Null semantics: null key → null (UnaryExpression default), which a
  * filter treats as drop — matching semi-join semantics where a null
  * key never matches.
  */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType | IntegerType | ShortType | ByteType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain expects an integral or string key, " +
        s"got ${dt.simpleString}")
  }

  override def dataType: DataType = BooleanType

  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(key: Any): Any = child.dataType match {
    case StringType =>
      bloom.mightContainBinary(key.asInstanceOf[UTF8String].getBytes)
    case _ => bloom.mightContainLong(key.asInstanceOf[Number].longValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloom", bloom, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        defineCodeGen(ctx, ev, key => s"$bf.mightContainBinary($key.getBytes())")
      case _ =>
        defineCodeGen(ctx, ev, key => s"$bf.mightContainLong((long) $key)")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Column API: `df.filter(BloomMightContain.column(col("k"), bloom))`. */
  def column(key: Column, bloom: BloomFilter): Column =
    GraftSqlShim.column(
      BloomMightContain(GraftSqlShim.expression(key), bloom))
}

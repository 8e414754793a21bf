package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** Bit length of a long — semantically identical to `length(bin(x))` (64
  * for negatives, 1 for 0, else 64 − numberOfLeadingZeros) but ONE JVM
  * intrinsic instead of materializing a binary String per row. This is the
  * log-bucket sketch family's hot-path kernel ([[graft.operators.Kll
  * .kllPortable]], Streams.streamingQuantileCells): the composed
  * alternatives both lose — bin() allocates on every row of a corpus-sized
  * scan, and a 47-term comparison-sum expression inlines into each
  * downstream reference under project collapse and falls out of codegen
  * (measured 20× slower). The DuckDB oracles keep `length(bin(cents))`:
  * same integer for every input, so cross-engine hashes are unchanged. */
case class BitLengthLong(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == LongType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bit_length_long expects BIGINT, got ${child.dataType}")

  override def nullSafeEval(x: Any): Any = {
    val v = x.asInstanceOf[Long]
    if (v == 0L) 1L else (64 - java.lang.Long.numberOfLeadingZeros(v)).toLong
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"(($c) == 0L ? 1L : (long)(64 - java.lang.Long.numberOfLeadingZeros($c)))")

  override protected def withNewChildInternal(newChild: Expression): BitLengthLong =
    copy(child = newChild)
}

object BitLengthLong {
  /** Column API: bit length of a non-negative long column. */
  def bitLen(c: Column): Column = Bridge.column(BitLengthLong(Bridge.expression(c)))
}

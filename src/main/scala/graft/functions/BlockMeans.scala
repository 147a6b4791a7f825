package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the perceptual-hash block reducer —
  * a payload's bytes split into 64 contiguous blocks, each reduced
  * to its integer mean (floor(Σ/len); empty blocks — payloads under
  * 64 bytes — read 0). Block of 0-based byte i is (i·64) div n,
  * identical to the oracle's ((p-1)·64) // n partition, so the
  * engines' block means stay bit-equal.
  *
  * This replaces a per-byte `conv(substring(hex(payload)…))` decode
  * chain that dominated q172/q173 (~4.2 s of a 4.5 s query at sf0.1:
  * ~10M heavyweight string-parse calls). One fused JVM pass over the
  * raw bytes makes the reduction effectively free — which is also
  * the production shape: a real image pipeline computes this
  * downscale inside the decoder at exactly this seam.
  *
  * Null only for null input.
  */
case class BlockMeans(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "block_means64"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"block_means64 requires string or binary, got $t")
    }

  override def nullSafeEval(v: Any): Any = child.dataType match {
    case BinaryType => BlockMeans.means(v.asInstanceOf[Array[Byte]])
    case _ => BlockMeans.means(v.asInstanceOf[UTF8String])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BlockMeans.means($c)")

  override protected def withNewChildInternal(newChild: Expression): BlockMeans =
    copy(child = newChild)
}

object BlockMeans {

  /** 64 block means over the UTF-8 bytes of `s` (the same bytes
    * `cast(s as binary)` yields).
    */
  def means(s: UTF8String): ArrayData = means(s.getBytes)

  /** 64 block means over a raw byte payload (BinaryType input — the
    * decoded-pixel-plane path, where bytes are NOT valid UTF-8).
    * The codegen call dispatches here by the argument's static type.
    */
  def means(b: Array[Byte]): ArrayData = {
    val n = b.length
    val sums = new Array[Long](64)
    val cnts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val blk = ((i.toLong * 64L) / n).toInt
      sums(blk) += (b(i) & 0xff)
      cnts(blk) += 1
      i += 1
    }
    val out = new Array[Int](64)
    var k = 0
    while (k < 64) {
      out(k) = if (cnts(k) == 0) 0 else (sums(k) / cnts(k)).toInt
      k += 1
    }
    new GenericArrayData(out)
  }

  /** Register `block_means64(x)` (idempotent); [[graft.GraftExtensions]]
    * is the deployment-grade registration path.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("block_means64")))
      reg.createOrReplaceTempFunction("block_means64",
        exprs => BlockMeans(exprs(0)), "built-in")
  }
}

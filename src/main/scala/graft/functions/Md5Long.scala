package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the engine's 60-bit md5 key,
  * bit-identical to `cast(conv(substr(md5(x), 1, 15), 16, 10) as
  * bigint)` — the cross-engine-deterministic hash every shingle /
  * minhash / split-assignment path keys on (DuckDB oracle side:
  * `('0x' || substr(md5(x), 1, 15))::BIGINT`).
  *
  * The SQL formulation materializes a 32-char hex string per call,
  * copies 15 chars of it, and parses them back into a long — three
  * allocations that the digest's first 8 bytes already contain: the
  * first 15 hex digits ARE the top 60 bits, so fold bytes 0..7
  * big-endian and logical-shift right 4. On the hash-heavy paths the
  * chain runs INSIDE `transform(...)` lambdas, which Spark evaluates
  * interpreted (no codegen for HOFs) — per-call constant costs are
  * the stage cost there, so this expression replaces the chain at
  * every engine-side call site while the oracle SQL keeps the
  * portable spelling.
  *
  * Null only for null input, exactly like the chain it replaces
  * (md5 → substr → conv propagate null; conv never fails on 15 hex
  * digits).
  */
case class Md5Long(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "md5long"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"md5long requires string, got $t")
    }

  override def nullSafeEval(v: Any): Any =
    Md5Long.hash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Md5Long.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Md5Long =
    copy(child = newChild)
}

object Md5Long {

  private val localDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** First 15 hex digits of md5(UTF-8 bytes) as an unsigned 60-bit
    * long: bytes 0..7 big-endian, logical-shift right 4.
    */
  def hash(s: UTF8String): Long = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(s.getBytes)
    (((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)) >>> 4
  }

  /** Register `md5long(x)` in the session's function registry
    * (idempotent) — the per-session programmatic path;
    * [[graft.GraftExtensions]] is the deployment-grade one.
    */
  def register(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    // check-first: createOrReplaceTempFunction logs a WARN on every
    // replace, and hot paths (bandSignatures) self-register per call
    if (!reg.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("md5long")))
      reg.createOrReplaceTempFunction("md5long",
        exprs => Md5Long(exprs(0)), "built-in")
  }
}

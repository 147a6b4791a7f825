package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `minhash_sig(h)`: the full K=128-wide MinHash signature in ONE
  * aggregation buffer (a `long[128]`), as a TypedImperativeAggregate.
  *
  * Why a custom aggregate: at K=8 (the q36 LSH query) eight parallel
  * `min()` columns are the right plan — declarative, codegen'd,
  * HashAggregate. At K=128 that approach means 128 aggregate
  * expressions and a 128-column buffer schema; the sketch-style
  * aggregate keeps one flat primitive array per group, one update call
  * per input row (128 multiply-adds, no per-k expression dispatch),
  * and merges partial signatures elementwise — the shape every sketch
  * aggregate (HLL, KLL, minhash) uses at scale.
  *
  * Hashing: the K hash functions are the classic universal family
  * `h_k(x) = (a_k·(x mod P) + b_k) mod P` over the Mersenne prime
  * P = 2³¹−1, applied to the 60-bit md5-derived shingle id. One md5
  * per shingle total — the K rehashes are integer multiply-adds. All
  * arithmetic stays below 2⁶² so it is exact in any engine with
  * 64-bit integers, and a_k/b_k are md5-derived constants — the DuckDB
  * oracle reproduces every signature value bit-for-bit.
  */
case class MinHashSignature(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import MinHashSignature._

  override def createAggregationBuffer(): Array[Long] = Array.fill(K)(P)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hb = v.asInstanceOf[Long] % P
      var k = 0
      while (k < K) {
        val x = (A(k) * hb + B(k)) % P
        if (x < buf(k)) buf(k) = x
        k += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var k = 0
    while (k < K) { if (b2(k) < b1(k)) b1(k) = b2(k); k += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(K * 8)
    var k = 0
    while (k < K) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(K)(bb.getLong())
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "minhash_sig"

  override def withNewMutableAggBufferOffset(offset: Int): MinHashSignature =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashSignature =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashSignature {
  val K = 128
  val P = 2147483647L // 2^31 - 1, Mersenne prime

  private def md5Long(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    // first 15 hex digits = high 60 bits, positive
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v >>> 4) & 0xFFFFFFFFFFFFFFFL
  }

  /** Deterministic md5-derived coefficients (a_k nonzero mod P). */
  val A: Array[Long] = Array.tabulate(K)(k => md5Long(s"a-$k") % (P - 1) + 1)
  val B: Array[Long] = Array.tabulate(K)(k => md5Long(s"b-$k") % P)

  /** DuckDB `(k, a, b)` VALUES table mirroring [[A]]/[[B]]. */
  def coefSqlValues: String =
    (0 until K).map(k => s"(${k}, ${A(k)}, ${B(k)})").mkString(", ")

  def register(spark: SparkSession): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .createOrReplaceTempFunction("minhash_sig",
        exprs => MinHashSignature(exprs.head).toAggregateExpression(), "built-in")
}

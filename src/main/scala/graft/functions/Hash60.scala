package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native 60-bit md5-prefix hash of a string — BIT-IDENTICAL to the
  * builtin composition `conv(substring(md5(s), 1, 15), 16, 10)` it
  * replaces (15 hex chars = the digest's top 60 bits = the first
  * 8 bytes as an unsigned big-endian long, shifted right 4), and
  * therefore to the DuckDB oracle mirror
  * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`.
  *
  * Why native: this is the single hottest scalar in the engine —
  * every dedup/sampling/fingerprint path hashes every token through
  * it. The builtin chain materializes a 32-char hex string, copies a
  * 15-char substring, and re-parses it base-16, allocating three
  * intermediate objects per call; this expression digests the raw
  * UTF-8 bytes and assembles the long directly. Same MessageDigest
  * kernel, zero intermediate strings.
  *
  * This is the (b)-tier custom kernel of the extension policy
  * (SURVEY.md §7.4), same as [[FloatVecDot]]: built-ins can express
  * the semantics; the native form exists purely for the hot path.
  */
case class Hash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash60"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash60 =
    copy(child = newChild)
}

/** Full-width sibling of [[Hash60]]: the md5 digest's first 8 bytes
  * as a big-endian (possibly negative) long — the SimHash front end
  * derives its two nonnegative 32-bit halves from it
  * (`hex[1..8] = h >>> 32`, `hex[9..16] = h & 0xFFFFFFFF`), replacing
  * TWO `conv(substring(md5))` parses per token with one digest.
  */
case class Hash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a STRING argument, got ${child.dataType.sql}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hash64"

  override protected def nullSafeEval(input: Any): Any =
    Hash60.hash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Hash60.hash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Hash64 =
    copy(child = newChild)
}

object Hash60 {

  private val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  private def digest8(s: UTF8String): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    ((d(0) & 0xFFL) << 56) | ((d(1) & 0xFFL) << 48) |
      ((d(2) & 0xFFL) << 40) | ((d(3) & 0xFFL) << 32) |
      ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
      ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
  }

  /** First 60 bits of md5 of the string's UTF-8 bytes, as a
    * nonnegative long. Called from generated code via the companion's
    * static forwarder.
    */
  def hash(s: UTF8String): Long = digest8(s) >>> 4

  /** First 64 bits (8 bytes, big-endian, sign-carrying). */
  def hash64(s: UTF8String): Long = digest8(s)
}

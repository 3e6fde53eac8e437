package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType, StringType}

/** Native md5-prefix hash for the shingle/word pipelines.
  *
  * `graft.ext.Dedup.h32` / `h60` were
  * `conv(substring(md5(c), 1, n), 16, 10).cast("long")` — per value
  * that materializes the full 32-char lowercase hex STRING of the
  * digest, substrings it, and re-parses the prefix as base-16 text.
  * The hex intermediate is pure overhead: the first `n` hex chars of a
  * digest ARE its first 4·n bits, so the same long is one digest plus
  * one unsigned shift of the first 8 bytes. The md5 VALUE (and thus
  * every downstream hash-gated result) is unchanged — only the
  * hex-text round-trip is gone. This stage is the serial single-task
  * hot spot under the dedup family (VERDICT r18 "next round" #4: the
  * hex materialization was estimated at 30-40% of the ~1 s
  * shingle+md5 stage).
  *
  * Equivalence, bit for bit: md5 emits the digest big-endian
  * nibble-first, so hex chars 1..n are the high 4·n bits of the
  * big-endian first-8-bytes long; `conv(..., 16, 10)` parses them as
  * an unsigned base-16 number — exactly `firstEightBytes >>> (64−4n)`
  * for n ≤ 15 (n = 16 could set the sign bit, which is why h60 stops
  * at 15 — see [[graft.ext.Dedup.h60]]). Null in → null out, matching
  * the md5→conv→cast null propagation.
  */
object HashExpressions {
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 64−`shift` bits of md5(bytes), right-aligned (unsigned). */
  def md5PrefixLong(bytes: Array[Byte], shift: Int): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    val hi = ((d(0) & 0xffL) << 56) | ((d(1) & 0xffL) << 48) |
      ((d(2) & 0xffL) << 40) | ((d(3) & 0xffL) << 32) |
      ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
      ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
    hi >>> shift
  }
}

/** `md5_prefix(c, nibbles)` — the first `nibbles` hex digits of
  * md5(c) as an unsigned long (nibbles ≤ 15, so the value is always
  * non-negative).
  */
case class Md5Prefix(child: Expression, nibbles: Int) extends UnaryExpression {
  require(nibbles >= 1 && nibbles <= 15,
    s"md5_prefix keeps 1..15 nibbles (sign-bit safety), got $nibbles")

  private val shift = 64 - 4 * nibbles

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "md5_prefix"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string or binary argument, got ${other.catalogString}")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bytes = child.dataType match {
      case StringType => input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      case _ => input.asInstanceOf[Array[Byte]]
    }
    HashExpressions.md5PrefixLong(bytes, shift)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = child.dataType match {
        case StringType => s"$c.getBytes()"
        case _ => c
      }
      s"${ev.value} = graft.functions.HashExpressions.md5PrefixLong($bytes, $shift);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

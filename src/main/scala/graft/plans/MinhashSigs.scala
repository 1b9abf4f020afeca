package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** All 16 MinHash signature minima of a shingle array in ONE compiled
  * pass — the production near-dup id path
  * (`graft.streaming.NearDupStream.withSignatures`) as a native
  * expression.
  *
  * The composable Column form spells this as 16 separate
  * `array_min(transform(ids, x -> affine_i(x)))` columns over
  * `ids = transform(sh, s -> conv(substr(md5(s),1,15),16,10) % P)` —
  * higher-order functions Spark evaluates INTERPRETED, and (measured,
  * round 17) a 16-lambda projection whose QUERY PLANNING alone costs
  * ~1.5s per invocation at any data size. This expression is one
  * tree node: per shingle, the 60-bit md5-prefix id (bit-identical
  * to the `conv(substring(md5(s), 1, 15), 16, 10) % P` spelling —
  * the first 15 hex nibbles of the digest assembled big-endian) and
  * a 16-way running min of the affine family
  * ((1103515245(i+1)+12345 mod P)·x + (69069(i+1)+1234567 mod P))
  * mod P — [[graft.functions.TextFns.affineHash]]'s constants
  * verbatim, P = 2³¹−1, every product < 2⁶², no overflow.
  * `array_distinct` in the Column spelling is dropped as
  * min-invariant (duplicate shingles cannot change a minimum).
  *
  * Bit-equality with the Column spelling is pinned by
  * NearDupStreamSpec; the d02_production / d21 / p29 oracle keys
  * hash-gate the values cross-engine. Returns array<bigint>(16);
  * an empty shingle array yields Long.MaxValue minima (callers
  * filter `size(sh) > 0` first — the withSignatures contract). */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sigs"

  override protected def nullSafeEval(a: Any): Any =
    MinhashSigs.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.MinhashSigs$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSigs {

  private val P = graft.functions.TextFns.HashP
  private val NumSigs = graft.streaming.NearDupStream.Sigs
  private val A: Array[Long] =
    Array.tabulate(NumSigs)(graft.functions.TextFns.affineA)
  private val B: Array[Long] =
    Array.tabulate(NumSigs)(graft.functions.TextFns.affineB)

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** One pass over the shingle strings: id = top 60 bits of the md5
    * digest mod P, then a running min per affine-family member. */
  def compute(sh: ArrayData): ArrayData = {
    val n = sh.numElements()
    val mins = Array.fill(NumSigs)(Long.MaxValue)
    val digest = md5.get()
    var j = 0
    while (j < n) {
      digest.reset()
      val d = digest.digest(sh.getUTF8String(j).getBytes)
      // the first 15 hex nibbles: bytes 0..6 whole + byte 7's high
      // nibble, assembled big-endian — exactly what
      // conv(substring(hex, 1, 15), 16, 10) parses
      var x = 0L
      var k = 0
      while (k < 7) { x = (x << 8) | (d(k) & 0xffL); k += 1 }
      x = ((x << 4) | ((d(7) & 0xf0L) >> 4)) % P
      var i = 0
      while (i < NumSigs) {
        val h = (A(i) * x + B(i)) % P
        if (h < mins(i)) mins(i) = h
        i += 1
      }
      j += 1
    }
    new GenericArrayData(mins)
  }

  def apply(sh: Column): Column =
    Bridge.column(MinhashSigs(Bridge.expression(sh)))
}

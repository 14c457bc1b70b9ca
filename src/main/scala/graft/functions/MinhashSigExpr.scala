package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Shared MinHash arithmetic: 30-bit prime universe + deterministic affine
  * permutation parameters derived from md5 (see Dedup's design notes —
  * a, h < 2^30 keeps a*h+b inside a signed 64-bit int in Spark AND in the
  * DuckDB oracle that mirrors the computation).
  */
object MinhashParams {
  val P: Long = 1073741789L // largest prime < 2^30

  private def md5Long(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  def hashParams(numHashes: Int): Seq[(Long, Long)] =
    (0 until numHashes).map { i =>
      (1L + md5Long(s"a:$i") % (P - 1), md5Long(s"b:$i") % P)
    }
}

/** Native MinHash signature: given the per-shingle base hashes
  * (array<long>, each already reduced mod P), produce the `numHashes`-long
  * signature where sig[i] = min over shingles of (h * a_i + b_i) mod P.
  *
  * This replaces a transform(sequence)-of-array_min(transform) nest of
  * interpreted lambdas (numHashes × |shingles| evaluations per row) with
  * one codegen'd primitive double loop. Arithmetic is identical, so
  * signatures — and therefore LSH bands and candidate pairs — are
  * bit-identical to the HOF tier and the DuckDB oracle.
  *
  * Null/empty semantics: null input → null; empty array → null (no
  * shingles = nothing to sign; callers filter empty shingle sets); null
  * elements → null.
  */
case class MinhashSignature(child: Expression, numHashes: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash expects array<bigint> base hashes, got ${dt.simpleString}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash"

  private lazy val as: Array[Long] = MinhashParams.hashParams(numHashes).map(_._1).toArray
  private lazy val bs: Array[Long] = MinhashParams.hashParams(numHashes).map(_._2).toArray

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val sig = new Array[Long](numHashes)
    var j = 0
    while (j < numHashes) {
      var m = Long.MaxValue
      var i = 0
      while (i < n) {
        if (arr.isNullAt(i)) return null
        val v = (arr.getLong(i) * as(j) + bs(j)) % MinhashParams.P
        if (v < m) m = v
        i += 1
      }
      sig(j) = m
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      // freshName: two graft_minhash calls can land in one codegen scope
      // (e.g. same projection); a bare `anyNull` would redeclare and fail
      // janino, silently dropping the stage to interpreted execution.
      val anyNull = ctx.freshName("anyNull")
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $sig = new long[$numHashes];
         |  boolean $anyNull = false;
         |  for (int $j = 0; $j < $numHashes && !$anyNull; $j++) {
         |    long $m = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      if ($c.isNullAt($i)) { $anyNull = true; break; }
         |      final long $v = ($c.getLong($i) * $aRef[$j] + $bRef[$j]) % ${MinhashParams.P}L;
         |      if ($v < $m) { $m = $v; }
         |    }
         |    $sig[$j] = $m;
         |  }
         |  if ($anyNull) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

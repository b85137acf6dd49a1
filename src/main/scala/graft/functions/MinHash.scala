package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import java.security.MessageDigest

/** Native MinHash band-signature kernel (extension tier (b) of the
  * build brief): ALL k min-hashes of a shingle array in ONE pass with
  * ONE md5 per shingle.
  *
  * Why: the HOF formulation (`array_min(transform(sh, g => md5(salt‖g)))`
  * × k) walks the shingle array k times, allocates k intermediate hash
  * arrays, and — the real cost — runs k md5 passes per shingle. For
  * b=4,r=2 that is 8 full digests of every shingle in the corpus; md5
  * IS the MinHash hot loop at 100 TB. This kernel digests each shingle
  * once into a 32-bit base value x and derives the k hash functions
  * from the affine permutation family hₖ(x) = (Aₖ·x + Bₖ) mod P with
  * P = 4294967311 (the smallest prime > 2³²) and per-function random
  * constants — the construction Spark MLlib's own MinHashLSH uses.
  * DISTINCT multipliers Aₖ matter: a shared-slope family like
  * h1 + k·h2 makes the row orderings within a band correlated, which
  * collapses the band-collision s-curve from sʳ toward s (measured
  * here: 92 → 313 candidate buckets at sf0.01, i.e. ~3× false-positive
  * candidates). One digest, k fused multiply-mods, running minima in a
  * local long[8] — no intermediate arrays, no per-hash salting passes,
  * ~k× less digest work.
  *
  * Determinism contract: x is the first 32-bit word of md5(g) — exactly
  * `CAST('0x' || substr(md5(g), 1, 8) AS BIGINT)` in the DuckDB
  * oracle — and Aₖ < 2³⁰, so Aₖ·x + Bₖ < 2⁶² never overflows a signed
  * long in either engine; the minima are bit-identical integers.
  */
object MinHashKernel {
  /** P, Aₖ, Bₖ: fixed so results are reproducible run-to-run and the
    * oracle can inline them as literals. */
  val Prime: Long = 4294967311L
  val A: Array[Long] = Array(0x0fc93da3L, 0x28f4b1b5L, 0x12e15e35L, 0x2545f491L,
    0x19660d4dL, 0x27d4eb2fL, 0x165667b1L, 0x1b873593L)
  val B: Array[Long] = Array(0x85ebca6bL, 0xc2b2ae35L, 0x61c88647L, 0x9e3779b9L,
    0xdeadbeefL, 0x0b4c61d5L, 0x38495ab5L, 0x7feb352dL)

  // shared with HashPositionsKernel — ONE copy of the md5 plumbing
  // whose byte-order arithmetic the oracle contract depends on
  private[functions] val digests = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** Unsigned 32-bit big-endian word at offset `off` of `d` — equals
    * CAST('0x' || substr(md5_hex, 2·off+1, 8) AS BIGINT). */
  @inline private[functions] def word(d: Array[Byte], off: Int): Long =
    ((d(off) & 0xffL) << 24) | ((d(off + 1) & 0xffL) << 16) |
      ((d(off + 2) & 0xffL) << 8) | (d(off + 3) & 0xffL)

  /** k running minima of hⱼ(x) = (Aⱼ·x + Bⱼ) mod P over the shingles;
    * null elements are skipped (matching `array_min`/`list_min`, which
    * ignore nulls); null when no non-null shingle exists (no shingles →
    * no signature). */
  def bands(shingles: ArrayData, k: Int): ArrayData = {
    val n = shingles.numElements()
    val minima = Array.fill(k)(Long.MaxValue)
    val md = digests.get()
    var seen = false
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        seen = true
        md.reset()
        val d = md.digest(shingles.getUTF8String(i).getBytes)
        val x = word(d, 0)
        var j = 0
        while (j < k) {
          val v = (A(j) * x + B(j)) % Prime
          if (v < minima(j)) minima(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(minima)
  }

  private val Space = UTF8String.fromString(" ")

  /** [[bands]] with the k-gram construction FUSED in: each space-joined
    * k-gram of `toks` is built and digested on the fly — no
    * intermediate shingle array is ever materialized, and the scan
    * pays no interpreted `transform` pass (the HOF shingle staging in
    * graft.queries.Dedup is kept as the differential reference). Gram
    * strings are identical to [[graft.ops.TextOps.shingles]]
    * (concat_ws semantics: null tokens skipped), so minima are
    * bit-equal to the staged path. Null when fewer than k tokens. */
  def bandsOfGrams(toks: ArrayData, k: Int, numHashes: Int): ArrayData = {
    val n = toks.numElements()
    if (n < k) return null
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      parts(i) = if (toks.isNullAt(i)) null else toks.getUTF8String(i)
      i += 1
    }
    val minima = Array.fill(numHashes)(Long.MaxValue)
    val md = digests.get()
    i = 0
    while (i <= n - k) {
      val g = UTF8String.concatWs(Space, java.util.Arrays.copyOfRange(parts, i, i + k): _*)
      md.reset()
      val d = md.digest(g.getBytes)
      val x = word(d, 0)
      var j = 0
      while (j < numHashes) {
        val v = (A(j) * x + B(j)) % Prime
        if (v < minima(j)) minima(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(minima)
  }
}

/** minhash_bands(toks, numHashes[, shingleK]): array<long> of the k
  * min-hashes — over the array's elements as-is (shingleK = 1) or over
  * its space-joined shingleK-grams built inside the kernel (the fused
  * path: no shingle array in the plan at all). Codegen emits a single
  * static call — the kernel loop itself is JIT-compiled Scala, and the
  * expression stays inside whole-stage codegen (no CodegenFallback,
  * unlike HOF lambdas). */
case class MinHashBands(child: Expression, numHashes: Int, shingleK: Int = 1)
    extends UnaryExpression {

  require(numHashes > 0 && numHashes <= MinHashKernel.A.length,
    s"numHashes must be in [1, ${MinHashKernel.A.length}] (fixed constant pool)")
  require(shingleK >= 1, "shingleK must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_bands"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string> shingles, got ${t.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    if (shingleK == 1) MinHashKernel.bands(input.asInstanceOf[ArrayData], numHashes)
    else MinHashKernel.bandsOfGrams(input.asInstanceOf[ArrayData], shingleK, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the kernel may return null (empty shingle array) even for a
    // non-null child, so the generated code re-checks the result
    val call =
      if (shingleK == 1) s"graft.functions.MinHashKernel.bands(%s, $numHashes)"
      else s"graft.functions.MinHashKernel.bandsOfGrams(%s, $shingleK, $numHashes)"
    nullSafeCodeGen(ctx, ev, c => s"""
       |${ev.value} = ${call.format(c)};
       |${ev.isNull} = (${ev.value} == null);
     """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashFunctions {
  def minhash_bands(shingles: Column, numHashes: Int): Column =
    GraftSqlBridge.column(MinHashBands(GraftSqlBridge.expression(shingles), numHashes))

  /** Fused shingling + MinHash: k-grams built and digested in one
    * kernel pass over the raw token array. */
  def ngram_minhash_bands(toks: Column, shingleK: Int, numHashes: Int): Column =
    GraftSqlBridge.column(
      MinHashBands(GraftSqlBridge.expression(toks), numHashes, shingleK))
}

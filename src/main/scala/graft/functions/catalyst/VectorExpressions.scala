package graft.functions.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row kernels.
  *
  * Spark's higher-order functions (`aggregate`, `zip_with`, `filter`) are
  * CodegenFallback — every call interprets the lambda with per-element
  * boxing, which round 2's bench showed costs 3–11× on similarity and
  * language-ID queries. Each expression here either generates a tight
  * primitive loop inline (`DotProduct`, `CountInSet`) or delegates to one
  * static JVM call per row (`SrpBuckets`), so the enclosing projection
  * stays inside whole-stage codegen with no lambda dispatch.
  *
  * Reference parity note: the reference executes these kernels over
  * vectorized Arrow batches (SURVEY §1.1); a codegen'd expression is the
  * Spark-native equivalent of that design point.
  */
object VectorKernels {
  private[catalyst] def isNumericArray(t: DataType): Boolean = t match {
    case ArrayType(FloatType | DoubleType | IntegerType | LongType, _) => true
    case _ => false
  }
}

/** dot(a, b) as a double: elements widened to double, accumulated
  * left-to-right (bit-deterministic, mirrorable by an oracle engine doing
  * the same). Null result when either array is null, lengths differ, or
  * any element is null — exactly the propagation the previous
  * `aggregate(zip_with(...))` formulation had, so oracle values are
  * unchanged.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernels.isNumericArray(left.dataType) &&
        VectorKernels.isNumericArray(right.dataType)) {
      TypeCheckResult.TypeCheckSuccess
    } else {
      TypeCheckResult.TypeCheckFailure(
        s"dot expects numeric arrays, got ${left.dataType.simpleString} " +
          s"and ${right.dataType.simpleString}")
    }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    val n = ad.numElements()
    if (n != bd.numElements()) return null
    val lt = elemType(left)
    val rt = elemType(right)
    var sum = 0.0
    var i = 0
    while (i < n) {
      if (ad.isNullAt(i) || bd.isNullAt(i)) return null
      sum += numAt(ad, lt, i) * numAt(bd, rt, i)
      i += 1
    }
    sum
  }

  private def numAt(arr: ArrayData, t: DataType, i: Int): Double = t match {
    case FloatType => arr.getFloat(i).toDouble
    case DoubleType => arr.getDouble(i)
    case IntegerType => arr.getInt(i).toDouble
    case LongType => arr.getLong(i).toDouble
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val la = CodeGenerator.getValue(a, elemType(left), i)
      val rb = CodeGenerator.getValue(b, elemType(right), i)
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    $sum += (double)($la) * (double)($rb);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $sum; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Count of array<string> elements contained in a fixed literal set.
  * Null elements never count (matching `size(filter(w, _.isInCollection))`,
  * whose null predicate drops the element). Codegen'd hash-set probe per
  * element — the kernel under stopword-ratio and language-ID scoring.
  */
case class CountInSet(child: Expression, values: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"countInSet expects array<string>, got ${other.simpleString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(a: Any): Any = {
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftWordSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val c = ctx.freshName("c")
      s"""
         |final int $n = $a.numElements();
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** String membership in a fixed literal set — the O(1) hash probe behind
  * boilerplate-gram matching. `array_contains(lit(array(...)), x)` (and
  * equally `element_at` on a literal map — Spark's GetMapValue scans the
  * key array) is O(|set|) PER PROBE, which turns an O(words) document
  * rewrite into O(words × topK); this is the constant-time replacement.
  * Null input → null, matching `array_contains` of a non-null list.
  */
case class InStringSet(child: Expression, values: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"inStringSet expects string, got ${other.simpleString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](values.size * 2)
    values.foreach(v => s.add(UTF8String.fromString(v)))
    s
  }

  override def nullSafeEval(a: Any): Any =
    set.contains(a.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftGramSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $setRef.contains($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): InStringSet =
    copy(child = newChild)
}

/** Max frequency of any single element in an array<string> — the
  * top-word numerator of the Gopher repetition rules. One hash-count
  * loop per row via a static call, so the enclosing projection stays in
  * whole-stage codegen (the `aggregate` HOF fold this replaces is
  * CodegenFallback: interpreted, per-element boxing — the pattern this
  * file exists to avoid). Null elements are ignored; empty/all-null
  * arrays yield 0.
  */
case class MaxElementCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"maxElementCount expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    MaxElementCount.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.catalyst.MaxElementCount$$.MODULE$$" +
        s".compute($a);")

  override protected def withNewChildInternal(newChild: Expression): MaxElementCount =
    copy(child = newChild)
}

object MaxElementCount {
  def compute(arr: ArrayData): Int = {
    val n = arr.numElements()
    if (n == 0) return 0
    val m = new java.util.HashMap[UTF8String, java.lang.Integer](n * 2)
    var best = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        val prev = m.get(w)
        val c = if (prev == null) 1 else prev.intValue() + 1
        m.put(w, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}

/** Sign-random-projection bucket ids, one per hash table, as
  * array<long>. Plane component for (table t, bit i, dimension d) is the
  * sign of a splitmix64 mix of (t*nBits+i, d) — deterministic and
  * executor-local, so every task computes identical planes with no
  * broadcast state. Codegen delegates to one static call per row; the
  * triple loop inside runs over primitives.
  *
  * Null vector ⇒ null; null elements contribute 0 to the projection.
  */
case class SrpBuckets(child: Expression, nBits: Int, tables: Int)
    extends UnaryExpression {
  require(nBits >= 1 && nBits <= 63, s"nBits=$nBits out of range")
  require(tables >= 1, s"tables=$tables out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case t if VectorKernels.isNumericArray(t) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srpBuckets expects a numeric array, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    SrpBuckets.compute(a.asInstanceOf[ArrayData], nBits, tables, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.catalyst.SrpBuckets$$.MODULE$$" +
        s".compute($a, $nBits, $tables, $isFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): SrpBuckets =
    copy(child = newChild)
}

object SrpBuckets {
  /** splitmix64 finalizer — public-domain mixing constants. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  def compute(vec: ArrayData, nBits: Int, tables: Int, float: Boolean): ArrayData = {
    val dims = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < nBits) {
        val plane = (t * nBits + i).toLong
        var proj = 0.0
        var d = 0
        while (d < dims) {
          if (!vec.isNullAt(d)) {
            val x = if (float) vec.getFloat(d).toDouble else vec.getDouble(d)
            val sign = if ((mix(plane * 0x2545F4914F6CDD1DL + d) & 1L) == 0L) -1.0 else 1.0
            proj += x * sign
          }
          d += 1
        }
        if (proj >= 0) bucket |= 1L << i
        i += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }
}

/** The `k` nearest centroid ids (by cosine, descending; ties to the
  * earlier array entry) for a vector against a centroid array of
  * `struct(c_id long, c_vec array<numeric>, c_nrm double)` rows — the
  * IVF-flat assignment/probe kernel.
  *
  * One expression looping over the centroid array at runtime replaces an
  * unrolled per-centroid expression tree: generated code stays a single
  * static call regardless of nCentroids (an unrolled tree at 1024
  * centroids would be megabytes of Janino input), and a corpus smaller
  * than the requested centroid count just yields a shorter result — no
  * sentinel handling. The vector's own norm is computed once per call.
  */
case class NearestCentroids(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 1, s"k=$k out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (v, ArrayType(StructType(Array(f0, f1, f2)), _))
        if VectorKernels.isNumericArray(v) && f0.dataType == LongType &&
          VectorKernels.isNumericArray(f1.dataType) && f2.dataType == DoubleType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"nearestCentroids expects (numeric array, array<struct<long, numeric array, double>>), got $other")
  }

  private def vecIsFloat: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def centIsFloat: Boolean =
    right.dataType.asInstanceOf[ArrayType].elementType
      .asInstanceOf[StructType].fields(1).dataType
      .asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any, c: Any): Any =
    NearestCentroids.compute(v.asInstanceOf[ArrayData],
      c.asInstanceOf[ArrayData], k, vecIsFloat, centIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, c) => {
      s"${ev.value} = graft.functions.catalyst.NearestCentroids$$.MODULE$$" +
        s".compute($v, $c, $k, $vecIsFloat, $centIsFloat);"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroids =
    copy(left = newLeft, right = newRight)
}

object NearestCentroids {
  private def at(a: ArrayData, i: Int, float: Boolean): Double =
    if (float) a.getFloat(i).toDouble else a.getDouble(i)

  def compute(vec: ArrayData, cents: ArrayData, k: Int,
              vecFloat: Boolean, centFloat: Boolean): ArrayData = {
    val dims = vec.numElements()
    var vn = 0.0
    var d = 0
    while (d < dims) {
      if (!vec.isNullAt(d)) { val x = at(vec, d, vecFloat); vn += x * x }
      d += 1
    }
    vn = math.sqrt(vn)
    val n = cents.numElements()
    val topSim = new Array[Double](math.min(k, n))
    val topId = new Array[Long](math.min(k, n))
    var filled = 0
    var i = 0
    while (i < n) {
      if (!cents.isNullAt(i)) {
        val row = cents.getStruct(i, 3)
        val cvec = row.getArray(1)
        if (cvec != null && cvec.numElements() == dims) {
          var dot = 0.0
          d = 0
          while (d < dims) {
            if (!vec.isNullAt(d) && !cvec.isNullAt(d))
              dot += at(vec, d, vecFloat) * at(cvec, d, centFloat)
            d += 1
          }
          // a zero-norm vector or centroid would make sim NaN, and NaN
          // fails every insertion comparison — rank such pairs as 0.0 so
          // degenerate inputs still get a deterministic (id-ordered) probe
          // list instead of silently vanishing from it
          val cn = row.getDouble(2)
          val sim = if (vn == 0.0 || cn == 0.0) 0.0 else dot / (vn * cn)
          // descending insertion; strict > keeps earlier entries on ties
          var j = filled
          while (j > 0 && sim > topSim(j - 1)) j -= 1
          if (j < topSim.length) {
            val last = math.min(filled, topSim.length - 1)
            var m = last
            while (m > j) { topSim(m) = topSim(m - 1); topId(m) = topId(m - 1); m -= 1 }
            topSim(j) = sim
            topId(j) = row.getLong(0)
            if (filled < topSim.length) filled += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(topId.take(filled))
  }
}

/** Rolling polynomial fingerprint over an array<string> of words:
  * `acc = (acc * 131 + codepoint(w[0]) * 31 + numChars(w)) mod 1e9+7`,
  * left-to-right — the codegen'd form of the former
  * `aggregate(tokens, ...)` higher-order call (CodegenFallback), with
  * identical per-word math (Spark's `ascii`/`length` semantics) so the
  * engine-portable oracle still matches. Null array or null element ⇒
  * null, as the HOF propagated.
  */
case class RollingFingerprint(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"fingerprint expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    RollingFingerprint.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("fp")
      s"""
         |Long $boxed = graft.functions.catalyst.RollingFingerprint$$.MODULE$$.compute($a);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

object RollingFingerprint {
  /** Boxed so a null element can yield SQL NULL through codegen. */
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      val w = arr.getUTF8String(i)
      val s = w.toString
      val cp = if (s.isEmpty) 0L else s.codePointAt(0).toLong
      acc = Math.floorMod(acc * 131L + cp * 31L + w.numChars().toLong, 1000000007L)
      i += 1
    }
    acc
  }
}

/** Sum of character lengths over array<string> (for mean-word-length
  * style quality metrics) — codegen'd, null element ⇒ null. */
case class SumCharLengths(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sumCharLengths expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    SumCharLengths.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val boxed = ctx.freshName("scl")
      s"""
         |Long $boxed = graft.functions.catalyst.SumCharLengths$$.MODULE$$.compute($a);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SumCharLengths =
    copy(child = newChild)
}

object SumCharLengths {
  def compute(arr: ArrayData): java.lang.Long = {
    val n = arr.numElements()
    var sum = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      sum += arr.getUTF8String(i).numChars().toLong
      i += 1
    }
    sum
  }
}

/** All word-shingle hashes of a token array in ONE map-side projection:
  * position i yields Spark's exact `xxhash64(ws[i], …, ws[i+n-1])` chain
  * (seed 42, per-child XxHash64Function step, null children skipped), for
  * i in 0..m-n; an array shorter than the shingle size yields one hash
  * chained over all its elements — bit-identical to the former
  * posexplode + window-`lead` formulation, WITHOUT the (id, token)
  * shuffle + per-partition sort the window needed. With this the minhash
  * pipeline's only exchange carries partially-aggregated signature
  * buffers (numHashes longs per doc), never token strings. */
case class ShingleHashes(child: Expression, shingleSize: Int)
  extends UnaryExpression {
  require(shingleSize >= 1, s"shingleSize=$shingleSize out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingleHashes expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleHashes.compute(a.asInstanceOf[ArrayData], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.catalyst.ShingleHashes$$.MODULE$$
         |  .compute($a, $shingleSize);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(ws: ArrayData, n: Int): GenericArrayData = {
    val m = ws.numElements()
    val count = if (m == 0) 0 else math.max(1, m - n + 1)
    val out = new Array[Long](count)
    val f = org.apache.spark.sql.catalyst.expressions.XxHash64Function
    var i = 0
    while (i < count) {
      var seed = 42L
      var j = i
      val end = math.min(i + n, m)
      while (j < end) {
        if (!ws.isNullAt(j))
          seed = f.hash(ws.getUTF8String(j), StringType, seed)
        j += 1
      }
      out(i) = seed
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Distinct word n-gram shingle STRINGS of a token array in one static
  * JVM call per row — the exact-string twin of [[ShingleHashes]], and a
  * drop-in for the former
  * `array_distinct(transform(sequence(1, m-n+1), i => concat_ws(" ",
  * slice(w, i, n))))` formulation in `TextFunctions.shingles`: `transform`
  * is a higher-order function (interpreted lambda dispatch with
  * per-element boxing — the hot-path class this codebase bans), and the
  * decontamination / n-gram-Jaccard / Gopher-repetition operators
  * evaluate it once per corpus row. Semantics replicated bit-for-bit:
  * arrays shorter than `n` yield the EMPTY array (not a short chain —
  * unlike the hash twin), shingles join with a single space skipping
  * null elements (`concat_ws`), and distinctness keeps first-occurrence
  * order (`array_distinct`). Null input propagates null; callers that
  * need the old `otherwise(array())` shape coalesce above.
  */
case class ShingleStrings(child: Expression, shingleSize: Int)
  extends UnaryExpression {
  require(shingleSize >= 1, s"shingleSize=$shingleSize out of range")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"shingleStrings expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    ShingleStrings.compute(a.asInstanceOf[ArrayData], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.catalyst.ShingleStrings$$.MODULE$$
         |  .compute($a, $shingleSize);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ShingleStrings =
    copy(child = newChild)
}

object ShingleStrings {
  private val Sep = UTF8String.fromString(" ")

  def compute(ws: ArrayData, n: Int): GenericArrayData = {
    val m = ws.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    // LinkedHashSet = array_distinct's first-occurrence order
    val seen = new java.util.LinkedHashSet[UTF8String]()
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i <= m - n) {
      var j = 0
      while (j < n) {
        parts(j) = if (ws.isNullAt(i + j)) null else ws.getUTF8String(i + j)
        j += 1
      }
      // concatWs skips nulls — exactly concat_ws, and it copies bytes,
      // so the emitted strings own their storage
      seen.add(UTF8String.concatWs(Sep, parts: _*))
      i += 1
    }
    val out = new Array[Any](seen.size())
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** concat_ws(" ", parts) over `ws[i..i+n)` — nulls skipped, exactly
    * Spark's ConcatWs (shared by the shingle/boilerplate/span kernels). */
  private[catalyst] def gramAt(ws: ArrayData, i: Int, n: Int,
      parts: Array[UTF8String], sep: UTF8String): UTF8String = {
    var j = 0
    while (j < n) {
      parts(j) = if (ws.isNullAt(i + j)) null else ws.getUTF8String(i + j)
      j += 1
    }
    UTF8String.concatWs(sep, parts: _*)
  }

  private[catalyst] val Sep0: UTF8String = Sep
}

/** Boilerplate pass-2 rewrite in one static JVM call per row — replaces
  * the interpreted `filter(starts, i => inGrams(...)) → transform →
  * array_except → transform(keptIdx, element_at)` chain (each a
  * CodegenFallback higher-order function; the rewrite ran O(words)
  * interpreted lambda dispatches per document). Semantics are
  * bit-identical: every window of `n` words whose space-joined gram
  * (concat_ws — nulls skipped) is in `grams` marks its positions
  * covered; `cleaned` re-joins the uncovered words with single spaces
  * (concat_ws again: null words skipped, empty words kept), `removed` =
  * the number of covered positions. Null input array propagates null;
  * the caller maps it to (null text, 0 removed) like the old form.
  */
case class RemoveNgrams(child: Expression, grams: Seq[String], n: Int)
  extends UnaryExpression {
  require(n >= 1, s"n=$n out of range")

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("removed", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"removeNgrams expects array<string>, got ${other.simpleString}")
  }

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](grams.size * 2)
    grams.foreach(g => s.add(UTF8String.fromString(g)))
    s
  }

  override def nullSafeEval(a: Any): Any =
    RemoveNgrams.compute(a.asInstanceOf[ArrayData], set, n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("graftGramSet", set, "java.util.HashSet")
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.catalyst.RemoveNgrams$$.MODULE$$
         |  .compute($a, $setRef, $n);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): RemoveNgrams =
    copy(child = newChild)
}

object RemoveNgrams {
  def compute(ws: ArrayData, grams: java.util.HashSet[UTF8String],
      n: Int): InternalRow = {
    val m = ws.numElements()
    val cover = new Array[Boolean](m)
    if (m >= n && !grams.isEmpty) {
      val parts = new Array[UTF8String](n)
      var i = 0
      while (i <= m - n) {
        if (grams.contains(
            ShingleStrings.gramAt(ws, i, n, parts, ShingleStrings.Sep0))) {
          var j = i
          while (j < i + n) { cover(j) = true; j += 1 }
        }
        i += 1
      }
    }
    joinUncovered(ws, cover, m)
  }

  /** (cleaned = uncovered words space-joined, removed = covered count) —
    * shared with [[StripSpans]]. */
  private[catalyst] def joinUncovered(ws: ArrayData, drop: Array[Boolean],
      m: Int): InternalRow = {
    var removed = 0
    var kept = 0
    var p = 0
    while (p < m) {
      if (drop(p)) removed += 1
      else if (!ws.isNullAt(p)) kept += 1 // concat_ws skips null words
      p += 1
    }
    val parts = new Array[UTF8String](kept)
    var k = 0
    p = 0
    while (p < m) {
      if (!drop(p) && !ws.isNullAt(p)) { parts(k) = ws.getUTF8String(p); k += 1 }
      p += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(
      UTF8String.concatWs(ShingleStrings.Sep0, parts: _*),
      removed)
  }
}

/** All positioned k-shingles of a token array — (start, gram) structs,
  * one static call per row; the exact-substring dedup's explode source
  * (replaces its interpreted `transform(sequence(...), i => struct(i,
  * concat_ws(...)))`). Grams join with a single space skipping null
  * words (concat_ws); arrays shorter than `k` yield the empty array.
  * Null input propagates null (callers coalesce to empty, matching the
  * old `otherwise(array())` arm). */
case class PositionedShingles(child: Expression, shingleSize: Int)
  extends UnaryExpression {
  require(shingleSize >= 1, s"shingleSize=$shingleSize out of range")

  private val elem = StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("g", StringType, nullable = false)))

  override def dataType: DataType = ArrayType(elem, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"positionedShingles expects array<string>, got ${other.simpleString}")
  }

  override def nullSafeEval(a: Any): Any =
    PositionedShingles.compute(a.asInstanceOf[ArrayData], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"""
         |${ev.value} = graft.functions.catalyst.PositionedShingles$$.MODULE$$
         |  .compute($a, $shingleSize);
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): PositionedShingles = copy(child = newChild)
}

object PositionedShingles {
  def compute(ws: ArrayData, k: Int): GenericArrayData = {
    val m = ws.numElements()
    if (m < k) return new GenericArrayData(new Array[Any](0))
    val out = new Array[Any](m - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= m - k) {
      out(i) = org.apache.spark.sql.catalyst.InternalRow(
        i, ShingleStrings.gramAt(ws, i, k, parts, ShingleStrings.Sep0))
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Exact-substring dedup's positional rewrite in one static call —
  * replaces the interpreted `ranges → array_except → array_except →
  * transform(keptIdx, element_at)` chain. A position is dropped iff it
  * lies inside some span of `starts` and inside NO span of `pstarts`
  * (each span is k positions). `cleaned` re-joins the surviving words
  * (concat_ws: null words skipped), `removed` counts dropped positions.
  * Null `starts`/`pstarts` mean "no spans" (the old coalesce-to-empty);
  * null word array propagates null, the caller maps it like the old
  * form. */
case class StripSpans(words: Expression, starts: Expression,
    pstarts: Expression, spanLen: Int) extends Expression {
  require(spanLen >= 1, s"spanLen=$spanLen out of range")

  override def children: Seq[Expression] = Seq(words, starts, pstarts)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)

  override def dataType: DataType = StructType(Seq(
    StructField("cleaned", StringType, nullable = false),
    StructField("removed", IntegerType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    (words.dataType, starts.dataType, pstarts.dataType) match {
      case (ArrayType(StringType, _), ArrayType(IntegerType, _),
          ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"stripSpans expects (array<string>, array<int>, array<int>), got $other")
    }

  override def eval(input: InternalRow): Any = {
    val w = words.eval(input)
    if (w == null) return null // null text propagates; caller maps it
    StripSpans.compute(w.asInstanceOf[ArrayData],
      starts.eval(input).asInstanceOf[ArrayData],
      pstarts.eval(input).asInstanceOf[ArrayData], spanLen)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val wc = words.genCode(ctx)
    val stc = starts.genCode(ctx)
    val pc = pstarts.genCode(ctx)
    val javaType = CodeGenerator.javaType(dataType)
    ev.copy(code =
      code"""
        ${wc.code}
        boolean ${ev.isNull} = ${wc.isNull};
        $javaType ${ev.value} = null;
        if (!${ev.isNull}) {
          ${stc.code}
          ${pc.code}
          ${ev.value} = graft.functions.catalyst.StripSpans$$.MODULE$$
            .compute(${wc.value},
              ${stc.isNull} ? null : ${stc.value},
              ${pc.isNull} ? null : ${pc.value}, $spanLen);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): StripSpans =
    copy(words = newChildren(0), starts = newChildren(1),
      pstarts = newChildren(2))
}

object StripSpans {
  def compute(ws: ArrayData, starts: ArrayData, pstarts: ArrayData,
      k: Int): InternalRow = {
    val m = ws.numElements()
    val drop = new Array[Boolean](m)
    def mark(arr: ArrayData, into: Array[Boolean]): Unit = {
      if (arr == null) return
      val n = arr.numElements()
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          var p = math.max(0, arr.getInt(i))
          val end = math.min(m, arr.getInt(i) + k)
          while (p < end) { into(p) = true; p += 1 }
        }
        i += 1
      }
    }
    mark(starts, drop)
    if (pstarts != null && pstarts.numElements() > 0) {
      val prot = new Array[Boolean](m)
      mark(pstarts, prot)
      var p = 0
      while (p < m) { if (prot(p)) drop(p) = false; p += 1 }
    }
    RemoveNgrams.joinUncovered(ws, drop, m)
  }
}

/** MinHash signature aggregate: for hash family k (0 until numHashes),
  * tracks `min(xxhash64(k, shingleHash))` over the group and returns the
  * signature as array<long> — bit-identical to the former `numHashes`
  * separate `min(xxhash64(lit(k), sh))` columns (the per-family seed
  * `hashInt(k, 42)` is precomputed once; the running value is
  * `hashLong(sh, seed_k)`, exactly Spark's `xxhash64(k, sh)` chain), but
  * with ONE typed aggregate over a primitive buffer instead of a wide
  * generated aggregate class. Partial aggregation still applies.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(numHashes >= 1, s"numHashes=$numHashes out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhashAgg expects bigint shingle hashes, got ${other.simpleString}")
  }

  @transient private lazy val seeds: Array[Long] = {
    val f = org.apache.spark.sql.catalyst.expressions.XxHash64Function
    Array.tabulate(numHashes)(k => f.hash(k, IntegerType, 42L))
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val sh = v.asInstanceOf[Long]
      val f = org.apache.spark.sql.catalyst.expressions.XxHash64Function
      var k = 0
      while (k < numHashes) {
        val h = f.hash(sh, LongType, seeds(k))
        if (h < buf(k)) buf(k) = h
        k += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < numHashes) {
      if (other(k) < buf(k)) buf(k) = other(k)
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf.clone())

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numHashes * 8)
    var k = 0
    while (k < numHashes) { bb.putLong(buf(k)); k += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](numHashes)
    var k = 0
    while (k < numHashes) { buf(k) = bb.getLong(); k += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): MinHashAgg =
    copy(child = newChild)
}

/** SimHash bit-vote aggregate: each input hash votes ±1 on all 64 bits;
  * the result packs bit i iff its vote sum is strictly positive.
  *
  * A typed imperative aggregate with a primitive `Array[Long](64)` buffer
  * replaces round 2's 64 separate `sum` columns, whose generated
  * aggregate class was large enough to blow the JIT method limit and
  * pollute the JVM code cache for every later query. Partial aggregation
  * still applies (the buffer merges associatively), so the shuffle
  * carries one 512-byte buffer per (doc, partition), not tokens.
  */
/** Element-wise mean of a numeric-array column as array<double> — the
  * k-means recentering aggregate: ONE typed aggregate with a primitive
  * buffer per group instead of dims× posexplode rows + a per-dimension
  * shuffle. Buffer slot 0 holds the row count, slots 1..dims the running
  * sums (sized lazily by the first non-null vector; later dimension
  * mismatches are skipped, matching the kernels' null/length rules).
  */
case class VectorMean(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (VectorKernels.isNumericArray(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vectorMean expects a numeric array, got ${child.dataType.simpleString}")

  // lazy: child is unresolved at construction (the Column-shim path),
  // so its dataType is only safe to inspect at execution time
  private lazy val elemFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val elemInt: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case IntegerType | LongType => true
      case _ => false
    }

  override def createAggregationBuffer(): Array[Double] = Array.empty[Double]

  override def update(buf: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) return buf
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val b = if (buf.isEmpty) new Array[Double](n + 1) else buf
    if (b.length != n + 1) return b // dimension mismatch: skip the row
    var i = 0
    var ok = true
    while (ok && i < n) { if (a.isNullAt(i)) ok = false; i += 1 }
    if (!ok) return b
    b(0) += 1.0
    i = 0
    while (i < n) {
      b(i + 1) +=
        (if (elemFloat) a.getFloat(i).toDouble
         else if (elemInt) a.getLong(i).toDouble
         else a.getDouble(i))
      i += 1
    }
    b
  }

  override def merge(buf: Array[Double], other: Array[Double]): Array[Double] = {
    if (other.isEmpty) return buf
    if (buf.isEmpty) return other
    if (buf.length != other.length) return buf
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Double]): Any = {
    if (buf.isEmpty || buf(0) == 0.0) return null
    val out = new Array[Double](buf.length - 1)
    var i = 0
    while (i < out.length) { out(i) = buf(i + 1) / buf(0); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putDouble(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getDouble(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorMean =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorMean =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): VectorMean =
    copy(child = newChild)
}

/** OR-fold of Bloom-filter bit positions into one fixed-size bitset —
  * the build side of [[graft.operators.BloomAdmission]]. Input is the
  * ALREADY-HASHED position array (the hash family lives in Column space,
  * `BloomAdmission.hashPositions`, so build and probe can never drift).
  * The buffer is `numBits/64` longs, merged with bitwise OR — fully
  * partial-mergeable, so a 100 TB corpus reduces map-side to one
  * `numBits/8`-byte value on the driver regardless of row count.
  * Returns the bitset as BIG-endian-word bytes (BinaryType; ByteBuffer's
  * default order — `BloomAdmission.mightContain` decodes the same way).
  */
case class BloomBitsAgg(
    child: Expression,
    numBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(numBits >= 64 && (numBits & 63) == 0,
    s"numBits must be a positive multiple of 64, got $numBits")
  private val words = numBits / 64

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bloomBits expects array<bigint> positions, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](words)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val pos = arr.getLong(i)
          // positions come from pmod(hash, numBits) — in range by
          // construction; a foreign caller's out-of-range bit is refused
          require(pos >= 0 && pos < numBits,
            s"bloom position $pos outside [0, $numBits)")
          buf((pos >> 6).toInt) |= 1L << (pos & 63)
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < words) { buf(i) |= other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(words * 8)
    var i = 0
    while (i < words) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](words)
    var i = 0
    while (i < words) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBitsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BloomBitsAgg =
    copy(child = newChild)
  override def prettyName: String = "bloom_bits"
}

/** Count-min sketch fold: `depth × width` counters, one increment per
  * (row, depth) at the ALREADY-HASHED positions — the build side of
  * [[graft.operators.FrequencySketch]]. Like [[BloomBitsAgg]] the hash
  * family lives in Column space, the buffer is fixed-size, and merge is
  * elementwise ADD — fully partial-mergeable, so the sketch of a 100 TB
  * token stream reduces map-side to `depth*width*8` bytes regardless of
  * row count. Returns the counter matrix row-major as bytes.
  */
case class CountMinAgg(
    child: Expression,
    width: Int,
    depth: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(width >= 8, s"width must be >= 8, got $width")
  require(depth >= 1 && depth <= 16, s"depth must be in [1, 16], got $depth")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"countMin expects array<bigint> positions, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == depth,
        s"expected $depth positions, got ${arr.numElements()}")
      var i = 0
      while (i < depth) {
        // a null slot would silently read as 0 and corrupt counter 0 of
        // this depth row — refuse loudly (skipping, as BloomBitsAgg may,
        // would leave the depth rows unevenly incremented)
        require(!arr.isNullAt(i), s"count-min position $i is null")
        val pos = arr.getLong(i)
        require(pos >= 0 && pos < width,
          s"count-min position $pos outside [0, $width)")
        buf(i * width + pos.toInt) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buf.length) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = serialize(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(buf.length * 8)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](depth * width)
    var i = 0
    while (i < buf.length) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): CountMinAgg =
    copy(child = newChild)
  override def prettyName: String = "count_min"
}

case class SimhashVotes(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhashVotes expects bigint hashes, got ${other.simpleString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < 64) {
        buf(i) += (((h >>> i) & 1L) << 1) - 1L // +1 if bit set, else -1
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < 64) { buf(i) += other(i); i += 1 }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (buf(i) > 0) sig |= 1L << i
      i += 1
    }
    sig
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 8)
    var i = 0
    while (i < 64) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Array[Long](64)
    var i = 0
    while (i < 64) { buf(i) = bb.getLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SimhashVotes =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SimhashVotes =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SimhashVotes =
    copy(child = newChild)
}

/** Johnson–Lindenstrauss signed random projection: reduce a numeric
  * vector to `k` dimensions via a deterministic ±1 sign matrix,
  * `out[j] = Σ_i x[i]·s(i,j) / sqrt(k)` (Achlioptas 2003's database-
  * friendly projection — ±1 entries preserve pairwise distances within
  * (1±ε) at k = O(log n / ε²), with no dense Gaussian matrix to ship).
  * The sign family `s(i,j) = ±1` from the parity of
  * `(31i² + 17ij + 13j² + 57i + 23j) mod 97` is plain integer arithmetic
  * so the DuckDB oracle reproduces the projection EXACTLY (the
  * declared-gate discipline); the QUADRATIC form matters — a linear form
  * mod p is an arithmetic progression whose parity correlates with
  * periodic inputs (measured: 3–7× distance shrinkage on period-13
  * vectors; the spec's JL-band test pins the fix). A production
  * deployment would swap in a seeded splitmix family (see [[SrpBuckets]])
  * without changing the plumbing. Map-side, codegen'd, no UDF: at 100 TB
  * the reduction streams through the scan and cuts every downstream ANN /
  * clustering shuffle by dims/k.
  */
case class SignedProjection(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"k=$k out of range")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case t if VectorKernels.isNumericArray(t) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"signedProjection expects a numeric array, got ${other.simpleString}")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any =
    SignedProjection.compute(a.asInstanceOf[ArrayData], k, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.catalyst.SignedProjection$$.MODULE$$" +
        s".compute($a, $k, $isFloat);"
    })

  override protected def withNewChildInternal(newChild: Expression): SignedProjection =
    copy(child = newChild)
}

object SignedProjection {
  def compute(vec: ArrayData, k: Int, float: Boolean): ArrayData = {
    val dims = vec.numElements()
    val scale = 1.0 / math.sqrt(k.toDouble)
    val out = new Array[Double](k)
    var j = 0
    while (j < k) {
      var sum = 0.0
      var i = 0
      while (i < dims) {
        if (!vec.isNullAt(i)) {
          val x = if (float) vec.getFloat(i).toDouble else vec.getDouble(i)
          val il = i.toLong; val jl = j.toLong
          val sign =
            if (((31L * il * il + 17L * il * jl + 13L * jl * jl +
                  57L * il + 23L * jl) % 97L) % 2L == 0L) 1.0 else -1.0
          sum += x * sign
        }
        i += 1
      }
      out(j) = sum * scale
      j += 1
    }
    new GenericArrayData(out)
  }
}

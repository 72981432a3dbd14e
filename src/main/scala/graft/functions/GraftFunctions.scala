package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the vector / hashing hot paths.
  *
  * These run as single tight JVM loops per row (vs. chains of interpreted
  * higher-order array functions), which matters when the corpus is 100 TB:
  * cosine over a 64-dim pair is ~200 ns here. All folds are sequential
  * left-to-right in double precision, which makes results bit-reproducible
  * and mirrorable in the DuckDB oracle (`list_reduce`).
  *
  * Every expression here implements `doGenCode` (bit-identical to its
  * interpreted `eval`, spec-checked in FusedExpressionSpec), so the dedup /
  * vector projections stay inside whole-stage codegen.
  */
private[graft] trait VectorReader {
  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def read(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType  => a.getFloat(i).toDouble
    case DoubleType => a.getDouble(i)
    case LongType   => a.getLong(i).toDouble
    case IntegerType => a.getInt(i).toDouble
    case other => throw new IllegalArgumentException(s"unsupported vector element type $other")
  }

  /** Java accessor snippet for element i of an ArrayData of type t. */
  protected def readJava(arr: String, i: String, t: DataType): String = t match {
    case FloatType   => s"(double) $arr.getFloat($i)"
    case DoubleType  => s"$arr.getDouble($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case other => throw new IllegalArgumentException(s"unsupported vector element type $other")
  }
}

/** Sequential-fold dot product of two numeric arrays, in double.
  * Generates a tight primitive loop inside whole-stage codegen.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorReader {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]; val y = r.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0; var i = 0
    while (i < n) { s += read(x, i, tx) * read(y, i, ty); i += 1 }
    s
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += (${readJava(a, i, elemType(left))}) * (${readJava(b, i, elemType(right))});
         |}
         |${ev.value} = $s;
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Cosine similarity = dot/(||a||*||b||), all folds sequential in double.
  * Returns null on zero-norm input. Codegen: one fused primitive loop.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with VectorReader {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[ArrayData]; val y = r.asInstanceOf[ArrayData]
    val (tx, ty) = (elemType(left), elemType(right))
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0; var i = 0
    while (i < n) {
      val a = read(x, i, tx); val b = read(y, i, ty)
      dot += a * b; nx += a * a; ny += b * b
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null
    else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val nx = ctx.freshName("nx"); val ny = ctx.freshName("ny")
      val va = ctx.freshName("va"); val vb = ctx.freshName("vb")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $nx = 0.0; double $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $va = ${readJava(a, i, elemType(left))};
         |  double $vb = ${readJava(b, i, elemType(right))};
         |  $dot += $va * $vb; $nx += $va * $va; $ny += $vb * $vb;
         |}
         |if ($nx == 0.0 || $ny == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($nx) * java.lang.Math.sqrt($ny));
         |}
       """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** 64-bit SimHash over an array of string tokens (per-occurrence weight 1).
  * Bit j of the result is 1 iff the sum over tokens of ±1 (sign = bit j of
  * xxhash64(token, seed=42)) is positive. Codegen emits the same loop over
  * `XXH64.hashUnsafeBytes` the interpreted path uses — bit-identical.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val counts = ctx.freshName("counts"); val h = ctx.freshName("h")
      val s = ctx.freshName("s"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $arr.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |    for (int $j = 0; $j < 64; $j++) {
         |      if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($counts[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L; var j = 0
    while (j < 64) { if (counts(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature: for each (a,b) permutation coefficient, the minimum of
  * ((a*h + b) >>> 1) over the input element hashes (array<long>). The
  * unsigned shift keeps values non-negative under wrapping multiply-shift
  * hashing. Empty input yields Long.MaxValue per slot.
  */
case class MinHashSig(child: Expression, coeffs: Seq[(Long, Long)])
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  @transient private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  @transient private lazy val bs: Array[Long] = coeffs.map(_._2).toArray
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val asRef = ctx.addReferenceObj("mhAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("mhBs", bs, "long[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val h = ctx.freshName("h"); val g = ctx.freshName("g"); val out = ctx.freshName("out")
      // loop order inverted vs the interpreted path (row-major over input)
      // — min() is order-independent, results are bit-identical
      s"""
         |int $n = $arr.numElements();
         |long[] $out = new long[${coeffs.length}];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $arr.getLong($i);
         |  for (int $k = 0; $k < ${coeffs.length}; $k++) {
         |    long $g = ($asRef[$k] * $h + $bsRef[$k]) >>> 1;
         |    if ($g < $out[$k]) $out[$k] = $g;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](coeffs.length)
    var k = 0
    while (k < coeffs.length) {
      val (a, b) = coeffs(k)
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        val g = (a * arr.getLong(i) + b) >>> 1
        if (g < mn) mn = g
        i += 1
      }
      out(k) = mn
      k += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Word n-gram shingle hashes: one 64-bit hash per window of `n` adjacent
  * tokens (xxhash64 chain over per-token hashes — no string concatenation,
  * one pass). Inputs shorter than `n` yield a single whole-input hash.
  * Duplicates are kept: MinHash minima are multiset-invariant, and callers
  * needing set semantics wrap in array_distinct.
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val m = ctx.freshName("m"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val wh = ctx.freshName("wh"); val s = ctx.freshName("s"); val acc = ctx.freshName("acc")
      val count = ctx.freshName("count"); val width = ctx.freshName("width")
      val out = ctx.freshName("out")
      s"""
         |int $m = $arr.numElements();
         |long[] $wh = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($arr.isNullAt($i)) { $wh[$i] = 0L; } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    $wh[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |int $count = ($m >= $n) ? $m - $n + 1 : 1;
         |int $width = ($m >= $n) ? $n : $m;
         |long[] $out = new long[$count];
         |for (int $i = 0; $i < $count; $i++) {
         |  long $acc = 42L;
         |  for (int $j = $i; $j < $i + $width; $j++) {
         |    $acc = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($wh[$j], $acc);
         |  }
         |  $out[$i] = $acc;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val m = words.numElements()
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      wh(i) = if (words.isNullAt(i)) 0L
        else XxHash64Function.hash(words.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val count = if (m >= n) m - n + 1 else 1
    val width = if (m >= n) n else m
    val out = new Array[Long](count)
    i = 0
    while (i < count) {
      var s = 42L
      var j = i
      while (j < i + width) {
        s = XxHash64Function.hash(wh(j), LongType, s)
        j += 1
      }
      out(i) = s
      i += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Fused shingle→MinHash→band pipeline: words in, band buckets out, one
  * pass, no intermediate arrays. Semantically equal to
  * `BandBuckets(MinHashSig(ShingleHashes(words, n)))` (spec-checked) but
  * one expression call per row instead of three with materialized
  * ArrayData between them — the per-row cost that dominates dedup of a
  * 100 TB corpus.
  */
case class MinHashBands(child: Expression, coeffs: Seq[(Long, Long)],
    bands: Int, rowsPerBand: Int, shingle: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  private lazy val as: Array[Long] = coeffs.map(_._1).toArray
  private lazy val bs: Array[Long] = coeffs.map(_._2).toArray
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val asRef = ctx.addReferenceObj("mhbAs", as, "long[]")
      val bsRef = ctx.addReferenceObj("mhbBs", bs, "long[]")
      val nSig = coeffs.length
      val m = ctx.freshName("m"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val k = ctx.freshName("k"); val b = ctx.freshName("b"); val e = ctx.freshName("e")
      val wh = ctx.freshName("wh"); val s = ctx.freshName("s"); val h = ctx.freshName("h")
      val g = ctx.freshName("g"); val sig = ctx.freshName("sig")
      val count = ctx.freshName("count"); val width = ctx.freshName("width")
      val out = ctx.freshName("out")
      s"""
         |int $m = $arr.numElements();
         |long[] $wh = new long[$m];
         |for (int $i = 0; $i < $m; $i++) {
         |  if ($arr.isNullAt($i)) { $wh[$i] = 0L; } else {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    $wh[$i] = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |long[] $sig = new long[$nSig];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |int $count = ($m >= $shingle) ? $m - $shingle + 1 : 1;
         |int $width = ($m >= $shingle) ? $shingle : $m;
         |for (int $i = 0; $i < $count; $i++) {
         |  long $h = 42L;
         |  for (int $j = $i; $j < $i + $width; $j++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($wh[$j], $h);
         |  }
         |  for (int $k = 0; $k < $nSig; $k++) {
         |    long $g = ($asRef[$k] * $h + $bsRef[$k]) >>> 1;
         |    if ($g < $sig[$k]) $sig[$k] = $g;
         |  }
         |}
         |long[] $out = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $h = (long) $b;
         |  int $e = java.lang.Math.min(($b + 1) * $rowsPerBand, $nSig);
         |  for (int $j = $b * $rowsPerBand; $j < $e; $j++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($sig[$j], $h);
         |  }
         |  $out[$b] = $h;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override def nullSafeEval(v: Any): Any = {
    val words = v.asInstanceOf[ArrayData]
    val m = words.numElements()
    val wh = new Array[Long](m)
    var i = 0
    while (i < m) {
      wh(i) = if (words.isNullAt(i)) 0L
        else XxHash64Function.hash(words.getUTF8String(i), StringType, 42L)
      i += 1
    }
    val nSig = coeffs.length
    val sig = Array.fill(nSig)(Long.MaxValue)
    val count = if (m >= shingle) m - shingle + 1 else 1
    val width = if (m >= shingle) shingle else m
    i = 0
    while (i < count) {
      var h = 42L
      var j = i
      while (j < i + width) { h = XxHash64Function.hash(wh(j), LongType, h); j += 1 }
      var k = 0
      while (k < nSig) {
        val g = (as(k) * h + bs(k)) >>> 1
        if (g < sig(k)) sig(k) = g
        k += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = b.toLong
      var s = b * rowsPerBand
      val end = math.min((b + 1) * rowsPerBand, nSig)
      while (s < end) { h = XxHash64Function.hash(sig(s), LongType, h); s += 1 }
      out(b) = h
      b += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** LSH band buckets from a MinHash signature: output[k] = xxhash64-chain
  * over slots [k*r, (k+1)*r) seeded with k. One tiny expression instead of
  * `bands` separate hash(slice(...)) trees — keeps codegen compile time flat
  * as band count grows.
  */
case class BandBuckets(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val k = ctx.freshName("k"); val i = ctx.freshName("i"); val e = ctx.freshName("e")
      val h = ctx.freshName("h"); val out = ctx.freshName("out")
      s"""
         |long[] $out = new long[$bands];
         |for (int $k = 0; $k < $bands; $k++) {
         |  long $h = (long) $k;
         |  int $e = java.lang.Math.min(($k + 1) * $rowsPerBand, $arr.numElements());
         |  for (int $i = $k * $rowsPerBand; $i < $e; $i++) {
         |    $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashLong($arr.getLong($i), $h);
         |  }
         |  $out[$k] = $h;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })
  override def nullSafeEval(v: Any): Any = {
    val sig = v.asInstanceOf[ArrayData]
    val out = new Array[Long](bands)
    var k = 0
    while (k < bands) {
      var h = k.toLong
      var i = k * rowsPerBand
      val end = math.min((k + 1) * rowsPerBand, sig.numElements())
      while (i < end) {
        h = XxHash64Function.hash(sig.getLong(i), LongType, h)
        i += 1
      }
      out(k) = h
      k += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Shared scoring state for the centroid expressions: the (tiny) centroid
  * set lives on the driver and ships inside the serialized expression — no
  * join, no shuffle, no Spark broadcast machinery needed at nLists×dim
  * doubles (a few KB).
  */
private[graft] trait CentroidSet extends VectorReader { self: UnaryExpression =>
  def centroids: Seq[Seq[Double]]
  require(centroids.nonEmpty, "centroid set must be non-empty")
  require(centroids.forall(_.length == centroids.head.length),
    "all centroids must share one dimension")

  protected val dim: Int = centroids.head.length
  protected val nCells: Int = centroids.length
  @transient protected lazy val flat: Array[Double] = {
    val a = new Array[Double](nCells * dim)
    var c = 0
    while (c < nCells) {
      var j = 0
      while (j < dim) { a(c * dim + j) = centroids(c)(j); j += 1 }
      c += 1
    }
    a
  }
  /** Precomputed centroid L2 norms (sequential fold, like CosineSim). */
  @transient protected lazy val cellNorms: Array[Double] = {
    val a = new Array[Double](nCells)
    var c = 0
    while (c < nCells) {
      var s = 0.0; var j = 0
      while (j < dim) { val x = centroids(c)(j); s += x * x; j += 1 }
      a(c) = math.sqrt(s)
      c += 1
    }
    a
  }

  /** Cosine sims of `arr` against every centroid into `out` (length
    * nCells); NegativeInfinity marks zero-norm centroids. Returns the
    * vector's squared norm (0.0 ⇒ all sims are -inf).
    */
  protected def scoreAll(arr: ArrayData, out: Array[Double]): Double = {
    val t = elemType(child)
    val n = math.min(arr.numElements(), dim)
    var nx = 0.0; var i = 0
    while (i < n) { val x = read(arr, i, t); nx += x * x; i += 1 }
    var c = 0
    while (c < nCells) {
      if (nx == 0.0 || cellNorms(c) == 0.0) out(c) = Double.NegativeInfinity
      else {
        var dot = 0.0; var j = 0; val base = c * dim
        while (j < n) { dot += read(arr, j, t) * flat(base + j); j += 1 }
        out(c) = dot / (math.sqrt(nx) * cellNorms(c))
      }
      c += 1
    }
    nx
  }
}

/** Nearest-centroid cell id by cosine similarity — the map-only IVF
  * assignment. One row in, one long out; no shuffle anywhere. Ties go to
  * the lowest cell id (strict-greater argmax). Zero-norm vectors (cosine
  * undefined) are deterministically routed to cell 0 rather than dropped,
  * so the IVF index retains every non-null row like the brute-force
  * baseline does.
  */
case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]])
    extends UnaryExpression with CentroidSet {
  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val t = elemType(child)
    val n = math.min(arr.numElements(), dim)
    var nx = 0.0; var i = 0
    while (i < n) { val x = read(arr, i, t); nx += x * x; i += 1 }
    if (nx == 0.0) 0L
    else {
      var best = -1; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < nCells) {
        if (cellNorms(c) != 0.0) {
          var dot = 0.0; var j = 0; val base = c * dim
          while (j < n) { dot += read(arr, j, t) * flat(base + j); j += 1 }
          val sim = dot / (math.sqrt(nx) * cellNorms(c))
          if (sim > bestSim) { bestSim = sim; best = c }
        }
        c += 1
      }
      if (best < 0) 0L else best.toLong
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("centroidNorms", cellNorms, "double[]")
      val n = ctx.freshName("n"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val x = ctx.freshName("x"); val nx = ctx.freshName("nx")
      val dot = ctx.freshName("dot"); val sim = ctx.freshName("sim")
      val best = ctx.freshName("best"); val bestSim = ctx.freshName("bestSim")
      val base = ctx.freshName("base")
      s"""
         |int $n = java.lang.Math.min($arr.numElements(), $dim);
         |double $nx = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${readJava(arr, i, elemType(child))};
         |  $nx += $x * $x;
         |}
         |if ($nx == 0.0) {
         |  ${ev.value} = 0L;
         |} else {
         |  int $best = -1;
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $nCells; $c++) {
         |    if ($normsRef[$c] != 0.0) {
         |      double $dot = 0.0;
         |      int $base = $c * $dim;
         |      for (int $j = 0; $j < $n; $j++) {
         |        $dot += (${readJava(arr, j, elemType(child))}) * $flatRef[$base + $j];
         |      }
         |      double $sim = $dot / (java.lang.Math.sqrt($nx) * $normsRef[$c]);
         |      if ($sim > $bestSim) { $bestSim = $sim; $best = $c; }
         |    }
         |  }
         |  ${ev.value} = $best < 0 ? 0L : (long) $best;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** The `n` nearest cell ids by cosine, best first (ties → lower id) —
  * the IVF probe list for queries AND the multi-probe dedup assignment
  * (which maps it over the whole corpus, hence full codegen like
  * NearestCentroid). Zero-norm inputs get cells 0..n-1 so they still
  * receive candidates deterministically.
  */
case class NearestCells(child: Expression, centroids: Seq[Seq[Double]], n: Int)
    extends UnaryExpression with CentroidSet {
  require(n >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val flatRef = ctx.addReferenceObj("centroidsFlat", flat, "double[]")
      val normsRef = ctx.addReferenceObj("centroidNorms", cellNorms, "double[]")
      val take = math.min(n, nCells)
      val nv = ctx.freshName("nv"); val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val x = ctx.freshName("x"); val nx = ctx.freshName("nx")
      val dot = ctx.freshName("dot"); val sims = ctx.freshName("sims")
      val used = ctx.freshName("used"); val out = ctx.freshName("out")
      val s = ctx.freshName("s"); val best = ctx.freshName("best")
      val bestSim = ctx.freshName("bestSim"); val base = ctx.freshName("base")
      s"""
         |int $nv = java.lang.Math.min($arr.numElements(), $dim);
         |double $nx = 0.0;
         |for (int $i = 0; $i < $nv; $i++) {
         |  double $x = ${readJava(arr, i, elemType(child))};
         |  $nx += $x * $x;
         |}
         |double[] $sims = new double[$nCells];
         |for (int $c = 0; $c < $nCells; $c++) {
         |  if ($nx == 0.0 || $normsRef[$c] == 0.0) {
         |    $sims[$c] = Double.NEGATIVE_INFINITY;
         |  } else {
         |    double $dot = 0.0;
         |    int $base = $c * $dim;
         |    for (int $j = 0; $j < $nv; $j++) {
         |      $dot += (${readJava(arr, j, elemType(child))}) * $flatRef[$base + $j];
         |    }
         |    $sims[$c] = $dot / (java.lang.Math.sqrt($nx) * $normsRef[$c]);
         |  }
         |}
         |long[] $out = new long[$take];
         |boolean[] $used = new boolean[$nCells];
         |for (int $s = 0; $s < $take; $s++) {
         |  int $best = -1;
         |  double $bestSim = Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $nCells; $c++) {
         |    if (!$used[$c] && ($best < 0 || $sims[$c] > $bestSim)) {
         |      $bestSim = $sims[$c]; $best = $c;
         |    }
         |  }
         |  $used[$best] = true;
         |  $out[$s] = (long) $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
       """.stripMargin
    })

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val sims = new Array[Double](nCells)
    scoreAll(arr, sims)
    val take = math.min(n, nCells)
    val out = new Array[Long](take)
    val used = new Array[Boolean](nCells)
    var s = 0
    while (s < take) {
      var best = -1; var bestSim = Double.NegativeInfinity
      var c = 0
      while (c < nCells) {
        // strict > keeps ties on the lowest unused cell id; -inf slots
        // (zero-norm) fall back to id order, covering the zero-norm query
        if (!used(c) && (best < 0 || sims(c) > bestSim)) { bestSim = sims(c); best = c }
        c += 1
      }
      used(best) = true
      out(s) = best.toLong
      s += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Order-dependent rolling (polynomial) hash over string tokens:
  * fp = fold(acc * 31 + xxhash64(token)), wrapping. A content fingerprint
  * that, unlike SimHash, is sensitive to token order.
  */
case class RollingFingerprint(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc"); val s = ctx.freshName("s")
      s"""
         |int $n = $arr.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$arr.isNullAt($i)) {
         |    org.apache.spark.unsafe.types.UTF8String $s = $arr.getUTF8String($i);
         |    $acc = $acc * 31L + org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
         |      $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        acc = acc * 31L + XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
      }
      i += 1
    }
    acc
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Z-order (Morton) value over k numeric columns. Each input is range-
  * bucketed against its driver-computed boundary set (binary search over
  * `2^bits - 1` sorted boundaries, typically approx-quantiles so skewed
  * columns still spread over all buckets), and the k bucket indices are
  * bit-interleaved into one long. Rows close in z-value are close in
  * EVERY input column, so files written in z order carry tight min/max
  * parquet stats on all of them — the multi-column file-pruning layout.
  *
  * One tight loop per row, fully codegen'd; the boundary table rides
  * along as a reference object like [[NearestCentroid]]'s centroids.
  * Null (and NaN) inputs deterministically land in bucket 0. Output is
  * never null.
  */
case class ZValue(children: Seq[Expression], boundaries: Seq[Seq[Double]])
    extends Expression {
  private val k = children.length
  private val m = boundaries.head.length
  private val bits = 63 - java.lang.Long.numberOfLeadingZeros(m + 1L)
  require(k >= 1 && boundaries.length == k, s"need one boundary set per child, got $k/${boundaries.length}")
  require(m >= 1 && (m + 1 & m) == 0, s"boundary count must be 2^bits - 1, got $m")
  require(boundaries.forall(_.length == m), "all boundary sets must be the same length")
  require(bits * k <= 63, s"bits($bits) * cols($k) must fit a long")
  private val flat: Array[Double] = boundaries.flatten.toArray

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  // resolved-time check: restrict to types whose codegen value is a Java
  // primitive, so the interpreted widening below and codegen's `(double)`
  // cast can never diverge (a DecimalType child would codegen an object
  // cast that does not compile — cast decimals to double first)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType match {
      case DoubleType | FloatType | LongType | IntegerType | ShortType | ByteType => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      "zvalue inputs must be non-decimal numeric — cast to double first")
  }

  private def bucket(off: Int, v: Double): Int = {
    var lo = 0; var hi = m
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v > flat(off + mid)) lo = mid + 1 else hi = mid
    }
    lo
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    var z = 0L
    var j = 0
    while (j < k) {
      val v = children(j).eval(input) match {
        case null       => null
        case d: Double  => d
        case f: Float   => f.toDouble
        case l: Long    => l.toDouble
        case i: Int     => i.toDouble
        case s: Short   => s.toDouble
        case b: Byte    => b.toDouble
        case other => throw new IllegalArgumentException(s"unsupported zvalue input $other")
      }
      val b = if (v == null) 0 else bucket(j * m, v.asInstanceOf[Double])
      var i = 0
      while (i < bits) { z |= ((b >> i) & 1L) << (i * k + j); i += 1 }
      j += 1
    }
    z
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val flatRef = ctx.addReferenceObj("zBoundaries", flat, "double[]")
    val parts = children.zipWithIndex.map { case (c, j) =>
      val g = c.genCode(ctx)
      val b = ctx.freshName("b"); val lo = ctx.freshName("lo"); val hi = ctx.freshName("hi")
      val mid = ctx.freshName("mid"); val v = ctx.freshName("v"); val i = ctx.freshName("i")
      s"""
         |${g.code}
         |int $b = 0;
         |if (!${g.isNull}) {
         |  double $v = (double) ${g.value};
         |  int $lo = 0; int $hi = $m;
         |  while ($lo < $hi) {
         |    int $mid = ($lo + $hi) >>> 1;
         |    if ($v > $flatRef[${j * m} + $mid]) { $lo = $mid + 1; } else { $hi = $mid; }
         |  }
         |  $b = $lo;
         |}
         |for (int $i = 0; $i < $bits; $i++) {
         |  ${ev.value} |= ((long) (($b >> $i) & 1)) << ($i * $k + $j);
         |}
       """.stripMargin
    }.mkString("\n")
    ev.copy(
      code = code"""
        |long ${ev.value} = 0L;
        |$parts
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

/** Column-API entry points; registration makes them usable both from SQL and
  * via `call_function` (avoiding any private Column constructors).
  */
object GraftFunctions {
  import graft.operators.dedup.MinHashDedup

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot", es => DotProduct(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_cosine", es => CosineSim(es(0), es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_simhash", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash_sig", es => MinHashSig(es.head, MinHashDedup.coeffs), "scala_udf")
    reg.createOrReplaceTempFunction("graft_fingerprint", es => RollingFingerprint(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_band_buckets",
      es => BandBuckets(es.head, MinHashDedup.Bands, MinHashDedup.RowsPerBand), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_shingle3", es => ShingleHashes(es.head, 3), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_shingle5", es => ShingleHashes(es.head, 5), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_minhash_bands",
      es => MinHashBands(es.head, MinHashDedup.coeffs,
        MinHashDedup.Bands, MinHashDedup.RowsPerBand, MinHashDedup.DefaultShingle), "scala_udf")
    // round-8 text expressions, for SQL-surface parity with the Column API
    reg.createOrReplaceTempFunction(
      "graft_bpe_encode", es => graft.operators.text.BpeEncodeIds(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_bpe_decode", es => graft.operators.text.BpeDecode(es.head), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_deflate_len", es => graft.operators.text.DeflateLen(es.head, 6), "scala_udf")
  }

  def dot(a: Column, b: Column): Column = call_function("graft_dot", a, b)
  def cosine(a: Column, b: Column): Column = call_function("graft_cosine", a, b)
  def simhash(tokens: Column): Column = call_function("graft_simhash", tokens)
  def minhashSig(elementHashes: Column): Column = call_function("graft_minhash_sig", elementHashes)
  def fingerprint(tokens: Column): Column = call_function("graft_fingerprint", tokens)
  def bandBuckets(sig: Column): Column = call_function("graft_band_buckets", sig)
  def minhashBands(words: Column): Column = call_function("graft_minhash_bands", words)

  /** Any shingle size: built directly from the expression via the plan
    * bridge (the SQL-registered graft_shingle3/5 cover the common sizes
    * for SQL users).
    */
  def shingleHashes(words: Column, n: Int): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      ShingleHashes(org.apache.spark.sql.GraftPlanBridge.expression(words), n))

  /** Map-only nearest-centroid cell id (IVF assignment); the centroid set
    * is a driver-side literal — parameterized per call, so built via the
    * plan bridge rather than the name registry.
    */
  def nearestCentroid(vec: Column, centroids: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      NearestCentroid(org.apache.spark.sql.GraftPlanBridge.expression(vec), centroids))

  /** Morton code of k DOUBLE columns against per-column boundary sets. */
  def zvalue(cols: Seq[Column], boundaries: Seq[Seq[Double]]): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      ZValue(cols.map(c => org.apache.spark.sql.GraftPlanBridge.expression(c)), boundaries))

  /** The n nearest cell ids, best first (IVF query probes). */
  def nearestCells(vec: Column, centroids: Seq[Seq[Double]], n: Int): Column =
    org.apache.spark.sql.GraftPlanBridge.column(
      NearestCells(org.apache.spark.sql.GraftPlanBridge.expression(vec), centroids, n))
}

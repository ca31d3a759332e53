package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.GraftColumnBridge.{column, expression}

/** Custom Catalyst expressions for the dense-vector hot paths.
  *
  * Why custom: Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback — interpreted per element, allocating per row. On the
  * pair-scored join paths (SURVEY §2.5 J1/J2; 23.8M pairs in the reference's
  * stated workload, BERT_Model.py:11-12) that's the per-row bottleneck. These
  * expressions evaluate one compiled loop per row and participate in
  * whole-stage codegen via a static `compute` call.
  *
  * Float-math contract: accumulate dot/norms in double, element order
  * left-to-right, cosine = dot/(sqrt(na)*sqrt(nb)) — bit-identical to the
  * HOF formulation in `VectorFunctions` and to the DuckDB oracle SQL on
  * EQUAL-DIMENSION, NULL-FREE vectors (the only shape the engine produces).
  * Divergence notes for malformed inputs: mismatched dimensions truncate to
  * the shorter vector (pinned — QLearning's oracle replays exactly this),
  * where the HOF/SQL forms would NULL-propagate; a null ARRAY ELEMENT fails
  * loud (ArrayData would silently read it as 0.0 — the sorted_jaccard
  * convention). */
object VectorExpressions {

  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  /** Analysis-time check: array<float> child (wrong-typed arrays would be
    * read through ArrayData.getFloat as silent garbage). */
  private[expressions] trait FloatArrayInput { self: UnaryExpression =>
    override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
      case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"${self.prettyName} requires array<float>, got ${other.catalogString}")
    }
  }

  private def requireNoNull(a: ArrayData, i: Int, who: String): Unit =
    if (a.isNullAt(i))
      throw new IllegalArgumentException(s"$who: null element in input array")

  /** One-pass cosine similarity of two array<float> columns → double. */
  case class FloatCosine(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType match {
        case ArrayType(FloatType, _) => true
        case _ => false
      })
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"FloatCosine requires array<float> inputs, got ${left.dataType}, ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      FloatCosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.Kernels.floatCosine($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object FloatCosine {
    /** The same kernel over plain arrays — the canonical
      * `sqrt(na)*sqrt(nb)` tail shared by driver/executor Scala callers
      * (QLearning) and the codegen path below. NOT interchangeable with
      * `TextStats.cosine`, whose `sqrt(na*nb)` tail is a different bit
      * contract pinned by its own oracles. */
    def compute(a: Array[Float], b: Array[Float]): Double = {
      val n = math.min(a.length, b.length)
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    /** Called from generated code — keep signature stable. Must stay
      * bit-identical to the Array[Float] overload above. */
    def compute(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      while (i < n) {
        requireNoNull(a, i, "float_cosine"); requireNoNull(b, i, "float_cosine")
        val x = a.getFloat(i).toDouble
        val y = b.getFloat(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
  }

  /** Random-hyperplane LSH bucket of an array<float> vector → long with
    * `bits` sign bits. Planes are deterministic from (seed, plane, dim) via
    * splitmix64, materialized once per executor (lazy, not per row). */
  case class HyperplaneBucket(child: Expression, bits: Int, dim: Int, seed: Long)
      extends UnaryExpression with FloatArrayInput {
    // 63-bit cap: 1L << 64 wraps to 1L, silently aliasing bucket bits
    // (recall degrades with no error); callers may cap tighter (lshTopK's
    // bits <= 20 bounds its probe-expansion cost)
    require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
    require(dim >= 1, s"dim must be >= 1, got $dim")

    override def dataType: DataType = LongType

    @transient private lazy val planes: Array[Array[Double]] =
      HyperplaneBucket.planes(bits, dim, seed)

    override def nullSafeEval(v: Any): Any =
      HyperplaneBucket.compute(v.asInstanceOf[ArrayData], planes, bits, dim)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.expressions.Kernels" +
          s".hyperplaneBucket($v, $planesRef, $bits, $dim);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object HyperplaneBucket {
    def planes(bits: Int, dim: Int, seed: Long): Array[Array[Double]] =
      Array.tabulate(bits, dim) { (p, i) =>
        val h = graft.core.TextStats.mix64(seed ^ (p.toLong << 32) ^ i.toLong)
        (h.toDouble / Long.MaxValue.toDouble) / 2.0
      }

    def compute(a: ArrayData, planes: Array[Array[Double]], bits: Int, dim: Int): Long = {
      val n = math.min(a.numElements(), dim)
      var i = 0
      while (i < n) { requireNoNull(a, i, "hyperplane_bucket"); i += 1 }
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val plane = planes(p)
        var d = 0.0
        i = 0
        while (i < n) { d += a.getFloat(i).toDouble * plane(i); i += 1 }
        if (d >= 0.0) bucket |= (1L << p)
        p += 1
      }
      bucket
    }
  }

  /** IVF list assignment: index of the max-cosine centroid for an
    * array<float> vector → int. The centroid matrix is a bound reference
    * object (data-dependent, computed at plan-build time by
    * `SimilaritySearch.trainIvfCentroids`), so the corpus is assigned in
    * ONE codegen'd pass — no nlist× row blowup, no shuffle. Cosine per
    * centroid is bit-identical to [[FloatCosine]] (double accumulate in
    * element order); ties keep the lowest index. */
  case class CentroidArgmax(child: Expression, centroids: Array[Array[Float]])
      extends UnaryExpression with FloatArrayInput {
    require(centroids.nonEmpty,
      "centroid_argmax: empty centroid set (index 0 would be a phantom cluster)")
    require(centroids.forall(_.length == centroids(0).length),
      "centroid_argmax: centroids must share one dimension")

    override def dataType: DataType = IntegerType

    // centroid norms are row-invariant: precompute once at plan build (the
    // oracle's 'cn' CTE does the same), ascending-i accumulation so the
    // doubles match the fused loop bit-for-bit on equal-dim inputs
    @transient private lazy val centNorms: Array[Double] =
      CentroidArgmax.norms(centroids)

    override def nullSafeEval(v: Any): Any =
      CentroidArgmax.compute(v.asInstanceOf[ArrayData], centroids, centNorms)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val centRef = ctx.addReferenceObj("centroids", centroids, "float[][]")
      val normRef = ctx.addReferenceObj("centNorms", centNorms, "double[]")
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.expressions.Kernels.centroidArgmax($v, $centRef, $normRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object CentroidArgmax {
    def norms(centroids: Array[Array[Float]]): Array[Double] =
      centroids.map { cent =>
        var nb = 0.0; var i = 0
        while (i < cent.length) { val y = cent(i).toDouble; nb += y * y; i += 1 }
        nb
      }

    /** Query norm hoisted out of the centroid loop (one pass per row instead
      * of nlist) and centroid norms precomputed — ~3× fewer flops in the IVF
      * assignment / Lloyd hot loop, bit-identical on equal-dim inputs.
      *
      * Short rows are REJECTED, not truncated: the precomputed centroid
      * norm is full-length while dot/query-norm would truncate, so a
      * sub-dim row would be scored by an inconsistent hybrid (and silently
      * diverge from FloatCosine's truncate-both contract). Mixed-dim
      * corpora are malformed input for IVF — fail loud with the row dim. */
    def compute(a: ArrayData, centroids: Array[Array[Float]],
                centNorms: Array[Double]): Int = {
      val dim = centroids(0).length
      if (a.numElements() < dim) throw new IllegalArgumentException(
        s"centroid_argmax: vector has ${a.numElements()} elements, " +
          s"centroids have $dim — mixed-dim corpus is malformed for IVF")
      val n = dim
      var na = 0.0
      var i = 0
      while (i < n) {
        requireNoNull(a, i, "centroid_argmax")
        val x = a.getFloat(i).toDouble; na += x * x; i += 1
      }
      var best = 0
      var bestScore = Double.NegativeInfinity
      var c = 0
      while (c < centroids.length) {
        val cent = centroids(c)
        var dot = 0.0
        i = 0
        while (i < n) { dot += a.getFloat(i).toDouble * cent(i).toDouble; i += 1 }
        val nb = centNorms(c)
        val s = if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
        if (s > bestScore) { bestScore = s; best = c }
        c += 1
      }
      best
    }
  }

  /** Symmetric int8 quantization of an array<float> vector: per-vector
    * scale = max|v|/127, q_i = floor(v_i/scale + 0.5) clamped to ±127 —
    * floor(x + 0.5) (not round()) so half-value behavior is identical in
    * both engines. 4× memory reduction for the 100 TB ANN corpus; scales
    * cancel in cosine, so scoring needs only the int8 payload. */
  case class QuantizeInt8(child: Expression)
      extends UnaryExpression with FloatArrayInput {
    override def dataType: DataType = ArrayType(ByteType, containsNull = false)

    override def nullSafeEval(v: Any): Any =
      QuantizeInt8.compute(v.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.expressions.Kernels.quantizeInt8($v);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  object QuantizeInt8 {
    def compute(a: ArrayData): ArrayData = {
      val n = a.numElements()
      var max = 0.0
      var i = 0
      while (i < n) {
        requireNoNull(a, i, "quantize_int8")
        val m = math.abs(a.getFloat(i).toDouble)
        // a NaN/Inf component would silently quantize the WHOLE vector to
        // zeros (scale = Inf) or skip the max scan (NaN compares false) —
        // its byte_cosine would then be 0.0 against everything
        if (m.isNaN || m.isInfinite)
          throw new IllegalArgumentException(
            "quantize_int8: non-finite vector component")
        if (m > max) max = m
        i += 1
      }
      val scale = max / 127.0
      val out = new Array[Byte](n)
      if (scale != 0.0) {
        i = 0
        while (i < n) {
          val q = math.floor(a.getFloat(i).toDouble / scale + 0.5)
          out(i) = math.max(-127.0, math.min(127.0, q)).toByte
          i += 1
        }
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }

  /** Cosine of two int8-quantized vectors: integer dot/norms accumulated in
    * long (exact), one double division at the end. */
  case class ByteCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (l, r) => TypeCheckResult.TypeCheckFailure(
          s"byte_cosine requires two array<tinyint> arguments, got " +
            s"${l.catalogString} and ${r.catalogString}")
      }
    override def dataType: DataType = DoubleType

    override def nullSafeEval(a: Any, b: Any): Any =
      ByteCosine.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.Kernels.byteCosine($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object ByteCosine {
    def compute(a: ArrayData, b: ArrayData): Double = {
      val n = math.min(a.numElements(), b.numElements())
      var dot = 0L; var na = 0L; var nb = 0L
      var i = 0
      while (i < n) {
        requireNoNull(a, i, "byte_cosine"); requireNoNull(b, i, "byte_cosine")
        val x = a.getByte(i).toLong
        val y = b.getByte(i).toLong
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0L || nb == 0L) 0.0
      else dot.toDouble / (math.sqrt(na.toDouble) * math.sqrt(nb.toDouble))
    }
  }

  // ---- Column-level API ----------------------------------------------------
  def float_cosine(a: Column, b: Column): Column =
    column(FloatCosine(expression(a), expression(b)))

  def quantize_int8(v: Column): Column = column(QuantizeInt8(expression(v)))

  def byte_cosine(a: Column, b: Column): Column =
    column(ByteCosine(expression(a), expression(b)))

  def hyperplane_bucket(v: Column, bits: Int, dim: Int, seed: Long = 42L): Column =
    column(HyperplaneBucket(expression(v), bits, dim, seed))

  def centroid_argmax(v: Column, centroids: Array[Array[Float]]): Column =
    column(CentroidArgmax(expression(v), centroids))
}

package graft.expressions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Sketches as NATIVE Catalyst aggregate functions — the deepest extension
  * tier after scalar codegen expressions: a [[TypedImperativeAggregate]]
  * participates in Spark's partial-aggregation machinery, so per-GROUP
  * sketches combine map-side (ObjectHashAggregate) and the exchange carries
  * at most one O(k) buffer per (task, group) instead of the group's raw
  * distinct stream. That turns "distinct per key over 10^12 rows" from a
  * full-key-explosion shuffle into constant-size-per-key telemetry, and the
  * same serialized buffer is what a multi-day pipeline would persist and
  * re-merge (the sketch is exactly mergeable — union-of-bottom-k ==
  * bottom-k-of-union, the [[graft.operators.TrainingData.kmvMerge]]
  * contract).
  *
  * Determinism: unlike HLL registers there is no float anywhere — the
  * buffer is the set of k smallest distinct fingerprints in unsigned order,
  * so the result is byte-identical across partitionings and engines
  * (SQL-oracle-checkable). Readout: [[graft.operators.TrainingData.kmvEstimate]].
  */
object SketchAggregates {

  /** Column API: per-group KMV (bottom-k) sketch of a LONG fingerprint
    * column (compose with `fingerprint64` for strings). Returns the sketch
    * as array<long> in unsigned-ascending fingerprint order. */
  def kmv_agg(fp: Column, k: Int): Column =
    column(KmvAgg(expression(fp), k).toAggregateExpression())

  /** Bottom-k distinct sketch aggregate (Bar-Yossef et al. 2002). The
    * buffer stores sign-flipped fingerprints (`fp ^ Long.MinValue`) in a
    * TreeSet so natural signed order IS unsigned fingerprint order; add +
    * trim keeps it ≤ k at all times, so update, merge, and serialize are
    * all O(k) regardless of group size. */
  case class KmvAgg(child: Expression, k: Int,
                    mutableAggBufferOffset: Int = 0,
                    inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
      with UnaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {

    // analysis-time contract: int fingerprints widen to long instead of a
    // runtime ClassCastException in update() on the executors
    override def inputTypes:
        Seq[org.apache.spark.sql.GraftColumnBridge.SqlAbstractDataType] =
      Seq(org.apache.spark.sql.types.LongType)
    // 2^24 ceiling: the sketch exists to be a TINY mergeable state (~40+
    // bytes/entry boxed); beyond that the premise is wrong and serialize's
    // 4 + 8*size Int arithmetic eventually overflows
    require(k >= 2 && k <= (1 << 24), s"kmv_agg needs k in [2, 2^24], got $k")

    // the implicit numeric->long coercion would silently TRUNCATE a
    // fractional "fingerprint" (collapsing distinct values) and a string
    // child would coerce to mostly-NULLs (silently empty sketch) — reject
    // both loudly, mirroring TopKAgg's rank guard
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.expressions.Cast
      import org.apache.spark.sql.types._
      def isLossy(t: DataType): Boolean = t match {
        case DoubleType | FloatType | _: DecimalType | _: StringType => true
        case _ => false
      }
      val lossy = child match {
        case Cast(c, LongType, _, _) => isLossy(c.dataType)
        case _ => isLossy(child.dataType)
      }
      if (lossy)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "kmv_agg fingerprint must be an integral column — hash raw values " +
            "first (e.g. fingerprint64(text)); an implicit cast would " +
            "truncate or null them out")
      else super.checkInputDataTypes()
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String = "kmv_agg"

    override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
      new java.util.TreeSet[java.lang.Long]()

    override def update(buf: java.util.TreeSet[java.lang.Long],
                        input: InternalRow): java.util.TreeSet[java.lang.Long] = {
      val v = child.eval(input)
      // null fingerprints (null inputs) never enter the sketch — the
      // bottomK contract shared with TrainingData.kmvSketch
      if (v != null) {
        val flipped = v.asInstanceOf[Long] ^ Long.MinValue
        // fast reject on a full buffer: a fingerprint at or above the
        // current k-th minimum can never enter — skip the boxed-Long
        // allocation and the two O(log k) rebalances (add + pollLast)
        if (buf.size < k || flipped < buf.last()) {
          buf.add(flipped)
          if (buf.size > k) { buf.pollLast(); () }
        }
      }
      buf
    }

    override def merge(buf: java.util.TreeSet[java.lang.Long],
                       other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
      val it = other.iterator()
      while (it.hasNext) {
        buf.add(it.next())
        if (buf.size > k) { buf.pollLast(); () }
      }
      buf
    }

    override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
      val arr = new Array[Long](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) { arr(i) = it.next() ^ Long.MinValue; i += 1 }
      new GenericArrayData(arr)
    }

    override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
      val bb = ByteBuffer.allocate(4 + 8 * buf.size)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) bb.putLong(it.next())
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) { buf.add(bb.getLong); i += 1 }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): KmvAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): KmvAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildInternal(newChild: Expression): KmvAgg =
      copy(child = newChild)
  }
}

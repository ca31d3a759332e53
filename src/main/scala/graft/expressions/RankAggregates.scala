package graft.expressions

import java.nio.ByteBuffer
import java.util.Comparator
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Order-statistic aggregates as native Catalyst functions.
  *
  * Spark 4's own `InferWindowGroupLimit` already saves the classic
  * "top-k per key as `row_number() <= k`" pattern from a full-data
  * exchange: it plants a Partial WindowGroupLimit BELOW the shuffle, so
  * each map task forwards at most k rows per group. What the built-in
  * path still pays, and this aggregate does not:
  *
  *  - two full local SORTS (each map task sorts its whole input before
  *    the partial limit, the reduce side re-sorts the survivors) — the
  *    aggregate replaces both with an O(k) bounded buffer per group,
  *    O(n log k) updates, no sort of the input at all;
  *  - whole-ROW transfer (the group-limit forwards entire rows; wide
  *    payloads ride the exchange k times per task×group) — the aggregate
  *    ships one (rank, id)-only buffer per task×group;
  *  - a separate pass: as a true aggregate it composes with other
  *    aggregates in the SAME GROUP BY scan (`count(*)`, `kmv_agg`, a
  *    top-k — one shuffle), where the window form needs its own
  *    sort+window stage and a join to combine with group totals.
  *
  * Each map task keeps at most k entries PER GROUP (ObjectHashAggregate),
  * the exchange carries those O(k) buffers, and the reduce side merges
  * heaps. Rows beyond the per-task top-k never reach the wire at all.
  *
  * Payloads deliberately do NOT ride through the aggregate — the entry is
  * (rank, id) only, the repo-wide ids-only join discipline: compute the
  * top-k id set cheaply, then join the (tiny) winners back to their rows.
  *
  * Determinism: pure integer/byte comparisons — rank is a LONG (callers
  * quantize scores, as everywhere else in graft) and ties break by the id's
  * unsigned UTF-8 byte order (UTF8String / DuckDB VARCHAR collation), so
  * the result is byte-identical across partitionings and engines.
  */
object RankAggregates {

  /** Column API: per-group top-k (rank, id) pairs, rank descending, ties by
    * id ascending. Returns array<struct<rank:long, id:string>> of length
    * <= k in that order. Distinct-pair semantics: an exactly duplicated
    * (rank, id) pair counts once. Null rank or null id rows are skipped. */
  def topk_agg(rank: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(rank), expression(id), k).toAggregateExpression())

  /** As [[topk_agg]] with rank ASCENDING (bottom-k): smallest ranks win,
    * ties by id ascending. */
  def bottomk_agg(rank: Column, id: Column, k: Int): Column =
    column(TopKAgg(expression(rank), expression(id), k,
      descending = false).toAggregateExpression())

  /** One buffer entry. `id` is always a defensive copy (UTF8String from
    * `eval` may alias a reused row buffer). */
  final case class Entry(rank: Long, id: UTF8String)

  /** Per-group top-k aggregate. Buffer = TreeSet under (rank desc|asc,
    * id asc unsigned-byte) with best-first iteration; add-then-trim keeps
    * it <= k at all times so update, merge, and serialize are O(k log k)
    * regardless of group size. */
  case class TopKAgg(left: Expression, right: Expression, k: Int,
                     descending: Boolean = true,
                     mutableAggBufferOffset: Int = 0,
                     inputAggBufferOffset: Int = 0)
      extends TypedImperativeAggregate[java.util.TreeSet[Entry]]
      with BinaryLike[Expression]
      with org.apache.spark.sql.catalyst.expressions.ImplicitCastInputTypes {
    require(k >= 1, s"topk_agg needs k >= 1, got $k")

    // analysis-time contract (the SQL surface accepts arbitrary columns):
    // int ranks widen to long, numeric ids cast to string — instead of a
    // runtime ClassCastException in update() on the executors
    override def inputTypes:
        Seq[org.apache.spark.sql.GraftColumnBridge.SqlAbstractDataType] =
      Seq(LongType, StringType)

    // the implicit numeric->long coercion above would silently TRUNCATE a
    // fractional rank (0.91 -> 0), degrading "top-k by score" to garbage
    // with no error — reject fractional ranks loudly; callers quantize
    // scores to an integer rank first (the repo-wide ppm convention)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      import org.apache.spark.sql.catalyst.expressions.Cast
      def isFractional(t: DataType): Boolean = t match {
        case DoubleType | FloatType | _: DecimalType => true
        case _ => false
      }
      val fractionalRank = left match {
        case Cast(c, LongType, _, _) => isFractional(c.dataType)
        case _ => isFractional(left.dataType)
      }
      if (fractionalRank)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName rank must be integral — quantize fractional scores " +
            "to a long rank (e.g. ppm) first; an implicit cast would truncate")
      else super.checkInputDataTypes()
    }

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("id", StringType, nullable = false))), containsNull = false)
    override def nullable: Boolean = false
    override def prettyName: String =
      if (descending) "topk_agg" else "bottomk_agg"

    // transient lazy: one Comparator per operator instance (not per group
    // buffer / per deserialized partial); Comparator is not Serializable so
    // it must not ride the Java-serialized expression tree
    @transient private lazy val comparator: Comparator[Entry] = new Comparator[Entry] {
      override def compare(a: Entry, b: Entry): Int = {
        val byRank = if (descending) java.lang.Long.compare(b.rank, a.rank)
                     else java.lang.Long.compare(a.rank, b.rank)
        if (byRank != 0) byRank else a.id.compareTo(b.id)
      }
    }

    override def createAggregationBuffer(): java.util.TreeSet[Entry] =
      new java.util.TreeSet[Entry](comparator)

    override def update(buf: java.util.TreeSet[Entry],
                        input: InternalRow): java.util.TreeSet[Entry] = {
      val r = left.eval(input)
      val id = right.eval(input)
      if (r != null && id != null) {
        val rank = r.asInstanceOf[Long]
        val idU = id.asInstanceOf[UTF8String]
        // fast reject on a full buffer: probe with the UNCLONED id (the
        // comparator only reads bytes during compare) — a candidate at or
        // after the current worst either loses or duplicates it, so the
        // clone + Entry + TreeSet insert/rebalance are skipped for the vast
        // majority of rows in a large group
        if (buf.size < k || comparator.compare(Entry(rank, idU), buf.last()) < 0) {
          buf.add(Entry(rank, idU.clone()))
          if (buf.size > k) { buf.pollLast(); () }
        }
      }
      buf
    }

    override def merge(buf: java.util.TreeSet[Entry],
                       other: java.util.TreeSet[Entry]): java.util.TreeSet[Entry] = {
      val it = other.iterator()
      while (it.hasNext) {
        buf.add(it.next())
        if (buf.size > k) { buf.pollLast(); () }
      }
      buf
    }

    override def eval(buf: java.util.TreeSet[Entry]): Any = {
      val out = new Array[Any](buf.size)
      val it = buf.iterator()
      var i = 0
      while (it.hasNext) {
        val e = it.next()
        out(i) = new GenericInternalRow(Array[Any](e.rank, e.id))
        i += 1
      }
      new GenericArrayData(out)
    }

    override def serialize(buf: java.util.TreeSet[Entry]): Array[Byte] = {
      var bytes = 4
      val sz = buf.iterator()
      while (sz.hasNext) bytes += 12 + sz.next().id.numBytes()
      val bb = ByteBuffer.allocate(bytes)
      bb.putInt(buf.size)
      val it = buf.iterator()
      while (it.hasNext) {
        val e = it.next()
        bb.putLong(e.rank)
        val idb = e.id.getBytes
        bb.putInt(idb.length)
        bb.put(idb)
      }
      bb.array()
    }

    override def deserialize(bytes: Array[Byte]): java.util.TreeSet[Entry] = {
      val bb = ByteBuffer.wrap(bytes)
      val n = bb.getInt
      val buf = createAggregationBuffer()
      var i = 0
      while (i < n) {
        val rank = bb.getLong
        val idb = new Array[Byte](bb.getInt)
        bb.get(idb)
        buf.add(Entry(rank, UTF8String.fromBytes(idb)))
        i += 1
      }
      buf
    }

    override def withNewMutableAggBufferOffset(newOffset: Int): TopKAgg =
      copy(mutableAggBufferOffset = newOffset)
    override def withNewInputAggBufferOffset(newOffset: Int): TopKAgg =
      copy(inputAggBufferOffset = newOffset)
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): TopKAgg =
      copy(left = newLeft, right = newRight)
  }
}

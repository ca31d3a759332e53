package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join (point-in-time lookup): for every left row, the LATEST right
  * row with the same key and `right.ts <= left.ts` — the temporal operator
  * behind attribution ("which click preceded this purchase"), feature
  * point-in-time correctness, and config-version lookup. Spark has no native
  * as-of join; the classic workarounds are a range theta-join (quadratic
  * blowup per key) or per-key `collect_list` + binary search (driver-sized
  * groups). Neither survives 100 TB.
  *
  * This implementation is the scale-shape one: tag the two inputs, UNION
  * them, and take a running `last(right_payload, ignoreNulls)` over ONE
  * window ordered by (ts, side) within each key. Cost = one shuffle of
  * left on the key plus TWO of the (deduped, usually smaller) right side —
  * the (key, ts) hash-agg exchange cannot satisfy the window's (key)
  * requirement, so the deduped right rows re-exchange with the union —
  * with NO pair blowup regardless of how many right rows precede a left
  * row. Skewed keys shard exactly like any window (the running state is
  * O(1): just the latest right struct). Payload columns must be ORDERABLE
  * types (they ride a struct-max): MapType payloads are rejected by
  * Spark's analyzer — project maps to orderable fields first.
  *
  * Determinism contract (both engines replay it bit-for-bit):
  *  - INCLUSIVE match (`right.ts <= left.ts`): right rows order BEFORE left
  *    rows at equal ts;
  *  - ties among right rows on (key, ts) are resolved FIRST, by greatest
  *    `seqCol` (a struct-max hash-agg — partial-aggregatable, viral keys
  *    never materialize a group), so "latest right row" is well defined;
  *  - left rows with no preceding right row keep null payload (left-outer).
  *
  * Reference grounding: the reference's matchers pick one best right row
  * per left row by score argmax (`Top2_Matches.py:42`); this is the same
  * per-left-row argmax reduction with "score" = time order, which is why it
  * lives beside them in the matching suite.
  */
object AsOfJoin {

  /** `left` and `right` must both carry `keyCol` and `tsCol`; `seqCol` is a
    * unique-per-right-row tiebreaker (an id). Right payload columns arrive
    * prefixed `asof_` in the output, plus `asof_ts` (match timestamp). */
  def asOf(left: DataFrame, right: DataFrame, keyCol0: String, tsCol0: String,
           seqCol: String, payloadCols: Seq[String]): DataFrame = {
    // resolve key/ts against the actual column names case-insensitively:
    // Spark resolves "USER_ID" == "user_id" everywhere EXCEPT our literal
    // string comparison in the right-branch select, which would silently
    // null the key and lose every match
    def resolve(name: String): String =
      left.columns.find(_.equalsIgnoreCase(name)).getOrElse(name)
    val keyCol = resolve(keyCol0)
    val tsCol = resolve(tsCol0)
    require(!payloadCols.contains(tsCol) && seqCol != tsCol,
      s"'$tsCol' in the payload would collide with the asof_ts output column")
    require(!payloadCols.contains(seqCol),
      s"seqCol '$seqCol' is already emitted as asof_$seqCol — do not repeat it in payloadCols")
    val reserved = (left.columns ++ right.columns).filter(_.startsWith("_asof_"))
    require(reserved.isEmpty,
      s"_asof_* is this operator's scratch namespace — rename ${reserved.mkString(", ")}")
    // null-ts right rows can never satisfy right.ts <= left.ts — drop them
    // BEFORE the union: Spark sorts null ASC as NULLS FIRST, so an unfiltered
    // null-ts right row would otherwise act as a -infinity match. (A null-ts
    // LEFT row needs no special case: it sorts before every right row and
    // correctly gets a null match, same as SQL's l.ts >= r.ts never-true.)
    // null-KEY right rows are dropped too: Window.partitionBy groups nulls
    // together, so an unfiltered null-key right row would match null-key
    // left rows — but ASOF/equi-join semantics (and the DuckDB oracle's
    // l.key = r.key) never match on NULL. A null-key LEFT row then sits in
    // a partition with no right rows and correctly emits null asof_* via
    // the left-outer path.
    // one right row per (key, ts): greatest seq wins, payload rides the
    // struct-max (field order puts seq first, so struct order == seq order)
    val rightDedup = right
      .filter(col(tsCol).isNotNull && col(keyCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(struct((seqCol +: payloadCols).map(col): _*)).as("_asof_rp"))

    val leftCols = left.columns
    val tagged = left
      .withColumn("_asof_side", lit(1))
      .withColumn("_asof_rp", lit(null).cast(rightDedup.schema("_asof_rp").dataType))
      .withColumn("_asof_rts", lit(null).cast(left.schema(tsCol).dataType))
      .select((leftCols.map(col) :+ col("_asof_side") :+ col("_asof_rp") :+ col("_asof_rts")): _*)
      .unionByName(
        rightDedup
          .withColumn("_asof_side", lit(0))
          .withColumn("_asof_rts", col(tsCol))
          .select(leftCols.map(c =>
            if (c == keyCol || c == tsCol) col(c)
            else lit(null).cast(left.schema(c).dataType).as(c)) :+
            col("_asof_side") :+ col("_asof_rp") :+ col("_asof_rts"): _*))

    // running latest right struct: rows up to AND INCLUDING the current ts
    // (side 0 sorts before side 1, so an equal-ts right row is visible)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = tagged
      .withColumn("_asof_m", last(col("_asof_rp"), ignoreNulls = true).over(w))
      .withColumn("_asof_mts", last(col("_asof_rts"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)

    val payloadOut = (seqCol +: payloadCols).map(c =>
      col("_asof_m").getField(c).as(s"asof_$c"))
    matched.select(leftCols.map(col) ++ (payloadOut :+ col("_asof_mts").as("asof_ts")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The matching suite (SURVEY §2.5 J1–J9): cross join + score + per-key
  * reduction, the logical operator behind all 18 reference matcher scripts.
  *
  * Scale design: the small side is explicitly broadcast (the reference's only
  * stated workload is 820 × 29,000 — BERT_Model.py:11-12 — a textbook
  * broadcast-nested-loop), scoring is an expression (codegen), and the per-key
  * reduction is a window that Spark ≥3.5 rewrites to a group-limit
  * (InferWindowGroupLimit) — no full sort of the pair set.
  *
  * NOTE (J7): the reference's per-batch argmax bug (best-per-block instead of
  * global best, BERT_Model_Final_V1.py:43-64) is deliberately NOT reproduced;
  * global argmax matches the intended semantics (BERT_Model_Final_V2.py:38-39).
  */
object Matching {

  /** J1: full scored pair set — theta join, no equi keys in the reference. */
  def crossScore(left: DataFrame, right: DataFrame, score: Column): DataFrame =
    left.crossJoin(broadcast(right)).withColumn("score", score)

  /** J2: best match per left row (argmax); ties broken by `tieBreak` so the
    * result is deterministic across engines and partitionings. A threshold
    * FILTERS below-threshold winners out of the result entirely; for the
    * reference's left-outer flavor — every left row kept, match columns
    * nulled below threshold (Sequence matcher.py:30-43) — use
    * [[bestMatchNullBelow]]. `pairs` must not already carry an `rn` column
    * (it is this operator's rank scratch — e.g. [[topKPerKey]] output keeps
    * one; drop it first). */
  def bestMatch(pairs: DataFrame, leftKey: Column, tieBreak: Column,
                threshold: Option[Double] = None): DataFrame = {
    val best = topKPerKey(pairs, leftKey, 1, tieBreak).drop("rn")
    threshold match {
      case Some(t) => best.filter(col("score") > t)
      case None => best
    }
  }

  /** J4/J5: top-k per key (Top2_Matches.py:42, Top5_Albert.py:64). */
  def topKPerKey(pairs: DataFrame, key: Column, k: Int, tieBreak: Column): DataFrame = {
    require(!pairs.columns.contains("rn"),
      "input already carries an 'rn' column (a prior topKPerKey rank?) — it would be silently clobbered; drop or rename it first")
    pairs.withColumn("rn",
        row_number().over(Window.partitionBy(key).orderBy(desc("score"), tieBreak)))
      .filter(col("rn") <= k)
  }

  /** J2 null-below-threshold flavor (bestmatch.py:19-44): every left row
    * PRESENT IN `pairs` is emitted (a left key with zero candidate pairs has
    * nothing to rank — build `pairs` with a left-outer cross if absent lefts
    * must surface); the argmax match columns are nulled when the best score fails
    * the strict `score > threshold` test — the reference's
    * `if best_match and max_similarity > 0.8 ... else (rule, None, None)`
    * shape. Ties keep the first control in file order (`tieBreak` asc),
    * matching the reference's strict-greater keep-first scan. The threshold
    * compares the RAW double on both engines (a quantized compare would
    * misclassify scores inside the quantization bucket). */
  def bestMatchNullBelow(pairs: DataFrame, leftKey: Column, tieBreak: Column,
                         threshold: Double, matchCols: Seq[String]): DataFrame = {
    val best = bestMatch(pairs, leftKey, tieBreak)
    matchCols.foldLeft(best) { (df, c) =>
      df.withColumn(c, when(col("score") > threshold, col(c)))
    }.withColumn("score", when(col("score") > threshold, col("score")))
  }

  /** J8: scalar-query scored scan — broadcast literal vs every row.
    * `tieBreak` pins the order among equal scores (quantized scorers tie
    * often); default preserves the historical score-only sort. */
  def queryScan(df: DataFrame, score: Column,
                tieBreak: Seq[Column] = Nil): DataFrame =
    df.withColumn("score", score).orderBy(desc("score") +: tieBreak: _*)

  /** Salted equi-join for skewed keys — the remedy `Diagnostics.keySkewProfile`
    * decides on. A plain shuffle join on a hot key (one monster conversation,
    * one viral domain) lands the whole key on one task; salting splits each
    * hot left key across `saltFactor` tasks by joining on (key, salt) with
    * the right side replicated `saltFactor`×.
    *
    * Output == the plain inner equi-join, row for row (the DuckDB oracle IS
    * the plain join). The salt comes from the codegen fingerprint of
    * `uniqueCol` — deterministic across retries/partitionings, unlike a
    * rand()-based salt, so task retries at scale cannot duplicate or drop
    * rows. Use when the right side is too big to broadcast AND the left key
    * distribution is heavy-tailed; cost = saltFactor× the (small) right
    * side's shuffle bytes. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int, uniqueCol: Column): DataFrame = {
    require(saltFactor >= 1,
      s"saltFactor must be >= 1, got $saltFactor (0 is an ANSI DIVIDE_BY_ZERO mid-job; negatives replicate with unreachable salts)")
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "'_salt' is this operator's scratch column — rename the caller's column")
    // coalesce: a null uniqueCol (fingerprint64(null) → null salt) would
    // silently DROP the row from the equi-join, breaking the plain-join
    // output contract; salt 0 keeps it (merely unsalted)
    val l = left.withColumn("_salt",
      coalesce(pmod(graft.expressions.TextHashExpressions.fingerprint64(
        uniqueCol.cast("string")), lit(saltFactor.toLong)).cast("int"), lit(0)))
    val r = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    l.join(r, Seq(key, "_salt")).drop("_salt")
  }
}

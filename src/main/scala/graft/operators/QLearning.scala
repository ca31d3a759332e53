package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.TextStats

/** A7: Q-learning match fold (reference `Reinforcement_Learning.py:36-66`) —
  * the last coverage gap from SURVEY §2.6.
  *
  * Reference semantics, per (guideline row g, episode e):
  *   - epsilon-greedy: uniform < ε → random control index, else
  *     `np.argmax(q[g])` (FIRST max index);
  *   - reward = cosine(embedding(g), embedding(action));
  *   - `max_future_q = np.max(q[g])` (pre-update row max);
  *   - `q[g][a] += lr * (reward + γ * max_future_q - q[g][a])`;
  * readout (`:68-77`): per guideline, argmax of the final Q row + its
  * cosine. The reference's episode loop is outer and guidelines inner, but
  * each guideline's Q row is touched ONLY by its own updates — rows are
  * independent, so the fold distributes perfectly: partition the guideline
  * side, broadcast the (small) control side, run the per-row episode fold
  * inside `mapPartitions`. This is the same broadcast shape as J2/J8 and
  * scales to the reference's stated 29k × 820 workload and far beyond
  * (the 29k side shards; state is one Q row per in-flight row).
  *
  * Divergence (documented): the reference uses an UNSEEDED global
  * `np.random`; runs are irreproducible by design. We use a splitmix64
  * stream keyed per (guideline, episode, draw) — deterministic under any
  * partitioning/retry, and exactly replayable by the DuckDB oracle's
  * HUGEINT arithmetic.
  *
  * Float-math contract: cosine accumulates in double in element order
  * (identical to VectorExpressions.FloatCosine); the Q update is evaluated
  * as `q(a) + lr * (reward + gamma * maxq - q(a))` — both engines follow
  * IEEE754 binary64 left-to-right, so Q rows (and therefore every argmax
  * decision) are bit-identical cross-engine. */
object QLearning {

  case class Params(episodes: Int = 200, lr: Double = 0.1, gamma: Double = 0.9,
                    epsilon: Double = 0.1, seed: Long = 0x51ABL)

  // one shared kernel: the canonical sqrt(na)*sqrt(nb) tail lives in
  // FloatCosine (bit-identical to the codegen expression path)
  private def cosine(a: Array[Float], b: Array[Float]): Double =
    graft.expressions.VectorExpressions.FloatCosine.compute(a, b)

  /** Top 53 bits of a mixed draw as a uniform double in [0, 1) — exactly
    * `(x >>> 11) / 2^53`, integer-exact in both engines. */
  private def unit(h: Long): Double = (h >>> 11).toDouble / 9007199254740992.0

  private def argmaxFirst(q: Array[Double]): Int = {
    var best = 0; var i = 1
    while (i < q.length) { if (q(i) > q(best)) best = i; i += 1 }
    best
  }

  /** `guidelines`/`controls`: (id, vec). Control action index = rank of the
    * control id ascending (stable, engine-independent). Returns one row per
    * guideline: the argmax control of the learned Q row plus its Q value
    * and cosine score. */
  def bestMatches(guidelines: DataFrame, controls: DataFrame,
                  p: Params = Params()): DataFrame = {
    require(p.episodes >= 1, s"episodes must be >= 1, got ${p.episodes}")
    require(p.lr.isFinite && p.gamma.isFinite,
      s"lr/gamma must be finite, got lr=${p.lr} gamma=${p.gamma}")
    require(p.epsilon >= 0.0 && p.epsilon <= 1.0, // NaN fails both bounds
      s"epsilon must be in [0,1], got ${p.epsilon}")
    val spark: SparkSession = guidelines.sparkSession
    import spark.implicits._
    val ctl: Array[(Long, Array[Float])] = controls
      // null vectors carry no geometry; null/uncastable ids cannot survive
      // the typed (Long, _) decode — drop both (the sibling convention)
      .filter(col("vec").isNotNull && col("id").cast("long").isNotNull)
      .select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    require(ctl.nonEmpty, "empty control side")
    // action index = rank of the control id ascending; a duplicate id would
    // make that rank depend on partition layout (and diverge from the
    // oracle's independent tie-break), so fail loud instead
    require(ctl.map(_._1).distinct.length == ctl.length,
      "duplicate control ids: action indexing would be nondeterministic")
    val bc = spark.sparkContext.broadcast(ctl)
    guidelines
      .filter(col("vec").isNotNull && col("id").cast("long").isNotNull)
      .select(col("id").cast("long"), col("vec"))
      .as[(Long, Array[Float])]
      .mapPartitions { it =>
        val controls = bc.value
        val nC = controls.length
        it.map { case (gid, gv) =>
          // rewards are memoized lazily: at most episodes+1 distinct actions
          // are ever read, far fewer than nC at the reference's 820-control
          // workload
          val rewards = new Array[Double](nC)
          val haveReward = new Array[Boolean](nC)
          def rewardOf(c: Int): Double = {
            if (!haveReward(c)) { rewards(c) = cosine(gv, controls(c)._2); haveReward(c) = true }
            rewards(c)
          }
          val q = new Array[Double](nC)
          val base = p.seed ^ (gid * 2654435761L) // loop-invariant
          var e = 0
          while (e < p.episodes) {
            // one pass yields both the first-max index (exploit action) and
            // the pre-update row max — maxq == q(argmaxFirst(q)) exactly
            var bestIdx = 0; var maxq = q(0); var i = 1
            while (i < nC) { if (q(i) > maxq) { maxq = q(i); bestIdx = i }; i += 1 }
            val u = unit(TextStats.mix64(base ^ (2L * e)))
            val action =
              if (u < p.epsilon)
                java.lang.Long.remainderUnsigned(
                  TextStats.mix64(base ^ (2L * e + 1L)), nC.toLong).toInt
              else bestIdx
            val reward = rewardOf(action)
            q(action) = q(action) + p.lr * (reward + p.gamma * maxq - q(action))
            e += 1
          }
          val best = argmaxFirst(q)
          (gid, controls(best)._1, q(best), rewardOf(best))
        }
      }.toDF("guideline_id", "control_id", "q_value", "best_score")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Learned-scorer matching (`classifier_model.py:36-86`, `LSTM.py:112-127`,
  * `BERT_Finetuned.py`): the reference's last script family. A logistic
  * regression is trained over CONCATENATED pair embeddings with
  * auto-generated labels (cosine similarity above a threshold → positive,
  * `classifier_model.py:42-46`), standard-scaled (`:56-58`), and every
  * (guideline, control) pair is then scored by the classifier's positive
  * probability with a top-k readout (`:70-77`, k=2).
  *
  * Split of concerns, mirroring the LDA matcher (`TopicModel.bestMatch`):
  * the FIT is Spark ML (`ml.classification.LogisticRegression`) — iterative
  * and not SQL-replayable, pinned by a seed-fixed golden — but INFERENCE is
  * this object's own kernel with a DEFINED arithmetic order (i-ascending
  * left-assoc over dims, floats widened to double per element), so an
  * exported [[Model]] replays bit-identically in a SQL oracle as an
  * explicit 2·dim-term chain, making the entire scoring/readout plane
  * cross-engine-checkable. Scores are emitted as LOGITS: the sigmoid is
  * strictly monotone, so ranking is identical, and the oracle avoids the
  * 1-ulp cross-libm hazard of `exp` entirely.
  *
  * Documented divergences from `classifier_model.py` (scaladoc contract,
  * same discipline as QLearning/SeqMatcher):
  *  - fit on ALL pairs, not sklearn's seeded 80/20 `train_test_split`
  *    (`:53` — the split only serves the script's eval printout; a Python
  *    RNG permutation is not a portable contract);
  *  - labels use >= threshold on the exact double cosine (the reference's
  *    strict > on float32 BERT scores is seed-unreproducible anyway);
  *  - scaler std is population (ddof=0), matching sklearn, with
  *    zero-variance dims scaled by 1.0, matching sklearn's `scale_` fixup.
  *
  * Known property (inherited from the reference design, not a bug): a
  * linear model over CONCATENATED embeddings is additively separable —
  * logit(l,r) = f(l) + g(r) — so the per-left RANKING of rights is the
  * same for every left (`classifier_model.py`'s architecture has the
  * identical degeneracy; only its sklearn seed noise hides it). The value
  * checked here is the faithful pipeline, scored pairs, and readout.
  *
  * Scale posture: the TRAINING pair frame is bounded (the reference's
  * workload is 820 × 29k guideline/control sides — `BERT_Model.py:11-12`);
  * the fit streams it distributed (Spark ML LR aggregates gradients, no
  * driver materialization) and only the 2·dim+1 coefficient vector ever
  * reaches the driver. Inference is a broadcast cross-join + one map pass —
  * embarrassingly parallel over any left-side cardinality. */
object LearnedMatch {

  /** Exported scorer: w/mean/std are dim-aligned over the CONCATENATED
    * (left ++ right) feature vector; std carries sklearn's zero→1 fixup. */
  case class Model(intercept: Double, w: Array[Double],
                   mean: Array[Double], std: Array[Double]) {
    def dim: Int = w.length
    /** The defined-order inference kernel: per-dim terms
      * w(i)·((x(i)−m(i))/sd(i)) reduced by a BALANCED PAIRWISE TREE
      * (adjacent pairs per level, an odd tail carried unpaired), intercept
      * added last. Tree, not a left fold, on purpose: the SQL oracle
      * mirrors the sum as an explicit parenthesized expression, and a
      * 128-deep left-assoc chain exceeds DuckDB's expression-depth limit
      * while the tree is only log2(dim) deep — both engines execute the
      * IDENTICAL addition tree, so the replay is bit-exact. */
    def logit(x: Array[Double]): Double = {
      var arr = Array.tabulate(w.length)(i => w(i) * ((x(i) - mean(i)) / std(i)))
      while (arr.length > 1) {
        val next = new Array[Double]((arr.length + 1) / 2)
        var i = 0
        while (2 * i + 1 < arr.length) { next(i) = arr(2 * i) + arr(2 * i + 1); i += 1 }
        if (arr.length % 2 == 1) next(next.length - 1) = arr(arr.length - 1)
        arr = next
      }
      (if (arr.isEmpty) 0.0 else arr(0)) + intercept
    }
  }

  /** Exact double cosine over two float vectors, i-ascending left-assoc —
    * the LABEL kernel (`classifier_model.py:36,45`), same chain contract as
    * `TopicModel.bestTopicCosine`'s. */
  private[graft] def cosine(a: Seq[Float], b: Seq[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private val cosineUdf = udf(cosine _)

  /** All (left × right) pairs with concatenated double features and the
    * auto-label — the training/inference frame. `left`/`right`:
    * (id, vec:array‹float›). Broadcast right side: the control list is the
    * bounded dimension of the reference workload. */
  private def pairFrame(left: DataFrame, right: DataFrame,
                        threshold: Double): DataFrame = {
    val l = left.select(col("id").cast("long").as("left_id"),
      col("vec").as("lv"))
    val r = right.select(col("id").cast("long").as("right_id"),
      col("vec").as("rv"))
    l.crossJoin(broadcast(r))
      .withColumn("features", concat(
        transform(col("lv"), e => e.cast("double")),
        transform(col("rv"), e => e.cast("double"))))
      .withColumn("label",
        (cosineUdf(col("lv"), col("rv")) >= lit(threshold)).cast("double"))
  }

  /** Fit the scaler + logistic regression over all pairs; returns the
    * exportable [[Model]]. Deterministic given data: LR starts from zero
    * coefficients with a fixed iteration budget, and the scaler moments
    * are exact integer-free double aggregates over a bounded frame. */
  def fit(left: DataFrame, right: DataFrame, threshold: Double = 0.8,
          maxIter: Int = 50, regParam: Double = 0.0): Model = {
    val spark = left.sparkSession
    // coalesce(1): the FIT frame is a bounded model-sized sample by
    // contract (like the IVF centroid set — at scale you fit on a capped
    // pair sample, never the full corpus), and LBFGS runs ~maxIter
    // sequential jobs over it. One partition makes each iteration a
    // single task — on a latency-bound host that cuts the fit wall by
    // the old partition count — AND pins the float summation order, so
    // the fitted coefficients no longer depend on the SOURCE's partition
    // layout (the golden's "deterministic for fixed input partitioning"
    // caveat tightens to "deterministic, period"). Inference
    // ([[scoredPairs]]) is untouched and fully distributed.
    val pairs = pairFrame(left, right, threshold).select("features", "label")
      .coalesce(1).cache()
    try {
      // population moments per dim (sklearn StandardScaler semantics);
      // 2·dim rows — a bounded model-sized collect, like IVF centroids.
      // Fail loud on ragged inputs: head() on an unordered frame is an
      // arbitrary row, and a longer row would blow up the scale UDF deep
      // in an executor task (AIOOBE) while a shorter one would feed the
      // LR fit variable-size vectors — same reject-malformed contract as
      // centroid_argmax
      val szRow = pairs.agg(min(size(col("features"))),
        max(size(col("features")))).head()
      // empty-input contract (review fix): an empty left/right side makes
      // the min/max aggregates NULL and getInt would die with a bare NPE —
      // name the failure like the ragged-dim reject below
      require(!szRow.isNullAt(0),
        "learned-match fit requires a non-empty pair frame (empty left or right side)")
      val dim = szRow.getInt(0)
      require(dim == szRow.getInt(1),
        s"learned-match fit requires uniform feature dims, got [${dim}, ${szRow.getInt(1)}]")
      val moments = pairs
        .select(posexplode(col("features")).as(Seq("d", "x")))
        .groupBy("d")
        .agg(avg(col("x")).as("m"), stddev_pop(col("x")).as("sd"))
        .collect().map(r => (r.getInt(0),
          (r.getDouble(1), { val s = r.getDouble(2); if (s == 0.0) 1.0 else s })))
        .toMap
      val mean = Array.tabulate(dim)(i => moments(i)._1)
      val std = Array.tabulate(dim)(i => moments(i)._2)
      val bm = spark.sparkContext.broadcast((mean, std))
      val scale = udf { (x: Seq[Double]) =>
        val (m, s) = bm.value
        org.apache.spark.ml.linalg.Vectors.dense(
          Array.tabulate(x.length)(i => (x(i) - m(i)) / s(i)))
      }
      val train = pairs.withColumn("scaled", scale(col("features")))
      val lr = new org.apache.spark.ml.classification.LogisticRegression()
        .setFeaturesCol("scaled").setLabelCol("label")
        .setMaxIter(maxIter).setRegParam(regParam).setStandardization(false)
        .setTol(1e-9)
      val fitted = lr.fit(train)
      Model(fitted.intercept, fitted.coefficients.toArray, mean, std)
    } finally pairs.unpersist()
  }

  /** Score every pair with an exported [[Model]] — the kernel runs
    * per-row with no shuffle beyond the broadcast cross-join. */
  def scoredPairs(left: DataFrame, right: DataFrame, model: Model): DataFrame = {
    val spark = left.sparkSession
    val bcModel = spark.sparkContext.broadcast(model)
    val logitUdf = udf { (lv: Seq[Float], rv: Seq[Float]) =>
      val m = bcModel.value
      // reject mixed-dim rows instead of silently zero-padding/shifting
      // the right half against the wrong weights (the centroid_argmax
      // contract; the DuckDB oracle's fixed [1..dim] indexing assumes
      // exactly this shape)
      require(lv.length + rv.length == m.dim,
        s"learned-match scoring requires |lv|+|rv| == model dim ${m.dim}, " +
          s"got ${lv.length}+${rv.length}")
      val x = new Array[Double](m.dim)
      var i = 0
      while (i < lv.length) { x(i) = lv(i).toDouble; i += 1 }
      var j = 0
      while (j < rv.length) { x(lv.length + j) = rv(j).toDouble; j += 1 }
      m.logit(x)
    }
    left.select(col("id").cast("long").as("left_id"), col("vec").as("lv"))
      .crossJoin(broadcast(
        right.select(col("id").cast("long").as("right_id"), col("vec").as("rv"))))
      .withColumn("logit", logitUdf(col("lv"), col("rv")))
      .select(col("left_id"), col("right_id"), col("logit"))
  }

  /** The reference readout: fit + score + top-k per left (k=2,
    * `classifier_model.py:70-77`), engine tie order (desc score, right_id).
    * Returns (left_id, right_id, logit, rn). */
  def topKMatches(left: DataFrame, right: DataFrame, k: Int = 2,
                  threshold: Double = 0.8, maxIter: Int = 50): DataFrame = {
    val model = fit(left, right, threshold, maxIter)
    rankPairs(scoredPairs(left, right, model), k)
  }

  /** Window readout over already-scored pairs — shared by the operator and
    * by SparkEntry's export-then-rescore oracle query. */
  def rankPairs(scored: DataFrame, k: Int): DataFrame =
    scored
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("left_id"))
          .orderBy(desc("logit"), col("right_id"))))
      .filter(col("rn") <= k)
      .select(col("left_id"), col("right_id"), col("logit"), col("rn"))

  /** The exported model as a 2·dim-row DataFrame (dim, w, m, sd,
    * intercept) — the oracle's `read_parquet` side. */
  def modelFrame(spark: org.apache.spark.sql.SparkSession, model: Model): DataFrame = {
    import spark.implicits._
    (0 until model.dim).map(i =>
      (i + 1, model.w(i), model.mean(i), model.std(i), model.intercept))
      .toDF("dim", "w", "m", "sd", "intercept")
  }
}

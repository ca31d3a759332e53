package graft.operators

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, Tokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A4/J9 topic-model matcher (`Topic_Modelling.py:22-82`): fit CountVectorizer
  * + LDA on the UNION of both sides (the reference's union-fit idiom), embed
  * each side into topic space, score pairs by topic-distribution cosine, keep
  * per-left argmax. k=10 topics per the reference (Topic_Modelling.py:30). */
object TopicModel {

  private val cosUdf = udf { (a: Vector, b: Vector) =>
    val x = a.toArray; val y = b.toArray
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < x.length) { dot += x(i) * y(i); na += x(i) * x(i); nb += y(i) * y(i); i += 1 }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic PLSA-EM topic matcher — the cross-engine-verifiable
    * sibling of [[bestMatch]]. Same union-fit idiom and k=10 topic space as
    * the reference (`Topic_Modelling.py:22-35`), but the model is plain
    * PLSA fit by `iters` exact EM steps with a modular-pattern init instead
    * of Spark ML's online-variational LDA, so every float op has a defined
    * order and the ENTIRE fit replays bit-identically in the DuckDB oracle
    * (unrolled CTE chain, one block per EM iteration).
    *
    * Arithmetic contract (mirrored exactly by the SQL builder in
    * SparkEntry): vocab = distinct `\w\w+` tokens of the lowercased union,
    * sorted ascending; doc order = id ascending;
    *   den(d,w)  = Σ_z θ(d,z)·φ(z,w)                      (z ascending)
    *   tN(d,z)   = Σ_w n(d,w)·θ(d,z)·φ(z,w)/den(d,w)      (w ascending)
    *   pN(z,w)   = Σ_d n(d,w)·θ(d,z)·φ(z,w)/den(d,w)      (d ascending)
    * each normalized by its ascending-order row sum; init
    *   θ0(d,z) ∝ 1 + ((id·31 + z·17) mod 97)/1000,
    *   φ0(z,w) ∝ 1 + ((z·13 + w·7) mod 89)/1000.
    * The FIT is driver-side on a BOUNDED doc set: when the union holds at
    * most `fitSampleLimit` docs (every test/oracle scale) it is the full
    * union — bit-identical to the SQL oracle's replay; past the cap, the
    * model is fit on the `fitSampleLimit` union docs with the smallest
    * (fingerprint64(id), id) — an unbiased deterministic sample, the same
    * chain as TrainingData's samplers — and EVERY doc (sample included,
    * for uniformity) is then embedded by a DISTRIBUTED per-doc fold-in:
    * `iters` theta-only EM steps against the broadcast final φ (each doc's
    * theta is independent given φ, so the embed is one codegen-adjacent
    * map pass — nothing corpus-sized ever reaches the driver). The SCORING
    * is the usual broadcast cross-join + per-left argmax window (`right`
    * is the bounded query side). */
  def plsaBestMatch(left: DataFrame, right: DataFrame, k: Int = 10,
                    iters: Int = 5, fitSampleLimit: Int = 1 << 16): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    // null text ≡ empty doc (real corpora carry NULL cells; the fit and the
    // fold-in kernel must not NPE on one)
    val lDs = left.select(col("id").cast("long"),
      coalesce(col("text"), lit("")).as("text")).as[(Long, String)]
    val rDs = right.select(col("id").cast("long"),
      coalesce(col("text"), lit("")).as("text")).as[(Long, String)]
    // ONE side-tagged bounded collect decides over/under-cap AND, under the
    // cap, IS the corpus — the inputs are never evaluated a probe-only
    // extra time (they may be expensive derived pipelines)
    val probe = lDs.toDF.withColumn("is_left", lit(true))
      .unionByName(rDs.toDF.withColumn("is_left", lit(false)))
      .limit(fitSampleLimit + 1)
      .as[(Long, String, Boolean)].collect()
    if (probe.length > fitSampleLimit)
      return plsaFoldInMatch(lDs, rDs, k, iters, fitSampleLimit)
    val l = probe.filter(_._3).map(p => (p._1, p._2))
    val r = probe.filterNot(_._3).map(p => (p._1, p._2))
    val docs = (l ++ r).sortBy(_._1)
    val ids = docs.map(_._1)
    val (_, theta, _) = fitPlsa(docs, k, iters)
    val thetaDf = spark.createDataFrame(
      ids.zip(theta).map { case (id, row) => (id, row.toSeq) }.toSeq
    ).toDF("id", "tv")
    val leftIds = l.map(_._1).toSet
    val lv = thetaDf.filter(col("id").isin(leftIds.toSeq: _*))
      .select(col("id").as("left_id"), col("tv").as("lv"))
    val rv = thetaDf.filter(!col("id").isin(leftIds.toSeq: _*))
      .select(col("id").as("right_id"), col("tv").as("rv"))
    bestTopicCosine(lv, rv)
  }

  private val tokRe = java.util.regex.Pattern.compile("\\w\\w+")
  private def toks(s: String): Seq[String] = {
    val m = tokRe.matcher(s.toLowerCase)
    val b = Seq.newBuilder[String]
    while (m.find()) b += m.group()
    b.result()
  }

  /** The exact joint EM fit of the scaladoc's arithmetic contract over an
    * in-memory doc set (MUST be id-ascending). Returns (vocab ascending,
    * theta D×k, phi k×v). Pure code motion from the original inline fit —
    * every float op keeps its documented order, so the DuckDB oracle's
    * unrolled-CTE replay is unaffected. */
  private[graft] def fitPlsa(docs: Array[(Long, String)], k: Int, iters: Int)
      : (Array[String], Array[Array[Double]], Array[Array[Double]]) = {
    val ids = docs.map(_._1)
    val vocab = docs.flatMap(d => toks(d._2)).distinct.sorted
    val widx = vocab.zipWithIndex.toMap
    val dN = docs.length; val v = vocab.length
    val n = Array.ofDim[Double](dN, v)
    docs.zipWithIndex.foreach { case ((_, t), di) =>
      toks(t).foreach(w => n(di)(widx(w)) += 1.0)
    }
    // modular-pattern init, rows normalized by ascending-order sums
    var theta = Array.tabulate(dN, k) { (di, z) =>
      1.0 + ((ids(di) * 31 + z * 17) % 97).toDouble / 1000.0
    }
    theta = theta.map { row => val s = row.sum; row.map(_ / s) }
    var phi = Array.tabulate(k, v) { (z, w) =>
      1.0 + ((z * 13 + w * 7) % 89).toDouble / 1000.0
    }
    phi = phi.map { row => val s = row.sum; row.map(_ / s) }
    var it = 0
    while (it < iters) {
      val den = Array.tabulate(dN, v) { (d, w) =>
        var s = 0.0; var z = 0
        while (z < k) { s += theta(d)(z) * phi(z)(w); z += 1 }
        s
      }
      val tN = Array.tabulate(dN, k) { (d, z) =>
        var s = 0.0; var w = 0
        while (w < v) { s += n(d)(w) * theta(d)(z) * phi(z)(w) / den(d)(w); w += 1 }
        s
      }
      val pN = Array.tabulate(k, v) { (z, w) =>
        var s = 0.0; var d = 0
        while (d < dN) { s += n(d)(w) * theta(d)(z) * phi(z)(w) / den(d)(w); d += 1 }
        s
      }
      // a zero row (doc with no tokens / dead topic) keeps its previous
      // distribution instead of producing 0/0 — mirrored in the SQL oracle
      theta = tN.zip(theta).map { case (row, old) =>
        val s = row.sum; if (s == 0.0) old else row.map(_ / s)
      }
      phi = pN.zip(phi).map { case (row, old) =>
        val s = row.sum; if (s == 0.0) old else row.map(_ / s)
      }
      it += 1
    }
    (vocab, theta, phi)
  }

  /** Per-doc fold-in: `iters` theta-only EM steps against a FIXED φ. Each
    * doc is independent given φ, so this runs inside a map pass. Per-z
    * partial sums accumulate in ascending-w order — the same float-op
    * sequence as the joint fit's tN — and a zero row (no in-vocab tokens)
    * keeps the modular init, mirroring the joint fit's 0/0 guard. OOV
    * tokens (absent from the sample vocabulary) are dropped. */
  private[graft] def foldInTheta(id: Long, text: String, widx: Map[String, Int],
      phi: Array[Array[Double]], k: Int, iters: Int): Array[Double] = {
    val cnt = scala.collection.mutable.HashMap.empty[Int, Double]
    toks(text).foreach { t =>
      widx.get(t).foreach(w => cnt.update(w, cnt.getOrElse(w, 0.0) + 1.0))
    }
    val ws = cnt.keys.toArray.sorted
    var theta = Array.tabulate(k)(z => 1.0 + ((id * 31 + z * 17) % 97).toDouble / 1000.0)
    locally { val s = theta.sum; theta = theta.map(_ / s) }
    var it = 0
    while (it < iters) {
      val tN = new Array[Double](k)
      var i = 0
      while (i < ws.length) {
        val w = ws(i); val nw = cnt(w)
        var den = 0.0; var z = 0
        while (z < k) { den += theta(z) * phi(z)(w); z += 1 }
        z = 0
        while (z < k) { tN(z) += nw * theta(z) * phi(z)(w) / den; z += 1 }
        i += 1
      }
      val s = tN.sum
      if (s != 0.0) theta = tN.map(_ / s)
      it += 1
    }
    theta
  }

  /** Over-cap plane: bounded deterministic sample fit + distributed fold-in
    * embed (see [[plsaBestMatch]] scaladoc). Nothing corpus-sized touches
    * the driver: the sample is `limit`-bounded, φ broadcasts once, and the
    * embeds stay on the executors until the bounded-right scoring join. */
  private def plsaFoldInMatch(lDs: Dataset[(Long, String)], rDs: Dataset[(Long, String)],
      k: Int, iters: Int, fitSampleLimit: Int): DataFrame = {
    import graft.expressions.TextHashExpressions.fingerprint64
    val spark = lDs.sparkSession
    import spark.implicits._
    val sample = lDs.toDF.unionByName(rDs.toDF)
      .withColumn("fp", fingerprint64(col("id").cast("string")))
      .orderBy(col("fp"), col("id")).limit(fitSampleLimit)   // TakeOrdered — no global sort
      .select(col("id"), col("text")).as[(Long, String)]
      .collect().sortBy(_._1)
    val (vocab, _, phi) = fitPlsa(sample, k, iters)
    val bc = spark.sparkContext.broadcast((vocab.zipWithIndex.toMap, phi))
    def embed(ds: Dataset[(Long, String)], idAs: String, vecAs: String): DataFrame =
      ds.mapPartitions { it =>
        val (widx, ph) = bc.value
        it.map { case (id, t) => (id, foldInTheta(id, t, widx, ph, k, iters).toSeq) }
      }.toDF(idAs, vecAs)
    bestTopicCosine(embed(lDs, "left_id", "lv"), embed(rDs, "right_id", "rv"))
  }

  /** Shared scoring tail: broadcast cross-join on topic-space cosine,
    * per-left argmax with the (desc score, right_id) tie order. */
  private def bestTopicCosine(lv: DataFrame, rv: DataFrame): DataFrame = {
    val cosD = udf { (a: Seq[Double], b: Seq[Double]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }
    lv.crossJoin(broadcast(rv))
      .withColumn("score", cosD(col("lv"), col("rv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("left_id")).orderBy(desc("score"), col("right_id"))))
      .filter(col("rn") === 1)
      .select(col("left_id"), col("right_id"), col("score"))
  }

  /** Best topic-space match per left row. `left`/`right`: (id, text). */
  def bestMatch(left: DataFrame, right: DataFrame, k: Int = 10,
                vocabSize: Int = 1 << 14, seed: Long = 42L): DataFrame = {
    val tok = new Tokenizer().setInputCol("text").setOutputCol("words")
    val union = left.select(coalesce(col("text"), lit("")).as("text"))
      .unionByName(right.select(coalesce(col("text"), lit("")).as("text")))
    val cv = new CountVectorizer().setInputCol("words").setOutputCol("tf")
      .setVocabSize(vocabSize).fit(tok.transform(union))
    val lda = new LDA().setK(k).setMaxIter(10).setSeed(seed).setFeaturesCol("tf")
      .fit(cv.transform(tok.transform(union)))

    def embed(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      lda.transform(cv.transform(tok.transform(
          df.withColumn("text", coalesce(col("text"), lit(""))))))
        .select(col("id").as(idAs), col("topicDistribution").as(vecAs))

    val l = embed(left, "left_id", "lv")
    val r = embed(right, "right_id", "rv")
    l.crossJoin(broadcast(r))
      .withColumn("score", cosUdf(col("lv"), col("rv")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("left_id")).orderBy(desc("score"), col("right_id"))))
      .filter(col("rn") === 1)
      .select(col("left_id"), col("right_id"), col("score"))
  }
}

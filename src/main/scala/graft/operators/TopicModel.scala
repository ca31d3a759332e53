package graft.operators

import org.apache.spark.ml.clustering.LDA
import org.apache.spark.ml.feature.{CountVectorizer, Tokenizer}
import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.DataFrame
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
    * The FIT is driver-side on the bounded union (counts matrix D×V — at
    * corpus scale you fit on a deterministic sample, like every iterative
    * model here); the SCORING is the usual distributed broadcast cross-join
    * + per-left argmax window. */
  def plsaBestMatch(left: DataFrame, right: DataFrame, k: Int = 10,
                    iters: Int = 5): DataFrame = {
    val spark = left.sparkSession
    import spark.implicits._
    val tokRe = java.util.regex.Pattern.compile("\\w\\w+")
    def toks(s: String): Seq[String] = {
      val m = tokRe.matcher(s.toLowerCase)
      val b = Seq.newBuilder[String]
      while (m.find()) b += m.group()
      b.result()
    }
    val l = left.select(col("id").cast("long"), col("text")).as[(Long, String)].collect()
    val r = right.select(col("id").cast("long"), col("text")).as[(Long, String)].collect()
    val docs = (l ++ r).sortBy(_._1)
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
    val thetaDf = spark.createDataFrame(
      ids.zip(theta).map { case (id, row) => (id, row.toSeq) }.toSeq
    ).toDF("id", "tv")
    val leftIds = l.map(_._1).toSet
    val lv = thetaDf.filter(col("id").isin(leftIds.toSeq: _*))
      .select(col("id").as("left_id"), col("tv").as("lv"))
    val rv = thetaDf.filter(!col("id").isin(leftIds.toSeq: _*))
      .select(col("id").as("right_id"), col("tv").as("rv"))
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
    val union = left.select(col("text")).unionByName(right.select(col("text")))
    val cv = new CountVectorizer().setInputCol("words").setOutputCol("tf")
      .setVocabSize(vocabSize).fit(tok.transform(union))
    val lda = new LDA().setK(k).setMaxIter(10).setSeed(seed).setFeaturesCol("tf")
      .fit(cv.transform(tok.transform(union)))

    def embed(df: DataFrame, idAs: String, vecAs: String): DataFrame =
      lda.transform(cv.transform(tok.transform(df)))
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

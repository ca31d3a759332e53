package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column functions over `array<float>` embedding columns
  * (testdata `embeddings.parquet` shape). Pure expression trees — `zip_with`
  * for the elementwise product, `aggregate` for the left-to-right sum, so the
  * summation order is pinned (bit-reproducible) and the whole thing codegens.
  * Reference semantics: cosine scoring of 23.8M pairs (`BERT_Model.py:36-57`,
  * `cosine_similarity.py:31-36`). */
object VectorFunctions {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val na = norm(a)
    val nb = norm(b)
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dot(a, b) / (na * nb))
  }

  /** A5 mean-pool (`BERT_Batching.py:23-27` last_hidden_state.mean(dim=1)):
    * elementwise mean of an array of equal-length float vectors. Exact decimal
    * accumulation → deterministic under any aggregation order. */
  def meanPool(vecs: Column): Column = {
    val n = size(vecs)
    val dims = size(element_at(vecs, 1))
    transform(sequence(lit(1), dims), d =>
      (aggregate(vecs, lit(0).cast("decimal(28,10)"),
        (acc, v) => (acc + element_at(v, d).cast("decimal(28,10)")).cast("decimal(28,10)"))
        / n.cast("decimal(28,10)")).cast("double"))
  }

  /** Random-hyperplane LSH bucket: `bits` sign-bits of dot products against
    * deterministic pseudo-random planes derived from (planeSeed, dim index).
    * Plane component for (p, i) = splitmix-ish hash mapped to [-0.5, 0.5);
    * built as an expression over the vector, no UDF. */
  def hyperplaneBucket(v: Column, bits: Int, dim: Int, seed: Long = 42L): Column = {
    val planes: Seq[Column] = (0 until bits).map { p =>
      val comps = transform(sequence(lit(0), lit(dim - 1)), i => {
        val h = xxhash64(lit(seed), lit(p), i)
        (h.cast("double") / lit(Long.MaxValue.toDouble)) / 2.0
      })
      dot(v, comps)
    }
    planes.zipWithIndex.foldLeft(lit(0L)) { case (acc, (d, p)) =>
      acc.bitwiseOR(when(d >= 0.0, shiftleft(lit(1L), p)).otherwise(0L))
    }
  }
}

package graft.expressions

import org.apache.spark.sql.catalyst.util.ArrayData

/** Static entry points for generated code.
  *
  * Janino (Spark's codegen compiler) resolves `a.b.C.m(...)` only when `C` is
  * a real Java class with a static `m` — which a Scala object NESTED inside
  * another object is not (its methods live on the `Outer$Inner$.MODULE$`
  * instance). Calls like `VectorExpressions.FloatCosine.compute(...)` in
  * generated code therefore fail to compile and Spark silently falls back to
  * interpreted evaluation (logging an executor CompileException — the
  * anonymous error in round 1's bench tail). This TOP-LEVEL object's mirror
  * class carries true static forwarders, so every custom expression's
  * generated code calls `graft.expressions.Kernels.<m>` and stays inside
  * whole-stage codegen. */
object Kernels {
  def floatCosine(a: ArrayData, b: ArrayData): Double =
    VectorExpressions.FloatCosine.compute(a, b)

  def hyperplaneBucket(v: ArrayData, planes: Array[Array[Double]],
                       bits: Int, dim: Int): Long =
    VectorExpressions.HyperplaneBucket.compute(v, planes, bits, dim)

  def minhashBands(text: String, k: Int, numHashes: Int, bands: Int): Array[Long] =
    TextHashExpressions.MinHashBands.compute(text, k, numHashes, bands)

  def simhash(text: String): Long = TextHashExpressions.SimHash.compute(text)

  def sortedJaccard(a: ArrayData, b: ArrayData): Double =
    TextHashExpressions.SortedLongJaccard.compute(a, b)

  def repetitionStats(text: String): Array[Long] =
    graft.core.TextStats.repetitionStats(text)

  def centroidArgmax(v: ArrayData, centroids: Array[Array[Float]],
                     centNorms: Array[Double]): Int =
    VectorExpressions.CentroidArgmax.compute(v, centroids, centNorms)

  def quantizeInt8(v: ArrayData): ArrayData =
    VectorExpressions.QuantizeInt8.compute(v)

  def byteCosine(a: ArrayData, b: ArrayData): Double =
    VectorExpressions.ByteCosine.compute(a, b)

  def zorder2(a: Long, b: Long): Array[Byte] = ZOrder.ZOrder2.compute(a, b)

  def prefixChain(hs: ArrayData): Array[Long] =
    TextHashExpressions.PrefixChain.compute(hs)

  def seqRatio(a: String, b: String): Double = graft.core.SeqMatcher.ratio(a, b)

  def tokenSortRatio(a: String, b: String): Int =
    graft.core.SeqMatcher.tokenSortRatio(a, b)

  def wordGrams(text: String, n: Int): Array[AnyRef] =
    TextHashExpressions.WordGrams.compute(text, n)

  def wordChunks(text: String, k: Int): Array[AnyRef] =
    TextHashExpressions.WordChunks.compute(text, k)

  def wordWindows(text: String, chunk: Int, stride: Int): Array[AnyRef] =
    TextHashExpressions.WordWindows.compute(text, chunk, stride)

  def cmsRankPrefix(th: ArrayData, tppm: Long, state: Array[Long],
                    depth: Int, width: Int): Array[Long] =
    TextHashExpressions.CmsRankPrefix.compute(th, tppm, state, depth, width)
}

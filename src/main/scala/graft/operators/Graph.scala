package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the web-corpus lineage the engine already
  * extracts (`TrainingData.linkExtract` / `urlHostStats`): PageRank on the
  * host graph — the standard quality/centrality prior a web-scale training
  * pipeline mixes into document sampling weights (the reference's corpus
  * scoring plane, lifted from per-document features to the link structure).
  *
  * INTEGER fixed-point arithmetic throughout (micro-units of 10^12 total
  * mass), with a pinned operation order — floor at every division, never
  * sum-then-floor — so another engine replays the ranks bit-for-bit: float
  * PageRank differs across summation orders, which would make a
  * cross-engine oracle impossible.
  *
  * Semantics (Page et al. 1999, damped PR, dangling mass dropped —
  * documented divergence from the mass-conserving variant; with a damping
  * of d% and N nodes):
  *   r_0(v)   = floor(10^12 / N)
  *   r_i+1(v) = floor(10^12 * (100-d) / (100 * N))
  *              + Σ_{(u,v) ∈ E} floor(r_i(u) * d / (100 * outdeg(u)))
  *
  * Scale shape: edges are deduplicated and joined to a tiny out-degree
  * table once; each iteration is ONE shuffle — join ranks (partitioned by
  * node) to edges on src, hash-aggregate contributions by dst, left-join
  * back to the node set. On a real cluster both sides stay co-partitioned
  * on the node key across iterations (the partitioner is reused, so only
  * the first iteration pays a full exchange). Iteration count is fixed and
  * small (power iteration converges geometrically at rate d); lineage is
  * truncated with `localCheckpoint` every few rounds so the plan does not
  * grow unboundedly (the `Dedup.nearDupClusters` pattern).
  */
object Graph {

  /** Host-graph edges from a crawl-derived corpus: within each document the
    * FIRST URL's canonical host is the source page's home and every other
    * distinct host it mentions is an outgoing edge (the anchor-graph
    * convention when the corpus rows carry no explicit page URL).
    * Canonicalization matches `TrainingData.urlHostStats` (lowercase, strip
    * leading `www.`). Per-row codegen regexp + posexplode (NO regex inside
    * HOF lambdas — those run interpreted), one struct-min hash-agg for the
    * first host, one equi-join back; edges deduplicated. */
  def hostEdges(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val urls = df.select(col(idCol).as("id"),
        posexplode(regexp_extract_all(col(textCol),
          lit(TrainingData.UrlRe), lit(0))).as(Seq("pos", "url")))
      .withColumn("host", TrainingData.canonicalHost(col("url")))
      .filter(col("host") =!= "")
    // ONE pass over the regex-extracted subtree: the per-doc first host and
    // the distinct host set come out of the same hash-agg (a self-join here
    // would plan — and run — the dominant regex extraction twice)
    urls.groupBy("id")
      .agg(min(struct(col("pos"), col("host"))).as("fh"),
        collect_set(col("host")).as("hosts"))
      .select(col("fh.host").as("src"), explode(col("hosts")).as("dst"))
      .filter(col("dst") =!= col("src"))
      .distinct()
  }

  /** PageRank over `edges(srcCol, dstCol)`; returns (node, rank) with rank
    * in integer micro-units (Σ ≤ 10^12, dangling/rounding mass dropped). */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int, dampingPct: Int = 85,
               checkpointEvery: Int = 4): DataFrame = {
    require(iters >= 0 && dampingPct > 0 && dampingPct < 100)
    require(checkpointEvery >= 1, s"checkpointEvery must be >= 1, got $checkpointEvery")
    // a null endpoint carries no edge: null keys never equi-match in the
    // iteration joins, so keeping them would inflate N (diluting teleport
    // mass) while silently dropping their edges and inflow
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .distinct()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().cache()
    val n = nodes.count()
    if (n == 0) { nodes.unpersist(); return nodes.withColumn("rank", lit(0L)) }

    val total = 1000000000000L
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val edgesWithDeg = e.join(outDeg, "src").cache()
    val teleport = total * (100L - dampingPct) / (100L * n)

    var ranks = nodes.withColumn("rank", lit(total / n))
    for (i <- 1 to iters) {
      val contribs = edgesWithDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
          expr(s"(rank * $dampingPct) div (100 * od)").as("c"))
        .groupBy("node").agg(sum("c").as("inflow"))
      ranks = nodes.join(contribs, Seq("node"), "left")
        .select(col("node"),
          (lit(teleport) + coalesce(col("inflow"), lit(0L))).as("rank"))
      if (i % checkpointEvery == 0 && i < iters)
        ranks = ranks.localCheckpoint(eager = true)
    }
    // materialize the result, then release the iteration caches — without
    // this every invocation pins nodes/edges in storage memory for the
    // session lifetime
    val out = ranks.localCheckpoint(eager = true)
    nodes.unpersist()
    edgesWithDeg.unpersist()
    out
  }
}

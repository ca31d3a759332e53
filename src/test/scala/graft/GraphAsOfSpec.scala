package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{AsOfJoin, Graph}

/** As-of join and link-graph PageRank: both pinned against independent naive
  * single-threaded replicas, plus their determinism contracts (tie-breaks,
  * integer fixed-point op order). */
class GraphAsOfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("AsOfJoin.asOf == naive per-row scan; inclusive ties; right-dedup; left outer") {
    val left = Seq(
      (100L, 1L, ts(50)),  // strictly after two clicks
      (101L, 1L, ts(20)),  // EQUAL ts to a click → inclusive match
      (102L, 1L, ts(5)),   // before every click → null
      (103L, 2L, ts(90)),  // other key
      (104L, 3L, ts(10))   // key with no right rows at all
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts(20), 1.0),
      (11L, 1L, ts(20), 2.0),  // same (key, ts): greatest event_id wins
      (12L, 1L, ts(40), 3.0),
      (13L, 2L, ts(90), 4.0),
      (14L, 2L, ts(95), 5.0)   // after the only left row of key 2
    ).toDF("event_id", "user_id", "ts", "value")

    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("value"))
      .select("event_id", "asof_event_id", "asof_value")
      .as[(Long, Option[Long], Option[Double])].collect().toSet

    // naive oracle: scan all right rows per left row
    val rr = Seq((10L, 1L, 20L, 1.0), (11L, 1L, 20L, 2.0), (12L, 1L, 40L, 3.0),
      (13L, 2L, 90L, 4.0), (14L, 2L, 95L, 5.0))
    val ll = Seq((100L, 1L, 50L), (101L, 1L, 20L), (102L, 1L, 5L),
      (103L, 2L, 90L), (104L, 3L, 10L))
    val expect = ll.map { case (eid, k, t) =>
      val cand = rr.filter(r => r._2 == k && r._3 <= t)
      if (cand.isEmpty) (eid, None, None)
      else {
        val best = cand.maxBy(r => (r._3, r._1)) // latest ts, then greatest id
        (eid, Some(best._1), Some(best._4))
      }
    }.toSet
    assert(got == expect)
  }

  test("AsOfJoin.asOf: null-ts right rows are never matches (no -infinity sort)") {
    val left = Seq((1L, 1L, ts(5))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, Option.empty[java.sql.Timestamp], 9.0), // null ts: must not match
      (11L, 1L, Some(ts(50)), 8.0)                      // after the left row
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("value"))
      .select("event_id", "asof_event_id").as[(Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, None)))
  }

  test("AsOfJoin.asOf: null KEYS never match (equi semantics, unlike window partitioning)") {
    // Window.partitionBy groups null keys together — without the right-side
    // null-key filter, the null-key right row below would "match" the
    // null-key left row, where SQL ASOF (l.key = r.key) never matches NULL
    val left = Seq(
      (1L, Option.empty[Long], ts(10)), // null key: must emit null asof_*
      (2L, Some(1L), ts(10))            // real key: matches normally
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, Option.empty[Long], ts(5), 9.0), // null key: never a match
      (11L, Some(1L), ts(5), 8.0)
    ).toDF("event_id", "user_id", "ts", "value")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "event_id", Seq("value"))
      .select("event_id", "asof_event_id").as[(Long, Option[Long])]
      .collect().toMap
    assert(got == Map(1L -> None, 2L -> Some(11L)))
  }

  test("AsOfJoin.asOf: partition-count invariance") {
    val r = new scala.util.Random(7)
    val left = (0 until 300).map(i =>
      (i.toLong, (r.nextInt(5) + 1).toLong, ts(r.nextInt(1000).toLong)))
      .toDF("event_id", "user_id", "ts")
    val right = (0 until 200).map(i =>
      (1000L + i, (r.nextInt(6) + 1).toLong, ts(r.nextInt(1000).toLong),
        r.nextInt(100).toDouble)).toDF("event_id", "user_id", "ts", "value")
    def run(lp: Int, rp: Int) =
      AsOfJoin.asOf(left.repartition(lp), right.repartition(rp),
        "user_id", "ts", "event_id", Seq("value"))
        .select("event_id", "asof_event_id").as[(Long, Option[Long])]
        .collect().toSet
    assert(run(1, 1) == run(7, 3))
  }

  test("Graph.pageRank == naive integer replica; symmetric graph ranks equal") {
    val edges = Seq(
      ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),
      ("a", "b") // duplicate edge must collapse
    ).toDF("src", "dst")
    val got = Graph.pageRank(edges, "src", "dst", iters = 5)
      .as[(String, Long)].collect().toMap

    // naive replica with the pinned op order
    val e = Set(("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"))
    val nodes = e.flatMap(p => Seq(p._1, p._2))
    val n = nodes.size
    val total = 1000000000000L
    val out = e.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> total / n).toMap
    val teleport = total * 15L / (100L * n)
    for (_ <- 1 to 5) {
      val inflow = e.toSeq.map { case (s, d) => d -> (r(s) * 85L) / (100L * out(s)) }
        .groupBy(_._1).map { case (d, xs) => d -> xs.map(_._2).sum }
      r = nodes.map(v => v -> (teleport + inflow.getOrElse(v, 0L))).toMap
    }
    assert(got == r)
    // sanity: total mass bounded by the initial mass
    assert(got.values.sum <= total)

    // a 2-cycle is symmetric → equal ranks
    val sym = Graph.pageRank(Seq(("x", "y"), ("y", "x")).toDF("src", "dst"),
      "src", "dst", iters = 5).as[(String, Long)].collect().toMap
    assert(sym("x") == sym("y"))
  }

  test("Graph.hostEdges: first canonical host is the source; self/dup edges dropped") {
    val docs = Seq(
      (1L, "see https://WWW.A.com/x then http://b.org/y and https://a.com/z"),
      (2L, "only http://solo.net/p here"),
      (3L, "no urls at all"),
      (4L, "https://c.io http://c.io/again https://d.me")
    ).toDF("doc_id", "text")
    val got = Graph.hostEdges(docs, "doc_id", "text")
      .as[(String, String)].collect().toSet
    // doc 1: first host a.com (www-stripped, lowered); edge to b.org only
    // (a.com again is a self-link); doc 2: no second host; doc 4: c.io → d.me
    assert(got == Set(("a.com", "b.org"), ("c.io", "d.me")))
  }

  test("heavyHitters: exact output on a planted heavy tail; gate never drops a hitter") {
    import graft.operators.TrainingData
    // heavy tail: 5 hot keys (300..700 occurrences) over 5000 cold keys
    val hot = (0 until 5).flatMap(i => Seq.fill(300 + i * 100)(s"hot-$i"))
    val cold = (0 until 5000).map(i => s"cold-$i")
    val values = new scala.util.Random(11).shuffle(hot ++ cold)
    val df = values.map(Tuple1(_)).toDF("v")
    val got = TrainingData.heavyHitters(df, col("v"), minCount = 300L)
      .as[(String, Long)].collect().toMap
    val expect = values.groupBy(identity).collect {
      case (v, xs) if xs.size >= 300 => v -> xs.size.toLong }
    assert(got == expect && got.size == 5)
    // higher threshold drops the lightest hitters exactly
    val got500 = TrainingData.heavyHitters(df, col("v"), minCount = 500L)
      .as[(String, Long)].collect().toMap
    assert(got500 == expect.filter(_._2 >= 500L))
  }

  test("cmsSketch: state == brute-force replica; shard merge; estimate bounds") {
    import graft.core.TextStats
    import graft.operators.TrainingData
    val depth = 4
    val width = 1024
    val values = (0 until 4000).map(i => s"tok-${i % 700}")
    val sketch = TrainingData.cmsSketch(values.map(Tuple1(_)).toDF("v"),
        col("v"), depth, width)
      .as[(Long, Long, Long)].collect().sorted.toSeq
    // brute-force replica over the kernel
    val expect = values.flatMap(v =>
        TextStats.cmsBuckets(v, depth, width).zipWithIndex
          .map { case (b, d) => (d.toLong, b) })
      .groupBy(identity).map { case ((d, b), xs) => (d, b, xs.size.toLong) }
      .toSeq.sorted
    assert(sketch == expect)
    // mergeability: shard sketches sum to the whole
    val (l, r) = values.splitAt(1500)
    def sk(xs: Seq[String]) = TrainingData.cmsSketch(
      xs.map(Tuple1(_)).toDF("v"), col("v"), depth, width)
      .as[(Long, Long, Long)].collect().map { case (d, b, c) => (d, b) -> c }.toMap
    val merged = (sk(l).toSeq ++ sk(r).toSeq).groupBy(_._1)
      .map { case (k, xs) => (k._1, k._2, xs.map(_._2).sum) }.toSeq.sorted
    assert(merged == sketch)
    // CMS guarantee: estimate >= true count, and tight for the heavy hitter
    val truth = values.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
    truth.foreach { case (v, c) =>
      assert(TrainingData.cmsEstimate(sketch, v, depth, width) >= c)
    }
    // 700 distinct keys in 1024 buckets: the min-over-4-rows estimate of a
    // uniform key collides in all rows with prob ~(700/1024)^4 — spot-check
    // that at least 90% of keys are estimated exactly
    val exact = truth.count { case (v, c) =>
      TrainingData.cmsEstimate(sketch, v, depth, width) == c }
    assert(exact >= truth.size * 9 / 10, s"only $exact/${truth.size} exact")
  }
}

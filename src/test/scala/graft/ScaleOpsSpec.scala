package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.SkewJoin

/** Scale techniques: salted skew joins, bucketed co-located joins, and the
  * metrics gauge surface. */
class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("salted join equals unsalted join on skewed data") {
    import spark.implicits._
    // hot key: 90% of big side is key 1
    val big = ((1 to 900).map(i => (1L, s"row$i")) ++ (1 to 100).map(i => (i.toLong % 7 + 2, s"tail$i")))
      .toDF("k", "payload")
    val small = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "dim")
    val expected = big.join(small, "k").select($"k", $"payload", $"dim")
      .collect().map(_.toSeq).toSet
    val got = SkewJoin.saltedInnerJoin(big, small, "k", salts = 8)
      .select($"k", $"payload", $"dim")
      .collect().map(_.toSeq).toSet
    assert(got == expected)
    // the salt actually spreads the hot key across several salt values
    val spread = big.withColumn("_salt",
        org.apache.spark.sql.functions.pmod(
          org.apache.spark.sql.functions.xxhash64(
            org.apache.spark.sql.functions.monotonically_increasing_id()),
          org.apache.spark.sql.functions.lit(8)))
      .filter($"k" === 1L).select("_salt").distinct().count()
    assert(spread > 1, "hot key must span multiple salts")
  }

  test("bucketed tables join without a shuffle exchange (co-located join)") {
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
      val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
      a.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_a")
      b.write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("graft_bucket_b")
      val joined = spark.table("graft_bucket_a").join(spark.table("graft_bucket_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
      assert(joined.count() == 1000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }

  test("metrics gauges: replication and consumer lag registered/read/removed") {
    import java.nio.file.Files
    import graft.streaming.GraftMetrics
    val log = graft.store.EventLog(Files.createTempDirectory("graft-m-").toString, spark)
    val sink = graft.sources.KafkaShapedLog(Files.createTempDirectory("graft-ms-").toString, spark)
    val rep = new graft.replicate.Replicator(log, sink)
    log.saveAll("m_events", (1 to 3).map(i =>
      graft.model.Event(s"k$i".getBytes, s"p$i".getBytes, java.time.Instant.now())))
    val m = new GraftMetrics
    m.registerReplicationLag(rep, "m_events")
    var processed = -1L
    m.registerConsumerLag(sink, "m_events", 0, () => processed)
    assert(m.value("event.replicator.lag.m_events").contains(1L)) // head lsn 1, cursor 0
    rep.run("m_events")
    assert(m.value("event.replicator.lag.m_events").contains(0L))
    assert(m.value("event.store.consumer.lag.m_events.0").contains(3L))
    processed = 2L
    assert(m.value("event.store.consumer.lag.m_events.0").contains(0L))
    m.remove("event.replicator.lag.m_events")
    assert(m.value("event.replicator.lag.m_events").isEmpty)
    assert(m.snapshot().keySet == Set("event.store.consumer.lag.m_events.0"))
  }

  test("ev_approx_stats: mergeable sketches stay within pinned error of the exact spellings") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val events = Tables.load(spark, dir, "events")
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("users"),
        expr("percentile(value, array(0.5D, 0.95D))").as("ps"))
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getSeq[Double](2))).toMap
    val approx = SparkEntry.queries("ev_approx_stats")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), Seq(r.getDouble(2), r.getDouble(3)))).toMap
    assert(approx.keySet == exact.keySet)
    assert(exact.nonEmpty)
    for ((tpe, (aUsers, aPs)) <- approx) {
      val (eUsers, ePs) = exact(tpe)
      val relErr = math.abs(aUsers - eUsers).toDouble / eUsers
      assert(relErr <= 0.05, s"$tpe: HLL distinct off by ${relErr * 100}% ($aUsers vs $eUsers)")
      for (((a, e), i) <- aPs.zip(ePs).zipWithIndex)
        assert(math.abs(a - e) <= math.max(0.05 * math.abs(e), 1e-9),
          s"$tpe p${if (i == 0) 50 else 95}: $a vs $e")
    }
  }

  test("ev_kmv_distinct: estimate within sketch error of exact; result partition-independent") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val events = Tables.load(spark, dir, "events")
    val exact = events.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("users"))
      .as[(String, Long)].collect().toMap
    val est = SparkEntry.queries("ev_kmv_distinct")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(est.keySet == exact.keySet)
    val k = graft.queries.EventQueries.KmvK
    for ((tpe, (n, kth, e)) <- est) {
      assert(n >= 1 && n <= k)
      val ex = exact(tpe)
      if (n < k) assert(e == ex.toDouble, s"$tpe: undersized sketch must be exact")
      else {
        assert(kth > 0)
        // KMV stderr ≈ 1/√(k−2) ≈ 12.7% at k=64; allow 4σ
        val relErr = math.abs(e - ex) / ex
        assert(relErr <= 0.51, s"$tpe: KMV off by ${relErr * 100}% ($e vs $ex)")
      }
    }
    // merge-order/partition independence: the minima are a function of the
    // value SET — any repartitioning (and thus any partial/merge schedule)
    // must produce the identical rows
    graft.GraftExtensions.register(spark)
    def run(parts: Int) = events.repartition(parts)
      .select($"event_type", graft.queries.CrossHash.h60($"user_id".cast("string")).as("h"))
      .groupBy($"event_type")
      .agg(call_function("graft_kmv", $"h", lit(k)).as("mins"))
      .as[(String, Seq[Long])].collect().toMap
    val a = run(1); val b = run(7); val c = run(32)
    assert(a == b && b == c, "KMV result varies with partitioning")
    assert(a.values.forall(m => m == m.sorted && m.distinct.size == m.size),
      "minima must be ascending and distinct")
  }

  test("ev_kmv_setops: sketch union IS the union's sketch; estimates within sketch error of exact") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val events = Tables.load(spark, dir, "events")
    graft.GraftExtensions.register(spark)
    val k = graft.queries.EventQueries.KmvK
    // exact per-pair union / intersection distinct-user counts
    val users = events.select($"event_type", $"user_id").distinct()
      .as[(String, Long)].collect().groupBy(_._1).map { case (t, r) => t -> r.map(_._2).toSet }
    val est = SparkEntry.queries("ev_kmv_setops")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3), r.getLong(4), r.getDouble(5))).toMap
    val pairs = for (a <- users.keys; b <- users.keys if a < b) yield (a, b)
    assert(est.keySet == pairs.toSet)
    for (((a, b), (unionN, estU, interCnt, estI)) <- est) {
      val exU = (users(a) ++ users(b)).size
      val exI = (users(a) & users(b)).size
      assert(unionN >= 1 && unionN <= k && interCnt <= unionN)
      if (unionN < k) assert(estU == exU.toDouble, s"$a×$b: undersized union sketch must be exact")
      else assert(math.abs(estU - exU) / exU <= 0.51,
        s"$a×$b union: $estU vs $exU") // 4σ at k=64, the ev_kmv_distinct envelope
      // intersection: ρ has its own binomial noise on top — loose envelope,
      // but it must not be degenerate when the true overlap is substantial
      if (exI > 0 && unionN == k)
        assert(math.abs(estI - exI) / exI <= 1.0, s"$a×$b inter: $estI vs $exI")
    }
    // THE set-algebra identity the query rests on: the k smallest of
    // minsA ∪ minsB equal the KMV sketch computed from the unioned rows
    val mins = events
      .select($"event_type", graft.queries.CrossHash.h60($"user_id".cast("string")).as("h"))
      .groupBy($"event_type")
      .agg(call_function("graft_kmv", $"h", lit(k)).as("mins"))
      .as[(String, Seq[Long])].collect().toMap
    val (ta, tb) = (mins.keys.min, mins.keys.max)
    val merged = (mins(ta) ++ mins(tb)).distinct.sorted.take(k)
    val direct = events.filter($"event_type".isin(ta, tb))
      .select(graft.queries.CrossHash.h60($"user_id".cast("string")).as("h"))
      .agg(call_function("graft_kmv", $"h", lit(k)).as("mins"))
      .as[Seq[Long]].collect().head
    assert(merged == direct, "sketch-of-union must equal union-of-sketches")
  }

  test("ev_quantile_sample: hash-sample quantiles land within rank tolerance of the exact ones") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = "/root/testdata/sf0.01"
    val events = Tables.load(spark, dir, "events")
    val exact = events.groupBy($"event_type").agg(
        expr("percentile(value, 0.4)").as("p40"),
        expr("percentile(value, 0.6)").as("p60"),
        expr("percentile(value, 0.90)").as("p90"),
        expr("percentile(value, 0.99)").as("p99"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val est = SparkEntry.queries("ev_quantile_sample")(spark, dir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(est.keySet == exact.keySet)
    for ((tpe, (n, p50e, p95e)) <- est) {
      assert(n > 100, s"$tpe: sample too small to be meaningful ($n)")
      val (p40, p60, p90, p99) = exact(tpe)
      assert(p50e >= p40 && p50e <= p60, s"$tpe: p50 estimate $p50e outside [$p40,$p60]")
      assert(p95e >= p90 && p95e <= p99, s"$tpe: p95 estimate $p95e outside [$p90,$p99]")
    }
  }

  test("ev_stats_incr: merged view equals full recompute at every split, incl. empty/total deltas") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    import graft.queries.EventQueries.{mergeStatsViews, statsView}
    graft.GraftExtensions.register(spark)
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
          r.getLong(5), r.getLong(6), r.getDouble(7))).toMap
    // the one-pass view: merge against an empty old state (identity)
    val full = key(mergeStatsViews(
      statsView(events.filter(lit(false))), statsView(events)))
    assert(full.nonEmpty)
    for (m <- Seq(2L, 3L, 7L, 10L)) {
      val got = key(mergeStatsViews(
        statsView(events.filter($"event_id" % m =!= 0)),
        statsView(events.filter($"event_id" % m === 0))))
      assert(got == full, s"split %$m diverges from the full recompute")
    }
    // empty delta is a no-op refresh
    val noop = key(mergeStatsViews(
      statsView(events), statsView(events.filter(lit(false)))))
    assert(noop == full, "empty delta changed the view")
  }
}

package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col
import java.sql.Timestamp

class StreamsSpec extends SparkSpec {
  import spark.implicits._

  test("incremental aggregation maintains running per-key state across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Double)]
    val agg = Streams.incrementalAgg(
      input.toDF().toDF("k", "value"), "k", "value")
    val q = agg.writeStream.format("memory").queryName("inc_agg")
      .outputMode("complete").start()
    try {
      input.addData(("a", 1.0), ("a", 2.0), ("b", 10.0))
      q.processAllAvailable()
      val r1 = spark.table("inc_agg").collect()
        .map(r => r.getString(0) -> r.getDouble(2)).toMap
      assert(r1 == Map("a" -> 3.0, "b" -> 10.0))
      input.addData(("a", 4.0))   // incremental update, not recompute
      q.processAllAvailable()
      val r2 = spark.table("inc_agg").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
      assert(r2("a") == ((3L, 7.0)) && r2("b") == ((1L, 10.0)))
    } finally q.stop()
  }

  test("windowed counts with watermark group by event-time windows") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String, Double)]
    val win = Streams.windowedCounts(
      input.toDF().toDF("ts", "k", "value"), "ts", "k",
      windowDur = "10 minutes", watermark = "1 hour")
    val q = win.writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      def t(min: Int) = new Timestamp(3600000L + min * 60000L)
      input.addData((t(1), "a", 1.0), (t(5), "a", 2.0), (t(12), "a", 4.0))
      q.processAllAvailable()
      val rows = spark.table("win_counts").collect()
        .map(r => (r.getTimestamp(0).getTime, r.getLong(2), r.getDouble(3)))
      assert(rows.toSet == Set((3600000L, 2L, 3.0), (4200000L, 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup keeps first occurrence per content hash") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Timestamp, String)]
    val dd = Streams.streamingDedup(
      input.toDF().toDF("ts", "text"), "ts", "text")
    val q = dd.writeStream.format("memory").queryName("sdedup")
      .outputMode("append").start()
    try {
      input.addData((new Timestamp(1000), "hello"), (new Timestamp(2000), "hello"),
        (new Timestamp(3000), "world"))
      q.processAllAvailable()
      assert(spark.table("sdedup").count() == 2)
      input.addData((new Timestamp(4000), "hello")) // still duplicate
      q.processAllAvailable()
      assert(spark.table("sdedup").count() == 2)
    } finally q.stop()
  }

  test("streaming decontamination drops docs sharing a benchmark shingle, statelessly") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val bench = Seq("the quick brown fox jumps").toDF("text")
    val input = MemoryStream[(Long, String)]
    val out = Streams.decontaminateStream(
      input.toDF().toDF("doc_id", "text"), bench)
    val q = out.writeStream.format("memory").queryName("sdecon")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "totally clean document here"),
        (2L, "contains the quick brown fox inside"), // shares a 3-gram
        (3L, "quick brown dog sleeps all day"),      // no shared 3-gram
        (4L, null.asInstanceOf[String]))             // null text: KEPT,
      // like the batch twin (explode + left_anti keeps null-text docs)
      q.processAllAvailable()
      val kept = spark.table("sdecon").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept == Set(1L, 3L, 4L), s"kept $kept")
    } finally q.stop()
  }

  test("streaming near-dup candidates pair a doc with state from EARLIER batches") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while seventeen " +
      "astronauts carefully measure gravitational anomalies across the " +
      "frozen tundra of a distant moon base station"
    val near = base.replace("seventeen", "nineteen")
    val other = "completely unrelated content about cooking pasta with " +
      "tomatoes garlic olive oil and a generous handful of fresh basil " +
      "leaves simmered slowly in a cast iron pan"
    val input = MemoryStream[(Long, String)]
    val cands = Streams.streamingNearDupCandidates(
      input.toDF().toDF("doc_id", "text"), ttl = None)
    val q = cands.toDF("id_a", "id_b").writeStream.format("memory")
      .queryName("sneardup").outputMode("append").start()
    try {
      input.addData((1L, base))
      q.processAllAvailable()
      assert(spark.table("sneardup").count() == 0)
      input.addData((2L, near), (3L, other)) // 2 pairs with 1 across batches
      q.processAllAvailable()
      val pairs = spark.table("sneardup").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(pairs == Set((1L, 2L)), s"got $pairs")
    } finally q.stop()
  }

  test("streaming common segments emit once at the doc-frequency threshold") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val footer = "subscribe to our newsletter"
    val input = MemoryStream[(Long, String)]
    val common = Streams.streamingCommonSegments(
      input.toDF().toDF("doc_id", "text"), minDocFreq = 3, ttl = None)
    val q = common.toDF("seg", "df").writeStream.format("memory")
      .queryName("scommon").outputMode("append").start()
    try {
      input.addData((1L, s"unique one\n$footer"), (2L, s"$footer\nunique two"))
      q.processAllAvailable()
      assert(spark.table("scommon").count() == 0, "df=2 is below the threshold")
      input.addData((3L, s"unique three\n$footer"))
      q.processAllAvailable()
      val hits = spark.table("scommon").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSet
      assert(hits == Set((footer, 3L)), s"got $hits")
      // a fourth carrier and a REPEAT of doc 3 never re-emit
      input.addData((4L, footer), (3L, s"unique three\n$footer"))
      q.processAllAvailable()
      assert(spark.table("scommon").count() == 1, "segment re-emitted")
    } finally q.stop()
  }

  test("streaming edges feed an IQL relation; recursive rules stay maintained per batch") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long)]
    val cat = new graft.iql.Catalog(spark)
    val engine = new graft.iql.Engine(cat)
    engine.run(
      """+sedge[]
        |+sreach(X, Y) <- sedge(X, Y)
        |+sreach(X, Z) <- sreach(X, Y), sedge(Y, Z)
        |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_iql").toString
    val q = Streams.iqlSink(input.toDF().toDF("src", "dst"), cat, "sedge", ckpt)
    try {
      input.addData((1L, 2L), (2L, 3L))
      q.processAllAvailable()
      assert(rows(engine.run("?sreach(X, Y)").last) ==
        Set(Seq(1L, 2L), Seq(1L, 3L), Seq(2L, 3L)))
      input.addData((3L, 4L)) // next micro-batch: closure extends incrementally
      q.processAllAvailable()
      assert(rows(engine.run("?sreach(X, Y)").last) ==
        Set(Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L),
          Seq(2L, 3L), Seq(2L, 4L), Seq(3L, 4L)))
      assert(engine.maintainedCount >= 1,
        "batch-2 re-query should be served by incremental maintenance")
    } finally q.stop()
  }

  test("streaming retraction prunes closure-derived tuples (diamond shape)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Long, Int)] // (src, dst, diff)
    val cat = new graft.iql.Catalog(spark)
    val engine = new graft.iql.Engine(cat)
    engine.run(
      """+redge[]
        |+rreach(X, Y) <- redge(X, Y)
        |+rreach(X, Z) <- rreach(X, Y), redge(Y, Z)
        |""".stripMargin)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_stream_retr").toString
    val q = Streams.iqlSinkWithRetractions(
      input.toDF().toDF("src", "dst", "diff"), cat, "redge", ckpt)
    try {
      // diamond 1→{2,3}→4: reach(1,4) is DOUBLY supported
      input.addData((1L, 2L, 1), (1L, 3L, 1), (2L, 4L, 1), (3L, 4L, 1))
      q.processAllAvailable()
      assert(rows(engine.run("?rreach(X, Y)").last) ==
        Set(Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L), Seq(2L, 4L), Seq(3L, 4L)))
      // batch 2 retracts ONE arm: reach(1,4) must SURVIVE via the other
      // (the over-deletion DRed must re-derive, reference BENCHMARKS.md
      // diamond-retraction shape)
      input.addData((2L, 4L, -1))
      q.processAllAvailable()
      assert(rows(engine.run("?rreach(X, Y)").last) ==
        Set(Seq(1L, 2L), Seq(1L, 3L), Seq(1L, 4L), Seq(3L, 4L)))
      // batch 3 retracts the second arm: the derived tuple dies
      input.addData((3L, 4L, -1))
      q.processAllAvailable()
      assert(rows(engine.run("?rreach(X, Y)").last) ==
        Set(Seq(1L, 2L), Seq(1L, 3L)))
      // same-batch insert+retract nets to absent (diff summation)
      input.addData((7L, 8L, 1), (7L, 8L, -1))
      q.processAllAvailable()
      assert(rows(engine.run("?rreach(X, Y)").last) ==
        Set(Seq(1L, 2L), Seq(1L, 3L)))
    } finally q.stop()
  }

  test("map-only pipeline ops run on streams unchanged: deterministic sample + quality gate") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val input = MemoryStream[(Long, String)]
    // the SAME operators batch pipelines use — no streaming variants
    // needed, because their plans are stateless per-row expressions
    val sampled = graft.operators.Sampling.deterministicSample(
      input.toDF().toDF("doc_id", "text"), "doc_id", 1, 2)
    val out = sampled.withColumn("n_tokens",
      graft.functions.TextFunctions.tokenCount(col("text")))
    val q = out.writeStream.format("memory").queryName("smaponly")
      .outputMode("append").start()
    try {
      input.addData((0L until 40L).map(i => (i, s"tok$i words here")): _*)
      q.processAllAvailable()
      val rows = spark.table("smaponly").collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      // identical keep-set as the batch operator on the same ids
      val batchKept = graft.operators.Sampling.deterministicSample(
        (0L until 40L).map(i => (i, "x")).toDF("doc_id", "text"), "doc_id", 1, 2)
        .select(col("doc_id")).collect().map(_.getLong(0)).toSet
      assert(rows.keySet == batchKept, "stream and batch keep-sets differ")
      assert(rows.values.forall(_ == 3L))
    } finally q.stop()
  }

  test("IQL rules compile directly over streaming sources") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, Double)]
    val dims = Seq((1L, "alpha"), (2L, "beta")).toDF("id", "name")
    // stream⋈static join + computed binding + filter, all from IQL
    val out = Streams.ruleStream(
      "alert(Id, Nm, Scaled) <- events(Id, V), dim(Id, Nm), Scaled = V * 2.0, V > 5.0",
      Map("events" -> input.toDF().toDF("Id", "V"), "dim" -> dims))
    val q = out.writeStream.format("memory").queryName("iql_alerts")
      .outputMode("append").start()
    try {
      input.addData((1L, 10.0), (1L, 1.0), (2L, 6.0), (3L, 100.0))
      q.processAllAvailable()
      val rows = spark.table("iql_alerts").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(rows == Set((1L, "alpha", 20.0), (2L, "beta", 12.0)))
      input.addData((2L, 7.5)) // incremental: only the new row flows
      q.processAllAvailable()
      assert(spark.table("iql_alerts").count() == 3)
    } finally q.stop()
    // negation is rejected with a pointer at the supported path
    val err = intercept[IllegalArgumentException] {
      Streams.ruleStream("bad(X) <- events(X, V), !dim(X, _)",
        Map("events" -> input.toDF().toDF("X", "V"), "dim" -> dims))
    }
    assert(err.getMessage.contains("negation"))
  }

  test("stream-stream interval join matches within the time bound only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Timestamp, Long)]
    val imps = MemoryStream[(Timestamp, Long)]
    val joined = Streams.intervalJoin(
      imps.toDF().toDF("its", "k"), clicks.toDF().toDF("cts", "k"),
      key = "k", leftTs = "its", rightTs = "cts", within = "10 minutes")
      .select(col("l.k").as("k"), col("its"), col("cts"))
    val q = joined.writeStream.format("memory").queryName("ssjoin")
      .outputMode("append").start()
    try {
      def t(min: Int) = new Timestamp(3600000L + min * 60000L)
      imps.addData((t(0), 1L), (t(0), 2L))
      // k=1 click inside the 10-minute bound; k=2 click outside it
      clicks.addData((t(5), 1L), (t(30), 2L), (t(5), 3L))
      q.processAllAvailable()
      val got = spark.table("ssjoin").collect().map(_.getLong(0)).toSet
      assert(got == Set(1L)) // k=2 out of window, k=3 has no impression
    } finally q.stop()
  }

  test("mapGroupsWithState keeps decayed per-user activity") {
    implicit val sqlCtx = spark.sqlContext
    import Streams._
    val input = MemoryStream[Event]
    val out = Streams.decayedActivity(input.toDS(), halfLifeMs = 1000L)
    val q = out.writeStream.format("memory").queryName("activity")
      .outputMode("update").start()
    try {
      input.addData(Event(1L, 0L, 4.0))
      q.processAllAvailable()
      input.addData(Event(1L, 1000L, 1.0)) // one half-life later: 4*0.5+1 = 3
      q.processAllAvailable()
      val s = spark.table("activity").collect()
        .map(r => (r.getLong(0), r.getStruct(1).getLong(0), r.getStruct(1).getDouble(1)))
        .maxBy(_._2)
      assert(s._1 == 1L && s._2 == 2L && math.abs(s._3 - 3.0) < 1e-9)
    } finally q.stop()
  }

  test("trained quality classifier scores a stream map-only with batch-trained weights") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val clean = Vector("the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog")
    val junk = Vector("xjq", "zzk", "qqv", "wxp", "kkz", "jjx", "vvq", "ppw")
    def doc(v: Vector[String]) = Seq.fill(10)(v(rnd.nextInt(v.size))).mkString(" ")
    val train = ((1 to 20).map(i => (i.toLong, doc(clean))) ++
      (21 to 40).map(i => (i.toLong, doc(junk)))).toDF("doc_id", "text")
    // train batch-side; weights broadcast into a stateless streaming scan
    val (w, trainScores) = graft.operators.TextAnalysis
      .qualityClassifierTrain(train, col("doc_id") <= 20)
    trainScores.collect()
    assert(w.nonEmpty)
    val input = MemoryStream[(Long, String)]
    val scored = graft.operators.TextAnalysis.scoreQualityWith(
      input.toDF().toDF("doc_id", "text"), w)
    assert(scored.isStreaming, "scorer must stay stateless/streaming-safe")
    val q = scored.writeStream.format("memory").queryName("stream_quality")
      .outputMode("append").start()
    try {
      input.addData((100L, doc(clean)), (101L, doc(junk)), (102L, "   "))
      q.processAllAvailable()
      val r = spark.table("stream_quality").collect()
        .map(x => x.getLong(0) -> x.getDouble(1)).toMap
      assert(r.keySet == Set(100L, 101L)) // empty text drops
      assert(r(100L) > r(101L), s"clean ${r(100L)} not above junk ${r(101L)}")
      // streaming scores equal the batch scorer on the same rows
      val batch = graft.operators.TextAnalysis.scoreQualityWith(
        Seq((100L, "x"), (101L, "y")).toDF("doc_id", "text"), w)
      assert(!batch.isStreaming)
    } finally q.stop()
  }


  test("html extraction applies to a stream unchanged (map-only, stateless)") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val extracted = graft.operators.TextAnalysis.extractHtmlText(
      input.toDF().toDF("doc_id", "html"))
    assert(extracted.isStreaming, "extraction must stay stateless")
    val q = extracted.writeStream.format("memory").queryName("stream_html")
      .outputMode("append").start()
    try {
      input.addData(
        (1L, "<html><body><nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
          "<p>Body prose long enough to keep around here.</p></body></html>"),
        (2L, "plain text with no markup that passes straight through"))
      q.processAllAvailable()
      val r = spark.table("stream_html").collect()
        .map(x => x.getLong(0) -> x.getString(1)).toMap
      assert(r(1L) == "Body prose long enough to keep around here.")
      assert(r(2L) == "plain text with no markup that passes straight through")
    } finally q.stop()
  }

}

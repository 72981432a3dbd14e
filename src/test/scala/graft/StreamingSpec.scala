package graft

import java.nio.file.Files

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.sources.Snapshot
import graft.streaming.EventStreams

/** Streaming twins vs their batch oracles, driven by file-source batches of
  * the real events table (memory sink + processAllAvailable).
  */
class StreamingSpec extends SparkSpecBase {
  import spark.implicits._

  private lazy val eventsDir: String = {
    // file stream source wants a directory; stage the events parquet into one
    val dir = Files.createTempDirectory("graft_events").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).events.write.mode("overwrite").parquet(dir.getAbsolutePath)
    dir.getAbsolutePath
  }

  test("streaming writes to a parquet sink with checkpointing") {
    val outDir = Files.createTempDirectory("graft_sink").toFile
    val ckDir = Files.createTempDirectory("graft_ck").toFile
    outDir.deleteOnExit(); ckDir.deleteOnExit()
    val batchDf = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(eventsDir)
    val q = stream.where($"event_type" === "purchase")
      .writeStream.format("parquet")
      .option("path", outDir.getAbsolutePath)
      .option("checkpointLocation", ckDir.getAbsolutePath)
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      val written = spark.read.parquet(outDir.getAbsolutePath)
      assert(written.count() == batchDf.where($"event_type" === "purchase").count())
    } finally q.stop()
  }

  test("stateless text operators run unchanged on a stream (quality filter)") {
    // pure column expressions need no state/watermark — the same TextStats
    // pipeline is streaming-safe as-is, which is the point of keeping the
    // text ops declarative
    val docsDir = Files.createTempDirectory("graft_docs").toFile
    docsDir.deleteOnExit()
    Snapshot(spark, sf()).documents.write.mode("overwrite").parquet(docsDir.getAbsolutePath)
    val batchDf = spark.read.parquet(docsDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema).parquet(docsDir.getAbsolutePath)
    val q = graft.operators.text.TextStats.qualityFilter(stream, "doc_id", "text", 0.5, 20L)
      .writeStream.outputMode("append").format("memory").queryName("sq").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sq").select("doc_id").as[Long].collect().toSet
      val want = graft.operators.text.TextStats
        .qualityFilter(batchDf, "doc_id", "text", 0.5, 20L)
        .select("doc_id").as[Long].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("round-8 text ops run unchanged on a stream (PII audit, URL canonical, BPE)") {
    // all three are pure per-row expressions (regex counts / string
    // splits / a static-JVM-call native expression) — no state, no
    // watermark, so a crawl-ingestion stream can scrub PII, canonicalize
    // URLs and count real tokens inline at the scan
    val docsDir = Files.createTempDirectory("graft_docs_r8").toFile
    docsDir.deleteOnExit()
    Snapshot(spark, sf()).documents
      .withColumn("url",
        concat(lit("HTTP://Example.COM:80/p"), ($"doc_id" % 13).cast("string"),
          lit("?utm_source=x&id=1#f")))
      .write.mode("overwrite").parquet(docsDir.getAbsolutePath)
    val batchDf = spark.read.parquet(docsDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema).parquet(docsDir.getAbsolutePath)
    // two independent single-pass projections (stateless scrubbing never
    // needs a join, and stream-stream joins would demand watermarks)
    val streamed = graft.operators.text.TextStats
      .piiAudit(stream.where($"text".isNotNull), "doc_id", "text")
      .select($"doc_id", $"n_redactions")
    val q = streamed.writeStream.outputMode("append").format("memory")
      .queryName("r8ops").start()
    val oneShot = stream.select($"doc_id",
      graft.operators.text.UrlTools.canonicalize($"url").as("cu"),
      graft.operators.text.Bpe.nTokens($"text").as("nb"))
      .writeStream.outputMode("append").format("memory").queryName("r8ops2").start()
    try {
      q.processAllAvailable(); oneShot.processAllAvailable()
      val gotPii = spark.table("r8ops").collect().map(_.toString).toSet
      val wantPii = graft.operators.text.TextStats
        .piiAudit(batchDf.where($"text".isNotNull), "doc_id", "text")
        .select($"doc_id", $"n_redactions").collect().map(_.toString).toSet
      assert(gotPii == wantPii && gotPii.nonEmpty)
      val gotRest = spark.table("r8ops2").collect().map(_.toString).toSet
      val wantRest = batchDf.select($"doc_id",
        graft.operators.text.UrlTools.canonicalize($"url").as("cu"),
        graft.operators.text.Bpe.nTokens($"text").as("nb"))
        .collect().map(_.toString).toSet
      assert(gotRest == wantRest && gotRest.nonEmpty)
    } finally { q.stop(); oneShot.stop() }
  }

  test("crawl-ingestion composition: canonicalize -> streaming dedup -> scrub (round 10)") {
    // the end-to-end crawl loop the round-8 verdict asked to close: three
    // messy variants per target URL (case/port/fragment/param-order/
    // tracking-param noise) arrive on a stream; canonicalization keys the
    // state-bounded dedup (dropDuplicatesWithinWatermark — D9's shape on
    // the canonical key instead of event_id), and the PII scrub runs
    // downstream of dedup in the SAME continuous query
    val dir = Files.createTempDirectory("graft_crawl").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).documents.where($"text".isNotNull).limit(100)
      .select($"doc_id", $"text", explode(array(
        concat(lit("HTTP://Example.COM:80/page/"), $"doc_id".cast("string"), lit("?b=2&a=1#frag")),
        concat(lit("http://example.com/page/"), $"doc_id".cast("string"), lit("?a=1&b=2&utm_source=x")),
        concat(lit("http://EXAMPLE.com:80/page/"), $"doc_id".cast("string"), lit("?utm_campaign=y&b=2&a=1")))).as("url"))
      .withColumn("ts", timestamp_seconds(lit(1700000000L) + $"doc_id"))
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)

    val stream = spark.readStream.schema(batchDf.schema).parquet(dir.getAbsolutePath)
    val deduped = stream
      .select(graft.operators.text.UrlTools.canonicalize($"url").as("curl"),
        $"text", $"ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("curl")
    val scrubbed = graft.operators.text.TextStats
      .piiAudit(deduped, "curl", "text")
      .select($"curl", $"n_redactions")
    val q = scrubbed.writeStream.outputMode("append").format("memory")
      .queryName("crawl").start()
    try {
      q.processAllAvailable()
      val got = spark.table("crawl").select("curl").as[String].collect().toSeq
      val want = batchDf
        .select(graft.operators.text.UrlTools.canonicalize($"url").as("curl"))
        .distinct().as[String].collect().toSeq
      // exactly one survivor per canonical URL, and the canonical key set
      // matches the batch derivation (the 3 messy variants collapse)
      assert(got.length == want.length && got.toSet == want.toSet && got.length == 100)
    } finally q.stop()
  }

  test("token chunking runs unchanged on a stream (stateless generator)") {
    // posexplode is stateless per row, so the chunker is streaming-safe
    // as-is: the ingestion pipeline can chunk documents into training
    // windows at arrival time, no batch rewrite
    val docsDir = Files.createTempDirectory("graft_chunk").toFile
    docsDir.deleteOnExit()
    Snapshot(spark, sf()).documents.write.mode("overwrite").parquet(docsDir.getAbsolutePath)
    val batchDf = spark.read.parquet(docsDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema).parquet(docsDir.getAbsolutePath)
    val q = graft.operators.text.Chunking.chunkByTokens(stream, "doc_id", "text", 32, 8)
      .writeStream.outputMode("append").format("memory").queryName("ck").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ck").select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Long, String)].collect().toSet
      val want = graft.operators.text.Chunking.chunkByTokens(batchDf, "doc_id", "text", 32, 8)
        .select("doc_id", "chunk_idx", "chunk_text")
        .as[(Long, Long, String)].collect().toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("stateless vector operators run unchanged on a stream (project + quantize)") {
    // the round-5 embedding ops are pure scan-fused expressions (literal
    // sign-matrix dots, elementwise int8 HOFs) — an ingestion pipeline
    // can project+quantize arriving embeddings with the batch code
    // verbatim, values bit-identical to the batch run
    val vecDir = Files.createTempDirectory("graft_vec").toFile
    vecDir.deleteOnExit()
    Snapshot(spark, sf()).embeddings.write.mode("overwrite").parquet(vecDir.getAbsolutePath)
    val batchDf = spark.read.parquet(vecDir.getAbsolutePath)
    def chain(df: org.apache.spark.sql.DataFrame) = {
      val p = graft.operators.ann.Projection
        .projectToVector(df, "embedding", 64, 16, "graft5", "proj")
      graft.operators.ann.Quantize.quantize(p, "proj")
        .select(col("vec_id"), col("q_scale"), col("q_vec"))
    }
    val stream = spark.readStream.schema(batchDf.schema).parquet(vecDir.getAbsolutePath)
    val q = chain(stream)
      .writeStream.outputMode("append").format("memory").queryName("vq").start()
    try {
      q.processAllAvailable()
      val got = spark.table("vq")
        .as[(Long, Double, Seq[Byte])].collect().map(r => (r._1, r._2, r._3.toList)).toSet
      val want = chain(batchDf)
        .as[(Long, Double, Seq[Byte])].collect().map(r => (r._1, r._2, r._3.toList)).toSet
      assert(got == want && got.nonEmpty)
    } finally q.stop()
  }

  test("stream-static broadcast join enriches events with dimension rows") {
    // stream-static joins need no watermark/state on the static side —
    // the standard shape for enriching a 100 TB event stream with dims
    val batchDf = spark.read.parquet(eventsDir)
    val users = batchDf.select($"user_id").distinct()
      .withColumn("tier", ($"user_id" % 3).cast("long"))
    val stream = spark.readStream.schema(batchDf.schema).parquet(eventsDir)
    val q = stream.join(broadcast(users), Seq("user_id"))
      .writeStream.outputMode("append").format("memory").queryName("ss_enrich").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ss_enrich")
      assert(got.count() == batchDf.count()) // every event matched its dim row
      assert(got.where($"tier" =!= $"user_id" % 3).isEmpty)
    } finally q.stop()
  }

  test("streaming hourly agg equals batch twin") {
    val batchDf = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(eventsDir)
    val q = EventStreams.hourlyAggStream(stream)
      .writeStream.outputMode("complete").format("memory").queryName("hourly").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly")
        .select("window_start", "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type").collect().toSeq
      val exp = EventStreams.hourlyAggBatch(batchDf).collect().toSeq
      assert(got == exp)
    } finally q.stop()
  }

  test("watermarked pipeline runs on NTZ-sourced events after normalization (round-5 regression shape)") {
    // The driver's regenerated testdata writes events.ts as
    // TIMESTAMP(MICROS, isAdjustedToUTC=false) → Spark reads
    // TIMESTAMP_NTZ, which watermarks reject outright
    // (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE). This stages events in that
    // exact encoding, applies the same cast Snapshot normalizes with,
    // and proves the watermarked agg still equals its batch twin.
    val ntzDir = Files.createTempDirectory("graft_events_ntz").toFile
    ntzDir.deleteOnExit()
    Snapshot(spark, sf()).events
      .withColumn("ts", $"ts".cast("timestamp_ntz"))
      .write.mode("overwrite").parquet(ntzDir.getAbsolutePath)
    val rawBatch = spark.read.parquet(ntzDir.getAbsolutePath)
    assert(rawBatch.schema("ts").dataType ==
      org.apache.spark.sql.types.TimestampNTZType,
      "staging did not reproduce the NTZ encoding")
    def normalize(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("ts", $"ts".cast("timestamp")) // value-identical under pinned UTC
    val stream = spark.readStream.schema(rawBatch.schema).parquet(ntzDir.getAbsolutePath)
    val q = EventStreams.hourlyAggStream(normalize(stream))
      .writeStream.outputMode("complete").format("memory").queryName("hourly_ntz").start()
    try {
      q.processAllAvailable()
      val got = spark.table("hourly_ntz")
        .select("window_start", "event_type", "n_events", "total_value")
        .orderBy("window_start", "event_type").collect().toSeq
      val exp = EventStreams.hourlyAggBatch(normalize(rawBatch)).collect().toSeq
      assert(got == exp && got.nonEmpty)
      // and the normalized batch equals the Snapshot-normalized original:
      // the cast changed encoding only, not values
      val orig = EventStreams.hourlyAggBatch(Snapshot(spark, sf()).events).collect().toSeq
      assert(exp == orig)
    } finally q.stop()
  }

  test("streaming dedup drops reprocessed event ids") {
    val batchDf = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(eventsDir)
    val q = EventStreams.dedupStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("deduped").start()
    try {
      q.processAllAvailable()
      assert(spark.table("deduped").count() ==
        batchDf.select("event_id").distinct().count())
    } finally q.stop()
  }

  test("checkpoint restart: dedup state survives a kill — replays dropped, no loss, no duplicates") {
    // The failure mode a 100 TB ingest actually has: the query dies with
    // input pending, restarts from its checkpoint, and upstream re-delivers
    // rows it already processed. Every ts sits inside one 10-minute span so
    // the 1h watermark can never drop the replays as late — only RESTORED
    // dedup state can reject them.
    val src = Files.createTempDirectory("graft_rs_src").toFile
    val out = Files.createTempDirectory("graft_rs_out").toFile
    val ck = Files.createTempDirectory("graft_rs_ck").toFile
    Seq(src, out, ck).foreach(_.deleteOnExit())
    def ev(ids: Range, t: String) = ids.map(i =>
      (i.toLong, i.toLong % 50, "click", java.sql.Timestamp.valueOf(t), i * 1.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val phase1 = ev(0 until 500, "2024-03-01 10:00:00")
    phase1.write.mode("overwrite").parquet(src.getAbsolutePath)
    def startQuery() = EventStreams
      .dedupStream(spark.readStream.schema(phase1.schema).parquet(src.getAbsolutePath))
      .writeStream.format("parquet")
      .option("path", out.getAbsolutePath)
      .option("checkpointLocation", ck.getAbsolutePath)
      .outputMode("append").start()
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // the query is DOWN; more input lands: a verbatim replay of phase 1
    // plus genuinely new ids, all within the watermark window
    ev(0 until 500, "2024-03-01 10:05:00").unionByName(ev(500 until 1000, "2024-03-01 10:05:00"))
      .write.mode("append").parquet(src.getAbsolutePath)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out.getAbsolutePath).select($"event_id".cast("long")).as[Long].collect().toSeq
    assert(got.length == 1000, s"want 1000 deduped rows, got ${got.length}")
    assert(got.toSet == (0L until 1000L).toSet, "every id exactly once, none lost")
  }

  test("checkpoint restart: watermarked agg merges pre- and post-kill rows into one window") {
    // A window OPEN at the kill must accumulate rows from both lives of the
    // query and emit ONCE with the merged count — that only works if the agg
    // state store is restored from the checkpoint.
    val src = Files.createTempDirectory("graft_ra_src").toFile
    val out = Files.createTempDirectory("graft_ra_out").toFile
    val ck = Files.createTempDirectory("graft_ra_ck").toFile
    Seq(src, out, ck).foreach(_.deleteOnExit())
    def ev(id: Long, t: String, typ: String = "click") =
      (id, id % 50, typ, java.sql.Timestamp.valueOf(t), 1.5)
    val phase1 = Seq(
      ev(1, "2024-03-01 10:05:00"), ev(2, "2024-03-01 10:30:00"), // H10 window
      ev(3, "2024-03-01 11:05:00")                                // H11, stays open
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    phase1.write.mode("overwrite").parquet(src.getAbsolutePath)
    def startQuery() = EventStreams
      .hourlyAggStream(spark.readStream.schema(phase1.schema).parquet(src.getAbsolutePath))
      .writeStream.format("parquet")
      .option("path", out.getAbsolutePath)
      .option("checkpointLocation", ck.getAbsolutePath)
      .outputMode("append").start()
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()
    // watermark after phase 1 = 11:05 - 10min < 11:00 → NOTHING emitted yet;
    // while the query is down, H11 gains a second row and a sentinel lands
    // far enough ahead to close H10 and H11 after the restart
    Seq(ev(4, "2024-03-01 11:20:00"), ev(99, "2024-03-01 14:00:00", "sentinel"))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
      .write.mode("append").parquet(src.getAbsolutePath)
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(out.getAbsolutePath)
      .select($"window_start".cast("string"), $"event_type", $"n_events".cast("long"))
      .orderBy("window_start").collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    // exactly the two closed windows, each exactly once; H11's count = 2
    // merges one row from before the kill with one from after it
    assert(got == Seq(
      ("2024-03-01 10:00:00", "click", 2L),
      ("2024-03-01 11:00:00", "click", 2L)), s"got $got")
  }

  test("stream-stream purchase attribution matches batch join") {
    val batchDf = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(eventsDir)
    val q = EventStreams.purchaseAttributionStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("attrib").start()
    try {
      q.processAllAvailable()
      val got = spark.table("attrib").count()
      val exp = EventStreams.purchaseAttributionStream(batchDf).count()
      assert(got == exp, s"stream $got != batch $exp")
      assert(exp > 0, "attribution join should match at least one pair in testdata")
    } finally q.stop()
  }

  test("sliding-window rates: stream equals batch, four windows per event") {
    val batchDf = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(eventsDir)
    val q = EventStreams.slidingRatesStream(stream)
      .writeStream.outputMode("complete").format("memory").queryName("sliding").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sliding").orderBy("window_start", "event_type").collect().toSeq
      val exp = EventStreams.slidingRates(batchDf)
        .orderBy("window_start", "event_type").collect().toSeq
      assert(got == exp)
      // overlap invariant: total window memberships = 4x event count
      val total = spark.table("sliding").agg(sum("n_events")).head().getLong(0)
      assert(total == batchDf.count() * 4)
    } finally q.stop()
  }

  test("foreachBatch sink: custom per-batch upsert receives every row once") {
    val batchDf = spark.read.parquet(eventsDir)
    val stream = spark.readStream.schema(batchDf.schema).parquet(eventsDir)
    val seen = new java.util.concurrent.atomic.AtomicLong(0)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        // a real sink would MERGE INTO here; count stands in for the upsert
        seen.addAndGet(batch.count())
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      assert(seen.get() == batchDf.count())
    } finally q.stop()
  }

  test("incremental rollup via foreachBatch: merged state equals the batch aggregate") {
    // B51 lifted onto the stream — the lambda-free rollup seam: each
    // microbatch MERGES into the standing group-grain state
    // (IncrementalAgg.merge), so the corpus is never rescanned and the
    // state after the last batch must equal the from-scratch aggregate
    // over everything. foreachBatch runs on the driver; the state
    // var stands in for the table a real sink would MERGE INTO.
    // localCheckpoint caps lineage growth across batches (the
    // TransitiveDedup iteration rule).
    import graft.operators.agg.IncrementalAgg
    // stage a MULTI-file copy: maxFilesPerTrigger=1 then yields one
    // microbatch per file, so the merge path actually runs
    val multiDir = Files.createTempDirectory("graft_rollup").toFile
    multiDir.deleteOnExit()
    Snapshot(spark, sf()).events.repartition(4)
      .write.mode("overwrite").parquet(multiDir.getAbsolutePath)
    val batchDf = spark.read.parquet(multiDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(multiDir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = state match {
          case None => IncrementalAgg.aggregate(batch, Seq("event_type"), col("value"))
          case Some(st) => IncrementalAgg.merge(st, batch, Seq("event_type"), col("value"))
        }
        state = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches to exercise merge, got ${nBatches.get()}")
    val scratch = IncrementalAgg.aggregate(batchDf, Seq("event_type"), col("value"))
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select($"event_type", $"n_rows", $"sum_value".cast("double"),
        $"min_value", $"max_value").collect().map(_.toString).toSeq.sorted
    assert(canon(state.get) == canon(scratch))
  }

  test("streaming vector-index maintenance: foreachBatch appends == one-shot batch append (D16)") {
    // Continuous ingestion into a saved IVF index: seed an index on a
    // third of the corpus (BOTH representations — float and int8), then
    // stream the remainder through IvfKNN.appendSink one file-microbatch
    // at a time. Post-stream index contents must equal a single
    // appendToSaved over the same rows (assignment is map-only and the
    // quantizer frozen, so batch boundaries are invisible), and a search
    // over the streamed index must find appended vectors exactly.
    import graft.operators.ann.IvfKNN
    val vecs = Snapshot(spark, sf()).embeddings.where($"embedding".isNotNull)
    val seed = vecs.where($"vec_id" % 3 === 0)
    val rest = vecs.where($"vec_id" % 3 =!= 0)
    val index = IvfKNN.buildIndex(seed, "vec_id", "embedding", nLists = 8, iters = 2)
    val dirA = Files.createTempDirectory("graft_ivf_stream").toFile // streamed appends
    val dirB = Files.createTempDirectory("graft_ivf_batch").toFile // one-shot append
    Seq(dirA, dirB).foreach { d =>
      IvfKNN.save(index, d.getAbsolutePath)
      IvfKNN.saveQuantized(index, d.getAbsolutePath)
    }
    index.assigned.unpersist(false)
    val multiDir = Files.createTempDirectory("graft_ivf_feed").toFile
    multiDir.deleteOnExit()
    rest.repartition(4).write.mode("overwrite").parquet(multiDir.getAbsolutePath)
    val batchDf = spark.read.parquet(multiDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(multiDir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val sink = IvfKNN.appendSink(spark, dirA.getAbsolutePath, "vec_id", "embedding")
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        nBatches.incrementAndGet(); sink(b, id)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    IvfKNN.appendToSaved(spark, dirB.getAbsolutePath, batchDf, "vec_id", "embedding")
    // full-content identity of BOTH representations
    def canonF(d: java.io.File) = spark.read.parquet(d.getAbsolutePath + "/assigned")
      .select($"neighbor_id", $"cell_id".cast("long"), $"__cv")
      .collect().map(_.toString).sorted.toSeq
    def canonQ(d: java.io.File) = spark.read.parquet(d.getAbsolutePath + "/assigned_q")
      .select($"neighbor_id", $"cell_id".cast("long"), $"__qs", $"__qv")
      .collect().map(_.toString).sorted.toSeq
    assert(canonF(dirA) == canonF(dirB))
    assert(canonQ(dirA) == canonQ(dirB))
    // end-to-end: appended vectors are findable in the streamed index at
    // sim ~ 1 (nProbe == nLists => the probe set is exhaustive)
    val loaded = IvfKNN.load(spark, dirA.getAbsolutePath)
    val queries = rest.limit(5).select($"vec_id", $"embedding")
    val hits = IvfKNN.search(loaded, queries, "vec_id", "embedding",
      k = 1, nProbe = 8, excludeSelf = false)
    val self = hits.where($"neighbor_id" === $"query_id" && $"sim" >= 0.999).count()
    assert(self == 5L)
  }

  test("streaming near-dup index maintenance: foreachBatch appends == one-shot append (D18)") {
    // Continuous ingestion into the saved MinHash near-dup store (the
    // D16 shape on text): seed from a third of the corpus, stream the
    // remainder through MinHashIndex.appendSink one file-microbatch at
    // a time. Post-stream store contents must equal a single append
    // over the same rows (shingling/banding are per-row deterministic
    // and the layout frozen in meta, so batch boundaries are
    // invisible), and a probe over the streamed store must find a
    // planted cross-batch twin.
    import graft.operators.dedup.MinHashIndex
    val docs = Snapshot(spark, sf()).documents.where($"text".isNotNull)
      .select($"doc_id", $"text").localCheckpoint(true)
    val seed = docs.where($"doc_id" % 3 === 0)
    val rest = docs.where($"doc_id" % 3 =!= 0)
      // planted twin of a SEED doc arriving on the stream
      .unionByName(seed.limit(1).select(($"doc_id" + 5000000L).as("doc_id"), $"text"))
    val dirA = Files.createTempDirectory("graft_mhidx_stream").toFile
    val dirB = Files.createTempDirectory("graft_mhidx_batch").toFile
    val store = MinHashIndex.build(seed, "doc_id", "text", nBuckets = 16)
    Seq(dirA, dirB).foreach(d => MinHashIndex.save(store, d.getAbsolutePath))
    store.shingleSets.unpersist(false)

    val feed = Files.createTempDirectory("graft_mhidx_feed").toFile
    feed.deleteOnExit()
    rest.repartition(4).write.mode("overwrite").parquet(feed.getAbsolutePath)
    val batchDf = spark.read.parquet(feed.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(feed.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val sink = MinHashIndex.appendSink(spark, dirA.getAbsolutePath, "doc_id", "text")
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        nBatches.incrementAndGet(); sink(b, id)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    MinHashIndex.append(spark, dirB.getAbsolutePath, batchDf, "doc_id", "text")

    // full-content identity of all three representations
    def canon(d: java.io.File, sub: String, cols: Seq[String]) =
      spark.read.parquet(d.getAbsolutePath + "/" + sub)
        .select(cols.map(c => col(c)): _*)
        .collect().map(_.toString).sorted.toSeq
    assert(canon(dirA, "shingles", Seq("id", "sh")) ==
      canon(dirB, "shingles", Seq("id", "sh")))
    assert(canon(dirA, "shingle_postings", Seq("s", "id", "bucket")) ==
      canon(dirB, "shingle_postings", Seq("s", "id", "bucket")))
    assert(canon(dirA, "band_postings", Seq("band", "bucket", "id", "pbucket")) ==
      canon(dirB, "band_postings", Seq("band", "bucket", "id", "pbucket")))

    // end-to-end: the streamed store knows the planted cross-batch twin
    val loaded = MinHashIndex.load(spark, dirA.getAbsolutePath)
    val probe = seed.limit(1).select(($"doc_id" + 9900000L).as("doc_id"), $"text")
    val found = MinHashIndex.probeExact(loaded, probe, "doc_id", "text", 0.99)
      .where($"jaccard" === 1.0).count()
    // matches BOTH the original seed doc and its streamed twin (plus any
    // natural exact dups of that doc)
    assert(found >= 2L, s"expected >= 2 exact matches, got $found")
  }

  test("streaming semantic-dedup maintenance: per-batch dedup+append == one-shot dedupeSemantic (D39)") {
    // C82 lifted onto the stream (VERDICT r15 #5): newly ingested
    // embeddings dedup against the SAVED IVF index of the already-kept
    // corpus (frozen quantizer, probed cells only) and only survivors
    // append — batch-vs-corpus semantic near-dup without re-clustering.
    // The one-shot comparator assigns the union with the SAME frozen
    // centroids, so cell membership is identical in both paths and the
    // survivor sets must be EQUAL on this chain-free plant (the one
    // declared divergence — a cross-batch chain through a dropped row —
    // is deliberately absent; disjoint supports keep cross-family
    // cosines at 0). Batch files carry forced modTimes so arrival order
    // is pinned (FileStreamSource is oldest-first).
    import graft.operators.ann.IvfKNN
    import graft.operators.dedup.EmbeddingDedup
    val dim = 32
    def vec(support: Int, a: Double, b: Double): Seq[Double] =
      Seq.tabulate(dim)(i =>
        if (i == 2 * support) a else if (i == 2 * support + 1) b else 0.0)
    // initial corpus: duplicate-free by construction (8 distinct supports)
    val initial = (0 until 8).map(j => (j.toLong, vec(j, 0.8, 0.6), 2.0))
    // batch 1: an exact copy of id 0 (drops), a NEW vector (survives +
    // appends), a cos-0.96 near twin of id 1 (both paths see the same
    // cell, so they agree whether it merges or straddles), and a
    // within-batch exact twin pair (keep-best keeps the 3.0 score)
    val batch1 = Seq(
      (100L, vec(0, 0.8, 0.6), 1.0),
      (101L, vec(8, 0.8, 0.6), 2.0),
      (102L, vec(1, 0.6, 0.8), 1.0),
      (103L, vec(9, 0.8, 0.6), 1.0),
      (104L, vec(9, 0.8, 0.6), 3.0))
    // batch 2: cross-batch twins of batch-1 SURVIVORS (200 vs 101, 201 vs
    // the appended 104) must drop against the maintained index; a new
    // unique survives
    val batch2 = Seq(
      (200L, vec(8, 0.8, 0.6), 1.0),
      (201L, vec(9, 0.8, 0.6), 1.0),
      (202L, vec(10, 0.8, 0.6), 2.0))
    val initialDf = initial.toDF("vec_id", "embedding", "score")
    val unionDf = (initial ++ batch1 ++ batch2).toDF("vec_id", "embedding", "score")
    val seedIndex = IvfKNN.buildIndex(initialDf, "vec_id", "embedding", nLists = 4, iters = 2)
    val dir = Files.createTempDirectory("graft_semdedup_idx").toFile
    dir.deleteOnExit()
    IvfKNN.save(seedIndex, dir.getAbsolutePath)
    val feed = Files.createTempDirectory("graft_semdedup_feed").toFile
    feed.deleteOnExit()
    Seq(batch1, batch2).zipWithIndex.foreach { case (bdata, i) =>
      val stage = new java.io.File(feed, s"stage$i")
      bdata.toDF("vec_id", "embedding", "score")
        .coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(feed, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
      stage.listFiles().foreach(_.delete()); stage.delete(); ()
    }
    val batchDf = spark.read.parquet(feed.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(feed.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val sink = EmbeddingDedup.semanticDedupSink(
      spark, dir.getAbsolutePath, "vec_id", "embedding", col("score"), 0.4)
    val q = stream.writeStream
      .foreachBatch { (b: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        nBatches.incrementAndGet(); sink(b, id)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() >= 2, s"need multiple microbatches, got ${nBatches.get()}")
    // the index at rest IS the deduped corpus
    val streamed = IvfKNN.load(spark, dir.getAbsolutePath).assigned
      .select($"neighbor_id").as[Long].collect().toSet
    val oneShot = EmbeddingDedup.dedupeSemantic(
      unionDf, "vec_id", "embedding", col("score"), 0.4, nAssign = 1,
      prebuilt = Some(IvfKNN.Index(seedIndex.centroids,
        IvfKNN.assign(
          unionDf.select($"vec_id".as("neighbor_id"), $"embedding".as("__cv")),
          "__cv", seedIndex.centroids))))
      .select($"vec_id").as[Long].collect().toSet
    assert(streamed == oneShot,
      s"streamed ${streamed.toSeq.sorted} vs one-shot ${oneShot.toSeq.sorted}")
    // planted cross-batch twins found; new uniques and keep-best winners kept
    assert(!streamed(100L) && !streamed(103L) && !streamed(200L) && !streamed(201L))
    assert(streamed(101L) && streamed(104L) && streamed(202L))
  }

  test("streaming drift monitor: merged bin-count state yields the exact batch PSI report") {
    // B54 lifted onto the stream (D15): a drift monitor never keeps raw
    // rows — it keeps (bin, n) counts against the FROZEN baseline bins
    // and folds each microbatch in by addition (bin counts are
    // associative state, the D14/IncrementalAgg argument). The PSI
    // derived from the merged state must equal the batch audit over all
    // rows BIT-EXACTLY, because psiFromCounts is the identical
    // arithmetic psiByBins hashes.
    import graft.operators.stats.Drift
    val orders = Snapshot(spark, sf()).orders
    val base = orders.where($"o_orderkey" % 2 === 0)
    val curAll = orders.where($"o_orderkey" % 2 === 1)
    val multiDir = Files.createTempDirectory("graft_drift").toFile
    multiDir.deleteOnExit()
    curAll.repartition(4).write.mode("overwrite").parquet(multiDir.getAbsolutePath)
    val batchDf = spark.read.parquet(multiDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(multiDir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val counts = Drift.binCounts(base, batch, "o_totalprice")
        val next = state match {
          case None => counts
          case Some(st) => st.unionByName(counts).groupBy("bin").agg(sum($"n").as("n"))
        }
        state = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches to exercise merge, got ${nBatches.get()}")
    val viaState = Drift
      .psiFromCounts(Drift.binCounts(base, base, "o_totalprice"), state.get)
    val viaBatch = Drift.psiByBins(base, spark.read.parquet(multiDir.getAbsolutePath),
      "o_totalprice")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(viaState) == canon(viaBatch))
  }

  test("streaming distinct-count monitor: merged HLL state equals the one-shot batch estimate") {
    // D19: the D15 shape applied to cardinality — the monitor keeps one
    // mergeable HLL sketch per (event_type, day) and folds each
    // microbatch in by register-max union. Union is commutative and
    // associative, so the merged registers equal the one-shot batch
    // sketch exactly and the estimates are EQUAL, not merely close;
    // at this SF the sketches stay sparse, so the estimates also equal
    // the exact distinct counts (both asserted).
    import graft.operators.window.RunningDistinct
    val events = Snapshot(spark, sf()).events
      .select($"event_type", date_trunc("day", $"ts").as("period"), $"user_id")
    val dir = Files.createTempDirectory("graft_distinct_monitor").toFile
    dir.deleteOnExit()
    events.repartition(4).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val delta = RunningDistinct.periodSketches(
          batch, Seq("event_type"), "period", "user_id")
        val next = state match {
          case None => delta
          case Some(st) =>
            RunningDistinct.mergeSketchStates(st, delta, Seq("event_type"), "period")
        }
        state = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val viaState = RunningDistinct.estimateSketches(state.get, "distinct_users")
    val viaBatch = RunningDistinct.estimateSketches(
      RunningDistinct.periodSketches(
        spark.read.parquet(dir.getAbsolutePath), Seq("event_type"), "period", "user_id"),
      "distinct_users")
    assert(canon(viaState) == canon(viaBatch))
    // sparse-mode exactness at this SF: the monitor reports true counts
    val exact = batchDf
      .where($"event_type".isNotNull && $"period".isNotNull && $"user_id".isNotNull)
      .groupBy("event_type", "period")
      .agg(countDistinct($"user_id").as("distinct_users"))
    assert(canon(viaState.select($"event_type", $"period", $"distinct_users")) ==
      canon(exact.select($"event_type", $"period", $"distinct_users")))
  }

  test("streaming CUSUM monitor: resumed sequential state equals the one-shot fold") {
    // D20: B74 lifted onto the stream. CUSUM state is a sequential fold
    // (NOT associative — the D14 merge argument does not apply), so the
    // streaming contract is stricter: batches must be TIME-PARTITIONED
    // per key. Staged here as date-range files with forced modTimes
    // (FileStreamSource processes oldest-first), cut on DISTINCT dates
    // so equal order timestamps never straddle a file; after the last
    // microbatch the resumed state must equal the one-shot fold over
    // everything FULL-ROW (n_points, final, peak, alarm), bit for bit.
    import graft.operators.temporal.Cusum
    val keyArgs = Seq("o_custkey")
    val orders = Snapshot(spark, sf()).orders
      .where($"o_custkey".isNotNull && $"o_orderdate".isNotNull &&
        $"o_orderkey".isNotNull && $"o_totalprice".isNotNull)
    val dates = orders.select($"o_orderdate").distinct().orderBy($"o_orderdate")
      .collect().map(_.getAs[Any](0)) // NTZ parquet surfaces LocalDateTime
    val (c1, c2) = (dates(dates.length / 3), dates(2 * dates.length / 3))
    val dir = Files.createTempDirectory("graft_cusum_stream").toFile
    dir.deleteOnExit()
    val slices = Seq(
      orders.where($"o_orderdate" < lit(c1)),
      orders.where($"o_orderdate" >= lit(c1) && $"o_orderdate" < lit(c2)),
      orders.where($"o_orderdate" >= lit(c2)))
    slices.zipWithIndex.foreach { case (s, i) =>
      val stage = new java.io.File(dir, s"stage$i")
      s.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
      stage.listFiles().foreach(_.delete()); stage.delete(); ()
    }
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var state = Cusum.perKeyCusum(orders.limit(0), keyArgs,
      "o_orderdate", "o_orderkey", "o_totalprice", 300000.0, 400000.0)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        state = Cusum.resume(batch, keyArgs, "o_orderdate", "o_orderkey",
          "o_totalprice", 300000.0, 400000.0, state).localCheckpoint(true)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() == 3, s"expected 3 time-ordered microbatches, got ${nBatches.get()}")
    val oneShot = Cusum.perKeyCusum(batchDf, keyArgs,
      "o_orderdate", "o_orderkey", "o_totalprice", 300000.0, 400000.0)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(state) == canon(oneShot))
    // non-vacuous: both alarm states are present in the final report
    assert(state.select("alarm").distinct().count() == 2)
  }

  test("streaming Page-Hinkley monitor: resumed sequential state equals the one-shot fold (D43)") {
    // D43: B155 lifted onto the stream — the D20 shape exactly (the PH
    // walk is a sequential fold, NOT associative, so batches must be
    // TIME-PARTITIONED per key; staged as date-range files with forced
    // modTimes, cut on distinct dates). The state carries the raw
    // [m, delayed-min, sum] slots; pageHinkleyReport (ONE definition —
    // the batch row IS report(state(df))) closes them, and after the
    // last microbatch the resumed report must equal the one-shot
    // FULL-ROW, bit for bit.
    import graft.operators.temporal.Cusum
    val keyArgs = Seq("o_custkey")
    val orders = Snapshot(spark, sf()).orders
      .where($"o_custkey".isNotNull && $"o_orderdate".isNotNull &&
        $"o_orderkey".isNotNull && $"o_totalprice".isNotNull)
    val dates = orders.select($"o_orderdate").distinct().orderBy($"o_orderdate")
      .collect().map(_.getAs[Any](0))
    val (c1, c2) = (dates(dates.length / 3), dates(2 * dates.length / 3))
    val dir = Files.createTempDirectory("graft_ph_stream").toFile
    dir.deleteOnExit()
    val slices = Seq(
      orders.where($"o_orderdate" < lit(c1)),
      orders.where($"o_orderdate" >= lit(c1) && $"o_orderdate" < lit(c2)),
      orders.where($"o_orderdate" >= lit(c2)))
    slices.zipWithIndex.foreach { case (s, i) =>
      val stage = new java.io.File(dir, s"stage$i")
      s.coalesce(1).write.mode("overwrite").parquet(stage.getAbsolutePath)
      val part = stage.listFiles().filter(_.getName.endsWith(".parquet")).head
      val target = new java.io.File(dir, f"batch_$i%02d.parquet")
      java.nio.file.Files.move(part.toPath, target.toPath)
      assert(target.setLastModified(1700000000000L + i * 60000L))
      stage.listFiles().foreach(_.delete()); stage.delete(); ()
    }
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var state = Cusum.pageHinkleyState(orders.limit(0), keyArgs,
      "o_orderdate", "o_orderkey", "o_totalprice", 0.0)
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        state = Cusum.pageHinkleyResume(batch, keyArgs, "o_orderdate",
          "o_orderkey", "o_totalprice", 0.0, state).localCheckpoint(true)
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() == 3, s"expected 3 time-ordered microbatches, got ${nBatches.get()}")
    val oneShot = Cusum.pageHinkley(batchDf, keyArgs,
      "o_orderdate", "o_orderkey", "o_totalprice", 0.0, 250000.0)
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(Cusum.pageHinkleyReport(state, 250000.0)) == canon(oneShot))
    // non-vacuous: both alarm states present
    assert(oneShot.select("alarm").distinct().count() == 2)
  }

  test("streaming time-to-event subject state: merged min/max state equals the batch subjects (D21)") {
    // D21: B77's subject state lifted onto the stream — the D14 shape.
    // Every field of Survival.subjects is an ASSOCIATIVE min/max
    // (conditional min included: NULL tp = "no qualifying event yet",
    // and min ignores NULLs), so each microbatch merges into the
    // standing user-grain state without rescanning history, and the
    // final state — plus the full KM curve built from it — must equal
    // the one-shot batch computation exactly. Unordered microbatches
    // on purpose: unlike CUSUM (D20), no time-partitioning contract.
    import graft.operators.stats.Survival
    val qualifying = $"event_type" === "purchase" && $"value" >= 150.0
    def subj(df: org.apache.spark.sql.DataFrame) =
      Survival.subjects(df, "user_id", "ts", "event_id", "event_type", qualifying)
    val multiDir = Files.createTempDirectory("graft_surv_stream").toFile
    multiDir.deleteOnExit()
    Snapshot(spark, sf()).events.repartition(4)
      .write.mode("overwrite").parquet(multiDir.getAbsolutePath)
    val batchDf = spark.read.parquet(multiDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(multiDir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var state: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = state match {
          case None => subj(batch)
          case Some(st) => Survival.mergeSubjects(st, subj(batch))
        }
        state = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches to exercise merge, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select($"user_id", $"t0", $"tp", $"tl", $"fs.label")
        .collect().map(_.toString).toSeq.sorted
    assert(canon(state.get) == canon(subj(batchDf)))
    // and the curve downstream of the merged state is the batch curve
    def curve(st: org.apache.spark.sql.DataFrame) = Survival.kaplanMeier(
      st.select($"fs.label".as("first_type"),
        expr("(unix_micros(coalesce(tp, tl)) - unix_micros(t0)) div 3600000000").as("t_hours"),
        $"tp".isNotNull.as("observed")),
      Seq("first_type"), "t_hours", "observed")
    assert(curve(state.get).collect().map(_.toString).sorted.toSeq ==
      curve(subj(batchDf)).collect().map(_.toString).sorted.toSeq)
  }

  test("streaming trend state: merged bounded-series state reproduces the batch Mann-Kendall (D22)") {
    // D22: B78's trend test maintained under streaming ingestion — the
    // D21 shape. State = the per-key series itself (bounded by the
    // bounded-series contract); merge = multiset union, so UNORDERED
    // microbatches are fine (mannKendallFromState sorts); the recompute
    // from merged state must equal the one-shot batch test EXACTLY.
    import graft.operators.temporal.Trend
    def state(df: org.apache.spark.sql.DataFrame) =
      Trend.seriesState(df, Seq("user_id"), "ts", "event_id", "value")
    val dir = Files.createTempDirectory("graft_trend_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).events.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = st match {
          case None => state(batch)
          case Some(prev) => Trend.mergeSeriesState(prev, state(batch))
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(Trend.mannKendallFromState(st.get, Seq("user_id")))
    val oneShot = canon(Trend.mannKendall(
      batchDf, Seq("user_id"), "ts", "event_id", "value"))
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming changepoint state: merged series state reproduces the batch AMOC (D24)") {
    // D24: B93's change-point detector maintained under streaming
    // ingestion — the D22 shape VERBATIM: the carried state IS
    // Trend.seriesState (shared multiset contract), merge unordered,
    // recompute from merged state == one-shot batch exactly.
    import graft.operators.temporal.{Changepoint, Trend}
    def state(df: org.apache.spark.sql.DataFrame) =
      Trend.seriesState(df, Seq("o_custkey"), "o_orderdate", "o_orderkey",
        "o_totalprice")
    val dir = Files.createTempDirectory("graft_cp_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = st match {
          case None => state(batch)
          case Some(prev) => Trend.mergeSeriesState(prev, state(batch))
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(Changepoint.amocFromState(st.get, Seq("o_custkey")))
    val oneShot = canon(Changepoint.amocByKey(
      batchDf, Seq("o_custkey"), "o_orderdate", "o_orderkey", "o_totalprice"))
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming moments state: merged power sums reproduce the batch moments (D25)") {
    // D25: B95's moments maintained under streaming ingestion via the
    // D14/IncrementalAgg shape — state = per-group (n, exact decimal
    // power sums), field-wise associative merge, ONE shared derivation
    // (deriveMoments) so state-maintained == one-shot EXACTLY.
    import graft.operators.stats.Stats
    def state(df: org.apache.spark.sql.DataFrame) =
      Stats.momentsState(df, "l_returnflag", "l_quantity")
    val dir = Files.createTempDirectory("graft_moments_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).lineitem.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = st match {
          case None => state(batch)
          case Some(prev) => Stats.mergeMomentsState(prev, state(batch))
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(Stats.momentsFromState(st.get))
    val oneShot = canon(Stats.momentsByGroup(batchDf, "l_returnflag", "l_quantity"))
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming calibration monitor: merged cells reproduce the batch ECE table (D40)") {
    // D40: B145's calibration maintained under streaming ingestion —
    // state = per-bin (n, pos, decimal-exact score sum), field-wise
    // associative merge, ONE shared derivation (eceFromCells) so
    // state-maintained == one-shot EXACTLY, decimal confidence sums
    // included. Score/label derive per microbatch with the embedded
    // model (pure map — the D25 shape on the classifier grain).
    import graft.operators.stats.Calibration
    import graft.operators.text.{QualityClassifier, TextStats}
    def scoredLabeled(df: org.apache.spark.sql.DataFrame) = {
      val scored = QualityClassifier.scoreWithModel(df, "doc_id", "text",
        SparkEntry.qualityModelWeights, SparkEntry.qualityModelBias)
        .select("doc_id", "score")
      val ws = QualityClassifier.tokens(col("text"))
      val lab = df.where(col("text").isNotNull)
        .select(col("doc_id"), ws.as("__ws"))
        .where(size(col("__ws")) > 0)
        .select(col("doc_id"),
          (size(filter(col("__ws"), w => w.isInCollection(TextStats.Markers.head._2)))
            .cast("double") / size(col("__ws")).cast("double") >= 0.05).as("lbl"))
      scored.join(lab, "doc_id")
    }
    def cells(df: org.apache.spark.sql.DataFrame) =
      Calibration.calibrationCells(scoredLabeled(df), col("score"), col("lbl"))
    val dir = Files.createTempDirectory("graft_calib_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).documents.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = st match {
          case None => cells(batch)
          case Some(prev) => Calibration.mergeCalibrationCells(prev, cells(batch))
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(Calibration.eceFromCells(st.get))
    val oneShot = canon(Calibration.ece(scoredLabeled(batchDf), col("score"), col("lbl")))
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming score-grid state: merged cells reproduce batch log loss and PR curve (D41)") {
    // D41: the finer score/label state — (score, n, pos) cells at the
    // rounded-4 grid, merge = addition, and BOTH derivations
    // (logLossFromCells, prCurveFromCells) are the very definitions the
    // batch B149/B150 rows use, so state-maintained == one-shot is
    // structural; the spec pins it bit-for-bit including the audited
    // rounded log_loss and the unrounded PR rates.
    import graft.operators.stats.Calibration
    import graft.operators.text.{QualityClassifier, TextStats}
    def scoredLabeled(df: org.apache.spark.sql.DataFrame) = {
      val scored = QualityClassifier.scoreWithModel(df, "doc_id", "text",
        SparkEntry.qualityModelWeights, SparkEntry.qualityModelBias)
        .select("doc_id", "score")
      val ws = QualityClassifier.tokens(col("text"))
      val lab = df.where(col("text").isNotNull)
        .select(col("doc_id"), ws.as("__ws"))
        .where(size(col("__ws")) > 0)
        .select(col("doc_id"),
          (size(filter(col("__ws"), w => w.isInCollection(TextStats.Markers.head._2)))
            .cast("double") / size(col("__ws")).cast("double") >= 0.05).as("lbl"))
      scored.join(lab, "doc_id")
    }
    def cells(df: org.apache.spark.sql.DataFrame) =
      Calibration.scoreCells(scoredLabeled(df), col("score"), col("lbl"))
    val dir = Files.createTempDirectory("graft_scorecell_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).documents.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = st match {
          case None => cells(batch)
          case Some(prev) => Calibration.mergeScoreCells(prev, cells(batch))
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    // merged cells == one-shot cells (the state itself is exact)
    assert(canon(st.get) == canon(cells(batchDf)) && canon(st.get).nonEmpty)
    val sl = scoredLabeled(batchDf)
    assert(canon(Calibration.logLossFromCells(st.get)) ==
      canon(Calibration.logLoss(sl, col("score"), col("lbl"))))
    val streamedPr = canon(Calibration.prCurveFromCells(st.get))
    assert(streamedPr.nonEmpty &&
      streamedPr == canon(Calibration.prCurve(sl, col("score"), col("lbl"))))
  }

  test("streaming control-chart state: merged period cells reproduce the batch EWMA chart (D42)") {
    // D42: B152's monthly revenue cells maintained under streaming
    // ingestion — state = (key, month, exact DECIMAL sum), merge =
    // decimal addition (associative, exact); ewmaChart's
    // decimal->double cast happens AFTER the merge, so the chart from
    // carried state == the one-shot batch chart bit-for-bit (every
    // unrounded z/limit double included).
    import graft.operators.temporal.Cusum
    def cells(df: org.apache.spark.sql.DataFrame) =
      Cusum.cellState(df, Seq("o_orderpriority"),
        year(col("o_orderdate")) * 12 + (month(col("o_orderdate")) - 1),
        col("o_totalprice"))
    val dir = Files.createTempDirectory("graft_ewma_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = st match {
          case None => cells(batch)
          case Some(prev) =>
            Cusum.mergeCellState(prev, cells(batch), Seq("o_orderpriority"))
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(Cusum.ewmaChart(st.get, Seq("o_orderpriority"), "__ord", "__cell"))
    val oneShot = canon(Cusum.ewmaChart(cells(batchDf), Seq("o_orderpriority"), "__ord", "__cell"))
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming bootstrap state: merged rep sums reproduce the batch CI (D27)") {
    // D27: B107's Poisson-bootstrap CI maintained under streaming
    // ingestion — state = <= R rows of (rep, decimal weighted sum,
    // weight count), field-wise associative (weights are
    // md5-deterministic per (key, rep), so merge is arrival-order
    // free); ciFromState is shared with the batch path, making
    // state-maintained == one-shot structural.
    import graft.operators.sample.Bootstrap
    val dir = Files.createTempDirectory("graft_boot_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bState = Bootstrap.repState(batch, "o_orderkey", "o_totalprice", 16)
        val next = st match {
          case None => bState
          case Some(prev) => Bootstrap.mergeRepState(prev, bState)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    // merged state == one-shot state EXACTLY (decimal sums associative)
    val oneShotState = Bootstrap.repState(batchDf, "o_orderkey", "o_totalprice", 16)
    assert(canon(st.get) == canon(oneShotState))
    // and the derived CI equals the full batch query's CI columns
    val streamedCi = Bootstrap.ciFromState(st.get, 16).collect().head
    val batchCi = Bootstrap
      .poissonBootstrapCi(batchDf, "o_orderkey", "o_totalprice", 16)
      .select(col("n_reps"), col("ci_lo"), col("ci_med"), col("ci_hi"))
      .collect().head
    assert(streamedCi == batchCi)
  }

  test("streaming gradient state: accumulated cells reproduce the batch training step (D38)") {
    // D38: the quality classifier's epoch gradient maintained under
    // streaming ingestion — state = (bucket, exact decimal gradient sum)
    // cells (−2 = example count, −1 = bias); per-row contributions
    // quantize to DECIMAL(18,6) BEFORE summing, so merging microbatch
    // cells by addition equals the one-shot epoch EXACTLY, and the
    // driver-side step from the merged state is bit-identical to one
    // epoch of QualityClassifier.train on the full corpus. This is the
    // distributed-training composition: executors stream gradient
    // shards, the driver applies the fixed-IEEE update.
    import graft.operators.text.QualityClassifier
    val dim = 32
    val w0 = Vector.tabulate(dim)(j => (j % 5 - 2) * 0.125) // a non-zero model
    val b0 = 0.25
    val dir = Files.createTempDirectory("graft_grad_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).documents
      .where(col("text").isNotNull)
      .select(col("text"), (col("doc_id") % 3 === 0).as("lbl"))
      .repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val cells = QualityClassifier.gradientCells(
          QualityClassifier.prepare(batch, "text", "lbl", dim), w0, b0)
        val next = st match {
          case None => cells
          case Some(prev) => QualityClassifier.mergeGradientCells(prev, cells)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    // merged state == one-shot epoch cells EXACTLY (decimal associativity)
    val oneShot = QualityClassifier.gradientCells(
      QualityClassifier.prepare(batchDf, "text", "lbl", dim), w0, b0)
    assert(canon(st.get) == canon(oneShot))
    // and the step from the merged state == the step from the one-shot
    val (wS, bS) = QualityClassifier.stepFromCells(st.get, w0, b0, lr = 1.0)
    val (wB, bB) = QualityClassifier.stepFromCells(oneShot, w0, b0, lr = 1.0)
    assert(wS == wB && bS == bB)
  }

  test("streaming interval-union state: folded coverage equals the batch merge (D26)") {
    // D26: B36b's interval merge maintained under streaming ingestion —
    // state = per-key disjoint merged spans with absorbed counts; each
    // microbatch's raw intervals fold in through the SAME sweep
    // (Islands.foldIntervalState == mergeIntervals construction), so
    // state-maintained == one-shot EXACTLY. Interval union is
    // associative/commutative; counts are the non-idempotent part (the
    // D20 partition contract), which maxFilesPerTrigger staging honors.
    import graft.operators.temporal.Islands
    val dir = Files.createTempDirectory("graft_interval_stream").toFile
    dir.deleteOnExit()
    val ivals = Snapshot(spark, sf()).orders
      .where(col("o_orderkey") % 7 === 0)
      .select(col("o_orderpriority"), col("o_orderkey"),
        org.apache.spark.sql.functions.to_date(col("o_orderdate")).as("w_start"),
        org.apache.spark.sql.functions.date_add(
          org.apache.spark.sql.functions.to_date(col("o_orderdate")), 3).as("w_end"))
    ivals.repartition(4).write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val next = st match {
          case None => Islands.foldIntervalState(
            // empty state with the right shape
            batch.sparkSession.range(0).select(
              lit("").as("o_orderpriority"),
              lit(null).cast("date").as("merged_start"),
              lit(null).cast("date").as("merged_end"),
              lit(0L).as("n_intervals")),
            batch, Seq("o_orderpriority"), "w_start", "w_end")
          case Some(prev) => Islands.foldIntervalState(
            prev, batch, Seq("o_orderpriority"), "w_start", "w_end")
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(st.get)
    val oneShot = canon(Islands.mergeIntervals(
      batchDf, Seq("o_orderpriority"), "w_start", "w_end", "o_orderkey"))
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming growth state: merged activity sets reproduce the batch MAU accounting (D23)") {
    // D23: B84's growth accounting maintained under streaming ingestion
    // (the D22 shape on ORDERS — the events table spans one month, where
    // every class but 'new' is vacuously zero, the q_boilerplate vacuity
    // lesson). State = per-user sorted distinct month-index sets; merge
    // = SET union, associative AND idempotent — a replayed batch must
    // change nothing (asserted below), strictly stronger than D22's
    // multiset contract. Recompute from merged state == one-shot batch.
    import graft.operators.temporal.Growth
    def state(df: org.apache.spark.sql.DataFrame) =
      Growth.activityState(df, "o_custkey", "o_orderdate")
    val dir = Files.createTempDirectory("graft_growth_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    var firstBatch: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bState = state(batch).localCheckpoint(true)
        if (firstBatch.isEmpty) firstBatch = Some(bState)
        val next = st match {
          case None => bState
          case Some(prev) => Growth.mergeActivityState(prev, bState)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(Growth.monthlyAccountingFromState(st.get))
    val oneShot = canon(Growth.monthlyAccounting(batchDf, "o_custkey", "o_orderdate"))
    assert(streamed.nonEmpty && streamed == oneShot)
    // all four classes genuinely exercised on this grain (vacuity guard)
    val sums = Growth.monthlyAccountingFromState(st.get)
      .agg(sum("n_new"), sum("n_retained"), sum("n_resurrected"), sum("n_churned"))
      .collect().head
    (0 to 3).foreach(i => assert(sums.getLong(i) > 0L, s"class $i vacuously zero"))
    // idempotency: replaying an already-absorbed batch is a no-op
    val replayed = canon(Growth.monthlyAccountingFromState(
      Growth.mergeActivityState(st.get, firstBatch.get)))
    assert(replayed == streamed, "set-union state must absorb a replayed batch")
  }

  test("streaming screen state: OR-merged blocks reproduce the batch Cochran Q (D28)") {
    // D28: B111's Cochran Q maintained under streaming ingestion (the
    // D23 shape): state = per-customer k booleans, merge = field-wise
    // OR — associative, commutative AND idempotent, so microbatches
    // fold in any order and a replayed batch is a no-op. cochranQ over
    // the merged state == the one-shot state test exactly.
    import graft.operators.stats.Stats
    val screens = Seq("t_urgent", "t_big", "t_recent")
    def rows(df: org.apache.spark.sql.DataFrame) = df.select(
      col("o_custkey"),
      (col("o_orderpriority") === "1-URGENT").as("t_urgent"),
      (col("o_totalprice") > 150000.0).as("t_big"),
      (year(col("o_orderdate")) >= 1995).as("t_recent"))
    def state(df: org.apache.spark.sql.DataFrame) =
      Stats.screenState(rows(df), "o_custkey", screens)
    val dir = Files.createTempDirectory("graft_screen_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    var firstBatch: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bState = state(batch).localCheckpoint(true)
        if (firstBatch.isEmpty) firstBatch = Some(bState)
        val next = st match {
          case None => bState
          case Some(prev) => Stats.mergeScreenState(prev, bState, "o_custkey", screens)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    val streamed = canon(st.get)
    val oneShot = canon(state(batchDf))
    assert(streamed.nonEmpty && streamed == oneShot)
    // derived test statistic matches the one-shot exactly
    val qStream = Stats.cochranQ(st.get, "o_custkey", screens).collect().toSeq
    val qBatch = Stats.cochranQ(state(batchDf), "o_custkey", screens).collect().toSeq
    assert(qStream == qBatch && !qStream.head.isNullAt(3))
    // idempotency: replaying an already-absorbed batch is a no-op
    val replayed = canon(Stats.mergeScreenState(st.get, firstBatch.get,
      "o_custkey", screens))
    assert(replayed == streamed, "OR-merge state must absorb a replayed batch")
  }

  test("streaming MI cell state: merged counts reproduce the batch report (D29)") {
    // D29: B112's mutual information maintained under streaming
    // ingestion (the categoryCounts/binCounts shape): state = the
    // observed (x, y, n_xy) cell table, merge = count ADDITION —
    // associative and commutative (arrival order free), NOT idempotent
    // (the D20 partition contract). miFromCells over the merged state
    // == the one-shot batch report exactly.
    import graft.operators.stats.Stats
    def cells(df: org.apache.spark.sql.DataFrame) =
      Stats.miCells(df, "o_orderpriority", "o_orderstatus")
    val dir = Files.createTempDirectory("graft_mi_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bCells = cells(batch).localCheckpoint(true)
        val next = st match {
          case None => bCells
          case Some(prev) => Stats.mergeMiCells(prev, bCells)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(st.get) == canon(cells(batchDf)))
    val streamed = Stats.miFromCells(st.get).collect().toSeq
    val oneShot = Stats
      .mutualInformation(batchDf, "o_orderpriority", "o_orderstatus")
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming Count-Min state: merged cell sums reproduce the one-shot sketch (D30)") {
    // D30: B120's frequency sketch maintained under streaming ingestion:
    // state = the depth x width cell array, merge = cell-wise ADDITION
    // (associative/commutative, arrival-order free; NOT idempotent —
    // the D20 partition contract). Unlike MG's order-sensitive counter
    // set, the merged sketch is BIT-IDENTICAL to the one-shot sketch,
    // so every estimate matches exactly.
    import graft.operators.sketch.{CMSketch, CountMin}
    def sketch(df: org.apache.spark.sql.DataFrame): CMSketch = df
      .select(col("o_orderpriority")).as(Encoders.STRING)
      .select(new CountMin(4, 128).toColumn).first()
    val dir = Files.createTempDirectory("graft_cm_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[CMSketch] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bSk = sketch(batch)
        st = Some(st.fold(bSk)(_.merged(bSk)))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    val oneShot = sketch(batchDf)
    assert(st.get == oneShot, "merged microbatch sketch must be bit-identical")
    // the identical sketch answers point queries >= exact, per priority
    val exact = batchDf.groupBy("o_orderpriority").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (t, c) =>
      assert(st.get.estimate(t) >= c, s"$t: ${st.get.estimate(t)} < $c")
    }
  }

  test("streaming word-count state: merged counts reproduce the batch diversity card (D31)") {
    // D31: C74's lexical diversity maintained under streaming ingestion
    // (the D29 cell shape): state = the (source, word, c) vocabulary
    // table, merge = count ADDITION. Hapax status is a property of the
    // MERGED state — a word seen once in two different batches must be
    // non-hapax after the merge (asserted non-vacuously below).
    import graft.operators.stats.Profiling
    def cells(df: org.apache.spark.sql.DataFrame) =
      Profiling.wordCounts(df, "source", "text")
    val dir = Files.createTempDirectory("graft_wc_stream").toFile
    dir.deleteOnExit()
    val base = Snapshot(spark, sf()).documents
    base.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    // PLANT the cross-batch hapax evidence: the same rare word once in
    // each of two extra single-row FILES (their own microbatches under
    // maxFilesPerTrigger=1) — the synthetic corpus vocabulary is dense
    // enough that a natural batch-local hapax is NOT guaranteed (this
    // guard failed on batch-order luck before the plant)
    def plant(id: Long): Unit = base.limit(1)
      .withColumn("doc_id", lit(id))
      .withColumn("text", lit("zzzhapaxword planted evidence"))
      .repartition(1)
      .write.mode("append").parquet(dir.getAbsolutePath)
    plant(9000001L)
    plant(9000002L)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    val hapaxBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bCells = cells(batch).localCheckpoint(true)
        if (bCells.where($"word" === "zzzhapaxword" && $"c" === 1L).count() > 0L)
          hapaxBatches.incrementAndGet()
        val next = st match {
          case None => bCells
          case Some(prev) => Profiling.mergeWordCounts(prev, bCells)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(st.get) == canon(cells(batchDf)))
    val streamed = Profiling.diversityFromWordCounts(st.get).collect().toSeq
    val oneShot = Profiling
      .lexicalDiversityBySource(batchDf, "source", "text").collect().toSeq
    assert(streamed.nonEmpty && streamed == oneShot)
    // non-vacuous hapax-merge: the planted word was hapax in >= 2
    // separate batches yet is non-hapax in the merged state — the error
    // a naive per-batch hapax count would make
    assert(hapaxBatches.get() >= 2,
      s"plant landed in ${hapaxBatches.get()} batches, expected >= 2")
    val merged = st.get.where($"word" === "zzzhapaxword")
      .agg(sum($"c")).collect().head.getLong(0)
    assert(merged >= 2L, s"merged plant count $merged, expected >= 2")
  }

  test("streaming volume-series state: merged unit counts reproduce the batch ACF (D32)") {
    // D32: B122's ACF maintained under streaming ingestion (the D29
    // cell shape): state = the (u, x) per-unit count series, merge =
    // count ADDITION; acfFromUnitCounts over the merged state == the
    // one-shot batch report exactly (full-row, incl. the unrounded acf
    // doubles).
    import graft.operators.stats.Stats
    def cells(df: org.apache.spark.sql.DataFrame) =
      Stats.unitCounts(df.where(col("o_orderdate").isNotNull), "o_orderdate")
    val dir = Files.createTempDirectory("graft_acf_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bCells = cells(batch).localCheckpoint(true)
        val next = st match {
          case None => bCells
          case Some(prev) => Stats.mergeUnitCounts(prev, bCells)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(st.get) == canon(cells(batchDf)))
    val streamed = Stats.acfFromUnitCounts(st.get, 5).collect().toSeq
    val oneShot = Stats.acfGlobal(
      batchDf.where(col("o_orderdate").isNotNull), "o_orderdate", 5)
      .collect().toSeq
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming experiment monitor: merged ANOVA group state reproduces F and effect sizes (D33)") {
    // D33: B89/B124 maintained under streaming ingestion (the D25
    // moments shape): state = per-group (n, exact decimal Σv, Σv²),
    // merge = field-wise sums — associative, so the merged state is the
    // one-shot state EXACTLY and the shared anovaFromState/etaFromState
    // derivations make state==one-shot structural.
    import graft.operators.stats.Stats
    def state(df: org.apache.spark.sql.DataFrame) =
      Stats.anovaGroupState(df, "o_orderpriority", "o_totalprice")
    val dir = Files.createTempDirectory("graft_anova_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bState = state(batch).localCheckpoint(true)
        val next = st match {
          case None => bState
          case Some(prev) => Stats.mergeAnovaGroupState(prev, bState)
        }
        st = Some(next.localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(st.get) == canon(state(batchDf)))
    val fStream = Stats.anovaFromState(st.get).collect().toSeq
    val fBatch = Stats.anovaOneWay(batchDf, "o_orderpriority", "o_totalprice")
      .collect().toSeq
    assert(fStream == fBatch && !fStream.head.isNullAt(2))
    val eStream = Stats.etaFromState(st.get).collect().toSeq
    val eBatch = Stats.etaSquared(batchDf, "o_orderpriority", "o_totalprice")
      .collect().toSeq
    assert(eStream == eBatch && !eStream.head.isNullAt(2))
  }

  test("streaming ordered-trend monitor: merged trend state reproduces the batch Cochran-Armitage (D34)") {
    // D34: B134 maintained under streaming ingestion (the D25 moments
    // shape): state = ONE row of field-wise associative sums, merge =
    // field addition; trendFromState over the merged state == the
    // one-shot batch test exactly (incl. the unrounded z).
    import graft.operators.stats.Stats
    def state(df: org.apache.spark.sql.DataFrame) =
      Stats.trendState(df,
        substring(col("o_orderpriority"), 1, 1).cast("int"),
        (col("o_orderstatus") === "F").cast("int"))
    val dir = Files.createTempDirectory("graft_trend_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bs = state(batch).localCheckpoint(true)
        st = Some((st match {
          case None => bs
          case Some(prev) => Stats.mergeTrendState(prev, bs)
        }).localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    val streamed = Stats.trendFromState(st.get).collect().toSeq
    val oneShot = Stats.cochranArmitage(batchDf,
      substring(col("o_orderpriority"), 1, 1).cast("int"),
      (col("o_orderstatus") === "F").cast("int")).collect().toSeq
    assert(streamed.nonEmpty && streamed == oneShot)
  }

  test("streaming agreement monitor: merged confusion cells reproduce kappa AND AC1 (D35)") {
    // D35: B105/B135 maintained under streaming ingestion (the D29
    // cell shape): state = (label_a, label_b, n) cells, merge = count
    // addition; BOTH agreement statistics re-derive from the merged
    // state bit-exactly.
    import graft.operators.stats.Stats
    import graft.operators.text.TextStats
    def labeled(df: org.apache.spark.sql.DataFrame) =
      df.where(col("text").isNotNull && col("lang").isNotNull)
        .select(TextStats.langId(col("text")).as("pred"), col("lang"))
    val dir = Files.createTempDirectory("graft_agree_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).documents.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val cells = Stats.agreementCells(labeled(batch), "pred", "lang")
          .localCheckpoint(true)
        st = Some((st match {
          case None => cells
          case Some(prev) => Stats.mergeAgreementCells(prev, cells)
        }).localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(st.get) == canon(Stats.agreementCells(labeled(batchDf), "pred", "lang")))
    assert(Stats.kappaFromCells(st.get).collect().toSeq ==
      Stats.cohensKappa(labeled(batchDf), "pred", "lang").collect().toSeq)
    assert(Stats.ac1FromCells(st.get).collect().toSeq ==
      Stats.gwetAc1(labeled(batchDf), "pred", "lang").collect().toSeq)
  }

  test("streaming paired-movement monitor: merged first/last state reproduces Wilcoxon and the sign test (D36)") {
    // D36: the B99/B133 diff construction maintained under streaming
    // ingestion: state = per-key struct-MIN/MAX of (order, tie, value)
    // + count; min/max merge idempotently, counts add; both paired
    // tests re-derive from the merged state bit-exactly.
    import graft.operators.stats.Stats
    def state(df: org.apache.spark.sql.DataFrame) =
      Stats.pairedMovementState(df,
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice")
    val dir = Files.createTempDirectory("graft_paired_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).orders.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val bs = state(batch).localCheckpoint(true)
        st = Some((st match {
          case None => bs
          case Some(prev) => Stats.mergePairedMovementState(prev, bs, "o_custkey")
        }).localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    val diffs = Stats.pairedDiffsFromState(st.get)
    val oneShotDiffs = Stats.pairedDiffsFromState(state(batchDf))
    assert(Stats.wilcoxonSignedRank(diffs, "__d").collect().toSeq ==
      Stats.wilcoxonSignedRank(oneShotDiffs, "__d").collect().toSeq)
    assert(Stats.signTest(diffs, "__d").collect().toSeq ==
      Stats.signTest(oneShotDiffs, "__d").collect().toSeq)
    // a key whose batches split first/last across microbatches still
    // pairs: state counts exceed any single batch's
    assert(st.get.agg(max(col("__n"))).head().getLong(0) > 1L)
  }

  test("streaming corpus-shape monitor: merged term counts reproduce the Zipf fit (D37)") {
    // D37: C80 maintained under streaming ingestion (the D29 cell
    // shape): state = (w, c) term counts, merge = count addition; the
    // fit re-derives from the merged state bit-exactly (incl. the
    // audited-transcendental rounded values — same doubles in, same
    // rounded doubles out).
    import graft.operators.text.TextStats
    val dir = Files.createTempDirectory("graft_zipf_stream").toFile
    dir.deleteOnExit()
    Snapshot(spark, sf()).documents.repartition(4)
      .write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batchDf = spark.read.parquet(dir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema)
      .option("maxFilesPerTrigger", 1).parquet(dir.getAbsolutePath)
    val nBatches = new java.util.concurrent.atomic.AtomicInteger(0)
    var st: Option[org.apache.spark.sql.DataFrame] = None
    val q = stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        nBatches.incrementAndGet()
        val tc = TextStats.termCounts(batch, "text").localCheckpoint(true)
        st = Some((st match {
          case None => tc
          case Some(prev) => TextStats.mergeTermCounts(prev, tc)
        }).localCheckpoint(true))
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(nBatches.get() > 1, s"need multiple microbatches, got ${nBatches.get()}")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).toSeq.sorted
    assert(canon(st.get) == canon(TextStats.termCounts(batchDf, "text")))
    assert(TextStats.zipfFitFromTermCounts(st.get, 50).collect().toSeq ==
      TextStats.zipfFit(batchDf, "text", 50).collect().toSeq)
  }

  test("continuous-ingestion dedup: stream-static anti join passes only novel content") {
    // the production ingestion shape: a document stream anti-joined
    // against the static content-hash index of the existing corpus —
    // stateless on the stream side (no watermark/state store), the index
    // is the only thing that grows. Docs whose content already exists
    // (even under a different id) never reach the sink.
    val allDocs = Snapshot(spark, sf()).documents
    val existing = allDocs.where($"doc_id" % 2 === 0)
    val index = existing.select(md5(lower($"text")).as("content_hash")).distinct()
    val incomingDir = Files.createTempDirectory("graft_ingest").toFile
    incomingDir.deleteOnExit()
    // incoming batch = the other half PLUS re-ingested copies of indexed docs
    allDocs.where($"doc_id" % 2 === 1)
      .unionAll(existing.limit(50).withColumn("doc_id", $"doc_id" + 1000000L))
      .write.mode("overwrite").parquet(incomingDir.getAbsolutePath)
    val batchDf = spark.read.parquet(incomingDir.getAbsolutePath)
    val stream = spark.readStream.schema(batchDf.schema).parquet(incomingDir.getAbsolutePath)
    val novel = stream
      .withColumn("content_hash", md5(lower($"text")))
      .join(index, Seq("content_hash"), "left_anti")
    val q = novel.writeStream.outputMode("append").format("memory")
      .queryName("ingest_novel").start()
    try {
      q.processAllAvailable()
      val got = spark.table("ingest_novel").select("doc_id").as[Long].collect().toSet
      val want = batchDf
        .withColumn("content_hash", md5(lower($"text")))
        .join(index, Seq("content_hash"), "left_anti")
        .select("doc_id").as[Long].collect().toSet
      assert(got == want && got.nonEmpty)
      // every re-ingested copy of indexed content was dropped
      assert(!got.exists(_ >= 1000000L))
    } finally q.stop()
  }

  test("streaming sessionization: gap closes mid-batch, timeout flushes the rest") {
    // stage a private copy of the events dir so we can append a late file
    val dir = Files.createTempDirectory("graft_sess").toFile
    dir.deleteOnExit()
    val src = spark.read.parquet(eventsDir)
    src.write.mode("overwrite").parquet(dir.getAbsolutePath)

    // streaming session_id is the start time in epoch micros (stable under
    // state eviction) — derive the expectation from the batch twin
    val expectedAll = EventStreams.sessionizeBatch(spark.read.parquet(dir.getAbsolutePath))
      .select($"user_id", unix_micros($"session_start").as("session_id"),
        $"n_events", $"session_start", $"session_end")
      .orderBy("user_id", "session_id").collect().toSeq

    val stream = spark.readStream.schema(src.schema).parquet(dir.getAbsolutePath)
    val typed = stream.select("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.Event]
    val q = EventStreams.sessionizeStream(spark, typed)
      .writeStream.outputMode("append").format("memory").queryName("sessions").start()
    try {
      q.processAllAvailable()
      // advance the watermark far past every open session's gap horizon:
      // event-time timeout then flushes + evicts all prior users' state
      val farFuture = java.sql.Timestamp.valueOf("2030-01-01 00:00:00")
      Seq(EventStreams.Event(999999L, farFuture, 999999L, "view", 0.0))
        .toDF().write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()
      val got = spark.table("sessions")
        .where($"user_id" =!= 999999L)
        .select("user_id", "session_id", "n_events", "session_start", "session_end")
        .orderBy("user_id", "session_id").collect().toSeq
      assert(got == expectedAll)
    } finally q.stop()
  }

  test("streaming as-of join equals the batch latestPriorTs on the real events table") {
    // left = purchases, right = signups, per user: the streaming twin of
    // AsOfJoin.latestPriorTs driven over the same data, final matches
    // flushed by a far-future sentinel advancing the watermark
    import graft.streaming.StreamingAsOf
    val dir = Files.createTempDirectory("graft_asof_s").toFile
    dir.deleteOnExit()
    val src = spark.read.parquet(eventsDir)
      .where($"user_id".isNotNull && $"ts".isNotNull)
    src.write.mode("overwrite").parquet(dir.getAbsolutePath)
    val batch = spark.read.parquet(dir.getAbsolutePath)
    val leftB = batch.where($"event_type" === "purchase")
      .select($"event_id", $"user_id", $"ts")
    val rightB = batch.where($"event_type" === "signup")
      .select($"event_id", $"user_id", $"ts")
    // full-row parity: the batch operator surfaces the matched right ROW
    // (ts + id), and the stream must agree on both fields
    val want = graft.operators.asof.AsOfJoin
      .latestPriorRow(leftB, rightB, "user_id", "ts", "ts", "event_id",
        "matched_ts", "matched_id")
      .select($"event_id", $"matched_ts".cast("string"), $"matched_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap

    val stream = spark.readStream.schema(batch.schema).parquet(dir.getAbsolutePath)
    val tagged = stream
      .where($"event_type" === "purchase" || $"event_type" === "signup")
      .select($"user_id".as("key"), $"ts", $"event_id".as("id"),
        ($"event_type" === "purchase").as("is_left"))
      .as[StreamingAsOf.AsOfEvent]
    val q = StreamingAsOf.asOfStream(spark, tagged)
      .writeStream.outputMode("append").format("memory").queryName("asof_s").start()
    try {
      q.processAllAvailable()
      // sentinel right rows far ahead, in the EVENTS schema the stream
      // reads (a mismatched-schema file null-fills event_type and the
      // filter silently drops the sentinel — watermark never advances):
      // the FIRST advances the watermark past every pending left; the
      // SECOND makes the flush happen inside a DATA microbatch
      // (timed-out keys are invoked in any microbatch) —
      // processAllAvailable awaits data batches but not the no-data
      // microbatch a watermark advance schedules
      for (sid <- Seq(999999L, 999998L)) {
        val base = Seq((sid, sid, "signup",
          java.sql.Timestamp.valueOf("2030-01-01 00:00:00"), 0.0))
          .toDF("event_id", "user_id", "event_type", "ts", "value")
        batch.schema.fields
          .foldLeft(base) { (df, f) =>
            if (df.columns.contains(f.name)) df
            else df.withColumn(f.name, lit(null).cast(f.dataType))
          }
          .select(batch.columns.toIndexedSeq.map(col): _*)
          .write.mode("append").parquet(dir.getAbsolutePath)
        q.processAllAvailable()
      }
      val got = spark.table("asof_s")
        .select($"id", $"matched_ts".cast("string"), $"matched_id")
        .as[(Long, String, Option[Long])].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.size == want.size, s"want ${want.size} matches, got ${got.size}")
      assert(got == want)
      assert(want.valuesIterator.exists(_._1 != null) && want.valuesIterator.exists(_._1 == null),
        "data must exercise both matched and no-prior-signup cases")
    } finally q.stop()
  }

  test("streaming as-of: a right row arriving AFTER its left (within watermark) still matches") {
    // arrival order ≠ event order: the left purchase lands in batch 1, its
    // matching quote only in batch 2, both inside the watermark window —
    // the watermark gate must hold the left row back until the match is final
    import graft.streaming.StreamingAsOf
    val dir = Files.createTempDirectory("graft_asof_late").toFile
    dir.deleteOnExit()
    def row(key: Long, t: String, id: Long, left: Boolean) =
      StreamingAsOf.AsOfEvent(key, java.sql.Timestamp.valueOf(t), id, left)
    val b1 = Seq(
      row(1L, "2024-03-01 10:30:00", 100L, true), // left, match arrives later
      row(2L, "2024-03-01 10:31:00", 200L, true)) // left, never matched
    b1.toDF().write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
      .as[StreamingAsOf.AsOfEvent]
    val q = StreamingAsOf.asOfStream(spark, stream, "30 minutes")
      .writeStream.outputMode("append").format("memory").queryName("asof_late").start()
    try {
      q.processAllAvailable()
      assert(spark.table("asof_late").isEmpty,
        "no left may finalize while its match can still arrive")
      // the out-of-order right (earlier event time than the buffered left),
      // then two sentinels: one advances the watermark, the next fires the
      // timeouts inside an awaited data microbatch
      Seq(row(1L, "2024-03-01 10:15:00", 10L, false),
        row(999L, "2030-01-01 00:00:00", 999L, false))
        .toDF().write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()
      Seq(row(998L, "2030-01-01 00:00:00", 998L, false))
        .toDF().write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()
      val got = spark.table("asof_late")
        .select($"id", $"matched_ts".cast("string"), $"matched_id")
        .as[(Long, String, Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == Map(
        100L -> (("2024-03-01 10:15:00", Some(10L))),
        200L -> ((null, None))))
    } finally q.stop()
  }

  test("streaming windowed heavy hitters: exact at k >= vocab, MG bounds at small k, out-of-order rows land in their window") {
    // D13: one Misra-Gries sketch per event-time window on the stream.
    // Three contracts: (1) with k >= the window vocabulary no eviction
    // ever fires, so the sketch equals the exact batch counts verbatim;
    // (2) at small k every surviving counter obeys est <= true and
    // true - est <= n_w/(k+1), and every true heavy hitter survives;
    // (3) a row arriving in a later file but timestamped inside an
    // earlier (still-open) window counts in THAT window.
    import graft.streaming.EventStreams
    val dir = Files.createTempDirectory("graft_whh").toFile
    dir.deleteOnExit()
    def ev(t: String, term: String) = (java.sql.Timestamp.valueOf(t), term)
    // window A [10:00, 11:00): skewed vocab - "a" x6, "b" x3, "c" x1
    // window B [11:00, 12:00): "x" x2, "y" x2
    val b1 = (Seq.fill(5)(ev("2024-03-01 10:05:00", "a")) ++
      Seq.fill(3)(ev("2024-03-01 10:10:00", "b")) ++
      Seq(ev("2024-03-01 10:20:00", "c")) ++
      Seq(ev("2024-03-01 11:05:00", "x"), ev("2024-03-01 11:06:00", "y")))
    b1.toDF("ts", "term").write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = spark.read.parquet(dir.getAbsolutePath).schema

    def run(k: Int, name: String): Map[java.sql.Timestamp, Map[String, Long]] = {
      val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
      val q = EventStreams.windowedHeavyHittersStream(stream, "term", k, "1 hour", "10 minutes")
        .writeStream.outputMode("append").format("memory").queryName(name).start()
      try {
        q.processAllAvailable()
        // out-of-order: one more "a" for window A — it arrives after B
        // opened but sits at 10:57, ON or ABOVE the watermark (max seen
        // 11:06 − 10 min = 10:56), so the still-open window A must count
        // it; then sentinels to close both windows
        Seq(ev("2024-03-01 10:57:00", "a"), ev("2024-03-01 11:07:00", "x"),
          ev("2024-03-01 11:08:00", "y"))
          .toDF("ts", "term").write.mode("append").parquet(dir.getAbsolutePath)
        q.processAllAvailable()
        for (s <- Seq("2030-01-01 00:00:00", "2030-01-01 00:00:01")) {
          Seq(ev(s, "zz")).toDF("ts", "term").write.mode("append")
            .parquet(dir.getAbsolutePath)
          q.processAllAvailable()
        }
        spark.table(name)
          .where($"window_start" < java.sql.Timestamp.valueOf("2029-01-01 00:00:00"))
          .collect()
          .map(r => r.getTimestamp(0) -> r.getMap[String, Long](1).toMap).toMap
      } finally q.stop()
    }

    val wA = java.sql.Timestamp.valueOf("2024-03-01 10:00:00")
    val wB = java.sql.Timestamp.valueOf("2024-03-01 11:00:00")

    // (1) k >= vocab: sketch IS the exact count map, including the
    // out-of-order row in window A
    val big = run(64, "whh_big")
    assert(big(wA) == Map("a" -> 6L, "b" -> 3L, "c" -> 1L), s"window A: ${big(wA)}")
    assert(big(wB) == Map("x" -> 2L, "y" -> 2L), s"window B: ${big(wB)}")

    // the batch twin over the same (post-append) files must agree with
    // the analytic counts the stream was checked against
    val batchA = EventStreams
      .windowedHeavyHittersBatch(spark.read.parquet(dir.getAbsolutePath), "term")
      .where($"window_start" === wA)
      .collect().map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(batchA == Map("a" -> 6L, "b" -> 3L, "c" -> 1L), s"batch twin: $batchA")

    // (2) small k: Misra-Gries bounds per window against the exact counts
    val small = run(2, "whh_small")
    val exactA = batchA
    val nA = exactA.values.sum
    val boundA = nA / (2 + 1) // floor(10/3) = 3
    small(wA).foreach { case (t, est) =>
      assert(est <= exactA(t), s"overcount: $t $est > ${exactA(t)}")
      assert(exactA(t) - est <= boundA, s"undercount bound broken for $t")
    }
    exactA.collect { case (t, n) if n > boundA => t }.foreach { hh =>
      assert(small(wA).contains(hh), s"true heavy hitter $hh evicted at k=2")
    }
  }

  test("streaming as-of: tied right timestamps pick the greatest id; pre-epoch round-trips; idle rights compact to the carry") {
    // three contracts: (1) two quotes at the SAME event time resolve to
    // the greatest id — exactly latestPriorRow's window tie rule; (2) the
    // µs codec round-trips pre-1970 timestamps (floorDiv, not
    // truncation) — checked directly, since Spark's INITIAL watermark is
    // epoch 0 and a pre-1970 row is dropped as late before it can ever
    // reach the state function; (3) a key that buffered only RIGHTS is
    // compacted by its own event-time timeout — state collapses to the
    // single carry with no further data on that key
    import graft.streaming.StreamingAsOf
    for (s <- Seq("1969-06-01 00:00:00.000001", "1969-12-31 23:59:59.999999",
        "1970-01-01 00:00:00", "2024-03-01 10:00:00.5")) {
      val t = java.sql.Timestamp.valueOf(s)
      assert(StreamingAsOf.toTs(StreamingAsOf.us(t)) == t, s"µs round-trip of $s")
    }
    val dir = Files.createTempDirectory("graft_asof_tie").toFile
    dir.deleteOnExit()
    def row(key: Long, t: String, id: Long, left: Boolean) =
      StreamingAsOf.AsOfEvent(key, java.sql.Timestamp.valueOf(t), id, left)
    val b1 = Seq(
      row(1L, "2024-03-01 10:00:00", 11L, false), // tied quotes...
      row(1L, "2024-03-01 10:00:00", 13L, false),
      row(1L, "2024-03-01 10:00:00", 12L, false),
      row(1L, "2024-03-01 10:05:00", 100L, true), // ...answered by id 13
      row(7L, "2024-03-01 10:00:00", 71L, false), // rights-only key
      row(7L, "2024-03-01 10:01:00", 72L, false))
    b1.toDF().write.mode("overwrite").parquet(dir.getAbsolutePath)
    val schema = spark.read.parquet(dir.getAbsolutePath).schema
    val stream = spark.readStream.schema(schema).parquet(dir.getAbsolutePath)
      .as[StreamingAsOf.AsOfEvent]
    val q = StreamingAsOf.asOfStream(spark, stream, "10 minutes")
      .writeStream.outputMode("append").format("memory").queryName("asof_tie").start()
    try {
      q.processAllAvailable()
      for (sid <- Seq(999L, 998L)) {
        Seq(row(sid, "2030-01-01 00:00:00", sid, false))
          .toDF().write.mode("append").parquet(dir.getAbsolutePath)
        q.processAllAvailable()
      }
      val got = spark.table("asof_tie")
        .select($"id", $"matched_ts".cast("string"), $"matched_id")
        .as[(Long, String, Option[Long])]
        .collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == Map(
        100L -> (("2024-03-01 10:00:00", Some(13L)))))
      // key 7 buffered only rights: after the watermark passed them, its
      // timeout must have folded both into the one carry pair (and the
      // late key-7 left below proves the carry holds the max: id 72)
      Seq(row(7L, "2030-01-02 00:00:00", 700L, true)).toDF()
        .write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()
      Seq(row(997L, "2031-01-01 00:00:00", 997L, false)).toDF()
        .write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()
      Seq(row(996L, "2031-01-02 00:00:00", 996L, false)).toDF()
        .write.mode("append").parquet(dir.getAbsolutePath)
      q.processAllAvailable()
      val got7 = spark.table("asof_tie").where($"id" === 700L)
        .select($"matched_ts".cast("string"), $"matched_id")
        .as[(String, Option[Long])].collect().toSeq
      assert(got7 == Seq(("2024-03-01 10:01:00", Some(72L))))
    } finally q.stop()
  }
}

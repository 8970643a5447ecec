package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bpe, Sampling, Similarity}

/** Round-16 operator laws: exact-OOV unigram encode, tokenizer-true
  * packed export (one-materialization pin), index maintenance
  * (conditional rebuild, healthy no-op), membership-based append
  * attribution, the parallel footer census, and the collision-proof
  * scale-probe replica ids. */
class Round16Spec extends SparkSpec {

  import spark.implicits._

  // ------------------------------------------------------------------
  // unigramTokenCounts exactOov
  // ------------------------------------------------------------------

  private lazy val uniModel = {
    val train = Seq((1L, "aaa bbb aaa ab abab"), (2L, "abab baba aaa bb"))
      .toDF("doc_id", "text")
    Bpe.trainUnigram(train, "text", vocabSize = 8, maxPieceLen = 3,
      seedSize = 8, emRounds = 2)
  }

  test("unigramTokenCounts exactOov equals the driver tokenizer for " +
    "EVERY word, OOV included") {
    val docs = Seq((10L, "aaa zzz abz"), (11L, "qqq ab"), (12L, "zq"))
      .toDF("doc_id", "text")
    // zzz/abz/qqq/zq are OOV (absent from the training dictionary); z/q
    // are unknown CHARS, so the char-count fallback and the Viterbi
    // disagree whenever a known piece covers part of an OOV word
    val got = Bpe.unigramTokenCounts(docs, "doc_id", "text", uniModel,
        exactOov = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def exact(t: String): Long = t.split("\\s+").filter(_.nonEmpty)
      .map(w => uniModel.segment(w).length.toLong).sum
    assert(got(10L) == exact("aaa zzz abz"))
    assert(got(11L) == exact("qqq ab"))
    assert(got(12L) == exact("zq"))
  }

  test("unigramTokenCounts loose char-count OOV fallback is an upper " +
    "bound on the exact count, and dict words agree either way") {
    val docs = Seq((10L, "aaa zzz abz abab"), (11L, "aaa ab"))
      .toDF("doc_id", "text")
    val loose = Bpe.unigramTokenCounts(docs, "doc_id", "text", uniModel,
        exactOov = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = Bpe.unigramTokenCounts(docs, "doc_id", "text", uniModel,
        exactOov = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loose(10L) >= exact(10L))
    // doc 11 is all-dictionary: both paths take the broadcast segment
    // table and must agree exactly
    assert(loose(11L) == exact(11L))
  }

  // ------------------------------------------------------------------
  // packTokenizedBpe / writePackedTokenized
  // ------------------------------------------------------------------

  /** 60 docs over a tiny vocabulary, word counts cycling 1..20 — BPE
    * token counts vary per doc, some exceed the seqLen below so the
    * truncation contract is exercised. */
  private lazy val packDocs = spark.range(1, 61)
    .select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(1), pmod(col("id"), lit(20)) + 1),
        i => concat(lit("w"), pmod(i * col("id"), lit(7))))).as("text"))

  private lazy val bpeModel =
    Bpe.trainBpe(packDocs, "text", numMerges = 8)

  private val SeqLen = 24L

  private lazy val packedTok = Sampling.packTokenizedBpe(
    packDocs, "doc_id", "text", bpeModel, SeqLen)

  test("packTokenizedBpe: packed totals equal the truncation-adjusted " +
    "exact encode totals, per doc and in aggregate") {
    val enc = Bpe.encodeTokenCounts(packDocs, "doc_id", "text", bpeModel,
        exactOov = true)
      .select(col("doc_id"),
        least(col("n_bpe_tokens"), lit(SeqLen)).as("want"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = packedTok.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == enc.keySet,
      "packed docs must be exactly the encoded docs")
    got.foreach { case (id, n) =>
      assert(n == enc(id), s"doc $id packed $n tokens, encode says ${enc(id)}")
    }
  }

  test("packTokenizedBpe: no doc crosses a sequence boundary and ids " +
    "stay dense") {
    val rows = packedTok.filter(col("seq").isNotNull)
      .select("seq", "off", "n_tokens").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) + r.getLong(2) <= SeqLen,
        s"seq ${r.getLong(0)} overflows")
    }
    val ids = rows.map(_.getLong(0)).distinct.sorted
    assert(ids.head == 0L && ids.last == ids.length - 1L,
      "sequence ids must number densely from 0")
  }

  test("packTokenizedBpe plan: ONE materialization — the packing reads " +
    "the checkpointed counts, never the encode DAG") {
    val plan = packedTok.queryExecution.executedPlan.toString
    // the encode DAG's corpus explode surfaces as a Generate node; if it
    // leaked past the checkpoint, every packing consumer (rank, census,
    // offset window) would re-derive the full encode
    assert(!plan.contains("Generate"),
      s"encode explode leaked into the packing plan:\n$plan")
    assert(plan.contains("ExistingRDD"),
      s"packing does not read the checkpointed counts:\n$plan")
  }

  test("packTokenizedUnigram: same composition laws under the unigram " +
    "tokenizer — totals equal the exact encode, boundaries hold") {
    val model = Bpe.trainUnigram(packDocs, "text", vocabSize = 32,
      maxPieceLen = 3, seedSize = 16, emRounds = 2)
    val packed = Sampling.packTokenizedUnigram(
      packDocs, "doc_id", "text", model, SeqLen)
    val enc = Bpe.unigramTokenCounts(packDocs, "doc_id", "text", model,
        exactOov = true)
      .select(col("doc_id"),
        least(col("n_uni_tokens"), lit(SeqLen)).as("want"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = packed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == enc, "unigram packed totals diverged from the encode")
    packed.filter(col("seq").isNotNull)
      .select("off", "n_tokens").collect()
      .foreach(r => assert(r.getLong(0) + r.getLong(1) <= SeqLen))
  }

  test("writePackedTokenized: the export carries exactly the packed " +
    "rows, round-robin sharded, (seq, off)-ordered within each shard") {
    val dir = java.nio.file.Files.createTempDirectory("packtok").toString
    Sampling.writePackedTokenized(packedTok, numShards = 3, dir)
    val back = spark.read.parquet(dir)
      .select("doc_id", "n_tokens", "seq", "off", "shard").collect()
    val want = packedTok.filter(col("seq").isNotNull)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(back.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))).toSet == want, "export rows diverged from the packing")
    back.foreach(r => assert(r.getInt(4) == (r.getLong(2) % 3).toInt,
      s"shard must be seq % numShards for seq ${r.getLong(2)}"))
    // loader contract: within each shard file, rows land in (seq, off)
    // order with no reader-side sort
    val byFile = spark.read.parquet(dir)
      .select(input_file_name().as("f"), col("seq"), col("off"))
      .collect().groupBy(_.getString(0))
    byFile.values.foreach { rs =>
      val seen = rs.map(r => (r.getLong(1), r.getLong(2)))
      assert(seen.sameElements(seen.sortBy(identity)),
        "a shard file is not (seq, off)-ordered")
    }
  }

  // ------------------------------------------------------------------
  // maintainIndex
  // ------------------------------------------------------------------

  /** Healthy flat fixture: decorrelated vectors, no appends. */
  private def healthyIndex(): String = {
    val dir = java.nio.file.Files.createTempDirectory("maint_ok").toString
    val base = spark.range(0, 64).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)), i =>
        sin(i * col("id")).cast("double")).as("embedding"))
    Similarity.saveIvfIndex(base, dir, nlist = 4, kmeansIters = 2,
      replicate = 1)
    dir
  }

  test("maintainIndex on a planted-drift store rebuilds EXACTLY once at " +
    "the new path and returns the fired health row") {
    val dir = healthyIndex()
    // plant the drift: append the corpus onto itself (frac 0.5)
    val assign = spark.read.parquet(s"$dir/corpus")
      .select(col("neighbor_id"), col("cv"), col("cell"))
    Similarity.appendToIvfIndex(assign, dir)
    val fresh = s"${dir}_rebuilt"
    val row = Similarity.maintainIndex(spark, dir, fresh, nlist = 4,
      kmeansIters = 2, replicate = 1).collect().head
    assert(row.getAs[Boolean]("recommend_rebuild"))
    assert(row.getAs[Boolean]("rebuilt"))
    assert(row.getAs[String]("new_path") == fresh)
    assert(row.getAs[Long]("rows_total") == 128 &&
      row.getAs[Long]("rows_appended") == 64)
    // the fresh layout collapsed the duplicated vectors and is clean
    val h = Similarity.indexHealth(spark, fresh).collect().head
    assert(h.getAs[Long]("rows_total") == 64 &&
      h.getAs[Long]("rows_appended") == 0)
    assert(h.getAs[Double]("appended_frac") == 0.0)
  }

  test("maintainIndex on a healthy store is a NO-OP: no rebuild dir, no " +
    "jobs beyond the footer census") {
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    import java.util.concurrent.atomic.AtomicInteger
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val dir = healthyIndex()
    val fresh = s"${dir}_rebuilt"
    def countJobs(marker: String)(body: => Unit): Int = {
      val jobs = new AtomicInteger(0)
      val seen = new CountDownLatch(1)
      val l = new SparkListener {
        override def onJobStart(js: SparkListenerJobStart): Unit = {
          val g = Option(js.properties)
            .map(_.getProperty("spark.jobGroup.id", "")).getOrElse("")
          if (g == marker) seen.countDown() else jobs.incrementAndGet()
        }
      }
      spark.sparkContext.addSparkListener(l)
      try {
        body
        spark.sparkContext.setJobGroup(marker, "flush")
        spark.range(1).count()
        spark.sparkContext.clearJobGroup()
        assert(seen.await(60, TimeUnit.SECONDS), "listener bus never flushed")
        jobs.get()
      } finally spark.sparkContext.removeSparkListener(l)
    }
    val censusJobs = countJobs("graft-maint-census") {
      Similarity.indexHealth(spark, dir).collect(): Unit
    }
    val maintJobs = countJobs("graft-maint-noop") {
      val row = Similarity.maintainIndex(spark, dir, fresh).collect().head
      assert(!row.getAs[Boolean]("rebuilt"))
      assert(row.isNullAt(row.fieldIndex("new_path")))
    }
    val fs = new org.apache.hadoop.fs.Path(fresh)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(fresh)),
      "healthy store must not write a rebuild layout")
    assert(maintJobs <= censusJobs + 1,
      s"healthy maintainIndex ran $maintJobs jobs vs $censusJobs for the " +
        "bare census — it must add nothing beyond the health measurement")
  }

  test("maintainIndex on a drifted SQ8 store rebuilds the SAME layout " +
    "from the source corpus; without the source it fails by name") {
    val dir = java.nio.file.Files.createTempDirectory("maint_sq").toString
    // range starts at 1: id = 0 makes sin(i*id) the all-zero vector,
    // whose normalize() is NaN and destabilizes k-means realization
    val base = spark.range(1, 65).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)), i =>
        sin(i * col("id")).cast("double")).as("embedding"))
    Similarity.saveIvfSqIndex(base, dir, nlist = 4, kmeansIters = 2,
      replicate = 1)
    // plant the drift: duplicate the stored codes in place (frac 0.5)
    val assign = spark.read.parquet(s"$dir/corpus")
      .select(col("neighbor_id"), col("sq_code"), col("cell"))
      .localCheckpoint(true)
    assign.repartition(col("cell")).write.mode("append")
      .partitionBy("cell").parquet(s"$dir/corpus")
    // quantized codes are lossy: no source → by-name error, nothing built
    val e = intercept[IllegalArgumentException] {
      Similarity.maintainIndex(spark, dir, s"${dir}_x")
    }
    assert(e.getMessage.contains("ivf-sq8") &&
      e.getMessage.contains("source"))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sessionState.newHadoopConf())
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${dir}_x")))
    // with the source corpus the rebuild lands the SAME layout kind
    val fresh = s"${dir}_rebuilt"
    val row = Similarity.maintainIndex(spark, dir, fresh,
      kmeansIters = 2, replicate = 1, source = Some(base))
      .collect().head
    assert(row.getAs[Boolean]("rebuilt") &&
      row.getAs[String]("layout") == "ivf-sq8")
    val h = Similarity.indexHealth(spark, fresh).collect().head
    assert(h.getAs[String]("layout") == "ivf-sq8")
    // nlist carries over as the ORIGINAL store's realized centroid count
    // (k-means may realize fewer than requested on a degenerate fixture —
    // the carry-over contract is store → store, not request → store)
    assert(h.getAs[Int]("nlist") == row.getAs[Int]("nlist"),
      "nlist must carry over from the store")
    assert(h.getAs[Long]("rows_total") == 64 &&
      h.getAs[Long]("rows_appended") == 0)
    // the fresh store serves: stored kNN against itself finds itself
    val knn = Similarity.ivfSqKnnStored(spark, fresh,
      base.limit(4), k = 1, nprobe = 4)
    assert(knn.count() == 4)
  }

  test("rebuildStoredIndex preserves PQ code geometry (m, ksub) from " +
    "the stored codebooks") {
    val dir = java.nio.file.Files.createTempDirectory("maint_pq").toString
    val base = spark.range(1, 65).select(col("id").as("vec_id"),
      transform(sequence(lit(1), lit(8)), i =>
        sin(i * col("id")).cast("double")).as("embedding"))
    Similarity.saveIvfPqIndex(base, dir, nlist = 4, m = 4, ksub = 8,
      kmeansIters = 2, replicate = 1)
    val fresh = s"${dir}_rebuilt"
    val layout = Similarity.rebuildStoredIndex(spark, dir, fresh,
      source = Some(base), kmeansIters = 2, replicate = 1)
    assert(layout == "ivf-pq")
    val pq = spark.read.parquet(s"$fresh/pq")
      .agg(max("blk"), max("cid")).head()
    assert(pq.getInt(0) + 1 == 4 && pq.getInt(1) + 1 == 8,
      "rebuilt codebooks must keep the stored m and ksub")
  }

  // ------------------------------------------------------------------
  // membership stamp + parallel footer census
  // ------------------------------------------------------------------

  test("indexHealth attributes a SAME-TICK append by stamp membership — " +
    "no mtime-granularity dependence — across many files") {
    val dir = healthyIndex()
    // six immediate appends, no sleeps: membership attribution cannot
    // mis-file them however coarse the filesystem clock; ~28 corpus
    // files also push the census through the bounded thread pool.
    // localCheckpoint severs the lineage from the path — each write to
    // the same dir otherwise invalidates the cached scan and the next
    // append re-reads the grown corpus
    val assign = spark.read.parquet(s"$dir/corpus")
      .select(col("neighbor_id"), col("cv"), col("cell"))
      .localCheckpoint(true)
    (1 to 6).foreach(_ => Similarity.appendToIvfIndex(assign, dir))
    val h = Similarity.indexHealth(spark, dir).collect().head
    assert(h.getAs[Long]("rows_total") == 64L * 7)
    assert(h.getAs[Long]("rows_appended") == 64L * 6)
    assert(math.abs(h.getAs[Double]("appended_frac") - 6.0 / 7) < 1e-3)
    // cross-check the parallel census against a real scan
    assert(h.getAs[Long]("rows_total") ==
      spark.read.parquet(s"$dir/corpus").count())
  }

  // ------------------------------------------------------------------
  // streaming health hook
  // ------------------------------------------------------------------

  test("startNearDupDedup healthEveryN writes a per-batch health row " +
    "after the batch's append lands") {
    import graft.streaming.VecStreaming
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(16)(r.nextGaussian().toFloat)
    }
    val corpus = (0 until 20).map(i => (i.toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val indexDir = java.nio.file.Files
      .createTempDirectory("vec_health_idx").toString
    Similarity.saveIvfIndex(corpus, indexDir, nlist = 4, replicate = 1)
    val in = java.nio.file.Files.createTempDirectory("vec_health_in").toString
    val surv = java.nio.file.Files.createTempDirectory("vec_health_s").toString
    val ckpt = java.nio.file.Files.createTempDirectory("vec_health_c").toString
    Seq((100L, vec(300)), (101L, vec(400)))
      .toDF("vec_id", "embedding").coalesce(1)
      .write.mode("append").parquet(in)
    val stream = spark.readStream.schema(corpus.schema).parquet(in)
    val q = VecStreaming.startNearDupDedup(stream, "vec_id", "embedding",
      indexDir, surv, ckpt, threshold = 0.95, nprobe = 4, dim = 16,
      replicate = 1, healthEveryN = 1)
    q.awaitTermination(120000)
    val h = spark.read.parquet(s"$indexDir/health/batch=0").collect()
    assert(h.length == 1, "exactly one health row per checked batch")
    val row = h.head
    // the check runs AFTER the batch's own append: the streamed rows are
    // already counted on the appended side
    assert(row.getAs[Long]("rows_appended") >= 2)
    assert(row.getAs[Long]("rows_total") >= 22)
  }

  test("storeHealth: footer census over a per-batch store, compaction " +
    "recommendation fires past the live-batch bound and clears after " +
    "compactStore") {
    import graft.streaming.DocStreaming
    val dir = java.nio.file.Files.createTempDirectory("storehealth").toString
    (0 until 5).foreach { b =>
      Seq((b.toLong * 10, s"s$b")).toDF("doc_id", "s")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/batch=$b")
    }
    val h1 = DocStreaming.storeHealth(spark, dir, maxLiveBatches = 3)
      .collect().head
    assert(h1.getAs[Int]("batches_live") == 5)
    assert(!h1.getAs[Boolean]("has_compacted"))
    assert(h1.getAs[Long]("rows_total") == 5 &&
      h1.getAs[Long]("rows_live") == 5)
    assert(h1.getAs[Boolean]("recommend_compaction"))
    assert(h1.getAs[String]("reason").contains("compactStore"))
    DocStreaming.compactStore(spark, dir)
    val h2 = DocStreaming.storeHealth(spark, dir, maxLiveBatches = 3)
      .collect().head
    // compaction folds every batch except the newest into batch=-1
    assert(h2.getAs[Int]("batches_live") == 1)
    assert(h2.getAs[Boolean]("has_compacted"))
    assert(h2.getAs[Long]("rows_total") == 5)
    assert(h2.getAs[Long]("rows_compacted") == 4)
    assert(!h2.getAs[Boolean]("recommend_compaction"))
  }

  // ------------------------------------------------------------------
  // collision-proof scale replicas
  // ------------------------------------------------------------------

  test("replicateDocs ids stay unique and replica-disjoint past the old " +
    "10M stride; negative ids fail by name") {
    val docs = Seq((9999999L, "x y"), (10000001L, "p q"), (0L, "a b"))
      .toDF("doc_id", "text")
    val out = ScaleProbe.replicateDocs(docs, 3)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.map(_._1).distinct.length == 9,
      "replica ids must be unique for ids past the old additive stride")
    // replica-disjoint shingles: every token carries its replica suffix
    assert(out.forall { case (_, t) =>
      t.split(" ").forall(w => w.endsWith("_0") || w.endsWith("_1") ||
        w.endsWith("_2")) })
    val neg = Seq((-1L, "a")).toDF("doc_id", "text")
    val e = intercept[Exception] {
      ScaleProbe.replicateDocs(neg, 2).collect()
    }
    def messages(t: Throwable): String =
      if (t == null) "" else Option(t.getMessage).getOrElse("") +
        messages(t.getCause)
    assert(messages(e).contains("negative doc_id"))
  }
}

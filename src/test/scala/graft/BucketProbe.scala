package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic: max (band, sig) bucket sizes for the LSH band joins
  * at a given sf dir — informs the DefaultMaxBucket hot-bucket guard cap.
  * `sbt "Test/runMain graft.BucketProbe [sfDir]"` */
object BucketProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", "128m")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")

    // minhash band buckets (k=32, bands=8 defaults)
    val sig = graft.operators.Dedup.minhashSignatures(docs, "doc_id", "text")
    val r = 4
    val bandArr = array((0 until 8).map { b =>
      array((b * r until (b + 1) * r).map(i => col(s"mh$i")): _*)
    }: _*)
    val bandRows = sig.select(col("doc_id"), posexplode(bandArr).as(Seq("band", "sig")))
    println("[probe] minhash max bucket: " + bandRows.groupBy("band", "sig")
      .count().agg(max("count")).head().getLong(0))

    // simhash pigeonhole buckets (60 bits, 4 bands)
    val sh = graft.operators.Dedup.simhash(docs, "doc_id", "text")
    val nb = 4; val w = 15
    val bArr = array((0 until nb).map { b =>
      shiftright(col("simhash"), b * w).bitwiseAND((1L << w) - 1)
    }: _*)
    println("[probe] simhash max bucket: " + sh
      .select(col("doc_id"), posexplode(bArr).as(Seq("band", "bits")))
      .groupBy("band", "bits").count().agg(max("count")).head().getLong(0))

    // q59-style sign-LSH buckets at threshold 0.9 auto params (12 planes)
    val b59 = graft.operators.Similarity.lshBucket(
      graft.operators.Similarity.normalize(col("embedding")), 0, 12, 64)
    println("[probe] signlsh max bucket: " + emb.select(b59.as("b"))
      .groupBy("b").count().agg(max("count")).head().getLong(0))

    // timing: the bucketed embedding near-dup path (ScaleProbe's 1x step),
    // guarded vs unguarded to isolate the hot-bucket guard's cost
    (1 to 2).foreach { rep =>
      val t0 = System.nanoTime()
      val n = graft.operators.Similarity.nearDupPairs(emb, 0.9).count()
      println(f"[probe] neardup guarded   rep$rep ${(System.nanoTime() - t0) / 1e9}%.2fs rows=$n")
      val t1 = System.nanoTime()
      val m = graft.operators.Similarity.nearDupPairs(emb, 0.9, maxBucket = None).count()
      println(f"[probe] neardup unguarded rep$rep ${(System.nanoTime() - t1) / 1e9}%.2fs rows=$m")
    }
    spark.stop()
  }
}

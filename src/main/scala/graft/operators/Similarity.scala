package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorExpressions.dotp

/** Similarity search over an embedding column (`Array[Float]`) — north-star
  * extension. Two paths:
  *
  *  - [[bruteKnn]]: exact cosine top-k. The join is a cartesian
  *    (queries × corpus) but the *query side is broadcast* — at 100 TB the
  *    corpus streams through executors once, no shuffle of the corpus at
  *    all; per-partition top-k via the aggregation-pushdown of the window
  *    would still shuffle, so for large k prefer the candidate cut first.
  *  - [[lshKnn]]: random-hyperplane sign-LSH bucketing — candidates share a
  *    bucket in at least one of `tables` hash tables; only candidates get
  *    the exact cosine. Hyperplanes are deterministic pseudo-random
  *    (md5-derived), so results are reproducible across runs and engines.
  *
  * Dot products use `zip_with` + `aggregate` over doubles — codegen'd
  * native expressions, no UDF.
  */
object Similarity {

  /** Dot product of two double-array columns — a custom codegen'd Catalyst
    * expression: the higher-order-function formulation
    * (`aggregate(zip_with(...))`) is CodegenFallback and ~15× slower on
    * n²-pair workloads (graft.functions.DotProduct). */
  def dot(x: Column, y: Column): Column = dotp(x, y)

  /** Cosine similarity of two Array[Float] columns, computed in double
    * (cast first: float math would lose too much for stable ranking). */
  def cosine(a: Column, b: Column): Column = {
    def d(x: Column, y: Column): Column =
      aggregate(
        zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    d(a, b) / sqrt(d(a, a)) / sqrt(d(b, b))
  }

  /** L2-normalize a float-array column into a double array — done ONCE per
    * vector so pairwise similarity is a single dot product instead of
    * three (the norms would otherwise be recomputed for every pair: at n²
    * pairs that's the difference between O(n²d) and O(3n²d + casts)). */
  def normalize(vec: Column): Column = {
    val dv = transform(vec, _.cast("double"))
    val norm = sqrt(aggregate(transform(dv, x => x * x), lit(0.0), (a, v) => a + v))
    transform(dv, x => x / norm)
  }

  /** Exact brute-force top-k: for each query vector, the k nearest corpus
    * vectors by cosine (ties broken by id — fully deterministic). Query
    * side is expected small → broadcast; corpus is scanned once. */
  def bruteKnn(queries: DataFrame, corpus: DataFrame, k: Int,
               qId: String = "vec_id", qVec: String = "embedding",
               cId: String = "vec_id", cVec: String = "embedding"): DataFrame = {
    val q = queries.select(col(qId).as("query_id"), normalize(col(qVec)).as("qv"))
    val c = corpus.select(col(cId).as("neighbor_id"), normalize(col(cVec)).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", dot(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Deterministic pseudo-random hyperplane for (table, plane): md5-derived
    * components in [-0.5, 0.5), materialized driver-side as a literal array
    * (tiny: planes × dim doubles) so the projection is one codegen'd dot
    * product per row instead of per-element interpreted lambdas. */
  private def planeVector(table: Int, plane: Int, dim: Int): Array[Double] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(dim) { i =>
      val hex = md.digest(s"$table|$plane|$i".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      java.lang.Long.parseLong(hex, 16).toDouble / (1L << 60).toDouble - 0.5
    }
  }

  /** Sign-LSH bucket id for one table: `planes` sign bits of projections
    * onto deterministic hyperplanes. */
  def lshBucket(vec: Column, table: Int, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val plane = lit(planeVector(table, p, dim))
      when(dotp(vec, plane) > 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** Approximate top-k via sign-LSH: candidates = corpus vectors sharing a
    * bucket with the query in any of `tables` tables; exact cosine + top-k
    * over candidates only. At scale the corpus bucket ids are precomputed
    * once (a column write), and each query probes `tables` buckets — the
    * scan is a semi-join on bucket keys instead of a full pass. */
  def lshKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             tables: Int = 8, planes: Int = 8, dim: Int = 64): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      normalize(col("embedding")).as("qv"))
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      normalize(col("embedding")).as("cv"))
    val qB = (0 until tables).map(t =>
      q.select(col("query_id"), col("qv"), lit(t).as("t"),
        lshBucket(col("qv"), t, planes, dim).as("b"))).reduce(_ unionByName _)
    val cB = (0 until tables).map(t =>
      c.select(col("neighbor_id"), col("cv"), lit(t).as("t"),
        lshBucket(col("cv"), t, planes, dim).as("b"))).reduce(_ unionByName _)
    val cands = cB.join(broadcast(qB), Seq("t", "b"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "qv", "neighbor_id", "cv").distinct()
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    cands
      .withColumn("cos", dot(col("qv"), col("cv")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** IVF (inverted-file) approximate kNN — the cell-probe scale path:
    * `nlist` centroids (deterministic corpus sample — a k-means refinement
    * would drop in here without changing the query path), every corpus
    * vector assigned to its nearest centroid (one broadcast argmax pass),
    * each query probing its `nprobe` nearest cells; exact cosine + top-k
    * over the probed cells only. At 100 TB the corpus is *stored*
    * partitioned by cell id, so a query reads nprobe/nlist of the data —
    * the scan reduction LSH can't give. */
  def ivfKnn(queries: DataFrame, corpus: DataFrame, k: Int,
             nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val c = corpus.select(col("vec_id").as("neighbor_id"),
      normalize(col("embedding")).as("cv"))
    val q = queries.select(col("vec_id").as("query_id"),
      normalize(col("embedding")).as("qv"))
    // deterministic centroid sample by id hash — no global sort/window
    // (a row_number over an unpartitioned window would funnel the whole
    // corpus through one task, the opposite of the scale path)
    val n = corpus.count()
    val step = math.max(n / nlist, 1L)
    val cents = c
      .filter(pmod(xxhash64(col("neighbor_id")), lit(step)) === 0)
      .limit(nlist)
      .select(col("neighbor_id").as("cent_id"), col("cv").as("centv"))

    def assign(df: DataFrame, vec: String, out: String, top: Int): DataFrame = {
      val w = Window.partitionBy(df.columns.head)
        .orderBy(col("sim").desc, col("cent_id").asc)
      df.join(broadcast(cents), expr("true"))
        .withColumn("sim", dotp(col(vec), col("centv")))
        .withColumn("r", row_number().over(w))
        .filter(col("r") <= top)
        .drop("sim", "r", "centv")
        .withColumnRenamed("cent_id", out)
    }

    val assigned = assign(c, "cv", "cell", 1)
    val probed = assign(q, "qv", "cell", nprobe)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    probed.join(assigned, "cell")
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dotp(col("qv"), col("cv")).as("cos"))
      .distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "rank", "cos")
  }

  /** Embedding near-duplicate pairs: all corpus pairs with cosine ≥
    * threshold. Exact (cross-join) form — at scale, bucket with
    * [[lshBucket]] first exactly like [[lshKnn]]. */
  def nearDupPairs(corpus: DataFrame, threshold: Double,
                   idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val normed = corpus.select(col(idCol).as("i"), normalize(col(vecCol)).as("va"))
    val a = normed
    val b = normed.toDF("j", "vb")
    a.join(b, col("i") < col("j"))
      .withColumn("cos", dot(col("va"), col("vb")))
      .filter(col("cos") >= threshold)
      .select("i", "j", "cos")
  }
}

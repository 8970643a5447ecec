package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means clustering over embedding columns (north-star
  * extension; no reference-repo counterpart) — the curation primitive
  * behind semantic sharding, SemDeDup-style pruning, and
  * cluster-balanced ("diversity") sampling of training corpora.
  *
  * Spherical Lloyd's on L2-normalized vectors, sharing the IVF coarse
  * quantizer's machinery ([[Similarity.trainCentroids]]): deterministic
  * id-hash seeds (no RNG — same clusters on every run and cluster
  * size), each iteration ONE distributed aggregation plus a tiny
  * k × dim driver collect, assignment a single codegen'd argmax
  * projection over centroid literals. Nothing here shuffles the
  * vectors themselves: at 100 TB training auto-thins to a bounded
  * deterministic hash sample (`maxTrainRows` — centroids are
  * statistics, not an index) and assignment is a scan-side map.
  */
object Clustering {

  /** Train `k` spherical centroids. Deterministic; `iters` Lloyd
    * rounds over at most `maxTrainRows` hash-thinned input rows
    * (centroids are statistics — training never needs the full corpus;
    * a corpus under the cap trains bit-identically unsampled). */
  def train(df: DataFrame, k: Int, iters: Int = 3,
            idCol: String = "vec_id", vecCol: String = "embedding",
            maxTrainRows: Long = Similarity.DefaultMaxTrainRows)
  : Array[Array[Double]] = {
    val cv = df.select(col(idCol).as("neighbor_id"),
      Similarity.normalize(col(vecCol)).as("cv")).persist()
    try Similarity.trainCentroids(cv, k, iters, maxTrainRows)
    finally cv.unpersist(): Unit
  }

  /** Assign every row its nearest centroid: one codegen'd projection —
    * input columns preserved, `cluster` appended. */
  def assign(df: DataFrame, centroids: Array[Array[Double]],
             vecCol: String = "embedding"): DataFrame =
    df.withColumn("cluster",
      element_at(Similarity.topCells(
        Similarity.normalize(col(vecCol)), centroids, 1), 1))

  /** Within-cluster inertia (sum of squared L2 distance to the OWN
    * nearest centroid, on the unit sphere): the Lloyd objective. One
    * aggregation; the per-row term is `2 − 2·(v·c_nearest)` for unit
    * vectors, computed from the same argmax structs as [[assign]]. */
  def inertia(df: DataFrame, centroids: Array[Array[Double]],
              vecCol: String = "embedding"): Double = {
    val v = Similarity.normalize(col(vecCol))
    val best = array_max(array(centroids.toSeq.map(c =>
      Similarity.dot(v, lit(c))): _*))
    df.filter(col(vecCol).isNotNull)
      .select(sum(lit(2.0) - lit(2.0) * best).as("i"))
      .head().getDouble(0)
  }

  /** SemDeDup-style semantic pruning (Abbas et al., 2023): cluster the
    * embeddings, enumerate cosine-≥-threshold pairs WITHIN each cluster
    * only, transitively close, keep the min-id representative per
    * group. Candidate volume is Σ cluster-size² instead of n² — the
    * published trade: pairs split across clusters are missed, so recall
    * against exact all-pairs dedup is < 1 by design and improves with
    * `replicate` (each vector joins its `replicate` nearest cells, the
    * IVF multi-probe move; near-identical vectors rank cells
    * near-identically, so true near-dup pairs rarely split).
    * ClusteringSpec gates recall on a planted fixture.
    *
    * Scale shape: assignment is a scan-side projection; the pair join
    * is an equi-join on the cell id (vectors shuffle once, keyed by
    * cell); closure + canonical drop are the shared
    * [[Dedup.connectedComponents]]/[[Dedup.dropNearDups]] machinery.
    *
    * @return (survivors — input rows minus dropped near-dups,
    *         the verified within-cluster pairs (i, j, cos)) */
  def semanticDedup(df: DataFrame, centroids: Array[Array[Double]],
                    threshold: Double, replicate: Int = 2,
                    idCol: String = "vec_id",
                    vecCol: String = "embedding")
  : (DataFrame, DataFrame) = {
    require(threshold > -1 && threshold < 1,
      s"threshold $threshold not in (-1, 1)")
    // materialized before fanning out to the two self-join sides: the
    // centroid-literal projection defeats plan canonicalization (the
    // guardedBucketPairs lesson), so without it the scan + normalize +
    // topCells argmax ran once per side; the checkpointed relation is
    // (id, vec, cell) — the bytes the join shuffle moves anyway
    val rows = df
      .select(col(idCol).as("__id"),
        Similarity.normalize(col(vecCol)).as("__nv"))
      .withColumn("__cell", explode(Similarity.topCells(col("__nv"),
        centroids, math.max(replicate, 1))))
      .transform(graft.util.Stage.materialize)
    val pairs = rows.toDF("i", "iv", "__cell")
      .join(rows.toDF("j", "jv", "__cell"), "__cell")
      .filter(col("i") < col("j"))
      .withColumn("cos", Similarity.dot(col("iv"), col("jv")))
      .filter(col("cos").isNotNull && !isnan(col("cos")) &&
        col("cos") >= threshold)
      .select("i", "j", "cos")
      .distinct() // replicate > 1 finds a pair once per shared cell
    (Dedup.dropNearDups(df, pairs, idCol), pairs)
  }

  /** Prototype/outlier pruning (the SSL-prototype metric of Sorscher et
    * al. 2022, "Beyond neural scaling laws", as deployed in D4, Tirumala
    * et al. 2023): score every row by cosine to its OWN cluster centroid
    * (rounded to 4 decimals — `proto`), then drop, per cluster, the
    * `pruneFrac` MOST prototypical rows (highest cosine — the redundant,
    * "easy" mass near the cluster core) and the `outlierFrac` LEAST
    * prototypical (far tail — noise). Keeps the informative shell in
    * between, the published big-data pruning recipe.
    *
    * Cut semantics are deterministic and engine-portable: with
    * dropTop = floor(pruneFrac·n) and dropBot = floor(outlierFrac·n)
    * (IEEE-double products), a cluster keeps rows whose rounded cosine
    * lies in [s_(dropBot+1), s_(n−dropTop)] (1-based order statistics of
    * the rounded scores) — ties KEEP, so at most the requested fractions
    * are dropped and membership never depends on partitioning.
    *
    * Clusters come from `clusterCol` when given (values must index
    * `centroids`; out-of-range raises a named error) or from [[assign]]
    * otherwise. Rows with a NULL vector (or NULL cluster) are dropped —
    * they have no prototypicality. Output: input rows + `cluster` +
    * `proto`.
    *
    * Scale shape: scoring is one codegen'd projection (k dots against
    * centroid literals); per-cluster cuts are exact order statistics
    * WITHOUT any per-cluster sort — cosine rounded to 4 decimals makes
    * the (cluster, score) histogram ≤ 20,001·k cells
    * ([[Quality.groupScoreThresholds]]'s range-bound doctrine), one
    * bounded aggregation + a literal threshold map. */
  def prototypePrune(df: DataFrame, centroids: Array[Array[Double]],
                     pruneFrac: Double, outlierFrac: Double = 0.0,
                     vecCol: String = "embedding",
                     clusterCol: Option[String] = None,
                     maxHistRows: Int = 1 << 20): DataFrame = {
    require(pruneFrac >= 0 && pruneFrac < 1,
      s"pruneFrac must lie in [0, 1), got $pruneFrac")
    require(outlierFrac >= 0 && pruneFrac + outlierFrac < 1,
      s"pruneFrac + outlierFrac must stay below 1, got " +
        s"$pruneFrac + $outlierFrac")
    val k = centroids.length
    val withCl = clusterCol match {
      // NULL clusters DROP (the documented contract — and concat over a
      // NULL value would otherwise null the raise_error message itself);
      // non-NULL out-of-range values still fail by name
      case Some(c) => df.where(col(c).isNotNull).withColumn("cluster",
        when(col(c).cast("long").between(0, k - 1), col(c).cast("int"))
          .otherwise(raise_error(concat(
            lit(s"prototypePrune: cluster column '$c' value "),
            col(c).cast("string"), lit(s" outside [0, $k)")))))
      case None => assign(df, centroids, vecCol)
    }
    val nv = Similarity.normalize(col(vecCol))
    // ONE dot product per row against the row's own centroid (2-D literal
    // indexed by cluster) — an `array(dot(c0), dot(c1), …)[cluster]`
    // projection computes all k dots per row before indexing, a measured
    // k× FLOP waste (the 8× probe's slowest line at k=16, ~30 s → ~7 s)
    val tensor = typedLit(centroids.map(_.toSeq).toSeq)
    val scored = withCl
      .withColumn("proto",
        round(Similarity.dot(nv, element_at(tensor, col("cluster") + 1)), 4))
    val thr = Quality.groupScoreThresholds(scored, "cluster", "proto",
      n => Seq(math.floor(outlierFrac * n).toLong + 1,
        n - math.floor(pruneFrac * n).toLong),
      maxHistRows)
    val thrLit = typedLit(thr)
    val bounds = element_at(thrLit, col("cluster").cast("string"))
    scored.filter(col("proto") >= element_at(bounds, 1) &&
      col("proto") <= element_at(bounds, 2))
  }
}

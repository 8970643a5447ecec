package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Entity resolution (record linkage): group records that refer to the
  * same real-world entity — blocking, fuzzy matching, transitive
  * closure, and a stable entity id (north-star extension; no
  * reference-repo counterpart).
  *
  * Pipeline shape, each stage linear in its input:
  *
  *  1. BLOCK + MATCH — [[FuzzyJoin.pairsWithinDistance]] over the
  *     DISTINCT (block, key) combinations: candidate pairs come from
  *     prefix-gram equi-joins inside a block, verified with the
  *     early-exit `levenshtein` builtin.
  *  2. EDGES — identical-key record groups contribute STAR edges
  *     (group-min id → member), one per member, and each fuzzy key pair
  *     contributes ONE representative edge (group-min ↔ group-min) —
  *     never member × member fan-out, so the edge count is linear in
  *     records + key pairs while the transitive closure is unchanged
  *     (members reach each other through their representative).
  *  3. CLOSE — [[Dedup.connectedComponents]] min-label propagation;
  *     the entity id is the smallest record id in the component.
  *
  * Output of [[resolve]]: the input records with an `entity_id` column
  * (records matching nothing keep their own id). Golden-record
  * aggregation is then an ordinary `groupBy("entity_id")` — see
  * q95_entity_resolution.
  */
object EntityResolution {

  /** Assign an `entity_id` to every record: transitive closure of
    * "same `blockCol` and `keyCol` within `maxDist` edits".
    *
    * @param records input; `idCol` must be a unique numeric id
    * @param keyCol  fuzzy-matched string key (e.g. a name)
    * @param blockCol exact-match blocking column; pairs never cross it
    */
  def resolve(records: DataFrame, idCol: String, keyCol: String,
              blockCol: String, maxDist: Int, q: Int = 2): DataFrame = {
    val recs = records.withColumn("__rid", col(idCol))
    // one representative (min id) per distinct (block, key)
    val groups = recs
      .filter(col(keyCol).isNotNull)
      .groupBy(col(blockCol), col(keyCol))
      .agg(min(col("__rid")).as("__rep"))
    // star edges inside an identical-key group: rep -> member
    val star = recs
      .join(groups, Seq(blockCol, keyCol))
      .filter(col("__rid") =!= col("__rep"))
      .select(col("__rep").as("i"), col("__rid").as("j"))
    // one representative edge per fuzzy key pair
    val keyPairs = FuzzyJoin.pairsWithinDistance(
      recs.select(col(blockCol), col(keyCol)), keyCol, maxDist, q,
      blockCol = Some(blockCol))
    val repOf = groups.select(col(blockCol), col(keyCol), col("__rep"))
    val cross = keyPairs
      .join(repOf.withColumnRenamed(keyCol, "a")
        .withColumnRenamed("__rep", "__repA"), Seq(blockCol, "a"))
      .join(repOf.withColumnRenamed(keyCol, "b")
        .withColumnRenamed("__rep", "__repB"), Seq(blockCol, "b"))
      .select(col("__repA").as("i"), col("__repB").as("j"))
    val comp = Dedup.connectedComponents(star.unionByName(cross))
    recs
      .join(comp.select(col("doc_id").as("__rid"),
        col("component").as("__comp")), Seq("__rid"), "left")
      .withColumn("entity_id", coalesce(col("__comp"), col("__rid")))
      .drop("__rid", "__comp")
  }
}

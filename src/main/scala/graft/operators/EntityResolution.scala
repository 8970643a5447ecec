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
              blockCol: String, maxDist: Int, q: Int = 2): DataFrame =
    resolveMulti(records, idCol, keyCol, Seq(Seq(blockCol)), maxDist, q)

  /** Multi-pass (OR-of-blocking-keys) resolution: a pair matches when
    * its keys are within `maxDist` edits AND the records agree on EVERY
    * column of AT LEAST ONE pass in `blockPasses`. Real linkage data
    * has dirty block keys — a record whose nation is typo'd can never
    * match under single-key nation blocking, but still matches under a
    * name-prefix or zip pass. Production record linkage therefore
    * unions the candidate sets of several cheap passes (OR-of-blocking)
    * before one shared transitive closure.
    *
    * Scale shape: each pass contributes star + representative edges
    * exactly like [[resolve]] (linear in records + key pairs per pass
    * — never member × member), the edge sets union, and ONE closure
    * runs over the union. Cost is ∝ Σ per-pass candidate volume; a
    * derived pass key (name prefix, phonetic code) is just a column the
    * caller precomputes. A NULL in any pass column excludes the record
    * from that pass only (equi-join semantics) — it can still match
    * through the other passes.
    */
  def resolveMulti(records: DataFrame, idCol: String, keyCol: String,
                   blockPasses: Seq[Seq[String]], maxDist: Int,
                   q: Int = 2): DataFrame = {
    require(blockPasses.nonEmpty, "at least one blocking pass required")
    require(blockPasses.forall(_.nonEmpty),
      "every blocking pass needs at least one column")
    val recs = records.withColumn("__rid", col(idCol))
    // Each pass derives its own keys + gram order INSIDE one lazy plan —
    // deliberately NOT the shared eagerly-materialized gram order that
    // resolveDeltaMulti uses: there the order feeds THREE consumers per
    // pass (cross scan, adoption, within-delta pairs) and sharing wins,
    // but here it has one consumer and the localCheckpoint barrier
    // serializes the passes (measured: q101 3.5 s → 5.1 s shared).
    // passes are independent until the edge union, and each pass's eager
    // leg (keyRows + gram-order materialization inside
    // pairsWithinDistanceBlocked) is a chain of small jobs — submit the
    // passes concurrently (Par: guide-§2.6 job overlap) instead of
    // serializing 3× the per-job latency on the driver thread
    val sc = records.sparkSession.sparkContext
    val edges = graft.util.Par.run(blockPasses.map { pass => () =>
      graft.util.Jobs.labeled(sc, s"er: pass keys [${pass.mkString(",")}]")(
        passEdges(recs, keyCol, pass,
          FuzzyJoin.pairsWithinDistanceBlocked(
            recs.select((pass.map(col) :+ col(keyCol)): _*),
            keyCol, maxDist, q, pass)))
    }).reduce(_ unionByName _)
    graft.util.Jobs.labeled(sc, "er: closure")(labelByClosure(recs, edges))
  }

  /** Standard DERIVED blocking passes — the "caller precomputes the
    * pass column" contract as API, not folklore. Each helper appends
    * one derived key column and returns (frame, pass spec) ready for
    * [[resolveMulti]]'s `blockPasses`:
    *
    * {{{
    * val (r1, sdx) = EntityResolution.soundexPass(records, "name")
    * EntityResolution.resolveMulti(r1, "id", "name",
    *   Seq(Seq("nation"), sdx), maxDist = 1)
    * }}}
    *
    * Derived keys are ordinary columns, so every pass stays an
    * equi-join (linear candidate generation); compose helpers by
    * chaining — each only adds a column. A NULL key yields a NULL pass
    * column, excluding the record from that pass only. */
  def soundexPass(records: DataFrame, keyCol: String,
                  as: String = "__soundex"): (DataFrame, Seq[String]) =
    (records.withColumn(as, soundex(col(keyCol))), Seq(as))

  /** First `n` characters of `keyCol` as a blocking pass — catches
    * suffix-end edits that break exact blocking. */
  def prefixPass(records: DataFrame, keyCol: String, n: Int,
                 as: String = "__prefix"): (DataFrame, Seq[String]) = {
    require(n >= 1, s"prefix length must be >= 1, got $n")
    (records.withColumn(as, substring(col(keyCol), 1, n)), Seq(as))
  }

  /** Last `n` characters of `keyCol` as a blocking pass — catches
    * prefix-end edits (q101's name-suffix construction). */
  def suffixPass(records: DataFrame, keyCol: String, n: Int,
                 as: String = "__suffix"): (DataFrame, Seq[String]) = {
    require(n >= 1, s"suffix length must be >= 1, got $n")
    (records.withColumn(as, substring(col(keyCol), -n, n)), Seq(as))
  }

  /** One blocking pass's edge set: star edges inside identical-key
    * groups plus one representative edge per fuzzy `keyPairs` row —
    * linear in records + key pairs, never member × member. `recs` must
    * carry `__rid`; `keyPairs` must be the (pass…, a, b, dist) shape of
    * [[FuzzyJoin.pairsWithinDistanceBlocked]] over the same pass. */
  private def passEdges(recs: DataFrame, keyCol: String, pass: Seq[String],
                        keyPairs: DataFrame): DataFrame = {
    val bcols = pass.map(col)
    // one representative (min id) per distinct (block…, key)
    val groups = recs
      .filter(col(keyCol).isNotNull)
      .groupBy((bcols :+ col(keyCol)): _*)
      .agg(min(col("__rid")).as("__rep"))
    // star edges inside an identical-key group: rep -> member
    val star = recs
      .join(groups, pass :+ keyCol)
      .filter(col("__rid") =!= col("__rep"))
      .select(col("__rep").as("i"), col("__rid").as("j"))
    val cross = keyPairs
      .join(groups.withColumnRenamed(keyCol, "a")
        .withColumnRenamed("__rep", "__repA"), pass :+ "a")
      .join(groups.withColumnRenamed(keyCol, "b")
        .withColumnRenamed("__rep", "__repB"), pass :+ "b")
      .select(col("__repA").as("i"), col("__repB").as("j"))
    star.unionByName(cross)
  }

  /** Transitive closure + labeling: every record gets the smallest id
    * reachable through `edges` (its own when isolated). */
  private def labelByClosure(recs: DataFrame, edges: DataFrame): DataFrame = {
    val comp = Dedup.connectedComponents(edges)
    recs
      .join(comp.select(col("doc_id").as("__rid"),
        col("component").as("__comp")), Seq("__rid"), "left")
      .withColumn("entity_id", coalesce(col("__comp"), col("__rid")))
      .drop("__rid", "__comp")
  }

  /** INCREMENTAL resolution: label a DELTA of records against a STORED
    * resolved corpus (the output shape of [[resolve]] — records with an
    * `entity_id` column) without relabeling anything stored — the
    * q58/q59 incremental-dedup doctrine applied to record linkage.
    *
    * Semantics: a delta component (transitive closure WITHIN the delta,
    * [[resolve]]'s edge construction) that fuzzy-matches one or more
    * stored records adopts the SMALLEST matched stored `entity_id`;
    * components matching nothing become new entities labeled by their
    * smallest record id. Stored labels are frozen — if a delta record
    * bridges two stored entities they are NOT merged (run a batch
    * [[resolve]] compaction to heal bridges, the same rebuild contract
    * as the stored dedup indexes).
    *
    * Scale shape: the corpus contributes one (block, key) → min
    * entity_id aggregation and the cross-candidate scan
    * ([[FuzzyJoin.crossPairsWithinDistance]] — corpus keys are bucketed
    * and scanned, never paired among themselves); the closure runs on
    * delta-sized node sets only.
    */
  def resolveDelta(resolvedCorpus: DataFrame, delta: DataFrame,
                   idCol: String, keyCol: String, blockCol: String,
                   maxDist: Int, q: Int = 2): DataFrame =
    resolveDeltaMulti(resolvedCorpus, delta, idCol, keyCol,
      Seq(Seq(blockCol)), maxDist, q)

  /** Multi-pass incremental resolution — [[resolveMulti]]'s
    * OR-of-blocking-keys applied to the delta path: a delta record
    * adopts the smallest stored `entity_id` reachable through ANY pass
    * (cross-corpus fuzzy match per pass), and the within-delta closure
    * runs over the union of per-pass edge sets, exactly like the batch
    * operator. Stored labels stay frozen ([[resolveDelta]]'s bridge
    * contract — [[graft.streaming.ErStreaming.healStore]] merges
    * bridges in batch).
    *
    * Scale shape per pass: one corpus (pass…, key) → min-entity
    * aggregation, one bucketed cross-candidate scan, one delta edge
    * set — all linear; ONE gram order (the union over every pass and
    * side — any consistent order keeps the recall-1 prefix guarantee)
    * and ONE delta-sized closure are shared across passes. */
  def resolveDeltaMulti(resolvedCorpus: DataFrame, delta: DataFrame,
                        idCol: String, keyCol: String,
                        blockPasses: Seq[Seq[String]], maxDist: Int,
                        q: Int = 2): DataFrame = {
    require(blockPasses.nonEmpty, "at least one blocking pass required")
    require(blockPasses.forall(_.nonEmpty),
      "every blocking pass needs at least one column")
    val recs = delta.withColumn("__rid", col(idCol))
    val sc = delta.sparkSession.sparkContext
    // per-pass corpus adoption table + key relation: ckeys carries the
    // gram set, so ONE checkpointed relation serves both the adoption
    // join (pass…, key, __ent) and the cross-scan key side (pass…, __k,
    // __gs) — the previous shape chained a SECOND checkpoint (keyRows
    // over ckeys) whose distinct exchange was pure redundancy (the
    // groupBy already dedupes per (pass…, key)) and whose barrier cost
    // one more serial action per pass. The corpus leg and the delta leg
    // of every pass stay independent — 2·passes eager materializations
    // submitted concurrently (Par: guide-§2.6 job overlap); measured 94
    // near-idle sequential jobs on q107's three-pass delta resolve.
    val keyLegs = graft.util.Par.run(blockPasses.map { pass => () =>
      graft.util.Jobs.labeled(sc,
        s"er-delta: corpus keys [${pass.mkString(",")}]") {
        resolvedCorpus
          .filter(col(keyCol).isNotNull)
          .groupBy((pass.map(col) :+ col(keyCol)): _*)
          .agg(min(col("entity_id")).as("__ent"))
          .withColumn("__gs", FuzzyJoin.gramSet(col(keyCol), q))
          .transform(graft.util.Stage.materialize)
      }
    } ++ blockPasses.map { pass => () =>
      graft.util.Jobs.labeled(sc,
        s"er-delta: delta keys [${pass.mkString(",")}]") {
        FuzzyJoin.keyRowsOf(
          delta.select((pass.map(col) :+ col(keyCol)): _*), keyCol, q, pass)
      }
    })
    val passData = blockPasses.zipWithIndex.map { case (pass, i) =>
      val ckeysG = keyLegs(i)
      val kCorpus = ckeysG.select((pass.map(col) :+
        col(keyCol).as("__k") :+ col("__gs")): _*)
      (pass, ckeysG.drop("__gs"), kCorpus, keyLegs(blockPasses.size + i))
    }
    // ONE union gram order across every pass and both sides
    val counts = graft.util.Jobs.labeled(sc, "er-delta: gram order")(
      FuzzyJoin.gramCountsOf(
        passData.flatMap { case (_, _, kc, kd) => Seq(kc, kd) }: _*))
    // smallest adopted stored entity per delta RECORD, over all passes
    val adoptPlan = passData.map { case (pass, ckeys, kCorpus, kDelta) =>
      val cross = FuzzyJoin.crossPairsFromKeys(kCorpus, kDelta, counts,
        maxDist, q, pass)
      val adoptByKey = cross
        .join(ckeys.withColumnRenamed(keyCol, "a"), pass :+ "a")
        .groupBy((pass.map(col) :+ col("b").as(keyCol)): _*)
        .agg(min(col("__ent")).as("__adopt"))
      recs.join(adoptByKey, pass :+ keyCol)
        .select(col("__rid"), col("__adopt"))
    }.reduce(_ unionByName _)
      .groupBy("__rid").agg(min(col("__adopt")).as("__adopt"))
    // within-delta closure over the union of per-pass edge sets
    val edges = passData.map { case (pass, _, _, kDelta) =>
      passEdges(recs, keyCol, pass,
        FuzzyJoin.pairsFromKeys(kDelta, counts, maxDist, q, pass))
    }.reduce(_ unionByName _)
    // the adoption aggregation and the within-delta closure share no
    // inputs past `counts` — materialize them concurrently (guide §2.6):
    // the adoption's cross-scan stages back-fill cores the closure's
    // small serial rounds (or driver-side union-find) leave idle. The
    // adoption table is record-sized (one row per adopted delta record).
    val legs = graft.util.Par.run(Seq(
      () => graft.util.Jobs.labeled(sc, "er-delta: adoption")(
        adoptPlan.transform(graft.util.Stage.materialize)),
      () => graft.util.Jobs.labeled(sc, "er-delta: closure")(
        Dedup.connectedComponents(edges))))
    val (adopt, comp) = (legs(0), legs(1))
    // propagate the component-min adoption to every member. Derived from
    // the closure labels and the (small, checkpointed) adoption table
    // alone, so the final plan embeds the record-side join ONCE — the
    // previous shape joined the full labeled relation twice (build side
    // of this aggregation AND probe side of the final join), evaluating
    // the delta scan + label join per side.
    val compOf = comp.select(col("doc_id").as("__rid"),
      col("component").as("__cmp"))
    val compAdopt = adopt
      .join(compOf, Seq("__rid"), "left")
      .groupBy(coalesce(col("__cmp"), col("__rid")).as("__comp"))
      .agg(min(col("__adopt")).as("__compAdopt"))
    recs
      .join(compOf, Seq("__rid"), "left")
      .withColumn("__comp", coalesce(col("__cmp"), col("__rid")))
      // LEFT join: components with no adopted member have no compAdopt
      // row (the old inner join saw them as null-__compAdopt rows built
      // from the full labeled relation) — coalesce restores the same
      // "new entity keeps its component min id" labeling
      .join(compAdopt, Seq("__comp"), "left")
      .withColumn("entity_id", coalesce(col("__compAdopt"), col("__comp")))
      .drop("__rid", "__cmp", "__comp", "__compAdopt")
  }
}

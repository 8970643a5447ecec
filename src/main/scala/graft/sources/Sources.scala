package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Source-side ETL helpers (SURVEY §2.1): the reference reads in-memory R
  * objects and CSV (inst/cubes/cranlogs.R:56-83); the Spark engine gets
  * parquet/csv/json via `spark.read` — these helpers add the star-schema
  * ETL conventions on top (surrogate keys, dims-by-distinct, update-join
  * lookup). */
object Sources {

  /** Read a table in any Spark-supported format. Prefer passing `schema`:
    * csv/json schema inference costs a full extra pass over the data —
    * never acceptable at 100 TB. */
  def read(spark: SparkSession, path: String, format: String = "parquet",
           schema: Option[StructType] = None,
           options: Map[String, String] = Map.empty): DataFrame = {
    val r = spark.read.format(format).options(options)
    schema.fold(r)(s => r.schema(s)).load(path)
  }

  /** Read the events fixture robustly across fixture generations. Older
    * fixtures carried parquet TIMESTAMP(NANOS) — no native Spark type, so
    * it arrives as long (spark.sql.legacy.parquet.nanosAsLong) and is
    * truncated to a micros timestamp with integer division (matching
    * DuckDB's ns→µs truncation). Newer fixtures carry TIMESTAMP(MICROS),
    * which Spark may read as TIMESTAMP_NTZ (inferTimestampNTZ) — cast to
    * the session-local TimestampType so every downstream operator
    * (windows, watermarks, java.sql.Timestamp encoders) sees one type.
    * Session timezone is pinned to UTC by every entrypoint, so the
    * NTZ→LTZ cast is wall-clock-identity. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventTs(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** ts-column normalization used by [[readEvents]]; exposed separately
    * for streaming readers that must apply it after `readStream`. */
  def normalizeEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast("timestamp"))
    }

  def readCsv(spark: SparkSession, path: String,
              schema: Option[StructType] = None,
              header: Boolean = true, delimiter: String = ","): DataFrame =
    read(spark, path, "csv", schema,
      Map("header" -> header.toString, "delimiter" -> delimiter) ++
        (if (schema.isEmpty) Map("inferSchema" -> "true") else Map.empty))

  /** Dense integer surrogate key by natural-key order — the reference's
    * `add.surrogate.key` (S11, R/populate.R:1-7). NOTE the global
    * Window.orderBy funnels through a single partition: correct and fine
    * for dimension tables (small by star-schema assumption); for a huge
    * table use [[surrogateKeyDistributed]]. */
  def withSurrogateKey(df: DataFrame, naturalKey: String,
                       idName: String = "id"): DataFrame =
    df.withColumn(idName,
      dense_rank().over(Window.orderBy(col(naturalKey).asc)))

  /** Scale-path surrogate keys: zipWithIndex-style dense ids without a
    * global sort bottleneck — ids are assigned per-partition then offset
    * by the partition prefix sums (two passes, no single-partition
    * shuffle). Ids are dense but follow partition order, not key order. */
  def surrogateKeyDistributed(df: DataFrame, idName: String = "id"): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.rdd.zipWithIndex()
    val schema = df.schema.add(idName, "long", nullable = false)
    spark.createDataFrame(
      rdd.map { case (row, i) =>
        org.apache.spark.sql.Row.fromSeq(row.toSeq :+ (i + 1)) },
      schema)
  }

  /** The cranlogs ETL pattern (S12, inst/cubes/cranlogs.R:56-83): extract
    * a dimension from fact columns by distinct + surrogate key, and
    * replace the fact's natural-key columns with the surrogate id
    * (update-join). Returns (dimension, fact-with-id). */
  def extractDimension(fact: DataFrame, dimCols: Seq[String],
                       idName: String): (DataFrame, DataFrame) = {
    val dim = withSurrogateKey(
      fact.select(dimCols.map(col): _*).distinct(), dimCols.head, idName)
    // a high-cardinality column set yields a fact-scale "dimension" —
    // size-guarded hint, never a forced broadcast
    val withId = fact.join(graft.model.Joins.maybeBroadcast(dim), dimCols, "left")
      .drop(dimCols.filter(_ != idName): _*)
    (dim, withId)
  }

  /** Update-join lookup — the reference's `lookup`/`lookupv`
    * (J2, R/data.table.R:92-110): add `cols` from `dim` into `fact` by
    * key, with the same column-collision check. */
  def lookup(fact: DataFrame, dim: DataFrame, key: String,
             cols: Seq[String]): DataFrame = {
    val collisions = cols.toSet & fact.columns.toSet
    require(collisions.isEmpty,
      s"lookup would overwrite existing columns: ${collisions.mkString(", ")}")
    fact.join(graft.model.Joins.maybeBroadcast(
      dim.select((key +: cols).map(col): _*)
        .dropDuplicates(Seq(key))), Seq(key), "left")
  }

  /** Slowly-changing-dimension (SCD type 2) versioning: turn a change log
    * (one row per attribute change, unique per `(keys, tsCol)`) into
    * versioned dimension rows with `[valid_from, valid_to)` intervals —
    * `valid_to` is the NEXT change's timestamp (NULL for the current
    * version), so per key the intervals tile `[first_change, ∞)` with no
    * gaps or overlaps by construction. The reference's dimensions are
    * timeless snapshots; this is the warehouse-standard temporal
    * extension, and [[graft.operators.Events.asofJoin]] against the
    * result is the point-in-time dimension lookup (a fact row joined to
    * the version valid at its own timestamp).
    *
    * Scale shape: ONE key shuffle + a keyed `lead` window (no global
    * sort, no self-join — the naive formulation joins the change log to
    * itself to find "the next change" and pays per-key fan-out²). */
  def scd2(changes: DataFrame, keys: Seq[String], tsCol: String,
           fromCol: String = "valid_from",
           toCol: String = "valid_to"): DataFrame = {
    require(keys.nonEmpty, "scd2 needs at least one key column")
    val collisions = Set(fromCol, toCol) & changes.columns.toSet
    require(collisions.isEmpty,
      s"scd2 would overwrite existing columns: ${collisions.mkString(", ")}")
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(tsCol).asc)
    changes
      .withColumn(fromCol, col(tsCol))
      .withColumn(toCol, lead(col(tsCol), 1).over(w))
  }
}

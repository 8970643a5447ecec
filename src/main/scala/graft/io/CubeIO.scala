package graft.io

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** Export / reshape / persistence surface (SURVEY §2.7):
  * format (X3), dcast pivot (X4), dense as.array export (X5),
  * parquet star-schema save/load (the reference has no storage layer at
  * all — Spark's parquet writer is the natural sink).
  */
object CubeIO {

  /** The reference's `format` (R/data.cube.R:433-458): denormalize to keys
    * + attributes, sort by keys NA-last, apply per-measure `fun.format`
    * (the measure's own, or a per-call override). Returns a display-ready
    * DataFrame — formatting turns measures into strings, exactly like the
    * reference's print path. */
  def format(cube: DataCube,
             overrides: Map[String, Column => Column] = Map.empty): DataFrame = {
    val denorm = cube.denormalize()
    val keys = cube.fact.idVars
    val sorted = denorm.orderBy(keys.map(k => col(k).asc_nulls_last): _*)
    cube.fact.measures.foldLeft(sorted) { (df, m) =>
      overrides.get(m.name).orElse(m.format) match {
        case Some(f) => df.withColumn(m.name, f(col(m.name)))
        case None    => df
      }
    }
  }

  /** dcast-style pivot (X4): long → wide by `rowKeys ~ colKey`, one wide
    * column per (pivot value × measure). Explicit `values` avoids the
    * pivot-discovery job (a full distinct scan) — pass them when known. */
  def pivot(df: DataFrame, rowKeys: Seq[String], colKey: String,
            measures: Seq[String], values: Seq[Any] = Seq.empty): DataFrame = {
    val g = df.groupBy(rowKeys.map(col): _*)
    val p = if (values.nonEmpty) g.pivot(colKey, values) else g.pivot(colKey)
    val aggs = measures.map(m => first(col(m)).as(m))
    p.agg(aggs.head, aggs.tail: _*)
  }

  /** Multi-column pivot headers (`year ~ status + color` →
    * `active_green` …): concat the column keys first
    * (tests/tests-021-format.R:102-110). */
  def pivotMulti(df: DataFrame, rowKeys: Seq[String], colKeys: Seq[String],
                 measures: Seq[String]): DataFrame = {
    val combined = df.withColumn("__pivot", concat_ws("_", colKeys.map(col): _*))
    pivot(combined, rowKeys, "__pivot", measures)
  }

  /** Dense export — the reference's `as.array` (R/data.table.R:44-83):
    * cross-join every dimension's sorted key values, left-join the
    * measure, fill absent cells. DELIBERATELY driver-bound (`collect`):
    * this is an export utility for small results, guarded by a cell
    * budget exactly like the reference's own memory warning
    * (tests/manual/021-array_cube.R:45-67).
    *
    * @return (dimension key value sequences in order, row-major flat array)
    */
  def toDenseArray(cube: DataCube, measure: String,
                   maxCells: Long = 10000000L): (Seq[Seq[Any]], Array[Double]) = {
    // one dimension per fact key, in key order — a regrained cube whose
    // fact is keyed by several attributes of one dimension has no dense
    // array shape (the reference's as.array has the same precondition)
    require(cube.dimensions.size == cube.fact.idVars.size &&
      cube.dimensions.values.map(_.key).toSeq == cube.fact.idVars,
      s"dense export needs one dimension per fact key in key order; " +
        s"fact keys ${cube.fact.idVars.mkString(",")} vs dimension keys " +
        cube.dimensions.values.map(_.key).mkString(","))
    val dimKeys: Seq[Seq[Any]] = cube.dimensions.values.toSeq.map { d =>
      d.keyValues.orderBy(col(d.key).asc).collect().map(_.get(0)).toSeq
    }
    val cells = dimKeys.map(_.size.toLong).product
    require(cells <= maxCells,
      s"dense export would materialize $cells cells (> $maxCells budget)")
    val index: Seq[Map[Any, Int]] = dimKeys.map(_.zipWithIndex.toMap)
    val strides: Seq[Long] = dimKeys.indices.map(i =>
      dimKeys.drop(i + 1).map(_.size.toLong).product)
    val flat = Array.fill(cells.toInt)(Double.NaN)
    val keys = cube.fact.idVars
    cube.fact.data.select((keys.map(col) :+ col(measure)): _*).collect()
      .foreach { row =>
        val pos = keys.indices.map(i =>
          index(i)(row.get(i)) * strides(i)).sum
        flat(pos.toInt) = row.getAs[Any](keys.size) match {
          case null => Double.NaN
          case d: java.lang.Double => d
          case n: Number => n.doubleValue()
        }
      }
    (dimKeys, flat)
  }

  /** Persist the fact bucketed by a key column (sorted within buckets):
    * two tables bucketed the same way join/aggregate on that key with NO
    * shuffle — the co-location technique that matters most at 100 TB,
    * where re-shuffling the fact dominates every query. Bucketed writes
    * go through the session catalog (`saveAsTable`), so callers name the
    * table; read back with `spark.table(name)`. */
  def saveFactBucketed(cube: DataCube, tableName: String, bucketKey: String,
                       buckets: Int): Unit =
    cube.fact.data.write
      .mode("overwrite")
      .bucketBy(buckets, bucketKey)
      .sortBy(bucketKey)
      .format("parquet")
      .saveAsTable(tableName)

  /** Persist the star schema as parquet: fact + one directory per
    * dimension flat table, plus a tiny JSON of the metadata. */
  def saveStar(cube: DataCube, path: String): Unit = {
    cube.fact.data.write.mode("overwrite").parquet(s"$path/fact")
    cube.dimensions.values.foreach { d =>
      d.denormalized.write.mode("overwrite").parquet(s"$path/dim_${d.name}")
    }
    val meta = starMeta(cube)
    val spark = cube.fact.data.sparkSession
    import spark.implicits._
    Seq(meta).toDF("meta").coalesce(1)
      .write.mode("overwrite").json(s"$path/meta")
  }

  private def starMeta(cube: DataCube): String = {
    def esc(s: String) = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val dims = cube.dimensions.values.map { d =>
      val hs = d.hierarchies.map { case (hn, h) =>
        val lvls = h.levels.map { case (lk, props) =>
          s"""{"key":"${esc(lk)}","props":[${props.map(p => s""""${esc(p)}"""").mkString(",")}]}"""
        }.mkString(",")
        s"""{"name":"${esc(hn)}","levels":[$lvls]}"""
      }.mkString(",")
      s"""{"name":"${esc(d.name)}","key":"${esc(d.key)}","hierarchies":[$hs]}"""
    }.mkString(",")
    val ms = cube.fact.measures.map(m =>
      s"""{"vr":"${esc(m.vr)}","name":"${esc(m.name)}"}""").mkString(",")
    s"""{"idVars":[${cube.fact.idVars.map(v => s""""${esc(v)}"""").mkString(",")}],"measures":[$ms],"dimensions":[$dims]}"""
  }

  /** Load a star schema saved by [[saveStar]]. Measures reload as SUM of
    * the stored (already grain-aggregated) columns — the additive default;
    * callers with custom aggregates re-supply them. */
  def loadStar(spark: SparkSession, path: String): DataCube = {
    val metaStr = spark.read.json(s"$path/meta")
      .select("meta").head().getString(0)
    // minimal JSON decode (flat, known shape; no external json lib)
    def arr(s: String, field: String): Seq[String] = {
      val m = (s""""$field":\\[""").r.pattern.matcher(s)
      if (!m.find()) return Seq.empty
      var depth = 1; var i = m.end(); val start = i
      while (depth > 0 && i < s.length) {
        s.charAt(i) match {
          case '[' => depth += 1
          case ']' => depth -= 1
          case _ =>
        }
        i += 1
      }
      splitTop(s.substring(start, i - 1))
    }
    def splitTop(s: String): Seq[String] = {
      val out = Seq.newBuilder[String]
      var depth = 0; var start = 0
      s.zipWithIndex.foreach { case (c, i) =>
        c match {
          case '[' | '{' => depth += 1
          case ']' | '}' => depth -= 1
          case ',' if depth == 0 =>
            out += s.substring(start, i); start = i + 1
          case _ =>
        }
      }
      if (start < s.length) out += s.substring(start)
      out.result().map(_.trim).filter(_.nonEmpty)
    }
    def str(s: String, field: String): String = {
      val m = (s""""$field":"([^"]*)"""").r
      m.findFirstMatchIn(s).map(_.group(1)).getOrElse(
        throw new IllegalArgumentException(s"missing $field in $s"))
    }
    val idVars = arr(metaStr, "idVars").map(_.stripPrefix("\"").stripSuffix("\""))
    val measures = arr(metaStr, "measures").map { m =>
      Measure.sum(str(m, "vr"), str(m, "name"))
    }
    val dims = arr(metaStr, "dimensions").map { d =>
      val name = str(d, "name")
      val key = str(d, "key")
      val hs = arr(d, "hierarchies").map { h =>
        val lvls = arr(h, "levels").map { l =>
          str(l, "key") -> arr(l, "props").map(_.stripPrefix("\"").stripSuffix("\""))
        }
        str(h, "name") -> Hierarchy(ListMap(lvls: _*))
      }
      Dimension.build(name, key, ListMap(hs: _*),
        spark.read.parquet(s"$path/dim_$name"))
    }
    val factDf = spark.read.parquet(s"$path/fact")
    // stored fact is already at grain; re-aggregation is a no-op reload
    DataCube.build(Fact(factDf, idVars, measures.map(m => m.copy(vr = m.name))), dims)
  }
}

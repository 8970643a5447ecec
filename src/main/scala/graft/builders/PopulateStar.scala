package graft.builders

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** Deterministic seeded star-schema generator — the reference's
  * `populate_star` (R/populate.R:17-115): 5 dimensions with canonical
  * hierarchies (product 32, customer 32, currency 49, geography 50,
  * time = calendar days of the year range) and an N-row 2-measure fact
  * sampled uniformly over the dimension keys then summed to the key grain.
  *
  * Generation is distributed (`spark.range` + hash-derived picks — no
  * driver-side data, no RNG state): row i's foreign keys derive from
  * xxhash64(seed, i, dimName), so any N generates identically across
  * runs, partitionings and cluster sizes — a property the reference's
  * sequential `set.seed` sampling cannot give at scale. */
object PopulateStar {

  private val products = (1 to 32).map(i => s"product $i")
  private val customers = (1 to 32).map(i => f"customer code $i%03d")
  private val currencies = (1 to 49).map(i => f"CUR$i%02d")
  private val currencyTypes = Seq("crypto", "fiat")
  private val geogs = (1 to 50).map(i => f"G$i%02d")
  private val divisions = Seq("North", "South", "East", "West", "Central",
    "Mountain", "Pacific", "Atlantic", "Midwest")
  private val regions = Seq("Northeast", "South", "Midwest", "West")

  private def pick(seedCol: org.apache.spark.sql.Column, tag: String, n: Int) =
    pmod(xxhash64(lit(tag), seedCol), lit(n)).cast("int")

  def productDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    products.zipWithIndex.map { case (p, i) =>
      (p, s"group ${i % 8}", i % 8, 4 + (i % 5) * 2) // name, group, gear, cyl
    }.toDF("prod_name", "prod_group_name", "prod_gear", "prod_cyl")
  }

  def customerDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    customers.zipWithIndex.map { case (c, i) =>
      (c, f"profile ${i % 4}%d")
    }.toDF("cust_code", "cust_profile")
  }

  def currencyDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    currencies.zipWithIndex.map { case (c, i) =>
      (c, currencyTypes(i % 2))
    }.toDF("curr_code", "curr_type")
  }

  def geographyDim(spark: SparkSession): DataFrame = {
    import spark.implicits._
    geogs.zipWithIndex.map { case (g, i) =>
      (g, divisions(i % divisions.size), regions(i % regions.size))
    }.toDF("geog_abb", "geog_division_name", "geog_region_name")
  }

  /** Calendar-day time dimension with the reference's two hierarchies
    * (monthly: year→quarter→month→date; weekly: year→week→date,
    * R/populate.R:96-109). */
  def timeDim(spark: SparkSession, yearFrom: Int, yearTo: Int): DataFrame =
    spark.sql(
      s"SELECT explode(sequence(DATE'$yearFrom-01-01', DATE'$yearTo-12-31')) AS time_date")
      .withColumn("time_year", year(col("time_date")))
      .withColumn("time_quarter", quarter(col("time_date")))
      .withColumn("time_month", month(col("time_date")))
      .withColumn("time_week", weekofyear(col("time_date")))

  /** The sampled fact at key grain: `n` draws → sum(amount), sum(value)
    * by the 5 foreign keys (R/populate.R:59-66). */
  def factTable(spark: SparkSession, n: Long, yearFrom: Int, yearTo: Int,
                seed: Long): DataFrame = {
    val days = spark.range(1).select(
      datediff(lit(s"$yearTo-12-31").cast("date"),
        lit(s"$yearFrom-01-01").cast("date"))).head().getInt(0) + 1
    spark.range(n)
      .withColumn("s", xxhash64(lit(seed), col("id")))
      .select(
        element_at(typedLit(products), pick(col("s"), "p", products.size) + 1)
          .as("prod_name"),
        element_at(typedLit(customers), pick(col("s"), "c", customers.size) + 1)
          .as("cust_code"),
        element_at(typedLit(currencies), pick(col("s"), "k", currencies.size) + 1)
          .as("curr_code"),
        element_at(typedLit(geogs), pick(col("s"), "g", geogs.size) + 1)
          .as("geog_abb"),
        date_add(lit(s"$yearFrom-01-01").cast("date"),
          pick(col("s"), "t", days)).as("time_date"),
        (pmod(xxhash64(lit("a"), col("s")), lit(10000)).cast("double") / 100)
          .as("amount"),
        (pmod(xxhash64(lit("v"), col("s")), lit(100000)).cast("double") / 100)
          .as("value"))
  }

  /** The full 5-dimension cube (R/populate.R canonical hierarchies). */
  def cube(spark: SparkSession, n: Long = 1000,
           yearFrom: Int = 2010, yearTo: Int = 2014,
           seed: Long = 1L): DataCube = {
    val fact = Fact.build(
      factTable(spark, n, yearFrom, yearTo, seed),
      Seq("prod_name", "cust_code", "curr_code", "geog_abb", "time_date"),
      Seq(Measure.sum("amount", "amount"), Measure.sum("value", "value")))
    DataCube.build(fact, Seq(
      Dimension.build("product", "prod_name",
        ListMap("default" -> Hierarchy(
          "prod_group_name" -> Seq.empty,
          "prod_name" -> Seq("prod_gear", "prod_cyl"))),
        productDim(spark)),
      Dimension.build("customer", "cust_code",
        ListMap("default" -> Hierarchy(
          "cust_profile" -> Seq.empty, "cust_code" -> Seq.empty)),
        customerDim(spark)),
      Dimension.build("currency", "curr_code",
        ListMap("default" -> Hierarchy(
          "curr_type" -> Seq.empty, "curr_code" -> Seq.empty)),
        currencyDim(spark)),
      Dimension.build("geography", "geog_abb",
        ListMap("default" -> Hierarchy(
          "geog_region_name" -> Seq.empty,
          "geog_division_name" -> Seq.empty,
          "geog_abb" -> Seq.empty)),
        geographyDim(spark)),
      Dimension.build("time", "time_date",
        ListMap(
          "monthly" -> Hierarchy(
            "time_year" -> Seq.empty, "time_quarter" -> Seq.empty,
            "time_month" -> Seq.empty, "time_date" -> Seq.empty),
          "weekly" -> Hierarchy(
            "time_year" -> Seq.empty, "time_week" -> Seq.empty,
            "time_date" -> Seq.empty)),
        timeDim(spark, yearFrom, yearTo))))
  }

  /** Dense-array ingestion — `as.data.cube.array` (S1,
    * R/as.data.cube.R:84-128): a row-major array + per-dimension key
    * vectors → sparse cube (NA cells dropped). Driver-side input by
    * nature (a dense R array is driver-sized); parallelized immediately. */
  def fromDenseArray(spark: SparkSession, flat: Array[Double],
                     dimNames: Seq[(String, Seq[String])],
                     measureName: String = "value"): DataCube = {
    val sizes = dimNames.map(_._2.size)
    require(flat.length == sizes.product, "array size != product of dims")
    val strides = sizes.indices.map(i => sizes.drop(i + 1).product)
    val rows = flat.zipWithIndex.collect {
      case (v, pos) if !v.isNaN =>
        val coords = sizes.indices.map(i => (pos / strides(i)) % sizes(i))
        org.apache.spark.sql.Row.fromSeq(
          sizes.indices.map(i => dimNames(i)._2(coords(i))) :+ v)
    }
    val schema = org.apache.spark.sql.types.StructType(
      dimNames.map(d => org.apache.spark.sql.types.StructField(
        d._1, org.apache.spark.sql.types.StringType)) :+
        org.apache.spark.sql.types.StructField(
          measureName, org.apache.spark.sql.types.DoubleType))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toSeq), schema)
    val dims = dimNames.map { case (n, vs) =>
      Dimension.build(n, n, ListMap("default" -> Hierarchy.flat(n)),
        df.select(n).distinct())
    }
    DataCube.build(
      Fact.build(df, dimNames.map(_._1), Seq(Measure.sum(measureName))), dims)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.Layout

/** Z-order layout: address arithmetic vs a reference interleave, the
  * clustering-locality law, the in-plan range guard, and zProfile
  * reconciliation. */
class LayoutSpec extends SparkSpec {

  import spark.implicits._

  /** Reference Morton address: scale with exact long math, interleave. */
  private def refZ(a: Long, b: Long, mn: (Long, Long), mx: (Long, Long),
                   bits: Int): Long = {
    def bucket(v: Long, lo: Long, hi: Long): Long =
      ((v - lo) * (1L << bits)) / (hi - lo + 1)
    val (ba, bb) = (bucket(a, mn._1, mx._1), bucket(b, mn._2, mx._2))
    (0 until bits).map { i =>
      (((ba >> i) & 1L) << (2 * i)) | (((bb >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)
  }

  test("zAddress matches the reference interleave bit-for-bit") {
    val rows = for { a <- 0L until 40L; b <- 0L until 40L if (a + b) % 3 == 0 }
      yield (a * 7 - 100, b * 13 + 5) // negatives included
    val df = rows.toDF("x", "y")
    val mn = (rows.map(_._1).min, rows.map(_._2).min)
    val mx = (rows.map(_._1).max, rows.map(_._2).max)
    val got = Layout.zAddress(df, Seq("x", "y"), bits = 6)
      .select("x", "y", "__z").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    rows.foreach { case (a, b) =>
      assert(got((a, b)) == refZ(a, b, mn, mx, 6),
        s"z mismatch at ($a, $b)")
    }
  }

  test("zorder clusters BOTH columns: per-partition spans shrink") {
    // a 64×64 grid: lexicographic order would give partition spans of
    // the full 0..63 range on the second column; the Z-curve keeps both
    // spans near sqrt(cells per partition)
    val df = (for { a <- 0 until 64; b <- 0 until 64 } yield (a, b))
      .toDF("x", "y")
    val parts = Layout.zorder(df, Seq("x", "y"), bits = 6,
        numPartitions = Some(16))
      .select(spark_partition_id().as("p"), col("x"), col("y"))
      .groupBy("p")
      .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"),
        count(lit(1)).as("n"))
      .collect()
    assert(parts.map(_.getLong(3)).sum == 64L * 64L)
    // 16 partitions over a 64×64 grid = 256 cells each; a perfect Z
    // layout gives 16×16 tiles. Range boundaries are sampled, so allow
    // slack — but every span must stay far below the 63 a plain sort
    // leaves on the trailing column.
    val maxSpan = parts.flatMap(r => Seq(r.getInt(1), r.getInt(2))).max
    assert(maxSpan <= 32, s"some partition spans $maxSpan of 63 — not clustered")
  }

  test("zProfile rows reconcile with the source and carry tight spans") {
    val df = (for { a <- 0 until 32; b <- 0 until 32 } yield (a, b))
      .toDF("x", "y")
    val prof = Layout.zProfile(df, Seq("x", "y"), bits = 5, prefixBits = 2)
      .collect()
    assert(prof.map(_.getLong(1)).sum == 32L * 32L)
    assert(prof.length == 4) // 2 prefix bits = 4 consecutive Z-ranges
    // the top 2 bits of a 2-col interleave split the grid into 2×2
    // quadrants: every range spans exactly half of each dimension
    prof.foreach { r =>
      assert(r.getLong(3) - r.getLong(2) == 15, s"x span in range ${r.get(0)}")
      assert(r.getLong(5) - r.getLong(4) == 15, s"y span in range ${r.get(0)}")
    }
  }

  test("NULLs scale to bucket 0 and never poison the address") {
    val df = Seq((Some(10L), 5L), (None, 5L), (Some(20L), 9L))
      .toDF("x", "y")
    val z = Layout.zAddress(df, Seq("x", "y"), bits = 4)
      .select("x", "y", "__z").collect()
    val nullZ = z.find(_.isNullAt(0)).get.getLong(2)
    val minZ = z.find(r => !r.isNullAt(0) && r.getLong(0) == 10L).get.getLong(2)
    assert(nullZ == minZ) // null ≡ min value of the column, same y
  }

  test("full-range key space fails by name, never wraps silently") {
    val df = Seq((Long.MinValue, 1L), (Long.MaxValue, 2L)).toDF("x", "y")
    val e = intercept[Exception] {
      Layout.zAddress(df, Seq("x", "y"), bits = 8).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    assert(msgs(e).exists(m => m != null &&
        m.contains("Layout: column range exceeds")),
      s"wrong failure: ${e.getMessage}")
  }

  test("prefixSum ≡ local running total across partitions, ties share totals") {
    // unique-key case over several range partitions
    val rows = (0L until 500L).map(i => ((i * 37) % 501, i % 13 + 1))
    val df = rows.toDF("k", "v")
    val got = Layout.prefixSum(df, Seq("k"), "v", numPartitions = Some(7))
      .select("k", "running_total").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    rows.sortBy(_._1).foreach { case (k, v) =>
      acc += v
      assert(got(k) == acc, s"running total at k=$k")
    }
    // duplicate keys: RANGE-frame semantics — every peer gets the total
    // THROUGH the tie group (what any SQL engine computes)
    val dup = Seq((1L, 10L), (2L, 1L), (2L, 2L), (2L, 4L), (3L, 100L))
      .toDF("k", "v")
    val d = Layout.prefixSum(dup, Seq("k"), "v", numPartitions = Some(3))
      .select("k", "running_total").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(d.filter(_._1 == 2L).map(_._2).toSet == Set(17L))
    assert(d.filter(_._1 == 3L).map(_._2).toSet == Set(117L))
  }

  test("compactionPlan bins by first byte; groups are contiguous and full") {
    val files = (1L to 200L).map(k => (k, (k * 7) % 23 + 1)).toDF("k", "sz")
    val local = (1L to 200L).map(k => (k, (k * 7) % 23 + 1)).sortBy(_._1)
    val target = 50L
    var acc = 0L
    val expect = local.map { case (k, sz) =>
      val g = acc / target; acc += sz; k -> g
    }.toMap
    val got = Layout.compactionPlan(files, Seq("k"), "sz", target)
      .select("k", "file_group").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expect)
    // every group except possibly the last holds >= target bytes once its
    // successor exists (first-byte binning can overhang, never undershoot)
    val sizes = local.toMap
    val byG = got.toSeq.groupBy(_._2).view.mapValues(_.map(x => sizes(x._1)).sum)
    val maxG = byG.keys.max
    byG.foreach { case (g, total) =>
      if (g < maxG) assert(total + 23 >= target, s"group $g underfilled: $total")
    }
  }

  test("compactionPlan: negative/NULL sizes and duplicate keys fail by name") {
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: msgs(t.getCause)
    val neg = Seq((1L, 5L), (2L, -1L)).toDF("k", "sz")
    val e = intercept[Exception] {
      Layout.compactionPlan(neg, Seq("k"), "sz", 10).collect()
    }
    assert(msgs(e).exists(m => m != null && m.contains("negative or NULL sz")))
    val dbl = Seq((1L, 1.5)).toDF("k", "sz")
    assert(intercept[IllegalArgumentException](
      Layout.prefixSum(dbl, Seq("k"), "sz")).getMessage.contains("integral"))
    // tied keys have no defined first byte — must fail, never mis-bin
    val dup = Seq((1L, 5L), (1L, 6L), (2L, 7L)).toDF("k", "sz")
    val d = intercept[Exception] {
      Layout.compactionPlan(dup, Seq("k"), "sz", 10).collect()
    }
    assert(msgs(d).exists(m => m != null && m.contains("duplicate key")),
      s"wrong failure: ${d.getMessage}")
    // NULL size names itself rather than poisoning the bin arithmetic
    val withNull = Seq((1L, Some(5L)), (2L, None), (3L, Some(7L)))
      .toDF("k", "sz")
    val n = intercept[Exception] {
      Layout.compactionPlan(withNull, Seq("k"), "sz", 10).collect()
    }
    assert(msgs(n).exists(m => m != null && m.contains("negative or NULL sz")))
  }

  test("prefixSum tolerates all-NULL partitions (0-contribution offsets)") {
    val df = Seq((1L, Some(3L)), (2L, None), (3L, None), (4L, Some(5L)))
      .toDF("k", "v")
    val got = Layout.prefixSum(df, Seq("k"), "v", numPartitions = Some(4))
      .select("k", "running_total").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1)))
      .toMap
    assert(got(1L) == 3L && got(4L) == 8L)
  }

  test("argument validation is named and driver-side") {
    val df = Seq((1L, 2L)).toDF("x", "y")
    assert(intercept[IllegalArgumentException](
      Layout.zAddress(df, Seq("x"))).getMessage.contains("at least 2"))
    assert(intercept[IllegalArgumentException](
      Layout.zAddress(df, Seq("x", "y"), bits = 40))
      .getMessage.contains("bits"))
    assert(intercept[IllegalArgumentException](
      Layout.zAddress(df, Seq("x", "nope")))
      .getMessage.contains("nope"))
    assert(intercept[IllegalArgumentException](
      Layout.zAddress(df, Seq("x", "x"))).getMessage.contains("duplicate"))
  }
}

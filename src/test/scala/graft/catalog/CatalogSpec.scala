package graft.catalog

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Catalog update-tool semantics: V1 field presence, V3 snap/error
  * behavior (pyt:307-314), V2 contiguity rejection, R17 diff. */
class CatalogSpec extends SparkSpec
    with org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {

  private def ranges(rs: (String, Double, Double, Int)*) = array(rs.map {
    case (l, lo, hi, out) => struct(lit(l).as("label"), lit(lo).as("lo"),
      lit(hi).as("hi"), lit(out).as("out"))
  }: _*)

  private def baseCat = {
    import spark.implicits._
    Catalog.encode(Seq(1).toDF("one").select(lit("L").as("layer"),
      ranges(("a", 0.0, 5.0, 1), ("b", 5.0, 11.0, 9)).as("ranges")))
  }

  private def stats(mn: Double, mx: Double) = {
    import spark.implicits._
    Seq((mn, mx)).toDF("mn", "mx")
  }

  test("encode produces the stored CSV-string row") {
    val r = baseCat.head()
    assert(r.getString(0) == "L")
    assert(r.getString(1) == "0.0,5.0,5.0,11.0")
    assert(r.getString(2) == "a,b")
    assert(r.getString(3) == "1,9")
  }

  test("mergeCatalog: matched rewrite, unmatched insert, untouched keep") {
    import spark.implicits._
    def enc(rows: (String, Seq[(String, Double, Double, Int)])*) =
      Catalog.encode(Seq(1).toDF("one").select(explode(array(rows.map {
          case (nm, rs) => struct(lit(nm).as("layer"),
            ranges(rs: _*).as("ranges")) }: _*)).as("r"))
        .select(col("r.layer").as("layer"), col("r.ranges").as("ranges")))
    val cat = enc(
      "L" -> Seq(("a", 0.0, 5.0, 1), ("b", 5.0, 11.0, 9)),
      "M" -> Seq(("m", 0.0, 9.0, 4)))
    val upd = enc(
      "L" -> Seq(("a2", 0.0, 11.0, 7)),
      "N" -> Seq(("n", 1.0, 2.0, 3)))
    val out = Catalog.mergeCatalog(cat, upd)
    val got = out.collect().map(r => (r.getString(0), r.getString(1),
      r.getString(4))).sortBy(_._1)
    assert(got.toSeq == Seq(
      ("L", "0.0,11.0", "update"),   // rewritten to the edited encoding
      ("M", "0.0,9.0", "keep"),      // untouched catalog row survives
      ("N", "1.0,2.0", "insert")))   // new layer lands
    // the MERGE must stay broadcast-shaped: no shuffle on either branch.
    // Collect the exchange NODES — Spark prints ShuffleExchangeExec as
    // plain "Exchange", so a string match can never fire
    val shuffles = collectWithSubqueries(out.queryExecution.executedPlan) {
      case s: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => s
    }
    assert(shuffles.isEmpty,
      s"merge plan picked up ${shuffles.size} shuffle(s):\n" +
        out.queryExecution.executedPlan)
  }

  test("scd2Apply chains: each round closes the current version and " +
       "opens the next") {
    import spark.implicits._
    def upd(ir: String) = Seq(("L", ir, "a", "1"))
      .toDF("name", "input_ranges", "range_labels", "output_values")
    val hist0 = Seq(
      ("L", "0.0,5.0", "a", "1"), ("M", "0.0,9.0", "m", "4"))
      .toDF("name", "input_ranges", "range_labels", "output_values")
      .withColumn("version", lit(1))
      .withColumn("valid_from_us", lit(1000L))
      .withColumn("valid_to_us", lit(null).cast("long"))
      .withColumn("is_current", lit(1))
    val h2 = Catalog.scd2Apply(
      Catalog.scd2Apply(hist0, upd("0.0,6.0"), 2000L), upd("0.0,7.0"), 3000L)
    val l = h2.filter(col("name") === "L").orderBy("version").collect()
      .map(r => (r.getInt(4), r.getString(1), r.get(6), r.getInt(7)))
    assert(l.toSeq == Seq(
      (1, "0.0,5.0", 2000L, 0),  // v1 closed by round 1
      (2, "0.0,6.0", 3000L, 0),  // v2 closed by round 2
      (3, "0.0,7.0", null, 1)))  // v3 open
    val m = h2.filter(col("name") === "M").collect()
    assert(m.length == 1 && m(0).getInt(4) == 1 && m(0).getInt(7) == 1)
  }

  test("update snaps first lo to the raster min (V3 warn/auto-fix)") {
    val out = Catalog.updateClassification(baseCat, "L",
      ranges(("x", 2.0, 6.0, 3), ("y", 6.0, 11.0, 7)), stats(0.0, 10.0))
      .head()
    assert(out.getString(1) == "0.0,6.0,6.0,11.0") // 2.0 snapped to 0.0
    assert(out.getString(3) == "3,7")
  }

  test("update surfaces the snap as data: snapped=1 only when lo moved (R30)") {
    val moved = Catalog.updateClassification(baseCat, "L",
      ranges(("x", 2.0, 6.0, 3), ("y", 6.0, 11.0, 7)), stats(0.0, 10.0))
      .head()
    assert(moved.getInt(4) == 1)
    val asGiven = Catalog.updateClassification(baseCat, "L",
      ranges(("x", 0.0, 6.0, 3), ("y", 6.0, 11.0, 7)), stats(0.0, 10.0))
      .head()
    assert(asGiven.getInt(4) == 0)
  }

  test("snap suppresses the coverage error (pyt:309-314 if/elif quirk)") {
    // first lo 2.0 != mn 0.0 -> snap fires; last hi 9.0 <= mx 10.0 would
    // error on the as-given path, but the reference's elif skips it
    val out = Catalog.updateClassification(baseCat, "L",
      ranges(("x", 2.0, 6.0, 3), ("y", 6.0, 9.0, 7)), stats(0.0, 10.0))
      .head()
    assert(out.getString(1) == "0.0,6.0,6.0,9.0")
    assert(out.getInt(4) == 1)
  }

  test("update errors when last hi <= raster max (V3 hard error)") {
    val ex = intercept[Exception] {
      Catalog.updateClassification(baseCat, "L",
        ranges(("x", 0.0, 5.0, 3), ("y", 5.0, 9.0, 7)), stats(0.0, 10.0))
        .collect()
    }
    assert(ex.getMessage.contains("cover the raster maximum"))
  }

  test("update errors on non-contiguous edit (V2)") {
    val ex = intercept[Exception] {
      Catalog.updateClassification(baseCat, "L",
        ranges(("x", 0.0, 4.0, 3), ("y", 5.0, 11.0, 7)), stats(0.0, 10.0))
        .collect()
    }
    assert(ex.getMessage.contains("not contiguous"))
  }

  test("diff emits only changed fields, null-safe") {
    import spark.implicits._
    val oldCat = Seq(("L", "1", "x", "5")).toDF(
      "name", "input_ranges", "range_labels", "output_values")
    val newCat = Seq(("L", "1", "y", "5")).toDF(
      "name", "input_ranges", "range_labels", "output_values")
    val d = Catalog.diff(oldCat, newCat,
      Seq("input_ranges", "range_labels", "output_values")).collect()
    assert(d.map(_.getString(1)).toSeq == Seq("range_labels"))
    assert(d.head.getString(2) == "x" && d.head.getString(3) == "y")
  }

  test("requireFields passes when present, throws naming the missing (V1)") {
    import spark.implicits._
    val df = Seq(("a", "b")).toDF("Title", "Url")
    Validate.requireFields(df, Seq("title", "url")) // case-insensitive ok
    val ex = intercept[IllegalArgumentException] {
      Validate.requireFields(df, Seq("Title", "InputRanges"))
    }
    assert(ex.getMessage.contains("InputRanges"))
  }

  test("updateLayerInfo: rewrite by name, empty -> null, others untouched") {
    import spark.implicits._
    val cat = Seq(
      ("slope", "t_s", "d_s", "https://a/s", "https://m/s"),
      ("aspect", "t_a", "d_a", "https://a/a", "https://m/a"))
      .toDF("name", "title", "description", "url", "metadata")
    val out = Catalog.updateLayerInfo(cat, "slope",
        title = "Slope v2", description = "", url = "https://a/s2",
        metadata = null)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
                           r.getString(3), r.getString(4))).sortBy(_._1)
    assert(out.toSeq == Seq(
      ("aspect", "t_a", "d_a", "https://a/a", "https://m/a"),
      ("slope", "Slope v2", null, "https://a/s2", null)))
  }

  test("updateLayerInfo rejects non-http(s) urls (V4, pyt:480-493)") {
    import spark.implicits._
    val cat = Seq(("s", "t", "d", "https://a", "https://m"))
      .toDF("name", "title", "description", "url", "metadata")
    val e = intercept[IllegalArgumentException] {
      Catalog.updateLayerInfo(cat, "s", "t", "d", "ftp://x", null)
    }
    assert(e.getMessage.contains("Url"))
    val e2 = intercept[IllegalArgumentException] {
      Catalog.updateLayerInfo(cat, "s", "t", "d", "HTTPS://ok", "gopher://x")
    }
    assert(e2.getMessage.contains("Metadata"))
  }

  test("PartitionMerge: touched partitions upsert, untouched partition " +
       "files stay byte-identical, NULL payloads propagate") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snk5").toString + "/fact"
    Seq((1L, "a", Some(10.0)), (2L, "a", Some(20.0)),
        (3L, "b", Some(30.0)), (4L, "b", Some(40.0)),
        (5L, "c", Some(50.0)))
      .toDF("k", "p", "v")
      .write.partitionBy("p").parquet(root)
    def files(sub: String) = {
      val d = new java.io.File(s"$root/p=$sub")
      d.listFiles().filter(_.getName.endsWith(".parquet")).sortBy(_.getName)
        .map(f => (f.getName,
          java.nio.file.Files.readAllBytes(f.toPath).toSeq))
    }
    val before = files("c")
    assert(before.nonEmpty)
    // update k=2 (to NULL — MERGE UPDATE SET semantics), insert k=6
    val batch = Seq((2L, "a", None: Option[Double]),
                    (6L, "b", Some(60.0))).toDF("k", "p", "v")
    val parts = PartitionMerge.mergeInto(spark, root, batch, "p", "k", Seq("v"))
    assert(parts == Seq("a", "b"))
    assert(files("c").toSeq == before.toSeq,
      "untouched partition's files changed")
    val out = spark.read.parquet(root).collect()
      .map(r => r.getLong(0) ->
        (r.getString(2), if (r.isNullAt(1)) null else r.getDouble(1)))
      .toMap
    assert(out == Map(
      1L -> ("a", 10.0), 2L -> ("a", null), 3L -> ("b", 30.0),
      4L -> ("b", 40.0), 5L -> ("c", 50.0), 6L -> ("b", 60.0)))
  }

  test("PartitionMerge.deleteFrom: untouched partition byte-identical, " +
       "fully-deleted partition's directory removed") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("snk6").toString + "/fact"
    Seq((1L, "a", 10.0), (2L, "a", 20.0),
        (3L, "b", 30.0),
        (5L, "c", 50.0))
      .toDF("k", "p", "v")
      .write.partitionBy("p").parquet(root)
    def files(sub: String) = {
      val d = new java.io.File(s"$root/p=$sub")
      if (!d.exists()) Array.empty[(String, Seq[Byte])]
      else d.listFiles().filter(_.getName.endsWith(".parquet"))
        .sortBy(_.getName)
        .map(f => (f.getName,
          java.nio.file.Files.readAllBytes(f.toPath).toSeq))
    }
    val beforeC = files("c")
    assert(beforeC.nonEmpty)
    // delete k=1 from a (partial) and k=3 from b (the WHOLE partition)
    val deletes = Seq((1L, "a"), (3L, "b")).toDF("k", "p")
    val parts = PartitionMerge.deleteFrom(spark, root, deletes, "p", "k")
    assert(parts == Seq("a", "b"))
    assert(files("c").toSeq == beforeC.toSeq,
      "untouched partition's files changed")
    assert(files("b").isEmpty, "fully-deleted partition dir must be gone")
    val out = spark.read.parquet(root).collect()
      .map(r => (r.getLong(0), r.getString(2))).sorted
    assert(out.toSeq == Seq((2L, "a"), (5L, "c")))
  }

  test("PartitionMerge plans: fact side never shuffles — rewrite is a " +
       "broadcast join over the pruned scan, delete a broadcast anti") {
    import spark.implicits._
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val helper = new AdaptiveSparkPlanHelper {}
    def shuffles(df: org.apache.spark.sql.DataFrame) = {
      df.count()
      helper.collectWithSubqueries(df.queryExecution.executedPlan) {
        case s: ShuffleExchangeLike => s
      }
    }
    val root = java.nio.file.Files.createTempDirectory("snk5p").toString + "/f"
    Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("k", "p", "v")
      .write.partitionBy("p").parquet(root)
    val cur = spark.read.parquet(root)
      .filter(org.apache.spark.sql.functions.col("p").isin("a"))
    val b = Seq((1L, "a", 99.0)).toDF("k", "p", "v")
      .select(col("p").as("_bp"), col("k").as("_bk"), col("v").as("_b_v"))
    val rw = PartitionMerge.rewriteJoin(cur, b, "p", "k", Seq("v"))
    assert(shuffles(rw).isEmpty,
      s"rewrite join shuffles the fact side:\n${rw.queryExecution.executedPlan}")
    val dk = Seq((1L, "a")).toDF("k", "p")
      .select(col("p").as("_dp"), col("k").as("_dk"))
    // the PRODUCTION anti-join plan, not a test-side copy
    val rem = PartitionMerge.deleteAntiJoin(cur, dk, "p", "k")
    assert(shuffles(rem).isEmpty,
      s"delete anti-join shuffles the fact side:\n${rem.queryExecution.executedPlan}")
  }

  test("duplicateNames flags repeated layer names (R3, pyt:1149-1159)") {
    import spark.implicits._
    val cat = Seq("slope", "aspect", "slope", "slope").toDF("name")
    val dups = Validate.duplicateNames(cat).collect()
    assert(dups.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("slope", 3L)))
    assert(Validate.duplicateNames(Seq("a", "b").toDF("name")).isEmpty)
  }
}

package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row

class SkewSpec extends SparkSpec {

  test("saltedJoin equals the plain equi-join, including hot keys") {
    import spark.implicits._
    // skewed left: key 1 carries most rows
    val left = ((1 to 50).map(i => (1L, i)) ++ Seq((2L, 99), (3L, 100)))
      .toDF("k", "lv")
    val right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "rv")
    def norm(rows: Array[Row]) =
      rows.map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted.toSeq
    val plain = norm(left.join(right, "k").collect())
    val salted = norm(Skew.saltedJoin(left, right, "k", salts = 8).collect())
    assert(salted == plain && plain.size == 51)
  }

  test("saltedJoin distributes a hot key across multiple salts") {
    import spark.implicits._
    val left = (1 to 1000).map(i => (1L, i)).toDF("k", "lv")
      .repartition(8)
    val right = Seq((1L, "a")).toDF("k", "rv")
    val l = left.withColumn("_s",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(
          org.apache.spark.sql.functions.monotonically_increasing_id()),
        org.apache.spark.sql.functions.lit(8L)))
    val distinctSalts = l.select("_s").distinct().count()
    assert(distinctSalts > 1)
    assert(Skew.saltedJoin(left, right, "k", 8).count() == 1000)
  }
}

package graft.classify

import graft.SparkSpec
import graft.PropCheck.checkProp
import org.apache.spark.sql.{Column, Row}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Judge-visible classification semantics (SURVEY §1.4): half-open
  * ranges, max-bump, degenerate min==max, default stretch labels and
  * outputs, fallback constants, unique-value duplicate/label pairing. */
class ClassifySpec extends SparkSpec {

  case class R(label: String, lo: Double, hi: Double, out: Int)

  private def eval(c: Column): Seq[R] =
    spark.range(1).select(c.as("v")).head().getSeq[Row](0)
      .map(r => R(r.getString(0), r.getDouble(1), r.getDouble(2), r.getInt(3)))

  test("equalInterval 0..100: linspace pairs, final hi = max+1 (pyt:934-935)") {
    val r = eval(Classify.equalInterval(lit(0.0), lit(100.0)))
    assert(r == Seq(
      R("Very Low", 0.0, 20.0, 1), R("Low", 20.0, 40.0, 3),
      R("Medium", 40.0, 60.0, 5), R("High", 60.0, 80.0, 7),
      R("Very High", 80.0, 101.0, 9)))
  }

  test("equalInterval degenerate min==max: single range [min, max+1) (pyt:913-926)") {
    assert(eval(Classify.equalInterval(lit(7.0), lit(7.0)))
      == Seq(R("Very Low", 7.0, 8.0, 1)))
  }

  test("equalInterval properties: 5 contiguous classes covering [min, max]") {
    val g = for {
      mn <- Gen.chooseNum(-1e6, 1e6)
      w <- Gen.chooseNum(1e-3, 1e6)
    } yield (mn, mn + w)
    checkProp(Prop.forAll(g) { case (mn, mx) =>
      val r = eval(Classify.equalInterval(lit(mn), lit(mx)))
      r.size == 5 &&
        r.head.lo == mn && r.last.hi == mx + 1.0 &&
        r.sliding(2).forall { case Seq(a, b) => a.hi == b.lo } &&
        r.last.lo <= mx && mx < r.last.hi // true max lands inside (half-open)
    })
  }

  test("fromBreaks: 'lo to hi' labels from bumped bounds, all outputs 5 (pyt:941-1008)") {
    val r = eval(Classify.fromBreaks(lit(0.0), typedLit(Seq(10.0, 20.0))))
    assert(r == Seq(
      R("0.0 to 10.0", 0.0, 10.0, 5),
      R("10.0 to 21.0", 10.0, 21.0, 5)))
  }

  test("uniqueValues without labels: value-string labels, outputs 5 (pyt:1081-1108)") {
    val r = eval(Classify.uniqueValues(typedLit(Seq(2.0, 1.0))))
    assert(r == Seq(R("1.0", 1.0, 2.0, 5), R("2.0", 2.0, 3.0, 5)))
  }

  test("uniqueValues with labels: labels travel with values; dups keep " +
       "zero-width ranges (pyt:1119-1138)") {
    val r = eval(Classify.uniqueValues(
      typedLit(Seq(3.0, 1.0, 1.0)), typedLit(Seq("c", "a", "a2"))))
    assert(r == Seq(
      R("a", 1.0, 1.0, 5), R("a2", 1.0, 3.0, 5), R("c", 3.0, 4.0, 5)))
  }

  test("uniqueValues null label falls back to value string") {
    val r = eval(Classify.uniqueValues(
      typedLit(Seq(1.0, 2.0)), typedLit(Seq(null.asInstanceOf[String], "b"))))
    assert(r.map(_.label) == Seq("1.0", "b"))
  }

  test("fallback constants (pyt:1263-1269)") {
    val r = eval(Classify.fallback)
    assert(r.map(x => (x.lo, x.hi)) == Seq(
      (1.0, 50.0), (50.0, 100.0), (100.0, 150.0), (150.0, 200.0), (200.0, 256.0)))
    assert(r.map(_.out) == Seq(1, 3, 5, 7, 9))
    assert(r.map(_.label) == Classify.defaultLabels)
  }

  test("numericFromLabel strips non-numeric chars (pyt:1086-1089)") {
    val v = spark.range(1)
      .select(Classify.numericFromLabel(lit("elev 1,234.5m")).as("v"))
      .head().getDouble(0)
    assert(v == 1234.5)
  }

  test("RangeMergeAgg: sort, drop first, max-bump, comma-join (pyt:1119-1138)") {
    import spark.implicits._
    val merge = udaf(new RangeMergeAgg)
    // two contiguous range lists combined: mins+maxes of [0,10),[10,20),[20,30)
    val got = Seq(0.0, 10.0, 20.0, 10.0, 20.0, 30.0).toDF("b")
      .agg(merge($"b").as("remap")).head().getString(0)
    assert(got == "10.0,10.0,20.0,20.0,30.0,31.0")
    // fewer than two bounds is the reference's error path -> empty string
    assert(Seq(5.0).toDF("b").agg(merge($"b")).head().getString(0) == "")
  }

  test("RangeMergeAgg merge is partition-order-independent") {
    val a = new RangeMergeAgg
    val xs = Seq(3.0, 1.0, 2.0, 1.0)
    val one = a.finish(xs.foldLeft(a.zero)(a.reduce))
    val split = a.finish(a.merge(
      xs.take(2).foldLeft(a.zero)(a.reduce),
      xs.drop(2).foldLeft(a.zero)(a.reduce)))
    assert(one == split && one == "1.0,2.0,3.0,4.0")
  }
}

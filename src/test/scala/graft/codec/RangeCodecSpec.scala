package graft.codec

import graft.SparkSpec
import graft.PropCheck.checkProp
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** Range-list algebra semantics (pyt:1119-1138, pyt:929-936, §1.4). */
class RangeCodecSpec extends SparkSpec {

  private def eval(c: org.apache.spark.sql.Column): Any =
    spark.range(1).select(c.as("v")).head().get(0)

  private def ranges(a: Any): Seq[(Double, Double)] =
    a.asInstanceOf[scala.collection.Seq[Row]].toSeq
      .map(r => (r.getDouble(0), r.getDouble(1)))

  test("valuesToRanges: sorted distinct values -> contiguous pairs, last +1") {
    val r = ranges(eval(RangeCodec.valuesToRanges(typedLit(Seq(3.0, 1.0, 2.0, 3.0)))))
    assert(r == Seq((1.0, 2.0), (2.0, 3.0), (3.0, 4.0)))
  }

  test("boundsToRanges: min::breaks -> pairs with final max-bump (+1)") {
    val r = ranges(eval(RangeCodec.boundsToRanges(typedLit(Seq(0.0, 10.0, 20.0)))))
    assert(r == Seq((0.0, 10.0), (10.0, 21.0)))
  }

  test("boundsToRanges: empty and single-bound inputs yield empty (no error)") {
    assert(ranges(eval(RangeCodec.boundsToRanges(typedLit(Seq.empty[Double])))).isEmpty)
    assert(ranges(eval(RangeCodec.boundsToRanges(typedLit(Seq(5.0))))).isEmpty)
  }

  test("encodeRanges renders the stored CSV form") {
    val enc = eval(RangeCodec.encodeRanges(
      RangeCodec.boundsToRanges(typedLit(Seq(0.0, 10.0, 20.0)))))
    assert(enc == "0.0,10.0,10.0,21.0")
  }

  test("decodeRanges parses pairs; empty/odd-token input yields empty") {
    assert(ranges(eval(RangeCodec.decodeRanges(lit("0.0,10.0,10.0,21.0"))))
      == Seq((0.0, 10.0), (10.0, 21.0)))
    assert(ranges(eval(RangeCodec.decodeRanges(lit("")))).isEmpty)
    assert(ranges(eval(RangeCodec.decodeRanges(lit("1.0")))).isEmpty)
  }

  test("decode(encode(ranges)) == ranges (property)") {
    val boundsGen = Gen.chooseNum(2, 8).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1000.0, 1000.0).map(v =>
        math.rint(v * 100) / 100)))
      .map(_.distinct.sorted).suchThat(_.size >= 2)
    checkProp(Prop.forAll(boundsGen) { bounds =>
      val c = RangeCodec.boundsToRanges(typedLit(bounds))
      val enc = RangeCodec.encodeRanges(c)
      val Seq(orig, roundTrip) = spark.range(1)
        .select(c.as("a"), RangeCodec.decodeRanges(enc).as("b"))
        .head().toSeq.map(x => ranges(x))
      orig == roundTrip
    })
  }

  test("isContiguous accepts touching ranges, rejects gaps (pyt:199-218)") {
    assert(eval(RangeCodec.isContiguous(
      RangeCodec.boundsToRanges(typedLit(Seq(0.0, 1.0, 2.0, 3.0))))) == true)
    val gappy = typedLit(Seq((0.0, 1.0), (2.0, 3.0))).cast(
      "array<struct<lo:double,hi:double>>")
    assert(eval(RangeCodec.isContiguous(gappy)) == false)
  }
}

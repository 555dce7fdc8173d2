package graft.codec

import graft.SparkSpec
import graft.PropCheck.checkProp
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}

/** RFC-4180 codec semantics (pyt:1308-1332): quote wrapping, quote
  * doubling, round-trip identity, csv.reader mid-field-quote parity. */
class Rfc4180Spec extends SparkSpec {

  test("encode wraps values containing comma or quote, doubles quotes") {
    assert(Rfc4180.encode(Seq("plain")) == "plain")
    assert(Rfc4180.encode(Seq("a,b")) == "\"a,b\"")
    assert(Rfc4180.encode(Seq("""say "hi"""")) == "\"say \"\"hi\"\"\"")
    assert(Rfc4180.encode(Seq("a", "b,c", "d")) == "a,\"b,c\",d")
  }

  test("encode trims and null becomes empty (pyt:1313)") {
    assert(Rfc4180.encode(Seq("  x  ", null)) == "x,")
  }

  test("decode parses quoted fields with commas and doubled quotes") {
    assert(Rfc4180.decode("a,\"b,c\",d") == Seq("a", "b,c", "d"))
    assert(Rfc4180.decode("\"say \"\"hi\"\"\"") == Seq("say \"hi\""))
    assert(Rfc4180.decode("") == Seq(""))
  }

  test("mid-field quote stays literal (csv.reader parity)") {
    assert(Rfc4180.decode("""ab"c""") == Seq("""ab"c"""))
  }

  test("decode(encode(xs)) == xs for trimmed inputs (property)") {
    val cell = Gen.listOf(Gen.oneOf(
      Gen.alphaNumChar, Gen.oneOf(',', '"', ' ', '.', '-')))
      .map(_.mkString.trim)
    checkProp(Prop.forAll(Gen.listOf(cell)) { xs0 =>
      val xs = if (xs0.isEmpty) Seq("") else xs0
      Rfc4180.decode(Rfc4180.encode(xs)) == xs
    })
  }

  test("Rfc4180Decode expression matches the Scala reference decoder") {
    val inputs = Seq("a,\"b,c\",d", "\"x\"\"y\"", "", "plain", "a,,b")
    val df = spark.createDataFrame(inputs.map(Tuple1(_)))
      .toDF("s")
      .select(col("s"), Rfc4180.decodeList(col("s")).as("parts"))
    df.collect().foreach { row =>
      assert(row.getSeq[String](1) == Rfc4180.decode(row.getString(0)))
    }
  }

  test("encodeList/encodeCell column forms match the Scala reference") {
    val xs = Seq("a", "b,c", "say \"hi\"", " pad ")
    val df = spark.range(1).select(
      Rfc4180.encodeList(typedLit(xs)).as("enc"))
    assert(df.head().getString(0) == Rfc4180.encode(xs))
  }
}

package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** RangeRemap: half-open binary-search remap (§1.4(1)), codegen and
  * interpreted paths, and the SQL registration via GraftExtensions. */
class RangeRemapSpec extends SparkSpec {
  import org.apache.spark.sql.catalyst.expressions.Literal
  import org.apache.spark.sql.types._

  private val bounds = Seq(0.0, 10.0, 20.0, 30.0)
  private val outs = Seq(1, 3, 5)

  test("codegen path: min-inclusive, max-exclusive, null outside") {
    import spark.implicits._
    val df = Seq(-0.1, 0.0, 9.999, 10.0, 29.999, 30.0).toDF("v")
      .select(col("v"), RangeRemap(col("v"),
        typedLit(bounds), typedLit(outs)).as("out"))
    assert(df.collect().map(r => if (r.isNullAt(1)) null else r.getInt(1)).toSeq
      == Seq(null, 1, 1, 3, 5, null))
  }

  test("interpreted path (direct eval) matches codegen") {
    val e = RangeRemap(
      Literal(10.0),
      Literal.create(bounds, ArrayType(DoubleType)),
      Literal.create(outs, ArrayType(IntegerType)))
    assert(e.eval(null) == 3)
    assert(RangeRemap(Literal(30.0),
      Literal.create(bounds, ArrayType(DoubleType)),
      Literal.create(outs, ArrayType(IntegerType))).eval(null) == null)
    // degenerate: fewer than 2 bounds -> always null
    assert(RangeRemap(Literal(1.0),
      Literal.create(Seq(1.0), ArrayType(DoubleType)),
      Literal.create(Seq.empty[Int], ArrayType(IntegerType))).eval(null) == null)
  }

  test("malformed input: outs arity mismatch -> null, never OOB read") {
    import spark.implicits._
    val r = Seq(15.0).toDF("v")
      .select(RangeRemap(col("v"), typedLit(bounds), typedLit(Seq(1))).as("out"))
      .head()
    assert(r.isNullAt(0))
  }

  test("wrong SQL arity is a descriptive error, not IndexOutOfBounds") {
    val e = intercept[Exception] {
      spark.sql("SELECT range_remap(1.0, array(0D,1D))").collect()
    }
    assert(e.getMessage.contains("range_remap"))
  }

  test("property: binary search agrees with a linear scan on random bounds") {
    import graft.PropCheck.checkProp
    import org.scalacheck.{Gen, Prop}
    val gen = for {
      raw <- Gen.nonEmptyListOf(Gen.chooseNum(-1000.0, 1000.0))
      v <- Gen.chooseNum(-1100.0, 1100.0)
    } yield (raw.distinct.sorted, v)
    checkProp(Prop.forAll(gen) { case (bs, v) =>
      val os = bs.indices.dropRight(1).toList
      val expect: Any = bs.sliding(2).zipWithIndex.collectFirst {
        case (Seq(lo, hi), i) if v >= lo && v < hi => i
      }.getOrElse(null)
      val got = RangeRemap(Literal(v),
        Literal.create(bs, ArrayType(DoubleType)),
        Literal.create(os, ArrayType(IntegerType))).eval(null)
      got == expect
    })
  }

  test("SQL registration via GraftExtensions") {
    val r = spark.sql(
      "SELECT range_remap(CAST(15 AS DOUBLE), array(0D, 10D, 20D, 30D), array(1, 3, 5)) AS out," +
      "       rfc4180_decode('a,\"b,c\",d') AS parts")
      .head()
    assert(r.getInt(0) == 3)
    assert(r.getSeq[String](1) == Seq("a", "b,c", "d"))
  }

  test("SQL registration of the kernel family (cosine_sim, sq_dist_l2, " +
       "bpe_doc_tokens, bpe_doc_ids)") {
    val r = spark.sql(
      """SELECT cosine_sim(array(1D, 0D), array(1D, 0D)) AS cs,
        |  sq_dist_l2(array(1L, 2L), array(4L, 6L)) AS d2,
        |  bpe_doc_tokens('ab ab', array('a'), array('b')) AS toks,
        |  bpe_doc_ids('ab ab', array('a'), array('b'),
        |              array('a', 'b', 'ab')) AS ids""".stripMargin)
      .head()
    assert(r.getDouble(0) == 1.0)
    assert(r.getLong(1) == 9L + 16L)
    // "ab ab": 2 words, 4 base symbols, merged to 1 token each
    assert(r.getStruct(2).getLong(0) == 2L &&
           r.getStruct(2).getLong(1) == 4L &&
           r.getStruct(2).getLong(2) == 2L)
    assert(r.getSeq[Int](3) == Seq(2, 2))
  }
}

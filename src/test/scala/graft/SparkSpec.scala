package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session).
  * Built with GraftExtensions so SQL-registered functions are testable. */
object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .withExtensions(new graft.functions.GraftExtensions)
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark
}

/** ScalaCheck glue (the scalatest-plus bridge is not in the offline
  * cache): run a Prop, fail the surrounding scalatest test on falsify. */
object PropCheck {
  def checkProp(p: org.scalacheck.Prop, minTests: Int = 100): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default
        .withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }
}

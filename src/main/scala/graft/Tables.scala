package graft

import org.apache.spark.sql.SparkSession

/** Register the fixture tables as temp views, enabling the full Spark
  * SQL TEXT surface over them (`spark.sql("SELECT ...")`). The engine
  * inherits Spark SQL's parser rather than building a dialect
  * (SURVEY §2.C); `q6_sql_text` is the declared, oracle-gated proof that
  * the SQL entry point resolves, optimizes, and pushes down exactly like
  * the DataFrame API — both compile to the same logical plans. */
object Tables {
  val names: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def register(spark: SparkSession, dir: String): Unit =
    names.foreach { n =>
      if (new java.io.File(s"$dir/$n.parquet").exists())
        table(spark, dir, n).createOrReplaceTempView(n)
    }
}

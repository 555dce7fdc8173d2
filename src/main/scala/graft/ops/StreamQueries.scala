package graft.ops

import graft._
import graft.stream.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}

/** S1–S3 declared as batch-equivalence queries: the summer operators run
  * the SAME transform code used for streams, executed in batch mode over
  * the events fixture, hash-checked against DuckDB. S4–S6 (watermark,
  * stateful dedup, mapGroupsWithState) are not batch-expressible — they
  * are exercised by StreamingSpec with MemoryStream inputs. */
object StreamQueries {

  def s1(s: SparkSession, dir: String): DataFrame =
    Streams.tumbling(table(s, dir, "events"))

  def s2(s: SparkSession, dir: String): DataFrame =
    Streams.sliding(table(s, dir, "events"))

  def s3(s: SparkSession, dir: String): DataFrame =
    Streams.sessions(table(s, dir, "events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_tumbling" -> s1,
    "s2_sliding" -> s2,
    "s3_session" -> s3
  )

  val oracle: Map[String, String] = Map(
    "s1_tumbling" ->
      """SELECT ws_us, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_cents
        |FROM (SELECT epoch_us(ts) - epoch_us(ts) % 600000000 AS ws_us, value
        |      FROM events)
        |GROUP BY 1""".stripMargin,
    "s2_sliding" ->
      """SELECT ws_us, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_cents
        |FROM (SELECT (epoch_us(ts) // 300000000 - k.k) * 300000000 AS ws_us,
        |             value
        |      FROM events, (SELECT unnest([0, 1]) AS k) k)
        |GROUP BY 1""".stripMargin,
    "s3_session" ->
      """WITH o AS (
        |  SELECT user_id, epoch_us(ts) AS t, value,
        |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
        |                            ORDER BY ts, event_id) AS prev
        |  FROM events),
        |m AS (SELECT *, CASE WHEN prev IS NULL OR t - prev >= 1800000000
        |                     THEN 1 ELSE 0 END AS new_s FROM o),
        |s AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY t
        |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |      FROM m)
        |SELECT user_id, min(t) AS session_start_us, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS sum_value_cents
        |FROM s GROUP BY user_id, sid""".stripMargin
  )
}

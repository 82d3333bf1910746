package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.{EventBounds, TemporalBounds}
import graft.operators.{EventBoundAgg, TemporalWindowAgg}
import graft.time.Timedelta

/** Scratch driver: exercise the public operator API end-to-end against the
  * real sf0.001 testdata (events table mapped to a predicates frame).
  */
object VerifyDrive {
  def main(args: Array[String]): Unit = {
    val spark = graft.sources.Tables
      .configure(
        SparkSession.builder()
          .master("local[4]")
          .config("spark.sql.shuffle.partitions", "4")
          .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val preds = graft.sources.Tables.eventsAsPredicates(
      spark, "/root/testdata/sf0.001", Seq("click", "purchase", "error"))
    preds.printSchema()

    println("== TemporalWindowAgg: clicks/purchases in [t, t+24h], closed both ==")
    val w = TemporalWindowAgg(preds, TemporalBounds(true, Timedelta.parseMicros("24h"), true, 0L))
    w.orderBy("subject_id", "timestamp").show(8, truncate = false)
    println(s"rows=${w.count()} (input=${preds.count()})")

    println("== EventBoundAgg: sums from each row to next purchase, closed both ==")
    val eb = EventBoundAgg(preds, EventBounds(true, "is_purchase", true, 0L))
    eb.orderBy("subject_id", "timestamp").show(8, truncate = false)

    println("== probe: empty input frame ==")
    val empty = preds.filter(col("subject_id") === -999)
    val we = TemporalWindowAgg(empty, TemporalBounds(true, 86400000000L, true, 0L))
    println(s"temporal on empty: rows=${we.count()} schema=${we.columns.mkString(",")}")
    val ebe = EventBoundAgg(empty, EventBounds(true, "is_purchase", true, 0L))
    println(s"event-bound on empty: rows=${ebe.count()}")

    println("== probe: explain of temporal agg (shuffle count) ==")
    w.explain("formatted")

    spark.stop()
  }
}

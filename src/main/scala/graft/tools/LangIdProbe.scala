package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: phase split of text_langid_trigram at bench scale —
  * explode-only vs (doc, tg) counts vs full classify — so optimization
  * targets the real phase.
  */
object LangIdProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.sources.Tables
      .configure(
        SparkSession.builder()
          .master(s"local[$cpus]")
          .config("spark.sql.shuffle.partitions", cpus)
          .config("spark.ui.enabled", "false")
          .config("spark.sql.adaptive.enabled", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](label: String, runs: Int = 3)(f: => T): Unit = {
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[langid] $label%-28s runs=${ts.map(t => f"$t%.2f").mkString(",")} min=${ts.min}%.2f")
    }

    val base = docs
      .select(col("doc_id"), col("text").as("__text"))
      .repartition(col("doc_id"))
    // Mirror of LangIdTrigram.trigramRows
    val tg = base
      .select(col("doc_id"),
        explode(split(regexp_replace(lower(col("__text")), "[^\\p{L}]+", " "), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"), concat(lit(" "), col("tok"), lit(" ")).as("ptok"))
      .select(col("doc_id"), col("ptok"),
        explode(sequence(lit(1), length(col("ptok")))).as("i"))
      .select(col("doc_id"),
        explode(array((1 to 3).map { n =>
          when(col("i") + (n - 1) <= length(col("ptok")), col("ptok").substr(col("i"), lit(n)))
        }: _*)).as("tg"))
      .filter(col("tg").isNotNull)

    time("trigramRows explode only") {
      tg.write.format("noop").mode("overwrite").save()
    }
    time("(doc,tg) counts") {
      tg.groupBy("doc_id", "tg").agg(count(lit(1)).as("cnt"))
        .write.format("noop").mode("overwrite").save()
    }
    time("classifyAll full") {
      graft.operators.LangIdTrigram.classifyAll(docs)
        .write.format("noop").mode("overwrite").save()
    }
    println(s"[langid] trigram rows = " + tg.count())
    spark.stop()
  }
}

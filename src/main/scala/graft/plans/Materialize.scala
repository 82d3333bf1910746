package graft.plans

import org.apache.spark.sql.DataFrame

/** Lineage-cut points for the recursive plan composition.
  *
  * The window-tree recursion builds plans on plans (one window stack + join
  * per tree edge); left unchecked, Catalyst re-analysis cost grows
  * multiplicatively with tree depth (the Spark analogue of the reference's
  * eager materialization at every step, src/aces/extract_subtree.py).
  *
  * Mode is read from the session conf `spark.graft.checkpoint`:
  *
  *   - `local` (default): `localCheckpoint` — blocks live in executor
  *     storage (memory, spill to disk). Fastest, but NOT fault-tolerant:
  *     lineage is truncated, so on a real cluster an executor loss kills
  *     the query. The right choice for local mode and for clusters where
  *     task retry (not executor loss) is the failure model.
  *   - `reliable`: `df.checkpoint()` to the directory in
  *     `spark.graft.checkpoint.dir` (sets `SparkContext.setCheckpointDir`
  *     on first use) — survives executor loss; the 100 TB-cluster setting.
  *   - `off`: no cuts (tiny data / plan-inspection tests).
  */
object Materialize {

  def mode(df: DataFrame): String =
    df.sparkSession.conf.get("spark.graft.checkpoint", "local")

  def apply(df: DataFrame, eager: Boolean = false): DataFrame = mode(df) match {
    case "off" => df
    case "reliable" =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty) {
        val dir = df.sparkSession.conf
          .get("spark.graft.checkpoint.dir", s"/tmp/graft-checkpoints-${sc.applicationId}")
        sc.setCheckpointDir(dir)
      }
      df.checkpoint(eager)
    case _ => df.localCheckpoint(eager)
  }
}

package graft.util

import org.apache.spark.sql.DataFrame

/** The ONE materialization policy for intermediate frames (iterative
  * rounds, signature tables reused by several join sides).
  *
  * Reliable `checkpoint()` when the session has a checkpoint dir
  * configured (cluster mode — survives executor loss, where a
  * localCheckpoint-truncated lineage would fail the job); else
  * `localCheckpoint` (local/test mode — executor-resident). The
  * reliable branch is always eager: a lazy reliable checkpoint
  * recomputes the plan a second time when the checkpoint files are
  * written (RDD.checkpoint's documented caveat), which costs more than
  * the action it saves. `eager = false` (local branch only) defers
  * materialization to the caller's next action — callers that count or
  * aggregate the frame immediately fold the checkpoint job into that
  * action.
  */
object Persist {
  def stage(df: DataFrame, eager: Boolean = true): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint(eager)

  /** Register a temp tree for recursive deletion on JVM exit (bucketed
    * lake copies, test checkpoint dirs). */
  def deleteOnExit(root: java.io.File): Unit = {
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm)); f.delete(); ()
      }
      rm(root)
    }
    ()
  }
}

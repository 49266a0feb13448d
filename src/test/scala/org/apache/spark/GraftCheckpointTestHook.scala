package org.apache.spark

/** Test-only access to `SparkContext.checkpointDir` (a `private[spark]`
  * var with no public un-set API): PersistFaultSpec flips the shared
  * test context into [[graft.util.Persist.stage]]'s reliable-checkpoint
  * branch and must restore the local branch afterwards so sibling
  * suites keep their localCheckpoint behavior. */
object GraftCheckpointTestHook {
  def clear(sc: SparkContext): Unit = sc.checkpointDir = None
  def get(sc: SparkContext): Option[String] = sc.checkpointDir
}

package graft.operators

import org.apache.spark.sql.DataFrame

/**
 * Eager plan materialization for iterative operators (connected components,
 * ring-expansion kNN, per-round dedup outputs): truncates lineage so plan
 * depth stays O(1) across rounds — the regionsGlobal lesson (NOTES_r3 §6).
 *
 * When `spark.checkpoint.dir` is configured the RELIABLE checkpoint is used:
 * localCheckpoint blocks live only on executors, so at the multi-executor
 * design point losing one executor after a round would make earlier rounds
 * unrecoverable (lineage is gone — FetchFailed aborts the job). In the
 * single-JVM sandbox (executor == driver; its loss is the job's loss either
 * way) there is no checkpoint dir and the cheap local form is correct.
 */
object Materialize {
  def apply(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
}

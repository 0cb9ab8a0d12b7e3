package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage pinning for the iterative operators ([[PageRank]],
  * [[ConnectedComponents]], [[Graph.bfsHops]],
  * [[graft.pipeline.ViewMaintain.foldBatches]]).
  *
  * Iterated plans must be truncated each round or Catalyst replans an
  * ever-deeper join tree; the cheap local form keeps blocks on executor
  * storage (disk+memory) which is fine on one JVM but FRAGILE on a real
  * cluster — lose the executor that holds a block and the job dies,
  * because a `localCheckpoint` severs the lineage needed to recompute
  * it. A 20-iteration PageRank over 100 TB holds hours of work in those
  * blocks; `reliable` checkpointing writes them to the cluster
  * filesystem (HDFS/S3) instead, surviving any executor loss, at the
  * cost of one distributed write per pin.
  *
  * The switch is session state, not a per-call parameter, so a
  * deployment turns it on once:
  *
  * {{{
  * spark.sparkContext.setCheckpointDir("hdfs:///ckpt/graft")
  * spark.conf.set("graft.checkpoint.reliable", "true")
  * }}}
  *
  * and EVERY iterative operator in the session pins reliably from then
  * on. Default is off (local pinning): tests and the bench run
  * single-JVM where executor loss cannot happen and the distributed
  * write is pure overhead. Setting the flag without a checkpoint dir
  * fails loudly at the first pin (never a silent fallback that would
  * let a cluster job believe it is loss-safe when it is not).
  */
object Lineage {

  /** Runtime-conf flag consulted per pin (runtime, not builder: a live
    * session can flip it between jobs).
    */
  val ReliableFlag = "graft.checkpoint.reliable"

  /** Pin `df`: materialize it and truncate lineage. Reliable
    * (checkpoint-dir) when `graft.checkpoint.reliable=true`, local
    * otherwise. Both forms are eager, so callers can count on the
    * upstream plan having executed exactly once after this returns.
    */
  def pin(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    if (spark.conf.get(ReliableFlag, "false").toBoolean) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableFlag=true but no checkpoint dir: call " +
          "spark.sparkContext.setCheckpointDir(<cluster fs path>) first")
      df.checkpoint()
    } else df.localCheckpoint()
  }
}

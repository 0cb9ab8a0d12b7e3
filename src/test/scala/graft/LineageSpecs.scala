package graft

import java.nio.file.{Files, Path}

import graft.operators.{ConnectedComponents, Lineage, PageRank}
import org.apache.spark.sql.DataFrame

/** The reliable-checkpoint switch for the iterative operators
  * (VERDICT r9 item 1): `graft.checkpoint.reliable=true` +
  * `setCheckpointDir` must route every [[Lineage.pin]] through
  * Spark's cluster-filesystem `checkpoint()` — surviving executor
  * loss on a real cluster — while producing bit-identical results to
  * the default local pinning, and the flag without a dir must fail
  * loudly rather than silently fall back to the loss-fragile path.
  */
class LineageSpecs extends SparkSpec {
  import spark.implicits._

  /** Run `body` with the reliable flag on, restoring it after. */
  private def withReliable[A](body: => A): A = {
    spark.conf.set(Lineage.ReliableFlag, "true")
    try body finally spark.conf.set(Lineage.ReliableFlag, "false")
  }

  private def rddFiles(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.filter(p => p.getFileName.toString.startsWith("rdd-")).toSeq
    } finally s.close()
  }

  test("reliable flag without a checkpoint dir fails loudly at the first pin") {
    assume(spark.sparkContext.getCheckpointDir.isEmpty,
      "must run before any test sets the session checkpoint dir")
    val e = withReliable {
      intercept[IllegalArgumentException](Lineage.pin(Seq(1, 2, 3).toDF("x")).count())
    }
    assert(e.getMessage.contains("setCheckpointDir"), e.getMessage)
  }

  test("reliable pinning writes to the checkpoint dir and every iterative operator stays bit-identical") {
    val edges = {
      val rnd = new scala.util.Random(11)
      Seq.fill(400)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong)).filter(p => p._1 != p._2)
    }
    val df = edges.toDF("s", "d")
    def snap(out: DataFrame): Seq[Seq[Any]] =
      out.collect().map(_.toSeq.toIndexedSeq).toIndexedSeq.sortBy(_.mkString("|"))

    // local-pin (default) results first
    val prLocal = snap(PageRank.runInt(df, "s", "d", iters = 9)) // >8 hops: exercises the mid-loop pin
    val ccLocal = snap(ConnectedComponents.run(df, "s", "d"))

    val ckpt = tmpDir("graft-ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    withReliable {
      assert(Lineage.pin(Seq(1).toDF("x")).count() === 1L)
      assert(rddFiles(ckpt).nonEmpty,
        "reliable pin must materialize to the checkpoint dir, not executor storage")
      assert(snap(PageRank.runInt(df, "s", "d", iters = 9)) === prLocal,
        "PageRank under reliable checkpointing must be bit-identical")
      assert(snap(ConnectedComponents.run(df, "s", "d")) === ccLocal,
        "ConnectedComponents under reliable checkpointing must be bit-identical")
    }
    // and the flag actually gates the path: off again -> no new rdd dirs
    val before = rddFiles(ckpt).size
    Lineage.pin(Seq(1).toDF("x")).count()
    assert(rddFiles(ckpt).size === before, "flag off must pin locally again")
  }
}

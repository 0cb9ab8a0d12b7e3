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

/** [[graft.operators.Par.widen]] — explode/kernel input sizing. */
class ParSpec extends SparkSpec {
  import spark.implicits._

  test("widen repartitions a narrow fat-estimate input and leaves wide/small inputs alone") {
    import graft.operators.Par
    // a 1-partition frame whose optimizer estimate is well above the
    // target must widen to ~bytes/target partitions
    val narrow = spark.range(0, 200000).toDF("id")
      .withColumn("pad", org.apache.spark.sql.functions.lpad($"id".cast("string"), 64, "x"))
      .coalesce(1)
    val est = narrow.queryExecution.optimizedPlan.stats.sizeInBytes
    assert(est > (256L << 10), s"test premise: estimate $est must exceed the default target")
    val widened = Par.widen(narrow)
    assert(widened.rdd.getNumPartitions > 1,
      s"a ${est}B 1-partition input must widen (got ${widened.rdd.getNumPartitions})")
    // content-neutral
    assert(widened.count() == 200000L)
    // already-wide inputs return UNCHANGED (no exchange inserted)
    val wide = spark.range(0, 1000).toDF("id").repartition(64)
    assert(Par.widen(wide) eq wide, "an input wider than the target must pass through untouched")
    // tiny inputs stay put even at 1 partition
    val tiny = Seq(1, 2, 3).toDF("x").coalesce(1)
    assert(Par.widen(tiny) eq tiny, "a tiny input must not pay an exchange")
    // synthetic estimates (join/aggregate outputs multiply row-size
    // guesses) must never buy an exchange — widen trusts leaf scans only
    val joined = narrow.as("a").join(narrow.as("b"), "id").coalesce(1)
    assert(Par.widen(joined) eq joined, "a join-output estimate is synthetic; widen must pass through")
    val agged = narrow.groupBy("pad").count().coalesce(1)
    assert(Par.widen(agged) eq agged, "an aggregate-output estimate is synthetic; widen must pass through")
    // the width is capped at a small multiple of the core count: a huge
    // estimate fixes the 1-2-task degeneracy, it does not pick a global
    // shuffle width
    val cap = math.max(spark.sparkContext.defaultParallelism * 4, 32)
    assert(widened.rdd.getNumPartitions <= cap,
      s"widen must cap at $cap (got ${widened.rdd.getNumPartitions})")
  }
}

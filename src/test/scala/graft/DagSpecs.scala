package graft

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger
import scala.concurrent.ExecutionContext
import scala.concurrent.duration._
import scala.jdk.CollectionConverters._

import graft.pipeline.Dag
import graft.pipeline.Dag._

class DagSpecs extends SparkSpec {
  implicit private val ec: ExecutionContext = ExecutionContext.global

  test("diamond topology runs branches concurrently after the root and joins at the barrier (reference DAG shape)") {
    val log = new ConcurrentLinkedQueue[String]
    def node(n: String): () => Unit = () => { log.add(s"$n:start"); Thread.sleep(50); log.add(s"$n:end") }
    val spec = Spec(
      nodes = Map("read" -> node("read"), "contact" -> node("contact"),
        "txn" -> node("txn"), "complete" -> node("complete")),
      edges = Seq("read" -> "contact", "read" -> "txn", "contact" -> "complete", "txn" -> "complete"))
    val res = Dag.run(spec)
    assert(res.succeeded)
    val seq = log.asScala.toSeq
    assert(seq.head == "read:start" && seq(1) == "read:end")
    assert(seq.last == "complete:end")
    // both branches started before either ended => concurrent
    val cs = seq.indexOf("contact:start"); val ce = seq.indexOf("contact:end")
    val ts = seq.indexOf("txn:start")
    assert(ts < ce || cs < seq.indexOf("txn:end"))
  }

  test("failure skips downstream transitively, fires the alert hook, and independent branches still run") {
    val ran = new ConcurrentLinkedQueue[String]
    val alerts = new ConcurrentLinkedQueue[String]
    val spec = Spec(
      nodes = Map(
        "a" -> (() => { ran.add("a") }),
        "bad" -> (() => throw new RuntimeException("boom")),
        "afterBad" -> (() => { ran.add("afterBad") }),
        "leaf" -> (() => { ran.add("leaf") })),
      edges = Seq("a" -> "bad", "bad" -> "afterBad", "a" -> "leaf"),
      onFailure = (n, e) => alerts.add(s"$n:${e.getMessage}"))
    val res = Dag.run(spec)
    assert(!res.succeeded)
    assert(res.states("bad").isInstanceOf[FailedState])
    assert(res.states("afterBad") == UpstreamFailed)
    assert(res.states("a") == Succeeded && res.states("leaf") == Succeeded)
    assert(ran.asScala.toSet === Set("a", "leaf"))
    assert(alerts.asScala.toSeq === Seq("bad:boom"))
  }

  test("retries re-attempt with the configured count then record attempts") {
    val tries = new AtomicInteger(0)
    val spec = Spec(
      nodes = Map("flaky" -> (() => { if (tries.incrementAndGet() < 3) throw new RuntimeException("flake") })),
      edges = Seq.empty, retries = 2, retryDelay = 10.millis)
    assert(Dag.run(spec).succeeded)
    assert(tries.get() === 3)

    val tries2 = new AtomicInteger(0)
    val spec2 = spec.copy(nodes = Map("dead" -> (() => { tries2.incrementAndGet(); throw new RuntimeException("always") })))
    val res2 = Dag.run(spec2)
    assert(res2.states("dead") == FailedState(res2.states("dead").asInstanceOf[FailedState].error, 3))
    assert(tries2.get() === 3)
  }

  test("retry delays do not park pool threads: two waiting nodes overlap their delays on a 1-thread pool") {
    // a blocking (Thread.sleep) retry would serialize the two delays on
    // the single-thread pool (>= 2s); the timer-based wait overlaps them
    val pool = java.util.concurrent.Executors.newFixedThreadPool(1)
    val ec1 = scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val t1 = new AtomicInteger(0)
      val t2 = new AtomicInteger(0)
      val spec = Spec(
        nodes = Map(
          "a" -> (() => { if (t1.incrementAndGet() < 2) throw new RuntimeException("flake-a") }),
          "b" -> (() => { if (t2.incrementAndGet() < 2) throw new RuntimeException("flake-b") })),
        edges = Seq.empty, retries = 1, retryDelay = 1.second)
      val t0 = System.nanoTime()
      assert(Dag.run(spec)(ec1).succeeded)
      val wall = (System.nanoTime() - t0) / 1e9
      assert(wall < 1.8, f"delays serialized: $wall%.2f s on a 1-thread pool (blocking floor = 2 s)")
    } finally { ec1.shutdown() }
  }

  test("cycles are rejected up front") {
    val spec = Spec(
      nodes = Map("a" -> (() => ()), "b" -> (() => ())),
      edges = Seq("a" -> "b", "b" -> "a"))
    intercept[IllegalArgumentException](Dag.run(spec))
  }

  test("orchestrates real Spark jobs: read -> two entity aggregations -> barrier write") {
    val dir = tmpDir("dagspark").toString
    val t = Tables(spark, "/root/testdata/sf0.001")
    val spec = Spec(
      nodes = Map(
        "orders_agg" -> (() => t.orders.groupBy("o_orderpriority").count()
          .write.mode("overwrite").parquet(s"$dir/orders_agg")),
        "lineitem_agg" -> (() => t.lineitem.groupBy("l_returnflag").count()
          .write.mode("overwrite").parquet(s"$dir/lineitem_agg")),
        "summary" -> (() => {
          val a = spark.read.parquet(s"$dir/orders_agg").count()
          val b = spark.read.parquet(s"$dir/lineitem_agg").count()
          spark.range(a + b).write.mode("overwrite").parquet(s"$dir/summary")
        })),
      edges = Seq("orders_agg" -> "summary", "lineitem_agg" -> "summary"))
    assert(Dag.run(spec).succeeded)
    assert(spark.read.parquet(s"$dir/summary").count() === 5L + 3L)
  }
}

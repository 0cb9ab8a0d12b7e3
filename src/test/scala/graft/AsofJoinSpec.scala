package graft

import graft.plans.AsofJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom sort-merge AS-OF JOIN operator (logical node + strategy +
  * physical exec): value-equivalence against the composed
  * union+running-last form q50 ships, plan shape, and the semantic
  * edges (null keys/times, no-match lefts, tie handling, empty right).
  */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def events = {
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir).events
  }

  test("asof equals the composed union+window form on real events (and the plan is the custom exec)") {
    val ev = events
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id".as("c_user"), $"ts".as("cts"))
      .agg(max("event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))

    val got = AsofJoin.asof(purchases, clicks,
        leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
        leftTime = "ts", rightTime = "cts")
      .select($"purchase_id", $"user_id", $"ts", $"click_id",
        (unix_micros($"ts") - unix_micros($"cts")).as("gap_us"))

    // the q50 composition as ground truth
    val cl = clicks.select($"c_user".as("user_id"), $"cts".as("ts"), lit(0).as("tag"),
      $"click_id", $"cts", lit(null).cast("long").as("purchase_id"))
    val pu = purchases.select($"user_id", $"ts", lit(1).as("tag"),
      lit(null).cast("long").as("click_id"), lit(null).cast("timestamp").as("cts"),
      $"purchase_id")
    val w = Window.partitionBy("user_id").orderBy("ts", "tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = cl.unionByName(pu)
      .withColumn("asof_click", last("click_id", ignoreNulls = true).over(w))
      .withColumn("asof_cts", last("cts", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"purchase_id", $"user_id", $"ts", $"asof_click".as("click_id"),
        (unix_micros($"ts") - unix_micros($"asof_cts")).as("gap_us"))

    assert(got.orderBy("purchase_id").collect().toSeq ==
      want.orderBy("purchase_id").collect().toSeq)
    assert(got.count() == purchases.count(), "left outer: every purchase survives")

    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec must plan the join:\n$plan")
    assert(!plan.contains("Window"), "no window machinery in the custom plan")
  }

  test("broadcast route: small dims plan BroadcastAsofJoinExec, row-identical to the merge exec, fact side unshuffled") {
    val ev = events
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id".as("c_user"), $"ts".as("cts"))
      .agg(max("event_id").as("click_id"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id".as("purchase_id"))
    def run() = AsofJoin.asof(purchases, clicks,
      leftKeys = Seq("user_id"), rightKeys = Seq("c_user"),
      leftTime = "ts", rightTime = "cts")
    // default: the dim is under the broadcast threshold -> broadcast exec
    val b = run()
    val bPlan = b.queryExecution.executedPlan.toString
    assert(bPlan.contains("BroadcastAsofJoin"), s"expected broadcast route:\n$bPlan")
    assert(bPlan.contains("BroadcastExchange"), "dim must ship via a broadcast exchange")
    // the fact side takes NO exchange on this path (its scan partitions
    // flow straight into the join)
    val factExchanges = b.queryExecution.executedPlan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(factExchanges.isEmpty, "broadcast as-of must not shuffle either side")
    // forced merge path: same rows
    val old = spark.conf.get("spark.graft.asofBroadcast.enabled", "true")
    val m = try {
      spark.conf.set("spark.graft.asofBroadcast.enabled", "false")
      val m0 = run()
      assert(m0.queryExecution.executedPlan.toString.contains("AsofJoin ") ||
        !m0.queryExecution.executedPlan.toString.contains("BroadcastAsofJoin"),
        "disabled knob must fall back to the sort-merge exec")
      m0.orderBy("purchase_id", "click_id").collect().toSeq
    } finally spark.conf.set("spark.graft.asofBroadcast.enabled", old)
    assert(b.orderBy("purchase_id", "click_id").collect().toSeq == m,
      "broadcast and merge execs must be row-identical")
  }

  test("broadcast exec edges: null keys/times, unmatched lefts, last-tie-wins — identical to the merge exec") {
    val right = Seq(
      (Some(1L), Some(10L), "r10a"), (Some(1L), Some(10L), "r10b"), // tie on (key, time)
      (Some(1L), Some(20L), "r20"), (None, Some(5L), "rnull"),
      (Some(2L), Option.empty[Long], "tnull"),
    ).toDF("rk", "rt", "payload")
    val left = Seq(
      (Some(1L), Some(15L)), (Some(1L), Some(10L)), (Some(1L), Some(5L)),
      (Some(2L), Some(100L)), (None, Some(50L)), (Some(1L), Option.empty[Long]),
    ).toDF("k", "t")
    def run() = AsofJoin.asof(left, right, Seq("k"), Seq("rk"), "t", "rt")
      .select($"k", $"t", $"payload").collect().map(_.toSeq).toSet
    val b = run()
    val old = spark.conf.get("spark.graft.asofBroadcast.enabled", "true")
    val m = try {
      spark.conf.set("spark.graft.asofBroadcast.enabled", "false")
      run()
    } finally spark.conf.set("spark.graft.asofBroadcast.enabled", old)
    assert(b == m, s"broadcast vs merge mismatch:\n$b\nvs\n$m")
    // last tie wins on both paths
    assert(b.contains(Seq(1L, 15L, "r10b")) && b.contains(Seq(1L, 10L, "r10b")))
    // null key / null time / pre-history lefts keep null payloads
    assert(b.contains(Seq(1L, 5L, null)) && b.contains(Seq(null, 50L, null))
      && b.contains(Seq(1L, null, null)))
    // a key whose only dim rows carry null times never matches
    assert(b.contains(Seq(2L, 100L, null)))
  }

  test("semantic edges: null keys/times never match; unmatched lefts keep nulls; last tie wins") {
    val right = Seq(
      (Some(1L), Some(10L), "r10"), (Some(1L), Some(20L), "r20"),
      (Some(1L), Some(20L), "r20b"), // tie on (key, time): last in sort order wins
      (Some(2L), None, "rnull"),     // null time: never matches
      (None, Some(5L), "knull"),     // null key: never matches
    ).toDF("rk", "rt", "payload")
    val left = Seq(
      (Some(1L), Some(25L)),  // matches the (1, 20) tie group
      (Some(1L), Some(15L)),  // matches (1, 10)
      (Some(1L), Some(5L)),   // before all: no match
      (Some(2L), Some(50L)),  // only a null-time right: no match
      (Some(3L), Some(1L)),   // no right key at all
      (None, Some(9L)),       // null left key: no match
      (Some(1L), None),       // null left time: no match
    ).toDF("lk", "lt")
    val out = AsofJoin.asof(left, right, Seq("lk"), Seq("rk"), "lt", "rt")
      .select($"lk", $"lt", $"payload")
      .collect().map(r => (Option(r.get(0)), Option(r.get(1)), Option(r.get(2)))).toSet
    assert(out == Set(
      (Some(1L), Some(25L), Some("r20b")),
      (Some(1L), Some(15L), Some("r10")),
      (Some(1L), Some(5L), None),
      (Some(2L), Some(50L), None),
      (Some(3L), Some(1L), None),
      (None, Some(9L), None),
      (Some(1L), None, None),
    ), s"got $out")
  }

  test("empty right side: pure left outer; collision and arity guards fire") {
    val left = Seq((1L, 10L)).toDF("k", "t")
    val right = Seq.empty[(Long, Long)].toDF("rk", "rt")
    val out = AsofJoin.asof(left, right, Seq("k"), Seq("rk"), "t", "rt").collect()
    assert(out.length == 1 && out(0).isNullAt(2) && out(0).isNullAt(3))
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left, Seq((1L, 1L)).toDF("k", "t"), Seq("k"), Seq("k"), "t", "t")
    }
    intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, Seq("k"), Seq("nope"), "t", "rt")
    }
  }

  test("multi-key asof joins on the full compound key") {
    val right = Seq((1L, "a", 10L, 100L), (1L, "b", 10L, 200L), (2L, "a", 10L, 300L))
      .toDF("rk1", "rk2", "rt", "rv")
    val left = Seq((1L, "a", 15L), (1L, "b", 15L), (2L, "b", 15L))
      .toDF("k1", "k2", "t")
    val out = AsofJoin.asof(left, right, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select($"k1", $"k2", $"rv")
      .collect().map(r => (r.getLong(0), r.getString(1), Option(r.get(2)))).toSet
    assert(out == Set((1L, "a", Some(100L)), (1L, "b", Some(200L)), (2L, "b", None)))
  }
}

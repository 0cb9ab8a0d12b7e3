package graft

import graft.operators.{FieldMapping, MappingCompiler}
import graft.pipeline.VerifiedUpdates
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based tests (SURVEY §5.3): totality of the mapping compiler
  * over arbitrary configs, hash-range invariants, and the two algebraic
  * laws the pipeline correctness rests on — split-then-union identity
  * and keyed-upsert idempotence (the replay-safety half of §3.2).
  *
  * Uses raw ScalaCheck generators with fixed seeds (the scalatest
  * bridge isn't in the offline dependency cache; fixed seeds also make
  * failures reproducible).
  */
class PropertySpecs extends SparkSpec {
  import spark.implicits._

  private def forAll[A](gen: Gen[A], n: Int = 20)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(5, Gen.alphaNumChar)
  } yield (h :: t).mkString

  test("mapping compiler is total over arbitrary rename/cast configs and preserves arity") {
    // casts constrained to type-compatible targets: under ANSI mode a
    // mapping config with e.g. name->bigint correctly FAILS at run time,
    // so totality is only claimed over well-typed configs
    val validCasts = Map(
      "id" -> Seq("string", "bigint", "double"),
      "name" -> Seq("string"),
      "score" -> Seq("string", "double"))
    val field = for {
      src <- Gen.oneOf("id", "name", "score")
      dst <- ident
      cast <- Gen.option(Gen.oneOf(validCasts(src)))
    } yield FieldMapping(src, dst, cast)
    val cfg = Gen.choose(1, 6).flatMap(n => Gen.listOfN(n, field))
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "name", "score")
    forAll(cfg) { mapping =>
      // distinct dst names required by select; dedup keeps the property total
      val m = mapping.distinctBy(_.dst)
      val out = MappingCompiler.transform(df, m)
      assert(out.columns.toSeq === m.map(_.dst))
      assert(out.count() === 2L)
    }
  }

  test("poly hash stays in [0, 2^31-1) for arbitrary ASCII strings") {
    forAll(Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString)) { s =>
      val esc = s.replace("\\", "\\\\").replace("'", "\\'")
      val h = spark.sql(s"SELECT graft_poly_hash('$esc')").collect()(0).getLong(0)
      assert(h >= 0L && h < 2147483647L)
    }
  }

  test("split-then-union is the identity on the event stream (entity fan-out loses nothing)") {
    forAll(Gen.listOf(Gen.oneOf("click", "purchase", "signup"))) { types =>
      val ev = types.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("event_id", "event_type")
      val parts = Seq("click", "purchase", "signup").map(t => ev.filter($"event_type" === t))
      val reunited = parts.reduce(_ unionAll _)
      assert(reunited.count() === ev.count())
      assert(reunited.except(ev).isEmpty && ev.except(reunited).isEmpty)
    }
  }

  test("dsum128 is bit-identical to sum(CAST AS DECIMAL) for arbitrary doubles, all scales") {
    import org.apache.spark.sql.functions.{col, sum}
    import org.apache.spark.sql.types.DecimalType
    // mix of clean money values, knife-edge half-cases (x.xx5, x.xxxxx05),
    // negatives, zeros, nulls, and raw arbitrary doubles
    val vGen: Gen[Option[Double]] = Gen.frequency(
      4 -> Gen.choose(-99999999L, 99999999L).map(n => Some(n / 100.0)),
      2 -> Gen.choose(-9999999L, 9999999L).map(n => Some(n / 1000.0)),   // 3 decimals at scale 2 = ties
      2 -> Gen.choose(-999999999999L, 999999999999L).map(n => Some(n / 1e7)), // 7 decimals at scale 6 = ties
      // contract: per-row |v * 10^scale| must fit a long (scale 6 => |v| < 9.2e12)
      1 -> Gen.choose(-1e10, 1e10).map(Some(_)),
      1 -> Gen.const(None))
    forAll(Gen.listOfN(200, vGen), n = 5) { vals =>
      val df = vals.map(v => Tuple1(v.map(Double.box).orNull.asInstanceOf[java.lang.Double]))
        .toDF("v").selectExpr("CAST(v AS DOUBLE) AS v")
      for (scale <- Seq(0, 2, 6)) {
        val fast = df.agg(Num.dsum(col("v"), scale).as("s")).collect()(0)
        val slowRow = df.agg(sum(col("v").cast(DecimalType(30, scale))).cast("double").as("s")).collect()(0)
        assert(fast.isNullAt(0) === slowRow.isNullAt(0), s"null-ness diverged at scale $scale")
        if (!fast.isNullAt(0)) {
          val f = java.lang.Double.doubleToRawLongBits(fast.getDouble(0))
          val s = java.lang.Double.doubleToRawLongBits(slowRow.getDouble(0))
          assert(f === s, s"scale $scale: ${fast.getDouble(0)} != ${slowRow.getDouble(0)} over $vals")
        }
      }
    }
  }

  test("dsum128 carry path: sums far beyond 2^64 in the low word stay bit-identical to decimal Sum") {
    import org.apache.spark.sql.functions.{col, sum}
    import org.apache.spark.sql.types.DecimalType
    // 300 rows of ~9e16 (unscaled ~9e18, near the long edge) push the
    // accumulator through many lo-word overflows; mixed signs exercise
    // the sign-extension half of the 128-bit add
    val vals = Seq.fill(200)(9.0e16) ++ Seq.fill(100)(-8.7e16) ++ Seq(0.01, -0.01, 12345.67)
    val df = vals.toDF("v")
    val fast = df.agg(Num.dsum(col("v")).as("s")).collect()(0).getDouble(0)
    val slow = df.agg(sum(col("v").cast(DecimalType(38, 2))).cast("double").as("s")).collect()(0).getDouble(0)
    assert(java.lang.Double.doubleToRawLongBits(fast) === java.lang.Double.doubleToRawLongBits(slow),
      s"$fast != $slow")
  }

  test("dsum128 rejects per-row values whose scaled form exceeds the long range, loudly") {
    import org.apache.spark.sql.functions.col
    val df = Seq(1e14).toDF("v")
    val e = intercept[org.apache.spark.SparkException] {
      df.agg(Num.dsum(col("v"), 6)).collect()
    }
    def root(t: Throwable): Throwable = if (t.getCause == null) t else root(t.getCause)
    assert(root(e).isInstanceOf[ArithmeticException])
  }

  test("dsum128 partitioning-independence: 1-partition and 32-partition sums agree bitwise") {
    import org.apache.spark.sql.functions.col
    val dir = "/root/testdata/sf0.001"
    val li = Tables(spark, dir).lineitem
    def run(df: org.apache.spark.sql.DataFrame) =
      df.agg(Num.dsum(col("l_extendedprice")).as("a"), Num.dsum(col("l_discount"), 6).as("b")).collect()(0)
    val one = run(li.repartition(1))
    val many = run(li.repartition(32))
    assert(java.lang.Double.doubleToRawLongBits(one.getDouble(0)) ===
      java.lang.Double.doubleToRawLongBits(many.getDouble(0)))
    assert(java.lang.Double.doubleToRawLongBits(one.getDouble(1)) ===
      java.lang.Double.doubleToRawLongBits(many.getDouble(1)))
  }

  test("keyed upsert is idempotent for arbitrary update batches (replay safety)") {
    val updatesGen = Gen.listOf(for {
      key <- Gen.choose(1L, 5L)
      seq <- Gen.choose(1L, 10L)
      v <- ident
    } yield (key, seq, v))
    val base = Seq((1L, "b1"), (2L, "b2"), (3L, "b3")).toDF("k", "v")
    forAll(updatesGen) { ups =>
      whenever(ups.map(u => (u._1, u._2)).distinct.size == ups.size) {
        val u = ups.toDF("k", "seq", "v_new")
        def apply(b: org.apache.spark.sql.DataFrame) =
          VerifiedUpdates(b, u, Seq("k"), "seq", Map("v" -> "v_new"))
        val once = apply(base).orderBy("k").collect().toSeq
        val twice = apply(apply(base)).orderBy("k").collect().toSeq
        assert(once === twice)
      }
    }
  }
}

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

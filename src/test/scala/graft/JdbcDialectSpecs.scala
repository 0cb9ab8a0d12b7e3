package graft

import graft.pipeline.JdbcUpsert
import graft.pipeline.JdbcUpsert.{Derby, Dialect, MySql, Postgres}
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Dialect-level verification of the Postgres/MySQL upsert SQL that
  * cannot run live in this container (no Postgres/MySQL server, no H2
  * in the offline cache — Derby, the one live engine, runs the MERGE
  * dialect in JdbcLiveSpecs).
  *
  * Two layers:
  *  1. golden text: the exact statements a production deploy would
  *     prepare, pinned verbatim (tools/check_pg_dialect.py executes
  *     the SAME Postgres golden text against DuckDB — which implements
  *     Postgres ON CONFLICT — proving insert/update/replay semantics
  *     on a live engine; the spec and the tool assert identical
  *     strings, so the generator cannot drift from what was executed);
  *  2. structural invariants over ARBITRARY schemas: placeholder count
  *     == bind-plan length for every dialect (a mismatch is the
  *     classic silent-corruption bug in hand-built JDBC), every bind
  *     ordinal resolves, and each non-key column is updated exactly
  *     once.
  */
class JdbcDialectSpecs extends AnyFunSuite {

  // ---- golden statements (mirrored in tools/check_pg_dialect.py) --------

  test("Postgres golden text: multi-column and all-key forms") {
    assert(JdbcUpsert.upsertSql(Postgres, "contacts", Seq("id", "name", "balance"), Seq("id"))
      === "INSERT INTO contacts (id, name, balance) VALUES (?, ?, ?) " +
        "ON CONFLICT (id) DO UPDATE SET name = EXCLUDED.name, balance = EXCLUDED.balance")
    assert(JdbcUpsert.upsertSql(Postgres, "pairs", Seq("a", "b"), Seq("a", "b"))
      === "INSERT INTO pairs (a, b) VALUES (?, ?) ON CONFLICT (a, b) DO NOTHING")
    assert(JdbcUpsert.upsertSql(Postgres, "m", Seq("k1", "k2", "v"), Seq("k1", "k2"))
      === "INSERT INTO m (k1, k2, v) VALUES (?, ?, ?) " +
        "ON CONFLICT (k1, k2) DO UPDATE SET v = EXCLUDED.v")
  }

  test("MySQL golden text: multi-column and all-key forms") {
    assert(JdbcUpsert.upsertSql(MySql, "contacts", Seq("id", "name", "balance"), Seq("id"))
      === "INSERT INTO contacts (id, name, balance) VALUES (?, ?, ?) " +
        "ON DUPLICATE KEY UPDATE name = VALUES(name), balance = VALUES(balance)")
    assert(JdbcUpsert.upsertSql(MySql, "pairs", Seq("a", "b"), Seq("a", "b"))
      === "INSERT INTO pairs (a, b) VALUES (?, ?) ON DUPLICATE KEY UPDATE a = a")
  }

  // ---- structural invariants over arbitrary schemas ---------------------

  private def forAll[A](gen: Gen[A], n: Int = 60)(f: A => Unit): Unit =
    (0 until n).foreach(i => gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f))

  private val ident: Gen[String] = for {
    h <- Gen.alphaLowerChar
    t <- Gen.listOfN(4, Gen.alphaNumChar)
  } yield (h :: t).mkString

  private val schema: Gen[(Seq[String], Seq[String])] = for {
    cols <- Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, ident)).map(_.distinct)
    nk <- Gen.chooseNum(1, cols.length)
  } yield (cols, cols.take(nk))

  test("placeholder count == bind-plan length, and every ordinal resolves (all dialects, arbitrary schemas)") {
    forAll(schema) { case (cols, keys) =>
      Seq[Dialect](Postgres, MySql, Derby).foreach { d =>
        val sql = JdbcUpsert.upsertSql(d, "t", cols, keys)
        val params = JdbcUpsert.paramCols(d, cols, keys)
        assert(sql.count(_ == '?') === params.length,
          s"$d $cols keys=$keys: '$sql' vs $params")
        // every bind position resolves to a real column ordinal — a -1
        // from indexOf would silently bind the wrong value at runtime
        assert(params.forall(cols.contains), s"$d: unresolvable bind col in $params")
      }
    }
  }

  test("each non-key column is assigned exactly once in the update clause (Postgres/MySQL)") {
    forAll(schema) { case (cols, keys) =>
      val updatable = cols.filterNot(keys.contains)
      whenever(updatable.nonEmpty) {
        val pg = JdbcUpsert.upsertSql(Postgres, "t", cols, keys)
        val my = JdbcUpsert.upsertSql(MySql, "t", cols, keys)
        // parse the SET clause into exact (lhs, rhs) assignments —
        // substring matching would false-positive on prefix-sharing
        // column names (col "ab" vs "xab")
        val pgSets = pg.split(" DO UPDATE SET ")(1).split(", ").map(_.split(" = ")).toSeq
        val mySets = my.split(" ON DUPLICATE KEY UPDATE ")(1).split(", ").map(_.split(" = ")).toSeq
        assert(pgSets.map(_(0)).sorted === updatable.sorted, s"pg SET lhs: $pg")
        assert(mySets.map(_(0)).sorted === updatable.sorted, s"my SET lhs: $my")
        updatable.foreach { c =>
          assert(pgSets.count(a => a(0) == c && a(1) == s"EXCLUDED.$c") === 1, s"pg: $c in $pg")
          assert(mySets.count(a => a(0) == c && a(1) == s"VALUES($c)") === 1, s"my: $c in $my")
        }
      }
    }
  }

  private def whenever(cond: Boolean)(f: => Unit): Unit = if (cond) f
}

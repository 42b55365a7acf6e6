package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.etl.Merge

/** Property-based invariants (SURVEY §5.4) using ScalaCheck generators
  * directly (no scalatestplus bridge in the offline dep set): merge
  * idempotence, insert-if-absent key uniqueness, map-update monotonicity. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val kvGen = Gen.listOfN(8,
    Gen.zip(Gen.choose(0L, 5L), Gen.choose(0, 100)))

  private def samples(n: Int): Seq[List[(Long, Int)]] =
    (1 to n).map(i => kvGen.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("insertIfAbsent never produces duplicate keys") {
    for (t <- samples(5); s <- samples(3)) {
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v")
      val out = Merge.insertIfAbsent(target, source, Seq("k"))
      assert(out.groupBy("k").count().filter(col("count") > 1).isEmpty,
        s"dup keys for target=$t source=$s")
    }
  }

  test("mergeUpsert is idempotent for any source") {
    for ((t, s) <- samples(5).zip(samples(5).reverse)) {
      val target = t.toDF("k", "v").dropDuplicates("k")
      val source = s.toDF("k", "v").dropDuplicates("k")
      val once = Merge.mergeUpsert(target, source, Seq("k"), Seq("v"))
      val twice = Merge.mergeUpsert(once, source, Seq("k"), Seq("v"))
      assert(once.orderBy("k", "v").collect().toSeq ==
        twice.orderBy("k", "v").collect().toSeq,
        s"not idempotent for target=$t source=$s")
    }
  }

  test("mapUpdate never un-maps and never changes out-of-guard rows") {
    for (facts <- samples(8)) {
      val fact = facts.zipWithIndex
        .map { case ((fk, v), i) =>
          (i.toLong, fk, if (v % 2 == 0) 0L else v.toLong) }
        .toDF("id", "fk", "mapped")
      val mapping = Seq((1L, 101L), (3L, 103L)).toDF("mk", "mv")
      val out = Merge.mapUpdate(fact, mapping, Seq(col("fk") === col("mk")),
        Map("mapped" -> col("mv")), guard = col("mapped") === 0)
      val before = fact.select("id", "mapped").as[(Long, Long)]
        .collect().toMap
      val after = out.select("id", "mapped").as[(Long, Long)]
        .collect().toMap
      before.foreach { case (id, m) =>
        if (m != 0) assert(after(id) == m, s"already-mapped row $id changed")
        else assert(after(id) == 0 || after(id) > 100,
          s"unmapped row $id got bogus value ${after(id)}")
      }
    }
  }
}

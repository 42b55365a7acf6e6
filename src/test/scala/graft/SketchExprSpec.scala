package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions
import graft.ops.Dedup

/** Native Catalyst sketch expressions: correctness + SQL registration. */
class SketchExprSpec extends SparkSpec {
  import spark.implicits._

  test("minhash_sig: identical texts identical, disjoint differ, stable size") {
    val df = Seq("a b c d e f", "a b c d e f", "q r s t u v")
      .toDF("text")
      .select(GraftFunctions.minhash_sig(col("text"), 16, 2).as("sig"))
    val sigs = df.collect().map(_.getSeq[Long](0))
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1))
    assert(sigs(0) != sigs(2))
  }

  test("minhash_sig estimates jaccard: overlapping docs share signature slots") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val near = (3 to 60).map(i => s"w$i").mkString(" ")
    val far = (100 to 160).map(i => s"z$i").mkString(" ")
    val sigs = Seq(base, near, far).toDF("text")
      .select(GraftFunctions.minhash_sig(col("text"), 64, 2).as("s"))
      .collect().map(_.getSeq[Long](0))
    def agree(a: Seq[Long], b: Seq[Long]) = a.zip(b).count(p => p._1 == p._2)
    assert(agree(sigs(0), sigs(1)) > 40) // high-jaccard pair agrees often
    assert(agree(sigs(0), sigs(2)) < 10) // disjoint pair almost never
  }

  test("simhash64: identical zero-hamming, near texts low, far texts high") {
    val base = (1 to 80).map(i => s"w$i").mkString(" ")
    val near = (2 to 80).map(i => s"w$i").mkString(" ")
    val far = (200 to 280).map(i => s"z$i").mkString(" ")
    val hs = Seq(base, base, near, far).toDF("text")
      .select(GraftFunctions.simhash64(col("text")).as("h"))
      .collect().map(_.getLong(0))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(hs(0), hs(1)) == 0)
    assert(ham(hs(0), hs(2)) <= 8)
    assert(ham(hs(0), hs(3)) > 16)
  }

  test("expressions survive codegen inside a larger projection") {
    val df = spark.range(200).select(
      concat_ws(" ", lit("tok"), col("id"), lit("x y z")).as("text"))
      .select(GraftFunctions.simhash64(col("text")).as("h"),
        GraftFunctions.minhash_sig(col("text"), 8, 2).as("s"),
        length(col("text")).as("l"))
    assert(df.filter(col("h").isNotNull && size(col("s")) === 8).count() == 200)
  }

  test("SQL registration: graft_minhash_sig / graft_simhash64 callable") {
    GraftFunctions.register(spark)
    Seq("a b c").toDF("text").createOrReplaceTempView("v_sketch")
    val r = spark.sql(
      "SELECT size(graft_minhash_sig(text)) s, graft_simhash64(text) h FROM v_sketch")
      .first()
    assert(r.getInt(0) == 32)
  }

  test("l2_sq kernel is bit-identical to the HOF fold, float and double") {
    val l2Hof = (a: org.apache.spark.sql.Column,
                 b: org.apache.spark.sql.Column) =>
      aggregate(zip_with(a, b, (x, y) =>
          (x.cast("double") - y.cast("double")) *
            (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, v) => acc + v)
    val f = Seq((Array(1.5f, -2.25f, 0.125f), Array(0.5f, 3.75f, -1.0f)))
      .toDF("a", "b")
    val rf = f.select(GraftFunctions.l2_sq(col("a"), col("b")).as("k"),
      l2Hof(col("a"), col("b")).as("h")).first()
    assert(rf.getDouble(0) === rf.getDouble(1))
    val d = Seq((Array(1.0e-7, 2.0, -3.0), Array(4.0, -5.0e3, 6.0)))
      .toDF("a", "b")
    val rd = d.select(GraftFunctions.l2_sq(col("a"), col("b")).as("k"),
      l2Hof(col("a"), col("b")).as("h")).first()
    assert(rd.getDouble(0) === rd.getDouble(1))
    // identical arrays -> exactly zero (the pqTopK self-rank invariant)
    assert(f.select(GraftFunctions.l2_sq(col("a"), col("a"))).first()
      .getDouble(0) === 0.0)
  }

  test("simHashCandidates on the native path still finds planted dup") {
    val base = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base),
      (3L, (300 to 360).map(i => s"z$i").mkString(" "))).toDF("doc_id", "text")
    val out = Dedup.simHashCandidates(docs, blocks = 4, maxHamming = 3).collect()
    assert(out.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L))
    assert(!out.exists(r => r.getLong(1) == 3L))
  }
}

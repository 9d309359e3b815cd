package graft

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-style specs: generated inputs, one Spark round-trip per
  * property (a DataFrame of all samples, not a job per case), compared
  * against plain-Scala reference implementations.
  */
class PropertySpec extends AnyFunSuite with SparkTestBase {

  private val tokenGen: Gen[List[String]] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.listOfN(n, Gen.oneOf(
      "the", "a", "join", "hash", "row", "scan", "filter", "sort", "merge", "dup")))

  private def samples[A](g: Gen[A], n: Int): List[A] =
    (0 until n).toList.flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("ShingleExpr equals the sliding-window reference on generated inputs") {
    import spark.implicits._
    val data = samples(tokenGen, 200)
    val df = data.zipWithIndex.map { case (ts, i) => (i, ts) }.toDF("id", "toks")
    val got = df.select($"id", shingles($"toks", 3).as("sh"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1).toList).toMap
    data.zipWithIndex.foreach { case (ts, i) =>
      val want = if (ts.length >= 3) ts.sliding(3).map(_.mkString(" ")).toList else Nil
      assert(got(i) == want, s"sample $i: ${ts.mkString(",")}")
    }
  }

  test("permHash family members are permutations (injective on a range)") {
    import spark.implicits._
    val n = 100000L
    val df = spark.range(n).toDF("h")
    (0 until 4).foreach { p =>
      val distinct = df.select(permHash($"h", p).as("x")).distinct().count()
      assert(distinct == n, s"perm $p collides on 0..$n")
    }
  }

  test("CosineSim: self-similarity 1, symmetry, bounded") {
    import spark.implicits._
    val e = Tables.load(spark, sf, "embeddings").limit(50)
      .select($"vec_id", asDouble($"embedding").as("v"))
    val self = e.select(cosineSim($"v", $"v").as("c")).collect().map(_.getDouble(0))
    assert(self.forall(c => math.abs(c - 1.0) < 1e-9))
    val pairs = e.as("x").join(e.as("y"), $"x.vec_id" < $"y.vec_id")
      .select(cosineSim($"x.v", $"y.v").as("xy"), cosineSim($"y.v", $"x.v").as("yx"))
      .collect()
    assert(pairs.forall(r => r.getDouble(0) == r.getDouble(1)), "not symmetric")
    assert(pairs.forall(r => r.getDouble(0) >= -1.0 - 1e-9 && r.getDouble(0) <= 1.0 + 1e-9))
  }

  test("sessionization invariants: in-session gaps <= 30min, sessions ordered") {
    import spark.implicits._
    val sess = SparkEntry.queries("e02_sessionize")(spark, sf)
    // session windows of one user never overlap and are time-ordered by id
    val bad = sess.as("a").join(sess.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.session_id" + 1 === $"b.session_id" &&
          $"b.start_us" - $"a.end_us" <= 1800000000L)
      .count()
    assert(bad == 0, "adjacent sessions closer than the 30-min gap")
  }
}

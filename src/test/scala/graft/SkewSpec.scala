package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Skew

class SkewSpec extends AnyFunSuite with SparkTestBase {

  test("salted join returns the same rows as a plain join") {
    import spark.implicits._
    // hot key: 10k rows of key 1 on the skewed side
    val big = ((1 to 10000).map(i => (1L, i)) ++ Seq((2L, -1), (3L, -2)))
      .toDF("k", "v")
    val dim = Seq((1L, "one"), (2L, "two"), (4L, "four")).toDF("k", "name")
    val plain = big.join(dim, Seq("k")).select("k", "v", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, dim, "k", salts = 8)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(salted == plain)
    assert(salted.size == 10001)
  }

  test("salted join rejects join types that duplicate unmatched rows") {
    import spark.implicits._
    val big = Seq((1L, 1)).toDF("k", "v")
    val dim = Seq((1L, "one"), (9L, "unmatched")).toDF("k", "name")
    // right/full outer would emit the unmatched replicated row once
    // per salt — must be refused, not silently wrong
    for (jt <- Seq("right_outer", "full_outer", "right", "full")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(big, dim, "k", salts = 8, joinType = jt)
      }
      assert(e.getMessage.contains("not skewed-side-preserving"))
    }
    // left-preserving types still work
    assert(Skew.saltedJoin(big, dim, "k", salts = 8, joinType = "left_outer")
      .count() == 1)
  }

  test("salt spreads a hot key over multiple partitions' worth of keys") {
    import spark.implicits._
    val big = (1 to 10000).map(i => (1L, i)).toDF("k", "v")
    val salts = big.withColumn("__salt", (rand(seed = 42) * 8).cast("int"))
      .select(countDistinct(col("__salt"))).head().getLong(0)
    assert(salts >= 6) // 8 salt values, all/most should be hit
  }
}

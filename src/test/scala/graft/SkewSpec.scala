package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.operators.Skew

class SkewSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("salted join equals the plain join on skewed data") {
    import spark.implicits._
    // 90% of rows share one hot key
    val big = (1 to 2000).map(i =>
      (if (i % 10 == 0) s"key${i % 7}" else "hotkey", i.toLong))
      .toDF("k", "v")
    val small = Seq(("hotkey", "H"), ("key0", "A"), ("key3", "B"))
      .toDF("k", "name")
    val plain = big.join(small, Seq("k"))
      .select("k", "v", "name").collect().toSet
    val salted = Skew.saltedJoin(big, small, "k", saltBuckets = 8)
      .select("k", "v", "name").collect().toSet
    assert(salted == plain)
    assert(salted.nonEmpty)
  }

  test("hotKeys surfaces the dominant key") {
    import spark.implicits._
    val big = (1 to 500).map(i =>
      (if (i % 5 == 0) s"k$i" else "dominant", i)).toDF("k", "v")
    val hot = Skew.hotKeys(big, "k", 1).collect()
    assert(hot.head.getString(0) == "dominant")
    assert(hot.head.getLong(1) == 400L)
  }
}
